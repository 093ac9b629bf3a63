package graft.oracle

import graft.model._
import graft.synth.WorldGen.LocalWorld
import graft.url.UrlFuncs
import scala.collection.mutable

/** Single-threaded reference-semantics oracle.
  *
  * A faithful serial interpreter of crawlcheck's main loop
  * (core.py:89-161) and queue semantics (transaction.py:102-233) over a
  * synthetic world — the golden model the distributed engine must match
  * bit-for-bit (crawl ordering, URL-seen set, transactions/links/defects).
  *
  * Declared deviations from the reference (documented; both sides of the
  * parity check use these):
  *  1. Virtual clock. Real wall-time politeness (robots.py:85-109) is
  *     nondeterministic; we use per-host virtual time: fetches are
  *     instantaneous, crawl-delay sleeps advance the host's clock, and
  *     processing is organized in BSP rounds whose start times advance
  *     by the reschedule bound (round r starts at r·bound). A FIFO queue
  *     segment present at round start is one round — since children
  *     always arrive behind everything queued, concatenating rounds
  *     equals the serial FIFO pop order exactly.
  *  2. Politeness: an item is rescheduled when its required sleep
  *     measured from the host's current virtual time exceeds the bound
  *     (robots.py:96-101 with now := host virtual time max'd with round
  *     start); per markStart semantics (core.py:148-150) only
  *     successfully processed fetches update the host's last-visit time.
  *  3. Plugin order is fixed: header filters in order acceptedType,
  *     acceptedUri, contentLength, expectedType (the reference's yapsy
  *     load order is filesystem-dependent), then crawler linksFinder.
  *
  * Replicated reference quirks (deliberate):
  *  - every created transaction consumes an idno, duplicates included
  *    (transaction.py:102-115 + push dedup afterwards);
  *  - duplicate links still get link rows with the duplicate's fresh seq
  *    (transaction.py:159-161);
  *  - only DONE-OK transactions get uri/contentType/responseStatus
  *    persisted (startChecking → transactions_load is reached only from
  *    __process, core.py:148-157); KO/IGNORED rows keep the push-time
  *    uri and null status/type;
  *  - aliases are only recorded at push time (transaction.py:225-233),
  *    so redirect/canonical aliases never reach the aliases table;
  *  - the neterr defect evidence is the reference's unformatted giveup
  *    message (net.py:47-50 formats with .format(**details) on %-style
  *    placeholders — a no-op);
  *  - URLs whose double-unquote contains whitespace fail the RFC-3987
  *    gate (core.py:103-110) and become `invaliduri` DONE-KO.
  */
object RefCrawlOracle {

  /** A defect with its deterministic emission order key:
    * (pop counter of the emitting item, phase within the item, emission
    * index within that phase).
    */
  case class OrderedDefect(popPos: Long, phase: Int, sub: Int, defect: DefectRow)

  case class CrawlOutput(
      crawlOrder: Vector[(Long, Long, String)], // (popPos, seq, uri at pop)
      transactions: Map[Long, TransactionRow],
      links: Vector[LinkRow], // processed flag folded in
      defects: Vector[OrderedDefect],
      aliases: Vector[AliasRow],
      seen: Map[(String, String), Long], // (uri, method) -> first seq
      hostState: Map[String, Double],
      rounds: Int,
      headers: Vector[HeaderRow] = Vector.empty,
      /** A3 (core.py:153-179): Σ content_length of processed fetches. */
      volumeBytes: Long = 0L,
      /** G5 (net.py:209-218): response cookies of every 200 fetch. */
      cookies: Vector[CookieRow] = Vector.empty,
      /** G6 (transaction.py:207-210): request data of accepted pushes. */
      params: Vector[ParamRow] = Vector.empty)

  private final class Item(
      val seq: Long, var pos: Long, var uri: String, val origUri: String,
      val depth: Int, val srcSeq: Long, val method: String,
      val expected: Option[String], val referer: String = null,
      /** urlencoded request data (P15, net.py:200-207); null = none */
      val dataQ: String = null)

  def crawl(world: LocalWorld, cfg: CrawlConfig): CrawlOutput = {
    val seen = mutable.LinkedHashMap.empty[(String, String), Long]
    val transactions = mutable.LinkedHashMap.empty[Long, TransactionRow]
    val links = mutable.ArrayBuffer.empty[LinkRow]
    val defects = mutable.ArrayBuffer.empty[OrderedDefect]
    val aliasRows = mutable.ArrayBuffer.empty[AliasRow]
    val headerRows = mutable.ArrayBuffer.empty[HeaderRow]
    val cookieRows = mutable.ArrayBuffer.empty[CookieRow]
    val paramRows = mutable.ArrayBuffer.empty[ParamRow]
    val knownMaps = mutable.HashSet.empty[String] // D3 (robots.py:72-83)
    val crawlOrder = mutable.ArrayBuffer.empty[(Long, Long, String)]
    val vt = mutable.HashMap.empty[String, Double]
    var nextSeq = 0L
    var nextPos = 0L
    var popCounter = 0L
    var seenCount = 0L
    var volumeBytes = 0L

    // canTouch (acceptor.py:32): Python re.match = anchored at start
    val uriRe = cfg.uriRegexes.map(_.r.pattern)
    def worth(uri: String): Boolean = uriRe.exists(_.matcher(uri).lookingAt())

    // wildcard group + the configured agent's group (engine prepare())
    val rulesByHost: Map[String, Seq[RobotsRule]] = world.rules
      .filter(r => r.agent == "*" || r.agent == cfg.agent).groupBy(_.host)
    def disallowed(uri: String): Boolean = {
      val h = UrlFuncs.host(uri)
      val path = { val (_, _, rest) = UrlFuncs.splitUrl(uri); if (rest.isEmpty) "/" else rest }
      val matching = rulesByHost.getOrElse(h, Nil).filter(r => path.startsWith(r.path_pref))
      matching.nonEmpty &&
        matching.maxBy(r => (r.path_pref.length, r.rule == "allow")).rule == "disallow"
    }
    def delayOf(host: String): Option[Double] =
      world.hosts.get(host).flatMap(_.crawl_delay_s)

    // dupdetect accumulator: (size, span-structural body key) →
    // [(pop, uri)...] (Checks.bodyKey — the relation the engine's
    // 128-bit span fold hashes)
    val dupPriors = mutable.HashMap
      .empty[(Long, Seq[(String, String, String)]), mutable.ArrayBuffer[(Long, String)]]

    /** Checker plugins over the span model (graft.checks.Checks phases;
      * run after linksFinder per declared plugin order).
      */
    def runCheckers(doc: Doc, item: Item, ct: String, entry: UrlMapEntry,
        defect: (Long, String, String, Double, Int) => Unit, myPop: Long): Unit = {
      // F12 per-plugin dispatch (core.py:274-285): contentTypes × uri
      // regex, identical gate as the engine's Checks.gateCol
      def on(plugin: String): Boolean =
        graft.checks.Checks.gateLocal(cfg, plugin, ct, item.uri)
      val spans = doc.spans.sortBy(_.offset)
      if (on("dupdetect")) { // phase 4 — dupdet acceptType=true (all CTs)
        val key = (entry.content_length, graft.checks.Checks.bodyKey(doc.spans))
        val priors = dupPriors.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
        priors.find(_._2 != item.uri).foreach { case (_, puri) =>
          defect(item.seq, "dup", puri, 0.7, 4)
        }
        priors += ((myPop, item.uri))
      }
      if (on("css_scraper")) {
        spans.find(_.kind == "css-int").foreach { c => // css_scraper internal (5)
          val len = Option(c.text).getOrElse("").getBytes("UTF-8").length
          if (len > 1024) defect(item.seq, "seo:huge_internal", len.toString, 0.5, 5)
        }
        val seenStyles = mutable.HashSet.empty[String] // inline dups (6)
        for (sp <- spans if sp.kind == "style") {
          if (seenStyles.contains(sp.text))
            defect(item.seq, "seo:duplicit_inline", sp.text, 0.1, 6)
          else seenStyles += sp.text
        }
      }
      if (on("seo_meta")) {
        val nDesc = spans.count(sp => sp.kind == "meta" && sp.text == "description")
        if (nDesc == 0) defect(item.seq, "seo:nodsc", "", 0.4, 7)
        else if (nDesc > 1) defect(item.seq, "seo:multidsc", nDesc.toString, 0.4, 7)
        val nKeys = spans.count(sp => sp.kind == "meta" && sp.text == "keywords")
        if (nKeys == 0) defect(item.seq, "seo:nokeys", "", 0.4, 8)
        else if (nKeys > 1) defect(item.seq, "seo:multikeys", nKeys.toString, 0.4, 8)
      }
      if (on("no_script")) {
        for (sp <- spans if sp.kind == "script") { // no_script (9)
          if (!sp.text.contains("noscript"))
            defect(item.seq, "noscript-miss", "Script: " + sp.text, 0.7, 9)
          if (!sp.text.contains("comment"))
            defect(item.seq, "script-no-comment", "Script: " + sp.text, 0.4, 9)
        }
      }
      if (on("seo_images")) {
        for (sp <- spans if sp.kind == "img") { // seo_images (10)
          val flags = Option(sp.media_ref).getOrElse("")
          if (!flags.contains("w")) defect(item.seq, "seo:img:nowidth", sp.text, 0.6, 10)
          if (!flags.contains("h")) defect(item.seq, "seo:img:noheight", sp.text, 0.6, 10)
        }
      }
      if (on("mailer")) {
        for (sp <- spans if sp.kind == "mail") // mailer (11)
          defect(item.seq, "mail", graft.checks.Checks.mailEvidence(sp.text),
            graft.checks.Checks.mailSeverity(sp.text), 11)
      }
      if (on("tidyHtmlValidator")) {
        // tidy model (phase 14): typeName = "tidy:<cat>:<desc>",
        // evidence = [cat, loc]; severity per category, unknown -1
        for (sp <- spans if sp.kind == "tidy-msg") {
          val Array(cat, loc) = sp.media_ref.split("\\|", 2)
          val sev = cat match {
            case "Warning" => 0.5; case "Error" => 1.0; case "Info" => 0.3
            case _ => -1.0
          }
          defect(item.seq, s"tidy:$cat:${sp.text}", s"[$cat, $loc]", sev, 14)
        }
      }
      if (on("tinycss")) { // phase 15: [line, reason], severity 0.7
        for (sp <- spans if sp.kind == "css-err")
          defect(item.seq, "stylesheet", s"[${sp.media_ref}, ${sp.text}]", 0.7, 15)
      }
      if (on("non_semantic_html")) {
        // non_semantic_html (non_semantic_html.py:66-90, phase 13):
        // per descendant, attribute defects in table order, then the
        // deprecated-tag defect
        for (sp <- spans if sp.kind == "html-tag") {
          val tag = sp.text
          val present = Option(sp.media_ref).getOrElse("")
            .split(",").filter(_.nonEmpty).toSet
          for (a <- graft.checks.Checks.despicableAttrs.getOrElse(tag, Nil)
               if present(a))
            defect(item.seq, "nonsem", s"Attribute $a in tag $tag", 0.4, 13)
          if (graft.checks.Checks.despicableTags(tag))
            defect(item.seq, "nonsem", s"Tag $tag", 0.4, 13)
        }
      }
    }

    /** createTransaction + TransactionQueue.push. Returns the enqueued
      * item, or None when deduplicated / over the url limit.
      */
    def push(rawUri: String, depth: Int, srcSeq: Long, expected: Option[String],
        hasParent: Boolean, referer: String = null, method: String = "GET",
        data: Seq[(String, String)] = Nil): Option[Item] = {
      val decoded = UrlFuncs.unquote2(rawUri) // transaction.py:111
      val seq = nextSeq; nextSeq += 1 // idno consumed even for dups
      val canon = UrlFuncs.defrag(decoded) // transaction.py:152
      val key = (canon, method)
      var created: Option[Item] = None
      if (!seen.contains(key)) {
        if (cfg.urlLimit.exists(seenCount >= _)) return None // SeenLimit: nothing logged
        val dq = if (data.nonEmpty) UrlFuncs.urlencode(data) else null
        created = Some(new Item(seq, -1L, canon, canon, depth, srcSeq, method,
          expected, referer, dq))
        transactions(seq) = TransactionRow(seq, method, canon, None, None,
          VerificationStatus.Requested, depth, expected)
        aliasRows += AliasRow(seq, decoded)
        // __record_params at push-accept (transaction.py:207-210)
        if (cfg.recordParams) for ((k, v) <- data) paramRows += ParamRow(seq, k, v)
        seen(key) = seq
        seenCount += 1
      }
      if (hasParent) links += LinkRow(srcSeq, canon, seq, processed = false)
      created
    }

    /** push_virtual_link (transaction.py:177-187): fresh idno, seen-mark
      * + enqueue when unseen, link row ALWAYS, no Referer header. The
      * returned (seq, canon, depth) is the parent for sitemap links even
      * when the URI was already seen. Declared deviation: an over-limit
      * virtual push behaves like push (reference would crash on an
      * uncaught SeenLimit).
      */
    def pushVirtual(rawUri: String, depth: Int, srcSeq: Long): (Long, String, Int, Option[Item]) = {
      val decoded = UrlFuncs.unquote2(rawUri)
      val seq = nextSeq; nextSeq += 1
      val canon = UrlFuncs.defrag(decoded)
      val key = (canon, "GET")
      var created: Option[Item] = None
      if (!seen.contains(key)) {
        if (cfg.urlLimit.exists(seenCount >= _)) return (seq, canon, depth, None)
        created = Some(new Item(seq, -1L, canon, canon, depth, srcSeq, "GET", None))
        transactions(seq) = TransactionRow(seq, "GET", canon, None, None,
          VerificationStatus.Requested, depth, None)
        aliasRows += AliasRow(seq, decoded)
        seen(key) = seq
        seenCount += 1
      }
      links += LinkRow(srcSeq, canon, seq, processed = false)
      (seq, canon, depth, created)
    }

    // seeds (core.py:55-61): config order, depth 0, srcId −1, no link rows
    var frontier: Vector[Item] = cfg.effectiveSeeds
      .flatMap(e => push(e.url, 0, -1L, None, hasParent = false,
        method = e.method, data = e.data)).toVector
    frontier.foreach { it => it.pos = nextPos; nextPos += 1 }

    var round = 0
    val bound = cfg.rescheduleBoundS
    while (frontier.nonEmpty && (cfg.maxRounds <= 0 || round < cfg.maxRounds)) {
      val S = round * bound
      // next round's arrivals with creator-order keys (creatorPos, childIdx)
      val next = mutable.ArrayBuffer.empty[(Long, Long, Item)]

      for (item <- frontier.sortBy(_.pos)) {
        val myPop = popCounter; popCounter += 1
        crawlOrder += ((myPop, item.seq, item.uri))
        // link processed=true WHERE toUri = popped uri (transaction.py:146-147)
        for (i <- links.indices if links(i).toUri == item.uri && !links(i).processed)
          links(i) = links(i).copy(processed = true)

        def finishRaw(status: String): Unit =
          transactions(item.seq) = TransactionRow(item.seq, item.method, item.origUri,
            None, None, status, item.depth, item.expected)
        val subCounters = mutable.HashMap.empty[Int, Int] // phase -> next sub
        def defect(seq: Long, name: String, evidence: String, sev: Double, phase: Int): Unit = {
          val sub = subCounters.getOrElse(phase, 0)
          subCounters(phase) = sub + 1
          defects += OrderedDefect(myPop, phase, sub, DefectRow(seq, name, evidence, sev))
        }

        val host = UrlFuncs.host(item.uri)
        if (!UrlFuncs.isValidIri(item.uri)) {
          defect(item.seq, "invaliduri", item.uri, 1.0, 0)
          finishRaw(VerificationStatus.DoneKo)
        } else if (!worth(item.uri)) {
          finishRaw(VerificationStatus.DoneIgnored)
        } else if (cfg.maxDepth > 0 && item.depth > cfg.maxDepth) {
          finishRaw(VerificationStatus.DoneIgnored)
        } else if (disallowed(item.uri)) {
          finishRaw(VerificationStatus.DoneIgnored)
        } else {
          // robots sitemap recording (robots.py:72-83): runs on EVERY
          // allowed transaction, BEFORE the crawl-delay reschedule.
          // Declared deviation: new maps are processed in lexicographic
          // loc order (the reference iterates a Python set).
          for (locs <- world.sitemaps.get(host)) {
            val newLocs = locs.sorted.filterNot(knownMaps.contains)
            if (newLocs.nonEmpty) {
              val (rSeq, rCanon, rDepth, rItem) =
                pushVirtual(s"http://$host/robots.txt", item.depth + 1, item.seq)
              rItem.foreach(r => next += ((item.pos, -2000000L, r)))
              // push_link (transaction.py:163-175) has NO scheme filter:
              // every declared sitemap loc consumes a seq and gets a link
              // row; a non-http(s) loc is dropped later at fetch time
              // (net.py:54-62 → DONE-IGNORED). The sitemap_scanner <loc>
              // path below DOES filter (sitemap_scanner.py:62-64).
              for ((loc, j) <- newLocs.zipWithIndex)
                push(loc, rDepth + 1, rSeq, None, hasParent = true, referer = rCanon)
                  .foreach(child => next += ((item.pos, -1000000L + j, child)))
              knownMaps ++= locs
            }
          }
          val d = delayOf(host)
          val deferred = d match {
            case Some(delay) if vt.contains(host) =>
              val hvt = vt(host)
              (hvt + delay) - math.max(S, hvt) > bound
            case _ => false
          }
          if (deferred) {
            next += ((item.pos, 0L, item)) // Reschedule → current tail
          } else {
            val fetchTime = d match {
              case Some(delay) if vt.contains(host) =>
                math.max(math.max(S, vt(host)), vt(host) + delay)
              case _ => S
            }
            // uri_normalizer (P5, uri_normalizer.py:22-27): filter
            // plugin after robots (alphabetical yapsy order d < r < u);
            // changePrimaryUri = defrag(normalized). Politeness keys on
            // the pre-normalize host (declared virtual-clock model).
            if (cfg.normalizeUris) {
              val n = UrlFuncs.urlNormalize(item.uri)
              if (n != item.uri) item.uri = UrlFuncs.defrag(n)
            }
            val sch = UrlFuncs.scheme(item.uri)
            // P15 __gen_param (net.py:200-207): GET/HEAD data rides the
            // request URL; the response's r.url then carries the query,
            // so a successful paramed fetch rewrites the primary URI
            // (net.py:121-123 changePrimaryUri fires on uri != r.url)
            val fetchUri =
              if ((item.method == "GET" || item.method == "HEAD") && item.dataQ != null)
                item.uri + "?" + item.dataQ
              else item.uri
            if (sch != "http" && sch != "https") {
              finishRaw(VerificationStatus.DoneIgnored) // UrlError → ConditionError
            } else world.urlMap.get(fetchUri) match {
              case None =>
                defect(item.seq, "neterr", "All %s attempts to get %s failed.", 0.9, 0)
                finishRaw(VerificationStatus.DoneKo)
              case Some(entry0) =>
                // transparent redirect CHAIN (requests follows up to
                // session.max_redirects, net.py:104-107): hop until a
                // non-redirect entry or the hop budget runs out; a loop
                // or an over-budget chain raises TooManyRedirects →
                // NetworkError → DONE-KO with NO defect (core.py:141-143)
                var entry = entry0
                var finalUrl = fetchUri
                var hops = 0
                while (entry.redirect_to != null && hops < cfg.maxRedirects) {
                  finalUrl = entry.redirect_to
                  entry = world.urlMap.getOrElse(entry.redirect_to,
                    UrlMapEntry(entry.redirect_to, null, 404, null, "", 0L, null))
                  hops += 1
                }
                if (entry.redirect_to != null) {
                  finishRaw(VerificationStatus.DoneKo) // too many redirects
                } else if (entry.status != 200) {
                  defect(item.srcSeq, "badlink", item.uri, 1.0, 0)
                  finishRaw(VerificationStatus.DoneKo)
                } else {
                  if (finalUrl != item.uri) item.uri = UrlFuncs.defrag(finalUrl)
                  // canonical Link response header (P7, canonical.py:
                  // 22-28): header filter, changePrimaryUri(defrag(u))
                  if (entry.canonical_to != null)
                    item.uri = UrlFuncs.defrag(entry.canonical_to)
                  val rawCt = Option(entry.content_type).getOrElse("")
                  if (rawCt.trim.isEmpty) defect(item.seq, "badtype", null, 0.5, 1)
                  val ct = if (rawCt.contains(';')) rawCt.split(";")(0) else rawCt
                  // G5 __store_cookies (net.py:126, 209-218): runs right
                  // after __getCT, BEFORE accepted-type filtering
                  for (c <- entry.cookies)
                    cookieRows += CookieRow(item.seq, c.name, c.value,
                      c.secure, c.httpOnly, c.path)
                  if (!cfg.acceptedTypes.contains(ct)) {
                    finishRaw(VerificationStatus.DoneIgnored)
                  } else if (cfg.maxContentLength.exists(entry.content_length > _)) {
                    finishRaw(VerificationStatus.DoneIgnored)
                  } else if (item.expected.exists(e => !ct.startsWith(e))) {
                    defect(item.seq, "mistyped",
                      s"Expected: ${item.expected.get} Got: $ct", 0.8, 2)
                    finishRaw(VerificationStatus.DoneIgnored)
                  } else {
                    val doc = Option(entry.doc_id).flatMap(world.docs.get)
                    if (entry.detected_mime != null && entry.detected_mime != ct)
                      defect(item.seq, "type-mishmash",
                        s"Declared $ct,detected ${entry.detected_mime}", 0.3, 3)
                    vt(host) = fetchTime // markStart (core.py:148-150)
                    volumeBytes += entry.content_length // A3 (core.py:153)
                    if (graft.checks.Checks.gateLocal(cfg, "links_finder", ct, item.uri)
                        && doc.isDefined) {
                      val spans = doc.get.spans.sortBy(_.offset)
                      spans.find(_.kind == "canonical").foreach { c =>
                        item.uri = UrlFuncs.defrag(c.text)
                      }
                      val linkKinds = Set("link", "css-link", "img", "iframe", "frame")
                      var childIdx = 0L
                      for (sp <- spans if linkKinds.contains(sp.kind)) {
                        val joined = UrlFuncs.urljoin(item.uri, sp.text)
                        val p = UrlFuncs.scheme(joined)
                        if (p == "http" || p == "https") {
                          val addr = UrlFuncs.quote(joined)
                          val expected = if (sp.kind == "img") Some("image/") else None
                          push(addr, item.depth + 1, item.seq, expected,
                              hasParent = true, referer = item.uri)
                            .foreach(child => next += ((item.pos, 1L + childIdx, child)))
                        }
                        childIdx += 1
                      }
                    }
                    // sitemap_scanner (S4/G2/A7) — crawler plugin over
                    // xml/gzip bodies; declared deviations: (a) we
                    // implement the DOCUMENTED intent (the reference's
                    // urlset/sitemapindex tag test at sitemap_scanner.py:
                    // 40-44 short-circuits on every well-formed urlset,
                    // and its size check would NameError at :73), (b) it
                    // runs after the checkers in plugin order (phase 12).
                    if (graft.checks.Checks.gateLocal(cfg, "sitemap_scanner", ct, item.uri)
                        && doc.isDefined) {
                      val locs = doc.get.spans.filter(_.kind == "sitemap-loc")
                        .sortBy(_.offset)
                      if (locs.nonEmpty) {
                        if (entry.content_length > cfg.sitemapMaxSize)
                          defect(item.seq, "sitemapsize",
                            entry.content_length.toString, 0.6, 12)
                        if (locs.size > cfg.sitemapMaxRecords)
                          defect(item.seq, "sitemaprecords", locs.size.toString, 0.6, 12)
                        // arrival keys offset past every links_finder
                        // child: when BOTH plugins fire on one page the
                        // serial queue appends the link children first
                        // (plugin order), then the scanner's locs
                        var ci = 0L
                        for (sp <- locs) {
                          val p = UrlFuncs.scheme(sp.text)
                          if (p == "http" || p == "https")
                            push(sp.text, item.depth + 1, item.seq, None,
                                hasParent = true, referer = item.uri)
                              .foreach(child => next += ((item.pos, 1000000000L + ci, child)))
                          ci += 1
                        }
                      }
                    }
                    // checker plugins after linksFinder (declared plugin
                    // order; phases 4..11 — see graft.checks.Checks)
                    doc.foreach { dd =>
                      runCheckers(dd, item, ct, entry, defect, myPop)
                    }
                    // startChecking header recording (G4, database.py:
                    // 254-257): request headers of DONE-OK transactions
                    if (cfg.recordHeaders) {
                      if (item.referer != null)
                        headerRows += HeaderRow(item.seq, "Referer", item.referer)
                      headerRows += HeaderRow(item.seq, "User-Agent", cfg.agent)
                      headerRows += HeaderRow(item.seq, "Accept",
                        cfg.acceptedTypes.mkString(","))
                    }
                    // DONE-OK: the only path that persists uri/ct/status
                    transactions(item.seq) = TransactionRow(item.seq, item.method,
                      item.uri, Some(200), Some(ct), VerificationStatus.DoneOk,
                      item.depth, item.expected)
                  }
                }
            }
          }
        }
      }
      // assign fresh queue positions in creator order (serial FIFO tail)
      frontier = next.sortBy(t => (t._1, t._2)).map(_._3).toVector
      frontier.foreach { it => it.pos = nextPos; nextPos += 1 }
      round += 1
    }

    CrawlOutput(crawlOrder.toVector, transactions.toMap, links.toVector,
      defects.toVector, aliasRows.toVector, seen.toMap, vt.toMap, round,
      headerRows.toVector, volumeBytes, cookieRows.toVector, paramRows.toVector)
  }
}
