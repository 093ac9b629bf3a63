package graft.synth

import graft.model._
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic crawl worlds (FIXTURES.md §1-2, §5).
  *
  * All content is a pure function of (spec, index) via splitmix64 — the
  * Spark view ([[WorldGen.sparkWorld]]) and the driver-local view used
  * by the serial oracle ([[WorldGen.localWorld]]) are guaranteed
  * identical. No wall clock, no RNG state.
  *
  * URL space:
  *   regular doc d  → http://h{host}.test/p/{d}   (text/html, has spans)
  *   private doc    → http://h{host}.test/private/p/{d}  (robots-disallowed)
  *   image doc i    → http://h{host}.test/img/{i}  (image/png, media span)
  *   redirect alias → http://h{host}.test/r/{d}    (301 → the doc URL)
  *   missing        → http://h{host}.test/missing/{k} (404, no body)
  */
final case class WorldSpec(
    name: String,
    seed: Long = 42L,
    nHosts: Int = 4,
    nDocs: Int = 40,
    /** fraction (percent) of docs assigned to the hot host 0 (Zipf knob) */
    hotPct: Int = 30,
    /** links per doc = 1 + idx % linkFan */
    linkFan: Int = 5,
    /** every k-th host gets this crawl delay; 0 disables */
    politeEvery: Int = 0,
    politeDelayS: Double = 2.0,
    /** every k-th host gets a delay > reschedule bound; 0 disables */
    slowEvery: Int = 0,
    slowDelayS: Double = 12.0,
    /** every k-th doc lives under the robots-disallowed /private prefix */
    privateEvery: Int = 0,
    /** every k-th link points at a missing (404) URL */
    missingEvery: Int = 13,
    /** every k-th link goes through a 301 redirect alias */
    redirectEvery: Int = 11,
    /** every k-th doc declares a canonical span */
    canonicalEvery: Int = 17,
    /** every k-th link is an <img> to an image doc */
    imgEvery: Int = 7,
    /** every k-th image doc has detected mime != declared (type-mishmash) */
    mishmashEvery: Int = 5,
    /** every k-th link carries a URL-variant (fragment / %-encoding / dupe) */
    variantEvery: Int = 3,
    /** every k-th doc duplicates the spans+length of another doc (D4) */
    dupEvery: Int = 0,
    /** every k-th doc carries inline style spans (with in-page dups, D5) */
    styleEvery: Int = 0,
    /** every k-th doc carries meta description/keywords spans (A6) */
    metaEvery: Int = 0,
    /** every k-th doc carries script spans (noscript checker) */
    scriptEvery: Int = 0,
    /** every k-th doc carries a mailto span (mailer P14) */
    mailEvery: Int = 0,
    /** extra ~40-word text spans per doc (realistic body sizes for
      * benchmarks; 0 keeps the tiny fixture bodies) */
    heavyText: Int = 0,
    /** every k-th doc's response carries a `Link: rel=canonical` header
      * (P7, canonical.py:22-28); 0 disables */
    canonicalHdrEvery: Int = 0,
    /** every k-th host lists a sitemap in robots.txt (S4/G2/G3/D3/A7);
      * 0 disables. Every third such sitemap is gzip-compressed. */
    sitemapEvery: Int = 0,
    /** every k-th link carries a superfluous :80 port — url_normalize
      * strips it (P5); without the normalizer it misses the url map */
    normVariantEvery: Int = 0,
    /** every k-th host gets agent-scoped robots rules: a disallow for
      * the configured agent ("Crawlcheck/1.1") under /agent-only plus a
      * disallow-everything for an UNRELATED agent that must be ignored */
    agentRuleEvery: Int = 0,
    /** every k-th SITEMAP host additionally declares a non-http(s)
      * (ftp://) sitemap loc in robots.txt — push_link has no scheme
      * filter (transaction.py:163-175), so the loc consumes a seq, gets
      * a link row, and dies DONE-IGNORED at fetch; 0 disables */
    sitemapAltEvery: Int = 0,
    /** every k-th doc's 200 response sets deterministic cookies (G5,
      * net.py:209-218); 0 disables */
    cookieEvery: Int = 0,
    /** every k-th doc carries html-tag spans exercising the
      * non_semantic_html checker (deprecated tags/attributes,
      * non_semantic_html.py); 0 disables */
    nonsemEvery: Int = 0,
    /** every k-th doc carries tidy-msg spans (validator messages the
      * tidy model checker explodes, tidy_html_validator.py:50-83);
      * 0 disables */
    tidyEvery: Int = 0,
    /** every k-th link becomes a css-link to a companion text/css
      * document carrying css-err spans (tinycss validator,
      * tinycss_css_validator_plugin.py:19-37); 0 disables */
    cssEvery: Int = 0,
    /** every k-th HTML doc additionally carries sitemap-loc spans — with
      * a sitemap_scanner gate widened to text/html, links_finder AND the
      * scanner both fire on one page (overlapping-gates seq/order
      * semantics); 0 disables */
    locInHtmlEvery: Int = 0,
    /** every k-th redirect alias becomes a CHAIN: /r/{d} → /r2/{d} →
      * ... (redirectChainLen hops) → the doc URL; one such chain per
      * world additionally LOOPS (too-many-redirects DONE-KO path);
      * 0 keeps all redirects single-hop */
    redirectChainEvery: Int = 0,
    /** hop count of chained redirects (incl. the final hop to the doc) */
    redirectChainLen: Int = 3)

object WorldGen {

  /** splitmix64 — deterministic hash mixer (public-domain algorithm). */
  def mix(parts: Long*): Long = {
    var h = 0x9e3779b97f4a7c15L
    for (p <- parts) {
      var z = h ^ (p * 0xbf58476d1ce4e5b9L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      h = z ^ (z >>> 31)
    }
    h
  }
  private def pmod(v: Long, m: Int): Int = (((v % m) + m) % m).toInt

  def hostOf(s: WorldSpec, d: Long): Int = {
    val m = mix(s.seed, 1L, d)
    if (s.nHosts == 1) 0
    else if (pmod(m, 100) < s.hotPct) 0
    else 1 + pmod(mix(m, 2L), s.nHosts - 1)
  }

  def hostName(h: Int): String = f"h$h%04d.test"

  def nImgs(s: WorldSpec): Int = math.max(1, s.nDocs / 5)

  def isPrivate(s: WorldSpec, d: Long): Boolean =
    s.privateEvery > 0 && pmod(mix(s.seed, 3L, d), s.privateEvery) == 0

  def docUrl(s: WorldSpec, d: Long): String = {
    val h = hostName(hostOf(s, d))
    if (isPrivate(s, d)) s"http://$h/private/p/$d" else s"http://$h/p/$d"
  }
  def imgUrl(s: WorldSpec, i: Long): String =
    s"http://${hostName(hostOf(s, i + 1000000L))}/img/$i"
  def redirectUrl(s: WorldSpec, d: Long): String =
    s"http://${hostName(hostOf(s, d))}/r/$d"
  def missingUrl(s: WorldSpec, k: Long): String =
    s"http://${hostName(hostOf(s, k + 2000000L))}/missing/$k"

  def docId(d: Long): String = s"d$d"
  def imgDocId(i: Long): String = s"i$i"

  private val words = Vector("lorem", "ipsum", "crawl", "frontier", "spark",
    "span", "media", "graph", "queue", "robots", "delay", "shard", "bloom")

  private def textOf(s: WorldSpec, d: Long, j: Int): String = {
    val n = 3 + pmod(mix(s.seed, 4L, d, j.toLong), 6)
    (0 until n).map(i => words(pmod(mix(s.seed, 5L, d, j.toLong, i.toLong), words.size))).mkString(" ")
  }

  /** The links of doc d: (kind, href, childTargetKind) in document order.
    * href variants exercise the canonicalization chain (P1-P5) and the
    * URL-seen dedup (D1): fragments, %-encoding, relative paths.
    */
  def linksOf(s: WorldSpec, d: Long): Seq[(String, String)] = {
    val fan = 1 + pmod(mix(s.seed, 6L, d), s.linkFan)
    (0 until fan).map { j =>
      val m = mix(s.seed, 7L, d, j.toLong)
      val target = pmod(mix(m, 1L), s.nDocs).toLong
      if (s.imgEvery > 0 && pmod(m, s.imgEvery) == 0) {
        val img = pmod(mix(m, 2L), nImgs(s)).toLong
        // every few img links mistakenly point at an html doc (mistyped F5)
        if (pmod(m, 4 * s.imgEvery) == s.imgEvery) ("img", docUrl(s, target))
        else ("img", imgUrl(s, img))
      } else if (pmod(m, s.missingEvery) == 1) {
        ("link", missingUrl(s, pmod(mix(m, 3L), 20).toLong))
      } else if (pmod(m, s.redirectEvery) == 2) {
        ("link", redirectUrl(s, target))
      } else if (s.normVariantEvery > 0 && pmod(m, s.normVariantEvery) == 3) {
        // superfluous default port; url_normalize strips it (P5)
        ("link", docUrl(s, target).replace(".test/", ".test:80/"))
      } else if (pmod(m, s.variantEvery) == 0) {
        // URL variants that canonicalize to the same doc URL
        val base = docUrl(s, target)
        pmod(mix(m, 4L), 4) match {
          case 0 => ("link", base + "#section" + pmod(m, 9))
          case 1 => ("link", "HTTP" + base.drop(4)) // scheme case variant; urljoin lowercases
          case 2 => ("link", "/" + base.split("/", 4)(3)) // host-relative path
          case _ => ("link", base.replace("p/", "%70/")) // %70 = 'p' (unquote² target)
        }
      } else if (s.cssEvery > 0 && pmod(mix(m, 9L), s.cssEvery) == 0) {
        ("css-link", cssUrl(s, target))
      } else {
        val kinds = Vector("link", "link", "link", "css-link", "iframe", "frame")
        (kinds(pmod(mix(m, 5L), kinds.size)), docUrl(s, target))
      }
    }
  }

  // ---- validator-model documents (G7 full) ---------------------------
  def cssUrl(s: WorldSpec, d: Long): String =
    s"http://${hostName(hostOf(s, d))}/css/$d"
  def cssDocId(d: Long): String = s"c$d"
  private val cssReasons = Vector("unexpected token", "unclosed block",
    "invalid selector", "expected a property name")
  /** css-err spans: text = reason, media_ref = line number. */
  def cssDocOf(s: WorldSpec, d: Long): Doc = {
    val n = pmod(mix(s.seed, 52L, d), 3) // 0..2 errors
    val errs = (0 until n).map { i =>
      Span("css-err", cssReasons(pmod(mix(s.seed, 53L, d, i.toLong), cssReasons.size)),
        (1 + pmod(mix(s.seed, 54L, d, i.toLong), 200)).toString, 10 * i)
    }
    Doc(cssDocId(d), errs :+ Span("text", s"body{margin:${pmod(mix(s.seed, 55L, d), 9)}}",
      null, 1000))
  }
  private def cssUrlMap(s: WorldSpec): Seq[UrlMapEntry] =
    if (s.cssEvery <= 0) Nil
    else (0L until s.nDocs).map(d =>
      UrlMapEntry(cssUrl(s, d), cssDocId(d), 200, null, "text/css",
        40 + pmod(mix(s.seed, 56L, d), 400).toLong, "text/css"))

  /** Index of the doc whose spans doc d duplicates (itself if none). */
  def dupSource(s: WorldSpec, d: Long): Long =
    if (s.dupEvery > 0 && d > 0 && pmod(mix(s.seed, 20L, d), s.dupEvery) == 0)
      pmod(mix(s.seed, 21L, d), d.toInt).toLong
    else d

  /** All spans of doc d, already in offset order; the generator emits
    * them REVERSED in the stored array to exercise span reassembly
    * (input_hint per-row invariant).
    */
  def spansOf(s: WorldSpec, d0: Long): Seq[Span] = {
    val d = dupSource(s, d0)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Span]
    buf += Span("text", textOf(s, d, 0), null, 0)
    if (s.canonicalEvery > 0 && pmod(mix(s.seed, 8L, d), s.canonicalEvery) == 0)
      buf += Span("canonical", docUrl(s, d) + "?canon=1", null, 5)
    var off = 10
    for (((kind, href), j) <- linksOf(s, d).zipWithIndex) {
      // img spans carry their width/height attribute flags in media_ref
      // ("wh" both, "w"/"h" one, null neither) for the seoimg checker
      val mref =
        if (kind == "img") Vector("wh", "w", "h", null)(pmod(mix(s.seed, 34L, d, j.toLong), 4))
        else null
      buf += Span(kind, href, mref, off)
      off += 10
    }
    buf += Span("text", textOf(s, d, 1), null, off)
    for (h <- 0 until s.heavyText) {
      val nw = 40
      val w = new StringBuilder
      var i = 0
      while (i < nw) {
        w.append(words(pmod(mix(s.seed, 40L, d, h.toLong, i.toLong), words.size))).append(' ')
        i += 1
      }
      buf += Span("text", w.toString.trim, null, 1000 + off + 10 * h)
    }
    if (pmod(mix(s.seed, 9L, d), 3) == 0)
      buf += Span("media", null, s"blob://w/${d}", off + 10)
    var o2 = off + 20
    if (s.styleEvery > 0 && pmod(mix(s.seed, 22L, d), s.styleEvery) == 0) {
      // inline style attrs; every other such doc repeats one (D5 dup)
      val v1 = s"color:#${pmod(mix(s.seed, 23L, d), 999)}"
      val v2 = s"margin:${pmod(mix(s.seed, 24L, d), 40)}px"
      buf += Span("style", v1, null, o2)
      buf += Span("style", v2, null, o2 + 10)
      if (pmod(mix(s.seed, 25L, d), 2) == 0) buf += Span("style", v1, null, o2 + 20)
      o2 += 30
      // internal <style> block, sometimes over the 1024-byte limit
      val css = if (pmod(mix(s.seed, 26L, d), 3) == 0) "x" * 1100 else "body{margin:0}"
      buf += Span("css-int", css, null, o2); o2 += 10
    }
    if (s.metaEvery > 0 && pmod(mix(s.seed, 27L, d), s.metaEvery) == 0) {
      val nDesc = pmod(mix(s.seed, 28L, d), 3) // 0, 1 or 2 descriptions
      val nKeys = pmod(mix(s.seed, 29L, d), 3)
      for (i <- 0 until nDesc) { buf += Span("meta", "description", null, o2); o2 += 10 }
      for (i <- 0 until nKeys) { buf += Span("meta", "keywords", null, o2); o2 += 10 }
    }
    if (s.scriptEvery > 0 && pmod(mix(s.seed, 30L, d), s.scriptEvery) == 0) {
      val kinds = Vector("plain", "noscript", "comment", "noscript-comment")
      buf += Span("script", kinds(pmod(mix(s.seed, 31L, d), 4)), null, o2); o2 += 10
    }
    if (s.mailEvery > 0 && pmod(mix(s.seed, 32L, d), s.mailEvery) == 0) {
      // every 3rd mail-carrying doc plants a syntactically INVALID
      // address (double @, empty domain label) so the mailer's
      // validity tier (severity 0.3 vs 0.8) is exercised by parity
      val n = pmod(mix(s.seed, 33L, d), 50)
      val addr =
        if (pmod(mix(s.seed, 34L, d), 3) == 0) s"user$n@@example..test"
        else s"user$n@example.test"
      buf += Span("mail", addr, null, o2)
      o2 += 10
    }
    if (s.tidyEvery > 0 && pmod(mix(s.seed, 46L, d), s.tidyEvery) == 0) {
      // tidy-msg spans: text = message description, media_ref =
      // "category|location" — the parsed shape of a tidylib output line
      val msgs = Vector(
        ("Warning", "missing </td> before </tr>"),
        ("Warning", "trimming empty <p>"),
        ("Error", "<spacer> is not approved by W3C"),
        ("Error", "missing quote mark for attribute value"),
        ("Info", "Document content looks like HTML5"),
        ("Access", "unparseable category"), // unknown → X codes, sev -1
        // same DESC under a second category: __get_code keys by desc
        // alone, so this must reuse whatever code "trimming empty <p>"
        // got at its first emission (tidy_html_validator.py:86-110)
        ("Error", "trimming empty <p>"))
      val n = 1 + pmod(mix(s.seed, 47L, d), 3)
      for (i <- 0 until n) {
        val (cat, msg) = msgs(pmod(mix(s.seed, 48L, d, i.toLong), msgs.size))
        val loc = s"line ${1 + pmod(mix(s.seed, 49L, d, i.toLong), 80)} column " +
          s"${1 + pmod(mix(s.seed, 51L, d, i.toLong), 40)}"
        buf += Span("tidy-msg", msg, cat + "|" + loc, o2); o2 += 10
      }
    }
    if (s.locInHtmlEvery > 0 && pmod(mix(s.seed, 57L, d), s.locInHtmlEvery) == 0) {
      // sitemap-loc spans INSIDE an html doc: fire sitemap_scanner on
      // the same page as links_finder when its gate is widened to html
      val n = 1 + pmod(mix(s.seed, 58L, d), 2)
      for (i <- 0 until n) {
        buf += Span("sitemap-loc",
          docUrl(s, pmod(mix(s.seed, 59L, d, i.toLong), s.nDocs).toLong), null, o2)
        o2 += 10
      }
    }
    if (s.nonsemEvery > 0 && pmod(mix(s.seed, 43L, d), s.nonsemEvery) == 0) {
      // html-tag spans: text = tag, media_ref = CSV of present attrs;
      // mixes deprecated tags, deprecated attrs, and clean descendants
      val n = 1 + pmod(mix(s.seed, 44L, d), 3)
      for (i <- 0 until n) {
        val (tag, attrs) = pmod(mix(s.seed, 45L, d, i.toLong), 6) match {
          case 0 => ("center", null) // deprecated tag, no attrs
          case 1 => ("table", "align,width,id") // two deprecated attrs + clean
          case 2 => ("p", "align") // one deprecated attr
          case 3 => ("b", "class") // deprecated tag with clean attr
          case 4 => ("div", "id") // clean: div's only bad attr is align
          case _ => ("span", "class") // fully clean descendant
        }
        buf += Span("html-tag", tag, attrs, o2); o2 += 10
      }
    }
    buf.reverse.toSeq // stored order != document order, deliberately
  }

  def docOf(s: WorldSpec, d: Long): Doc = Doc(docId(d), spansOf(s, d))

  def imgDocOf(s: WorldSpec, i: Long): Doc =
    Doc(imgDocId(i), Seq(Span("media", null, s"blob://img/$i", 0)))

  // ---- sitemap family (S4/G2/G3/D3/A7) ------------------------------
  def hasSitemap(s: WorldSpec, h: Int): Boolean =
    s.sitemapEvery > 0 && h % s.sitemapEvery == 0
  /** every third sitemap host serves it gzip-compressed (S4) */
  def sitemapGz(s: WorldSpec, h: Int): Boolean = h % (3 * s.sitemapEvery) == 0
  def sitemapUrl(s: WorldSpec, h: Int): String =
    s"http://${hostName(h)}/sitemap.xml" + (if (sitemapGz(s, h)) ".gz" else "")
  def robotsUrl(h: Int): String = s"http://${hostName(h)}/robots.txt"
  def sitemapDocId(h: Int): String = s"sm$h"
  /** `<loc>` records of host h's sitemap — may point at other hosts. */
  def sitemapLocs(s: WorldSpec, h: Int): Seq[String] = {
    val n = 2 + h % 3
    (0 until n).map(i =>
      docUrl(s, pmod(mix(s.seed, 50L, h.toLong, i.toLong), s.nDocs).toLong)).distinct
  }
  def sitemapDocOf(s: WorldSpec, h: Int): Doc =
    Doc(sitemapDocId(h), sitemapLocs(s, h).zipWithIndex.map { case (loc, i) =>
      Span("sitemap-loc", loc, null, 10 * i)
    })
  def sitemapHosts(s: WorldSpec): Seq[Int] =
    (0 until s.nHosts).filter(h => hasSitemap(s, h))
  def sitemapEntries(s: WorldSpec): Seq[SitemapEntry] =
    sitemapHosts(s).flatMap { h =>
      val base = SitemapEntry(hostName(h), sitemapUrl(s, h))
      if (s.sitemapAltEvery > 0 && h % s.sitemapAltEvery == 0)
        // robots-declared loc with a non-http scheme: pushed anyway
        // (no scheme filter at push), DONE-IGNORED at fetch
        Seq(base, SitemapEntry(hostName(h), s"ftp://${hostName(h)}/sitemap-alt.xml"))
      else Seq(base)
    }
  private def sitemapUrlMap(s: WorldSpec): Seq[UrlMapEntry] =
    sitemapHosts(s).flatMap { h =>
      val locs = sitemapLocs(s, h)
      Seq(
        UrlMapEntry(robotsUrl(h), null, 200, null, "text/plain", 24L, null),
        UrlMapEntry(sitemapUrl(s, h), sitemapDocId(h), 200, null,
          if (sitemapGz(s, h)) "application/gzip" else "text/xml",
          100L + 50L * locs.size, null))
    }

  /** Response cookies of doc d's 200 response (G5, net.py:209-218). */
  def cookiesOf(s: WorldSpec, d: Long): Seq[Cookie] =
    if (s.cookieEvery > 0 && pmod(mix(s.seed, 36L, d), s.cookieEvery) == 0) {
      val n = 1 + pmod(mix(s.seed, 37L, d), 2)
      (0 until n).map { i =>
        Cookie(s"c$i", s"v${pmod(mix(s.seed, 38L, d, i.toLong), 1000)}",
          pmod(mix(s.seed, 39L, d, i.toLong), 2) == 0,
          pmod(mix(s.seed, 41L, d, i.toLong), 2) == 0,
          if (pmod(mix(s.seed, 42L, d, i.toLong), 2) == 0) "/" else "/p")
      }
    } else Nil

  /** `Link: <u>; rel="canonical"` response-header target of doc d (P7). */
  def canonicalHdrOf(s: WorldSpec, d: Long): String =
    if (s.canonicalHdrEvery > 0 && pmod(mix(s.seed, 35L, d), s.canonicalHdrEvery) == 0)
      docUrl(s, d) + "?chdr=1"
    else null

  // ---- redirect chains (multi-hop, net.py:106-107 TooManyRedirects) --
  def isChained(s: WorldSpec, d: Long): Boolean =
    s.redirectChainEvery > 0 && pmod(mix(s.seed, 60L, d), s.redirectChainEvery) == 0
  /** a quarter of the chained aliases LOOP (never resolve) — the
    * too-many-redirects DONE-KO path; local rule, no global scan */
  def chainLoops(s: WorldSpec, d: Long): Boolean =
    isChained(s, d) && pmod(mix(s.seed, 61L, d), 4) == 0
  def chainHopUrl(s: WorldSpec, d: Long, i: Int): String =
    s"http://${hostName(hostOf(s, d))}/rc$i/$d"

  /** Redirect alias entries for doc d: a single 301 hop by default;
    * with `redirectChainEvery`, every k-th doc's alias becomes a
    * bounded chain /r/d → /rc1/d → … → the doc URL (redirectChainLen
    * hops), and looping chains point their last hop back at /r/d.
    */
  def redirectEntriesOf(s: WorldSpec, d: Long): Seq[UrlMapEntry] = {
    def hop(u: String, to: String) =
      UrlMapEntry(u, null, 301, to, "text/html", 0L, null)
    if (!isChained(s, d)) Seq(hop(redirectUrl(s, d), docUrl(s, d)))
    else {
      val len = math.max(2, s.redirectChainLen)
      val urls = redirectUrl(s, d) +: (1 until len).map(i => chainHopUrl(s, d, i))
      val fin = if (chainLoops(s, d)) redirectUrl(s, d) else docUrl(s, d)
      val tgts = urls.drop(1) :+ fin
      urls.lazyZip(tgts).map(hop)
    }
  }

  def urlMapEntries(s: WorldSpec): Seq[UrlMapEntry] = {
    val docs = (0L until s.nDocs).map { d =>
      UrlMapEntry(docUrl(s, d), docId(d), 200, null, "text/html;charset=utf-8",
        100 + pmod(mix(s.seed, 10L, dupSource(s, d)), 5000).toLong, "text/html",
        canonicalHdrOf(s, d), cookiesOf(s, d))
    }
    val imgs = (0L until nImgs(s)).map { i =>
      val mish = s.mishmashEvery > 0 && pmod(mix(s.seed, 11L, i), s.mishmashEvery) == 0
      UrlMapEntry(imgUrl(s, i), imgDocId(i), 200, null, "image/png",
        1000 + pmod(mix(s.seed, 12L, i), 100000).toLong,
        if (mish) "image/jpeg" else "image/png")
    }
    val redirects = (0L until s.nDocs).flatMap(d => redirectEntriesOf(s, d))
    val missing = (0L until 20L).map { k =>
      UrlMapEntry(missingUrl(s, k), null, 404, null, "text/html", 0L, null)
    }
    docs ++ imgs ++ redirects ++ missing ++ sitemapUrlMap(s) ++ cssUrlMap(s)
  }

  def hostInfos(s: WorldSpec): Seq[HostInfo] =
    (0 until s.nHosts).map { h =>
      val delay =
        if (s.slowEvery > 0 && h % s.slowEvery == 1) Some(s.slowDelayS)
        else if (s.politeEvery > 0 && h % s.politeEvery == 0) Some(s.politeDelayS)
        else None
      HostInfo(hostName(h), delay, h)
    }

  def robotsRules(s: WorldSpec): Seq[RobotsRule] =
    (0 until s.nHosts).flatMap { h =>
      val base = Seq(RobotsRule(hostName(h), "*", "disallow", "/private"),
        RobotsRule(hostName(h), "*", "allow", "/"))
      val agentScoped =
        if (s.agentRuleEvery > 0 && h % s.agentRuleEvery == 0)
          Seq(
            // applies to the default configured agent (Model.CrawlConfig)
            RobotsRule(hostName(h), "Crawlcheck/1.1", "disallow", "/p/1"),
            // an unrelated agent's group — must be IGNORED by the crawl
            RobotsRule(hostName(h), "OtherBot", "disallow", "/"))
        else Nil
      base ++ agentScoped
    }

  /** Driver-local world for the serial oracle. */
  case class LocalWorld(
      docs: Map[String, Doc],
      urlMap: Map[String, UrlMapEntry],
      hosts: Map[String, HostInfo],
      rules: Seq[RobotsRule],
      sitemaps: Map[String, Seq[String]] = Map.empty)

  def localWorld(s: WorldSpec): LocalWorld = {
    val cssDocs =
      if (s.cssEvery <= 0) Nil
      else (0L until s.nDocs).map(d => cssDocId(d) -> cssDocOf(s, d))
    val docs = ((0L until s.nDocs).map(d => docId(d) -> docOf(s, d)) ++
      (0L until nImgs(s)).map(i => imgDocId(i) -> imgDocOf(s, i)) ++
      sitemapHosts(s).map(h => sitemapDocId(h) -> sitemapDocOf(s, h)) ++
      cssDocs).toMap
    LocalWorld(docs, urlMapEntries(s).map(e => e.url -> e).toMap,
      hostInfos(s).map(h => h.host -> h).toMap, robotsRules(s),
      sitemapEntries(s).groupBy(_.host).view.mapValues(_.map(_.loc)).toMap)
  }

  /** Distributed world: generated with spark.range → map over the same
    * pure functions; scales to arbitrary nDocs without driver state.
    */
  case class SparkWorld(
      docs: Dataset[Doc],
      urlMap: Dataset[UrlMapEntry],
      hosts: Dataset[HostInfo],
      rules: Dataset[RobotsRule],
      sitemaps: Dataset[SitemapEntry])

  def sparkWorld(spark: SparkSession, s: WorldSpec): SparkWorld = {
    import spark.implicits._
    val docs0 = spark.range(s.nDocs).map(d => docOf(s, d))
      .union(spark.range(nImgs(s)).map(i => imgDocOf(s, i)))
      .union(sitemapHosts(s).map(h => sitemapDocOf(s, h)).toDS())
    val docs =
      if (s.cssEvery <= 0) docs0
      else docs0.union(spark.range(s.nDocs).map(d => cssDocOf(s, d)))
    val urlMap = spark.range(s.nDocs).map(d =>
        UrlMapEntry(docUrl(s, d), docId(d), 200, null, "text/html;charset=utf-8",
          100 + pmod(mix(s.seed, 10L, dupSource(s, d)), 5000).toLong, "text/html",
          canonicalHdrOf(s, d), cookiesOf(s, d)))
      .union(spark.range(nImgs(s)).map { i =>
        val mish = s.mishmashEvery > 0 && pmod(mix(s.seed, 11L, i), s.mishmashEvery) == 0
        UrlMapEntry(imgUrl(s, i), imgDocId(i), 200, null, "image/png",
          1000 + pmod(mix(s.seed, 12L, i), 100000).toLong,
          if (mish) "image/jpeg" else "image/png")
      })
      .union(spark.range(s.nDocs).flatMap(d => redirectEntriesOf(s, d)))
      .union(spark.range(20).map(k =>
        UrlMapEntry(missingUrl(s, k), null, 404, null, "text/html", 0L, null)))
      .union(sitemapUrlMap(s).toDS())
      .union(cssUrlMap(s).toDS())
    SparkWorld(docs, urlMap, hostInfos(s).toDS(), robotsRules(s).toDS(),
      sitemapEntries(s).toDS())
  }

  /** Default seed list: first few doc URLs, including one with a
    * fragment and one %-encoded (exercises canonSeed P1-P2).
    */
  def seeds(s: WorldSpec, n: Int = 2): Seq[String] = {
    val base = (0L until math.min(n.toLong, s.nDocs.toLong)).map(d => docUrl(s, d))
    if (base.size < 2) base
    else base.updated(1, base(1) + "#top") // canonicalizes back to base(1)
  }
}
