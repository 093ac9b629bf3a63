package graft.model

/** Core data model of the crawl engine.
  *
  * Shapes mirror the reference's data model (see SURVEY.md §1):
  * the Transaction row (/root/reference/src/checker/transaction.py:18-37),
  * the relational output schema (mysql_tables.sql:1-71), and the
  * interleaved-docs input table required by BASELINE.json `input_hint`.
  */

/** One span of an interleaved text+media document (input_hint shape).
  * Span order within a document = sort by `offset`.
  *
  * `kind` ∈ text | media | link | img | iframe | frame | css-link |
  *          canonical | sitemap-loc | style | meta | script | mail.
  * For link-ish kinds `text` carries the href/src target (relative or
  * absolute); for `media` the payload lives behind `media_ref`.
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** A document row of the interleaved input table (input_hint shape). */
case class Doc(doc_id: String, spans: Seq[Span])

/** Host metadata synthesized with the world (robots crawl-delay etc.). */
case class HostInfo(host: String, crawl_delay_s: Option[Double], zipf_rank: Int)

/** One parsed robots.txt rule (reference fetches+parses via reppy,
  * robots.py:30-63; we synthesize the parsed form). `rule` is
  * "allow" | "disallow"; longest path_pref match wins, allow on tie.
  */
case class RobotsRule(host: String, agent: String, rule: String, path_pref: String)

/** One response cookie of a 200 fetch (net.py:209-218 __store_cookies;
  * journal.gotCookie → cookies table, mysql_tables.sql:56-64).
  */
case class Cookie(name: String, value: String, secure: Boolean,
    httpOnly: Boolean, path: String)

/** cookies fact row (mysql_tables.sql:56-64, database.py:171-176):
  * recorded for every transaction whose fetch reached a 200 response
  * (__process_link runs __store_cookies after the status gate and CT
  * extraction, BEFORE accepted-type filtering — so ignored-type
  * transactions still log their cookies).
  */
case class CookieRow(seq: Long, name: String, value: String, secure: Boolean,
    httpOnly: Boolean, path: String)

/** Fetch resolution table — replaces live HTTP (net.py:65-128).
  * `doc_id` null => no body (404 path); `redirect_to` non-null for 3xx
  * (single hop; requests follows transparently, net.py:121-123).
  * `detected_mime` models libmagic content sniffing (net.py:220-223).
  * `canonical_to` non-null models a `Link: <u>; rel="canonical"`
  * response header (canonical.py:22-28 rewrites the primary URI off it).
  */
case class UrlMapEntry(
    url: String,
    doc_id: String,
    status: Int,
    redirect_to: String,
    content_type: String,
    content_length: Long,
    detected_mime: String,
    canonical_to: String = null,
    /** response cookies of THIS entry (for a redirect, the engine and
      * oracle both record the TARGET entry's cookies — the final
      * response's jar, matching requests' transparent redirects) */
    cookies: Seq[Cookie] = Nil)

/** Sitemap membership per host (robots.py:72-83 + sitemap_scanner.py). */
case class SitemapEntry(host: String, loc: String)

/** Per-plugin acceptor gate (F12, core.py:274-285 + acceptor.py:28-54):
  * a plugin checks a transaction iff the content-type is in its
  * `contentTypes` ("*" = every type, dupdet.py's acceptType=True) AND
  * the transaction's uri matches one of its `uriRegexes` (Python
  * re.match ⇒ anchored at start). An EMPTY regex list disables the
  * plugin — RegexAcceptor.accept returns False for a plugin with no
  * configured regexes (acceptor.py:38-43).
  */
case class PluginGate(contentTypes: Seq[String], uriRegexes: Seq[String] = Seq(".*"))

object PluginGate {
  /** Defaults = each reference plugin's declared contentTypes with
    * accept-all URIs (the sample config's `.*`).
    */
  val defaults: Map[String, PluginGate] = Map(
    "dupdetect" -> PluginGate(Seq("*")), // dupdet.py acceptType always True
    "css_scraper" -> PluginGate(Seq("text/html")),
    "seo_meta" -> PluginGate(Seq("text/html")),
    "no_script" -> PluginGate(Seq("text/html")),
    "seo_images" -> PluginGate(Seq("text/html")),
    "mailer" -> PluginGate(Seq("text/html")),
    "non_semantic_html" -> PluginGate(Seq("text/html")),
    "tidyHtmlValidator" -> PluginGate(Seq("text/html")),
    "tinycss" -> PluginGate(Seq("text/css")),
    "links_finder" -> PluginGate(Seq("text/html")),
    "sitemap_scanner" -> PluginGate(
      Seq("application/gzip", "text/xml", "application/xml")))
}

/** A seed entry point (configLoader.py:14-18 EntryPointRecord): url
  * plus optional method and request data. `data` is ordered (Python
  * dict insertion order drives both urlencode and param-row order).
  */
case class SeedEntry(url: String, method: String = "GET",
    data: Seq[(String, String)] = Nil)

/** param fact row (mysql_tables.sql:20-25, database.py:185-189):
  * request data exploded at push-accept time (transaction.py:207-210,
  * `recordParams` default True). Only entry points carry data —
  * link pushes always create empty dicts (transaction.py:163-175).
  */
case class ParamRow(seq: Long, key: String, value: String)

/** Crawl configuration; defaults mirror configLoader.py:44-53. */
case class CrawlConfig(
    seeds: Seq[String],
    maxDepth: Int = 0, // 0 = unlimited (depth.py:23-24)
    agent: String = "Crawlcheck/1.1",
    rescheduleBoundS: Double = 5.0, // robots.py:96
    maxContentLength: Option[Long] = None,
    urlLimit: Option[Long] = None, // transaction.py:212-215
    recordHeaders: Boolean = true,
    /** URI regexes that gate touching at all (acceptor.py canTouch /
      * mightAccept); empty = accept everything (reference: a plugin
      * regex list; `.*` in the sample config).
      */
    uriRegexes: Seq[String] = Seq(".*"),
    /** Content types claimed by some plugin (core.py:40-46); a fetched
      * type outside this set is dropped by acceptedType.py:30-43.
      */
    acceptedTypes: Seq[String] = Seq("text/html", "text/css", "application/gzip", "text/plain"),
    /** Max crawl rounds (safety valve for the BSP loop; 0 = unlimited). */
    maxRounds: Int = 0,
    /** uri_normalizer filter plugin present (uri_normalizer.py:22-27):
      * rewrites the primary URI to its normalized form after the
      * robots gate, before the fetch.
      */
    normalizeUris: Boolean = false,
    /** sitemap_scanner.py:16-17 limits (50 MB / 50,000 records);
      * configurable so tests can exercise the defects at fixture scale.
      */
    sitemapMaxSize: Long = 50000000L,
    sitemapMaxRecords: Int = 50000,
    /** F12 per-plugin (contentTypes × uriRegex) dispatch tables;
      * defaults reproduce the reference plugins' declared gates.
      */
    pluginGates: Map[String, PluginGate] = PluginGate.defaults,
    /** Entry points with method/data (P15/G6); when non-empty they
      * REPLACE `seeds`. GET/HEAD data is urlencoded onto the fetch URL
      * (net.py:200-207) and recorded into the param table.
      */
    seedEntries: Seq[SeedEntry] = Nil,
    /** transaction.py:207-210 `recordParams`. */
    recordParams: Boolean = true,
    /** Max transparent redirect hops per fetch (requests'
      * session.max_redirects; net.py:104-107 surfaces TooManyRedirects
      * as NetworkError → core.py:141-143 __handle_err → DONE-KO with
      * NO defect row). A chain needing more hops than this — or a
      * redirect loop — dies DONE-KO. */
    maxRedirects: Int = 8) {
  /** The effective entry-point list. */
  def effectiveSeeds: Seq[SeedEntry] =
    if (seedEntries.nonEmpty) seedEntries else seeds.map(SeedEntry(_))
}

/** Verification status enum (database.py:54-58 + transaction.py:146). */
object VerificationStatus {
  val Requested = "REQUESTED"
  val Processing = "PROCESSING"
  val Verifying = "VERIFYING"
  val DoneOk = "DONE - OK"
  val DoneKo = "DONE - KO"
  val DoneIgnored = "DONE - IGNORED"
}

/** One frontier row (the reference's Transaction, transaction.py:18-37).
  *
  * `seq`  — the reference's global `idno` (transaction.py:102-115):
  *          assigned at creation for EVERY extracted link, duplicates
  *          included; gaps in the enqueued sequence are therefore real.
  * `pos`  — queue arrival position: dense order of actually-enqueued
  *          rows; FIFO pop order == pos order (transaction.py:131).
  * `srcSeq` — parent seq (−1 for seeds).
  * `expected` — expected content-type prefix ("image/" for <img>).
  */
case class FrontierEntry(
    seq: Long,
    pos: Long,
    uri: String,
    depth: Int,
    srcSeq: Long,
    method: String,
    expected: Option[String])

/** transactions table row (mysql_tables.sql:1-13). */
case class TransactionRow(
    seq: Long,
    method: String,
    uri: String,
    responseStatus: Option[Int],
    contentType: Option[String],
    verificationStatus: String,
    depth: Int,
    expected: Option[String])

/** link table row (mysql_tables.sql:27-40): edge from the parent
  * transaction (`fromSeq` = requestId) to `toUri`; `toSeq` is the
  * created transaction's seq (responseId) — fresh even for duplicates
  * (transaction.py:159-161).
  */
case class LinkRow(fromSeq: Long, toUri: String, toSeq: Long, processed: Boolean)

/** defect fact row (mysql_tables.sql:48-54); `typeName` is resolved to
  * a first-seen dense id in the report layer (database.py:156-169).
  */
case class DefectRow(responseSeq: Long, typeName: String, evidence: String, severity: Double)

/** headers fact row (mysql_tables.sql:20-25, database.py:66-71): the
  * transaction's REQUEST headers — Referer (set at link creation,
  * transaction.py:174), User-Agent and Accept (set at fetch,
  * net.py:78-79) — recorded by startChecking for DONE-OK transactions
  * only, gated by `recordHeaders` (database.py:254-257).
  */
case class HeaderRow(seq: Long, name: String, value: String)

/** aliases fact row (mysql_tables.sql:15-18). */
case class AliasRow(seq: Long, uri: String)

/** URL-seen membership ((defragged uri, method) pair —
  * transaction.py:196-205; only the primary URI keys membership, see
  * SURVEY.md D2 on the reference's alias-loop quirk).
  */
case class SeenRow(uri: String, method: String, seq: Long)

/** Per-host politeness state (robots.py:65-70): virtual-clock time of
  * the host's last fetch, in seconds.
  */
case class HostState(host: String, lastVisitS: Double)

/** Per-round lineage counts (north-rule requirement). The durable
  * per-partition split is written as `kind=lineage` rows INSIDE each
  * round's delta (CrawlRound keys them by spark_partition_id); the
  * manifest records per-metric TOTALS observed on the write job
  * (CollectMetrics), validated against the committed rows at every
  * compaction (CrawlDriver's seen-count invariant).
  */
case class LineageRow(
    round: Int,
    partitionId: Int,
    frontierIn: Long,
    fetched: Long,
    discovered: Long,
    deduped: Long)
