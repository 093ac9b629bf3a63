package graft.report

import graft.frontier.{CrawlDriver, CrawlRound}
import graft.model._
import graft.oracle.RefCrawlOracle
import graft.synth.{WorldGen, WorldSpec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Report-layer checks (S6/S7, O3/O4, A1 ids, J4 parent lookup) over one
  * shared tiny crawl, verified against the serial oracle where the
  * reference defines exact semantics.
  */
class ReportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val spec = WorldSpec("report-world", nHosts = 3, nDocs = 25,
    redirectEvery = 4, metaEvery = 2, mailEvery = 5, imgEvery = 3, tidyEvery = 2)
  private lazy val cfg = CrawlConfig(seeds = WorldGen.seeds(spec),
    acceptedTypes = Seq("text/html", "image/png"))
  private lazy val oracle = RefCrawlOracle.crawl(WorldGen.localWorld(spec), cfg)
  private lazy val run: CrawlDriver.CrawlRun = {
    val w = WorldGen.sparkWorld(spark, spec)
    val world = CrawlRound.WorldDF(w.docs.toDF(), w.urlMap.toDF(),
      w.hosts.toDF(), w.rules.toDF())
    CrawlDriver.crawl(spark, world, cfg,
      Files.createTempDirectory("report-world").toString)
  }

  test("defectTypes: dense 0-based first-seen ids, one per type") {
    val rows = Report.defectTypes(run).collect()
    val ids = rows.map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until rows.length.toLong))
    assert(rows.map(_.getString(1)).distinct.length == rows.length)
    // first id belongs to the earliest-emitted defect type in the oracle
    val firstType = oracle.defects.minBy(d => (d.popPos, d.phase, d.sub))
      .defect.typeName
    assert(rows.find(_.getLong(0) == 0L).get.getString(1) == firstType)
  }

  test("invalidLinks (O3) and otherDefects (O4) are ordered as the reference sorts") {
    val inv = Report.invalidLinks(run).collect()
      .map(r => (r.getDouble(2), Option(r.getString(3)).getOrElse("")))
    assert(inv.sameElements(inv.sorted), "invalidLinks must sort by severity, uri")
    val oth = Report.otherDefects(run).collect()
      .map(r => (-r.getDouble(3), r.getString(1), Option(r.getString(4)).getOrElse("")))
    assert(oth.sameElements(oth.sorted), "otherDefects must sort by severity desc, type, uri")
    assert(inv.nonEmpty && oth.nonEmpty)
  }

  test("parentIds (J4): processed creating-link's parent per transaction, -1 fallback") {
    val got = Report.parentIds(run).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference semantics (database.py:443-445 + log_link at :150-154):
    // requestId = child id, responseId = parent id — key on the child side
    val expected = oracle.transactions.values.filter(_.depth > 0).map { t =>
      val parent = oracle.links.find(l => l.toSeq == t.seq && l.processed)
        .map(_.fromSeq).getOrElse(-1L)
      t.seq -> parent
    }.toMap
    assert(got == expected)
    // non-vacuous: some transaction must actually resolve a parent
    assert(expected.values.exists(_ >= 0L))
  }

  test("sitemapXml (S6) lists exactly the DONE-OK URIs matching the regex") {
    val xml = Report.sitemapXml(run, "^http://h00")
    assert(xml.startsWith("""<?xml version="1.0""""))
    val okUris = oracle.transactions.values
      .filter(t => t.verificationStatus == VerificationStatus.DoneOk)
      .map(_.uri).toSet
    val listed = "<loc>([^<]*)</loc>".r.findAllMatchIn(xml).map(_.group(1)).toSet
    assert(listed == okUris.filter(_.startsWith("http://h00")))
  }

  test("yamlReport (S7) carries all three sections with row counts") {
    val y = Report.yamlReport(run)
    assert(y.startsWith("transactions:\n"))
    assert(y.contains("\nlinks:\n") && y.contains("\ndefects:\n"))
    val txLines = y.linesIterator.count(_.startsWith("- seq: "))
    assert(txLines == oracle.transactions.size)
  }

  test("tidyCodes (A5/G7): serial per-letter counters, Error pinned at E0 (ref typo)") {
    // serial twin of tidy_html_validator.__get_code over the oracle's
    // emission order
    val maxes = scala.collection.mutable.Map('W' -> 0, 'I' -> 0, 'X' -> 0)
    val codes = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (d <- oracle.defects.sortBy(x => (x.popPos, x.phase, x.sub))
         if d.defect.typeName.startsWith("tidy:")) {
      val cat = d.defect.typeName.split(":", 3)(1)
      val desc = d.defect.typeName.split(":", 3)(2)
      if (!codes.contains(desc)) {
        val letter = if (Set("Warning", "Error", "Info")(cat)) cat.head else 'X'
        val code =
          if (letter == 'E') "E0" // _max_err typo: never increments
          else { val n = maxes(letter); maxes(letter) = n + 1; s"$letter$n" }
        codes(desc) = code
      }
    }
    assert(codes.nonEmpty, "report world must emit tidy messages")
    // the desc-keyed quirk is only tested if SOME desc shows up under
    // two categories (WorldGen plants "trimming empty <p>" as both
    // Warning and Error)
    val catsPerDesc = oracle.defects.map(_.defect.typeName)
      .filter(_.startsWith("tidy:")).map(_.split(":", 3))
      .groupBy(_(2)).map { case (d, rows) => d -> rows.map(_(1)).toSet }
    assert(catsPerDesc.exists(_._2.size > 1),
      "world must emit at least one desc under two categories")
    val got = Report.tidyCodes(run).collect()
      .map(r => r.getString(1) -> r.getString(0)).toMap
    assert(got == codes.toMap, s"got $got expected $codes")
  }

  test("linkStats (A2) totals match the oracle link multiset") {
    val r = Report.linkStats(run).head()
    assert(r.getLong(0) == oracle.links.size.toLong)
    assert(r.getLong(1) == oracle.links.count(_.processed).toLong)
  }

  test("restExport (S8): HEAD probe, DELETE on cleanreport, form-encoded POST payload") {
    // in-process loopback server standing in for the report REST API
    // (report_exporter.py POSTs payload=<yaml> to <report>/data and
    // DELETEs first when cleanreport) — no external service
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val srv = com.sun.net.httpserver.HttpServer
      .create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/data", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      calls.synchronized { calls += ((ex.getRequestMethod, body)) }
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    srv.start()
    try {
      val url = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val payload = Report.yamlReport(run, maxRows = 5)
      assert(payload.contains("transactions:") && payload.contains("defects:"))
      assert(Report.restExport(payload, url, cleanReport = true) == 200)
      val seq = calls.synchronized(calls.toList)
      assert(seq.map(_._1) == List("HEAD", "DELETE", "POST"),
        s"reference call order: ${seq.map(_._1)}")
      val posted = java.net.URLDecoder.decode(
        seq.last._2.stripPrefix("payload="), "UTF-8")
      assert(posted == payload, "POST body must round-trip the YAML payload")
      // without cleanreport: no DELETE (report_exporter.py:45-53)
      calls.synchronized(calls.clear())
      assert(Report.restExport(payload, url) == 200)
      assert(calls.synchronized(calls.toList.map(_._1)) == List("HEAD", "POST"))
    } finally srv.stop(0)
    // down API: transport error logs and returns -1, never throws
    assert(Report.restExport("x", "http://127.0.0.1:1") == -1)
  }
}
