package graft.report

import graft.frontier.CrawlDriver.CrawlRun
import graft.model.VerificationStatus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Report layer (SURVEY.md §3.3): the reference's only genuinely
  * relational queries (database.py:264-459) over the crawl outputs.
  */
object Report {

  /** Defect-type dimension with first-seen dense ids (A1,
    * database.py:156-169): id order = first emission order, which is
    * (popPos, phase, sub) — a TOTAL order by construction (`sub` is the
    * within-phase emission index), so ids are deterministic and match
    * the reference's serial emission. The single-partition window is
    * fine here: its input is one row per defect TYPE (a small, bounded
    * universe), not per defect. The constant partition key is a
    * DynLiteral because Spark 4's EliminateWindowPartitions folds a
    * plain lit(0) away (which would re-trip WindowExec's no-partition
    * warning).
    */
  def defectTypes(run: CrawlRun): DataFrame = {
    run.defects
      .groupBy(col("typeName"))
      .agg(min(struct(col("popPos"), col("phase"), col("sub"))).as("firstSeen"))
      .withColumn("id", row_number().over(
        Window.partitionBy(graft.plans.Dyn.dynInt(0)).orderBy(col("firstSeen"))).cast("long") - 1)
      .select(col("id"), col("typeName").as("type"))
  }

  /** J1 + O3 (database.py:311-320): invalid links = defects of type
    * badlink/timeout joined to their transaction, ORDER BY severity, uri.
    */
  def invalidLinks(run: CrawlRun): DataFrame = {
    val d = run.defects.filter(col("typeName").isin("badlink", "timeout", "neterr"))
    val tx = run.transactions.select(col("seq"), col("uri"), col("depth"))
    d.join(tx, d("responseSeq") === tx("seq"), "left")
      .select(col("typeName").as("type"), col("evidence"), col("severity"),
        col("uri"), col("depth"))
      .orderBy(col("severity"), col("uri"), col("evidence"))
  }

  /** J1 + O4 (database.py:322-332): other defects,
    * ORDER BY severity DESC, type, uri.
    */
  def otherDefects(run: CrawlRun): DataFrame = {
    val d = run.defects.filter(!col("typeName").isin("badlink", "timeout", "neterr"))
    val types = defectTypes(run)
    val tx = run.transactions.select(col("seq"), col("uri"))
    d.join(broadcast(types), d("typeName") === types("type"))
      .join(tx, d("responseSeq") === tx("seq"), "left")
      .select(col("id").as("typeId"), col("type"), col("evidence"),
        col("severity"), col("uri"))
      .orderBy(col("severity").desc, col("type"), col("uri"), col("evidence"))
  }

  /** J2 (database.py:375-412): edge list joined to BOTH endpoints;
    * good = target not DONE-KO; plus the proc/total/good stats (A2).
    */
  def linkReport(run: CrawlRun): DataFrame = {
    val links = run.linksWithProcessed
    val tx = run.transactions
    val req = tx.select(col("seq").as("fromSeq"), col("uri").as("fromUri"))
    val resp = tx.select(col("seq").as("respSeq"), col("uri").as("respUri"),
      col("verificationStatus").as("respStatus"))
    // the duplicate link's own seq has no transaction row; resolve the
    // response endpoint by toUri's first-seen seq instead (the reference
    // joins on uri-matched rows, database.py:389-396)
    val firstSeen = run.seen.select(col("uri").as("toUri"), col("seq").as("respSeq"))
    links.join(req, Seq("fromSeq"), "left")
      .join(firstSeen, Seq("toUri"), "left")
      .join(resp, Seq("respSeq"), "left")
      .withColumn("good",
        col("respStatus").isNull || col("respStatus") =!= VerificationStatus.DoneKo)
      .select(col("fromSeq"), col("fromUri"), col("toUri"), col("processed"), col("good"))
  }

  /** A2 link statistics (database.py:379-411). */
  def linkStats(run: CrawlRun): DataFrame =
    linkReport(run).agg(
      count(lit(1)).as("total"),
      sum(when(col("processed"), 1L).otherwise(0L)).as("processed"),
      sum(when(col("good"), 1L).otherwise(0L)).as("good"),
      round(sum(when(col("processed"), 1L).otherwise(0L)) * 100.0 / count(lit(1)), 2)
        .as("pct_processed"))

  /** J4/O5 parent-id enrichment (database.py:439-455): for every
    * transaction of depth > 0, the reference runs
    * `SELECT responseId FROM link WHERE requestId=? AND processed LIMIT 1`.
    * log_link stores requestId = new_id (the CHILD) and responseId =
    * parent_id (database.py:90,150-154), so the lookup is keyed on the
    * CHILD side: the processed link whose toSeq == t.seq yields t's
    * parent (its fromSeq); −1 when none. toSeq is unique across link
    * rows (every created transaction consumes a fresh idno), so the
    * reference's un-ordered LIMIT 1 is deterministic; min(fromSeq) is a
    * defensive tie-break only.
    */
  def parentIds(run: CrawlRun): DataFrame = {
    val creating = run.linksWithProcessed.filter(col("processed"))
      .groupBy(col("toSeq")).agg(min(col("fromSeq")).as("parentSeq"))
    run.transactions.filter(col("depth") > 0)
      .join(creating, col("seq") === col("toSeq"), "left")
      .select(col("seq"), coalesce(col("parentSeq"), lit(-1L)).as("parentId"))
  }

  /** Tidy defect-code assignment (A5 engine-side,
    * tidy_html_validator.py:86-110): each NEW message description gets
    * code `<letter><n>` where letter = category initial (Warning/Error/
    * Info, anything else → X) and n counts up per letter in
    * first-emission order — (popPos, phase, sub) is the total emission
    * order, so the serial counter is reproducible distributively.
    * Replicated reference quirk: `__get_code`'s Error branch assigns to
    * `self._max_err` (single underscore — a fresh attribute), so the
    * real Error counter NEVER increments and every new Error
    * description gets E0.
    */
  def tidyCodes(run: CrawlRun): DataFrame = {
    val d = run.defects.filter(col("typeName").startsWith("tidy:"))
      .withColumn("cat", split(col("typeName"), ":").getItem(1))
      .withColumn("desc", regexp_replace(col("typeName"), "^tidy:[^:]*:", ""))
    // __get_code keys self.__codes by desc ALONE (tidy_html_validator
    // .py:86-110): a desc first emitted as Warning and later re-emitted
    // as Error keeps the W-code. The letter therefore comes from the
    // category of the desc's FIRST emission (min over the total
    // emission order; `cat` rides along in the struct).
    val codes = d
      .groupBy(col("desc"))
      .agg(min(struct(col("popPos"), col("phase"), col("sub"), col("cat")))
        .as("firstSeen"))
      .withColumn("letter",
        when(col("firstSeen.cat").isin("Warning", "Error", "Info"),
          substring(col("firstSeen.cat"), 1, 1)).otherwise(lit("X")))
      .withColumn("num",
        when(col("letter") === "E", lit(0)) // reference _max_err typo
          .otherwise(row_number().over(
            Window.partitionBy(col("letter")).orderBy(col("firstSeen"))) - 1))
      .select(concat(col("letter"), col("num")).as("code"), col("desc"))
    d.select(col("typeName"), col("desc")).distinct()
      .join(codes, Seq("desc"))
      .select(col("code"), col("desc"), col("typeName"))
  }

  /** G7 tidy validator rows with resolved codes (one row per validator
    * message, the reference's defect shape: code, description,
    * evidence=[category, location], severity).
    */
  def tidyDefects(run: CrawlRun): DataFrame =
    run.defects.filter(col("typeName").startsWith("tidy:"))
      .join(broadcast(tidyCodes(run)), Seq("typeName"))
      .select(col("code"), col("desc"), col("evidence"), col("severity"),
        col("responseSeq"), col("popPos"), col("sub"))
      .orderBy(col("popPos"), col("sub"))

  /** G4 headers per transaction (database.py:66-71 log_header view). */
  def headerReport(run: CrawlRun): DataFrame =
    run.headers.orderBy(col("seq"), col("name"))

  /** J3 cookies ⋈ transactions (database.py:334-338 get_cookies):
    * `SELECT transactions.uri, cookies.name, cookies.value FROM cookies
    *  INNER JOIN transactions ON cookies.responseId = transactions.id`.
    */
  def cookieReport(run: CrawlRun): DataFrame = {
    val tx = run.transactions.select(col("seq"), col("uri"))
    run.cookies.join(tx, Seq("seq"))
      .select(col("uri"), col("name"), col("value"))
      .orderBy(col("uri"), col("name"), col("value"))
  }

  /** J5 aliases per transaction as an array column (database.py:456-458). */
  def aliasesPerTransaction(run: CrawlRun): DataFrame =
    run.aliases.groupBy(col("seq")).agg(sort_array(collect_list(col("uri"))).as("aliases"))

  /** S6 sitemap.xml generator (sitemap_generator.py:34-64): DONE-OK
    * URIs matching the regex, XML urlset written driver-side (the
    * report artifact is small; the scan/filter is distributed).
    */
  def sitemapXml(run: CrawlRun, uriRegex: String): String = {
    val urls = run.transactions
      .filter(col("verificationStatus") === VerificationStatus.DoneOk &&
        col("uri").rlike(uriRegex))
      .select(col("uri")).orderBy(col("uri"))
      .collect().map(_.getString(0))
    val items = urls.map(u => s"  <url><loc>${xmlEscape(u)}</loc></url>").mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
       |$items
       |</urlset>""".stripMargin
  }

  /** S7 YAML report exporter (yaml_exporter.py:24-33): the full payload
    * (transactions + links + defects) as YAML, driver-side writer over
    * distributed scans.
    */
  def yamlReport(run: CrawlRun, maxRows: Int = 10000): String = {
    def yStr(s: String): String =
      if (s == null) "null" else "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val sb = new StringBuilder("transactions:\n")
    run.transactions.orderBy(col("seq")).limit(maxRows).collect().foreach { r =>
      sb.append(s"- seq: ${r.getLong(0)}\n  uri: ${yStr(r.getString(2))}\n")
        .append(s"  status: ${yStr(r.getString(5))}\n  depth: ${r.getInt(6)}\n")
    }
    sb.append("links:\n")
    linkReport(run).orderBy(col("fromSeq"), col("toUri")).limit(maxRows).collect().foreach { r =>
      sb.append(s"- from: ${r.getLong(0)}\n  to: ${yStr(r.getString(2))}\n")
        .append(s"  processed: ${r.getBoolean(3)}\n  good: ${r.getBoolean(4)}\n")
    }
    sb.append("defects:\n")
    run.defects.orderBy(col("popPos"), col("phase")).limit(maxRows).collect().foreach { r =>
      sb.append(s"- type: ${yStr(r.getString(3))}\n  evidence: ${yStr(r.getString(4))}\n")
        .append(s"  severity: ${r.getDouble(5)}\n  responseSeq: ${r.getLong(2)}\n")
    }
    sb.toString
  }

  /** S8 REST report exporter (report_exporter.py:27-63): the same
    * payload S7 serializes, shipped over HTTP — HEAD-probe
    * `<reportUrl>/data` (warn, don't fail, when the API is down,
    * :32-36), optionally DELETE the previous report when `cleanReport`
    * (:45-53), then POST the YAML as a form-encoded `payload` field
    * (:55-60). Transport errors log and return -1 (the reference logs
    * ConnectionError and continues — the crawl result is never
    * hostage to the report server). Pure `java.net.http` against a
    * caller-supplied URL; ReportSpec drives it against an in-process
    * loopback server — no external service in the build or tests.
    */
  def restExport(payloadYaml: String, reportUrl: String,
      cleanReport: Boolean = false): Int = {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val data = java.net.URI.create(reportUrl + "/data")
    val client = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(5)).build()
    def send(r: HttpRequest): Int =
      try client.send(r, HttpResponse.BodyHandlers.discarding()).statusCode()
      catch { case _: java.io.IOException => -1 }
    val head = send(HttpRequest.newBuilder(data)
      .method("HEAD", HttpRequest.BodyPublishers.noBody()).build())
    if (head != 200)
      System.err.println("[report_exporter] Is report REST API running?")
    if (cleanReport) {
      val del = send(HttpRequest.newBuilder(data).DELETE().build())
      if (del != 200) System.err.println("[report_exporter] Delete failed")
    }
    val form = "payload=" +
      java.net.URLEncoder.encode(payloadYaml, "UTF-8")
    val post = send(HttpRequest.newBuilder(data)
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form)).build())
    if (post != 200) System.err.println("[report_exporter] Upload failed")
    post
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
