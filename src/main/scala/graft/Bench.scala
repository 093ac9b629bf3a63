package graft

import graft.frontier.{CrawlDriver, CrawlRound}
import graft.model.CrawlConfig
import graft.synth.{WorldGen, WorldSpec}
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * Two parts:
  *  1. `queries`: per-operator timings of SparkEntry.queries over
  *     SPARK_GRAFT_SF_DIR (driver's TPC-H-ish tables).
  *  2. the headline crawl metric (BASELINE.json): URLs fetched+deduped
  *     per second over a synthetic frontier, measured at two
  *     parallelism levels on the same input — local[8] and local[32] —
  *     with scaling efficiency = thr32 / (4 · thr8) (sandbox evidence
  *     protocol for the N→4N executor criterion; BASELINE.md).
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (query part),
  * SPARK_GRAFT_BENCH_DOCS (world size, default 20000),
  * SPARK_GRAFT_SCALING=0 disables the two-level scaling run (then only
  * CPUS-level throughput is reported).
  */
object Bench {

  private def session(cpus: Int, parts: Int = 0): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      // the partition count is a property of the DATA, not of the
      // cluster size — fixed across the two parallelism levels exactly
      // like a real N-vs-4N-executor comparison keeps the job identical
      .config("spark.sql.shuffle.partitions",
        (if (parts > 0) parts else cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full crawl over the bench world; returns (urls fetched+deduped,
    * sec). The world is the 10^10-frontier STEADY-STATE shape scaled
    * down: a wide frontier (every doc URL seeded) crawled for 3 BSP
    * rounds — fat rounds whose parallel work dominates the per-round
    * fixed cost, which is what the N→4N scaling criterion measures.
    * Snapshots go to /dev/shm: on a cluster the snapshot store is
    * distributed storage whose bandwidth scales with executors; the
    * sandbox's single virtio disk is not the modeled resource and its
    * page-flush stalls were the dominant run-to-run noise.
    */
  private def crawlOnce(cpus: Int, nDocs: Int): (Long, Double) = {
    val spark = session(cpus, parts = 64)
    try {
      val spec = WorldSpec("bench", nHosts = math.max(64, nDocs / 500),
        nDocs = nDocs, hotPct = 20, linkFan = 10, heavyText = 2)
      val w = WorldGen.sparkWorld(spark, spec)
      val world = CrawlRound.WorldDF(w.docs.toDF(), w.urlMap.toDF(),
        w.hosts.toDF(), w.rules.toDF(),
        if (spec.sitemapEvery > 0) w.sitemaps.toDF() else null)
      val cfg = CrawlConfig(
        seeds = (0L until nDocs.toLong).map(d => WorldGen.docUrl(spec, d)),
        acceptedTypes = Seq("text/html", "image/png"),
        maxRounds = 3)
      val shm = new java.io.File("/dev/shm")
      val base = if (shm.isDirectory && shm.canWrite) shm.toPath
        else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      val dir = java.nio.file.Files.createTempDirectory(base, s"bench-crawl-$cpus")
      try {
        val t0 = System.nanoTime()
        val run = CrawlDriver.crawl(spark, world, cfg, dir.toString)
        val fetched = run.crawlOrder.count()
        val sec = (System.nanoTime() - t0) / 1e9
        (fetched, sec)
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "20000").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    // part 1: operator queries on the driver's parquet tables; a
    // failing query is REPORTED, never silently timed as if it ran
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results: Map[String, Double] =
      if (sys.env.getOrElse("SPARK_GRAFT_QUERIES", "1") != "1") Map.empty
      else {
        val spark = session(cpus)
        val r = SparkEntry.queries.map { case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch {
            case e: Throwable =>
              failed += name
              System.err.println(s"[bench] query $name FAILED: ${e.getMessage}")
          }
          name -> (System.nanoTime() - t0) / 1e9
        }
        spark.stop()
        r
      }

    // part 2: crawl throughput at two parallelism levels
    val (f8, s8) = crawlOnce(8, benchDocs)
    val thr8 = f8 / s8
    val (f32, s32, thr32, eff) =
      if (doScaling) {
        val (f, s) = crawlOnce(32, benchDocs)
        val t = f / s
        (f, s, t, t / (4.0 * thr8))
      } else (f8, s8, thr8, 1.0)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(
      s"""{"metric":"crawl_urls_per_sec","value":$thr32,"unit":"urls/sec",""" +
      s""""queries":$qs,"queries_total_sec":$total,"queries_failed":$failedJson,""" +
      s""""sf":"$sfDir",""" +
      s""""crawl":{"docs":$benchDocs,"fetched8":$f8,"sec8":$s8,"thr8":$thr8,""" +
      s""""fetched32":$f32,"sec32":$s32,"thr32":$thr32,"scaling_efficiency":$eff}}""")
  }
}
