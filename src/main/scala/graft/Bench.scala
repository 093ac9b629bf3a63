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

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full crawl over the bench world; returns (urls fetched+deduped, sec). */
  private def crawlOnce(cpus: Int, nDocs: Int): (Long, Double) = {
    val spark = session(cpus)
    try {
      val spec = WorldSpec("bench", nHosts = math.max(8, nDocs / 200),
        nDocs = nDocs, hotPct = 20)
      val w = WorldGen.sparkWorld(spark, spec)
      val world = CrawlRound.WorldDF(w.docs.toDF(), w.urlMap.toDF(), w.hosts.toDF(), w.rules.toDF())
      val cfg = CrawlConfig(seeds = WorldGen.seeds(spec, 4),
        acceptedTypes = Seq("text/html", "image/png"))
      val dir = java.nio.file.Files.createTempDirectory(s"bench-crawl-$cpus").toString
      val t0 = System.nanoTime()
      val run = CrawlDriver.crawl(spark, world, cfg, dir)
      val fetched = run.crawlOrder.count()
      val sec = (System.nanoTime() - t0) / 1e9
      (fetched, sec)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "20000").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    // part 1: operator queries on the driver's parquet tables
    val spark = session(cpus)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

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
    println(
      s"""{"metric":"crawl_urls_per_sec","value":$thr32,"unit":"urls/sec",""" +
      s""""queries":$qs,"queries_total_sec":$total,"sf":"$sfDir",""" +
      s""""crawl":{"docs":$benchDocs,"fetched8":$f8,"sec8":$s8,"thr8":$thr8,""" +
      s""""fetched32":$f32,"sec32":$s32,"thr32":$thr32,"scaling_efficiency":$eff}}""")
  }
}
