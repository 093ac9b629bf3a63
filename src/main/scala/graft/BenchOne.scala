package graft
import graft.frontier.{CrawlDriver, CrawlRound}
import graft.model.CrawlConfig
import graft.synth.{WorldGen, WorldSpec}
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("BENCH1_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("BENCH1_PARTS", "64"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("BENCH1_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nDocs = sys.env.getOrElse("BENCH1_DOCS", "20000").toInt
    val cpus = sys.env.getOrElse("BENCH1_CPUS", "32").toInt
    val spec = WorldSpec("bench", nHosts = math.max(64, nDocs / 500), nDocs = nDocs,
      hotPct = 20, linkFan = 14,
      heavyText = sys.env.getOrElse("BENCH1_HEAVY", "0").toInt)
    val w = WorldGen.sparkWorld(spark, spec)
    val world = CrawlRound.WorldDF(w.docs.toDF(), w.urlMap.toDF(), w.hosts.toDF(), w.rules.toDF(),
      if (spec.sitemapEvery > 0) w.sitemaps.toDF() else null)
    // wide mode: every doc URL is a seed → one giant steady-state round
    // (the 10^10-frontier shape scaled down; round overhead amortized)
    val wide = sys.env.getOrElse("BENCH1_WIDE", "0") == "1"
    val nSeeds = sys.env.get("BENCH1_SEEDS").map(_.toLong)
      .getOrElse(if (wide) nDocs.toLong else math.min(512L, nDocs.toLong / 4))
    val cfg = CrawlConfig(seeds = (0L until nSeeds).map(d => WorldGen.docUrl(spec, d)),
      acceptedTypes = Seq("text/html", "image/png"),
      maxRounds = if (wide) 2 else 0)
    val dir = java.nio.file.Files.createTempDirectory("bench1").toString
    val t0 = System.nanoTime()
    val run = CrawlDriver.crawl(spark, world, cfg, dir)
    val n = run.crawlOrder.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"TOTAL fetched=$n sec=$sec%.1f thr=${n / sec}%.1f urls/sec")
    spark.stop()
  }
}
