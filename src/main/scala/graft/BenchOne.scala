package graft
import graft.frontier.{CrawlDriver, CrawlRound}
import graft.model.CrawlConfig
import org.apache.spark.scheduler._
import graft.synth.{WorldGen, WorldSpec}
import org.apache.spark.sql.SparkSession

/** Dev measurement harness for the crawl's scaling profile: one crawl,
  * with a listener that decomposes wall-clock into per-job wall time,
  * summed task time, and stage counts — the gap between wall and
  * task-time/cores is the core-count-independent critical path
  * (driver planning, stage barriers, commit) that caps N→4N scaling.
  */
object BenchOne {

  final class Profiler extends SparkListener {
    case class J(id: Int, t0: Long, var t1: Long = 0L, var stages: Int = 0,
        var tasks: Int = 0, var taskMs: Long = 0L)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    private val stageToJob = scala.collection.mutable.HashMap.empty[Int, Int]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      jobs(e.jobId) = J(e.jobId, e.time)
      e.stageIds.foreach(s => stageToJob(s) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.t1 = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      val j = stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get)
      j.foreach(_.stages += 1)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      val j = stageToJob.get(e.stageId).flatMap(jobs.get)
      j.foreach { x => x.tasks += 1; x.taskMs += e.taskInfo.duration }
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("BENCH1_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("BENCH1_PARTS", "64"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("BENCH1_AQE", "true"))
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val prof = new Profiler
    spark.sparkContext.addSparkListener(prof)
    val nDocs = sys.env.getOrElse("BENCH1_DOCS", "20000").toInt
    val spec = WorldSpec("bench", nHosts = math.max(64, nDocs / 500), nDocs = nDocs,
      hotPct = 20, linkFan = 10,
      heavyText = sys.env.getOrElse("BENCH1_HEAVY", "2").toInt)
    val w = WorldGen.sparkWorld(spark, spec)
    val world = CrawlRound.WorldDF(w.docs.toDF(), w.urlMap.toDF(), w.hosts.toDF(), w.rules.toDF(),
      if (spec.sitemapEvery > 0) w.sitemaps.toDF() else null)
    // wide mode: every doc URL is a seed → one giant steady-state round
    // (the 10^10-frontier shape scaled down; round overhead amortized)
    val wide = sys.env.getOrElse("BENCH1_WIDE", "1") == "1"
    val nSeeds = sys.env.get("BENCH1_SEEDS").map(_.toLong)
      .getOrElse(if (wide) nDocs.toLong else math.min(512L, nDocs.toLong / 4))
    val cfg = CrawlConfig(seeds = (0L until nSeeds).map(d => WorldGen.docUrl(spec, d)),
      acceptedTypes = Seq("text/html", "image/png"),
      maxRounds = if (wide) 3 else 0)
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val dir = java.nio.file.Files.createTempDirectory(base, "bench1")
    val t0 = System.nanoTime()
    val run = CrawlDriver.crawl(spark, world, cfg, dir.toString)
    val n = run.crawlOrder.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"TOTAL fetched=$n sec=$sec%.1f thr=${n / sec}%.1f urls/sec cpus=$cpus")
    val (jobWall, taskMs, stages) = prof.jobs.values.foldLeft((0L, 0L, 0)) {
      case ((w0, t, s), j) => (w0 + (j.t1 - j.t0), t + j.taskMs, s + j.stages)
    }
    println(f"JOBS n=${prof.jobs.size} stages=$stages jobWall=${jobWall / 1e3}%.1fs " +
      f"taskTime=${taskMs / 1e3}%.1fs taskTime/cores=${taskMs / 1e3 / cpus}%.1fs " +
      f"gapInsideJobs=${(jobWall - taskMs / cpus) / 1e3}%.1fs " +
      f"gapOutsideJobs=${(sec - jobWall / 1e3)}%.1fs")
    if (sys.env.contains("BENCH1_JOBS"))
      prof.jobs.values.foreach { j =>
        println(f"  job ${j.id}%3d wall=${(j.t1 - j.t0) / 1e3}%6.2fs stages=${j.stages}%3d " +
          f"tasks=${j.tasks}%5d taskTime=${j.taskMs / 1e3}%7.1fs")
      }
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    spark.stop()
  }
}
