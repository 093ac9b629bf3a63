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
        var tasks: Int = 0, var taskMs: Long = 0L, var desc: String = "",
        var cpuNs: Long = 0L, var waitMs: Long = 0L)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    private val stageToJob = scala.collection.mutable.HashMap.empty[Int, Int]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val d = e.stageInfos.lastOption.map { si =>
        val graft = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("BenchOne")).getOrElse("")
        si.name.take(40) + " | " + graft.trim.take(70)
      }.getOrElse("")
      jobs(e.jobId) = J(e.jobId, e.time, desc = d.take(120))
      e.stageIds.foreach(s => stageToJob(s) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.t1 = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      val j = stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get)
      j.foreach(_.stages += 1)
    }
    var gcMs = 0L
    var cpuNs = 0L
    var deserMs = 0L
    var srvMs = 0L
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      val j = stageToJob.get(e.stageId).flatMap(jobs.get)
      j.foreach { x => x.tasks += 1; x.taskMs += e.taskInfo.duration }
      Option(e.taskMetrics).foreach { m =>
        gcMs += m.jvmGCTime
        cpuNs += m.executorCpuTime
        deserMs += m.executorDeserializeTime
        srvMs += m.resultSerializationTime
        j.foreach { x =>
          x.cpuNs += m.executorCpuTime
          x.waitMs += e.taskInfo.duration - m.executorCpuTime / 1000000L
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("BENCH1_CPUS", "32").toInt
    // BENCH1_EXECS=N → local-cluster[N, cores, mem]: one real JVM per
    // executor (the honest N-vs-4N-executor shape; each executor gets
    // its own heap + GC instead of sharing one JVM's)
    val master = sys.env.get("BENCH1_EXECS") match {
      case Some(n) => s"local-cluster[$n,${sys.env.getOrElse("BENCH1_EXEC_CORES", "2")}," +
        s"${sys.env.getOrElse("BENCH1_EXEC_MEM", "6144")}]"
      case None => s"local[$cpus]"
    }
    import scala.jdk.CollectionConverters._
    val cp = System.getProperty("java.class.path")
    val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(_.startsWith("--add-opens")).mkString(" ")
    val shmDir = {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, s"graft-b1-${ProcessHandle.current().pid()}")
        d.mkdirs(); d.deleteOnExit(); d.getAbsolutePath
      } else System.getProperty("java.io.tmpdir")
    }
    val spark = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("BENCH1_PARTS", "64"))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("BENCH1_AQE", "true"))
      .config("spark.local.dir", shmDir)
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("BENCH1_AUTOBCAST", "-1"))
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", opens)
      .config("spark.jars", sys.env.getOrElse("BENCH1_JAR", ""))
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
    import spark.implicits._
    val seedSrc = spark.range(nSeeds)
      .map(d => (d, WorldGen.docUrl(spec, d))).toDF("i", "raw")
    val cfg = CrawlConfig(seeds = Nil,
      acceptedTypes = Seq("text/html", "image/png"),
      maxRounds = if (wide) 3 else 0)
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val dir = java.nio.file.Files.createTempDirectory(base, "bench1")
    def stat(): Array[Long] =
      try scala.io.Source.fromFile("/proc/stat").getLines().next()
        .split("\\s+").drop(1).map(_.toLong)
      catch { case _: Throwable => Array.fill(10)(0L) }
    val st0 = stat()
    val t0 = System.nanoTime()
    val run = CrawlDriver.crawl(spark, world, cfg, dir.toString,
      seedSource = Some(seedSrc))
    val n = run.crawlOrder.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val st1 = stat()
    val d = st0.zip(st1).map { case (a, b) => b - a }
    val stealPct = if (d.sum <= 0 || d.length < 8) 0.0 else 100.0 * d(7) / d.sum
    println(f"TOTAL fetched=$n sec=$sec%.1f thr=${n / sec}%.1f urls/sec cpus=$cpus " +
      f"steal=$stealPct%.1f%%")
    val (jobWall, taskMs, stages) = prof.jobs.values.foldLeft((0L, 0L, 0)) {
      case ((w0, t, s), j) => (w0 + (j.t1 - j.t0), t + j.taskMs, s + j.stages)
    }
    println(f"JOBS n=${prof.jobs.size} stages=$stages jobWall=${jobWall / 1e3}%.1fs " +
      f"taskTime=${taskMs / 1e3}%.1fs taskTime/cores=${taskMs / 1e3 / cpus}%.1fs " +
      f"gapInsideJobs=${(jobWall - taskMs / cpus) / 1e3}%.1fs " +
      f"gapOutsideJobs=${(sec - jobWall / 1e3)}%.1fs")
    println(f"TASKS cpu=${prof.cpuNs / 1e9}%.1fs gc=${prof.gcMs / 1e3}%.1fs " +
      f"deser=${prof.deserMs / 1e3}%.1fs resultSer=${prof.srvMs / 1e3}%.1fs " +
      f"nonCpuWait=${(taskMs - prof.cpuNs / 1e6) / 1e3}%.1fs")
    if (sys.env.contains("BENCH1_JOBS"))
      prof.jobs.values.foreach { j =>
        println(f"  job ${j.id}%3d wall=${(j.t1 - j.t0) / 1e3}%6.2fs stages=${j.stages}%3d " +
          f"tasks=${j.tasks}%5d taskTime=${j.taskMs / 1e3}%7.1fs cpu=${j.cpuNs / 1e9}%7.1fs " +
          f"wait=${j.waitMs / 1e3}%7.1fs  ${j.desc}")
      }
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    spark.stop()
  }
}
