package graft
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // QTIME_JOBS=1: per-job wall/stage/task decomposition (guide §7.1)
    if (sys.env.getOrElse("QTIME_JOBS", "0") == "1")
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        private val stages = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
        private val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          t0.put(e.jobId, e.time); stages.put(e.jobId, e.stageIds.size)
          names.put(e.jobId, e.stageInfos.lastOption.map(_.name.take(60)).getOrElse(""))
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val w = (e.time - t0.getOrDefault(e.jobId, e.time)) / 1e3
          if (w > 0.15)
            println(f"[job ${e.jobId}%4d] wall=$w%6.2fs stages=${stages.getOrDefault(e.jobId, -1)}%3d ${names.getOrDefault(e.jobId, "")}")
        }
      })
    val dir = "/root/testdata/sf0.1"
    val qs = sys.env.get("QTIME_QS").map(_.split(",").toSeq)
      .getOrElse(Seq("dd_minhash_pairs","dd_simhash_pairs","dd_ngram_jaccard",
        "ann_lsh_topk","dd_embedding_neardups","tx_lang_id","tx_token_bpe","mm_frame_sample"))
    for (q <- qs) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"QT $q rows=$n sec=${(System.nanoTime()-t0)/1e9}%.1f")
    }
    // per-rule analyzer/optimizer time over everything run above
    // (guide §7.3: planning time IS the bottleneck on tiny worlds)
    if (sys.env.getOrElse("QTIME_RULES", "0") == "1")
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
