package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Machine-ceiling probes (BASELINE.md evidence):
  *  - PROBE_MODE=cpu (default): hash chains over negligible data —
  *    register-bound, isolates clock/steal effects.
  *  - PROBE_MODE=mem: aggregation scans over a cached wide string
  *    table — memory-bandwidth-bound, the crawl's resource profile.
  * Both report wall seconds per level; efficiency lo→hi =
  * sec_lo/(hi/lo · sec_hi).
  */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val levels = sys.env.getOrElse("PROBE_LEVELS", "8,32").split(",").map(_.trim.toInt)
    val mode = sys.env.getOrElse("PROBE_MODE", "cpu")
    if (mode == "mem") { memProbe(levels); return }
    for (cpus <- levels) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      // warmup
      spark.range(1000000).select(sum(length(sha2(concat_ws("", col("id").cast("string")), 256)))).head()
      val t0 = System.nanoTime()
      val chain = (1 to 16).foldLeft(col("id").cast("string")) { (c, _) => sha2(concat(c, lit("x")), 512) }
      spark.range(0L, 20000000L, 1L, 64).select(sum(length(chain))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CPUPROBE cpus=$cpus sec=$sec%.1f")
      spark.stop()
    }
  }

  /** Memory-bound probe: repeated hash-aggregations over a cached
    * ~1.5 GB table of strings (rows shaped like crawl intermediates).
    */
  private def memProbe(levels: Seq[Int]): Unit = {
    for (cpus <- levels) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val df = spark.range(0L, 12000000L, 1L, 64)
        .select(col("id"),
          concat(lit("http://h"), pmod(col("id"), lit(997)), lit(".test/p/"), col("id"),
            lit("/"), sha2(col("id").cast("string"), 256)).as("uri"),
        pmod(col("id") * 31L, lit(100000)).as("k"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize (warm)
      df.groupBy(col("k")).agg(count(lit(1))).count() // warm codegen
      val t0 = System.nanoTime()
      var i = 0
      while (i < 3) {
        df.groupBy(pmod(col("k") + i, lit(50000)).as("g"))
          .agg(sum(length(col("uri"))), max(col("uri"))).count()
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"MEMPROBE cpus=$cpus sec=$sec%.1f")
      spark.stop()
    }
  }
}
