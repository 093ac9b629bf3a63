package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Pure-CPU scaling probe: hash chains over negligible data. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    for (cpus <- Seq(8, 32)) {
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
}
