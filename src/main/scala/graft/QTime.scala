package graft
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val qs = sys.env.get("QTIME_QS").map(_.split(",").toSeq)
      .getOrElse(Seq("dd_minhash_pairs","dd_simhash_pairs","dd_ngram_jaccard",
        "ann_lsh_topk","dd_embedding_neardups","tx_lang_id","tx_token_bpe","mm_frame_sample"))
    for (q <- qs) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"QT $q rows=$n sec=${(System.nanoTime()-t0)/1e9}%.1f")
    }
    spark.stop()
  }
}
