package graft.seen

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pin for the D1 scale claim (SURVEY §4, VERDICT r4
  * item 3): the cumulative seen table, compacted with the driver's
  * layout (hash-partitioned on the join key + sorted, captured by a
  * checkpointed leaf), must join the per-round anti-join WITHOUT an
  * Exchange or a Sort on the seen side — only the (small) candidate
  * delta shuffles each round, so the dedup stage's cost stays
  * O(candidates), not O(seen), as the crawl accumulates 10^10 rows.
  */
class SeenPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("compacted seen side joins Exchange-free and Sort-free") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevAb = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the compaction layout verbatim (CrawlDriver.compact): repartition
      // on the join key, sort within partitions, checkpoint to a leaf
      // that carries partitioning+ordering, cap the copied stats
      val seen = org.apache.spark.sql.graft.shim.capStats(
        spark.range(2000)
          .select(concat(lit("http://h.test/"), col("id")).as("uri"),
            lit("GET").as("method"))
          .repartition(8, col("uri"))
          .sortWithinPartitions("uri", "method")
          .localCheckpoint())
      val cand = spark.range(1500, 2500)
        .select(concat(lit("http://h.test/"), col("id")).as("uri"),
          lit("GET").as("method"))
      val out = UrlSeen.dedupeAgainstSeen(cand, Seq(seen), "uri", "method", None)
      val plan = out.queryExecution.executedPlan
      val smj = plan.collect {
        case j: SortMergeJoinExec if j.joinType == LeftAnti => j
      }
      assert(smj.nonEmpty, s"expected a left_anti SMJ, got:\n$plan")
      val seenSide = smj.head.right
      assert(seenSide.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"seen side re-exchanged:\n$seenSide")
      assert(seenSide.collect { case s: SortExec => s }.isEmpty,
        s"seen side re-sorted:\n$seenSide")
      // and the answer is still exact
      assert(out.count() == 500)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAb)
    }
  }
}
