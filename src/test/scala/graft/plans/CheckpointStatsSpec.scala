package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim.capStats
import org.scalatest.funsuite.AnyFunSuite

/** Regression spec for the iterative-checkpoint statistics blow-up.
  *
  * `Dataset.localCheckpoint` truncates the logical plan to a LogicalRDD
  * leaf but copies the truncated plan's `optimizedPlan.stats` into it
  * (`originStats`). An iterative driver whose round k+1 plan joins
  * round k's checkpoint leaves therefore compounds sizeInBytes
  * multiplicatively — bits grow as (joins-per-round)^rounds — until
  * Catalyst's size-only stats visitor allocates multi-GB BigIntegers
  * and OOMs the driver (observed in the polite-slow parity world around
  * round 12 of the pipelined crawl loop). `shim.capStats` rebuilds the
  * leaf with sizeInBytes capped at Long.MaxValue; these tests pin both
  * the underlying Spark behavior (so a Spark upgrade that fixes it is
  * noticed) and the cap.
  */
class CheckpointStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** One crawl-round-shaped step: three joins of df against itself. */
  private def step(df: DataFrame): DataFrame = {
    val a = df.withColumnRenamed("v", "v1")
    val b = df.select(col("k"), col("v").as("v2"))
    val c = df.select(col("k"), col("v").as("v3"))
    a.join(b, "k").join(c, "k")
      .select(col("k"), (col("v1") + col("v2") + col("v3")).as("v"))
  }

  private def bits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength

  test("localCheckpoint inherits stats that compound across iterated joins") {
    import spark.implicits._
    var df: DataFrame = (1 to 50).toDF("k").withColumn("v", col("k") * 2)
    var maxBits = 0
    for (_ <- 1 to 5) {
      val cp = step(df).localCheckpoint(eager = false)
      cp.count()
      maxBits = math.max(maxBits, bits(cp))
      df = cp
    }
    // with 3 joins per round the bit count roughly triples per round; by
    // round 5 it must exceed any sane 63-bit size — this pins the Spark
    // behavior capStats exists for (fails ⇒ the shim can be retired)
    assert(maxBits > 63, s"expected compounding stats, got $maxBits bits")
  }

  test("capStats bounds checkpoint-leaf stats across iterated joins") {
    import spark.implicits._
    var df: DataFrame = (1 to 50).toDF("k").withColumn("v", col("k") * 2)
    for (round <- 1 to 8) {
      val cp = capStats(step(df).localCheckpoint(eager = false))
      cp.count()
      assert(bits(cp) <= 63, s"round $round leaf stats must stay ≤63 bits")
      // the plan built ON TOP of capped leaves stays one round's worth
      // of products (3 joins × 63 bits), never multi-megabyte BigInts
      assert(bits(step(cp)) < 300,
        s"round $round derived-plan stats must stay bounded")
      df = cp
    }
    // capped leaves keep row semantics: same count as the uncapped chain
    assert(df.count() == 50)
  }

  test("capStats preserves rows, schema, and small real stats") {
    import spark.implicits._
    val small = (1 to 10).toDF("k").localCheckpoint(eager = false)
    small.count()
    val capped = capStats(small)
    assert(capped.schema == small.schema)
    assert(capped.collect().map(_.getInt(0)).sorted.toSeq == (1 to 10))
    // a small leaf's stats are already <63 bits — capStats is identity
    assert(bits(capped) == bits(small))
  }
}
