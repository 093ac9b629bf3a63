package graft.seen

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Unit pins for the past-budget bucket-sharded bloom family
  * (PartitionedBloom): no false negatives, missing-bucket =
  * definitely-new, LSM merge rewrites only touched buckets, and the
  * full dedupeAgainstSeen band-split equals the exact anti-join.
  */
class PartitionedBloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("build: every inserted key probes true; empty buckets probe false") {
    val dir = Files.createTempDirectory("pbloom-build").toString
    // keys constrained to buckets {0,1} of 16: buckets 2-15 stay empty
    import spark.implicits._
    val twoBuckets = (0 until 400).map(i => (i.toLong * 16) + (i % 2).toLong)
    val keys = twoBuckets.toDF("k")
    val fam = PartitionedBloom.build(keys, dir, buckets = 16,
      capPerBucket = 512, epoch = 0)
    assert(fam.epochs.keySet == Set(0, 1), s"epochs: ${fam.epochs}")
    val bcast = spark.sparkContext.broadcast(fam.epochs)
    import org.apache.spark.sql.graft.shim.{toColumn, toExpression}
    def probe(ks: Seq[Long]): Seq[Boolean] = {
      val df = ks.toDF("k")
      df.select(toColumn(BucketBloomContains(
          toExpression(col("k")), fam.base, fam.buckets, bcast)).as("m"))
        .collect().map(_.getBoolean(0)).toSeq
    }
    // no false negatives
    assert(probe(twoBuckets).forall(identity))
    // keys routed to never-seen buckets are DEFINITELY new
    val otherBuckets = (0 until 100).map(i => (i.toLong * 16) + 5L)
    assert(probe(otherBuckets).forall(!_))
  }

  test("merge: delta covered, prior keys kept, untouched buckets keep their epoch") {
    val dir = Files.createTempDirectory("pbloom-merge").toString
    import spark.implicits._
    val base = (0 until 300).map(i => (i.toLong * 8) + (i % 4).toLong) // buckets 0-3
    val delta = (0 until 100).map(i => (i.toLong * 8) + 2L + 2400L * 8) // bucket 2 only
    val fam0 = PartitionedBloom.build(base.toDF("k"), dir, buckets = 8,
      capPerBucket = 1024, epoch = 0)
    val fam1 = PartitionedBloom.merge(delta.toDF("k"), fam0, epoch = 1)
    // only bucket 2 advanced to epoch 1
    assert(fam1.epochs(2) == 1)
    assert(Seq(0, 1, 3).forall(b => fam1.epochs(b) == 0), s"epochs: ${fam1.epochs}")
    val bcast = spark.sparkContext.broadcast(fam1.epochs)
    import org.apache.spark.sql.graft.shim.{toColumn, toExpression}
    val all = (base ++ delta).toDF("k")
    val misses = all.select(toColumn(BucketBloomContains(
        toExpression(col("k")), fam1.base, fam1.buckets, bcast)).as("m"))
      .filter(!col("m")).count()
    assert(misses == 0, s"$misses false negatives after merge")
  }

  test("dedupeAgainstSeen with the bucket family ≡ exact anti-join") {
    val dir = Files.createTempDirectory("pbloom-dedupe").toString
    val seen = spark.range(500).select(
      concat(lit("http://h/"), col("id")).as("uri"), lit("GET").as("method"))
    val cand = spark.range(250, 750).select(
      concat(lit("http://h/"), col("id")).as("uri"), lit("GET").as("method"))
    val fam = PartitionedBloom.build(
      seen.select(UrlSeen.seenKey(col("uri"), col("method")).as("k")),
      dir, buckets = 8, capPerBucket = 256, epoch = 0)
    val withFam = UrlSeen.dedupeAgainstSeen(cand, Seq(seen), "uri", "method",
      Some(fam.prefilter)).collect().map(_.getString(0)).toSet
    val exact = UrlSeen.dedupeAgainstSeen(cand, Seq(seen), "uri", "method", None)
      .collect().map(_.getString(0)).toSet
    assert(withFam == exact)
    assert(exact == (500 until 750).map(i => s"http://h/$i").toSet)
  }
}
