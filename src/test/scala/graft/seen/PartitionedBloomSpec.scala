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

  test("gcEpochs deletes exactly the superseded bucket files") {
    val dir = Files.createTempDirectory("pbloom-gc").toString
    import spark.implicits._
    val base = (0 until 300).map(i => (i.toLong * 8) + (i % 4).toLong) // buckets 0-3
    val delta = (0 until 100).map(i => (i.toLong * 8) + 2L + 2400L * 8) // bucket 2 only
    val fam0 = PartitionedBloom.build(base.toDF("k"), dir, buckets = 8,
      capPerBucket = 1024, epoch = 0)
    val fam1 = PartitionedBloom.merge(delta.toDF("k"), fam0, epoch = 1)
    val deleted = PartitionedBloom.gcEpochs(fam1)
    // bucket 2's epoch-0 file is superseded by its epoch-1 merge; the
    // other three referenced epoch-0 files must survive
    assert(deleted == 1, s"expected exactly 1 superseded file, deleted $deleted")
    def files(): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).map(_.getPath).filter(_.endsWith(".bloom")).sorted
    }
    assert(files().size == fam1.epochs.size,
      s"exactly the referenced set must remain: ${files()} vs ${fam1.epochs}")
    // and the family still has no false negatives after GC
    val bcast = spark.sparkContext.broadcast(fam1.epochs)
    import org.apache.spark.sql.graft.shim.{toColumn, toExpression}
    val misses = (base ++ delta).toDF("k")
      .select(toColumn(BucketBloomContains(
        toExpression(col("k")), fam1.base, fam1.buckets, bcast)).as("m"))
      .filter(!col("m")).count()
    assert(misses == 0, s"$misses false negatives after gc")
    // idempotent: a second pass deletes nothing
    assert(PartitionedBloom.gcEpochs(fam1) == 0)
  }

  test("BucketBloomCache is access-ordered LRU with a conf-sized bound") {
    val dir = Files.createTempDirectory("pbloom-lru").toString
    import spark.implicits._
    // 4 buckets, one key each
    val keys = (0 until 4).map(_.toLong)
    val fam = PartitionedBloom.build(keys.toDF("k"), dir, buckets = 4,
      capPerBucket = 64, epoch = 0)
    BucketBloomCache.clear()
    def touch(b: Int): Unit = BucketBloomCache.get(fam.base, 0, b, entries = 2)
    touch(0); touch(1)
    touch(0) // re-probe bucket 0: now the HOT entry
    touch(2) // evicts bucket 1 (LRU), NOT the hot bucket 0
    val keysNow = BucketBloomCache.snapshotKeys()
    assert(keysNow.size <= 2, s"bound violated: $keysNow")
    assert(keysNow.exists(_.endsWith("|0")) && keysNow.exists(_.endsWith("|2")),
      s"hot entry evicted ahead of cold: $keysNow")
    // re-loading an evicted entry works and keeps the bound
    touch(1)
    assert(BucketBloomCache.snapshotKeys().size <= 2)
    BucketBloomCache.clear()
  }

  test("CompositePrefilter(family, recent bloom) has no false negatives") {
    val dir = Files.createTempDirectory("pbloom-comp").toString
    // family covers the first half of the seen set; a single recent
    // bloom covers the second half (the batched-merge window shape)
    val seenOld = spark.range(250).select(
      concat(lit("http://h/"), col("id")).as("uri"), lit("GET").as("method"))
    val seenNew = spark.range(250, 500).select(
      concat(lit("http://h/"), col("id")).as("uri"), lit("GET").as("method"))
    val seen = seenOld.unionByName(seenNew)
    val cand = spark.range(0, 750).select(
      concat(lit("http://h/"), col("id")).as("uri"), lit("GET").as("method"))
    val fam = PartitionedBloom.build(
      seenOld.select(UrlSeen.seenKey(col("uri"), col("method")).as("k")),
      dir, buckets = 8, capPerBucket = 256, epoch = 0)
    val recent = UrlSeen.buildBloom(seenNew,
      UrlSeen.seenKey(col("uri"), col("method")), 250)
    val pf = UrlSeen.CompositePrefilter(fam.prefilter,
      UrlSeen.SingleBloomPrefilter(recent))
    val got = UrlSeen.dedupeAgainstSeen(cand, Seq(seen), "uri", "method", Some(pf))
      .collect().map(_.getString(0)).toSet
    val exact = UrlSeen.dedupeAgainstSeen(cand, Seq(seen), "uri", "method", None)
      .collect().map(_.getString(0)).toSet
    assert(got == exact)
    assert(exact == (500 until 750).map(i => s"http://h/$i").toSet)
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
