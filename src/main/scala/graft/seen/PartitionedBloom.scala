package graft.seen

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** The 10^10-scale URL-seen prefilter (SURVEY.md §4 physical note,
  * D1): PAST the single-bloom broadcast budget
  * ([[UrlSeen.bloomWithinBudget]]) the bitset for 4×seen capacity is
  * tens of GB — undeliverable to executors as one broadcast. This
  * family keeps the prefilter alive by sharding it into `buckets`
  * independent blooms keyed by `pmod(seenKeyHash, buckets)`, stored as
  * one small FILE per bucket in the snapshot store:
  *
  *   - executors load ONLY the bucket files their rows probe, on
  *     demand, through a bounded per-JVM cache ([[BucketBloomCache]]) —
  *     per-executor footprint is O(touched buckets × bitset/buckets),
  *     not O(total bitset), and the driver never holds any bitset;
  *   - per-round maintenance is LSM-shaped: the round's accepted delta
  *     is bucketed and merged into ONLY the touched buckets' blooms,
  *     written under a fresh epoch dir (tmp + rename, deterministic
  *     content so task retries are idempotent); untouched buckets keep
  *     their prior epoch's file — no copy-forward, no full rewrite;
  *   - the probe routes each key through a tiny broadcast
  *     `bucket → epoch` map (≤ `buckets` ints at any scale). A bucket
  *     absent from the map has never held a seen key, so the probe
  *     answers "definitely new" — correct by construction. The map is
  *     built exclusively from COMPLETED build/merge job output, so a
  *     referenced file always exists and contains every key of its
  *     bucket: the no-false-negatives guarantee of the single bloom is
  *     preserved. Stale files from crashed runs are never referenced
  *     (and an over-full leftover could only add false positives).
  *
  * Exactness never depends on any of this: the bloom family remains
  * band 1 of [[UrlSeen.dedupeAgainstSeen]] — candidates it accepts are
  * still verified by the exact anti-join band. Epoch dirs are kept for
  * the life of the crawl (a production deployment would GC epochs older
  * than the oldest in-flight round's probe).
  */
object PartitionedBloom {

  /** Handle to a built family: where it lives, its geometry, and which
    * epoch holds each bucket's latest bloom. Driver-side O(buckets).
    */
  case class BloomFamily(base: String, buckets: Int, capPerBucket: Long,
      fpp: Double, epochs: Map[Int, Int]) {
    def prefilter: UrlSeen.SeenPrefilter = UrlSeen.BucketBloomPrefilter(this)
  }

  def bucketOf(key: Column, buckets: Int): Column =
    pmod(key, lit(buckets.toLong)).cast("int")

  private[seen] def bucketPath(base: String, epoch: Int, bucket: Int): String =
    f"$base/epoch-$epoch/bucket-$bucket%05d.bloom"

  // NOTE: `new Configuration()` resolves the default Hadoop filesystem
  // config, which covers local and HDFS paths; a deployment whose
  // snapshot store needs credentialed config (e.g. object-store keys)
  // would thread the session's hadoopConf here via a broadcast
  // SerializableConfiguration instead.
  private def loadBloom(path: String): BloomFilter = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val in = fs.open(p)
    try BloomFilter.readFrom(in) finally in.close()
  }

  private def writeBloom(path: String, bloom: BloomFilter): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val tmp = new Path(path + "." + java.util.UUID.randomUUID().toString + ".tmp")
    val out = fs.create(tmp, true)
    try bloom.writeTo(out) finally out.close()
    // content is deterministic per (epoch, bucket), so a retried task
    // re-renaming over a finished file is harmless
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) throw new java.io.IOException(s"rename to $p failed")
  }

  /** One distributed pass: bucket `keys` (single Long column), insert
    * each bucket's keys into its prior bloom (from `prior`'s epoch) or
    * a fresh one, write the result under `epoch`. Returns the bucket
    * ids actually written (≤ `buckets` ints — the only collect).
    */
  private def writeEpoch(keys: DataFrame, base: String, buckets: Int,
      capPerBucket: Long, fpp: Double, epoch: Int,
      prior: Map[Int, Int]): Seq[Int] = {
    val spark = keys.sparkSession
    import spark.implicits._
    val keyed = keys.select(col(keys.columns.head).cast("long").as("k"))
      .withColumn("b", bucketOf(col("k"), buckets))
      .repartition(buckets, col("b"))
      .as[(Long, Int)]
    keyed.mapPartitions { it =>
      val perBucket = scala.collection.mutable.Map[Int, BloomFilter]()
      it.foreach { case (k, b) =>
        val bloom = perBucket.getOrElseUpdate(b,
          prior.get(b) match {
            case Some(e) => loadBloom(bucketPath(base, e, b))
            case None => BloomFilter.create(capPerBucket, fpp)
          })
        bloom.putLong(k)
      }
      perBucket.foreach { case (b, bloom) =>
        writeBloom(bucketPath(base, epoch, b), bloom)
      }
      perBucket.keysIterator
    }.collect().toSeq
  }

  /** Build a family from scratch over `keys` (a single Long column). */
  def build(keys: DataFrame, base: String, buckets: Int, capPerBucket: Long,
      fpp: Double = 1e-4, epoch: Int = 0): BloomFamily = {
    val written = writeEpoch(keys, base, buckets, capPerBucket, fpp, epoch,
      prior = Map.empty)
    BloomFamily(base, buckets, capPerBucket, fpp,
      written.map(_ -> epoch).toMap)
  }

  /** Merge a round's delta keys into the family under a new epoch:
    * only touched buckets are rewritten; the rest keep their epoch.
    */
  def merge(deltaKeys: DataFrame, fam: BloomFamily, epoch: Int): BloomFamily = {
    val written = writeEpoch(deltaKeys, fam.base, fam.buckets,
      fam.capPerBucket, fam.fpp, epoch, prior = fam.epochs)
    fam.copy(epochs = fam.epochs ++ written.map(_ -> epoch))
  }
}

/** Bounded per-JVM cache of bucket blooms keyed by (base, epoch,
  * bucket): each executor inflates only the bucket files its tasks
  * probe, once, and old epochs age out as merges supersede them. The
  * bound caps executor memory at ~maxEntries × per-bucket bitset
  * (choose `buckets` so total-bitset ∕ buckets is small — e.g. 90 GB
  * at 4×10^10 capacity over 8192 buckets is ~11 MB per entry).
  */
object BucketBloomCache {
  private val maxEntries = 64
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, BloomFilter]()
  private val order =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def get(base: String, epoch: Int, bucket: Int): BloomFilter = {
    val key = s"$base|$epoch|$bucket"
    val hit = cache.get(key)
    if (hit != null) return hit
    val loaded = cache.computeIfAbsent(key, _ => {
      order.add(key)
      val p = new Path(PartitionedBloom.bucketPath(base, epoch, bucket))
      val fs = p.getFileSystem(new Configuration())
      val in = fs.open(p)
      try BloomFilter.readFrom(in) finally in.close()
    })
    while (cache.size > maxEntries) {
      val victim = order.poll()
      if (victim == null) return loaded
      if (victim != key) cache.remove(victim)
    }
    loaded
  }
}

/** `mightContain` against a [[PartitionedBloom.BloomFamily]] as a
  * native codegen expression: routes the Long seen-key hash to its
  * bucket (`pmod(h, buckets)`), resolves the bucket's current epoch
  * through the tiny broadcast map, and probes the lazily-loaded bucket
  * bloom. A bucket with no epoch entry has never seen a key → false
  * (definitely new). Mirrors [[BloomMightContain]]'s shape.
  */
case class BucketBloomContains(child: Expression, base: String, buckets: Int,
    epochs: Broadcast[Map[Int, Int]]) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  /** Codegen entry point (called from generated java). */
  def bloomHit(h: Long): Boolean = {
    val b = java.lang.Math.floorMod(h, buckets.toLong).toInt
    epochs.value.get(b) match {
      case None => false
      case Some(e) => BucketBloomCache.get(base, e, b).mightContainLong(h)
    }
  }

  override protected def nullSafeEval(v: Any): Any =
    bloomHit(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketBloomContains", this,
      classOf[BucketBloomContains].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bloomHit($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
