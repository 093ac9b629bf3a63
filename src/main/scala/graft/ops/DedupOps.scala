package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each expressed
  * Spark-first (shuffle-on-key groupBys, banded LSH joins — no
  * pairwise O(n²) anywhere except inside LSH buckets):
  *
  *  - exact:   hash-groupBy on content hash (dupdet.py:38-89 shape)
  *  - minhash: shingle → K-permutation signature → banded LSH buckets
  *             → candidate pairs → exact Jaccard verify
  *  - simhash: 64-bit sign-sum sketch → 4×16-bit band buckets →
  *             hamming verify
  *  - ngram Jaccard: exact verification measure on shingle sets
  *
  * All signatures/sketches are pure Catalyst higher-order expressions
  * (transform/aggregate/zip_with) — codegen-friendly, scale with a scan.
  */
object DedupOps {

  /** The reference's content hash (dupdet.py:82-89): SHA-512 over bytes. */
  def sha512(text: Column): Column = sha2(text.cast("binary"), 512)

  /** Exact dedup: keep the first (min orderCol) row per content hash;
    * one shuffle on the hash.
    */
  def exactDedup(df: DataFrame, textCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(col(orderCol))
    df.withColumn("__h", sha512(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__h", "__rn")
  }

  /** Duplicate groups (dupdet.py shape D4): size-class + hash groups
    * with >1 member; evidence = earliest member (window first).
    */
  def dupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = sha512(col(textCol))
    df.select(col(idCol), length(col(textCol)).as("len"), h.as("hash"))
      .withColumn("first_id", min(col(idCol)).over(Window.partitionBy(col("hash"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("hash"))))
      .filter(col("n") > 1)
      .select(col(idCol), col("len"), col("hash"), col("first_id"), col("n"))
  }

  /** Word shingles (n-grams of tokens) as an array column. */
  def shingles(text: Column, n: Int): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    when(size(tokens) < n, array(concat_ws(" ", tokens)))
      .otherwise(transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
  }

  /** MinHash signature: K permutations h_i(x) = xxhash64(x, salt=i);
    * signature[i] = min over shingles. Pure expressions.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shingleCol, s => xxhash64(concat(s, i.cast("string"))))))

  /** Banded-LSH candidate pairs: split the K-length signature into
    * `bands` bands, bucket-join on (band index, band hash), verify with
    * exact shingle Jaccard ≥ threshold. Returns (idA, idB, jaccard)
    * with idA < idB. The only join is the per-band bucket equi-join —
    * shuffle on band hash, never all-pairs.
    */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, k: Int = 20, bands: Int = 5,
      threshold: Double = 0.8): DataFrame = {
    val rows = k / bands
    val sig = df.select(col(idCol).as("id"), shingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = sig.select(col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandHash")
    val l = banded.select(col("band"), col("bandHash"), col("id").as("idA"), col("sh").as("shA"))
    val r = banded.select(col("band"), col("bandHash"), col("id").as("idB"), col("sh").as("shB"))
    val cand = l.join(r, Seq("band", "bandHash")).filter(col("idA") < col("idB"))
      .dropDuplicates("idA", "idB")
    cand.withColumn("jaccard", jaccard(col("shA"), col("shB")))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact Jaccard similarity of two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd)).cast("double")
    val union = size(array_union(ad, bd)).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** 64-bit SimHash: per token-hash, each bit contributes ±1; the sign
    * of each accumulated counter forms the sketch bit. Entirely
    * aggregate/zip_with expressions.
    */
  def simhash64(text: Column): Column = {
    val tokens = split(lower(trim(text)), "\\s+")
    val counters = aggregate(
      tokens,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, i) => c + when(call_function("shiftright", h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dups: bucket on any equal 16-bit chunk (4 bands →
    * catches all pairs with hamming ≤ 3), verify hamming ≤ maxDist.
    */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3): DataFrame = {
    val sk = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
    val banded = sk.select(col("id"), col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sim"), b * 16).bitwiseAND(0xffffL))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val l = banded.select(col("band"), col("chunk"), col("id").as("idA"), col("sim").as("simA"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("idB"), col("sim").as("simB"))
    l.join(r, Seq("band", "chunk")).filter(col("idA") < col("idB"))
      .dropDuplicates("idA", "idB")
      .withColumn("hamming", hamming64(col("simA"), col("simB")))
      .filter(col("hamming") <= maxDist)
      .select(col("idA"), col("idB"), col("hamming"))
  }
}
