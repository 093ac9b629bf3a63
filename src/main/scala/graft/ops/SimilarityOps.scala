package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim.{toColumn, toExpression}

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>): brute-force cosine top-k as the exactness baseline,
  * and a random-hyperplane LSH bucketed variant as the scale path
  * (candidates only within matching sign-sketch buckets). Dot products
  * via zip_with/aggregate — pure Catalyst, codegen'd; the sign sketch
  * is a native expression over a driver-precomputed plane matrix
  * ([[HyperplaneChunks]]).
  *
  * Scale split (the 10^10-row shape): [[buildLshIndex]] sketches the
  * corpus ONCE into a banded (id, band, chunk) table — persist/write it
  * as the index — and [[probeLshTopK]] answers each query by
  * broadcast-joining the query's `bands` sketch rows against that
  * stored table, touching ~N·bands/2^chunkBits rows instead of
  * re-sketching the corpus per query (round-4's lshTopK rebuilt the
  * index inside every probe).
  */
object SimilarityOps {

  /** Σ aᵢ·bᵢ of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Brute-force top-k by cosine against one query vector: a single
    * scan + a k-row TakeOrderedAndProject (no shuffle of vectors).
    */
  def bruteTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol), round(cosine(col(vecCol), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * zero-mean, derived from xxhash64 over the two ints — REPLICATED
    * here on the driver by evaluating the identical Catalyst expression
    * (XxHash64 over two int literals, seed 42, pmod 2001), so sketches
    * are bit-for-bit the values the former per-row expression computed.
    */
  private def planeVal(plane: Int, dim: Int): Double = {
    val h = new XxHash64(Seq(Literal(plane), Literal(dim)))
      .eval(null).asInstanceOf[Long]
    val m = ((h % 2001L) + 2001L) % 2001L
    (m.toDouble - 1000.0) / 1000.0
  }

  /** Flattened planes×dims matrix, memoized per shape (row-invariant —
    * computed once on the driver, never per row; see What-went-wrong in
    * HyperplaneChunks' doc).
    */
  private val matCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), Array[Double]]
  private def planeMatrix(planes: Int, dims: Int): Array[Double] =
    matCache.getOrElseUpdate((planes, dims), {
      val m = new Array[Double](planes * dims)
      var p = 0
      while (p < planes) {
        var d = 0
        while (d < dims) { m(p * dims + d) = planeVal(p, d); d += 1 }
        p += 1
      }
      m
    })

  /** Per-band sign chunks as array<long> (length `bands`): bit j of
    * band b is sign(v · plane_{b·chunkBits+j}). 16-bit chunks give
    * 65,536 buckets per band, so a band pairs only ~N/65536 of the
    * corpus with itself — what makes the bucket join survive 10^10
    * rows. `dims` sizes the plane matrix; vectors shorter than dims
    * contribute zeros for the missing components (identical projection
    * to summing only the vector's own length).
    */
  def bandChunksLongs(vec: Column, bands: Int, chunkBits: Int,
      dims: Int = 64): Column =
    toColumn(HyperplaneChunks(toExpression(vec),
      planeMatrix(bands * chunkBits, dims), bands, chunkBits, dims))

  /** Struct-form compatibility wrapper: array<struct<band,chunk>>. */
  def bandChunks(vec: Column, bands: Int, chunkBits: Int, dims: Int = 64): Column = {
    val ch = bandChunksLongs(vec, bands, chunkBits, dims)
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.cast("int").as("band"), element_at(ch, b + 1).as("chunk")))
  }

  /** Sign sketch packed into ONE long (≤ 64 planes): plane p's sign is
    * bit p — a single band of `planes` chunk bits.
    */
  def hyperplaneSketch(vec: Column, planes: Int, dims: Int = 64): Column =
    element_at(bandChunksLongs(vec, 1, planes, dims), 1)

  /** Build-once LSH index: the banded sketch rows (idCol, band, chunk)
    * of the corpus. Persist (or write out bucketed by (band, chunk))
    * once; every probe joins against it. One scan of the vectors, one
    * sketch per row.
    */
  def buildLshIndex(df: DataFrame, vecCol: String, idCol: String,
      bands: Int = 16, chunkBits: Int = 16, dims: Int = 64): DataFrame =
    df.select(col(idCol),
      posexplode(bandChunksLongs(col(vecCol), bands, chunkBits, dims))
        .as(Seq("band", "chunk")))

  /** Probe a prebuilt index: candidates share ≥1 band chunk with the
    * query (the query side is `bands` rows, broadcast); exact cosine
    * re-ranks after re-joining the vectors by id. With 16-bit chunks a
    * random vector matches the query in a band with p ≈ 2^-16·(sign
    * correlation), so candidates ≈ N·bands/65536 ≪ N — an index probe,
    * not a scan. Recall for high-cosine targets: p_band ≈ (1 − θ/π)^16
    * ≈ 0.27 at cos 0.97, so across 16 bands P(≥1 hit) ≈ 1 − 0.73^16 ≈
    * 99.4%; exact duplicates always collide.
    */
  def probeLshTopK(index: DataFrame, vecs: DataFrame, vecCol: String,
      idCol: String, query: Seq[Float], k: Int,
      bands: Int = 16, chunkBits: Int = 16, dims: Int = 64): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val qSketch = Seq(Tuple1(query)).toDF("v")
      .select(posexplode(bandChunksLongs(col("v"), bands, chunkBits, dims))
        .as(Seq("band", "chunk")))
    val candIds = index.join(broadcast(qSketch), Seq("band", "chunk"))
      .select(col(idCol)).distinct()
    candIds.join(vecs, Seq(idCol))
      .select(col(idCol), round(cosine(col(vecCol), typedLit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** One-shot LSH top-k = build + probe in one plan (correctness
    * surface; a probe-many workload persists [[buildLshIndex]] once and
    * calls [[probeLshTopK]] — see SparkEntry's ann_lsh_index_build /
    * ann_lsh_probe pair).
    */
  def lshTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int, bands: Int = 16, chunkBits: Int = 16,
      dims: Int = 64): DataFrame =
    probeLshTopK(buildLshIndex(df, vecCol, idCol, bands, chunkBits, dims),
      df.select(col(idCol), col(vecCol)), vecCol, idCol, query, k,
      bands, chunkBits, dims)

  /** The banded sketch rows behind [[cosineNearDups]] (for
    * DedupOps.droppedBuckets with keyCols band/chunk).
    */
  def cosineBanded(df: DataFrame, vecCol: String, idCol: String,
      bands: Int = 12, chunkBits: Int = 16, dims: Int = 64): DataFrame =
    df.select(col(idCol).as("id"),
      posexplode(bandChunksLongs(col(vecCol), bands, chunkBits, dims))
        .as(Seq("band", "chunk")))

  /** Embedding-cosine near-dup pairs via sketch-band bucketing (the
    * embedding flavor of DedupOps.minhashNearDups). 12 bands × 16-bit
    * chunks: a random pair collides in a band with p = 2^-16·(sign
    * pattern), so candidates stay ≪ N²; very-near dups (cos ≥ ~0.97)
    * are caught with ≥ ~95% probability and exact duplicates always
    * (identical vectors share every chunk). Vectors do NOT ride the
    * band shuffle — candidates re-join them by id; `bucketCap` bounds
    * degenerate buckets (e.g. all-zero vectors).
    */
  def cosineNearDups(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, bands: Int = 12, chunkBits: Int = 16,
      bucketCap: Int = 5000, dims: Int = 64): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val banded = cosineBanded(df, vecCol, idCol, bands, chunkBits, dims)
    val capped = banded.withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("chunk"))))
      .filter(col("__n") > 1 && col("__n") <= bucketCap).drop("__n")
    val l = capped.select(col("band"), col("chunk"), col("id").as("idA"))
    val r = capped.select(col("band"), col("chunk"), col("id").as("idB"))
    val cand = l.join(r, Seq("band", "chunk")).filter(col("idA") < col("idB"))
      .select("idA", "idB").distinct()
    cand
      .join(vecs.select(col("id").as("idA"), col("v").as("vA")), Seq("idA"))
      .join(vecs.select(col("id").as("idB"), col("v").as("vB")), Seq("idB"))
      .withColumn("cos", round(cosine(col("vA"), col("vB")), 6))
      .filter(col("cos") >= threshold)
      .select("idA", "idB", "cos")
  }
}
