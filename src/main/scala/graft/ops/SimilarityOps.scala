package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>): brute-force cosine top-k as the exactness baseline,
  * and a random-hyperplane LSH bucketed variant as the scale path
  * (candidates only within matching sign-sketch buckets). Dot products
  * via zip_with/aggregate — pure Catalyst, codegen'd.
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
    * a zero-mean value derived from xxhash64 — reproducible across
    * executors with no RNG state.
    */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod(xxhash64(concat(plane.cast("string"), lit(":"), dim.cast("string"))),
      lit(2001L)).cast("double") - 1000.0) / 1000.0

  /** Sign sketch: bit p = sign(v · plane_p), packed into a long. */
  def hyperplaneSketch(vec: Column, planes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (v, i) => v * planeComponent(p, i)),
          lit(0.0d), (acc, v) => acc + v)
        when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(0L)
      }),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))

  /** LSH top-k: candidates share ≥1 of the `bands` sketch chunks with
    * the query; exact cosine re-ranks the candidates. At 10^10 vectors
    * the bucket join replaces the full scan; recall tunes via
    * planes/bands.
    */
  def lshTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int, planes: Int = 16, bands: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val chunk = planes / bands
    val mask = (1L << chunk) - 1
    def bandsOf(sk: Column): Column =
      transform(sequence(lit(0), lit(bands - 1)),
        b => struct((b).as("band"),
          call_function("shiftright", sk, b * chunk).bitwiseAND(mask).as("chunk")))
    val qSketch = Seq(query).toDF("v")
      .select(hyperplaneSketch(transform(col("v"), _.cast("float")), planes).as("sk"))
      .select(explode(bandsOf(col("sk"))).as("bc"))
      .select(col("bc.band").as("band"), col("bc.chunk").as("chunk"))
    val data = df.select(col(idCol), col(vecCol).as("__v"),
        explode(bandsOf(hyperplaneSketch(col(vecCol), planes))).as("bc"))
      .select(col(idCol), col("__v"), col("bc.band").as("band"), col("bc.chunk").as("chunk"))
    data.join(broadcast(qSketch), Seq("band", "chunk"))
      .dropDuplicates(idCol)
      .select(col(idCol), round(cosine(col("__v"), typedLit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-dup pairs via sketch-band bucketing (the
    * embedding flavor of DedupOps.minhashNearDups).
    */
  def cosineNearDups(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, planes: Int = 16, bands: Int = 4): DataFrame = {
    val chunk = planes / bands
    val mask = (1L << chunk) - 1
    val sk = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      hyperplaneSketch(col(vecCol), planes).as("sk"))
    val banded = sk.select(col("id"), col("v"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => call_function("shiftright", col("sk"), b * chunk).bitwiseAND(mask))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val l = banded.select(col("band"), col("chunk"), col("id").as("idA"), col("v").as("vA"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("idB"), col("v").as("vB"))
    l.join(r, Seq("band", "chunk")).filter(col("idA") < col("idB"))
      .dropDuplicates("idA", "idB")
      .withColumn("cos", round(cosine(col("vA"), col("vB")), 6))
      .filter(col("cos") >= threshold)
      .select("idA", "idB", "cos")
  }
}
