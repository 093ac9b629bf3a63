package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** IVF cluster assignment as a native Catalyst expression (SURVEY.md
  * §2.12 "custom Expression over UDF" rule): the index of the centroid
  * with the largest dot product against the input embedding.
  *
  * `centroids` is the FLATTENED k×dims centroid matrix, row-major,
  * pre-normalized to unit L2 on the driver — so argmax dot ≡ argmax
  * cosine (the row's own norm is a per-row constant across candidates).
  * The matrix is row-invariant and ships once per executor plan via the
  * codegen references array (same discipline as [[HyperplaneChunks]]:
  * the round-4 lesson was that anything row-invariant evaluated inside
  * per-row lambdas multiplies into the scan cost). Per-row cost is the
  * irreducible k·dims multiply-adds in a tight compiled loop.
  *
  * Ties break to the LOWEST centroid index (strict `>` keeps the first
  * maximum); [[SimilarityOps.rankClusters]] replicates the identical
  * double-precision loop on the driver so a probe's first-ranked
  * cluster is bit-for-bit the cluster this expression assigns the same
  * vector to — the invariant the planted ANN oracles rely on.
  */
case class NearestCentroid(child: Expression, centroids: Array[Double],
    k: Int, dims: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"NearestCentroid needs array<float|double>, got $other")
  }

  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Codegen/eval entry point (called from generated java too). */
  def nearest(arr: ArrayData): Int = {
    val n = math.min(arr.numElements(), dims)
    val isF = elemIsFloat
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dims
      var s = 0.0d
      var d = 0
      while (d < n) {
        if (!arr.isNullAt(d))
          s += (if (isF) arr.getFloat(d).toDouble else arr.getDouble(d)) * centroids(off + d)
        d += 1
      }
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  override protected def nullSafeEval(v: Any): Any = nearest(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    defineCodeGen(ctx, ev, c => s"$ref.nearest($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
