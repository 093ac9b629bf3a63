package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane sign sketch as a native Catalyst expression
  * (SURVEY.md §2.12 "custom Expression over UDF" rule).
  *
  * Input: a float/double array column (the embedding). Output: one long
  * per band; bit j of band b is sign(v · plane_{b·chunkBits+j}).
  *
  * `planes` is the FLATTENED (bands·chunkBits)×dims hyperplane matrix,
  * row-major. It is row-invariant, so it is computed ONCE on the driver
  * (SimilarityOps.planeMatrix) and ships in the plan references — the
  * round-4 form evaluated a per-(plane,dim) xxhash64 inside interpreted
  * higher-order-function lambdas, i.e. 16,384 hash evals PER ROW, which
  * regressed ann_lsh_topk 10× (86.4 s for 2,000 rows). Here the per-row
  * cost is the irreducible bands·chunkBits·dims multiply-adds in a tight
  * compiled loop (~µs/row at 16×16×64). At 256×64 the matrix is 128 KB —
  * it rides the codegen references array (the broadcast-variable
  * mechanism), shipped once per executor plan, never per row.
  */
case class HyperplaneChunks(child: Expression, planes: Array[Double],
    bands: Int, chunkBits: Int, dims: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"HyperplaneChunks needs array<float|double>, got $other")
  }

  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Codegen/eval entry point (called from generated java too). Sums in
    * ascending dim order with a 0.0 accumulator — bit-for-bit the same
    * IEEE sequence as the former zip_with/aggregate expression, so
    * sketches (and every planted oracle pinned to them) are unchanged.
    */
  def sketch(arr: ArrayData): ArrayData = {
    val n = math.min(arr.numElements(), dims)
    val out = new Array[Long](bands)
    val isF = elemIsFloat
    var b = 0
    while (b < bands) {
      var chunk = 0L
      var j = 0
      while (j < chunkBits) {
        val off = (b * chunkBits + j) * dims
        var s = 0.0d
        var d = 0
        while (d < n) {
          if (!arr.isNullAt(d))
            s += (if (isF) arr.getFloat(d).toDouble else arr.getDouble(d)) * planes(off + d)
          d += 1
        }
        if (s > 0) chunk |= (1L << j)
        j += 1
      }
      out(b) = chunk
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = sketch(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneChunks", this,
      classOf[HyperplaneChunks].getName)
    defineCodeGen(ctx, ev, c => s"$ref.sketch($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
