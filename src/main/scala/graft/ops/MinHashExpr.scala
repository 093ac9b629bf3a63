package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** K-permutation MinHash signature as a native Catalyst expression
  * (SURVEY.md §2.12 "custom Expression over UDF" rule).
  *
  * Input: the shingle array (array<string>). Output: array<long> of
  * length k where sig[i] = min over shingles s of
  * `xxhash64(xxhash64(s), i)` — BIT-FOR-BIT the value the former
  * aggregate/zip_with form computed (`XXH64.hashInt(i,
  * XXH64.hashLong(hashUTF8String(s, 42), 42))`, the exact fold the
  * XxHash64 expression performs over its children), so every oracle
  * pinned to the signatures (dd_minhash_planted, dd_minhash_pairs'
  * exact-Jaccard twin) is unchanged.
  *
  * Why native: the HOF form allocates a k-array per shingle and runs in
  * interpreted lambda eval (higher-order functions don't whole-stage-
  * codegen) — at ~200 shingles × k=20 that dominated dd_minhash_pairs
  * (17.6 s for 5.5k docs in BENCH_r04). Here each shingle costs one
  * string hash + one hashLong + k hashInt mixes in a tight compiled
  * loop, no per-shingle allocation.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MinHashSig needs array<string>, got $other")
  }

  /** Codegen/eval entry point (called from generated java too). */
  def sig(arr: ArrayData): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h0 = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        val hl = XXH64.hashLong(h0, 42L)
        var j = 0
        while (j < k) {
          val c = XXH64.hashInt(j, hl)
          if (c < out(j)) out(j) = c
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = sig(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    defineCodeGen(ctx, ev, c => s"$ref.sig($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
