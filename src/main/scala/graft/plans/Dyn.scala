package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.shim.toColumn
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** A scalar plan parameter that stays OUT of the generated source.
  *
  * A plain `lit(nextSeq)` inlines its value into the whole-stage-codegen
  * source, so two structurally identical BSP rounds generate DIFFERENT
  * source and every round pays a fresh janino compile — measured as
  * seconds of core-count-independent driver time per round, the single
  * largest term of the crawl's fixed critical path. `DynLiteral` routes
  * the value through the codegen `references` array instead (the same
  * mechanism broadcast variables use): identical source across rounds →
  * compiled-class cache hit, while the Catalyst plan still carries the
  * true per-round value for correctness.
  *
  * `foldable = false` keeps the optimizer from constant-folding the
  * value back into a `Literal` (which would defeat the purpose).
  */
case class DynLiteral(value: Any, dataType: DataType) extends LeafExpression {
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = s"java.lang.${dataType match {
      case LongType => "Long"
      case IntegerType => "Integer"
      case DoubleType => "Double"
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }}"
    val ref = ctx.addReferenceObj("dynVal", value, boxed)
    val javaType = CodeGenerator.javaType(dataType)
    val unbox = dataType match {
      case LongType => s"$ref.longValue()"
      case IntegerType => s"$ref.intValue()"
      case DoubleType => s"$ref.doubleValue()"
      case _ => ref
    }
    ev.copy(code = code"final $javaType ${ev.value} = $unbox;", isNull = FalseLiteral)
  }
}

object Dyn {
  def dynLong(v: Long): Column = toColumn(DynLiteral(v, LongType))
  def dynInt(v: Int): Column = toColumn(DynLiteral(v, IntegerType))
  def dynDouble(v: Double): Column = toColumn(DynLiteral(v, DoubleType))
}
