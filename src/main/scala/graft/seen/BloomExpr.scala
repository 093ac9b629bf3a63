package graft.seen

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Per-JVM cache of deserialized blooms keyed by broadcast id: the
  * broadcast ships the compact byte form once per executor; the first
  * probe on each executor inflates it, every later probe is a
  * lock-free map read (vs. the round-1 UDF that serialized every row
  * of every task through one global monitor).
  */
object BloomCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Long, BloomFilter]()
  def get(b: Broadcast[Array[Byte]]): BloomFilter = {
    // bound memory across many rounds by evicting the ELDEST broadcast
    // ids (monotonically increasing), never the whole cache — a full
    // clear() let concurrent probes thrash re-deserialization
    if (cache.size > 8) {
      import scala.jdk.CollectionConverters._
      cache.keySet.asScala.toSeq.sorted.dropRight(4).foreach(cache.remove)
    }
    cache.computeIfAbsent(b.id, _ => UrlSeen.deserialize(b.value))
  }
}

/** `mightContain` over a broadcast bloom as a native Catalyst
  * expression (SURVEY.md §2.12): null-safe, participates in whole-stage
  * codegen (the generated code calls back into this instance via a
  * reference object), deserializes the bloom once per executor via
  * [[BloomCache]]. Input: the Long seen-key hash ([[UrlSeen.seenKey]]).
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[Array[Byte]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  @transient private lazy val filter: BloomFilter = BloomCache.get(bloom)

  /** Codegen entry point (called from generated java). */
  def bloomHit(h: Long): Boolean = filter.mightContainLong(h)

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bloomHit($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
