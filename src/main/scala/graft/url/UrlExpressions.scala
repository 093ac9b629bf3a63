package graft.url

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.shim.{toColumn, toExpression}

/** Catalyst expressions over [[UrlFuncs]] (SURVEY.md §2.12).
  *
  * Native expressions rather than Scala UDFs: null-safe, participate in
  * whole-stage codegen via a static call into the (JVM-wide) UrlFuncs
  * object — no closure serialization, no Row conversion.
  */
/** Codegen-reachable static bridge (UTF8String in/out): a top-level
  * object with no companion class compiles to Java static forwarders,
  * so generated (janino) code can call `graft.url.UrlUrlBridge.defrag(x)`
  * directly.
  */
object UrlBridge {
    def defrag(s: UTF8String): UTF8String = UTF8String.fromString(UrlFuncs.defrag(s.toString))
    def unquote2(s: UTF8String): UTF8String = UTF8String.fromString(UrlFuncs.unquote2(s.toString))
    def quote(s: UTF8String): UTF8String = UTF8String.fromString(UrlFuncs.quote(s.toString))
    def host(s: UTF8String): UTF8String = UTF8String.fromString(UrlFuncs.host(s.toString))
    def scheme(s: UTF8String): UTF8String = UTF8String.fromString(UrlFuncs.scheme(s.toString))
    def normalize(s: UTF8String): UTF8String = UTF8String.fromString(UrlFuncs.urlNormalize(s.toString))
    def canonSeed(s: UTF8String): UTF8String = UTF8String.fromString(UrlFuncs.canonSeed(s.toString))
    def urljoin(b: UTF8String, u: UTF8String): UTF8String =
      UTF8String.fromString(UrlFuncs.urljoin(b.toString, u.toString))
    def canonLink(b: UTF8String, u: UTF8String): UTF8String =
      UTF8String.fromString(UrlFuncs.canonLink(b.toString, u.toString))
    def pathq(s: UTF8String): UTF8String = {
      val rest = UrlFuncs.splitUrl(s.toString)._3
      UTF8String.fromString(if (rest.isEmpty) "/" else rest)
    }
  def isValid(s: UTF8String): Boolean = UrlFuncs.isValidIri(s.toString)
}

object UrlExpressions {

  private val B = "graft.url.UrlBridge"

  trait UrlUnary extends UnaryExpression {
    protected def fn: String
    override def dataType: DataType = StringType
    final override protected def nullSafeEval(v: Any): Any = evalStr(v.asInstanceOf[UTF8String])
    protected def evalStr(s: UTF8String): UTF8String
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$B.$fn($c)")
  }

  case class UrlDefrag(child: Expression) extends UrlUnary {
    protected def fn = "defrag"
    protected def evalStr(s: UTF8String): UTF8String = UrlBridge.defrag(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }
  case class UrlUnquote2(child: Expression) extends UrlUnary {
    protected def fn = "unquote2"
    protected def evalStr(s: UTF8String): UTF8String = UrlBridge.unquote2(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }
  case class UrlQuote(child: Expression) extends UrlUnary {
    protected def fn = "quote"
    protected def evalStr(s: UTF8String): UTF8String = UrlBridge.quote(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }
  case class UrlHost(child: Expression) extends UrlUnary {
    protected def fn = "host"
    protected def evalStr(s: UTF8String): UTF8String = UrlBridge.host(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }
  case class UrlScheme(child: Expression) extends UrlUnary {
    protected def fn = "scheme"
    protected def evalStr(s: UTF8String): UTF8String = UrlBridge.scheme(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }
  case class UrlNormalizeExpr(child: Expression) extends UrlUnary {
    protected def fn = "normalize"
    protected def evalStr(s: UTF8String): UTF8String = UrlBridge.normalize(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }
  case class UrlCanonSeed(child: Expression) extends UrlUnary {
    protected def fn = "canonSeed"
    protected def evalStr(s: UTF8String): UTF8String = UrlBridge.canonSeed(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Path+query of a URL ("/" when empty) — the robots match target. */
  case class UrlPathQ(child: Expression) extends UrlUnary {
    protected def fn = "pathq"
    protected def evalStr(s: UTF8String): UTF8String = UrlBridge.pathq(s)
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** RFC-3987-ish validity gate (core.py:103-110), boolean-typed. */
  case class UrlIsValid(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override protected def nullSafeEval(v: Any): Any =
      UrlFuncs.isValidIri(v.asInstanceOf[UTF8String].toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$B.isValid($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** urljoin(base, href) per CPython urllib (links_finder_plugin.py:56). */
  case class UrlJoin(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(b: Any, u: Any): Any =
      UrlBridge.urljoin(b.asInstanceOf[UTF8String], u.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (b, u) => s"$B.urljoin($b, $u)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** Full discovered-link canonicalization: defrag∘unquote²∘quote∘urljoin
    * (links_finder_plugin.py:56-66 + transaction.py:111,152).
    */
  case class UrlCanonLink(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(b: Any, u: Any): Any =
      UrlBridge.canonLink(b.asInstanceOf[UTF8String], u.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (b, u) => s"$B.canonLink($b, $u)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  // Column-level API
  def url_defrag(c: Column): Column = toColumn(UrlDefrag(toExpression(c)))
  def url_unquote2(c: Column): Column = toColumn(UrlUnquote2(toExpression(c)))
  def url_quote(c: Column): Column = toColumn(UrlQuote(toExpression(c)))
  def url_host(c: Column): Column = toColumn(UrlHost(toExpression(c)))
  def url_scheme(c: Column): Column = toColumn(UrlScheme(toExpression(c)))
  def url_normalize(c: Column): Column = toColumn(UrlNormalizeExpr(toExpression(c)))
  def url_canon_seed(c: Column): Column = toColumn(UrlCanonSeed(toExpression(c)))
  def url_pathq(c: Column): Column = toColumn(UrlPathQ(toExpression(c)))
  def url_is_valid(c: Column): Column = toColumn(UrlIsValid(toExpression(c)))
  def url_join(base: Column, href: Column): Column =
    toColumn(UrlJoin(toExpression(base), toExpression(href)))
  def url_canon_link(base: Column, href: Column): Column =
    toColumn(UrlCanonLink(toExpression(base), toExpression(href)))
}
