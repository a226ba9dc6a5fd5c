package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.SqlShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.kernel.Magic

/** Column functions backed by native Catalyst expressions (SURVEY.md §4's
  * optional upgrade over UDFs: no ScalaUDF serialization/null-wrapping on
  * the hot path; doGenCode emits a direct static call that whole-stage
  * codegen inlines into the generated consume loop).
  */
package object functions {

  /** MIME type of a binary payload by magic-byte sniffing (D1). */
  def sniff_mime(c: Column): Column = SqlShim.column(SniffMime(SqlShim.expression(c)))

  /** Detected charset name of a binary payload (D2). */
  def detect_charset(c: Column): Column = SqlShim.column(DetectCharset(SqlShim.expression(c)))

  /** ISO 639-1 language of a text column (D3); "und" when undetermined. */
  def lang_of(c: Column): Column = SqlShim.column(LangOf(SqlShim.expression(c)))

  /** Double-precision dot product of two float/double array columns —
    * allocation-free loop over ArrayData (vs aggregate(zip_with(..)) which
    * materializes an intermediate array per row pair).
    */
  def dot_f64(a: Column, b: Column): Column =
    SqlShim.column(DotF64(SqlShim.expression(a), SqlShim.expression(b)))

  /** n-word shingles of a text column: tokenizes once and emits
    * concat_ws(" ", slice(toks, j, n)) for j = 1..max(len-n+1, 1) — the
    * exact rows of transform(sequence(1, greatest(size(toks)-(n-1), 1)),
    * j => concat_ws(" ", slice(split(lower(text), " "), j, n))), but O(len)
    * instead of O(len * shingles): the HOF form is interpreted
    * (CodegenFallback) and re-evaluates split(lower(text)) once per
    * OUTPUT shingle. Tokenization/lowering go through the same
    * UTF8String calls Catalyst's Lower/StringSplit/ConcatWs use, so the
    * produced strings are bit-identical (property-tested vs the HOF form).
    */
  def shingles(text: Column, n: Int): Column =
    SqlShim.column(ShinglesExpr(SqlShim.expression(text), n))
}

package functions {

  /** Static entry points for generated code (codegen calls must be
    * static-resolvable; an object's MODULE$ works but a plain Java-style
    * static forwarder via object methods keeps the emitted source simple).
    */
  object Kernels {
    def sniffMime(bytes: Array[Byte]): UTF8String =
      UTF8String.fromString(Magic.refinedContentType(bytes))
    def detectCharset(bytes: Array[Byte]): UTF8String =
      UTF8String.fromString(graft.kernel.Charset.detect(bytes).name)
    def langOf(s: UTF8String): UTF8String =
      UTF8String.fromString(graft.kernel.Lang.detect(if (s == null) null else s.toString))
    private val SpaceU = UTF8String.fromString(" ")
    private val EmptyShingles =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](UTF8String.EMPTY_UTF8))

    /** n-word shingle array of `text` (null text behaves like the HOF
      * form: lower/split/slice propagate null into concat_ws, which
      * skips it and yields one "" shingle).
      */
    def shingles(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
      if (text == null) return EmptyShingles
      val toks = text.toLowerCase.split(SpaceU, -1)
      val m = math.max(toks.length - (n - 1), 1)
      val out = new Array[Any](m)
      var j = 0
      while (j < m) {
        val end = math.min(j + n, toks.length)
        out(j) = UTF8String.concatWs(SpaceU,
          java.util.Arrays.copyOfRange(toks, j, end): _*)
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    def dotF64(a: org.apache.spark.sql.catalyst.util.ArrayData,
        b: org.apache.spark.sql.catalyst.util.ArrayData,
        aFloat: Boolean, bFloat: Boolean): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
        i += 1
      }
      acc
    }
  }

  case class SniffMime(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      Kernels.sniffMime(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Kernels$$.MODULE$$.sniffMime($c)")
    override protected def withNewChildInternal(c: Expression): SniffMime = copy(c)
  }

  case class DetectCharset(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      Kernels.detectCharset(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Kernels$$.MODULE$$.detectCharset($c)")
    override protected def withNewChildInternal(c: Expression): DetectCharset = copy(c)
  }

  case class DotF64(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      Kernels.dotF64(x, y, elemIsFloat(left), elemIsFloat(right))
    }
    private def elemIsFloat(e: Expression): Boolean = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.Kernels$$.MODULE$$.dotF64($a, $b, ${elemIsFloat(left)}, ${elemIsFloat(right)})")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF64 =
      copy(l, r)
  }

  /** See [[functions.shingles]]. Output is never null (a null/empty text
    * yields [""], matching the HOF form it replaces), so nullable=false
    * and eval/doGenCode handle the null child inline.
    */
  case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "shingle width must be >= 1")
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      Kernels.shingles(child.eval(input).asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val c = child.genCode(ctx)
      val fn = "graft.functions.Kernels$.MODULE$.shingles"
      val arrayData = "org.apache.spark.sql.catalyst.util.ArrayData"
      val resultCode =
        code"""${c.code}
$arrayData ${ev.value} = $fn(${c.isNull} ? null : ${c.value}, $n);"""
      ev.copy(code = resultCode, isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): ShinglesExpr =
      copy(child = c)
  }

  case class LangOf(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      Kernels.langOf(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Kernels$$.MODULE$$.langOf($c)")
    override protected def withNewChildInternal(c: Expression): LangOf = copy(c)
  }
}
