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
