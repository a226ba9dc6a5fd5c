package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the native expressions, both as a
  * SparkSessionExtensions injection (config
  * spark.sql.extensions=graft.functions.GraftExtensions) and as an
  * imperative helper for an existing session.
  *
  * After registration, plain SQL works:
  *   SELECT sniff_mime(bytes), detect_charset(bytes), lang_of(text),
  *          dot_f64(a, b) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}

object GraftExtensions {

  private[functions] val injections: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "sniff_mime" -> (args => SniffMime(args.head)),
    "detect_charset" -> (args => DetectCharset(args.head)),
    "lang_of" -> (args => LangOf(args.head)),
    "dot_f64" -> (args => DotF64(args(0), args(1))))

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
