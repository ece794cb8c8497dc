package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Native Catalyst expression twin of [[Durations.parse]]: duration
  * string → seconds with null on unparseable input.
  *
  * Unlike the registered Scala UDF (kept for ad-hoc SQL use), this
  * participates in whole-stage codegen: `doGenCode` emits a direct
  * static call into [[Durations]] with no Scala-function wrapper, no
  * boxing of the hot path's row, and no codegen fallback — the right
  * shape when duration parsing sits inside a 100 TB trace-scan
  * pipeline (builder-prompt preference: native Expression > UDF). */
case class ParseDuration(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_duration_native requires a string argument, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_duration_native"

  override def nullSafeEval(input: Any): Any =
    Durations.parseBoxed(input.toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("dur")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${c.isNull}) {
        java.lang.Double $boxed =
          graft.functions.Durations.parseBoxed(${c.value}.toString());
        if ($boxed != null) {
          ${ev.isNull} = false;
          ${ev.value} = $boxed.doubleValue();
        }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseDuration =
    copy(child = newChild)
}

object ParseDuration {
  /** Column-API entry point. */
  def parseDuration(c: Column): Column =
    ColumnBridge.column(ParseDuration(ColumnBridge.expression(c)))

  /** SQL registration: `parse_duration_native(col)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_duration_native", exprs => ParseDuration(exprs.head), "builtin")
}
