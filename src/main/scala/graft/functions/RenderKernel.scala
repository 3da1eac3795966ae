package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-serialization kernel pieces needing exact reference parity
  * (reference/Sources/Helpers/DelimitedEncoder.swift:122-142).
  *
  * Doubles render as shortest-round-trip digits WITHOUT scientific
  * notation — the reference golden pins `-0.00033` (not `-3.3E-4`,
  * reference/Tests/Helpers/DelimitedEncoderTests.swift:80-89), while
  * Java's `Double.toString` goes scientific below 1e-3 and above 1e7.
  * `plainString` re-expands the shortest form via BigDecimal, so digits
  * are identical to the shortest repr, just never scientific.
  */
object RenderKernel {
  def plainString(d: Double): UTF8String = {
    val s =
      if (d.isNaN || d.isInfinite) java.lang.Double.toString(d)
      else new java.math.BigDecimal(java.lang.Double.toString(d)).toPlainString
    UTF8String.fromString(s)
  }
}

/** Codegen'd double→plain-string expression (stays inside whole-stage
  * codegen; the BigDecimal path only triggers outside [1e-3, 1e7)).
  */
case class DoublePlainString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"double_plain requires double input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    RenderKernel.plainString(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RenderKernel.plainString($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DoublePlainString {
  /** Register `double_plain(x)`; Column form via call_function (Spark 4
    * exposes no public Expression→Column constructor).
    */
  private[graft] val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 1, "double_plain(x) takes exactly 1 argument")
      DoublePlainString(exprs.head)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "double_plain", builder, "built-in")

  def plain(c: Column): Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("double_plain", c)
  }
}
