package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's code points,
  * fold(acc·31 + cp) mod 1e9+7 — the shared fingerprint/shingle kernel of
  * the dedup operators (q29, q31, q39, q40).
  *
  * Semantically identical to the SQL formulation
  * `aggregate(sequence(1, length(s)), 0L, (acc,i) -> (acc*31 +
  * ascii(substring(s,i,1))) % 1000000007)` and to DuckDB's
  * `list_reduce(... ascii(s[i]) ...)`, but runs as one codegen'd loop —
  * no per-character int array materialization, no lambda dispatch. At
  * sf0.1 this kernel is the top cost of four queries; at 100 TB it is the
  * difference between a narrow map and an allocation storm.
  */
object PolyHashKernel {
  final val Mod = 1000000007L
  def hash(s: UTF8String): Long = {
    var acc = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) {
      acc = (acc * 31 + it.nextInt()) % Mod
    }
    acc
  }
}

case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    PolyHashKernel.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashKernel.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  /** Register `poly_hash(s)` for SQL/expr use (usable inside higher-order
    * function lambdas, where the Column API can't reach).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head), "built-in")

  def hash(c: Column): Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("poly_hash", c)
  }
}
