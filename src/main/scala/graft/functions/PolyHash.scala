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
  /** Decodes UTF-8 code points directly off the UTF8String's bytes — no
    * String/char[] copy per value (this runs per shingle on the dedup hot
    * path). Matches `String.codePoints()` for well-formed UTF-8; bytes
    * that are not a valid lead (stray continuation bytes, 0xF8-0xFF)
    * hash as U+FFFD, one per byte, like the charset decoder's
    * replacement policy.
    */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
      else if ((b0 & 0xF8) == 0xF0) { cp = b0 & 0x07; len = 4 }
      else { cp = 0xFFFD } // invalid lead byte → replacement char
      var j = 1
      while (j < len && i + j < n) {
        cp = (cp << 6) | (s.getByte(i + j) & 0x3F)
        j += 1
      }
      acc = (acc * 31 + cp) % Mod
      i += len
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
  private[graft] val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 1, "poly_hash(s) takes exactly 1 argument")
      PolyHash(exprs.head)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", builder, "built-in")

  def hash(c: Column): Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("poly_hash", c)
  }

  /** DuckDB twin of the kernel, for oracle SQL: the same left-to-right
    * `(acc * 31 + byte) % 1e9+7` fold the codegen expression computes.
    * Shared by every oracle that fingerprints text (q29, q57) so the
    * constant can never drift between the plan and the oracle.
    */
  def oracleSql(textExpr: String): String =
    s"""list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length($textExpr) + 1),
       |                     i -> CAST(ascii($textExpr[i]) AS BIGINT))),
       |    (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin
}
