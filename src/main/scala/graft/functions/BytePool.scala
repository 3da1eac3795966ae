package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 1-D average-pooling "resize" over a payload's code points: the k-th
  * code point lands in window floor(k·n/L), each window emits its mean
  * value as a micro-unit integer (sum·1e6 / count, integer division so
  * both engines agree bit-exactly). This is the downsample/resize step of
  * the multimodal pipeline (q53) applied to the stand-in text payloads —
  * a real image resize replaces the kernel body, not the plan shape: one
  * codegen'd pass per row, fixed-size output, no intermediate per-element
  * arrays (the SQL HOF formulation materializes L-element lists per row
  * and runs interpreted).
  */
object BytePoolKernel {
  /** Walks UTF-8 bytes directly (no String copy), decoding code points as
    * [[PolyHashKernel.hash]] does; empty windows (L < n) emit 0.
    */
  def pool(s: UTF8String, n: Int): Array[Long] = {
    val total = s.numChars()
    val sums = new Array[Long](n)
    val counts = new Array[Long](n)
    val nBytes = s.numBytes()
    var i = 0
    var k = 0L
    while (i < nBytes) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
      else if ((b0 & 0xF8) == 0xF0) { cp = b0 & 0x07; len = 4 }
      else { cp = 0xFFFD }
      var j = 1
      while (j < len && i + j < nBytes) {
        cp = (cp << 6) | (s.getByte(i + j) & 0x3F)
        j += 1
      }
      val w = if (total > 0) ((k * n) / total).toInt else 0
      if (w < n) { sums(w) += cp; counts(w) += 1 }
      i += len
      k += 1
    }
    Array.tabulate(n)(w => if (counts(w) > 0) sums(w) * 1000000L / counts(w) else 0L)
  }

  def poolData(s: UTF8String, n: Int): GenericArrayData =
    new GenericArrayData(pool(s, n))
}

case class BytePool(child: Expression, windows: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && windows > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_pool requires (string, windows > 0), got ${child.dataType.simpleString}, $windows")

  override def nullSafeEval(input: Any): Any =
    BytePoolKernel.poolData(input.asInstanceOf[UTF8String], windows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BytePoolKernel.poolData($c, $windows)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BytePool {
  private[graft] val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2 && exprs(1).foldable,
        "byte_pool(s, n) requires a foldable integer window count")
      val n = exprs(1).eval(null)
      require(n != null && n.isInstanceOf[Number],
        "byte_pool(s, n) requires a non-null integer window count")
      BytePool(exprs.head, n.asInstanceOf[Number].intValue())
    }

  /** Register `byte_pool(s, n)` (n must be a foldable int literal). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_pool", builder, "built-in")

  def pool(c: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.{call_function, lit}
    call_function("byte_pool", c, lit(n))
  }
}
