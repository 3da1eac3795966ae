package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Point-in-time ("as-of") join, the lookup FINporter's MTransaction ×
  * MSecurity semantics imply (SURVEY §2 Table B "theta/range & as-of").
  *
  * Spark-first design: rather than a non-equi range join (which plans as a
  * cross product) we UNION the two sides tagged, sort once per key, and carry
  * the most recent right-side payload forward with `last(_, ignoreNulls)`
  * over an unbounded-preceding row frame. Cost at scale: ONE shuffle of
  * (|L|+|R|) rows on the key — survives a 100× scale-up where the
  * cross-product formulation explodes.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row with
    * `right(rightTime) <= left(leftTime)` within the same `key` group
    * (inclusive, ties resolve to the right row — DuckDB ASOF JOIN
    * semantics). Right payload columns are emitted under their own names;
    * left rows with no preceding right row get nulls (left-outer; filter
    * for inner).
    *
    * SQL-join NULL semantics: null-key rows never match (they are dropped
    * from the right side and pass through unmatched on the left). Ties
    * among right rows at identical (key, time) resolve deterministically
    * to the greatest payload (struct ordering).
    *
    * Constraint: every `rightPayload` column must have an ORDERABLE type
    * (no MapType) — the tie-break window orders by the payload struct, so
    * a non-orderable payload fails analysis. Callers with map-typed
    * payloads should pre-serialize (e.g. `to_json`) or add a surrogate
    * orderable tie-break column.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Tagged union: right rows sort before left rows at equal times so the
    // window's `last` sees them (inclusive <=).
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(structType(right, rightPayload)))
      .select(col(key).as("__k"), col("__t"), col("__side"),
        struct(leftCols.map(col): _*).as("__row"), col("__payload"))
    val r = right
      .where(col(key).isNotNull && col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(col(key).as("__k"), col("__t"), col("__side"),
        lit(null).cast(structTypeOf(left)).as("__row"),
        struct(rightPayload.map(col): _*).as("__payload"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__row.$c").as(c)) ++
          rightPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** FORWARD as-of: for each left row, attach the EARLIEST right row with
    * `right(rightTime) >= left(leftTime)` within the same `key` group
    * (inclusive) — "the next quote/delivery/purchase at or after", the
    * mirror of [[asOf]]'s latest-at-or-before and the second of the two
    * standard as-of directions (pandas merge_asof backward/forward).
    * Same single-shuffle union+window construction, traversed in
    * DESCENDING time order so `last(_, ignoreNulls)` carries the nearest
    * FOLLOWING right payload: right rows sort before left rows at equal
    * times (inclusive >=), and ties among right rows at identical
    * (key, time) resolve deterministically to the greatest payload
    * struct, matching [[asOf]]. Null-key/null-time right rows are
    * dropped; unmatched left rows get nulls (left-outer).
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(structType(right, rightPayload)))
      .select(col(key).as("__k"), col("__t"), col("__side"),
        struct(leftCols.map(col): _*).as("__row"), col("__payload"))
    val r = right
      .where(col(key).isNotNull && col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(col(key).as("__k"), col("__t"), col("__side"),
        lit(null).cast(structTypeOf(left)).as("__row"),
        struct(rightPayload.map(col): _*).as("__payload"))
    // descending time: the last non-null payload before a left row is the
    // smallest right time >= the left time; among equal right times the
    // ascending payload order makes `last` pick the greatest payload
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").desc, col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__row.$c").as(c)) ++
          rightPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** NEAREST as-of: for each left row, the right row minimizing
    * |rightTime − leftTime| within the key group, ties to the at-or-
    * before side (pandas merge_asof direction='nearest'). ONE union +
    * ONE key shuffle + ONE sort serves BOTH directions: on the ascending
    * time sort, `last(_, ignoreNulls)` over the preceding frame carries
    * the latest at-or-before payload and `first(_, ignoreNulls)` over
    * the strictly-following frame carries the earliest after payload.
    * The following frame is EXCLUSIVE of equal-time right rows (they
    * sort before the left row for the backward window's benefit), which
    * cannot change the result: an equal-time match is a gap-0 backward
    * match, and ties resolve backward anyway. The matched right TIME
    * rides inside the internal payload so the gap comparison needs no
    * re-join.
    */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val innerType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "__rt", right.schema(rightTime).dataType),
      org.apache.spark.sql.types.StructField(
        "__p", structType(right, rightPayload))))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(innerType))
      .select(col(key).as("__k"), col("__t"), col("__side"),
        struct(leftCols.map(col): _*).as("__row"), col("__payload"))
    val r = right
      .where(col(key).isNotNull && col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(col(key).as("__k"), col("__t"), col("__side"),
        lit(null).cast(structTypeOf(left)).as("__row"),
        struct(col(rightTime).as("__rt"),
          struct(rightPayload.map(col): _*).as("__p")).as("__payload"))
    val ord = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__payload"))
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(1, Window.unboundedFollowing)
    val backGap = col("__t") - col("__b.__rt")
    val fwdGap = col("__f.__rt") - col("__t")
    l.unionByName(r)
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__payload"), ignoreNulls = true).over(wF))
      .where(col("__side") === 1)
      .withColumn("__asof",
        when(col("__b").isNull, col("__f.__p"))
          .when(col("__f").isNull, col("__b.__p"))
          .when(backGap <= fwdGap, col("__b.__p"))
          .otherwise(col("__f.__p")))
      .select(
        leftCols.map(c => col(s"__row.$c").as(c)) ++
          rightPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }

  private def structTypeOf(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
