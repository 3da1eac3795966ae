package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private val leftSchema = StructType(Seq(
    StructField("k", LongType), StructField("t", LongType),
    StructField("payload", StringType)))
  private val rightSchema = StructType(Seq(
    StructField("k", LongType), StructField("rt", LongType),
    StructField("price", DoubleType)))

  test("asOf picks the latest right row at or before the left time") {
    val l = df(leftSchema, Row(1L, 10L, "a"), Row(1L, 20L, "b"), Row(1L, 5L, "c"))
    val r = df(rightSchema, Row(1L, 8L, 100.0), Row(1L, 15L, 200.0), Row(1L, 20L, 300.0))
    val out = AsOfJoin.asOf(l, r, "k", "t", "rt", Seq("price"))
      .collect().map(x => (x.getString(2), if (x.isNullAt(3)) null else x.getDouble(3))).toMap
    assert(out("a") == 100.0) // t=10 -> rt=8
    assert(out("b") == 300.0) // t=20 -> rt=20 (inclusive)
    assert(out("c") == null)  // t=5 -> nothing at or before
  }

  test("null keys never match and pass through unmatched") {
    val l = df(leftSchema, Row(null, 10L, "a"))
    val r = df(rightSchema, Row(null, 5L, 50.0))
    val out = AsOfJoin.asOf(l, r, "k", "t", "rt", Seq("price")).collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("keys without right rows stay left-outer") {
    val l = df(leftSchema, Row(2L, 10L, "solo"))
    val r = df(rightSchema, Row(1L, 5L, 50.0))
    val out = AsOfJoin.asOf(l, r, "k", "t", "rt", Seq("price")).collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("asOfForward picks the earliest right row at or after the left time") {
    val l = df(leftSchema, Row(1L, 10L, "a"), Row(1L, 20L, "b"), Row(1L, 25L, "c"))
    val r = df(rightSchema, Row(1L, 8L, 100.0), Row(1L, 15L, 200.0), Row(1L, 20L, 300.0))
    val out = AsOfJoin.asOfForward(l, r, "k", "t", "rt", Seq("price"))
      .collect().map(x => (x.getString(2), if (x.isNullAt(3)) null else x.getDouble(3))).toMap
    assert(out("a") == 200.0) // t=10 -> rt=15 (next at or after)
    assert(out("b") == 300.0) // t=20 -> rt=20 (inclusive)
    assert(out("c") == null)  // t=25 -> nothing at or after
  }

  test("asOfForward ties at identical right times resolve to the greatest payload") {
    val l = df(leftSchema, Row(1L, 10L, "a"))
    val r = df(rightSchema, Row(1L, 12L, 100.0), Row(1L, 12L, 250.0))
    val out = AsOfJoin.asOfForward(l, r, "k", "t", "rt", Seq("price")).collect()
    assert(out.length == 1 && out.head.getDouble(3) == 250.0)
  }

  test("asOfForward null keys and missing keys stay left-outer") {
    val l = df(leftSchema, Row(null, 10L, "a"), Row(2L, 10L, "solo"))
    val r = df(rightSchema, Row(null, 15L, 50.0), Row(1L, 15L, 60.0))
    val out = AsOfJoin.asOfForward(l, r, "k", "t", "rt", Seq("price")).collect()
    assert(out.length == 2 && out.forall(_.isNullAt(3)))
  }

  test("asOfNearest picks the closer side and breaks ties backward") {
    val l = df(leftSchema, Row(1L, 10L, "a"), Row(1L, 21L, "b"), Row(1L, 30L, "c"))
    val r = df(rightSchema, Row(1L, 8L, 100.0), Row(1L, 26L, 200.0))
    val out = AsOfJoin.asOfNearest(l, r, "k", "t", "rt", Seq("price"))
      .collect().map(x => (x.getString(2), x.getDouble(3))).toMap
    assert(out("a") == 100.0) // gap 2 back vs 16 fwd
    assert(out("b") == 200.0) // gap 13 back vs 5 fwd
    assert(out("c") == 200.0) // nothing after -> backward
    val tie = df(leftSchema, Row(1L, 17L, "t"))
    val outTie = AsOfJoin.asOfNearest(tie, r, "k", "t", "rt", Seq("price")).collect()
    assert(outTie.head.getDouble(3) == 100.0) // 9 back == 9 fwd -> backward
  }

  test("asOfNearest equal-time right rows match with gap zero") {
    val l = df(leftSchema, Row(1L, 12L, "x"))
    val r = df(rightSchema, Row(1L, 12L, 300.0), Row(1L, 13L, 400.0))
    val out = AsOfJoin.asOfNearest(l, r, "k", "t", "rt", Seq("price")).collect()
    assert(out.head.getDouble(3) == 300.0)
  }

  test("asOfNearest stays left-outer with no right rows in the key group") {
    val l = df(leftSchema, Row(9L, 10L, "lone"))
    val r = df(rightSchema, Row(1L, 5L, 50.0))
    val out = AsOfJoin.asOfNearest(l, r, "k", "t", "rt", Seq("price")).collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }
}
