package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Banded]] is load-bearing for five registered queries (q117, q181,
  * q193/q209, q237, q240): this spec pins its defining identity —
  * banded offsets + within-band running sums EQUAL the single-partition
  * global window they replace — on shapes the call sites actually use
  * (plain cumsum, rank-as-cumsum-of-1 with totals, partitioned,
  * descending, duplicate order keys across band boundaries).
  */
class BandedSpec extends SparkSuite {

  private def base = {
    import spark.implicits._
    // duplicated keys, keys straddling band edges (band = k div 3)
    Seq((1L, 10L, "x"), (2L, 20L, "x"), (2L, 5L, "x"), (3L, 7L, "y"),
      (4L, 1L, "y"), (5L, 2L, "x"), (6L, 4L, "y"), (8L, 8L, "x"),
      (9L, 3L, "y"), (9L, 6L, "x"), (11L, 9L, "y"))
      .toDF("k", "v", "g")
      .withColumn("id", monotonically_increasing_id())
  }

  test("cumSums equals the global running sum, ascending and descending") {
    val df = base
    val naiveAsc = df.withColumn("cum", sum(col("v")).over(
      Window.orderBy(col("k"), col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val bandedAsc = Banded.cumSums(df, Nil, Seq(col("k"), col("id")),
      expr("k div 3"), Seq(Banded.CumSpec("cum", col("v"))))
    assert(bandedAsc.select("k", "id", "cum").collect().toSet ==
      naiveAsc.select("k", "id", "cum").collect().toSet)

    val naiveDesc = df.withColumn("cum", sum(col("v")).over(
      Window.orderBy(col("k").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val bandedDesc = Banded.cumSums(df, Nil,
      Seq(col("k").desc, col("id")), expr("k div 3"),
      Seq(Banded.CumSpec("cum", col("v"))), bandDesc = true)
    assert(bandedDesc.select("k", "id", "cum").collect().toSet ==
      naiveDesc.select("k", "id", "cum").collect().toSet)
  }

  test("rank-as-cumsum-of-1 with per-partition totals, partitioned by group") {
    val df = base
    val naive = df
      .withColumn("r", row_number().over(
        Window.partitionBy("g").orderBy(col("k"), col("id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
    val banded = Banded.cumSums(df, Seq("g"), Seq(col("k"), col("id")),
      expr("k div 3"), Seq(Banded.CumSpec("r", lit(1L), Some("n"))))
    assert(banded.select("g", "k", "id", "r", "n").collect().toSet ==
      naive.select("g", "k", "id", "r", "n").collect().toSet)
  }

  test("two measures ride one pass (the q237 two-CDF shape)") {
    val df = base
      .withColumn("v2", col("v") * 2 + 1)
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val naive = df
      .withColumn("c1", sum(col("v")).over(w))
      .withColumn("c2", sum(col("v2")).over(w))
    val banded = Banded.cumSums(df, Nil, Seq(col("k"), col("id")),
      expr("k div 3"),
      Seq(Banded.CumSpec("c1", col("v")), Banded.CumSpec("c2", col("v2"))))
    assert(banded.select("k", "id", "c1", "c2").collect().toSet ==
      naive.select("k", "id", "c1", "c2").collect().toSet)
  }

  test("the within-band window partitions by band (never one global task)") {
    val p = Banded.cumSums(base, Nil, Seq(col("k"), col("id")),
        expr("k div 3"), Seq(Banded.CumSpec("cum", col("v"))))
      .queryExecution.executedPlan.toString
    // the corpus-side running-sum window must exchange on the band key —
    // a windowspec with an empty partitionBy would be the one-task trap
    assert(p.contains("hashpartitioning(__graft_banded_band"),
      s"banded window lost its band partitioning:\n$p")
  }

  test("a caller's own 'band' column passes through untouched (ADVICE r12)") {
    val df = base.withColumn("band", col("k") * 100)
    val out = Banded.cumSums(df, Nil, Seq(col("k"), col("id")),
      expr("k div 3"), Seq(Banded.CumSpec("cum", col("v"))))
    // schema is exactly input ++ outputs; no helper columns leak
    assert(out.columns.toSeq == df.columns.toSeq :+ "cum")
    assert(out.select("k", "band").collect()
      .forall(r => r.getLong(1) == r.getLong(0) * 100))
  }

  test("colliding output names are rejected, not silently clobbered") {
    val df = base.withColumn("cum", lit(0L))
    val e = intercept[IllegalArgumentException] {
      Banded.cumSums(df, Nil, Seq(col("k"), col("id")),
        expr("k div 3"), Seq(Banded.CumSpec("cum", col("v"))))
    }
    assert(e.getMessage.contains("cum"))
  }
}
