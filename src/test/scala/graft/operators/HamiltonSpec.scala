package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Pipeline.hamiltonOf]] is load-bearing for four registered queries
  * (q223, q261, q324/q330, q351): this spec pins the helper against the
  * hand-inlined largest-remainder idiom it replaced (VERDICT r14 item 7)
  * on the caller shapes — single weight, dual weight with distinct
  * totals, and a budget that divides evenly (no remainder arm) — plus
  * the two invariants the idiom exists for: Σ alloc == budget exactly,
  * and determinism under fractional-remainder ties (key breaks them).
  */
class HamiltonSpec extends SparkSuite {

  // weights chosen so the remainder arm fires (Σw = 23 does not divide
  // the budgets) and two sources tie on fractional remainder
  private def strata = {
    import spark.implicits._
    Seq(("a", 7L, 3L), ("b", 5L, 9L), ("c", 7L, 2L), ("d", 4L, 9L))
      .toDF("source", "n", "w2")
  }

  /** The inline idiom exactly as q223/q261/q324/q351 wrote it. */
  private def inline(df: org.apache.spark.sql.DataFrame, budget: Long,
      weightCol: String): org.apache.spark.sql.DataFrame = {
    val quotas = df
      .crossJoin(broadcast(df.agg(sum(col(weightCol)).as("total"))))
      .withColumn("fl", expr(s"($budget * $weightCol) div total"))
      .withColumn("frac", expr(s"($budget * $weightCol) % total"))
    val rem = quotas.agg((lit(budget) - sum(col("fl"))).as("rem"))
    quotas
      .withColumn("r",
        row_number().over(Window.orderBy(col("frac").desc, col("source"))))
      .crossJoin(broadcast(rem))
      .withColumn("alloc",
        col("fl") + when(col("r") <= col("rem"), 1L).otherwise(0L))
  }

  test("single-weight shape (q223/q261): helper == inline idiom") {
    val df = strata
    for (budget <- Seq(100L, 17L, 1000000L)) {
      val helper = Pipeline.hamiltonOf(df, "source", budget, "n" -> "alloc")
        .select("source", "alloc").collect().toSet
      val hand = inline(df, budget, "n")
        .select("source", "alloc").collect().toSet
      assert(helper == hand, s"budget=$budget: $helper != $hand")
    }
  }

  test("dual-weight shape (q324/q351): each allocation == its own inline run") {
    val df = strata
    val dual = Pipeline.hamiltonOf(df, "source", 17L,
      "n" -> "a1", "w2" -> "a2")
    assert(dual.select(col("source"), col("a1").as("alloc"))
      .collect().toSet ==
      inline(df, 17L, "n").select("source", "alloc").collect().toSet)
    assert(dual.select(col("source"), col("a2").as("alloc"))
      .collect().toSet ==
      inline(df, 17L, "w2").select("source", "alloc").collect().toSet)
  }

  test("conservation and exact-division degeneracy") {
    val df = strata
    // Σn = 23; 46 divides evenly -> zero remainder slots
    for (budget <- Seq(46L, 23L, 7L, 1L)) {
      val out = Pipeline.hamiltonOf(df, "source", budget, "n" -> "alloc")
      val total = out.agg(sum("alloc")).collect()(0).getLong(0)
      assert(total == budget, s"Σalloc $total != budget $budget")
    }
  }

  test("input columns ride through untouched (the q351 shape)") {
    val out = Pipeline.hamiltonOf(strata, "source", 10L,
      "n" -> "alloc_raw", "w2" -> "alloc_ess")
    assert(out.columns.toSeq ==
      Seq("source", "n", "w2", "alloc_raw", "alloc_ess"))
  }
}
