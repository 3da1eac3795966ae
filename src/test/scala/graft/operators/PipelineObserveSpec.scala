package graft.operators

import graft.SparkSuite

/** q57's quality gate publishes `observe` metrics (kept_docs,
  * kept_tokens) so a production run reports its drop rate without a
  * second pass — this spec asserts the metrics surface and that they
  * agree with an independent count.
  */
class PipelineObserveSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q77 bloom metrics report the prune ratio and bound the candidates") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries("q77_bloom_decontaminate")(spark, dir)
    df.collect()
    val total = df.queryExecution.observedMetrics("q77_train_grams").getLong(0)
    val cand = df.queryExecution.observedMetrics("q77_bloom_candidates").getLong(0)
    assert(total > 0, "no train grams — fixture drifted?")
    // no false negatives: every truly-shared gram must survive the bloom,
    // so candidates can never undercount the confirmed hits
    assert(cand <= total, s"candidates $cand exceed total $total")
    // at fpp 3% with a small blocklist the bloom must actually prune
    assert(cand < total / 2,
      s"bloom pruned almost nothing: $cand of $total grams survived")
  }

  test("q57 gate metrics match an independent count of surviving docs") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries("q57_corpus_pipeline")(spark, dir)
    df.collect() // any action populates the observed metrics
    val metrics = df.queryExecution.observedMetrics("q57_gate")
    val expected = graft.Tables.documents(spark, dir)
      .where(size(split(col("text"), "\\s+")) >= 24)
      .agg(count(lit(1)), sum(size(split(col("text"), "\\s+"))))
      .head
    assert(metrics.getLong(0) > 0, "gate kept nothing — fixture drifted?")
    assert(metrics.getLong(0) == expected.getLong(0), "kept_docs")
    assert(metrics.getLong(1) == expected.getLong(1), "kept_tokens")
  }
}
