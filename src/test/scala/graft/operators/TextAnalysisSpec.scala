package graft.operators

import graft.SparkSuite

/** Behavior tests for the TextAnalysis operator bodies that the oracle
  * gate can't pin on the fixture corpus (it has no rare-token extremes).
  */
class TextAnalysisSpec extends SparkSuite {

  test("lmScore floors rare tokens instead of joining the unbounded vocab") {
    import spark.implicits._
    // corpus: aa×3, zz/p/q/r/s ×1 each → total 8 tokens; with minCount=2
    // the kept vocab is exactly {aa} (1 entry ≤ total/minCount = 4) and
    // every singleton resolves through the join's miss path to the
    // floored probability minCount/total = 2/8
    val docs = Seq((1L, "aa aa aa"), (2L, "zz"), (3L, "p q r s"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, minCount = 2L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, -0.980829)), s"kept token scores c/total: $out") // ln(3/8)
    assert(out(2L) == ((1L, -1.386294)), s"rare token floored: $out")        // ln(2/8)
    // four DIFFERENT singletons all share the one floor probability —
    // the whole long tail collapses to a single smoothed estimate
    assert(out(3L) == ((4L, -1.386294)), s"tail shares the floor: $out")
  }
}
