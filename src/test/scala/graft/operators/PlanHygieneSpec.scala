package graft.operators

import graft.SparkSuite

/** Corpus-wide plan hygiene: EVERY registered batch query's physical plan
  * is audited for nested-loop shapes.
  *
  * - `CartesianProduct` (a nested loop over two UN-broadcast sides — the
  *   shape that cannot survive any scale) fails the build outright, for
  *   every query, no exceptions.
  * - `BroadcastNestedLoopJoin` always carries a broadcast build side, and
  *   every current instance is a deliberate constant-size build (a 1-row
  *   bounds/stats frame, a k-row literal band/percentile/lag table, a
  *   bounded query batch, broadcast sketch/codebook rows — each audited
  *   in its operator's scaladoc). The census below pins that set: a NEW
  *   query introducing a BNLJ fails until its build side is audited and
  *   the name added here — drift protection, not a per-use re-proof.
  */
class PlanHygieneSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private val bnljAudited: Set[String] = Set(
    "q17_range_join", "q44_knn_bruteforce", "q67_tfidf_top_terms",
    "q70_lm_score", "q79_ann_recall", "q81_mixture_balance",
    "q83_ivf_recall", "q88_source_overlap", "q90_bm25_retrieval",
    "q93_ivfpq_search", "q99_temperature_mix", "q103_filtered_ann",
    "q104_hard_negatives", "q105_cold_index_serve", "q110_tombstone_serve",
    "q112_prf_semantic", "q113_hybrid_rrf", "q114_compacted_serve",
    "q118_snapshot_base", "q119_snapshot_append", "q120_snapshot_delete",
    "q122_cold_bm25_serve", "q136_mips_topk", "q139_countmin_sketch",
    "q140_countmin_probe", "q143_bm25_append_serve",
    "q144_bm25_compacted_serve", "q145_upsert_serve",
    "q150_bm25_delete_serve", "q154_jl_projection_search", "q155_jl_recall",
    "q160_bigram_lm_score", "q162_bm25_upsert_serve", "q164_dupgraph_pagerank",
    "q169_hll_merged", "q180_rolling_wau", "q188_daily_autocorr",
    "q190_nprobe_curve", "q199_histogram_quantiles", "q202_negative_sampling",
    "q204_cuped",
    "q207_retrieval_mrr", // bounded query batch vs corpus, q44's shape
    "q208_volume_trend",  // 1-row min-day bound broadcast
    "q210_market_basket", // 1-row basket-count denominator broadcast
    "q213_churn_flags",   // 1-row corpus-horizon broadcast
    "q214_source_drift_chi2", // bin-table × 1-row-total broadcast grid
    "q218_join_stats",    // five 1-row stat frames crossed
    "q219_encoding_audit", // 1-row dictionary-size frame per column
    "q223_proportional_alloc", // 1-row total + 1-row remainder broadcasts
    "q226_theil_sen_trend", // 1-row min-day bound broadcast, q208's shape
    "q233_benford_audit", // 1-row total x 9-row literal share table
    "q235_poisson_bootstrap", // constant 32-row replicate frame crossed
    "q237_ks_drift",      // 1-row (n1,n2) totals + 1-row argmax crossed
    "q240_equidepth_bins", // 1-row 9-edge frame crossed onto value grain
    "q261_temperature_mixture", // 1-row weight-total + 1-row remainder
                                // broadcasts, q223's audited shape; the
                                // quota-fill join itself is a BHJ on source
    "q265_t_closeness", // bucket-DOMAIN table (attribute domain, not rows)
                        // + 1-row (N,m) totals, both broadcast crosses
    "q270_rfm_segments", // 1-row max-day + 1-row user-count broadcasts,
                         // re-occurring through the three banded ranks
    "q272_isotonic_calibration", // decile-grid crosses: ≤10-row cums and
                                 // ≤55-row pairs broadcast builds
    "q274_diversified_topk", // probe × k-row centroid broadcast, q103's
                             // audited serving shape
    "q275_rank_fidelity_tau", // same probe × k-row centroid broadcast
                              // (twice: float-top-10 + re-score branches)
    "q277_lsh_config_sweep") // 1-row truth-count broadcast crossed onto
                             // the 4-row per-config score table

  test("no registered batch query plans a cartesian; BNLJ census is pinned") {
    val streaming = graft.streaming.StreamingQueries.queries.map(_.name).toSet
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    for (q <- graft.SparkEntry.all if !streaming(q.name)) {
      val plan =
        try q.fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          failures += s"${q.name}: plan build failed: ${e.getMessage}"; ""
        }
      if (plan.contains("CartesianProduct"))
        failures += s"${q.name}: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAudited(q.name))
        failures += s"${q.name}: unaudited BroadcastNestedLoopJoin " +
          "(audit the build side, then add to bnljAudited)"
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
