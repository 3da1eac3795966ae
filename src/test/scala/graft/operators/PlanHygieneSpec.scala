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

  /** One physical-plan string per registered batch query, built ONCE and
    * shared by the hygiene census and the fingerprint gate below (plan
    * construction for ~250 queries is the dominant cost of this spec —
    * paying it twice would double it). A query whose plan fails to build
    * maps to the failure message prefixed "PLAN BUILD FAILED:" so both
    * tests report it.
    */
  private lazy val planStrings: Seq[(String, String)] = {
    val streaming = graft.streaming.StreamingQueries.queries.map(_.name).toSet
    graft.SparkEntry.all.filterNot(q => streaming(q.name)).map { q =>
      val s =
        try q.fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLAN BUILD FAILED: ${e.getMessage}" }
      q.name -> s
    }
  }

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
    "q277_lsh_config_sweep", // 1-row truth-count broadcast crossed onto
                             // the 4-row per-config score table
    "q282_cm_join_size", // 4-row seed table crosses (q139's audited
                         // shape) + 1-row est/exact broadcasts
    "q283_compaction_sweep", // 4-row sweep-target table crossed onto
                             // the file-offset frame
    "q285_zonemap_skipping", // 4-row predicate-workload table crossed
                             // onto group-grain zone maps + doc grain
    "q286_bloom_fpr_sweep", // 4-row seed × 4-row config broadcasts
                            // (q282's audited shape)
    "q287_shuffle_skew_audit", // three 1-row stat frames crossed,
                               // q218's audited shape
    "q288_waterfill_budget", // 1-row totals + 1-row election broadcasts
                             // on the source-grain frame (q223's shape);
                             // the everyone-capped guard joins a 1-row
                             // (usually empty) election on TRUE
    "q292_novelty_curve", // 1-row doc-count broadcast crossed onto the
                          // rank frame (q270's audited shape)
    "q293_zorder_skipping", // 1-row doc-count + 3-row predicate-workload
                            // broadcasts (q285's audited shape)
    "q294_matryoshka_recall", // bounded query-batch broadcast (q44's
                              // audited shape) + 4-row prefix table +
                              // 1-row query-count broadcast
    "q295_ndv_join_estimate", // four 1-row stat/register-summary frames
                              // crossed (q218/q282's audited shape)
    "q296_hubness_audit", // bounded query-batch broadcast (q44's shape)
                          // + batch×10 occurrence list + 1-row slot
                          // total, all broadcast builds
    "q297_conformal_coverage", // 1-row model/quantile/count frames
                               // crossed onto the split frames
                               // (q218's audited shape)
    "q298_retrieval_ndcg", // bounded query-batch broadcast (q44's
                           // shape); label counts ride a BHJ
    "q299_watermark_audit", // 5-row delay-grid broadcast crossed onto
                            // the lateness frame (q285's shape)
    "q301_vacuum_plan", // ≤5-row manifest/count frames, all broadcast
    "q302_whitening_audit", // 1-row (μ,σ)-array stat broadcast onto the
                            // corpus + bounded query-batch broadcasts
                            // (q44's shape, twice) + 1-row score frames
    "q304_join_order_audit", // three 1-row stat/actual frames crossed
                             // per edge (q218's audited shape)
    "q305_selectivity_audit", // 4-row predicate grid × 10-row histogram
                              // broadcasts (q285's audited shape)
    "q306_bitemporal_asof", // 1-row span + 3-row snapshot-grid
                            // broadcasts crossed after attribution
    "q307_zone_bloom_skipping", // 2-row seed + 4-row probe grids and a
                                // 1-row zone-count frame, all broadcast
    "q308_view_selection", // 8-row lattice frames: subset-relation
                           // non-equi join, benefit/argmax/cost tables —
                           // all broadcast builds on ≤8×8 rows
    "q310_dp_clip_audit", // 4-row percentile grid + 1-row totals
                          // broadcasts (q223's audited shape)
    "q311_lm_dirichlet_retrieval", // 3-row query-term grid + 1-row
                                   // corpus-stats broadcasts (q90's
                                   // audited serving shape)
    "q313_scorer_disagreement", // ≤k-row top-k intersection pair cross
                                // + 1-row overlap frame, all broadcast
    "q314_drift_attribution", // source-list × value-domain grid cross
                              // + 1-row corpus-total broadcasts
    "q315_context_length_sweep", // 4-row context-length grid broadcast
                                 // (q283's audited sweep shape)
    "q316_session_gap_sweep", // 3-row gap-grid broadcast fanning the
                              // event stream map-side (q285's shape)
    "q317_hard_positives", // non-equi doc_a<doc_b self-pair inside
                           // capped clusters; broadcast builds only
    "q318_hash_sample_audit", // 3-row rate grid + 1-row exact-stats
                              // broadcasts (q283's sweep shape)
    "q319_volume_correlation", // day-domain × type-domain grid +
                               // type-pair non-equi join, all
                               // metadata-grain broadcast builds
    "q321_spectral_gap_probe", // 1-row corpus-count frame crossed onto
                               // the d²-bounded moment matrix
    "q322_mutual_information", // 1-row total-count + 1-row MI frames
                               // crossed onto the ≤types·4 cell table
    "q323_funnel_window_sweep", // 3-row conversion-window grid broadcast
                                // fanning the event stream map-side
                                // (q316's audited sweep shape)
    "q324_neyman_allocation", // 1-row weight/count totals + 1-row
                              // remainder broadcasts on the source-grain
                              // frame (q223/q261's audited shape)
    "q327_dp_release", // 1-row clip-election broadcast crossed onto the
                       // event stream and the day-domain release table
    "q329_jsd_source_drift", // vocabulary-domain token table + 1-row
                             // corpus-total broadcasts crossed onto the
                             // source-grain frame (q314's audited grid)
    "q332_kaplan_meier", // 1-row horizon/user-total frames + the 1-row
                         // sorted factor list, all broadcast crosses on
                         // the lifetime-domain table (q213's shape)
    "q337_bpe_fertility", // 3-row vocab-tier grid broadcast crossed onto
                          // the vocab-grain length table (q283's audited
                          // sweep shape)
    "q340_mde_power", // 4-row arm-size grid × 1-row moment frame
                      // broadcasts (q283's audited sweep shape)
    "q345_chunking_sweep", // 3-row chunk-size grid broadcast crossed onto
                           // the sentence-offset frame (q283's audited
                           // sweep shape)
    "q348_cluster_label_nmi", // 1-row MI/entropy fold frames broadcast-
                              // crossed onto the (k × label) contingency
                              // (distributed epilogue since the r15
                              // k ~ √n retrofit; marginals broadcast)
    "q351_ess_budget_shift", // 1-row total/remainder broadcasts crossed
                             // onto the leaf source-grain ESS frame
                             // (q223/q324's audited election shape)
    "q352_semdedup_probe_recall", // bounded batch×corpus τ-pair truth
                                  // (q79's audited broadcast non-equi
                                  // shape) + 1-row pair-count frames
                                  // crossed per probe setting
    "q355_imi_search", // per-half probe selection crosses the bounded
                       // query batch with the broadcast k'-row half
                       // codebooks (q72's audited probe shape, twice)
    "q356_imi_balance", // 1-row corpus-total broadcast crossed onto the
                        // product-cell occupancy frame (q223's shape)
    "q358_multiprobe_semdedup_recall", // bounded batch×corpus τ-pair
                                       // truth (q352's audited shape) +
                                       // 1-row pair-count frames crossed
                                       // per probe setting
    "q365_imi_dedup_recall", // the same bounded τ-pair truth + 1-row
                             // pair-count frames crossed per candidate
                             // rule (q358's audited shape on the IMI
                             // probe artifacts)
    "q359_imi_serving_recall", // bounded batch×corpus brute truth (q44's
                               // audited shape) + per-half/joint probe
                               // scoring vs broadcast k'-row codebooks
                               // (q355's shape) + 1-row count frames
                               // crossed per mode
    "q360_imi_multiseq_search", // joint-distance probe scoring crosses
                                // the bounded query batch with the two
                                // broadcast k'-row half codebooks
                                // (q355's audited probe shape)
    "q367_nndescent_convergence", // bounded batch×corpus brute truth
                                  // (q44's audited non-equi shape) +
                                  // 1-row truth-count frame crossed per
                                  // round row; the graphs themselves
                                  // ride vertex-id equi-joins
    "q369_graph_ann_recall", // bounded batch×corpus brute truth (q44's
                             // audited shape) + 1-row count frames
                             // crossed per mode (q359's audited shape);
                             // beam traversal rides vertex-id equi-joins
                             // inside the checkpointed artifact
    "q372_intrinsic_dimension", // bounded batch×corpus 2-NN scan (q44's
                                // audited non-equi shape); everything
                                // after is a 100-row scalar epilogue
    "q374_hilbert_skipping", // 1-row doc-count + 3-row predicate-workload
                             // broadcasts (q293's audited shape, same
                             // workload table)
    "q375_graph_semdedup", // 1-row τ-edge-count frame crossed onto the
                           // 1-row CC summary (q218's audited shape);
                           // the dedup work itself is a filter on the
                           // graph artifact + the shared CC
    "q376_graph_dedup_recall", // bounded batch×corpus τ-pair truth
                               // (q352's audited shape) + 1-row
                               // pair-count frames crossed per rule;
                               // both candidate rules ride vertex-id
                               // equi-joins on the graph artifact
    "q380_hier_entry_audit", // q369's audited shape exactly: bounded
                             // batch×corpus brute truth + 1-row count
                             // frames crossed per entry-strategy mode
    "q382_pruned_serving_audit", // q369's audited shape: brute truth +
                                 // 1-row count frames per graph mode;
                                 // prune unroll rides vertex-id
                                 // equi-joins in the artifact build
    "q384_graph_repair_roi", // bounded new-shard batch×corpus truth
                             // (q44's shape) + 1-row hit/count frames
                             // crossed per lifecycle arm
    "q386_pseudonymize_release", // 1-row collision-audit frame
                                 // (n_names, n_surrogates) broadcast-
                                 // crossed onto the id-bounded sample
    "q390_blockmax_skipping", // 1-row perfect-threshold frame crossed
                              // onto the block-grain table per swept
                              // width (q285's audited shape)
    "q398_mergeable_quantiles") // 5-row estimate frame non-equi joined
                                // for the exact rank recount (the
                                // audit's one corpus pass; production
                                // serves from the merged points alone)

  test("no registered batch query plans a cartesian; BNLJ census is pinned") {
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, plan) <- planStrings) {
      if (plan.startsWith("PLAN BUILD FAILED:"))
        failures += s"$name: $plan"
      if (plan.contains("CartesianProduct"))
        failures += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljAudited(name))
        failures += s"$name: unaudited BroadcastNestedLoopJoin " +
          "(audit the build side, then add to bnljAudited)"
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // ---- golden plan fingerprints (VERDICT r12 item 8) -------------------
  //
  // The bench catches plan drift only as a latency delta, a round later,
  // in a crowded JVM. This gate catches it at `sbt test` time: each batch
  // query's JOIN/EXCHANGE node multiset (the shuffle-and-join shape — the
  // part of a plan that matters at 100 TB) is pinned against a committed
  // golden file. An INTENTIONAL plan change regenerates the goldens with
  //   GRAFT_REGEN_PLANS=1 sbt "testOnly graft.operators.PlanHygieneSpec"
  // and the diff of plan_fingerprints.tsv shows the reviewer exactly
  // which queries' shapes moved — an unintentional one fails the build.

  private val goldenPath =
    java.nio.file.Paths.get("src/test/resources/plan_fingerprints.tsv")

  /** Canonical join/exchange census of one plan string. Node names only
    * (expression ids, sizes, and stats vary run-to-run); shuffle
    * exchanges keep their partitioning KIND (hash/range/single) because a
    * hash→range or hash→single drift is exactly the regression class this
    * pins. Sorted `name:count` pairs; "-" for a plan with no such nodes.
    */
  private def fingerprint(plan: String): String = {
    // node name = first alphabetic token of the line (tree-art "+- :",
    // codegen "*(3)", and AQE "!" prefixes are all non-alphabetic)
    val kinds = plan.linesIterator.flatMap { line =>
      line.split("[^A-Za-z]+").find(_.length > 1).collect {
        case "Exchange" => // keep the partitioning KIND for shuffles
          val part = line.split("[^A-Za-z]+").filter(_.length > 1).lift(1)
          s"Exchange[${part.getOrElse("?").stripSuffix("partitioning")}]"
        case n if n.contains("Join") || n.contains("Exchange") ||
          n == "CartesianProduct" => n
      }
    }.toSeq
    if (kinds.isEmpty) "-"
    else kinds.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k:${v.size}" }.mkString(",")
  }

  test("join/exchange plan fingerprints match the committed goldens") {
    val current = planStrings.collect {
      case (n, p) if !p.startsWith("PLAN BUILD FAILED:") => n -> fingerprint(p)
    }
    if (sys.env.contains("GRAFT_REGEN_PLANS")) {
      val body = current.sortBy(_._1)
        .map { case (n, f) => s"$n\t$f" }.mkString("", "\n", "\n")
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      java.nio.file.Files.write(goldenPath,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      info(s"regenerated ${current.size} fingerprints -> $goldenPath")
    } else {
      assert(java.nio.file.Files.exists(goldenPath),
        s"missing $goldenPath - generate with GRAFT_REGEN_PLANS=1")
      val golden = new String(java.nio.file.Files.readAllBytes(goldenPath),
        java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).map { l =>
          val Array(n, f) = l.split("\t", 2); n -> f
        }.toMap
      val failures = scala.collection.mutable.ListBuffer.empty[String]
      for ((n, f) <- current) golden.get(n) match {
        case None => failures += s"$n: NEW query - regenerate goldens"
        case Some(g) if g != f => failures += s"$n: plan shape drifted\n" +
          s"  golden:  $g\n  current: $f"
        case _ => ()
      }
      for (n <- golden.keySet -- current.map(_._1).toSet)
        failures += s"$n: in goldens but not registered - regenerate"
      assert(failures.isEmpty,
        "plan fingerprint drift (intentional? GRAFT_REGEN_PLANS=1 " +
          "testOnly graft.operators.PlanHygieneSpec):\n" +
          failures.mkString("\n"))
    }
  }
}
