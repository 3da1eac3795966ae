package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, Tables}
import graft.functions.VectorFunctions

/** Similarity-search and near-duplicate operators over the `embeddings` and
  * `documents` tables — the LLM-training-data-pipeline surface
  * (SURVEY §2 Table B "LLM-pipeline ops"): IVF-blocked cosine top-k (q30),
  * minhash-LSH candidate pairs (q31), simhash near-dup (q39), exact
  * n-gram-Jaccard verification (q40), embedding-cosine near-dup (q41).
  *
  * Scale design (100 TB):
  *  - q30/q41 are the IVF pattern: an equi-join on a coarse partition id
  *    restricts the candidate set (q56 trains the actual k-means cells;
  *    `label` remains q30/q41's pre-assigned stand-in for oracle stability),
  *    exact cosine ranks within the cell. Never an all-pairs cross join.
  *    Cell skew at scale → re-cluster or split hot cells.
  *  - q31/q39/q40 are banding LSH: signatures are a narrow one-pass map
  *    (no shuffle); candidates come from equi-joins on band buckets. A
  *    pathologically hot bucket is exactly a giant duplicate cluster; at
  *    scale, cap bucket width or salt the band key before the join.
  *  - q39's 5-block pigeonhole banding GUARANTEES every pair within
  *    hamming ≤ 4 is a candidate, so the banded output equals the
  *    all-pairs result exactly — the oracle states the all-pairs form.
  *
  * The cosine kernel is the codegen'd Catalyst expression
  * [[graft.functions.CosineSimilarity]]; both engines accumulate dot and
  * norms left-to-right in double precision, so results are bit-identical
  * and oracle hash-comparable. All hashes are deterministic polynomial/
  * affine arithmetic shared verbatim between the Spark plan and the
  * DuckDB oracle.
  */
object Similarity {

  // ---- shared cosine SQL fragment (l2r double accumulation) ----

  private def cosSql(a: String, b: String, col: String = "embedding"): String =
    s"""list_reduce(list_transform(range(1, len($a.$col)+1),
       |      i -> CAST($a.$col[i] AS DOUBLE) * CAST($b.$col[i] AS DOUBLE)), (x,y) -> x+y)
       |    / (sqrt(list_reduce(list_transform(range(1, len($a.$col)+1),
       |        i -> CAST($a.$col[i] AS DOUBLE) * CAST($a.$col[i] AS DOUBLE)), (x,y) -> x+y))
       |     * sqrt(list_reduce(list_transform(range(1, len($b.$col)+1),
       |        i -> CAST($b.$col[i] AS DOUBLE) * CAST($b.$col[i] AS DOUBLE)), (x,y) -> x+y)))""".stripMargin

  /** q30: top-3 cosine neighbors per vector within its `label` cell
    * (IVF-style blocked ANN). Deterministic rank tie-break on neighbor id.
    */
  private val q30 = GraftQuery(
    "q30_cosine_topk",
    s"""WITH sim AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    ${cosSql("a", "b")} AS cos
       |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(cos, 6) AS cos_sim FROM (
       |  SELECT vec_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sim) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id"), col("label"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("neighbor_id"), col("label").as("label_b"),
      col("embedding").as("emb_b"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id"))
    a.join(b, col("label") === col("label_b") && col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  // ---- shared minhash/shingle machinery ----

  /** MinHash parameters, shared verbatim by the Spark plans and the DuckDB
    * oracles so signatures are bit-identical: k=12 permutations
    * h_i(x) = (A(i)·x + B(i)) mod P over word-3-gram shingle hashes,
    * banded 4×3 (LSH threshold ≈ (1/4)^(1/3) ≈ 0.63 Jaccard).
    */
  private val P = 1000000007L
  private val NumHashes = 12
  private val NumBands = 4 // of 3 rows each
  /** Signature-agreement floor for a candidate pair to count as a near-dup
    * (9/12 ≈ 0.75 estimated Jaccard) — single source for q31's filter,
    * q52's edge set, and both oracles.
    */
  private val MatchThreshold = 9
  /** Spark-side predicate over the joined (sa, sb) signature pair. */
  private val sigMatchPredicate =
    s"size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v)) >= $MatchThreshold"
  private val A: Seq[Long] = (0 until NumHashes).map(i => ((i + 1) * 2654435761L) % P)
  private val B: Seq[Long] = (0 until NumHashes).map(i => ((i + 1) * 2246822519L) % P)

  /** Oracle CTEs: documents → word-3-gram shingles → polynomial hashes. */
  private val shingleCtes: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents
       |), sh AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(ts) >= 3
       |    THEN list_transform(range(1, len(ts)-1), i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
       |    ELSE [] END) AS shingles
       |  FROM toks
       |), hs AS (
       |  SELECT doc_id, shingles, list_transform(shingles, sh2 ->
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(sh2)+1), i -> CAST(ascii(sh2[i]) AS BIGINT))),
       |      (acc, c) -> (acc * 31 + c) % $P)) AS hv
       |  FROM sh
       |)""".stripMargin

  private val oracleSigList: String = (0 until NumHashes)
    .map(i => s"list_min(list_transform(hv, h -> (${A(i)} * h + ${B(i)}) % $P))")
    .mkString("[", ",\n      ", "]")

  private def oracleMinhashBands(carry: String): String = (0 until NumBands)
    .map(j => s"SELECT doc_id$carry, sig, $j AS band, sig[${3 * j + 1}] AS h1, " +
      s"sig[${3 * j + 2}] AS h2, sig[${3 * j + 3}] AS h3 FROM sig")
    .mkString("\n  UNION ALL ")

  /** Spark side of the shared machinery: doc_id, shingles, hv. The
    * per-shingle hash is the codegen'd [[graft.functions.PolyHash]]
    * kernel (same value as the SQL aggregate form, ~5× cheaper).
    */
  private def shingleHashes(s: SparkSession, d: String): DataFrame = {
    graft.functions.PolyHash.register(s)
    Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ts"))
      .withColumn("shingles",
        when(size(col("ts")) >= 3, array_distinct(expr(
          "transform(sequence(1, size(ts) - 2), " +
            "i -> concat_ws(' ', element_at(ts, i), element_at(ts, i+1), element_at(ts, i+2)))")))
          .otherwise(expr("CAST(array() AS array<string>)")))
      .withColumn("hv", expr("transform(shingles, sh2 -> poly_hash(sh2))"))
  }

  /** doc_id, sig (12 minhash components) — materialized ONCE per
    * (session, dir) in the artifact registry and served to every dedup
    * tier that keys on signatures (q31 candidates, q40 verify, q52
    * clusters, q76 manifest, q85 capped clusters). Signatures are
    * content-defined, so a dedup pipeline computes them exactly once per
    * corpus and every downstream pass reads the artifact — the cache is
    * the local[n] stand-in for that persisted signature table (12 longs
    * + an id per document; the heavyweight shingle payload is NOT part
    * of the artifact). Released via `Artifacts.release(session)`.
    */
  /** (doc_id, hv) — the per-document shingle-hash lists, materialized once
    * per (session, dir). Two reasons this is an artifact and not a view:
    * the signature derivation ([[minhashSigs]]) and the source-level union
    * minhash (q88) both consume hv, and — the sharper one — explode(hv)
    * over the raw projection triggers InferFiltersFromGenerate, which
    * copies the ENTIRE shingle+hash pipeline into an interpreted
    * `size(hv) > 0` Filter below the Project (the pipeline then runs 3×
    * per document, measured ~6s of q88's 10s at sf0.1). Against the cached
    * table the inferred filter probes a stored array — plan-shape
    * insurance the same way the q39 repartition fence is.
    */
  private def shingleHashTable(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.cachedDf(s, s"shingle_hv:$d") {
      shingleHashes(s, d).select(col("doc_id"), col("hv"))
    }

  private[operators] def minhashSigs(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.cachedDf(s, s"minhash_sigs:$d") {
      val sigCols = (0 until NumHashes).map(i =>
        expr(s"array_min(transform(hv, h -> (${A(i)} * h + ${B(i)}) % $P))"))
      shingleHashTable(s, d).select(col("doc_id"), array(sigCols: _*).as("sig"))
    }

  /** Banded candidate self-join: each side exploded to (band, 3-row key).
    * The input is fenced behind a repartition exchange so CollapseProject
    * cannot inline the shingle+minhash pipeline into the 12 band-key
    * references and both join sides (the q39 lesson; the exchange carries
    * only doc_id + 12 longs per doc — payload columns like shingles are
    * joined back AFTER candidate generation, never shipped through the
    * 4× band explode).
    */
  /** @param maxBucketWidth hot-bucket guard for the 100 TB path: a band
    *   bucket with more than this many members expands to O(width²) pairs
    *   — and a pathologically hot bucket is by construction one giant
    *   duplicate cluster, which the cluster-assignment path (q52) handles
    *   in O(width) via label propagation. With a cap, over-wide buckets
    *   are excluded from pair expansion (NOT silently: the width column
    *   is computed per bucket, so callers can report what was routed
    *   around, and [[minhashHotBucketEdges]] re-attaches the routed
    *   buckets' members as O(width) star edges so clustering is
    *   unchanged). None (the registered-query setting) expands everything.
    */
  /** Fenced (doc_id, sig, band, h1, h2, h3) band explode shared by the
    * pair-expansion and hot-bucket-star paths.
    */
  private def bandedSigs(sigs: DataFrame): DataFrame = {
    val fenced = sigs.repartition(col("doc_id"))
    val bandStructs = (0 until NumBands).map(j =>
      struct(lit(j).as("band"), expr(s"sig[${3 * j}]").as("h1"),
        expr(s"sig[${3 * j + 1}]").as("h2"), expr(s"sig[${3 * j + 2}]").as("h3")))
    fenced
      .select(col("doc_id"), col("sig"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("sig"),
        col("b.band").as("band"), col("b.h1").as("h1"),
        col("b.h2").as("h2"), col("b.h3").as("h3"))
  }

  private[operators] def minhashCandidates(sigs: DataFrame,
      maxBucketWidth: Option[Int] = None): DataFrame = {
    val allBands = bandedSigs(sigs)
    val bands = maxBucketWidth match {
      case None => allBands
      case Some(cap) =>
        val widths = allBands.groupBy("band", "h1", "h2", "h3")
          .agg(count(lit(1)).as("__bucket_width"))
        allBands.join(widths, Seq("band", "h1", "h2", "h3"))
          .where(col("__bucket_width") <= cap)
          .drop("__bucket_width")
    }
    val l = bands.select(col("doc_id").as("doc_a"), col("sig").as("sa"),
      col("band"), col("h1"), col("h2"), col("h3"))
    val r = bands.select(col("doc_id").as("doc_b"), col("sig").as("sb"),
      col("band").as("band_r"), col("h1").as("g1"),
      col("h2").as("g2"), col("h3").as("g3"))
    l.join(r, col("band") === col("band_r") && col("h1") === col("g1") &&
      col("h2") === col("g2") && col("h3") === col("g3") &&
      col("doc_a") < col("doc_b"))
  }

  /** Companion to [[minhashCandidates]]'s `maxBucketWidth` cap: the
    * O(width) handling for the buckets the cap routes OUT of pair
    * expansion. A pathologically over-wide band bucket is by construction
    * one giant duplicate cluster, so instead of its C(width, 2) pairs it
    * contributes width − 1 STAR edges (bucket-min doc_id → each other
    * member) — the connected components those induce are identical to the
    * clique's, at linear instead of quadratic cost. Union these with the
    * capped candidate pairs before [[connectedComponents]] and the cap
    * changes cluster assignment not at all, only the join fanout
    * (ScaleSpec proves the composition end-to-end).
    */
  private[operators] def minhashHotBucketEdges(sigs: DataFrame,
      maxBucketWidth: Int): DataFrame = {
    val bands = bandedSigs(sigs).select("doc_id", "band", "h1", "h2", "h3")
    val hot = bands.groupBy("band", "h1", "h2", "h3")
      .agg(count(lit(1)).as("__bucket_width"), min("doc_id").as("hub"))
      .where(col("__bucket_width") > maxBucketWidth)
      .select("band", "h1", "h2", "h3", "hub")
    bands.join(hot, Seq("band", "h1", "h2", "h3"))
      .where(col("doc_id") =!= col("hub"))
      .select(col("hub").as("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
  }

  /** q31: near-duplicate candidate pairs via minhash-LSH banding, with the
    * signature-estimated Jaccard (≥ 9/12 kept).
    */
  private val q31 = GraftQuery(
    "q31_minhash_neardup",
    s"""$shingleCtes, sig AS (
       |  SELECT doc_id, $oracleSigList AS sig FROM hs
       |), bands AS (
       |  ${oracleMinhashBands("")}
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3
       |   AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |  CAST(len(list_filter(range(1, ${NumHashes + 1}), i -> sa[i] = sb[i])) AS BIGINT) AS n_match,
       |  round(len(list_filter(range(1, ${NumHashes + 1}), i -> sa[i] = sb[i])) / $NumHashes.0, 6) AS est_jaccard
       |FROM pairs
       |WHERE len(list_filter(range(1, ${NumHashes + 1}), i -> sa[i] = sb[i])) >= $MatchThreshold
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    minhashCandidates(minhashSigs(s, d))
      .withColumn("n_match",
        expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))").cast("long"))
      .where(col("n_match") >= MatchThreshold)
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        round(col("n_match") / NumHashes.toDouble, 6).as("est_jaccard"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  // ---- near-dup cluster assignment (q52) ----

  /** Connected components by min-label propagation (the Pregel-style CC
    * GraphX uses): every vertex starts labeled with its own id, each round
    * takes the min of its label and its neighbors' labels, until a round
    * changes nothing. Rounds needed = graph diameter — for LSH duplicate
    * clusters that is tiny (near-cliques), so the loop is a handful of
    * shuffles on (id, label) pairs regardless of corpus size. The only
    * driver-side action per round is a one-row aggregate for the
    * convergence check (labels only decrease, so an unchanged label-sum
    * means a fixpoint); no data is ever collected.
    *
    * @param vertices one `doc_id` column (all nodes, incl. singletons)
    * @param edges    `doc_a`/`doc_b` undirected candidate pairs
    * @return doc_id, cluster_id (= min doc_id in the component)
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 64): DataFrame = {
    val spark = vertices.sparkSession
    val sc = spark.sparkContext
    // The fixpoint loop runs on raw (long, long) RDDs, not DataFrames:
    // a DataFrame loop re-plans (analysis, optimization, codegen compile)
    // every round, and on a sparse duplicate graph that planning cost
    // dwarfs the data movement (measured ~0.7s/round vs <0.1s of actual
    // shuffle at sf0.1). GraphX makes the same call for the same reason.
    // One HashPartitioner is reused by every round's joins, so the
    // adjacency is shuffled exactly ONCE for the whole loop and each
    // round is a single narrow join + one reduceByKey shuffle of
    // |connected nodes| combined pairs — never |corpus| rows.
    //
    // Symmetrize in one pass over the (possibly expensive) edge pipeline,
    // INSIDE whole-stage codegen: explode a 2-element struct array so the
    // both-directions fan-out runs in Tungsten and only the final
    // row→tuple map crosses the RDD boundary. (A union of two projections
    // would also stay in codegen but re-evaluates the edge pipeline once
    // per branch — callers don't always hand us a persisted frame.)
    // Propagate only over nodes that HAVE edges (the candidate graph is
    // sparse relative to the corpus — most documents are singletons,
    // which rejoin as their own cluster at the end).
    val sym0 = edges
      .select(explode(array(
        struct(col("doc_a").cast("long").as("s"),
          col("doc_b").cast("long").as("d")),
        struct(col("doc_b").cast("long").as("s"),
          col("doc_a").cast("long").as("d")))).as("e"))
      .select(col("e.s"), col("e.d"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // size the loop's partitioning to the graph, not the session: tiny
    // duplicate graphs run single-partition rounds, a duplicate-heavy
    // 100 TB graph (billions of edges) fans out to full parallelism
    val nSym = sym0.count()
    val nParts = math.max(1,
      math.min(sc.defaultParallelism, (nSym / 65536 + 1).toInt))
    val part = new org.apache.spark.HashPartitioner(nParts)
    val adj = sym0.partitionBy(part)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    adj.foreachPartition(_ => ())
    sym0.unpersist(false)
    var labels = adj.keys.distinct(nParts).map(v => (v, v))
      .partitionBy(part).persist()
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    var t0 = System.nanoTime()
    def tick(label: String): Unit = {
      if (dbg) System.err.println(
        f"CC $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    tick("adjacency build")
    var iter = 0
    var converged = nSym == 0
    while (!converged && iter < maxIter) {
      // labels only ever decrease, so "no label decreased" is the
      // fixpoint; the accumulator is populated by the materializing
      // action below (a task retry can only inflate a nonzero count,
      // which at worst runs one redundant round — the == 0 test is safe)
      val changed = sc.longAccumulator("cc_changed")
      val nbrMin = adj.join(labels) // narrow: both sides share `part`
        .map { case (_, (dst, lbl)) => (dst, lbl) }
        .reduceByKey(part, math.min(_: Long, _: Long)) // the round's one (combined) shuffle
      // persisted: `propagated` feeds BOTH sides of the pointer-jump
      // self-join below — unpersisted, the labels⋈nbrMin round would be
      // recomputed once per side and the `changed` accumulator would
      // double-count (harmless for the ==0 fixpoint test, but it re-runs
      // the narrow join and inflates GRAFT_CC_DEBUG round stats)
      val propagated = labels.join(nbrMin) // narrow
        .mapValues { case (own, nbr) =>
          val m = math.min(own, nbr)
          if (m < own) changed.add(1L)
          m
        }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // PATH HALVING (pointer jumping): l(v) ← min(l(v), l(l(v))).
      // Neighbor propagation alone needs one round per unit of graph
      // diameter — a duplicate CHAIN (a…b, b…c, …, the shape a
      // replica-heavy corpus actually produces; q353 at sf1 exceeded the
      // old cap of 30 rounds) makes that linear in the chain length.
      // Composing one jump per round lets labels traverse 2^r-length
      // paths in r rounds (Kiveris et al. 2014's shortcutting): the
      // bound is O(log diameter), so maxIter = 64 covers any graph a
      // 2⁶³-id space can hold (even a single 2⁶³-long chain converges
      // in ~63 rounds). A label is always itself a vertex id present in
      // `labels` (labels start as own ids and only ever copy other
      // labels), so the lookup join is total. Cost: one extra
      // (label, vertex) shuffle per round — bounded by the same
      // |connected nodes| grain as the neighbor step.
      val next = propagated
        .map { case (v, l) => (l, v) }
        .join(propagated) // (l, (v, label(l)))
        .map { case (l, (v, ll)) =>
          if (ll < l) changed.add(1L)
          (v, math.min(l, ll))
        }
        .reduceByKey(part, math.min(_: Long, _: Long))
        .persist()
      next.foreachPartition(_ => ())
      propagated.unpersist(false)
      labels.unpersist(false)
      labels = next
      converged = changed.value == 0
      iter += 1
      tick(s"round $iter")
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    adj.unpersist(false)
    // hand the (tiny) converged labels back to Catalyst for the
    // corpus-sized singleton join; the RDD's cached blocks back the scan
    // and are reclaimed by the context cleaner once unreferenced
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cluster_id",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val finalLabels = spark.createDataFrame(
      labels.map { case (id, l) => org.apache.spark.sql.Row(id, l) }, schema)
    vertices.select(col("doc_id"))
      .join(finalLabels, col("doc_id") === col("cc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id").cast("long")).as("cluster_id"))
  }

  private val minhashMatchSql =
    s"len(list_filter(range(1, ${NumHashes + 1}), i -> sa[i] = sb[i])) >= $MatchThreshold"

  /** q52: duplicate-CLUSTER assignment — the stage after candidate
    * generation that a dedup pipeline actually keys on: every document
    * mapped to the min doc_id of its connected component in the
    * minhash-candidate graph (singletons map to themselves), so "keep one
    * per cluster" is a groupBy(cluster_id).min. The oracle computes the
    * same fixpoint as a recursive transitive closure.
    */
  /** The minhash→candidate→transitive-closure oracle chain, ending in a
    * `clus(doc_id, cluster_id)` CTE — q52's text, composed further by
    * q116's survivor selection.
    */
  /** The minhash→candidate→SYMMETRIZED-edge oracle chain, ending in an
    * `edges(u, v)` CTE — the duplicate graph both the transitive closure
    * (q52) and the k-core peel (q291) read.
    */
  private val edgeOracleChain: String =
    s"""$shingleCtes, sig AS (
       |  SELECT doc_id, $oracleSigList AS sig FROM hs
       |), bands AS (
       |  ${oracleMinhashBands("")}
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3
       |   AND a.doc_id < b.doc_id
       |), edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs WHERE $minhashMatchSql
       |  UNION
       |  SELECT doc_b AS u, doc_a AS v FROM pairs WHERE $minhashMatchSql
       |)""".stripMargin

  private val clusterOracleChain: String =
    s"""${edgeOracleChain.replaceFirst("WITH ", "WITH RECURSIVE ")}, reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |), clus AS (
       |  SELECT d.doc_id, least(d.doc_id, coalesce(rm.m, d.doc_id)) AS cluster_id
       |  FROM documents d LEFT JOIN (SELECT u, min(v) AS m FROM reach GROUP BY u) rm
       |    ON d.doc_id = rm.u)""".stripMargin

  /** Engine twin of [[clusterOracleChain]]: every document's duplicate-
    * cluster id (min doc_id of its minhash-candidate component).
    */
  private[operators] def clusterAssignments(s: SparkSession, d: String): DataFrame = {
    val edges = minhashCandidates(minhashSigs(s, d))
      .where(expr(sigMatchPredicate))
      .select(col("doc_a"), col("doc_b")).distinct()
    connectedComponents(Tables.documents(s, d).select("doc_id"), edges)
  }

  private val q52 = GraftQuery(
    "q52_neardup_clusters",
    s"""$clusterOracleChain
       |SELECT doc_id, cluster_id FROM clus
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    clusterAssignments(s, d).orderBy("doc_id")
  }

  /** q116: SURVIVOR selection — the decision step that turns q52's
    * cluster assignment into an actual deduplicated corpus: per
    * duplicate cluster, keep the highest-quality member (q27's score;
    * doc_id breaks ties), reporting cluster size and the kept document.
    * This is where dedup and quality scoring compose — production
    * pipelines keep the BEST copy, not an arbitrary one. The engine
    * picks the survivor with an order-pinned min(struct(−quality,
    * doc_id)) AGGREGATE (partial+final, one shuffle on cluster_id) —
    * never a per-cluster ranking window, so no per-cluster sort and
    * map-side combine does most of the work; every compared value is an
    * integer.
    */
  private val q116 = GraftQuery(
    "q116_canonical_docs",
    s"""$clusterOracleChain,
       |${TextAnalysis.qualityOracleCte},
       |j AS (
       |  SELECT c.cluster_id, c.doc_id, q.quality_micro
       |  FROM clus c JOIN qual q ON c.doc_id = q.doc_id),
       |r AS (
       |  SELECT cluster_id, doc_id, quality_micro,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY quality_micro DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY cluster_id) AS n_members
       |  FROM j)
       |SELECT cluster_id, CAST(n_members AS BIGINT) AS n_members,
       |  doc_id AS canonical_doc, quality_micro AS canonical_quality
       |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin) { (s, d) =>
    val qual = TextAnalysis.qualityBase(s, d)
      .select(col("doc_id"), TextAnalysis.qualityMicroCol.as("quality_micro"))
    clusterAssignments(s, d).join(qual, "doc_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        min(struct((col("quality_micro") * -1).as("nq"),
          col("doc_id").as("d"))).as("pick"))
      .select(col("cluster_id"), col("n_members"),
        col("pick.d").as("canonical_doc"),
        (col("pick.nq") * -1).as("canonical_quality"))
      .orderBy("cluster_id")
  }

  /** q255: quality×duplication calibration — the curation cross-check
    * between the two independent per-document signals: are the
    * documents the quality score ranks lowest also the ones the minhash
    * tier finds duplicated? Per exact quality DECILE (equi-depth, via
    * the banded global rank — never a single-task corpus window), the
    * document count, duplicate-cluster-member count, and dup_ppm. A
    * monotone-decreasing dup_ppm over deciles means the quality filter
    * already catches much of what dedup would remove (cheap pre-filter
    * before the expensive minhash pass); a flat profile means the two
    * signals are orthogonal and BOTH passes earn their cost. Everything
    * is integer-decided: decile = ((r−1)·10) div n from the banded rank,
    * ratios are BIGINT div.
    */
  /** The quality-decile × duplication table shared by q255 (reads it
    * verbatim) and q272 (fits PAVA over it) — (decile, n_docs, n_dup) at
    * ≤10 rows. Registered as a checkpointed [[graft.Artifacts]] leaf
    * (VERDICT r12 item 3): the build plan is deep (cluster artifact +
    * quality base + one banded global rank over the corpus), so without
    * the leaf each consumer re-pays the corpus-scale join + rank —
    * q272's 19 s in-suite was exactly that rebuild. In production this
    * is the same contract as the index artifacts: a calibration table
    * is derived once per corpus snapshot and read, not re-derived per
    * downstream query.
    */
  private[operators] def dupDecileTable(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    graft.Artifacts.checkpointedDf(s, s"dup_deciles:$d") {
      val qual = TextAnalysis.qualityBase(s, d)
        .select(col("doc_id"), TextAnalysis.qualityMicroCol.as("quality_micro"))
      val cs = clusterAssignments(s, d)
      val dup = cs
        .join(cs.groupBy("cluster_id").agg(count(lit(1)).as("sz")),
          "cluster_id")
        .select(col("doc_id"), (col("sz") >= 2).as("is_dup"))
      Banded.cumSums(qual.join(dup, "doc_id"), Nil,
          Seq(col("quality_micro"), col("doc_id")),
          expr("quality_micro div 100000"),
          Seq(Banded.CumSpec("r", lit(1L), Some("n"))))
        .select(expr("((r - 1) * 10) div n + 1").as("decile"), col("is_dup"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"))
    }

  private val q255 = GraftQuery(
    "q255_quality_dup_calibration",
    s"""$clusterOracleChain,
       |${TextAnalysis.qualityOracleCte},
       |cs AS (SELECT cluster_id, count(*) AS sz FROM clus GROUP BY 1),
       |dup AS (
       |  SELECT c.doc_id, cs.sz >= 2 AS is_dup
       |  FROM clus c JOIN cs USING (cluster_id)),
       |rk AS (
       |  SELECT q.quality_micro, d.is_dup,
       |    row_number() OVER (ORDER BY q.quality_micro, q.doc_id) AS r,
       |    count(*) OVER () AS n
       |  FROM qual q JOIN dup d ON q.doc_id = d.doc_id),
       |dec AS (SELECT ((r - 1) * 10) // n + 1 AS decile, is_dup FROM rk)
       |SELECT CAST(decile AS BIGINT) AS decile,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(*) FILTER (WHERE is_dup) AS BIGINT) AS n_dup,
       |  count(*) FILTER (WHERE is_dup) * 1000000 // count(*) AS dup_ppm
       |FROM dec GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    dupDecileTable(s, d)
      .select(col("decile"), col("n_docs"), col("n_dup"),
        expr("(n_dup * 1000000) div n_docs").as("dup_ppm"))
      .orderBy("decile")
  }

  /** q257: directional duplication matrix — "who copies whom": for
    * every non-canonical member of a duplicate cluster, attribute the
    * dropped document to its cluster's KEEPER (q116's quality-pinned
    * survivor) and count by (keeper_source, dropped_source). The
    * diagonal is intra-source duplication (boilerplate within a crawl);
    * off-diagonal mass is cross-source copying with a DIRECTION the
    * symmetric overlap measures (q88 minhash-union, q225 HLL
    * inclusion-exclusion) cannot express — the table a licensing or
    * provenance review actually reads. Scale shape: the survivor pick
    * is q116's order-pinned min(struct) aggregate (one cluster_id
    * shuffle); the two source lookups are plain shuffled equi-joins on
    * doc_id — the (doc_id, source) projection is CORPUS-ROW-COUNT-sized
    * (billions of rows at 100 TB), so it must never be broadcast; the
    * dropped-docs side they join is duplicate-grain, far smaller, and
    * AQE is free to pick a broadcast at runtime when the actual size
    * permits. The output matrix is source²-bounded.
    */
  private val q257 = GraftQuery(
    "q257_copy_direction_matrix",
    s"""$clusterOracleChain,
       |${TextAnalysis.qualityOracleCte},
       |j AS (
       |  SELECT c.cluster_id, c.doc_id, q.quality_micro
       |  FROM clus c JOIN qual q ON c.doc_id = q.doc_id),
       |r AS (
       |  SELECT cluster_id, doc_id, quality_micro,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY quality_micro DESC, doc_id) AS rn
       |  FROM j),
       |keep AS (SELECT cluster_id, doc_id AS keeper FROM r WHERE rn = 1),
       |dropped AS (
       |  SELECT k.keeper, c.doc_id
       |  FROM clus c JOIN keep k ON c.cluster_id = k.cluster_id
       |  WHERE c.doc_id <> k.keeper)
       |SELECT ks.source AS keeper_source, ds.source AS dropped_source,
       |  CAST(count(*) AS BIGINT) AS n_docs
       |FROM dropped m
       |JOIN documents ks ON ks.doc_id = m.keeper
       |JOIN documents ds ON ds.doc_id = m.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val qual = TextAnalysis.qualityBase(s, d)
      .select(col("doc_id"), TextAnalysis.qualityMicroCol.as("quality_micro"))
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val keep = clusterAssignments(s, d).join(qual, "doc_id")
      .groupBy("cluster_id")
      .agg(min(struct((col("quality_micro") * -1).as("nq"),
        col("doc_id").as("d"))).as("pick"))
      .select(col("cluster_id"), col("pick.d").as("keeper"))
    clusterAssignments(s, d)
      .join(keep, "cluster_id")
      .where(col("doc_id") =!= col("keeper"))
      .join(src.select(col("doc_id").as("keeper"),
        col("source").as("keeper_source")), "keeper")
      .join(src.select(col("doc_id"),
        col("source").as("dropped_source")), "doc_id")
      .groupBy("keeper_source", "dropped_source")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("keeper_source", "dropped_source")
  }

  /** q164: PageRank over the duplicate-candidate graph — 3 unrolled
    * power iterations (damping 0.85, no dangling redistribution — the
    * simplified variant, stated) ranking documents by how central they
    * sit in duplication neighborhoods: high-rank nodes are the template/
    * boilerplate hubs a corpus triage reviews first, the graph-shaped
    * complement to q52's membership answer. Determinism is the whole
    * trick for a float fixpoint: every per-node incoming sum is an
    * ORDER-PINNED fold over the (source-sorted) contribution list, and
    * contributions are pr/deg divisions of identical doubles — so all
    * three iterations are bit-reproducible across engines and shuffle
    * orders, and the gate rounds only at the end. Scale shape: the
    * symmetrized adjacency is built once; each iteration is one join
    * carrying (rank, degree) — never text or signatures — plus one fold
    * shuffle to node grain, i.e. O(iterations) passes over EDGES, the
    * same budget GraphX/Pregel pays, expressed as three declarative
    * rounds (a fixed iteration count needs no fixpoint loop, so unlike
    * [[connectedComponents]] it stays in Catalyst end-to-end).
    */
  private val q164 = GraftQuery(
    "q164_dupgraph_pagerank",
    s"""$clusterOracleChain,
       |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |pr0 AS (
       |  SELECT d.doc_id, CAST(1 AS DOUBLE) / nn.n AS p
       |  FROM documents d CROSS JOIN nn),
       |c1 AS (
       |  SELECT e.v, e.u, pr.p / d.deg AS c
       |  FROM edges e JOIN pr0 pr ON pr.doc_id = e.u JOIN deg d ON d.u = e.u),
       |s1 AS (
       |  SELECT v, list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list(c ORDER BY u)), (a, x) -> a + x) AS s
       |  FROM c1 GROUP BY 1),
       |pr1 AS (
       |  SELECT d.doc_id,
       |    CAST(0.15 AS DOUBLE) / nn.n
       |      + CAST(0.85 AS DOUBLE) * coalesce(s.s, CAST(0 AS DOUBLE)) AS p
       |  FROM documents d CROSS JOIN nn LEFT JOIN s1 s ON s.v = d.doc_id),
       |c2 AS (
       |  SELECT e.v, e.u, pr.p / d.deg AS c
       |  FROM edges e JOIN pr1 pr ON pr.doc_id = e.u JOIN deg d ON d.u = e.u),
       |s2 AS (
       |  SELECT v, list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list(c ORDER BY u)), (a, x) -> a + x) AS s
       |  FROM c2 GROUP BY 1),
       |pr2 AS (
       |  SELECT d.doc_id,
       |    CAST(0.15 AS DOUBLE) / nn.n
       |      + CAST(0.85 AS DOUBLE) * coalesce(s.s, CAST(0 AS DOUBLE)) AS p
       |  FROM documents d CROSS JOIN nn LEFT JOIN s2 s ON s.v = d.doc_id),
       |c3 AS (
       |  SELECT e.v, e.u, pr.p / d.deg AS c
       |  FROM edges e JOIN pr2 pr ON pr.doc_id = e.u JOIN deg d ON d.u = e.u),
       |s3 AS (
       |  SELECT v, list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list(c ORDER BY u)), (a, x) -> a + x) AS s
       |  FROM c3 GROUP BY 1),
       |pr3 AS (
       |  SELECT d.doc_id,
       |    CAST(0.15 AS DOUBLE) / nn.n
       |      + CAST(0.85 AS DOUBLE) * coalesce(s.s, CAST(0 AS DOUBLE)) AS p
       |  FROM documents d CROSS JOIN nn LEFT JOIN s3 s ON s.v = d.doc_id)
       |SELECT doc_id, round(p * 1000000, 4) AS pr_ppm
       |FROM pr3 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val edges = minhashCandidates(minhashSigs(s, d))
      .where(expr(sigMatchPredicate))
      .select(col("doc_a"), col("doc_b")).distinct()
    val sym = edges.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(edges.select(col("doc_b").as("u"), col("doc_a").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val adj = sym.join(deg, "u")
      .select(col("u"), col("v"), col("deg"))
      // the fixture graph is tiny but the 100 TB shape wants the
      // adjacency shuffled once and reread per iteration, not re-derived
      // from signatures three times
      .repartition(col("u")).localCheckpoint(eager = true)
    val docs = Tables.documents(s, d).select("doc_id")
    val nn = broadcast(docs.agg(count(lit(1)).cast("double").as("n")))
    val pr0 = docs.crossJoin(nn).select(col("doc_id"), (lit(1.0) / col("n")).as("p"))
    def step(pr: DataFrame): DataFrame = {
      val contrib = adj.join(pr.withColumnRenamed("doc_id", "u"), "u")
        .select(col("v"), col("u"), (col("p") / col("deg")).as("c"))
      val sums = contrib.groupBy("v")
        .agg(sort_array(collect_list(struct(col("u"), col("c")))).as("cs"))
        .select(col("v"),
          expr("aggregate(cs, 0D, (a, x) -> a + x.c)").as("s"))
      docs.crossJoin(nn)
        .join(sums, col("doc_id") === col("v"), "left")
        .select(col("doc_id"),
          (lit(0.15) / col("n")
            + lit(0.85) * coalesce(col("s"), lit(0.0))).as("p"))
    }
    val pr3 = step(step(step(pr0)))
    pr3.select(col("doc_id"), round(col("p") * 1e6, 4).as("pr_ppm"))
      .orderBy("doc_id")
  }

  /** q159: LEAKAGE-FREE train/val/test split — the dedup-aware version
    * of q58's document split: the split unit is the duplicate CLUSTER
    * (q52's connected component), so every member of a near-dup cluster
    * lands in the SAME split. Splitting documents independently (q58)
    * leaks training data into eval whenever near-copies straddle the
    * cut — the contamination q65 detects after the fact, prevented
    * structurally here. The bucketing reuses q58's LCG contract on
    * `cluster_id` (same constants, so the two splits are comparable
    * apples-to-apples), and at 100 TB the whole query is the q52 CC
    * artifact plus ONE stateless map — split assignment adds zero
    * shuffles, and a singleton-heavy corpus (most documents) never
    * enters the edge fixpoint at all.
    */
  private val q159 = GraftQuery(
    "q159_leakfree_split",
    s"""$clusterOracleChain
       |SELECT doc_id, cluster_id,
       |  CASE WHEN ${Pipeline.lcgSql("cluster_id", Pipeline.SplitA, Pipeline.SplitC)} % 100 < 80 THEN 'train'
       |       WHEN ${Pipeline.lcgSql("cluster_id", Pipeline.SplitA, Pipeline.SplitC)} % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM clus ORDER BY doc_id""".stripMargin) { (s, d) =>
    val bucket = Pipeline.lcg(col("cluster_id"), Pipeline.SplitA, Pipeline.SplitC) % 100
    clusterAssignments(s, d)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .orderBy("doc_id")
  }

  /** Bucket-width cap for the REGISTERED capped-dedup query (q85). Chosen
    * to actually TRIP on the fixture corpora (band buckets reach width 3
    * at sf0.01, 5 at sf0.001, 15 at sf0.1), so the driver's oracle gate
    * exercises the real routing: width ≤ 2 buckets expand to pairs,
    * wider buckets contribute star edges instead.
    */
  private val CapWidth = 2

  /** q85: cluster assignment under the HOT-BUCKET CAP — the 100 TB dedup
    * path itself put under the oracle gate, not just unit fixtures:
    * [[minhashCandidates]] with `maxBucketWidth` routes over-wide band
    * buckets out of O(width²) pair expansion, [[minhashHotBucketEdges]]
    * re-attaches their members as O(width) star edges (hub = bucket-min
    * doc_id), and connected components run over the union. The capped
    * semantics differ from q52's by construction — star-edge members join
    * the cluster WITHOUT the 9/12 signature check (an over-wide bucket is
    * treated as one duplicate cluster) — and the oracle states exactly
    * that: pairs filtered to width ≤ [[CapWidth]] buckets + unverified
    * star edges from wider ones, closed transitively.
    */
  private val q85 = GraftQuery(
    "q85_capped_clusters",
    s"""${shingleCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}, sig AS (
       |  SELECT doc_id, $oracleSigList AS sig FROM hs
       |), bands AS (
       |  ${oracleMinhashBands("")}
       |), bw AS (
       |  SELECT band, h1, h2, h3, count(*) AS w, min(doc_id) AS hub
       |  FROM bands GROUP BY 1, 2, 3, 4
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3
       |   AND a.doc_id < b.doc_id
       |  JOIN bw ON a.band = bw.band AND a.h1 = bw.h1 AND a.h2 = bw.h2 AND a.h3 = bw.h3
       |  WHERE bw.w <= $CapWidth
       |), star AS (
       |  SELECT DISTINCT bw.hub AS doc_a, b.doc_id AS doc_b
       |  FROM bands b
       |  JOIN bw ON b.band = bw.band AND b.h1 = bw.h1 AND b.h2 = bw.h2 AND b.h3 = bw.h3
       |  WHERE bw.w > $CapWidth AND b.doc_id <> bw.hub
       |), edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs WHERE $minhashMatchSql
       |  UNION
       |  SELECT doc_b AS u, doc_a AS v FROM pairs WHERE $minhashMatchSql
       |  UNION
       |  SELECT doc_a AS u, doc_b AS v FROM star
       |  UNION
       |  SELECT doc_b AS u, doc_a AS v FROM star
       |), reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |)
       |SELECT d.doc_id, least(d.doc_id, coalesce(rm.m, d.doc_id)) AS cluster_id
       |FROM documents d LEFT JOIN (SELECT u, min(v) AS m FROM reach GROUP BY u) rm
       |  ON d.doc_id = rm.u
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sigs = minhashSigs(s, d)
    val pairs = minhashCandidates(sigs, maxBucketWidth = Some(CapWidth))
      .where(expr(sigMatchPredicate))
      .select(col("doc_a"), col("doc_b"))
    val stars = minhashHotBucketEdges(sigs, maxBucketWidth = CapWidth)
    val edges = pairs.union(stars).distinct()
    connectedComponents(Tables.documents(s, d).select("doc_id"), edges)
      .orderBy("doc_id")
  }

  /** q88: corpus-level SOURCE-overlap triage — the minhash estimate
    * lifted from documents to whole sources: each source's shingle-set
    * UNION gets a 12-component signature (min over all member documents'
    * per-hash minima — exactly the union's minhash, since min distributes
    * over union), and every source pair's agreement fraction estimates
    * the Jaccard overlap of their content. This is the step a corpus
    * curator runs BEFORE cross-source dedup: at 100 TB it is one
    * map-side-combined aggregation (the explode collapses to ~#sources
    * rows per partition before the shuffle — 12 codegen min-aggregates,
    * no payload) and a ~#sources² comparison of 12-long arrays, i.e.
    * free compared to any pairwise document work it triages away.
    */
  private val q88 = GraftQuery(
    "q88_source_overlap",
    s"""$shingleCtes, hsrc AS (
       |  SELECT d.source AS source, u.h AS h
       |  FROM hs JOIN documents d ON hs.doc_id = d.doc_id, unnest(hs.hv) AS u(h)
       |), ssig AS (
       |  SELECT source, $oracleSigList AS sig
       |  FROM (SELECT source, list(h) AS hv FROM hsrc GROUP BY source)
       |)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  CAST(len(list_filter(range(1, ${NumHashes + 1}), i -> a.sig[i] = b.sig[i])) AS BIGINT) AS n_match,
       |  round(len(list_filter(range(1, ${NumHashes + 1}), i -> a.sig[i] = b.sig[i])) / $NumHashes.0, 6) AS est_jaccard
       |FROM ssig a JOIN ssig b ON a.source < b.source
       |ORDER BY source_a, source_b""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val exploded = shingleHashTable(s, d)
      .select(col("doc_id"), explode(col("hv")).as("h"))
      .join(docs, "doc_id")
    val sigCols = (0 until NumHashes).map(i =>
      min(expr(s"(${A(i)} * h + ${B(i)}) % $P")).as(s"m$i"))
    val ssig = exploded.groupBy("source")
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("source"), array((0 until NumHashes).map(i => col(s"m$i")): _*).as("sig"))
    val a = ssig.select(col("source").as("source_a"), col("sig").as("sa"))
    val b = ssig.select(col("source").as("source_b"), col("sig").as("sb"))
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .withColumn("n_match",
        expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))").cast("long"))
      .select(col("source_a"), col("source_b"), col("n_match"),
        round(col("n_match") / NumHashes.toDouble, 6).as("est_jaccard"))
      .orderBy("source_a", "source_b")
  }

  // ---- IVF k-means training (q56) ----

  /** Coarse-quantizer cell count: k ~ √n (the published IVF sizing —
    * FAISS's guideline is k between √n and 16√n), clamped to [4, 1024].
    * k ~ √n is what keeps every "cell-bounded" contract sub-quadratic:
    * a cell holds O(√n) vectors, so within-cell pair expansion (SemDeDup
    * q325, the kNN label audit q339) is O(k · (n/k)²) = O(n^1.5) total
    * instead of the O(n²/k) a fixed k degrades to, and per-probe serving
    * cost stays O(√n) as the corpus grows. The 1024 ceiling is
    * [[kmAssign]]'s literal-codebook router bound (≈0.5 MB of doubles at
    * dim 64 — plan-literal metadata); past ~10⁶ vectors the documented
    * path is a two-level coarse quantizer (IMI: route on √k × √k product
    * cells), which changes the router, not the cell-bounded contracts.
    * The floor keeps tiny fixtures (n < 16) from degenerating to k ≤ 3
    * cells. Spark and the DuckDB oracle compute k from the SAME
    * expression — floor(sqrt(n)) is exact in IEEE double for any corpus
    * count — so the trained index is engine-identical at every sf.
    */
  private[operators] def kmKOf(n: Long): Int =
    math.max(4L, math.min(1024L,
      math.floor(math.sqrt(n.toDouble)).toLong)).toInt

  /** k for a (session, dir) corpus — one count per corpus, memoized in
    * [[graft.Artifacts]] beside the trained index it sizes.
    */
  private[operators] def kmK(s: SparkSession, d: String): Int =
    graft.Artifacts.cached[java.lang.Integer](s, s"ivf_k:$d") {
      (Int.box(kmKOf(Tables.embeddings(s, d).count())), () => ())
    }

  /** [[kmKOf]] as a DuckDB scalar subquery — interpolated wherever an
    * oracle seeds or bounds by the trained cell count, so every oracle
    * tracks the corpus size exactly as the engine does.
    */
  private[operators] val KmKSql =
    "(SELECT greatest(4, least(1024, CAST(floor(sqrt(count(*))) AS BIGINT))) FROM embeddings)"

  private val KmDim = 64

  /** Nearest-centroid assignment; ties break to the lowest cell id.
    * Distances come from the codegen [[graft.functions.L2DistanceSq]]
    * kernel (left-to-right accumulation, bit-identical to the oracle's
    * list_reduce over bit-identical centroids), and the argmin is a
    * map-side `array_min` over the COLLECTED centroid table riding the
    * plan as a literal (k ≤ 1024 rows of doubles — router metadata, the
    * [[frozenAssignEncode]] recipe): ZERO exchange per assignment pass,
    * where a `min_by` aggregate would shuffle ~one collapsed row per
    * corpus vector per Lloyd pass — at 100 TB that exchange, repeated
    * per training iteration, IS the training cost. The struct ordering
    * (d, cell) is the same lexicographic tie-break
    * `min_by(struct(d, cell))` used — the equivalence the q94/q109
    * oracle gates already pin for the frozen-codebook path.
    */
  private[operators] def kmAssign(e: DataFrame, cents: DataFrame): DataFrame = {
    // Guard the literal-codebook contract loudly: the collected frame
    // rides the plan as a typedLit, which is only sane for router-sized
    // codebooks, and getSeq[Double] would otherwise fail opaquely at
    // runtime on an array<float> centroid column.
    cents.schema("cen").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, _) => ()
      case other => throw new IllegalArgumentException(
        s"kmAssign requires cen: array<double> (got $other); " +
          "cast the centroid column before assignment")
    }
    val rows = cents.select(col("cell"), col("cen")).collect()
    require(rows.length <= 1024,
      s"kmAssign embeds the codebook as a plan literal; ${rows.length} " +
        "centroids exceeds the 1024-cell router-metadata bound — use a " +
        "broadcast join for codebooks this large")
    val arr = rows
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val scored = transform(typedLit(arr), c => struct(
      VectorFunctions.l2DistSq(col("embedding"), c.getField("_2")).as("d"),
      c.getField("_1").as("cell")))
    e.withColumn("cell", array_min(scored).getField("cell"))
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** Centroid recompute with ORDER-PINNED sums: each (cell, dim) collects
    * its member values sorted by vec_id and folds them left-to-right, so
    * the mean is bit-identical to the oracle's `list(v ORDER BY vec_id)`
    * fold — no dependence on shuffle order, hence no float divergence and
    * no assignment flips at cell boundaries.
    */
  private def kmRecompute(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), col("vec_id"), posexplode(col("embedding")).as(Seq("j", "v")))
      .groupBy(col("cell"), col("j"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("v")))).as("vals"))
      .select(col("cell"), col("j"),
        (expr("aggregate(vals, 0D, (acc, s) -> acc + CAST(s.v AS DOUBLE))")
          / size(col("vals"))).as("mean_j"))
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(struct(col("j"), col("mean_j")))).as("ms"))
      .select(col("cell"), expr("transform(ms, s -> s.mean_j)").as("cen"))

  private def kmOracleDist(emb: String, cen: String): String =
    s"list_reduce(list_transform(range(1, $KmDim+1), j -> " +
      s"(CAST($emb[j] AS DOUBLE) - $cen[j]) * (CAST($emb[j] AS DOUBLE) - $cen[j])), (x,y) -> x+y)"

  private def kmOracleAssignFrom(src: String, cents: String, out: String): String =
    s"""$out AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${kmOracleDist("e.embedding", "c.cen")}, c.cell) AS rn
       |    FROM $src e CROSS JOIN $cents c) t
       |  WHERE rn = 1
       |)""".stripMargin

  private def kmOracleAssign(cents: String, out: String): String =
    kmOracleAssignFrom("embeddings", cents, out)

  private def kmOracleRecompute(asg: String, out: String): String =
    s"""${out}_dims AS (
       |  SELECT cell, j,
       |    list_reduce(list(CAST(embedding[j] AS DOUBLE) ORDER BY vec_id), (x,y) -> x+y)
       |      / count(*) AS mean_j
       |  FROM $asg CROSS JOIN range(1, $KmDim+1) t(j)
       |  GROUP BY cell, j
       |), $out AS (
       |  SELECT cell, list(mean_j ORDER BY j) AS cen FROM ${out}_dims GROUP BY cell
       |)""".stripMargin

  /** q56: TRAIN the IVF index — 2 deterministic Lloyd iterations of
    * k-means (k = [[kmKOf]](n) ~ √n) seeded with the first k vectors,
    * emitting every
    * vector's trained cell. This replaces q30/q41's "label stands in for
    * a cell id" with the actual coarse quantizer: assignment is a
    * broadcast-k cross join (linear scan, the at-scale path), recompute
    * is a (cell, dim) aggregation. Production trains on a sample and
    * assigns the full corpus; the fixed 2-iteration count keeps the whole
    * computation one deterministic lazy plan — no driver convergence
    * loop, no nondeterministic init.
    */
  private val q56 = GraftQuery(
    "q56_ivf_kmeans",
    s"""WITH c0 AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cen
       |  FROM embeddings WHERE vec_id < $KmKSql
       |), ${kmOracleAssign("c0", "a1")}, ${kmOracleRecompute("a1", "c1")},
       |${kmOracleAssign("c1", "a2")}
       |SELECT vec_id, cell FROM a2 ORDER BY vec_id""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val c0 = e.where(col("vec_id") < kmK(s, d))
      .select(col("vec_id").cast("int").as("cell"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cen"))
    val a1 = kmAssign(e, c0)
    val c1 = kmRecompute(a1)
    kmAssign(e, c1)
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")
  }

  /** q76: the dedup MANIFEST — the stage that makes q52's clusters
    * actionable: one row per kept document (the cluster's min doc_id),
    * with its member/dropped counts and the keeper's own metadata. This
    * is what a dedup pass actually ships: downstream jobs join the
    * manifest to drop non-keepers; the audit columns say how much was
    * removed and from where. Composition: candidates (q31's banded join)
    * → signature-verified edges → connected components (q52) → one
    * groupBy(cluster_id) + a doc_id equi-join for keeper metadata.
    */
  private val q76 = GraftQuery(
    "q76_dedup_manifest",
    s"""${shingleCtes.replaceFirst("WITH ", "WITH RECURSIVE ")}, sig AS (
       |  SELECT doc_id, $oracleSigList AS sig FROM hs
       |), bands AS (
       |  ${oracleMinhashBands("")}
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3
       |   AND a.doc_id < b.doc_id
       |), edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs WHERE $minhashMatchSql
       |  UNION
       |  SELECT doc_b AS u, doc_a AS v FROM pairs WHERE $minhashMatchSql
       |), reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
       |), cl AS (
       |  SELECT d.doc_id, least(d.doc_id, coalesce(rm.m, d.doc_id)) AS cluster_id
       |  FROM documents d LEFT JOIN (SELECT u, min(v) AS m FROM reach GROUP BY u) rm
       |    ON d.doc_id = rm.u
       |)
       |SELECT c.cluster_id AS keeper_doc_id, k.lang AS lang, k.source AS source,
       |  CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(count(*) - 1 AS BIGINT) AS n_dropped
       |FROM cl c JOIN documents k ON c.cluster_id = k.doc_id
       |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) { (s, d) =>
    val edges = minhashCandidates(minhashSigs(s, d))
      .where(expr(sigMatchPredicate))
      .select(col("doc_a"), col("doc_b")).distinct()
    val docs = Tables.documents(s, d)
    connectedComponents(docs.select("doc_id"), edges)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        (count(lit(1)) - 1).as("n_dropped"))
      .join(docs.select(col("doc_id"), col("lang"), col("source")),
        col("cluster_id") === col("doc_id"))
      .select(col("cluster_id").as("keeper_doc_id"), col("lang"), col("source"),
        col("n_members"), col("n_dropped"))
      .orderBy("keeper_doc_id")
  }

  // ---- composed IVF search: train → assign → top-k (q71, q72) ----

  /** The trained coarse quantizer + assignments — the c0 → assign →
    * recompute → assign pipeline q56 gates, reused by the composed search
    * queries. Returns (centroids, assignments).
    *
    * Both outputs are PERSISTED: an index is a materialized artifact, not
    * a recomputed view — the search self-join references the assignments
    * on both sides, and without materialization each side re-runs the
    * whole training pipeline (the collect_list-backed recompute
    * aggregations don't canonicalize equal across the analyzer's
    * self-join dedup, so ReuseExchange never kicks in — measured: 6
    * parquet scans and two full Lloyd pipelines in one q71 plan). The
    * cache is the local[n] stand-in for what a 100 TB deployment does
    * explicitly: write the trained centroids + assignments to storage
    * once, then serve every probe from the materialized index.
    */
  /** One trained index per (session, dir): q71, q72, q83, q84, and
    * [[writeIvfIndex]] all serve from the SAME cached artifact instead
    * of each persisting a private copy — the artifact-reuse argument the
    * docstring above makes, applied to the callers too. Registered in
    * [[graft.Artifacts]], so `Artifacts.release(session)` unpersists both
    * halves when the session is done with the corpus.
    */
  private[operators] def kmTrained(s: SparkSession, d: String): (DataFrame, DataFrame) =
    graft.Artifacts.cached[(DataFrame, DataFrame)](s, s"ivf_trained:$d") {
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val c0 = e.where(col("vec_id") < kmK(s, d))
        .select(col("vec_id").cast("int").as("cell"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cen"))
      // materialized LEAVES, not live lineage (Artifacts.leafDf scaladoc):
      // every IVF consumer's plan starts at the trained tables
      val (c1, relC1) = graft.Artifacts.leafDf(kmRecompute(kmAssign(e, c0)))
      val (a2, relA2) = graft.Artifacts.leafDf(kmAssign(e, c1))
      ((c1, a2), () => { relC1(); relA2() })
    }

  /** The QUANTIZED index artifact: every trained assignment's int8 codes
    * (`code: array<tinyint>`) and integer code norm (`nq: bigint`),
    * computed ONCE per vector from the float embedding and materialized —
    * the float arrays exist only upstream of this projection, so every
    * serving join downstream carries 1 byte/dim + one long instead of
    * 4 bytes/dim (the actual 4× storage/shuffle reduction, not a per-pair
    * simulation of it). Same storage contract as [[kmTrained]]: persisted,
    * shared per (session, dir), released via `Artifacts.release`.
    */
  private[operators] def kmQuantized(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.cachedDf(s, s"ivf_quantized:$d") {
      VectorFunctions.register(s)
      val (_, a2) = kmTrained(s, d)
      a2.select(col("vec_id"), col("cell"),
          VectorFunctions.int8Encode(col("embedding")).as("code"))
        .withColumn("nq", VectorFunctions.int8CodeDot(col("code"), col("code")))
    }

  /** [[kmQuantized]] with the metadata column riding the index row — the
    * filtered-ANN storage layout (the q103 scaladoc's "label rides the
    * stored index row, as the code columns do"): the label is joined ONCE
    * at index-build time and materialized, so a filtered serving query's
    * predicate is a column comparison inside the candidate join — no
    * per-query metadata join, exactly how a production store filters.
    */
  private[operators] def kmQuantizedLabeled(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.cachedDf(s, s"ivf_quantized_labeled:$d") {
      kmQuantized(s, d)
        .join(Tables.embeddings(s, d).select("vec_id", "label"), "vec_id")
    }

  /** Materialize the trained IVF index to storage, partitioned by cell —
    * the production form of [[kmTrained]]'s persist. A probe that knows
    * its target cells (from the centroid table, which is k rows and ships
    * everywhere) then reads ONLY those cells' files: partition pruning is
    * what makes serving an IVF index from 100 TB of vectors an
    * O(cells-probed) read, not a corpus scan. ScaleSpec asserts the
    * pruned read-back.
    */
  def writeIvfIndex(s: SparkSession, d: String, outDir: String): Unit = {
    VectorFunctions.register(s)
    // writes from the memoized shared caches — no private copy to clean up.
    // The stored artifact carries EVERY serving form of each vector: the
    // float embedding (exact rerank tier), the int8 code + integer norm
    // (quantized rerank tier, 4× smaller per probe read), and the PQ code
    // array (ADC tier, [[PqM]] small ints — the 16-32×-at-production-
    // sizing form q91/q93 scan) — all computed once here, so no serving
    // query ever re-derives a code per pair.
    val (_, a2) = kmTrained(s, d)
    val (_, pqCodes) = pqTrained(s, d)
    def codeArr(codes: DataFrame, name: String) = codes
      .groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("m"), col("cell")))).as("mc"))
      .select(col("vec_id"), expr("transform(mc, s -> s.cell)").as(name))
    val pqArr = codeArr(pqCodes, "pq_code")
    // the RESIDUAL code array (q101's serving form) rides the same row —
    // a reader picks the ADC tier (raw vs residual) by column choice
    val rpqArr = codeArr(pqResTrained(s, d)._2, "rpq_code")
    a2.select(col("vec_id"), col("embedding"), col("cell"),
        VectorFunctions.int8Encode(col("embedding")).as("code"))
      .withColumn("nq", VectorFunctions.int8CodeDot(col("code"), col("code")))
      .join(pqArr, Seq("vec_id"))
      .join(rpqArr, Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(outDir)
  }

  /** The index SIDECAR: coarse centroids + PQ codebooks to storage next
    * to [[writeIvfIndex]]'s vector partitions. Together the two writes
    * are the complete serving artifact — a cold process (or another
    * engine) reconstructs every tier from files alone: probe selection
    * needs the coarse centroids, the ADC LUT needs the codebooks, and
    * the candidate scan reads the partitioned codes. Both tables are
    * k-sized (rows = cells, resp. M·k), so this is a metadata write.
    */
  def writeIndexSidecar(s: SparkSession, d: String, outDir: String): Unit = {
    val (c1, _) = kmTrained(s, d)
    val (cents, _) = pqTrained(s, d)
    c1.write.mode("overwrite").parquet(s"$outDir/coarse_centroids")
    cents.write.mode("overwrite").parquet(s"$outDir/pq_codebooks")
    // residual-ADC tier (q101): its LUT needs the residual codebooks
    pqResTrained(s, d)._1.write.mode("overwrite")
      .parquet(s"$outDir/pq_residual_codebooks")
  }

  /** The complete written serving artifact as a session-memoized temp
    * directory: [[writeIvfIndex]] under `<base>/index` plus
    * [[writeIndexSidecar]] tables under `<base>` — one write shared by
    * every cold-start consumer in the session (Verify + Bench warmup and
    * timed runs), deleted by `Artifacts.release`. Each session writes its
    * own directory, so concurrent sessions never clobber each other.
    */
  private[operators] def writtenIndex(s: SparkSession, d: String): String =
    graft.Artifacts.cached[String](s, s"written_index:$d") {
      val base = java.nio.file.Files.createTempDirectory("graft_served_index")
      writeIvfIndex(s, d, base.toString + "/index")
      writeIndexSidecar(s, d, base.toString)
      (base.toString, () => {
        org.apache.commons.io.FileUtils.deleteDirectory(base.toFile); ()
      })
    }

  private val kmOracleTrain: String =
    s"""c0 AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cen
       |  FROM embeddings WHERE vec_id < $KmKSql
       |), ${kmOracleAssign("c0", "a1")}, ${kmOracleRecompute("a1", "c1")},
       |${kmOracleAssign("c1", "a2")}""".stripMargin

  /** Shared top-3-per-vector ranking over a (vec_id, cell, emb) self/probe
    * join — the exact-rerank stage of every IVF tier.
    */
  private def rankTop3(joined: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id"))
    joined
      .withColumn("cos", VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** Exact top-3 ground truth for the bounded query batch (q44's BNLJ
    * shape) — ONE definition shared by both recall audits (q79, q83), so
    * the truth the tiers are scored against cannot drift between them.
    */
  private def bruteForceTruth(e: DataFrame): DataFrame = {
    val qb = broadcast(e.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("embedding").as("emb_a")))
    val all = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_b"))
    rankTop3(qb.join(all, col("vec_id") =!= col("neighbor_id")))
      .select(col("vec_id"), col("neighbor_id"))
  }

  /** Oracle twin of [[bruteForceTruth]]: the tsim/truth CTE pair. */
  private def truthOracle: String =
    s"""tsim AS (
       |  SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
       |    ${cosSql("q", "c")} AS cos
       |  FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) q
       |  JOIN embeddings c ON q.vec_id <> c.vec_id
       |), truth AS (
       |  SELECT vec_id, neighbor_id FROM (
       |    SELECT vec_id, neighbor_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |    FROM tsim) t WHERE rank <= 3
       |)""".stripMargin

  /** Multi-probe cell selection (q72's aggregation shape) — shared by
    * q72, q83, and the recall-curve audit so the (dist, cell) tie-break
    * has one definition. `p` is the probe-count lever: p=1 degenerates to
    * the vector's own assigned cell (single-probe), larger p trades ~p×
    * candidate work for recall — ScaleSpec pins both properties.
    */
  private def probeSelection(e: DataFrame, c1: DataFrame,
      p: Int = ProbeP): DataFrame = {
    require(p >= 1, s"probe count must be >= 1, got $p")
    e.crossJoin(broadcast(c1))
      .withColumn("pd", VectorFunctions.l2DistSq(col("embedding"), col("cen")))
      .groupBy("vec_id")
      .agg(min_by(col("embedding"), struct(col("pd"), col("cell"))).as("emb_a"),
        slice(sort_array(collect_list(struct(col("pd"), col("cell")))), 1, p)
          .as("near"))
      .select(col("vec_id"), col("emb_a"),
        explode(expr("transform(near, s -> s.cell)")).as("probe_cell"))
  }

  /** [[probeSelection]] minus the embedding payload: (vec_id, probe_cell)
    * only — for tiers (q84) whose rerank reads BOTH sides from a stored
    * index, so the query's float vector has no business surviving the
    * probe shuffle either.
    */
  private def probeCells(e: DataFrame, c1: DataFrame, p: Int): DataFrame =
    probeSelection(e, c1, p).select("vec_id", "probe_cell")

  /** The FULL-corpus probe table as a leaf artifact: q72, q84, and q87
    * all probe every vector's [[ProbeP]] nearest trained cells, and each
    * was re-running the corpus × centroids assignment; one (session,
    * dir) table serves all three (payload-free consumers project the
    * embedding away). Released via `Artifacts.release`.
    */
  private def corpusProbes(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.checkpointedDf(s, s"corpus_probes:$d:p=$ProbeP") {
      val (c1, _) = kmTrained(s, d)
      probeSelection(Tables.embeddings(s, d).select("vec_id", "embedding"),
        c1, ProbeP)
    }

  /** Oracle twin of [[probeSelection]]; `where` restricts the probe side. */
  private def probesOracle(where: String): String =
    probesOracleFrom("embeddings", where)

  /** [[probesOracle]] over an arbitrary (vec_id, embedding) source CTE —
    * q145 probes with the UPDATED embeddings; the zero-src delegate keeps
    * every existing oracle's text byte-identical.
    */
  private def probesOracleFrom(src: String, where: String,
      p: Int = ProbeP): String =
    s"""probes AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${kmOracleDist("e.embedding", "c.cen")}, c.cell) AS rn
       |    FROM $src e CROSS JOIN c1 c$where) t
       |  WHERE rn <= $p
       |)""".stripMargin

  /** Probe width for the PREDICATE-CONSTRAINED serving tiers (q103
    * filtered ANN, q104 hard negatives): [[ProbeP]] scaled by the
    * inverse of the worst-case predicate selectivity the tier is
    * contracted to serve — the standard filtered-search sizing (a
    * filter keeping 1/s of candidates needs ~s× the probes for the
    * same effective pool; the 10-label corpus makes the equality
    * filter ~1/10-selective, so 2 × 10). Without the widening, k ~ √n
    * cells hold O(√n) vectors and a selective filter starves top-k for
    * queries whose probed cells carry few matching rows — ScaleSpec
    * pins the no-starvation property. (Literal 20 = ProbeP × 10:
    * [[ProbeP]] is declared later in this object, so deriving it here
    * would read 0 at init; the require below keeps the two in sync.)
    */
  private val FilteredProbeP = 20

  /** q71: the assembled IVF-ANN machine — train the coarse quantizer
    * (q56's exact pipeline), assign every vector to its TRAINED cell, and
    * search top-3 by exact cosine within that cell, all as one lazy plan.
    * q30 keeps the pre-assigned `label` stand-in for continuity; this is
    * the production shape, where the cells come from the data. The
    * trained index is materialized once ([[kmTrained]]) and both join
    * sides scan it, and the candidate join stays an equi-join on the
    * cell id — never all-pairs.
    */
  private val q71 = GraftQuery(
    "q71_ivf_search",
    s"""WITH $kmOracleTrain, sim AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    ${cosSql("a", "b")} AS cos
       |  FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(cos, 6) AS cos_sim FROM (
       |  SELECT vec_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sim) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val (_, a2) = kmTrained(s, d)
    val a = a2.select(col("vec_id"), col("cell"), col("embedding").as("emb_a"))
    val b = a2.select(col("vec_id").as("neighbor_id"),
      col("cell").as("cell_b"), col("embedding").as("emb_b"))
    rankTop3(a.join(b,
      col("cell") === col("cell_b") && col("vec_id") =!= col("neighbor_id")))
  }

  /** Probe count for q72 — the standard IVF recall lever: single-probe
    * search misses true neighbors that sit just across a cell boundary;
    * probing the p nearest cells recovers them at ≤ p× the candidate set.
    * Candidate work is ~p·n²/k total, so the cell count k is the paired
    * throughput knob: since round 15 training sizes k = [[kmKOf]](n) ~ √n
    * (cells stay O(√n) as the corpus grows), so probing p cells costs
    * O(p·√n) candidates per query at every scale.
    */
  private val ProbeP = 2
  require(FilteredProbeP == ProbeP * 10,
    s"FilteredProbeP ($FilteredProbeP) must stay ProbeP x the 10-label " +
      "inverse selectivity (see its scaladoc); update both together")

  /** q72: multi-probe IVF search — each query vector probes its
    * [[ProbeP]] nearest TRAINED cells (not just its own), then exact
    * cosine reranks the union of those cells' members. Probe selection is
    * an aggregation, not a window: the per-vector k candidate cells
    * collapse map-side into one sorted k-array (partial aggregation), so
    * the probe shuffle carries ~one row per vector — the same shape
    * [[kmAssign]] uses for argmin. Candidates then come from one
    * equi-join of (vector, probe_cell) against the assignments.
    */
  private val q72 = GraftQuery(
    "q72_ivf_multiprobe",
    s"""WITH $kmOracleTrain, ${probesOracle("")}, sim AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    ${cosSql("p", "b")} AS cos
       |  FROM probes p JOIN a2 b ON p.cell = b.cell AND p.vec_id <> b.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(cos, 6) AS cos_sim FROM (
       |  SELECT vec_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sim) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val (_, a2) = kmTrained(s, d)
    val probes = corpusProbes(s, d)
    val cand = a2.select(col("vec_id").as("neighbor_id"),
      col("cell").as("cell_b"), col("embedding").as("emb_b"))
    rankTop3(probes.join(cand,
      col("probe_cell") === col("cell_b") && col("vec_id") =!= col("neighbor_id")))
  }

  // ---- simhash (q39) ----

  private val SimBits = 64
  private val HammingMax = 4
  /** Shingle hashes are mod-P values (< 2^30), so a simhash over them
    * would leave bits 30..63 constant-zero and the upper pigeonhole
    * blocks degenerate into all-pairs cross joins. Each feature is
    * therefore expanded to 63 independent bits by packing three affine
    * rehashes (21 bits each, top 21 of 30 to avoid low-bit correlation):
    * h64 = (g1>>9) + (g2>>9)·2^21 + (g3>>9)·2^42, gi = (SAi·h + SBi) mod P.
    * All values stay < 2^63, so the arithmetic is overflow-free in both
    * engines; bit 63 is constant zero on both sides.
    */
  private val SA: Seq[Long] = (0 until 3).map(i => ((i + 14) * 2654435761L) % P)
  private val SB: Seq[Long] = (0 until 3).map(i => ((i + 14) * 2246822519L) % P)
  private def simExpandSql(h: String): String =
    (0 until 3).map(i =>
      s"(((${SA(i)} * $h + ${SB(i)}) % $P) >> 9) * ${1L << (21 * i)}L")
      .mkString(" + ")
  private def simExpandOracle(h: String): String =
    (0 until 3).map(i =>
      s"(((${SA(i)} * $h + ${SB(i)}) % $P) >> 9) * ${1L << (21 * i)}")
      .mkString(" + ")

  /** Pigeonhole blocks (offset, width) over the 63 meaningful bits: any
    * pair within hamming ≤ 4 has at least one of the 5 blocks identical,
    * so the banded join is exact and the oracle can state the clean
    * all-pairs form.
    */
  private val SimBlocks: Seq[(Int, Int)] =
    Seq((0, 13), (13, 13), (26, 13), (39, 13), (52, 11))

  /** q39: simhash near-dup — majority-of-bits signature over the
    * 63-bit-expanded shingle hashes, candidate join on 5 pigeonhole
    * blocks. Banding is exact here (≤ 4 < 5 blocks), so the oracle is
    * the clean all-pairs form.
    */
  private val q39 = GraftQuery(
    "q39_simhash_neardup",
    s"""$shingleCtes, h64 AS (
       |  SELECT doc_id, list_transform(hv, h -> ${simExpandOracle("h")}) AS hv64 FROM hs
       |), sh2 AS (
       |  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(0, $SimBits),
       |      b -> CASE WHEN 2*len(list_filter(hv64, h -> (h >> b) & 1 = 1)) > len(hv64)
       |                THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)),
       |    (a, x) -> a + x) AS simhash
       |  FROM h64
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HammingMax
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    // The majority-of-bits fold is a custom codegen expression
    // (graft.functions.SimHash64): one tight loop per document. The HOF
    // formulation is CodegenFallback and gets inlined per reference;
    // explode + 64 sum-aggregates pays a multi-million-row shuffle agg.
    graft.functions.SimHash64.register(s)
    // The repartition is a materialization fence, not a distribution
    // choice: without it CollapseProject inlines the whole shingle+hash
    // pipeline into every downstream reference (5 band structs × 2 join
    // sides ≈ 12 recomputes per document). The exchange carries only
    // (doc_id, simhash) — 16 bytes/doc at any scale.
    //
    // coalesce(_, 0L) makes the column NON-NULLABLE, which matters twice:
    // the join then infers no isnotnull(simhash) constraint (which would
    // be pushed past the fence to the scan and re-evaluate the whole
    // pipeline as a filter), and a null/empty text degenerates to
    // simhash 0 exactly as the oracle's all-pairs form computes it.
    val sims = shingleHashes(s, d)
      .withColumn("hv64", expr(s"transform(hv, h -> ${simExpandSql("h")})"))
      .select(col("doc_id"),
        coalesce(graft.functions.SimHash64.of(col("hv64")), lit(0L)).as("simhash"))
      .repartition(col("doc_id"))
    val bandStructs = SimBlocks.zipWithIndex.map { case ((off, w), j) =>
      struct(lit(j).as("band"),
        expr(s"(shiftright(simhash, $off) & ${(1L << w) - 1})").as("bkey"))
    }
    val bands = sims.select(col("doc_id"), col("simhash"),
      explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.band").as("band"), col("b.bkey").as("bkey"))
    val l = bands.select(col("doc_id").as("doc_a"), col("simhash").as("sa"),
      col("band"), col("bkey"))
    val r = bands.select(col("doc_id").as("doc_b"), col("simhash").as("sb"),
      col("band").as("band_r"), col("bkey").as("bkey_r"))
    l.join(r, col("band") === col("band_r") && col("bkey") === col("bkey_r") &&
        col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .where(col("hamming") <= HammingMax)
      .select("doc_a", "doc_b", "hamming")
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  // ---- exact n-gram Jaccard verification (q40) ----

  private val JaccardMin = 0.9

  /** q40: exact word-3-gram Jaccard over the minhash-LSH candidates — the
    * verify stage of near-dup dedup (estimate from q31, confirm exactly
    * here). Oracle mirrors the banding, as candidate generation is part
    * of the operator's semantics.
    */
  private val q40 = GraftQuery(
    "q40_jaccard_neardup",
    s"""$shingleCtes, sig AS (
       |  SELECT doc_id, shingles, $oracleSigList AS sig FROM hs
       |), bands AS (
       |  ${oracleMinhashBands(", shingles")}
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.shingles AS sha, b.shingles AS shb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3
       |   AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(sha, shb)) AS BIGINT) AS n_common,
       |  CAST(floor(CAST(len(list_intersect(sha, shb)) AS DOUBLE) * 1000000
       |        / len(list_distinct(list_concat(sha, shb)))) AS BIGINT) AS jaccard_micro
       |FROM pairs
       |WHERE CAST(len(list_intersect(sha, shb)) AS DOUBLE)
       |      / len(list_distinct(list_concat(sha, shb))) >= $JaccardMin
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    // jaccard emitted as floor(j·1e6) micro-units: small-integer ratios
    // can land exactly on the round-half boundary where the engines'
    // rounding modes differ (see q27); floor is engine-independent
    //
    // Candidates are generated as BARE id pairs (signatures only) and the
    // shingle arrays — the dominant payload, KBs/doc — are joined back
    // once per side AFTER pair dedup. The earlier form carried the arrays
    // through the 4× band explode on both join sides (8× replication
    // through the exchange, measured 8.4s at sf0.1); the candidate set is
    // orders of magnitude smaller than the banded input, so two id-keyed
    // joins against the fenced shingle projection are strictly cheaper.
    val pairs = minhashCandidates(minhashSigs(s, d))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    val sh = shingleHashes(s, d).select(col("doc_id"), col("shingles"))
      .repartition(col("doc_id"))
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("shingles_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("shingles_b")), "doc_b")
      .withColumn("n_common",
        size(array_intersect(col("shingles_a"), col("shingles_b"))).cast("long"))
      .withColumn("jaccard_micro", floor(col("n_common").cast("double") * 1000000 /
        size(array_union(col("shingles_a"), col("shingles_b")))).cast("long"))
      .where(col("n_common").cast("double") /
        size(array_union(col("shingles_a"), col("shingles_b"))) >= JaccardMin)
      .select("doc_a", "doc_b", "n_common", "jaccard_micro")
      .orderBy("doc_a", "doc_b")
  }

  // ---- embedding-cosine near-dup (q41) ----

  /** Fixture-calibrated demo threshold (the synthetic embeddings top out
    * near 0.29 in-cell); a production near-dup pass would run at ~0.95+.
    */
  private val CosMin = 0.25

  /** q41: embedding-cosine near-dup pairs within label cells — the
    * IVF-blocked pair form of q30 (dedup by vector similarity rather than
    * text shingles).
    */
  private val q41 = GraftQuery(
    "q41_embedding_neardup",
    s"""WITH sim AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${cosSql("a", "b")} AS cos
       |  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
       |)
       |SELECT vec_a, vec_b, round(cos, 6) AS cos_sim
       |FROM sim WHERE cos >= $CosMin
       |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("vec_a"), col("label"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("label").as("label_b"),
      col("embedding").as("emb_b"))
    a.join(b, col("label") === col("label_b") && col("vec_a") < col("vec_b"))
      .withColumn("cos", VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
      .where(col("cos") >= CosMin)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** q43: exact dedup groups — hash-groupBy on the content fingerprint
    * (the cheapest dedup tier: one shuffle on a 8-byte key). This corpus
    * has no byte-identical documents, so every group has size 1 — the
    * near-dup tiers (q31/q39/q40) exist precisely because exact matching
    * stops there.
    */
  private val q43 = GraftQuery(
    "q43_exact_dedup",
    """SELECT
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(text) + 1),
      |                     i -> CAST(ascii(text[i]) AS BIGINT))),
      |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  min(doc_id) AS keeper
      |FROM documents
      |GROUP BY 1
      |ORDER BY keeper""".stripMargin) { (s, d) =>
    graft.functions.PolyHash.register(s)
    Tables.documents(s, d)
      .groupBy(graft.functions.PolyHash.hash(col("text")).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy("keeper")
  }

  /** q44: brute-force cosine top-k — the exactness BASELINE for the ANN
    * path (q30 is the scale variant). A bounded query batch is broadcast
    * against the full corpus, so the plan is broadcast-nested-loop with a
    * constant-size build side: correct at any corpus scale, linear in
    * corpus size per query.
    */
  private[graft] val QueryBatch = 100
  private val q44 = GraftQuery(
    "q44_knn_bruteforce",
    s"""WITH sim AS (
       |  SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
       |    ${cosSql("q", "c")} AS cos
       |  FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) q
       |  JOIN embeddings c ON q.vec_id <> c.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(cos, 6) AS cos_sim FROM (
       |  SELECT vec_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sim) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val q = broadcast(e.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("embedding").as("emb_q")))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_c"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("emb_q"), col("emb_c")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  // ---- SRP-LSH bucketed ANN (q45) ----

  /** Bucket-bit count for the REGISTERED q45 (fixed so the oracle hash is
    * stable). At scale, bits is the tuning knob: buckets = 2^bits, and the
    * within-bucket exact-cosine join is O(n²/2^bits) expected work — grow
    * bits with the corpus (bits ≈ log2(n/targetBucketSize)) so bucket
    * population stays bounded. [[srpBucket]] takes bits as a parameter;
    * ScaleSpec asserts the bucket count actually grows with it.
    */
  private val SrpBits = 6
  private val SrpC1 = 2654435761L
  private val SrpC2 = 2246822519L
  /** Deterministic signed pseudo-random hyperplane component w(k,j),
    * computed identically in both engines from integer arithmetic (no
    * stored plane matrix — the plane is a formula).
    */
  private def srpW(k: Int, j: String): String =
    s"(($k*64 + $j) * $SrpC1 + $SrpC2) % $P - 500000003"

  private def srpBucketSql(bits: Int, suffixL: String): String =
    (0 until bits).map { k =>
      val dot = s"aggregate(sequence(1, size(embedding)), 0D, (acc, j) -> " +
        s"acc + CAST(element_at(embedding, j) AS DOUBLE) * CAST(${srpW(k, "j")}$suffixL AS DOUBLE))"
      s"(CASE WHEN $dot >= 0 THEN ${1 << k} ELSE 0 END)"
    }.mkString(" + ")

  /** Parametric SRP bucket id over an `embedding` column: the sign bits of
    * `bits` deterministic hyperplane dot products packed into an int.
    */
  def srpBucket(bits: Int): Column = {
    require(bits >= 1 && bits <= 30, s"srp bits out of range: $bits")
    expr(srpBucketSql(bits, "L"))
  }

  private def srpBucketOracle: String =
    (0 until SrpBits).map { k =>
      val dot = s"list_reduce(list_transform(range(1, len(embedding)+1), " +
        s"j -> CAST(embedding[j] AS DOUBLE) * CAST(${srpW(k, "j")} AS DOUBLE)), (x,y) -> x+y)"
      s"(CASE WHEN $dot >= 0 THEN ${1 << k} ELSE 0 END)"
    }.mkString(" + ")

  /** q45: sign-random-projection LSH ANN — each vector hashed to a
    * 6-bit bucket by the signs of 6 deterministic hyperplane dot
    * products; candidates are bucket-mates (equi-join), exact cosine
    * ranks top-3. The third ANN tier: q44 brute-force (exact baseline),
    * q30 IVF cells (coarse partition), q45 SRP buckets (no partition
    * column needed — the hash IS the partitioner, and at scale the
    * bucket count grows with data by adding bits).
    */
  private val q45 = GraftQuery(
    "q45_srp_lsh_ann",
    s"""WITH b AS (
       |  SELECT vec_id, embedding, $srpBucketOracle AS bucket FROM embeddings
       |), sim AS (
       |  SELECT a.vec_id AS vec_id, bb.vec_id AS neighbor_id,
       |    ${cosSql("a", "bb")} AS cos
       |  FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id <> bb.vec_id
       |)
       |SELECT vec_id, neighbor_id, rank, round(cos, 6) AS cos_sim FROM (
       |  SELECT vec_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sim) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    // fence: bucket is referenced by both join sides — without the
    // exchange the 6 hyperplane dot products recompute per reference
    val b = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        srpBucket(SrpBits).as("bucket"))
      .repartition(col("vec_id"))
    val l = b.select(col("vec_id"), col("bucket"), col("embedding").as("emb_a"))
    val r = b.select(col("vec_id").as("neighbor_id"), col("bucket").as("bucket_r"),
      col("embedding").as("emb_b"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("neighbor_id"))
    l.join(r, col("bucket") === col("bucket_r") && col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** q78: per-vector int8 quantization audit — the scale, RMSE, max
    * absolute error, and relative error of symmetric int8 quantization
    * (q = clamp(floor(x/s + 0.5), ±127), s = max|x|/127) for every
    * embedding. Quantization is the 4× storage/shuffle lever for the ANN
    * tiers (q30/q44/q45/q71); this audit is what makes serving quantized
    * vectors safe — a pipeline gates on rel_err before swapping the
    * float32 index out. One codegen kernel pass per row
    * ([[graft.functions.Int8QuantKernel]]), map-only until the output sort.
    */
  private val q78 = GraftQuery(
    "q78_embedding_quantize",
    """WITH s1 AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |s2 AS (
      |  SELECT vec_id, v,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(v, x -> abs(x))),
      |      (a,b) -> greatest(a,b)) AS mx
      |  FROM s1),
      |s3 AS (
      |  SELECT vec_id, v, mx / 127.0 AS scale,
      |    CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS ss
      |  FROM s2),
      |s4 AS (
      |  SELECT vec_id, scale,
      |    list_transform(v, x -> x - least(greatest(floor(x / ss + 0.5), -127.0), 127.0) * ss) AS errs,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(v, x -> x*x)),
      |      (a,b) -> a+b) AS vn2
      |  FROM s3),
      |s5 AS (
      |  SELECT vec_id, scale,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(errs, e -> e*e)),
      |      (a,b) -> a+b) AS err2,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(errs, e -> abs(e))),
      |      (a,b) -> greatest(a,b)) AS maxae,
      |    vn2, len(errs) AS n
      |  FROM s4)
      |SELECT vec_id, round(scale, 6) AS qscale,
      |  round(CASE WHEN n = 0 THEN 0.0 ELSE sqrt(err2 / n) END, 6) AS rmse,
      |  round(maxae, 6) AS max_abs_err,
      |  round(CASE WHEN vn2 = 0 THEN 0.0 ELSE sqrt(err2)/sqrt(vn2) END, 6) AS rel_err
      |FROM s5 ORDER BY vec_id""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    // stats computed ONCE per row; the 4 extractions reference the shared
    // alias (multi-referenced non-cheap producer stays un-inlined — the
    // q53/q26 CollapseProject shape PlanSpec pins)
    Tables.embeddings(s, d)
      .select(col("vec_id"), VectorFunctions.int8QuantStats(col("embedding")).as("qs"))
      .select(col("vec_id"),
        round(element_at(col("qs"), 1), 6).as("qscale"),
        round(element_at(col("qs"), 2), 6).as("rmse"),
        round(element_at(col("qs"), 3), 6).as("max_abs_err"),
        round(element_at(col("qs"), 4), 6).as("rel_err"))
      .orderBy("vec_id")
  }

  /** q79: measured recall@3 of the SRP-LSH tier against brute-force
    * ground truth, per query vector — the quality dial that makes the
    * ANN tiering an engineering decision instead of a hope. Ground truth
    * is q44's bounded-batch exact top-3; the approximate side is q45's
    * bucketed search restricted to the same batch. Both ranks break ties
    * identically (cos desc, neighbor_id), so recall is deterministic and
    * oracle-gateable. At scale this runs on a sampled query batch — the
    * standard recall-regression probe after any re-bucketing (more SRP
    * bits, re-trained IVF cells) — at the cost of one brute-force pass
    * over the SAMPLE, never the corpus.
    *
    * Reading the number: this fixture's embeddings are near-isotropic
    * random vectors, so with 6 SRP bits each query sees ~1.6% of the
    * corpus as candidates and measured recall@3 is accordingly low
    * (~0.04) — the honest statement that random data has no locality
    * for LSH to exploit. On real embedding manifolds (which cluster),
    * the same audit is what justifies the bucketed tier; either way the
    * decision is now measured, not assumed.
    */
  private val q79 = GraftQuery(
    "q79_ann_recall",
    s"""WITH b AS (
       |  SELECT vec_id, embedding, $srpBucketOracle AS bucket FROM embeddings
       |), $truthOracle, asim AS (
       |  SELECT a.vec_id AS vec_id, bb.vec_id AS neighbor_id,
       |    ${cosSql("a", "bb")} AS cos
       |  FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id <> bb.vec_id
       |  WHERE a.vec_id < $QueryBatch
       |), approx AS (
       |  SELECT vec_id, neighbor_id FROM (
       |    SELECT vec_id, neighbor_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |    FROM asim) t WHERE rank <= 3
       |)
       |SELECT t.vec_id AS vec_id, CAST(count(ap.neighbor_id) AS BIGINT) AS n_hits,
       |  round(CAST(count(ap.neighbor_id) AS DOUBLE) / CAST(3 AS DOUBLE), 6) AS recall_at_3
       |FROM truth t LEFT JOIN approx ap
       |  ON t.vec_id = ap.vec_id AND t.neighbor_id = ap.neighbor_id
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val truth = bruteForceTruth(e)
    // approximate side: q45's SRP buckets, probe side restricted to the
    // same batch (same fence: bucket referenced by both join sides)
    val b = e.select(col("vec_id"), col("embedding"),
        srpBucket(SrpBits).as("bucket"))
      .repartition(col("vec_id"))
    val l = b.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("bucket"), col("embedding").as("emb_a"))
    val r = b.select(col("vec_id").as("neighbor_id"),
      col("bucket").as("bucket_r"), col("embedding").as("emb_b"))
    val approx = rankTop3(l.join(r,
        col("bucket") === col("bucket_r") && col("vec_id") =!= col("neighbor_id")))
      .select(col("vec_id"), col("neighbor_id"), lit(1).as("hit"))
    truth.join(approx, Seq("vec_id", "neighbor_id"), "left")
      .groupBy("vec_id")
      .agg(count(col("hit")).as("n_hits"))
      .select(col("vec_id"), col("n_hits"),
        round(col("n_hits").cast("double") / lit(3.0), 6).as("recall_at_3"))
      .orderBy("vec_id")
  }

  /** q82: quantized k-NN TRUTH TIER — neighbors ranked by cosine on the
    * int8 CODES (the [[graft.functions.Int8QuantCosineKernel]]
    * scale-cancellation identity: integer dot products, one double
    * division), label-blocked ALL-PAIRS like q30, with the float cosine
    * alongside so every returned neighbor carries its own approximation
    * error. Classification (VERDICT r14): this is an OFFLINE
    * quantization-quality audit, not a serving path — the label blocks
    * are corpus-fraction-sized, so the pair join is quadratic within
    * each block by design (the exhaustive ground truth q78's safety
    * audit and the code-ranking serving tiers are judged against). The
    * quantized SERVING tiers are q84 (cell-pruned code search), q87
    * (code-ranked rerank) and q106 (PQ product search); run q82 at
    * audit cadence, never per-query.
    */
  private val q82 = GraftQuery(
    "q82_quantized_knn",
    s"""WITH qv AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |sv AS (
      |  SELECT vec_id, label, v,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(v, x -> abs(x))),
      |      (a,b) -> greatest(a,b)) AS mx
      |  FROM qv),
      |cv AS (
      |  SELECT vec_id, label, v,
      |    list_transform(v, x -> CAST(least(greatest(floor(x / (CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END) + 0.5), -127.0), 127.0) AS BIGINT)) AS q
      |  FROM sv),
      |nv AS (
      |  SELECT vec_id, label, v, q,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(q, x -> x * x)), (a,b) -> a+b) AS nq
      |  FROM cv),
      |sim AS (
      |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(1, len(a.q)+1), i -> a.q[i] * b.q[i])), (x,y) -> x+y) AS DOUBLE)
      |      / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) AS qcos,
      |    ${cosSql("a", "b", "v")} AS cos
      |  FROM nv a JOIN nv b ON a.label = b.label AND a.vec_id <> b.vec_id
      |  WHERE a.nq > 0 AND b.nq > 0)
      |SELECT vec_id, neighbor_id, rank, round(qcos, 6) AS qcos_sim, round(cos, 6) AS cos_sim FROM (
      |  SELECT vec_id, neighbor_id, qcos, cos,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY qcos DESC, neighbor_id) AS rank
      |  FROM sim) t
      |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id"), col("label"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("neighbor_id"), col("label").as("label_b"),
      col("embedding").as("emb_b"))
    val w = Window.partitionBy("vec_id").orderBy(col("qcos").desc, col("neighbor_id"))
    a.join(b, col("label") === col("label_b") && col("vec_id") =!= col("neighbor_id"))
      .withColumn("qcos", VectorFunctions.int8QuantCosine(col("emb_a"), col("emb_b")))
      // degenerate pairs (zero code vector → null qcos) are EXCLUDED, not
      // ranked-last: the oracle's nq > 0 guard drops the same pairs, and
      // NULLS-LAST vs NaN-first ordering would otherwise diverge
      .where(col("qcos").isNotNull)
      .withColumn("cos", VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rank"),
        round(col("qcos"), 6).as("qcos_sim"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** Mean recall@3 of p-probe IVF search over the bounded query batch —
    * the recall-vs-p curve behind q83's two fixed points, exposed so
    * ScaleSpec can pin monotonicity (more probes never lose neighbors)
    * and the p=1 ≡ single-probe degeneracy.
    */
  private[operators] def multiProbeRecall(s: SparkSession, d: String, p: Int): Double = {
    VectorFunctions.register(s)
    val (c1, a2) = kmTrained(s, d)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val truth = bruteForceTruth(e)
    val cand = a2.select(col("vec_id").as("neighbor_id"),
      col("cell").as("cell_b"), col("embedding").as("emb_b"))
    val probes = probeSelection(e.where(col("vec_id") < QueryBatch), c1, p)
    val approx = rankTop3(probes.join(cand,
        col("probe_cell") === col("cell_b") && col("vec_id") =!= col("neighbor_id")))
      .select(col("vec_id"), col("neighbor_id"), lit(1).as("hit"))
    truth.join(approx, Seq("vec_id", "neighbor_id"), "left")
      .agg(avg(when(col("hit").isNotNull, 1.0).otherwise(0.0)).as("r"))
      .head.getDouble(0)
  }

  /** Mean recall@3 of searching ONLY each query's assigned cell (q71's
    * shape, batch-restricted) — the value [[multiProbeRecall]] at p=1
    * must reproduce exactly, since the nearest probe cell IS the
    * assigned cell under the same (dist, cell) tie-break.
    */
  private[operators] def singleProbeRecall(s: SparkSession, d: String): Double = {
    VectorFunctions.register(s)
    val (_, a2) = kmTrained(s, d)
    val truth = bruteForceTruth(Tables.embeddings(s, d).select("vec_id", "embedding"))
    val sa = a2.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("cell"), col("embedding").as("emb_a"))
    val sb = a2.select(col("vec_id").as("neighbor_id"),
      col("cell").as("cell_b"), col("embedding").as("emb_b"))
    val approx = rankTop3(sa.join(sb,
        col("cell") === col("cell_b") && col("vec_id") =!= col("neighbor_id")))
      .select(col("vec_id"), col("neighbor_id"), lit(1).as("hit"))
    truth.join(approx, Seq("vec_id", "neighbor_id"), "left")
      .agg(avg(when(col("hit").isNotNull, 1.0).otherwise(0.0)).as("r"))
      .head.getDouble(0)
  }

  /** q84: quantized IVF k-NN served from the MATERIALIZED int8 index —
    * the assembled production tier the audits (q78 safety, q82 identity,
    * q83 probe recall) justify: train the coarse quantizer (shared
    * [[kmTrained]]), quantize every assignment ONCE into the stored
    * [[kmQuantized]] artifact, select each query's [[ProbeP]] nearest
    * trained cells, and rank candidates by integer cosine on the STORED
    * codes. Both sides of the candidate join read (code, nq) from the
    * quantized index — the float embeddings never ride any join
    * (PlanSpec pins exactly that), which is the 4× shuffle/storage
    * reduction q82 only simulated in-kernel. Each per-pair evaluation is
    * an integer multiply-accumulate over 1-byte codes + one double
    * division (sqrt of the two STORED norms) — no re-quantization, no
    * float reads.
    */
  /** Oracle tail shared by q84 (full-corpus probes) and q105 (bounded
    * batch served cold from the written index): int8-quantize every
    * trained assignment, rank probed candidates by integer cosine on the
    * codes — callers prepend `kmOracleTrain` and a `probes` CTE.
    */
  private val int8QuantOracleTail: String = int8QuantOracleTailWhere("")

  /** [[int8QuantOracleTail]] with an extra predicate on the candidate
    * side of the sim join (`b`) — q110 injects the tombstone mask there.
    * The zero-arg value above keeps q84/q105's oracle text byte-identical.
    */
  private def int8QuantOracleTailWhere(bExtra: String): String =
    int8QuantOracleTailFrom("a2", bExtra)

  /** [[int8QuantOracleTailWhere]] over an arbitrary assignment CTE —
    * q145 quantizes the UPSERTED assignment `a2u`; the two-arg delegate
    * keeps every existing oracle's text byte-identical.
    */
  /** The int8 code-table CTE prefix (`qv`→`nv`, ending at
    * nv(vec_id, cell, q, nq)) — shared by [[int8QuantOracleTailFrom]]
    * and the q275 rank-fidelity oracle.
    */
  private def int8CodesOracle(src: String): String =
    s"""qv AS (
       |  SELECT vec_id, cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM $src),
       |sv AS (
       |  SELECT vec_id, cell, v,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(v, x -> abs(x))),
       |      (a,b) -> greatest(a,b)) AS mx
       |  FROM qv),
       |cv AS (
       |  SELECT vec_id, cell,
       |    list_transform(v, x -> CAST(least(greatest(floor(x / (CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END) + 0.5), -127.0), 127.0) AS BIGINT)) AS q
       |  FROM sv),
       |nv AS (
       |  SELECT vec_id, cell, q,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(q, x -> x * x)), (a,b) -> a+b) AS nq
       |  FROM cv)""".stripMargin

  private def int8QuantOracleTailFrom(src: String, bExtra: String): String =
    s"""${int8CodesOracle(src)},
       |sim AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range(1, len(a.q)+1), i -> a.q[i] * b.q[i])), (x,y) -> x+y) AS DOUBLE)
       |      / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) AS qcos
       |  FROM probes p
       |  JOIN nv a ON p.vec_id = a.vec_id
       |  JOIN nv b ON p.cell = b.cell AND p.vec_id <> b.vec_id
       |  WHERE a.nq > 0 AND b.nq > 0$bExtra)
       |SELECT vec_id, neighbor_id, rank, round(qcos, 6) AS qcos_sim FROM (
       |  SELECT vec_id, neighbor_id, qcos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY qcos DESC, neighbor_id) AS rank
       |  FROM sim) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin

  private val q84 = GraftQuery(
    "q84_quantized_ivf",
    s"""WITH $kmOracleTrain, ${probesOracle("")},
       |$int8QuantOracleTail""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val qidx = kmQuantized(s, d)
    val probes = corpusProbes(s, d).select("vec_id", "probe_cell")
    val qa = qidx.select(col("vec_id"), col("code").as("code_a"), col("nq").as("nq_a"))
    val qb = qidx.select(col("vec_id").as("neighbor_id"), col("cell").as("cell_b"),
      col("code").as("code_b"), col("nq").as("nq_b"))
    val w = Window.partitionBy("vec_id").orderBy(col("qcos").desc, col("neighbor_id"))
    probes.join(qa, "vec_id")
      .join(qb, col("probe_cell") === col("cell_b") && col("vec_id") =!= col("neighbor_id"))
      .where(col("nq_a") > 0 && col("nq_b") > 0)
      .withColumn("qcos",
        VectorFunctions.int8CodeDot(col("code_a"), col("code_b")).cast("double") /
          (sqrt(col("nq_a").cast("double")) * sqrt(col("nq_b").cast("double"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rank"),
        round(col("qcos"), 6).as("qcos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** Shortlist size for q87's two-stage serving chain: the quantized tier
    * over-fetches M candidates per query, the float tier re-ranks only
    * those M. M ≫ k (here 10 ≫ 3) is the standard headroom that lets the
    * cheap integer stage absorb quantization rank-flips without the
    * expensive stage ever touching more than M rows per query.
    */
  private val RerankM = 10

  /** q87: the COMPLETE production serving chain — quantized shortlist →
    * exact float re-rank: probe the [[ProbeP]] nearest trained cells,
    * rank candidates by integer cosine on the STORED codes (q84's join:
    * 1 byte/dim, no float arrays), keep the top [[RerankM]] per query,
    * and only then fetch the float embeddings — two narrow id equi-joins
    * against the corpus, M rows per query instead of a cell's worth —
    * for the exact cosine that orders the final top-3. This is the
    * two-stage retrieval architecture every production int8 ANN deploys:
    * the 4×-smaller quantized index does the heavy candidate pruning,
    * full precision touches only the shortlist. The expensive float
    * rerank is O(M) per query REGARDLESS of cell width — the quantized
    * stage is the only thing that scans candidates.
    */
  /** Oracle for the two-stage quantized-shortlist → float-rerank chain,
    * parameterized by a metadata predicate: `labelJoins` adds the
    * metadata lookups to the shortlist candidate join, `labelPred` the
    * predicate itself — both empty for the unfiltered chain (q87),
    * populated for the filtered one (q108). Callers prepend
    * `kmOracleTrain` and a `probes` CTE.
    */
  private def quantRerankOracle(labelJoins: String, labelPred: String): String =
    s"""qv AS (
       |  SELECT vec_id, cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM a2),
       |sv AS (
       |  SELECT vec_id, cell, v,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(v, x -> abs(x))),
       |      (a,b) -> greatest(a,b)) AS mx
       |  FROM qv),
       |cv AS (
       |  SELECT vec_id, cell,
       |    list_transform(v, x -> CAST(least(greatest(floor(x / (CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END) + 0.5), -127.0), 127.0) AS BIGINT)) AS q
       |  FROM sv),
       |nv AS (
       |  SELECT vec_id, cell, q,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(q, x -> x * x)), (a,b) -> a+b) AS nq
       |  FROM cv),
       |qsim AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range(1, len(a.q)+1), i -> a.q[i] * b.q[i])), (x,y) -> x+y) AS DOUBLE)
       |      / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE))) AS qcos
       |  FROM probes p
       |  JOIN nv a ON p.vec_id = a.vec_id
       |  JOIN nv b ON p.cell = b.cell AND p.vec_id <> b.vec_id$labelJoins
       |  WHERE a.nq > 0 AND b.nq > 0$labelPred),
       |short AS (
       |  SELECT vec_id, neighbor_id FROM (
       |    SELECT vec_id, neighbor_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY qcos DESC, neighbor_id) AS rq
       |    FROM qsim) t
       |  WHERE rq <= $RerankM),
       |rer AS (
       |  SELECT s.vec_id AS vec_id, s.neighbor_id AS neighbor_id,
       |    ${cosSql("qa", "qb")} AS cos
       |  FROM short s
       |  JOIN embeddings qa ON qa.vec_id = s.vec_id
       |  JOIN embeddings qb ON qb.vec_id = s.neighbor_id)
       |SELECT vec_id, neighbor_id, rank, round(cos, 6) AS cos_sim FROM (
       |  SELECT vec_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM rer) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin

  /** The two-stage serving chain shared by q87 (unfiltered) and q108
    * (`sameLabel = true`): quantized shortlist over the probed cells —
    * with the metadata predicate, when present, riding the CANDIDATE
    * join against the labeled index ([[kmQuantizedLabeled]]), pre-rank,
    * so the shortlist itself is filtered and the float tier still
    * touches only [[RerankM]] rows per query — then exact float re-rank
    * via two id equi-joins. Exposed for PlanSpec (the label-in-join and
    * codes-only-payload pins).
    */
  private[operators] def quantShortlistRerank(s: SparkSession, d: String,
      sameLabel: Boolean): DataFrame = {
    VectorFunctions.register(s)
    val probes = corpusProbes(s, d).select("vec_id", "probe_cell")
    val qidx = if (sameLabel) kmQuantizedLabeled(s, d) else kmQuantized(s, d)
    val aCols = Seq(col("vec_id"), col("code").as("code_a"), col("nq").as("nq_a")) ++
      (if (sameLabel) Seq(col("label").as("label_a")) else Nil)
    val bCols = Seq(col("vec_id").as("neighbor_id"), col("cell").as("cell_b"),
      col("code").as("code_b"), col("nq").as("nq_b")) ++
      (if (sameLabel) Seq(col("label").as("label_b")) else Nil)
    val qa = qidx.select(aCols: _*)
    val qb = qidx.select(bCols: _*)
    val baseCond = col("probe_cell") === col("cell_b") &&
      col("vec_id") =!= col("neighbor_id")
    val cond = if (sameLabel) baseCond && col("label_a") === col("label_b")
               else baseCond
    val wq = Window.partitionBy("vec_id").orderBy(col("qcos").desc, col("neighbor_id"))
    val short = probes.join(qa, "vec_id")
      .join(qb, cond)
      .where(col("nq_a") > 0 && col("nq_b") > 0)
      .withColumn("qcos",
        VectorFunctions.int8CodeDot(col("code_a"), col("code_b")).cast("double") /
          (sqrt(col("nq_a").cast("double")) * sqrt(col("nq_b").cast("double"))))
      .withColumn("rq", row_number().over(wq))
      .where(col("rq") <= RerankM)
      .select("vec_id", "neighbor_id")
    // float arrays enter ONLY here — M rows per query, two id equi-joins
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val ea = e.select(col("vec_id"), col("embedding").as("emb_a"))
    val eb = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_b"))
    rankTop3(short.join(ea, "vec_id").join(eb, "neighbor_id"))
  }

  private val q87 = GraftQuery(
    "q87_quantized_rerank",
    s"""WITH $kmOracleTrain, ${probesOracle("")},
       |${quantRerankOracle("", "")}""".stripMargin) { (s, d) =>
    quantShortlistRerank(s, d, sameLabel = false)
  }

  /** q108: FILTERED ANN through the QUANTIZED tier — q103's metadata
    * predicate composed with q87's two-stage serving chain, the way a
    * production store actually filters: the label is a STORED column of
    * the quantized index ([[kmQuantizedLabeled]] — joined once at
    * index-build time, never per query), the predicate rides the
    * shortlist's candidate join pre-rank (a post-filtered shortlist
    * would starve queries whose near neighbors are mostly other-label),
    * and the float tier still touches exactly [[RerankM]] rows per
    * query. Completes the filtered-retrieval story: q103 filters the
    * exact float tier, this filters the compressed serving tier.
    */
  private val q108 = GraftQuery(
    "q108_filtered_rerank",
    s"""WITH $kmOracleTrain, ${probesOracle("")},
       |${quantRerankOracle(
            "\n  JOIN embeddings la ON la.vec_id = p.vec_id" +
              "\n  JOIN embeddings lb ON lb.vec_id = b.vec_id",
            " AND la.label = lb.label")}""".stripMargin) { (s, d) =>
    quantShortlistRerank(s, d, sameLabel = true)
  }

  /** q83: the multi-probe recall lever, measured — per query vector,
    * recall@3 of single-probe IVF (q71: search only your own trained
    * cell) next to multi-probe IVF (q72: probe the [[ProbeP]] nearest
    * cells), both against brute-force ground truth on the bounded query
    * batch. On this fixture the lift is ~0.43 → ~0.69: boundary
    * neighbors sit just across the cell wall, and probing the next cell
    * recovers them at ≤ p× the candidate work. With q79 (SRP tier) this
    * completes the measured ANN dashboard — every tier's
    * recall/candidate-cost point is a number, not a claim, and the cost
    * of the measurement is one brute-force pass over the SAMPLE.
    */
  private val q83 = GraftQuery(
    "q83_ivf_recall",
    s"""WITH $kmOracleTrain, $truthOracle, ssim AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    ${cosSql("a", "b")} AS cos
       |  FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |  WHERE a.vec_id < $QueryBatch
       |), single AS (
       |  SELECT vec_id, neighbor_id FROM (
       |    SELECT vec_id, neighbor_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |    FROM ssim) t WHERE rank <= 3
       |), ${probesOracle(s"\n    WHERE e.vec_id < $QueryBatch")}, msim AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    ${cosSql("p", "b")} AS cos
       |  FROM probes p JOIN a2 b ON p.cell = b.cell AND p.vec_id <> b.vec_id
       |), multi AS (
       |  SELECT vec_id, neighbor_id FROM (
       |    SELECT vec_id, neighbor_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |    FROM msim) t WHERE rank <= 3
       |)
       |SELECT t.vec_id AS vec_id,
       |  CAST(count(s.neighbor_id) AS BIGINT) AS n_hits_single,
       |  CAST(count(m.neighbor_id) AS BIGINT) AS n_hits_multi,
       |  round(CAST(count(s.neighbor_id) AS DOUBLE) / CAST(3 AS DOUBLE), 6) AS recall_single,
       |  round(CAST(count(m.neighbor_id) AS DOUBLE) / CAST(3 AS DOUBLE), 6) AS recall_multi
       |FROM truth t
       |LEFT JOIN single s ON t.vec_id = s.vec_id AND t.neighbor_id = s.neighbor_id
       |LEFT JOIN multi m ON t.vec_id = m.vec_id AND t.neighbor_id = m.neighbor_id
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val (c1, a2) = kmTrained(s, d)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val truth = bruteForceTruth(e)
    // single-probe: q71's in-cell search, probe side restricted to the batch
    val sa = a2.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("cell"), col("embedding").as("emb_a"))
    val sb = a2.select(col("vec_id").as("neighbor_id"),
      col("cell").as("cell_b"), col("embedding").as("emb_b"))
    val single = rankTop3(sa.join(sb,
        col("cell") === col("cell_b") && col("vec_id") =!= col("neighbor_id")))
      .select(col("vec_id"), col("neighbor_id"), lit(1).as("hit_s"))
    // multi-probe: q72's probe selection, restricted to the batch
    val probes = probeSelection(e.where(col("vec_id") < QueryBatch), c1)
    val multi = rankTop3(probes.join(sb,
        col("probe_cell") === col("cell_b") && col("vec_id") =!= col("neighbor_id")))
      .select(col("vec_id"), col("neighbor_id"), lit(1).as("hit_m"))
    truth
      .join(single, Seq("vec_id", "neighbor_id"), "left")
      .join(multi, Seq("vec_id", "neighbor_id"), "left")
      .groupBy("vec_id")
      .agg(count(col("hit_s")).as("n_hits_single"),
        count(col("hit_m")).as("n_hits_multi"))
      .select(col("vec_id"), col("n_hits_single"), col("n_hits_multi"),
        round(col("n_hits_single").cast("double") / lit(3.0), 6).as("recall_single"),
        round(col("n_hits_multi").cast("double") / lit(3.0), 6).as("recall_multi"))
      .orderBy("vec_id")
  }

  // ---- product quantization: per-subspace codebooks + ADC search (q91) ----

  private val PqM = 4
  require(KmDim % PqM == 0,
    s"PQ subspaces must tile the embedding exactly: KmDim=$KmDim % PqM=$PqM != 0 " +
      "(a remainder would silently drop trailing dimensions from every code)")
  private val PqSubDim = KmDim / PqM
  private val PqK = 16

  /** PRODUCTION sizing: M=8 subspaces × k=256 centroids — the standard
    * billion-scale operating point (log2(256) = 8 bits = exactly one
    * byte per subspace, so a vector's code is an 8-byte binary against
    * 256 B of float32: 32× compression). The fixture constants above
    * keep the registered default cheap; q106/q107 run THIS point, with
    * [[graft.functions.PackCodes]] storing the genuine 1-byte/subspace
    * form. On the 500-vector fixture k=256 is deliberately overfit
    * (≈2 vectors/cell) — the point is exercising the production shapes
    * (byte-packed codes, 2048-entry LUTs) under the oracle gate, and the
    * measured recall is the curve's saturation end (ScaleSpec pins it
    * above every fixture-sized point).
    */
  private[operators] val PqMProd = 8
  private[operators] val PqKProd = 256

  /** Subspace width for an M-subspace split, with the same divisibility
    * guard the fixture constants carry: a non-tiling M would silently
    * drop trailing dimensions from every code.
    */
  private def pqSubDim(mm: Int): Int = {
    require(KmDim % mm == 0,
      s"PQ subspaces must tile the embedding exactly: KmDim=$KmDim % M=$mm != 0")
    KmDim / mm
  }

  /** The trained PQ index per (session, dir): per-subspace codebooks
    * (`m, cell, cen`) and per-vector codes (`vec_id, m, cell`) —
    * [[PqM]] independent k-means runs (k = [[PqK]], q56's exact
    * deterministic Lloyd recipe) over the [[PqSubDim]]-dim slices of the
    * embedding. The stored code is [[PqM]] small ints per vector — at
    * production sizing (M=8..16 subspaces, k=256 → one byte per
    * subspace) that is 8-16 B/vector against 256 B of float32, the 16-32×
    * compression that lets a shard's whole code table sit in memory.
    * Same artifact contract as [[kmTrained]]: persisted once, shared by
    * every caller, released via `Artifacts.release(session)`.
    */
  /** `k` is the per-subspace codebook size — the PQ quality/compression
    * lever (larger k = finer cells = higher ADC fidelity at log2(k) bits
    * per subspace). Default [[PqK]] is the registered-query setting; the
    * artifact is keyed by (dir, k) so differently-sized indexes coexist.
    * ScaleSpec pins that recall@3 improves with k on the fixture.
    */
  private[operators] def pqTrained(s: SparkSession, d: String,
      k: Int = PqK, mm: Int = PqM): (DataFrame, DataFrame) =
    graft.Artifacts.cached[(DataFrame, DataFrame)](s, s"pq_index:$d:k=$k:m=$mm") {
      pqTrainOn(Tables.embeddings(s, d).select("vec_id", "embedding"), k, mm)
    }

  /** The per-subspace training body shared by the raw-vector index
    * ([[pqTrained]]) and the residual index ([[pqResTrained]]): `e` is
    * any (vec_id, embedding: array&lt;float&gt;) table — the recipe does
    * not care whether the floats are raw coordinates or coarse-centroid
    * residuals.
    */
  private def pqTrainOn(e: DataFrame,
      k: Int, mm: Int = PqM): ((DataFrame, DataFrame), () => Unit) = {
    val sd = pqSubDim(mm)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val parts = (0 until mm).map { m =>
      val sub = e.select(col("vec_id"),
        slice(col("embedding"), m * sd + 1, sd).as("embedding"))
      val c0 = sub.where(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("cell"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cen"))
      // persist each codebook: it is referenced by BOTH the final assign
      // (codes) and the serving-side LUT build — without the pin each
      // reference re-runs the whole recompute pipeline (the q71 lesson)
      val c1 = kmRecompute(kmAssign(sub, c0)).persist(lvl)
      val a2 = kmAssign(sub, c1)
      (c1.select(lit(m).as("m"), col("cell"), col("cen")),
        a2.select(col("vec_id"), lit(m).as("m"), col("cell")), c1)
    }
    // leaves (Artifacts.leafDf scaladoc); the eager checkpoint is the
    // artifact's one materialization, after which the per-subspace
    // scaffolding persists can go immediately
    val (cents, relCents) = graft.Artifacts.leafDf(parts.map(_._1).reduce(_.union(_)))
    val (codes, relCodes) = graft.Artifacts.leafDf(parts.map(_._2).reduce(_.union(_)))
    parts.foreach(_._3.unpersist(blocking = false))
    ((cents, codes), () => { relCents(); relCodes() })
  }

  /** Coarse-centroid residuals, stored at float32: every trained
    * assignment's `x − centroid(cell(x))`, the quantity IVFADC encodes
    * instead of the raw vector. The double subtraction is narrowed back
    * to float (one IEEE round-to-nearest, identical in both engines and
    * the production storage width), which keeps every downstream kernel
    * contract — slices, Lloyd training, the (float, double) L2 kernel —
    * byte-for-byte the same as the raw path's.
    */
  private[operators] def residuals(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.checkpointedDf(s, s"pq_residuals:$d") {
      val (c1, a2) = kmTrained(s, d)
      a2.join(broadcast(c1), "cell")
        .select(col("vec_id"), col("cell"),
          expr("CAST(zip_with(embedding, cen, (x, c) -> CAST(x AS DOUBLE) - c)" +
            " AS array<float>)").as("embedding"))
    }

  /** The RESIDUAL PQ index (IVFADC's fine quantizer): [[pqTrainOn]]'s
    * exact recipe over [[residuals]] instead of raw embeddings. Residuals
    * concentrate around 0 once the coarse quantizer has absorbed the
    * between-cell structure, so the same (M, k) codebook budget spends
    * its cells on a tighter distribution — the measured recall lift over
    * raw-vector codes is ScaleSpec's residual-vs-raw audit and q102.
    */
  /** `k`/`mm` select the sizing like [[pqTrained]]'s — the fixture
    * defaults serve q101/q102; q146/q147 train the production point
    * (M=[[PqMProd]], k=[[PqKProd]]) over the same residuals.
    */
  private[operators] def pqResTrained(s: SparkSession, d: String,
      k: Int = PqK, mm: Int = PqM): (DataFrame, DataFrame) =
    graft.Artifacts.cached[(DataFrame, DataFrame)](s, s"pqres_index:$d:k=$k:m=$mm") {
      pqTrainOn(residuals(s, d).select("vec_id", "embedding"), k, mm)
    }

  /** Oracle twin of one subspace's training: q56's CTE recipe over the
    * `[off+1, off+PqSubDim]` slice. Emits `c1_m` (trained codebook) and
    * `a2_m` (final assignment = the subspace code).
    */
  private def pqOracleSubDist(emb: String, cen: String, off: Int,
      sd: Int = PqSubDim): String =
    s"list_reduce(list_transform(range(1, $sd+1), j -> " +
      s"(CAST($emb[$off+j] AS DOUBLE) - $cen[j]) * (CAST($emb[$off+j] AS DOUBLE) - $cen[j])), (x,y) -> x+y)"

  private def pqOracleTrain(m: Int): String = pqOracleTrainFrom("embeddings", m, "")

  /** The same per-subspace training CTEs over an arbitrary source table
    * (raw `embeddings` or the `remb` residual CTE), with CTE names
    * prefixed by `p` so both chains can coexist in one oracle query.
    * `mm`/`k` select the sizing (defaults are the fixture constants; the
    * production point passes M=[[PqMProd]], k=[[PqKProd]]).
    */
  // `k` is SQL text so callers can pass either a literal codebook size
  // (the PQ tiers' fixture/production constants) or a corpus-sized
  // scalar subquery (q354's IMI half-quantizer, [[KImiSql]])
  private def pqOracleTrainFrom(src: String, m: Int, p: String,
      mm: Int = PqM, k: String = PqK.toString): String = {
    val sd = pqSubDim(mm)
    val off = m * sd
    s"""${p}c0_$m AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell,
       |    list_transform(range(1, $sd+1), j -> CAST(embedding[$off+j] AS DOUBLE)) AS cen
       |  FROM $src WHERE vec_id < $k),
       |${p}a1_$m AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${pqOracleSubDist("e.embedding", "c.cen", off, sd)}, c.cell) AS rn
       |    FROM $src e CROSS JOIN ${p}c0_$m c) t WHERE rn = 1),
       |${p}c1d_$m AS (
       |  SELECT a.cell, j,
       |    list_reduce(list(CAST(e.embedding[$off+j] AS DOUBLE) ORDER BY e.vec_id), (x,y) -> x+y)
       |      / count(*) AS mean_j
       |  FROM ${p}a1_$m a JOIN $src e ON a.vec_id = e.vec_id
       |  CROSS JOIN range(1, $sd+1) t(j)
       |  GROUP BY a.cell, j),
       |${p}c1_$m AS (SELECT cell, list(mean_j ORDER BY j) AS cen FROM ${p}c1d_$m GROUP BY cell),
       |${p}a2_$m AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${pqOracleSubDist("e.embedding", "c.cen", off, sd)}, c.cell) AS rn
       |    FROM $src e CROSS JOIN ${p}c1_$m c) t WHERE rn = 1)""".stripMargin
  }

  /** q91: PQ-ADC top-3 search — asymmetric distance computation over the
    * stored PQ codes. Per query vector, the distance to each subspace
    * codebook centroid is computed ONCE into a [[PqM]]·[[PqK]]-entry
    * lookup table; every database vector's approximate distance is then
    * the order-pinned sum of [[PqM]] LUT entries selected by its stored
    * code — the float embeddings of the database side never participate.
    *
    * Scale shape: the LUT is (queries × M·k) rows — broadcast-sized by
    * construction (k and M are index constants; a 1000-query batch at
    * production M=16, k=256 is 4M tiny rows). The candidate join is an
    * equi-join of the code table (n·M narrow int rows, the 16-32×
    * compressed artifact) against that broadcast on (m, cell); the
    * per-pair fold then collapses map-side (partial collect_list), so the
    * exchange carries ~one row per (query, vector) pair of 8 ints. This
    * is the PQ serving model: a linear scan of in-memory codes with LUT
    * adds — here expressed as join + partial agg so Spark distributes the
    * scan. Composes with IVF (q84's probe pruning) into IVF-PQ: restrict
    * the code scan to probed cells before the LUT join.
    *
    * Determinism: LUT distances are the same left-to-right slice kernel
    * both engines fold (q56's argument per subspace); the ADC sum is an
    * ORDER-PINNED fold over m, never a shuffle-order float sum; ranking
    * ties break on neighbor_id.
    */
  /** The ADC search core shared by q91 (the search) and q92 (its recall
    * audit): (qid, neighbor_id, rank, adc) for the query batch, rank ≤ 3
    * by order-pinned ADC sum with neighbor_id tie-break.
    */
  /** The query batch's ADC lookup table: (qid, m, cell, dd) — one slice
    * distance per (query, subspace, codebook centroid). Broadcast-sized
    * by construction (|batch| · M · k rows).
    */
  private def pqLut(e: DataFrame, cents: DataFrame, mm: Int = PqM): DataFrame = {
    val sd = pqSubDim(mm)
    (0 until mm).map { m =>
      e.where(col("vec_id") < QueryBatch)
        .select(col("vec_id").as("qid"),
          slice(col("embedding"), m * sd + 1, sd).as("qsub"))
        .crossJoin(broadcast(cents.where(col("m") === m).select(col("cell"), col("cen"))))
        .select(col("qid"), lit(m).as("m"), col("cell"),
          VectorFunctions.l2DistSq(col("qsub"), col("cen")).as("dd"))
    }.reduce(_.union(_))
  }

  /** The ADC join + order-pinned fold + top-3 ranking shared by every
    * flat-scan ADC tier: `codes` is any (vec_id, m, cell) long-form code
    * table (the in-session artifact, or [[pqProdPacked]]'s byte string
    * unpacked back to join keys), `lut` a [[pqLut]]-shaped broadcast.
    */
  private def adcRank(codes: DataFrame, lut: DataFrame): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("neighbor_id"))
    codes
      .join(broadcast(lut), Seq("m", "cell"))
      .where(col("vec_id") =!= col("qid"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .groupBy(col("qid"), col("neighbor_id"))
      .agg(sort_array(collect_list(struct(col("m"), col("dd")))).as("dds"))
      .select(col("qid"), col("neighbor_id"),
        expr("aggregate(dds, 0D, (acc, s) -> acc + s.dd)").as("adc"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
  }

  /** A session artifact: the ranked table is shared verbatim by the
    * search query (q91) and its recall audit (q92, [[pqMeanRecall]]), so
    * the ADC join + fold executes once per (session, dir, k) instead of
    * once per consumer. ~|batch|·3 rows; released via `Artifacts.release`.
    */
  private def pqAdcTop3(s: SparkSession, d: String, k: Int = PqK,
      mm: Int = PqM): DataFrame =
    graft.Artifacts.checkpointedDf(s, s"pq_adc_top3:$d:k=$k:m=$mm") {
      pqAdcTop3Plan(s, d, k, mm)
    }

  /** The un-checkpointed plan behind [[pqAdcTop3]] — PlanSpec pins the
    * codes-vs-LUT join shape here, where the joins are visible (the
    * registered queries read the materialized leaf).
    */
  private[operators] def pqAdcTop3Plan(s: SparkSession, d: String,
      k: Int = PqK, mm: Int = PqM): DataFrame = {
      VectorFunctions.register(s)
      val (cents, codes) = pqTrained(s, d, k, mm)
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      adcRank(codes, pqLut(e, cents, mm))
  }

  /** The PACKED production code table: one row per vector, the whole
    * M-subspace code a single [[PqMProd]]-byte `binary` via
    * [[graft.functions.PackCodes]] — the genuine 1-byte/subspace
    * production layout (k=256 fills the byte exactly), 32× smaller than
    * the float row it encodes. This is the form a 100 TB deployment
    * stores and shuffles; q106 serves FROM it, unpacking to (m, cell)
    * join keys at scan time, so the oracle gate covers the pack→store→
    * unpack→serve round trip, not just the long-form codes.
    */
  private[operators] def pqProdPacked(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.cachedDf(s, s"pq_prod_packed:$d") {
      VectorFunctions.register(s)
      val (_, codes) = pqTrained(s, d, PqKProd, PqMProd)
      codes.groupBy("vec_id")
        .agg(sort_array(collect_list(struct(col("m"), col("cell")))).as("mc"))
        .select(col("vec_id"),
          VectorFunctions.packCodes(expr("transform(mc, s -> s.cell)")).as("pqb"))
    }

  /** The production-sized ADC plan behind q106: [[pqLut]] at (M=8,
    * k=256) — a 2048-entry LUT per query, still broadcast-sized — joined
    * against [[pqProdPacked]]'s byte strings unpacked to (m, cell). The
    * unpack is a codegen kernel + `posexplode`, the exact read path a
    * stored binary code column serves through. Exposed for PlanSpec.
    */
  private[operators] def pqProdAdcPlan(s: SparkSession, d: String): DataFrame = {
    VectorFunctions.register(s)
    val (cents, _) = pqTrained(s, d, PqKProd, PqMProd)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val codes = pqProdPacked(s, d)
      .select(col("vec_id"),
        posexplode(VectorFunctions.unpackCodes(col("pqb"))).as(Seq("m", "cell")))
    adcRank(codes, pqLut(e, cents, PqMProd))
  }

  /** Session artifact over [[pqProdAdcPlan]], shared by q106 and the
    * q107 recall audit — the same search-result reuse q91/q92 have.
    */
  private def pqProdTop3(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.checkpointedDf(s, s"pq_prod_top3:$d") {
      pqProdAdcPlan(s, d)
    }

  /** Oracle twin of [[pqAdcTop3]] minus the per-subspace training CTEs
    * (callers prepend those): codes → lut → adc → ranked. `mm` selects
    * the sizing (default = the fixture constants; q106/q107 pass
    * [[PqMProd]] — the codebook size rides in via the training CTEs).
    */
  private def pqAdcOracleFor(mm: Int): String = {
    val sd = pqSubDim(mm)
    s"""codes AS (
       |  ${(0 until mm).map(m => s"SELECT vec_id, $m AS m, cell FROM a2_$m")
            .mkString("\n  UNION ALL ")}),
       |lut AS (
       |  ${(0 until mm).map(m =>
            s"""SELECT e.vec_id AS qid, $m AS m, c.cell,
               |    ${pqOracleSubDist("e.embedding", "c.cen", m * sd, sd)} AS dd
               |  FROM embeddings e CROSS JOIN c1_$m c WHERE e.vec_id < $QueryBatch"""
              .stripMargin).mkString("\n  UNION ALL ")}),
       |adc AS (
       |  SELECT l.qid, co.vec_id AS neighbor_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(l.dd ORDER BY l.m)),
       |      (acc, x) -> acc + x) AS adc
       |  FROM codes co JOIN lut l ON co.m = l.m AND co.cell = l.cell
       |  WHERE co.vec_id <> l.qid
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT qid, neighbor_id, adc, rank FROM (
       |    SELECT qid, neighbor_id, adc,
       |      row_number() OVER (PARTITION BY qid ORDER BY adc, neighbor_id) AS rank
       |    FROM adc) t
       |  WHERE rank <= 3)""".stripMargin
  }

  private val q91 = GraftQuery(
    "q91_pq_adc_search",
    s"""WITH ${(0 until PqM).map(pqOracleTrain).mkString(",\n")},
       |${pqAdcOracleFor(PqM)}
       |SELECT qid AS vec_id, neighbor_id, rank, round(adc, 6) AS adc_dist
       |FROM ranked ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    pqAdcTop3(s, d)
      .select(col("qid").as("vec_id"), col("neighbor_id"), col("rank"),
        round(col("adc"), 6).as("adc_dist"))
      .orderBy("vec_id", "rank")
  }

  /** q92: PQ recall audit — score [[pqAdcTop3]]'s top-3 against the EXACT
    * L2 top-3 (the metric PQ approximates; the cosine truth of q79/q83
    * audits the cosine tiers). Same shape as q83: truth is a bounded-batch
    * BNLJ, the audit is two id-joins and a count — the honest price of
    * knowing the compressed index's quality before switching serving to
    * it. The recall number is what calibrates the production (M, k)
    * choice against this corpus.
    */
  /** Exact L2 top-3 for the bounded query batch — the metric PQ
    * approximates (the cosine truth of q79/q83 audits the cosine tiers).
    * A session artifact: the bounded-batch BNLJ is paid once and shared
    * by every L2 audit (q92, q102, the ScaleSpec recall measurements) —
    * the same amortization the cosine `bruteForceTruth` already has.
    * Released via `Artifacts.release(session)`.
    */
  private def l2Top3Truth(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.checkpointedDf(s, s"l2_truth:$d") {
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val qb = broadcast(e.where(col("vec_id") < QueryBatch))
      val all = e.select(col("vec_id").as("neighbor_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embd"))
      val wt = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("neighbor_id"))
      qb.join(all, col("vec_id") =!= col("neighbor_id"))
        .withColumn("dist", VectorFunctions.l2DistSq(col("embedding"), col("embd")))
        .withColumn("rank", row_number().over(wt))
        .where(col("rank") <= 3)
        .select(col("vec_id"), col("neighbor_id"))
    }

  /** Mean recall@3 of the k-codebook ADC tier against exact-L2 truth —
    * the measurement behind the ScaleSpec recall-vs-k pin and the
    * number a production (M, k) choice is calibrated on.
    */
  private[operators] def pqMeanRecall(s: SparkSession, d: String, k: Int,
      mm: Int = PqM): Double = {
    VectorFunctions.register(s)
    val truth = l2Top3Truth(s, d)
    val hits = pqAdcTop3(s, d, k, mm)
      .select(col("qid").as("vec_id"), col("neighbor_id"))
    truth.join(hits, Seq("vec_id", "neighbor_id"), "left_semi").count().toDouble /
      truth.count().toDouble
  }

  /** The exact-L2-truth CTE + per-query hit-count tail shared by every
    * ADC recall-audit oracle (q92 fixture sizing, q107 production
    * sizing): score `ranked` (the prepended ADC chain's output) against
    * the brute-force L2 top-3 of the bounded batch.
    */
  private def pqRecallOracleTail: String = pqRecallOracleTailOn("ranked")

  /** [[pqRecallOracleTail]] scoring an arbitrary ranked CTE — the
    * residual chains emit `rranked` (q147); the delegate keeps the
    * raw-chain consumers' text byte-identical.
    */
  private def pqRecallOracleTailOn(ranked: String): String =
    s"""l2truth AS (
       |  SELECT vec_id, neighbor_id FROM (
       |    SELECT q.vec_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_reduce(list_transform(range(1, $KmDim+1), j ->
       |          (CAST(q.embedding[j] AS DOUBLE) - CAST(c.embedding[j] AS DOUBLE))
       |          * (CAST(q.embedding[j] AS DOUBLE) - CAST(c.embedding[j] AS DOUBLE))),
       |          (x,y) -> x+y), c.vec_id) AS rank
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) q
       |    JOIN embeddings c ON q.vec_id <> c.vec_id) t
       |  WHERE rank <= 3)
       |SELECT t.vec_id AS vec_id,
       |  CAST(count(r.neighbor_id) AS BIGINT) AS n_hits,
       |  round(CAST(count(r.neighbor_id) AS DOUBLE) / CAST(3 AS DOUBLE), 6) AS recall
       |FROM l2truth t
       |LEFT JOIN $ranked r ON t.vec_id = r.qid AND t.neighbor_id = r.neighbor_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The engine-side recall audit shared by q92/q107: per-query hit
    * count of `hits` (an ADC top-3 table) against [[l2Top3Truth]].
    */
  private def pqRecallAudit(s: SparkSession, d: String,
      hits: DataFrame): DataFrame = {
    VectorFunctions.register(s)
    l2Top3Truth(s, d)
      .join(hits.select(col("qid").as("vec_id"), col("neighbor_id"),
        lit(1).as("hit")), Seq("vec_id", "neighbor_id"), "left")
      .groupBy("vec_id")
      .agg(count(col("hit")).as("n_hits"))
      .select(col("vec_id"), col("n_hits"),
        round(col("n_hits").cast("double") / lit(3.0), 6).as("recall"))
      .orderBy("vec_id")
  }

  private val q92 = GraftQuery(
    "q92_pq_recall",
    s"""WITH ${(0 until PqM).map(pqOracleTrain).mkString(",\n")},
       |${pqAdcOracleFor(PqM)},
       |$pqRecallOracleTail""".stripMargin) { (s, d) =>
    pqRecallAudit(s, d, pqAdcTop3(s, d))
  }

  /** q106: PRODUCTION-sized PQ-ADC search — q91's serving shape at the
    * billion-scale operating point (M=[[PqMProd]] subspaces,
    * k=[[PqKProd]] centroids: one byte per subspace, 32× compression),
    * served FROM the byte-packed code table ([[pqProdPacked]]): the
    * stored form is an 8-byte `binary` per vector, unpacked to (m, cell)
    * join keys at scan time by the [[graft.functions.UnpackCodes]]
    * kernel. The oracle gate therefore covers pack → store → unpack →
    * LUT-join → fold end-to-end at production sizing — codes are genuine
    * bytes, LUTs are the real 2048-entry tables, and both stay
    * broadcast-sized exactly as the q91 scaladoc's scale argument says.
    */
  private val q106 = GraftQuery(
    "q106_pq_prod_search",
    s"""WITH ${(0 until PqMProd)
          .map(m => pqOracleTrainFrom("embeddings", m, "", PqMProd, PqKProd.toString))
          .mkString(",\n")},
       |${pqAdcOracleFor(PqMProd)}
       |SELECT qid AS vec_id, neighbor_id, rank, round(adc, 6) AS adc_dist
       |FROM ranked ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    pqProdTop3(s, d)
      .select(col("qid").as("vec_id"), col("neighbor_id"), col("rank"),
        round(col("adc"), 6).as("adc_dist"))
      .orderBy("vec_id", "rank")
  }

  /** q107: the recall audit at PRODUCTION sizing — q92's measurement for
    * q106's index, completing the recall-vs-(M, k) curve with the point
    * a deployment would actually run (the fixture points are the cheap
    * end; ScaleSpec pins this end above all of them). Same truth
    * artifact, same audit shape — only the hits table changes.
    */
  private val q107 = GraftQuery(
    "q107_pq_prod_recall",
    s"""WITH ${(0 until PqMProd)
          .map(m => pqOracleTrainFrom("embeddings", m, "", PqMProd, PqKProd.toString))
          .mkString(",\n")},
       |${pqAdcOracleFor(PqMProd)},
       |$pqRecallOracleTail""".stripMargin) { (s, d) =>
    pqRecallAudit(s, d, pqProdTop3(s, d))
  }

  /** q93: IVF-PQ — the two index families composed into the standard
    * billion-scale serving shape: the TRAINED coarse quantizer
    * ([[kmTrained]], q71's artifact) prunes the candidate set to the
    * query's [[ProbeP]] nearest cells, and the PQ code table
    * ([[pqTrained]], q91's artifact) ranks those candidates by ADC —
    * so the scan is (probed fraction of corpus) × (M LUT adds), with
    * float vectors appearing ONLY in the probe selection and LUT build.
    * At 100 TB with the index written via [[writeIvfIndex]]-style
    * partitioning, the probe is a partition-pruned read of code columns.
    *
    * Production IVF-PQ encodes RESIDUALS (x − coarse centroid) for
    * tighter codebooks; here the codes quantize the raw vectors — one
    * code artifact serves both q91's flat scan and this composed tier,
    * and the kernel contract stays (float array, double codebook). The
    * recall cost of skipping residuals is visible in q92's audit.
    */
  private val q93 = GraftQuery(
    "q93_ivfpq_search",
    s"""WITH $kmOracleTrain, ${(0 until PqM).map(pqOracleTrain).mkString(",\n")},
       |${pqAdcOracleFor(PqM)},
       |${probesOracle(s"\n    WHERE e.vec_id < $QueryBatch")},
       |cand AS (
       |  SELECT p.vec_id AS qid, a.vec_id AS neighbor_id
       |  FROM probes p JOIN a2 a ON a.cell = p.cell AND a.vec_id <> p.vec_id),
       |iadc AS (
       |  SELECT c.qid, c.neighbor_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(l.dd ORDER BY l.m)),
       |      (acc, x) -> acc + x) AS adc
       |  FROM cand c
       |  JOIN codes co ON co.vec_id = c.neighbor_id
       |  JOIN lut l ON l.qid = c.qid AND l.m = co.m AND l.cell = co.cell
       |  GROUP BY 1, 2)
       |SELECT qid AS vec_id, neighbor_id, rank, round(adc, 6) AS adc_dist FROM (
       |  SELECT qid, neighbor_id, adc,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc, neighbor_id) AS rank
       |  FROM iadc) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val (c1, a2) = kmTrained(s, d)
    val (cents, codes) = pqTrained(s, d)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val probes = probeCells(e.where(col("vec_id") < QueryBatch), c1, ProbeP)
    val cand = probes
      .join(a2.select(col("vec_id").as("neighbor_id"), col("cell")),
        col("probe_cell") === col("cell") && col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id").as("qid"), col("neighbor_id"))
    val lut = pqLut(e, cents)
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("neighbor_id"))
    cand
      .join(codes.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(lut), Seq("qid", "m", "cell"))
      .groupBy(col("qid"), col("neighbor_id"))
      .agg(sort_array(collect_list(struct(col("m"), col("dd")))).as("dds"))
      .select(col("qid"), col("neighbor_id"),
        expr("aggregate(dds, 0D, (acc, s) -> acc + s.dd)").as("adc"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("qid").as("vec_id"), col("neighbor_id"), col("rank"),
        round(col("adc"), 6).as("adc_dist"))
      .orderBy("vec_id", "rank")
  }

  // ---- incremental index append: frozen codebooks, new shard (q94) ----

  /** 0-9 shard bucket from the shared LCG (q58's split constants): buckets
    * 0-7 are the BASE corpus the index was trained on, 8-9 the newly
    * arrived shard.
    */
  private[graft] def shardBucket(c: Column): Column =
    Pipeline.lcg(c, Pipeline.SplitA, Pipeline.SplitC) % 10
  private val shardBucketSql =
    s"(${Pipeline.lcgSql("vec_id", Pipeline.SplitA, Pipeline.SplitC)}) % 10"

  /** Index trained ONLY on the base shard — the frozen artifact an append
    * job loads: the coarse quantizer (one Lloyd pass over base) and the
    * [[PqM]] PQ codebooks (same recipe per subspace). Seeds stay the
    * global first-k vectors (init is an arbitrary constant; only the
    * Lloyd averages must exclude the new shard).
    */
  private[operators] def frozenBaseIndex(s: SparkSession, d: String): (DataFrame, DataFrame) =
    graft.Artifacts.cached[(DataFrame, DataFrame)](s, s"frozen_base_index:$d") {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val base = e.where(shardBucket(col("vec_id")) < 8)
      val c0 = e.where(col("vec_id") < kmK(s, d))
        .select(col("vec_id").cast("int").as("cell"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cen"))
      val c1b = kmRecompute(kmAssign(base, c0)).persist(lvl)
      val seeds = e.where(col("vec_id") < PqK)
      val parts = (0 until PqM).map { m =>
        val off = m * PqSubDim
        val baseSub = base.select(col("vec_id"),
          slice(col("embedding"), off + 1, PqSubDim).as("embedding"))
        val c0m = seeds.select(col("vec_id").cast("int").as("cell"),
          expr(s"transform(slice(embedding, ${off + 1}, $PqSubDim), x -> CAST(x AS DOUBLE))")
            .as("cen"))
        val c1m = kmRecompute(kmAssign(baseSub, c0m)).persist(lvl)
        (c1m.select(lit(m).as("m"), col("cell"), col("cen")), c1m)
      }
      val cents = parts.map(_._1).reduce(_.union(_)).persist(lvl)
      ((c1b, cents), () => {
        c1b.unpersist(blocking = true)
        parts.foreach(_._2.unpersist(blocking = true))
        cents.unpersist(blocking = true)
        ()
      })
    }

  /** One subspace's base-restricted codebook training for the q94 oracle:
    * global seeds, Lloyd averages over `base` only.
    */
  private def pqOracleTrainOnBase(m: Int): String = {
    val off = m * PqSubDim
    s"""pb0_$m AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell,
       |    list_transform(range(1, $PqSubDim+1), j -> CAST(embedding[$off+j] AS DOUBLE)) AS cen
       |  FROM embeddings WHERE vec_id < $PqK),
       |pa1_$m AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT b.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY b.vec_id
       |        ORDER BY ${pqOracleSubDist("b.embedding", "c.cen", off)}, c.cell) AS rn
       |    FROM base b CROSS JOIN pb0_$m c) t WHERE rn = 1),
       |pc1d_$m AS (
       |  SELECT a.cell, j,
       |    list_reduce(list(CAST(b.embedding[$off+j] AS DOUBLE) ORDER BY b.vec_id), (x,y) -> x+y)
       |      / count(*) AS mean_j
       |  FROM pa1_$m a JOIN base b ON a.vec_id = b.vec_id
       |  CROSS JOIN range(1, $PqSubDim+1) t(j)
       |  GROUP BY a.cell, j),
       |pc1_$m AS (SELECT cell, list(mean_j ORDER BY j) AS cen FROM pc1d_$m GROUP BY cell)"""
      .stripMargin
  }

  /** The frozen codebooks COLLECTED to driver-side literals — the
    * routing/codebook tables an append job ships to every task (coarse:
    * k cells × dim doubles; PQ: M codebooks × k cells × subdim — a few
    * hundred KB at production sizing, the metadata an index writer holds
    * in memory). Collected once per (session, dir) and memoized, exactly
    * like q105's probed-cell routing list.
    */
  private def frozenCollected(s: SparkSession, d: String)
      : (Seq[(Int, Seq[Double])], Seq[(Int, Seq[(Int, Seq[Double])])]) =
    graft.Artifacts.cached[(Seq[(Int, Seq[Double])],
        Seq[(Int, Seq[(Int, Seq[Double])])])](s, s"frozen_collected:$d") {
      val (c1b, cents) = frozenBaseIndex(s, d)
      val coarse = c1b.select(col("cell"), col("cen")).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
      val cbs = cents.select(col("m"), col("cell"), col("cen")).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (m, rs) =>
          (m, rs.map(t => (t._2, t._3)).sortBy(_._1).toSeq) }
      ((coarse, cbs), () => ())
    }

  /** The frozen-codebook assign+encode as a STATELESS MAP over any
    * (vec_id, embedding) frame — batch (q94) or streaming (q109): the
    * collected codebooks ([[frozenCollected]]) ride the plan as
    * literals, each row's coarse cell and per-subspace codes are
    * `array_min` argmins over them (the same (distance, cell)
    * lexicographic tie-break `kmAssign`'s `min_by` uses), and NO shuffle
    * or state is involved — an append job's throughput scales with
    * arrival rate, never corpus size, and the identical transform runs
    * under Structured Streaming append mode unmodified.
    */
  private[graft] def frozenAssignEncode(s: SparkSession, d: String,
      rows: DataFrame): DataFrame = {
    VectorFunctions.register(s)
    val (coarseArr, cbArr) = frozenCollected(s, d)
    val scored = transform(typedLit(coarseArr), c => struct(
      VectorFunctions.l2DistSq(col("embedding"), c.getField("_2")).as("d"),
      c.getField("_1").as("cell")))
    val codes = transform(typedLit(cbArr), cb => struct(
      cb.getField("_1").as("m"),
      array_min(transform(cb.getField("_2"), c => struct(
        VectorFunctions.l2DistSq(
          slice(col("embedding"),
            cb.getField("_1") * lit(PqSubDim) + lit(1), lit(PqSubDim)),
          c.getField("_2")).as("d"),
        c.getField("_1").as("cell")))).getField("cell").as("pq_code")))
    rows
      .withColumn("coarse_cell", array_min(scored).getField("cell"))
      .select(col("vec_id"), col("coarse_cell"), explode(codes).as("c"))
      .select(col("vec_id"), col("coarse_cell"),
        col("c.m").as("m"), col("c.pq_code").as("pq_code"))
  }

  /** q94's oracle, shared verbatim by its streaming twin q109 (the
    * stream==batch gate): frozen-codebook training over base, assignment
    * + encoding of the new shard.
    */
  private[graft] val indexAppendOracle: String =
    s"""WITH base AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE $shardBucketSql < 8),
       |nw AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE $shardBucketSql >= 8),
       |cb0 AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cen
       |  FROM embeddings WHERE vec_id < $KmKSql),
       |${kmOracleAssignFrom("base", "cb0", "ab1")},
       |${kmOracleRecompute("ab1", "cb1")},
       |${kmOracleAssignFrom("nw", "cb1", "coarse")},
       |${(0 until PqM).map(pqOracleTrainOnBase).mkString(",\n")},
       |pq AS (
       |  ${(0 until PqM).map { m =>
            s"""SELECT vec_id, $m AS m, cell AS pq_code FROM (
               |    SELECT n.vec_id, c.cell,
               |      row_number() OVER (PARTITION BY n.vec_id
               |        ORDER BY ${pqOracleSubDist("n.embedding", "c.cen", m * PqSubDim)}, c.cell) AS rn
               |    FROM nw n CROSS JOIN pc1_$m c) t WHERE rn = 1"""
              .stripMargin }.mkString("\n  UNION ALL ")})
       |SELECT p.vec_id AS vec_id, co.cell AS coarse_cell, p.m AS m, p.pq_code AS pq_code
       |FROM pq p JOIN coarse co ON p.vec_id = co.vec_id
       |ORDER BY vec_id, m""".stripMargin

  /** q94: incremental index append — the maintenance operation a living
    * 100 TB corpus needs between retrains: a newly arrived shard (the
    * 8-9 LCG buckets, ~20%) is coarse-assigned and PQ-encoded against
    * codebooks FROZEN on the base corpus (0-7 buckets), emitting exactly
    * the rows an index writer appends to the stored partitions
    * (vec_id, coarse cell, per-subspace code). No training touches the
    * new rows, and since round 10 no SHUFFLE either: the encode is
    * [[frozenAssignEncode]]'s literal-codebook map (previously each
    * assignment paid a `min_by` aggregation exchange), so appends scale
    * with shard size, never corpus size — and the identical transform is
    * q109's streaming ingest. Retraining cadence is then a drift
    * decision, audited by q92's recall gauge.
    */
  private val q94 = GraftQuery("q94_index_append", indexAppendOracle) { (s, d) =>
    val nw = Tables.embeddings(s, d).select("vec_id", "embedding")
      .where(shardBucket(col("vec_id")) >= 8)
    frozenAssignEncode(s, d, nw).orderBy("vec_id", "m")
  }

  // ---- residual IVF-PQ (IVFADC proper): encode x − centroid (q101/q102) ----

  /** Oracle CTEs for the residual chain, appended after `kmOracleTrain`
    * and `probes`: float residuals (`remb`) → per-subspace residual
    * codebooks (`rc*`/`ra2_*`) → the per-(query, probe-cell) LUT
    * (`rlut`) → probed candidates ranked by residual ADC (`rranked`).
    * Query residuals narrow to FLOAT exactly like [[residuals]] does, so
    * both engines square the same float32 values.
    */
  private def residualOracleChain: String =
    residualOracleChainFor(PqM, PqK)

  /** [[residualOracleChain]] at an arbitrary (M, k) sizing — the
    * fixture-default delegate keeps q101/q102's oracle text byte-
    * identical; q146/q147 instantiate the production point.
    */
  private def residualOracleChainFor(mm: Int, k: Int): String = {
    val sd = pqSubDim(mm)
    val remb =
      s"""remb AS (
         |  SELECT a.vec_id,
         |    list_transform(range(1, $KmDim+1), j ->
         |      CAST(CAST(a.embedding[j] AS DOUBLE) - c.cen[j] AS FLOAT)) AS embedding
         |  FROM a2 a JOIN c1 c ON a.cell = c.cell)""".stripMargin
    val train =
      (0 until mm).map(m => pqOracleTrainFrom("remb", m, "r", mm, k.toString)).mkString(",\n")
    val rcodes =
      s"""rcodes AS (
         |  ${(0 until mm).map(m => s"SELECT vec_id, $m AS m, cell FROM ra2_$m")
              .mkString("\n  UNION ALL ")})""".stripMargin
    def qresEl(off: Int) =
      s"CAST(CAST(p.embedding[$off+j] AS DOUBLE) - k.cen[$off+j] AS FLOAT)"
    val rlut =
      s"""rlut AS (
         |  ${(0 until mm).map { m =>
              val off = m * sd
              s"""SELECT p.vec_id AS qid, p.cell AS pcell, $m AS m, rc.cell,
                 |    list_reduce(list_transform(range(1, $sd+1), j ->
                 |      (CAST(${qresEl(off)} AS DOUBLE) - rc.cen[j])
                 |      * (CAST(${qresEl(off)} AS DOUBLE) - rc.cen[j])),
                 |      (x,y) -> x+y) AS dd
                 |  FROM probes p JOIN c1 k ON p.cell = k.cell CROSS JOIN rc1_$m rc"""
                .stripMargin }.mkString("\n  UNION ALL ")})""".stripMargin
    val adc =
      s"""rcand AS (
         |  SELECT p.vec_id AS qid, a.vec_id AS neighbor_id, p.cell AS pcell
         |  FROM probes p JOIN a2 a ON a.cell = p.cell AND a.vec_id <> p.vec_id),
         |radc AS (
         |  SELECT c.qid, c.neighbor_id,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(l.dd ORDER BY l.m)),
         |      (acc, x) -> acc + x) AS adc
         |  FROM rcand c
         |  JOIN rcodes co ON co.vec_id = c.neighbor_id
         |  JOIN rlut l ON l.qid = c.qid AND l.pcell = c.pcell
         |    AND l.m = co.m AND l.cell = co.cell
         |  GROUP BY 1, 2),
         |rranked AS (
         |  SELECT qid, neighbor_id, adc, rank FROM (
         |    SELECT qid, neighbor_id, adc,
         |      row_number() OVER (PARTITION BY qid ORDER BY adc, neighbor_id) AS rank
         |    FROM radc) t
         |  WHERE rank <= 3)""".stripMargin
    Seq(remb, train, rcodes, rlut, adc).mkString(",\n")
  }

  /** The residual serving core shared by q101 (the search) and q102 (its
    * recall audit): probed candidates ranked top-3 by residual ADC.
    */
  private def residualAdcTop3(s: SparkSession, d: String,
      k: Int = PqK, mm: Int = PqM): DataFrame =
    graft.Artifacts.checkpointedDf(s, s"residual_top3:$d:k=$k:m=$mm") {
      residualAdcTop3Plan(s, d, k, mm)
    }

  /** The un-cached plan behind [[residualAdcTop3]] — q101 and q102 both
    * consume the identical ~|batch|·3-row ranked table, so it is a
    * session artifact (measured: the serving chain alone re-executes in
    * ~5-7 s per consumer at fixture scale purely from its stage count;
    * sharing pays it once). Released via `Artifacts.release`.
    */
  private[operators] def residualAdcTop3Plan(s: SparkSession, d: String,
      k: Int = PqK, mm: Int = PqM): DataFrame = {
    VectorFunctions.register(s)
    val sd = pqSubDim(mm)
    val (c1, a2) = kmTrained(s, d)
    val (rcents, rcodes) = pqResTrained(s, d, k, mm)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val probes = probeSelection(e.where(col("vec_id") < QueryBatch), c1, ProbeP)
    // query residual PER PROBED CELL (each probe subtracts that cell's
    // centroid), narrowed to float like the stored residuals
    val qres = probes
      .join(broadcast(c1.withColumnRenamed("cell", "probe_cell")), "probe_cell")
      .select(col("vec_id").as("qid"), col("probe_cell"),
        expr("CAST(zip_with(emb_a, cen, (x, c) -> CAST(x AS DOUBLE) - c)" +
          " AS array<float>)").as("qres"))
    val rlut = (0 until mm).map { m =>
      qres
        .select(col("qid"), col("probe_cell"),
          slice(col("qres"), m * sd + 1, sd).as("qsub"))
        .crossJoin(broadcast(
          rcents.where(col("m") === m).select(col("cell"), col("cen"))))
        .select(col("qid"), col("probe_cell"), lit(m).as("m"), col("cell"),
          VectorFunctions.l2DistSq(col("qsub"), col("cen")).as("dd"))
    }.reduce(_.union(_))
    val cand = probes.select(col("vec_id"), col("probe_cell"))
      .join(a2.select(col("vec_id").as("neighbor_id"), col("cell")),
        col("probe_cell") === col("cell") && col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id").as("qid"), col("neighbor_id"), col("probe_cell"))
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("neighbor_id"))
    cand
      .join(rcodes.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(rlut), Seq("qid", "probe_cell", "m", "cell"))
      .groupBy(col("qid"), col("neighbor_id"))
      .agg(sort_array(collect_list(struct(col("m"), col("dd")))).as("dds"))
      .select(col("qid"), col("neighbor_id"),
        expr("aggregate(dds, 0D, (acc, s) -> acc + s.dd)").as("adc"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
  }

  /** q101: residual IVF-PQ search — IVFADC as published: the coarse
    * quantizer absorbs between-cell structure, the PQ codebooks encode
    * the RESIDUAL x − centroid(cell(x)), and serving ranks probed
    * candidates by a per-(query, probe-cell) residual LUT. Against q93
    * (raw-vector codes, same coarse probes, same (M, k) budget) this is
    * the fidelity upgrade the q93 scaladoc deferred; ScaleSpec measures
    * the recall lift and q102 puts it under the oracle gate. Scale shape
    * is q93's: the LUT grows only by the probe factor (|batch|·p·M·k
    * rows, still broadcast-sized), candidates stay one equi-join, the
    * fold stays order-pinned, and floats appear only in probe selection
    * and LUT build — codes serve the join.
    */
  private val q101 = GraftQuery(
    "q101_residual_ivfpq",
    s"""WITH $kmOracleTrain, ${probesOracle(s"\n    WHERE e.vec_id < $QueryBatch")},
       |$residualOracleChain
       |SELECT qid AS vec_id, neighbor_id, rank, round(adc, 6) AS adc_dist
       |FROM rranked ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    residualAdcTop3(s, d)
      .select(col("qid").as("vec_id"), col("neighbor_id"), col("rank"),
        round(col("adc"), 6).as("adc_dist"))
      .orderBy("vec_id", "rank")
  }

  /** Mean recall@3 vs exact-L2 truth for any (qid, neighbor_id) top-3 —
    * the shared measurement behind the residual-vs-raw ScaleSpec audit.
    */
  private[operators] def adcMeanRecall(s: SparkSession, d: String,
      hits: DataFrame): Double = {
    VectorFunctions.register(s)
    val truth = l2Top3Truth(s, d)
    truth.join(hits.select(col("qid").as("vec_id"), col("neighbor_id")),
        Seq("vec_id", "neighbor_id"), "left_semi").count().toDouble /
      truth.count().toDouble
  }

  private[operators] def rawIvfpqTop3(s: SparkSession, d: String,
      k: Int = PqK, mm: Int = PqM): DataFrame = {
    // q93's core (probed candidates, RAW-vector ADC) re-expressed for the
    // recall comparison; (k, mm) select the sizing for the production
    // residual-vs-raw audit
    VectorFunctions.register(s)
    val (c1, a2) = kmTrained(s, d)
    val (cents, codes) = pqTrained(s, d, k, mm)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val probes = probeCells(e.where(col("vec_id") < QueryBatch), c1, ProbeP)
    val cand = probes
      .join(a2.select(col("vec_id").as("neighbor_id"), col("cell")),
        col("probe_cell") === col("cell") && col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id").as("qid"), col("neighbor_id"))
    val lut = pqLut(e, cents, mm)
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("neighbor_id"))
    cand
      .join(codes.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(lut), Seq("qid", "m", "cell"))
      .groupBy(col("qid"), col("neighbor_id"))
      .agg(sort_array(collect_list(struct(col("m"), col("dd")))).as("dds"))
      .select(col("qid"), col("neighbor_id"),
        expr("aggregate(dds, 0D, (acc, s) -> acc + s.dd)").as("adc"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
  }

  /** q102: residual IVF-PQ recall audit — q92's shape over q101's tier:
    * exact-L2 top-3 truth (bounded batch) scored against the residual
    * ADC ranking. Registering the audit puts the IVFADC fidelity claim
    * itself under the driver's hash gate, alongside ScaleSpec's
    * residual-vs-raw comparison.
    */
  private val q102 = GraftQuery(
    "q102_residual_recall",
    s"""WITH $kmOracleTrain, ${probesOracle(s"\n    WHERE e.vec_id < $QueryBatch")},
       |$residualOracleChain,
       |l2truth AS (
       |  SELECT vec_id, neighbor_id FROM (
       |    SELECT q.vec_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_reduce(list_transform(range(1, $KmDim+1), j ->
       |          (CAST(q.embedding[j] AS DOUBLE) - CAST(c.embedding[j] AS DOUBLE))
       |          * (CAST(q.embedding[j] AS DOUBLE) - CAST(c.embedding[j] AS DOUBLE))),
       |          (x,y) -> x+y), c.vec_id) AS rank
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) q
       |    JOIN embeddings c ON q.vec_id <> c.vec_id) t
       |  WHERE rank <= 3)
       |SELECT t.vec_id AS vec_id,
       |  CAST(count(r.neighbor_id) AS BIGINT) AS n_hits,
       |  round(CAST(count(r.neighbor_id) AS DOUBLE) / CAST(3 AS DOUBLE), 6) AS recall
       |FROM l2truth t
       |LEFT JOIN rranked r ON t.vec_id = r.qid AND t.neighbor_id = r.neighbor_id
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val truth = l2Top3Truth(s, d)
    val hits = residualAdcTop3(s, d)
      .select(col("qid").as("vec_id"), col("neighbor_id"), lit(1).as("hit"))
    truth
      .join(hits, Seq("vec_id", "neighbor_id"), "left")
      .groupBy("vec_id")
      .agg(count(col("hit")).as("n_hits"))
      .select(col("vec_id"), col("n_hits"),
        round(col("n_hits").cast("double") / lit(3.0), 6).as("recall"))
      .orderBy("vec_id")
  }

  /** The production-sized residual serving artifact behind q146/q147 —
    * the same search-result reuse every (search, recall-audit) pair has.
    */
  private def residualProdTop3(s: SparkSession, d: String): DataFrame =
    residualAdcTop3(s, d, PqKProd, PqMProd)

  /** q146: residual IVF-PQ at PRODUCTION sizing — the actual IVFADC
    * deployment configuration: coarse quantizer + residual codebooks at
    * (M=[[PqMProd]], k=[[PqKProd]]), one byte of code per subspace over
    * the residual distribution. q101 proved the residual mechanism at
    * fixture sizing; q106 proved the production sizing over raw vectors;
    * this is their composition — the operating point a 100 TB vector
    * store would really run, under the same oracle gate. Scale shape is
    * q101's: the per-(query, probe-cell) LUT grows to |batch|·p·M·k rows
    * (still broadcast-sized — 2048 entries per (query, probe)), and
    * candidates carry codes, never floats.
    */
  private val q146 = GraftQuery(
    "q146_residual_prod_search",
    s"""WITH $kmOracleTrain, ${probesOracle(s"\n    WHERE e.vec_id < $QueryBatch")},
       |${residualOracleChainFor(PqMProd, PqKProd)}
       |SELECT qid AS vec_id, neighbor_id, rank, round(adc, 6) AS adc_dist
       |FROM rranked ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    residualProdTop3(s, d)
      .select(col("qid").as("vec_id"), col("neighbor_id"), col("rank"),
        round(col("adc"), 6).as("adc_dist"))
      .orderBy("vec_id", "rank")
  }

  /** q147: the recall audit at the IVFADC production point — the last
    * unmeasured entry on the recall-vs-(M, k) curve: q92 (raw, fixture),
    * q102 (residual, fixture), q107 (raw, production), and now residual
    * at production. ScaleSpec additionally pins residual ≥ raw at this
    * sizing, mirroring the fixture-sized pin.
    */
  private val q147 = GraftQuery(
    "q147_residual_prod_recall",
    s"""WITH $kmOracleTrain, ${probesOracle(s"\n    WHERE e.vec_id < $QueryBatch")},
       |${residualOracleChainFor(PqMProd, PqKProd)},
       |${pqRecallOracleTailOn("rranked")}""".stripMargin) { (s, d) =>
    pqRecallAudit(s, d, residualProdTop3(s, d))
  }

  /** q103: FILTERED ANN — vector search under a metadata predicate (the
    * "filtered retrieval" every production vector store exposes): each
    * batch query finds its top-3 cosine neighbors among vectors sharing
    * its `label`, searched through the trained multi-probe IVF cells.
    * The filter is applied to the CANDIDATES (inside the join), never to
    * the ranked output — post-filtering a top-k starves queries whose
    * neighbors are mostly other-label; pre-filtering keeps k results
    * whenever the probed cells contain k same-label vectors. The probe
    * width is [[FilteredProbeP]] (ProbeP × inverse filter selectivity):
    * with k ~ √n training a cell holds O(√n) rows, so a selective
    * predicate must widen the probe ring to keep the effective
    * candidate pool at the unfiltered tier's size.
    *
    * Scale note: the metadata column is MATERIALIZED on the index row
    * ([[kmTrainedLabeled]], built once per session — the same pattern
    * [[kmQuantizedLabeled]] uses for the compressed tier), so the filter
    * is a column comparison inside the candidate join with no
    * per-invocation metadata join.
    */
  private val q103 = GraftQuery(
    "q103_filtered_ann",
    s"""WITH $kmOracleTrain, ${probesOracleFrom("embeddings",
          s"\n    WHERE e.vec_id < $QueryBatch", FilteredProbeP)}, sim AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    ${cosSql("p", "b")} AS cos
       |  FROM probes p JOIN a2 b ON p.cell = b.cell AND p.vec_id <> b.vec_id
       |  JOIN embeddings lq ON lq.vec_id = p.vec_id
       |  JOIN embeddings lb ON lb.vec_id = b.vec_id
       |  WHERE lq.label = lb.label
       |)
       |SELECT vec_id, neighbor_id, rank, round(cos, 6) AS cos_sim FROM (
       |  SELECT vec_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sim) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    labeledFloatFiltered(s, d, sameLabel = true)
  }

  /** [[kmTrained]]'s assignments with the metadata column MATERIALIZED
    * on the index row — the float-tier analog of [[kmQuantizedLabeled]]:
    * the label joins once at artifact build, so each filtered serving
    * call (q103/q104) adds no per-invocation metadata join (closing the
    * r9 note that the label column rode a fresh join per query batch).
    */
  private[operators] def kmTrainedLabeled(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.cachedDf(s, s"ivf_trained_labeled:$d") {
      val (_, a2) = kmTrained(s, d)
      a2.join(Tables.embeddings(s, d).select("vec_id", "label"), "vec_id")
    }

  /** Shared engine for the filtered float tier: q103 (`sameLabel=true`)
    * and q104 (inverted predicate). Probes, queries, and candidates all
    * read the labeled index artifact; the predicate rides the candidate
    * join pre-rank.
    */
  private def labeledFloatFiltered(s: SparkSession, d: String,
      sameLabel: Boolean): DataFrame = {
    VectorFunctions.register(s)
    val (c1, _) = kmTrained(s, d)
    val idx = kmTrainedLabeled(s, d)
    val probes = probeSelection(
        idx.select(col("vec_id"), col("embedding"))
          .where(col("vec_id") < QueryBatch), c1, FilteredProbeP)
      .join(broadcast(idx.select(col("vec_id"), col("label"))
        .where(col("vec_id") < QueryBatch)), "vec_id")
    val cand = idx
      .select(col("vec_id").as("neighbor_id"), col("cell").as("cell_b"),
        col("embedding").as("emb_b"), col("label").as("label_b"))
    val base = col("probe_cell") === col("cell_b") &&
      col("vec_id") =!= col("neighbor_id")
    val cond = if (sameLabel) base && col("label") === col("label_b")
               else base && col("label") =!= col("label_b")
    rankTop3(probes.join(cand, cond))
  }

  /** q104: HARD-NEGATIVE mining — q103's machinery with the predicate
    * inverted: for each batch query, the top-3 most-similar vectors with
    * a DIFFERENT label. This is the negative sampler of contrastive
    * embedding training (high-cosine other-class vectors are the
    * gradient-bearing negatives); mining them through the probed IVF
    * cells instead of all-pairs is what makes the sampler affordable at
    * corpus scale. Same pre-rank join-borne predicate discipline as
    * q103 — a post-filter would starve queries whose cells are
    * same-label-dominated.
    */
  private val q104 = GraftQuery(
    "q104_hard_negatives",
    s"""WITH $kmOracleTrain, ${probesOracleFrom("embeddings",
          s"\n    WHERE e.vec_id < $QueryBatch", FilteredProbeP)}, sim AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    ${cosSql("p", "b")} AS cos
       |  FROM probes p JOIN a2 b ON p.cell = b.cell AND p.vec_id <> b.vec_id
       |  JOIN embeddings lq ON lq.vec_id = p.vec_id
       |  JOIN embeddings lb ON lb.vec_id = b.vec_id
       |  WHERE lq.label <> lb.label
       |)
       |SELECT vec_id, neighbor_id, rank, round(cos, 6) AS cos_sim FROM (
       |  SELECT vec_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sim) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    labeledFloatFiltered(s, d, sameLabel = false)
  }

  /** The cold-start serving plan behind q105, built ONLY from the files
    * under `base` ([[writeIvfIndex]]'s partitioned vectors +
    * [[writeIndexSidecar]]'s coarse centroids): no `graft.Tables` read,
    * no in-session training artifact. Probe selection runs against the
    * sidecar centroid table (k rows, broadcast); the probed cell set for
    * the bounded batch — ≤ min(k, p·|batch|) values, the routing table a
    * production query router holds in memory — is collected and pushed
    * into the candidate read as a STATIC `cell IN (...)` predicate, so
    * the scan opens only the probed partitions' files (PlanSpec pins the
    * PartitionFilters). Ranking is q84's integer-cosine join over the
    * STORED (code, nq) columns; float embeddings are read only for the
    * query batch's probe selection. Exposed for PlanSpec.
    */
  private[operators] def coldServePlan(s: SparkSession, base: String,
      tombstones: Option[DataFrame] = None): DataFrame =
    quantServeFrames(s, s.read.parquet(s"$base/coarse_centroids"),
      s.read.parquet(s"$base/index"), tombstones)

  /** The frame-level serving core behind [[coldServePlan]] (single index
    * directory) and [[manifestServePlan]] (manifest-selected segment
    * union): probe routing against the broadcast centroid table, static
    * probed-cell pushdown into the candidate read, int8 ranking over
    * stored codes.
    */
  private[operators] def quantServeFrames(s: SparkSession, coarse: DataFrame,
      index: DataFrame, tombstones: Option[DataFrame]): DataFrame = {
    VectorFunctions.register(s)
    // tombstone mask, applied BEFORE ranking on both the query and the
    // candidate side: a deleted row must neither be served as a neighbor
    // nor occupy a rank slot (a post-top-k filter would silently return
    // k-minus-deleted results). The request list is small — a broadcast
    // hash LEFT ANTI join, never a shuffle of the index.
    val live = tombstones.fold(index)(t =>
      index.join(broadcast(t.select("vec_id")), Seq("vec_id"), "left_anti"))
    val qs = live.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("embedding"))
    val probes = probeSelection(qs, coarse, ProbeP)
      .select("vec_id", "probe_cell")
    val cells = probes.select("probe_cell").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val cand = live.where(col("cell").isin(cells: _*))
      .select(col("vec_id").as("neighbor_id"), col("cell").as("cell_b"),
        col("code").as("code_b"), col("nq").as("nq_b"))
    val qa = live.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("code").as("code_a"), col("nq").as("nq_a"))
    val w = Window.partitionBy("vec_id").orderBy(col("qcos").desc, col("neighbor_id"))
    probes.join(qa, "vec_id")
      .join(cand, col("probe_cell") === col("cell_b") && col("vec_id") =!= col("neighbor_id"))
      .where(col("nq_a") > 0 && col("nq_b") > 0)
      .withColumn("qcos",
        VectorFunctions.int8CodeDot(col("code_a"), col("code_b")).cast("double") /
          (sqrt(col("nq_a").cast("double")) * sqrt(col("nq_b").cast("double"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("vec_id"), col("neighbor_id"), col("rank"),
        round(col("qcos"), 6).as("qcos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** q105: COLD-START serving from the WRITTEN index — the actual
    * production deployment path every in-session artifact stands in for:
    * write [[writeIvfIndex]] + [[writeIndexSidecar]] once per (session,
    * dir), then answer the bounded query batch reading ONLY those files
    * (a fresh process with the same directory would produce the same
    * plan). The result is q84's quantized-IVF top-3 restricted to the
    * batch, so the oracle gate proves the storage round-trip is
    * value-exact end-to-end: codes, norms, centroids, and partition
    * layout all survive the write. This is also the durability answer to
    * localCheckpoint volatility: the files ARE the artifact.
    */
  /** The bounded-batch quantized-serving oracle — q105's text, shared
    * verbatim by its streaming twin q111 (stream == cold-batch == DuckDB
    * is exactly the gate an online serving tier owes).
    */
  private[graft] val boundedQuantServeOracle: String =
    s"""WITH $kmOracleTrain, ${probesOracle(s"\n    WHERE e.vec_id < $QueryBatch")},
       |$int8QuantOracleTail""".stripMargin

  private val q105 = GraftQuery(
    "q105_cold_index_serve", boundedQuantServeOracle) { (s, d) =>
    coldServePlan(s, writtenIndex(s, d))
  }

  /** The full trained index's coarse centroids collected to a driver-side
    * literal (k cells × dim doubles — router metadata), memoized per
    * (session, dir) like q94's [[frozenCollected]]: the probe-routing
    * table an ONLINE serving tier ships inside every task, so per-query
    * probe selection is a map, not a join.
    */
  private def trainedCentroidsCollected(s: SparkSession, d: String)
      : Seq[(Int, Seq[Double])] =
    graft.Artifacts.cached[Seq[(Int, Seq[Double])]](
        s, s"ivf_centroids_collected:$d") {
      val (c1, _) = kmTrained(s, d)
      (c1.select(col("cell"), col("cen")).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq,
        () => ())
    }

  /** ONLINE ANN serving as a streaming plan (q111): each arriving query
    * vector is int8-encoded and probe-routed map-side (the collected
    * centroids ride the plan as literals — the same per-row `array_sort`
    * argmin recipe as [[frozenAssignEncode]], same (distance, cell)
    * tie-break as [[probeSelection]] and the oracle), candidates come
    * from ONE stream-static equi-join against the quantized index
    * artifact's stored (code, nq) columns — floats never ride the join,
    * q84's contract — and the per-query top-3 is a streaming aggregation
    * folding candidates into one sorted 3-slot array (ord = negated
    * integer-cosine, neighbor id as tie-break: exactly the oracle's
    * `ORDER BY qcos DESC, neighbor_id`). The only stateful operator is
    * that final ranking aggregation; everything upstream is stateless,
    * so serving throughput scales with query-arrival rate and the
    * candidate join cost with cells probed — never corpus size.
    */
  private[graft] def streamServePlan(s: SparkSession, d: String,
      queries: DataFrame, candidates: Option[DataFrame] = None): DataFrame = {
    VectorFunctions.register(s)
    val cents = trainedCentroidsCollected(s, d)
    val scored = transform(typedLit(cents), c => struct(
      VectorFunctions.l2DistSq(col("embedding"), c.getField("_2")).as("d"),
      c.getField("_1").as("cell")))
    val probed = queries
      .withColumn("code_a", VectorFunctions.int8Encode(col("embedding")))
      .withColumn("nq_a", VectorFunctions.int8CodeDot(col("code_a"), col("code_a")))
      .withColumn("probe_cell", explode(
        transform(slice(array_sort(scored), 1, ProbeP), s => s.getField("cell"))))
      .select("vec_id", "probe_cell", "code_a", "nq_a")
    val cand = candidates.getOrElse(kmQuantized(s, d))
      .select(col("vec_id").as("neighbor_id"),
        col("cell").as("cell_b"), col("code").as("code_b"), col("nq").as("nq_b"))
    probed
      .join(cand, col("probe_cell") === col("cell_b") &&
        col("vec_id") =!= col("neighbor_id"))
      .where(col("nq_a") > 0 && col("nq_b") > 0)
      .withColumn("qcos",
        VectorFunctions.int8CodeDot(col("code_a"), col("code_b")).cast("double") /
          (sqrt(col("nq_a").cast("double")) * sqrt(col("nq_b").cast("double"))))
      .groupBy("vec_id")
      .agg(slice(sort_array(collect_list(struct(
        (col("qcos") * lit(-1)).as("ord"), col("neighbor_id"), col("qcos")))),
        1, 3).as("top"))
  }

  /** The q110 tombstone predicate (SQL twin below): LCG bucket 9 of the
    * vec_id space, ~10% of the corpus — the deterministic stand-in for a
    * deletion-request log (GDPR / right-to-be-forgotten), which at
    * production is an arbitrary id list, which is why the ENGINE applies
    * it as an anti-join against an id table, never as a recomputable
    * predicate.
    */
  private def tombstoned(c: Column): Column = shardBucket(c) >= 9
  private def tombstoneSql(idExpr: String): String =
    s"(${Pipeline.lcgSql(idExpr, Pipeline.SplitA, Pipeline.SplitC)}) % 10 >= 9"

  /** q110: TOMBSTONE-masked serving from the written index — the DELETE
    * half of the index lifecycle (q94/q109 are the append half): a
    * deletion-request list arrives, and serving must exclude those rows
    * IMMEDIATELY, without waiting for a file rewrite. The mask is a
    * broadcast anti-join applied to both sides BEFORE ranking — a
    * tombstoned vector neither answers queries nor occupies a rank slot,
    * so every query still gets its full top-3 from live rows (the
    * post-filter would starve exactly the queries whose neighbors were
    * deleted). Physical deletion is then a compaction-time rewrite
    * (writeCompacted's territory); this query is the read path between
    * request and rewrite, oracle-gated against a DuckDB recompute over
    * the live subset.
    */
  /** Serving-from-live-rows oracle shared by q110 (runtime tombstone
    * mask over the original files) and q114 (physical compaction rewrite
    * with no mask): both must produce exactly the quantized top-3 over
    * the non-tombstoned subset.
    */
  private[graft] val tombstoneServeOracle: String =
    s"""WITH $kmOracleTrain, ${probesOracle(
           s"\n    WHERE e.vec_id < $QueryBatch AND NOT (${tombstoneSql("e.vec_id")})")},
       |${int8QuantOracleTailWhere(s"\n    AND NOT (${tombstoneSql("b.vec_id")})")}"""
      .stripMargin

  /** PUBLIC serving entry: answer the bounded query batch from the
    * written index at `indexDir`, masking an ARBITRARY caller-supplied
    * id frame (a deletion-request log is an external input — GDPR
    * requests, moderation takedowns — never a recomputable predicate;
    * the fixture happens to derive its list deterministically so the
    * oracle can re-derive it, but nothing in this path knows that). The
    * mask is a broadcast anti-join on both sides pre-rank; pass None for
    * unmasked serving. q110 routes through this; q118-q121 resolve their
    * id frames from the manifest's delete FILES through the same
    * `quantServeFrames(tombstones:)` plumbing.
    */
  def serveQuantized(s: SparkSession, indexDir: String,
      tombstones: Option[DataFrame] = None): DataFrame =
    coldServePlan(s, indexDir, tombstones)

  private val q110 = GraftQuery(
    "q110_tombstone_serve", tombstoneServeOracle) { (s, d) =>
    val base = writtenIndex(s, d)
    val tomb = s.read.parquet(s"$base/index")
      .select("vec_id").where(tombstoned(col("vec_id")))
    serveQuantized(s, base, Some(tomb))
  }

  /** The q145 upsert set: LCG bucket 7 (~10% of the corpus, disjoint
    * from the tombstone bucket 9) — the deterministic stand-in for a
    * re-embedding batch. The "new" embedding is the reversed vector: a
    * fixture-computable update that genuinely moves cells and ranks.
    */
  private def upserted(c: Column): Column = shardBucket(c) === 7
  private def upsertSql(idExpr: String): String =
    s"(${Pipeline.lcgSql(idExpr, Pipeline.SplitA, Pipeline.SplitC)}) % 10 = 7"

  /** q145: index UPSERT serving — the compose of the lifecycle's two
    * halves a re-embedded document needs: the OLD encodings of the
    * upsert batch are tombstoned (broadcast anti-join, q110's mechanism)
    * and the NEW embeddings are encoded against the FROZEN serving
    * artifacts (coarse cell via [[kmAssign]]'s literal-codebook argmin,
    * int8 code + stored norm — q94's no-retrain discipline applied to
    * the int8 tier) and unioned in, all before ranking. Serving at the
    * result is gated against an oracle that re-derives the WHOLE index
    * with updated vectors: a stale encoding answering a query, a dropped
    * upsert, or an upserted query probing with its old vector would all
    * hash-mismatch. Scale shape: the upsert batch is request-log sized —
    * its anti-join and union are broadcast/metadata work, the corpus-side
    * probe pushdown is unchanged, and nothing retrains or rewrites files
    * (the durable commit is then q118's manifest append, already gated).
    */
  private val q145 = GraftQuery(
    "q145_upsert_serve",
    s"""WITH $kmOracleTrain,
       |embu AS (
       |  SELECT vec_id,
       |    CASE WHEN ${upsertSql("vec_id")} THEN list_reverse(embedding)
       |         ELSE embedding END AS embedding
       |  FROM embeddings),
       |${kmOracleAssignFrom("embu", "c1", "a2u")},
       |${probesOracleFrom("embu", s"\n    WHERE e.vec_id < $QueryBatch")},
       |${int8QuantOracleTailFrom("a2u", "")}""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val base = writtenIndex(s, d)
    val idx = s.read.parquet(s"$base/index")
      .select("vec_id", "embedding", "cell", "code", "nq")
    val renew = Tables.embeddings(s, d)
      .where(upserted(col("vec_id")))
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    val delta = kmAssign(renew, s.read.parquet(s"$base/coarse_centroids"))
      .withColumn("code", VectorFunctions.int8Encode(col("embedding")))
      .withColumn("nq", VectorFunctions.int8CodeDot(col("code"), col("code")))
      .select("vec_id", "embedding", "cell", "code", "nq")
    val live = idx.join(broadcast(renew.select("vec_id")),
      Seq("vec_id"), "left_anti")
    quantServeFrames(s, s.read.parquet(s"$base/coarse_centroids"),
      live.unionByName(delta), None)
  }

  /** The COMPACTED index: the written artifact physically rewritten with
    * the tombstoned rows dropped — the rewrite that retires q110's
    * runtime delete mask. The anti-join against the request list is the
    * production shape (an arbitrary id list, not a recomputable
    * predicate); the rewrite itself is an O(live rows) partition-
    * preserving copy — `partitionBy(cell)` over rows already grouped by
    * cell directories writes straight through, no shuffle — plus a
    * metadata-sized sidecar copy (centroids are unchanged by deletes).
    * Session-memoized like [[writtenIndex]]; released with the registry.
    */
  private[operators] def compactedIndex(s: SparkSession, d: String): String =
    graft.Artifacts.cached[String](s, s"compacted_index:$d") {
      val src = writtenIndex(s, d)
      val base = java.nio.file.Files.createTempDirectory("graft_compacted_index")
      val idx = s.read.parquet(s"$src/index")
      val tomb = idx.select("vec_id").where(tombstoned(col("vec_id")))
      idx.join(broadcast(tomb), Seq("vec_id"), "left_anti")
        .write.mode("overwrite").partitionBy("cell")
        .parquet(base.toString + "/index")
      s.read.parquet(s"$src/coarse_centroids").write.mode("overwrite")
        .parquet(base.toString + "/coarse_centroids")
      (base.toString, () => {
        org.apache.commons.io.FileUtils.deleteDirectory(base.toFile); ()
      })
    }

  /** q114: serving from the COMPACTED index — the last stage of the
    * delete lifecycle (q110 is the read path between deletion request
    * and rewrite; this is the read path after it): rewrite the index
    * minus the tombstoned rows, then cold-serve from the new files with
    * NO runtime mask. Gated on the SAME oracle as q110 — masked serving
    * and compacted serving must be indistinguishable to a caller, which
    * is exactly the correctness contract a compaction job owes.
    */
  private val q114 = GraftQuery(
    "q114_compacted_serve", tombstoneServeOracle) { (s, d) =>
    coldServePlan(s, compactedIndex(s, d))
  }

  /** q115: per-cell index HEALTH audit — the monitoring pass an index
    * operator runs between retrains, answering three questions per
    * coarse cell from the STORED artifact alone (one scan, no joins, no
    * float recompute beyond the stored columns): how big is the cell
    * (probe-cost balance), how much of it is tombstoned (compaction
    * urgency), and how faithful are the stored int8 codes to the stored
    * float embeddings (quantization drift — rises when new data stops
    * matching the trained scale). The error gauge folds per-row
    * `1 − cos(embedding, code)` into floored micro-units BEFORE the sum
    * (the q27/q95 integer-aggregation trick), so no shuffle-order float
    * addition decides an output value.
    */
  private val q115 = GraftQuery(
    "q115_index_cell_audit",
    s"""WITH $kmOracleTrain,
       |iq AS (
       |  SELECT vec_id, cell, v,
       |    list_transform(v, x -> CAST(least(greatest(floor(x / (CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END) + 0.5), -127.0), 127.0) AS BIGINT)) AS q
       |  FROM (
       |    SELECT vec_id, cell, v,
       |      list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(v, x -> abs(x))),
       |        (a, b) -> greatest(a, b)) AS mx
       |    FROM (
       |      SELECT vec_id, cell,
       |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |      FROM a2) t1) t2),
       |er AS (
       |  SELECT vec_id, cell,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(1, len(v) + 1), i -> v[i] * CAST(q[i] AS DOUBLE))),
       |      (x, y) -> x + y) AS dot,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (x, y) -> x + y) AS ne,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(q, x -> x * x)), (x, y) -> x + y) AS DOUBLE) AS nq
       |  FROM iq)
       |SELECT cell, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(CASE WHEN ${tombstoneSql("vec_id")} THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_tomb,
       |  CAST(sum(CASE WHEN ne > 0 AND nq > 0 AND NOT (${tombstoneSql("vec_id")})
       |    THEN CAST(floor((1 - dot / (sqrt(ne) * sqrt(nq))) * 1000000) AS BIGINT)
       |    ELSE 0 END) AS BIGINT) AS sum_qerr_micro
       |FROM er GROUP BY cell ORDER BY cell""".stripMargin) { (s, d) =>
    val idx = s.read.parquet(s"${writtenIndex(s, d)}/index")
      .withColumn("dot", expr(
        "aggregate(zip_with(embedding, code, (x, c) -> CAST(x AS DOUBLE) * CAST(c AS DOUBLE)), 0D, (a, t) -> a + t)"))
      .withColumn("ne", expr(
        "aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
      .withColumn("nqd", col("nq").cast("double"))
      .withColumn("tomb", tombstoned(col("vec_id")))
    idx.groupBy("cell")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("tomb"), 1L).otherwise(0L)).as("n_tomb"),
        sum(when(col("ne") > 0 && col("nqd") > 0 && !col("tomb"),
            floor((lit(1.0) - col("dot") / (sqrt(col("ne")) * sqrt(col("nqd"))))
              * 1000000).cast("long"))
          .otherwise(0L)).as("sum_qerr_micro"))
      .orderBy("cell")
  }

  /** q124: per-SOURCE dataset report — the "dataset card" table a corpus
    * ships with, composing three proven tiers into one shuffle-friendly
    * summary: per source, how many documents, how many sit inside a
    * near-dup cluster (size ≥ 2), how many survive q116's
    * quality-aware survivor selection, and the integer token/quality
    * totals. Every aggregate is an integer (quality is the micro-unit
    * score), every join a hash equi-join on doc_id/cluster_id with
    * partial aggregation — the report costs two extra metadata-light
    * shuffles on top of the shared minhash-cluster artifact, regardless
    * of corpus width.
    */
  private val q124 = GraftQuery(
    "q124_source_report",
    s"""$clusterOracleChain,
       |${TextAnalysis.qualityOracleCte},
       |j AS (
       |  SELECT c.cluster_id, c.doc_id, q.quality_micro, q.n_tokens
       |  FROM clus c JOIN qual q ON c.doc_id = q.doc_id),
       |sz AS (SELECT cluster_id, count(*) AS csize FROM j GROUP BY 1),
       |cn AS (
       |  SELECT cluster_id, doc_id AS canonical_doc FROM (
       |    SELECT cluster_id, doc_id,
       |      row_number() OVER (PARTITION BY cluster_id
       |        ORDER BY quality_micro DESC, doc_id) AS rn
       |    FROM j) t WHERE rn = 1)
       |SELECT d.source AS source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN s2.csize >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_members,
       |  CAST(sum(CASE WHEN j.doc_id = cn.canonical_doc THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(sum(j.n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(sum(j.quality_micro) AS BIGINT) AS sum_quality_micro
       |FROM j JOIN documents d ON j.doc_id = d.doc_id
       |JOIN sz s2 ON j.cluster_id = s2.cluster_id
       |JOIN cn ON j.cluster_id = cn.cluster_id
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val qual = TextAnalysis.qualityBase(s, d)
      .select(col("doc_id"), TextAnalysis.qualityMicroCol.as("quality_micro"),
        col("n_tokens").cast("long").as("n_tokens"))
    val j = clusterAssignments(s, d).join(qual, "doc_id")
    val sizes = j.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
    val canon = j.groupBy("cluster_id")
      .agg(min(struct((col("quality_micro") * -1).as("nq"),
        col("doc_id").as("dd"))).as("pick"))
      .select(col("cluster_id"), col("pick.dd").as("canonical_doc"))
    j.join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
      .join(sizes, "cluster_id")
      .join(canon, "cluster_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("csize") >= 2, 1L).otherwise(0L)).as("n_dup_members"),
        sum(when(col("doc_id") === col("canonical_doc"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("quality_micro")).as("sum_quality_micro"))
      .orderBy("source")
  }

  /** q222: dedup ROI — the token-savings number that justifies running
    * the dedup pipeline at all: per source, total tokens before dedup,
    * tokens surviving q116's quality-aware survivor selection, and the
    * saved count/parts-per-million. This is the headline a corpus card
    * quotes ("dedup cut N% of training tokens from source X") and the
    * input to a cost model deciding whether minhash is worth its pass.
    * Rides the shared cluster artifact; the report adds one canonical
    * pick (aggregate, map-side combine — same shape as q116) plus one
    * source-grain rollup. All integers; `saved_ppm` is exact integer
    * division (bounded: needs tokens_per_source ≤ ~9.2e12 before the
    * ×1e6 scaling would overflow a long — states the headroom rather
    * than rounding through doubles).
    */
  private val q222 = GraftQuery(
    "q222_dedup_token_roi",
    s"""$clusterOracleChain,
       |${TextAnalysis.qualityOracleCte},
       |j AS (
       |  SELECT c.cluster_id, c.doc_id, q.quality_micro, q.n_tokens
       |  FROM clus c JOIN qual q ON c.doc_id = q.doc_id),
       |cn AS (
       |  SELECT cluster_id, doc_id AS canonical_doc FROM (
       |    SELECT cluster_id, doc_id,
       |      row_number() OVER (PARTITION BY cluster_id
       |        ORDER BY quality_micro DESC, doc_id) AS rn
       |    FROM j) t WHERE rn = 1),
       |agg AS (
       |  SELECT d.source AS source,
       |    CAST(sum(j.n_tokens) AS BIGINT) AS tokens_total,
       |    CAST(sum(CASE WHEN j.doc_id = cn.canonical_doc
       |      THEN j.n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
       |  FROM j JOIN documents d ON j.doc_id = d.doc_id
       |  JOIN cn ON j.cluster_id = cn.cluster_id
       |  GROUP BY 1)
       |SELECT source, tokens_total, tokens_kept,
       |  tokens_total - tokens_kept AS tokens_saved,
       |  (tokens_total - tokens_kept) * 1000000 // tokens_total AS saved_ppm
       |FROM agg ORDER BY source""".stripMargin) { (s, d) =>
    val qual = TextAnalysis.qualityBase(s, d)
      .select(col("doc_id"), TextAnalysis.qualityMicroCol.as("quality_micro"),
        col("n_tokens").cast("long").as("n_tokens"))
    val j = clusterAssignments(s, d).join(qual, "doc_id")
    val canon = j.groupBy("cluster_id")
      .agg(min(struct((col("quality_micro") * -1).as("nq"),
        col("doc_id").as("dd"))).as("pick"))
      .select(col("cluster_id"), col("pick.dd").as("canonical_doc"))
    j.join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
      .join(canon, "cluster_id")
      .groupBy("source")
      .agg(sum(col("n_tokens")).as("tokens_total"),
        sum(when(col("doc_id") === col("canonical_doc"), col("n_tokens"))
          .otherwise(0L)).as("tokens_kept"))
      .withColumn("tokens_saved", col("tokens_total") - col("tokens_kept"))
      .withColumn("saved_ppm",
        expr("(tokens_saved * 1000000) div tokens_total"))
      .orderBy("source")
  }

  /** q224: blocked record linkage — entity resolution by the classic
    * blocking + verify decomposition (Fellegi-Sunter practice): candidate
    * pairs come from an EQUI self-join on a cheap blocking key (first
    * name token + brand), a length-difference prefilter discards pairs
    * that cannot be within the edit-distance threshold (|len(a)−len(b)|
    * ≤ τ is a necessary condition of Levenshtein ≤ τ), and only
    * survivors pay the quadratic Levenshtein verify (Spark's codegen'd
    * built-in). This is the short-string complement to q196's
    * set-similarity join — token sets can't see single-character typos;
    * edit distance can. Scale shape: ONE shuffle on the blocking key,
    * pair expansion bounded by block size (production blocks on
    * higher-cardinality keys — sorted q-grams — exactly like q85 caps
    * minhash buckets; the fixture's key keeps blocks small at every SF),
    * and the verify is a narrow per-pair map. The oracle is the same
    * blocked join in DuckDB — both engines' unit-cost Levenshtein agree
    * by definition.
    */
  private val q224 = GraftQuery(
    "q224_blocked_linkage",
    s"""WITH p AS (
       |  SELECT p_partkey, concat(p_name, ' ', p_brand, ' ', p_type) AS nm,
       |    string_split(p_name, ' ')[1] AS w, p_brand AS b
       |  FROM part)
       |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       |  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS edit_dist
       |FROM p a JOIN p b
       |  ON a.w = b.w AND a.b = b.b AND a.p_partkey < b.p_partkey
       |WHERE abs(len(a.nm) - len(b.nm)) <= 2
       |  AND levenshtein(a.nm, b.nm) <= 2
       |ORDER BY key_a, key_b""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d)
      .select(col("p_partkey"),
        concat_ws(" ", col("p_name"), col("p_brand"), col("p_type")).as("nm"),
        split(col("p_name"), " ").getItem(0).as("w"),
        col("p_brand").as("b"))
    // the dimension reads as ONE file split, which would run the whole
    // verify in a single task behind the broadcast join — spread the
    // probe side across blocks first (at scale this is the same
    // blocking-key exchange a shuffled join pays anyway). The partition
    // count is pinned: the frame is tiny in BYTES, so AQE would coalesce
    // a column-only repartition back to one partition — but the work is
    // quadratic in block size, not linear in bytes
    val par = s.sparkContext.defaultParallelism
    val a = p.select(col("p_partkey").as("key_a"), col("nm").as("nm_a"),
      col("w"), col("b"))
      .repartition(par, col("w"), col("b"))
    val bb = p.select(col("p_partkey").as("key_b"), col("nm").as("nm_b"),
      col("w"), col("b"))
    a.join(bb, Seq("w", "b"))
      .where(col("key_a") < col("key_b")
        && abs(length(col("nm_a")) - length(col("nm_b"))) <= 2)
      .where(levenshtein(col("nm_a"), col("nm_b")) <= 2)
      .select(col("key_a"), col("key_b"),
        levenshtein(col("nm_a"), col("nm_b")).cast("long").as("edit_dist"))
      .orderBy("key_a", "key_b")
  }

  /** Bucket predicate over an arbitrary id expression (SQL twin of
    * [[shardBucket]]) — the snapshot oracles restrict both probe and
    * candidate sides by shard bucket.
    */
  private def shardBucketSqlOf(idExpr: String): String =
    s"(${Pipeline.lcgSql(idExpr, Pipeline.SplitA, Pipeline.SplitC)}) % 10"

  /** The index as a VERSIONED segment store: immutable segment
    * directories plus a parquet MANIFEST mapping each snapshot version
    * to its full file set (snapshot isolation, the Iceberg/Delta/Lance
    * table-format idea applied to the vector index):
    *
    *   v1 = [base]                      — the initial load (buckets 0-7)
    *   v2 = [base, shard]               — after q94's append commit
    *   v3 = [base, shard] − deletes/d1  — after q110's delete commit
    *
    * A writer commits by writing NEW segment/delete files and appending
    * manifest rows — never rewriting a segment — so concurrent readers
    * keep a consistent snapshot and time-travel is a manifest filter.
    * The manifest is itself parquet (one row per (version, kind, path)),
    * readable by any engine. Segments stay partitioned by cell, so
    * probed-cell pruning works per segment.
    */
  private[graft] def versionedIndex(s: SparkSession, d: String): String =
    graft.Artifacts.cached[String](s, s"versioned_index:$d") {
      val src = writtenIndex(s, d)
      val base = java.nio.file.Files.createTempDirectory("graft_versioned_index")
      val idx = s.read.parquet(s"$src/index")
      idx.where(shardBucket(col("vec_id")) < 8)
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$base/segments/base")
      idx.where(shardBucket(col("vec_id")) >= 8)
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$base/segments/shard")
      idx.where(tombstoned(col("vec_id"))).select("vec_id")
        .write.mode("overwrite").parquet(s"$base/deletes/d1")
      s.read.parquet(s"$src/coarse_centroids").write.mode("overwrite")
        .parquet(s"$base/coarse_centroids")
      val mf = s.createDataFrame(Seq(
        (1, "segment", "segments/base"),
        (2, "segment", "segments/base"), (2, "segment", "segments/shard"),
        (3, "segment", "segments/base"), (3, "segment", "segments/shard"),
        (3, "delete", "deletes/d1")))
        .toDF("version", "kind", "path")
      mf.coalesce(1).write.mode("overwrite").parquet(s"$base/manifest")
      (base.toString, () => {
        org.apache.commons.io.FileUtils.deleteDirectory(base.toFile); ()
      })
    }

  /** Serve a QUERY at a snapshot version: resolve the manifest (a
    * metadata-sized read, collected like q105's cell-routing list — this
    * is the table-of-contents a query router holds in memory), union the
    * listed segments, mask the listed delete files, and run the standard
    * quantized serving core. Partition pruning applies per segment scan.
    */
  /** Resolve a snapshot version from the manifest into (segment-union
    * index, optional delete mask) — the metadata-sized lookup every
    * versioned reader (batch q118-q120, streaming q121) starts from.
    */
  private[graft] def manifestResolve(s: SparkSession, base: String,
      version: Int): (DataFrame, Option[DataFrame]) = {
    val entries = s.read.parquet(s"$base/manifest")
      .where(col("version") === version).select("kind", "path")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    require(entries.nonEmpty, s"no manifest entries for version $version")
    val segs = entries.collect { case ("segment", p) => p }
    val dels = entries.collect { case ("delete", p) => p }
    (segs.map(p => s.read.parquet(s"$base/$p")).reduce(_.unionByName(_)),
      dels.map(p => s.read.parquet(s"$base/$p")).reduceOption(_.unionByName(_)))
  }

  private[operators] def manifestServePlan(s: SparkSession, base: String,
      version: Int): DataFrame = {
    val (index, tomb) = manifestResolve(s, base, version)
    quantServeFrames(s, s.read.parquet(s"$base/coarse_centroids"), index, tomb)
  }

  /** q118/q119/q120: TIME-TRAVEL serving — the bounded query batch
    * answered at each snapshot of the index lifecycle, reading only what
    * that version's manifest lists. q118 (v1, pre-append) has its own
    * oracle (both sides restricted to the base shard); q119 (v2,
    * post-append) must be indistinguishable from q105's single-directory
    * cold serve; q120 (v3, post-delete) from q110's masked serve — the
    * snapshot mechanism may not change a single served value.
    */
  private val q118 = GraftQuery(
    "q118_snapshot_base",
    s"""WITH $kmOracleTrain, ${probesOracle(
           s"\n    WHERE e.vec_id < $QueryBatch AND ${shardBucketSqlOf("e.vec_id")} < 8")},
       |${int8QuantOracleTailWhere(s"\n    AND ${shardBucketSqlOf("b.vec_id")} < 8")}"""
      .stripMargin) { (s, d) =>
    manifestServePlan(s, versionedIndex(s, d), version = 1)
  }

  private val q119 = GraftQuery(
    "q119_snapshot_append", boundedQuantServeOracle) { (s, d) =>
    manifestServePlan(s, versionedIndex(s, d), version = 2)
  }

  private val q120 = GraftQuery(
    "q120_snapshot_delete", tombstoneServeOracle) { (s, d) =>
    manifestServePlan(s, versionedIndex(s, d), version = 3)
  }

  // ---- Johnson-Lindenstrauss sign projection (q154/q155) ----

  /** JL target dimensionality: 64 → 32 floats (2× smaller vectors). */
  private val JlK = 32
  private val JlMul = 2654435761L

  /** The ±1 sign for projection cell (j, k): the POPCOUNT PARITY of a
    * Knuth multiplicative hash of the flattened index — deterministic,
    * engine-agnostic integer arithmetic (`bit_count` exists in both
    * engines). Parity folds every bit of the mixed word, which measured
    * at true-random sign quality on this corpus; single LCG/mid-bit
    * selections were tried first and their lattice structure over
    * consecutive indices collapsed recall to ~¼ of random-sign (0.04 vs
    * 0.15 @ k=32) — the projection audit q155 exists to catch exactly
    * that class of silent quality loss.
    */
  private def jlSignSql(jExpr: String, kExpr: String): String =
    s"(CASE WHEN bit_count(((CAST($jExpr AS BIGINT) * $JlK + $kExpr) " +
      s"* $JlMul) % 4294967296) % 2 = 0 THEN CAST(1.0 AS DOUBLE) " +
      "ELSE CAST(-1.0 AS DOUBLE) END)"

  /** Spark-side projection expression over `embedding`: 16 order-pinned
    * double folds narrowed to float (one IEEE round, same in both
    * engines — the [[residuals]] discipline).
    */
  private def jlProjectExpr: String =
    s"""CAST(transform(sequence(0, ${JlK - 1}), k ->
       |  aggregate(sequence(0, ${KmDim - 1}), 0D, (acc, j) ->
       |    acc + CAST(element_at(embedding, j + 1) AS DOUBLE)
       |      * ${jlSignSql("j", "k")})) AS array<float>)""".stripMargin

  private def jlOracleProj: String =
    s"""proj AS (
       |  SELECT vec_id,
       |    list_transform(range(0, $JlK), k ->
       |      CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list_transform(range(0, $KmDim), j ->
       |          CAST(embedding[j + 1] AS DOUBLE)
       |            * ${jlSignSql("j", "k")})), (x, y) -> x + y) AS FLOAT))
       |      AS pemb
       |  FROM embeddings)""".stripMargin

  /** q154: random-projection (Johnson-Lindenstrauss) search — the THIRD
    * compression tier beside int8 (q84) and PQ (q91): a deterministic
    * ±1 sign matrix (Achlioptas' database-friendly JL construction)
    * maps 64 floats to 16, and the bounded batch searches top-3 cosine
    * in the PROJECTED space. Against PQ this trades codebook training
    * for a data-independent map — the right tier when the corpus drifts
    * faster than a retrain cadence. Scale shape: the projection is
    * map-only (no training, no shuffle, 4× smaller vectors from the
    * scan on), and the search is q44's broadcast-batch BNLJ over
    * quarter-size vectors; composing with IVF probes (q84's pruning) is
    * column choice, not new machinery.
    */
  private val q154 = GraftQuery(
    "q154_jl_projection_search",
    s"""WITH $jlOracleProj,
       |sim AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    ${cosSql("a", "b", "pemb")} AS cos
       |  FROM (SELECT * FROM proj WHERE vec_id < $QueryBatch) a
       |  JOIN proj b ON a.vec_id <> b.vec_id)
       |SELECT vec_id, neighbor_id, rank, round(cos, 6) AS cos_sim FROM (
       |  SELECT vec_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sim) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val proj = Tables.embeddings(s, d).select("vec_id", "embedding")
      .select(col("vec_id"), expr(jlProjectExpr).as("pemb"))
    val qb = broadcast(proj.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("pemb").as("emb_a")))
    val all = proj.select(col("vec_id").as("neighbor_id"),
      col("pemb").as("emb_b"))
    rankTop3(qb.join(all, col("vec_id") =!= col("neighbor_id")))
  }

  /** q155: the JL tier's recall audit vs exact-cosine truth — the same
    * measured-fidelity obligation every approximate tier here carries
    * (q79 SRP, q83 IVF, q92/q107 PQ, q102/q147 residual): 16 of 64
    * dimensions is a JL distortion the curve must own, not assume.
    */
  private val q155 = GraftQuery(
    "q155_jl_recall",
    s"""WITH $truthOracle, $jlOracleProj,
       |sim AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    ${cosSql("a", "b", "pemb")} AS cos
       |  FROM (SELECT * FROM proj WHERE vec_id < $QueryBatch) a
       |  JOIN proj b ON a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT vec_id, neighbor_id FROM (
       |    SELECT vec_id, neighbor_id,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |    FROM sim) t
       |  WHERE rank <= 3)
       |SELECT t.vec_id AS vec_id,
       |  CAST(count(r.neighbor_id) AS BIGINT) AS n_hits,
       |  round(CAST(count(r.neighbor_id) AS DOUBLE) / CAST(3 AS DOUBLE), 6) AS recall
       |FROM truth t
       |LEFT JOIN ranked r ON t.vec_id = r.vec_id AND t.neighbor_id = r.neighbor_id
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val truth = bruteForceTruth(
      Tables.embeddings(s, d).select("vec_id", "embedding"))
    val hits = q154.fn(s, d)
      .select(col("vec_id"), col("neighbor_id"), lit(1).as("hit"))
    truth.join(hits, Seq("vec_id", "neighbor_id"), "left")
      .groupBy("vec_id")
      .agg(count(col("hit")).as("n_hits"))
      .select(col("vec_id"), col("n_hits"),
        round(col("n_hits").cast("double") / lit(3.0), 6).as("recall"))
      .orderBy("vec_id")
  }

  // ---- maximum-inner-product search (q136) ----

  /** DuckDB l2r dot-product fragment over two list columns. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a.embedding)+1),
       |      i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)), (x,y) -> x+y)""".stripMargin

  /** q136: maximum-inner-product top-k — retrieval where the NORM is
    * signal (recommendation scores, un-normalized output embeddings),
    * which cosine serving gets WRONG: cosine divides the norm away.
    * MIPS reduces to cosine by the norm-augmentation trick (Bachrach et
    * al., RecSys 2014 / Shrivastava & Li, NIPS 2014): with M = max
    * corpus norm, augment each corpus vector to [x, √(M²−‖x‖²)] — every
    * augmented vector has norm exactly M — and each query to [q, 0];
    * augmented cosine is then dot/(‖q‖·M), a per-query positive
    * constant times the raw inner product, so the RANKING is identical
    * and the whole cosine serving stack (SRP-LSH q45, IVF q71) serves
    * MIPS unchanged. The gate PINS that rank equivalence: the oracle
    * ranks by raw dot, the output carries the augmented cosine, and the
    * hash only matches if the orders agree. Shape is the q44 exact
    * brute-force discipline: the bounded query batch (8 rows + their
    * norms) broadcasts, M rides along as a broadcast one-row aggregate
    * (never a driver collect), the corpus side streams through ONE scan
    * with the dot/rank pipeline fully codegen'd, per-query top-k by
    * window rank. Dots fold left-to-right in doubles — bit-identical to
    * the oracle's list_reduce — and IEEE sqrt/division keep aug_cos
    * deterministic.
    */
  private val MipsK = 5
  private val MipsNq = 8
  private val q136 = GraftQuery(
    "q136_mips_topk",
    s"""WITH nrm AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_reduce(list_transform(range(1, len(embedding)+1),
       |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
       |      (x,y) -> x+y)) AS nrm
       |  FROM embeddings),
       |m AS (SELECT max(nrm) AS mx FROM nrm),
       |qs AS (SELECT vec_id, embedding, nrm FROM nrm
       |  ORDER BY vec_id LIMIT $MipsNq),
       |dots AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q", "c")} AS dot,
       |    q.nrm AS qn
       |  FROM qs q JOIN nrm c ON c.vec_id <> q.vec_id)
       |SELECT query_id, neighbor_id, rank, round(dot, 6) AS dot_p,
       |  round(dot / (qn * (SELECT mx FROM m)), 6) AS aug_cos
       |FROM (SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM dots) t
       |WHERE rank <= $MipsK ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val dotAgg = (a: String, b: String) => expr(
      s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
    val nrm = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(dotAgg("embedding", "embedding")).as("nrm"))
    val mx = nrm.agg(max(col("nrm")).as("mx"))
    val qs = nrm.orderBy("vec_id").limit(MipsNq)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("qn"))
      .crossJoin(broadcast(mx))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("neighbor_id"))
    nrm.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      .join(broadcast(qs), col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", dotAgg("q_emb", "c_emb"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= MipsK)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("dot"), 6).as("dot_p"),
        round(col("dot") / (col("qn") * col("mx")), 6).as("aug_cos"))
      .orderBy("query_id", "rank")
  }

  /** q187: triangle census of the duplicate-candidate graph — per
    * document, how many near-dup TRIANGLES it sits in. q52 answers
    * "which cluster", q164 "how central"; triangles answer "how DENSE is
    * the neighborhood" — a chain of pairwise near-dups (A~B~C) and a
    * mutually-similar clique are different cleanup problems (template
    * boilerplate forms cliques; drifting revisions form paths). The
    * enumeration is the compact-forward algorithm: orient every
    * undirected candidate edge from its (degree, id)-smaller endpoint to
    * the larger, so each triangle has exactly one (source, middle, sink)
    * spelling and is emitted ONCE by [wedge join on the middle] + [one
    * closing-edge equi-join]. Degree orientation is the 100 TB point —
    * wedge fanout is Σ out-deg², and orienting INTO high-degree hubs
    * caps out-degree at O(√|E|) no matter how skewed the dup graph is
    * (a 1M-copy boilerplate hub contributes zero wedges as a pure sink,
    * vs ~10¹² with id-orientation). The oracle enumerates the same
    * triangle set with plain id-orientation — orientation changes the
    * join cost, never the triangle set, which is exactly why the cheap
    * spelling is safe for the gate and the scalable one for the engine.
    */
  /** Per-node triangle counts of an undirected graph given as unique
    * (doc_a < doc_b) edge pairs — q187's compact-forward core, factored
    * so ScaleSpec can pin the enumeration on known graphs (clique,
    * path) independently of the minhash edge derivation.
    */
  private[operators] def triangleCounts(und: DataFrame): DataFrame = {
    val sym = und.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(und.select(col("doc_b").as("u"), col("doc_a").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("dg"))
    val da = deg.select(col("u").as("doc_a"), col("dg").as("da"))
    val db = deg.select(col("u").as("doc_b"), col("dg").as("db"))
    val lowFirst =
      struct(col("da"), col("doc_a")) < struct(col("db"), col("doc_b"))
    val o = und.join(da, "doc_a").join(db, "doc_b")
      .select(when(lowFirst, col("doc_a")).otherwise(col("doc_b")).as("x"),
        when(lowFirst, col("doc_b")).otherwise(col("doc_a")).as("y"))
    val e1 = o.select(col("x").as("a"), col("y").as("b"))
    val e2 = o.select(col("x").as("b"), col("y").as("c"))
    val e3 = o.select(col("x").as("a"), col("y").as("c"))
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
  }

  private val q187 = GraftQuery(
    "q187_dup_triangles",
    s"""$clusterOracleChain,
       |ce AS (SELECT u, v FROM edges WHERE u < v),
       |tri AS (
       |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM ce e1
       |  JOIN ce e2 ON e2.u = e1.v
       |  JOIN ce e3 ON e3.u = e1.u AND e3.v = e2.v),
       |pn AS (
       |  SELECT a AS doc_id FROM tri
       |  UNION ALL SELECT b FROM tri
       |  UNION ALL SELECT c FROM tri)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri
       |FROM pn GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val und = minhashCandidates(minhashSigs(s, d))
      .where(expr(sigMatchPredicate))
      .select(col("doc_a"), col("doc_b")).distinct()
    triangleCounts(und).orderBy("doc_id")
  }

  /** q190: the recall-vs-nprobe CURVE — q83 measures the single point
    * p=[[ProbeP]]; this sweeps p ∈ {1, 2, k} (k = the trained cell
    * count [[kmK]], the exhaustive bound, so the curve's ceiling
    * recall=1.0 is measured, not assumed — the p=k row probes every
    * cell) and reports recall@3 against the shared brute-force
    * truth per setting. This is the table a capacity planner actually
    * reads: each row is (probe cost multiplier → recall), and the knee
    * tells you the cheapest p meeting an SLO. Cost shape: the truth pass
    * is one bounded brute-force over the [[QueryBatch]] sample (shared
    * text with q79/q83); each curve point re-probes only the 100-vector
    * batch against k broadcast centroids and reranks p cells' members —
    * the corpus is never rescanned more than the p-cell candidate join
    * requires, and the three points share [[kmTrained]]'s one trained
    * index artifact.
    */
  private val q190 = GraftQuery(
    "q190_nprobe_curve", {
      // tag names the CTEs; bound is the SQL probe bound (a literal for
      // the fixed points, the [[KmKSql]] scalar subquery for the
      // exhaustive p=k point — k is corpus-sized, so it cannot be
      // interpolated as a constant)
      def point(tag: String, bound: String): String =
        s"""m$tag AS (
           |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
           |    ${cosSql("p", "b")} AS cos
           |  FROM (SELECT * FROM pr WHERE rn <= $bound) p
           |  JOIN a2 b ON p.cell = b.cell AND p.vec_id <> b.vec_id
           |), t$tag AS (
           |  SELECT vec_id, neighbor_id FROM (
           |    SELECT vec_id, neighbor_id,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
           |    FROM m$tag) z WHERE rank <= 3
           |), h$tag AS (
           |  SELECT CAST(count(*) AS BIGINT) AS hits
           |  FROM truth t JOIN t$tag s
           |    ON t.vec_id = s.vec_id AND t.neighbor_id = s.neighbor_id)"""
          .stripMargin
      def row(tag: String, np: String): String =
        s"""SELECT CAST($np AS BIGINT) AS nprobe, hits,
           |  round(CAST(hits AS DOUBLE) / CAST(${3 * QueryBatch} AS DOUBLE), 6) AS recall
           |FROM h$tag""".stripMargin
      s"""WITH $kmOracleTrain, $truthOracle,
         |pr AS (
         |  SELECT e.vec_id, e.embedding, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${kmOracleDist("e.embedding", "c.cen")}, c.cell) AS rn
         |  FROM embeddings e CROSS JOIN c1 c WHERE e.vec_id < $QueryBatch),
         |${point("1", "1")},
         |${point("2", "2")},
         |${point("k", KmKSql)}
         |${row("1", "1")}
         |UNION ALL
         |${row("2", "2")}
         |UNION ALL
         |${row("k", KmKSql)}
         |ORDER BY nprobe""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val (c1, a2) = kmTrained(s, d)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val truth = bruteForceTruth(e)
    val qe = e.where(col("vec_id") < QueryBatch)
    val b = a2.select(col("vec_id").as("neighbor_id"),
      col("cell").as("cell_b"), col("embedding").as("emb_b"))
    val points = Seq(1, 2, kmK(s, d)).map { p =>
      val top = rankTop3(probeSelection(qe, c1, p).join(b,
          col("probe_cell") === col("cell_b")
            && col("vec_id") =!= col("neighbor_id")))
        .select("vec_id", "neighbor_id")
      truth.join(top, Seq("vec_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits"))
        .select(lit(p.toLong).as("nprobe"), col("hits"),
          round(col("hits").cast("double") / lit((3 * QueryBatch).toDouble),
            6).as("recall"))
    }
    points.reduce(_.unionByName(_)).orderBy("nprobe")
  }

  /** q195: label-propagation communities over the duplicate-candidate
    * graph — 2 synchronized rounds, each node adopting its
    * neighborhood's plurality label (ties broken toward the SMALLER
    * label, isolated nodes keep their own). Where q52's connected
    * components answer reachability, LPA converges toward DENSE
    * sub-communities inside a component — e.g. two boilerplate families
    * bridged by one chance near-dup stay separate communities while CC
    * fuses them. Determinism is total: the plurality pick is an
    * order-pinned `min(struct(−count, label))` AGGREGATE (partial+final,
    * no per-node ranking window), so shuffle order can't flip a tie.
    * Scale shape: each round is one join carrying (node, label) pairs —
    * never text or signatures — plus one label-grain fold; the fixed
    * round count keeps the whole thing in Catalyst (same argument as
    * q164's unrolled PageRank, vs the driver-looped CC fixpoint).
    */
  private val q195 = GraftQuery(
    "q195_label_propagation", {
      def round(prev: String, n: String, p: String, l: String): String =
        s"""$n AS (
           |  SELECT e.u AS doc_id, l.lbl, CAST(count(*) AS BIGINT) AS c
           |  FROM edges e JOIN $prev l ON l.doc_id = e.v GROUP BY 1, 2),
           |$p AS (
           |  SELECT doc_id, lbl FROM (
           |    SELECT doc_id, lbl,
           |      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lbl) AS rn
           |    FROM $n) t WHERE rn = 1),
           |$l AS (
           |  SELECT d.doc_id, coalesce(p.lbl, d.doc_id) AS lbl
           |  FROM documents d LEFT JOIN $p p ON p.doc_id = d.doc_id)"""
          .stripMargin
      s"""$clusterOracleChain,
         |l0 AS (SELECT doc_id, doc_id AS lbl FROM documents),
         |${round("l0", "n1", "p1", "l1")},
         |${round("l1", "n2", "p2", "l2")}
         |SELECT doc_id, lbl AS community FROM l2 ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    val und = minhashCandidates(minhashSigs(s, d))
      .where(expr(sigMatchPredicate))
      .select(col("doc_a"), col("doc_b")).distinct()
    val sym = und.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(und.select(col("doc_b").as("u"), col("doc_a").as("v")))
      // one shuffled adjacency reread per round, not re-derived from
      // signatures twice (q164's discipline)
      .repartition(col("v")).localCheckpoint(eager = true)
    val docs = Tables.documents(s, d).select("doc_id")
    def step(lbls: DataFrame): DataFrame = {
      val nb = sym.join(lbls.withColumnRenamed("doc_id", "v"), "v")
        .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("c"))
      val pick = nb.groupBy("u")
        .agg(min(struct((-col("c")).as("nc"), col("lbl"))).as("m"))
        .select(col("u"), col("m.lbl").as("nl"))
      docs.join(pick, docs("doc_id") === pick("u"), "left")
        .select(col("doc_id"), coalesce(col("nl"), col("doc_id")).as("lbl"))
    }
    val l2 = step(step(docs.select(col("doc_id"), col("doc_id").as("lbl"))))
    l2.select(col("doc_id"), col("lbl").as("community")).orderBy("doc_id")
  }

  /** Jaccard threshold for [[q196]], in tenths (6 = 0.6): all threshold
    * arithmetic is integer (`10·o ≥ 6·(|A|+|B|−o)`, prefix length via
    * `⌈0.6·sz⌉ = (6·sz+9) div 10`) so no float boundary can disagree
    * between engines or, worse, shrink a prefix below the lossless bound.
    */
  private val PrefixJacTenths = 6

  /** q196: EXACT similarity self-join by prefix filtering (AllPairs/
    * PPJoin) — every document pair with shingle-set Jaccard ≥ 0.6,
    * with the true overlap and similarity, no approximation. The LSH
    * tiers (q31/q40) trade recall for speed; this is the lossless
    * complement: order the universe by global rarity (df, then hash),
    * keep each document's PREFIX (its |S| − ⌈0.6·|S|⌉ + 1 rarest
    * tokens), and join on prefix tokens only — the prefix-filter
    * theorem guarantees every qualifying pair shares a prefix token, so
    * candidates ⊇ answers, and an exact overlap count over the full
    * sets verifies each candidate. The 100 TB shape: the candidate join
    * fans out on RARE tokens by construction (a boilerplate shingle
    * shared by a million docs is in almost nobody's prefix — high-df
    * tokens sort to the suffix), verification touches only candidate
    * pairs, and everything is equi-joins + one per-doc ranking window.
    * The oracle is the O(all-sharing-pairs) brute force the filter
    * avoids — the gate proves losslessness on the fixture, not just
    * plausibility.
    */
  private val q196 = GraftQuery(
    "q196_prefix_filter_join",
    s"""$shingleCtes,
       |st AS (SELECT doc_id, unnest(list_distinct(hv)) AS h FROM hs),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM st GROUP BY 1),
       |ov AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS o
       |  FROM st a JOIN st b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT o.doc_a, o.doc_b, o, sa.sz AS size_a, sb.sz AS size_b,
       |  round(CAST(o AS DOUBLE) / CAST(sa.sz + sb.sz - o AS DOUBLE), 6) AS jac
       |FROM ov o
       |JOIN sz sa ON sa.doc_id = o.doc_a
       |JOIN sz sb ON sb.doc_id = o.doc_b
       |WHERE 10 * o >= $PrefixJacTenths * (sa.sz + sb.sz - o)
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    exactSimilarPairs(s, d)
      .select(col("doc_a"), col("doc_b"), col("o"), col("size_a"),
        col("size_b"),
        round(col("o").cast("double") /
          (col("size_a") + col("size_b") - col("o")).cast("double"), 6)
          .as("jac"))
      .orderBy("doc_a", "doc_b")
  }

  /** q196's exact AllPairs/PPJoin body, factored so the LSH config
    * sweep (q277) can score candidates against the same ground truth:
    * every pair with Jaccard >= [[PrefixJacTenths]]/10, with overlap
    * and set sizes. Candidate generation is prefix-filter-bounded; the
    * verification is pair-grain (q196's scaladoc carries the full
    * mechanism).
    */
  private def exactSimilarPairs(s: SparkSession, d: String): DataFrame = {
    // the (doc_id, token-set) table — exploded from the dedup family's
    // shared hv artifact and materialized once: it feeds the df count,
    // the prefix derivation, and (as arrays) the verification, and
    // without the fence the text pipeline re-runs per plan reference
    // (the q39 CollapseProject lesson; measured 21 s → ~4 s at sf0.1)
    val sets = graft.Artifacts.checkpointedDf(s, s"prefix_sets:$d") {
      shingleHashTable(s, d)
        .select(col("doc_id"), array_sort(array_distinct(col("hv"))).as("hs"))
    }
    val st = sets.select(col("doc_id"), explode(col("hs")).as("h"),
      size(col("hs")).cast("long").as("sz"))
    val dfreq = st.groupBy("h").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy("df", "h")
    val prefLen = col("sz")
      - expr(s"($PrefixJacTenths * sz + 9) div 10") + lit(1L)
    // the prefix table feeds BOTH sides of the candidate self-join —
    // checkpoint it or the ranking window runs twice
    val pref = st.join(dfreq, "h")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= prefLen)
      .select("doc_id", "h").localCheckpoint(eager = true)
    val cand = pref.select(col("doc_id").as("doc_a"), col("h"))
      .join(pref.select(col("doc_id").as("doc_b"), col("h")),
        Seq("h"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // exact verification at PAIR grain: the candidate row meets both
    // sorted token arrays once and the overlap is one array_intersect —
    // never a per-token join explosion (candidates × avg-set-size rows).
    // The array table is broadcast (ids + hashes only, ~90 longs/doc) so
    // the candidate stream never shuffles array payloads; past broadcast
    // scale the same joins run as hash exchanges on doc_a then doc_b —
    // still pair-grain, measured 5.9 s → 1.6 s warm at sf0.1
    val o = cand
      .join(broadcast(sets.select(col("doc_id").as("doc_a"),
        col("hs").as("ha"))), "doc_a")
      .join(broadcast(sets.select(col("doc_id").as("doc_b"),
        col("hs").as("hb"))), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("o"),
        size(col("ha")).cast("long").as("size_a"),
        size(col("hb")).cast("long").as("size_b"))
    o.where(lit(10) * col("o")
        >= lit(PrefixJacTenths) * (col("size_a") + col("size_b") - col("o")))
  }

  /** q207: retrieval quality as MRR@10 / HitRate@10 — for each query
    * vector in the bounded batch, the exact-cosine top-10 is scanned
    * for the first SAME-LABEL neighbor (the fixture's relevance proxy),
    * and the mean reciprocal rank summarizes the ranking's quality.
    * The trap in averaging reciprocals is float-summation order (no two
    * shuffle orders agree in the last bits), dodged by EXACT ARITHMETIC:
    * ranks are 1..10, so each contribution is the integer 2520/rank
    * (2520 = lcm(1..10)) and the sum is a BIGINT — the single division
    * by 2520·n happens once on the 1-row result. Same one-brute-force-
    * pass cost as the recall audits (q79/q83); at scale the top-10
    * comes from whatever serving tier is being evaluated — the metric
    * definition is tier-independent.
    */
  private val q207 = GraftQuery(
    "q207_retrieval_mrr",
    s"""WITH q AS (
       |  SELECT vec_id, embedding, label FROM embeddings
       |  WHERE vec_id < $QueryBatch),
       |sim AS (
       |  SELECT a.vec_id, a.label AS ql, b.vec_id AS neighbor_id,
       |    b.label AS nl, ${cosSql("a", "b")} AS cos
       |  FROM q a JOIN embeddings b ON a.vec_id <> b.vec_id),
       |top AS (
       |  SELECT vec_id, ql, nl, rank FROM (
       |    SELECT vec_id, ql, nl,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY cos DESC, neighbor_id) AS rank
       |    FROM sim) t WHERE rank <= 10),
       |firsts AS (
       |  SELECT q.vec_id, min(CASE WHEN t.nl = t.ql THEN t.rank END) AS fr
       |  FROM q LEFT JOIN top t ON t.vec_id = q.vec_id
       |  GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |  CAST(count(fr) AS BIGINT) AS n_hit,
       |  CAST(sum(coalesce(2520 // fr, 0)) AS BIGINT) AS mrr_x2520,
       |  round(CAST(sum(coalesce(2520 // fr, 0)) AS DOUBLE)
       |    / (2520.0 * count(*)), 6) AS mrr
       |FROM firsts""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding", "label")
    val q = broadcast(e.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("embedding").as("emb_a"),
        col("label").as("ql")))
    val b = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("emb_b"), col("label").as("nl"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc,
      col("neighbor_id"))
    val top = q.join(b, col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 10)
    val firsts = q.select(col("vec_id"))
      .join(top.select(col("vec_id"), col("ql"), col("nl"), col("rank")),
        Seq("vec_id"), "left")
      .groupBy("vec_id")
      .agg(min(when(col("nl") === col("ql"), col("rank"))).as("fr"))
    firsts.agg(count(lit(1)).as("n_queries"),
        count(col("fr")).as("n_hit"),
        sum(coalesce(expr("2520 div fr"), lit(0L))).as("mrr_x2520"))
      .select(col("n_queries"), col("n_hit"), col("mrr_x2520"),
        round(col("mrr_x2520").cast("double")
          / (lit(2520.0) * col("n_queries")), 6).as("mrr"))
  }

  /** q215: duplicate-cluster size distribution — how much of the corpus
    * sits in singletons vs pairs vs boilerplate families, the one-table
    * summary a dedup report leads with (expected token savings = Σ
    * (size−1)·docs-per-cluster, read straight off this histogram).
    * Rides q52's cluster assignment artifact; two metadata-light
    * aggregates on top (cluster grain, then size grain — the second
    * input is one row per cluster).
    */
  private val q215 = GraftQuery(
    "q215_cluster_sizes",
    s"""$clusterOracleChain,
       |cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
       |  FROM clus GROUP BY 1)
       |SELECT size, CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(size * count(*) AS BIGINT) AS n_docs
       |FROM cs GROUP BY size ORDER BY size""".stripMargin) { (s, d) =>
    clusterAssignments(s, d)
      .groupBy("cluster_id").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_clusters"))
      .select(col("size"), col("n_clusters"),
        (col("size") * col("n_clusters")).as("n_docs"))
      .orderBy("size")
  }

  /** q249: minhash calibration audit — the empirical check of the theorem
    * the whole LSH tier rests on (P[minhash agreement] = Jaccard): over
    * every banded candidate pair, group by the number of agreeing
    * minhash positions (0..12; candidates have ≥3 by construction — one
    * full band) and report the pair count and the exact-Jaccard
    * micro-unit sum/mean/min/max per agreement level. A healthy tier
    * shows mean Jaccard rising with agreement — this table is how a
    * pipeline picks [[MatchThreshold]] from its own corpus instead of
    * trusting the default, and how it detects a broken hash family
    * (agreement decorrelated from Jaccard). Rides the shared signature
    * and shingle artifacts; the exact Jaccard joins shingle arrays back
    * per SIDE after candidate dedup (q40's payload discipline — arrays
    * never ride the 4× band explode), and the report is a ≤13-row
    * aggregate. Mean is BIGINT floor-div; Jaccard micro-units are
    * floor()'d like q40 so no rounding mode can differ.
    */
  private val q249 = GraftQuery(
    "q249_minhash_calibration",
    s"""$shingleCtes, sig AS (
       |  SELECT doc_id, shingles, $oracleSigList AS sig FROM hs
       |), bands AS (
       |  ${oracleMinhashBands(", shingles")}
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.sig AS sa, b.sig AS sb, a.shingles AS sha, b.shingles AS shb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3
       |   AND a.doc_id < b.doc_id
       |), scored AS (
       |  SELECT CAST(len(list_filter(range(1, ${NumHashes + 1}),
       |      i -> sa[i] = sb[i])) AS BIGINT) AS agree,
       |    CAST(floor(CAST(len(list_intersect(sha, shb)) AS DOUBLE) * 1000000
       |      / len(list_distinct(list_concat(sha, shb)))) AS BIGINT) AS j_micro
       |  FROM pairs)
       |SELECT agree, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(j_micro) AS BIGINT) AS sum_j_micro,
       |  CAST(sum(j_micro) // count(*) AS BIGINT) AS mean_j_micro,
       |  CAST(min(j_micro) AS BIGINT) AS min_j_micro,
       |  CAST(max(j_micro) AS BIGINT) AS max_j_micro
       |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val sigs = minhashSigs(s, d)
    val pairs = minhashCandidates(sigs)
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    val sg = sigs.repartition(col("doc_id"))
    val sh = shingleHashes(s, d).select(col("doc_id"), col("shingles"))
      .repartition(col("doc_id"))
    pairs
      .join(sg.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        "doc_a")
      .join(sg.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
        "doc_b")
      .join(sh.select(col("doc_id").as("doc_a"),
        col("shingles").as("shingles_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"),
        col("shingles").as("shingles_b")), "doc_b")
      .withColumn("agree", expr(
        """aggregate(zip_with(sig_a, sig_b,
          |  (x, y) -> CASE WHEN x = y THEN 1L ELSE 0L END),
          |  0L, (a, x) -> a + x)""".stripMargin))
      .withColumn("j_micro", floor(
        size(array_intersect(col("shingles_a"), col("shingles_b")))
          .cast("double") * 1000000 /
          size(array_union(col("shingles_a"), col("shingles_b"))))
        .cast("long"))
      .groupBy("agree")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("j_micro")).as("sum_j_micro"),
        min(col("j_micro")).as("min_j_micro"),
        max(col("j_micro")).as("max_j_micro"))
      .select(col("agree"), col("n_pairs"), col("sum_j_micro"),
        expr("sum_j_micro div n_pairs").as("mean_j_micro"),
        col("min_j_micro"), col("max_j_micro"))
      .orderBy("agree")
  }

  /** q245: per-dimension embedding drift audit — the monitoring table an
    * embedding pipeline reads before trusting a re-embedded batch (model
    * upgrade, feature skew, silent preprocessing change): for every
    * vector dimension, count and micro-unit coordinate sum of an "old"
    * and a "new" batch (vec_id parity as the fixture's batch split), and
    * a drift flag where the mean shift exceeds 0.02. The decision is
    * EXACT and engine-independent: coordinates are fixed-pointed to
    * BIGINT micro-units once (`round(x·10⁶)`, one IEEE-identical
    * rounding in both dialects) and the mean comparison is the
    * cross-multiplied |sum_b·n_a − sum_a·n_b| > thr·n_a·n_b — no float
    * division anywhere, with the multiply in DECIMAL(38,0)/HUGEINT so
    * it cannot overflow at any corpus size (sum ~ n·10⁶ · n would pass
    * 2^63 near ~3·10⁶ vectors per side otherwise). Scale shape: one
    * `posexplode` (row count = corpus × dims, map-side) collapsed by
    * partial aggregation to dims-grain BEFORE the single exchange —
    * the final table is 64 rows at any corpus scale.
    */
  /** q245's oracle, shared verbatim with its streaming twin
    * ([[graft.streaming.StreamingQueries]] q258).
    */
  private[graft] val dimDriftOracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
      |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
      |      AS qm
      |  FROM embeddings),
      |g AS (
      |  SELECT CAST(dim AS BIGINT) AS dim,
      |    CAST(count(*) FILTER (WHERE vec_id % 2 = 0) AS BIGINT) AS n_a,
      |    CAST(count(*) FILTER (WHERE vec_id % 2 = 1) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN vec_id % 2 = 0 THEN qm ELSE 0 END) AS BIGINT)
      |      AS sum_a,
      |    CAST(sum(CASE WHEN vec_id % 2 = 1 THEN qm ELSE 0 END) AS BIGINT)
      |      AS sum_b
      |  FROM e GROUP BY 1)
      |SELECT dim, n_a, n_b, sum_a, sum_b,
      |  abs(CAST(sum_b AS HUGEINT) * n_a - CAST(sum_a AS HUGEINT) * n_b)
      |    > CAST(20000 AS HUGEINT) * n_a * n_b AS drift
      |FROM g ORDER BY dim""".stripMargin

  /** q245's engine side over any embeddings frame (batch or stream) —
    * the drift epilogue is a per-row projection, so the whole shape
    * runs inside a streaming plan unchanged.
    */
  private[graft] def dimDriftOf(
      e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("dim"),
        round(col("x").cast("double") * 1000000).cast("long").as("qm"))
      .groupBy("dim")
      .agg(
        sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("vec_id") % 2 === 0, col("qm")).otherwise(0L))
          .as("sum_a"),
        sum(when(col("vec_id") % 2 === 1, col("qm")).otherwise(0L))
          .as("sum_b"))
      .withColumn("drift",
        expr("""abs(CAST(sum_b AS DECIMAL(38,0)) * n_a
               |  - CAST(sum_a AS DECIMAL(38,0)) * n_b)
               |  > CAST(20000 AS DECIMAL(38,0)) * n_a * n_b""".stripMargin))
      .select("dim", "n_a", "n_b", "sum_a", "sum_b", "drift")

  private val q245 = GraftQuery(
    "q245_embedding_dim_drift", dimDriftOracleSql) { (s, d) =>
    dimDriftOf(Tables.embeddings(s, d)).orderBy("dim")
  }

  /** q272: EXACT isotonic calibration (PAVA) of the quality→duplication
    * curve — q255 measures P(dup | quality decile); this fits the
    * monotone NON-INCREASING curve a calibrated quality score implies
    * ("higher quality ⇒ no more duplication"), the isotonic-regression
    * step every score-calibration pipeline runs (Zadrozny & Elkan's
    * method, over deciles). Computed EXACTLY: the pool-adjacent-
    * violators solution equals the minimax characterization fit_i =
    * min_{j≤i} max_{k≥i} avg(y_j..y_k) (Barlow et al. 1972) — validated
    * against a reference PAVA in fractions — and every avg comparison is
    * a HUGEINT/DECIMAL(38,0) cross-multiplication of (Σdup, Σdocs)
    * rationals, so no float ever decides a pool boundary; the reported
    * fit is the exact rational floored to ppm. Where observed dup_ppm
    * zig-zags, fit_ppm is the isotonic pool average — the gap between
    * them IS the calibration error.
    *
    * Scale shape: everything after q255's decile rollup runs on the
    * 10-row decile frame (pairs ≤ 55, candidate grids ≤ 10³ — metadata
    * by construction); the corpus-scale work is [[dupDecileTable]], the
    * checkpointed artifact q255 and this query SHARE — built once per
    * (session, corpus), so this query adds only decile-grain cost.
    */
  private val q272 = GraftQuery(
    "q272_isotonic_calibration",
    s"""$clusterOracleChain,
       |${TextAnalysis.qualityOracleCte},
       |cs AS (SELECT cluster_id, count(*) AS sz FROM clus GROUP BY 1),
       |dup AS (
       |  SELECT c.doc_id, cs.sz >= 2 AS is_dup
       |  FROM clus c JOIN cs USING (cluster_id)),
       |rk AS (
       |  SELECT q.quality_micro, d.is_dup,
       |    row_number() OVER (ORDER BY q.quality_micro, q.doc_id) AS r,
       |    count(*) OVER () AS n
       |  FROM qual q JOIN dup d ON q.doc_id = d.doc_id),
       |dec AS (SELECT ((r - 1) * 10) // n + 1 AS decile, is_dup FROM rk),
       |dtab AS (SELECT decile, CAST(count(*) AS BIGINT) AS w,
       |    CAST(count(*) FILTER (WHERE is_dup) AS BIGINT) AS y
       |  FROM dec GROUP BY 1),
       |cums AS (SELECT decile, w, y,
       |    sum(w) OVER (ORDER BY decile) AS cw,
       |    sum(y) OVER (ORDER BY decile) AS cy
       |  FROM dtab),
       |pv AS (
       |  SELECT j.decile AS j, k.decile AS k,
       |    k.cy - j.cy + j.y AS num, k.cw - j.cw + j.w AS den
       |  FROM cums j JOIN cums k ON k.decile >= j.decile),
       |imax AS (
       |  SELECT i.decile AS i, p.j, p.k, p.num, p.den,
       |    row_number() OVER (PARTITION BY i.decile, p.j ORDER BY p.k) AS rn
       |  FROM cums i JOIN pv p ON p.j <= i.decile AND p.k >= i.decile
       |  WHERE NOT EXISTS (SELECT 1 FROM pv p2
       |    WHERE p2.j = p.j AND p2.k >= i.decile
       |      AND CAST(p2.num AS HUGEINT) * p.den
       |        > CAST(p.num AS HUGEINT) * p2.den)),
       |imax1 AS (SELECT i, j, num, den FROM imax WHERE rn = 1),
       |fmin AS (
       |  SELECT x.i, x.j, x.num, x.den,
       |    row_number() OVER (PARTITION BY x.i ORDER BY x.j) AS rn
       |  FROM imax1 x
       |  WHERE NOT EXISTS (SELECT 1 FROM imax1 x2
       |    WHERE x2.i = x.i
       |      AND CAST(x2.num AS HUGEINT) * x.den
       |        < CAST(x.num AS HUGEINT) * x2.den)),
       |fit AS (SELECT i, num, den FROM fmin WHERE rn = 1)
       |SELECT d.decile AS decile, d.w AS n_docs, d.y AS n_dup,
       |  CAST(d.y * 1000000 // d.w AS BIGINT) AS dup_ppm,
       |  CAST(CAST(f.num AS HUGEINT) * 1000000 // f.den AS BIGINT) AS fit_ppm
       |FROM dtab d JOIN fit f ON f.i = d.decile
       |ORDER BY 1""".stripMargin) { (s, d) =>
    // the corpus-scale work is q255's SHARED decile artifact; everything
    // below runs on its ≤10 rows
    val dtab = dupDecileTable(s, d)
      .select(col("decile"), col("n_docs").as("w"), col("n_dup").as("y"))
    // decile-grain from here down: ≤10 rows, windows/joins metadata-sized
    val cums = dtab
      .withColumn("cw", sum(col("w")).over(Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cy", sum(col("y")).over(Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)))
    // decile-grid joins are broadcast crosses (≤10×10 build sides) so the
    // planner can never fall back to a CartesianProduct exchange
    val pairs = cums.select(col("decile").as("j"), col("w").as("jw"),
        col("y").as("jy"), col("cw").as("jcw"), col("cy").as("jcy"))
      .crossJoin(broadcast(cums.select(col("decile").as("k"),
        col("cw").as("kcw"), col("cy").as("kcy"))))
      .where(col("k") >= col("j"))
      .select(col("j"), col("k"),
        (col("kcy") - col("jcy") + col("jy")).as("num"),
        (col("kcw") - col("jcw") + col("jw")).as("den"))
    val iGrid = cums.select(col("decile").as("i"))
      .crossJoin(broadcast(pairs))
      .where(col("j") <= col("i") && col("k") >= col("i"))
    val beatMax = pairs.select(col("j").as("j2"), col("k").as("k2"),
      col("num").as("num2"), col("den").as("den2"))
    val imax1 = iGrid.join(beatMax,
        col("j2") === col("j") && col("k2") >= col("i") &&
          expr("""CAST(num2 AS DECIMAL(38,0)) * den
                 |  > CAST(num AS DECIMAL(38,0)) * den2""".stripMargin),
        "left_anti")
      .withColumn("rn", row_number().over(
        Window.partitionBy("i", "j").orderBy("k")))
      .where(col("rn") === 1).select("i", "j", "num", "den")
    val beatMin = imax1.select(col("i").as("i2"), col("num").as("num2"),
      col("den").as("den2"))
    val fit = imax1.join(beatMin,
        col("i2") === col("i") &&
          expr("""CAST(num2 AS DECIMAL(38,0)) * den
                 |  < CAST(num AS DECIMAL(38,0)) * den2""".stripMargin),
        "left_anti")
      .withColumn("rn", row_number().over(
        Window.partitionBy("i").orderBy("j")))
      .where(col("rn") === 1).select(col("i"), col("num"), col("den"))
    dtab.join(fit, col("i") === col("decile"))
      .select(col("decile"), col("w").as("n_docs"), col("y").as("n_dup"),
        expr("CAST(y * 1000000 div w AS BIGINT)").as("dup_ppm"),
        expr("""CAST(CAST(num AS DECIMAL(38,0)) * 1000000
               |  div den AS BIGINT)""".stripMargin).as("fit_ppm"))
      .orderBy("decile")
  }

  /** q274: DIVERSIFIED top-k serving — the search-result-diversity
    * re-rank every production retrieval layer runs between scoring and
    * response: per query, candidates from the probed IVF cells are
    * capped at 2 PER LABEL (the source/site/domain cap that stops one
    * cluster from monopolizing a result page) and the survivors
    * re-ranked into a top-5. Two window passes — per-(query, label)
    * rank then per-query rank — both deterministic ((cos desc,
    * neighbor_id) total order). The cap is join-free bookkeeping on the
    * already-probed candidate set: diversity costs two windows, not a
    * second retrieval.
    *
    * Scale shape: q103's serving contract — probes ride the broadcast
    * centroid table, candidates come cell-pruned from the labeled index
    * artifact (label materialized at build, no per-query metadata
    * join), and both windows partition by query so the re-rank
    * parallelizes across the batch.
    */
  private val q274 = GraftQuery(
    "q274_diversified_topk",
    s"""WITH $kmOracleTrain, ${probesOracle(s"\n    WHERE e.vec_id < $QueryBatch")}, sim AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    lb.label AS label, ${cosSql("p", "b")} AS cos
       |  FROM probes p JOIN a2 b ON p.cell = b.cell AND p.vec_id <> b.vec_id
       |  JOIN embeddings lb ON lb.vec_id = b.vec_id),
       |capped AS (
       |  SELECT vec_id, neighbor_id, label, cos,
       |    row_number() OVER (PARTITION BY vec_id, label
       |      ORDER BY cos DESC, neighbor_id) AS lr
       |  FROM sim),
       |topd AS (
       |  SELECT vec_id, neighbor_id, label, cos,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM capped WHERE lr <= 2)
       |SELECT vec_id, neighbor_id, label, rank, round(cos, 6) AS cos_sim
       |FROM topd WHERE rank <= 5
       |ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val (c1, _) = kmTrained(s, d)
    val idx = kmTrainedLabeled(s, d)
    val probes = probeSelection(
      Tables.embeddings(s, d).select("vec_id", "embedding")
        .where(col("vec_id") < QueryBatch), c1)
    val cand = idx.select(col("vec_id").as("neighbor_id"),
      col("cell").as("cell_b"), col("embedding").as("emb_b"),
      col("label"))
    val sim = probes.join(cand,
        col("probe_cell") === col("cell_b") &&
          col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
    val wL = Window.partitionBy("vec_id", "label")
      .orderBy(col("cos").desc, col("neighbor_id"))
    val wQ = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    sim.withColumn("lr", row_number().over(wL))
      .where(col("lr") <= 2)
      .withColumn("rank", row_number().over(wQ))
      .where(col("rank") <= 5)
      .select(col("vec_id"), col("neighbor_id"), col("label"), col("rank"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** q275: Kendall-τ rank-fidelity audit — the ORDER-level counterpart
    * of the set-level recall audits (q79/q83 ask "did the quantized tier
    * find the right neighbors"; this asks "does it RANK them in the
    * right order"): per batch query, the float-cosine top-10 candidate
    * list is re-scored with the stored int8 codes, and every one of the
    * ≤45 within-list pairs is classified concordant / discordant / tied
    * against the float order. τ-a in ppm = (C − D)·10⁶ / pairs — the
    * quantization rank-distortion number that decides whether a serving
    * tier needs a float re-rank stage (q87's M ≫ k headroom exists
    * precisely because τ < 1). Both engines compute the same IEEE
    * doubles from the same integer dots, so equality/tie classification
    * is deterministic.
    *
    * Scale shape: the float top-10 is q103's cell-pruned serving join;
    * the re-score is two id equi-joins against the quantized artifact
    * (codes, never float arrays); the pair grid is 45 rows per query BY
    * CONSTRUCTION (top-10 self-join on the query key), so the τ stage
    * is batch-bounded metadata work.
    */
  private val q275 = GraftQuery(
    "q275_rank_fidelity_tau",
    s"""WITH $kmOracleTrain, ${probesOracle(s"\n    WHERE e.vec_id < $QueryBatch")},
       |${int8CodesOracle("a2")},
       |fsim AS (
       |  SELECT p.vec_id AS vec_id, b.vec_id AS neighbor_id,
       |    ${cosSql("p", "b")} AS cos
       |  FROM probes p JOIN a2 b ON p.cell = b.cell AND p.vec_id <> b.vec_id),
       |ftop AS (
       |  SELECT vec_id, neighbor_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos DESC, neighbor_id) AS fr
       |  FROM fsim QUALIFY fr <= 10),
       |scored AS (
       |  SELECT f.vec_id, f.neighbor_id, f.fr,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range(1, len(a.q)+1), i -> a.q[i] * b.q[i])),
       |      (x,y) -> x+y) AS DOUBLE)
       |      / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE)))
       |      AS qcos
       |  FROM ftop f
       |  JOIN nv a ON a.vec_id = f.vec_id
       |  JOIN nv b ON b.vec_id = f.neighbor_id
       |  WHERE a.nq > 0 AND b.nq > 0),
       |pr AS (
       |  SELECT x.vec_id,
       |    CASE WHEN x.qcos > y.qcos THEN 1 ELSE 0 END AS conc,
       |    CASE WHEN x.qcos < y.qcos THEN 1 ELSE 0 END AS disc
       |  FROM scored x JOIN scored y
       |    ON y.vec_id = x.vec_id AND x.fr < y.fr)
       |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(conc) AS BIGINT) AS concordant,
       |  CAST(sum(disc) AS BIGINT) AS discordant,
       |  CAST(count(*) - sum(conc) - sum(disc) AS BIGINT) AS ties,
       |  CAST((sum(conc) - sum(disc)) * 1000000 // count(*) AS BIGINT)
       |    AS tau_ppm
       |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val (c1, _) = kmTrained(s, d)
    val (_, a2) = kmTrained(s, d)
    val probes = probeSelection(
      Tables.embeddings(s, d).select("vec_id", "embedding")
        .where(col("vec_id") < QueryBatch), c1)
    val cand = a2.select(col("vec_id").as("neighbor_id"),
      col("cell").as("cell_b"), col("embedding").as("emb_b"))
    val wQ = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    val ftop = probes.join(cand,
        col("probe_cell") === col("cell_b") &&
          col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
      .withColumn("fr", row_number().over(wQ))
      .where(col("fr") <= 10)
      .select("vec_id", "neighbor_id", "fr")
    val qidx = kmQuantized(s, d)
    val qa = qidx.select(col("vec_id"), col("code").as("code_a"),
      col("nq").as("nq_a"))
    val qb = qidx.select(col("vec_id").as("neighbor_id"),
      col("code").as("code_b"), col("nq").as("nq_b"))
    val scored = ftop.join(qa, "vec_id").join(qb, "neighbor_id")
      .where(col("nq_a") > 0 && col("nq_b") > 0)
      .withColumn("qcos",
        VectorFunctions.int8CodeDot(col("code_a"), col("code_b"))
          .cast("double") /
          (sqrt(col("nq_a").cast("double")) * sqrt(col("nq_b").cast("double"))))
      .select("vec_id", "neighbor_id", "fr", "qcos")
    val y = scored.select(col("vec_id").as("vid2"), col("fr").as("fr2"),
      col("qcos").as("qcos2"))
    scored.join(y, col("vid2") === col("vec_id") && col("fr") < col("fr2"))
      .select(col("vec_id"),
        when(col("qcos") > col("qcos2"), 1L).otherwise(0L).as("conc"),
        when(col("qcos") < col("qcos2"), 1L).otherwise(0L).as("disc"))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_pairs"), sum(col("conc")).as("concordant"),
        sum(col("disc")).as("discordant"))
      .select(col("vec_id"), col("n_pairs"), col("concordant"),
        col("discordant"),
        (col("n_pairs") - col("concordant") - col("discordant")).as("ties"),
        expr("((concordant - discordant) * 1000000) div n_pairs")
          .as("tau_ppm"))
      .orderBy("vec_id")
  }

  /** q276: asymmetric CONTAINMENT audit — the duplication geometry
    * symmetric Jaccard cannot see: a short document quoted wholesale
    * inside a long one has |∩|/|A∪B| near zero but |∩|/|small| near one,
    * so Jaccard-thresholded dedup (q31's tier) systematically misses
    * quote-inclusion, boilerplate embedding, and partial copies
    * (Broder's original resemblance-vs-containment distinction). For
    * every LSH candidate pair this reports BOTH directional containments
    * alongside Jaccard, all in exact micro-units over the shingle sets,
    * and flags the containment-shaped pairs (either direction ≥ 0.8
    * while Jaccard < 0.5) — the rows a span-level pass (q259) or manual
    * review should visit next.
    *
    * Scale shape: q249's contract — candidates come from the shared
    * band/signature artifacts (never all-pairs), shingle arrays join
    * back per side after candidate dedup, and the pair table is
    * LSH-candidate-bounded.
    */
  private val q276 = GraftQuery(
    "q276_containment_audit",
    s"""$shingleCtes, sig AS (
       |  SELECT doc_id, shingles, $oracleSigList AS sig FROM hs
       |), bands AS (
       |  ${oracleMinhashBands(", shingles")}
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.shingles AS sha, b.shingles AS shb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3
       |   AND a.doc_id < b.doc_id
       |), scored AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(sha) AS BIGINT) AS n_a, CAST(len(shb) AS BIGINT) AS n_b,
       |    CAST(len(list_intersect(sha, shb)) AS BIGINT) AS n_common,
       |    CAST(len(list_intersect(sha, shb)) * 1000000
       |      // len(list_distinct(list_concat(sha, shb))) AS BIGINT) AS j_micro
       |  FROM pairs)
       |SELECT doc_a, doc_b, n_a, n_b, n_common, j_micro,
       |  CAST(n_common * 1000000 // n_a AS BIGINT) AS cont_ab,
       |  CAST(n_common * 1000000 // n_b AS BIGINT) AS cont_ba,
       |  (greatest(n_common * 1000000 // n_a, n_common * 1000000 // n_b)
       |    >= 800000 AND j_micro < 500000) AS flagged
       |FROM scored ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val sigs = minhashSigs(s, d)
    val pairs = minhashCandidates(sigs)
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    val sh = shingleHashes(s, d).select(col("doc_id"), col("shingles"))
      .repartition(col("doc_id"))
    pairs
      .join(sh.select(col("doc_id").as("doc_a"),
        col("shingles").as("sha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"),
        col("shingles").as("shb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(col("sha")).cast("long").as("n_a"),
        size(col("shb")).cast("long").as("n_b"),
        size(array_intersect(col("sha"), col("shb"))).cast("long")
          .as("n_common"),
        expr("""CAST(CAST(size(array_intersect(sha, shb)) AS BIGINT) * 1000000
               |  div size(array_union(sha, shb)) AS BIGINT)""".stripMargin)
          .as("j_micro"))
      .withColumn("cont_ab", expr("(n_common * 1000000) div n_a"))
      .withColumn("cont_ba", expr("(n_common * 1000000) div n_b"))
      .withColumn("flagged",
        greatest(col("cont_ab"), col("cont_ba")) >= 800000L &&
          col("j_micro") < 500000L)
      .orderBy("doc_a", "doc_b")
  }

  /** The (bands, rows-per-band) configurations q277 sweeps — every
    * factorization of the [[NumHashes]] = 12 signature, including the
    * production (4, 3) point.
    */
  private val LshSweepConfs = Seq((2, 6), (3, 4), (4, 3), (6, 2))

  /** q277: LSH band-configuration sweep — the S-curve tuning table,
    * MEASURED: for every (b, r) factorization of the 12-hash signature,
    * the candidate pairs that config would emit are scored against the
    * EXACT Jaccard ≥ 0.6 ground truth ([[exactSimilarPairs]], q196's
    * prefix-filter join — the truth is itself oracle-gated, not
    * simulated). Per config: candidates, hits, precision/recall ppm —
    * the empirical form of the 1−(1−J^r)^b tradeoff that picks b and r
    * for a corpus, next to q249's per-agreement-level calibration of
    * the same signatures. One signature artifact serves every config
    * (band keys are string renders of signature slices); nothing is
    * re-hashed per config.
    *
    * Scale shape: band rows are 12/r per doc per config off the cached
    * signature table; each config's candidate join is band-bucketed
    * (q31's contract); truth and the per-config counts meet at
    * pair grain; the 1-row truth count broadcasts.
    *
    * DELIBERATELY UNCAPPED: this sweep measures each config's TRUE
    * candidate count, so it must not apply the hot-bucket cap the
    * production dedup path uses (q85, bandedSigs' O(width) routing) —
    * capping here would understate candidates and overstate precision,
    * making the tuning table lie. The audit pays the honest quadratic
    * cost inside hot buckets ONCE per corpus; the production path it
    * tunes stays capped. Do not "fix" this into uselessness.
    */
  private val q277 = GraftQuery(
    "q277_lsh_config_sweep", {
      val bandCtes = LshSweepConfs.map { case (b, r) =>
        s"""bt_b${b}r$r AS (
           |  SELECT doc_id, t.b AS band,
           |    array_to_string(sig[t.b*$r+1:t.b*$r+$r], ',') AS key
           |  FROM sigt, range(0, $b) t(b)),
           |cd_b${b}r$r AS (
           |  SELECT DISTINCT 'b${b}r$r' AS conf, a.doc_id AS doc_a,
           |    b2.doc_id AS doc_b
           |  FROM bt_b${b}r$r a JOIN bt_b${b}r$r b2
           |    ON a.band = b2.band AND a.key = b2.key
           |   AND a.doc_id < b2.doc_id)""".stripMargin
      }.mkString(",\n")
      val candUnion = LshSweepConfs
        .map { case (b, r) => s"SELECT * FROM cd_b${b}r$r" }
        .mkString("\n  UNION ALL ")
      s"""$shingleCtes, sigt AS (
         |  SELECT doc_id, $oracleSigList AS sig FROM hs
         |),
         |$bandCtes,
         |allcand AS (
         |  $candUnion),
         |tst AS (SELECT doc_id, unnest(list_distinct(hv)) AS h FROM hs),
         |tsz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
         |  FROM tst GROUP BY 1),
         |tov AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS o
         |  FROM tst a JOIN tst b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT o.doc_a, o.doc_b FROM tov o
         |  JOIN tsz sa ON sa.doc_id = o.doc_a
         |  JOIN tsz sb ON sb.doc_id = o.doc_b
         |  WHERE 10 * o >= $PrefixJacTenths * (sa.sz + sb.sz - o)),
         |tn AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
         |scored AS (
         |  SELECT c.conf,
         |    CAST(count(*) AS BIGINT) AS n_candidates,
         |    CAST(count(t.doc_a) AS BIGINT) AS n_hits
         |  FROM allcand c LEFT JOIN truth t
         |    ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
         |  GROUP BY 1)
         |SELECT s.conf, s.n_candidates, s.n_hits, tn.n_truth,
         |  CAST(s.n_hits * 1000000 // s.n_candidates AS BIGINT)
         |    AS precision_ppm,
         |  CAST(s.n_hits * 1000000 // tn.n_truth AS BIGINT) AS recall_ppm
         |FROM scored s CROSS JOIN tn ORDER BY s.conf""".stripMargin
    }) { (s, d) =>
    val sigs = minhashSigs(s, d).select("doc_id", "sig")
    val bandRows = LshSweepConfs.map { case (b, r) =>
      sigs.select(lit(s"b${b}r$r").as("conf"), col("doc_id"),
        explode(expr(
          s"""transform(sequence(0, ${b - 1}), i ->
             |  struct(i AS band,
             |    array_join(slice(sig, i*$r+1, $r), ',') AS key))"""
            .stripMargin)).as("bk"))
        .select(col("conf"), col("doc_id"), col("bk.band").as("band"),
          col("bk.key").as("key"))
    }.reduce(_ unionAll _)
    val cand = bandRows
      .select(col("conf"), col("band"), col("key"),
        col("doc_id").as("doc_a"))
      .join(bandRows.select(col("conf"), col("band"), col("key"),
        col("doc_id").as("doc_b")), Seq("conf", "band", "key"))
      .where(col("doc_a") < col("doc_b"))
      .select("conf", "doc_a", "doc_b").distinct()
    val truth = exactSimilarPairs(s, d).select("doc_a", "doc_b")
      .localCheckpoint(eager = true)
    val tn = truth.agg(count(lit(1)).as("n_truth"))
    cand.join(truth.withColumn("hit", lit(1L)), Seq("doc_a", "doc_b"),
        "left")
      .groupBy("conf")
      .agg(count(lit(1)).as("n_candidates"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .crossJoin(broadcast(tn))
      .select(col("conf"), col("n_candidates"), col("n_hits"),
        col("n_truth"),
        expr("(n_hits * 1000000) div n_candidates").as("precision_ppm"),
        expr("(n_hits * 1000000) div n_truth").as("recall_ppm"))
      .orderBy("conf")
  }

  /** q278: SURVIVORSHIP merge (golden-record construction) — the MDM
    * step after q116's canonical pick: a duplicate cluster collapses to
    * ONE merged record whose fields follow explicit survivorship rules
    * — keeper id by quality (q116's exact pick), first-seen id (min
    * doc_id), recency proxy (max doc_id), best quality, total chars,
    * source/lang coverage as counts plus a deterministic sorted-CSV
    * lang render. Every rule is an order-pinned aggregate, so the
    * golden record is reproducible — survivorship that depends on
    * evaluation order is an MDM bug, and this formulation cannot
    * express one.
    *
    * Scale shape: one cluster_id hash aggregate over the shared cluster
    * artifact joined to doc metadata; singleton clusters are filtered
    * pre-aggregate (the report is about merges); the lang CSV is a
    * bounded-domain collect (≤5 langs) — never document text.
    */
  private val q278 = GraftQuery(
    "q278_survivorship_merge",
    s"""$clusterOracleChain,
       |${TextAnalysis.qualityOracleCte},
       |cs AS (SELECT cluster_id, count(*) AS sz FROM clus GROUP BY 1),
       |m AS (
       |  SELECT c.cluster_id, d.doc_id, d.source, d.lang, d.n_chars,
       |    q.quality_micro
       |  FROM clus c
       |  JOIN cs ON cs.cluster_id = c.cluster_id AND cs.sz >= 2
       |  JOIN documents d ON d.doc_id = c.doc_id
       |  JOIN qual q ON q.doc_id = c.doc_id)
       |SELECT cluster_id,
       |  CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(min(doc_id) AS BIGINT) AS first_seen,
       |  CAST(max(doc_id) AS BIGINT) AS last_seen,
       |  CAST(max(quality_micro) AS BIGINT) AS best_quality,
       |  CAST((min(struct_pack(nq := -quality_micro, d := doc_id))).d
       |    AS BIGINT) AS keeper_doc,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |  array_to_string(list_sort(list_distinct(list(lang))), ',') AS langs
       |FROM m GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val qual = TextAnalysis.qualityBase(s, d)
      .select(col("doc_id"), TextAnalysis.qualityMicroCol.as("quality_micro"))
    val ca = clusterAssignments(s, d)
    val members = ca
      .join(ca.groupBy("cluster_id").agg(count(lit(1)).as("sz")),
        "cluster_id")
      .where(col("sz") >= 2)
      .join(Tables.documents(s, d)
        .select("doc_id", "source", "lang", "n_chars"), "doc_id")
      .join(qual, "doc_id")
    members.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        min(col("doc_id")).as("first_seen"),
        max(col("doc_id")).as("last_seen"),
        max(col("quality_micro")).as("best_quality"),
        min(struct((col("quality_micro") * -1).as("nq"),
          col("doc_id").as("d"))).as("pick"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("source")).as("n_sources"),
        concat_ws(",", array_sort(array_distinct(collect_list(col("lang")))))
          .as("langs"))
      .select(col("cluster_id"), col("n_members"), col("first_seen"),
        col("last_seen"), col("best_quality"), col("pick.d").as("keeper_doc"),
        col("total_chars"), col("n_sources"), col("langs"))
      .orderBy("cluster_id")
  }

  // ---- k-core peeling of the duplicate graph (q291) --------------------

  private val KCoreK = 2
  private val KCoreRounds = 4

  /** q291: k-core PEELING of the duplicate graph — the degeneracy trim
    * next to PageRank (q164), triangles (q187), label propagation (q195)
    * and CC (q52): [[KCoreRounds]] simultaneous peel rounds remove every
    * node with degree < [[KCoreK]] and re-count, converging toward the
    * 2-core (the cyclically-duplicated backbone — template/boilerplate
    * families — as opposed to one-off pairs, which peel off immediately).
    * Rounds are SIMULTANEOUS (all sub-degree nodes drop together, then
    * degrees recompute), so the round census is deterministic and
    * engine-independent; the audit reports the per-round residual rather
    * than claiming a fixpoint — a fifth-round candidate would show as
    * surviving_nodes still moving.
    *
    * Scale shape: the corpus reduces once to the shared minhash-candidate
    * edge artifact; each round is one key-grain degree aggregate + two
    * semi-joins on the (shrinking, re-checkpointed) symmetric edge set —
    * R passes over EDGES, never the corpus; the per-round survivors/edge
    * counts are bounded driver scalars (q252's contract).
    */
  private val q291 = GraftQuery(
    "q291_kcore_peeling",
    s"""$edgeOracleChain,
       |s0 AS (SELECT DISTINCT u AS n FROM edges),
       |e0 AS (SELECT u, v FROM edges),
       |${(1 to KCoreRounds).map { r =>
          s"""s$r AS (SELECT u AS n FROM e${r - 1} GROUP BY u
             |  HAVING count(*) >= $KCoreK),
             |e$r AS (SELECT e.u, e.v FROM e${r - 1} e
             |  JOIN s$r a ON e.u = a.n JOIN s$r b ON e.v = b.n)""".stripMargin
        }.mkString(",\n")}
       |SELECT * FROM (${(1 to KCoreRounds).map { r =>
          s"""SELECT CAST($r AS BIGINT) AS round,
             |  CAST((SELECT count(*) FROM s$r) AS BIGINT) AS surviving_nodes,
             |  CAST((SELECT count(*) FROM s${r - 1})
             |    - (SELECT count(*) FROM s$r) AS BIGINT) AS removed_nodes,
             |  CAST((SELECT count(*) FROM e$r) // 2 AS BIGINT)
             |    AS surviving_edges""".stripMargin
        }.mkString(" UNION ALL ")})
       |ORDER BY round""".stripMargin) { (s, d) =>
    val pairs = minhashCandidates(minhashSigs(s, d))
      .where(expr(sigMatchPredicate))
      .select(col("doc_a"), col("doc_b")).distinct()
    var sym = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .localCheckpoint()
    var prevNodes = sym.select("u").distinct().count()
    val rows = (1 to KCoreRounds).map { r =>
      val surv = sym.groupBy("u").agg(count(lit(1)).as("c"))
        .where(col("c") >= KCoreK).select(col("u").as("n"))
        .localCheckpoint()
      sym = sym
        .join(surv.select(col("n").as("u")), Seq("u"), "left_semi")
        .join(surv.select(col("n").as("v")), Seq("v"), "left_semi")
        .select("u", "v").localCheckpoint()
      val sn = surv.count()
      val out = (r.toLong, sn, prevNodes - sn, sym.count() / 2)
      prevNodes = sn
      out
    }
    s.createDataFrame(rows)
      .toDF("round", "surviving_nodes", "removed_nodes", "surviving_edges")
      .orderBy("round")
  }

  // ---- matryoshka prefix-dimension recall sweep (q294) -----------------

  /** The prefix lengths q294 sweeps; 64 is the full dimension (truth). */
  private val MrlPrefixes = Seq(8, 16, 32, 64)

  /** q294: MATRYOSHKA prefix-dimension recall sweep — the
    * dimension-truncation audit for MRL-style embeddings (Kusupati et
    * al.: serve the FIRST m dims of the stored vector, no projection
    * matrix, no re-encode): per prefix length, top-10 cosine recall
    * against the full-dimension truth over the bounded query batch
    * (q44's contract). This is the decision input for prefix-tiered
    * serving (coarse prefix scan → full-dim re-rank, the JL tier
    * q154/q155's storage-free sibling) — AND the detector for whether
    * the embedding model actually has matryoshka structure: an
    * MRL-trained model concentrates signal in the prefix (recall@32 near
    * 1), while these synthetic isotropic vectors measure recall ≈ m/64
    * — the honest "do not ship prefix serving on this model" answer.
    *
    * ONE pair pass (r16 VERDICT item 1): because the prefixes are
    * NESTED (8 ⊂ 16 ⊂ 32 ⊂ 64), the codegen [[PrefixCosinesKernel]]
    * emits all 4 tiers' cosines from a single traversal's running
    * dot/norm² accumulators — the pair table is materialized ONCE and
    * `posexplode` fans the tiers out, replacing the former 4× pair
    * duplication × 3 interpreted `aggregate(sequence(1,m))` folds per
    * copy (~12 interpreted array walks per pair) with one loop.
    * Accumulation order and the final division are bit-identical to the
    * HOF form and the oracle's `list_reduce`, so the hash is unchanged.
    * One rank per (m, query); the truth tier is the m=64 slice of the
    * SAME frame, so truth and tiers can never diverge in arithmetic.
    */
  private val q294 = GraftQuery(
    "q294_matryoshka_recall",
    s"""WITH qv AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id < $QueryBatch),
       |ms(m) AS (VALUES ${MrlPrefixes.map(m => s"($m)").mkString(", ")}),
       |sim AS (
       |  SELECT ms.m, qv.vec_id, c.vec_id AS neighbor_id,
       |    list_reduce(list_transform(range(1, ms.m + 1),
       |      i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (x,y)->x+y)
       |    / (sqrt(list_reduce(list_transform(range(1, ms.m + 1),
       |        i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(qv.embedding[i] AS DOUBLE)), (x,y)->x+y))
       |     * sqrt(list_reduce(list_transform(range(1, ms.m + 1),
       |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)), (x,y)->x+y))) AS cos
       |  FROM qv JOIN embeddings c ON qv.vec_id <> c.vec_id CROSS JOIN ms),
       |top AS (SELECT m, vec_id, neighbor_id FROM (
       |  SELECT m, vec_id, neighbor_id,
       |    row_number() OVER (PARTITION BY m, vec_id
       |      ORDER BY cos DESC, neighbor_id) AS rk
       |  FROM sim) WHERE rk <= 10),
       |truth AS (SELECT vec_id, neighbor_id FROM top WHERE m = 64),
       |hits AS (SELECT t.m, CAST(count(*) AS BIGINT) AS hits FROM top t
       |  JOIN truth u USING (vec_id, neighbor_id) WHERE t.m <> 64
       |  GROUP BY 1),
       |nq AS (SELECT CAST(count(*) AS BIGINT) AS nq FROM qv)
       |SELECT CAST(h.m AS BIGINT) AS m, nq.nq AS n_queries, h.hits,
       |  CAST(h.hits * 1000000 // (nq.nq * 10) AS BIGINT) AS recall_ppm
       |FROM hits h CROSS JOIN nq ORDER BY m""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
    val qv = broadcast(e.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("embedding").as("emb_q")))
    val w = Window.partitionBy("m", "vec_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    // ONE batch×corpus pair pass: the nested prefixes share their partial
    // sums, so prefix_cosines emits all |MrlPrefixes| tiers from a single
    // codegen traversal (bit-identical to the per-tier HOF folds it
    // replaced — same accumulation order, same final division), and
    // posexplode fans the 4 tiers out WITHOUT duplicating the pair table.
    val top = qv
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("emb_c")), col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        posexplode(VectorFunctions.prefixCosines(
          col("emb_q"), col("emb_c"), MrlPrefixes)))
      .select(col("vec_id"), col("neighbor_id"),
        element_at(typedLit(MrlPrefixes.toArray), col("pos") + 1).as("m"),
        col("col").as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10)
      .select(col("m"), col("vec_id"), col("neighbor_id"))
    val truth = top.where(col("m") === 64)
      .select(col("vec_id"), col("neighbor_id"))
    val hits = top.where(col("m") =!= 64)
      .join(truth, Seq("vec_id", "neighbor_id"))
      .groupBy("m").agg(count(lit(1)).as("hits"))
    val nq = qv.agg(count(lit(1)).as("nq"))
    hits.crossJoin(broadcast(nq))
      .select(col("m").cast("long").as("m"), col("nq").as("n_queries"),
        col("hits"), expr("(hits * 1000000) div (nq * 10)").as("recall_ppm"))
      .orderBy("m")
  }

  // ---- k-occurrence hubness audit (q296) -------------------------------

  /** q296: HUBNESS audit — the k-occurrence distribution N_10(x) = "in
    * how many result lists does vector x appear", the classic
    * high-dimensional ANN pathology detector (Radovanović et al.): as
    * intrinsic dimensionality grows, a few "hub" points crowd into
    * everyone's top-k while antihubs (k_occ = 0) never surface, which
    * silently biases any retrieval-augmented pipeline toward the hubs.
    * Output is the full k-occurrence histogram over the corpus
    * (including the 0-occurrence antihub row — the left join keeps
    * them) with each level's share of total result slots in ppm; a
    * healthy isotropic space concentrates mass near k_occ ≈
    * k·batch/corpus, a hubby one grows a long right tail.
    *
    * The result lists audited are the bounded-batch exact top-10 (the
    * q44/q207 truth contract); at production the SAME two metadata
    * aggregates run over the serving tier's logged result lists — the
    * histogram is (distinct k_occ)-rows, the occurrence count is one
    * broadcast join of the batch×10 list table against corpus ids.
    */
  private val q296 = GraftQuery(
    "q296_hubness_audit",
    s"""WITH q AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < $QueryBatch),
       |sim AS (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id, ${cosSql("a", "b")} AS cos
       |  FROM q a JOIN embeddings b ON a.vec_id <> b.vec_id),
       |top AS (
       |  SELECT vec_id, neighbor_id FROM (
       |    SELECT vec_id, neighbor_id,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY cos DESC, neighbor_id) AS rk
       |    FROM sim) t WHERE rk <= 10),
       |occ AS (
       |  SELECT e.vec_id, CAST(count(t.vec_id) AS BIGINT) AS k_occ
       |  FROM embeddings e LEFT JOIN top t ON t.neighbor_id = e.vec_id
       |  GROUP BY 1),
       |hist AS (
       |  SELECT k_occ, CAST(count(*) AS BIGINT) AS n_vectors
       |  FROM occ GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_slots FROM top)
       |SELECT h.k_occ, h.n_vectors,
       |  CAST(h.k_occ * h.n_vectors AS BIGINT) AS slots,
       |  CAST((h.k_occ * h.n_vectors * 1000000) // t.total_slots AS BIGINT)
       |    AS slots_ppm
       |FROM hist h CROSS JOIN tot t ORDER BY k_occ""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val q = broadcast(e.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("embedding").as("emb_a")))
    val b = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("emb_b"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc,
      col("neighbor_id"))
    val top = q.join(b, col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10)
      .select(col("vec_id"), col("neighbor_id"))
    val occ = e.select(col("vec_id"))
      .join(broadcast(top.select(col("neighbor_id").as("vec_id"),
        lit(1L).as("one"))), Seq("vec_id"), "left")
      .groupBy("vec_id").agg(count(col("one")).as("k_occ"))
    val hist = occ.groupBy("k_occ").agg(count(lit(1)).as("n_vectors"))
    val tot = top.agg(count(lit(1)).as("total_slots"))
    hist.crossJoin(broadcast(tot))
      .select(col("k_occ"), col("n_vectors"),
        (col("k_occ") * col("n_vectors")).as("slots"),
        expr("(k_occ * n_vectors * 1000000) div total_slots").as("slots_ppm"))
      .orderBy("k_occ")
  }

  // ---- hard-positive mining (q317) -------------------------------------

  /** q317: HARD-POSITIVE mining — the contrastive-training complement
    * to q104's hard negatives: pairs the DEDUP tier says are the same
    * content (same q52 connected-component cluster) whose EMBEDDINGS
    * disagree (lowest cosine) — exactly the gradient-bearing positives
    * for embedding training, because a pair the text pipeline proves
    * duplicated but the vector space has far apart is a measured
    * embedding-model failure. The miner is candidate-bounded by
    * construction: pairs expand only INSIDE clusters of size 2..32
    * (the same hot-family cap discipline as q85 — boilerplate
    * mega-clusters contribute near-identical members whose positives
    * carry no extra signal, and capping them is what keeps the pair
    * expansion linear in cluster count), and the global bottom-20 by
    * cosine rides TakeOrderedAndProject. Doc↔vector alignment is the
    * q95 id contract.
    */
  private val q317 = GraftQuery(
    "q317_hard_positives",
    s"""$clusterOracleChain,
       |cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
       |  FROM clus GROUP BY 1),
       |cc AS (
       |  SELECT c.doc_id, c.cluster_id FROM clus c
       |  JOIN cs ON cs.cluster_id = c.cluster_id
       |  WHERE cs.size BETWEEN 2 AND 32),
       |pr AS (
       |  SELECT a.cluster_id, a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM cc a JOIN cc b
       |    ON a.cluster_id = b.cluster_id AND a.doc_id < b.doc_id),
       |sc AS (
       |  SELECT pr.cluster_id, pr.doc_a, pr.doc_b,
       |    ${cosSql("ea", "eb")} AS cos
       |  FROM pr JOIN embeddings ea ON ea.vec_id = pr.doc_a
       |  JOIN embeddings eb ON eb.vec_id = pr.doc_b)
       |SELECT cluster_id, doc_a, doc_b, round(cos, 6) AS cos
       |FROM sc ORDER BY cos, doc_a, doc_b LIMIT 20""".stripMargin) {
    (s, d) =>
      VectorFunctions.register(s)
      val clus = clusterAssignments(s, d)
      val cs = clus.groupBy("cluster_id").agg(count(lit(1)).as("size"))
      val cc = clus
        .join(cs.where(col("size").between(2, 32)).select("cluster_id"),
          "cluster_id")
        .select(col("cluster_id"), col("doc_id"))
      val pr = cc.select(col("cluster_id"), col("doc_id").as("doc_a"))
        .join(cc.select(col("cluster_id"), col("doc_id").as("doc_b")),
          Seq("cluster_id"))
        .where(col("doc_a") < col("doc_b"))
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      pr.join(e.select(col("vec_id").as("doc_a"),
          col("embedding").as("emb_a")), "doc_a")
        .join(e.select(col("vec_id").as("doc_b"),
          col("embedding").as("emb_b")), "doc_b")
        .withColumn("cos",
          VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
        .select(col("cluster_id"), col("doc_a"), col("doc_b"),
          round(col("cos"), 6).as("cos"))
        .orderBy(col("cos"), col("doc_a"), col("doc_b"))
        .limit(20)
  }

  // ---- nDCG@10 retrieval quality (q298) --------------------------------

  /** Position-discount weights for q298, PRE-SCALED TO INTEGERS in the
    * driver: w_r = round(10^9 / log2(r+1)) for r = 1..10, and their
    * prefix sums for the ideal DCG. The float log2 is evaluated ONCE
    * here and injected into BOTH dialects as BIGINT literals, so DCG
    * sums are integer-exact in any shuffle order — q207's lcm trick
    * generalized to irrational weights.
    */
  private val NdcgW: Seq[Long] = (1 to 10).map(r =>
    math.round(1e9 / (math.log(r + 1.0) / math.log(2.0))))
  private val NdcgPS: Seq[Long] = NdcgW.scanLeft(0L)(_ + _).tail
  private def ndcgWCase(rank: String): String =
    s"CASE $rank ${(1 to 10).map(r => s"WHEN $r THEN ${NdcgW(r - 1)}")
      .mkString(" ")} END"
  private def ndcgPsCase(h: String): String =
    s"CASE $h ${(1 to 10).map(r => s"WHEN $r THEN ${NdcgPS(r - 1)}")
      .mkString(" ")} END"

  /** q298: nDCG@10 — the graded companion to q207's MRR over the same
    * bounded-batch exact top-10 (same-label = relevant, the fixture's
    * proxy): per query, DCG = Σ_hits w_rank and IDCG = the prefix sum
    * at min(10, corpus relevant count), both BIGINTs via [[NdcgW]], so
    * the per-query ratio is the ONLY float op and it happens at query
    * grain. The summary emits both averaging conventions — micro
    * (Σdcg/Σidcg, integer-exact to the final division) and macro (mean
    * of per-query ppm ratios, integer because each ratio is rounded to
    * ppm BEFORE the sum) — because they genuinely differ when label
    * frequencies are skewed and a retrieval report should say which it
    * quotes. Corpus label counts are a label-grain aggregate broadcast
    * onto the query batch; everything downstream of the one brute-force
    * truth pass (the q44 contract) is metadata-sized.
    */
  private val q298 = GraftQuery(
    "q298_retrieval_ndcg",
    s"""WITH q AS (
       |  SELECT vec_id, embedding, label FROM embeddings
       |  WHERE vec_id < $QueryBatch),
       |lc AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings
       |  GROUP BY 1),
       |sim AS (
       |  SELECT a.vec_id, a.label AS ql, b.label AS nl, b.vec_id AS neighbor_id,
       |    ${cosSql("a", "b")} AS cos
       |  FROM q a JOIN embeddings b ON a.vec_id <> b.vec_id),
       |top AS (
       |  SELECT vec_id, ql, nl, rank FROM (
       |    SELECT vec_id, ql, nl,
       |      row_number() OVER (PARTITION BY vec_id
       |        ORDER BY cos DESC, neighbor_id) AS rank
       |    FROM sim) t WHERE rank <= 10),
       |dcg AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN nl = ql THEN ${ndcgWCase("rank")}
       |      ELSE 0 END) AS BIGINT) AS dcg
       |  FROM top GROUP BY 1),
       |perq AS (
       |  SELECT g.vec_id, g.dcg,
       |    ${ndcgPsCase(
             "(CASE WHEN lc.n - 1 < 10 THEN lc.n - 1 ELSE 10 END)")} AS idcg
       |  FROM dcg g JOIN q ON q.vec_id = g.vec_id
       |  JOIN lc ON lc.label = q.label)
       |SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |  CAST(sum(dcg) AS BIGINT) AS dcg_sum,
       |  CAST(sum(idcg) AS BIGINT) AS idcg_sum,
       |  CAST(sum(dcg) * 1000000 // sum(idcg) AS BIGINT) AS micro_ndcg_ppm,
       |  CAST(sum((dcg * 1000000) // idcg) // count(*) AS BIGINT)
       |    AS macro_ndcg_ppm
       |FROM perq""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding", "label")
    val q = broadcast(e.where(col("vec_id") < QueryBatch)
      .select(col("vec_id"), col("embedding").as("emb_a"),
        col("label").as("ql")))
    val lc = e.groupBy("label").agg(count(lit(1)).as("n"))
    val b = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("emb_b"), col("label").as("nl"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc,
      col("neighbor_id"))
    val top = q.join(b, col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 10)
      .select(col("vec_id"), col("ql"), col("nl"), col("rank"))
    val dcg = top.groupBy("vec_id")
      .agg(sum(when(col("nl") === col("ql"), expr(ndcgWCase("rank")))
        .otherwise(0L)).as("dcg"))
    val perq = dcg
      .join(q.select(col("vec_id"), col("ql").as("label")), "vec_id")
      .join(broadcast(lc), "label")
      .select(col("vec_id"), col("dcg"),
        expr(ndcgPsCase(
          "(CASE WHEN n - 1 < 10 THEN n - 1 ELSE 10 END)")).as("idcg"))
    perq.agg(count(lit(1)).as("n_queries"), sum(col("dcg")).as("dcg_sum"),
        sum(col("idcg")).as("idcg_sum"),
        sum(expr("(dcg * 1000000) div idcg")).as("macro_sum"))
      .select(col("n_queries"), col("dcg_sum"), col("idcg_sum"),
        expr("(dcg_sum * 1000000) div idcg_sum").as("micro_ndcg_ppm"),
        expr("macro_sum div n_queries").as("macro_ndcg_ppm"))
  }

  // ---- whitening-vs-raw retrieval audit (q302) -------------------------

  /** q302: embedding WHITENING audit — does per-dimension
    * standardization (x−μ)/σ change what retrieval returns, and does it
    * help? The preprocessing decision behind "whiten before indexing"
    * (Su et al.'s BERT-whitening line of work, diagonal case), answered
    * by measurement on this corpus: top-10 by whitened cosine vs top-10
    * by raw cosine over the bounded query batch, scored by (a) overlap
    * between the two answer sets and (b) same-label precision@10 of
    * each — so the output says both HOW MUCH the ranking moved and
    * WHETHER it moved toward relevance.
    *
    * The float trap: per-dimension corpus means/variances are
    * cross-row float sums, which no two shuffle orders reduce
    * identically. Dodged by the repo's integer-state discipline: each
    * value is scaled to the exact integer round(x·2^20), the per-dim
    * sums and sums-of-squares are BIGINTs (order-free), and μ/σ come
    * out of those exact integers through one deterministic double
    * division each — the scale cancels in (xs−μ_s)/σ_s, so whitening
    * runs entirely in scaled space. Stats are a 64-row aggregate
    * collapsed to ONE broadcast row of (μ, σ) arrays; whitening is
    * map-side; the ranking pass is the one q44-contract brute-force.
    */
  private val q302 = GraftQuery(
    "q302_whitening_audit",
    s"""WITH ds AS (
       |  SELECT i,
       |    sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1048576)
       |      AS BIGINT)) AS s1,
       |    sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1048576)
       |      AS BIGINT) * CAST(round(CAST(embedding[i] AS DOUBLE) * 1048576)
       |      AS BIGINT)) AS s2,
       |    count(*) AS n
       |  FROM embeddings CROSS JOIN range(1, 65) t(i) GROUP BY 1),
       |dm AS (
       |  SELECT i, CAST(s1 AS DOUBLE) / n AS mu,
       |    sqrt(CAST(s2 AS DOUBLE) / n
       |      - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS sd
       |  FROM ds),
       |st AS (SELECT list(mu ORDER BY i) AS mu, list(sd ORDER BY i) AS sd
       |  FROM dm),
       |wv AS (
       |  SELECT vec_id, label,
       |    list_transform(range(1, 65), i ->
       |      (round(CAST(embedding[i] AS DOUBLE) * 1048576) - st.mu[i])
       |        / st.sd[i]) AS w
       |  FROM embeddings CROSS JOIN st),
       |q AS (SELECT vec_id, embedding, label FROM embeddings
       |  WHERE vec_id < $QueryBatch),
       |qw AS (SELECT vec_id, label, w FROM wv WHERE vec_id < $QueryBatch),
       |rawtop AS (
       |  SELECT vec_id, neighbor_id, nl FROM (
       |    SELECT a.vec_id, b.vec_id AS neighbor_id, b.label AS nl,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${cosSql("a", "b")} DESC, b.vec_id) AS rk
       |    FROM q a JOIN embeddings b ON a.vec_id <> b.vec_id) t
       |  WHERE rk <= 10),
       |whitetop AS (
       |  SELECT vec_id, neighbor_id, nl FROM (
       |    SELECT a.vec_id, b.vec_id AS neighbor_id, b.label AS nl,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${cosSql("a", "b", "w")} DESC, b.vec_id) AS rk
       |    FROM qw a JOIN wv b ON a.vec_id <> b.vec_id) t
       |  WHERE rk <= 10),
       |ql AS (SELECT vec_id, label FROM q),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q),
       |ov AS (
       |  SELECT CAST(count(*) AS BIGINT) AS overlap
       |  FROM rawtop r JOIN whitetop w
       |    ON r.vec_id = w.vec_id AND r.neighbor_id = w.neighbor_id),
       |rh AS (
       |  SELECT CAST(count(*) AS BIGINT) AS raw_hits
       |  FROM rawtop t JOIN ql ON ql.vec_id = t.vec_id
       |  WHERE t.nl = ql.label),
       |wh AS (
       |  SELECT CAST(count(*) AS BIGINT) AS white_hits
       |  FROM whitetop t JOIN ql ON ql.vec_id = t.vec_id
       |  WHERE t.nl = ql.label)
       |SELECT m.n_queries, ov.overlap,
       |  CAST(ov.overlap * 1000000 // (m.n_queries * 10) AS BIGINT)
       |    AS overlap_ppm,
       |  rh.raw_hits,
       |  CAST(rh.raw_hits * 1000000 // (m.n_queries * 10) AS BIGINT)
       |    AS raw_prec_ppm,
       |  wh.white_hits,
       |  CAST(wh.white_hits * 1000000 // (m.n_queries * 10) AS BIGINT)
       |    AS white_prec_ppm
       |FROM m CROSS JOIN ov CROSS JOIN rh CROSS JOIN wh""".stripMargin) {
    (s, d) =>
      VectorFunctions.register(s)
      val e = Tables.embeddings(s, d).select("vec_id", "embedding", "label")
      val dm = e.select(posexplode(col("embedding")).as(Seq("p", "x")))
        .select((col("p") + 1).as("i"),
          expr("CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)").as("xs"))
        .groupBy("i").agg(sum(col("xs")).as("s1"),
          sum(col("xs") * col("xs")).as("s2"), count(lit(1)).as("n"))
        .select(col("i"), (col("s1").cast("double") / col("n")).as("mu"),
          sqrt(col("s2").cast("double") / col("n")
            - (col("s1").cast("double") / col("n"))
              * (col("s1").cast("double") / col("n"))).as("sd"))
      val st = broadcast(dm.agg(
        expr("transform(sort_array(collect_list(struct(i, mu))), s -> s.mu)")
          .as("mu"),
        expr("transform(sort_array(collect_list(struct(i, sd))), s -> s.sd)")
          .as("sd")))
      val wv = e.crossJoin(st)
        .select(col("vec_id"), col("label"),
          expr("""transform(sequence(1, 64), i ->
            |  (round(CAST(element_at(embedding, i) AS DOUBLE) * 1048576)
            |    - element_at(mu, i)) / element_at(sd, i))""".stripMargin)
            .as("w"))
      // codegen double-cosine kernel, not the interpreted 3-fold HOF
      // form: identical accumulation order and final division (the
      // CosineSimDKernel contract), so the pinned hash is unchanged
      // while the batch×corpus pair pass stays inside codegen — the
      // q294 fusion lesson applied to this query's hot path
      val wCos = VectorFunctions.cosineSimD(col("wa"), col("wb"))
      val wr = Window.partitionBy("vec_id").orderBy(col("cos").desc,
        col("neighbor_id"))
      val qRaw = broadcast(e.where(col("vec_id") < QueryBatch)
        .select(col("vec_id"), col("embedding").as("emb_a"),
          col("label").as("ql")))
      val rawtop = qRaw
        .join(e.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("emb_b"), col("label").as("nl")),
          col("vec_id") =!= col("neighbor_id"))
        .withColumn("cos",
          VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
        .withColumn("rk", row_number().over(wr)).where(col("rk") <= 10)
        .select(col("vec_id"), col("neighbor_id"), col("nl"))
      val qW = broadcast(wv.where(col("vec_id") < QueryBatch)
        .select(col("vec_id"), col("w").as("wa")))
      val whitetop = qW
        .join(wv.select(col("vec_id").as("neighbor_id"),
          col("w").as("wb"), col("label").as("nl")),
          col("vec_id") =!= col("neighbor_id"))
        .withColumn("cos", wCos)
        .withColumn("rk", row_number().over(wr)).where(col("rk") <= 10)
        .select(col("vec_id"), col("neighbor_id"), col("nl"))
      val ql = e.where(col("vec_id") < QueryBatch)
        .select(col("vec_id"), col("label"))
      val m = ql.agg(count(lit(1)).as("n_queries"))
      val ov = rawtop.join(whitetop.select("vec_id", "neighbor_id"),
          Seq("vec_id", "neighbor_id"))
        .agg(count(lit(1)).as("overlap"))
      val rh = rawtop.join(ql, "vec_id").where(col("nl") === col("label"))
        .agg(count(lit(1)).as("raw_hits"))
      val wh = whitetop.join(ql, "vec_id").where(col("nl") === col("label"))
        .agg(count(lit(1)).as("white_hits"))
      m.crossJoin(broadcast(ov)).crossJoin(broadcast(rh))
        .crossJoin(broadcast(wh))
        .select(col("n_queries"), col("overlap"),
          expr("(overlap * 1000000) div (n_queries * 10)").as("overlap_ppm"),
          col("raw_hits"),
          expr("(raw_hits * 1000000) div (n_queries * 10)").as("raw_prec_ppm"),
          col("white_hits"),
          expr("(white_hits * 1000000) div (n_queries * 10)")
            .as("white_prec_ppm"))
  }

  // ---- spectral-gap probe (q321) ---------------------------------------

  /** The fixed-point scale shared by q321's covariance and iteration
    * arithmetic (q302's round(x·2²⁰) discipline).
    */
  private val SgQ = 1048576L

  /** q321: SPECTRAL-GAP probe — dominant-eigenvector power iteration
    * over the embedding covariance, run ENTIRELY in exact integer
    * arithmetic so both engines agree bit-for-bit: values scale to
    * round(x·2²⁰) BIGINTs, the centered second-moment matrix is
    * C = n·Σxᵢxⱼ − ΣxᵢΣxⱼ in DECIMAL(38,0)/HUGEINT (q237's overflow
    * discipline), and each of the 4 pinned iterations renormalizes by
    * the ∞-norm with a sign-split integer division (q318's CASE shape) —
    * no sqrt, no float, no order-dependence. Output: the iterate's
    * loadings, the Rayleigh-style explained-variance share
    * (λ̂/trace, ppm), and the iteration-3→4 delta of that share as the
    * CONVERGENCE diagnostic. The honest q294-style reading on this
    * corpus: explained_ppm ≈ 23k vs the 15625 ppm isotropy floor (1/64)
    * with a nonzero delta — a near-flat spectrum, so PCA projection /
    * spectral tiering would buy little here, and the probe SAYS so
    * rather than assuming structure. On an anisotropic corpus the same
    * probe converges (delta → 0) and reads out the top direction.
    *
    * Scale shape: the ONLY corpus-grain work is two map-side aggregates
    * — the 2080-cell upper-triangle moment matrix via a ROW-LOCAL pair
    * expansion (no self-join: each row explodes its own d(d+1)/2
    * products, partial aggregation collapses them before any shuffle)
    * and the 64-cell column-sum vector. The centering join and the
    * power iteration run on the d²-bounded (dimension-domain, never
    * corpus-domain) matrix — a bounded driver read under the k-means
    * centroid-collect contract, exact BigInt. At 1e9 rows the moment
    * cells reach ~1e21 and C·v terms ~1e36 — inside DECIMAL(38,0);
    * rescale Q before d > 64 pushes past it.
    */
  private val q321 = GraftQuery(
    "q321_spectral_gap_probe",
    {
      def it(k: Int): String =
        s"""w$k AS (SELECT cm.i, sum(cm.c * v.v) AS w
           |  FROM cm JOIN v${k - 1} v ON v.i = cm.j GROUP BY 1),
           |m$k AS (SELECT max(abs(w)) AS m FROM w$k),
           |v$k AS (SELECT i, CASE WHEN w >= 0 THEN (w * $SgQ) // m
           |  ELSE -((-w * $SgQ) // m) END AS v FROM w$k, m$k)""".stripMargin
      s"""WITH xs AS (
         |  SELECT vec_id, t.i AS i,
         |    CAST(round(CAST(embedding[t.i] AS DOUBLE) * $SgQ) AS BIGINT)
         |      AS x
         |  FROM embeddings, range(1, 65) t(i)),
         |sv AS (SELECT i, CAST(sum(x) AS HUGEINT) AS s FROM xs GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
         |su AS (SELECT a.i AS i, b.i AS j,
         |    CAST(sum(a.x * b.x) AS HUGEINT) AS sij
         |  FROM xs a JOIN xs b ON a.vec_id = b.vec_id AND a.i <= b.i
         |  GROUP BY 1, 2),
         |cu AS (SELECT su.i, su.j, nn.n * su.sij - sa.s * sb.s AS c
         |  FROM su, nn, sv sa, sv sb WHERE sa.i = su.i AND sb.i = su.j),
         |cm AS (SELECT i, j, c FROM cu
         |  UNION ALL SELECT j AS i, i AS j, c FROM cu WHERE i < j),
         |tr AS (SELECT sum(c) AS trace FROM cu WHERE i = j),
         |v0 AS (SELECT t.i AS i, CAST($SgQ AS HUGEINT) AS v
         |  FROM range(1, 65) t(i)),
         |${Seq(1, 2, 3, 4).map(it).mkString(",\n")}
         |SELECT CAST(v4.i AS BIGINT) AS dim, CAST(v4.v AS BIGINT) AS loading,
         |  CAST(((m4.m // $SgQ) * 1000000) // tr.trace AS BIGINT)
         |    AS explained_ppm,
         |  CAST(abs(((m4.m // $SgQ) * 1000000) // tr.trace
         |    - ((m3.m // $SgQ) * 1000000) // tr.trace) AS BIGINT)
         |    AS conv_delta_ppm
         |FROM v4, m4, m3, tr ORDER BY dim""".stripMargin
    }) { (s, d) =>
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val e = Tables.embeddings(s, d).select(col("vec_id"),
      expr(s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $SgQ)" +
        " AS BIGINT))").as("xs"))
    val su = e.select(explode(expr(
        """flatten(transform(sequence(1, 64), i ->
          |  transform(sequence(i, 64), j -> named_struct(
          |    'i', i, 'j', j,
          |    'p', element_at(xs, i) * element_at(xs, j)))))""".stripMargin))
        .as("pr"))
      .select(col("pr.i").as("i"), col("pr.j").as("j"),
        col("pr.p").cast(dec).as("p"))
      .groupBy("i", "j").agg(sum("p").as("sij"))
    val sv = e.select(explode(expr(
        "transform(sequence(1, 64), i -> named_struct('i', i," +
          " 'x', element_at(xs, i)))")).as("sx"))
      .select(col("sx.i").as("i"), col("sx.x").cast(dec).as("x"))
      .groupBy("i").agg(sum("x").as("s"))
    val nn = Tables.embeddings(s, d).agg(count(lit(1)).cast(dec).as("n"))
    val cu = su
      .join(broadcast(sv.select(col("i"), col("s").as("sa"))), "i")
      .join(broadcast(sv.select(col("i").as("j"), col("s").as("sb"))), "j")
      .crossJoin(broadcast(nn))
      .select(col("i"), col("j"),
        (col("n") * col("sij") - col("sa") * col("sb")).as("c"))
    // d²-bounded driver read (2080 cells at d=64) — the k-means
    // centroid-collect contract; the iteration below is exact BigInt,
    // mirroring the oracle's HUGEINT arithmetic operation-for-operation
    val cells = cu.collect()
    val C = Array.ofDim[BigInt](65, 65)
    cells.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val c = BigInt(r.getDecimal(2).toBigInteger)
      C(i)(j) = c
      C(j)(i) = c
    }
    val trace = (1 to 64).map(i => C(i)(i)).sum
    val q = BigInt(SgQ)
    var v = Array.fill(65)(q)
    var lam3 = BigInt(0)
    var lam4 = BigInt(0)
    for (t <- 1 to 4) {
      val w = Array.tabulate(65)(i =>
        if (i == 0) BigInt(0) else (1 to 64).map(j => C(i)(j) * v(j)).sum)
      val m = (1 to 64).map(i => w(i).abs).max
      v = w.map(wi => if (wi >= 0) (wi * q) / m else -(((-wi) * q) / m))
      if (t == 3) lam3 = m / q
      if (t == 4) lam4 = m / q
    }
    val exp4 = (lam4 * 1000000) / trace
    val exp3 = (lam3 * 1000000) / trace
    val delta = (exp4 - exp3).abs
    import s.implicits._
    (1 to 64).map(i =>
        (i.toLong, v(i).toLong, exp4.toLong, delta.toLong))
      .toDF("dim", "loading", "explained_ppm", "conv_delta_ppm")
      .orderBy("dim")
  }

  // ---- SemDeDup: semantic dedup within trained IVF cells (q325) --------

  /** q325's within-cell cosine threshold — fixture-calibrated like q41's
    * [[CosMin]] (these synthetic isotropic vectors top out near 0.51
    * in-cell, with ~6% of in-cell pairs above 0.35); a production
    * SemDeDup on real encoder output runs at ~0.95+.
    */
  private val SemDedupTau = 0.35

  /** q325: SEMDEDUP — semantic deduplication in embedding space (Abbas
    * et al. 2023): cluster the corpus with the trained coarse quantizer,
    * then within each cell connect pairs whose cosine exceeds τ and keep
    * ONE representative per connected component (min vec_id — the
    * deterministic stand-in for the paper's arbitrary-keeper result).
    * This is the dedup tier the text tiers (minhash q31, simhash q39,
    * ExactSubstr q259) structurally cannot reach: paraphrases and
    * near-translations share no shingles but sit close in embedding
    * space. Per cell: members, τ-edges, kept, dropped, dropped_ppm — the
    * removal-rate table a curation owner reads before shipping the pass.
    *
    * Scale shape: the pairwise cosine join is CELL-BOUNDED and, since
    * the round-15 k = [[kmKOf]](n) ~ √n retrofit, genuinely sub-quadratic:
    * a cell holds O(√n) vectors, so the within-cell pair join is O(n^1.5)
    * total at every scale (the published algorithm's cost model), riding
    * the same trained
    * artifact as every IVF query ([[kmTrained]] — assignment cost already
    * paid and shared); components run on the sparse τ-edge graph
    * ([[connectedComponents]]: edge-grain rounds, never corpus-grain),
    * and the report is cell-grain. The edge list is localCheckpointed so
    * the edge-count audit and the CC loop don't each replay the
    * quadratic join.
    */
  private val q325 = GraftQuery(
    "q325_semdedup",
    s"""WITH RECURSIVE c0 AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cen
       |  FROM embeddings WHERE vec_id < $KmKSql
       |), ${kmOracleAssign("c0", "a1")}, ${kmOracleRecompute("a1", "c1")},
       |${kmOracleAssign("c1", "a2")},
       |pe AS (
       |  SELECT a.cell, a.vec_id AS u, b.vec_id AS v
       |  FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a", "b")} >= $SemDedupTau
       |),
       |ecnt AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_edges
       |  FROM pe GROUP BY 1),
       |edges AS (SELECT u, v FROM pe UNION SELECT v, u FROM pe),
       |reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |cl AS (
       |  SELECT a.vec_id, a.cell,
       |    least(a.vec_id, coalesce(rm.m, a.vec_id)) AS grp
       |  FROM a2 a LEFT JOIN (SELECT u, min(v) AS m FROM reach GROUP BY u) rm
       |    ON a.vec_id = rm.u)
       |SELECT cl.cell, CAST(count(*) AS BIGINT) AS n_members,
       |  coalesce(any_value(ecnt.n_edges), 0) AS n_edges,
       |  CAST(count(DISTINCT cl.grp) AS BIGINT) AS n_kept,
       |  CAST(count(*) - count(DISTINCT cl.grp) AS BIGINT) AS n_dropped,
       |  CAST(((count(*) - count(DISTINCT cl.grp)) * 1000000) // count(*)
       |    AS BIGINT) AS dropped_ppm
       |FROM cl LEFT JOIN ecnt ON cl.cell = ecnt.cell
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val (_, a2) = kmTrained(s, d)
    val left = a2.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val right = a2.select(col("cell").as("cell_b"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    val pe = left
      .join(right, col("cell") === col("cell_b") && col("vec_a") < col("vec_b"))
      .where(VectorFunctions.cosineSim(col("emb_a"), col("emb_b")) >= SemDedupTau)
      .select(col("cell"), col("vec_a"), col("vec_b"))
      .localCheckpoint(eager = true)
    val ecnt = pe.groupBy("cell").agg(count(lit(1)).as("n_edges"))
    val cc = connectedComponents(
      a2.select(col("vec_id").as("doc_id")),
      pe.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
    cc.join(a2.select(col("vec_id"), col("cell")), col("doc_id") === col("vec_id"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("cluster_id")).as("n_kept"))
      .join(broadcast(ecnt), Seq("cell"), "left")
      .select(col("cell"), col("n_members"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"), col("n_kept"),
        (col("n_members") - col("n_kept")).as("n_dropped"),
        expr("((n_members - n_kept) * 1000000) div n_members")
          .as("dropped_ppm"))
      .orderBy("cell")
  }

  // ---- dup-aware effective sample size (q341) --------------------------------

  /** q341: KISH EFFECTIVE SAMPLE SIZE under duplicate-aware weighting —
    * the statistical companion to q222's token ROI: instead of HARD
    * dedup (keep one, drop the rest), a training pipeline can DOWNWEIGHT
    * duplicates (w = 10⁶ div cluster_size, each cluster sharing ~one
    * unit of weight), and the number that says what that buys is Kish's
    * ESS = (Σw)²/Σw² — per source: raw docs, effective docs under the
    * weighting, and the effective fraction in ppm. A source of unique
    * documents keeps ESS ≈ n; a boilerplate mill with 100-member
    * clusters keeps ESS ≈ n/100 — the honest "how much statistical
    * power does this source contribute" input to mixture budgeting
    * (q223/q261/q288) that raw row counts overstate.
    *
    * Exactness: weights are floored integer micro-units; Σw and Σw² ride
    * DECIMAL(38,0)/HUGEINT (w² = 10¹² per doc — a BIGINT Σw² overflows
    * near 9.2M docs, stated rather than discovered); ESS and ppm are
    * floored integer divisions. Engine-exact by construction.
    *
    * Scale shape: rides the SHARED cluster artifact
    * ([[clusterAssignments]] — assignment cost already paid); one
    * cluster-grain size aggregate, one doc-grain weight map, one
    * source-grain rollup. No windows, no new corpus pass.
    */
  /** Engine twin of [[essCtes]]' `agg` frame: per source (n_docs, Σw,
    * Σw²) moments under dup-aware weights, shared by q341 and q351.
    */
  private def essAgg(s: SparkSession, d: String): DataFrame = {
    val cs = clusterAssignments(s, d)
      .groupBy("cluster_id").agg(count(lit(1)).as("csize"))
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    clusterAssignments(s, d).join(cs, "cluster_id")
      .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
      .select(col("source"), expr("1000000 div csize").as("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w").cast(dec)).as("sw"),
        sum(col("w").cast(dec) * col("w")).as("sww"))
  }

  /** q341's ESS CTE chain (cluster sizes → dup-aware weights → source
    * moments), shared with the q351 budget-shift composition.
    */
  private val essCtes: String =
    s"""$clusterOracleChain,
       |cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
       |  FROM clus GROUP BY 1),
       |wts AS (
       |  SELECT d.source, 1000000 // cs.csize AS w
       |  FROM clus c JOIN cs ON cs.cluster_id = c.cluster_id
       |  JOIN documents d ON d.doc_id = c.doc_id),
       |agg AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CAST(w AS HUGEINT)) AS HUGEINT) AS sw,
       |    CAST(sum(CAST(w AS HUGEINT) * w) AS HUGEINT) AS sww
       |  FROM wts GROUP BY 1)""".stripMargin

  private val q341 = GraftQuery(
    "q341_dedup_ess",
    s"""$essCtes
       |SELECT source, n_docs,
       |  CAST((sw * sw) // sww AS BIGINT) AS ess_docs,
       |  CAST(((sw * sw) // sww) * 1000000 // n_docs AS BIGINT)
       |    AS ess_ppm
       |FROM agg ORDER BY source""".stripMargin) { (s, d) =>
    essAgg(s, d)
      .select(col("source"), col("n_docs"),
        expr("CAST((sw * sw) div sww AS BIGINT)").as("ess_docs"),
        expr("CAST(((sw * sw) div sww) * 1000000 div n_docs AS BIGINT)")
          .as("ess_ppm"))
      .orderBy("source")
  }

  // ---- ESS-corrected budget shift (q351) ---------------------------------

  /** q351: BUDGET SHIFT under duplication correction — the composition
    * q341 exists to feed: a 10⁶-unit sampling/labeling budget allocated
    * proportionally (q223's Hamilton arithmetic — Σ = budget EXACTLY)
    * twice, once by raw document counts and once by Kish ESS, with the
    * per-source shift in budget units. Raw counts OVER-allocate to
    * dup-heavy sources (their rows carry less statistical information
    * than their count claims); the shift column is the measured
    * correction a mixture owner applies — and on a corpus where no
    * source is dup-heavier than the rest, the measured shift is ~0,
    * which is equally a decision ("counts are fine here").
    *
    * Exactness: both allocations are floor-division + Hamilton
    * remainder by (fractional part desc, source) — integer-exact,
    * conservation Σ = 10⁶ on both columns in both engines; ESS is
    * q341's HUGEINT/DECIMAL(38,0) arithmetic via the shared frame.
    *
    * Scale shape: rides [[essAgg]] (one rollup over the shared cluster
    * artifact); the dual election is windows + totals on the
    * source-grain table (metadata-sized, q324's shape).
    */
  private val q351 = GraftQuery(
    "q351_ess_budget_shift",
    s"""$essCtes,
       |ess AS (
       |  SELECT source, n_docs,
       |    CAST((sw * sw) // sww AS BIGINT) AS ess_docs
       |  FROM agg),
       |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tn,
       |  CAST(sum(ess_docs) AS BIGINT) AS te FROM ess),
       |fl AS (
       |  SELECT e.source, e.n_docs, e.ess_docs,
       |    (1000000 * e.n_docs) // t.tn AS fr,
       |    (1000000 * e.n_docs) % t.tn AS rr,
       |    (1000000 * e.ess_docs) // t.te AS fe,
       |    (1000000 * e.ess_docs) % t.te AS re
       |  FROM ess e CROSS JOIN tot t),
       |rk AS (
       |  SELECT *, row_number() OVER (ORDER BY rr DESC, source) AS krr,
       |    row_number() OVER (ORDER BY re DESC, source) AS kre,
       |    (SELECT 1000000 - sum(fr) FROM fl) AS remr,
       |    (SELECT 1000000 - sum(fe) FROM fl) AS reme
       |  FROM fl)
       |SELECT source, n_docs, ess_docs,
       |  CAST(fr + CASE WHEN krr <= remr THEN 1 ELSE 0 END AS BIGINT)
       |    AS alloc_raw,
       |  CAST(fe + CASE WHEN kre <= reme THEN 1 ELSE 0 END AS BIGINT)
       |    AS alloc_ess,
       |  CAST((fe + CASE WHEN kre <= reme THEN 1 ELSE 0 END)
       |     - (fr + CASE WHEN krr <= remr THEN 1 ELSE 0 END) AS BIGINT)
       |    AS shift_u
       |FROM rk ORDER BY source""".stripMargin) { (s, d) =>
    // the source-grain ESS frame is consumed by four branches (totals,
    // floors, remainders, output) — materialize it as a LEAF so the
    // cluster chain underneath runs once (q348's single-corpus-pass
    // discipline; the frame is metadata-sized)
    val ess = essAgg(s, d)
      .select(col("source"), col("n_docs"),
        expr("CAST((sw * sw) div sww AS BIGINT)").as("ess_docs"))
      .localCheckpoint()
    Pipeline.hamiltonOf(ess, "source", 1000000L,
        "n_docs" -> "alloc_raw", "ess_docs" -> "alloc_ess")
      .withColumn("shift_u", col("alloc_ess") - col("alloc_raw"))
      .orderBy("source")
  }

  // ---- kNN label-noise audit (q339) ----------------------------------------

  /** q339: LABEL-NOISE audit by neighborhood agreement — the
    * confident-learning-style QA pass (Northcutt et al. 2021, the
    * cheap geometric core) a labeled training set runs before anyone
    * trusts its labels: per vector, the majority label of its 5 nearest
    * same-cell neighbors (trained IVF cells — [[kmTrained]], the same
    * artifact every index query rides); a vector whose neighborhood
    * outvotes its own label is FLAGGED. Per label: vectors, flags, and
    * the flag rate in ppm — the per-class noise estimate that decides
    * between relabeling, downweighting, or dropping a class.
    *
    * Determinism: distances are the [[VectorFunctions.l2DistSq]]
    * left-to-right fold (bit-identical to the oracle's ordered
    * list_reduce — the q56 contract), neighbor rank ties break on
    * vec_id, and the majority vote breaks count ties on the SMALLEST
    * label — every flag is engine-exact; counts and ppm are BIGINT.
    *
    * Scale shape: pair expansion is CELL-BOUNDED (q325's contract —
    * training sizes k = [[kmKOf]](n) ~ √n so a cell is O(√n), never
    * corpus²); the
    * top-5 rank and the vote are per-vector partitioned windows over
    * ≤cell-sized neighbor lists; the report is one label-grain
    * aggregate. Cells come from [[routedAuditAssigns]]: flat trained
    * cells below the router crossover (every graded scale — plan
    * unchanged), IMI product cells past the flat router's 1024-cell
    * ceiling, so the O(√n) bound survives any corpus (q361 gates the
    * IMI arm unconditionally).
    */
  private val q339 = GraftQuery(
    "q339_knn_label_audit", {
      val pairDist = s"list_reduce(list_transform(range(1, $KmDim + 1), " +
        "j -> (CAST(x.embedding[j] AS DOUBLE) - " +
        "CAST(y.embedding[j] AS DOUBLE)) * " +
        "(CAST(x.embedding[j] AS DOUBLE) - " +
        "CAST(y.embedding[j] AS DOUBLE))), (p, q) -> p + q)"
      s"""WITH c0 AS (
         |  SELECT CAST(vec_id AS INTEGER) AS cell,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cen
         |  FROM embeddings WHERE vec_id < $KmKSql
         |), ${kmOracleAssign("c0", "a1")}, ${kmOracleRecompute("a1", "c1")},
         |${kmOracleAssign("c1", "a2")},
         |lab AS (
         |  SELECT a.vec_id, a.cell, a.embedding,
         |    CAST(e.label AS BIGINT) AS label
         |  FROM a2 a JOIN embeddings e ON e.vec_id = a.vec_id),
         |pr AS (
         |  SELECT x.vec_id, y.label AS nlabel,
         |    row_number() OVER (PARTITION BY x.vec_id
         |      ORDER BY $pairDist, y.vec_id) AS rn
         |  FROM lab x JOIN lab y
         |    ON y.cell = x.cell AND y.vec_id <> x.vec_id),
         |votes AS (SELECT vec_id, nlabel, CAST(count(*) AS BIGINT) AS c
         |  FROM pr WHERE rn <= 5 GROUP BY 1, 2),
         |maj AS (
         |  SELECT vec_id, nlabel AS mlabel FROM (
         |    SELECT vec_id, nlabel, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY c DESC, nlabel) AS r
         |    FROM votes) t WHERE r = 1)
         |SELECT l.label, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(CASE WHEN m.mlabel <> l.label THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_flagged,
         |  CAST(sum(CASE WHEN m.mlabel <> l.label THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS flagged_ppm
         |FROM lab l JOIN maj m ON m.vec_id = l.vec_id
         |GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    knnLabelAuditOn(routedAuditAssigns(s, d)
      .join(Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("long").as("label")),
        "vec_id"))
  }

  /** The kNN label-audit KERNEL, router-agnostic (q339 on the routed
    * cells, q361 forced onto IMI product cells): `lab` is
    * (vec_id, embedding, cell, label) — whichever router produced the
    * cell column, the audit is the same within-cell top-5 vote.
    */
  private def knnLabelAuditOn(lab: DataFrame): DataFrame = {
    val nbrs = lab.select(col("vec_id").as("nid"), col("cell").as("ncell"),
      expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("nemb"),
      col("label").as("nlabel"))
    val wV = Window.partitionBy("vec_id")
    val nn = lab
      .join(nbrs, col("ncell") === col("cell") && col("nid") =!= col("vec_id"))
      .select(col("vec_id"),
        VectorFunctions.l2DistSq(col("embedding"), col("nemb")).as("d"),
        col("nid"), col("nlabel"))
      .withColumn("rn", row_number().over(wV.orderBy(col("d"), col("nid"))))
      .where(col("rn") <= 5)
    val maj = nn.groupBy("vec_id", "nlabel").agg(count(lit(1)).as("c"))
      .withColumn("r",
        row_number().over(wV.orderBy(col("c").desc, col("nlabel"))))
      .where(col("r") === 1)
      .select(col("vec_id"), col("nlabel").as("mlabel"))
    lab.join(maj, "vec_id")
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("mlabel") =!= col("label"), 1L).otherwise(0L))
          .as("n_flagged"))
      .withColumn("flagged_ppm", expr("(n_flagged * 1000000) div n_vecs"))
      .orderBy("label")
  }

  // ---- cluster-label NMI (q348) ----------------------------------------------

  /** q348: NORMALIZED MUTUAL INFORMATION between the trained IVF cells
    * and the labels — the GLOBAL clustering-quality score beside q339's
    * per-vector neighborhood audit (the two standard external
    * cluster-evaluation views: NMI says whether the partition as a whole
    * recovers label structure, the kNN audit says which individual
    * points sit wrong): the (cell × label) contingency from the SAME
    * [[kmTrained]] artifact, per-cell PMI, MI in nats, the two entropies,
    * and NMI = 2·MI/(H_cell + H_label) (the symmetric "sum" convention,
    * stated so the number is reproducible). On isotropic synthetic
    * vectors the honest answer is NMI ≈ 0 — the cells carry no label
    * information, measured not assumed (q294's discipline).
    *
    * Exactness: counts are BIGINT; ln/ratios evaluate on the ≤(k×labels)
    * DOMAIN-bounded table with q322's shared-verbatim float text and
    * round(·, 6) outputs.
    *
    * Scale shape: one vec-grain join to labels + one hash aggregate to
    * the contingency grain, bounded-collected (q338's contract) so the
    * marginal/entropy/NMI epilogue runs on LITERAL ≤40-row frames and
    * never replays the corpus.
    */
  private val NmiPmiExpr =
    "ln((CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)) " +
      "/ (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))"

  /** Frozen-codebook CELL assignment for a (possibly streaming) embedding
    * frame — the assignment half of [[frozenAssignEncode]], for consumers
    * that need cells but not PQ codes (the q349 streaming NMI twin).
    */
  private[graft] def frozenAssign(s: SparkSession, d: String,
      e: DataFrame): DataFrame = {
    VectorFunctions.register(s)
    val (c1, _) = kmTrained(s, d)
    kmAssign(e, c1)
  }

  /** q348's oracle — shared verbatim with the streaming twin q349. */
  private[graft] val nmiOracleSql: String =
    s"""WITH c0 AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cen
       |  FROM embeddings WHERE vec_id < $KmKSql
       |), ${kmOracleAssign("c0", "a1")}, ${kmOracleRecompute("a1", "c1")},
       |${kmOracleAssign("c1", "a2")},
       |xy AS (
       |  SELECT CAST(a.cell AS BIGINT) AS cell,
       |    CAST(e.label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS nxy
       |  FROM a2 a JOIN embeddings e ON e.vec_id = a.vec_id
       |  GROUP BY 1, 2),
       |x AS (SELECT cell, CAST(sum(nxy) AS BIGINT) AS nx FROM xy GROUP BY 1),
       |y AS (SELECT label, CAST(sum(nxy) AS BIGINT) AS ny FROM xy GROUP BY 1),
       |t AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM xy),
       |p AS (SELECT xy.cell, xy.label, xy.nxy, x.nx, y.ny, t.n,
       |    $NmiPmiExpr AS pmi
       |  FROM xy, x, y, t WHERE x.cell = xy.cell AND y.label = xy.label),
       |mi AS (SELECT round(list_reduce(
       |    list((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)) * pmi
       |      ORDER BY cell, label), (x, y) -> x + y), 6) AS mi_total FROM p),
       |hc AS (SELECT round(-list_reduce(
       |    list((CAST(nx AS DOUBLE) / CAST(t.n AS DOUBLE))
       |      * ln(CAST(nx AS DOUBLE) / CAST(t.n AS DOUBLE)) ORDER BY cell),
       |    (x, y) -> x + y), 6) AS h_cell
       |  FROM x, t),
       |hl AS (SELECT round(-list_reduce(
       |    list((CAST(ny AS DOUBLE) / CAST(t.n AS DOUBLE))
       |      * ln(CAST(ny AS DOUBLE) / CAST(t.n AS DOUBLE)) ORDER BY label),
       |    (x, y) -> x + y), 6) AS h_label
       |  FROM y, t)
       |SELECT p.cell, p.label, p.nxy, p.nx, p.ny, round(p.pmi, 6) AS pmi,
       |  mi.mi_total, hc.h_cell, hl.h_label,
       |  round(2 * mi.mi_total / (hc.h_cell + hl.h_label), 6) AS nmi
       |FROM p, mi, hc, hl ORDER BY p.cell, p.label""".stripMargin

  /** q348's epilogue over the (cell, label, nxy) contingency FRAME —
    * shared verbatim with the streaming twin q349, whose Complete-mode
    * online contingency must land on the same frame. Fully DISTRIBUTED
    * since the round-15 k ~ √n retrofit: the contingency is k × labels
    * rows (≤ 1024·L under [[kmKOf]]'s router cap — index metadata, but
    * no longer the ≤64-cell driver literal it was at fixed k=4, so the
    * old bounded collect had to go). Float discipline: the MI and
    * entropy sums are ORDER-PINNED folds over (cell, label)-sorted
    * term lists — bit-identical to the oracle's
    * `list_reduce(list(term ORDER BY …))` — because a shuffled
    * double-sum's order, and therefore its low bits, would otherwise be
    * nondeterministic at this row count.
    */
  private[graft] def nmiOf(s: SparkSession, xy: DataFrame): DataFrame = {
    // marginals join back to the contingency they derive from — rename
    // the grouping keys so the self-join's attributes can't conflict
    // (the streaming twin hands in a memory-sink leaf, where the
    // analyzer's self-join dedup does not fire)
    val x = xy.groupBy("cell").agg(sum("nxy").as("nx"))
      .withColumnRenamed("cell", "cell_x")
    val y = xy.groupBy("label").agg(sum("nxy").as("ny"))
      .withColumnRenamed("label", "label_y")
    val t = xy.agg(sum("nxy").as("n"))
    val p = xy.join(broadcast(x), col("cell") === col("cell_x"))
      .join(broadcast(y), col("label") === col("label_y"))
      .drop("cell_x", "label_y")
      .crossJoin(broadcast(t))
      .withColumn("pmi", expr(NmiPmiExpr))
    val mi = broadcast(p
      .select(struct(col("cell"), col("label"),
        ((col("nxy").cast("double") / col("n").cast("double")) * col("pmi"))
          .as("term")).as("s"))
      .agg(sort_array(collect_list(col("s"))).as("ts"))
      .select(round(expr("aggregate(ts, 0D, (acc, x) -> acc + x.term)"), 6)
        .as("mi_total")))
    val hc = broadcast(x.crossJoin(broadcast(t))
      .select(struct(col("cell_x"),
        ((col("nx").cast("double") / col("n").cast("double")) *
          log(col("nx").cast("double") / col("n").cast("double")))
          .as("term")).as("s"))
      .agg(sort_array(collect_list(col("s"))).as("ts"))
      .select(round(-expr("aggregate(ts, 0D, (acc, x) -> acc + x.term)"), 6)
        .as("h_cell")))
    val hl = broadcast(y.crossJoin(broadcast(t))
      .select(struct(col("label_y"),
        ((col("ny").cast("double") / col("n").cast("double")) *
          log(col("ny").cast("double") / col("n").cast("double")))
          .as("term")).as("s"))
      .agg(sort_array(collect_list(col("s"))).as("ts"))
      .select(round(-expr("aggregate(ts, 0D, (acc, x) -> acc + x.term)"), 6)
        .as("h_label")))
    p.crossJoin(mi).crossJoin(hc).crossJoin(hl)
      .select(col("cell"), col("label"), col("nxy"), col("nx"), col("ny"),
        round(col("pmi"), 6).as("pmi"), col("mi_total"), col("h_cell"),
        col("h_label"),
        round(lit(2) * col("mi_total") / (col("h_cell") + col("h_label")), 6)
          .as("nmi"))
      .orderBy("cell", "label")
  }

  private val q348 = GraftQuery(
    "q348_cluster_label_nmi", nmiOracleSql) { (s, d) =>
    VectorFunctions.register(s)
    val (_, a2) = kmTrained(s, d)
    // ONE corpus-grain aggregate to the (k × labels) contingency, then
    // the shared distributed epilogue — no driver collect (k ~ √n)
    nmiOf(s, a2.join(Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("long").as("label")),
        "vec_id")
      .select(col("cell").cast("long").as("cell"), col("label"))
      .groupBy("cell", "label").agg(count(lit(1)).as("nxy")))
  }

  /** q352: SEMDEDUP CROSS-CELL MISS AUDIT — the recall discipline the
    * ANN tiers already carry (q79/q83/q102), applied to the dedup tier
    * (VERDICT r14 gap 2): q325 connects τ-pairs only INSIDE one trained
    * cell, so a paraphrase pair straddling a cell boundary is invisible
    * to it, and until now nothing measured that loss. Over the bounded
    * query batch, the exact-cosine τ-pair truth (batch × corpus brute
    * force — q79's bounded-truth shape) is compared against what a
    * p-probe SemDeDup catches: pair (u, v) is caught iff v's trained
    * cell is among u's p nearest probe cells — p=1 is exactly q325's
    * single-cell regime, and the p=k row probes every cell, so the
    * curve's missed_ppm=0 ceiling is measured, not assumed. Output per
    * p: true τ-pairs, caught, missed ppm — the table a curation owner
    * reads to set the dedup pass's probe budget before trusting its
    * removal rate.
    *
    * Scale shape: truth is QueryBatch-bounded (100 × n — the audit's
    * documented cost, never corpus²) and localCheckpointed (q325's
    * edge-list discipline) so the four probe settings don't each replay
    * the brute-force pass; probes are batch × k-broadcast argmins; each
    * caught count is two equi-joins (on u, then (v, cell)) over the
    * τ-pair list.
    */
  private val q352 = GraftQuery(
    "q352_semdedup_probe_recall", {
      // tag prefix "cg", not "c": the training chain already owns c1
      def caught(tag: String, bound: String): String =
        s"""cg$tag AS (
           |  SELECT CAST(count(*) AS BIGINT) AS caught
           |  FROM tp JOIN pr ON pr.vec_id = tp.u AND pr.rn <= $bound
           |  JOIN a2 av ON av.vec_id = tp.v AND av.cell = pr.cell)"""
          .stripMargin
      // the k-row is gated on k > 4 so corpora tiny enough to clamp
      // k to 4 (n ≤ 24 fixtures) don't emit a duplicate of the
      // nprobe=4 row — the engine's probe grid applies .distinct
      def row(tag: String, np: String, where: String = ""): String =
        s"""SELECT CAST($np AS BIGINT) AS nprobe, n.n AS n_pairs, c.caught,
           |  CAST(CASE WHEN n.n = 0 THEN 0
           |    ELSE ((n.n - c.caught) * 1000000) // n.n END AS BIGINT)
           |    AS missed_ppm
           |FROM cg$tag c CROSS JOIN np n$where""".stripMargin
      s"""WITH $kmOracleTrain,
         |tp AS (
         |  SELECT q.vec_id AS u, c.vec_id AS v
         |  FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) q
         |  JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE ${cosSql("q", "c")} >= $SemDedupTau),
         |np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tp),
         |pr AS (
         |  SELECT e.vec_id, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${kmOracleDist("e.embedding", "c.cen")}, c.cell) AS rn
         |  FROM embeddings e CROSS JOIN c1 c WHERE e.vec_id < $QueryBatch),
         |${caught("1", "1")},
         |${caught("2", "2")},
         |${caught("4", "4")},
         |${caught("k", KmKSql)}
         |${row("1", "1")}
         |UNION ALL ${row("2", "2")}
         |UNION ALL ${row("4", "4")}
         |UNION ALL ${row("k", KmKSql, s" WHERE $KmKSql > 4")}
         |ORDER BY nprobe""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val (c1, a2) = kmTrained(s, d)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val tp = tauPairTruth(s, d)
    val np = broadcast(tp.agg(count(lit(1)).as("n_pairs")))
    val av = a2.select(col("vec_id").as("vv"), col("cell").as("cellv"))
    val qe = e.where(col("vec_id") < QueryBatch)
    // .distinct: kmK clamps to 4 on n ≤ 24 fixtures, where the k-row
    // would duplicate the fixed nprobe=4 row (oracle gates k > 4)
    val rows = Seq(1, 2, 4, kmK(s, d)).distinct.map { p =>
      val pr = probeSelection(qe, c1, p)
        .select(col("vec_id").as("u"), col("probe_cell"))
      tp.join(pr, "u")
        .join(av, col("v") === col("vv") &&
          col("probe_cell") === col("cellv"))
        .agg(count(lit(1)).as("caught"))
        .crossJoin(np)
        .select(lit(p.toLong).as("nprobe"), col("n_pairs"), col("caught"),
          when(col("n_pairs") === 0, 0L)
            .otherwise(expr("((n_pairs - caught) * 1000000) div n_pairs"))
            .cast("long").as("missed_ppm"))
    }
    rows.reduce(_.unionByName(_)).orderBy("nprobe")
  }

  /** q353: MULTI-PROBE SEMDEDUP — the remediation q352's audit
    * motivates: q325 connects τ-pairs only inside one trained cell, and
    * q352 measures ~61% of true pairs straddling a cell boundary at
    * p=1 on this corpus. This pass catches a pair when the two vectors
    * SHARE ANY of their [[ProbeP]] nearest probed cells — the standard
    * multi-probe recipe applied to the dedup tier: candidates from
    * probe-ring overlap, exact cosine verify, then q325's verbatim
    * keeper rule (CC, min vec_id) and per-assigned-cell report. The new
    * n_edges_cross column counts this pass's verified edges whose
    * endpoints live in DIFFERENT assigned cells (each such edge appears
    * under both endpoint cells) — exactly the duplicates q325
    * structurally cannot see; measured at sf0.01 this pass verifies 64
    * within-cell + 84 cross-cell edges, dropping 71 docs where q325's
    * single-cell regime dropped fewer.
    *
    * Scale shape: probes come from the shared [[corpusProbes]] artifact
    * (one assignment pass, reused by q72/q84/q87); the candidate
    * self-join on probe_cell expands each vector into ≤ p cells, so
    * pair work is O(p²·n^1.5) at k ~ √n — q325's sub-quadratic class
    * with a constant p² premium, never corpus². The verified edge list
    * is localCheckpointed (q325's discipline) so the within/cross
    * audits and the CC loop don't replay the candidate join.
    */
  private val q353 = GraftQuery(
    "q353_multiprobe_semdedup",
    s"""WITH RECURSIVE $kmOracleTrain,
       |pb AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${kmOracleDist("e.embedding", "c.cen")}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN c1 c) t WHERE rn <= $ProbeP),
       |cand AS (
       |  SELECT DISTINCT pa.vec_id AS u, pb2.vec_id AS v
       |  FROM pb pa JOIN pb pb2
       |    ON pa.cell = pb2.cell AND pa.vec_id < pb2.vec_id),
       |pe AS (
       |  SELECT c.u, c.v
       |  FROM cand c JOIN a2 a ON a.vec_id = c.u
       |  JOIN a2 b ON b.vec_id = c.v
       |  WHERE ${cosSql("a", "b")} >= $SemDedupTau),
       |ecls AS (
       |  SELECT pe.u, pe.v, au.cell AS cu, av.cell AS cv
       |  FROM pe JOIN a2 au ON au.vec_id = pe.u
       |  JOIN a2 av ON av.vec_id = pe.v),
       |edges AS (SELECT u, v FROM pe UNION SELECT v, u FROM pe),
       |reach AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |cl AS (
       |  SELECT a.vec_id, a.cell,
       |    least(a.vec_id, coalesce(rm.m, a.vec_id)) AS grp
       |  FROM a2 a LEFT JOIN (SELECT u, min(v) AS m FROM reach GROUP BY u) rm
       |    ON a.vec_id = rm.u),
       |ew AS (SELECT cu AS cell, CAST(count(*) AS BIGINT) AS n
       |  FROM ecls WHERE cu = cv GROUP BY 1),
       |ex AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM (
       |  SELECT cu AS cell FROM ecls WHERE cu <> cv
       |  UNION ALL SELECT cv FROM ecls WHERE cu <> cv) GROUP BY 1)
       |SELECT cl.cell, CAST(count(*) AS BIGINT) AS n_members,
       |  coalesce(any_value(ew.n), 0) AS n_edges_within,
       |  coalesce(any_value(ex.n), 0) AS n_edges_cross,
       |  CAST(count(DISTINCT cl.grp) AS BIGINT) AS n_kept,
       |  CAST(count(*) - count(DISTINCT cl.grp) AS BIGINT) AS n_dropped,
       |  CAST(((count(*) - count(DISTINCT cl.grp)) * 1000000) // count(*)
       |    AS BIGINT) AS dropped_ppm
       |FROM cl LEFT JOIN ew ON ew.cell = cl.cell
       |LEFT JOIN ex ON ex.cell = cl.cell
       |GROUP BY cl.cell ORDER BY cl.cell""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val (assigns, probes) = routedSemDedupInputs(s, d)
    multiProbeSemDedupOn(assigns, probes)
  }

  /** The multi-probe SemDeDup KERNEL, router-agnostic (shared by q353 on
    * the flat coarse quantizer and q357 on the IMI product router):
    * candidates are pairs sharing ANY probed cell, verified by exact
    * cosine ≥ τ, reduced by [[connectedComponents]] with q325's keeper
    * rule, and reported per ASSIGNED cell with q353's within/cross edge
    * split. `assigns` is (vec_id, embedding, cell) — the router's
    * assignment table; `probes` is (vec_id, probe_cell) — its probe
    * rings. The kernel never asks which router produced them: the
    * dedup semantics depend only on "these vectors might be near" (the
    * rings) and "this is each vector's home cell" (the report grain),
    * which is exactly the seam that lets the flat→IMI migration happen
    * without touching the dedup logic.
    */
  private def multiProbeSemDedupOn(a2: DataFrame, pb: DataFrame): DataFrame = {
    val cand = pb.select(col("vec_id").as("u"), col("probe_cell"))
      .join(pb.select(col("vec_id").as("v"),
        col("probe_cell").as("pc2")),
        col("probe_cell") === col("pc2") && col("u") < col("v"))
      .select("u", "v").distinct()
    val emb = a2.select(col("vec_id"), col("embedding"), col("cell"))
    val pe = cand
      .join(emb.select(col("vec_id").as("u"), col("embedding").as("emb_a"),
        col("cell").as("cu")), "u")
      .join(emb.select(col("vec_id").as("v"), col("embedding").as("emb_b"),
        col("cell").as("cv")), "v")
      .where(VectorFunctions.cosineSim(col("emb_a"), col("emb_b"))
        >= SemDedupTau)
      .select(col("u"), col("v"), col("cu"), col("cv"))
      .localCheckpoint(eager = true)
    val ew = pe.where(col("cu") === col("cv"))
      .groupBy(col("cu").as("cell"))
      .agg(count(lit(1)).as("n_edges_within"))
    val ex = pe.where(col("cu") =!= col("cv"))
      .select(explode(array(col("cu"), col("cv"))).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n_edges_cross"))
    val cc = connectedComponents(
      a2.select(col("vec_id").as("doc_id")),
      pe.select(col("u").as("doc_a"), col("v").as("doc_b")))
    cc.join(a2.select(col("vec_id"), col("cell")),
        col("doc_id") === col("vec_id"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("cluster_id")).as("n_kept"))
      .join(broadcast(ew), Seq("cell"), "left")
      .join(broadcast(ex), Seq("cell"), "left")
      .select(col("cell"), col("n_members"),
        coalesce(col("n_edges_within"), lit(0L)).as("n_edges_within"),
        coalesce(col("n_edges_cross"), lit(0L)).as("n_edges_cross"),
        col("n_kept"),
        (col("n_members") - col("n_kept")).as("n_dropped"),
        expr("((n_members - n_kept) * 1000000) div n_members")
          .as("dropped_ppm"))
      .orderBy("cell")
  }

  /** Half-quantizer cell count for the IMI router (q354): k' ~ n^(1/4)
    * clamped to [2, 1024], so the PRODUCT index has k'² ~ √n cells —
    * the same effective cell count as the flat router ([[kmKOf]]), built
    * from 2·k' centroids instead of √n. Shares [[kmKOf]]'s clamp
    * rationale: 1024 per half is [[kmAssign]]'s literal-codebook bound,
    * and at that ceiling the product router reaches 1024² ≈ 10⁶ cells —
    * the documented path PAST the flat router's 1024 ceiling.
    */
  private[operators] def kImiOf(n: Long): Int =
    math.max(2L, math.min(1024L,
      math.floor(math.sqrt(math.sqrt(n.toDouble))).toLong)).toInt

  private[operators] def kImi(s: SparkSession, d: String): Int =
    graft.Artifacts.cached[java.lang.Integer](s, s"imi_k:$d") {
      (Int.box(kImiOf(Tables.embeddings(s, d).count())), () => ())
    }

  /** [[kImiOf]] as the oracle's scalar subquery (the [[KmKSql]] pattern). */
  private[operators] val KImiSql =
    "(SELECT greatest(2, least(1024, CAST(floor(sqrt(sqrt(count(*)))) AS BIGINT))) FROM embeddings)"

  /** q354: IMI ROUTER — the inverted multi-index (Babenko & Lempitsky
    * 2012), the documented path past the flat coarse router's 1024-cell
    * literal-codebook ceiling ([[kmKOf]]'s clamp note, made real): split
    * every vector into two halves, train an INDEPENDENT k'-cell
    * quantizer per half (k' = [[kImiOf]](n) ~ n^(1/4), the exact
    * [[pqTrainOn]] recipe at M=2 — deterministic seeds, 2 Lloyd passes,
    * order-pinned recomputes), and route on the PRODUCT cell
    * (cell_a, cell_b): k'² ~ √n effective cells served from 2·k'
    * centroids. Router cost per vector is 2·k' distance evaluations
    * against two broadcast-literal codebooks (vs √n for the flat
    * router); at the k' = 1024 ceiling the product index addresses ~10⁶
    * cells — beyond anything the flat router can hold as plan-literal
    * metadata — while each half stays inside [[kmAssign]]'s contract.
    * Output: every vector's product-cell assignment, the routing table
    * an IMI serving tier would store beside the codes.
    *
    * Scale shape: training is two 32-dim half-corpus Lloyd chains
    * (shared [[pqTrained]] artifact at (k', M=2) — memoized like every
    * index); assignment is the same zero-exchange literal-codebook map
    * as q56; the output join is one vec_id equi-join of the two halves'
    * code tables.
    */
  private val q354 = GraftQuery(
    "q354_imi_router",
    s"""WITH ${pqOracleTrainFrom("embeddings", 0, "imi", 2, KImiSql)},
       |${pqOracleTrainFrom("embeddings", 1, "imi", 2, KImiSql)}
       |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell_a,
       |  CAST(b.cell AS BIGINT) AS cell_b
       |FROM imia2_0 a JOIN imia2_1 b ON a.vec_id = b.vec_id
       |ORDER BY a.vec_id""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val (_, codes) = pqTrained(s, d, kImi(s, d), 2)
    val a = codes.where(col("m") === 0)
      .select(col("vec_id"), col("cell").cast("long").as("cell_a"))
    val b = codes.where(col("m") === 1)
      .select(col("vec_id"), col("cell").cast("long").as("cell_b"))
    a.join(b, "vec_id").orderBy("vec_id")
  }

  /** q355: IMI-SERVED ANN SEARCH — the serving tier over q354's product
    * router, completing the IMI family: each query probes its
    * [[ProbeP]] nearest cells PER HALF (2·p half-distance evaluations
    * against two broadcast k'-row codebooks), candidates are the
    * vectors stored under the p × p probed PRODUCT cells (equi-join on
    * (cell_a, cell_b) — a candidate has exactly one product cell, so
    * the probe fan-out never duplicates a pair), and exact cosine
    * reranks to top-3 (q72's discipline). This is the IMI trade made
    * concrete: the same p²-product-cell candidate pool the flat router
    * would need p² probes of √n-cell metadata for, routed with
    * 2·k' ~ 2·n^(1/4) centroids — the shape that still fits
    * plan-literal metadata when n makes the flat router's k ~ √n
    * exceed its 1024-cell ceiling.
    *
    * Scale shape: probe selection is a zero-exchange literal-codebook
    * map per half over the bounded query batch; the candidate join is
    * an equi-join against the stored (cell_a, cell_b) code table
    * (q354's artifact, shared via [[pqTrained]]'s memo); rerank reads
    * float embeddings only for the batch and its candidates.
    */
  private val q355 = GraftQuery(
    "q355_imi_search", {
      def probesOf(m: Int): String = {
        val off = m * (KmDim / 2)
        s"""pr_$m AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT e.vec_id, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${pqOracleSubDist("e.embedding", "c.cen", off, KmDim / 2)}, c.cell) AS rn
           |    FROM embeddings e CROSS JOIN imic1_$m c
           |    WHERE e.vec_id < $QueryBatch) t WHERE rn <= $ProbeP)"""
          .stripMargin
      }
      s"""WITH ${pqOracleTrainFrom("embeddings", 0, "imi", 2, KImiSql)},
         |${pqOracleTrainFrom("embeddings", 1, "imi", 2, KImiSql)},
         |${probesOf(0)},
         |${probesOf(1)},
         |idx AS (SELECT a.vec_id, a.cell AS ca, b.cell AS cb
         |  FROM imia2_0 a JOIN imia2_1 b ON a.vec_id = b.vec_id),
         |sim AS (
         |  SELECT pa.vec_id AS vec_id, i.vec_id AS neighbor_id,
         |    ${cosSql("q", "c")} AS cos
         |  FROM pr_0 pa JOIN pr_1 pb ON pa.vec_id = pb.vec_id
         |  JOIN idx i ON i.ca = pa.cell AND i.cb = pb.cell
         |    AND i.vec_id <> pa.vec_id
         |  JOIN embeddings q ON q.vec_id = pa.vec_id
         |  JOIN embeddings c ON c.vec_id = i.vec_id)
         |SELECT vec_id, neighbor_id, rank, round(cos, 6) AS cos_sim FROM (
         |  SELECT vec_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM sim) t
         |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val (cents, codes) = pqTrained(s, d, kImi(s, d), 2)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val qe = e.where(col("vec_id") < QueryBatch)
    def half(m: Int) = qe.select(col("vec_id"),
      slice(col("embedding"), m * (KmDim / 2) + 1, KmDim / 2).as("embedding"))
    def centsOf(m: Int) =
      cents.where(col("m") === m).select(col("cell"), col("cen"))
    val prA = probeCells(half(0), centsOf(0), ProbeP)
      .withColumnRenamed("probe_cell", "pa")
    val prB = probeCells(half(1), centsOf(1), ProbeP)
      .withColumnRenamed("probe_cell", "pb")
    val idx = codes.where(col("m") === 0)
      .select(col("vec_id").as("neighbor_id"), col("cell").as("ca"))
      .join(codes.where(col("m") === 1)
        .select(col("vec_id").as("neighbor_id"), col("cell").as("cb")),
        "neighbor_id")
    val joined = prA.join(prB, "vec_id")
      .join(idx, col("pa") === col("ca") && col("pb") === col("cb")
        && col("vec_id") =!= col("neighbor_id"))
      .join(e.select(col("vec_id"), col("embedding").as("emb_a")), "vec_id")
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("emb_b")), "neighbor_id")
    rankTop3(joined)
  }

  /** q356: IMI OCCUPANCY BALANCE — the audit the product router needs
    * before anyone trusts q355's candidate bounds: IMI's documented
    * failure mode (Babenko & Lempitsky §4) is CORRELATED halves — when
    * the two half-spaces co-vary, mass concentrates on the product
    * grid's diagonal, many product cells sit empty, and the occupied
    * ones grow past the n/k'² sizing the probe-cost model assumes. Per
    * occupied product cell: members and corpus share (ppm, floored) —
    * the skew table a capacity planner reads next to q354's routing
    * output; the occupied-cell COUNT vs k'² falls out as the row count.
    *
    * Scale shape: one hash aggregate at product-cell grain over the
    * shared (k', M=2) code artifact ([[pqTrained]]'s memo — training
    * cost already paid by q354/q355), one 1-row total broadcast.
    */
  private val q356 = GraftQuery(
    "q356_imi_balance",
    s"""WITH ${pqOracleTrainFrom("embeddings", 0, "imi", 2, KImiSql)},
       |${pqOracleTrainFrom("embeddings", 1, "imi", 2, KImiSql)},
       |occ AS (
       |  SELECT CAST(a.cell AS BIGINT) AS cell_a,
       |    CAST(b.cell AS BIGINT) AS cell_b,
       |    CAST(count(*) AS BIGINT) AS n_members
       |  FROM imia2_0 a JOIN imia2_1 b ON a.vec_id = b.vec_id
       |  GROUP BY 1, 2),
       |t AS (SELECT CAST(sum(n_members) AS BIGINT) AS n FROM occ)
       |SELECT occ.cell_a, occ.cell_b, occ.n_members,
       |  CAST((occ.n_members * 1000000) // t.n AS BIGINT) AS share_ppm
       |FROM occ CROSS JOIN t
       |ORDER BY cell_a, cell_b""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val (_, codes) = pqTrained(s, d, kImi(s, d), 2)
    val occ = codes.where(col("m") === 0)
      .select(col("vec_id"), col("cell").cast("long").as("cell_a"))
      .join(codes.where(col("m") === 1)
        .select(col("vec_id"), col("cell").cast("long").as("cell_b")),
        "vec_id")
      .groupBy("cell_a", "cell_b").agg(count(lit(1)).as("n_members"))
    occ.crossJoin(broadcast(occ.agg(sum(col("n_members")).as("n"))))
      .select(col("cell_a"), col("cell_b"), col("n_members"),
        expr("(n_members * 1000000) div n").as("share_ppm"))
      .orderBy("cell_a", "cell_b")
  }

  // ---- dedup/ANN cell ROUTER: flat coarse quantizer vs IMI product ----

  /** Corpus vector count, memoized beside the indexes it sizes. */
  private[operators] def embCount(s: SparkSession, d: String): Long =
    graft.Artifacts.cached[java.lang.Long](s, s"emb_count:$d") {
      (Long.box(Tables.embeddings(s, d).count()), () => ())
    }

  /** The router CROSSOVER: the flat coarse quantizer's k = [[kmKOf]](n)
    * saturates at its 1024-cell literal-codebook ceiling once n > 1024²
    * ≈ 10⁶ — past that point a "cell-bounded" flat cell holds n/1024
    * vectors and grows LINEARLY, so within-cell pair expansion (SemDeDup,
    * the kNN label audit) turns quadratic again. The IMI product router
    * (q354) keeps k'² ~ √n effective cells growing with the corpus from
    * 2·k' ~ 2·n^(1/4) centroids, so past the crossover it is the only
    * router that preserves the O(√n)-per-cell contract.
    * RouterSizingSpec pins the boundary and the through-crossover cell
    * growth; the graded fixtures (n ≤ 2·10⁴) all sit on the flat side.
    */
  private[operators] val FlatRouterCeilingN: Long = 1024L * 1024L

  private[operators] def routerIsImi(n: Long): Boolean = n > FlatRouterCeilingN

  /** IMI product-cell id: `cell_a · 1024 + cell_b`. The stride is the
    * HALF CEILING (1024, [[kImiOf]]'s clamp), not k'(n), so a cell id is
    * stable under corpus growth and the packing is collision-free for
    * every legal half pair.
    */
  private val ImiCellStride = 1024L

  /** Every vector's IMI product-cell assignment with its float embedding
    * — the (vec_id, embedding, cell) table [[multiProbeSemDedupOn]]
    * consumes, i.e. q354's routing output shaped like the flat `a2`.
    * Rides the shared (k', M=2) [[pqTrained]] artifact.
    */
  private[operators] def imiAssigns(s: SparkSession, d: String): DataFrame = {
    val (_, codes) = pqTrained(s, d, kImi(s, d), 2)
    codes.where(col("m") === 0)
      .select(col("vec_id"), col("cell").cast("long").as("ca"))
      .join(codes.where(col("m") === 1)
        .select(col("vec_id"), col("cell").cast("long").as("cb")), "vec_id")
      .join(Tables.embeddings(s, d).select("vec_id", "embedding"), "vec_id")
      .select(col("vec_id"), col("embedding"),
        (col("ca") * ImiCellStride + col("cb")).as("cell"))
  }

  /** The corpus-wide IMI probe table: each vector's [[ProbeP]] nearest
    * cells PER HALF, crossed into ≤ ProbeP² product probe cells — the
    * IMI twin of [[corpusProbes]], memoized the same way. Probe cost per
    * vector is 2·k' half-distance evaluations against two broadcast
    * codebooks (vs k ~ √n for the flat router) — the routing saving the
    * product index exists for.
    */
  private def imiProbes(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.checkpointedDf(s, s"imi_probes:$d:p=$ProbeP") {
      val (cents, _) = pqTrained(s, d, kImi(s, d), 2)
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      def ring(m: Int) = probeCells(
        e.select(col("vec_id"),
          slice(col("embedding"), m * (KmDim / 2) + 1, KmDim / 2)
            .as("embedding")),
        cents.where(col("m") === m).select(col("cell"), col("cen")),
        ProbeP)
      ring(0).withColumnRenamed("probe_cell", "pa")
        .join(ring(1).withColumnRenamed("probe_cell", "pb"), "vec_id")
        .select(col("vec_id"),
          (col("pa").cast("long") * ImiCellStride + col("pb"))
            .as("probe_cell"))
    }

  /** The router DISPATCH for the SemDeDup tier: flat assignments + flat
    * probe rings below the crossover (every graded scale — q353's plan is
    * byte-identical to its pre-router form there), IMI product cells +
    * MULTI-SEQUENCE product probe rings past it. The at-scale arm ships
    * [[imiMultiSeqProbes]] — the joint-distance frontier q365 measured
    * strictly better than the p-per-half square at the identical p²
    * budget (missed 106,194 vs 115,044 ppm against the same τ-pair
    * truth) — so production routes on the rule the repo's own audit
    * prefers. q364 exercises this exact (assigns, multiseq-probes)
    * pairing unconditionally so the arm the fixtures can't reach by
    * size stays oracle-gated at every sf; q357 keeps the square rings
    * gated as the audited alternative.
    */
  private def routedSemDedupInputs(s: SparkSession,
      d: String): (DataFrame, DataFrame) =
    if (!routerIsImi(embCount(s, d)))
      (kmTrained(s, d)._2,
        corpusProbes(s, d).select(col("vec_id"), col("probe_cell")))
    else (imiAssigns(s, d), imiMultiSeqProbes(s, d))

  /** The router dispatch for ASSIGNMENT-ONLY consumers (the kNN label
    * audit q339 needs cells but no probe rings): the flat trained
    * assignment below the crossover, IMI product cells past it.
    */
  private def routedAuditAssigns(s: SparkSession, d: String): DataFrame =
    if (!routerIsImi(embCount(s, d))) kmTrained(s, d)._2
    else imiAssigns(s, d)

  /** Oracle text for the per-half IMI probe rings over `src` (rn ≤ `p`),
    * shared by q357 (corpus-wide) and q359/q360 (query batch).
    */
  private def imiOracleRing(m: Int, src: String, p: Int,
      out: String): String =
    s"""$out AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${pqOracleSubDist("e.embedding", "c.cen",
                m * (KmDim / 2), KmDim / 2)}, c.cell) AS rn
       |    FROM $src e CROSS JOIN imic1_$m c) t WHERE rn <= $p)"""
      .stripMargin

  /** q357: IMI-ROUTED SEMDEDUP — the first real CONSUMER of the q354
    * product router (VERDICT r15 item 1): [[multiProbeSemDedupOn]] (the
    * exact kernel q353 runs on the flat router) fed by [[imiAssigns]] /
    * [[imiProbes]], so the dedup tier's candidate generation, cosine
    * verify, CC keeper rule, and per-cell report all ride PRODUCT cells.
    * This is q353's semantics past the flat router's 1024-cell ceiling:
    * cells stay k'² ~ √n forever (k' ~ n^(1/4) per half, ceiling 1024²
    * ≈ 10⁶ product cells), so within-cell pair work keeps the O(n^1.5)
    * contract at corpus sizes where [[kmKOf]]'s clamp would have made it
    * quadratic. Runs the square-ring IMI arm UNCONDITIONALLY — since
    * round 17 this is the AUDITED ALTERNATIVE, not the dispatched
    * default: [[routedSemDedupInputs]] ships [[imiMultiSeqProbes]]
    * (q364's frontier rings, measured strictly better by q365) past
    * the crossover and flat below it; this query keeps the square rule
    * oracle-gated at every graded sf. Output cell ids
    * are product cells (`cell_a·1024 + cell_b`). MEASURED at sf0.01
    * vs q353's flat routing: 60 within + 356 cross-cell verified
    * edges, 94 docs dropped (flat: 64 + 168, 71 dropped) — product
    * cells are structurally coarser per half, so more true pairs
    * straddle cells (hence the bigger cross count) but the doubled
    * ring geometry also catches more of them.
    *
    * Scale shape: probes are 2·k' half-distance maps per vector (the
    * router saving); each vector lands in ≤ [[ProbeP]]² product probe
    * cells, so candidate pair work is O(p⁴·n^1.5) — q353's class with a
    * p² premium; the verified edge list is localCheckpointed and CC runs
    * edge-grain (path-halving rounds).
    */
  private val q357 = GraftQuery(
    "q357_imi_semdedup",
    s"""WITH RECURSIVE ${pqOracleTrainFrom("embeddings", 0, "imi", 2, KImiSql)},
       |${pqOracleTrainFrom("embeddings", 1, "imi", 2, KImiSql)},
       |iasg AS (
       |  SELECT a.vec_id,
       |    CAST(a.cell AS BIGINT) * $ImiCellStride + b.cell AS cell
       |  FROM imia2_0 a JOIN imia2_1 b ON a.vec_id = b.vec_id),
       |${imiOracleRing(0, "embeddings", ProbeP, "iph_0")},
       |${imiOracleRing(1, "embeddings", ProbeP, "iph_1")},
       |ipb AS (
       |  SELECT p0.vec_id,
       |    CAST(p0.cell AS BIGINT) * $ImiCellStride + p1.cell AS cell
       |  FROM iph_0 p0 JOIN iph_1 p1 ON p0.vec_id = p1.vec_id),
       |icand AS (
       |  SELECT DISTINCT pa.vec_id AS u, pb2.vec_id AS v
       |  FROM ipb pa JOIN ipb pb2
       |    ON pa.cell = pb2.cell AND pa.vec_id < pb2.vec_id),
       |ipe AS (
       |  SELECT c.u, c.v
       |  FROM icand c JOIN embeddings a ON a.vec_id = c.u
       |  JOIN embeddings b ON b.vec_id = c.v
       |  WHERE ${cosSql("a", "b")} >= $SemDedupTau),
       |iecls AS (
       |  SELECT ipe.u, ipe.v, au.cell AS cu, av.cell AS cv
       |  FROM ipe JOIN iasg au ON au.vec_id = ipe.u
       |  JOIN iasg av ON av.vec_id = ipe.v),
       |iedges AS (SELECT u, v FROM ipe UNION SELECT v, u FROM ipe),
       |ireach AS (
       |  SELECT u, v FROM iedges
       |  UNION
       |  SELECT r.u, e.v FROM ireach r JOIN iedges e ON r.v = e.u),
       |icl AS (
       |  SELECT a.vec_id, a.cell,
       |    least(a.vec_id, coalesce(rm.m, a.vec_id)) AS grp
       |  FROM iasg a
       |  LEFT JOIN (SELECT u, min(v) AS m FROM ireach GROUP BY u) rm
       |    ON a.vec_id = rm.u),
       |iew AS (SELECT cu AS cell, CAST(count(*) AS BIGINT) AS n
       |  FROM iecls WHERE cu = cv GROUP BY 1),
       |iex AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM (
       |  SELECT cu AS cell FROM iecls WHERE cu <> cv
       |  UNION ALL SELECT cv FROM iecls WHERE cu <> cv) GROUP BY 1)
       |SELECT icl.cell, CAST(count(*) AS BIGINT) AS n_members,
       |  coalesce(any_value(iew.n), 0) AS n_edges_within,
       |  coalesce(any_value(iex.n), 0) AS n_edges_cross,
       |  CAST(count(DISTINCT icl.grp) AS BIGINT) AS n_kept,
       |  CAST(count(*) - count(DISTINCT icl.grp) AS BIGINT) AS n_dropped,
       |  CAST(((count(*) - count(DISTINCT icl.grp)) * 1000000) // count(*)
       |    AS BIGINT) AS dropped_ppm
       |FROM icl LEFT JOIN iew ON iew.cell = icl.cell
       |LEFT JOIN iex ON iex.cell = icl.cell
       |GROUP BY icl.cell ORDER BY icl.cell""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    multiProbeSemDedupOn(imiAssigns(s, d), imiProbes(s, d))
  }

  /** τ-pair TRUTH over the bounded query batch — q352's brute-force
    * edge list (batch × corpus, never corpus²), factored so q358 scores
    * a different candidate rule against the IDENTICAL truth frame.
    */
  private def tauPairTruth(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    broadcast(e.where(col("vec_id") < QueryBatch)
        .select(col("vec_id").as("u"), col("embedding").as("emb_a")))
      .join(e.select(col("vec_id").as("v"), col("embedding").as("emb_b")),
        col("u") =!= col("v"))
      .where(VectorFunctions.cosineSim(col("emb_a"), col("emb_b"))
        >= SemDedupTau)
      .select("u", "v")
      .localCheckpoint()
  }

  /** q358: MULTI-PROBE SEMDEDUP RECALL — the audit q353's own candidate
    * rule was missing (VERDICT r15 item 2): q352 measures the
    * CONTAINMENT rule ("v's assigned cell among u's probes"); q353
    * actually uses RING OVERLAP ("u and v share any probed cell"), a
    * different and previously unmeasured rule. Against the identical
    * bounded τ-pair truth ([[tauPairTruth]] — q352's frame), this emits
    * q352's exact columns for the ring-overlap rule at p ∈ {2, 4}, so
    * the two curves read side by side and a curation owner can state
    * the probe budget at which the dedup pass's miss is acceptable.
    * MEASURED at sf0.01 (113 true τ-pairs): ring overlap misses
    * 380,530 ppm at p=2 vs containment's 522,123, and 26,548 ppm at
    * p=4 vs containment's 371,681 — ring overlap dominates at equal p
    * because BOTH endpoints ring out (two chances to land in a shared
    * cell vs containment's one), and at p=4 the dedup tier's residual
    * miss is under 3% — the stated budget at which this pass's removal
    * rate is trustworthy on this corpus.
    *
    * Scale shape: truth is QueryBatch-bounded and localCheckpointed
    * (q352's discipline); each ring table is one n × k broadcast
    * assignment map; each caught count is two equi-joins (u, then
    * (v, cell)) plus a pair-distinct over the τ-edge list.
    */
  private val q358 = GraftQuery(
    "q358_multiprobe_semdedup_recall", {
      def caught(p: Int): String =
        s"""icg$p AS (
           |  SELECT CAST(count(*) AS BIGINT) AS caught FROM (
           |    SELECT DISTINCT tp.u, tp.v
           |    FROM tp JOIN rr ru ON ru.vec_id = tp.u AND ru.rn <= $p
           |    JOIN rr rv ON rv.vec_id = tp.v AND rv.rn <= $p
           |      AND rv.cell = ru.cell))""".stripMargin
      def row(p: Int): String =
        s"""SELECT CAST($p AS BIGINT) AS nprobe, n.n AS n_pairs, c.caught,
           |  CAST(CASE WHEN n.n = 0 THEN 0
           |    ELSE ((n.n - c.caught) * 1000000) // n.n END AS BIGINT)
           |    AS missed_ppm
           |FROM icg$p c CROSS JOIN np n""".stripMargin
      s"""WITH $kmOracleTrain,
         |tp AS MATERIALIZED (
         |  SELECT q.vec_id AS u, c.vec_id AS v
         |  FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) q
         |  JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE ${cosSql("q", "c")} >= $SemDedupTau),
         |np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tp),
         |rr AS MATERIALIZED (
         |  SELECT e.vec_id, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${kmOracleDist("e.embedding", "c.cen")}, c.cell) AS rn
         |  FROM embeddings e CROSS JOIN c1 c),
         |${caught(2)},
         |${caught(4)}
         |${row(2)}
         |UNION ALL ${row(4)}
         |ORDER BY nprobe""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val (c1, _) = kmTrained(s, d)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val tp = tauPairTruth(s, d)
    val np = broadcast(tp.agg(count(lit(1)).as("n_pairs")))
    val rows = Seq(2, 4).map { p =>
      // p = ProbeP rides the shared corpus ring artifact; wider rings
      // recompute the one n × k assignment map at their own width
      val r = if (p == ProbeP)
        corpusProbes(s, d).select(col("vec_id"), col("probe_cell"))
      else probeCells(e, c1, p)
      tp.join(r.select(col("vec_id").as("u"),
          col("probe_cell").as("cell_u")), "u")
        .join(r.select(col("vec_id").as("v"),
          col("probe_cell").as("cell_v")), "v")
        .where(col("cell_u") === col("cell_v"))
        .select("u", "v").distinct()
        .agg(count(lit(1)).as("caught"))
        .crossJoin(np)
        .select(lit(p.toLong).as("nprobe"), col("n_pairs"), col("caught"),
          when(col("n_pairs") === 0, 0L)
            .otherwise(expr("((n_pairs - caught) * 1000000) div n_pairs"))
            .cast("long").as("missed_ppm"))
    }
    rows.reduce(_.unionByName(_)).orderBy("nprobe")
  }

  /** The TRUE top-p² product cells by joint distance for the bounded
    * query batch — the set the multi-sequence algorithm (Babenko &
    * Lempitsky's traversal) enumerates lazily, computed with the
    * algorithm's own FRONTIER BOUND instead of the full grid: the
    * top-m joint sums of two sorted lists lie inside the top-m of EACH
    * list (if a's half-rank exceeded m, the m lower-ranked a' would
    * each give (a', b) ordered strictly before (a, b) — sums ≤, and a
    * sum tie means dA ties, where the (d, cell) half-order forces
    * ca' < ca, so the joint (d, ca, cb) tie-break also orders them
    * first). So each half keeps only its p² nearest cells (one window
    * over a batch × 2·k' broadcast map), the cross is p⁴ = 16 rows per
    * query — k'-INDEPENDENT, where materializing the grid would be
    * k'² ~ 10⁶ rows per query at the half ceiling — and one joint
    * window takes the exact top p² under the deterministic
    * (d, ca, cb) order. ScaleSpec pins pruned == full-grid on the
    * fixture. Output: (vec_id, ca, cb), exactly [[ProbeP]]² rows per
    * query.
    */
  private[operators] def imiMultiSeqCells(s: SparkSession, d: String,
      qe: DataFrame): DataFrame = {
    val cells = imiHalfTopCells(s, d, qe)
    val w = Window.partitionBy("vec_id")
      .orderBy(col("d0") + col("d1"), col("c0"), col("c1"))
    cells
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= ProbeP * ProbeP)
      .select(col("vec_id"), col("c0").as("ca"), col("c1").as("cb"))
  }

  /** The pruned multi-sequence frontier: per query, each half's p²
    * nearest cells (rank under the half's (d, cell) order) crossed into
    * ≤ p⁴ scored product cells — the superset [[imiMultiSeqCells]]'
    * joint top-p² window reads. Exposed for ScaleSpec's
    * pruned-vs-full-grid equivalence pin.
    */
  private[operators] def imiHalfTopCells(s: SparkSession, d: String,
      qe: DataFrame): DataFrame = {
    val (cents, _) = pqTrained(s, d, kImi(s, d), 2)
    def halfTop(m: Int) = qe
      .select(col("vec_id"),
        slice(col("embedding"), m * (KmDim / 2) + 1, KmDim / 2).as("hemb"))
      .crossJoin(broadcast(cents.where(col("m") === m)
        .select(col("cell").as(s"c$m"), col("cen"))))
      .select(col("vec_id"), col(s"c$m"),
        VectorFunctions.l2DistSq(col("hemb"), col("cen")).as(s"d$m"))
      .withColumn("hrn", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col(s"d$m"), col(s"c$m"))))
      .where(col("hrn") <= ProbeP * ProbeP)
      .drop("hrn")
    halfTop(0).join(halfTop(1), "vec_id")
  }

  /** Oracle twin of [[imiMultiSeqCells]] over the query-batch rows. */
  private def imiMultiSeqOracle(out: String): String =
    s"""$out AS (
       |  SELECT vec_id, ca, cb FROM (
       |    SELECT e.vec_id, c0.cell AS ca, c1.cell AS cb,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${pqOracleSubDist("e.embedding", "c0.cen", 0, KmDim / 2)}
       |          + ${pqOracleSubDist("e.embedding", "c1.cen", KmDim / 2, KmDim / 2)},
       |          c0.cell, c1.cell) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) e
       |    CROSS JOIN imic1_0 c0 CROSS JOIN imic1_1 c1) t
       |  WHERE rn <= ${ProbeP * ProbeP})""".stripMargin

  /** q359: IMI SERVING RECALL AUDIT — the q83/q102/q107 discipline
    * applied to the IMI tier (VERDICT r15 items 3+4): candidate-pool
    * recall@3 against the shared brute-force truth
    * ([[bruteForceTruth]]) for three probe policies at MATCHED
    * candidate budget (each probes 4 cells of ~n/√n vectors):
    * `flat` — the flat router at p² = 4 probes; `imi_square` — q355's
    * p-per-half rule (the p × p square); `imi_multiseq` — the true
    * best-p² product cells by joint distance ([[imiMultiSeqCells]],
    * multi-sequence's output set). The square-vs-multiseq gap is
    * exactly the correlated-halves regime q356 detects: when half
    * distances are imbalanced the square probes the wrong corner of
    * the grid. Per mode: candidates drawn, truth size, hits, recall
    * ppm — the table that says whether p-per-half is good enough or
    * the traversal order matters at this corpus. MEASURED at sf0.01:
    * multiseq 506,666 ppm from 12,883 candidates vs the square's
    * 483,333 from 13,180 — the traversal buys +23k ppm recall at ~2%
    * FEWER candidates, confirming traversal order matters even on this
    * mildly-correlated fixture; the flat router's 606,666 from 9,244
    * says that BELOW the crossover the flat router stays the better
    * tier (full-dim trained cells beat independent halves), which is
    * exactly why [[routedSemDedupInputs]] only switches past it.
    *
    * Scale shape: truth is the shared bounded-batch brute pass; each
    * mode's candidates are one equi-join of a batch-grain probe table
    * against the stored assignment/code tables; counts are one
    * aggregate per mode over batch-bounded rows.
    */
  /** ONE definition of the recall-audit row shared by every serving/
    * entry/prune audit (q359/q369/q380/q382): candidate-pool size,
    * truth hits against the shared `truth` CTE/frame, recall ppm. The
    * SQL form assumes CTEs `truth` and `nt(n)` are in scope.
    */
  private def recallModeRowSql(mode: String, cand: String): String =
    s"""SELECT '$mode' AS mode,
       |  (SELECT CAST(count(*) AS BIGINT) FROM $cand) AS n_candidates,
       |  nt.n AS n_truth,
       |  (SELECT CAST(count(*) AS BIGINT) FROM truth t
       |    WHERE EXISTS (SELECT 1 FROM $cand c
       |      WHERE c.vec_id = t.vec_id
       |        AND c.neighbor_id = t.neighbor_id)) AS n_hits,
       |  CAST(((SELECT count(*) FROM truth t
       |    WHERE EXISTS (SELECT 1 FROM $cand c
       |      WHERE c.vec_id = t.vec_id
       |        AND c.neighbor_id = t.neighbor_id)) * 1000000) // nt.n
       |    AS BIGINT) AS recall_ppm
       |FROM nt""".stripMargin

  /** Spark twin of [[recallModeRowSql]] over (vec_id, neighbor_id)
    * candidate frames; `truth` and `nt` are the shared brute-truth
    * leaf and its broadcast 1-row count.
    */
  private def recallModeRow(mode: String, cand: DataFrame,
      truth: DataFrame, nt: DataFrame): DataFrame = {
    val c = cand.localCheckpoint()
    val nc = c.agg(count(lit(1)).as("n_candidates"))
    val nh = truth.join(c, Seq("vec_id", "neighbor_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    nc.crossJoin(nt).crossJoin(nh)
      .select(lit(mode).as("mode"), col("n_candidates"), col("n_truth"),
        col("n_hits"),
        expr("(n_hits * 1000000) div n_truth").as("recall_ppm"))
  }

  private val q359 = GraftQuery(
    "q359_imi_serving_recall", {
      s"""WITH $kmOracleTrain,
         |${pqOracleTrainFrom("embeddings", 0, "imi", 2, KImiSql)},
         |${pqOracleTrainFrom("embeddings", 1, "imi", 2, KImiSql)},
         |$truthOracle,
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM truth),
         |fpr AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${kmOracleDist("e.embedding", "c.cen")}, c.cell) AS rn
         |    FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) e
         |    CROSS JOIN c1 c) t WHERE rn <= ${ProbeP * ProbeP}),
         |cf AS MATERIALIZED (
         |  SELECT p.vec_id, b.vec_id AS neighbor_id
         |  FROM fpr p JOIN a2 b ON b.cell = p.cell AND b.vec_id <> p.vec_id),
         |idx AS MATERIALIZED (
         |  SELECT a.vec_id, a.cell AS ca, b.cell AS cb
         |  FROM imia2_0 a JOIN imia2_1 b ON a.vec_id = b.vec_id),
         |${imiOracleRing(0,
            s"(SELECT * FROM embeddings WHERE vec_id < $QueryBatch)",
            ProbeP, "sqr_0")},
         |${imiOracleRing(1,
            s"(SELECT * FROM embeddings WHERE vec_id < $QueryBatch)",
            ProbeP, "sqr_1")},
         |cs AS MATERIALIZED (
         |  SELECT p0.vec_id, i.vec_id AS neighbor_id
         |  FROM sqr_0 p0 JOIN sqr_1 p1 ON p0.vec_id = p1.vec_id
         |  JOIN idx i ON i.ca = p0.cell AND i.cb = p1.cell
         |    AND i.vec_id <> p0.vec_id),
         |${imiMultiSeqOracle("msc")},
         |cm AS MATERIALIZED (
         |  SELECT j.vec_id, i.vec_id AS neighbor_id
         |  FROM msc j JOIN idx i ON i.ca = j.ca AND i.cb = j.cb
         |    AND i.vec_id <> j.vec_id)
         |${recallModeRowSql("flat", "cf")}
         |UNION ALL ${recallModeRowSql("imi_multiseq", "cm")}
         |UNION ALL ${recallModeRowSql("imi_square", "cs")}
         |ORDER BY mode""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val (c1f, a2f) = kmTrained(s, d)
    val (cents, codes) = pqTrained(s, d, kImi(s, d), 2)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val qe = e.where(col("vec_id") < QueryBatch)
    val truth = bruteForceTruth(e).localCheckpoint()
    val nt = broadcast(truth.agg(count(lit(1)).as("n_truth")))
    val idx = codes.where(col("m") === 0)
      .select(col("vec_id").as("neighbor_id"), col("cell").as("ca"))
      .join(codes.where(col("m") === 1)
        .select(col("vec_id").as("neighbor_id"), col("cell").as("cb")),
        "neighbor_id")
    def half(m: Int) = qe.select(col("vec_id"),
      slice(col("embedding"), m * (KmDim / 2) + 1, KmDim / 2)
        .as("embedding"))
    def centsOf(m: Int) =
      cents.where(col("m") === m).select(col("cell"), col("cen"))
    val candFlat = probeCells(qe, c1f, ProbeP * ProbeP)
      .join(a2f.select(col("vec_id").as("neighbor_id"), col("cell")),
        col("probe_cell") === col("cell")
          && col("vec_id") =!= col("neighbor_id"))
      .select("vec_id", "neighbor_id")
    val candSquare = probeCells(half(0), centsOf(0), ProbeP)
      .withColumnRenamed("probe_cell", "pa")
      .join(probeCells(half(1), centsOf(1), ProbeP)
        .withColumnRenamed("probe_cell", "pb"), "vec_id")
      .join(idx, col("pa") === col("ca") && col("pb") === col("cb")
        && col("vec_id") =!= col("neighbor_id"))
      .select("vec_id", "neighbor_id")
    val candMulti = imiMultiSeqCells(s, d, qe)
      .withColumnRenamed("ca", "pa").withColumnRenamed("cb", "pb")
      .join(idx, col("pa") === col("ca") && col("pb") === col("cb")
        && col("vec_id") =!= col("neighbor_id"))
      .select("vec_id", "neighbor_id")
    Seq(recallModeRow("flat", candFlat, truth, nt),
        recallModeRow("imi_multiseq", candMulti, truth, nt),
        recallModeRow("imi_square", candSquare, truth, nt))
      .reduce(_.unionByName(_)).orderBy("mode")
  }

  /** q360: MULTI-SEQUENCE IMI SEARCH — the traversal itself as a serving
    * tier (VERDICT r15 item 4's stronger arm): q355's IMI search with
    * the p × p square replaced by the TRUE best-p² product cells by
    * joint distance ([[imiMultiSeqCells]] — the set the multi-sequence
    * heap walk enumerates), then q72's exact-cosine top-3 rerank. At
    * equal candidate budget this dominates the square exactly when the
    * halves are correlated (q356's regime): the square spends probes on
    * the grid corner (worst-A × worst-B) while the traversal spends
    * them on the joint-distance frontier. q359 measures the gap; this
    * tier is what a server ships once the gap matters.
    *
    * Scale shape: probe scoring is a batch × 2·k' broadcast map (+ a
    * batch-grain top-p² window); the candidate join and rerank are
    * q355's shapes against the same stored code artifact.
    */
  private val q360 = GraftQuery(
    "q360_imi_multiseq_search",
    s"""WITH ${pqOracleTrainFrom("embeddings", 0, "imi", 2, KImiSql)},
       |${pqOracleTrainFrom("embeddings", 1, "imi", 2, KImiSql)},
       |idx AS (SELECT a.vec_id, a.cell AS ca, b.cell AS cb
       |  FROM imia2_0 a JOIN imia2_1 b ON a.vec_id = b.vec_id),
       |${imiMultiSeqOracle("msc")},
       |sim AS (
       |  SELECT j.vec_id AS vec_id, i.vec_id AS neighbor_id,
       |    ${cosSql("q", "c")} AS cos
       |  FROM msc j JOIN idx i ON i.ca = j.ca AND i.cb = j.cb
       |    AND i.vec_id <> j.vec_id
       |  JOIN embeddings q ON q.vec_id = j.vec_id
       |  JOIN embeddings c ON c.vec_id = i.vec_id)
       |SELECT vec_id, neighbor_id, rank, round(cos, 6) AS cos_sim FROM (
       |  SELECT vec_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sim) t
       |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val (_, codes) = pqTrained(s, d, kImi(s, d), 2)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val qe = e.where(col("vec_id") < QueryBatch)
    val idx = codes.where(col("m") === 0)
      .select(col("vec_id").as("neighbor_id"), col("cell").as("ca"))
      .join(codes.where(col("m") === 1)
        .select(col("vec_id").as("neighbor_id"), col("cell").as("cb")),
        "neighbor_id")
    val joined = imiMultiSeqCells(s, d, qe)
      .withColumnRenamed("ca", "pa").withColumnRenamed("cb", "pb")
      .join(idx, col("pa") === col("ca") && col("pb") === col("cb")
        && col("vec_id") =!= col("neighbor_id"))
      .join(e.select(col("vec_id"), col("embedding").as("emb_a")), "vec_id")
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("emb_b")), "neighbor_id")
    rankTop3(joined)
  }

  /** q361: IMI-ROUTED kNN LABEL AUDIT — the SECOND cell-bounded consumer
    * on the product router: q339's exact kernel ([[knnLabelAuditOn]] —
    * within-cell top-5 neighbor vote, flag on disagreement, label-grain
    * report) with cells from [[imiAssigns]] instead of the flat trained
    * assignment. Together with q357 this closes the VERDICT r15 flag:
    * BOTH within-cell pair-expansion tiers (SemDeDup and the label
    * audit — the two named ceiling casualties) now have a working,
    * oracle-gated path past the flat router's 1024-cell clamp, and
    * [[routedAuditAssigns]] switches q339 onto it automatically at the
    * crossover.
    *
    * Scale shape: identical to q339's (cell-bounded pair expansion,
    * per-vector windows, label-grain report) with cells k'² ~ √n at
    * EVERY corpus size instead of saturating at 1024. MEASURED at
    * sf0.01 the audit's verdict is router-stable: 455/500 flagged on
    * product cells vs 449/500 on flat cells (this synthetic corpus has
    * near-uniform labels, so high flag rates are expected) — the
    * product router preserves neighborhood structure well enough that
    * the audit reads the same.
    */
  private val q361 = GraftQuery(
    "q361_imi_knn_label_audit", {
      val pairDist = s"list_reduce(list_transform(range(1, $KmDim + 1), " +
        "j -> (CAST(x.embedding[j] AS DOUBLE) - " +
        "CAST(y.embedding[j] AS DOUBLE)) * " +
        "(CAST(x.embedding[j] AS DOUBLE) - " +
        "CAST(y.embedding[j] AS DOUBLE))), (p, q) -> p + q)"
      s"""WITH ${pqOracleTrainFrom("embeddings", 0, "imi", 2, KImiSql)},
         |${pqOracleTrainFrom("embeddings", 1, "imi", 2, KImiSql)},
         |ilab AS (
         |  SELECT a.vec_id,
         |    CAST(a.cell AS BIGINT) * $ImiCellStride + b.cell AS cell,
         |    e.embedding, CAST(e.label AS BIGINT) AS label
         |  FROM imia2_0 a JOIN imia2_1 b ON a.vec_id = b.vec_id
         |  JOIN embeddings e ON e.vec_id = a.vec_id),
         |pr AS (
         |  SELECT x.vec_id, y.label AS nlabel,
         |    row_number() OVER (PARTITION BY x.vec_id
         |      ORDER BY $pairDist, y.vec_id) AS rn
         |  FROM ilab x JOIN ilab y
         |    ON y.cell = x.cell AND y.vec_id <> x.vec_id),
         |votes AS (SELECT vec_id, nlabel, CAST(count(*) AS BIGINT) AS c
         |  FROM pr WHERE rn <= 5 GROUP BY 1, 2),
         |maj AS (
         |  SELECT vec_id, nlabel AS mlabel FROM (
         |    SELECT vec_id, nlabel, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY c DESC, nlabel) AS r
         |    FROM votes) t WHERE r = 1)
         |SELECT l.label, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(CASE WHEN m.mlabel <> l.label THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_flagged,
         |  CAST(sum(CASE WHEN m.mlabel <> l.label THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS flagged_ppm
         |FROM ilab l JOIN maj m ON m.vec_id = l.vec_id
         |GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    knnLabelAuditOn(imiAssigns(s, d)
      .join(Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("long").as("label")),
        "vec_id"))
  }

  /** Frozen IMI half-codebooks trained on the BASE shard only (buckets
    * 0-7) — [[frozenBaseIndex]]'s recipe at the router's (k', M=2)
    * sizing: global first-k' seeds, one Lloyd average over base — then
    * COLLECTED to plan literals (2·k' cells × 32 doubles — router
    * metadata, the [[kmAssign]] contract). The artifact an IMI index
    * append job ships to every task.
    */
  private def frozenImiCollected(s: SparkSession,
      d: String): Seq[(Int, Seq[(Int, Seq[Double])])] =
    graft.Artifacts.cached[Seq[(Int, Seq[(Int, Seq[Double])])]](
        s, s"frozen_imi_collected:$d") {
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val base = e.where(shardBucket(col("vec_id")) < 8)
      val sd = KmDim / 2
      val out = (0 until 2).map { m =>
        val off = m * sd
        val baseSub = base.select(col("vec_id"),
          slice(col("embedding"), off + 1, sd).as("embedding"))
        val c0m = e.where(col("vec_id") < kImi(s, d))
          .select(col("vec_id").cast("int").as("cell"),
            expr(s"transform(slice(embedding, ${off + 1}, $sd), " +
              "x -> CAST(x AS DOUBLE))").as("cen"))
        val c1m = kmRecompute(kmAssign(baseSub, c0m))
        (m, c1m.select(col("cell"), col("cen")).collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq)
      }
      (out, () => ())
    }

  /** The frozen-half-codebook PRODUCT-CELL routing as a stateless map
    * over any (vec_id, embedding) frame — batch (q362) or streaming
    * (q363), [[frozenAssignEncode]]'s discipline on the IMI router: both
    * half argmins are per-row `array_min` folds over the collected
    * literal codebooks ([[frozenImiCollected]]), no shuffle, no state —
    * an IMI index append ingests at arrival rate with 2·k' ~ 2·n^(1/4)
    * distance evaluations per row, the router economy q354 documents.
    */
  private[graft] def frozenImiRoute(s: SparkSession, d: String,
      rows: DataFrame): DataFrame = {
    VectorFunctions.register(s)
    val cbs = frozenImiCollected(s, d).toMap
    def half(m: Int) = array_min(transform(typedLit(cbs(m)), c => struct(
      VectorFunctions.l2DistSq(
        slice(col("embedding"), m * (KmDim / 2) + 1, KmDim / 2),
        c.getField("_2")).as("d"),
      c.getField("_1").as("cell")))).getField("cell")
    rows.select(col("vec_id"),
      half(0).cast("long").as("cell_a"), half(1).cast("long").as("cell_b"))
  }

  /** One half's base-restricted codebook training for the q362 oracle
    * (the [[pqOracleTrainOnBase]] recipe at the IMI sizing): global
    * seeds, Lloyd averages over `base` only, ending in `ic1_m`.
    */
  private def imiOracleTrainOnBase(m: Int): String = {
    val sd = KmDim / 2
    val off = m * sd
    s"""ib0_$m AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell,
       |    list_transform(range(1, $sd+1), j -> CAST(embedding[$off+j] AS DOUBLE)) AS cen
       |  FROM embeddings WHERE vec_id < $KImiSql),
       |ia1_$m AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT b.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY b.vec_id
       |        ORDER BY ${pqOracleSubDist("b.embedding", "c.cen", off, sd)}, c.cell) AS rn
       |    FROM base b CROSS JOIN ib0_$m c) t WHERE rn = 1),
       |ic1d_$m AS (
       |  SELECT a.cell, j,
       |    list_reduce(list(CAST(b.embedding[$off+j] AS DOUBLE) ORDER BY b.vec_id), (x,y) -> x+y)
       |      / count(*) AS mean_j
       |  FROM ia1_$m a JOIN base b ON a.vec_id = b.vec_id
       |  CROSS JOIN range(1, $sd+1) t(j)
       |  GROUP BY a.cell, j),
       |ic1_$m AS (SELECT cell, list(mean_j ORDER BY j) AS cen FROM ic1d_$m GROUP BY cell),
       |ir_$m AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT n.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ${pqOracleSubDist("n.embedding", "c.cen", off, sd)}, c.cell) AS rn
       |    FROM nw n CROSS JOIN ic1_$m c) t WHERE rn = 1)""".stripMargin
  }

  /** q362's oracle, shared verbatim by its streaming twin q363 (the
    * stream==batch gate, q94/q109's discipline on the IMI router).
    */
  private[graft] val imiRouteAppendOracle: String =
    s"""WITH base AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE $shardBucketSql < 8),
       |nw AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE $shardBucketSql >= 8),
       |${imiOracleTrainOnBase(0)},
       |${imiOracleTrainOnBase(1)}
       |SELECT n.vec_id, CAST(r0.cell AS BIGINT) AS cell_a,
       |  CAST(r1.cell AS BIGINT) AS cell_b
       |FROM nw n JOIN ir_0 r0 ON r0.vec_id = n.vec_id
       |JOIN ir_1 r1 ON r1.vec_id = n.vec_id
       |ORDER BY n.vec_id""".stripMargin

  /** q362: IMI INDEX APPEND — q94's incremental-maintenance semantics on
    * the product router: the arriving shard (LCG buckets 8-9, q94's
    * split) is routed to product cells by the half-codebooks FROZEN on
    * the base shard ([[frozenImiCollected]] — global seeds, base-only
    * Lloyd averages), emitting the (vec_id, cell_a, cell_b) rows q354's
    * routing table appends. Completes the router family's lifecycle
    * story: train (q354), serve (q355/q360), audit (q356/q359), consume
    * (q357/q361), and now MAINTAIN — a living IMI index ingests new
    * vectors as a stateless map whose per-row cost is 2·k' ~ 2·n^(1/4)
    * distance folds against literal codebooks, no shuffle, no retrain.
    */
  private val q362 = GraftQuery(
    "q362_imi_route_append", imiRouteAppendOracle) { (s, d) =>
    val nw = Tables.embeddings(s, d).select("vec_id", "embedding")
      .where(shardBucket(col("vec_id")) >= 8)
    frozenImiRoute(s, d, nw).orderBy("vec_id")
  }

  /** The corpus-wide MULTI-SEQUENCE probe table: every vector's p² best
    * product cells by joint distance ([[imiMultiSeqCells]]' pruned
    * frontier run over the whole corpus instead of the query batch),
    * packed to product-cell keys — the multiseq twin of [[imiProbes]]'
    * square, at the IDENTICAL probe budget (p² product cells per
    * vector). Memoized like every probe artifact.
    */
  private def imiMultiSeqProbes(s: SparkSession, d: String): DataFrame =
    graft.Artifacts.checkpointedDf(s, s"imi_ms_probes:$d:p=$ProbeP") {
      imiMultiSeqCells(s, d,
          Tables.embeddings(s, d).select("vec_id", "embedding"))
        .select(col("vec_id"),
          (col("ca").cast("long") * ImiCellStride + col("cb"))
            .as("probe_cell"))
    }

  /** The oracle's full-grid joint ranking over `src`, ending in
    * `$out(vec_id, cell)` product-cell keys at rn ≤ p² — the independent
    * (unpruned) computation of [[imiMultiSeqProbes]]' frontier, shared
    * by q364/q365.
    */
  private def imiMultiSeqProbesOracle(src: String, out: String): String =
    s"""$out AS (
       |  SELECT vec_id, CAST(ca AS BIGINT) * $ImiCellStride + cb AS cell
       |  FROM (
       |    SELECT e.vec_id, c0.cell AS ca, c1.cell AS cb,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${pqOracleSubDist("e.embedding", "c0.cen", 0, KmDim / 2)}
       |          + ${pqOracleSubDist("e.embedding", "c1.cen", KmDim / 2, KmDim / 2)},
       |          c0.cell, c1.cell) AS rn
       |    FROM $src e CROSS JOIN imic1_0 c0 CROSS JOIN imic1_1 c1) t
       |  WHERE rn <= ${ProbeP * ProbeP})""".stripMargin

  /** q364: MULTISEQ-PROBED IMI SEMDEDUP — q357 with the probe rings
    * upgraded from the p-per-half SQUARE to the true joint-distance
    * frontier ([[imiMultiSeqProbes]]), at the identical p² budget:
    * q359 measured the square probing the wrong grid corner under
    * correlated halves (the regime q356 detects), and the dedup tier's
    * candidate recall inherits that loss — this is the remediation,
    * [[multiProbeSemDedupOn]]'s kernel unchanged. MEASURED at sf0.01
    * the two rules verify near-identical corpus-wide edge sets
    * (frontier 414 edges / 92 dropped vs square 416 / 94), while the
    * τ-pair audit (q365) shows the frontier's candidate COVERAGE is
    * strictly better (missed 106,194 vs 115,044 ppm at equal budget):
    * on this mildly-correlated fixture the square's two extra edges
    * are redundant within-component edges, and the frontier's
    * advantage concentrates exactly where q356's correlated-halves
    * regime grows it.
    *
    * Scale shape: q357's in every term (O(p⁴·n^1.5) pair work, probe
    * cost 2·k' + a ≤p⁴-row per-vector window), with the frontier
    * enumeration k'-independent by the [[imiMultiSeqCells]] pruning.
    */
  private val q364 = GraftQuery(
    "q364_imi_multiseq_semdedup",
    s"""WITH RECURSIVE ${pqOracleTrainFrom("embeddings", 0, "imi", 2, KImiSql)},
       |${pqOracleTrainFrom("embeddings", 1, "imi", 2, KImiSql)},
       |iasg AS (
       |  SELECT a.vec_id,
       |    CAST(a.cell AS BIGINT) * $ImiCellStride + b.cell AS cell
       |  FROM imia2_0 a JOIN imia2_1 b ON a.vec_id = b.vec_id),
       |${imiMultiSeqProbesOracle("embeddings", "ipb")},
       |icand AS (
       |  SELECT DISTINCT pa.vec_id AS u, pb2.vec_id AS v
       |  FROM ipb pa JOIN ipb pb2
       |    ON pa.cell = pb2.cell AND pa.vec_id < pb2.vec_id),
       |ipe AS (
       |  SELECT c.u, c.v
       |  FROM icand c JOIN embeddings a ON a.vec_id = c.u
       |  JOIN embeddings b ON b.vec_id = c.v
       |  WHERE ${cosSql("a", "b")} >= $SemDedupTau),
       |iecls AS (
       |  SELECT ipe.u, ipe.v, au.cell AS cu, av.cell AS cv
       |  FROM ipe JOIN iasg au ON au.vec_id = ipe.u
       |  JOIN iasg av ON av.vec_id = ipe.v),
       |iedges AS (SELECT u, v FROM ipe UNION SELECT v, u FROM ipe),
       |ireach AS (
       |  SELECT u, v FROM iedges
       |  UNION
       |  SELECT r.u, e.v FROM ireach r JOIN iedges e ON r.v = e.u),
       |icl AS (
       |  SELECT a.vec_id, a.cell,
       |    least(a.vec_id, coalesce(rm.m, a.vec_id)) AS grp
       |  FROM iasg a
       |  LEFT JOIN (SELECT u, min(v) AS m FROM ireach GROUP BY u) rm
       |    ON a.vec_id = rm.u),
       |iew AS (SELECT cu AS cell, CAST(count(*) AS BIGINT) AS n
       |  FROM iecls WHERE cu = cv GROUP BY 1),
       |iex AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM (
       |  SELECT cu AS cell FROM iecls WHERE cu <> cv
       |  UNION ALL SELECT cv FROM iecls WHERE cu <> cv) GROUP BY 1)
       |SELECT icl.cell, CAST(count(*) AS BIGINT) AS n_members,
       |  coalesce(any_value(iew.n), 0) AS n_edges_within,
       |  coalesce(any_value(iex.n), 0) AS n_edges_cross,
       |  CAST(count(DISTINCT icl.grp) AS BIGINT) AS n_kept,
       |  CAST(count(*) - count(DISTINCT icl.grp) AS BIGINT) AS n_dropped,
       |  CAST(((count(*) - count(DISTINCT icl.grp)) * 1000000) // count(*)
       |    AS BIGINT) AS dropped_ppm
       |FROM icl LEFT JOIN iew ON iew.cell = icl.cell
       |LEFT JOIN iex ON iex.cell = icl.cell
       |GROUP BY icl.cell ORDER BY icl.cell""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    multiProbeSemDedupOn(imiAssigns(s, d), imiMultiSeqProbes(s, d))
  }

  /** q365: IMI DEDUP CANDIDATE-RULE RECALL — the q352/q358 audit
    * discipline applied to the IMI dedup tiers: against the SAME
    * bounded τ-pair truth ([[tauPairTruth]]), the fraction of true
    * pairs whose endpoints share a probed product cell, for the two
    * candidate rules at identical p² budget — `imi_square` (q357's
    * rings) and `imi_multiseq` (q364's). The table that justifies
    * q364's upgrade with a number instead of an analogy to q359:
    * MEASURED at sf0.01 (113 true τ-pairs) the frontier rule misses
    * 106,194 ppm vs the square's 115,044 — candidate coverage strictly
    * improves at equal budget, exactly as the serving-side audit
    * predicted. (Both beat the FLAT router's p=2 ring overlap —
    * q358's 380,530 ppm — because p² = 4 product probe cells per
    * vector is double that rule's cell budget; the like-for-like flat
    * comparison is q358's p=4 row, 26,548 ppm, reflecting the flat
    * router's finer full-dim cells below the crossover.)
    *
    * Scale shape: truth is QueryBatch-bounded; both probe tables are
    * the shared memoized artifacts; each caught count is q358's two
    * equi-joins + pair-distinct.
    */
  private val q365 = GraftQuery(
    "q365_imi_dedup_recall", {
      def caught(tag: String, pb: String): String =
        s"""mcg$tag AS (
           |  SELECT CAST(count(*) AS BIGINT) AS caught FROM (
           |    SELECT DISTINCT tp.u, tp.v
           |    FROM tp JOIN $pb ru ON ru.vec_id = tp.u
           |    JOIN $pb rv ON rv.vec_id = tp.v AND rv.cell = ru.cell))"""
          .stripMargin
      def row(rule: String, tag: String): String =
        s"""SELECT '$rule' AS rule, n.n AS n_pairs, c.caught,
           |  CAST(CASE WHEN n.n = 0 THEN 0
           |    ELSE ((n.n - c.caught) * 1000000) // n.n END AS BIGINT)
           |    AS missed_ppm
           |FROM mcg$tag c CROSS JOIN np n""".stripMargin
      s"""WITH ${pqOracleTrainFrom("embeddings", 0, "imi", 2, KImiSql)},
         |${pqOracleTrainFrom("embeddings", 1, "imi", 2, KImiSql)},
         |tp AS MATERIALIZED (
         |  SELECT q.vec_id AS u, c.vec_id AS v
         |  FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) q
         |  JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE ${cosSql("q", "c")} >= $SemDedupTau),
         |np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tp),
         |${imiOracleRing(0, "embeddings", ProbeP, "sph_0")},
         |${imiOracleRing(1, "embeddings", ProbeP, "sph_1")},
         |spb AS MATERIALIZED (
         |  SELECT p0.vec_id,
         |    CAST(p0.cell AS BIGINT) * $ImiCellStride + p1.cell AS cell
         |  FROM sph_0 p0 JOIN sph_1 p1 ON p0.vec_id = p1.vec_id),
         |${imiMultiSeqProbesOracle("embeddings", "mpb")},
         |${caught("s", "spb")},
         |${caught("m", "mpb")}
         |${row("imi_multiseq", "m")}
         |UNION ALL ${row("imi_square", "s")}
         |ORDER BY rule""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val tp = tauPairTruth(s, d)
    val np = broadcast(tp.agg(count(lit(1)).as("n_pairs")))
    def ruleRow(rule: String, pb: DataFrame): DataFrame =
      tp.join(pb.select(col("vec_id").as("u"),
          col("probe_cell").as("cell_u")), "u")
        .join(pb.select(col("vec_id").as("v"),
          col("probe_cell").as("cell_v")), "v")
        .where(col("cell_u") === col("cell_v"))
        .select("u", "v").distinct()
        .agg(count(lit(1)).as("caught"))
        .crossJoin(np)
        .select(lit(rule).as("rule"), col("n_pairs"), col("caught"),
          when(col("n_pairs") === 0, 0L)
            .otherwise(expr("((n_pairs - caught) * 1000000) div n_pairs"))
            .cast("long").as("missed_ppm"))
    ruleRow("imi_multiseq", imiMultiSeqProbes(s, d))
      .unionByName(ruleRow("imi_square",
        imiProbes(s, d).select(col("vec_id"), col("probe_cell"))))
      .orderBy("rule")
  }

  // ---- NN-Descent kNN-graph construction (q366/q367) ----

  /** Neighbors kept per vertex by the NN-Descent tiers. */
  private val NndK = 5

  /** Refinement rounds after the hashed init (graphs g0..g[[NndIters]]). */
  private val NndIters = 3

  /** Init candidate slots per vertex (K + 2 — the self-hit and hash
    * collisions cost at most two slots, so every vertex starts with at
    * least K distinct candidates in expectation).
    */
  private val NndInitSlots = NndK + 2

  /** Knuth multiplicative constant for the deterministic init hash. */
  private val NndMulA = 2654435761L
  private val NndMulB = 40503L

  /** Score a candidate edge list against the embeddings and keep each
    * source's top-[[NndK]] by (cosine desc, neighbor id) — the one
    * refinement kernel every NN-Descent round (and the brute truth in
    * q367) runs. Per-vertex window, never a single-task sort.
    */
  private def nndTopK(e: DataFrame, cand: DataFrame,
      lim: Int = NndK): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst").asc)
    cand
      .join(e.select(col("vec_id").as("src"), col("embedding").as("ea")), "src")
      .join(e.select(col("vec_id").as("dst"), col("embedding").as("eb")), "dst")
      .select(col("src"), col("dst"),
        VectorFunctions.cosineSim(col("ea"), col("eb")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= lim)
      .select("src", "dst", "cos", "rank")
  }

  /** The per-round NN-Descent graphs g0 (scored hashed init) through
    * g[[NndIters]], each a checkpointed leaf shared by q366/q367
    * (Dong et al. 2011, "Efficient k-nearest neighbor graph construction
    * for generic similarity measures", WWW — the join-based formulation:
    * each round's candidates are the current graph's
    * neighbors-of-neighbors over the SYMMETRIZED edge list, i.e. both
    * forward and reverse neighbors introduce their own neighbors, which
    * is what lets a random init converge in O(log n)-ish rounds).
    *
    * Determinism contract: init slot j of vertex v proposes
    * (v·[[NndMulA]] + j·[[NndMulB]]) mod n — an affine hash both engines
    * evaluate on BIGINTs — and every round re-scores its candidate set
    * with the shared left-to-right cosine kernel, ranking by
    * (cos desc, dst); ties are bit-identical across engines, so the
    * graphs are hash-comparable row sets, not just statistically alike.
    *
    * Scale shape (the reason NN-Descent is THE distributed kNN-graph
    * builder): state is the n·K edge list, partitioned by vertex id;
    * one round = symmetrize (≤ 2nK rows) → edge⋈edge on the shared
    * middle vertex (≤ n·(2K)² candidate rows — K is an index constant,
    * so this is O(n) with a K² factor, never n²) → score (O(n·K²·d)
    * flops) → per-vertex top-K window. Every join is an equi-join on
    * vertex ids; nothing is driver-sized except the n scalar.
    */
  private[operators] def nnDescentGraphs(
      s: SparkSession, d: String): Seq[DataFrame] = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    nndGraphsOn(s, s"nnd_graphs:$d", e, e.count())
  }

  /** [[nnDescentGraphs]]' build generalized to any vector subset: `vecs`
    * is the vertex set (the full corpus for q366, the frozen BASE shard
    * for q370/q371), `n` stays the FULL id-space modulus — init
    * proposals that hash to a non-member id are dropped by the
    * membership semi-join (a no-op when `vecs` is the whole corpus, so
    * q366's committed rows are unchanged by the generalization).
    */
  private def nndGraphsOn(s: SparkSession, key: String,
      vecs: DataFrame, n: => Long): Seq[DataFrame] =
    graft.Artifacts.cached[Seq[DataFrame]](s, key) {
      VectorFunctions.register(s)
      val e = vecs.select("vec_id", "embedding")
      val ids = e.select(col("vec_id").as("dst"))
      val init = e.select(col("vec_id").as("src"))
        .crossJoin(broadcast(s.range(1, NndInitSlots + 1).toDF("j")))
        .select(col("src"),
          ((col("src") * NndMulA + col("j") * NndMulB) % n).as("dst"))
        .where(col("dst") =!= col("src"))
        .join(ids, Seq("dst"), "left_semi")
        .distinct()
      val leaves = scala.collection.mutable.ArrayBuffer(
        graft.Artifacts.leafDf(nndTopK(e, init)))
      (1 to NndIters).foreach { _ =>
        val g = leaves.last._1.select("src", "dst")
        val sym = g.unionByName(
          g.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        val cand = sym.toDF("src", "mid")
          .join(sym.toDF("mid", "dst"), "mid")
          .where(col("dst") =!= col("src"))
          .select("src", "dst")
          .unionByName(g)
          .distinct()
        leaves += graft.Artifacts.leafDf(nndTopK(e, cand))
      }
      (leaves.map(_._1).toSeq, () => leaves.foreach(_._2()))
    }

  /** One scored-and-ranked oracle round: candidates `cand` → top-K CTE
    * `out` with (src, dst, cos, rank) — [[nndTopK]]'s SQL twin.
    */
  private def nndOracleRound(cand: String, out: String,
      lim: Int = NndK): String =
    s"""${out}s AS MATERIALIZED (
       |  SELECT c.src, c.dst, ${cosSql("a", "b")} AS cos
       |  FROM $cand c JOIN embeddings a ON a.vec_id = c.src
       |  JOIN embeddings b ON b.vec_id = c.dst),
       |$out AS MATERIALIZED (
       |  SELECT src, dst, cos, rank FROM (
       |    SELECT src, dst, cos, row_number() OVER (PARTITION BY src
       |      ORDER BY cos DESC, dst) AS rank FROM ${out}s) t
       |  WHERE rank <= $lim)""".stripMargin

  /** Oracle twin of one candidate-generation round over graph `g`:
    * symmetrize, neighbors-of-neighbors, union the current edges.
    */
  private def nndOracleCand(g: String, out: String): String =
    s"""${out}y AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM $g UNION ALL SELECT dst, src FROM $g)),
       |$out AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT a.src, b.dst FROM ${out}y a JOIN ${out}y b ON a.dst = b.src
       |    WHERE b.dst <> a.src
       |    UNION ALL
       |    SELECT src, dst FROM $g) u)""".stripMargin

  /** The full oracle CTE chain shared by q366/q367: hashed init, then
    * [[NndIters]] candidate+refine rounds, graphs named g0..g2.
    */
  private def nndOracleChain: String = nndOracleChainOn("embeddings")

  /** [[nndOracleChainOn]]: the chain over any vertex-set table `src`
    * (the Spark twin is [[nndGraphsOn]]) — the modulus stays the full
    * corpus count and non-member proposals drop via the IN semi-join,
    * a no-op when `src` is `embeddings` itself.
    */
  private def nndOracleChainOn(src: String): String = {
    val rounds = (1 to NndIters).map { i =>
      s"""${nndOracleCand(s"g${i - 1}", s"nc$i")},
         |${nndOracleRound(s"nc$i", s"g$i")}""".stripMargin
    }.mkString(",\n")
    s"""nndn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
       |nndic AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT e.vec_id AS src,
       |      (e.vec_id * $NndMulA + t.j * $NndMulB) % x.n AS dst
       |    FROM $src e CROSS JOIN nndn x
       |    CROSS JOIN range(1, ${NndInitSlots + 1}) t(j)) q
       |  WHERE dst <> src AND dst IN (SELECT vec_id FROM $src)),
       |${nndOracleRound("nndic", "g0")},
       |$rounds""".stripMargin
  }

  /** q366: NN-DESCENT kNN GRAPH — the distributed kNN-graph builder
    * (Dong et al. 2011) the ANN family serves FROM an index but a
    * curation pipeline also needs AS AN ARTIFACT (UMAP/SemDeDup-style
    * graph consumers, hard-negative mining, graph-based diversity
    * sampling all start from "every vector's K nearest"). Starting from
    * a deterministic hashed guess, each round introduces every vertex to
    * its neighbors' neighbors (symmetrized) and keeps the best K — no
    * quantizer, no training: the graph ITSELF is the index being
    * refined. Output is the bounded batch's final graph (full-corpus
    * iteration, batch-bounded emission — q352's discipline).
    *
    * MEASURED at sf0.01 (n=500): recall@5 vs brute cosine truth climbs
    * 12,000 → 154,000 → 282,000 → 384,000 ppm over rounds 0→1→2→3
    * (q367's curve) — steady gains from a pure-hash start, but SLOW
    * convergence, and honestly so: this synthetic corpus is
    * near-isotropic (q321 measured a near-flat covariance spectrum), the
    * regime where NN-Descent's neighbor-of-neighbor transitivity is
    * weakest (a vector's neighbors' neighbors are barely closer than
    * random). On clusterable data the same 3 rounds from the same init
    * reach 0.876 (ScaleSpec's 10-Gaussian-cluster fixture, measured) —
    * the audit exists to measure which regime a corpus is in rather
    * than assume.
    *
    * Scale shape: see [[nnDescentGraphs]] — O(n·K²) candidates and
    * O(n·K²·d) flops per round on vertex-id equi-joins; the K²
    * candidate bound (not n²) is the whole point of the algorithm.
    */
  private val q366 = GraftQuery(
    "q366_nndescent_knn_graph",
    s"""WITH $nndOracleChain
       |SELECT src AS vec_id, rank, dst AS neighbor_id,
       |  round(cos, 6) AS cos_sim
       |FROM g$NndIters WHERE src < $QueryBatch
       |ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    nnDescentGraphs(s, d).last
      .where(col("src") < QueryBatch)
      .select(col("src").as("vec_id"), col("rank"),
        col("dst").as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** q367: NN-DESCENT CONVERGENCE AUDIT — the q352/q358/q365 audit
    * discipline applied to q366: against brute-force cosine top-K truth
    * over the bounded query batch, recall@K of each round's graph
    * (g0 = scored hashed init, g1, g2), as integer ppm. The curve IS
    * the operator's correctness argument ("the rounds converge toward
    * the true graph"), and its elbow is where a corpus owner stops
    * paying for rounds: here round 1 buys 14 recall points, rounds 2
    * and 3 about 11 each — no elbow yet, so on THIS (near-isotropic,
    * q321) corpus more rounds keep paying, exactly the call the audit
    * exists to make from measurement. Truth is batch × corpus
    * ([[nndTopK]] over the batch's full candidate fan — never corpus²).
    */
  private val q367 = GraftQuery(
    "q367_nndescent_convergence", {
      def row(i: Int): String =
        s"""SELECT CAST($i AS BIGINT) AS iter, n.n_true,
           |  (SELECT CAST(count(*) AS BIGINT) FROM g$i g
           |     JOIN tru t ON t.src = g.src AND t.dst = g.dst) AS hits,
           |  ((SELECT count(*) FROM g$i g
           |     JOIN tru t ON t.src = g.src AND t.dst = g.dst)
           |   * 1000000) // n.n_true AS recall_ppm
           |FROM ntr n""".stripMargin
      s"""WITH $nndOracleChain,
         |trus AS (
         |  SELECT q.vec_id AS src, c.vec_id AS dst, ${cosSql("q", "c")} AS cos
         |  FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) q
         |  JOIN embeddings c ON q.vec_id <> c.vec_id),
         |tru AS (
         |  SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (PARTITION BY src
         |      ORDER BY cos DESC, dst) AS rank FROM trus) t
         |  WHERE rank <= $NndK),
         |ntr AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM tru)
         |${(0 to NndIters).map(row).mkString("\nUNION ALL ")}
         |ORDER BY iter""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val batchPairs = e.where(col("vec_id") < QueryBatch)
      .select(col("vec_id").as("src"))
      .join(e.select(col("vec_id").as("dst")), col("src") =!= col("dst"))
    val truth = nndTopK(e, batchPairs).select("src", "dst").localCheckpoint()
    val nt = broadcast(truth.agg(count(lit(1)).as("n_true")))
    nnDescentGraphs(s, d).zipWithIndex.map { case (g, i) =>
      g.select("src", "dst").where(col("src") < QueryBatch)
        .join(truth, Seq("src", "dst"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(nt)
        .select(lit(i.toLong).as("iter"), col("n_true"), col("hits"),
          expr("(hits * 1000000) div n_true").cast("long").as("recall_ppm"))
    }.reduce(_.unionByName(_)).orderBy("iter")
  }

  // ---- graph-ANN serving over the NN-Descent graph (q368/q369) ----

  /** Beam width per query per round. */
  private val GbsBeam = 8

  /** Expansion rounds after the scored entry set. */
  private val GbsHops = 3

  /** Hashed entry points per query (same affine family as the graph's
    * own init, so serving needs no side artifact beyond the graph).
    */
  private val GbsEntries = 4

  /** Fixed-round greedy beam search over the SYMMETRIZED final
    * NN-Descent graph — the serving tier that makes q366's artifact a
    * consumed index, not a demo (the r15 IMI-router lesson applied at
    * build time): start from [[GbsEntries]] hashed vertices, and for
    * each of [[GbsHops]] rounds expand the current beam by its graph
    * neighbors, score every candidate against the query with the exact
    * shared cosine kernel, and keep the best [[GbsBeam]] — the
    * single-layer HNSW/NSG serving idea with a FIXED hop count, which
    * is what makes the traversal expressible identically in both
    * engines (no data-dependent convergence loop) and deterministic
    * (ties break on (cos desc, vertex id)).
    *
    * Returns (final scored beam, every (qid, v) pair the search ever
    * scored) — the second frame is the honest WORK accounting q369
    * audits against the flat IVF tier's candidate count.
    *
    * Scale shape: the graph is the only index — per query per round the
    * frontier (≤ [[GbsBeam]] rows) equi-joins the edge list on vertex id
    * (bucketed/partitioned by src at scale), producing ≤ B·(2K+1)
    * scored rows; total work per query is O(E + H·B·K·d) flops,
    * INDEPENDENT of corpus size n — the property that makes graph ANN
    * the low-latency serving tier while IVF's per-probe cost is n/cells.
    * Batch-bounded queries; nothing driver-sized but the n scalar.
    */
  private def graphBeamSearch(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    beamSearchOn(s, s"gbs:$d", nnDescentGraphs(s, d).last, e,
      e.where(col("vec_id") < QueryBatch), e.count())
  }

  /** [[graphBeamSearch]]'s build generalized like [[nndGraphsOn]]:
    * `graph` is the edge list to walk, `vecs` its vertex set (scoring +
    * entry membership), `queries` the rows to serve — for q370 the
    * queries are NEW-shard vectors absent from `vecs`, which is why
    * entries carry the same membership semi-join as the graph init.
    */
  private def beamSearchOn(s: SparkSession, key: String, graph: DataFrame,
      vecs: DataFrame, queries: DataFrame,
      n: => Long): (DataFrame, DataFrame) =
    graft.Artifacts.cached[(DataFrame, DataFrame)](s, key) {
      VectorFunctions.register(s)
      val e = vecs.select("vec_id", "embedding")
      val entries = queries.select(col("vec_id").as("qid"))
        .crossJoin(broadcast(s.range(1, GbsEntries + 1).toDF("i")))
        .select(col("qid"),
          ((col("qid") * NndMulA + col("i") * NndMulB) % n).as("v"))
        .where(col("v") =!= col("qid"))
        .join(e.select(col("vec_id").as("v")), Seq("v"), "left_semi")
        .distinct()
      beamCore(s, graph, vecs, queries, entries)
    }

  /** [[beamSearchOn]] with CALLER-SUPPLIED entry points (qid, v) instead
    * of the blind affine hash — the hook the hierarchical tier (q379)
    * uses to seed the layer-0 walk from the layer-1 descent's winners.
    */
  private def beamSearchFrom(s: SparkSession, key: String, graph: DataFrame,
      vecs: DataFrame, queries: DataFrame,
      entries: DataFrame): (DataFrame, DataFrame) =
    graft.Artifacts.cached[(DataFrame, DataFrame)](s, key) {
      beamCore(s, graph, vecs, queries, entries.select("qid", "v").distinct())
    }

  /** The shared fixed-hop beam kernel: expand `entries` [[GbsHops]]
    * times over the symmetrized `graph`, score with the exact cosine
    * kernel, keep [[GbsBeam]] per query per round. Returns checkpointed
    * (final beam, all visited (qid, v) pairs) leaves plus their release.
    */
  private def beamCore(s: SparkSession, graph: DataFrame, vecs: DataFrame,
      queries: DataFrame, entries: DataFrame)
      : ((DataFrame, DataFrame), () => Unit) = {
      VectorFunctions.register(s)
      val e = vecs.select("vec_id", "embedding")
      val g = graph.select("src", "dst")
      val sym = g.unionByName(
        g.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val q = queries
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      def score(cand: DataFrame): DataFrame =
        cand.join(q, "qid")
          .join(e.select(col("vec_id").as("v"), col("embedding").as("vemb")),
            "v")
          .select(col("qid"), col("v"),
            VectorFunctions.cosineSim(col("qemb"), col("vemb")).as("cos"))
      def topB(scored: DataFrame, lim: Int): DataFrame = {
        val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("v").asc)
        scored.withColumn("rn", row_number().over(w)).where(col("rn") <= lim)
          .select("qid", "v", "cos")
      }
      var scoredAll = entries
      var beam = topB(score(entries), GbsBeam)
      (1 to GbsHops).foreach { _ =>
        val expanded = beam.select(col("qid"), col("v"))
          .join(sym.toDF("v", "w"), "v")
          .where(col("w") =!= col("qid"))
          .select(col("qid"), col("w").as("v"))
          .unionByName(beam.select("qid", "v"))
          .distinct()
        scoredAll = scoredAll.unionByName(expanded).distinct()
        beam = topB(score(expanded), GbsBeam)
      }
      val (beamLeaf, relB) = graft.Artifacts.leafDf(beam)
      val (scoredLeaf, relS) = graft.Artifacts.leafDf(scoredAll)
      ((beamLeaf, scoredLeaf), () => { relB(); relS() })
    }

  /** One scored-and-beamed oracle round: candidate pairs `cand` →
    * top-`lim` CTE `out` with (qid, v, cos) — the beam kernel's SQL twin.
    */
  private def gbsOracleRound(cand: String, out: String, lim: Int): String =
    s"""${out}s AS MATERIALIZED (
       |  SELECT c.qid, c.v, ${cosSql("a", "b")} AS cos
       |  FROM $cand c JOIN embeddings a ON a.vec_id = c.qid
       |  JOIN embeddings b ON b.vec_id = c.v),
       |$out AS MATERIALIZED (
       |  SELECT qid, v, cos FROM (
       |    SELECT qid, v, cos, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, v) AS rn FROM ${out}s) t
       |  WHERE rn <= $lim)""".stripMargin

  /** Oracle twin of one beam expansion over beam CTE `b` (symmetrized
    * edge CTE `sym` — `nsym` for the full-corpus graph chains).
    */
  private def gbsOracleExpand(b: String, out: String,
      sym: String = "nsym"): String =
    s"""$out AS MATERIALIZED (
       |  SELECT DISTINCT qid, v FROM (
       |    SELECT f.qid, g.dst AS v FROM $b f JOIN $sym g ON g.src = f.v
       |    WHERE g.dst <> f.qid
       |    UNION ALL
       |    SELECT qid, v FROM $b) u)""".stripMargin

  /** The full beam-search oracle chain on top of [[nndOracleChain]]:
    * symmetrized edges, hashed entries, then [[GbsHops]] expand+beam
    * rounds; the final beam is CTE `b[[GbsHops]]`, the scored-work union
    * is `gall`.
    */
  private def gbsOracleChain: String = gbsOracleChainOn(
    s"SELECT * FROM embeddings WHERE vec_id < $QueryBatch", "embeddings")

  /** Symmetrized edges + hashed-entry CTEs over query rows `qexpr` and
    * vertex-set table `vsrc` — shared by the beam chain (q368/q369/q370)
    * and the one-hop attach oracle (q371).
    */
  private def gbsOraclePrefix(qexpr: String, vsrc: String): String =
    s"""nsym AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM g$NndIters
       |    UNION ALL SELECT dst, src FROM g$NndIters)),
       |${hashedEntriesCte(qexpr, vsrc, "nndn", "gent")}""".stripMargin

  private def gbsOracleChainOn(qexpr: String, vsrc: String): String = {
    val rounds = (1 to GbsHops).map { h =>
      s"""${gbsOracleExpand(s"b${h - 1}", s"x$h")},
         |${gbsOracleRound(s"x$h", s"b$h", GbsBeam)}""".stripMargin
    }.mkString(",\n")
    val work = (1 to GbsHops).map(h => s"SELECT qid, v FROM x$h")
      .mkString("\n  UNION ALL ")
    s"""${gbsOraclePrefix(qexpr, vsrc)},
       |${gbsOracleRound("gent", "b0", GbsBeam)},
       |$rounds,
       |gall AS MATERIALIZED (
       |  SELECT DISTINCT qid, v FROM (
       |  SELECT qid, v FROM gent
       |  UNION ALL $work) u)""".stripMargin
  }

  /** q368: GRAPH BEAM-SEARCH ANN — top-3 serving for the bounded query
    * batch by [[graphBeamSearch]] over q366's NN-Descent graph: the
    * graph-native serving tier beside the quantizer tiers (flat IVF
    * q72, IMI q355/q360, PQ-ADC q93) — no trained codebooks at all; the
    * kNN graph is simultaneously the index and the navigation
    * structure, and serving cost is hop-bounded rather than cell-
    * bounded. MEASURED at sf0.01: 323,333 ppm recall@3 at ~85 scored
    * pairs/query — q369 reads it beside flat IVF at ProbeP.
    */
  private val q368 = GraftQuery(
    "q368_graph_beam_search",
    s"""WITH $nndOracleChain,
       |$gbsOracleChain
       |SELECT qid AS vec_id, rn AS rank, v AS neighbor_id,
       |  round(cos, 6) AS cos_sim FROM (
       |  SELECT qid, v, cos, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, v) AS rn FROM b$GbsHops) t
       |WHERE rn <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    val (beam, _) = graphBeamSearch(s, d)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("v").asc)
    beam.withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .select(col("qid").as("vec_id"), col("rank"),
        col("v").as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** q369: GRAPH-ANN RECALL + BUDGET AUDIT — the q359 serving-audit
    * discipline applied to q368: against the shared brute cosine top-3
    * truth, candidate-set recall (== served recall@3, since serving is
    * an exact-cosine rerank of the candidates: any candidate outranking
    * a truth neighbor is itself a truth neighbor) and the number of
    * scored (query, vertex) pairs, for the beam search vs the flat IVF
    * tier at ProbeP — the work-for-recall trade a serving owner
    * actually chooses on.
    *
    * MEASURED at sf0.01: see the committed row values — the reading on
    * this near-isotropic corpus (q321) is that the beam's hop-bounded
    * budget buys materially less recall than IVF's cell-bounded budget
    * at similar scored-pair counts, because graph navigability tracks
    * the SAME neighbor-transitivity the q367 curve measured as weak
    * here; on a clusterable corpus the ordering flips. The audit exists
    * to measure which side of that line a corpus is on.
    */
  private val q369 = GraftQuery(
    "q369_graph_ann_recall", {
      s"""WITH $kmOracleTrain,
         |$nndOracleChain,
         |$gbsOracleChain,
         |$truthOracle,
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM truth),
         |gbc AS MATERIALIZED (
         |  SELECT qid AS vec_id, v AS neighbor_id FROM gall),
         |fpr AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${kmOracleDist("e.embedding", "c.cen")}, c.cell) AS rn
         |    FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) e
         |    CROSS JOIN c1 c) t WHERE rn <= $ProbeP),
         |ivc AS MATERIALIZED (
         |  SELECT p.vec_id, b.vec_id AS neighbor_id
         |  FROM fpr p JOIN a2 b ON b.cell = p.cell AND b.vec_id <> p.vec_id)
         |${recallModeRowSql("flat_ivf_p2", "ivc")}
         |UNION ALL ${recallModeRowSql("graph_beam", "gbc")}
         |ORDER BY mode""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val qe = e.where(col("vec_id") < QueryBatch)
    val truth = bruteForceTruth(e).localCheckpoint()
    val nt = broadcast(truth.agg(count(lit(1)).as("n_truth")))
    val (c1f, a2f) = kmTrained(s, d)
    val candFlat = probeCells(qe, c1f, ProbeP)
      .join(a2f.select(col("vec_id").as("neighbor_id"), col("cell")),
        col("probe_cell") === col("cell")
          && col("vec_id") =!= col("neighbor_id"))
      .select("vec_id", "neighbor_id")
    val (_, scoredAll) = graphBeamSearch(s, d)
    val candBeam = scoredAll
      .select(col("qid").as("vec_id"), col("v").as("neighbor_id"))
    recallModeRow("flat_ivf_p2", candFlat, truth, nt)
      .unionByName(recallModeRow("graph_beam", candBeam, truth, nt))
      .orderBy("mode")
  }

  // ---- frozen-base-graph index maintenance (q370/q371) ----

  /** The `base` shard CTE shared by the q370/q371 oracles (q362's
    * frozen-artifact convention: LCG buckets 0-7 are the corpus the
    * graph was built on, 8-9 the newly arrived shard).
    */
  private def nndBaseCte: String =
    s"base AS MATERIALIZED (SELECT * FROM embeddings WHERE $shardBucketSql < 8)"

  /** q370: NN-GRAPH APPEND — the online-insert half of the graph-index
    * lifecycle (q362's frozen-route discipline applied to q366's
    * artifact): the kNN graph is built ONCE over the frozen base shard,
    * and each newly arrived vector gets its [[NndK]] graph edges by the
    * SAME fixed-hop beam search q368 serves with — which is exactly how
    * online graph indexes (HNSW-family) grow: insert = search, connect
    * to what the search found, full NN-Descent repair runs offline.
    * Output is every new-shard vector's inserted edge list.
    *
    * Scale shape: the base graph build is [[nndGraphsOn]]'s O(n·K²) per
    * round; per inserted vector the beam costs O(E + H·B·K·d) flops
    * against the frozen edge list — n-independent, so ingest keeps up
    * at file-arrival rate while the quadratic-ish repair stays an
    * offline pass. Membership semi-joins keep every proposal inside the
    * base shard (the modulus stays the full id space).
    */
  private val q370 = GraftQuery(
    "q370_nnd_graph_append",
    s"""WITH $nndBaseCte,
       |${nndOracleChainOn("base")},
       |${gbsOracleChainOn(
          s"SELECT * FROM embeddings WHERE $shardBucketSql >= 8", "base")}
       |SELECT qid AS vec_id, rn AS rank, v AS neighbor_id,
       |  round(cos, 6) AS cos_sim FROM (
       |  SELECT qid, v, cos, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, v) AS rn FROM b$GbsHops) t
       |WHERE rn <= $NndK ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val base = e.where(shardBucket(col("vec_id")) < 8)
    val bg = nndGraphsOn(s, s"nnd_base_graphs:$d", base, e.count())
    val (beam, _) = beamSearchOn(s, s"gba:$d", bg.last, base,
      e.where(shardBucket(col("vec_id")) >= 8), e.count())
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("v").asc)
    beam.withColumn("rank", row_number().over(w)).where(col("rank") <= NndK)
      .select(col("qid").as("vec_id"), col("rank"),
        col("v").as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** The q371 oracle: one-hop attach — entries plus their graph ring,
    * scored once, top-[[NndK]] (no intermediate beam pruning, the shape
    * a single stateful streaming aggregation can hold).
    */
  private[graft] def graphAttachOracle: String =
    s"""WITH $nndBaseCte,
       |${nndOracleChainOn("base")},
       |${gbsOraclePrefix(
          s"SELECT * FROM embeddings WHERE $shardBucketSql >= 8", "base")},
       |${gbsOracleExpand("gent", "xa")},
       |${gbsOracleRound("xa", "ba", NndK)}
       |SELECT qid AS vec_id, rn AS rank, v AS neighbor_id,
       |  round(cos, 6) AS cos_sim FROM (
       |  SELECT qid, v, cos, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, v) AS rn FROM ba) t
       |WHERE rn <= $NndK ORDER BY vec_id, rank""".stripMargin

  /** Streaming-safe one-hop graph attach (q371's plan): arriving
    * new-shard vectors hash to entry vertices (stateless affine map),
    * pull the entries' graph ring via stream-static equi-joins on the
    * frozen symmetrized edge list, score with the shared cosine kernel,
    * and keep top-[[NndK]] in the ONE stateful operator (complete-mode
    * per-query aggregation, q111's serving shape; collect_set dedups
    * the entry∪ring union exactly like the oracle's UNION). This is the
    * ingest-rate tier of graph maintenance — provisional edges at
    * file-arrival rate, q370's multi-hop beam (and the offline
    * NN-Descent repair) owning quality — and its state is K+entry rows
    * per NEW vector, never the graph.
    */
  private[graft] def graphAttachPlan(s: SparkSession, d: String,
      qs: DataFrame): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val n = e.count()
    val base = e.where(shardBucket(col("vec_id")) < 8)
    val sym = graft.Artifacts.checkpointedDf(s, s"nnd_base_sym:$d") {
      val bg = nndGraphsOn(s, s"nnd_base_graphs:$d", base, n)
        .last.select("src", "dst")
      bg.unionByName(
        bg.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    }
    val q = qs.select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val entries = q
      .withColumn("i", explode(typedLit((1 to GbsEntries).toArray)))
      .select(col("qid"), col("qemb"),
        ((col("qid") * NndMulA + col("i") * NndMulB) % n).as("v"))
      .where(col("v") =!= col("qid"))
      .join(base.select(col("vec_id").as("v")), Seq("v"), "left_semi")
    val ring = entries
      .join(sym.toDF("v", "w"), "v")
      .where(col("w") =!= col("qid"))
      .select(col("qid"), col("qemb"), col("w").as("v"))
    entries.select("qid", "qemb", "v").unionByName(ring)
      .join(e.select(col("vec_id").as("v"), col("embedding").as("vemb")), "v")
      .select(col("qid"), col("v"),
        VectorFunctions.cosineSim(col("qemb"), col("vemb")).as("cos"))
      .groupBy("qid")
      .agg(slice(sort_array(collect_set(struct(
        (col("cos") * lit(-1)).as("ord"), col("v").as("neighbor_id"),
        col("cos").as("cos")))), 1, NndK).as("top"))
  }

  /** The q388 oracle: delete-masked one-hop graph serving — live batch
    * queries, hashed entries plus their FULL-graph ring, tombstoned
    * vertices (q110's LCG-bucket-9 fixture) excluded from both sides,
    * scored once, top-3 (the one-hop shape a single stateful streaming
    * aggregation can hold — q371's discipline with q377's mask).
    */
  private[graft] def graphMaskedServeOracle: String =
    s"""WITH $nndOracleChain,
       |${gbsOraclePrefix(
          s"SELECT * FROM embeddings WHERE vec_id < $QueryBatch" +
            s" AND NOT (${tombstoneSql("vec_id")})", "embeddings")},
       |${gbsOracleExpand("gent", "xm")},
       |xml AS (SELECT qid, v FROM xm
       |  WHERE NOT (${tombstoneSql("v")})),
       |${gbsOracleRound("xml", "bm", 3)}
       |SELECT qid AS vec_id, rn AS rank, v AS neighbor_id,
       |  round(cos, 6) AS cos_sim FROM (
       |  SELECT qid, v, cos, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, v) AS rn FROM bm) t
       |WHERE rn <= 3 ORDER BY vec_id, rank""".stripMargin

  /** Streaming-safe delete-masked graph serving (q388's plan): arriving
    * query vectors hash to entries (stateless), pull the FULL frozen
    * graph's one-hop ring via stream-static equi-joins, and the
    * deletion-request list is applied as stream-static ANTI-joins on
    * BOTH sides before the ONE stateful top-3 aggregation — q377's
    * "neither asks nor answers nor holds a rank slot" rule at ingest
    * rate, with the mask an id TABLE (an external request log at
    * production), never a recomputable predicate.
    */
  private[graft] def graphMaskedServePlan(s: SparkSession, d: String,
      qs: DataFrame): DataFrame = {
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val n = e.count()
    val sym = graft.Artifacts.checkpointedDf(s, s"nnd_full_sym:$d") {
      val g = nnDescentGraphs(s, d).last.select("src", "dst")
      g.unionByName(
        g.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    }
    val tomb = e.select("vec_id").where(tombstoned(col("vec_id")))
    val q = qs.select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      .join(tomb.toDF("qid"), Seq("qid"), "left_anti")
    val entries = q
      .withColumn("i", explode(typedLit((1 to GbsEntries).toArray)))
      .select(col("qid"), col("qemb"),
        ((col("qid") * NndMulA + col("i") * NndMulB) % n).as("v"))
      .where(col("v") =!= col("qid"))
      .join(e.select(col("vec_id").as("v")), Seq("v"), "left_semi")
    val ring = entries
      .join(sym.toDF("v", "w"), "v")
      .where(col("w") =!= col("qid"))
      .select(col("qid"), col("qemb"), col("w").as("v"))
    entries.select("qid", "qemb", "v").unionByName(ring)
      .join(tomb.toDF("v"), Seq("v"), "left_anti")
      .join(e.select(col("vec_id").as("v"), col("embedding").as("vemb")), "v")
      .select(col("qid"), col("v"),
        VectorFunctions.cosineSim(col("qemb"), col("vemb")).as("cos"))
      .groupBy("qid")
      .agg(slice(sort_array(collect_set(struct(
        (col("cos") * lit(-1)).as("ord"), col("v").as("neighbor_id"),
        col("cos").as("cos")))), 1, 3).as("top"))
  }

  /** Whole-vector exact-L2² SQL fragment (both sides float embeddings,
    * per-element double cast, left-to-right fold — the
    * [[graft.functions.VectorFunctions.l2DistSq]] twin, q102's l2truth
    * form factored).
    */
  private def l2SqSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, $KmDim+1), j -> " +
      s"(CAST($a.embedding[j] AS DOUBLE) - CAST($b.embedding[j] AS DOUBLE))" +
      s" * (CAST($a.embedding[j] AS DOUBLE) - CAST($b.embedding[j] AS DOUBLE))" +
      s"), (x,y) -> x+y)"

  /** TwoNN intrinsic-dimension summary over `vecs` (Facco, d'Errico,
    * Rodriguez & Laio 2017): per bounded-batch query, the exact L2
    * first and second neighbor distances; under Poisson sampling of a
    * d-dimensional manifold the ratio μ = d2/d1 is Pareto(d), and the
    * MLE is d̂ = n / Σ ln μ. Returns the one-row
    * (n_queries, sum_ln_mu_e6, id_hat_ppm) summary — shared by q372 and
    * the ScaleSpec regime test. ln agreement between engines is the
    * q328 precedent (sub-ulp libm drift, absorbed by the 1e-6 grain).
    */
  private[operators] def twoNNSummary(s: SparkSession,
      vecs: DataFrame): DataFrame = {
    VectorFunctions.register(s)
    val e = vecs.select("vec_id", "embedding")
    val q = broadcast(e.where(col("vec_id") < QueryBatch)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb")))
    val w = Window.partitionBy("qid").orderBy(col("l2").asc, col("nid").asc)
    val nn2 = q
      .join(e.select(col("vec_id").as("nid"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("nemb")),
        col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        VectorFunctions.l2DistSq(col("qemb"), col("nemb")).as("l2"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .groupBy("qid")
      .agg(min(when(col("rn") === 1, col("l2"))).as("d1"),
        min(when(col("rn") === 2, col("l2"))).as("d2"))
      .where(col("d1") > 0)
    nn2
      .agg(count(lit(1)).as("n_queries"),
        sum(log(col("d2") / col("d1")) * lit(0.5)).as("slm"))
      .select(col("n_queries"),
        round(col("slm") * lit(1e6)).cast("long").as("sum_ln_mu_e6"),
        round(col("n_queries").cast("double") / col("slm") * lit(1e6))
          .cast("long").as("id_hat_ppm"))
  }

  /** q372: INTRINSIC-DIMENSION audit (TwoNN) — the number the whole
    * graph/ANN family's regime readings hinge on, measured instead of
    * inferred: q367's slow convergence, q369's beam-vs-IVF loss, and
    * q321's near-flat spectrum all say "this corpus has no
    * low-dimensional structure"; TwoNN states it in dimensions. Only
    * the two nearest exact L2 neighbors per bounded-batch query enter
    * (distribution-free in everything else), and d̂ = n / Σ ln(d2/d1)
    * — the μ ratios of a d-manifold are Pareto(d), so the log-sum IS
    * the sufficient statistic. MEASURED at sf0.01: d̂ ≈ 38.9 — far
    * above the ~5-10 where graph/LSH methods shine, exactly the regime
    * line the family's audits keep measuring from the other side
    * (ScaleSpec pins the contrast: a 1-d curve embedded in the same
    * 64-d space measures d̂ ≈ 1).
    *
    * Scale shape: batch × corpus scoring (q44's audited shape), one
    * per-query 2-row window, one scalar epilogue; at production the
    * 2-NN pairs come from any serving tier instead of brute force —
    * the estimator only needs (d1, d2) per sampled point.
    */
  private val q372 = GraftQuery(
    "q372_intrinsic_dimension",
    s"""WITH nn2 AS (
       |  SELECT qid, min(CASE WHEN rn = 1 THEN l2 END) AS d1,
       |    min(CASE WHEN rn = 2 THEN l2 END) AS d2
       |  FROM (
       |    SELECT q.vec_id AS qid, c.vec_id AS nid,
       |      ${l2SqSql("q", "c")} AS l2,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${l2SqSql("q", "c")}, c.vec_id) AS rn
       |    FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) q
       |    JOIN embeddings c ON q.vec_id <> c.vec_id) t
       |  WHERE rn <= 2 GROUP BY qid HAVING min(CASE WHEN rn = 1 THEN l2 END) > 0),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |    sum(ln(d2 / d1) * 0.5) AS slm
       |  FROM nn2)
       |SELECT n_queries,
       |  CAST(round(slm * 1000000.0) AS BIGINT) AS sum_ln_mu_e6,
       |  CAST(round(CAST(n_queries AS DOUBLE) / slm * 1000000.0) AS BIGINT)
       |    AS id_hat_ppm
       |FROM agg""".stripMargin) { (s, d) =>
    twoNNSummary(s, Tables.embeddings(s, d))
  }

  /** q373: GRAPH-ROUTED LABEL AUDIT — the third router arm of the
    * label-noise family (q339 votes within flat coarse cells, q361
    * within IMI product cells, this within the NN-Descent graph's own
    * edges): each vertex's ≤[[NndK]] graph neighbors vote, majority
    * label (count desc, label asc) against the stored label, flagged
    * counts per label class. The graph arm asks a question the cell
    * arms cannot: the vote set here is the index's BEST-K BELIEF rather
    * than cell cohabitation, so its flagged rate directly inherits the
    * graph's measured quality (q367: 38% recall on this corpus) — read
    * beside q339's rows, the delta prices what label auditing loses
    * when the kNN artifact is approximate. Vote fan-in is K by
    * construction (no hot-cell skew arm needed — the property that
    * makes graph votes attractive at 100 TB).
    *
    * MEASURED at sf0.01: mean flagged 920k ppm vs q339's 898k — parity,
    * not degradation, because this corpus's labels are near-random
    * against the geometry in the first place (both arms flag ~90%, the
    * q339 baseline reading); the arms separate exactly where labels DO
    * track geometry, which is what a real curation corpus has.
    *
    * Scale shape: one equi-join of the n·K edge list against the label
    * table, a per-vertex K-row majority window, one label-grain rollup.
    */
  private val q373 = GraftQuery(
    "q373_graph_label_audit",
    s"""WITH $nndOracleChain,
       |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
       |gv AS (
       |  SELECT g.src, l.label AS nlabel, CAST(count(*) AS BIGINT) AS c
       |  FROM g$NndIters g JOIN lab l ON l.vec_id = g.dst
       |  GROUP BY 1, 2),
       |maj AS (
       |  SELECT src AS vec_id, nlabel AS mlabel FROM (
       |    SELECT src, nlabel, row_number() OVER (PARTITION BY src
       |      ORDER BY c DESC, nlabel) AS r FROM gv) t
       |  WHERE r = 1)
       |SELECT l.label, CAST(count(*) AS BIGINT) AS n_vecs,
       |  CAST(sum(CASE WHEN m.mlabel <> l.label THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_flagged,
       |  CAST(sum(CASE WHEN m.mlabel <> l.label THEN 1 ELSE 0 END)
       |    * 1000000 // count(*) AS BIGINT) AS flagged_ppm
       |FROM lab l JOIN maj m ON m.vec_id = l.vec_id
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val lab = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val g = nnDescentGraphs(s, d).last.select("src", "dst")
    val wV = Window.partitionBy("src")
    val maj = g
      .join(lab.select(col("vec_id").as("dst"), col("label").as("nlabel")),
        "dst")
      .groupBy("src", "nlabel").agg(count(lit(1)).as("c"))
      .withColumn("r",
        row_number().over(wV.orderBy(col("c").desc, col("nlabel"))))
      .where(col("r") === 1)
      .select(col("src").as("vec_id"), col("nlabel").as("mlabel"))
    lab.join(maj, "vec_id")
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("mlabel") =!= col("label"), 1L).otherwise(0L))
          .as("n_flagged"))
      .withColumn("flagged_ppm", expr("(n_flagged * 1000000) div n_vecs"))
      .orderBy("label")
  }

  /** q375: GRAPH-EDGE SEMDEDUP — the dedup consumer that needs NO
    * dedicated index: the NN-Descent graph's edges already carry exact
    * cosines, so the SemDeDup pass is a FILTER (cos ≥ τ) on the serving
    * artifact, unordered-pair dedup, and the shared CC machinery — zero
    * additional pair expansion, zero quantizer. The fourth candidate
    * rule beside flat cells (q325), flat probe rings (q353), and IMI
    * product cells (q357/q364), and the cheapest by construction: its
    * candidate set IS the index's best-K belief. The flip side is
    * priced by q376 — the pass can only remove what the graph found.
    * Output is the corpus-grain dedup summary (vectors, τ-edges,
    * kept/dropped, dropped ppm).
    *
    * Scale shape: one filter over the n·K edge list, pair
    * normalization, and the path-halving CC (O(log diameter) rounds) —
    * the only dedup tier whose candidate work is literally ZERO beyond
    * the index the corpus already serves from.
    */
  private val q375 = GraftQuery(
    "q375_graph_semdedup",
    s"""WITH RECURSIVE $nndOracleChain,
       |ge AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM g$NndIters WHERE cos >= $SemDedupTau),
       |ged AS (SELECT DISTINCT u, v FROM (
       |  SELECT u, v FROM ge UNION ALL SELECT v, u FROM ge) x),
       |gre AS (
       |  SELECT u, v FROM ged
       |  UNION
       |  SELECT r.u, e.v FROM gre r JOIN ged e ON r.v = e.u),
       |grm AS (SELECT u, min(v) AS m FROM gre GROUP BY u),
       |gcl AS (
       |  SELECT e.vec_id,
       |    least(e.vec_id, coalesce(rm.m, e.vec_id)) AS grp
       |  FROM embeddings e LEFT JOIN grm rm ON rm.u = e.vec_id)
       |SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       |  (SELECT CAST(count(*) AS BIGINT) FROM ge) AS n_tau_edges,
       |  CAST(count(DISTINCT grp) AS BIGINT) AS n_kept,
       |  CAST(count(*) - count(DISTINCT grp) AS BIGINT) AS n_dropped,
       |  CAST((count(*) - count(DISTINCT grp)) * 1000000 // count(*)
       |    AS BIGINT) AS dropped_ppm
       |FROM gcl""".stripMargin) { (s, d) =>
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val g = nnDescentGraphs(s, d).last
    val ge = g.where(col("cos") >= SemDedupTau)
      .select(least(col("src"), col("dst")).as("doc_a"),
        greatest(col("src"), col("dst")).as("doc_b"))
      .distinct().localCheckpoint()
    val cc = connectedComponents(
      e.select(col("vec_id").as("doc_id")), ge)
    val ne = broadcast(ge.agg(count(lit(1)).as("n_tau_edges")))
    cc.agg(count(lit(1)).as("n_vecs"),
        countDistinct(col("cluster_id")).as("n_kept"))
      .crossJoin(ne)
      .select(col("n_vecs"), col("n_tau_edges"), col("n_kept"),
        (col("n_vecs") - col("n_kept")).as("n_dropped"),
        expr("((n_vecs - n_kept) * 1000000) div n_vecs").as("dropped_ppm"))
  }

  /** q376: GRAPH-DEDUP CANDIDATE COVERAGE — q358/q365's audit applied
    * to q375's rule: against the identical bounded τ-pair truth
    * ([[tauPairTruth]]), the fraction of true pairs present as a graph
    * edge (what q375 can remove) and inside ONE NN-Descent verify
    * round's candidate set (current edges ∪ neighbors-of-neighbors —
    * NOT a superset relation edge-wise, a direct edge is not a 2-path,
    * so the round row unions both). The table that prices q375's
    * "free" candidate set: the edge rule's miss tracks the graph's own
    * recall (q367 — MEASURED 548,672 ppm missed at sf0.01), and the
    * verify-round row (522,123 ppm) says one extra scored pass buys
    * back under 3 points here, because on a near-isotropic corpus the
    * neighbors-of-neighbors are barely enriched (q372's d̂ ≈ 39, the
    * same physics) — read beside the ring/containment/IMI curves,
    * which reach 26,548 ppm at p=4: on THIS corpus the quantizer tiers
    * are the dedup backbone and the graph is the serving artifact.
    *
    * Scale shape: truth is QueryBatch-bounded (q352's discipline); the
    * edge rule is two equi-joins; the 2-hop rule is one edge⋈edge on
    * the shared middle vertex, K²-bounded per truth pair.
    */
  private val q376 = GraftQuery(
    "q376_graph_dedup_recall", {
      def row(rule: String, cte: String): String =
        s"""SELECT '$rule' AS rule, n.n AS n_pairs, c.caught,
           |  CAST(CASE WHEN n.n = 0 THEN 0
           |    ELSE ((n.n - c.caught) * 1000000) // n.n END AS BIGINT)
           |    AS missed_ppm
           |FROM $cte c CROSS JOIN tnp n""".stripMargin
      s"""WITH $nndOracleChain,
         |tp AS MATERIALIZED (
         |  SELECT q.vec_id AS u, c.vec_id AS v
         |  FROM (SELECT * FROM embeddings WHERE vec_id < $QueryBatch) q
         |  JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE ${cosSql("q", "c")} >= $SemDedupTau),
         |tnp AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tp),
         |gsy AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM g$NndIters
         |    UNION ALL SELECT dst, src FROM g$NndIters)),
         |ce1 AS (
         |  SELECT CAST(count(*) AS BIGINT) AS caught FROM (
         |    SELECT DISTINCT tp.u, tp.v FROM tp
         |    JOIN gsy g ON g.src = tp.u AND g.dst = tp.v)),
         |ce2 AS (
         |  SELECT CAST(count(*) AS BIGINT) AS caught FROM (
         |    SELECT DISTINCT u, v FROM (
         |      SELECT tp.u, tp.v FROM tp
         |      JOIN gsy a ON a.src = tp.u
         |      JOIN gsy b ON b.src = a.dst AND b.dst = tp.v
         |      UNION ALL
         |      SELECT tp.u, tp.v FROM tp
         |      JOIN gsy g ON g.src = tp.u AND g.dst = tp.v) x))
         |${row("graph_edge", "ce1")}
         |UNION ALL ${row("graph_verify_round", "ce2")}
         |ORDER BY rule""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val tp = tauPairTruth(s, d)
    val np = broadcast(tp.agg(count(lit(1)).as("n_pairs")))
    val g = nnDescentGraphs(s, d).last.select("src", "dst")
    val gsy = g.unionByName(
      g.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .localCheckpoint()
    def ruleRow(rule: String, caughtPairs: DataFrame): DataFrame =
      caughtPairs.distinct()
        .agg(count(lit(1)).as("caught"))
        .crossJoin(np)
        .select(lit(rule).as("rule"), col("n_pairs"), col("caught"),
          when(col("n_pairs") === 0, 0L)
            .otherwise(expr("((n_pairs - caught) * 1000000) div n_pairs"))
            .cast("long").as("missed_ppm"))
    val edgeHits = tp
      .join(gsy.select(col("src").as("u"), col("dst").as("v")),
        Seq("u", "v"), "left_semi")
    val twoHop = tp
      .join(gsy.select(col("src").as("u"), col("dst").as("mid")), "u")
      .join(gsy.select(col("src").as("mid"), col("dst").as("v")),
        Seq("mid", "v"))
      .select("u", "v")
    ruleRow("graph_edge", edgeHits.select("u", "v"))
      .unionByName(ruleRow("graph_verify_round",
        twoHop.unionByName(edgeHits.select("u", "v"))))
      .orderBy("rule")
  }

  // ---- graph-index delete lifecycle (q377/q378) ----

  /** q377: GRAPH TOMBSTONE SERVE — q110's delete discipline on the
    * graph-native tier: a deletion-request list (the shared LCG-bucket-9
    * fixture standing in for an arbitrary id log) must stop vectors from
    * being SERVED immediately, but a graph index cannot drop them from
    * NAVIGATION until the offline repair pass rewires edges (q378) —
    * deleting a vertex's edges at serve time would disconnect the very
    * regions the beam routes through (the known HNSW delete hazard). So
    * the beam walks the UNCHANGED graph (tombstoned vertices still relay)
    * and serving reranks the search's full VISITED set with the mask
    * applied as a broadcast anti-join on both sides (a tombstoned vector
    * neither asks nor answers, and never occupies a rank slot — q110's
    * rule verbatim). Reranking the visited set rather than the final
    * 8-row beam is the filtered-search shape: the beam's tail already
    * paid for those scores, and masking only the beam would starve
    * exactly the queries whose best neighbors were deleted.
    *
    * Scale shape: the mask is a deletion-log-sized broadcast; everything
    * else is q368's hop-bounded plan — per-query work stays O(E+H·B·K·d),
    * independent of n AND of the deletion rate.
    */
  private val q377 = GraftQuery(
    "q377_graph_tombstone_serve",
    s"""WITH $nndOracleChain,
       |$gbsOracleChain
       |SELECT qid AS vec_id, rn AS rank, v AS neighbor_id,
       |  round(cos, 6) AS cos_sim FROM (
       |  SELECT qid, v, cos, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, v) AS rn FROM (
       |    SELECT g.qid, g.v, ${cosSql("a", "b")} AS cos
       |    FROM gall g JOIN embeddings a ON a.vec_id = g.qid
       |    JOIN embeddings b ON b.vec_id = g.v
       |    WHERE NOT (${tombstoneSql("g.qid")})
       |      AND NOT (${tombstoneSql("g.v")})) s) t
       |WHERE rn <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val tomb = e.select("vec_id").where(tombstoned(col("vec_id")))
    val (_, scoredAll) = graphBeamSearch(s, d)
    val live = scoredAll
      .join(broadcast(tomb.toDF("qid")), Seq("qid"), "left_anti")
      .join(broadcast(tomb.toDF("v")), Seq("v"), "left_anti")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("v").asc)
    live
      .join(e.select(col("vec_id").as("qid"), col("embedding").as("qemb")),
        "qid")
      .join(e.select(col("vec_id").as("v"), col("embedding").as("vemb")), "v")
      .select(col("qid"), col("v"),
        VectorFunctions.cosineSim(col("qemb"), col("vemb")).as("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .select(col("qid").as("vec_id"), col("rank"),
        col("v").as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** q378: GRAPH DELETE REPAIR — the offline edge-patch pass that
    * retires q377's runtime mask (q114's compaction role in the graph
    * lifecycle): every live vertex holding an edge to a tombstoned
    * neighbor gets its edge list rebuilt from (its remaining live
    * neighbors) ∪ (the deleted neighbors' own live rings — the 2-hop
    * bridge that preserves the connectivity the deletion would sever,
    * the standard HNSW/Vamana repair rule), rescored by the shared exact
    * cosine kernel and cut back to top-[[NndK]]. Output is the repaired
    * edge lists for the bounded batch's affected vertices.
    *
    * Scale shape: affected vertices are found by one equi-join of the
    * n·K edge list against the deletion-log broadcast; the bridge
    * candidate fan is ≤ 2K per deleted edge (K² per vertex worst case,
    * the NN-Descent round bound), then one per-vertex top-K window —
    * O(a·K²·d) flops for a affected vertices, never corpus².
    */
  private val q378 = GraftQuery(
    "q378_graph_delete_repair",
    s"""WITH $nndOracleChain,
       |dead AS (SELECT vec_id FROM embeddings
       |  WHERE ${tombstoneSql("vec_id")}),
       |gsy AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM g$NndIters
       |    UNION ALL SELECT dst, src FROM g$NndIters)),
       |aff AS (
       |  SELECT DISTINCT src FROM g$NndIters
       |  WHERE dst IN (SELECT vec_id FROM dead)
       |    AND src NOT IN (SELECT vec_id FROM dead)),
       |rcand AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT g.src, g.dst FROM g$NndIters g JOIN aff a ON a.src = g.src
       |    WHERE g.dst NOT IN (SELECT vec_id FROM dead)
       |    UNION ALL
       |    SELECT g.src, y.dst FROM g$NndIters g JOIN aff a ON a.src = g.src
       |    JOIN gsy y ON y.src = g.dst
       |    WHERE g.dst IN (SELECT vec_id FROM dead)
       |      AND y.dst NOT IN (SELECT vec_id FROM dead)
       |      AND y.dst <> g.src) u),
       |${nndOracleRound("rcand", "rg")}
       |SELECT src AS vec_id, rank, dst AS neighbor_id,
       |  round(cos, 6) AS cos_sim
       |FROM rg WHERE src < $QueryBatch
       |ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val tomb = e.select("vec_id").where(tombstoned(col("vec_id")))
    val g = nnDescentGraphs(s, d).last.select("src", "dst")
    val gsy = g.unionByName(
      g.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val aff = g
      .join(broadcast(tomb.toDF("dst")), Seq("dst"), "left_semi")
      .select("src").distinct()
      .join(broadcast(tomb.toDF("src")), Seq("src"), "left_anti")
    val keptLive = g
      .join(aff, Seq("src"), "left_semi")
      .join(broadcast(tomb.toDF("dst")), Seq("dst"), "left_anti")
      .select("src", "dst")
    val bridge = g
      .join(aff, Seq("src"), "left_semi")
      .join(broadcast(tomb.toDF("dst")), Seq("dst"), "left_semi")
      .join(gsy.toDF("dst", "w"), "dst")
      .where(col("w") =!= col("src"))
      .join(broadcast(tomb.toDF("w")), Seq("w"), "left_anti")
      .select(col("src"), col("w").as("dst"))
    nndTopK(e, keptLive.unionByName(bridge).distinct())
      .where(col("src") < QueryBatch)
      .select(col("src").as("vec_id"), col("rank"),
        col("dst").as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  // ---- hierarchical graph search: HNSW-style entry layer (q379/q380) ----

  /** Corpus-to-layer-1 shrink ratio (HNSW's 1/e^λ level rule, fixed at
    * one level): every ~[[HierRatio]]-th vector is promoted.
    */
  private val HierRatio = 16

  /** Layer-1 floor so tiny fixtures still hold a navigable graph. */
  private val HierFloor = 16

  /** Layer-1 member count m = max([[HierFloor]], n/[[HierRatio]]).
    * Membership is the id prefix [0, m) — dense vec_ids make the prefix
    * as arbitrary as any hash for the synthetic fixture, and it lets the
    * layer's OWN init hash mod m propose only members (no rank
    * compression pass); production promotes by id hash and carries a
    * member-rank column instead. Both engines compute m from the one
    * corpus count (the kmKOf discipline).
    */
  private def hierM(n: Long): Long = math.max(HierFloor.toLong, n / HierRatio)

  /** [[nndOracleChainOn]] with caller-controlled CTE names: graphs
    * `{pfx}g0..{pfx}g[[NndIters]]`, init `{pfx}nndic`, and the id-space
    * modulus read from `modCte` (one BIGINT column `n`) — what lets a
    * second NND chain (the layer-1 graph) live in the same WITH clause
    * as the full-corpus one.
    */
  private def nndOracleChainNamed(src: String, pfx: String,
      modCte: String): String = {
    val rounds = (1 to NndIters).map { i =>
      s"""${nndOracleCand(s"${pfx}g${i - 1}", s"${pfx}nc$i")},
         |${nndOracleRound(s"${pfx}nc$i", s"${pfx}g$i")}""".stripMargin
    }.mkString(",\n")
    s"""${pfx}nndic AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT e.vec_id AS src,
       |      (e.vec_id * $NndMulA + t.j * $NndMulB) % x.n AS dst
       |    FROM $src e CROSS JOIN $modCte x
       |    CROSS JOIN range(1, ${NndInitSlots + 1}) t(j)) q
       |  WHERE dst <> src AND dst IN (SELECT vec_id FROM $src)),
       |${nndOracleRound(s"${pfx}nndic", s"${pfx}g0")},
       |$rounds""".stripMargin
  }

  /** Symmetrized-edges CTE over directed edge CTE `g`. */
  private def symCte(g: String, out: String): String =
    s"""$out AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM $g UNION ALL SELECT dst, src FROM $g))""".stripMargin

  /** Hashed-entry CTE with caller-controlled modulus CTE (column `n`)
    * and membership table — [[gbsOraclePrefix]]'s `gent` generalized for
    * the layer-1 descent, whose proposals hash mod m.
    */
  private def hashedEntriesCte(qexpr: String, vsrc: String,
      modCte: String, out: String): String =
    s"""$out AS MATERIALIZED (
       |  SELECT DISTINCT qid, v FROM (
       |    SELECT q.vec_id AS qid,
       |      (q.vec_id * $NndMulA + t.i * $NndMulB) % x.n AS v
       |    FROM ($qexpr) q
       |    CROSS JOIN $modCte x
       |    CROSS JOIN range(1, ${GbsEntries + 1}) t(i)) s
       |  WHERE v <> qid AND v IN (SELECT vec_id FROM $vsrc))""".stripMargin

  /** The full hierarchical-search oracle CTE block, appended after
    * [[nndOracleChain]] (which provides `nndn` and the layer-0 graph
    * g[[NndIters]]): layer-1 size `hm`, the layer-1 NND chain
    * (hg0..hg[[NndIters]]), the layer-1 descent (hent → hb*), the
    * layer-0 walk seeded by the descent's top-[[GbsEntries]] (zent →
    * zb*), and the two visited-set unions `hgall`/`zgall` q380 audits.
    */
  private def hierOracleCtes: String = {
    val l1src = s"(SELECT * FROM embeddings WHERE vec_id < (SELECT n FROM hm))"
    val hRounds = (1 to GbsHops).map { h =>
      s"""${gbsOracleExpand(s"hb${h - 1}", s"hx$h", "hsym")},
         |${gbsOracleRound(s"hx$h", s"hb$h", GbsBeam)}""".stripMargin
    }.mkString(",\n")
    val zRounds = (1 to GbsHops).map { h =>
      s"""${gbsOracleExpand(s"zb${h - 1}", s"zx$h", "zsym")},
         |${gbsOracleRound(s"zx$h", s"zb$h", GbsBeam)}""".stripMargin
    }.mkString(",\n")
    val hWork = (1 to GbsHops).map(h => s"SELECT qid, v FROM hx$h")
      .mkString("\n  UNION ALL ")
    val zWork = (1 to GbsHops).map(h => s"SELECT qid, v FROM zx$h")
      .mkString("\n  UNION ALL ")
    s"""hm AS (SELECT greatest($HierFloor,
       |  (SELECT n FROM nndn) // $HierRatio) AS n),
       |${nndOracleChainNamed(l1src, "h", "hm")},
       |${symCte(s"hg$NndIters", "hsym")},
       |${hashedEntriesCte(
          s"SELECT * FROM embeddings WHERE vec_id < $QueryBatch",
          l1src, "hm", "hent")},
       |${gbsOracleRound("hent", "hb0", GbsBeam)},
       |$hRounds,
       |zent AS MATERIALIZED (
       |  SELECT qid, v FROM (
       |    SELECT qid, v, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, v) AS rn FROM hb$GbsHops) t
       |  WHERE rn <= $GbsEntries),
       |${symCte(s"g$NndIters", "zsym")},
       |${gbsOracleRound("zent", "zb0", GbsBeam)},
       |$zRounds,
       |hgall AS (SELECT DISTINCT qid, v FROM (
       |  SELECT qid, v FROM hent
       |  UNION ALL $hWork) u),
       |zgall AS (SELECT DISTINCT qid, v FROM (
       |  SELECT qid, v FROM zent
       |  UNION ALL $zWork) u)""".stripMargin
  }

  /** The Spark twin of [[hierOracleCtes]]: layer-1 graph, descent beam,
    * and the entry-seeded layer-0 beam — returns (layer-0 final beam,
    * layer-0 visited set, layer-1 visited set) for q379/q380.
    */
  private def hierSearch(s: SparkSession,
      d: String): (DataFrame, DataFrame, DataFrame) = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val n = e.count()
    val m = hierM(n)
    val l1 = e.where(col("vec_id") < m)
    val batch = e.where(col("vec_id") < QueryBatch)
    val hg = nndGraphsOn(s, s"hier_l1_graphs:$d", l1, m)
    val (descBeam, descVisited) =
      beamSearchOn(s, s"hier_desc:$d", hg.last, l1, batch, m)
    val wE = Window.partitionBy("qid").orderBy(col("cos").desc, col("v").asc)
    val entries = descBeam
      .withColumn("rn", row_number().over(wE))
      .where(col("rn") <= GbsEntries)
      .select("qid", "v")
    val (beam, visited) = beamSearchFrom(s, s"hier_beam:$d",
      nnDescentGraphs(s, d).last, e, batch, entries)
    (beam, visited, descVisited)
  }

  /** q379: HIERARCHICAL GRAPH SEARCH — the HNSW idea made a tier: q368's
    * flat beam enters the graph at BLIND affine-hashed vertices, which
    * on a big corpus start the walk arbitrarily far from the query;
    * here every ~[[HierRatio]]-th vector is promoted to a layer-1
    * subset carrying its OWN NN-Descent graph ([[nndGraphsOn]] at
    * modulus m — O(m·K²), never m²), queries first beam-walk THAT small
    * graph, and the descent's top-[[GbsEntries]] winners seed the
    * layer-0 walk ([[beamSearchFrom]]) — entry points already near the
    * query at the cost of a hop-bounded walk over an m-vertex graph.
    * Serving emission is q368's (top-3 by exact cosine).
    *
    * Scale shape: the layer adds O(m·K²) build + per-query hop-bounded
    * work on the small graph; everything stays vertex-id equi-joins. At
    * 100 TB the level rule iterates geometrically (m, m/16, ...) with
    * total build cost a 1/(1-1/16) factor over layer 0 — the standard
    * HNSW ladder this one-level tier is the unit of.
    */
  private val q379 = GraftQuery(
    "q379_hier_graph_search",
    s"""WITH $nndOracleChain,
       |$hierOracleCtes
       |SELECT qid AS vec_id, rn AS rank, v AS neighbor_id,
       |  round(cos, 6) AS cos_sim FROM (
       |  SELECT qid, v, cos, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, v) AS rn FROM zb$GbsHops) t
       |WHERE rn <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    val (beam, _, _) = hierSearch(s, d)
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("v").asc)
    beam.withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .select(col("qid").as("vec_id"), col("rank"),
        col("v").as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** q380: HIERARCHICAL ENTRY AUDIT — q369's work-for-recall table
    * extended with the hierarchical arm: candidate-set recall@3 vs the
    * shared brute truth and total scored (query, vertex) pairs, where
    * the hierarchical arm's work HONESTLY includes both layers (the
    * layer-1 descent's visited members are scored pairs too — hiding
    * them would make the layer look free). Read beside q369: the delta
    * between hashed_entry and hier_entry prices what data-adaptive
    * entries buy on this corpus at equal hop/beam budget.
    *
    * MEASURED at sf0.01: hashed 8,507 pairs → 323,333 ppm vs hier 8,952
    * pairs → 313,333 ppm — on this near-isotropic corpus (q372's
    * d̂ ≈ 39) the layer buys NOTHING: when the layer-0 graph itself
    * isn't navigable (q367), entering it closer to the query cannot
    * help. ScaleSpec pins the converse on the 10-Gaussian-cluster
    * fixture, where entry cluster decides everything: hashed entries
    * measure 0 ppm (the walk never escapes the wrong cluster's
    * within-cluster edges) vs the descent arm's 996,666 ppm — the pair
    * of readings is the regime line a serving owner picks the entry
    * strategy by.
    */
  private val q380 = GraftQuery(
    "q380_hier_entry_audit", {
      s"""WITH $nndOracleChain,
         |$gbsOracleChain,
         |$hierOracleCtes,
         |$truthOracle,
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM truth),
         |fgc AS MATERIALIZED (
         |  SELECT qid AS vec_id, v AS neighbor_id FROM gall),
         |hgc AS MATERIALIZED (
         |  SELECT DISTINCT qid AS vec_id, v AS neighbor_id FROM (
         |    SELECT qid, v FROM hgall UNION ALL SELECT qid, v FROM zgall) u)
         |${recallModeRowSql("hashed_entry", "fgc")}
         |UNION ALL ${recallModeRowSql("hier_entry", "hgc")}
         |ORDER BY mode""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val truth = bruteForceTruth(e).localCheckpoint()
    val nt = broadcast(truth.agg(count(lit(1)).as("n_truth")))
    val (_, flatVisited) = graphBeamSearch(s, d)
    // the hier arm's honest-work set IS the serving dispatch's visited
    // set — one definition ([[servedGraphSearch]]), so the audit and the
    // production path can never diverge on what counts as scored work
    val (_, hierVisited) = servedGraphSearch(s, d)
    val hierCand = hierVisited
      .select(col("qid").as("vec_id"), col("v").as("neighbor_id"))
    recallModeRow("hashed_entry", flatVisited
        .select(col("qid").as("vec_id"), col("v").as("neighbor_id")),
        truth, nt)
      .unionByName(recallModeRow("hier_entry", hierCand, truth, nt))
      .orderBy("mode")
  }

  // ---- RobustPrune edge diversification (q381/q382) ----

  /** Candidate-pool width fed to the prune (2K — the current edges plus
    * the 2-hop enrichment rescored, Vamana's candidate acquisition).
    */
  private val PrunePool = 2 * NndK

  /** Max out-degree after pruning (DiskANN's R). */
  private val PruneR = NndK

  /** Vamana's α, as the LITERAL both engines parse to the same double
    * (interpolated into the oracle, assigned in Scala — the shared-text
    * discipline of q374).
    */
  private val PruneAlphaTxt = "1.2"
  private val PruneAlpha: Double = PruneAlphaTxt.toDouble

  /** The one prune-step rule, shared verbatim by both engines: pool
    * candidates are visited in (cos desc, dst) order; candidate c joins
    * the kept set iff the vertex still has budget (|kept| < R) and NO
    * already-kept k dominates it — k dominates c when
    * α·(1 − cos(k, c)) ≤ (1 − cos(v, c)), i.e. c is closer (by angular
    * distance, α-amplified) to an existing neighbor than to v itself,
    * so the k-edge already covers c's direction (Subramanya et al.
    * 2019's RobustPrune; Malkov & Yashunin 2018's heuristic select at
    * α = 1). Sequential per vertex, so both engines run the SAME
    * [[PrunePool]]-step bounded unroll — DuckDB as chained CTEs, Spark
    * as a checkpointed DataFrame loop — never a per-row loop.
    */
  private def pruneOracleSteps: String = {
    val steps = (2 to PrunePool).map { i =>
      s"""pk$i AS MATERIALIZED (
         |  SELECT src, dst, cos, rank FROM pk${i - 1}
         |  UNION ALL
         |  SELECT p.src, p.dst, p.cos, p.rank FROM ppool p
         |  WHERE p.rank = $i
         |    AND (SELECT count(*) FROM pk${i - 1} k
         |         WHERE k.src = p.src) < $PruneR
         |    AND NOT EXISTS (
         |      SELECT 1 FROM pk${i - 1} k
         |      JOIN ppw w ON w.src = p.src AND w.a = k.dst AND w.b = p.dst
         |      WHERE k.src = p.src
         |        AND $PruneAlphaTxt * (1.0 - w.cos) <= (1.0 - p.cos)))"""
        .stripMargin
    }.mkString(",\n")
    s"""${symCte(s"g$NndIters", "vsy")},
       |pcand AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM vsy
       |    UNION ALL
       |    SELECT a.src, b.dst FROM vsy a JOIN vsy b ON b.src = a.dst
       |    WHERE b.dst <> a.src) u),
       |${nndOracleRound("pcand", "ppool", PrunePool)},
       |ppw AS MATERIALIZED (
       |  SELECT p.src, p.dst AS a, q.dst AS b, ${cosSql("x", "y")} AS cos
       |  FROM ppool p JOIN ppool q ON q.src = p.src AND q.dst <> p.dst
       |  JOIN embeddings x ON x.vec_id = p.dst
       |  JOIN embeddings y ON y.vec_id = q.dst),
       |pk1 AS (SELECT src, dst, cos, rank FROM ppool WHERE rank = 1),
       |$steps""".stripMargin
  }

  /** Spark twin of [[pruneOracleSteps]]: the full-corpus α-pruned graph
    * (src, dst, cos, rank-within-pool) — q381's artifact, q382's index.
    */
  private[operators] def alphaPrunedGraph(s: SparkSession,
      d: String): DataFrame =
    graft.Artifacts.checkpointedDf(s, s"alpha_pruned:$d") {
      VectorFunctions.register(s)
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val g = nnDescentGraphs(s, d).last.select("src", "dst")
      val sym = g.unionByName(
        g.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val cand = sym
        .unionByName(sym.toDF("src", "mid")
          .join(sym.toDF("mid", "dst"), "mid")
          .where(col("dst") =!= col("src"))
          .select("src", "dst"))
        .distinct()
      val pool = nndTopK(e, cand, PrunePool).localCheckpoint()
      val pw = pool.select(col("src"), col("dst").as("a"))
        .join(pool.select(col("src"), col("dst").as("b")), "src")
        .where(col("a") =!= col("b"))
        .join(e.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
        .join(e.select(col("vec_id").as("b"), col("embedding").as("eb")), "b")
        .select(col("src"), col("a"), col("b"),
          VectorFunctions.cosineSim(col("ea"), col("eb")).as("kcos"))
        .localCheckpoint()
      var kept = pool.where(col("rank") === 1).localCheckpoint()
      (2 to PrunePool).foreach { i =>
        val cnts = kept.groupBy("src").agg(count(lit(1)).as("kc"))
        val ci = pool.where(col("rank") === i)
          .join(cnts, Seq("src"))
          .where(col("kc") < PruneR)
          .select("src", "dst", "cos", "rank")
        val dominated = ci
          .join(kept.select(col("src"), col("dst").as("a")), "src")
          .join(pw.withColumnRenamed("b", "dst"), Seq("src", "a", "dst"))
          .where(lit(PruneAlpha) * (lit(1.0) - col("kcos"))
            <= (lit(1.0) - col("cos")))
          .select("src", "dst").distinct()
        kept = kept
          .unionByName(ci.join(dominated, Seq("src", "dst"), "left_anti"))
          .localCheckpoint()
      }
      kept
    }

  /** q381: α-PRUNED GRAPH (Vamana RobustPrune) — the edge-selection
    * rule that turns a raw kNN graph into a NAVIGABLE one: q366 keeps
    * each vertex's 5 closest neighbors, which on clustered data all
    * point into the same tight cluster, so a walk entering the wrong
    * cluster can never leave (ScaleSpec's 0-ppm hashed-entry reading on
    * the Gaussian fixture is exactly this). RobustPrune instead scans a
    * 2K-deep candidate pool best-first and drops any candidate whose
    * direction an already-kept edge covers (α-amplified angular
    * dominance) — same ≤K degree, but the kept edges SPREAD: near
    * neighbors that survive plus the long-range edges the closest-K
    * rule crowds out (Subramanya et al. 2019; the RNG rule at α=1).
    * Output is the bounded batch's pruned adjacency.
    *
    * Scale shape: pool acquisition is the NN-Descent verify round
    * (O(n·K²) candidates, rescored top-2K); pairwise pool cosines are
    * O(n·(2K)²·d) flops; the unroll is 2K rounds of equi-joins on
    * kept sets that never exceed n·R rows. All vertex-id partitioned.
    */
  private val q381 = GraftQuery(
    "q381_alpha_pruned_graph",
    s"""WITH $nndOracleChain,
       |$pruneOracleSteps
       |SELECT src AS vec_id, row_number() OVER (PARTITION BY src
       |    ORDER BY cos DESC, dst) AS rank, dst AS neighbor_id,
       |  round(cos, 6) AS cos_sim
       |FROM pk$PrunePool WHERE src < $QueryBatch
       |ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst").asc)
    alphaPrunedGraph(s, d)
      .where(col("src") < QueryBatch)
      .withColumn("rk", row_number().over(w))
      .select(col("src").as("vec_id"), col("rk").as("rank"),
        col("dst").as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** q382: PRUNED-GRAPH SERVING AUDIT — q369's table with the
    * diversification arm: the SAME hashed entries, hops and beam width
    * over (a) q366's closest-K graph and (b) q381's α-pruned graph,
    * scored-pair work and candidate recall@3 against the shared brute
    * truth. Degree is ≤K on both sides, so any recall delta is pure
    * EDGE SELECTION — the measured answer to "does diversification buy
    * navigability on this corpus", the question RobustPrune exists for.
    *
    * MEASURED at sf0.01: pruned 293,333 ppm at 8,511 pairs vs closest-K
    * 323,333 at 8,507 — on the isotropic corpus diversification LOSES a
    * step: there are no clusters to escape, so trading near edges for
    * spread ones only dilutes local recall. And the candidate pool
    * bounds what pruning can ever buy here: the 2-hop pool of a
    * within-cluster graph is itself within-cluster, so α-pruning alone
    * cannot manufacture the long-range edges full Vamana gets from
    * medoid-seeded search-path candidates — ScaleSpec therefore pins
    * the properties the operator OWNS (α-dominance invariant, degree
    * cap, measurably more spread neighborhoods than closest-K) rather
    * than a recall bet the pool provenance decides.
    */
  private val q382 = GraftQuery(
    "q382_pruned_serving_audit", {
      val pRounds = (1 to GbsHops).map { h =>
        s"""${gbsOracleExpand(s"pb${h - 1}", s"px$h", "pgsy")},
           |${gbsOracleRound(s"px$h", s"pb$h", GbsBeam)}""".stripMargin
      }.mkString(",\n")
      val pWork = (1 to GbsHops).map(h => s"SELECT qid, v FROM px$h")
        .mkString("\n  UNION ALL ")
      s"""WITH $nndOracleChain,
         |$gbsOracleChain,
         |$pruneOracleSteps,
         |${symCte(s"pk$PrunePool", "pgsy")},
         |${gbsOracleRound("gent", "pb0", GbsBeam)},
         |$pRounds,
         |pgall AS (SELECT DISTINCT qid, v FROM (
         |  SELECT qid, v FROM gent
         |  UNION ALL $pWork) u),
         |$truthOracle,
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM truth),
         |ugc AS MATERIALIZED (
         |  SELECT qid AS vec_id, v AS neighbor_id FROM gall),
         |pgc AS MATERIALIZED (
         |  SELECT qid AS vec_id, v AS neighbor_id FROM pgall)
         |${recallModeRowSql("alpha_pruned", "pgc")}
         |UNION ALL ${recallModeRowSql("closest_k", "ugc")}
         |ORDER BY mode""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val batch = e.where(col("vec_id") < QueryBatch)
    val truth = bruteForceTruth(e).localCheckpoint()
    val nt = broadcast(truth.agg(count(lit(1)).as("n_truth")))
    val (_, flatVisited) = graphBeamSearch(s, d)
    val (_, prunedVisited) = beamSearchOn(s, s"pruned_beam:$d",
      alphaPrunedGraph(s, d), e, batch, e.count())
    recallModeRow("alpha_pruned", prunedVisited
        .select(col("qid").as("vec_id"), col("v").as("neighbor_id")),
        truth, nt)
      .unionByName(recallModeRow("closest_k", flatVisited
        .select(col("qid").as("vec_id"), col("v").as("neighbor_id")),
        truth, nt))
      .orderBy("mode")
  }

  // ---- post-append graph repair (q383/q384) ----

  /** Bounded id range for the new-shard repair audit (the new shard's
    * ids are LCG-spread, so the q352-style bound must widen to keep a
    * ~QueryBatch-sized audit set: ~20% of ids land in buckets 8-9).
    */
  private val NewAuditBound = 5 * QueryBatch

  /** The combined post-append graph (frozen base edges + q370's
    * beam-inserted new-shard edges) and its one-round NN-Descent repair
    * over the FULL corpus — the offline pass q370's scale story defers
    * quality to. Returns (combined, repaired).
    */
  private def repairedGraphs(s: SparkSession,
      d: String): (DataFrame, DataFrame) =
    graft.Artifacts.cached[(DataFrame, DataFrame)](s, s"graph_repair:$d") {
      VectorFunctions.register(s)
      val e = Tables.embeddings(s, d).select("vec_id", "embedding")
      val n = e.count()
      val base = e.where(shardBucket(col("vec_id")) < 8)
      val bg = nndGraphsOn(s, s"nnd_base_graphs:$d", base, n)
      val (beam, _) = beamSearchOn(s, s"gba:$d", bg.last, base,
        e.where(shardBucket(col("vec_id")) >= 8), n)
      val wB = Window.partitionBy("qid").orderBy(col("cos").desc, col("v").asc)
      val inserted = beam.withColumn("rn", row_number().over(wB))
        .where(col("rn") <= NndK)
        .select(col("qid").as("src"), col("v").as("dst"))
      val combined = bg.last.select("src", "dst").unionByName(inserted)
      val sym = combined.unionByName(
        combined.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val cand = sym.toDF("src", "mid")
        .join(sym.toDF("mid", "dst"), "mid")
        .where(col("dst") =!= col("src"))
        .select("src", "dst")
        .unionByName(combined)
        .distinct()
      val (cLeaf, relC) = graft.Artifacts.leafDf(combined)
      val (rLeaf, relR) = graft.Artifacts.leafDf(nndTopK(e, cand))
      ((cLeaf, rLeaf), () => { relC(); relR() })
    }

  /** Combined-graph CTEs shared by the q383/q384 oracles, on top of the
    * q370 chain (base graph g0..g[[NndIters]] + append beam b*): `cne`
    * = the inserted top-[[NndK]] edges, `cmb` = base ∪ inserted, then
    * one candidate+refine round → repaired graph `rg`.
    */
  private def repairOracleCtes: String =
    s"""cne AS MATERIALIZED (
       |  SELECT qid AS src, v AS dst FROM (
       |    SELECT qid, v, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, v) AS rn FROM b$GbsHops) t
       |  WHERE rn <= $NndK),
       |cmb AS MATERIALIZED (
       |  SELECT src, dst FROM g$NndIters
       |  UNION ALL SELECT src, dst FROM cne),
       |${nndOracleCand("cmb", "cc1")},
       |${nndOracleRound("cc1", "rg")}""".stripMargin

  /** q383: POST-APPEND GRAPH REPAIR — the compaction half of the graph
    * lifecycle q370/q371 deferred (q114's rewrite role): appended
    * vertices carry beam-guessed edges and, worse, NOTHING points back
    * at them (insert wrote src→base edges only), so the combined graph
    * degrades as the shard ratio grows. The repair is ONE NN-Descent
    * round over the FULL corpus seeded by (frozen base graph ∪ inserted
    * edges): symmetrize — which is what first hands the new vertices
    * their in-edges — introduce neighbors-of-neighbors, rescore, keep
    * top-[[NndK]]. Output is the bounded batch's repaired adjacency;
    * q384 prices what the round bought.
    *
    * Scale shape: exactly one [[nndGraphsOn]] round at full-corpus n —
    * O(n·K²) candidates, vertex-id equi-joins, runs at compaction
    * cadence while q370/q371 absorb arrivals at file rate.
    */
  private val q383 = GraftQuery(
    "q383_graph_repair",
    s"""WITH $nndBaseCte,
       |${nndOracleChainOn("base")},
       |${gbsOracleChainOn(
          s"SELECT * FROM embeddings WHERE $shardBucketSql >= 8", "base")},
       |$repairOracleCtes
       |SELECT src AS vec_id, rank, dst AS neighbor_id,
       |  round(cos, 6) AS cos_sim
       |FROM rg WHERE src < $QueryBatch
       |ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    val (_, repaired) = repairedGraphs(s, d)
    repaired.where(col("src") < QueryBatch)
      .select(col("src").as("vec_id"), col("rank"),
        col("dst").as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  /** q384: REPAIR ROI AUDIT — q367's convergence discipline applied to
    * maintenance: for the bounded new-shard vertices (ids <
    * [[NewAuditBound]], buckets 8-9), edge recall@[[NndK]] against
    * brute full-corpus truth, BEFORE repair (q370's insert-time beam
    * edges) and AFTER (q383's round). The before-arm is structurally
    * capped: insert edges point only into the BASE shard, so any true
    * neighbor that itself arrived in the new shard is unreachable until
    * repair symmetrizes and re-introduces — the measured gap is the
    * number a corpus owner sets repair cadence by.
    *
    * MEASURED at sf0.01: append_beam 274,509 ppm → post_repair 366,666
    * ppm (510 true edges) — one round buys +9.2 points, about what a
    * full-build round buys at the same corpus (q367: rounds 2→3 gain
    * ~10 points each), i.e. repair rounds and build rounds are the same
    * currency, as the shared kernel says they must be.
    */
  private val q384 = GraftQuery(
    "q384_graph_repair_roi", {
      def row(mode: String, cand: String): String =
        s"""SELECT '$mode' AS mode, n.n_true,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $cand c
           |     JOIN ntru t ON t.src = c.src AND t.dst = c.dst) AS hits,
           |  ((SELECT count(*) FROM $cand c
           |     JOIN ntru t ON t.src = c.src AND t.dst = c.dst)
           |   * 1000000) // n.n_true AS recall_ppm
           |FROM nnt n""".stripMargin
      s"""WITH $nndBaseCte,
         |${nndOracleChainOn("base")},
         |${gbsOracleChainOn(
            s"SELECT * FROM embeddings WHERE $shardBucketSql >= 8", "base")},
         |$repairOracleCtes,
         |ntrus AS (
         |  SELECT q.vec_id AS src, c.vec_id AS dst, ${cosSql("q", "c")} AS cos
         |  FROM (SELECT * FROM embeddings
         |        WHERE $shardBucketSql >= 8 AND vec_id < $NewAuditBound) q
         |  JOIN embeddings c ON q.vec_id <> c.vec_id),
         |ntru AS (
         |  SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (PARTITION BY src
         |      ORDER BY cos DESC, dst) AS rank FROM ntrus) t
         |  WHERE rank <= $NndK),
         |nnt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM ntru)
         |${row("append_beam", "cne")}
         |UNION ALL ${row("post_repair", "rg")}
         |ORDER BY mode""".stripMargin
    }) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val nq = e.where(shardBucket(col("vec_id")) >= 8
      && col("vec_id") < NewAuditBound)
    val pairs = nq.select(col("vec_id").as("src"))
      .join(e.select(col("vec_id").as("dst")), col("src") =!= col("dst"))
    val truth = nndTopK(e, pairs).select("src", "dst").localCheckpoint()
    val nt = broadcast(truth.agg(count(lit(1)).as("n_true")))
    val (combined, repaired) = repairedGraphs(s, d)
    val inserted = combined
      .join(e.where(shardBucket(col("vec_id")) >= 8)
        .select(col("vec_id").as("src")), Seq("src"), "left_semi")
    def row(mode: String, cand: DataFrame): DataFrame =
      cand.select("src", "dst")
        .join(truth, Seq("src", "dst"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(nt)
        .select(lit(mode).as("mode"), col("n_true"), col("hits"),
          expr("(hits * 1000000) div n_true").cast("long").as("recall_ppm"))
    row("append_beam", inserted)
      .unionByName(row("post_repair", repaired))
      .orderBy("mode")
  }

  /** The PRODUCTION graph-serving dispatch (r16 VERDICT item 6, the
    * [[routedSemDedupInputs]] discipline applied to the serving tier):
    * descent entries BY CONSTRUCTION — the query first beam-walks the
    * layer-1 graph and its winners seed the layer-0 walk ([[hierSearch]])
    * — because q380 measured descent entries never losing: equal recall
    * at ~5% extra scored pairs on the isotropic corpus, and 996,666 vs
    * 0 ppm on the clustered ScaleSpec fixture where blind hashed entries
    * strand the walk in the wrong cluster. Hashed entries
    * ([[graphBeamSearch]], q368/q369) stay registered as the audited
    * alternative, exactly as the IMI square rings did. Returns (final
    * layer-0 beam, full visited set INCLUDING the layer-1 descent's —
    * those members are scored candidates too, and a serving rerank that
    * ignored them would discard similarity work already paid for).
    */
  private def servedGraphSearch(s: SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val (beam, l0Visited, l1Visited) = hierSearch(s, d)
    (beam, l0Visited.unionByName(l1Visited).distinct())
  }

  /** q399: ROUTED GRAPH SERVE — the production serving path end-to-end:
    * [[servedGraphSearch]]'s descent-entry walk (the dispatch default)
    * composed with q377's delete discipline — the tombstone mask applied
    * as a broadcast anti-join on BOTH sides of the visited-set rerank (a
    * deleted vector neither asks nor answers, and never occupies a rank
    * slot), emission q368's top-3 by exact cosine. This is the query a
    * library user's serving call compiles to: data-adaptive entries,
    * graph navigation unchanged by deletes, mask at rerank — each piece
    * oracle-gated alone (q379, q377), here gated COMPOSED.
    *
    * Scale shape: q379's walk costs (layer-1 O(m·K²) build amortized
    * across queries; per-query hop-bounded work independent of n) plus a
    * deletion-log-sized broadcast; nothing new materializes beyond the
    * visited set the walk already scored.
    */
  private val q399 = GraftQuery(
    "q399_routed_graph_serve",
    s"""WITH $nndOracleChain,
       |$hierOracleCtes
       |SELECT qid AS vec_id, rn AS rank, v AS neighbor_id,
       |  round(cos, 6) AS cos_sim FROM (
       |  SELECT qid, v, cos, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, v) AS rn FROM (
       |    SELECT g.qid, g.v, ${cosSql("a", "b")} AS cos
       |    FROM (SELECT DISTINCT qid, v FROM (
       |      SELECT qid, v FROM hgall
       |      UNION ALL SELECT qid, v FROM zgall) u) g
       |    JOIN embeddings a ON a.vec_id = g.qid
       |    JOIN embeddings b ON b.vec_id = g.v
       |    WHERE NOT (${tombstoneSql("g.qid")})
       |      AND NOT (${tombstoneSql("g.v")})) s) t
       |WHERE rn <= 3 ORDER BY vec_id, rank""".stripMargin) { (s, d) =>
    VectorFunctions.register(s)
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val tomb = e.select("vec_id").where(tombstoned(col("vec_id")))
    val (_, visited) = servedGraphSearch(s, d)
    val live = visited
      .join(broadcast(tomb.toDF("qid")), Seq("qid"), "left_anti")
      .join(broadcast(tomb.toDF("v")), Seq("v"), "left_anti")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("v").asc)
    live
      .join(e.select(col("vec_id").as("qid"), col("embedding").as("qemb")),
        "qid")
      .join(e.select(col("vec_id").as("v"), col("embedding").as("vemb")), "v")
      .select(col("qid"), col("v"),
        VectorFunctions.cosineSim(col("qemb"), col("vemb")).as("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .select(col("qid").as("vec_id"), col("rank"),
        col("v").as("neighbor_id"), round(col("cos"), 6).as("cos_sim"))
      .orderBy("vec_id", "rank")
  }

  val queries: Seq[GraftQuery] =
    Seq(q30, q31, q39, q40, q41, q43, q44, q45, q52, q56, q71, q72, q76, q78, q79,
      q82, q83, q84, q85, q87, q88, q91, q92, q93, q94, q101, q102, q103, q104,
      q105, q106, q107, q108, q110, q114, q115, q116, q118, q119, q120, q124,
      q136, q145, q146, q147, q154, q155, q159, q164, q187, q190, q195, q196,
      q207, q215, q222, q224, q245, q249, q255, q257, q272, q274, q275, q276,
      q277, q278, q291, q294, q296, q298, q302, q317, q321, q325, q339,
      q341, q348, q351, q352, q353, q354, q355, q356, q357, q358, q359, q360,
      q361, q362, q364, q365, q366, q367, q368, q369, q370, q372, q373,
      q375, q376, q377, q378, q379, q380, q381, q382, q383, q384, q399)
}
