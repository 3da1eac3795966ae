package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, Tables}
import graft.functions.VectorFunctions

/** Similarity-search and near-duplicate operators over the `embeddings` and
  * `documents` tables — the LLM-training-data-pipeline surface
  * (SURVEY §2 Table B "LLM-pipeline ops").
  *
  * Scale design (100 TB):
  *  - q30 is the IVF pattern: an equi-join on a coarse partition id
  *    (`label` stands in for a k-means cell id) restricts the candidate set,
  *    exact cosine ranks within the cell, a window takes top-k. The plan is
  *    shuffle-on-label + per-cell comparisons — never an all-pairs cross
  *    join of the table against itself. Cell skew at scale → re-cluster or
  *    split hot cells (same remedy as IVF imbalance).
  *  - q31 is minhash-LSH banding: signatures are a narrow one-pass map
  *    (no shuffle), candidates come from an equi-join on band buckets. A
  *    pathologically hot bucket is exactly a giant duplicate cluster; at
  *    scale, cap bucket width or salt the band key before the join.
  *
  * The cosine kernel is the codegen'd Catalyst expression
  * [[graft.functions.CosineSimilarity]]; both engines accumulate dot and
  * norms left-to-right in double precision, so results are bit-identical
  * and oracle hash-comparable.
  */
object Similarity {

  /** q30: top-3 cosine neighbors per vector within its `label` cell
    * (IVF-style blocked ANN). Deterministic rank tie-break on neighbor id.
    */
  private val q30 = GraftQuery(
    "q30_cosine_topk",
    """WITH sim AS (
      |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
      |    list_reduce(list_transform(range(1, len(a.embedding)+1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x,y) -> x+y)
      |    / (sqrt(list_reduce(list_transform(range(1, len(a.embedding)+1),
      |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), (x,y) -> x+y))
      |     * sqrt(list_reduce(list_transform(range(1, len(b.embedding)+1),
      |        i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x,y) -> x+y))) AS cos
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

  /** MinHash parameters, shared verbatim by the Spark plan and the DuckDB
    * oracle so signatures are bit-identical: k=12 permutations
    * h_i(x) = (A(i)·x + B(i)) mod P over word-3-gram shingle hashes,
    * banded 4×3 (LSH threshold ≈ (1/4)^(1/3) ≈ 0.63 Jaccard).
    */
  private val P = 1000000007L
  private val NumHashes = 12
  private val Rows = 3 // rows per band
  private val NumBands = NumHashes / Rows
  private val A: Seq[Long] = (0 until NumHashes).map(i => ((i + 1) * 2654435761L) % P)
  private val B: Seq[Long] = (0 until NumHashes).map(i => ((i + 1) * 2246822519L) % P)

  private val q31Oracle: String = {
    val sigExprs = (0 until NumHashes)
      .map(i => s"list_min(list_transform(hs, h -> (${A(i)} * h + ${B(i)}) % $P))")
      .mkString(",\n      ")
    val bandSelects = (0 until NumBands)
      .map(j => s"SELECT doc_id, sig, $j AS band, sig[${3 * j + 1}] AS h1, " +
        s"sig[${3 * j + 2}] AS h2, sig[${3 * j + 3}] AS h3 FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents
       |), sh AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(ts) >= 3
       |    THEN list_transform(range(1, len(ts)-1), i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
       |    ELSE [] END) AS shingles
       |  FROM toks
       |), hs AS (
       |  SELECT doc_id, list_transform(shingles, sh2 ->
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(sh2)+1), i -> CAST(ascii(sh2[i]) AS BIGINT))),
       |      (acc, c) -> (acc * 31 + c) % $P)) AS hs
       |  FROM sh
       |), sig AS (
       |  SELECT doc_id, [$sigExprs] AS sig FROM hs
       |), bands AS (
       |  $bandSelects
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
       |WHERE len(list_filter(range(1, ${NumHashes + 1}), i -> sa[i] = sb[i])) >= 9
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q31: near-duplicate candidate pairs via minhash-LSH over word-3-gram
    * shingles, with the signature-estimated Jaccard (≥ 9/12 kept). The
    * candidate join is an equi-join on (band, 3 minhash rows) — no
    * all-pairs comparison anywhere in the plan.
    */
  private val q31 = GraftQuery("q31_minhash_neardup", q31Oracle) { (s, d) =>
    val sigCols = (0 until NumHashes).map(i =>
      expr(s"array_min(transform(hs, h -> (${A(i)} * h + ${B(i)}) % $P))"))
    val bandStructs = (0 until NumBands).map(j =>
      struct(lit(j).as("band"), expr(s"sig[${3 * j}]").as("h1"),
        expr(s"sig[${3 * j + 1}]").as("h2"), expr(s"sig[${3 * j + 2}]").as("h3")))
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("ts"))
      .withColumn("shingles",
        when(size(col("ts")) >= 3, array_distinct(expr(
          "transform(sequence(1, size(ts) - 2), " +
            "i -> concat_ws(' ', element_at(ts, i), element_at(ts, i+1), element_at(ts, i+2)))")))
          .otherwise(expr("CAST(array() AS array<string>)")))
      .withColumn("hs", expr(
        s"transform(shingles, sh2 -> aggregate(sequence(1, length(sh2)), 0L, " +
          s"(acc, i) -> (acc * 31 + ascii(substring(sh2, i, 1))) % $P))"))
      .select(col("doc_id"), array(sigCols: _*).as("sig"))
    val bands = sigs.select(col("doc_id"), col("sig"),
      explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band").as("band"),
        col("b.h1").as("h1"), col("b.h2").as("h2"), col("b.h3").as("h3"))
    val l = bands.select(col("doc_id").as("doc_a"), col("sig").as("sa"),
      col("band"), col("h1"), col("h2"), col("h3"))
    val r = bands.select(col("doc_id").as("doc_b"), col("sig").as("sb"),
      col("band").as("band_r"), col("h1").as("g1"), col("h2").as("g2"),
      col("h3").as("g3"))
    l.join(r, col("band") === col("band_r") && col("h1") === col("g1") &&
        col("h2") === col("g2") && col("h3") === col("g3") &&
        col("doc_a") < col("doc_b"))
      .withColumn("n_match",
        expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))").cast("long"))
      .where(col("n_match") >= 9)
      .select(col("doc_a"), col("doc_b"), col("n_match"),
        round(col("n_match") / NumHashes.toDouble, 6).as("est_jaccard"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  val queries: Seq[GraftQuery] = Seq(q30, q31)
}
