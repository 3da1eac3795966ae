package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Skew remedies for the 100 TB design point (SURVEY §2 Table B "Joins";
  * brief: "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join handling covers sort-merge joins automatically; salting
  * is the explicit remedy when a single join key is hot enough to blow a
  * task (the "one user with 10M events" shape). The big side gets an
  * arbitrary per-row salt (round-robin by row id — any distribution works,
  * correctness never depends on it), the small side is replicated across
  * all salt values, and the join key becomes (key, salt) so the hot key's
  * rows spread over `numSalts` tasks.
  */
object Scale {

  /** Salted equi-join: `big ⋈ small` on `key` (same column name on both
    * sides), with the hot-key rows of `big` spread across `numSalts`
    * tasks. Cost: `small` is replicated numSalts× — use for genuinely
    * small/dimension sides (the same constraint as a broadcast).
    */
  /** Join types where replicating the small side is sound: each big row
    * carries exactly one salt, so inner/left/semi/anti joins see the same
    * match set as the unsalted join. Right/full outer are rejected — the
    * small side's unmatched replicas would emit spurious null-extended
    * rows (one per salt value).
    */
  private val SoundJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "semi", "left_anti", "leftanti", "anti")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      numSalts: Int, joinType: String = "inner"): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    require(SoundJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left/left_semi/left_anti, got '$joinType' " +
        "(right/full outer would emit spurious rows for replicated small-side keys)")
    val b = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(numSalts.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until numSalts).map(lit): _*)))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** q86: the salted skew join as a REGISTERED query — the mechanism
    * ScaleSpec proves result-equivalent, put under the driver's oracle
    * gate on real tables. customer ⋈ nation is the classic hot-key shape
    * (every nation key repeats ~|customers|/25 times; at 100 TB the same
    * plan covers the one-key-dominates case AQE's skew split can't reach
    * when the skew is in the JOIN KEY distribution itself): the fact side
    * takes a per-row salt, the 25-row dimension replicates 8×, and the
    * hot key's rows spread over 8 tasks. The oracle states the plain
    * join + aggregate — salting must be invisible in the answer.
    */
  private val NumSaltsQ86 = 8
  private val q86 = GraftQuery(
    "q86_salted_skew_join",
    """SELECT n_name,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  round(sum(c_acctbal), 2) AS total_acctbal
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey").as("n_nationkey"),
        col("c_acctbal"))
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    saltedJoin(c, n, "n_nationkey", numSalts = NumSaltsQ86)
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .orderBy("n_name")
  }

  /** Reducer count the q287 skew audit simulates (the gate-scale
    * `spark.sql.shuffle.partitions`; the arithmetic is count-agnostic)
    * and the shared affine bucket hash (CmRows seed 0 — literal in both
    * engines so the simulated assignment is identical by construction).
    */
  private val SkewReducers = 32L
  private val SkewHashA = 1588635695L
  private val SkewHashC = 1013904223L

  /** q287: shuffle-skew / salt-factor audit — the diagnostic a layout
    * owner runs BEFORE picking q86's `numSalts`: per join key the row
    * count, the hottest key's share, and the SIMULATED per-reducer load
    * under hash partitioning into [[SkewReducers]] buckets (the shared
    * affine hash, so the simulation is reproducible, not engine-luck).
    * `bucket_skew_x100` is max-bucket load over the perfect-balance load
    * ×100 (100 = balanced); `salt_factor` is the ceiling of the hottest
    * key's rows over the average reducer's — the minimum salt fan-out
    * that fits the hot key into average-sized tasks, i.e. the number q86
    * needs. One key-grain aggregate + two metadata-grain rollups; the
    * 1-row combines are broadcast crosses. At 100 TB this runs as a
    * cheap pre-pass (or rides q218's join-stats collection) and decides
    * salting/AQE-skew settings from measurement instead of folklore.
    */
  private val q287 = GraftQuery(
    "q287_shuffle_skew_audit",
    s"""WITH k AS (
       |  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
       |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       |    CAST(count(*) AS BIGINT) AS n_keys,
       |    CAST(max(cnt) AS BIGINT) AS top_cnt FROM k),
       |tk AS (SELECT CAST(min(user_id) AS BIGINT) AS top_key
       |  FROM k, t WHERE cnt = top_cnt),
       |b AS (
       |  SELECT (((user_id % 2147483648) * $SkewHashA + $SkewHashC)
       |      % 2147483648) % $SkewReducers AS bucket,
       |    CAST(sum(cnt) AS BIGINT) AS load
       |  FROM k GROUP BY 1),
       |s AS (SELECT CAST(max(load) AS BIGINT) AS max_bucket_rows,
       |    CAST(count(*) AS BIGINT) AS used_buckets FROM b)
       |SELECT t.n_rows, t.n_keys, tk.top_key, t.top_cnt,
       |  CAST(t.top_cnt * 1000000 // t.n_rows AS BIGINT) AS top_share_ppm,
       |  s.used_buckets, s.max_bucket_rows,
       |  CAST(s.max_bucket_rows * $SkewReducers * 100 // t.n_rows AS BIGINT)
       |    AS bucket_skew_x100,
       |  CAST((t.top_cnt * $SkewReducers + t.n_rows - 1) // t.n_rows
       |    AS BIGINT) AS salt_factor
       |FROM t CROSS JOIN tk CROSS JOIN s""".stripMargin) { (s, d) =>
    val k = Tables.events(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val t = k.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("cnt")).as("top_cnt"))
    val tk = k.join(broadcast(t.select(col("top_cnt").as("__top"))),
        col("cnt") === col("__top"))
      .agg(min(col("user_id")).as("top_key"))
    val b = k.groupBy(
        expr(s"(((user_id % 2147483648) * $SkewHashA + $SkewHashC)" +
          s" % 2147483648) % $SkewReducers").as("bucket"))
      .agg(sum(col("cnt")).as("load"))
    val sRoll = b.agg(max(col("load")).as("max_bucket_rows"),
      count(lit(1)).as("used_buckets"))
    t.crossJoin(broadcast(tk)).crossJoin(broadcast(sRoll))
      .select(col("n_rows"), col("n_keys"), col("top_key"), col("top_cnt"),
        expr("(top_cnt * 1000000) div n_rows").as("top_share_ppm"),
        col("used_buckets"), col("max_bucket_rows"),
        expr(s"(max_bucket_rows * $SkewReducers * 100) div n_rows")
          .as("bucket_skew_x100"),
        expr(s"(top_cnt * $SkewReducers + n_rows - 1) div n_rows")
          .as("salt_factor"))
  }

  val queries: Seq[GraftQuery] = Seq(q86, q287)
}
