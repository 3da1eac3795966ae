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

  val queries: Seq[GraftQuery] = Seq(q86)
}
