package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
