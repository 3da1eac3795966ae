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
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      numSalts: Int, joinType: String = "inner"): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val b = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(numSalts.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until numSalts).map(lit): _*)))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
