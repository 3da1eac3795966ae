package graft.operators

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.ModifiedDietz

/** Portfolio-return operator: Modified-Dietz over `orders` treated as a
  * per-customer cash-flow ledger (each order = an external flow at its
  * order date) across the fixed period [1992-01-01, 1998-12-31].
  */
object Portfolio {

  private val PeriodStart = LocalDate.of(1992, 1, 1)
  private val PeriodEnd = LocalDate.of(1998, 12, 31)
  private val TotalDays = ChronoUnit.DAYS.between(PeriodStart, PeriodEnd)
  private val Bmv = 100000.0
  private val GainRate = 0.02

  /** q36: one-pass typed Aggregator (map-side combined partial sums) —
    * the oracle states the same algebra as closed-form sums.
    */
  private val q36 = GraftQuery(
    "q36_modified_dietz",
    s"""SELECT o_custkey,
       |  round($GainRate * sum(o_totalprice)
       |    / ($Bmv + sum(o_totalprice *
       |        (CAST(date_diff('day', o_orderdate, TIMESTAMP '$PeriodEnd 00:00:00') AS DOUBLE) / $TotalDays.0))), 6)
       |    AS mdietz
       |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val dietz = udaf(new ModifiedDietz(Bmv, GainRate),
      Encoders.product[(Double, Double)])
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_totalprice").as("cf"),
        (datediff(lit(PeriodEnd.toString).cast("date"), col("o_orderdate"))
          .cast("double") / TotalDays.toDouble).as("w"))
      .groupBy("o_custkey")
      .agg(round(dietz(col("cf"), col("w")), 6).as("mdietz"))
      .orderBy("o_custkey")
  }

  val queries: Seq[GraftQuery] = Seq(q36)
}
