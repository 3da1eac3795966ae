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

  /** The chained sub-period years of q320 (the orders table's full date
    * span, 1995..2001).
    */
  private val TwrYears = 1995 to 2001

  /** The per-year sub-period return, as ONE SQL expression string parsed
    * by BOTH engines — identical arithmetic tree, so the double math is
    * bit-identical (the q297 discipline). Inputs `f{y}` (flow cents) and
    * `wd{y}` (cents·days-remaining) are integer-exact conditional sums,
    * so the only float work is this fixed-shape epilogue on the
    * customer-grain row. Yearly Modified Dietz: gain = 2% of flows,
    * denominator = opening value + day-weighted flows.
    */
  private def twrReturnExpr(y: Int): String =
    s"0.02 * (CAST(f$y AS DOUBLE) / 100.0)" +
      s" / (100000.0 + CAST(wd$y AS DOUBLE) / 100.0 / 365.0)"

  /** The chained product (1+r_1995)···(1+r_2001) − 1, again one shared
    * expression string: a fixed multiplication tree over ≤7 factors
    * evaluates in program order in both engines, dodging the
    * cross-row-float-sum trap a `product()` aggregate would have.
    */
  private val twrChainExpr: String =
    TwrYears.map(y => s"(1.0 + ${twrReturnExpr(y)})").mkString(" * ")

  /** q320: TIME-WEIGHTED return via chained yearly sub-periods — the
    * GIPS-required performance number next to q36's money-weighted
    * Modified Dietz (TWR strips the timing of client flows: a manager is
    * judged on (1+r_1)···(1+r_n) − 1 over flow-bounded sub-periods, so a
    * big deposit before a bad year does NOT drag the reported number the
    * way it drags Dietz). Same ledger mapping as q36 (orders = external
    * flows per customer), one sub-period per calendar year: per year,
    * flow cents and day-weighted cents reduce to two integer-exact
    * conditional sums; the yearly returns and their chain evaluate as a
    * fixed-shape float epilogue per customer row ([[twrReturnExpr]],
    * [[twrChainExpr]] — shared text, both engines parse the same tree).
    * `active_years` counts years with any flow (a missing year's factor
    * is exactly 1).
    *
    * Scale shape: ONE hash aggregate to customer grain (14 partial-agg
    * BIGINT sums + a distinct-year count), epilogue row-local — nothing
    * after the aggregate sees order grain. Cf. reference's
    * single-period framing at `Sources/Helpers/` (FINporter family's
    * Modified-Dietz tool, README.md:43); the chain is the multi-period
    * extension it would need.
    */
  private val q320 = GraftQuery(
    "q320_twr_chain",
    s"""WITH c AS (
       |  SELECT o_custkey, year(o_orderdate) AS yr,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       |    date_diff('day', CAST(o_orderdate AS DATE),
       |      make_date(year(o_orderdate), 12, 31)) AS dr
       |  FROM orders),
       |g AS (SELECT o_custkey,
       |  ${TwrYears.map(y =>
            s"CAST(sum(CASE WHEN yr = $y THEN cents ELSE 0 END) AS BIGINT) AS f$y,\n" +
            s"  CAST(sum(CASE WHEN yr = $y THEN cents * dr ELSE 0 END) AS BIGINT) AS wd$y")
            .mkString(",\n  ")},
       |  CAST(count(DISTINCT yr) AS BIGINT) AS active_years
       |  FROM c GROUP BY 1)
       |SELECT o_custkey, active_years,
       |  round(($twrChainExpr) - 1.0, 6) AS twr
       |FROM g ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d).select(
      col("o_custkey"),
      year(col("o_orderdate")).as("yr"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      datediff(make_date(year(col("o_orderdate")), lit(12), lit(31)),
        col("o_orderdate").cast("date")).cast("long").as("dr"))
    val aggs = TwrYears.flatMap { y =>
      Seq(
        sum(when(col("yr") === y, col("cents")).otherwise(0L)).as(s"f$y"),
        sum(when(col("yr") === y, col("cents") * col("dr")).otherwise(0L))
          .as(s"wd$y"))
    } :+ countDistinct(col("yr")).as("active_years")
    base.groupBy("o_custkey")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("o_custkey"), col("active_years"),
        expr(s"round(($twrChainExpr) - 1.0, 6)").as("twr"))
      .orderBy("o_custkey")
  }

  val queries: Seq[GraftQuery] = Seq(q36, q320)
}
