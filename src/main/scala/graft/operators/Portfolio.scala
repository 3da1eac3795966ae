package graft.operators

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
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

  /** q391's target-allocation model portfolio: (asset class → weight in
    * ppm), summing to exactly 1,000,000 — the strategy table of the
    * reference's ecosystem (openalloc's SwiftRebalance family consumes
    * FINporter imports precisely to compute this delta). Classes are the
    * order-priority vocabulary standing in for asset classes.
    */
  private[graft] val TargetPpm: Seq[(String, Long)] = Seq(
    ("1-URGENT", 400000L), ("2-HIGH", 250000L), ("3-MEDIUM", 150000L),
    ("4-NOT SPECIFIED", 120000L), ("5-LOW", 80000L))

  /** q391: TARGET-ALLOCATION REBALANCE — the downstream op the
    * reference's import surface exists to feed: per account (customer),
    * current holdings value by asset class vs a model-portfolio weight
    * table, with target values apportioned by Hamilton's
    * largest-remainder method PER ACCOUNT so every account's targets
    * sum to EXACTLY its current total (floats would drift; the floor +
    * remainder-rank construction is pure integer arithmetic — q223's
    * discipline at account grain, the remainder window partitioned by
    * account so no single-task sort). Classes the account doesn't hold
    * ride the account × class grid with value 0 — a rebalance BUYS into
    * missing classes, which an inner join would silently skip. Output
    * is the trade list: current, target, delta cents and the BUY/SELL/
    * HOLD side per (account, class).
    *
    * Scale shape: one hash aggregate to (account, class) cents, a
    * 5-row-per-account grid explode, per-account windows — everything
    * partitioned by account, embarrassingly parallel at any account
    * count. Cents are per-row-rounded BIGINTs (q320's idiom), so sums
    * are exact in any order.
    */
  /** q391's oracle text, shared verbatim by the streaming twin q394
    * (stream == batch == DuckDB on the same trade list).
    */
  private[graft] val rebalanceOracle: String = {
      val wCase = TargetPpm.map { case (c, w) =>
        s"WHEN '$c' THEN $w" }.mkString(" ")
      val classRows = TargetPpm.map { case (c, _) => s"('$c')" }.mkString(", ")
      s"""WITH cur AS (
         |  SELECT o_custkey, o_orderpriority AS asset_class,
         |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         |      AS cur_cents
         |  FROM orders WHERE o_custkey < 100 GROUP BY 1, 2),
         |grid AS (
         |  SELECT a.o_custkey, c.asset_class,
         |    CAST(CASE c.asset_class $wCase END AS BIGINT) AS w_ppm
         |  FROM (SELECT DISTINCT o_custkey FROM cur) a
         |  CROSS JOIN (VALUES $classRows) c(asset_class)),
         |held AS (
         |  SELECT g.o_custkey, g.asset_class, g.w_ppm,
         |    coalesce(u.cur_cents, 0) AS cur_cents
         |  FROM grid g LEFT JOIN cur u
         |    ON u.o_custkey = g.o_custkey AND u.asset_class = g.asset_class),
         |tot AS (
         |  SELECT o_custkey, CAST(sum(cur_cents) AS BIGINT) AS total_cents
         |  FROM held GROUP BY 1),
         |ham AS (
         |  SELECT h.o_custkey, h.asset_class, h.cur_cents, t.total_cents,
         |    (t.total_cents * h.w_ppm) // 1000000 AS fl,
         |    (t.total_cents * h.w_ppm) % 1000000 AS fr
         |  FROM held h JOIN tot t ON t.o_custkey = h.o_custkey),
         |rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_custkey
         |      ORDER BY fr DESC, asset_class) AS r,
         |    total_cents - sum(fl) OVER (PARTITION BY o_custkey) AS rem
         |  FROM ham)
         |SELECT o_custkey, asset_class, cur_cents,
         |  CAST(fl + CASE WHEN r <= rem THEN 1 ELSE 0 END AS BIGINT)
         |    AS target_cents,
         |  CAST(fl + CASE WHEN r <= rem THEN 1 ELSE 0 END - cur_cents
         |    AS BIGINT) AS delta_cents,
         |  CASE WHEN fl + CASE WHEN r <= rem THEN 1 ELSE 0 END > cur_cents
         |    THEN 'BUY'
         |    WHEN fl + CASE WHEN r <= rem THEN 1 ELSE 0 END < cur_cents
         |    THEN 'SELL' ELSE 'HOLD' END AS side
         |FROM rk ORDER BY o_custkey, asset_class""".stripMargin
  }

  private val q391 = GraftQuery(
    "q391_target_rebalance", rebalanceOracle) { (s, d) =>
    val cur = Tables.orders(s, d)
      .where(col("o_custkey") < 100)
      .groupBy(col("o_custkey"), col("o_orderpriority").as("asset_class"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .as("cur_cents"))
    val classes = TargetPpm.map { case (c, w) =>
      struct(lit(c).as("asset_class"), lit(w).as("w_ppm")) }
    val grid = cur.select("o_custkey").distinct()
      .withColumn("cls", explode(array(classes: _*)))
      .select(col("o_custkey"), col("cls.asset_class").as("asset_class"),
        col("cls.w_ppm").as("w_ppm"))
    val held = grid.join(cur, Seq("o_custkey", "asset_class"), "left")
      .withColumn("cur_cents", coalesce(col("cur_cents"), lit(0L)))
    val wA = Window.partitionBy("o_custkey")
    val ham = held
      .withColumn("total_cents", sum(col("cur_cents")).over(wA))
      .withColumn("fl", expr("(total_cents * w_ppm) div 1000000"))
      .withColumn("fr", expr("(total_cents * w_ppm) % 1000000"))
      .withColumn("r", row_number().over(
        wA.orderBy(col("fr").desc, col("asset_class"))))
      .withColumn("rem", col("total_cents") - sum(col("fl")).over(wA))
    ham
      .withColumn("target_cents",
        (col("fl") + when(col("r") <= col("rem"), 1L).otherwise(0L))
          .cast("long"))
      .select(col("o_custkey"), col("asset_class"), col("cur_cents"),
        col("target_cents"),
        (col("target_cents") - col("cur_cents")).as("delta_cents"),
        when(col("target_cents") > col("cur_cents"), "BUY")
          .when(col("target_cents") < col("cur_cents"), "SELL")
          .otherwise("HOLD").as("side"))
      .orderBy("o_custkey", "asset_class")
  }

  val queries: Seq[GraftQuery] = Seq(q36, q320, q391)
}
