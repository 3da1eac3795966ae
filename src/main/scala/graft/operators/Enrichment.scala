package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{GraftQuery, Tables}

/** ETL enrichment kernels from the reference, re-expressed as codegen'd
  * column expressions over the driver tables:
  *  - JSON field extraction (events.props — SURVEY §2 Table B "json")
  *  - regex capture-group extraction (A12,
  *    reference/Sources/Helpers/String+CaptureGroups.swift:23-37)
  *  - surrogate transaction-id synthesis (A14,
  *    reference/Sources/Helpers/TxnIDGenerator.swift:28-33)
  *  - date/time enrichment with default time-of-day + zone (A15,
  *    reference/Sources/Core/FINporter.swift:45-47)
  */
object Enrichment {

  /** q22: JSON extraction + aggregation over events.props. */
  private val q22 = GraftQuery(
    "q22_json_extract",
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** q23: regex capture-group extraction (A12) — brand number and first
    * word of the part name, plus a no-match → null case.
    */
  private val q23 = GraftQuery(
    "q23_regex_extract",
    """SELECT p_partkey,
      |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INTEGER) AS brand_num,
      |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      |  regexp_extract(p_type, '(PROMO|ECONOMY)', 1) AS promo_or_eco
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        regexp_extract(col("p_type"), "(PROMO|ECONOMY)", 1).as("promo_or_eco"))
      .orderBy("p_partkey")
  }

  /** q24: surrogate txn-id synthesis (A14): prefix + yyyyMMdd + zero-padded
    * width-5 per-customer sequence, deterministic via row_number over a
    * total order. Golden shape: "A2021030100325"
    * (reference/Tests/Helpers/TxnIDGenTests.swift:24-29).
    */
  private val q24 = GraftQuery(
    "q24_txn_id",
    """SELECT o_orderkey,
      |  concat('T', strftime(o_orderdate, '%Y%m%d'),
      |         lpad(CAST(rn AS VARCHAR), 5, '0')) AS txn_id
      |FROM (SELECT o_orderkey, o_orderdate,
      |        row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_orderdate, o_orderkey) AS rn
      |      FROM orders) t
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .select(col("o_orderkey"),
        concat(lit("T"), date_format(col("o_orderdate"), "yyyyMMdd"),
          lpad(col("rn").cast("string"), 5, "0")).as("txn_id"))
      .orderBy("o_orderkey")
  }

  /** q25: date/time enrichment (A15) — date-only source + default
    * time-of-day 13:00, interpreted in a named zone, normalized to UTC
    * epoch. Exercises DST-aware zone conversion on both engines.
    */
  private val q25 = GraftQuery(
    "q25_time_enrichment",
    """SELECT o_orderkey,
      |  epoch_ms((o_orderdate + INTERVAL 13 HOURS)
      |           AT TIME ZONE 'America/New_York') AS transacted_ms
      |FROM orders
      |WHERE o_orderkey % 10 = 0
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .where(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"),
        unix_millis(to_utc_timestamp(
          col("o_orderdate") + expr("INTERVAL 13 HOURS"),
          "America/New_York")).as("transacted_ms"))
      .orderBy("o_orderkey")
  }

  val queries: Seq[GraftQuery] = Seq(q22, q23, q24, q25)
}
