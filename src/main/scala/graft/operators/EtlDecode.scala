package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.decode.Decoder
import graft.schema.AllocRegistry

/** The reference's transform pipeline front half, registered as
  * oracle-checked queries: PERMISSIVE CSV read → typed decode → good/reject
  * split (A2/A6/A7, reference/Sources/Core/FINporter.swift:39-49,
  * reference/Sources/Handlers/TransformHandler.swift:113-125).
  *
  * Input is the committed fixture `/root/repo/fixtures/mtransaction.csv`
  * (FIXTURES.md §A5) — 12 decodable rows and 4 poisoned rows (bad date,
  * missing key values, unparseable number). The `sfDir` argument is unused:
  * the decode surface is exercised on the fixture, whose absolute path both
  * engines read (Spark CSV source, DuckDB read_csv).
  */
object EtlDecode {

  private val FixturePath = "/root/repo/fixtures/mtransaction.csv"
  private val spec = AllocRegistry.transaction
  private val Tod = "13:00"
  private val Zone = "America/New_York"

  private def decoded(s: org.apache.spark.sql.SparkSession) =
    Decoder.decode(Decoder.readRaw(s, FixturePath, spec), spec, Tod, Zone)

  private val oracleTagged =
    s"""WITH raw AS (SELECT * FROM ${Decoder.oracleRawCsv(spec, FixturePath)}),
       |tagged AS (SELECT *, ${Decoder.oracleReasonSql(spec)} AS reason FROM raw)""".stripMargin

  /** q32: typed good rows — casts + defTimeOfDay/zone timestamp enrichment. */
  private val q32 = GraftQuery(
    "q32_decode_transactions",
    s"""$oracleTagged
       |SELECT ${Decoder.oracleDecodedSql(spec, Tod, Zone).mkString(",\n  ")}
       |FROM tagged WHERE reason IS NULL
       |ORDER BY txnTransactedAt_ms, txnAccountID""".stripMargin) { (s, _) =>
    decoded(s).good
      .withColumn("txnTransactedAt_ms", unix_millis(col("txnTransactedAt")))
      .drop("txnTransactedAt")
      .select("txnAction", "txnTransactedAt_ms", "txnAccountID",
        "txnSecurityID", "txnLotID", "txnShareCount", "txnSharePrice",
        "realizedGainShort", "realizedGainLong")
      .orderBy("txnTransactedAt_ms", "txnAccountID")
  }

  /** q33: the reject channel — raw rows + first-failing-field reason. */
  private val q33 = GraftQuery(
    "q33_decode_rejects",
    s"""$oracleTagged
       |SELECT ${spec.fields.map(_.name).mkString(", ")}, reason
       |FROM tagged WHERE reason IS NOT NULL
       |ORDER BY reason, txnTransactedAt""".stripMargin) { (s, _) =>
    decoded(s).rejects
      .orderBy("reason", "txnTransactedAt")
  }

  // ---- remaining-entity decode coverage (q50, q51) ----
  // The registry declares 7 entities; transaction is gated by q32/q33 and
  // holding/asset by specs. These two queries put the other entities'
  // cast paths (Bool, Dbl, DateCol enrichment) under the DuckDB gate too.

  private val secSpec = AllocRegistry.security
  private val SecurityFixture = "/root/repo/fixtures/msecurity.csv"

  private val secTagged =
    s"""WITH raw AS (SELECT * FROM ${Decoder.oracleRawCsv(secSpec, SecurityFixture)}),
       |tagged AS (SELECT *, ${Decoder.oracleReasonSql(secSpec)} AS reason FROM raw)""".stripMargin

  /** q50: MSecurity decode — optional double (sharePrice) and the
    * date-enriched-to-UTC-timestamp path (updatedAt) on good rows.
    */
  private val q50 = GraftQuery(
    "q50_decode_security",
    s"""$secTagged
       |SELECT ${Decoder.oracleDecodedSql(secSpec, Tod, Zone).mkString(",\n  ")}
       |FROM tagged WHERE reason IS NULL
       |ORDER BY securityID""".stripMargin) { (s, _) =>
    Decoder.decode(Decoder.readRaw(s, SecurityFixture, secSpec), secSpec, Tod, Zone).good
      .withColumn("updatedAt_ms", unix_millis(col("updatedAt")))
      .drop("updatedAt")
      .select("securityID", "assetID", "sharePrice", "updatedAt_ms", "trackerID")
      .orderBy("securityID")
  }

  private val rejectEntities = Seq(
    ("account", AllocRegistry.account, "/root/repo/fixtures/maccount.csv"),
    ("allocation", AllocRegistry.allocation, "/root/repo/fixtures/mallocation.csv"),
    ("security", secSpec, SecurityFixture),
    ("strategy", AllocRegistry.strategy, "/root/repo/fixtures/mstrategy.csv"))

  /** q51: reject matrix across the four remaining entities — every typed
    * reject arm (bad_boolean, bad_double, bad_date, missing key) fires on
    * at least one fixture row and both engines agree on the first-failing-
    * field reason.
    */
  private val q51 = GraftQuery(
    "q51_decode_reject_matrix",
    rejectEntities.map { case (e, spec, path) =>
      s"""SELECT '$e' AS entity, ${Decoder.oracleReasonSql(spec)} AS reason
         |FROM ${Decoder.oracleRawCsv(spec, path)}""".stripMargin
    }.mkString("SELECT entity, reason FROM (\n", "\nUNION ALL\n",
      "\n) t WHERE reason IS NOT NULL ORDER BY entity, reason")) { (s, _) =>
    rejectEntities.map { case (e, spec, path) =>
      Decoder.decode(Decoder.readRaw(s, path, spec), spec, Tod, Zone).rejects
        .select(lit(e).as("entity"), col("reason"))
    }.reduce(_ unionByName _)
      .orderBy("entity", "reason")
  }

  val queries: Seq[GraftQuery] = Seq(q32, q33, q50, q51)
}
