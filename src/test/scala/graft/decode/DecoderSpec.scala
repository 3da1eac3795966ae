package graft.decode

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.schema.{AllocRegistry, MAccount, MAllocation, MSecurity, MStrategy, MTransaction}

/** Decode + reject-routing contract over the committed fixture
  * (FIXTURES.md §A5): 12 decodable rows, 4 poisoned rows, first-failing-
  * field reasons, and a typed Dataset[MTransaction] materialization.
  */
class DecoderSpec extends SparkSuite {

  private val spec = AllocRegistry.transaction
  private lazy val result = Decoder.decode(
    Decoder.readRaw(spark, "/root/repo/fixtures/mtransaction.csv", spec), spec)

  test("good rows decode with typed columns") {
    assert(result.good.count() == 12)
    val schema = result.good.schema
    assert(schema("txnShareCount").dataType.typeName == "double")
    assert(schema("txnTransactedAt").dataType.typeName == "timestamp")
  }

  test("rejects carry first-failing-field reasons") {
    val reasons = result.rejects.select("reason").collect().map(_.getString(0)).sorted
    assert(reasons.toSeq == Seq("bad_date:txnTransactedAt",
      "bad_double:txnShareCount", "missing:txnAccountID", "missing:txnAction"))
  }

  test("decode splits losslessly: good + rejects = raw") {
    val raw = Decoder.readRaw(spark, "/root/repo/fixtures/mtransaction.csv", spec)
    assert(result.good.count() + result.rejects.count() == raw.count())
  }

  test("good rows materialize as Dataset[MTransaction]") {
    import spark.implicits._
    val ds = result.good
      .withColumn("txnTransactedAt_ms", unix_millis(col("txnTransactedAt")))
      .drop("txnTransactedAt")
      .as[MTransaction]
    val rows = ds.collect()
    assert(rows.length == 12)
    assert(rows.forall(_.txnAccountID.nonEmpty))
    assert(rows.exists(_.txnSecurityID.contains("VTI,X"))) // quoted cell survived
  }

  test("optional typed fields decode to null without rejecting (holding)") {
    val holdingSpec = AllocRegistry.holding
    val tmp = java.nio.file.Files.createTempFile("graft_holding", ".csv")
    java.nio.file.Files.writeString(tmp,
      "holdingAccountID,holdingSecurityID,holdingLotID,shareCount,shareBasis,acquiredAt\n" +
        "ACC-1,BND,,100,85.0,2020-06-30\n" + // full row
        "ACC-1,SPY,L1,25,,\n" +              // optional double + date empty -> nulls
        ",SPY,L1,25,,\n")                    // missing key -> reject
    val res = Decoder.decode(
      Decoder.readRaw(spark, tmp.toString, holdingSpec), holdingSpec)
    assert(res.good.count() == 2)
    assert(res.rejects.select("reason").collect().map(_.getString(0)).toSeq
      == Seq("missing:holdingAccountID"))
    val noDate = res.good.where(col("holdingSecurityID") === "SPY").collect().head
    assert(noDate.isNullAt(noDate.fieldIndex("acquiredAt")))
    assert(noDate.isNullAt(noDate.fieldIndex("shareBasis")))
  }

  test("invalid defTimeOfDay raises a typed decoding error") {
    val raw = Decoder.readRaw(spark, "/root/repo/fixtures/mtransaction.csv", spec)
    val e = intercept[graft.detect.FinError] {
      Decoder.decode(raw, spec, defTimeOfDay = "1pm")
    }
    assert(e.message.contains("invalid defTimeOfDay '1pm'"))
  }

  test("account fixture decodes: boolean casts + Dataset[MAccount]") {
    import spark.implicits._
    val spec2 = AllocRegistry.account
    val res = Decoder.decode(
      Decoder.readRaw(spark, "/root/repo/fixtures/maccount.csv", spec2), spec2)
    assert(res.good.count() == 3)
    assert(res.rejects.select("reason").collect().map(_.getString(0)).sorted.toSeq
      == Seq("bad_boolean:isTaxable", "missing:accountID"))
    val rows = res.good.as[MAccount].collect().sortBy(_.accountID)
    assert(rows.map(_.isTaxable).toSeq == Seq(Some(true), Some(false), Some(true)))
    assert(rows(1).canTrade.isEmpty) // empty optional boolean -> None, not reject
    assert(rows(2).title.contains("Roth, IRA")) // quoted cell survived
  }

  test("allocation fixture decodes: percentage casts + Dataset[MAllocation]") {
    import spark.implicits._
    val spec2 = AllocRegistry.allocation
    val res = Decoder.decode(
      Decoder.readRaw(spark, "/root/repo/fixtures/mallocation.csv", spec2), spec2)
    assert(res.good.count() == 3)
    assert(res.rejects.select("reason").collect().map(_.getString(0)).sorted.toSeq
      == Seq("bad_double:targetPct", "missing:allocationAssetID"))
    val rows = res.good.as[MAllocation].collect()
    assert(rows.flatMap(_.targetPct).sorted.toSeq == Seq(0.4, 0.6))
    assert(rows.count(_.targetPct.isEmpty) == 1) // empty optional pct -> None
  }

  test("security fixture decodes: price/date casts + Dataset[MSecurity]") {
    import spark.implicits._
    val spec2 = AllocRegistry.security
    val res = Decoder.decode(
      Decoder.readRaw(spark, "/root/repo/fixtures/msecurity.csv", spec2), spec2)
    assert(res.good.count() == 3)
    assert(res.rejects.select("reason").collect().map(_.getString(0)).sorted.toSeq
      == Seq("bad_date:updatedAt", "bad_double:sharePrice", "missing:securityID"))
    val rows = res.good
      .withColumn("updatedAt_ms", unix_millis(col("updatedAt")))
      .drop("updatedAt")
      .as[MSecurity].collect().sortBy(_.securityID)
    // 2021-03-01 13:00 America/New_York == 2021-03-01T18:00:00Z
    assert(rows.head.updatedAt_ms
      .contains(java.time.Instant.parse("2021-03-01T18:00:00Z").toEpochMilli))
    assert(rows.find(_.securityID == "VTI").exists(r =>
      r.assetID.isEmpty && r.updatedAt_ms.isEmpty))
  }

  test("strategy fixture decodes: Dataset[MStrategy] + key reject") {
    import spark.implicits._
    val spec2 = AllocRegistry.strategy
    val res = Decoder.decode(
      Decoder.readRaw(spark, "/root/repo/fixtures/mstrategy.csv", spec2), spec2)
    assert(res.good.count() == 2)
    assert(res.rejects.select("reason").collect().map(_.getString(0)).toSeq
      == Seq("missing:strategyID"))
    val rows = res.good.as[MStrategy].collect().sortBy(_.strategyID)
    assert(rows.map(_.title).toSeq == Seq(Some("60/40"), Some("All, Weather")))
  }

  test("timestamp enrichment applies default time-of-day in the zone") {
    // 2021-03-01 13:00 America/New_York == 2021-03-01T18:00:00Z
    val ms = result.good
      .where(col("txnAccountID") === "ACC-1" && col("txnAction") === "buy")
      .select(unix_millis(col("txnTransactedAt"))).collect().head.getLong(0)
    assert(ms == java.time.Instant.parse("2021-03-01T18:00:00Z").toEpochMilli)
  }
}
