package graft.cli

import graft.SparkSuite
import graft.detect.{AllocFormat, FinError}

/** End-to-end pipeline contract over the committed fixtures (EP1/EP2). */
class HandlersSpec extends SparkSuite {

  private val txnCsv = "/root/repo/fixtures/mtransaction.csv"

  test("handleDetect reports schema and format lines") {
    assert(Handlers.handleDetect(spark, txnCsv) == Seq("transaction: CSV"))
    assert(Handlers.handleDetect(spark, "/root/repo/fixtures/masset.csv")
      == Seq("asset: CSV"))
  }

  test("handleTransform runs sniff->resolve->decode->export end to end") {
    val r = Handlers.handleTransform(spark, txnCsv)
    assert(r.importerId == "alloc_transaction")
    assert(r.schema == "transaction")
    assert(r.rejects.count() == 4)
    val lines = r.output.split("\n", -1).toSeq
    assert(lines.head ==
      "txnAction,txnTransactedAt,txnAccountID,txnSecurityID,txnLotID," +
        "txnShareCount,txnSharePrice,realizedGainShort,realizedGainLong")
    assert(lines.count(_.nonEmpty) == 13) // header + 12 good rows
    // quoted embedded-delimiter cell survives round trip re-wrapped
    assert(r.output.contains("\"VTI,X\""))
    // timestamps exported as ISO8601 UTC (13:00 New York -> 18:00Z)
    assert(r.output.contains("2021-03-01T18:00:00Z"))
  }

  test("handleTransform JSON export emits an array of objects") {
    val r = Handlers.handleTransform(spark, txnCsv,
      exportFormat = AllocFormat.JSON)
    assert(r.output.startsWith("[{") && r.output.endsWith("}]"))
    assert(r.output.contains("\"txnAction\":\"buy\""))
  }

  test("handleTransform surfaces resolution errors") {
    val e = intercept[FinError] {
      Handlers.handleTransform(spark, txnCsv, importerId = Some("nope"))
    }
    assert(e.message == "Importer not recognized. nope")
  }
}
