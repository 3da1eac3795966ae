package graft.cli

import graft.SparkSuite

/** argv → handler binding: the CLI surface over the same fixtures as
  * HandlersSpec, plus the usage/error arms.
  */
class MainSpec extends SparkSuite {

  private val txnCsv = "/root/repo/fixtures/mtransaction.csv"

  test("transform command emits the normalized export") {
    val out = Main.run(spark, Seq("transform", txnCsv)).toOption.get
    assert(out == Handlers.handleTransform(spark, txnCsv).output)
    assert(out.contains("2021-03-01T18:00:00Z"))
  }

  test("transform honors --format, --time-of-day, and --zone") {
    val json = Main.run(spark,
      Seq("transform", txnCsv, "--format", "json")).toOption.get
    assert(json.startsWith("[{") && json.contains("\"txnAction\":\"buy\""))
    // 09:30 UTC stays 09:30Z in the export
    val utc = Main.run(spark, Seq("transform", txnCsv,
      "--time-of-day", "09:30", "--zone", "UTC")).toOption.get
    assert(utc.contains("2021-03-01T09:30:00Z"))
  }

  test("transform accepts an explicit importer and schema") {
    val out = Main.run(spark, Seq("transform", txnCsv,
      "--importer", "alloc_transaction", "--schema", "transaction"))
    assert(out.isRight)
  }

  test("detect command prints schema: format lines") {
    assert(Main.run(spark, Seq("detect", txnCsv)) == Right("transaction: CSV"))
  }

  test("errors surface as Left with the taxonomy message or usage") {
    assert(Main.run(spark, Seq("transform", txnCsv, "--importer", "nope"))
      == Left("Importer not recognized. nope"))
    assert(Main.run(spark, Seq("transform", txnCsv, "--format", "xml"))
      .left.exists(_.startsWith("unknown format 'xml'")))
    assert(Main.run(spark, Seq("transform", txnCsv, "--bogus", "x"))
      .left.exists(_.startsWith("unknown or valueless flag '--bogus'")))
    assert(Main.run(spark, Seq("frobnicate")).left.exists(_.startsWith("usage:")))
    assert(Main.run(spark, Nil) == Left(Main.usage))
  }
}
