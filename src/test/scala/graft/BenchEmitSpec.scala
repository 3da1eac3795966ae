package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for the bench-artifact emission (VERDICT r12 item 5): the class
  * of failure behind BENCH_r05/r06/r12 `"parsed": null` — a final metric
  * line longer than the driver's ~2000-char stdout tail window — must be
  * red in `sbt test`, not discovered in the round artifact. Also pins
  * that degradation never corrupts the parts the driver gates on: valid
  * JSON, exact total, sf label, and (when queries are dropped) an
  * explicit omitted count with the SLOWEST queries retained.
  */
class BenchEmitSpec extends AnyFunSuite {

  private def mkResults(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%02d_some_query_name_$i", 0.37 * (i % 17) + i * 0.001))

  // Minimal field extractor for the flat shapes BenchEmit produces.
  private def extract(line: String, field: String): Option[String] = {
    val m = ("\"" + field + "\":(\"[^\"]*\"|[-0-9.]+|\\{[^}]*\\}|\\[[^]]*\\])").r
    m.findFirstMatchIn(line).map(_.group(1))
  }

  test("final line fits the budget at every census size up to 600") {
    for (n <- Seq(1, 50, 150, 280, 320, 450, 600)) {
      val line = BenchEmit.finalLine(mkResults(n), Nil, "sf0.1")
      assert(line.length <= BenchEmit.Budget,
        s"n=$n line is ${line.length} chars > ${BenchEmit.Budget}")
      assert(line.contains("\"metric\":\"total\""))
      assert(line.endsWith("\"sf\":\"sf0.1\"}"))
    }
  }

  test("the exact suite total survives every degradation tier") {
    for (n <- Seq(60, 280, 600)) {
      val results = mkResults(n)
      val expected = results.map(_._2).filter(_ >= 0).sum
      val line = BenchEmit.finalLine(results, Nil, "sf0.1")
      val got = extract(line, "value").get.toDouble
      assert(math.abs(got - expected) < 0.06, // 1-decimal rounding at worst
        s"n=$n total $got vs $expected")
    }
  }

  test("at 280 queries (the r12 census) the line parses and keeps the slowest entries") {
    val results = mkResults(280)
    val line = BenchEmit.finalLine(results, Nil, "sf0.1")
    assert(line.length <= BenchEmit.Budget)
    // the single slowest query must always survive trimming
    val slowest = results.maxBy(_._2)
    val slowKey = slowest._1.takeWhile(_ != '_').dropWhile(!_.isDigit)
    val omitted = extract(line, "omitted").map(_.toInt).getOrElse(0)
    if (omitted > 0) {
      assert(line.contains("\"" + slowKey + "\":"),
        s"slowest query $slowKey dropped while omitting $omitted")
      val kept = extract(line, "queries").get.count(_ == ':')
      assert(kept + omitted == 280, s"kept $kept + omitted $omitted != 280")
    }
  }

  test("failed-query sentinel (-1) is excluded from the total but kept in the map") {
    val results = Seq(("q01_ok", 2.0), ("q02_bad", -1.0), ("q03_ok", 3.0))
    val line = BenchEmit.finalLine(results, Nil, "sf0.01")
    assert(extract(line, "value").get.toDouble === 5.0)
    assert(line.contains("\"q02_bad\":-1"))
  }

  test("retried names ride the line when present") {
    val line = BenchEmit.finalLine(mkResults(5), Seq("q03_some_query_name_3"), "sf0.1")
    assert(line.contains("\"retried\":[\"q03_some_query_name_3\"]"))
  }

  test("full sidecar JSON keeps full names and ms precision at any size") {
    val results = mkResults(280)
    val full = BenchEmit.fullJson(results, Nil, "sf0.1")
    assert(full.contains("\"q280_some_query_name_280\":"))
    assert(extract(full, "value").isDefined)
  }

  test("sidecar JSON is valid, keyed by full name, and leaves queries unchanged") {
    val results = mkResults(3)
    val sidecar = results.map { case (k, _) => k -> (7L, 123456L) }
    val full = BenchEmit.fullJsonWithSidecar(results, sidecar, Nil, "sf0.1")
    // the existing consumers' fields are byte-identical to fullJson's
    val base = BenchEmit.fullJson(results, Nil, "sf0.1")
    assert(full.startsWith(base.dropRight(1)))
    assert(full.contains(
      "\"q01_some_query_name_1\":{\"gc_ms\":7,\"storage_bytes\":123456}"))
    // still one line of balanced JSON (paranoid brace count — no parser here)
    assert(!full.contains("\n"))
    assert(full.count(_ == '{') == full.count(_ == '}'))
  }

  test("fmt is locale-pinned and strips trailing zeros") {
    val dflt = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(BenchEmit.fmt(0.46, 2) === "0.46")
      assert(BenchEmit.fmt(2.0, 2) === "2")
      assert(BenchEmit.fmt(1.5, 1) === "1.5")
    } finally java.util.Locale.setDefault(dflt)
  }
}
