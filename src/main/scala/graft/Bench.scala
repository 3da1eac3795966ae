package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * A warmup pass at sf0.001 runs first (untimed) so JIT + codegen +
  * parquet-footer caching don't land in the first timed query — the timed
  * numbers then reflect steady-state plan execution, which is what the
  * 100 TB design point cares about.
  *
  * Timing action is a `noop`-format write, not count(): count() lets
  * Catalyst prune unreferenced projections and eliminate final sorts, so
  * projection-heavy queries would be timed as bare scans. The noop sink
  * evaluates every output row/column and discards it.
  *
  * A query that throws is reported as -1 seconds (sentinel) so the driver
  * can tell failures from fast runs.
  *
  * Optional args are query names: `graft.Bench q08_running_sum q46_...`
  * times only those (same warmup protocol) — used to bench a subset in a
  * fresh JVM, isolating one query's cost from suite-level JVM crowding
  * (code cache, JIT pressure from 46 queries' generated classes).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val unknown = args.toSet -- SparkEntry.queries.keySet
    if (unknown.nonEmpty) {
      System.err.println(
        s"[bench] unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}\n" +
          s"[bench] known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(1)
    }
    val selected: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def evaluate(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      selected.foreach { case (_, fn) =>
        try evaluate(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
    // retried query names surface in the JSON (usually empty, so the
    // tail-window budget is unaffected): a retried time ran against JVM
    // state warmed by the failed attempt, so downstream comparisons can
    // discount it rather than read it as a first-attempt number
    val retried = scala.collection.mutable.ArrayBuffer[String]()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // one retry: a crowded-host transient (broadcast timeout, executor
      // hiccup) must not poison the round's record with a -1
      def attempt(): Option[Double] = {
        val t0 = System.nanoTime()
        try { evaluate(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None }
      }
      name -> attempt().orElse {
        retried += name
        // drop session artifacts the failed attempt may have built, so
        // the retry pays the same artifact costs a clean attempt would
        try Artifacts.release(spark) catch { case _: Throwable => () }
        attempt()
      }.getOrElse(-1.0)
    }
    // Centisecond precision, trailing zeros stripped, short sf label: the
    // driver captures only the last ~2000 chars of stdout (followed by
    // sbt's "[success] ..." line), so with 68 queries a full-precision
    // line overflows the window and the round's bench goes unparsed
    // (BENCH_r05/r06 "parsed": null). Keep this line under ~1900 chars.
    def fmt(v: Double, decimals: Int): String = {
      // Locale.ROOT: a comma-decimal default locale (de_DE) would emit
      // "0,46" and the driver's JSON parse would fail
      val s = s"%.${decimals}f".formatLocal(java.util.Locale.ROOT, v)
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val sfLabel = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    // keyMode 0 = full names, 1 = "qNN", 2 = bare number "NN" (ids stay
    // recoverable: every query id is unique by number)
    def render(decimals: Int, keyMode: Int): String = {
      def key(k: String): String = keyMode match {
        case 0 => k
        case 1 => k.takeWhile(_ != '_')
        case _ => k.takeWhile(_ != '_').dropWhile(!_.isDigit)
      }
      val qs = results.map { case (k, v) =>
        "\"" + key(k) + "\":" + fmt(v, decimals)
      }.mkString("{", ",", "}")
      val re =
        if (retried.isEmpty) ""
        else retried.sorted.map(k => "\"" + key(k) + "\"")
          .mkString(",\"retried\":[", ",", "]")
      s"""{"metric":"total","value":${fmt(total, decimals)},"unit":"sec","queries":$qs$re,"sf":"$sfLabel"}"""
    }
    // The driver keeps only the last ~2000 chars of stdout, so the line
    // must fit that window WITH headroom for anything logged after it.
    // Degrade gracefully as the query count grows: centi→deci seconds
    // with full names, then qNN short keys, then bare-number keys, then
    // whole seconds — a coarser or abbreviated line beats a precise
    // truncated one the driver can't parse.
    val line = Iterator((2, 0), (1, 0), (2, 1), (1, 1), (1, 2), (0, 2))
      .map { case (d, m) => render(d, m) }.find(_.length <= 1900)
      .getOrElse(render(0, 2))
    if (line.length > 1900)
      System.err.println(s"[bench] WARNING: JSON line ${line.length} chars may overflow the driver's 2000-char tail window")
    // stop BEFORE printing: shutdown log lines on stdout would otherwise
    // land after the JSON and eat the driver's tail window from the front
    try spark.stop() catch { case _: Throwable => () }
    println(line)
  }
}
