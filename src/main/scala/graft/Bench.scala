package graft
import org.apache.spark.sql.SparkSession

/** Bench stdout emission, factored out of [[Bench.main]] so the
  * line-budget discipline is unit-testable (BenchEmitSpec) — the same
  * spirit as OutputTypeSpec for the r11 DECIMAL hash bombs: the failure
  * class behind BENCH_r05/r06/r12 `"parsed": null` (a metric line longer
  * than the driver's ~2000-char stdout tail window) must be caught by
  * `sbt test`, not discovered in the round artifact.
  *
  * Contract: [[finalLine]] ALWAYS returns a single valid JSON line of at
  * most [[Budget]] characters containing `"metric":"total"`, the exact
  * suite total, the sf label, and as many per-query timings as fit —
  * degrading precision, then key length, then (last resort) dropping the
  * FASTEST queries first with an explicit `"omitted":N` count. The full
  * undegraded map is written to a sidecar file by [[Bench.main]], so
  * nothing is lost — the stdout line is the machine-readable gate, the
  * file is the human/tooling record.
  */
object BenchEmit {

  /** Max chars for the final stdout line. The driver captures only the
    * last ~2000 chars of stdout and sbt appends a "[success] ..." line
    * after ours, so stay under with headroom.
    */
  val Budget = 1900

  /** Locale-pinned fixed-point format, trailing zeros stripped. A
    * comma-decimal default locale (de_DE) would emit "0,46" and the
    * driver's JSON parse would fail.
    */
  def fmt(v: Double, decimals: Int): String = {
    val s = s"%.${decimals}f".formatLocal(java.util.Locale.ROOT, v)
    if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
    else s
  }

  // keyMode 0 = full names, 1 = "qNN", 2 = bare number "NN" (ids stay
  // recoverable: every query id is unique by number)
  private def key(k: String, keyMode: Int): String = keyMode match {
    case 0 => k
    case 1 => k.takeWhile(_ != '_')
    case _ => k.takeWhile(_ != '_').dropWhile(!_.isDigit)
  }

  private def render(results: Seq[(String, Double)], retried: Seq[String],
      sfLabel: String, total: Double, decimals: Int, keyMode: Int,
      omitted: Int): String = {
    val qs = results.map { case (k, v) =>
      "\"" + key(k, keyMode) + "\":" + fmt(v, decimals)
    }.mkString("{", ",", "}")
    val re =
      if (retried.isEmpty) ""
      else retried.sorted.map(k => "\"" + key(k, keyMode) + "\"")
        .mkString(",\"retried\":[", ",", "]")
    val om = if (omitted == 0) "" else s""","omitted":$omitted"""
    s"""{"metric":"total","value":${fmt(total, decimals max 1)},"unit":"sec","queries":$qs$re$om,"sf":"$sfLabel"}"""
  }

  /** The guaranteed-fit final line (see object doc for the contract). */
  def finalLine(results: Seq[(String, Double)], retried: Seq[String],
      sfLabel: String): String = {
    val total = results.map(_._2).filter(_ >= 0).sum
    // Degradation ladder: centi→deci seconds with full names, then qNN
    // short keys, then bare-number keys, then whole seconds — a coarser
    // or abbreviated line beats a precise truncated one the driver can't
    // parse.
    val ladder = Iterator((2, 0), (1, 0), (2, 1), (1, 1), (1, 2), (0, 2))
      .map { case (d, m) => render(results, retried, sfLabel, total, d, m, 0) }
      .find(_.length <= Budget)
    ladder.getOrElse {
      // Last resort (280+ queries): keep the SLOWEST queries — the ones a
      // regression hunt needs — and drop the fast tail with an explicit
      // omitted count. Binary-search the largest slowest-first prefix
      // that fits; n=0 always fits (the envelope alone is ~100 chars).
      val bySlowest = results.sortBy { case (k, v) => (-v, k) }
      def line(n: Int): String =
        render(bySlowest.take(n).sortBy(_._1), retried, sfLabel, total, 1, 2,
          results.size - n)
      var lo = 0
      var hi = results.size
      while (lo < hi) { // invariant: line(lo) fits
        val mid = (lo + hi + 1) / 2
        if (line(mid).length <= Budget) lo = mid else hi = mid - 1
      }
      line(lo)
    }
  }

  /** Full-precision sidecar JSON (full names, millisecond precision) —
    * written to a file next to the repo, never printed to stdout.
    */
  def fullJson(results: Seq[(String, Double)], retried: Seq[String],
      sfLabel: String): String = {
    val total = results.map(_._2).filter(_ >= 0).sum
    render(results, retried, sfLabel, total, 3, 0, 0)
  }

  /** [[fullJson]] plus the crowding sidecar (VERDICT r16 item 7): a
    * separate top-level `"sidecar"` object maps each query to the JVM
    * GC time it paid (`gc_ms`, delta across the query's run) and the
    * executor storage memory held when it FINISHED (`storage_bytes` —
    * cached/checkpointed blocks + broadcasts still alive). Read:
    * a query whose suite time ≫ fresh-JVM time with large `gc_ms`
    * and/or rising `storage_bytes` was crowded by suite-level JVM
    * state, not slow by plan — the divergence is measured in the
    * record instead of re-litigated each round. Kept OUT of the
    * `"queries"` map so every existing consumer (bench_local.py, the
    * driver's parse) reads the file unchanged.
    */
  def fullJsonWithSidecar(results: Seq[(String, Double)],
      sidecar: Seq[(String, (Long, Long))], retried: Seq[String],
      sfLabel: String): String = {
    val base = fullJson(results, retried, sfLabel)
    val side = sidecar.map { case (k, (gcMs, bytes)) =>
      "\"" + k + "\":{\"gc_ms\":" + gcMs + ",\"storage_bytes\":" + bytes + "}"
    }.mkString("{", ",", "}")
    base.patch(base.lastIndexOf('}'), s""","sidecar":$side}""", 1)
  }
}

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints per-query seconds, ending with ONE
  * compact JSON line guaranteed to fit the driver's stdout tail window
  * (see [[BenchEmit]]).
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
  * (code cache, JIT pressure from 280 queries' generated classes).
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
    if (new java.io.File(warmDir).isDirectory) {
      selected.foreach { case (_, fn) =>
        try evaluate(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
      // The warmup pass exists for JIT + codegen + parquet-footer
      // caching, but it also builds EVERY session artifact keyed to
      // warmDir (trained indexes, minhash signatures, postings,
      // broadcast blocklists, written-index temp dirs) — none of which
      // the timed pass can reuse (artifacts are keyed by (session,
      // dir)). Left in place they sit as dead executor storage and
      // broadcast handles under the whole timed suite — measured as
      // part of the r14 suite-crowding overhead. Release them; the JIT/
      // codegen warmup survives (compiled classes are not artifacts).
      try Artifacts.release(spark) catch { case _: Throwable => () }
    }
    // retried query names surface in the JSON (usually empty): a retried
    // time ran against JVM state warmed by the failed attempt, so
    // downstream comparisons can discount it rather than read it as a
    // first-attempt number
    val retried = scala.collection.mutable.ArrayBuffer[String]()
    // crowding sidecar (VERDICT r16 item 7): GC-time delta across each
    // query + executor storage bytes at its end, into the full-record
    // file only (a separate "sidecar" object; the stdout line and the
    // "queries" map are unchanged for existing consumers)
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }
    def storageBytes(): Long =
      try spark.sparkContext.statusTracker.getExecutorInfos
        .map(e => e.usedOnHeapStorageMemory() + e.usedOffHeapStorageMemory())
        .sum
      catch { case _: Throwable => -1L }
    val sidecar = scala.collection.mutable.ArrayBuffer[(String, (Long, Long))]()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // one retry: a crowded-host transient (broadcast timeout, executor
      // hiccup) must not poison the round's record with a -1
      // gc delta is sampled INSIDE the attempt so a retried query's
      // sidecar covers only the attempt its seconds cover (a failed
      // first attempt's GC would otherwise be billed to the 2 s retry
      // and read as a false crowding signal)
      def attempt(): Option[(Double, Long)] = {
        val t0 = System.nanoTime()
        val gc0 = gcMillis()
        try { evaluate(fn(spark, sfDir));
          Some(((System.nanoTime() - t0) / 1e9, gcMillis() - gc0)) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None }
      }
      val res = attempt().orElse {
        retried += name
        // drop session artifacts the failed attempt may have built, so
        // the retry pays the same artifact costs a clean attempt would
        try Artifacts.release(spark) catch { case _: Throwable => () }
        attempt()
      }
      sidecar += name -> (res.map(_._2).getOrElse(-1L), storageBytes())
      name -> res.map(_._1).getOrElse(-1.0)
    }
    val sfLabel = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    // Full-precision record to a sidecar file (survives any stdout
    // truncation; bench_local.py and BENCH_NOTES read it).
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "bench_full.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
        (BenchEmit.fullJsonWithSidecar(results, sidecar.toSeq, retried.toSeq,
          sfLabel) + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $fullPath: ${e.getMessage}")
    }
    val line = BenchEmit.finalLine(results, retried.toSeq, sfLabel)
    // stop BEFORE printing: shutdown log lines on stdout would otherwise
    // land after the JSON and eat the driver's tail window from the front
    try spark.stop() catch { case _: Throwable => () }
    println(line)
  }
}
