package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming correctness: with the flush sentinel staged
  * ([[StreamingQueries.stagedWithFlush]]), every real window closes, so
  * append-mode streaming output must EQUAL the batch twin — not just be a
  * prefix of it. The registered q47-q49 put the same equivalence under the
  * driver's DuckDB hash gate; these tests cover the sliding-window shape
  * (no registered streaming query) and the custom-state path, and keep a
  * fast in-JVM equality check for the window shapes.
  */
class EventStreamsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def streamFlushed(build: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame, name: String) = {
    val staged = StreamingQueries.stagedWithFlush(spark, dir)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val events = graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(staged))
    EventStreams.runToMemory(spark, build(events), name)
  }

  test("tumbling-window stream EQUALS batch on flushed input") {
    val streamed = streamFlushed(EventStreams.tumblingCounts(_), "t_tumbling")
    val batch = graft.SparkEntry.queries("q18_tumbling_window")(spark, dir)
    val s = streamed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val b = batch.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(s.nonEmpty)
    assert(s == b, s"stream/batch diverge: only-stream=${s -- b}, only-batch=${b -- s}")
  }

  test("sliding-window stream EQUALS batch on flushed input") {
    val streamed = streamFlushed(EventStreams.slidingCounts(_), "t_sliding")
    val batch = graft.SparkEntry.queries("q19_sliding_window")(spark, dir)
    val s = streamed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(s.nonEmpty)
    assert(s == b, s"stream/batch diverge: only-stream=${s -- b}, only-batch=${b -- s}")
  }

  test("session-window stream EQUALS batch on flushed input") {
    val streamed = streamFlushed(EventStreams.sessionCounts(_), "t_session")
    val batch = graft.SparkEntry.queries("q20_session_window")(spark, dir)
    val s = streamed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val b = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(s.nonEmpty)
    assert(s == b, s"stream/batch diverge: only-stream=${s -- b}, only-batch=${b -- s}")
  }

  test("stageAsDir: an in-place source rewrite is visible to the next stream") {
    // the staleness contract stageAsDir's scaladoc states (VERDICT r15
    // item 8): its staging is keyed on the source PATH only, which is
    // safe iff the staged entry is a symlink to that invariant path —
    // regenerating the source in place must flow through transparently.
    // If staging ever copies content or keys consumers on first-read
    // state, this test catches the silent-empty-stream class the r15
    // flush-gate bug belonged to.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_restage").toFile
    def writeDocs(n: Int): Unit = {
      val build = new java.io.File(tmp, "_build")
      (0 until n).map(i => (i.toLong, s"doc $i", "src"))
        .toDF("doc_id", "text", "source")
        .coalesce(1).write.mode("overwrite").parquet(build.getPath)
      val part = build.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(tmp, "documents.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def streamedCount(name: String): Long = EventStreams.runToMemory(spark,
      EventStreams.readDocuments(spark, tmp.getPath), name).count()
    writeDocs(5)
    assert(streamedCount("t_restage_before") == 5)
    writeDocs(9) // REGENERATE in place: same path, new content
    assert(streamedCount("t_restage_after") == 9,
      "stream served stale staged content after an in-place source rewrite")
  }

  test("mapGroupsWithState running totals match batch per-user counts") {
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.userTotalsWithState(EventStreams.readEvents(spark, dir)).toDF(),
      "t_state", outputMode = "update")
    val s = streamed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s.nonEmpty)
    assert(s == b) // one availableNow batch -> final state equals batch counts
  }

  test("late data behind the watermark is dropped from window aggregates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(s"2024-01-01 ${"%02d".format(h)}:${"%02d".format(m)}:00")
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = EventStreams.tumblingCounts(
        input.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("t_late").outputMode("append")
      .start()
    // batch 1: two events in the 10:00 window + one at 12:00 that will
    // advance the watermark to 11:50, closing the 10:00 window
    input.addData((ts(10, 0), "a", 1.0), (ts(10, 30), "a", 1.0), (ts(12, 0), "a", 1.0))
    q.processAllAvailable()
    // batch 2: a LATE event for the already-closed 10:00 window (must be
    // dropped) plus a far-future flush so everything else closes
    input.addData((ts(10, 5), "a", 1.0), (ts(23, 0), "flush", 0.0))
    q.processAllAvailable()
    q.stop()
    val w10 = spark.table("t_late")
      .where(col("window_start_ms") === ts(10, 0).getTime)
      .collect()
    assert(w10.length == 1 && w10.head.getAs[Long]("n") == 2,
      s"late event was not dropped: ${w10.mkString(", ")}")
  }

  test("flatMapGroupsWithState emits one row per crossed value milestone") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val q = EventStreams.valueMilestones(
        input.toDS().toDF("user_id", "value"), stepCents = 10000L)
      .toDF("user_id", "milestone")
      .writeStream.format("memory").queryName("t_milestones")
      .outputMode("append").start()
    input.addData((1L, 60.0), (1L, 50.0), (2L, 30.0)) // u1 crosses 100
    q.processAllAvailable()
    input.addData((1L, 250.0), (2L, 60.0)) // u1 crosses 200 and 300; u2 nothing
    q.processAllAvailable()
    // correction dips u1 below 300, next batch re-crosses it: the
    // high-water mark must suppress a duplicate milestone-3 emission
    input.addData((1L, -50.0))
    q.processAllAvailable()
    input.addData((1L, 60.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_milestones").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    assert(rows == List((1L, 1L), (1L, 2L), (1L, 3L)),
      s"unexpected milestones: $rows")
  }

  test("checkpointed file sink resumes exactly-once across restarts") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = java.nio.file.Files.createTempDirectory("graft_sink_src")
    val out = java.nio.file.Files.createTempDirectory("graft_sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ckpt").toString
    java.nio.file.Files.createSymbolicLink(
      src.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def drain(): Unit = {
      val q = graft.Tables.normalizeEventTs(
          spark.readStream.schema(schema).parquet(src.toString))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val batchN = spark.read.parquet(s"$dir/events.parquet").count()
    drain()
    assert(spark.read.parquet(out).count() == batchN)
    // restart with the same checkpoint and unchanged input: the committed
    // offsets must prevent any reprocessing (no duplicate rows)
    drain()
    assert(spark.read.parquet(out).count() == batchN)
    // a NEW input file after restart is picked up incrementally: exactly
    // its rows are appended
    val extraBuild = java.nio.file.Files.createTempDirectory("graft_sink_extra")
    spark.read.parquet(s"$dir/events.parquet").limit(5)
      .coalesce(1).write.mode("overwrite").parquet(extraBuild.toString)
    val part = new java.io.File(extraBuild.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath, src.resolve("extra.parquet"))
    drain()
    assert(spark.read.parquet(out).count() == batchN + 5)
  }

  test("watermarked dedup stream emits exactly one row per key") {
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.dedupedEvents(EventStreams.readEvents(spark, dir)),
      "t_dedup")
    val n = streamed.count()
    val keys = streamed.select(countDistinct(col("user_id"), col("event_type")))
      .collect().head.getLong(0)
    assert(n > 0)
    assert(n == keys, s"dedup emitted duplicate keys: $n rows for $keys keys")
    val batchKeys = graft.SparkEntry.queries("q21_keyed_dedup")(spark, dir).count()
    assert(keys == batchKeys) // same key universe as the batch dedup
  }

  test("interval island merge is arrival-order-free and equals the batch sweep") {
    // fixed interval multiset with overlaps, touches, containment, dups
    val iv = Seq((0L, 5L), (7L, 9L), (4L, 8L), (20L, 25L), (25L, 30L),
      (1L, 2L), (40L, 41L), (40L, 41L), (26L, 27L))
    def fold(order: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
      order.foldLeft(Seq.empty[(Long, Long, Long)]) {
        case (acc, (s, e)) => EventStreams.mergeInterval(acc, s, e)
      }.toSet
    // reference: the batch sweep (sort by start, running max end)
    def sweep(xs: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
      val sorted = xs.sorted
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      for ((s, e) <- sorted) {
        if (out.nonEmpty && s <= out.last._2) {
          val (ps, pe, pn) = out.remove(out.size - 1)
          out += ((ps, math.max(pe, e), pn + 1))
        } else out += ((s, e, 1L))
      }
      out.toSet
    }
    val expect = sweep(iv)
    // bridged (0-5, 7-9 via 4-8, containing 1-2), touching (25), exact dup
    assert(expect == Set((0L, 9L, 4L), (20L, 30L, 3L), (40L, 41L, 2L)),
      s"sweep islands wrong: $expect")
    // every permutation of arrivals folds to the sweep's islands
    val rnd = new scala.util.Random(7)
    for (k <- 1 to 50) {
      val shuffled = rnd.shuffle(iv)
      assert(fold(shuffled) == expect,
        s"arrival order $shuffled diverged: ${fold(shuffled)} != $expect")
    }
  }

  test("sessionTrigrams: gap split, 3-gram emission, null propagation") {
    val H = 3600000000L // 1h in µs; the session gap is 6h
    def row(t: Long, id: Long, et: String) = (t * H, id, et)
    // one 5-event session -> 3 trigrams, in timeline order
    assert(EventStreams.sessionTrigrams(
      Seq(row(0, 1, "a"), row(1, 2, "b"), row(2, 3, "c"),
        row(3, 4, "d"), row(4, 5, "e"))) ==
      Seq("a>b>c", "b>c>d", "c>d>e"))
    // a 7h gap splits sessions; 2-event fragments emit nothing
    assert(EventStreams.sessionTrigrams(
      Seq(row(0, 1, "a"), row(1, 2, "b"),
        row(9, 3, "c"), row(10, 4, "d"), row(11, 5, "e"))) ==
      Seq("c>d>e"))
    // exactly-6h gap does NOT split (strict > in both stream and batch)
    assert(EventStreams.sessionTrigrams(
      Seq(row(0, 1, "a"), row(6, 2, "b"), row(7, 3, "c"))) ==
      Seq("a>b>c"))
    // a NULL event_type propagates to a null path, matching batch concat
    assert(EventStreams.sessionTrigrams(
      Seq(row(0, 1, "a"), row(1, 2, null), row(2, 3, "c"), row(3, 4, "d"))) ==
      Seq(null, null))
    assert(EventStreams.sessionTrigrams(Nil).isEmpty)
  }

  test("compactionFold: next-fit groups, split-invariance, oversize files") {
    val zero = Seq(0L, 0L, 0L, 0L)
    // files (id, bytes) under target 100: start offsets 0,60,120 ->
    // files 1+2 pack group 0 (a file joins the group its START is in),
    // file 3 opens group 1
    val f = Seq((1L, 60L), (2L, 60L), (3L, 60L))
    val (c1, o1) = EventStreams.compactionFold(f, zero, 100L)
    assert(c1 == Seq((0L, 2L, 120L)) && o1 == Seq(1L, 1L, 60L, 180L),
      s"basic next-fit wrong: $c1 / $o1")
    // folding in two calls at ANY split point matches the one-shot fold
    val files = Seq((1L, 30L), (2L, 90L), (3L, 10L), (4L, 250L), (5L, 40L),
      (6L, 99L), (7L, 1L), (8L, 100L))
    val (allC, allO) = EventStreams.compactionFold(files, zero, 100L)
    for (k <- 0 to files.length) {
      val (a, b) = files.splitAt(k)
      val (ca, oa) = EventStreams.compactionFold(a, zero, 100L)
      val (cb, ob) = EventStreams.compactionFold(b, oa, 100L)
      assert(ca ++ cb == allC && ob == allO,
        s"split at $k diverged: ${ca ++ cb} / $ob vs $allC / $allO")
    }
    // the 250-byte file never splits: its whole size lands in the group
    // its START offset is in, making that group oversize (>target) and
    // later files skip group indices (no group 2 exists)
    assert(allC == Seq((0L, 2L, 120L), (1L, 2L, 260L), (3L, 1L, 40L),
      (4L, 1L, 99L)) && allO == Seq(5L, 2L, 101L, 620L),
      s"next-fit trace wrong: $allC / $allO")
    // empty fold is a no-op
    assert(EventStreams.compactionFold(Nil, allO, 100L) == (Nil, allO))
  }

  test("streaming FIFO P&L EQUALS batch q393 on the same ledger") {
    val streamed = graft.SparkEntry.queries("q400_stream_fifo_pnl")(spark, dir)
    val batch = graft.SparkEntry.queries("q393_fifo_cost_basis")(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until 10).map(r.getLong).toVector).toSet
    val s = rows(streamed)
    val b = rows(batch)
    assert(s.nonEmpty)
    assert(s == b, s"stream/batch diverge: only-stream=${s -- b}, only-batch=${b -- s}")
  }

  test("streaming wash-sale EQUALS batch q392 on the same ledger") {
    val streamed = graft.SparkEntry.queries("q401_stream_wash_sale")(spark, dir)
    val batch = graft.SparkEntry.queries("q392_wash_sale")(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until 8).map(r.getLong).toVector).toSet
    val s = rows(streamed)
    val b = rows(batch)
    assert(s.nonEmpty)
    assert(s == b, s"stream/batch diverge: only-stream=${s -- b}, only-batch=${b -- s}")
  }

  test("washSaleFold: WashSaleSpec's four arms + eviction + split-invariance") {
    val zero = (Seq.empty[Seq[Long]], Seq.empty[Seq[Long]],
      Seq.empty[Seq[Long]], Seq.fill(11)(0L))
    def t(d: Long, ok: Long, side: Long, qty: Long, cents: Long) =
      (7L, 1L, d, ok, 1L, side, qty, cents)
    // totals as the snapshot assembles them: finalized + retained
    def totals(st: (Seq[Seq[Long]], Seq[Seq[Long]], Seq[Seq[Long]], Seq[Long]))
        : (Long, Long, Long, Long, Long, Long) = {
      val sc = st._4; val sales = st._3
      (sc(4), sc(5) + sales.count(_(7) > 0L), sc(6) + sales.count(_(8) > 0L),
        sc(7) + sales.count(x => x(8) > 0L && x(9) == 1L),
        sc(9) + sales.iterator.map(_(8)).sum,
        sc(10) + sales.iterator.filter(_(9) == 1L).map(_(8)).sum)
    }
    // WashSaleSpec part 1: buy 10@$100, sell 10@$80 (+20d), rebuy 10@$90
    // (+10d) -> loss washed (rebuy interval [10,20) misses sale's [0,10))
    val p1 = Seq(t(0, 1, 1, 10, 10000), t(20, 2, 0, 10, 8000),
      t(30, 3, 1, 10, 9000))
    assert(totals(EventStreams.washSaleFold(p1, zero))
      == ((1L, 1L, 1L, 1L, 10L, 10L)))
    // part 2: replacement 150 days later -> loss NOT washed
    val p2 = Seq(t(0, 1, 1, 10, 10000), t(20, 2, 0, 10, 8000),
      t(170, 3, 1, 10, 9000))
    assert(totals(EventStreams.washSaleFold(p2, zero))
      == ((1L, 1L, 1L, 0L, 10L, 0L)))
    // part 3: gain with in-window buy -> matched, no loss, no wash count
    val p3 = Seq(t(0, 1, 1, 10, 10000), t(20, 2, 0, 10, 12000),
      t(24, 3, 1, 10, 9000))
    assert(totals(EventStreams.washSaleFold(p3, zero))
      == ((1L, 1L, 0L, 0L, 0L, 0L)))
    // part 4: only the matched lot itself is in-window -> excluded
    val p4 = Seq(t(15, 1, 1, 10, 10000), t(20, 2, 0, 10, 8000))
    assert(totals(EventStreams.washSaleFold(p4, zero))
      == ((1L, 1L, 1L, 0L, 10L, 0L)))
    // OPEN-SHORT arm: sell first, cover later at a higher basis -> the
    // covering buy both matches the open demand AND (non-overlap fails)
    // cannot wash it; a second buy beyond the demand interval washes
    val p5 = Seq(t(0, 1, 0, 10, 8000), t(5, 2, 1, 10, 10000),
      t(9, 3, 1, 4, 9000))
    val st5 = EventStreams.washSaleFold(p5, zero)
    assert(totals(st5) == ((1L, 1L, 1L, 1L, 10L, 10L)), totals(st5).toString)
    // eviction: once the feed passes d+30 with demand covered, the sale
    // folds into the finalized scalars and leaves state
    val p1done = p1 :+ t(60, 4, 1, 1, 1000)
    val st1 = EventStreams.washSaleFold(p1done, zero)
    assert(st1._3.isEmpty, "sale should have evicted")
    assert(totals(st1) == ((1L, 1L, 1L, 1L, 10L, 10L)))
    // split-invariance: folding in two calls at any cut matches one-shot
    for (k <- 0 to p1done.length) {
      val (a, b) = p1done.splitAt(k)
      val stb = EventStreams.washSaleFold(b, EventStreams.washSaleFold(a, zero))
      assert(totals(stb) == totals(st1), s"split at $k diverged")
    }
  }

  test("ledger folds retain only the open book on the live ledger") {
    // the scaladoc state-size claims, MEASURED: fold every (cust, part)
    // history at sf0.001 — ledgerFold must end with at most ONE
    // non-empty book per key (matching always drains a side), and
    // washSaleFold's retained sales must each still be needed (open
    // demand, or wash window not yet closed at the feed's max date)
    val led = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet")
        .where(col("o_custkey") < 100)
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        "l_orderkey")
      .select(col("o_custkey").cast("long"), col("l_partkey").cast("long"),
        expr("unix_date(CAST(l_shipdate AS DATE))").cast("long"),
        col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
        when(col("l_returnflag").isin("A", "N"), 1L).otherwise(0L),
        expr("CAST(round(l_quantity) AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .groupBy(r => (r._1, r._2))
    assert(led.nonEmpty)
    val zeroW = (Seq.empty[Seq[Long]], Seq.empty[Seq[Long]],
      Seq.empty[Seq[Long]], Seq.fill(11)(0L))
    led.foreach { case (key, rows) =>
      val sorted = rows.toSeq.sortBy(r => (r._3, r._4, r._5))
      val (buyQ, sellQ, _) = EventStreams.ledgerFold(sorted, Nil, Nil,
        Seq(0L, 0L, 0L, 0L))
      assert(buyQ.isEmpty || sellQ.isEmpty,
        s"$key: both books non-empty after the fold")
      val stW = EventStreams.washSaleFold(sorted, zeroW)
      val maxD = stW._4(2)
      stW._3.foreach { s =>
        assert(s(6) > 0L || s(2) + graft.operators.Temporal.WashDays >= maxD,
          s"$key: retained sale neither open nor in-window")
      }
    }
  }

  test("ledgerFold: positional matching, books drain one side, split-invariance") {
    val zero = Seq(0L, 0L, 0L, 0L)
    def t(dd: Long, ok: Long, ln: Long, side: Long, qty: Long, up: Long) =
      (1L, 1L, dd, ok, ln, side, qty, up)
    // buy 5@10, sell 3@14 -> realized 3*(14-10)=12, open long 2@10
    val (b1, s1, t1) = EventStreams.ledgerFold(
      Seq(t(1, 1, 1, 1, 5, 10), t(2, 2, 1, 0, 3, 14)), Nil, Nil, zero)
    assert(b1 == Seq((2L, 10L)) && s1.isEmpty
      && t1 == Seq(2L, 42L, 50L, 12L), s"$b1 $s1 $t1")
    // short first: sell 4@20, buy 6@15 -> realized 4*(20-15)=20, open long 2@15
    val (b2, s2, t2) = EventStreams.ledgerFold(
      Seq(t(1, 1, 1, 0, 4, 20), t(2, 2, 1, 1, 6, 15)), Nil, Nil, zero)
    assert(b2 == Seq((2L, 15L)) && s2.isEmpty
      && t2 == Seq(2L, 80L, 90L, 20L), s"$b2 $s2 $t2")
    // a sell spanning two buy lots realizes against EACH lot's basis
    val trades = Seq(t(1, 1, 1, 1, 2, 10), t(1, 1, 2, 1, 3, 20),
      t(2, 2, 1, 0, 4, 25), t(3, 3, 1, 0, 2, 5))
    val (b3, s3, t3) = EventStreams.ledgerFold(trades, Nil, Nil, zero)
    // matched: 2@(25-10) + 2@(25-20) + 1@(5-20) = 30+10-15 = 25; open short 1@5
    assert(b3.isEmpty && s3 == Seq((1L, 5L))
      && t3 == Seq(4L, 110L, 80L, 25L), s"$b3 $s3 $t3")
    // folding in two calls at any split matches the one-shot fold
    for (k <- 0 to trades.length) {
      val (a, b) = trades.splitAt(k)
      val (ba, sa, ta) = EventStreams.ledgerFold(a, Nil, Nil, zero)
      val (bb, sb, tb) = EventStreams.ledgerFold(b, ba, sa, ta)
      assert((bb, sb, tb) == ((b3, s3, t3)), s"split at $k diverged")
    }
  }
}
