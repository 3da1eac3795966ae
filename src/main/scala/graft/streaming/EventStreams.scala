package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch temporal operators (q18-q21,
  * graft.operators.Temporal) over a file-source stream of the `events`
  * table — SURVEY §2 Table B "Streaming".
  *
  * Design: `readStream` on the parquet directory (file sources replay
  * deterministically and scale to object-store listings), a watermark
  * bounds state, and the same window/session/dedup transforms as the
  * batch twins — so batch and streaming results agree on closed windows.
  * All aggregations here are watermark-bounded, so state is evictable and
  * the queries run indefinitely without unbounded memory at scale.
  *
  * `ts` in events.parquet is TIMESTAMP(NANOS); as in [[graft.Tables]],
  * nanos are read as raw longs and floored to micros so the streaming and
  * batch paths share one timestamp semantics.
  */
final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

object EventStreams {

  /** Streaming read of the events table (schema pinned from the batch
    * read; file streams require an explicit schema).
    *
    * File-stream sources must point at a DIRECTORY (Spark's
    * FileStreamSource injects a basePath for bare files and then rejects
    * it). At scale `events` is a directory of parquet files already; the
    * local testdata ships a single file, so that case is staged behind a
    * symlink directory once per path.
    */
  /** Stage a single parquet FILE as a directory a file-stream source will
    * accept (shared by every table's streaming reader; at scale tables
    * are directories already and this is a no-op).
    *
    * STALENESS CONTRACT (the class behind the r15 flush-gate bug): this
    * staging is keyed on the source PATH only, which is safe if and only
    * if the staged entry is a SYMLINK TO THAT INVARIANT PATH — an
    * in-place rewrite of the file then flows through the link
    * transparently (EventStreamsSpec pins exactly that: regenerate the
    * source in place, the stream sees the new rows). Anything that
    * breaks path-transparency inherits the silent-empty-stream failure:
    * copying the file, resolving the symlink to a versioned target, or
    * keying consumers on the first-read content. If this staging ever
    * needs to materialize content, switch the key to part-file identity
    * + footer hash like [[StreamingQueries.stagedWithFlush]].
    */
  private def stageAsDir(src: java.io.File, prefix: String): String =
    if (!src.isFile) src.getPath
    else {
      // staging dir keyed by a fixed-length digest of the full path:
      // collision-free (unlike a 32-bit hash) and immune to filesystem
      // filename-length limits (unlike embedding the path itself)
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getAbsolutePath.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val staged = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"${prefix}_$digest")
      staged.mkdirs()
      val link = new java.io.File(staged, src.getName)
      // NOFOLLOW existence check so a pre-existing symlink (even one
      // whose target was temporarily missing) is detected as present;
      // its target path is invariant for this staging key, so keeping
      // it is always correct
      if (!java.nio.file.Files.exists(link.toPath,
          java.nio.file.LinkOption.NOFOLLOW_LINKS))
        java.nio.file.Files.createSymbolicLink(
          link.toPath, src.toPath.toAbsolutePath)
      staged.getPath
    }

  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = new java.io.File(s"$dir/events.parquet")
    val streamPath = stageAsDir(src, "graft_events")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(streamPath))
  }

  /** Streaming read of the documents table — the corpus-INGESTION stream
    * (new shards arriving as files), as opposed to [[readEvents]]'
    * temporal stream: no timestamps, no watermark; consumers are
    * stateless map/anti-join ingest transforms (q98).
    */
  def readDocuments(spark: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(s"$dir/documents.parquet")
    val streamPath = stageAsDir(src, "graft_documents")
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema).parquet(streamPath)
  }

  /** Streaming read of the orders table — the trade-LEDGER stream
    * (arriving order files), [[readDocuments]]' finance-side twin: no
    * timestamps beyond the order date, no watermark; consumers are
    * per-account complete-mode aggregations (q394).
    */
  def readOrders(spark: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(s"$dir/orders.parquet")
    val streamPath = stageAsDir(src, "graft_orders")
    val schema = spark.read.parquet(s"$dir/orders.parquet").schema
    spark.readStream.schema(schema).parquet(streamPath)
  }

  /** Streaming read of the lineitem table — the trade-line LEDGER stream
    * ([[readOrders]]' line-grain sibling): arriving fill/return lines for
    * the lot-accounting family (q400); no timestamps beyond the ship
    * date, no watermark — ledger feeds are SEQUENCED at the source (an
    * exchange/custodian feed delivers per-account trades in ledger
    * order), which is the in-order ingest contract [[ledgerPnlRows]]
    * states.
    */
  def readLineitem(spark: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(s"$dir/lineitem.parquet")
    val streamPath = stageAsDir(src, "graft_lineitem")
    val schema = spark.read.parquet(s"$dir/lineitem.parquet").schema
    spark.readStream.schema(schema).parquet(streamPath)
  }

  /** Streaming read of the embeddings table — the index-MAINTENANCE
    * stream (newly embedded shards arriving as files); consumers are the
    * stateless frozen-codebook assign+encode (q109), [[readDocuments]]'
    * vector-side twin.
    */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(s"$dir/embeddings.parquet")
    val streamPath = stageAsDir(src, "graft_embeddings")
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    spark.readStream.schema(schema).parquet(streamPath)
  }

  /** Tumbling 1-hour windows per event type (streaming q18). */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour/15-minute windows (streaming q19). */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("n"), col("sum_value"))

  /** Per-user session windows with a 10-minute gap (streaming q20). */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("n"), col("sum_value"))

  /** Stateful keyed dedup bounded by the watermark (streaming q21):
    * first event per (user_id, event_type) with state eviction once the
    * watermark passes — the unbounded-state-safe form of dropDuplicates.
    */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type", "event_id", "ts")

  /** Per-user running totals via explicit keyed state — the custom-state
    * surface (`KeyValueGroupedDataset.mapGroupsWithState`) for semantics
    * the built-in windows can't express. State is one (count, sum) pair
    * per user: bounded, mergeable, and evictable via timeouts in a
    * production config (NoTimeout here since the smoke harness drains a
    * finite file stream).
    */
  def userTotalsWithState(events: DataFrame): org.apache.spark.sql.Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), UserTotals](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Double)]) =>
          var (n, sv) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => n += 1; sv += r._2 }
          state.update((n, sv))
          UserTotals(uid, n, sv)
      }
  }

  /** Stream-stream interval join: each view joined to the same user's
    * clicks within `maxGap` after it (click attribution). The watermark is
    * applied BEFORE the type split so both join branches share the source
    * watermark, and the two-sided time bound lets Spark evict join state
    * once the watermark passes — bounded state on an infinite stream.
    * Inner-join matches emit in the batch both rows arrive in; the
    * watermark only governs eviction.
    *
    * With `joinType = "leftOuter"` the eviction point itself becomes an
    * emission: a view whose state the watermark retires WITHOUT ever
    * matching a click is emitted once with a NULL click side — the
    * "views that never converted" stream, which only exists because
    * state eviction proves no future click can match. Inner joins never
    * touch that code path.
    *
    * `flushType` is the outer-gate analog of [[segmentRevenue]]'s
    * keepTypes: a watermark operator only sees rows that survive the
    * filters Catalyst pushes BELOW it, so for a flush sentinel to advance
    * the watermark it must pass BOTH branches' event-type filters (the
    * self-join has two watermark nodes and the global watermark is their
    * min — one stuck side stalls eviction and the final null rows never
    * flush). The sentinel's self-match is killed in the JOIN CONDITION by
    * `view_id =!= click_id` (event ids are globally unique, so real pairs
    * always satisfy it): an inequality across BOTH sides is the one
    * predicate shape neither pushdown nor equivalence-constraint
    * inference can move below a watermark node. The sentinel view itself
    * is never emitted — the watermark never passes its own window, the
    * same invariant every flush-gated query relies on.
    */
  def attributedClicks(events: DataFrame, maxGap: String = "6 hours",
      watermark: String = "10 minutes", joinType: String = "inner",
      flushType: Option[String] = None): DataFrame = {
    val wm = events.withWatermark("ts", watermark)
    def keep(t: String) = flushType
      .map(f => col("event_type").isin(t, f))
      .getOrElse(col("event_type") === t)
    val views = wm.where(keep("view"))
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    val clicks = wm.where(keep("click"))
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val guard = if (flushType.isDefined) col("view_id") =!= col("click_id")
      else lit(true)
    views.join(clicks,
      col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr(s"INTERVAL $maxGap") && guard, joinType)
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        unix_millis(col("v_ts")).as("view_ts_ms"),
        unix_millis(col("c_ts")).as("click_ts_ms"))
  }

  /** Stream-static enrichment join: purchase events joined to the static
    * customer dimension (broadcast — it is a dim-table lookup, not stream
    * state), then watermark-bounded tumbling revenue per market segment.
    * The stream-static join is STATELESS per micro-batch: only the
    * downstream aggregation holds state, and the watermark bounds it, so
    * the operator runs indefinitely at scale while the dimension rides
    * along as a broadcast that AQE would re-plan to shuffle if it grew.
    *
    * The event-type filter keeps `keepTypes` (not just purchases) so a
    * flush-sentinel row ('__flush') can reach the watermark operator and
    * close the final windows; non-purchase rows die at the inner join
    * (sentinel user_id = -1 matches no customer) before touching state.
    */
  def segmentRevenue(events: DataFrame, customers: DataFrame,
      watermark: String = "10 minutes",
      keepTypes: Seq[String] = Seq("purchase", "__flush")): DataFrame =
    events.withWatermark("ts", watermark)
      .where(col("event_type").isin(keepTypes: _*))
      .join(broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") + 1 === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("c_mktsegment").as("mktsegment"), col("n"), col("sum_value"))

  /** Per-user value-milestone alerts via `flatMapGroupsWithState` — the
    * zero-or-more-outputs custom-state surface (vs [[userTotalsWithState]]'s
    * exactly-one). Emits one row per `stepCents` of cumulative value a
    * user crosses in the batch — between crossings a group emits NOTHING,
    * which `mapGroupsWithState` cannot express. State per user is one
    * running long: bounded and evictable by timeout in production.
    *
    * Accumulation is in INTEGER CENTS (`round(value·100)` — exact for
    * 2-decimal money values, and a binary double can never land exactly
    * on the .5 rounding boundary from one), so the running total — and
    * therefore which milestones fire — is independent of row order,
    * micro-batch boundaries, and float summation error: the property
    * that lets q75 hash-gate this operator against a batch oracle. A
    * double running sum would flake exactly at the floor boundaries the
    * milestones are defined by.
    */
  def valueMilestones(events: DataFrame,
      stepCents: Long = 100000L): org.apache.spark.sql.Dataset[(Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      // state = (running total, highest milestone already emitted): the
      // high-water mark makes emission exactly-once per (user, milestone)
      // even if a negative correction drops the total below a previously
      // crossed threshold and a later batch re-crosses it
      .flatMapGroupsWithState[(Long, Long), (Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long)]) =>
          val (before, emitted) = state.getOption.getOrElse((0L, 0L))
          val after = before + rows.map(_._2).sum
          val lastMilestone = math.max(after / stepCents, emitted)
          state.update((after, lastMilestone))
          ((emitted + 1) to lastMilestone).iterator.map(m => (uid, m))
      }
  }

  /** The q126 funnel as a WATERMARK-FINALIZED streaming fold
    * (`flatMapGroupsWithState` + event-time timeout) — the principled
    * streaming funnel: greedy first-match progress is NOT monotone under
    * event-time disorder (an earlier-arriving-later event can both raise
    * and lower the final step), so an append stream may only emit a
    * user's `steps_reached` once it is PROVABLY final. That proof is the
    * watermark: once it passes `max(event ts) + window`, no admissible
    * future event can qualify for any step (every step match requires
    * `ts <= last_match + window`, and the first signup is fixed), so the
    * group times out, folds its buffered history in (ts, event_id)
    * order — the IDENTICAL state machine as the batch `aggregate` fold —
    * emits, and drops state.
    *
    * State per user is the funnel-RELEVANT event list (four types only)
    * plus a max-ts high-water mark — the same per-user payload bound as
    * the batch collect_list, evicted at timeout; users whose events are
    * all non-funnel types still hold a (empty-buffer, max-ts) entry so
    * they finalize at step 0, exactly like the oracle's DISTINCT-user
    * frame. The flush sentinel advances the watermark past every real
    * user's horizon at replay end (its own timeout never fires — the
    * watermark stays 10 min behind it), which is how q148's drained
    * stream emits exactly the batch answer.
    */
  def funnelSteps(events: DataFrame, watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(Long, Int)] = {
    val spark = events.sparkSession
    import spark.implicits._
    // the watermarked `ts` column must ride into the grouped Dataset
    // (event-time timeout resolves the watermark from the child schema);
    // the µs long `t` alongside it is what the fold compares on
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Long, Long, String)], Long), (Long, Int)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[(Long, Long, String)], Long)]) =>
          if (state.hasTimedOut) {
            val steps = foldFunnel(state.get._1)
            state.remove()
            Iterator.single((uid, steps))
          } else {
            val rs = rows.toSeq
            val (buf0, max0) = state.getOption.getOrElse(
              (Seq.empty[(Long, Long, String)], Long.MinValue))
            val buf = buf0 ++ rs.collect {
              case (_, _, t, eid, et) if FunnelTypes(et) => (t, eid, et)
            }
            val maxT = math.max(max0, rs.iterator.map(_._3).max)
            state.update((buf, maxT))
            // finalize once the watermark proves the window closed; the
            // clamp handles a group whose horizon is already behind the
            // watermark (its fold is equally final then)
            state.setTimeoutTimestamp(math.max(
              maxT / 1000L + FunnelWindowUs / 1000L + 10L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** The q127 retention cohorts as watermark-finalized custom state —
    * [[funnelSteps]]' machinery applied to the other non-monotone
    * per-user temporal fold: a user's cohort day is their FIRST-seen
    * day, which late data can only move EARLIER, so emitted
    * (cohort_day, day_offset) rows are provisional until the watermark
    * proves them final. State per user is the active-day set plus a
    * max-ts high-water mark (bounded by days of real activity — far
    * smaller than the event history); at event-time timeout the group
    * emits its (cohort, offset) pairs exactly once and evicts. Each
    * user contributes at most one row per pair, so the downstream
    * per-pair `count(*)` IS the batch `count(DISTINCT user_id)` —
    * distinct-count streaming without distinct-count state.
    */
  def retentionRows(events: DataFrame, watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(Int, Int)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("t"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[Int], Long), (Int, Int)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[Int], Long)]) =>
          if (state.hasTimedOut) {
            val days = state.get._1
            state.remove()
            val cohort = days.min
            days.sorted.iterator.map(d => (cohort, d - cohort))
          } else {
            val rs = rows.toSeq
            val (days0, max0) = state.getOption.getOrElse(
              (Seq.empty[Int], Long.MinValue))
            val days = (days0 ++ rs.iterator.map(r =>
              Math.floorDiv(r._3, DayUs).toInt)).distinct
            val maxT = math.max(max0, rs.iterator.map(_._3).max)
            state.update((days, maxT))
            state.setTimeoutTimestamp(math.max(maxT / 1000L + 10L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** q192's interval union as watermark-finalized custom state — each
    * event claims [ts, ts + value minutes-scaled) ms and a user's
    * overlapping claims coalesce into maximal islands. Unlike
    * [[funnelSteps]] (which must buffer the event history because its
    * fold is order-sensitive), interval union is an associative,
    * commutative MERGE — so the state is the merged island set itself:
    * each arriving interval absorbs every island it overlaps-or-touches
    * (min start, max end, summed count) in one pass. State per user is
    * bounded by the user's ISLAND count, not their event count — the
    * 100 TB distinction, since a hot user's thousand overlapping events
    * collapse to one (start, end, n) triple. The incremental merge
    * yields exactly the batch sweep's partition: both compute the
    * connected components of the overlap-or-touch relation (the sweep
    * discovers them in sorted order, the merge discovers them
    * arrival-incrementally; components are order-free). Emission waits
    * for the event-time timeout past the user's horizon — a future
    * admissible event (ts ≥ watermark − delay) could still extend or
    * BRIDGE islands whose end lies ahead of the watermark, so per-user
    * finalization is the earliest sound emission; the flush sentinel
    * closes every real user at replay end (q148's invariant).
    */
  def intervalIslands(events: DataFrame, watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_millis(col("ts")).as("s_ms"),
        (unix_millis(col("ts"))
          + round(col("value") * 60000).cast("long")).as("e_ms"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Long, Long, Long)], Long),
          (Long, Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[(Long, Long, Long)], Long)]) =>
          if (state.hasTimedOut) {
            val islands = state.get._1
            state.remove()
            islands.sortBy(i => (i._1, i._2)).iterator
              .map(i => (uid, i._1, i._2, i._3))
          } else {
            val rs = rows.toSeq
            val (isl0, max0) = state.getOption.getOrElse(
              (Seq.empty[(Long, Long, Long)], Long.MinValue))
            val isl = rs.foldLeft(isl0) { case (acc, (_, _, s, e)) =>
              mergeInterval(acc, s, e)
            }
            val maxT = math.max(max0,
              rs.iterator.map(r => math.max(r._3, r._4)).max)
            state.update((isl, maxT))
            state.setTimeoutTimestamp(math.max(maxT + 10L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** q241's session 3-gram paths as watermark-finalized custom state —
    * the streaming side of the "top user flows" report. Per user the
    * state buffers (t_us, event_id, event_type) rows plus a max-ts
    * high-water mark, and sessions (6-hour inactivity gap, q241's
    * constant) are finalized INCREMENTALLY: on every batch, any session
    * whose last event sits more than the gap behind the watermark is
    * provably complete — no future event can extend it (anything new
    * has ts ≥ watermark > last + gap) and no late event can land inside
    * it (that would be beyond-watermark-late, dropped by contract) — so
    * its 3-grams are emitted and its rows EVICTED. State is therefore
    * bounded by the open session tail, not the user's event history
    * (the q205 bounded-state discipline applied to an order-sensitive
    * fold). Path strings null-propagate exactly like the batch side's
    * `concat` (a NULL event_type yields a NULL path, grouped as such).
    * The event-time timeout sweeps users whose stream simply ended.
    */
  def sessionPathRows(events: DataFrame, watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[String] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Long, Long, String)], Long), String](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[(Long, Long, String)], Long)]) =>
          if (state.hasTimedOut) {
            val buf = state.get._1
            state.remove()
            sessionTrigrams(buf).iterator
          } else {
            val rs = rows.toSeq
            val (buf0, max0) = state.getOption.getOrElse(
              (Seq.empty[(Long, Long, String)], Long.MinValue))
            val buf = (buf0 ++ rs.map { case (_, _, t, eid, et) => (t, eid, et) })
              .sortBy(r => (r._1, r._2))
            val maxT = math.max(max0, rs.iterator.map(_._3).max)
            // split the sorted buffer at the last PROVABLY-final session
            // boundary: every session ending > gap before the watermark
            // is closed — emit and evict it, keep the open tail
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            // sorted buffer ⇒ a session's end is its last row's t, and
            // session ends increase along the buffer, so the LAST session
            // boundary whose preceding end sits > gap behind the watermark
            // cuts off every closed session at once
            var cut = 0
            var i = 1
            while (i < buf.length) {
              if (buf(i)._1 - buf(i - 1)._1 > SessionGapUs &&
                  buf(i - 1)._1 + SessionGapUs < wmUs)
                cut = i
              i += 1
            }
            val (closed, open) = buf.splitAt(cut)
            state.update((open, maxT))
            state.setTimeoutTimestamp(math.max(
              maxT / 1000L + SessionGapUs / 1000L + 10L,
              state.getCurrentWatermarkMs() + 1L))
            sessionTrigrams(closed).iterator
          }
      }
  }

  private val SessionGapUs = 21600000000L

  /** Sessionize an already-sorted (t, event_id, event_type) buffer on the
    * 6-hour gap and emit every intra-session 3-gram path — the exact fold
    * the batch q241 runs as window `lead`s. Null event types propagate to
    * a null path (the batch `concat` contract).
    */
  private[streaming] def sessionTrigrams(
      buf: Seq[(Long, Long, String)]): Seq[String] = {
    if (buf.isEmpty) return Seq.empty
    val out = Seq.newBuilder[String]
    var session = List.empty[String]
    def flush(): Unit = {
      val evs = session.reverse.toArray
      var k = 0
      while (k + 2 < evs.length) {
        out += (if (evs(k) == null || evs(k + 1) == null || evs(k + 2) == null)
          null
        else s"${evs(k)}>${evs(k + 1)}>${evs(k + 2)}")
        k += 1
      }
      session = Nil
    }
    var prevT = buf.head._1
    buf.foreach { case (t, _, et) =>
      if (t - prevT > SessionGapUs) flush()
      session ::= et
      prevT = t
    }
    flush()
    out.result()
  }

  /** q191's SCD2 build as watermark-finalized custom state — per-user
    * attribute change intervals from an out-of-order event stream. The
    * fold is ORDER-SENSITIVE (a change row exists only relative to the
    * previous value in (ts, event_id) order, and late data can insert
    * BETWEEN two buffered events, splitting or erasing a change), so
    * unlike [[intervalIslands]] the state must buffer the (t_us,
    * event_id, k) history — q148's payload bound — and the dimension
    * rows are only emittable once the watermark proves the user's
    * history complete. At event-time timeout the group sorts once and
    * runs the IDENTICAL change-detect + interval-close logic as the
    * batch lag/lead passes, then evicts.
    */
  def scd2Intervals(events: DataFrame, watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Option[Long])] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("t"),
        col("event_id"),
        regexp_extract(col("props"), "(\\d+)", 1).cast("long").as("k"))
      .as[(Long, java.sql.Timestamp, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Long, Long, Long)], Long),
          (Long, Long, Long, Option[Long])](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[(Long, Long, Long)], Long)]) =>
          if (state.hasTimedOut) {
            val hist = state.get._1.sortBy(r => (r._1, r._2))
            state.remove()
            // change rows: first, or k differs from the previous event
            val changes = hist.iterator.zipWithIndex.collect {
              case ((t, _, k), i) if i == 0 || hist(i - 1)._3 != k => (t, k)
            }.toSeq
            changes.iterator.zipWithIndex.map { case ((t, k), i) =>
              val to = if (i + 1 < changes.size)
                Some(changes(i + 1)._1 / 1000L) else None
              (uid, k, t / 1000L, to)
            }
          } else {
            val rs = rows.toSeq
            val (buf0, max0) = state.getOption.getOrElse(
              (Seq.empty[(Long, Long, Long)], Long.MinValue))
            val buf = buf0 ++ rs.map(r => (r._3, r._4, r._5))
            val maxT = math.max(max0, rs.iterator.map(_._3).max)
            state.update((buf, maxT))
            state.setTimeoutTimestamp(math.max(maxT / 1000L + 10L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** One incremental island-merge step: the arriving interval [s, e]
    * absorbs every island it overlaps-or-touches (min start, max end,
    * summed event count). Pure and order-free — folding any permutation
    * of the same intervals yields the same island set (ScaleSpec pins
    * this against the batch sweep), which is what makes it sound as
    * streaming state under event-time disorder.
    */
  private[streaming] def mergeInterval(islands: Seq[(Long, Long, Long)],
      s: Long, e: Long): Seq[(Long, Long, Long)] = {
    val (over, rest) = islands.partition(i => s <= i._2 && i._1 <= e)
    val merged = ((s, e, 1L) +: over).reduce((a, b) =>
      (math.min(a._1, b._1), math.max(a._2, b._2), a._3 + b._3))
    merged +: rest
  }

  private val DayUs = 86400000000L

  private val FunnelTypes = Set("signup", "view", "click", "purchase")
  private val FunnelOrder = Vector("signup", "view", "click", "purchase")
  private val FunnelWindowUs = 86400000000L

  /** The batch q126 `aggregate` fold, verbatim, over a buffered history:
    * sort by (ts, event_id), greedy first-match with a 1-day window in
    * integer µs — bit-identical window decisions to both the batch
    * engine and the DuckDB oracle.
    */
  /** q172's last-touch attribution as watermark-finalized custom state
    * ([[funnelSteps]]' machinery on a third non-monotone per-user fold):
    * a purchase's attribution depends on the latest PRECEDING event, so
    * late data can rewrite it until the watermark passes — the group
    * buffers its timeline (every type: any event can be the touch) and
    * at event-time timeout replays it in (t, event_id) order tracking
    * the last non-purchase touch, emitting one attribution row per
    * purchase exactly once. Same 1-day window and -1/'none' misses as
    * the batch window plan; gated on the identical oracle.
    */
  def lastTouchRows(events: DataFrame, watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(Long, Long, Long, String, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Long, Long, String)], Long),
          (Long, Long, Long, String, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[(Long, Long, String)], Long)]) =>
          if (state.hasTimedOut) {
            val buf = state.get._1
            state.remove()
            var lastT = Long.MinValue
            var lastId = -1L
            var lastType = "none"
            val out = Seq.newBuilder[(Long, Long, Long, String, Long, Long)]
            buf.sorted.foreach { case (t, eid, et) =>
              if (et == "purchase") {
                if (lastT != Long.MinValue && t - lastT <= AttrWindowUs)
                  out += ((eid, uid, t, lastType, lastId, t - lastT))
                else out += ((eid, uid, t, "none", -1L, -1L))
              } else {
                lastT = t; lastId = eid; lastType = et
              }
            }
            out.result().iterator
          } else {
            val rs = rows.toSeq
            val (buf0, max0) = state.getOption.getOrElse(
              (Seq.empty[(Long, Long, String)], Long.MinValue))
            val buf = buf0 ++ rs.map { case (_, _, t, eid, et) => (t, eid, et) }
            val maxT = math.max(max0, rs.iterator.map(_._3).max)
            state.update((buf, maxT))
            // attribution has no forward window: a group is final as
            // soon as the watermark passes its last buffered event
            state.setTimeoutTimestamp(math.max(
              maxT / 1000L + 10L, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  private val AttrWindowUs = 86400000000L

  /** Per-user TIME-DECAY attribution credits for the streaming twin
    * (q344) — [[lastTouchRows]]' buffer-until-timeout discipline with
    * q335's credit fold: at watermark timeout the user's timeline is
    * final, and every purchase pays its 24h touch window by the 6-hour
    * half-life weights (w = 8 >> (Δt div 6h)), floor division, and the
    * remainder-to-most-recent rule — the IDENTICAL integer arithmetic
    * as the batch windows, so conservation (Σ = 10⁶ per converting
    * purchase) holds row-for-row. Emits one (touch_type, ppm) row per
    * credit; the source-grain rollup runs on the finalized table.
    */
  def timeDecayRows(events: DataFrame, watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(String, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Long, Long, String)], Long),
          (String, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[(Long, Long, String)], Long)]) =>
          if (state.hasTimedOut) {
            val buf = state.get._1.sortBy(r => (r._1, r._2))
            state.remove()
            val out = Seq.newBuilder[(String, Long)]
            val purchases = buf.filter(_._3 == "purchase")
            val touches = buf.filter(_._3 != "purchase")
            purchases.foreach { case (pus, _, _) =>
              // touches in the 24h window, batch order (tus, tid); the
              // lower bound is STRICT, matching q335's batch predicate
              // (Δt = exactly 24h would underflow the weight to 0 and a
              // boundary-only purchase would divide by Σw = 0 below)
              val win = touches
                .filter(r => r._1 < pus && r._1 > pus - AttrWindowUs)
              val k = win.length
              if (k > 0) {
                val ws = win.map(r => 8L >> ((pus - r._1) / 21600000000L))
                val wSum = ws.sum
                val flrs = ws.map(w => 1000000L * w / wSum)
                val fSum = flrs.sum
                win.zipWithIndex.foreach { case ((_, _, ttype), i) =>
                  val ppm = flrs(i) +
                    (if (i == k - 1) 1000000L - fSum else 0L)
                  out += ((ttype, ppm))
                }
              }
            }
            out.result().iterator
          } else {
            val rs = rows.toSeq
            val (buf0, max0) = state.getOption.getOrElse(
              (Seq.empty[(Long, Long, String)], Long.MinValue))
            val buf = buf0 ++ rs.map { case (_, _, t, eid, et) => (t, eid, et) }
            val maxT = math.max(max0, rs.iterator.map(_._3).max)
            state.update((buf, maxT))
            // like lastTouchRows: no forward window past the last event —
            // every purchase's 24h LOOKBACK is complete once the
            // watermark passes the timeline
            state.setTimeoutTimestamp(math.max(
              maxT / 1000L + 10L, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** Per-user (channel-set mask, converted) rows for the streaming
    * Shapley twin (q350) — [[journeyTransitions]]' incremental
    * watermark-prefix discipline applied to q338's journey collapse:
    * every PRE-first-purchase touch ORs its channel bit into the mask
    * (click 1, error 2, signup 4, view 8) as soon as the watermark makes
    * it final, a finalized purchase freezes the journey, and the user's
    * single (mask, conv) row emits at event-time timeout. State is one
    * long + two flags + the disorder buffer — never the journey. Batch
    * parity pin: a journey whose FIRST event is the purchase has no
    * touches and emits NOTHING (q338's u-frame drops it identically) —
    * unattributable conversions belong to no channel in either engine.
    */
  def shapleyMaskRows(events: DataFrame, watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    def bitOf(et: String): Long = et match {
      case "click" => 1L
      case "error" => 2L
      case "signup" => 4L
      case "view" => 8L
      case _ => 0L
    }
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, Long, String)]
      .groupByKey(_._1)
      // state = (disorder buffer, mask, touches seen, done, max micros)
      .flatMapGroupsWithState[(Seq[(Long, Long, String)], Long, Boolean,
          Boolean, Long), (Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Seq[(Long, Long, String)], Long, Boolean, Boolean, Long)]) =>
          def fold(mask0: Long, saw0: Boolean, done0: Boolean,
              finals: Seq[(Long, Long, String)]): (Long, Boolean, Boolean) = {
            var mask = mask0; var saw = saw0; var done = done0
            finals.foreach { case (_, _, et) =>
              if (!done) {
                if (et == "purchase") done = true
                else { mask |= bitOf(et); saw = true }
              }
            }
            (mask, saw, done)
          }
          if (state.hasTimedOut) {
            val (buf, mask0, saw0, done0, _) = state.get
            state.remove()
            val (mask, saw, done) =
              fold(mask0, saw0, done0, buf.sortBy(r => (r._1, r._2)))
            if (saw) Iterator((mask, if (done) 1L else 0L))
            else Iterator.empty
          } else {
            val rs = rows.toSeq
            val (buf0, mask0, saw0, done0, max0) = state.getOption.getOrElse(
              (Seq.empty[(Long, Long, String)], 0L, false, false,
                Long.MinValue))
            val maxT = math.max(max0, rs.iterator.map(_._3).max)
            val (buf, mask, saw, done) =
              if (done0) (Seq.empty[(Long, Long, String)], mask0, saw0, true)
              else {
                val all = (buf0 ++ rs.map { case (_, _, t, eid, et) =>
                  (t, eid, et) }).sortBy(r => (r._1, r._2))
                val wmUs = state.getCurrentWatermarkMs() * 1000L
                val (fin, open) = all.span(_._1 <= wmUs)
                val (m, sw, dn) = fold(mask0, saw0, done0, fin)
                (if (dn) Seq.empty[(Long, Long, String)] else open, m, sw, dn)
              }
            state.update((buf, mask, saw, done, maxT))
            state.setTimeoutTimestamp(math.max(
              maxT / 1000L + 10L, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** Per-user journey transitions for the streaming Markov-attribution
    * twin (q336) — the batch q334 `tr` multiset (START → first event,
    * consecutive pairs in (ts, event_id) order, truncation at the FIRST
    * purchase with its own purchase → END row, last → END for
    * non-converters) emitted ONLINE.
    *
    * Unlike [[lastTouchRows]]' buffer-until-timeout, emission here is
    * INCREMENTAL: each micro-batch sorts (carry ++ new rows) and emits
    * every transition in the prefix the watermark has made final — a row
    * with t ≤ watermark can never gain an earlier-sorting sibling — so
    * state is one previous-event-type string plus only the DISORDER
    * buffer (rows still above the watermark), never the journey. A
    * converted user's state collapses to a `done` flag the moment the
    * purchase is final: everything after is dropped on arrival, which is
    * exactly the batch truncation. The event-time timeout (watermark past
    * the user's last event — driven by the flush sentinel at replay end,
    * a terminal punctuation any production backfill has) drains the
    * remaining buffer and closes the journey with its END row. The
    * sentinel user itself never times out (the watermark stays behind its
    * event) and its row never enters a final prefix, so it emits nothing.
    */
  def journeyTransitions(events: DataFrame, watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(String, String)] = {
    val spark = events.sparkSession
    import spark.implicits._
    def advance(prev0: String, done0: Boolean,
        finals: Seq[(Long, Long, String)],
        out: scala.collection.mutable.Builder[(String, String), Seq[(String, String)]])
        : (String, Boolean) = {
      var prev = prev0
      var done = done0
      finals.foreach { case (_, _, et) =>
        if (!done) {
          out += ((prev, et))
          prev = et
          if (et == "purchase") { out += (("purchase", "END")); done = true }
        }
      }
      (prev, done)
    }
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, Long, String)]
      .groupByKey(_._1)
      // state = (disorder buffer, prev type — "START" before the first
      // emission, done flag — first purchase finalized, max event micros)
      .flatMapGroupsWithState[(Seq[(Long, Long, String)], String, Boolean,
          Long), (String, String)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[
           (Seq[(Long, Long, String)], String, Boolean, Long)]) =>
          if (state.hasTimedOut) {
            val (buf, prev0, done0, _) = state.get
            state.remove()
            val out = Seq.newBuilder[(String, String)]
            val (prev, done) =
              advance(prev0, done0, buf.sortBy(r => (r._1, r._2)), out)
            // a timed-out group saw ≥1 row, so prev != "START" unless done
            if (!done && prev != "START") out += ((prev, "END"))
            out.result().iterator
          } else {
            val rs = rows.toSeq
            val (buf0, prev0, done0, max0) = state.getOption.getOrElse(
              (Seq.empty[(Long, Long, String)], "START", false, Long.MinValue))
            val maxT = math.max(max0, rs.iterator.map(_._3).max)
            val out = Seq.newBuilder[(String, String)]
            val (buf, prev, done) =
              if (done0) (Seq.empty[(Long, Long, String)], prev0, true)
              else {
                val all = (buf0 ++ rs.map { case (_, _, t, eid, et) =>
                  (t, eid, et) }).sortBy(r => (r._1, r._2))
                val wmUs = state.getCurrentWatermarkMs() * 1000L
                val (fin, open) = all.span(_._1 <= wmUs)
                val (p, dn) = advance(prev0, done0, fin, out)
                (if (dn) Seq.empty[(Long, Long, String)] else open, p, dn)
              }
            state.update((buf, prev, done, maxT))
            state.setTimeoutTimestamp(math.max(
              maxT / 1000L + 10L, state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
  }

  private def foldFunnel(buf: Seq[(Long, Long, String)]): Int = {
    var step = 0
    var t = 0L
    buf.sorted.foreach { case (ts, _, et) =>
      if (step < 4 && et == FunnelOrder(step) &&
          (step == 0 || ts <= t + FunnelWindowUs)) {
        step += 1; t = ts
      }
    }
    step
  }

  /** Run any of the above to completion over the existing files and
    * return the collected result table (availableNow trigger + memory
    * sink — the batch-parity harness used by the smoke tests).
    *
    * Stateful-streaming partition count is a per-query design parameter,
    * NOT the session's batch shuffle setting: each shuffle partition of a
    * stateful operator owns a state store whose per-micro-batch commit
    * (delta file + snapshot maintenance) is fixed I/O regardless of how
    * few rows it holds, and the count is frozen into the checkpoint at
    * first start anyway, so production jobs always pin it explicitly.
    * Size it to state volume / throughput: the default here suits the
    * gate-scale replays (measured: 32 → 8 partitions cuts the
    * stream-stream join gate 5.9s → 3.4s with identical results); a
    * 100 TB deployment raises [[statePartitions]] to its executor count
    * the same way it would set shuffle partitions for a batch job.
    * Results are partition-count-independent (the driver's oracle gate
    * hashes them), so this is a throughput knob, not a semantics knob.
    */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
      outputMode: String = "append",
      statePartitions: Option[Int] = Some(defaultStatePartitions)): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    statePartitions.foreach(n => spark.conf.set(key, n.toString))
    try {
      val q = streamed.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, prev)
    spark.table(name)
  }

  /** q262's FIFO matching maintained ONLINE — per user, `purchase` rows
    * supply integer cent-units and `click` rows consume them FIFO; the
    * state is (a) the watermark-ordering buffer (rows not yet provably
    * in final FIFO order) and (b) the UNMATCHED lot queue — and because
    * FIFO matching always drains one side, at most one of the supply /
    * demand queues is non-empty at any time, so the retained state is
    * exactly the user's open imbalance (the customer's credit balance in
    * the billing reading), not their event history. Rows are folded once
    * their whole SECOND sits behind the watermark (the batch FIFO order
    * key is (sec, event_id); folding whole seconds atomically preserves
    * the event_id tiebreak — a sub-second reorder across the watermark
    * boundary is beyond-late by the watermark contract, same as every
    * twin here). One final totals row per user emits on event-time
    * timeout: supply/demand/matched/unmatched units + matched age in
    * unit-seconds — q262's exact output, so the batch oracle gates the
    * stream verbatim. Non-qualifying rows (other types, value ≤ 0, the
    * '__flush' sentinel) advance event time but carry no units; a user
    * with no qualifying rows emits nothing (the sentinel's own group
    * among them).
    */
  def fifoTotalsRows(events: DataFrame, watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    // state: (buffer rows (sec, event_id, isSupply 1/0, units),
    //         unmatched supply lots (units, sec), unmatched demand lots,
    //         totals [nRows, supTot, demTot, matched, age], max event µs)
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("t"),
        col("event_id"),
        when(col("event_type") === "purchase" && col("value") > 0, 1L)
          .when(col("event_type") === "click" && col("value") > 0, 0L)
          .otherwise(-1L).as("side"),
        coalesce(floor(col("value") * 100 + 0.5).cast("long"), lit(0L))
          .as("units"))
      .as[(Long, java.sql.Timestamp, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Long, Long, Long, Long)], Seq[(Long, Long)], Seq[(Long, Long)], Seq[Long], Long),
          (Long, Long, Long, Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Long, Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[(Long, Long, Long, Long)], Seq[(Long, Long)], Seq[(Long, Long)], Seq[Long], Long)]) =>
          if (state.hasTimedOut) {
            val (buf, supQ, demQ, tot, _) = state.get
            state.remove()
            // everything buffered is behind the watermark now — fold it
            val (_, _, t2) = fifoFold(buf.sortBy(r => (r._1, r._2)),
              supQ, demQ, tot)
            if (t2(0) == 0L) Iterator.empty
            else Iterator((uid, t2(1), t2(2), t2(3), t2(2) - t2(3), t2(4)))
          } else {
            val rs = rows.toSeq
            val (buf0, supQ0, demQ0, tot0, max0) = state.getOption.getOrElse(
              (Seq.empty[(Long, Long, Long, Long)], Seq.empty[(Long, Long)],
                Seq.empty[(Long, Long)], Seq(0L, 0L, 0L, 0L, 0L),
                Long.MinValue))
            val maxT = math.max(max0, rs.iterator.map(_._3).max)
            val buf = (buf0 ++ rs.filter(_._5 >= 0).map(r =>
              (r._3 / 1000000L, r._4, r._5, r._6)))
              .sortBy(r => (r._1, r._2))
            val wmSec = state.getCurrentWatermarkMs() / 1000L
            val (closed, open) = buf.partition(_._1 < wmSec)
            val (supQ, demQ, tot) = fifoFold(closed, supQ0, demQ0, tot0)
            state.update((open, supQ, demQ, tot, maxT))
            state.setTimeoutTimestamp(math.max(maxT / 1000L + 10L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** Fold FIFO-ordered (sec, event_id, isSupply, units) rows into the
    * lot queues + running totals — the sequential matcher whose
    * set-at-a-time equivalent is batch q262's cumulative-interval
    * overlap join. Totals layout: [nRows, supTot, demTot, matched, age].
    */
  private[streaming] def fifoFold(
      rows: Seq[(Long, Long, Long, Long)],
      supQ0: Seq[(Long, Long)], demQ0: Seq[(Long, Long)], tot0: Seq[Long])
      : (Seq[(Long, Long)], Seq[(Long, Long)], Seq[Long]) = {
    var supQ = scala.collection.immutable.Queue(supQ0: _*)
    var demQ = scala.collection.immutable.Queue(demQ0: _*)
    var nRows = tot0(0); var supTot = tot0(1); var demTot = tot0(2)
    var matched = tot0(3); var age = tot0(4)
    rows.foreach { case (sec, _, side, units) =>
      nRows += 1L
      var u = units
      if (side == 1L) {
        supTot += units
        while (u > 0L && demQ.nonEmpty) {
          val ((du, dsec), rest) = demQ.dequeue
          val m = math.min(u, du)
          matched += m; age += m * (dsec - sec); u -= m
          demQ = if (du - m > 0L) (du - m, dsec) +: rest else rest
        }
        if (u > 0L) supQ = supQ.enqueue((u, sec))
      } else {
        demTot += units
        while (u > 0L && supQ.nonEmpty) {
          val ((su, ssec), rest) = supQ.dequeue
          val m = math.min(u, su)
          matched += m; age += m * (sec - ssec); u -= m
          supQ = if (su - m > 0L) (su - m, ssec) +: rest else rest
        }
        if (u > 0L) demQ = demQ.enqueue((u, sec))
      }
    }
    (supQ, demQ, Seq(nRows, supTot, demTot, matched, age))
  }

  /** q393's FIFO cost-basis P&L maintained ONLINE — the lot-accounting
    * stream that completes the reference-ecosystem arc (detect → decode
    * → ledger analytics at ingest rate). Input is the joined trade-line
    * stream (cust, part, dDays, ok, ln, side buy=1/sell=0, qty, up);
    * per (cust, part) the state is
    *
    *   (open buy lots (qty, up), open sell lots (qty, up),
    *    totals [nTrades, proceeds, cost, realized])
    *
    * and the fold is [[fifoFold]]'s positional matcher carrying PRICES:
    * an arriving line matches the opposite book head-first, each matched
    * parcel realizing ov·(sell_up − buy_up) in exact 10⁻⁴-cent integer
    * arithmetic (q393's parcel rule — positional matching is exactly the
    * batch kernel's cumulative-interval overlap). Because matching
    * always drains one side, AT MOST ONE book is non-empty per key, and
    * a fully consumed lot leaves state immediately — so retained state
    * is the account's OPEN POSITION (the interval kernel's residual: the
    * unmatched cumulative-quantity tail), never its trade history; the
    * four totals are 4 BIGINTs. Open-lot detail must stay in state
    * because a future match realizes against the LOT's price — the
    * cumulative quantities alone say which units match but not at what
    * basis.
    *
    * Ordering contract: rows are folded in (shipdate, orderkey,
    * linenumber) order WITHIN each micro-batch; across batches the feed
    * must be per-key FIFO-sequenced (the custodian-feed contract — the
    * ledger stream carries no event time to watermark on). Emits one
    * per-key snapshot per batch (Update mode): running totals plus the
    * open books' (units, Σ units·up) summaries — everything the
    * read-back needs to mark open positions without re-reading history.
    * nTrades is monotone, so "row with max nTrades per key" is the
    * current snapshot under any sink that retains superseded updates.
    */
  def ledgerPnlRows(
      trades: org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long, Long, Long, Long)])
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)] = {
    val spark = trades.sparkSession
    import spark.implicits._
    trades
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[(Seq[(Long, Long)], Seq[(Long, Long)], Seq[Long]),
          (Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (key: (Long, Long),
         rows: Iterator[(Long, Long, Long, Long, Long, Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[(Long, Long)], Seq[(Long, Long)], Seq[Long])]) =>
          val (buyQ0, sellQ0, tot0) = state.getOption.getOrElse(
            (Seq.empty[(Long, Long)], Seq.empty[(Long, Long)],
              Seq(0L, 0L, 0L, 0L)))
          // in-order fold within the batch; cross-batch order is the
          // feed's sequencing contract (scaladoc)
          val rs = rows.toSeq.sortBy(r => (r._3, r._4, r._5))
          val (buyQ, sellQ, tot) = ledgerFold(rs, buyQ0, sellQ0, tot0)
          state.update((buyQ, sellQ, tot))
          Iterator((key._1, key._2, tot(0), tot(1), tot(2), tot(3),
            buyQ.iterator.map(_._1).sum,
            buyQ.iterator.map(l => l._1 * l._2).sum,
            sellQ.iterator.map(_._1).sum,
            sellQ.iterator.map(l => l._1 * l._2).sum))
      }
  }

  /** Fold FIFO-ordered trade lines into the open books + running totals
    * — [[fifoFold]] with prices ((qty, up) lots, realized P&L). Totals
    * layout: [nTrades, proceeds, cost, realized]; every quantity is an
    * exact BIGINT in the ledger's 10⁻⁴-cent price grain.
    */
  private[streaming] def ledgerFold(
      rows: Seq[(Long, Long, Long, Long, Long, Long, Long, Long)],
      buyQ0: Seq[(Long, Long)], sellQ0: Seq[(Long, Long)], tot0: Seq[Long])
      : (Seq[(Long, Long)], Seq[(Long, Long)], Seq[Long]) = {
    var buyQ = scala.collection.immutable.Queue(buyQ0: _*)
    var sellQ = scala.collection.immutable.Queue(sellQ0: _*)
    var nTrades = tot0(0); var proceeds = tot0(1)
    var cost = tot0(2); var realized = tot0(3)
    rows.foreach { case (_, _, _, _, _, side, qty, up) =>
      nTrades += 1L
      var u = qty
      if (side == 1L) {
        cost += qty * up
        while (u > 0L && sellQ.nonEmpty) {
          val ((su, sup), rest) = sellQ.dequeue
          val m = math.min(u, su)
          realized += m * (sup - up); u -= m
          sellQ = if (su - m > 0L) (su - m, sup) +: rest else rest
        }
        if (u > 0L) buyQ = buyQ.enqueue((u, up))
      } else {
        proceeds += qty * up
        while (u > 0L && buyQ.nonEmpty) {
          val ((bu, bup), rest) = buyQ.dequeue
          val m = math.min(u, bu)
          realized += m * (up - bup); u -= m
          buyQ = if (bu - m > 0L) (bu - m, bup) +: rest else rest
        }
        if (u > 0L) sellQ = sellQ.enqueue((u, up))
      }
    }
    (buyQ, sellQ, Seq(nTrades, proceeds, cost, realized))
  }

  /** q392's wash-sale detection maintained ONLINE — [[ledgerPnlRows]]'
    * sibling carrying the tax rule's TIME WINDOW, which is what decides
    * the state shape: per (cust, part) the fold retains
    *
    *   (open buy lots (resid, cents, qty_orig)   — the FIFO book,
    *    recent buys (d, cs, qty) within the ±[[graft.operators.Temporal.WashDays]]-day
    *      window                                 — wash candidates for FUTURE sales,
    *    undischarged sales (ok, ln, d, ds, qty, cents, resid,
    *      matched, loss, washed)                 — a sale stays until (a) its
    *      demand interval is fully covered (a later buy may still match it —
    *      the open-short arm) AND (b) the feed has passed d + WashDays, after
    *      which no arriving in-order buy can wash it; then its per-sale counters
    *      fold into the finalized scalars and the row EVICTS,
    *    11 BIGINT scalars)
    *
    * so state is the open position PLUS one wash-window of trades — the
    * rule's inherent lookback, not history (q269's positionCreditRows
    * made the same argument for its 24 h window). Matching is the
    * positional head-first rule ([[ledgerFold]]'s equivalence argument);
    * each parcel's LOSS test is the integer cross-product
    * s.cents·b.qty < b.cents·s.qty on the ORIGINAL line quantities
    * (q392's no-float-decides-money rule), and a sale is WASHED when any
    * buy within ±WashDays has a cumulative-quantity interval NOT
    * overlapping the sale's own (the "very shares sold" exclusion,
    * verbatim). Ordering contract: [[ledgerPnlRows]]'.
    * Emits one per-key snapshot per batch (Update mode): finalized
    * scalars + the retained sales' live counters, so the snapshot always
    * equals what a batch recompute over the rows-so-far would report.
    */
  def washSaleRows(
      trades: org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long, Long, Long, Long)])
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)] = {
    val spark = trades.sparkSession
    import spark.implicits._
    trades
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[(Seq[Seq[Long]], Seq[Seq[Long]], Seq[Seq[Long]], Seq[Long]),
          (Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (key: (Long, Long),
         rows: Iterator[(Long, Long, Long, Long, Long, Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[Seq[Long]], Seq[Seq[Long]], Seq[Seq[Long]], Seq[Long])]) =>
          val st0 = state.getOption.getOrElse(
            (Seq.empty[Seq[Long]], Seq.empty[Seq[Long]], Seq.empty[Seq[Long]],
              Seq.fill(11)(0L)))
          val rs = rows.toSeq.sortBy(r => (r._3, r._4, r._5))
          val st = washSaleFold(rs, st0)
          state.update(st)
          val sc = st._4
          val sales = st._3
          Iterator((key._1, key._2, sc(3), sc(4),
            sc(5) + sales.count(_(7) > 0L),
            sc(6) + sales.count(_(8) > 0L),
            sc(7) + sales.count(s => s(8) > 0L && s(9) == 1L),
            sc(8) + sales.iterator.map(_(7)).sum,
            sc(9) + sales.iterator.map(_(8)).sum,
            sc(10) + sales.iterator.filter(_(9) == 1L).map(_(8)).sum))
      }
  }

  /** Fold FIFO-ordered trade lines into the wash-sale state (see
    * [[washSaleRows]] for the layout). Scalars:
    * [cumBuyUnits, cumSellUnits, maxD, nTrades, nSales,
    *  finMatchedSales, finLossSales, finWashedSales,
    *  finMatchedUnits, finLossUnits, finWashedLossUnits].
    */
  private[streaming] def washSaleFold(
      rows: Seq[(Long, Long, Long, Long, Long, Long, Long, Long)],
      st: (Seq[Seq[Long]], Seq[Seq[Long]], Seq[Seq[Long]], Seq[Long]))
      : (Seq[Seq[Long]], Seq[Seq[Long]], Seq[Seq[Long]], Seq[Long]) = {
    import scala.collection.mutable.ArrayBuffer
    val wash = graft.operators.Temporal.WashDays.toLong
    val openBuys = ArrayBuffer(st._1.map(_.toArray): _*)
    val recentBuys = ArrayBuffer(st._2.map(_.toArray): _*)
    val sales = ArrayBuffer(st._3.map(_.toArray): _*)
    val sc = st._4.toArray
    def overlap(ds: Long, sq: Long, cs: Long, bq: Long): Boolean =
      ds < cs + bq && cs < ds + sq
    rows.foreach { case (_, _, d, ok, ln, side, qty, cents) =>
      sc(3) += 1L
      if (d > sc(2)) sc(2) = d
      if (side == 1L) {
        val cs = sc(0); sc(0) += qty
        // wash check: this buy vs every retained sale in-window whose
        // interval it does NOT overlap (q392's exclusion, verbatim)
        sales.foreach { s =>
          if (math.abs(d - s(2)) <= wash && !overlap(s(3), s(4), cs, qty))
            s(9) = 1L
        }
        // positional matching: cover retained sales' open demand in ds
        // order (the open-short arm — a sale may precede its lot)
        var u = qty
        var i = 0
        while (u > 0L && i < sales.length) {
          val s = sales(i)
          if (s(6) > 0L) {
            val ov = math.min(u, s(6))
            s(6) -= ov; s(7) += ov
            if (s(5) * qty < cents * s(4)) s(8) += ov
            u -= ov
          }
          i += 1
        }
        if (u > 0L) openBuys += Array(u, cents, qty)
        recentBuys += Array(d, cs, qty)
      } else {
        val ds = sc(1); sc(1) += qty
        sc(4) += 1L
        var washed = 0L
        recentBuys.foreach { b =>
          if (math.abs(d - b(0)) <= wash && !overlap(ds, qty, b(1), b(2)))
            washed = 1L
        }
        var u = qty; var matched = 0L; var loss = 0L
        while (u > 0L && openBuys.nonEmpty) {
          val b = openBuys.head
          val ov = math.min(u, b(0))
          b(0) -= ov; matched += ov
          if (cents * b(2) < b(1) * qty) loss += ov
          u -= ov
          if (b(0) == 0L) openBuys.remove(0)
        }
        sales += Array(ok, ln, d, ds, qty, cents, u, matched, loss, washed)
      }
    }
    // evictions: a buy older than one window back can wash no in-order
    // future sale; a fully covered sale past its window is FINAL
    val maxD = sc(2)
    val keptBuys = recentBuys.filter(_(0) >= maxD - wash)
    val (done, kept) = sales.partition(s => s(6) == 0L && s(2) + wash < maxD)
    done.foreach { s =>
      if (s(7) > 0L) sc(5) += 1L
      if (s(8) > 0L) sc(6) += 1L
      if (s(8) > 0L && s(9) == 1L) sc(7) += 1L
      sc(8) += s(7); sc(9) += s(8)
      if (s(9) == 1L) sc(10) += s(8)
    }
    (openBuys.map(_.toSeq).toSeq, keptBuys.map(_.toSeq).toSeq,
      kept.map(_.toSeq).toSeq, sc.toSeq)
  }

  /** q269's position-based attribution maintained ONLINE — the real-time
    * multi-touch credit stream. Per user the state buffers (t_µs,
    * event_id, event_type) rows; a purchase is PROVABLY attributable
    * once the watermark passes it (every touch candidate has tus < pus ≤
    * watermark, and anything arriving later has ts ≥ watermark — so its
    * touch set is complete), at which point its 40/20/40 ppm credits
    * (q269's exact CASE, [[positionCredit]]) are emitted and the
    * purchase row evicted. Touch rows evict once older than watermark −
    * 24h: no unfinalized purchase (all have pus ≥ watermark) can look
    * back past that. State is therefore bounded by the 24h lookback
    * window per user — the attribution system's inherent state, not the
    * user's history. Emits one (touch_type, ppm) row per credit; the
    * caller aggregates to q269's per-type totals, gated on q269's
    * oracle verbatim.
    */
  def positionCreditRows(events: DataFrame, watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(String, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Long, Long, String)], Long),
          (String, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (_: Long,
         rows: Iterator[(Long, java.sql.Timestamp, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[(Long, Long, String)], Long)]) =>
          if (state.hasTimedOut) {
            // timeout fires only after the watermark passed maxT, so
            // every buffered purchase was already finalized; drop state
            val buf = state.get._1
            state.remove()
            creditsFor(buf, Long.MaxValue).iterator
          } else {
            val rs = rows.toSeq
            val (buf0, max0) = state.getOption.getOrElse(
              (Seq.empty[(Long, Long, String)], Long.MinValue))
            val maxT = math.max(max0, rs.iterator.map(_._3).max)
            val buf = (buf0 ++ rs.map(r => (r._3, r._4, r._5)))
              .sortBy(r => (r._1, r._2))
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val out = creditsFor(buf, wmUs)
            val kept = buf.filter { case (t, _, tp) =>
              if (tp == "purchase") t >= wmUs
              else t >= wmUs - AttributionWindowUs
            }
            state.update((kept, maxT))
            state.setTimeoutTimestamp(math.max(maxT / 1000L + 10L,
              state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }

  private val AttributionWindowUs = 86400000000L

  /** Emit q269's (touch_type, ppm) credits for every purchase in `buf`
    * with t < `finalBefore` — buf sorted by (t, event_id), so the touch
    * ranking (tus, tid) matches the batch window order.
    */
  private[streaming] def creditsFor(buf: Seq[(Long, Long, String)],
      finalBefore: Long): Seq[(String, Long)] =
    buf.iterator
      .filter { case (t, _, tp) => tp == "purchase" && t < finalBefore }
      .flatMap { case (pus, _, _) =>
        val touches = buf.filter { case (t, _, tp) =>
          tp != "purchase" && t < pus && t >= pus - AttributionWindowUs
        }
        val k = touches.length
        touches.zipWithIndex.map { case ((_, _, tp), i) =>
          (tp, positionCredit(k, i + 1))
        }
      }.toSeq

  /** q269's exact 40/20/40 ppm CASE (k touches, 1-based position). */
  private[streaming] def positionCredit(k: Int, pos: Int): Long =
    if (k == 1) 1000000L
    else if (k == 2) 500000L
    else if (pos == 1 || pos == k) 400000L
    else 200000L / (k - 2) + (if (pos == 2) 200000L % (k - 2) else 0L)

  /** q281's compaction plan maintained ONLINE — the ingest-side group
    * assigner: as per-record files land, each source's next-fit group
    * manifest row emits the moment the group CLOSES (the first file whose
    * start offset crosses into a later group proves no earlier file can
    * ever join it — offsets are monotone in the ingest order). State per
    * source is the watermark-ordering buffer plus ONE open-group
    * accumulator (grp, n_files, bytes, cum offset) — never the file
    * history, so a source with millions of small files (the case
    * compaction exists for) holds O(watermark-lag) state. The open tail
    * group emits on event-time timeout with `is_tail = 1` — exactly
    * batch q281's `grp = max(grp)` flag, since next-fit only ever closes
    * a group by opening a later one. Input rows are (source, ts,
    * file_id, bytes) with event time monotone in the ingest sequence
    * (file_id breaks within-second ties); emits (source, grp, n_files,
    * group_bytes, is_tail).
    */
  def compactionGroupRows(files: DataFrame, target: Long,
      watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[(String, Long, Long, Long, Long)] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.withWatermark("ts", watermark)
      .select(col("source"), col("ts"), unix_micros(col("ts")).as("t"),
        col("file_id"), col("bytes"))
      .as[(String, java.sql.Timestamp, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Long, Long, Long)], Seq[Long], Long),
          (String, Long, Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (src: String,
         rows: Iterator[(String, java.sql.Timestamp, Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Seq[(Long, Long, Long)], Seq[Long], Long)]) =>
          if (state.hasTimedOut) {
            val (buf, open0, _) = state.get
            state.remove()
            val (closed, open) =
              compactionFold(buf.sortBy(r => (r._1, r._2)).map(r => (r._2, r._3)),
                open0, target)
            val tail =
              if (open(1) == 0L) Seq.empty
              else Seq((src, open(0), open(1), open(2), 1L))
            (closed.map(g => (src, g._1, g._2, g._3, 0L)) ++ tail).iterator
          } else {
            val rs = rows.toSeq
            val (buf0, open0, max0) = state.getOption.getOrElse(
              (Seq.empty[(Long, Long, Long)], Seq(0L, 0L, 0L, 0L),
                Long.MinValue))
            val maxT = math.max(max0, rs.iterator.map(_._3).max)
            // buffer (sec, file_id, bytes) — event time orders the fold
            // frontier, file_id breaks ties within a second
            val buf = (buf0 ++ rs.map(r => (r._3 / 1000000L, r._4, r._5)))
              .sortBy(r => (r._1, r._2))
            val wmSec = state.getCurrentWatermarkMs() / 1000L
            val (ready, pending) = buf.partition(_._1 < wmSec)
            val (closed, open) =
              compactionFold(ready.map(r => (r._2, r._3)), open0, target)
            state.update((pending, open, maxT))
            state.setTimeoutTimestamp(math.max(maxT / 1000L + 10L,
              state.getCurrentWatermarkMs() + 1L))
            closed.map(g => (src, g._1, g._2, g._3, 0L)).iterator
          }
      }
  }

  /** Fold ingest-ordered (file_id, bytes) rows into next-fit groups under
    * `target`: a file whose start offset (the running cum) leaves the open
    * group closes it. Open-group state layout: [grp, n_files, bytes, cum];
    * returns (closed groups as (grp, n_files, bytes), new open state).
    * The sequential twin of batch q281's `(cum − bytes) div target`.
    */
  private[streaming] def compactionFold(files: Seq[(Long, Long)],
      open0: Seq[Long], target: Long): (Seq[(Long, Long, Long)], Seq[Long]) = {
    var grp = open0(0); var nf = open0(1); var gb = open0(2); var cum = open0(3)
    val closed = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    files.foreach { case (_, bytes) =>
      val g = cum / target
      if (nf > 0L && g != grp) { closed += ((grp, nf, gb)); nf = 0L; gb = 0L }
      grp = if (nf == 0L) g else grp
      nf += 1L; gb += bytes; cum += bytes
    }
    (closed.toSeq, Seq(grp, nf, gb, cum))
  }

  /** Gate-scale default for [[runToMemory]]'s state partitions (env
    * override for experiments; a real deployment passes it explicitly).
    */
  def defaultStatePartitions: Int =
    sys.env.get("SPARK_GRAFT_STREAM_PARTITIONS").map(_.toInt).getOrElse(8)
}
