package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Event subset for the custom-state sessionizer. */
final case class SEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    value: Double)
/** Event subset for the streaming funnel (q154). */
final case class FEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String)
/** Per-user funnel slots (−1 = stage unreached) + update counter. */
final case class FunnelState(v: Long, c: Long, p: Long, upd: Long)
/** Funnel state emitted per (user, batch) update. */
final case class FunnelUpd(user_id: Long, view_us: Long, click_us: Long,
    purchase_us: Long, upd: Long)
/** Last-seen event per user for the streaming transition matrix
  * (q186): one fixed-size row per user — BOUNDED state. */
final case class TransState(lastUs: Long, lastId: Long, lastType: String)
/** One emitted first-order transition. */
final case class TransOut(prev_type: String, next_type: String)
/** Open-session state carried between micro-batches. */
final case class SessState(startUs: Long, lastUs: Long, n: Long, sum: Double)
/** Emitted closed session. */
final case class SessionOut(user_id: Long, session_start_us: Long,
    n_events: Long, sum_value: Double)

/** Streaming surface (SURVEY §2.j — ABSENT in the reference; supplied by
  * Structured Streaming).
  *
  * Each aggregation is defined once over a plain DataFrame, so the same
  * function body runs in two modes:
  *  - batch (the `SparkEntry.queries` entries below, with SQL oracles) — in
  *    batch mode `window`/`session_window` are ordinary grouping
  *    expressions;
  *  - streaming (see StreamingSpec): `readStream` → the identical transform
  *    → `writeStream`, with `withWatermark` bounding state. The equivalence
  *    of the two modes is exactly what Structured Streaming's incremental
  *    execution guarantees, and the test suite asserts it on MemoryStream
  *    input.
  *
  * Scale notes: stream aggregations shuffle on (window, key); the watermark
  * bounds state size to (active windows × keys). Session windows use the
  * built-in merging state store, not custom state.
  */
object EventStreams {

  /** Core tumbling aggregation, mode-agnostic: 10-minute windows × event
    * type. Window start is emitted as epoch seconds (integer) so oracles
    * compare integers, not timestamps. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("win.start")).as("win_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  def tumblingWindow(spark: SparkSession, dir: String): DataFrame =
    tumblingAgg(Tables(spark, dir).events)
      .orderBy(col("win_start"), col("event_type"))

  /** Sliding windows: 30-minute length, 10-minute slide — every event lands
    * in 3 windows (the overlap amplification a streaming engine must
    * handle without re-reading input). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("win"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("win.start")).as("win_start"),
        col("cnt"), col("sum_value"))

  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    slidingAgg(Tables(spark, dir).events)
      .orderBy(col("win_start"))

  /** Session windows per user with a 5-minute inactivity gap (built-in
    * merging session_window — the gaps-and-islands computation, incremental
    * in streaming mode). Emits session start and event count. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "5 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_micros(col("win.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))

  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    sessionAgg(Tables(spark, dir).events)
      .orderBy(col("user_id"), col("session_start_us"))

  /** Error-burst session detection (q164): the q62 session windows
    * re-aggregated with per-session error counts and an exact per-mille
    * error rate; sessions at ≥ 50% errors are flagged — the incident-
    * detection readout an operations dashboard keeps on the same
    * sessionization the product analytics use. Mode-agnostic like the
    * other session aggregates: in streaming mode the merging session
    * state store maintains the counts incrementally. */
  def errorSessions(spark: SparkSession, dir: String): DataFrame =
    errorSessionsAgg(Tables(spark, dir).events)
      .orderBy(col("user_id"), col("session_start_us"))

  /** Same, mode-agnostic core. */
  def errorSessionsAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "5 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"))
      .select(col("user_id"), unix_micros(col("win.start")).as("session_start_us"),
        col("n_events"), col("n_errors"),
        expr("1000 * n_errors div n_events").as("error_pm"))
      .withColumn("flagged", col("error_pm") >= 500)

  /** Session path extraction (q167) — the clickstream readout: per
    * session, the '>'-joined sequence of event types in (ts, event_id)
    * order. The sequence is assembled per GROUP (collect_list under a
    * session_window aggregate, canonicalized by sort_array on the
    * (ts, event_id, type) struct — collect order is partition-dependent,
    * the sort makes it exact), so no window function and no global
    * state: the heavy lifting is one session-merging aggregate, path
    * length bounded by session length. */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(session_window(col("ts"), "5 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(
          unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type")))).as("seq"))
      .select(col("user_id"),
        unix_micros(col("win.start")).as("session_start_us"),
        col("n_events"),
        array_join(transform(col("seq"), e => e.getField("event_type")), ">")
          .as("path"))
      .orderBy(col("user_id"), col("session_start_us"))

  /** Return-visit gaps (q169): per session, the time since the same
    * user's PREVIOUS session started (−1 for the first) — the
    * re-engagement interval behind retention modeling, computed as a
    * per-user lag over the session relation (sessions per user are
    * bounded; the window is user-partitioned, never global). */
  def returnGaps(spark: SparkSession, dir: String): DataFrame = {
    val sessions = Tables(spark, dir).events
      .groupBy(session_window(col("ts"), "5 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("win.start")).as("session_start_us"), col("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("session_start_us"))
    sessions
      .withColumn("gap_us",
        coalesce(col("session_start_us")
          - lag(col("session_start_us"), 1).over(w), lit(-1L)))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  private val GapUs = 5L * 60 * 1000000

  private def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Custom-state sessionizer via `flatMapGroupsWithState` (SURVEY §7:
    * "flatMapGroupsWithState only if semantics require" — here it
    * reimplements session_window to demonstrate the arbitrary-state
    * surface). Per user: merge in-batch events into the open session,
    * emit sessions closed by a gap immediately, keep the open one in the
    * state store with an event-time timeout at lastEvent + gap; the
    * watermark advancing past that flushes it. Must equal the built-in
    * session_window aggregation — asserted in StreamingSpec. */
  def sessionizeCustom(events: Dataset[SEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.startUs, s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val closed = scala.collection.mutable.ListBuffer.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val us = micros(e.ts)
              cur match {
                case Some(s) if us - s.lastUs < GapUs =>
                  cur = Some(SessState(s.startUs, us, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(user, s.startUs, s.n, s.sum)
                  cur = Some(SessState(us, us, 1, e.value))
                case None =>
                  cur = Some(SessState(us, us, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000 + GapUs / 1000)
            }
            closed.iterator
          }
      }
  }

  /** Stream-stream interval join, mode-agnostic core: purchase events
    * matched to signup events of the same user within the preceding 24
    * hours. In streaming mode both sides carry watermarks and the time
    * bound lets Spark expire join state (see StreamingSpec); in batch mode
    * it is an ordinary interval equi-join. */
  def purchaseSignupPairs(purchases: DataFrame, signups: DataFrame): DataFrame = {
    val p = purchases.select(col("event_id").as("p_id"), col("user_id").as("p_user"),
      col("ts").as("p_ts"))
    val s = signups.select(col("event_id").as("s_id"), col("user_id").as("s_user"),
      col("ts").as("s_ts"))
    p.join(s,
      col("p_user") === col("s_user") &&
      col("s_ts") <= col("p_ts") &&
      col("s_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
  }

  /** Batch query entry: per purchase, how many signups by the same user
    * in the last 24h (left join keeps zero-match purchases). */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val pairs = purchaseSignupPairs(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "signup"))
      .groupBy(col("p_id")).agg(count(lit(1)).as("n_signups_24h"))
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"))
      .join(pairs, col("event_id") === col("p_id"), "left_outer")
      .select(col("event_id"),
        coalesce(col("n_signups_24h"), lit(0L)).as("n_signups_24h"))
      .orderBy(col("event_id"))
  }

  /** Streaming dedup equivalent: first occurrence of each (user_id,
    * event_type) in time order — batch formulation via ranking window; the
    * streaming formulation is `dropDuplicates` with watermark (asserted
    * equivalent in tests). */
  def firstOccurrence(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, dir).events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"))
      .orderBy(col("user_id"), col("event_type"))
  }

  // ---------------------------------------- late-data audit (q160)

  /** Watermark late-data audit (q160) — the sizing query a team runs
    * BEFORE picking a watermark delay: replay the stream's arrival
    * order deterministically (a FIXED count of arrival batches — id
    * ranges here, ingestion offsets in a real deployment) and flag, per
    * arrival
    * batch, the events a watermarked 10-minute tumbling aggregation
    * would DROP: watermark during batch b = max event time of batches
    * < b minus the delay (structured streaming advances the watermark
    * at batch boundaries), and a row is late when its whole window has
    * closed — window_end ≤ watermark. Emits the per-batch audit
    * (events, late count, the batch's effective watermark).
    *
    * The rule is not a paraphrase: StreamingSpec feeds the SAME batches
    * through a real watermarked stream and asserts the engine's final
    * aggregate equals the batch aggregate over exactly the rows this
    * audit marks non-late — on the ordered fixture (no late data,
    * engine's drop metric 0 == audit 0) AND on a constructed
    * out-of-order feed where three windows' stragglers are genuinely
    * dropped. (The engine's `numRowsDroppedByWatermark` itself counts
    * post-partial-aggregation rows, so it is compared only where 0 —
    * per-ROW equivalence is asserted through the sink content.) Scale
    * shape: per-batch maxima are a (batch) aggregate — metadata scale —
    * cumulated on the driver; the late flag is one codegen'd comparison
    * per event. */
  def lateDataAudit(spark: SparkSession, dir: String,
      nBatches: Int = 8, delayMin: Long = 30L): DataFrame =
    lateDataAuditFrom(Tables(spark, dir).events, nBatches, delayMin)

  /** Per-event late flags — the audit's row-level core (the spec feeds
    * these rows through a REAL watermarked stream and asserts the final
    * aggregate equals the batch aggregate over the non-late rows). */
  private[graft] def lateFlagsFrom(ev: DataFrame, batchSize: Long,
      delayMin: Long): DataFrame = {
    val spark = ev.sparkSession
    val withBatch = ev.select(col("event_id"), col("ts"),
      expr(s"event_id div $batchSize").as("batch"))
    // per-batch max event time — #batches rows, metadata scale, so the
    // exclusive prefix max cumulates on the driver (the GlobalOrder
    // offsets discipline; an orderBy window here, even over metadata,
    // is banned by the engine's no-unpartitioned-window lint)
    val batchMax = withBatch.groupBy(col("batch"))
      .agg(max(unix_micros(col("ts"))).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var run = Long.MinValue
    val wmRows = batchMax.map { case (b, mx) =>
      val wm = if (run == Long.MinValue) None
        else Some(run - delayMin * 60L * 1000000L)
      run = math.max(run, mx)
      (b, wm)
    }
    import spark.implicits._
    val wms = wmRows.toSeq.toDF("batch", "wm_us")
    withBatch.join(broadcast(wms), Seq("batch"))
      .withColumn("win_end_us",
        (expr("unix_micros(ts) div 600000000") + 1) * lit(600000000L))
      .withColumn("late",
        col("wm_us").isNotNull && col("win_end_us") <= col("wm_us"))
  }

  /** Same, over an arbitrary (event_id, ts) relation. The replay
    * granularity is a FIXED batch count (batch size derived from the
    * observed id range), so the per-batch maxima collected to the
    * driver are ≤ nBatches rows at ANY corpus size — a fixed batch
    * SIZE would make the collect linear in the corpus, the driver-state
    * shape everything else in the engine avoids. */
  def lateDataAuditFrom(ev: DataFrame, nBatches: Int = 8,
      delayMin: Long = 30L): DataFrame = {
    val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
    lateFlagsFrom(ev, maxId / nBatches + 1, delayMin)
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        coalesce(first(col("wm_us")), lit(-1L)).as("wm_us"))
      .orderBy(col("batch"))
  }

  // --------------------------------------------- streaming funnel (q154)

  /** Incrementally advance per-user funnel state machines over a stream
    * of events: the streaming twin of the q149 batch funnel, via
    * `mapGroupsWithState`. Per user the state is three fixed slots
    * (first-view / first-click-after-view / first-purchase-after-click
    * micros, −1 = unreached) — BOUNDED state per user, never an event
    * buffer — advanced greedily over each batch's events in (ts,
    * event_id) order.
    *
    * Equivalence contract: greedy advance equals the batch min-chain
    * when events arrive in event-time order ACROSS batches (within a
    * batch any order — the handler sorts). The registered feed
    * guarantees that by range-chunking the fixture on ts; a production
    * deployment gets it from watermark-delayed finalization, and a LATE
    * first-view that arrives after a later view was already locked in
    * is the documented approximation (the batch replay is the repair
    * path, as with the dedup stores). The update counter lets the sink
    * select each user's latest state without trusting sink ordering. */
  def funnelAdvance(events: Dataset[FEvent]): Dataset[FunnelUpd] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelUpd](
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[FEvent], state: GroupState[FunnelState]) =>
          val s0 = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, 0L))
          var v = s0.v; var c = s0.c; var p = s0.p
          rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val us = micros(e.ts)
            e.event_type match {
              case "view" if v < 0 => v = us
              case "click" if c < 0 && v >= 0 && us > v => c = us
              case "purchase" if p < 0 && c >= 0 && us > c => p = us
              case _ => ()
            }
          }
          val ns = FunnelState(v, c, p, s0.upd + 1)
          state.update(ns)
          FunnelUpd(user, v, c, p, ns.upd)
      }
  }

  /** The q186 per-user advance: each batch's events (sorted by
    * (ts, event_id) — shuffle order inside a batch is irrelevant) emit
    * one (prev, next) transition against the REMEMBERED last event,
    * which crosses micro-batch boundaries through the state row — the
    * part a per-batch lead() window cannot see. State is one fixed
    * struct per user (q154's boundedness argument); equivalence to the
    * batch q176 window holds under the ordered-feed contract, exactly
    * like the funnel. */
  def transitionsAdvance(events: Dataset[FEvent]): Dataset[TransOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[FEvent], state: GroupState[TransState]) =>
          var last = state.getOption.getOrElse(TransState(-1L, -1L, ""))
          val out = Seq.newBuilder[TransOut]
          rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            if (last.lastUs >= 0) out += TransOut(last.lastType, e.event_type)
            last = TransState(micros(e.ts), e.event_id, e.event_type)
          }
          state.update(last)
          out.result().iterator
      }
  }

  /** Fold one micro-batch of emitted transitions into the (prev, next)
    * counts store — the per-batch delta is a plain additive count
    * aggregate, so it rides the same batchId-keyed [[Snapshots]] merge
    * as the q189 monitor: O(batch + matrix rows) per batch, and the
    * matrix is ≤ types², metadata scale. Exactly-once: committed
    * batches are no-ops on replay; the state store rolls back with the
    * batch, so a replayed batch re-emits the identical delta. */
  def transBatch(batch: DataFrame, storeDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val dir = s"$storeDir/trans"
    if (Snapshots.committed(spark, dir, batchId)) return
    val delta = batch.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    Snapshots.merge(spark, dir, batchId, delta,
        Seq("prev_type", "next_type"), Seq("n"))
      .write.mode("overwrite").parquet(s"$dir/b=$batchId")
    Snapshots.prune(spark, dir, batchId)
  }

  /** Current transition matrix (latest committed snapshot → permille). */
  def transitionsTable(spark: SparkSession,
      storeDir: String): DataFrame = {
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prev_type"))
    Snapshots.latest(spark, s"$storeDir/trans", Long.MaxValue)
      .map(spark.read.parquet(_))
      .getOrElse(spark.range(0).select(lit("").as("prev_type"),
        lit("").as("next_type"), lit(0L).as("n")))
      .withColumn("row_total", sum(col("n")).over(wp))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("1000 * n div row_total").as("p_pm"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Streaming transition matrix (q186) — the q176 first-order Markov
    * matrix maintained as a true stream: the ordered file feed drives
    * [[transitionsAdvance]], each batch's emitted transitions fold
    * ADDITIVELY into the batchId-keyed parquet counts store (the q189
    * [[Snapshots]] discipline — nothing ever materializes on the
    * driver; the old memory sink held O(events) driver rows), and the
    * matrix read is the same (prev, next) aggregate + row-total
    * permille as batch q176 — whose SQL is this query's oracle
    * verbatim. Integer counts make the merge order-insensitive; the
    * cross-batch adjacency is exact because the last-event state
    * carries over where a per-batch window would miss every
    * boundary-straddling pair. */
  def streamingTransitions(spark: SparkSession, dir: String): DataFrame =
    streamingTransitionsFrom(Tables(spark, dir).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type")))

  /** Same, over an arbitrary (event_id, ts, user_id, event_type)
    * relation. */
  def streamingTransitionsFrom(ev: DataFrame): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val storeDir = Snapshots.storeDir(spark, "stream_trans_store")
    val q = transitionsAdvance(
      FileFeed.orderedStream(spark, ev, nChunks = 8,
        unix_micros(col("ts")), purpose = "transitions").as[FEvent])
      .writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[TransOut], batchId: Long) =>
        transBatch(batch.toDF(), storeDir, batchId); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    transitionsTable(spark, storeDir)
  }

  /** Fold one micro-batch of funnel-state updates into the per-user
    * state store: [[Snapshots.mergeLatest]] keeps one row per user —
    * the highest update counter wins — so the store is O(distinct
    * users touched so far), the same scale as the operator's own state
    * store, never O(users × batches) like the old driver-side memory
    * update log. Exactly-once as [[transBatch]]. */
  def funnelBatch(batch: DataFrame, storeDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val dir = s"$storeDir/funnel"
    if (Snapshots.committed(spark, dir, batchId)) return
    Snapshots.mergeLatest(spark, dir, batchId, batch,
        Seq("user_id"), "upd")
      .write.mode("overwrite").parquet(s"$dir/b=$batchId")
    Snapshots.prune(spark, dir, batchId)
  }

  /** Current funnel table (latest committed snapshot → timestamps). */
  def funnelTable(spark: SparkSession,
      storeDir: String): DataFrame =
    Snapshots.latest(spark, s"$storeDir/funnel", Long.MaxValue)
      .map(spark.read.parquet(_))
      .getOrElse(spark.range(0).select(col("id").as("user_id"),
        lit(-1L).as("view_us"), lit(-1L).as("click_us"),
        lit(-1L).as("purchase_us"), lit(0L).as("upd")))
      .select(col("user_id"),
        when(col("view_us") >= 0, timestamp_micros(col("view_us")))
          .as("view_ts"),
        when(col("click_us") >= 0, timestamp_micros(col("click_us")))
          .as("click_ts"),
        when(col("purchase_us") >= 0, timestamp_micros(col("purchase_us")))
          .as("purchase_ts"))
      .orderBy(col("user_id"))

  /** Registered q154 entry: the fixture events chunked into 8 ts-ordered
    * parquet files ([[FileFeed]] `ordered = true` — value-range bins of
    * unix_micros(ts), never calendar fields, so the event-time ordering
    * contract holds for any corpus span), streamed back one file per
    * micro-batch, folded through [[funnelAdvance]], each batch's state
    * updates compacted into the batchId-keyed parquet store by the
    * update counter ([[Snapshots.mergeLatest]] — no driver
    * materialization; the old memory sink accumulated every update row
    * on the driver). Oracle: the SAME SQL as batch q149 — the state
    * machine must land on the identical funnel table. */
  def streamingFunnel(spark: SparkSession, dir: String): DataFrame =
    streamingFunnelFrom(Tables(spark, dir).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type")))

  /** Same, over an arbitrary (event_id, ts, user_id, event_type)
    * relation (the multi-month regression spec feeds one). */
  def streamingFunnelFrom(ev: DataFrame): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val storeDir = Snapshots.storeDir(spark, "stream_funnel_store")
    val q = funnelAdvance(
      FileFeed.orderedStream(spark, ev, nChunks = 8,
        unix_micros(col("ts")), purpose = "funnel").as[FEvent])
      .writeStream.outputMode("update")
      .foreachBatch { (batch: Dataset[FunnelUpd], batchId: Long) =>
        funnelBatch(batch.toDF(), storeDir, batchId); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    funnelTable(spark, storeDir)
  }
}
