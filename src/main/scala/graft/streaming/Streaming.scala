package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming operators over the events stream (SURVEY §2
  * I1-I4), built so every transform is ONE function applied to either a
  * batch or a streaming DataFrame — the batch run is the oracle for the
  * streaming run (Structured Streaming's unified-API contract).
  *
  * Scale shape: windowed counts and sessionization shuffle on
  * (window/user) keys with watermark-bounded state; file streaming uses
  * source listing + checkpointed offsets, so a 1000-executor cluster
  * tails a 100 TB/day landing zone with per-microbatch parallelism.
  */
object Streaming {

  val SessionGapSec = 1800 // 30-minute inactivity gap

  /** I1: tumbling-window counts/sums per event type. The watermark
    * bounds state for streaming input and is a no-op on batch input. */
  def windowedCounts(events: DataFrame, windowDur: String = "5 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** I16: SLIDING-window aggregation — each event lands in
    * window/slide overlapping windows (here 2), the smoothing shape
    * dashboards ask for. Same single shuffle as the tumbling version;
    * the explode factor is the constant window/slide ratio. */
  def slidingCounts(events: DataFrame, windowDur: String = "10 minutes",
      slideDur: String = "5 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur, slideDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** I3: parse the JSON props column, keep high-k events. */
  def parseProps(events: DataFrame, minK: Int = 50): DataFrame =
    events
      .withColumn("k", from_json(col("props"), StructType.fromDDL("k int")).getField("k"))
      .filter(col("k") >= minK)
      .select(col("event_id"), col("user_id"), col("event_type"), col("k"))

  /** I2 (batch path / oracle): gaps-and-islands session ASSIGNMENT —
    * lag to mark session starts, running sum to number them, one
    * shuffle on user_id; every event keeps its columns plus
    * session_idx (the frame session-scoped analytics join against). */
  def sessionAssign(events: DataFrame, gapSec: Int = SessionGapSec): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gap = col("ts").cast("double") - lag(col("ts"), 1).over(byUser).cast("double")
    events
      .withColumn("new_s", when(gap.isNull || gap > gapSec, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessionsBatch(events: DataFrame, gapSec: Int = SessionGapSec): DataFrame =
    sessionAssign(events, gapSec)
      .groupBy("user_id", "session_idx")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** I2 (streaming path): the same session semantics as sessionsBatch,
    * held as per-user state in flatMapGroupsWithState. A session is
    * emitted when a gap closes it or the event-time timeout fires
    * (watermark passed start of a possible next event). */
  def sessionsStreaming(events: Dataset[Ev], gapSec: Int = SessionGapSec): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          def close(s: SessionState): Unit =
            out += Session(user, new Timestamp(s.start / 1000), new Timestamp(s.end / 1000),
              s.n, math.rint(s.sum * 100) / 100)
          if (it.isEmpty && state.hasTimedOut) {
            state.getOption.foreach(close)
            state.remove()
          } else {
            var cur = state.getOption.orNull
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val tUs = e.ts.getTime * 1000
              if (cur == null) cur = SessionState(tUs, tUs, 1, e.value)
              else if ((tUs - cur.end) / 1e6 > gapSec) { close(cur); cur = SessionState(tUs, tUs, 1, e.value) }
              else cur = SessionState(cur.start, math.max(cur.end, tUs), cur.n + 1, cur.sum + e.value)
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.end / 1000 + gapSec * 1000L)
            }
          }
          out.iterator
      }
  }

  /** I12 (streaming path): at-least-once → effectively-once dedup of an
    * event stream on its identity key (user, type, ts). The
    * WithinWatermark variant is the only shape that survives 100 TB/day:
    * plain dropDuplicates keeps every key ever seen in state, while this
    * one evicts identities older than the watermark — state is bounded
    * by (delay × arrival rate). Batch parity (the oracle face) is the
    * identity-grouped min-id representative in StreamQueries.evDedupe. */
  def dedupWithinWatermark(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ts")

  /** I5: click→purchase attribution join — the stream-stream interval
    * join pattern: for each click, purchases by the same user within
    * `windowSec` after the click. On streaming inputs both sides need
    * watermarks and the time bound keeps state finite; on batch inputs
    * the same function is a range join (the oracle). */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      windowSec: Int = 300): DataFrame =
    attributionJoinTyped(clicks, purchases, windowSec, "inner")

  /** I18: the OUTER face of the attribution join — clicks that led to
    * no purchase within the window survive with null purchase columns
    * (the unconverted-click feed a marketing pipeline actually wants).
    * On streaming inputs Spark holds the left row in state until the
    * watermark proves no matching right can still arrive, then emits
    * the null-padded row — the stream-stream outer-join semantics
    * pinned by StreamingSpec's parity test. */
  def attributionJoinTyped(clicks: DataFrame, purchases: DataFrame,
      windowSec: Int, joinType: String): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"), col("user_id"),
      col("ts").as("click_ts"))
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user_id"), col("ts").as("purchase_ts"), col("value"))
    c.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $windowSec SECONDS"),
        joinType)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  final case class AsofIn(user_id: Long, ts: Timestamp, kind: Int, id: Long, value: Double)
  final case class AsofState(rights: List[(Long, Long)], lefts: List[(Long, Long, Double)])
  final case class AsofMatch(user_id: Long, left_id: Long, left_ts: Timestamp,
      value: Double, right_id: Option[Long], right_ts: Option[Timestamp])

  /** I7 (streaming path): the as-of join with EventOps.asOfJoin's exact
    * semantics — each left event (kind 1) matched to the latest right
    * event (kind 0) at-or-before it, rights deduped per timestamp by
    * max id. A left is emitted only once the WATERMARK passes its
    * event time (no earlier right can still arrive), so late rights
    * within the allowed delay never produce a wrong match. State per
    * key: pending lefts + rights, pruned to rights that can still win
    * (everything after the watermark plus the single latest at-or-
    * before it) — bounded by the watermark delay, the condition any
    * 100 TB/day stream needs to hold state finite. */
  def asOfStreaming(events: Dataset[AsofIn]): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[AsofIn], state: GroupState[AsofState]) =>
          val s0 = state.getOption.getOrElse(AsofState(Nil, Nil))
          // merge new events; rights dedupe per ts by max id
          var rights = s0.rights
          var lefts = s0.lefts
          it.foreach { e =>
            val tMs = e.ts.getTime
            if (e.kind == 0) {
              val others = rights.filterNot(_._1 == tMs)
              val keep = (rights.collect { case (t, i) if t == tMs => i } :+ e.id).max
              rights = (tMs, keep) :: others
            } else lefts = (tMs, e.id, e.value) :: lefts
          }
          val wm = state.getCurrentWatermarkMs()
          val (mature, pending) = lefts.partition(_._1 <= wm)
          val out = mature.sortBy(l => (l._1, l._2)).map { case (t, id, v) =>
            val m = rights.filter(_._1 <= t) // <= : same-instant rights match
            if (m.isEmpty) AsofMatch(user, id, new Timestamp(t), v, None, None)
            else {
              val (rt, ri) = m.maxBy(r => (r._1, r._2))
              AsofMatch(user, id, new Timestamp(t), v, Some(ri), Some(new Timestamp(rt)))
            }
          }
          // prune rights: future lefts all have ts > wm, so only rights
          // after the watermark plus the latest at-or-before it can win
          val futureRights = rights.filter(_._1 > wm)
          val lastPast = rights.filter(_._1 <= wm) match {
            case Nil => Nil
            case past => List(past.maxBy(r => (r._1, r._2)))
          }
          if (pending.isEmpty && futureRights.isEmpty && lastPast.isEmpty) state.remove()
          else {
            state.update(AsofState(futureRights ++ lastPast, pending))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(_._1).min + 1)
          }
          out.iterator
      }
  }

  /** Kafka-shaped source abstraction: every transform in this module
    * takes the events schema (ts, event_type, value, …) and does not
    * care which source produced it — swap file/rate/socket/kafka by
    * changing ONLY the reader, the transforms are source-agnostic.
    * `shapeEvents` is the one shaping function from a raw
    * (timestamp, value) stream row into that schema. */
  def shapeEvents(raw: DataFrame): DataFrame =
    raw.select(col("timestamp").as("ts"),
      concat(lit("type_"), col("value") % 3).as("event_type"),
      (col("value") % 100).cast("double").as("value"))

  /** Rate source behind `shapeEvents` — the deterministic stand-in for
    * a Kafka topic (no broker in this container; the production wiring
    * is `format("kafka")` + the SAME shaping function, proving the
    * reader is the only part that changes). */
  def rateEvents(spark: SparkSession, rowsPerSecond: Int = 100): DataFrame =
    shapeEvents(spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load())

  final case class TypedEv(user_id: Long, ts: Timestamp, event_id: Long,
      event_type: String)
  final case class LastEv(tsMs: Long, id: Long, tpe: String)
  final case class Transition(user_id: Long, from_type: String, to_type: String)

  /** I13 (streaming path): incremental Markov transitions — each user's
    * state is just the LAST event seen (O(1) per user, the minimal
    * state a journey tracker can hold); every arriving event emits one
    * (from → to) pair. Within a batch events sort by (ts, id) — the
    * same total order the batch operator uses — and the downstream
    * count aggregation is the streaming-friendly half of
    * EventOps.transitionMatrix (probabilities are a batch-side
    * finishing touch over the counts).
    *
    * Cross-batch ordering: an O(1)-state journey tracker cannot
    * re-linearize an event that arrives in a LATER micro-batch with a
    * (ts, id) below the stored last event — the pinned semantics is to
    * DROP such within-watermark reorderings (emitting them would
    * fabricate a transition the batch operator's total order does not
    * contain). In-order arrival therefore reproduces the batch counts
    * exactly; late stragglers cost their one transition rather than
    * corrupting the matrix (StreamingSpec pins both cases). */
  def transitionsStreaming(events: Dataset[TypedEv]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[TypedEv], state: GroupState[LastEv]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          var last = state.getOption.orNull
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val before = last != null &&
              (e.ts.getTime < last.tsMs ||
                (e.ts.getTime == last.tsMs && e.event_id < last.id))
            if (!before) {
              if (last != null) out += Transition(user, last.tpe, e.event_type)
              last = LastEv(e.ts.getTime, e.event_id, e.event_type)
            }
          }
          if (last != null) state.update(last)
          out.iterator
      }
  }

  /** I20 (streaming face): distinct session-scoped event types from
    * CLOSED native session_windows — one row per (user, session
    * start, type) emitted when the watermark closes the session. The
    * market-basket finishing (`StreamQueries.cooccurFromSessions`)
    * runs batch over the emitted frame; the session start stands in
    * for the batch face's gaps-and-islands index (only the session
    * PARTITIONING feeds the pair counts, and I2's spec pins that the
    * two sessionizations agree). */
  def sessionTypesStreaming(events: DataFrame,
      gapSec: Int = SessionGapSec,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSec seconds").as("sw"))
      .agg(collect_set(col("event_type")).as("types"))
      .select(col("user_id"), col("sw.start").cast("long").as("session_id"),
        explode(col("types")).as("event_type"))

  /** I19 (streaming face): per-session summaries from CLOSED native
    * session_windows — one row per (user, session) on watermark
    * close. `session_end` subtracts the gap back out of the window's
    * upper bound (sw.end = last event + gap by definition), so the
    * emitted bounds equal the batch operator's (min ts, max ts)
    * EXACTLY (the I2 cross-validation pins the two sessionizations
    * agree). The per-user roll-up is the shared finishing
    * (`StreamQueries.sessionStatsFromSessions`) — the I13/I14
    * incremental-half / batch-finish split. */
  def sessionSummariesStreaming(events: DataFrame,
      gapSec: Int = SessionGapSec,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSec seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        (col("sw.end").cast("long") - gapSec).cast("timestamp")
          .as("session_end"),
        col("n_events"))

  /** I12 (streaming face): identity dedupe via the native
    * dropDuplicatesWithinWatermark — state holds one entry per
    * (user_id, event_type, ts) key and EXPIRES with the watermark
    * (a plain dropDuplicates on a stream is the unbounded-state trap;
    * within-watermark expiry is the production contract: replays
    * arrive near-real-time, so a bounded horizon suffices). The kept
    * row is the first ARRIVAL — deterministic in the key set but not
    * in the representative event_id, unlike the batch operator's
    * min-id rule; StreamingSpec pins the key-set parity and the
    * cross-batch suppression. */
  def dedupeStreaming(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ts")

  /** I11 (live face): flag anomalous hours AS THE STREAM RUNS by
    * scoring each watermark-closed hourly window against a
    * HISTORICAL per-type stats dim — the deployment shape where the
    * baseline comes from yesterday's corpus and the stream is today.
    * (The other I11 face streams the counts and finishes the z-pass
    * in batch — that one is retrospective; this one alerts live.)
    * The dim is per-type → tiny → broadcast; stream-static join
    * semantics re-read it per micro-batch, so refreshing the stats
    * table between triggers re-baselines the scoring without a query
    * restart. */
  def anomalyFlagsStreaming(events: DataFrame, stats: DataFrame,
      zThreshold: Double): DataFrame =
    EventOps.scoreAgainstStats(
      windowedCounts(events, windowDur = "1 hour")
        .select(col("window_start").as("hour"), col("event_type"),
          col("n_events").as("n")),
      stats, zThreshold)

  final case class Scd2State(tsMs: Long, id: Long, tpe: String, version: Int)
  final case class Scd2Closed(user_id: Long, event_id: Long,
    event_type: String, valid_from: Timestamp, valid_to: Timestamp,
    version: Int)

  /** I17 (streaming face): SCD Type-2 as a per-user state machine —
    * state is the one OPEN version (O(1) per user); each in-order
    * event CLOSES it, emitting the finished interval with its version
    * number, and opens the next. Append-mode output carries exactly
    * the batch operator's closed rows (valid_to NOT NULL) — the open
    * version lives only in state until its successor arrives, which
    * is what SCD2 means on an unbounded log. Out-of-order events
    * ((ts, id) below the open version) are DROPPED, the I13 late-data
    * convention: an O(1)-state tracker cannot re-linearize history.
    * Equal-ts events order by event_id, matching the batch (ts, id)
    * total order. */
  def scd2Streaming(events: Dataset[TypedEv]): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Closed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[TypedEv], state: GroupState[Scd2State]) =>
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Closed]
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            cur match {
              case None =>
                cur = Some(Scd2State(e.ts.getTime, e.event_id, e.event_type, 1))
              case Some(s) if e.ts.getTime > s.tsMs ||
                  (e.ts.getTime == s.tsMs && e.event_id > s.id) =>
                out += Scd2Closed(user, s.id, s.tpe,
                  new Timestamp(s.tsMs), e.ts, s.version)
                cur = Some(Scd2State(e.ts.getTime, e.event_id, e.event_type,
                  s.version + 1))
              case _ => // late straggler below the open version: drop
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  final case class StepHit(user_id: Long, step: Int)

  /** I8 (streaming face): the ordered funnel as a per-user state
    * machine — state is the array of first-qualifying anchor
    * timestamps per step (the batch operator's min-anchors, held
    * incrementally). An event of step i qualifies when step i−1's
    * anchor exists at-or-before it (first-touch semantics); a user's
    * FIRST completion of a step emits one StepHit, so the funnel
    * counts are a batch finishing touch over the hit stream
    * (`funnelFromHits`) — the I13/I14 split again. In-order arrival
    * reproduces the batch counts exactly (anchor decisions are final
    * in ts order — StreamingSpec pins the cross-batch parity);
    * within-watermark stragglers can still IMPROVE an anchor
    * (monotone decrease never invalidates downstream anchors), and
    * enablements they would have unlocked are dropped — the I13
    * late-data convention. State is O(#steps) longs per user. */
  def funnelStreaming(events: Dataset[TypedEv], steps: Seq[String]): Dataset[StepHit] = {
    import events.sparkSession.implicits._
    val stepOf = steps.zipWithIndex.toMap
    val n = steps.size
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Long], StepHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[TypedEv], state: GroupState[Array[Long]]) =>
          // Long.MaxValue = anchor unset
          val anchors = state.getOption.getOrElse(Array.fill(n)(Long.MaxValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[StepHit]
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            stepOf.get(e.event_type).foreach { i =>
              val t = e.ts.getTime
              val qualifies = i == 0 ||
                (anchors(i - 1) != Long.MaxValue && t >= anchors(i - 1))
              if (qualifies && t < anchors(i)) {
                if (anchors(i) == Long.MaxValue) out += StepHit(user, i)
                anchors(i) = t
              }
            }
          }
          state.update(anchors)
          out.iterator
      }
  }

  /** The funnel finishing count over emitted step hits: one row per
    * step with the user count (0 for never-reached steps), matching
    * EventOps.funnel's output shape. */
  def funnelFromHits(hits: DataFrame, steps: Seq[String]): DataFrame = {
    val spark = hits.sparkSession
    import spark.implicits._
    val idx = steps.zipWithIndex.map { case (s, i) => (i, i + 1, s) }
      .toDF("step0", "step", "event_type")
    idx.join(hits.groupBy(col("step").as("step0"))
        .agg(count(lit(1)).as("n_users")), Seq("step0"), "left")
      .select(col("step"), col("event_type"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /** I14 (streaming path): daily event-type counts as a 1-day tumbling
    * window with watermark-bounded state — the incremental half of the
    * daily top-k roll-up. The rank over ≤ #event-types rows per closed
    * day is a batch finishing touch (`dailyTopk`), the same
    * incremental-counts / batch-finish split as I13's transitions vs
    * probabilities. On batch input the watermark is a no-op and
    * window(1 day).start == date_trunc('day'), so ONE function serves
    * both faces. */
  def dailyCounts(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("day"), col("event_type"), col("n_events"))

  /** The finishing rank over daily counts: top-k event types per day
    * (deterministic tiebreak by type name). Shared by the batch query
    * (ev_daily_topk) and the streaming sink's closed windows. */
  def dailyTopk(daily: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("day")
      .orderBy(col("n_events").desc, col("event_type"))
    daily.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** I50 (streaming face): per-day seasonality CELLS as a 1-day
    * tumbling window keyed by (type, hour-of-day) — the incremental
    * half of the weekly-seasonality heatmap; watermark-bounded state,
    * one row per closed (day, type, hod) cell. Folding days onto the
    * (dow, hod) grid and the per-type share are a batch finishing
    * touch (`StreamQueries.seasonalityFromCells`) — the I13/I14
    * incremental-half / batch-finish split. On batch input the
    * watermark is a no-op and window(1 day).start ==
    * date_trunc('day'), so ONE function serves both faces. */
  def seasonalityCells(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"),
        hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("day"), col("event_type"), col("hod"),
        col("n"))

  final case class LateSt(lastId: Long, maxS: Long)
  final case class LatenessEv(user_id: Long, event_id: Long,
      event_type: String, lateness: Long)

  /** I49 (streaming face): per-event lateness behind the per-user
    * running max event-time — the incremental half of the
    * watermark-delay profile, with O(1) state per user (the last
    * arrival id + the running max seconds, the minimal state the
    * running max needs). Within a batch events sort by event_id (the
    * append order, same total order as the batch window); the
    * per-type percentile/share roll-up is a batch finishing touch
    * (`StreamQueries.latenessProfile`).
    *
    * Cross-batch ordering: as with I13's journey tracker, an event
    * arriving in a LATER micro-batch with an event_id below the
    * stored last id cannot be re-linearized by O(1) state and is
    * DROPPED (emitting it would use a running max the batch order
    * does not contain at that position). In-order arrival reproduces
    * the batch lateness rows exactly (StreamingSpec pins both). */
  def latenessStreaming(events: Dataset[TypedEv]): Dataset[LatenessEv] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LateSt, LatenessEv](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[TypedEv], state: GroupState[LateSt]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[LatenessEv]
          var st = state.getOption.getOrElse(LateSt(Long.MinValue, Long.MinValue))
          it.toSeq.sortBy(_.event_id).foreach { e =>
            if (e.event_id > st.lastId) {
              // ts.getTime is millis; integer division truncates like
              // the batch face's ts.cast("long") (epoch is positive)
              val s = e.ts.getTime / 1000L
              val m = math.max(st.maxS, s)
              out += LatenessEv(user, e.event_id, e.event_type, m - s)
              st = LateSt(e.event_id, m)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class GapSt(lastMs: Long, lastId: Long, lastS: Long)
  final case class GapEv(user_id: Long, event_id: Long, gap: Long)

  /** I48 (streaming face): per-user inter-event GAPS with O(1) state
    * (the last event's (ts, id) order key + its whole-second
    * timestamp) — the incremental half of the bot-cadence profile;
    * the all-integer per-user roll-up is the shared batch finish
    * (`StreamQueries.botSignalsFromGaps`). Within a batch events sort
    * by (ts, event_id) — the batch lag-window's total order; an event
    * arriving in a LATER micro-batch below the stored order key is
    * DROPPED (the I13 journey-tracker semantics: O(1) state cannot
    * re-linearize, and a fabricated gap would corrupt the cadence
    * variance). In-order arrival reproduces the batch gaps exactly
    * (StreamingSpec pins both cases). */
  def gapsStreaming(events: Dataset[TypedEv]): Dataset[GapEv] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapSt, GapEv](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[TypedEv], state: GroupState[GapSt]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[GapEv]
          var st = state.getOption.orNull
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val before = st != null &&
              (e.ts.getTime < st.lastMs ||
                (e.ts.getTime == st.lastMs && e.event_id < st.lastId))
            if (!before) {
              val s = e.ts.getTime / 1000L
              if (st != null) out += GapEv(user, e.event_id, s - st.lastS)
              st = GapSt(e.ts.getTime, e.event_id, s)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** I9 (streaming face): incremental weekly-active (user_id, week)
    * rows — a 7-day tumbling window keyed by user. `startTime` of 4
    * days aligns windows to MONDAYS (the epoch is a Thursday), so
    * `window.start` equals `date_trunc('week', ts)` exactly and the
    * batch operator's week keys match bit-for-bit. Each (user, week)
    * emits once on window close, watermark-bounded state; the
    * retention matrix is a batch finishing touch over the emitted
    * activity (EventOps.retentionFromActivity) against the cohort
    * dim, which rides stream-static — the same incremental-half /
    * batch-finish split as I13 transitions and I14 daily counts. */
  def weeklyActive(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "7 days", "7 days", "4 days").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("week"))

  /** I22: hourly approx-distinct users per event type — K2's
    * store-and-merge HLL cardinality shape run INSIDE the streaming
    * engine: a 1-hour tumbling window aggregates
    * `hll_sketch_agg(user_id)` with watermark-bounded state, so
    * per-window uniques cost O(sketch bytes) state per (hour, type)
    * instead of O(distinct users) — the only windowed-unique shape
    * that holds at 100 TB/day (an exact windowed distinct keeps every
    * user id in the state store). The sketch register array is a
    * per-register max — merge-order-independent — so cross-batch
    * state merges estimate identically to one batch pass. On batch
    * input the watermark is a no-op and window.start ==
    * date_trunc('hour'): one function, both faces. */
  def hourlyDistinctSketch(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(col("w.start").as("hour"), col("event_type"), col("sk"))

  /** I24: windowed heavy-hitter CANDIDATES through streaming state —
    * K9's mergeable Misra-Gries summary (`graft_topk`) per 1-hour
    * tumbling window and event type. The state store carries ≤ k
    * counters per (window, type) at ANY data volume — the only
    * windowed top-k shape that holds at 100 TB/day, where the exact
    * answer shuffles every (user, window) pair. Pairs with
    * [[hourlyDistinctSketch]] the way K9 pairs with K2: candidates
    * with guaranteed coverage (freq > N/k ⇒ present) rather than a
    * cardinality estimate. Works identically on batch inputs. */
  def hourlyTopKCandidates(events: DataFrame, k: Int,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(graft.functions.VectorFunctions.topk(events.sparkSession,
        col("user_id").cast("string"), k).as("cand"))
      .select(col("w.start").as("hour"), col("event_type"), col("cand"))

  /** I28: hourly THETA sketch of active users through streaming
    * state — the K16 shape the I22 HLL face cannot give: closed
    * per-window theta sketches support SET OPERATIONS downstream
    * (hour-over-hour user overlap = retention between adjacent
    * windows, estimated from two stored sketches without rejoining
    * raw ids). State per window is ≤ 2^lgK 8-byte hashes; the sketch
    * is a deterministic function of the window's user SET (sampling
    * keeps the k smallest hashes), so cross-batch state merges
    * estimate identically to one batch pass. On batch input the
    * watermark is a no-op: one function, both faces. */
  def hourlyThetaSketch(events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.VectorFunctions.theta(events.sparkSession,
        col("user_id").cast("string")).as("sk"))
      .select(col("w.start").as("hour"), col("sk"))

  /** The finishing estimate over closed sketch windows — shared by
    * the batch query and the streaming sink. */
  def distinctFromSketches(sk: DataFrame): DataFrame =
    sk.select(col("hour"), col("event_type"),
      hll_sketch_estimate(col("sk")).as("approx_users"))

  /** I15: stream-static enrichment join — the dimension lookup every
    * event pipeline does (user tier, device class, geo). The static
    * side is re-planned per micro-batch (so a refreshed dim table is
    * picked up) and broadcast: map-side hash lookup, no streaming
    * state, no shuffle of the stream — the only enrichment shape that
    * holds at 100 TB/day. Works identically on batch inputs. */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  /** I4 extension: idempotent foreachBatch sink — the exactly-once
    * pattern for sinks WITHOUT transactional support: output lands in
    * a per-batchId directory, committed by writing a marker file LAST;
    * a replayed batch (restart between sink write and checkpoint
    * commit — the at-least-once window) sees the marker and skips, so
    * downstream readers that require the marker never see duplicates.
    * This is the batchId-keyed idempotence contract foreachBatch sinks
    * to JDBC/KV stores implement with an upsert key; spelled here with
    * files so the semantics are testable hermetically. */
  def idempotentBatchSink(outDir: String)(df: DataFrame, batchId: Long): Unit = {
    val dir = new java.io.File(s"$outDir/batch_$batchId")
    val marker = new java.io.File(dir, "_COMMITTED")
    if (!marker.exists()) {
      df.write.mode("overwrite").parquet(dir.toString)
      marker.createNewFile()
    }
  }

  /** I4 extension (record-keyed): exactly-once MERGE sink keyed by
    * Kafka-shaped coordinates (topic, partition, offset) — the
    * upsert-key idempotence contract for non-transactional sinks at
    * RECORD granularity, where idempotentBatchSink works at BATCH
    * granularity. Insert-if-absent: a replayed micro-batch (the
    * restart at-least-once window) re-delivers keys already in the
    * store and no-ops, EVEN IF the replayed content differs — offsets
    * identify records, payload bytes do not; first write wins.
    * Read-existing-keys → anti-join → append-new-files is the portable
    * spelling of `MERGE WHEN NOT MATCHED THEN INSERT` (what a
    * Delta/Iceberg/JDBC sink does transactionally); the fresh rows are
    * materialized BEFORE the append so the write never scans the
    * directory it is extending. */
  def offsetMergeSink(storeDir: String,
      keyCols: Seq[String] = Seq("topic", "partition", "offset"))
      (df: DataFrame, batchId: Long): Unit = {
    val spark = df.sparkSession
    val hasData = Option(new java.io.File(storeDir).listFiles())
      .getOrElse(Array.empty).exists(_.getName.endsWith(".parquet"))
    val incoming = df.dropDuplicates(keyCols)
    val fresh = (if (hasData)
        incoming.join(spark.read.parquet(storeDir).select(keyCols.map(col): _*),
          keyCols, "left_anti")
      else incoming)
      .localCheckpoint(eager = true)
    if (!fresh.isEmpty) fresh.write.mode("append").parquet(storeDir)
  }

  /** Committed batches only — the reader side of the marker contract.
    * Before the FIRST commit lands there is no schema to read, so the
    * no-commits case returns a zero-column empty frame; callers that
    * poll must gate on `.isEmpty`/row count rather than selecting
    * columns from a possibly-pre-first-commit result. */
  def readCommittedBatches(spark: SparkSession, outDir: String): DataFrame = {
    val dirs = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && new java.io.File(d, "_COMMITTED").exists())
      .map(_.toString)
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs.toIndexedSeq: _*)
  }

  final case class LfEv(event_id: Long, user_id: Long, ts: Timestamp,
      value: Double, event_type: String)
  final case class LfState(n: Long, nPurch: Long, sum: Double)
  final case class LifetimeFeat(event_id: Long, user_id: Long, ts: Timestamp,
      n_prior: Long, n_prior_purchases: Long, prior_value_sum: Double)

  /** I29 (streaming path): point-in-time-correct lifetime features via
    * Spark 4's transformWithState / StatefulProcessor — each event is
    * enriched with its user's history STRICTLY BEFORE it (count, prior
    * purchase count, prior value sum), i.e. the leakage-free feature
    * join an ML training pipeline needs at serving parity. State is one
    * ValueState[(n, nPurch, sum)] per user — O(1) per key, no list
    * growth — through the RocksDB state store the API requires.
    * Batch face / oracle: EventOps.lifetimeFeatures (one window pass).
    * Within a micro-batch rows sort by (ts, event_id) — the same total
    * order the batch window uses; cross-batch order is the source's
    * append order, as with the other fMGWS faces. */
  class LifetimeFeatureProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, LfEv, LifetimeFeat] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[LfState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[LfState]("lifetime",
        org.apache.spark.sql.Encoders.product[LfState], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[LfEv],
        tv: TimerValues): Iterator[LifetimeFeat] = {
      var cur = if (state.exists()) state.get() else LfState(0L, 0L, 0.0)
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        // HALF_UP at 4 decimals — exactly Spark's round(), so the batch
        // parity holds even on .00005 representation ties
        val rounded = BigDecimal(cur.sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val f = LifetimeFeat(e.event_id, user, e.ts, cur.n, cur.nPurch, rounded)
        cur = LfState(cur.n + 1,
          cur.nPurch + (if (e.event_type == "purchase") 1L else 0L),
          cur.sum + e.value)
        f
      }
      state.update(cur)
      out.iterator
    }
  }

  /** I29 front door: requires the RocksDB state store provider (the
    * transformWithState contract); callers set
    * spark.sql.streaming.stateStore.providerClass before starting. */
  def lifetimeFeaturesStreaming(events: Dataset[LfEv]): Dataset[LifetimeFeat] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new LifetimeFeatureProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  final case class ThEv(event_id: Long, user_id: Long, ts: Timestamp)
  final case class Throttled(event_id: Long, user_id: Long, hour: Timestamp,
      seq: Long, admitted: Int)

  /** I32 (batch face / oracle): per-key rate capping — admit at most
    * `maxPerWindow` events per (user, clock hour), the abuse/API-quota
    * operator every event front door runs. Deterministic total order
    * (ts, event_id) decides WHICH events are admitted; every event is
    * emitted with its within-window sequence and the admitted flag
    * (the rejected stream is the abuse-audit feed, not a discard).
    * One window over (user, hour) — fine-grained keys, no skew pile-up
    * at 100 TB. */
  def throttleBatch(events: DataFrame, maxPerWindow: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("hour")).orderBy(col("ts"), col("event_id"))
    events.select(col("event_id"), col("user_id"), col("ts"),
        date_trunc("hour", col("ts")).as("hour"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .select(col("event_id"), col("user_id"), col("hour"), col("seq"),
        (col("seq") <= maxPerWindow).cast("int").as("admitted"))
  }

  /** I32 (streaming path): the same cap through transformWithState —
    * one ValueState[Long] counter per (user, hour) key, O(1) state per
    * key. Within a micro-batch rows sort by (ts, event_id) — the batch
    * face's total order — so single-batch parity is exact; across
    * batches the counter carries, admitting first-arrived (the
    * semantics a live rate limiter wants).
    *
    * State retirement is EVENT-TIME, not a processing-time TTL (r11
    * advisor + verdict): a timer at the hour's END fires once the
    * watermark passes it — at that point any further event for the
    * hour is late and dropped upstream, so the counter is provably
    * dead and cannot expire early under backfill/replay, where a
    * wall-clock TTL would silently reset a live counter whenever
    * processing lags event time by more than the TTL. Event-time mode
    * also makes test/pipeline termination structural: no-data
    * micro-batches occur only on watermark advances (which need data),
    * where the old ProcessingTime-TTL spelling churned empty commits
    * under processAllAvailable (the r11 18k-batch storm). */
  class ThrottleProcessor(max: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Long, Long), ThEv, Throttled] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("throttle_n",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: (Long, Long), rows: Iterator[ThEv],
        tv: TimerValues): Iterator[Throttled] = {
      val first = !count.exists()
      var n = if (first) 0L else count.get()
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        n += 1
        Throttled(e.event_id, e.user_id,
          new Timestamp(key._2), n, if (n <= max) 1 else 0)
      }
      count.update(n)
      // one timer per key lifetime, armed at the hour's close
      if (first) getHandle.registerTimer(key._2 + 3600000L)
      out.iterator
    }
    override def handleExpiredTimer(key: (Long, Long), tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Throttled] = {
      count.clear(); Iterator.empty
    }
  }

  /** I32 front door (requires the RocksDB state store provider, as
    * with the I29 face). Event-time mode needs a watermark on `ts`;
    * `watermarkDelay` is the caller's lateness allowance (0s keeps the
    * spec deterministic; production callers pass their real skew). */
  def throttleStreaming(events: Dataset[ThEv], maxPerWindow: Int,
      watermarkDelay: String = "0 seconds"): Dataset[Throttled] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(e =>
        (e.user_id, e.ts.getTime - math.floorMod(e.ts.getTime, 3600000L)))
      .transformWithState(new ThrottleProcessor(maxPerWindow),
        TimeMode.EventTime(), OutputMode.Append())
  }

  final case class CuIn(event_type: String, hour: Timestamp, n: Long)
  final case class CuOut(event_type: String, hour: Timestamp, n: Long,
      s_scaled: Long, alarm: Int)

  /** I40 (streaming path): ONLINE one-sided CUSUM over windowed
    * counts — the live flavor of StreamQueries.evCusum. The batch
    * face derives its reference level μ from the full history (a
    * luxury a stream doesn't have), so the online contract is the
    * textbook one: a FIXED reference passed as an exact rational
    * (refNum/refDen — e.g. yesterday's T and m), the recursion
    * S = max(0, S + den·n − num) in scaled integers (unit:
    * den·counts, the batch face's m-scaling), alarm when
    * S > alarmMeans·num. One ValueState[Long] per event_type — O(1)
    * state per key; rows sort by hour within a batch so single-batch
    * runs reproduce the batch recursion exactly and state carries the
    * running sum across micro-batches. */
  class CusumProcessor(refNum: Long, refDen: Long, alarmMeans: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, CuIn, CuOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var s: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      s = getHandle.getValueState[Long]("cusum_s",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[CuIn],
        tv: TimerValues): Iterator[CuOut] = {
      var cur = if (s.exists()) s.get() else 0L
      val out = rows.toSeq.sortBy(_.hour.getTime).map { r =>
        cur = math.max(0L, cur + refDen * r.n - refNum)
        CuOut(key, r.hour, r.n, cur,
          if (cur > alarmMeans * refNum) 1 else 0)
      }
      s.update(cur)
      out.iterator
    }
  }

  /** I40 front door (requires the RocksDB state store provider, as
    * with the other transformWithState faces). */
  def cusumStreaming(hourly: Dataset[CuIn], refNum: Long, refDen: Long,
      alarmMeans: Long = StreamQueries.CusumMeans): Dataset[CuOut] = {
    import hourly.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    hourly.groupByKey(_.event_type)
      .transformWithState(new CusumProcessor(refNum, refDen, alarmMeans),
        TimeMode.None(), OutputMode.Append())
  }

  /** I38: dead-letter split sink — every ingest front door needs the
    * invalid rows PRESERVED (the A11/A12 corrupt-tolerant discipline,
    * streaming flavor): one foreachBatch routes each micro-batch into
    * an accepted table and a dead-letter table, BOTH through the
    * snapshot store's batchId-idempotent commit. A true atomic
    * two-sink write does not exist in any streaming engine; this is
    * the production-standard convergent shape instead — a crash
    * between the two commits replays the batch, the already-committed
    * table no-ops on its batchId, the other catches up, and both
    * tables end exactly-once. Rejected rows carry the batchId for
    * audit joins. Usage:
    * `ds.writeStream.foreachBatch(Streaming.deadLetterSink("ok", "dlq", cond) _)`. */
  def deadLetterSink(okTable: String, deadTable: String,
      isValid: org.apache.spark.sql.Column)(df: DataFrame, batchId: Long): Unit = {
    // Null-safe routing: a NULL predicate (e.g. the validity expression
    // touches a null column) must land in the DEAD-LETTER table, not
    // vanish — filter(p) and filter(!p) both drop null-p rows, the one
    // loss a dead-letter sink exists to prevent.
    val ok = coalesce(isValid, lit(false))
    graft.store.SnapshotStore.commitStreamBatch(okTable, df.filter(ok), batchId)
    graft.store.SnapshotStore.commitStreamBatch(deadTable,
      df.filter(!ok).withColumn("batch_id", lit(batchId)), batchId)
    ()
  }

  /** A19/I38: the streaming WET face — the batch WET composition's
    * record selection as a file-stream front door (the production
    * ingest contract: a crawl drops WARC chunks into a landing dir and
    * the corpus advances exactly-once per micro-batch). The TRANSFORM
    * is the batch operator verbatim (`withWarcRecord` + the WET gate:
    * valid WARC ∧ response ∧ fetch not truncated), so stream ≡ batch
    * BY CONSTRUCTION and StreamingSpec pins it on a shared fixture
    * across micro-batches. Accepted records land in the corpus table
    * with the parse columns the downstream quality/dedup stages read
    * (doc_id, target_uri, payload, payload_md5); everything else —
    * garbage bytes, non-response types, truncated fetches — lands in
    * the dead-letter table with its parse evidence, through the same
    * batchId-idempotent two-table commit as [[deadLetterSink]].
    * Usage: `binRecords.writeStream.foreachBatch(
    *   Streaming.wetCorpusSink("corpus", "dlq") _)`. */
  def wetCorpusSink(corpusTable: String, deadTable: String)
      (df: DataFrame, batchId: Long): Unit = {
    val parsed = graft.sources.IngestQueries.withWarcRecord(df, "_bin")
      .select(col("doc_id"), col("valid_warc"), col("warc_type"),
        col("truncated"), col("target_uri"), col("payload_md5"),
        col("payload"))
    deadLetterSink(corpusTable, deadTable,
      col("valid_warc") === 1 && col("warc_type") === "response" &&
        col("truncated") === 0)(parsed, batchId)
  }

  /** I53: incremental corpus ADMISSION — the streaming continuation
    * of the A22 fetch gate: per micro-batch, admit only documents
    * whose CANONICAL URL and CONTENT FINGERPRINT are both unseen —
    * against the accumulated corpus table AND within the batch
    * (min-doc_id wins inside a batch; arrival order wins across
    * batches — the crawl-frontier contract). Expects rows already
    * carrying the stateless gate columns: (doc_id, canonical, fp,
    * ...payload). State is the corpus table itself — no streaming
    * state store: the dedup keys are unbounded (every URL ever seen),
    * which is exactly what a TABLE is for, and the anti-joins read a
    * snapshot whose size is the admitted corpus, not the crawl. A
    * replayed batch converges: its rows are already in the table, the
    * anti-joins empty the batch, and the batchId-idempotent commit
    * no-ops regardless. Usage:
    * `gated.writeStream.foreachBatch(Streaming.corpusAdmitSink("corpus") _)`. */
  def corpusAdmitSink(corpusTable: String)(df: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val inBatch = df
      .withColumn("__ru", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(col("canonical")).orderBy(col("doc_id"))))
      .withColumn("__rf", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("__ru") === 1 && col("__rf") === 1)
      .drop("__ru", "__rf")
    // each key gates INDEPENDENTLY (a doc that loses the URL race
    // still occupies its fingerprint's slot for the batch) —
    // deterministic and conservative: never admits a duplicate,
    // occasionally rejects a doc a strictly sequential scan would
    // keep. Cross-batch, the accumulated table plays the same role.
    val admitted = (
      if (graft.store.SnapshotStore.versions(corpusTable).isEmpty) inBatch
      else {
        val prior = graft.store.SnapshotStore.read(df.sparkSession, corpusTable)
        inBatch
          .join(prior.select(col("canonical")), Seq("canonical"), "left_anti")
          .join(prior.select(col("fp")), Seq("fp"), "left_anti")
      }).select(df.columns.map(col).toIndexedSeq: _*)
    graft.store.SnapshotStore.commitStreamBatch(corpusTable, admitted, batchId)
    ()
  }

  /** I54: the FULL fetch gate in the stream (r15 verdict #2) — A22's
    * entire gate composed per micro-batch, closing the I52→I53 chain's
    * gap (I53 admitted on dedup keys only; the production first mile
    * runs ALL the gates per micro-batch): A21 canonicalization → A20
    * robots REP verdict against a STATIC (host, robots) side input
    * (the stream-static enrichment shape — robots bodies are fetched
    * out-of-band and change on crawl-config cadence, not per event) →
    * G24 Gopher quality → E1 content fingerprint → first-fetch-wins
    * URL/fingerprint slots. Admitted rows land in the corpus table,
    * every rejected row in the dead-letter table WITH its gate
    * evidence (allowed / gopher_keep / url_unique / is_dup), and the
    * TWO TABLES TOGETHER are the crawl ledger: the cross-batch seen
    * set is corpus ∪ dead-letter, so a canonical URL or fingerprint is
    * occupied by its FIRST FETCH whether or not that fetch passed the
    * other gates — exactly the batch A22 semantics (url_unique/is_dup
    * are min-doc_id over ALL wet docs there, not over survivors), and
    * StreamingSpec pins stream ≡ batch corpus_keep on the shared WARC
    * fixture. Replay safety: the seen set reads the tables AS OF
    * BEFORE this batchId ([[graft.store.SnapshotStore.readBeforeStreamBatch]]),
    * so a replayed batch reclassifies identically and both
    * batchId-idempotent commits no-op. State is the corpus+ledger
    * tables themselves (the I53 call: dedup keys are unbounded, a
    * table is the right store); per batch the stateless gates are
    * per-row work and the admission is two anti-join-shaped marker
    * joins against a snapshot sized by the crawl ledger.
    * Input rows: (doc_id, url, text). Usage:
    * `wet.writeStream.foreachBatch(Streaming.corpusGateSink("corpus", "dlq", robots) _)`. */
  def corpusGateSink(corpusTable: String, deadTable: String,
      robots: DataFrame)(df: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val canon = df
      .withColumn("canonical",
        graft.sources.IngestQueries.canonicalUrl(col("url")))
      .withColumn("__host",
        regexp_extract(col("canonical"), "^[a-z]+://([^/:]+)", 1))
    val withAllowed = canon
      .join(broadcast(robots.select(col("host").as("__host"),
        col("robots").as("__robots"))), Seq("__host"), "left")
      .withColumn("allowed",
        graft.sources.IngestQueries.repAllowed(col("__robots"), col("canonical")))
      .drop("__host", "__robots")
    val gophered = graft.text.TextQueries.gopherRules(
        df.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("keep").as("gopher_keep"))
    // E1's exact fingerprint expression (whitespace-normalized md5)
    val fp = md5(regexp_replace(trim(col("text")), " +", " "))
    val slotted = withAllowed.join(gophered, "doc_id")
      .withColumn("fp", fp)
      .withColumn("__ru", row_number().over(
        Window.partitionBy(col("canonical")).orderBy(col("doc_id"))))
      .withColumn("__rf", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
    def seenMark(d: DataFrame, keyCol: String, m: String): DataFrame = {
      val seen = Seq(corpusTable, deadTable).flatMap(t =>
        graft.store.SnapshotStore.readBeforeStreamBatch(spark, t, batchId)
          .map(_.select(col(keyCol))))
      seen.reduceOption(_ unionAll _) match {
        case None => d.withColumn(m, lit(0))
        case Some(s) =>
          d.join(s.distinct().withColumn(m, lit(1)), Seq(keyCol), "left")
            .withColumn(m, coalesce(col(m), lit(0)))
      }
    }
    val marked = seenMark(seenMark(slotted, "canonical", "__su"), "fp", "__sf")
    val out = marked
      .withColumn("url_unique",
        (col("__ru") === 1 && col("__su") === 0).cast("int"))
      .withColumn("is_dup",
        (col("__rf") > 1 || col("__sf") === 1).cast("int"))
      .withColumn("corpus_keep",
        (col("allowed") === 1 && col("url_unique") === 1 &&
          col("gopher_keep") === 1 && col("is_dup") === 0).cast("int"))
      .drop("__ru", "__rf", "__su", "__sf")
    deadLetterSink(corpusTable, deadTable,
      col("corpus_keep") === 1)(out, batchId)
  }

  /** I55: streaming PERCEPTUAL image admission — the crawl's image
    * first mile (the I53 shape with a DISTANCE predicate instead of
    * key equality): per micro-batch admit only images with no dHash
    * near-duplicate (Hamming ≤ threshold) in the accumulated corpus
    * OR among smaller-ids in the batch. Expects rows already carrying
    * the stateless H42 band columns (doc_id, b0..b3, ...payload) —
    * the I53 convention. Near-dup checks block on threshold+1 = 7
    * SUB-bands of the 64-bit hash (never all-pairs), then
    * Hamming-verify — NOT the four 16-bit storage bands: those
    * guarantee a shared band only up to distance 3 (pigeonhole over 4
    * bands), and this sink takes ARBITRARY external hashes whose bit
    * differences spread anywhere, so a distance-4..6 pair could share
    * no 16-bit band and be wrongly admitted (r16 review). Both the
    * within-batch and the against-corpus checks use the sub-band
    * blocking. The within-batch rule is min-id-threatens: a doc is
    * rejected iff a SMALLER-id batch doc sits within the threshold —
    * deterministic, and no two admitted docs can be near-dups of each
    * other (if y admits, no smaller id is within t of y); like I53's
    * independent slots it can reject a doc a strictly sequential scan
    * would keep (a rejected middle link still shields its neighbors)
    * — never the reverse. State is the corpus table (unbounded hash
    * history); replay-safe: the corpus side reads AS OF BEFORE this
    * batchId and the commit is batchId-idempotent. Usage:
    * `banded.writeStream.foreachBatch(Streaming.dhashAdmitSink("img_corpus") _)`. */
  def dhashAdmitSink(corpusTable: String,
      threshold: Int = graft.multimodal.Multimodal.DHashThreshold)
      (df: DataFrame, batchId: Long): Unit = {
    val spark = df.sparkSession
    val nBands = threshold + 1
    def bandsOf(d: DataFrame): DataFrame = {
      val subs = graft.multimodal.Multimodal.dhashSubBands(
        (0 until 4).map(b => col(s"b$b")), nBands)
      (0 until nBands).map(j =>
        d.select(col("doc_id"), lit(j).as("bi"), subs(j).as("bv")))
        .reduce(_ unionAll _)
    }
    def hamming(pfx: String): org.apache.spark.sql.Column =
      graft.multimodal.Multimodal.dhashHamming(
        (0 until 4).map(b => col(s"b$b")), (0 until 4).map(b => col(s"$pfx$b")))
    val mine = df.select(col("doc_id") +:
      (0 until 4).map(b => col(s"b$b")): _*).localCheckpoint(true)
    def rejectedBy(other: DataFrame, smallerIdOnly: Boolean): DataFrame = {
      val cand = bandsOf(mine).select(col("doc_id"), col("bi"), col("bv"))
        .join(bandsOf(other).select(col("doc_id").as("oid"), col("bi"), col("bv")),
          Seq("bi", "bv"))
        .filter(if (smallerIdOnly) col("oid") < col("doc_id")
          else col("oid") =!= col("doc_id"))
        .select("doc_id", "oid").distinct()
      cand
        .join(mine, "doc_id")
        .join(other.select(col("doc_id").as("oid") +:
          (0 until 4).map(b => col(s"b$b").as(s"o$b")): _*), "oid")
        .filter(hamming("o") <= threshold)
        .select("doc_id").distinct()
    }
    val inBatch = rejectedBy(mine, smallerIdOnly = true)
    val rejected = graft.store.SnapshotStore
      .readBeforeStreamBatch(spark, corpusTable, batchId) match {
        case None => inBatch
        case Some(prior) =>
          inBatch.unionAll(rejectedBy(prior, smallerIdOnly = false))
      }
    val admitted = df.join(rejected.distinct(), Seq("doc_id"), "left_anti")
    graft.store.SnapshotStore.commitStreamBatch(corpusTable, admitted, batchId)
    ()
  }

  /** I56: streaming PERPLEXITY gate — the CCNet quality filter run in
    * the crawl's first mile: every micro-batch's documents are scored
    * under a FIXED pre-trained Kneser-Ney LM (the G54 model as a
    * STATIC side input — production trains the LM on the clean
    * in-domain corpus, then scores the stream; re-training per batch
    * would let the stream drift the filter) and split at a surprise
    * threshold: in-distribution text → corpus, high-perplexity tail →
    * dead letter WITH its score (the tail is audited/down-sampled,
    * never silently vanished — the I38 contract). Documents too short
    * to score (no bigram) dead-letter with a NULL score rather than
    * riding a NULL predicate into the void. Scoring is per-document
    * arithmetic against broadcast-scale model frames, so stream ≡
    * batch values by construction and the per-batch cost is one model
    * join over the batch, no state store — the model IS the state,
    * and it's read-only. Replay-safe: both commits are
    * batchId-idempotent. Usage:
    * `docs.writeStream.foreachBatch(Streaming.perplexityGateSink(
    *   "corpus", "dlq", model, threshold) _)`. */
  def perplexityGateSink(corpusTable: String, deadTable: String,
      model: graft.text.TextQueries.KnModel, threshold: Double)
      (df: DataFrame, batchId: Long): Unit = {
    val scored = graft.text.TextQueries.knScoreAgainst(
      df.select(col("doc_id"), col("text")), model)
    // materialize the scored batch ONCE: the two commits below are two
    // actions, and an uncached plan would run the scoring join twice
    // per micro-batch (r16 review)
    val flagged = df.join(
      scored.select(col("doc_id"), col("kn_surprise")), Seq("doc_id"), "left")
      .localCheckpoint(true)
    // row-class completeness (the I38 NULL lesson): admit is made
    // NULL-free so filter(admit) / filter(!admit) partition the batch
    val admit = coalesce(col("kn_surprise") <= threshold, lit(false))
    graft.store.SnapshotStore.commitStreamBatch(
      corpusTable, flagged.filter(admit), batchId)
    graft.store.SnapshotStore.commitStreamBatch(
      deadTable, flagged.filter(!admit), batchId)
    ()
  }

  /** I61 (r19): streaming CLASSIFIER admission — the G59 hashed
    * linear quality classifier run in the ingest first mile, which is
    * exactly where FineWeb-Edu/DCLM deploy theirs: score at crawl
    * time, keep-or-dead-letter before anything lands in the lake.
    * Stateless (the model is frozen; hashing makes the weight table
    * arithmetic, so there is nothing to broadcast, join, or keep in
    * state), scored by the SAME kernel as the batch face
    * (TextQueries.classifierScored — stream ≡ batch by construction),
    * split at keep, both sides committed batchId-idempotently with
    * the full evidence row (score, n_feats, avg_wgt — the I38 audit
    * contract). */
  def classifierGateSink(corpusTable: String, deadTable: String)(
      df: DataFrame, batchId: Long): Unit = {
    val scored = graft.text.TextQueries.classifierScored(
      df.select(col("doc_id"), col("text")))
    // one materialization: the two commits below are two actions
    val flagged = df.join(
      scored.select(col("doc_id"), col("score"), col("n_feats"),
        col("avg_wgt"), col("keep")), Seq("doc_id"), "left")
      .localCheckpoint(true)
    val admit = coalesce(col("keep") === 1, lit(false))
    graft.store.SnapshotStore.commitStreamBatch(
      corpusTable, flagged.filter(admit), batchId)
    graft.store.SnapshotStore.commitStreamBatch(
      deadTable, flagged.filter(!admit), batchId)
    ()
  }

  /** I58: streaming CROSS-MODAL admission — the H44 CLIP-score gate
    * run in the ingest first mile (where LAION actually ran it: score
    * at crawl time, never store unaligned pairs): every micro-batch's
    * (image, caption) rows are scored by the SAME column expression
    * the batch face uses (Multimodal.clipScoreCol — per-pair
    * projection arithmetic, so stream ≡ batch values by construction,
    * the knScoreAgainst discipline) and split at the threshold:
    * aligned pairs → corpus, misaligned → dead letter WITH the score
    * (the I38 audit contract). No state store — the score depends
    * only on the pair itself. Replay-safe: both commits are
    * batchId-idempotent. Usage:
    * `pairs.writeStream.foreachBatch(Streaming.clipGateSink(
    *   "mm_corpus", "mm_dlq") _)`. */
  def clipGateSink(corpusTable: String, deadTable: String,
      threshold: Double = graft.multimodal.Multimodal.ClipThreshold)
      (df: DataFrame, batchId: Long): Unit = {
    val flagged = df.withColumn("clip_score",
      graft.multimodal.Multimodal.clipScoreCol(col("doc_id")))
      .localCheckpoint(true)
    val admit = col("clip_score") >= threshold
    graft.store.SnapshotStore.commitStreamBatch(
      corpusTable, flagged.filter(admit), batchId)
    graft.store.SnapshotStore.commitStreamBatch(
      deadTable, flagged.filter(!admit), batchId)
    ()
  }

  /** I57: streaming JOIN-MV maintenance — the stream lands in the
    * lake and the K58 join view advances by delta propagation in the
    * SAME foreachBatch: after every batch the MV is exactly
    * join(committed fact, dim), without the view ever re-running the
    * old-fact ⋈ dim bulk. Replay converges through the STORE's
    * idempotence, not sink logic: a replayed batchId's commit no-ops,
    * so refreshJoin sees no new files and appends nothing. A dim
    * UPDATE (overwrite) between batches breaks the append-only subset
    * relation and the next batch's refresh rebuilds full — the MV is
    * correct under both regimes, incremental under the common one.
    * This is the streaming star-schema shape (events ⋈ dimension kept
    * queryable as a table) without a stream-stream state store: the
    * lake IS the state. Usage:
    * `facts.writeStream.foreachBatch(
    *   Streaming.joinMvSink("facts", "dim", "facts_mv", Seq("k")) _)`. */
  def joinMvSink(factTable: String, dimTable: String, mvTable: String,
      joinKeys: Seq[String])(df: DataFrame, batchId: Long): Unit = {
    graft.store.SnapshotStore.commitStreamBatch(factTable, df, batchId)
    graft.store.IncrementalView.refreshJoin(df.sparkSession,
      factTable, dimTable, mvTable, joinKeys)
    ()
  }

  final case class SsEv(user_id: Long, ts: Timestamp)
  final case class SessState(startMs: Long, lastMs: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, closed_by: String)

  /** I33: sessionization with EVENT-TIME TIMERS — the push half of the
    * session operator family. I2's session_window closes a session
    * only when later data for the SAME aggregation arrives; a
    * timer-armed StatefulProcessor instead emits the moment the
    * WATERMARK passes last-event + gap, whether or not the key ever
    * speaks again — the "user went quiet, fire the abandoned-cart
    * event" shape that windowed aggregation cannot express. Two close
    * paths, mutually exclusive by construction: an in-batch event
    * beyond the gap closes inline (and re-arms), and the timer closes
    * quiet keys (each arm deletes the previous timer, so a session
    * closes exactly once). State is one ValueState[SessState] per key
    * — O(1), RocksDB-backed; timers are engine-managed per key, so at
    * 100 TB the cost profile equals the session_window aggregation it
    * parities (StreamingSpec pins closed sessions ≡ the batch
    * gap-split sessionization). */
  class SessionTimerProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, SsEv, ClosedSession] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[SessState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState]("session",
        org.apache.spark.sql.Encoders.product[SessState], TTLConfig.NONE)
    private def closed(user: Long, s: SessState, by: String) =
      ClosedSession(user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, by)
    override def handleInputRows(user: Long, rows: Iterator[SsEv],
        tv: TimerValues): Iterator[ClosedSession] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      var cur = if (state.exists()) Some(state.get()) else None
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur = cur match {
          case Some(s) if t - s.lastMs > gapMs =>
            out += closed(user, s, "gap"); Some(SessState(t, t, 1L))
          case Some(s) =>
            Some(SessState(s.startMs, math.max(s.lastMs, t), s.n + 1))
          case None => Some(SessState(t, t, 1L))
        }
      }
      cur.foreach { s =>
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(s.lastMs + gapMs)
        state.update(s)
      }
      out.iterator
    }
    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (state.exists()) {
        val s = state.get()
        // guard against a stale timer surviving a re-arm race: only the
        // timer matching the CURRENT session end may close it
        if (info.getExpiryTimeInMs >= s.lastMs + gapMs) {
          state.clear(); Iterator.single(closed(user, s, "timeout"))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** I33 front door (RocksDB state store + a watermark on `ts`
    * required — TimeMode.EventTime drives timer expiry off it).
    * `watermarkDelay` is the caller's out-of-order allowance (r11
    * advisor): 0s keeps the spec deterministic, production callers
    * pass their real arrival skew so cross-batch stragglers are not
    * silently dropped before sessionization. */
  def sessionTimeoutStreaming(events: Dataset[SsEv], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** I4: checkpointed file-stream → parquet sink. Returns the running
    * query; callers own its lifecycle. */
  def fileStreamToParquet(spark: SparkSession, srcDir: String, schema: StructType,
      format: String, outDir: String, checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(schema)
      .format(format)
      .load(srcDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
