package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-analytics operators beyond the windows/sessions family:
  * as-of join and ordered funnel (SURVEY §2 I6-I7).
  *
  * Scale notes:
  *  - asOfJoin is the UNION + running-last formulation, not a range
  *    join: both sides shuffle ONCE on the partition key and a single
  *    window pass computes the match, so cost is O(events log events)
  *    per user-partition regardless of how many right-rows precede
  *    each left row. A range-predicate join (the naive formulation)
  *    multiplies candidates before filtering — at 100 TB that's the
  *    difference between one sort and a quadratic blow-up on hot keys.
  *  - funnel is K chained aggregate+join rounds (K = #steps, small
  *    constant); every round is keyed on user_id so AQE can coalesce
  *    and skew-split. The per-step frames are narrow (user_id, ts).
  */
object EventOps {

  /** As-of join: for each LEFT event (e.g. purchase), the most recent
    * RIGHT event (e.g. click) of the same `keyCol` with right.ts <=
    * left.ts. Right rows are first deduped to one per (key, ts) by max
    * id — ties on ts are otherwise ambiguous — and ties between a left
    * and right row at the same ts count as matched (<=).
    *
    * Returns left (key, id, ts, value) + matched (right_id, right_ts),
    * nulls when no prior right event exists. */
  def asOfJoin(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val k = col(keyCol)
    val idType = left.schema(idCol).dataType
    val valueType = left.schema(valueCol).dataType
    // one right row per (key, ts): max id wins (deterministic)
    val r = right.groupBy(k.as("key"), col(tsCol).as("ts"))
      .agg(max(col(idCol)).as("right_id"))
      .select(col("key"), col("ts"), lit(0).as("kind"),
        col("right_id"), lit(null).cast(idType).as("left_id"),
        lit(null).cast(valueType).as("value"))
    val l = left.select(k.as("key"), col(tsCol).as("ts"), lit(1).as("kind"),
      lit(null).cast(right.schema(idCol).dataType).as("right_id"),
      col(idCol).as("left_id"),
      col(valueCol).as("value"))
    // kind orders right rows BEFORE left rows on equal ts, so a
    // same-instant right event is visible to the left row (<=); the
    // trailing left_id term makes the frame order total, hence the
    // running last_value deterministic
    val w = Window.partitionBy("key")
      .orderBy(col("ts"), col("kind"), col("left_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionAll(l)
      .withColumn("asof_right_id", last(col("right_id"), ignoreNulls = true).over(w))
      .withColumn("asof_right_ts",
        last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("key").as(keyCol), col("left_id"), col("ts").as("left_ts"),
        col("value"), col("asof_right_id").as("right_id"),
        col("asof_right_ts").as("right_ts"))
  }

  /** Cohort retention matrix: users grouped by the week of their FIRST
    * `cohortType` event; cell (cohort_week, week_offset) counts
    * distinct cohort users with ANY event in that later week. Two
    * shuffles (cohort agg, cell agg) + one user-keyed join; activity
    * dedups to (user, week) before the join so the cell count is a
    * plain count. Week arithmetic is epoch-second division — both
    * engines truncate weeks to Monday, so offsets are exact ints. */
  def retention(events: DataFrame, cohortType: String,
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val active = events
      .select(col(keyCol), date_trunc("week", col(tsCol)).as("week"))
      .distinct()
    retentionFromActivity(active,
      cohortWeeks(events, cohortType, keyCol, tsCol, typeCol), keyCol)
  }

  /** The cohort dimension: user → week of their FIRST `cohortType`
    * event. In the streaming face this is the slowly-updating
    * stream-static dim (recomputed on whatever cadence the cohort
    * definition changes, re-planned per micro-batch — the I15 shape). */
  def cohortWeeks(events: DataFrame, cohortType: String,
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame =
    events.filter(col(typeCol) === cohortType)
      .groupBy(col(keyCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))

  /** Retention finishing: cells from a distinct (user, week) activity
    * frame × the cohort dim — shared by the batch operator above and
    * the streaming face (Streaming.weeklyActive emits the activity
    * incrementally; StreamingSpec proves the parity). Callers on the
    * streaming side pass `broadcast(cohorts)` so the per-micro-batch
    * join is a map-side lookup. */
  def retentionFromActivity(active: DataFrame, cohorts: DataFrame,
      keyCol: String = "user_id"): DataFrame =
    active.join(cohorts, keyCol)
      .filter(col("week") >= col("cohort_week"))
      .groupBy(col("cohort_week"),
        ((unix_timestamp(col("week")) - unix_timestamp(col("cohort_week")))
          / 604800L).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))

  /** Ordered funnel: users counted at step i must have performed step
    * i's event type AT OR AFTER their first qualifying step i-1 event
    * (first-touch semantics: each step's anchor is the MIN qualifying
    * ts). Returns (step, event_type, n_users), one row per step.
    *
    * All K step counts are assembled IN ONE PLAN: each step's anchor
    * frame reduces to a single-row aggregate and the K rows union —
    * one job, K leaf scans (r6 verdict: the old form ran K serialized
    * driver count() actions and built the result on the driver). Each
    * anchor subtree appears twice (its own count + the next step's
    * join), but both occurrences canonicalize identically so the
    * shuffle is planned once and reused (ReuseExchange). */
  def funnel(events: DataFrame, steps: Seq[String],
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // anchor(1) = min ts of step-1 events per user
    var anchors = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol).as("key")).agg(min(col(tsCol)).as("t"))
    def stepRow(step: Int, tpe: String, frame: DataFrame): DataFrame =
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(tpe).as("event_type"), col("n_users"))
    var rows = Vector(stepRow(1, steps.head, anchors))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      anchors = events.filter(col(typeCol) === step)
        .join(anchors, col(keyCol) === col("key"))
        .filter(col(tsCol) >= col("t"))
        .groupBy(col("key")).agg(min(col(tsCol)).as("t"))
      rows :+= stepRow(i + 1, step, anchors)
    }
    rows.reduce(_ unionAll _)
  }

  /** SCD/CDC compaction: the LATEST record per key from an update log —
    * the periodic merge job every change-data-capture pipeline runs.
    * One row_number window = a single shuffle on the key; at 100 TB
    * this runs over a date-partitioned log where only partitions newer
    * than the last compaction are scanned. Ordering is (ts DESC,
    * id DESC) so equal-timestamp updates resolve deterministically. */
  def latestByKey(log: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col(idCol).desc)
    log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** I17: SCD Type-2 interval building — the companion of I10's
    * latest-per-key compaction: EVERY update becomes a versioned row
    * with [valid_from, valid_to) bounds and a current flag (valid_to
    * null on the open interval). One lead + row_number window per key
    * = a single shuffle on the key — the dimension-history builder a
    * warehouse runs over its CDC log (at 100 TB: date-partitioned log,
    * only post-watermark partitions rebuild). Ordering is made total
    * by (ts, id) so equal-timestamp updates version deterministically. */
  def scd2(log: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    log
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }

  /** Markov transition matrix over each user's event-type journey:
    * counts of consecutive (from → to) event-type pairs plus the
    * per-from transition probability. One window pass (shuffle on the
    * user key) + one small aggregation — the next-event ordering is
    * made total by (ts, id) so equal-timestamp events transition
    * deterministically in both engines. At 100 TB the window shuffles
    * once on user_id (same key the session/funnel family uses, so a
    * bucketed event log serves all of them exchange-free). */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val wf = Window.partitionBy("from_type")
    pairs
      .withColumn("prob", round(
        col("n_transitions").cast("double") / sum("n_transitions").over(wf), 4))
      .select(col("from_type"), col("to_type"), col("n_transitions"), col("prob"))
  }

  /** Hourly volume anomalies per event type: hours whose count deviates
    * from the type's mean by >= `zThreshold` sample standard deviations.
    * Mean/variance are computed from EXACT integer sums (sum n, sum n²)
    * rather than streaming avg/stddev aggregates, so the float result
    * is a fixed expression over exact inputs — deterministic across
    * engines and accumulation orders (the property the DuckDB oracle
    * relies on). Two narrow aggregations + one broadcast join. */
  def hourlyAnomalies(events: DataFrame, zThreshold: Double,
      tsCol: String = "ts", typeCol: String = "event_type"): DataFrame =
    anomaliesFromHourly(
      events.groupBy(date_trunc("hour", col(tsCol)).as("hour"), col(typeCol))
        .agg(count(lit(1)).as("n")),
      zThreshold, typeCol)

  /** The z-score finishing half over PRE-AGGREGATED hourly counts —
    * shared by the batch query and the streaming face (hourly counts
    * maintained incrementally by a 1-hour tumbling window with
    * watermark; the global per-type stats are a batch pass over the
    * closed windows, the same incremental-counts / batch-finish split
    * as daily top-k). */
  def anomaliesFromHourly(hourly: DataFrame, zThreshold: Double,
      typeCol: String = "event_type"): DataFrame =
    scoreAgainstStats(hourly, hourlyStats(hourly, typeCol), zThreshold, typeCol)

  /** Per-type mean/sd over an hourly count frame — the STATS DIM half
    * of anomaly detection, factored out so it can also be built from
    * HISTORY and broadcast under a live stream (Streaming
    * .anomalyFlagsStreaming). Exact integer sums (sum n, sum n²), so
    * the float result is a fixed expression over exact inputs —
    * deterministic across engines and accumulation orders. */
  def hourlyStats(hourly: DataFrame,
      typeCol: String = "event_type"): DataFrame =
    hourly.groupBy(col(typeCol).as("t"))
      .agg(sum(col("n")).as("s1"), sum(col("n") * col("n")).as("s2"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      // greatest(0, ·) absorbs a float-cancellation tiny-negative; the
      // sd > 0 filter below then drops constant series identically in
      // both engines (avoids cross-engine x/0 and sqrt(<0) semantics)
      .select(col("t"), (col("s1").cast("double") / col("cnt")).as("mean_n"),
        sqrt(greatest(lit(0.0),
          (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("cnt"))
            / (col("cnt") - lit(1)))).as("sd_n"))
      .filter(col("sd_n") > 0)

  /** The scoring half: flag hours whose count deviates ≥ zThreshold
    * sample standard deviations from the type's stats. The stats side
    * is per-type → always small → broadcast; under a stream-static
    * join the dim re-reads per micro-batch, so a refreshed stats table
    * is picked up without restarting the query. */
  def scoreAgainstStats(hourly: DataFrame, stats: DataFrame,
      zThreshold: Double, typeCol: String = "event_type"): DataFrame =
    hourly.join(broadcast(stats), col(typeCol) === col("t"))
      .withColumn("z", (col("n") - col("mean_n")) / col("sd_n"))
      .filter(abs(col("z")) >= zThreshold)
      .select(col(typeCol), col("hour"), col("n"), round(col("z"), 4).as("z"))

  /** I29 (batch face): point-in-time-correct lifetime features — each
    * event enriched with its user's history STRICTLY BEFORE it (event
    * count, prior purchase count, prior value sum). The leakage-free
    * "as-of feature join" of an ML training pipeline, spelled as ONE
    * user-keyed window with a [unbounded, -1) frame: a single shuffle
    * on user_id, one sort per partition, incremental frame evaluation
    * — O(n log n) per user regardless of history depth, vs the naive
    * self-join that re-scans each user's past per event. Streaming
    * parity: Streaming.lifetimeFeaturesStreaming (transformWithState,
    * O(1) state per user). (ts, event_id) makes the order total, so
    * the running sum is deterministic cross-engine. */
  def lifetimeFeatures(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("n_prior", count(lit(1)).over(w))
      .withColumn("n_prior_purchases",
        count(when(col("event_type") === "purchase", 1)).over(w))
      .withColumn("prior_value_sum",
        round(coalesce(sum(col("value")).over(w), lit(0.0)), 4))
      .select("event_id", "user_id", "ts", "n_prior", "n_prior_purchases",
        "prior_value_sum")
  }
}
