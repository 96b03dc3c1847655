package graft.streaming

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.Tables

/** Driver-facing streaming queries (SURVEY §2 I1-I3), run through the
  * BATCH side of the unified API — semantics identical to the
  * streaming side (StreamingSpec proves session parity on the real
  * flatMapGroupsWithState path).
  */
object StreamQueries {

  def evWindowed(spark: SparkSession, dir: String): DataFrame =
    Streaming.windowedCounts(Tables.events(spark, dir))

  def evSessions(spark: SparkSession, dir: String): DataFrame =
    Streaming.sessionsBatch(Tables.events(spark, dir))

  /** I16: sliding-window counts (10-minute windows every 5 minutes). */
  def evSliding(spark: SparkSession, dir: String): DataFrame =
    Streaming.slidingCounts(Tables.events(spark, dir))

  /** I19: per-user session summary — session count, event volume, and
    * average session duration over the I2 sessionization (the
    * engagement roll-up a product dashboard reads). Durations are
    * exact epoch-second ints, so the avg is exact-integer-sum /
    * count — deterministic cross-engine; round(4) formats. */
  def evSessionStats(spark: SparkSession, dir: String): DataFrame =
    sessionStatsFromSessions(
      Streaming.sessionsBatch(Tables.events(spark, dir)))

  /** Shared I19 finishing: the per-user roll-up over per-session rows
    * from EITHER face (batch gaps-and-islands or closed native
    * session_windows — their bounds agree exactly, the I2 pin).
    * Durations are exact epoch-second ints; the avg is exact-sum /
    * count, rounded at 4. */
  def sessionStatsFromSessions(sessions: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("total_events"),
        max(col("n_events")).as("max_session_events"),
        round(avg(unix_timestamp(col("session_end"))
          - unix_timestamp(col("session_start"))), 4).as("avg_session_sec"))
  }

  def evProps(spark: SparkSession, dir: String): DataFrame =
    Streaming.parseProps(Tables.events(spark, dir))

  def evAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    Streaming.attributionJoin(
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "click"),
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase"))
  }

  /** I24: MULTI-touch attribution — the position-based credit models
    * marketing runs on top of I5's pair stream: per purchase, every
    * contributing click gets (a) a linear 1/n share and (b) the
    * U-shaped split (40% first touch, 40% last, middles share the
    * 20%; n=1 → 100%, n=2 → 50/50 — conventions pinned here and in
    * the oracle). Click order within a purchase is (click_ts,
    * click_id) — fully deterministic. Shares are IEEE divisions of
    * small exact ints, identical cross-engine, rounded at 6. One
    * window over the attribution pairs, partitioned by purchase —
    * groups are bounded by clicks-per-purchase-window, never
    * corpus-wide. */
  def evMultiTouch(spark: SparkSession, dir: String): DataFrame =
    multiTouchShares(evAttribution(spark, dir))

  /** The share computation over any (user_id, purchase_id, click_id,
    * click_ts) pair frame — split out so the conventions are
    * fixture-testable (EventOpsSpec). */
  def multiTouchShares(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("purchase_id").orderBy(col("click_ts"), col("click_id"))
    val full = org.apache.spark.sql.expressions.Window.partitionBy("purchase_id")
    val n = col("n_clicks")
    pairs
      .withColumn("pos", row_number().over(w))
      .withColumn("n_clicks", count(lit(1)).over(full))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("pos"), col("n_clicks"),
        round(lit(1.0) / n, 6).as("linear_share"),
        round(when(n === 1, 1.0).when(n === 2, 0.5)
          .when(col("pos") === 1 || col("pos") === n, 0.4)
          .otherwise(lit(0.2) / (n - 2)), 6).as("ushape_share"))
  }

  /** I18: the outer attribution face — every click, with null purchase
    * columns when nothing converted within the window. */
  def evAttributionOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    Streaming.attributionJoinTyped(
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "click"),
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase"),
      windowSec = 300, joinType = "left_outer")
  }

  /** Funnel step order (first-touch, see EventOps.funnel). */
  val FunnelSteps: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** As-of join: every purchase matched to the user's most recent click
    * at-or-before it (the attribution question ev_attribution answers
    * with a bounded range join, answered instead with the single-pass
    * running-last formulation — the shape that survives 100 TB). */
  def evAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    EventOps.asOfJoin(
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase"),
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "click"),
      "user_id", "ts", "event_id", "value")
  }

  /** I25: EXACT per-type value percentiles — the latency/size SLO
    * readout (p50/p90/p99) every event pipeline publishes. Spark's
    * `percentile` and DuckDB's `quantile_cont` share the textbook
    * linear interpolation lower + (upper − lower)·frac at rank
    * p·(n−1), so the doubles mirror; round-4 absorbs ulp. At 100 TB
    * the EXACT form is the verification face — the K5 mergeable
    * histogram sketch is the production face (text_quantile_sketch);
    * here the per-type sort is the cost and event types are few, so
    * the skew ceiling is per-partition sort, not a driver collect. */
  def evValuePercentiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(percentile(col("value"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value"), lit(0.9)), 4).as("p90"),
        round(percentile(col("value"), lit(0.99)), 4).as("p99"))
  }

  /** I26 histogram shape: [0, 512) in 32 bins of exact width 16 —
    * covers the value column's [0.01, 490] range with no edge-bin
    * clamping in play, and both 512.0/32 and the per-value (x−0)/16
    * are exact double operations the oracle reproduces bit-for-bit. */
  val QhLo = 0.0
  val QhHi = 512.0
  val QhBins = 32

  /** I26: windowed quantile-histogram face — K5's `graft_qhist` per
    * 1-hour window, the third member of the I22/I23 windowed-sketch
    * family. Like I23 (and unlike I22's engine-specific HLL), the
    * sketch VALUES are oracle-checkable: the bin of a value is a pure
    * deterministic function (floor((x−lo)/w), clamped) and merge is
    * vector add, so DuckDB reproduces every counter cell for cell.
    * Emitted exploded as (hour, bin, cnt>0) rows — the whole
    * histogram is value-checked, not a derived bound. */
  def evQhistHourly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    ev.groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(graft.functions.VectorFunctions
        .qhist(spark, col("value"), QhLo, QhHi, QhBins).as("h"))
      .select(col("hour"), posexplode(col("h")).as(Seq("bin", "cnt")))
      .filter(col("cnt") > 0)
  }

  /** K15 tolerance face: micros in the 1-day attribution window. */
  val AsofTolMicros: Long = 24L * 3600 * 1000000

  /** K15 tolerance face: ev_asof_exec's question bounded to a 1-day
    * window — the latest click still attributes a purchase ONLY
    * within Δt (the attribution-window semantics ev_attribution's
    * range join answers; here via the merge operator's per-left-row
    * staleness check). At sf0.01 the window genuinely splits the
    * surface: ~40% fresh matches, ~60% stale-nulled, plus the
    * never-matched — all three legs oracled. */
  def evAsofTol(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val left = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("left_id"),
        col("ts").as("left_ts"), col("value"))
    val right = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("r_key"), col("ts").as("right_ts"))
      .agg(max(col("event_id")).as("right_id"))
    graft.plans.AsofJoin.join(left, right,
        col("user_id"), col("r_key"), col("left_ts"), col("right_ts"),
        tolMicros = AsofTolMicros)
      .select(col("user_id"), col("left_id"), col("left_ts"), col("value"),
        col("right_id"), col("right_ts"))
  }

  /** K15 face: the SAME as-of question as ev_asof, answered by the
    * custom sorted-merge AsofJoinExec instead of the union+window
    * composition — both stay registered so the driver hash-checks the
    * whole-operator plan against the identical oracle. Right side
    * deduped per (key, ts) by max id exactly as I7 does. */
  def evAsofExec(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val left = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("left_id"),
        col("ts").as("left_ts"), col("value"))
    val right = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("r_key"), col("ts").as("right_ts"))
      .agg(max(col("event_id")).as("right_id"))
    graft.plans.AsofJoin.join(left, right,
        col("user_id"), col("r_key"), col("left_ts"), col("right_ts"))
      .select(col("user_id"), col("left_id"), col("left_ts"), col("value"),
        col("right_id"), col("right_ts"))
  }

  /** K15 string-key face (r11): the SAME as-of question keyed by an
    * opaque string id ('u' || user_id — lexicographic order differs
    * from numeric order, e.g. "u10" < "u9", so the exec's
    * natural-ordering key compare is genuinely exercised, not just a
    * re-encoded long), planned through the merge operator. */
  def evAsofStr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val left = ev.filter(col("event_type") === "purchase")
      .select(concat(lit("u"), col("user_id")).as("user_key"),
        col("event_id").as("left_id"), col("ts").as("left_ts"), col("value"))
    val right = ev.filter(col("event_type") === "click")
      .groupBy(concat(lit("u"), col("user_id")).as("r_key"),
        col("ts").as("right_ts"))
      .agg(max(col("event_id")).as("right_id"))
    graft.plans.AsofJoin.join(left, right,
        col("user_key"), col("r_key"), col("left_ts"), col("right_ts"))
      .select(col("user_key"), col("left_id"), col("left_ts"), col("value"),
        col("right_id"), col("right_ts"))
  }

  /** Tolerance (bps) for the hourly theta overlap flags. */
  val OverlapTolBps = 200

  /** I28 batch face: hour-over-hour active-user overlap — per hour
    * with a successor hour, how many of its distinct users return in
    * the next hour (adjacent-window retention), answered BOTH ways
    * (the C25/K16 convention): the exact distinct (hour, user)
    * self-join as the verification face, and theta set-ops over the
    * CLOSED per-window sketches [[Streaming.hourlyThetaSketch]]
    * emits — at 100 TB/day the stored sketches answer overlap for
    * ANY window pair without rejoining raw ids, which is the reason
    * this face stores theta rather than I22's HLL. est_ok pins the
    * per-hour estimate AND the pairwise intersection ≤ 200 bps. */
  def evHourlyOverlap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val ev = Tables.events(spark, dir)
    val sk = Streaming.hourlyThetaSketch(ev)
    val hu = ev.select(date_trunc("hour", col("ts")).as("hour"), col("user_id"))
      .distinct().localCheckpoint(eager = true)
    val n = hu.groupBy("hour").agg(count(lit(1)).as("n_users"))
    val ov = hu.select(col("hour"), col("user_id"))
      .join(hu.select((col("hour") - expr("INTERVAL 1 HOUR")).as("hour"),
        col("user_id")), Seq("hour", "user_id"))
      .groupBy("hour").agg(count(lit(1)).as("next_overlap"))
    val pairs = sk.select(col("hour"), col("sk"))
      .join(sk.select((col("hour") - expr("INTERVAL 1 HOUR")).as("hour"),
        col("sk").as("sk_next")), Seq("hour"))
    def ok(est: Column, ex: Column): Column =
      abs(est - ex) * 10000 <= greatest(lit(2L * 10000), ex * OverlapTolBps)
    pairs.join(n, Seq("hour")).join(ov, Seq("hour"), "left")
      .select(col("hour"), col("n_users"),
        coalesce(col("next_overlap"), lit(0L)).as("next_overlap"),
        (ok(call_function("graft_theta_estimate", col("sk")), col("n_users")) &&
          ok(call_function("graft_theta_intersect", col("sk"), col("sk_next")),
            coalesce(col("next_overlap"), lit(0L))))
          .cast("int").as("est_ok"))
  }

  def evFunnel(spark: SparkSession, dir: String): DataFrame =
    EventOps.funnel(Tables.events(spark, dir), FunnelSteps)

  def evRetention(spark: SparkSession, dir: String): DataFrame =
    EventOps.retention(Tables.events(spark, dir), "signup")

  /** I10: CDC-style latest-record compaction of the event log (the
    * "current state" table a MERGE-based pipeline maintains). */
  def evScdLatest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    EventOps.latestByKey(Tables.events(spark, dir), "user_id", "ts", "event_id")
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"))
  }

  /** I12 (batch face of Streaming.dedupWithinWatermark): identity-
    * deduped event log with a DETERMINISTIC representative (min event
    * id — dropDuplicates keeps an arbitrary row, which an oracle can't
    * match) plus the duplicate multiplicity. */
  def evDedupe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.events(spark, dir)
      .groupBy("user_id", "event_type", "ts")
      .agg(min(col("event_id")).as("event_id"),
        count(lit(1)).as("n_dupes"))
  }

  /** I17: SCD Type-2 history of the event log per user (every update
    * versioned with its validity interval). */
  def evScd2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    EventOps.scd2(Tables.events(spark, dir), "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("valid_from"), col("valid_to"), col("version"), col("is_current"))
  }

  /** I20: event-type co-occurrence LIFT within sessions — which event
    * types appear in the same session more often than independence
    * predicts (the market-basket signal over behavioral sessions).
    * Distinct (session, type) rows self-join inside the session — the
    * pair space is bounded by #types² per session, never event-pairs —
    * and lift = n_ab·n_sessions / (n_a·n_b) is ONE fixed expression
    * over exact integer counts (n_sessions rides as an in-plan
    * broadcast scalar), so round(4) is pure formatting. */
  def evSessionCooccur(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    cooccurFromSessions(
      Streaming.sessionAssign(Tables.events(spark, dir))
        .select(col("user_id"), col("session_idx").as("session_id"),
          col("event_type"))
        .distinct())
  }

  /** The lift finishing over a distinct (user, session, type) frame —
    * shared by the batch query (gaps-and-islands session ids) and the
    * streaming face (Streaming.sessionTypesStreaming emits the frame
    * incrementally from closed native session_windows; only the
    * session PARTITIONING matters to the pair counts, so the two
    * faces agree whenever the sessionizations do — which the I2 spec
    * cross-validates). */
  def cooccurFromSessions(asg0: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val asg = asg0.localCheckpoint(eager = true) // read 3× (pairs ×2, totals)
    val nSess = broadcast(asg.select("user_id", "session_id").distinct()
      .agg(count(lit(1)).as("n_sess")))
    val t = asg.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    asg.select(col("user_id"), col("session_id"), col("event_type").as("ta"))
      .join(asg.select(col("user_id"), col("session_id"), col("event_type").as("tb")),
        Seq("user_id", "session_id"))
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
      .join(t.select(col("event_type").as("ta"), col("n_t").as("n_a")), "ta")
      .join(t.select(col("event_type").as("tb"), col("n_t").as("n_b")), "tb")
      .crossJoin(nSess)
      .select(col("ta"), col("tb"), col("n_ab"), col("n_a"), col("n_b"),
        round((col("n_ab") * col("n_sess")).cast("double")
          / (col("n_a") * col("n_b")), 4).as("lift"))
  }

  val AnomalyZ = 2.0

  /** I11: hourly volume anomalies per event type (|z| >= 2). */
  def evAnomaly(spark: SparkSession, dir: String): DataFrame =
    EventOps.hourlyAnomalies(Tables.events(spark, dir), AnomalyZ)

  /** I44: conversion-lag distribution — per converting user the delay
    * from FIRST view to the first purchase AT OR AFTER it, then exact
    * interpolated delay percentiles (p50/p90/p99) plus the conversion
    * rate over the viewing population. The timing companion to I8's
    * ordered funnel (which counts, but never times). Integer epoch
    * seconds end to end; percentiles are the D14 cross-engine-stable
    * kind; two user-keyed aggs and one 1-row roll-up — nothing at
    * event scale ever sorts globally. */
  def evConversionLag(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long").as("s"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("s").as("first_view"))
    val lags = views.join(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("s").as("ps")), Seq("user_id"))
      .filter(col("ps") >= col("first_view"))
      .groupBy("user_id", "first_view").agg(min("ps").as("first_purchase"))
      .select(col("user_id"), (col("first_purchase") - col("first_view"))
        .as("lag_s"))
    views.select(col("user_id")).crossJoin(broadcast(
        lags.agg(count(lit(1)).as("n_converted"),
          percentile(col("lag_s"), typedLit(Seq(0.5, 0.9, 0.99))).as("pcts"))))
      .groupBy("n_converted", "pcts")
      .agg(count(lit(1)).as("n_viewers"))
      .select(col("n_viewers"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_viewers"), 4)
          .as("conversion_rate"),
        round(col("pcts").getItem(0), 1).as("lag_p50"),
        round(col("pcts").getItem(1), 1).as("lag_p90"),
        round(col("pcts").getItem(2), 1).as("lag_p99"))
  }

  /** I42: days of the retention horizon (bits in one long). */
  val BitmapDays = 14

  /** I42: bitmap cohort retention — the roaring-bitmap technique in
    * pure SQL longs: each user's activity collapses to ONE 64-bit
    * mask (bit d = active on corpus-day d, via a codegen'd
    * shiftleft + bit_or aggregation), the cohort is the user's first
    * active day, and day-k retention is a popcount-style bit probe
    * over masks. Why it exists next to I9's count-based matrix: at
    * 100 TB the (user × active-day) intermediate is the cost — here
    * it collapses to 8 bytes per user BEFORE the cohort roll-up, the
    * masks are mergeable across partitions/windows by a single OR,
    * and the whole horizon reads from one aggregation. Integer bit
    * ops end to end — nothing floats until the final rate division. */
  def evBitmapRetention(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), (col("ts").cast("long") / lit(86400L))
        .cast("long").as("abs_day"))
    val d0 = ev.agg(min("abs_day").as("first_day"))
    val masks = ev.crossJoin(d0)
      .select(col("user_id"), (col("abs_day") - col("first_day")).as("d"))
      .filter(col("d") < BitmapDays)
      .groupBy("user_id")
      .agg(bit_or(expr("shiftleft(1L, cast(d as int))")).as("mask"),
        min("d").as("cohort_day"))
    masks
      .crossJoin(spark.range(BitmapDays).select(col("id").as("k")))
      .filter(col("cohort_day") + col("k") < BitmapDays)
      .groupBy(col("cohort_day"), col("k"))
      .agg(count(lit(1)).as("cohort_size"),
        sum(expr("shiftright(mask, cast(cohort_day + k as int)) & 1L"))
          .as("active"))
      .select(col("cohort_day"), col("k").as("day_k"), col("cohort_size"),
        col("active"),
        round(col("active").cast("double") / col("cohort_size"), 4)
          .as("retention"))
  }

  /** I41: RFM (recency / frequency / monetary) segmentation — the
    * classic customer-value cube over the event stream. Per user:
    * recency in whole days behind the corpus' newest event (integer
    * epoch-second arithmetic), event count, exact-cents value sum.
    * Scores 1-5 come from quintile THRESHOLDS (exact interpolated
    * percentiles of the per-user measures, one tiny agg broadcast
    * back), NOT from a global ntile window — an unpartitioned ntile
    * is a single-partition exchange, the exact plan J6 bans; the
    * threshold spelling needs one users-scale groupBy plus a 1-row
    * cross join and scores stay identical. segment = r·100+f·10+m. */
  def evRfm(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val users = ev.groupBy("user_id").agg(
      max(col("ts").cast("long")).as("last_s"),
      count(lit(1)).as("n_events"),
      sum(round(col("value") * 100).cast("long")).as("cents"))
    val mx = ev.agg(max(col("ts").cast("long")).as("mx_s"))
    val withRec = users.crossJoin(mx)
      .withColumn("recency_days", ((col("mx_s") - col("last_s")) / 86400L)
        .cast("long"))
      .drop("mx_s", "last_s")
    val cuts = withRec.agg(
      percentile(col("recency_days"), typedLit(Seq(0.2, 0.4, 0.6, 0.8))).as("rc"),
      percentile(col("n_events"), typedLit(Seq(0.2, 0.4, 0.6, 0.8))).as("fc"),
      percentile(col("cents"), typedLit(Seq(0.2, 0.4, 0.6, 0.8))).as("mc"))
    def scoreUp(x: org.apache.spark.sql.Column, c: String) =
      lit(1) + (0 to 3).map(i => (x > col(c).getItem(i)).cast("int")).reduce(_ + _)
    def scoreDown(x: org.apache.spark.sql.Column, c: String) =
      lit(1) + (0 to 3).map(i => (x < col(c).getItem(3 - i)).cast("int")).reduce(_ + _)
    withRec.crossJoin(cuts)
      .withColumn("r_score", scoreDown(col("recency_days"), "rc"))
      .withColumn("f_score", scoreUp(col("n_events"), "fc"))
      .withColumn("m_score", scoreUp(col("cents"), "mc"))
      .select(col("user_id"), col("recency_days"), col("n_events"), col("cents"),
        col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .as("segment"))
  }

  /** CUSUM alarm threshold, in units of the per-type hourly mean:
    * alarm when the running excess-over-mean exceeds 3 mean-hours. */
  val CusumMeans = 3L

  /** I40: one-sided CUSUM change-point detection over hourly volumes —
    * the SUSTAINED-shift detector the I11 z-score face cannot be (a z
    * test fires on single spiky hours; CUSUM accumulates small drifts
    * until the evidence crosses a threshold, Page 1954). The recursion
    * S_t = max(0, S_{t-1} + x_t − μ) is not a window function, but its
    * closed form is: S_t = C_t − min(0, min_{j≤t} C_j) where C is the
    * running sum of deviations — two cumulative windows, both
    * partitioned by event_type (bounded key count; no single-partition
    * stage, J6-clean). Exact integers throughout: deviations are
    * scaled by the per-type hour count m (D_t = m·n_t − T, T = Σn), so
    * the running min/sum never touch a float; the one division back to
    * mean-units happens once at the end, rounded 4dp. At 100 TB the
    * hourly pre-aggregation collapses events to (types × hours) rows
    * before any window runs — the windows see thousands of rows, not
    * billions. */
  def evCusum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(sum("n").as("t_total"), count(lit(1)).as("m_hours"))
    val run = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = sum(col("n") * col("m_hours") - col("t_total")).over(run)
    hourly.join(stats, "event_type")
      .withColumn("_c", c)
      .withColumn("_s", col("_c") - least(lit(0L), min(col("_c")).over(run)))
      .select(col("event_type"), col("hour"), col("n"),
        round(col("_s").cast("double") / col("t_total"), 4).as("cusum_means"),
        (col("_s") > lit(CusumMeans) * col("t_total")).cast("int").as("alarm"))
  }

  /** I14: top event types per day — the daily heavy-hitters roll-up.
    * One day-keyed aggregation + a rank window over tiny per-day
    * groups (at most #event-types rows per day reach the window).
    * The batch face groups by a plain `date_trunc('day', ts)` — equal
    * by construction to `window(ts, '1 day').start` but without the
    * TimeWindow struct expansion in the aggregate (r7 routed batch
    * through Streaming.dailyCounts and the driver bench read it 6×
    * slower; clean r8 probes put most of that on co-tenant noise, but
    * the cheaper projection is strictly better). The finishing rank
    * (`dailyTopk`) stays shared with the streaming face, whose
    * window()-aggregated counts StreamingSpec proves land on the same
    * day keys (MemoryStream parity). */
  def evDailyTopk(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    Streaming.dailyTopk(daily)
  }

  /** I13: Markov transition matrix over user event journeys. */
  def evMarkov(spark: SparkSession, dir: String): DataFrame =
    EventOps.transitionMatrix(Tables.events(spark, dir),
      "user_id", "ts", "event_id", "event_type")

  /** I51: traffic-concentration summary — how much of the stream the
    * top-1% of users generate (the "is this stream a few whales"
    * number that decides skew handling, sampling design, and whether
    * per-user state stores need salting). Per-user counts → p99
    * threshold (portable interpolated percentile) → one roll-up:
    * users/events above it and their share. The I21 heavy-hitter
    * list names the whales; this one number says whether they
    * matter. */
  def evPowerUsers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val cnt = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val thr = cnt.agg(percentile(col("n"), lit(0.99)).as("p99"))
    cnt.crossJoin(broadcast(thr))
      .groupBy("p99")
      .agg(count(lit(1)).as("n_users"), sum("n").as("n_events"),
        sum((col("n") > col("p99")).cast("long")).as("heavy_users"),
        sum(when(col("n") > col("p99"), col("n")).otherwise(0L))
          .as("heavy_events"))
      .select(col("n_users"), col("n_events"),
        round(col("p99"), 2).as("p99_events"),
        col("heavy_users"), col("heavy_events"),
        round(col("heavy_events").cast("double") / col("n_events"), 4)
          .as("heavy_share"))
  }

  /** I50: weekly-seasonality heatmap — event share per (day-of-week,
    * hour-of-day) per type, the capacity-planning / anomaly-baseline
    * view (the I11 z-test should really be conditioned on THIS).
    * Pure integer counts + one share division; UTC dow/hour from the
    * session timezone both engines pin to UTC. */
  def evSeasonality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    seasonalityFromCells(Streaming.seasonalityCells(
      Tables.events(spark, dir).select(col("ts"), col("event_type"))))
  }

  /** I50 batch finish: fold per-day cells into the (dow, hod) heatmap
    * and add the per-type share — shared by the batch query and the
    * streaming sink's closed windows (the I13/I14 split). */
  def seasonalityFromCells(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val cell = cells.select(col("event_type"),
        dayofweek(col("day")).as("dow"), col("hod"), col("n"))
      .groupBy("event_type", "dow", "hod").agg(sum("n").as("n"))
    // per-type total as a partitioned window over the ≤ types×7×24
    // grid: join-free (no self-reference on a streaming memory view)
    // and one shuffle fewer than the groupBy+join spelling
    val wt = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    cell.select(col("event_type"), col("dow"), col("hod"), col("n"),
      round(col("n").cast("double") / sum("n").over(wt), 5).as("share"))
  }

  /** I49: the watermark-delay candidates the lateness profile
    * evaluates (seconds). */
  val LatenessDelays: Seq[Long] = Seq(60L, 600L, 3600L)

  /** I49: out-of-orderness profile — the measurement that DECIDES a
    * watermark delay instead of guessing it: per event its lateness
    * behind the per-user running max event-time (arrival order =
    * event_id, the append order), then per event_type the p50/p99
    * lateness and the share of events a 1-min/10-min/1-h watermark
    * would drop. This is the profile the I1/I16 windowed faces and
    * every `withWatermark` caller should be configured FROM; the
    * advisor's r11 note (callers must be able to express real
    * lateness) gets its data here. Integer seconds; percentiles are
    * the D14-portable kind; one user-ordered window + one type agg. */
  def evLateness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val late = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("s"))
      .withColumn("lateness", max(col("s")).over(w) - col("s"))
    latenessProfile(late)
  }

  /** I49 batch finish: per-type percentiles and watermark-drop shares
    * over per-event lateness rows — shared by the batch query and the
    * streaming face's emitted frame (the I13/I14 split). */
  def latenessProfile(late: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val shares = LatenessDelays.map(d =>
      round(sum((col("lateness") > d).cast("long")).cast("double")
        / count(lit(1)), 4).as(s"share_late_${d}s"))
    late.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        (Seq(
          round(percentile(col("lateness"), lit(0.5)), 1).as("lateness_p50"),
          round(percentile(col("lateness"), lit(0.99)), 1).as("lateness_p99"))
          ++ shares): _*)
  }

  /** I48: minimum events before the cadence test speaks. */
  val BotMinEvents = 5L

  /** I48: bot-cadence signals — per user the inter-event-gap
    * statistics that separate scripted traffic from humans: a
    * machine fires on a near-constant timer (coefficient of
    * variation of gaps ≈ 0) where human gaps are bursty (cv ≳ 1).
    * Exact integers end to end: gaps in whole seconds, variance via
    * the (n·Σx² − (Σx)²) identity over bigint sums, and the bot flag
    * is the INTEGER cross-multiplied inequality 100·n·(nΣx²−(Σx)²) <
    * (Σx)²·n (cv² < 1/100 ⟺ n·(nΣx²−(Σx)²) < (Σx)²·... spelled
    * below) — no float compare decides membership; the reported cv
    * is the one rounded display division. One lag window per user +
    * one user-keyed agg. */
  def evBotSignals(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("ts").cast("long").as("s"))
      .withColumn("gap", col("s") - lag(col("s"), 1).over(w))
      .filter(col("gap").isNotNull)
    botSignalsFromGaps(gaps)
  }

  /** I48 batch finish: the per-user cadence profile over (user_id,
    * gap) rows — shared by the batch query and the streaming face's
    * emitted gaps (the I13/I14 split). All-integer sums; the bot
    * flag is the integer cross-multiplied inequality. */
  def botSignalsFromGaps(gaps: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum("gap").as("sx"), sum(col("gap") * col("gap")).as("sxx"),
        min("gap").as("min_gap"), max("gap").as("max_gap"))
      .filter(col("n_gaps") >= BotMinEvents && col("sx") > 0)
      // cv = √(nΣx²−(Σx)²)/Σx ; bot ⟺ cv² < 1/100, i.e. the integer
      // inequality 100·(nΣx²−(Σx)²) < (Σx)² — no float compare
      // decides membership. (Bigint headroom: gaps are seconds and
      // 100·n·Σgap² stays far under 2⁶³ at this corpus's per-user
      // volumes; a 100 TB deployment hashes gaps to minutes first.)
      .select(col("user_id"), col("n_gaps"), col("min_gap"), col("max_gap"),
        round(sqrt((col("n_gaps") * col("sxx")
            - col("sx") * col("sx")).cast("double")) / col("sx"), 4)
          .as("gap_cv"),
        (lit(100L) * (col("n_gaps") * col("sxx")
            - col("sx") * col("sx")) < col("sx") * col("sx"))
          .cast("int").as("bot_flag"))
  }

  /** I47: power-iteration rounds for the stationary distribution. */
  val StationaryIters = 8

  /** I47: stationary distribution of the I13 journey Markov chain —
    * where users spend their long-run time, the one-number-per-state
    * summary a product team reads off the transition matrix. Power
    * iteration π ← πP from uniform, renormalized each round (states
    * without outgoing transitions leak mass; renormalization keeps a
    * proper distribution), [[StationaryIters]] rounds. P entries are
    * exact-integer ratios; each round is one join + one type-keyed
    * agg over ≤ |types|² rows — the matrix is bounded by the event
    * vocabulary, so every frame after the first count is
    * metadata-scale. round(6) absorbs sum-order ulp (the Katz
    * precedent). */
  def evStationary(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val j = Tables.events(spark, dir).select(col("event_type"),
      lead(col("event_type"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))).as("to_type"))
    val c = j.filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n")).localCheckpoint(eager = true)
    val tot = c.groupBy("from_type").agg(sum("n").as("tot"))
    val p = c.join(tot, "from_type")
      .select(col("from_type"), col("to_type"),
        (col("n").cast("double") / col("tot")).as("pe"))
      .localCheckpoint(eager = true)
    val st = c.select(col("from_type").as("t")).distinct()
    val nt = st.agg(count(lit(1)).as("nt"))
    var pi = st.crossJoin(nt)
      .select(col("t"), (lit(1.0) / col("nt")).as("pi"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to StationaryIters) {
      val raw = pi.join(p, pi("t") === p("from_type"))
        .join(st.select(col("t").as("t2")), col("to_type") === col("t2"))
        .groupBy(col("to_type")).agg(sum(col("pi") * col("pe")).as("w"))
      val mass = raw.agg(sum("w").as("mass"))
      pi = raw.crossJoin(mass)
        .select(col("to_type").as("t"), (col("w") / col("mass")).as("pi"))
        .localCheckpoint(eager = true)
    }
    pi.select(col("t").as("event_type"), round(col("pi"), 6).as("pi"))
  }

  val HeavyTopK = 10

  /** I21: EXACT heavy hitters — the top-10 users per event type by
    * event count (map-side-combined count + a per-type rank window
    * over ≤ |users| rows, user_id tiebreak). This is the exact answer
    * the K9 Misra-Gries sketch (`graft_topk`) approximates in one
    * bounded-memory pass; SketchSpec cross-checks the sketch's
    * guarantee — every user above N/k is among its candidates —
    * against THIS query's counts on the same table, tying the sketch
    * to an oracled ground truth. */
  def evHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.events(spark, dir)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("n_events").desc, col("user_id"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= HeavyTopK)
  }

  /** Relative error (percent) the I22 sketch estimate must stay
    * within for est_ok — generous vs the ~1.6% HLL rsd at lgK 12
    * (and the sketch is EXACT in sparse mode at these per-hour
    * cardinalities), so the flag is a stable 1 in any engine. */
  val HllBoundPct = 5L

  /** I22 (batch face): per (hour, event_type) — the EXACT distinct
    * user count (oracled) plus a flag that the HLL sketch estimate
    * lands within [[HllBoundPct]] of it, as integer
    * cross-multiplication. The estimate itself is engine-specific
    * (DataSketches registers) and can't hash-match an oracle; the
    * bound CAN — so this query pins both the windowed-sketch plumbing
    * and its accuracy contract. The streaming face is the same
    * hourlyDistinctSketch with live watermark (StreamingSpec). */
  def evHourlyDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val est = Streaming.distinctFromSketches(Streaming.hourlyDistinctSketch(ev))
    val exact = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(countDistinct("user_id").as("n_users"))
    exact.join(est, Seq("hour", "event_type"))
      .select(col("hour"), col("event_type"), col("n_users"),
        (abs(col("approx_users") - col("n_users")) * 100L
          <= col("n_users") * HllBoundPct).cast("int").as("est_ok"))
  }

  /** I24 counter budget: at the verify SF the per-(hour, type) user
    * sets are below k, so the Misra-Gries summary is EXACT (no
    * decrement ever fires) and both flags are a deterministic 1 on
    * every row — the est_ok/present convention from I22. The
    * guarantee UNDER PRESSURE (decrements firing, coverage + error
    * bound holding) is SketchSpec's windowed superset check with a
    * deliberately small k. */
  val MgHourlyK = 10

  /** I24 (batch face): per-hour Misra-Gries heavy-hitter candidates
    * cross-checked against the EXACT grouping — one row per (hour,
    * event_type, user) whose exact count clears the integer-form
    * threshold n·k > N (strictly what the MG coverage guarantee
    * promises to catch), with `present` (candidate map contains the
    * user) and `est_ok` (estimate ∈ [n − N/k, n], integer
    * cross-multiplied). Row set and counts come from exact
    * aggregation, flags from the sketch — so the output is
    * deterministic and hash-oracled even though the surviving
    * counter SET near the bound is merge-order dependent. The
    * streaming face is the same hourlyTopKCandidates with live
    * watermark (StreamingSpec). */
  def evMgHourly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val cand = Streaming.hourlyTopKCandidates(ev, MgHourlyK)
    val exact = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val totals = exact.groupBy("hour", "event_type")
      .agg(sum("n_events").as("n_total"))
    // try_element_at: ANSI element_at THROWS on an absent map key, so
    // a coverage failure (the very thing `present` reports) would
    // crash the query instead of setting the flag to 0
    val est = try_element_at(col("cand"), col("user_id").cast("string"))
    exact.join(totals, Seq("hour", "event_type"))
      .filter(col("n_events") * MgHourlyK > col("n_total"))
      .join(cand, Seq("hour", "event_type"))
      .select(col("hour"), col("event_type"), col("user_id"), col("n_events"),
        est.isNotNull.cast("int").as("present"),
        (est.isNotNull && est <= col("n_events") &&
          (col("n_events") - est) * MgHourlyK <= col("n_total"))
          .cast("int").as("est_ok"))
  }

  /** K13 windowed-face sketch shape: 3 md5 hash rows × 32 buckets —
    * small enough that the per-hour matrix is one array cell in the
    * output, wide enough that the 8 synthetic event types rarely
    * collide (overcount is still exercised by SketchSpec's forced
    * collisions). Shared by the oracle generator. */
  val CmsDepth = 3
  val CmsWidth = 32

  /** K13 windowed face: per-hour Count-Min sketch over event types +
    * in-plan point queries against it. Unlike I22's HLL (estimate is
    * engine-specific, only the accuracy BOUND is oracled), the CMS
    * counters are md5-bucketed — the engine-portable seed convention —
    * so the ESTIMATE ITSELF is a deterministic function DuckDB
    * reproduces exactly: per (hour, type), n_events (exact), cms_est
    * (min over the type's depth buckets, read from the aggregated
    * sketch with element_at), and the overcount ≥ 0 that one-sided CMS
    * error guarantees. The streaming face is the same groupBy-agg
    * through state-store merge (StreamingSpec). */
  def evCmsHourly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, dir)
    val sk = ev.groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(graft.functions.VectorFunctions.cms(
        spark, col("event_type"), CmsDepth, CmsWidth).as("sk"))
    val exact = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    // bucket(r, t) = (u32 of first 4 md5 bytes & 0x7fffffff) % width —
    // the CountMin.bucket convention spelled as codegen'd columns
    def bucket(r: Int) =
      conv(substring(md5(concat(lit(s"$r|"), col("event_type"))), 1, 8), 16, 10)
        .cast("long").bitwiseAND(lit(2147483647L)) % CmsWidth
    val est = (0 until CmsDepth).map { r =>
      element_at(col("sk"), (lit(r * CmsWidth) + bucket(r) + 1).cast("int"))
    }.reduce(least(_, _))
    exact.join(sk, "hour")
      .select(col("hour"), col("event_type"), col("n_events"),
        est.as("cms_est"), (est - col("n_events")).as("overcount"))
  }

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "ev_windowed"    -> (evWindowed _),
    "ev_sessions"    -> (evSessions _),
    "ev_session_stats" -> (evSessionStats _),
    "ev_session_cooccur" -> (evSessionCooccur _),
    "ev_props"       -> (evProps _),
    "ev_attribution" -> (evAttribution _),
    "ev_multi_touch" -> (evMultiTouch _),
    "ev_attribution_outer" -> (evAttributionOuter _),
    "ev_asof"        -> (evAsof _),
    "ev_asof_exec"   -> (evAsofExec _),
    "ev_asof_tol"    -> (evAsofTol _),
    "ev_asof_str"    -> (evAsofStr _),
    "ev_hourly_overlap" -> (evHourlyOverlap _),
    "ev_value_percentiles" -> (evValuePercentiles _),
    "ev_funnel"      -> (evFunnel _),
    "ev_retention"   -> (evRetention _),
    "ev_scd_latest"  -> (evScdLatest _),
    "ev_scd2"        -> (evScd2 _),
    "ev_anomaly"     -> (evAnomaly _),
    "ev_cusum"       -> (evCusum _),
    "ev_rfm"         -> (evRfm _),
    "ev_bitmap_retention" -> (evBitmapRetention _),
    "ev_conversion_lag" -> (evConversionLag _),
    "ev_stationary"  -> (evStationary _),
    "ev_bot_signals" -> (evBotSignals _),
    "ev_lateness"    -> (evLateness _),
    "ev_seasonality" -> (evSeasonality _),
    "ev_power_users" -> (evPowerUsers _),
    "ev_dedupe"      -> (evDedupe _),
    "ev_markov"      -> (evMarkov _),
    "ev_daily_topk"  -> (evDailyTopk _),
    "ev_sliding"     -> (evSliding _),
    "ev_heavy_hitters" -> (evHeavyHitters _),
    "ev_hourly_distinct" -> (evHourlyDistinct _),
    "ev_cms_hourly"  -> (evCmsHourly _),
    "ev_mg_hourly"   -> (evMgHourly _),
    "ev_qhist_hourly" -> (evQhistHourly _),
    "ev_lifetime_features" -> (evLifetimeFeatures _),
    "ev_throttle"    -> (evThrottle _),
    "ev_ewma"        -> (evEwma _),
    "ev_dau_wau"     -> (evDauWau _),
    "ev_pattern"     -> (evPattern _),
  )

  /** I29: point-in-time-correct lifetime features (batch face; the
    * transformWithState streaming face is parity-pinned in
    * StreamingSpec). */
  def evLifetimeFeatures(spark: SparkSession, dir: String): DataFrame =
    EventOps.lifetimeFeatures(Tables.events(spark, dir))

  val ThrottleMax = 1

  /** I32: per-(user, hour) rate cap at [[ThrottleMax]] (batch face;
    * streaming parity in StreamingSpec). */
  def evThrottle(spark: SparkSession, dir: String): DataFrame =
    Streaming.throttleBatch(Tables.events(spark, dir), ThrottleMax)

  /** I36: rolling actives — DAU, trailing-7-day WAU, and the
    * DAU/WAU stickiness ratio per day, the engagement face every
    * product pipeline reports. Exact distincts (the oracle-checkable
    * face; the windowed-HLL I22 is the sketch sibling at 100 TB/day).
    * Scale shape: events collapse to DISTINCT (day, user) first —
    * everything downstream is user-day scale; the trailing window is
    * a ≤7× bounded range join against the TINY day dimension
    * (broadcast — 365 rows/year), never event×event. */
  def evDauWau(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ud = Tables.events(spark, dir)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id")).distinct()
    val dau = ud.groupBy("day").agg(count_distinct(col("user_id")).as("dau"))
    val days = dau.select(col("day").as("d"))
    val wau = ud.join(broadcast(days),
        col("day") <= col("d") &&
          col("day") >= col("d") - expr("INTERVAL 6 DAYS"))
      .groupBy("d").agg(count_distinct(col("user_id")).as("wau"))
    dau.join(wau, col("day") === col("d"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 4).as("stickiness"))
  }

  /** I39 patterns over per-user journey strings (one char per event:
    * first letter of the type — c/e/p/s/v, all distinct). Kept to
    * syntax with identical semantics in Java regex and RE2. */
  val JourneyPatterns: Seq[(String, String)] = Seq(
    ("view_to_purchase", "v.*p"),
    ("error_then_leave", "e[^p]*$"),
    ("signup_first", "^s"))

  /** I39: sequence-pattern cohorts — the MATCH_RECOGNIZE-lite face:
    * each user's journey collapses to a compact code string in exact
    * (ts, event_id) order, and each named pattern counts matching
    * users. The funnel (I8) answers ONE fixed ordered-subset; regex
    * patterns express the negative/anchor shapes it cannot ("error
    * with no later purchase", "signup before anything"). Scale
    * shape: one groupBy(user) building O(events-per-user) strings
    * (sort_array over struct keys — no interpreted lambda; field
    * extraction is a codegen'd GetArrayStructFields), then a
    * per-user regex — per-row work; the final count is
    * aggregate-scale. */
  def evPattern(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val coded = Tables.events(spark, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("s"))
      .groupBy("user_id")
      .agg(array_join(sort_array(collect_list(col("s"))).getField("c"), "").as("journey"))
    val flags = JourneyPatterns.map { case (name, re) =>
      sum(when(regexp_like(col("journey"), lit(re)), 1L).otherwise(0L)).as(name)
    }
    val one = coded.agg(count(lit(1)).as("n_users"), flags: _*)
    one.select(expr(
      s"""stack(${JourneyPatterns.size},
         |${JourneyPatterns.map { case (n, _) => s"'$n', $n" }.mkString(",\n")})
         |AS (pattern, n_matched)""".stripMargin),
      col("n_users"))
      .select(col("pattern"), col("n_matched"),
        round(col("n_matched").cast("double") / col("n_users"), 4).as("share"))
  }

  /** EWMA weights (1-α)^k for α=0.5 over the current + 5 prior hours —
    * exact binary fractions, so the weighted sums are IEEE-identical
    * in Spark and DuckDB and the oracle can hash-match. */
  val EwmaWeights: Seq[Double] = Seq(1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125)

  /** I34: time-decayed hourly volume — a fixed-horizon EWMA per
    * event type, the smoothing every ops dashboard layers under its
    * spike detector (I11's z-score compares against the GLOBAL mean;
    * the EWMA tracks the RECENT level, so a ramping series stops
    * looking anomalous an hour after the ramp). Missing leading lags
    * drop out of numerator AND denominator, so the series head is a
    * properly-normalized partial average, not biased toward zero.
    * Scale shape: one hour-keyed aggregation (map-side combined),
    * then a lag window partitioned by event_type over O(hours) rows
    * per type — the window input is already aggregate-scale, never
    * event-scale. */
  def evEwma(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hour")
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val lags = EwmaWeights.zipWithIndex.map { case (wk, k) =>
      (if (k == 0) col("n") else lag(col("n"), k).over(w), wk)
    }
    val num = lags.map { case (c, wk) => coalesce(c * lit(wk), lit(0.0)) }
      .reduce(_ + _)
    val den = lags.map { case (c, wk) =>
      when(c.isNotNull, lit(wk)).otherwise(lit(0.0)) }.reduce(_ + _)
    hourly.select(col("event_type"), col("hour"), col("n"),
      round(num / den, 4).as("ewma"))
  }

  /** Generated gaps-and-islands assignment CTEs (mirror of
    * Streaming.sessionAssign; event_type rides through for the
    * session-scoped analytics) — shared by ev_sessions,
    * ev_session_stats, and ev_session_cooccur, so none can drift. */
  private lazy val sessionAssignCtes: String =
    s"""g AS (
       |  SELECT user_id, ts, value, event_type,
       |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
       |              > ${Streaming.SessionGapSec}
       |           OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |), s AS (
       |  SELECT user_id, ts, value, event_type,
       |    (sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
       |                      ROWS UNBOUNDED PRECEDING))::bigint AS session_idx
       |  FROM g
       |)""".stripMargin

  private lazy val sessionsSql: String =
    s"""WITH $sessionAssignCtes
       |SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end,
       |  count(*) AS n_events, round(sum(value), 2) AS sum_value
       |FROM s GROUP BY user_id, session_idx""".stripMargin

  /** The as-of oracle (dedup right per (key,ts) by max id; union with
    * kind ordering rights before lefts on equal ts; running
    * last_value over a total order) — NOT DuckDB's ASOF JOIN, whose
    * tie-on-equal-right-ts choice is unspecified. Shared by ev_asof
    * (union+window plan), ev_asof_exec (K15 merge operator), and —
    * keyed by the string id — ev_asof_str. */
  private def asofOracleSqlKeyed(keyExpr: String, keyName: String): String =
    s"""WITH c AS (
       |  SELECT $keyExpr AS key, ts, max(event_id) AS right_id
       |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
       |), u AS (
       |  SELECT key, ts, 0 AS kind, right_id,
       |         NULL::bigint AS left_id, NULL::double AS value
       |  FROM c
       |  UNION ALL
       |  SELECT $keyExpr, ts, 1, NULL, event_id, value
       |  FROM events WHERE event_type = 'purchase'
       |), w AS (
       |  SELECT key, ts, kind, left_id, value,
       |    last_value(right_id IGNORE NULLS) OVER
       |      (PARTITION BY key ORDER BY ts, kind, left_id
       |       ROWS UNBOUNDED PRECEDING) AS asof_right_id,
       |    last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS) OVER
       |      (PARTITION BY key ORDER BY ts, kind, left_id
       |       ROWS UNBOUNDED PRECEDING) AS asof_right_ts
       |  FROM u
       |)
       |SELECT key AS $keyName, left_id, ts AS left_ts, value,
       |  asof_right_id AS right_id, asof_right_ts AS right_ts
       |FROM w WHERE kind = 1""".stripMargin
  private val asofOracleSql: String = asofOracleSqlKeyed("user_id", "user_id")

  def oracleSql: Map[String, String] = Map(
    "ev_throttle" ->
      s"""SELECT event_id, user_id, date_trunc('hour', ts) AS hour,
         |  row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
         |    ORDER BY ts, event_id) AS seq,
         |  (CASE WHEN row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
         |    ORDER BY ts, event_id) <= ${ThrottleMax} THEN 1 ELSE 0 END) AS admitted
         |FROM events""".stripMargin,

    "ev_windowed" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "ev_sessions" -> sessionsSql,

    "ev_lifetime_features" ->
      """SELECT event_id, user_id, ts,
        |  count(*) OVER w AS n_prior,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) OVER w
        |    AS n_prior_purchases,
        |  round(coalesce(sum(value) OVER w, 0.0), 4) AS prior_value_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin,

    // nested sessions oracle (the sim_ann_recall pattern): durations
    // are exact epoch-second ints, avg = int sum / count — exact.
    // date_diff('second') has FLOOR semantics (boundaries crossed ==
    // floor(b) − floor(a)), matching Spark's unix_timestamp; a bare
    // epoch(ts)::bigint would ROUND the fractional double and drift
    // sessions by ±1 s
    "ev_session_stats" ->
      s"""WITH sess AS (SELECT * FROM (${sessionsSql}))
         |SELECT user_id, count(*) AS n_sessions,
         |  sum(n_events)::bigint AS total_events,
         |  max(n_events) AS max_session_events,
         |  round(avg(date_diff('second', session_start, session_end)), 4)
         |    AS avg_session_sec
         |FROM sess GROUP BY user_id""".stripMargin,

    "ev_attribution" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts, p.value
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 300 SECONDS
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'""".stripMargin,

    // mirrors evMultiTouch over the same pair join: (click_ts,
    // click_id) order, pinned n=1/n=2 conventions, ::double forced
    // (a bare literal is DECIMAL in DuckDB — the §3 lesson)
    "ev_multi_touch" ->
      """WITH pairs AS (
        |  SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |    c.ts AS click_ts
        |  FROM events c JOIN events p
        |    ON c.user_id = p.user_id
        |   AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 300 SECONDS
        |  WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |), r AS (
        |  SELECT user_id, purchase_id, click_id,
        |    row_number() OVER (PARTITION BY purchase_id
        |                       ORDER BY click_ts, click_id) AS pos,
        |    count(*) OVER (PARTITION BY purchase_id) AS n_clicks
        |  FROM pairs
        |)
        |SELECT user_id, purchase_id, click_id, pos::int AS pos,
        |  n_clicks::bigint AS n_clicks,
        |  round(1.0::double / n_clicks, 6) AS linear_share,
        |  round(CASE WHEN n_clicks = 1 THEN 1.0::double
        |             WHEN n_clicks = 2 THEN 0.5::double
        |             WHEN pos = 1 OR pos = n_clicks THEN 0.4::double
        |             ELSE 0.2::double / (n_clicks - 2) END, 6) AS ushape_share
        |FROM r""".stripMargin,

    // mirrors evSessionCooccur over the shared assignment CTEs: exact
    // integer counts, one fixed lift expression
    "ev_session_cooccur" ->
      s"""WITH $sessionAssignCtes,
         |a AS (SELECT DISTINCT user_id, session_idx, event_type FROM s),
         |ns AS (SELECT count(*) AS n_sess FROM
         |       (SELECT DISTINCT user_id, session_idx FROM a)),
         |t AS (SELECT event_type, count(*) AS n_t FROM a GROUP BY 1),
         |p AS (
         |  SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS n_ab
         |  FROM a x JOIN a y
         |    ON x.user_id = y.user_id AND x.session_idx = y.session_idx
         |   AND x.event_type < y.event_type
         |  GROUP BY 1, 2
         |)
         |SELECT ta, tb, n_ab, na.n_t AS n_a, nb.n_t AS n_b,
         |  round((n_ab * ns.n_sess)::double / (na.n_t * nb.n_t), 4) AS lift
         |FROM p
         |JOIN t na ON p.ta = na.event_type
         |JOIN t nb ON p.tb = nb.event_type
         |CROSS JOIN ns""".stripMargin,

    "ev_attribution_outer" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts, p.value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 300 SECONDS""".stripMargin,

    "ev_props" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50""".stripMargin,

    // mirrors EventOps.asOfJoin step for step — shared verbatim with
    // ev_asof_exec (the K15 custom merge operator answers the same
    // question through a different physical plan)
    "ev_asof" -> asofOracleSql,

    "ev_retention" ->
      """WITH c AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY 1
        |), a AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
        |)
        |SELECT c.cohort_week,
        |  ((epoch(a.week)::bigint - epoch(c.cohort_week)::bigint) // 604800)::int
        |    AS week_offset,
        |  count(*) AS n_users
        |FROM a JOIN c ON a.user_id = c.user_id
        |WHERE a.week >= c.cohort_week
        |GROUP BY 1, 2""".stripMargin,

    "ev_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id AS key, min(ts) AS t FROM events
        |  WHERE event_type = 'signup' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id AS key, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.key
        |  WHERE e.event_type = 'view' AND e.ts >= s1.t GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id AS key, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.key
        |  WHERE e.event_type = 'click' AND e.ts >= s2.t GROUP BY 1
        |), s4 AS (
        |  SELECT e.user_id AS key, min(e.ts) AS t FROM events e
        |  JOIN s3 ON e.user_id = s3.key
        |  WHERE e.event_type = 'purchase' AND e.ts >= s3.t GROUP BY 1
        |)
        |SELECT 1 AS step, 'signup' AS event_type, (SELECT count(*) FROM s1) AS n_users
        |UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
        |UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)""".stripMargin,

    "ev_scd_latest" ->
      """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        |  event_type AS last_event_type, value AS last_value
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    "ev_dedupe" ->
      """SELECT user_id, event_type, ts, min(event_id) AS event_id,
        |  count(*) AS n_dupes
        |FROM events GROUP BY user_id, event_type, ts""".stripMargin,

    // mirrors evHeavyHitters: same counts, same (desc count, user_id)
    // rank order
    "ev_heavy_hitters" ->
      s"""WITH c AS (
         |  SELECT event_type, user_id, count(*) AS n_events
         |  FROM events GROUP BY 1, 2
         |)
         |SELECT event_type, user_id, n_events,
         |  row_number() OVER (PARTITION BY event_type
         |                     ORDER BY n_events DESC, user_id) AS rnk
         |FROM c QUALIFY rnk <= ${HeavyTopK}""".stripMargin,

    // exact distinct is the oracled half; est_ok = 1 asserts the
    // Spark-side sketch estimate stayed within the published bound
    // on EVERY row (a sketch regression hash-mismatches)
    "ev_hourly_distinct" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(DISTINCT user_id) AS n_users, 1 AS est_ok
        |FROM events GROUP BY 1, 2""".stripMargin,

    // mirrors evCmsHourly cell for cell: the md5 bucket convention is
    // engine-portable, so the sketch ESTIMATE (not just a bound) is
    // reproduced — per (hour, type), min over its depth-row counters
    "ev_cms_hourly" ->
      s"""WITH e AS (SELECT date_trunc('hour', ts) AS hour, event_type FROM events),
         |cnt AS (SELECT hour, event_type, count(*) AS n_events FROM e GROUP BY 1, 2),
         |cell AS (
         |  SELECT e.hour, r.r,
         |    (('0x' || substr(md5(r.r::varchar || '|' || e.event_type), 1, 8))::bigint
         |      & 2147483647) % $CmsWidth AS b,
         |    count(*) AS c
         |  FROM e CROSS JOIN range($CmsDepth) r(r) GROUP BY 1, 2, 3
         |), est AS (
         |  SELECT cnt.hour, cnt.event_type, min(cell.c) AS cms_est
         |  FROM cnt JOIN cell ON cell.hour = cnt.hour
         |    AND cell.b = (('0x' || substr(md5(cell.r::varchar || '|' || cnt.event_type), 1, 8))::bigint
         |                   & 2147483647) % $CmsWidth
         |  GROUP BY 1, 2
         |)
         |SELECT cnt.hour, cnt.event_type, cnt.n_events, est.cms_est,
         |  est.cms_est - cnt.n_events AS overcount
         |FROM cnt JOIN est ON cnt.hour = est.hour AND cnt.event_type = est.event_type""".stripMargin,

    // row set + counts from the exact grouping (deterministic); the
    // sketch only contributes the present/est_ok flags, which the MG
    // coverage and error guarantees pin to 1 on every threshold-
    // clearing row in ANY engine — so literal 1s here ARE the mirror
    "ev_mg_hourly" ->
      s"""WITH c AS (
         |  SELECT date_trunc('hour', ts) AS hour, event_type, user_id,
         |    count(*) AS n_events
         |  FROM events GROUP BY 1, 2, 3
         |), t AS (
         |  SELECT hour, event_type, sum(n_events) AS n_total
         |  FROM c GROUP BY 1, 2
         |)
         |SELECT c.hour, c.event_type, c.user_id, c.n_events,
         |  1 AS present, 1 AS est_ok
         |FROM c JOIN t ON c.hour = t.hour AND c.event_type = t.event_type
         |WHERE c.n_events * $MgHourlyK > t.n_total""".stripMargin,

    // mirrors EventOps.scd2: same (ts, id) total order per key
    "ev_scd2" ->
      """SELECT user_id, event_id, event_type,
        |  ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
        |  CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |            IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM events""".stripMargin,

    // mirrors EventOps.hourlyAnomalies: mean/sd from EXACT integer sums
    // (identical double expressions over identical inputs → identical
    // rounding and threshold decisions in both engines)
    // I39: same journey strings (string_agg in the same exact order),
    // same regexes — kept to the Java/RE2-identical subset
    "ev_pattern" -> {
      val rules = StreamQueries.JourneyPatterns.map { case (n, re) =>
        s"SELECT '$n' AS pattern, " +
          s"sum(CASE WHEN regexp_matches(journey, '$re') THEN 1 ELSE 0 END)::bigint AS n_matched, " +
          "count(*) AS n_users FROM j"
      }.mkString("\nUNION ALL\n")
      s"""WITH j AS (
         |  SELECT user_id,
         |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey
         |  FROM events GROUP BY 1
         |)
         |SELECT pattern, n_matched,
         |  round(n_matched::double / n_users, 4) AS share
         |FROM ($rules)""".stripMargin
    },

    // I36: same distinct-first shape; the trailing window is the same
    // closed 7-day interval in both engines
    "ev_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
        |wau AS (
        |  SELECT d.d, count(DISTINCT u.user_id) AS wau
        |  FROM (SELECT DISTINCT day AS d FROM ud) d
        |  JOIN ud u ON u.day <= d.d AND u.day >= d.d - INTERVAL 6 DAY
        |  GROUP BY 1
        |)
        |SELECT dau.day, dau.dau, wau.wau,
        |  round(dau.dau::double / wau.wau, 4) AS stickiness
        |FROM dau JOIN wau ON dau.day = wau.d""".stripMargin,

    // I34: same weights, same drop-missing-lags normalization; the
    // weighted sums are exact binary-fraction arithmetic in both
    // engines, so round(…, 4) hashes identically
    "ev_ewma" -> {
      val ws = StreamQueries.EwmaWeights
      val lagCols = (1 until ws.size).map(k => s"lag(n, $k) OVER w AS n$k").mkString(",\n    ")
      val num = (s"n * ${ws.head}" +:
        (1 until ws.size).map(k => s"coalesce(n$k * ${ws(k)}, 0.0)")).mkString(" + ")
      val den = (s"${ws.head}" +:
        (1 until ws.size).map(k => s"CASE WHEN n$k IS NULL THEN 0.0 ELSE ${ws(k)} END")).mkString(" + ")
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
         |  FROM events GROUP BY 1, 2
         |), l AS (
         |  SELECT event_type, hour, n,
         |    $lagCols
         |  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hour)
         |)
         |SELECT event_type, hour, n, round(($num) / ($den), 4) AS ewma FROM l""".stripMargin
    },

    // mirrors evConversionLag: floor(epoch) second arithmetic, the
    // same first-view→first-at-or-after-purchase lag, quantile_cont
    "ev_conversion_lag" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, floor(epoch(ts))::bigint AS s FROM events
        |), v AS (
        |  SELECT user_id, min(s) AS first_view FROM ev
        |  WHERE event_type = 'view' GROUP BY 1
        |), lags AS (
        |  SELECT v.user_id, min(p.s) - v.first_view AS lag_s
        |  FROM v JOIN ev p ON p.user_id = v.user_id
        |    AND p.event_type = 'purchase' AND p.s >= v.first_view
        |  GROUP BY v.user_id, v.first_view
        |), agg AS (
        |  SELECT count(*) AS n_converted,
        |    quantile_cont(lag_s, [0.5, 0.9, 0.99]) AS pcts
        |  FROM lags
        |)
        |SELECT (SELECT count(*) FROM v) AS n_viewers, n_converted,
        |  round(n_converted::double / (SELECT count(*) FROM v), 4)
        |    AS conversion_rate,
        |  round(pcts[1], 1) AS lag_p50,
        |  round(pcts[2], 1) AS lag_p90,
        |  round(pcts[3], 1) AS lag_p99
        |FROM agg""".stripMargin,

    // mirrors evBitmapRetention: same one-long-per-user bit_or masks
    // (DuckDB's << / >> on bigint match Spark's shiftleft/shiftright
    // two's-complement semantics at these widths), same cohort probe
    "ev_bitmap_retention" ->
      s"""WITH ev AS (
         |  SELECT user_id, floor(epoch(ts))::bigint // 86400 AS abs_day
         |  FROM events
         |), d0 AS (SELECT min(abs_day) AS first_day FROM ev),
         |masks AS (
         |  SELECT user_id,
         |    bit_or((1::bigint << (abs_day - first_day)::int)) AS mask,
         |    min(abs_day - first_day) AS cohort_day
         |  FROM ev, d0
         |  WHERE abs_day - first_day < ${StreamQueries.BitmapDays}
         |  GROUP BY user_id
         |), probe AS (
         |  SELECT m.cohort_day, k.k, m.mask
         |  FROM masks m
         |  CROSS JOIN (SELECT unnest(range(${StreamQueries.BitmapDays}))::bigint AS k) k
         |  WHERE m.cohort_day + k.k < ${StreamQueries.BitmapDays}
         |)
         |SELECT cohort_day, k AS day_k, count(*) AS cohort_size,
         |  sum((mask >> (cohort_day + k)::int) & 1)::bigint AS active,
         |  round(sum((mask >> (cohort_day + k)::int) & 1)::double
         |        / count(*), 4) AS retention
         |FROM probe GROUP BY 1, 2""".stripMargin,

    // mirrors evRfm: floor(epoch) matches Spark's truncating
    // timestamp→long cast (events carry sub-second fractions); same
    // quintile thresholds from quantile_cont, same >/< tie rules
    "ev_rfm" ->
      """WITH u AS (
        |  SELECT user_id, max(floor(epoch(ts))::bigint) AS last_s,
        |    count(*) AS n_events,
        |    sum(CAST(round(value * 100) AS BIGINT))::bigint AS cents
        |  FROM events GROUP BY 1
        |), mx AS (SELECT max(floor(epoch(ts))::bigint) AS mx_s FROM events),
        |w AS (
        |  SELECT user_id, ((mx_s - last_s) // 86400)::bigint AS recency_days,
        |    n_events, cents
        |  FROM u, mx
        |), c AS (
        |  SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rc,
        |         quantile_cont(n_events, [0.2, 0.4, 0.6, 0.8]) AS fc,
        |         quantile_cont(cents, [0.2, 0.4, 0.6, 0.8]) AS mc
        |  FROM w
        |), s AS (
        |  SELECT user_id, recency_days, n_events, cents,
        |    1 + (recency_days < rc[1])::int + (recency_days < rc[2])::int
        |      + (recency_days < rc[3])::int + (recency_days < rc[4])::int AS r_score,
        |    1 + (n_events > fc[1])::int + (n_events > fc[2])::int
        |      + (n_events > fc[3])::int + (n_events > fc[4])::int AS f_score,
        |    1 + (cents > mc[1])::int + (cents > mc[2])::int
        |      + (cents > mc[3])::int + (cents > mc[4])::int AS m_score
        |  FROM w, c
        |)
        |SELECT user_id, recency_days, n_events, cents,
        |  r_score, f_score, m_score,
        |  r_score * 100 + f_score * 10 + m_score AS segment
        |FROM s""".stripMargin,

    // mirrors evCusum: the same scaled-integer closed form
    // S_t = C_t − min(0, min_{j≤t} C_j) with D_t = m·n_t − T, one
    // rounded division back to mean-units at the end
    "ev_cusum" ->
      s"""WITH hourly AS (
         |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
         |  FROM events GROUP BY 1, 2
         |), stats AS (
         |  SELECT event_type AS t, sum(n)::bigint AS t_total,
         |    count(*)::bigint AS m_hours
         |  FROM hourly GROUP BY 1
         |), w AS (
         |  SELECT h.event_type, h.hour, h.n,
         |    s.t_total,
         |    sum(h.n * s.m_hours - s.t_total) OVER (
         |      PARTITION BY h.event_type ORDER BY h.hour
         |      ROWS UNBOUNDED PRECEDING) AS c
         |  FROM hourly h JOIN stats s ON h.event_type = s.t
         |), s2 AS (
         |  SELECT event_type, hour, n, t_total,
         |    c - least(0, min(c) OVER (
         |      PARTITION BY event_type ORDER BY hour
         |      ROWS UNBOUNDED PRECEDING)) AS s
         |  FROM w
         |)
         |SELECT event_type, hour, n,
         |  round(s::double / t_total, 4) AS cusum_means,
         |  (s > ${StreamQueries.CusumMeans} * t_total)::int AS alarm
         |FROM s2""".stripMargin,

    "ev_anomaly" ->
      s"""WITH hourly AS (
         |  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
         |  FROM events GROUP BY 1, 2
         |), stats AS (
         |  SELECT event_type AS t,
         |    sum(n) AS s1, sum(n * n) AS s2, count(*) AS cnt
         |  FROM hourly GROUP BY 1 HAVING count(*) > 1
         |), sd AS (
         |  SELECT t, s1::DOUBLE / cnt AS mean_n,
         |    sqrt(greatest(0.0,
         |      (s2::DOUBLE - s1::DOUBLE * s1 / cnt) / (cnt - 1))) AS sd_n
         |  FROM stats
         |)
         |SELECT h.event_type, h.hour, h.n, round((h.n - mean_n) / sd_n, 4) AS z
         |FROM hourly h JOIN sd ON h.event_type = sd.t
         |WHERE sd_n > 0 AND abs((h.n - mean_n) / sd_n) >= ${StreamQueries.AnomalyZ}""".stripMargin,

    // each event belongs to exactly window/slide = 2 sliding windows:
    // start = 5-min bucket minus k·5min for k ∈ {0, 1}. Spark aligns
    // window starts to the 1970 epoch, DuckDB's time_bucket to
    // 2000-01-03 — both are multiples of 300 s, so the buckets agree.
    "ev_sliding" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts)
        |         - k * INTERVAL '5 minutes' AS window_start,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
        |GROUP BY 1, 2""".stripMargin,

    "ev_daily_topk" ->
      """WITH d AS (
        |  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n_events
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT day, event_type, n_events,
        |    row_number() OVER (PARTITION BY day
        |                       ORDER BY n_events DESC, event_type) AS rnk
        |  FROM d
        |)
        |SELECT day, event_type, n_events, rnk FROM r WHERE rnk <= 3""".stripMargin,

    // mirrors EventOps.transitionMatrix: (ts, event_id) total order per
    // user, lead() for the next type, then count + per-from share
    // mirrors evPowerUsers: same p99 threshold and strict > cut
    "ev_power_users" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n FROM events GROUP BY 1
        |), t AS (SELECT quantile_cont(n, 0.99) AS p99 FROM c)
        |SELECT count(*) AS n_users, sum(n)::bigint AS n_events,
        |  round(any_value(t.p99), 2) AS p99_events,
        |  sum((n > t.p99)::int)::bigint AS heavy_users,
        |  sum(CASE WHEN n > t.p99 THEN n ELSE 0 END)::bigint AS heavy_events,
        |  round(sum(CASE WHEN n > t.p99 THEN n ELSE 0 END)::double
        |        / sum(n), 4) AS heavy_share
        |FROM c CROSS JOIN t""".stripMargin,

    // mirrors evSeasonality: DuckDB dayofweek is 0-6 Sunday-first,
    // Spark's 1-7 Sunday-first — +1 aligns them; both sessions UTC
    "ev_seasonality" ->
      """WITH cell AS (
        |  SELECT event_type, dayofweek(ts)::int + 1 AS dow,
        |    hour(ts)::int AS hod, count(*) AS n
        |  FROM events GROUP BY 1, 2, 3
        |), tot AS (
        |  SELECT event_type, sum(n)::bigint AS n_type FROM cell GROUP BY 1
        |)
        |SELECT c.event_type, c.dow, c.hod, c.n,
        |  round(c.n::double / t.n_type, 5) AS share
        |FROM cell c JOIN tot t ON c.event_type = t.event_type""".stripMargin,

    // mirrors evLateness: running max by event_id order, the same
    // integer lateness and watermark-share cuts
    "ev_lateness" -> {
      val shares = StreamQueries.LatenessDelays.map(d =>
        s"round(sum((lateness > $d)::int)::double / count(*), 4) AS share_late_${d}s")
        .mkString(",\n  ")
      s"""WITH l AS (
         |  SELECT event_type,
         |    max(floor(epoch(ts))::bigint) OVER (
         |      PARTITION BY user_id ORDER BY event_id
         |      ROWS UNBOUNDED PRECEDING) - floor(epoch(ts))::bigint AS lateness
         |  FROM events
         |)
         |SELECT event_type, count(*) AS n_events,
         |  round(quantile_cont(lateness, 0.5), 1) AS lateness_p50,
         |  round(quantile_cont(lateness, 0.99), 1) AS lateness_p99,
         |  $shares
         |FROM l GROUP BY 1""".stripMargin
    },

    // mirrors evBotSignals: floor(epoch) gaps, the same bigint
    // variance identity and integer cv²<1/100 cut
    "ev_bot_signals" ->
      s"""WITH g AS (
         |  SELECT user_id,
         |    floor(epoch(ts))::bigint
         |      - lag(floor(epoch(ts))::bigint) OVER (
         |          PARTITION BY user_id ORDER BY ts, event_id) AS gap
         |  FROM events
         |), a AS (
         |  SELECT user_id, count(*) AS n_gaps,
         |    sum(gap)::bigint AS sx, sum(gap * gap)::bigint AS sxx,
         |    min(gap) AS min_gap, max(gap) AS max_gap
         |  FROM g WHERE gap IS NOT NULL GROUP BY 1
         |  HAVING count(*) >= ${StreamQueries.BotMinEvents} AND sum(gap) > 0
         |)
         |SELECT user_id, n_gaps, min_gap, max_gap,
         |  round(sqrt((n_gaps * sxx - sx * sx)::double) / sx, 4) AS gap_cv,
         |  (100 * (n_gaps * sxx - sx * sx) < sx * sx)::int AS bot_flag
         |FROM a""".stripMargin,

    // mirrors evStationary: the same unrounded P, uniform start,
    // MATERIALIZED per-round renormalized iteration (katz pattern)
    "ev_stationary" -> {
      val rounds = (1 to StationaryIters).map { i =>
        s"""r$i AS MATERIALIZED (
           |  SELECT p.to_type AS t, sum(pi${i - 1}.pi * p.pe) AS w
           |  FROM pi${i - 1} JOIN p ON p.from_type = pi${i - 1}.t
           |  JOIN st s2 ON s2.t = p.to_type
           |  GROUP BY 1
           |),
           |pi$i AS MATERIALIZED (
           |  SELECT t, w / (SELECT sum(w) FROM r$i) AS pi FROM r$i
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH j AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |                           ORDER BY ts, event_id) AS to_type
         |  FROM events
         |), c AS (
         |  SELECT from_type, to_type, count(*) AS n
         |  FROM j WHERE to_type IS NOT NULL GROUP BY 1, 2
         |), tot AS (SELECT from_type, sum(n)::bigint AS tot FROM c GROUP BY 1),
         |p AS (
         |  SELECT c.from_type, c.to_type, c.n::double / t.tot AS pe
         |  FROM c JOIN tot t ON c.from_type = t.from_type
         |), st AS (SELECT DISTINCT from_type AS t FROM c),
         |n AS (SELECT count(*) AS nt FROM st),
         |pi0 AS MATERIALIZED (SELECT t, 1.0 / nt AS pi FROM st, n),
         |$rounds
         |SELECT t AS event_type, round(pi, 6) AS pi FROM pi$StationaryIters""".stripMargin
    },

    "ev_markov" ->
      """WITH j AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS to_type
        |  FROM events
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS n_transitions
        |  FROM j WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n_transitions,
        |  round(n_transitions::double
        |        / (sum(n_transitions) OVER (PARTITION BY from_type))::bigint, 4) AS prob
        |FROM c""".stripMargin,

    // the K15 custom merge operator answers the identical question
    "ev_asof_exec" -> asofOracleSql,

    // string-keyed K15 face: identical question, key = 'u' || user_id
    "ev_asof_str" -> asofOracleSqlKeyed("'u' || user_id", "user_key"),

    // I28: exact face of the hour-over-hour overlap (distinct
    // (hour, user) self-join at +1 hour); est_ok is the constant 1
    // the in-plan theta flags must hit
    "ev_hourly_overlap" ->
      """WITH hu AS MATERIALIZED (
        |  SELECT DISTINCT date_trunc('hour', ts) AS hour, user_id FROM events
        |), n AS (SELECT hour, count(*) AS n_users FROM hu GROUP BY 1),
        |ov AS (
        |  SELECT a.hour, count(*) AS next_overlap
        |  FROM hu a JOIN hu b ON a.user_id = b.user_id
        |    AND b.hour = a.hour + INTERVAL 1 HOUR
        |  GROUP BY 1
        |)
        |SELECT n.hour, n.n_users::bigint AS n_users,
        |  coalesce(ov.next_overlap, 0)::bigint AS next_overlap,
        |  1 AS est_ok
        |FROM n JOIN n nx ON nx.hour = n.hour + INTERVAL 1 HOUR
        |LEFT JOIN ov ON ov.hour = n.hour""".stripMargin,

    // tolerance leg: the unbounded answer with matches staler than
    // the window nulled — the most-recent row is the ONLY candidate,
    // so bounding ≡ post-nulling the unbounded result
    "ev_asof_tol" ->
      s"""WITH base AS ($asofOracleSql)
         |SELECT user_id, left_id, left_ts, value,
         |  CASE WHEN left_ts - right_ts <= INTERVAL 1 DAY
         |    THEN right_id END AS right_id,
         |  CASE WHEN left_ts - right_ts <= INTERVAL 1 DAY
         |    THEN right_ts END AS right_ts
         |FROM base""".stripMargin,

    // mirrors evQhistHourly cell for cell: bin = clamped
    // floor((value − lo)/w) is a pure deterministic double function
    // (w = 16 exact), merge is vector add — the I23 values-not-bounds
    // convention for the quantile sketch
    "ev_qhist_hourly" ->
      s"""SELECT date_trunc('hour', ts) AS hour,
         |  least(${QhBins - 1}, greatest(0,
         |    floor((value - $QhLo) / ${(QhHi - QhLo) / QhBins})))::int AS bin,
         |  count(*) AS cnt
         |FROM events
         |GROUP BY 1, 2""".stripMargin,

    // quantile_cont shares percentile()'s lower + (upper−lower)·frac
    // interpolation at rank p·(n−1); round-4 absorbs ulp
    "ev_value_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY 1""".stripMargin,
  )
}
