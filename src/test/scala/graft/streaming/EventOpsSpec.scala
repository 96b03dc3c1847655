package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def ev(rows: (Long, Long, String, Long, Double)*) =
    rows.toDF("event_id", "user_id", "event_type", "sec", "value")
      .withColumn("ts", col("sec").cast("timestamp")).drop("sec")

  test("asOfJoin picks the latest right row at-or-before each left row") {
    val events = ev(
      (1L, 7L, "click", 10L, 0.0),
      (2L, 7L, "click", 20L, 0.0),
      (3L, 7L, "purchase", 25L, 9.5), // matches click 2 (ts 20)
      (4L, 7L, "purchase", 5L, 1.0),  // before any click -> null
      (5L, 8L, "purchase", 30L, 2.0)) // other user, no clicks -> null
    val out = EventOps.asOfJoin(
      events.filter(col("event_type") === "purchase"),
      events.filter(col("event_type") === "click"),
      "user_id", "ts", "event_id", "value")
      .orderBy("left_id")
      .select("left_id", "right_id").as[(Long, Option[Long])].collect().toSeq
    assert(out == Seq((3L, Some(2L)), (4L, None), (5L, None)))
  }

  test("asOfJoin ties: same-instant right matches; equal-ts rights dedup to max id") {
    val events = ev(
      (1L, 7L, "click", 10L, 0.0),
      (6L, 7L, "click", 10L, 0.0),    // same ts as click 1 -> max id 6 wins
      (3L, 7L, "purchase", 10L, 9.5)) // same instant as the clicks -> matched
    val out = EventOps.asOfJoin(
      events.filter(col("event_type") === "purchase"),
      events.filter(col("event_type") === "click"),
      "user_id", "ts", "event_id", "value")
      .select("left_id", "right_id").as[(Long, Option[Long])].collect().toSeq
    assert(out == Seq((3L, Some(6L))))
  }

  test("retention cohorts by first signup week; pre-signup weeks excluded") {
    // week epochs: Mon 2024-01-01, 2024-01-08, 2024-01-15 (UTC)
    def at(day: String, h: Int) = java.sql.Timestamp.valueOf(s"$day 0$h:00:00")
    val events = Seq(
      // user 1 signs up wk0, active wk0 + wk2
      (1L, 1L, "signup", at("2024-01-03", 1), 0.0),
      (2L, 1L, "click", at("2024-01-17", 2), 0.0),
      // user 2: activity BEFORE signup (wk0), signup wk1, active wk1
      (3L, 2L, "view", at("2024-01-04", 1), 0.0),
      (4L, 2L, "signup", at("2024-01-10", 1), 0.0),
      // user 3: never signs up -> no cohort
      (5L, 3L, "click", at("2024-01-05", 1), 0.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = EventOps.retention(events, "signup")
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Int, Long)].collect().toSet
    assert(out == Set(
      ("2024-01-01 00:00:00", 0, 1L), // user 1 wk0
      ("2024-01-01 00:00:00", 2, 1L), // user 1 wk2
      ("2024-01-08 00:00:00", 0, 1L))) // user 2 wk1; their wk0 view dropped
  }

  test("funnel enforces step order with first-touch anchors") {
    val events = ev(
      // user 1: full ordered funnel
      (1L, 1L, "signup", 1L, 0.0), (2L, 1L, "view", 2L, 0.0),
      (3L, 1L, "click", 3L, 0.0), (4L, 1L, "purchase", 4L, 1.0),
      // user 2: viewed BEFORE signup, never after -> drops at step 2
      (5L, 2L, "view", 1L, 0.0), (6L, 2L, "signup", 2L, 0.0),
      (7L, 2L, "click", 3L, 0.0),
      // user 3: signup only
      (8L, 3L, "signup", 1L, 0.0))
    val out = EventOps.funnel(events, Seq("signup", "view", "click", "purchase"))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "signup", 3L), (2, "view", 1L),
      (3, "click", 1L), (4, "purchase", 1L)))
  }

  test("funnel first-touch anchor: a later re-view cannot resurrect ordering") {
    // user performs view(1) signup(2) view(5) click(3): click precedes
    // the post-signup view(5), so step 3 must NOT count them
    val events = ev(
      (1L, 1L, "view", 1L, 0.0), (2L, 1L, "signup", 2L, 0.0),
      (3L, 1L, "click", 3L, 0.0), (4L, 1L, "view", 5L, 0.0))
    val out = EventOps.funnel(events, Seq("signup", "view", "click"))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "signup", 1L), (2, "view", 1L), (3, "click", 0L)))
  }

  test("scd2 builds half-open validity intervals; equal-ts updates version by id") {
    val log = ev(
      (1L, 7L, "a", 10L, 0.0), (2L, 7L, "b", 20L, 0.0), // a valid [10,20)
      (3L, 7L, "c", 20L, 0.0),  // equal-ts: b [20,20) then c current
      (4L, 8L, "x", 5L, 0.0))   // single-version key: current from the start
    val out = EventOps.scd2(log, "user_id", "ts", "event_id")
      .select(col("event_id"), col("valid_from").cast("long"),
        col("valid_to").cast("long"), col("version"), col("is_current"))
      .as[(Long, Long, Option[Long], Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((10L, Some(20L), 1, 0)))
    assert(out(2L) == ((20L, Some(20L), 2, 0))) // zero-width, still versioned
    assert(out(3L) == ((20L, None, 3, 1)))
    assert(out(4L) == ((5L, None, 1, 1)))
  }

  test("multi-touch shares: U-shape endpoints, middle split, n=1/n=2 conventions") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(m * 60000L)
    // purchase 100: 4 clicks → 0.4 / 0.1 / 0.1 / 0.4; purchase 200:
    // 1 click → 1.0; purchase 300: 2 clicks → 0.5 each
    val pairs = Seq(
      (1L, 100L, 11L, t(0)), (1L, 100L, 12L, t(1)),
      (1L, 100L, 13L, t(2)), (1L, 100L, 14L, t(3)),
      (2L, 200L, 21L, t(0)),
      (3L, 300L, 31L, t(0)), (3L, 300L, 32L, t(1)),
    ).toDF("user_id", "purchase_id", "click_id", "click_ts")
    val out = StreamQueries.multiTouchShares(pairs).collect()
      .map(r => r.getLong(2) -> ((r.getInt(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))).toMap
    assert(out(11L) == ((1, 4L, 0.25, 0.4)) && out(14L) == ((4, 4L, 0.25, 0.4)))
    assert(out(12L) == ((2, 4L, 0.25, 0.1)) && out(13L) == ((3, 4L, 0.25, 0.1)),
      s"middles split the 20%: $out")
    assert(out(21L) == ((1, 1L, 1.0, 1.0)))
    assert(out(31L) == ((1, 2L, 0.5, 0.5)) && out(32L) == ((2, 2L, 0.5, 0.5)))
  }

  test("latestByKey keeps one row per key; equal-ts ties resolve by max id") {
    val log = ev(
      (1L, 1L, "a", 10L, 1.0), (2L, 1L, "b", 20L, 2.0),
      // user 2: two updates at the SAME ts — id 5 must win
      (4L, 2L, "c", 30L, 3.0), (5L, 2L, "d", 30L, 4.0),
      (3L, 2L, "e", 20L, 5.0))
    val out = EventOps.latestByKey(log, "user_id", "ts", "event_id")
      .select("user_id", "event_id", "event_type")
      .as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 2L, "b"), (2L, 5L, "d")))
  }

  test("transitionMatrix counts consecutive pairs per user; equal-ts order by id") {
    val events = ev(
      // user 1: view -> click -> purchase
      (1L, 1L, "view", 10L, 0.0), (2L, 1L, "click", 20L, 0.0),
      (3L, 1L, "purchase", 30L, 0.0),
      // user 2: view -> click at the SAME ts (id order decides), then view
      (4L, 2L, "view", 10L, 0.0), (5L, 2L, "click", 10L, 0.0),
      (6L, 2L, "view", 20L, 0.0),
      // user 3: single event -> no transitions
      (7L, 3L, "view", 10L, 0.0))
    val out = EventOps.transitionMatrix(events, "user_id", "ts", "event_id", "event_type")
      .as[(String, String, Long, Double)].collect().toSet
    assert(out == Set(
      ("view", "click", 2L, 1.0),      // both users transition view->click
      ("click", "purchase", 1L, 0.5),
      ("click", "view", 1L, 0.5)))
  }

  test("I40 CUSUM closed form equals the direct max(0, S+d) recursion on the real stream") {
    val out = StreamQueries.evCusum(spark, sfDir)
      .select("event_type", "hour", "cusum_means", "alarm")
      .as[(String, Timestamp, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime)).toMap
    // recompute from first principles: hourly counts per type, then
    // the textbook recursion in exact integers (the same m-scaling)
    val hourly = graft.Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(Timestamp, String, Long)].collect()
      .groupBy(_._2).view.mapValues(_.sortBy(_._1.getTime)).toMap
    assert(out.keySet == hourly.keySet && out.nonEmpty)
    hourly.foreach { case (t, rows) =>
      val m = rows.size.toLong
      val total = rows.map(_._3).sum
      var s = 0L
      val expect = rows.map { case (_, _, n) =>
        s = math.max(0L, s + (n * m - total))
        // Spark round() = BigDecimal.valueOf + HALF_UP; replicate it
        (java.math.BigDecimal.valueOf(s.toDouble / total)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue,
          if (s > StreamQueries.CusumMeans * total) 1 else 0)
      }
      val got = out(t).map(r => (r._3, r._4)).toSeq
      assert(got == expect.toSeq, s"type $t diverges from the recursion")
    }
  }

  test("I42 bitmap retention: day-0 retention is exactly 1.0 for every cohort") {
    val rows = StreamQueries.evBitmapRetention(spark, sfDir)
      .select("cohort_day", "day_k", "cohort_size", "active", "retention")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // the cohort-day bit is set by definition of the cohort
    rows.filter(_._2 == 0L).foreach { case (c, _, size, active, r) =>
      assert(active == size && r == 1.0, s"cohort $c day-0 must be full")
    }
    // masks only shrink availability: active never exceeds cohort size
    rows.foreach { case (c, k, size, active, _) =>
      assert(active <= size, s"cohort $c day $k overcounts")
    }
  }

  test("hourlyAnomalies flags only the spike hour; constant series drop out") {
    // type x: five 1-event hours + one 12-event hour → only the spike
    // has |z| >= 2; type y is constant (sd = 0) → excluded entirely
    val rows = Seq.newBuilder[(Long, Long, String, Long, Double)]
    var id = 0L
    for (h <- 0 until 5) { id += 1; rows += ((id, 1L, "x", h * 3600L, 0.0)) }
    for (_ <- 0 until 12) { id += 1; rows += ((id, 1L, "x", 5 * 3600L, 0.0)) }
    for (h <- 0 until 4) { id += 1; rows += ((id, 1L, "y", h * 3600L, 0.0)) }
    val out = EventOps.hourlyAnomalies(ev(rows.result(): _*), zThreshold = 2.0)
      .select("event_type", "n", "z")
      .as[(String, Long, Double)].collect().toSeq
    assert(out.length == 1)
    val (t, n, z) = out.head
    assert(t == "x" && n == 12L && z > 2.0)
  }
}
