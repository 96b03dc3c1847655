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
}
