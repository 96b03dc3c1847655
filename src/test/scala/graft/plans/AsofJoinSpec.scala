package graft.plans

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def findAsof(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: AsofJoinExec => 1 + p.children.map(walk).sum
      case _ => p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  private def fixture = {
    // user 1: clicks at 10, 20, 35; purchases at 5 (no match),
    //   20 (tie → the t=20 click), 30 (→ t=20), 40 (→ t=35)
    // user 2: no clicks at all → all-null right side
    // user 3: click at 100 only AFTER its purchase at 50 → null
    val left = Seq((1L, 101L, ts(5), 1.0), (1L, 102L, ts(20), 2.0),
      (1L, 103L, ts(30), 3.0), (1L, 104L, ts(40), 4.0),
      (2L, 201L, ts(25), 5.0), (3L, 301L, ts(50), 6.0))
      .toDF("user_id", "left_id", "left_ts", "value")
    val right = Seq((1L, 11L, ts(10)), (1L, 12L, ts(20)), (1L, 13L, ts(35)),
      (3L, 31L, ts(100)))
      .toDF("r_key", "right_id", "right_ts")
    (left, right)
  }

  test("K15 merge exec matches the hand-computed as-of result and plans as AsofJoinExec") {
    val (left, right) = fixture
    val out = AsofJoin.join(left, right,
      col("user_id"), col("r_key"), col("left_ts"), col("right_ts"))
      .select(col("left_id"), col("right_id"), col("right_ts"))
    assert(findAsof(out) == 1, "the custom exec must be in the executed plan")
    val got = out.collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getTimestamp(2)))))
      .toMap
    assert(got(101L).isEmpty, "purchase before any click")
    assert(got(102L).contains((12L, ts(20))), "equal-ts click matches (<=)")
    assert(got(103L).contains((12L, ts(20))))
    assert(got(104L).contains((13L, ts(35))))
    assert(got(201L).isEmpty, "user with no clicks")
    assert(got(301L).isEmpty, "click only after the purchase")
  }

  test("K15 merge exec ≡ the I7 union+window composition on real events") {
    val ev = graft.Tables.events(spark, sfDir)
    val viaWindow = graft.streaming.EventOps.asOfJoin(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"),
        "user_id", "ts", "event_id", "value")
      .collect().map(_.toString).toSet
    val viaExec = graft.streaming.StreamQueries.evAsofExec(spark, sfDir)
      .collect().map(_.toString).toSet
    assert(viaExec.nonEmpty && viaExec == viaWindow)
  }

  test("K15 exec output survives a bare collect (UnsafeRow contract)") {
    val (left, right) = fixture
    // NO projection on top: executeCollect's byte-array RDD casts
    // rows to UnsafeRow, so the exec must emit unsafe rows itself
    val rows = AsofJoin.join(left, right,
      col("user_id"), col("r_key"), col("left_ts"), col("right_ts"))
      .collect()
    assert(rows.length == 6)
  }

  test("K15 inner-converted marker join keeps latest-match semantics") {
    val (left, right) = fixture
    // the null-intolerant filter on a right column lets
    // EliminateOuterJoin convert the marker join to Inner — the
    // strategy must still plan the merge (plus a not-null filter),
    // never a multi-match inner join
    val out = AsofJoin.join(left, right,
      col("user_id"), col("r_key"), col("left_ts"), col("right_ts"))
      .filter(col("right_id") > 0L)
      .select(col("left_id"), col("right_id"))
    assert(findAsof(out) == 1, "inner-converted shape must still merge")
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(102L -> 12L, 103L -> 12L, 104L -> 13L),
      s"one latest match per left row, unmatched dropped: $got")
  }

  test("K15 tolerance nulls stale matches per left row but keeps the candidate buffered") {
    val (left, right) = fixture
    // tol = 12s: purchase@20 matches click@20 (Δ0) and click@20 also
    // still serves purchase@30 (Δ10 ≤ 12) but NOT purchase@40 via
    // click@35 (Δ5 ≤ 12 — fresh right row rescued it); tighten to 4s:
    // purchase@30 goes stale (Δ10 > 4) while purchase@40 keeps
    // click@35 (Δ5 > 4 → also stale)
    def run(tolSec: Long) = AsofJoin.join(left, right,
        col("user_id"), col("r_key"), col("left_ts"), col("right_ts"),
        tolMicros = tolSec * 1000000L)
      .select(col("left_id"), col("right_id")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val wide = run(12)
    assert(wide(102L) == 12L && wide(103L) == 12L && wide(104L) == 13L,
      s"all within 12s: $wide")
    val tight = run(4)
    assert(tight(102L) == 12L, "equal-ts match is Δ0")
    assert(tight(103L) == -1L, "Δ10 > 4s must null, not fall back to older rows")
    assert(tight(104L) == -1L, "Δ5 > 4s must null")
    assert(tight(101L) == -1L && tight(201L) == -1L && tight(301L) == -1L)
  }

  test("K15 composite keys: (tenant, user) pairs do not cross-match") {
    // same user id under two tenants: the single-key join would
    // leak tenant A's click into tenant B's purchase
    val left = Seq((1L, 7L, 501L, ts(20)), (2L, 7L, 502L, ts(20)))
      .toDF("tenant", "user_id", "left_id", "left_ts")
    val right = Seq((1L, 7L, 11L, ts(10)), (2L, 7L, 22L, ts(15)))
      .toDF("r_tenant", "r_user", "right_id", "right_ts")
    val out = AsofJoin.joinMulti(left, right,
        Seq(col("tenant"), col("user_id")), Seq(col("r_tenant"), col("r_user")),
        col("left_ts"), col("right_ts"))
      .select(col("left_id"), col("right_id"))
    assert(findAsof(out) == 1)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(501L -> 11L, 502L -> 22L),
      s"each tenant must match only its own clicks: $got")
  }

  test("K15 randomized parity: merge exec ≡ union+window composition incl. ties") {
    // seeded generator: dense key space + coarse timestamps force key
    // collisions, ts ties (left==right and right==right), and empty
    // sides — the merge's edge geometry — while staying reproducible
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val nL = 20 + rnd.nextInt(60)
      val nR = rnd.nextInt(80)
      val lefts = (1 to nL).map(i =>
        (rnd.nextInt(6).toLong, 1000L + i, ts(rnd.nextInt(50)), rnd.nextDouble()))
      val rights = (1 to nR).map(i =>
        (rnd.nextInt(6).toLong, 2000L + i, ts(rnd.nextInt(50)), 0.0))
      val left = lefts.toDF("user_id", "event_id", "ts", "value")
      val right = rights.toDF("user_id", "event_id", "ts", "value")
      val viaWindow = graft.streaming.EventOps
        .asOfJoin(left, right, "user_id", "ts", "event_id", "value")
        .collect().map(_.toString).toSet
      val dedupedRight = right.groupBy(col("user_id").as("r_key"),
          col("ts").as("right_ts"))
        .agg(max(col("event_id")).as("right_id"))
      val viaExec = AsofJoin.join(
          left.select(col("user_id"), col("event_id").as("left_id"),
            col("ts").as("left_ts"), col("value")),
          dedupedRight,
          col("user_id"), col("r_key"), col("left_ts"), col("right_ts"))
        .select(col("user_id"), col("left_id"), col("left_ts"),
          col("value"), col("right_id"), col("right_ts"))
        .collect().map(_.toString).toSet
      assert(viaExec == viaWindow,
        s"trial $trial (nL=$nL nR=$nR): ${(viaExec diff viaWindow).take(3)} vs ${(viaWindow diff viaExec).take(3)}")
    }
  }

  test("K15 string keys plan through the merge and match per key (r11)") {
    // same fixture geometry as the long-keyed test, keys as strings —
    // the exec's UnsafeProjection + natural-ordering key compare must
    // merge them identically (and "10" < "9" lexicographically, so a
    // numeric-compare regression would mis-merge u10 vs u9)
    val left = Seq(("u10", 101L, ts(5)), ("u10", 102L, ts(20)),
      ("u9", 201L, ts(25)), ("u9", 202L, ts(40)))
      .toDF("user_key", "left_id", "left_ts")
    val right = Seq(("u10", 11L, ts(10)), ("u9", 91L, ts(30)))
      .toDF("r_key", "right_id", "right_ts")
    val out = AsofJoin.join(left, right,
      col("user_key"), col("r_key"), col("left_ts"), col("right_ts"))
      .select(col("left_id"), col("right_id"))
    assert(findAsof(out) == 1, "string-keyed marker join must plan the merge")
    val got = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(101L -> -1L, 102L -> 11L, 201L -> -1L, 202L -> 91L),
      s"got $got")
  }

  test("K15 mixed TIMESTAMP/TIMESTAMP_NTZ sides plan and compare as micros (r11)") {
    val left = Seq((1L, 101L, ts(5)), (1L, 102L, ts(20)))
      .toDF("user_id", "left_id", "left_ts")
    val right = Seq((1L, 11L, ts(10)))
      .toDF("r_key", "right_id", "right_ts")
      .withColumn("right_ts", col("right_ts").cast("timestamp_ntz"))
    val out = AsofJoin.join(left, right,
      col("user_id"), col("r_key"), col("left_ts"), col("right_ts"))
      .select(col("left_id"), col("right_id"))
    assert(findAsof(out) == 1, "NTZ-mixed marker join must plan the merge")
    val got = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // session TZ is UTC, so instant-micros == wall-clock-micros here
    assert(got == Map(101L -> -1L, 102L -> 11L), s"got $got")
  }

  test("K15 strategy refuses unsupported key types loudly (r11)") {
    val left = Seq((1.5, 101L, ts(5))).toDF("k", "left_id", "left_ts")
    val right = Seq((1.5, 11L, ts(1))).toDF("rk", "right_id", "right_ts")
    val bad = intercept[Exception] {
      AsofJoin.join(left, right,
        col("k"), col("rk"), col("left_ts"), col("right_ts")).collect()
    }
    assert(bad.getMessage.contains("int/long/string/date"),
      s"double keys must refuse, got: ${bad.getMessage}")
  }

  test("K15 strategy refuses a marker join it cannot plan correctly") {
    val (left, right) = fixture
    val bad = intercept[Exception] {
      // a CROSS-SIDE extra conjunct the merge cannot honor — and one
      // the optimizer cannot push out of a left-outer join condition
      // (a single-side conjunct WOULD be legally pushed into the
      // right child, leaving a plannable marker join) → must throw,
      // not silently fall back to multi-match outer-join semantics
      AsofJoin.ensureInstalled(spark)
      graft.functions.VectorFunctions.ensureRegistered(spark)
      left.join(right,
        col("user_id") === col("r_key") &&
          call_function("graft_asof_match", col("left_ts"), col("right_ts")) &&
          col("left_id") > col("right_id"), "left_outer")
        .collect()
    }
    assert(bad.getMessage != null)
  }
}
