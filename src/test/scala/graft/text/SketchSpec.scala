package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Mergeable-sketch surface for corpus statistics at 100 TB: Spark's
  * built-in Apache DataSketches HLL functions (the Spark-first answer —
  * no custom sketch code needed). Sketches serialize to binary, so
  * per-partition/per-day sketches can be stored and unioned later —
  * the pattern exact distinct counts cannot scale to.
  */
class SketchSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.01"

  test("HLL sketch estimates distinct tokens within error bound, and sketches merge") {
    val toks = Tables.documents(spark, docs)
      .select(col("source"), explode(split(trim(col("text")), " +")).as("t"))
      .cache()
    val exact = toks.select(countDistinct(col("t"))).first().getLong(0)
    // per-source sketches → union → estimate (the scale path)
    val perSource = toks.groupBy("source")
      .agg(hll_sketch_agg(col("t")).as("sk"))
    val merged = perSource.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .first().getLong(0)
    val relErr = math.abs(merged - exact).toDouble / exact
    assert(relErr < 0.05, s"HLL union estimate $merged vs exact $exact (err $relErr)")
    // single-pass estimate agrees with the merged-sketch estimate
    val direct = toks.select(hll_sketch_estimate(hll_sketch_agg(col("t"))))
      .first().getLong(0)
    assert(direct == merged, "sketch union must equal single-pass sketch")
    toks.unpersist()
  }

  test("K16 theta sketch: exact below k, sampling accuracy above, set ops (r11)") {
    import spark.implicits._
    graft.functions.VectorFunctions.ensureRegistered(spark)
    // exact mode: 100 distinct values across 8 partitions → the
    // estimate is EXACTLY 100 (theta holds raw hashes below 2^lgK),
    // and merge order across partitions cannot change a hash set
    val small = spark.range(0, 300).select((col("id") % 100).as("v"))
      .repartition(8)
    val smallEst = small.agg(
      call_function("graft_theta_estimate",
        call_function("graft_theta", col("v").cast("string")))).first().getDouble(0)
    assert(smallEst == 100.0, s"exact mode must be exact: $smallEst")
    // sampling mode: 40k distinct > 2^12 nominal entries → ±1/√k
    // relative error territory; bound loosely at 5%
    val big = spark.range(0, 40000).select(col("id").cast("string").as("v"))
      .repartition(8)
    val bigEst = big.agg(
      call_function("graft_theta_estimate",
        call_function("graft_theta", col("v")))).first().getDouble(0)
    assert(math.abs(bigEst - 40000) / 40000 < 0.05, s"sampling estimate: $bigEst")
    // set ops: A = [0, 24k), B = [16k, 40k) → ∩ 8k, ∪ 40k — the
    // question HLL cannot answer from two sketches
    val tagged = spark.range(0, 40000).select(col("id"),
        when(col("id") < 24000, "a").otherwise(null).as("ga"),
        when(col("id") >= 16000, "b").otherwise(null).as("gb"))
    val sks = tagged.agg(
      call_function("graft_theta",
        when(col("ga").isNotNull, col("id").cast("string"))).as("ska"),
      call_function("graft_theta",
        when(col("gb").isNotNull, col("id").cast("string"))).as("skb"))
    val r = sks.select(
      call_function("graft_theta_intersect", col("ska"), col("skb")),
      call_function("graft_theta_union_est", col("ska"), col("skb"))).first()
    assert(math.abs(r.getDouble(0) - 8000) / 8000 < 0.10,
      s"intersection estimate: ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 40000) / 40000 < 0.05,
      s"union estimate: ${r.getDouble(1)}")
  }

  test("K13 Count-Min sketch: exact counters, merge-order independence, one-sided error") {
    import spark.implicits._
    import graft.functions.{CountMin, VectorFunctions}
    val depth = 4; val width = 64
    // skewed multiset with a long tail so some buckets collide
    val rows = (Seq.fill(500)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 200).map(i => s"tail$i"))
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = rows.toDF("item")
    val sk = df.repartition(8)
      .select(VectorFunctions.cms(spark, col("item"), depth, width).as("s"))
      .as[Seq[Long]].first()
    // the sketch is a deterministic function of the multiset: an
    // independent recomputation (same md5 row-hash) matches exactly,
    // and so does a single-partition pass (merge-order independence)
    val expected = new Array[Long](depth * width)
    rows.foreach(it => (0 until depth).foreach(r =>
      expected(r * width + CountMin.bucket(r, it, width)) += 1))
    assert(sk == expected.toSeq, "counters must equal the reference build")
    val sk1 = df.repartition(1)
      .select(VectorFunctions.cms(spark, col("item"), depth, width).as("s"))
      .as[Seq[Long]].first()
    assert(sk1 == sk, "partitioned merge must equal single-pass")
    // one-sided error: estimate >= true for EVERY item, and the hot
    // items (far above the eN/width noise floor) estimate exactly
    exact.foreach { case (it, c) =>
      assert(CountMin.estimate(sk, depth, width, it) >= c, s"undercount on $it")
    }
    assert(CountMin.estimate(sk, depth, width, "hot") < 500 + rows.size,
      "trivial upper bound")
  }

  test("K9 Misra-Gries top-k sketch honors the frequency and error guarantees") {
    import spark.implicits._
    // skewed stream: hot 3000, warm 1500, 100 tail items x 55 = 5500;
    // N = 10000, k = 20 -> error bound N/k = 500
    val n = 10000
    val k = 20
    val items = Seq.fill(3000)("hot") ++ Seq.fill(1500)("warm") ++
      (0 until 5500).map(i => s"tail_${i % 100}")
    val df = items.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "item").repartition(7, col("id")) // force partial buffers + merges
    val sketch = df.agg(
      graft.functions.VectorFunctions.topk(spark, col("item"), k).as("sk"))
      .first().getMap[String, Long](0)
    assert(sketch.size <= k)
    // guarantee 1: any item with true freq > N/k must be present
    assert(sketch.contains("hot") && sketch.contains("warm"),
      s"heavy items missing from $sketch")
    // guarantee 2: estimates undercount by at most N/k
    assert(sketch("hot") <= 3000 && sketch("hot") >= 3000 - n / k, s"hot=${sketch("hot")}")
    assert(sketch("warm") <= 1500 && sketch("warm") >= 1500 - n / k, s"warm=${sketch("warm")}")
    // tail items (freq 55 << N/k) may appear but never overcount
    sketch.toMap.foreach { case (kk, c) =>
      if (kk.startsWith("tail_")) assert(c <= 55, s"$kk overcounted: $c")
    }
    // grouped: per-source sketches hold the guarantee per group
    val grouped = df.withColumn("g", col("id") % 2)
      .groupBy("g")
      .agg(graft.functions.VectorFunctions.topk(spark, col("item"), k).as("sk"))
      .collect()
    grouped.foreach { r =>
      val m = r.getMap[String, Long](1)
      assert(m.contains("hot"), s"per-group sketch lost the heavy item: $m")
    }
  }

  test("I24 windowed MG candidates cover every per-hour heavy hitter with bounded undercount") {
    import org.apache.spark.sql.functions._
    // k deliberately SMALL so the decrement/merge-trim paths fire on
    // real per-hour groups — this is the guarantee-under-pressure
    // check the exact-at-sparse driver oracle can't exercise
    val k = 3
    // sf0.01, not the default sf0.001: pressure needs per-hour groups
    // with more than k distinct users, which the smallest SF never has
    val events = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val exact = events
      .groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(r => (r.getTimestamp(0), r.getString(1)))
    val cand = graft.streaming.Streaming
      .hourlyTopKCandidates(events, k).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getMap[String, Long](2))
      .toMap
    assert(exact.nonEmpty && exact.keySet == cand.keySet)
    var pressured = 0
    exact.foreach { case (key, rows) =>
      val total = rows.map(_.getLong(3)).sum
      val bound = total.toDouble / k
      if (rows.size > k) pressured += 1
      rows.foreach { r =>
        val (u, n) = (r.getLong(2).toString, r.getLong(3))
        val est = cand(key).get(u)
        // coverage: freq > N/k must be present
        if (n > bound) assert(est.isDefined,
          s"user $u of $key with n=$n > N/k=$bound missing from ${cand(key)}")
        // one-sided bounded error on every surviving candidate
        est.foreach(e => assert(e <= n && n - e <= bound,
          s"estimate $e for $u of $key outside [${n - bound}, $n]"))
      }
    }
    assert(pressured > 0,
      s"fixture too sparse: no (hour, type) group exceeded k=$k users")
  }

  test("K9 sketch candidates cover every exact heavy hitter on the real events table") {
    import org.apache.spark.sql.functions._
    val k = 20
    val events = graft.Tables.events(spark, sfDir)
    // exact per-type counts from the ORACLED I21 query's grouping
    val exact = events.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0))
    val totals = exact.view.mapValues(_.map(_.getLong(2)).sum).toMap
    val sketch = events
      .groupBy("event_type")
      .agg(graft.functions.VectorFunctions
        .topk(spark, col("user_id").cast("string"), k).as("cand"))
      .collect()
      .map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
    exact.foreach { case (tpe, rows) =>
      val bound = totals(tpe).toDouble / k
      val mustHave = rows.filter(_.getLong(2) > bound).map(_.getLong(1).toString)
      assert(mustHave.nonEmpty || rows.nonEmpty)
      mustHave.foreach { u =>
        assert(sketch(tpe).contains(u),
          s"user $u of $tpe above N/k=$bound missing from ${sketch(tpe).keys}")
      }
    }
  }
}
