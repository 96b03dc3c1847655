package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational/OLAP core — the headline bench queries (SURVEY §2 D).
  *
  * Shapes chosen for scale behavior: D1 is a pure map-side-combinable
  * aggregation; D2/D3 are star joins where every dimension side is
  * broadcast-able (hinted explicitly so the plan survives stats loss at
  * 100 TB); D4 is a partitioned window; D6 is a broadcast anti join.
  */
object Relational {

  /** D1 — TPC-H Q1-style pricing summary. Partial aggregation does the
    * heavy lifting map-side; 6 output groups regardless of input size. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** D2 — TPC-H Q3-style: top-10 undelivered orders by revenue for one
    * market segment. customer is the small side → broadcast. */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-30").cast("timestamp")
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).as("rev"))
      .orderBy(col("rev").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), round(col("rev"), 2).as("revenue"),
        col("o_orderdate"), col("o_orderpriority"))
  }

  /** D3 — TPC-H Q5-style: revenue by nation for one region/year where the
    * supplying nation is the customer nation. nation/region/supplier are
    * broadcast; the orders⋈lineitem shuffle carries only 3 columns. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    // nation/region are genuinely tiny → broadcast. supplier/customer
    // scale with SF → leave them to AQE, which broadcasts at small SF and
    // shuffles at 100 TB.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("rev")), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** D4 — window rank: top-3 parts per brand by retail price. The window
    * partitions by brand → single shuffle, no join. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("p_brand"), col("p_partkey"),
        round(col("p_retailprice"), 2).as("p_retailprice"), col("rnk"))
      .orderBy(col("p_brand"), col("rnk"))
  }

  /** D5 — rollup revenue by (region, nation): partial totals + grand
    * total in one pass (grouping-sets expansion, still map-combinable). */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val geo = cust
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"), col("n_name"))
    Tables.orders(spark, dir).select("o_custkey", "o_totalprice")
      .join(geo, col("o_custkey") === col("c_custkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** D6 — anti join: customers that never ordered. Broadcast the distinct
    * keys of the probe side when small; at scale Spark plans a shuffled
    * left-anti on o_custkey. */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select("o_custkey")
    Tables.customer(spark, dir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** D7 — customer-distribution histogram (TPC-H Q13 shape): left outer
    * join + two-level aggregation. Both aggs are map-side combinable;
    * the outer join keeps zero-order customers. */
  def qCustOrderHistogram(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey")
    val ord = Tables.orders(spark, dir).select("o_custkey", "o_orderkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** D8 — semi join: customers with at least one urgent order (EXISTS
    * shape; no duplicate-producing inner join + distinct). */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** D9 — time-dimension trend: monthly revenue (year-month extraction
    * feeding a low-cardinality aggregation; scan stays pruned to two
    * columns). */
  def qMonthlyRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select("o_orderdate", "o_totalprice")
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mon"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("yr"), col("mon"))

  /** K1 as a driver query — salted join on a DELIBERATELY skewed key:
    * every 10th part key collapses onto key 0, so ~10% of lineitem
    * rows land on one hot key (the pathological shape a plain shuffle
    * join serializes into one straggler task). Skew.saltedJoin spreads
    * the hot key over 8 salts; the post-join aggregation makes the
    * result compact and the oracle is the PLAIN join (salting must be
    * row-identical). */
  def qSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val hot = (c: Column) => when(c % 10 === 0, lit(0L)).otherwise(c)
    val big = Tables.lineitem(spark, dir)
      .select(hot(col("l_partkey")).as("k"), col("l_quantity"))
    val small = Tables.part(spark, dir)
      .select(hot(col("p_partkey")).as("k")).distinct()
    graft.operators.Skew.saltedJoin(big, small, "k", saltFactor = 8)
      .groupBy("k")
      .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"))
  }

  /** Pivot column set, fixed up front: supplying the values keeps the
    * pivot a single pass (no distinct-collect pre-job) and makes the
    * output schema static — the form that survives planning without
    * stats. Safe identifiers generated alongside for the oracle. */
  val PivotRegions: Seq[(String, String)] = Seq(
    "AFRICA" -> "AFRICA", "AMERICA" -> "AMERICA", "ASIA" -> "ASIA",
    "EUROPE" -> "EUROPE", "MIDDLE EAST" -> "MIDDLE_EAST")

  /** D9 — pivot: revenue by order year × customer region, regions as
    * columns. Dimensions broadcast; one shuffle on the group key. */
  /** D10: CUBE over (region, order priority) with grouping_id — all
    * four grouping-set combinations in ONE pass: Catalyst expands the
    * cube to an Expand node feeding a single hash aggregate, so the
    * joined frame is scanned once and shuffled once however many
    * grouping sets are requested (vs 4 scans for a UNION ALL of
    * GROUP BYs). Dimensions join broadcast (25 nations / 5 regions). */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val geo = cust
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderpriority", "o_totalprice")
      .join(geo, col("o_custkey") === col("c_custkey"))
      .cube(col("r_name"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"),
        count(lit(1)).as("n_orders"),
        grouping_id().as("gid"))
  }

  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val nat = broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_regionkey"))
    val reg = broadcast(Tables.region(spark, dir).select("r_regionkey", "r_name"))
    // customer scales with SF (15 M rows at sf100) — never broadcast it
    // (r6 verdict #3). Reduce it to the (c_custkey, r_name) dim through
    // the genuinely tiny nation/region broadcasts, then let AQE pick
    // the orders⋈geo strategy: broadcast at small SF, shuffle at 100 TB.
    val geo = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    val wide = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderdate", "o_totalprice")
      .join(geo, col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("r_name", PivotRegions.map(_._1))
      .agg(round(sum(col("o_totalprice")), 2))
    PivotRegions.foldLeft(wide) { case (df, (value, safe)) =>
      if (value == safe) df else df.withColumnRenamed(value, safe)
    }
  }

  /** Irregular, partially OVERLAPPING price bands (parts at 950-999.9
    * match two bands) — overlap is what makes this a true interval
    * join, inexpressible as a CASE binning. Both the Spark frame and
    * the oracle VALUES list are generated from this. */
  val PriceBands: Seq[(Int, Double, Double)] = Seq(
    (0, 900.0, 925.0), (1, 925.0, 960.0), (2, 960.0, 980.0),
    (3, 980.0, 1000.0), (4, 950.0, 1000.0))

  /** K4 as a driver query — parts matched to [lo, hi) price bands via
    * RangeJoin's grid bucketing (equi-join on bucket id + precise
    * filter), aggregated per band. Oracle is the naive BETWEEN join. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = broadcast(PriceBands.toDF("band_id", "lo", "hi"))
    graft.operators.RangeJoin.pointInRange(
        Tables.part(spark, dir).select(col("p_partkey"), col("p_retailprice")),
        "p_retailprice", bands, "lo", "hi", bucketWidth = 25.0)
      .groupBy("band_id")
      .agg(count(lit(1)).as("n_parts"),
        round(sum(col("p_retailprice")), 2).as("sum_price"))
  }

  /** D11 — GROUPING SETS: the two single-dimension marginals plus the
    * full cross — deliberately NOT a cube (no grand-total set), which
    * is exactly what GROUPING SETS expresses that cube/rollup can't.
    * Same single-shuffle Expand-based plan as qCube underneath. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val geo = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderpriority", "o_totalprice")
      .join(geo, col("o_custkey") === col("c_custkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("o_orderpriority")),
          Seq(col("r_name")), Seq(col("o_orderpriority"))),
        col("r_name"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"),
        count(lit(1)).as("n_orders"),
        grouping_id().as("gid"))
  }

  /** D12 — lag window over order history: days since the customer's
    * previous order, aggregated to per-customer cadence stats. One
    * partitioned window (single shuffle on o_custkey), then a
    * same-keyed aggregation that reuses the partitioning. */
  def qLeadLag(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .withColumn("gap_days",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        round(avg(col("gap_days")), 4).as("avg_gap_days"),
        max(col("gap_days")).as("max_gap_days"))
  }

  /** D13 — correlated-subquery shape: orders priced above their own
    * customer's average. Expressed as the decorrelated window form (one
    * shuffle on the correlation key — exactly what an optimizer
    * rewrites the subquery to; the oracle keeps the correlated
    * subquery spelling to pin the equivalence). The above-average cut
    * is evaluated in EXACT integer cents — `cents·n > Σcents` — so the
    * comparison is order-independent and bit-identical cross-engine
    * (r6 advice: a float window-avg vs subquery-avg can drift by an
    * ulp when a price sits exactly on its customer's average). */
  def qCorrelated(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sum_cents", sum(col("cents")).over(w))
      .filter(col("cents") * col("n") > col("sum_cents"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_above"),
        round(sum(col("o_totalprice")), 2).as("sum_above"))
  }

  /** D15 — set operations: year-over-year customer cohorts via
    * INTERSECT (retained) and EXCEPT (churned / new). Distinct-key
    * inputs keep both engines' set semantics identical; Spark plans
    * these as left-semi/left-anti aggregates — one shuffle each. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def buyers(yr: Int) =
      o.filter(year(col("o_orderdate")) === yr).select("o_custkey").distinct()
    val (y97, y98) = (buyers(1997), buyers(1998))
    y97.intersect(y98).withColumn("tag", lit("retained"))
      .unionAll(y97.except(y98).withColumn("tag", lit("churned")))
      .unionAll(y98.except(y97).withColumn("tag", lit("new")))
      .select("tag", "o_custkey")
  }

  /** Customers kept per region in the concentration curve. */
  val ParetoTopN = 50

  /** D16 — revenue concentration (Pareto/ABC analysis): per region,
    * customers ranked by revenue with their cumulative share of the
    * region total — "do 20% of customers carry 80% of revenue". One
    * shuffle on the group key, then rank + running-sum windows over
    * the same partitioning (no second exchange). All money flows as
    * EXACT integer cents — the running sum accumulates exact longs in
    * the pinned (rank) order, so cum_share is one double division at
    * the end and hash-matches without tolerance (the q_correlated
    * playbook applied to window cumulation). */
  def qPareto(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val geo = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    val rev = Tables.orders(spark, dir)
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(geo, col("o_custkey") === col("c_custkey"))
      .groupBy("r_name", "o_custkey")
      .agg(sum(col("cents")).as("rev_cents"))
    val rank = Window.partitionBy("r_name")
      .orderBy(col("rev_cents").desc, col("o_custkey"))
    val cum = rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("r_name")
    rev
      .withColumn("rnk", row_number().over(rank))
      .withColumn("cum_cents", sum(col("rev_cents")).over(cum))
      .withColumn("total_cents", sum(col("rev_cents")).over(all))
      .filter(col("rnk") <= ParetoTopN)
      .select(col("r_name"), col("rnk"), col("o_custkey"), col("rev_cents"),
        round(col("cum_cents").cast("double") / col("total_cents"), 6).as("cum_share"))
  }

  /** Trailing window span for the moving-revenue frame. */
  val TrailDays = 30

  /** D17 — RANGE-frame moving aggregate: each order's trailing 30-day
    * revenue for its customer — the time-decayed feature a churn/LTV
    * model reads. A RANGE frame over epoch seconds (not a ROWS frame:
    * membership is by TIME DISTANCE, so equal-date peers all join the
    * frame and no id tiebreak is needed) — one shuffle on the
    * customer key; money in exact integer cents so the frame sum is
    * exact and hash-matches without tolerance. */
  def qMovingRevenue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("sec"))
      .rangeBetween(-TrailDays.toLong * 86400, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      // o_orderdate ships TIMESTAMP_NTZ; the UTC session makes the
      // ntz→ltz cast an identity, then epoch seconds (== DuckDB epoch)
      .withColumn("sec", col("o_orderdate").cast("timestamp").cast("long"))
      .withColumn("trail_cents", sum(col("cents")).over(w))
      .select("o_custkey", "o_orderkey", "o_orderdate", "cents", "trail_cents")
  }

  /** D18 — year-over-year growth per region: yearly revenue (exact
    * cents) with a lag window for the previous year and growth as ONE
    * fixed double expression over exact ints — the trend-dashboard
    * query. Group sizes are (region × year) tiny; the lag window rides
    * the same partitioning. */
  def qYoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val geo = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    val yearly = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(geo, col("o_custkey") === col("c_custkey"))
      .groupBy("r_name", "yr")
      .agg(sum(col("cents")).as("rev_cents"), count(lit(1)).as("n_orders"))
    val w = Window.partitionBy("r_name").orderBy("yr")
    yearly
      .withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .select(col("r_name"), col("yr"), col("rev_cents"), col("n_orders"),
        round((col("rev_cents") - col("prev_cents")).cast("double")
          / col("prev_cents"), 6).as("yoy_growth"))
  }

  /** D19 — NTILE quartiles of customers by revenue WITHIN their
    * nation (the segmentation roll-up behind "top-quartile customers
    * per market"). PARTITIONed window, so no global sort — each
    * nation's customers rank independently (the scale-safe ntile;
    * a global ntile is a single-partition sort and belongs to the K5
    * sketch at 100 TB). Revenue ordered as EXACT integer cents with a
    * custkey tiebreak, so the quartile boundary is deterministic
    * cross-engine (a double-sum order could flip neighbors by an
    * ulp). */
  def qNtile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("o_custkey").agg(sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("rev_cents").desc, col("c_custkey"))
    Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(rev, col("c_custkey") === col("o_custkey"))
      .withColumn("quartile", ntile(4).over(w))
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("rev_cents") / 100.0, 2).as("revenue"), col("quartile"))
  }

  /** D20 share threshold in basis points (4%): nations whose revenue
    * share clears it survive the HAVING. */
  val ShareBps = 400

  /** D20 — TPC-H Q11-style global-share HAVING: per-nation revenue
    * kept only where its share of the GLOBAL total clears a threshold.
    * The global total rides as an IN-PLAN broadcast scalar (the
    * pageRank dangling-mass idiom — Q11's scalar subquery without a
    * separate driver action), and the HAVING compares EXACT INTEGERS
    * (rev·10⁴ ≥ total·bps) so membership can never flip on a float
    * ulp; the share column itself is one fixed double expression for
    * display. */
  def qGlobalShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("cents")).as("rev_cents"), count(lit(1)).as("n_orders"))
    val total = broadcast(rev.agg(sum(col("rev_cents")).as("total_cents")))
    rev.crossJoin(total)
      .filter(col("rev_cents") * 10000 >= col("total_cents") * ShareBps)
      .select(col("n_name"), col("rev_cents"), col("n_orders"),
        round(col("rev_cents").cast("double") / col("total_cents"), 6).as("share"))
  }

  /** D21 — TPC-H Q7-style trade flows: revenue between DIFFERENT
    * supplier and customer nations per ship year — the two-dimension
    * join (lineitem→supplier geo, lineitem→order→customer geo) that
    * stresses join planning: both nation dims broadcast; the only big
    * shuffle is lineitem⋈orders on orderkey. Revenue is the discounted
    * price as one float expression rounded to exact cents per ROW,
    * then integer-summed — the q1 disc_price arithmetic under the
    * exact-cents contract. */
  def qTradeFlows(spark: SparkSession, dir: String): DataFrame = {
    val suppGeo = broadcast(Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val custGeo = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), year(col("l_shipdate")).as("yr"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(suppGeo, col("l_suppkey") === col("s_suppkey"))
      .join(custGeo, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "yr")
      .agg(sum(col("cents")).as("rev_cents"), count(lit(1)).as("n_lines"))
  }

  /** Q18 quantity threshold — the "large order" cut. */
  val LargeOrderQty = 300L

  /** D22 — TPC-H Q18-style large orders: orders whose total lineitem
    * quantity exceeds [[LargeOrderQty]]. Quantities are integral by
    * data contract, so they aggregate as exact longs and the HAVING
    * is an integer compare. Shape: one map-side-combined orderkey
    * aggregation over the corpus — the only big shuffle — then the
    * ≤ |orders| survivors join the dims (AQE broadcasts the shrunken
    * side at any SF). */
  def qLargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val qty = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      .groupBy("l_orderkey").agg(sum(col("qty")).as("sum_qty"))
      .filter(col("sum_qty") > LargeOrderQty)
    qty
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("sum_qty"))
  }

  /** D23 — TPC-H Q15-style top supplier: quarterly revenue per
    * supplier, returning the supplier(s) that achieve the MAXIMUM —
    * the argmax-over-aggregate shape. The max is an IN-PLAN broadcast
    * scalar over the aggregated frame (the D20 discipline: no driver
    * action, no second corpus scan — the aggregate subtree
    * canonicalizes identically on both sides and ReuseExchange shares
    * it) and the tie test is exact integer cents, so "the" top
    * supplier is well-defined cross-engine even on a revenue tie. */
  def qTopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .groupBy("l_suppkey").agg(sum(col("cents")).as("rev_cents"))
    val mx = broadcast(rev.agg(max(col("rev_cents")).as("max_cents")))
    rev.crossJoin(mx).filter(col("rev_cents") === col("max_cents"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_cents"))
  }

  /** D14 — exact interpolated percentiles per group (the distribution
    * summary a cost/latency dashboard asks of a 100 TB fact table;
    * Spark's percentile is a single-pass partial aggregate, so the
    * group shuffles once and only digests move). */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      // ONE array-percentile aggregate: three scalar percentile() calls
      // each buffer every group value separately (measured 2.9 s vs
      // 1.0 s at sf0.1) — the array form sorts each group once
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D))").as("ps"),
        count(lit(1)).as("n_rows"))
      // round 4, not 2: interpolating cent-granular prices with
      // 2-decimal quantile weights yields values of AT MOST 4 decimals,
      // so round(4) never sits on a tie — round(2) landed on an exact
      // half-cent at sf0.001 where Spark's BigDecimal half-up and
      // DuckDB's binary rounding disagree (the mm_mp4 duration lesson)
      .select(col("l_returnflag"),
        round(col("ps").getItem(0), 4).as("p50"),
        round(col("ps").getItem(1), 4).as("p95"),
        round(col("ps").getItem(2), 4).as("p99"),
        col("n_rows"))

  /** D24 — TPC-H Q12 shape re-keyed to this corpus (no l_shipmode
    * column): per return-flag, 1997-shipped lineitems split into
    * HIGH-priority ('1-URGENT'/'2-HIGH') vs lower-priority order
    * counts — the conditional-aggregation join. Scale shape: the
    * shipdate range filter is pushed to the lineitem scan BEFORE the
    * join, orders carries exactly two columns in, and the split is
    * one conditional sum pair (exact integers, no post-agg pass). */
  def qPriorityShipping(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    val hiPrio = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select("l_orderkey", "l_returnflag")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(hiPrio, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hiPrio, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** D25 — TPC-H Q14 shape: the PROMO part-type's share of one
    * month's discounted revenue — the conditional-numerator ratio
    * query. Scale shape: the month filter reaches the lineitem scan,
    * only (partkey, rev) rides into the join, and both sums come out
    * of ONE aggregate (no second pass for the denominator). */
  def qPromoShare(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-09-01").cast("timestamp")
    val hi = lit("1997-10-01").cast("timestamp")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_partkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val part = Tables.part(spark, dir).select("p_partkey", "p_type")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(lit(0.0))), 2)
          .as("promo_revenue"),
        round(sum(col("rev")), 2).as("total_revenue"),
        round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("rev")).otherwise(lit(0.0))) /
          sum(col("rev")), 4).as("promo_share"))
  }

  /** D26 — TPC-H Q19 shape: revenue under an OR-of-ANDs predicate
    * spanning both sides (brand/size bands on part × quantity bands
    * on lineitem) — the disjunctive-pushdown stress. Catalyst
    * distributes the common single-side conjuncts: the part scan
    * prunes to the three brands and the lineitem scan to the union
    * quantity range BEFORE the join, with the full disjunction
    * re-checked on the joined rows. */
  def qDisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val part = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    def band(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand &&
        col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(band("Brand#12", 15, 1, 11) ||
        band("Brand#23", 25, 10, 20) ||
        band("Brand#24", 35, 20, 30))
      .agg(round(sum(col("rev")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** D28 — TPC-H Q4 shape: order counts per priority for one quarter,
    * restricted to orders with at least one LATE lineitem (shipped
    * after the order month ended — the corpus has no commit/receipt
    * dates, so lateness is shipdate > orderdate + 30 days). The
    * EXISTS spells as a left-semi join: the order row survives once
    * regardless of how many lines are late, which a plain join+agg
    * would double-count. Both scans prune on their date filters. */
  def qOrderPriorityCount(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-07-01").cast("timestamp")
    val hi = lit("1997-10-01").cast("timestamp")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val late = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(late,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** D27 — TPC-H Q22 shape: well-funded dormant customers — balance
    * above the positive-balance corpus average (scalar aggregate,
    * broadcast as a one-row cross join) with NO order since
    * 1999-01-01 (anti join against the date-pruned order scan),
    * rolled up per market segment. The corpus gives every customer
    * SOME order, so the dormancy window is what makes the anti-join
    * surface non-empty. */
  def qDormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("ab"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_dormant"),
        round(sum(col("c_acctbal")), 2).as("dormant_balance"))
  }

  /** D29 — TPC-H Q6 shape: the revenue delta of dropping a discount
    * band for one year's small-quantity lines. The canary query: a
    * single scan, every predicate pushed to parquet, a one-row
    * map-side-combinable aggregate — if this one shuffles anything
    * but 32 partial rows, the engine is mis-set-up. */
  def qForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue_delta"),
        count(lit(1)).as("n_lines"))

  /** D30 — TPC-H Q10 shape: top-20 customers by revenue RETURNED in
    * one quarter (l_returnflag = 'R'), with their nation. Scale
    * shape: both fact scans prune (quarter on orders, flag on
    * lineitem) before the fact⋈fact shuffle; customer/nation ride in
    * as broadcasts AFTER the aggregation has collapsed to one row
    * per customer, so the big join never carries names. */
  def qReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val perCust = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("rev"))
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    perCust.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .orderBy(col("rev").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"),
        round(col("rev"), 2).as("revenue"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
  }

  /** D31 — TPC-H Q8 shape: one supplying nation's share of a customer
    * region's market for one part type, per year. The two-sided geo
    * query: the supplier's nation tags the numerator, the customer's
    * region restricts the denominator. Both geo dims broadcast; the
    * share comes out of ONE aggregate via a conditional numerator
    * (no second pass). */
  def qMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD").select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name", "n_regionkey")
    val reg = Tables.region(spark, dir).filter(col("r_name") === "AMERICA")
      .select("r_regionkey")
    val amerCust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(nat.join(reg, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))),
        col("c_nationkey") === col("cn_key"))
      .select("c_custkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(amerCust), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", col("rev")).otherwise(lit(0.0))) /
          sum(col("rev")), 6).as("mkt_share"),
        round(sum(col("rev")), 2).as("total_rev"))
      .orderBy(col("o_year"))
  }

  /** D32 — TPC-H Q9 shape: per supplier-nation × order-year profit on
    * one product family. The corpus has no partsupp.ps_supplycost, so
    * cost is re-keyed to 60% of the part's retail price × quantity —
    * same join topology (lineitem ⋈ orders ⋈ part ⋈ supplier ⋈
    * nation), same group-by, profit = rev − cost. Only (orderkey,
    * year) rides the fact shuffle; part/supplier/nation broadcast. */
  def qProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_name").like("%widget%"))
      .select("p_partkey", "p_retailprice")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .withColumn("profit",
        col("rev") - lit(0.6) * col("p_retailprice") * col("l_quantity"))
    val ordYear = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val suppNat = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    li.join(ordYear, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(round(sum(col("profit")), 2).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** D33 — TPC-H Q2 shape: the cheapest observed supplier per part in
    * one region, for a size/type slice. No partsupp: a supplier's
    * "cost" for a part is the minimum unit price (extendedprice /
    * quantity) it ever shipped that part at. The per-part argmin is
    * min_by over a struct — one aggregation, no window, no self-join
    * back (TPC-H's correlated MIN subquery re-spelled as a single
    * grouped argmin, which is the shape that scales). */
  def qMinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
      .select("p_partkey", "p_brand")
    val euroSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 0)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
    li.groupBy(col("p_partkey"), col("p_brand"))
      .agg(min_by(
        struct(col("unit_cost"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"), col("n_name")),
        struct(col("unit_cost"), col("s_suppkey"))).as("best"))
      .select(col("p_partkey"), col("p_brand"),
        // deliberately un-rounded: the quotient is the same IEEE double in
        // any engine, while round(q, 4) differs across engines on .X5
        // representation ties (seen at sf0.001); the gate formats at 4dp
        col("best.unit_cost").as("min_cost"),
        col("best.s_suppkey").as("s_suppkey"),
        col("best.s_name").as("s_name"),
        col("best.s_acctbal").as("s_acctbal"),
        col("best.n_name").as("n_name"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"))
      .limit(25)
  }

  /** D34 — TPC-H Q16 shape: how many distinct suppliers serve each
    * (brand, type, size) bucket, from observed lineitem pairs,
    * excluding one brand, one type, and suppliers with negative
    * balance (the "complaints" NOT IN re-keyed to a measurable
    * predicate). The distinct (part, supp) projection collapses the
    * fact table BEFORE the dimension join — count(DISTINCT) runs
    * over pairs, not lines. */
  def qPartsSupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val badSupp = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val pairs = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "MEDIUM" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    pairs.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** D35 — TPC-H Q17 shape: yearly revenue lost to small-quantity
    * lines of one brand — lines below 20% of their part's average
    * quantity. The correlated per-part AVG subquery is re-spelled as
    * a grouped aggregate joined back; with the brand filter applied
    * FIRST, both the threshold build and the probe scan the same
    * pruned slice (TPC-H's own plan re-derives the avg from the full
    * table; scoping it to the brand is the semantics Q17 states). */
  def qSmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#23" && col("p_type") === "SMALL")
      .select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
    val thresholds = li.groupBy(col("p_partkey").as("t_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_threshold"))
    li.join(broadcast(thresholds), col("p_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_small_lines"))
  }

  /** D36 — TPC-H Q20 shape: suppliers in one nation who dominate the
    * 1997 supply of some small-size part — shipped more than half of
    * the part's corpus-wide 1997 quantity. The nested
    * IN(IN(…agg…)) is re-spelled as two aggregations sharing one
    * pruned scan plus a left-semi join up to suppliers — each
    * supplier surfaces once no matter how many parts it dominates. */
  def qExcessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_size") <= 10).select("p_partkey")
    val li97 = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
    val perSuppPart = li97.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("supp_qty"))
    val perPart = li97.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
    val dominant = perSuppPart
      .join(perPart, col("l_partkey") === col("t_partkey"))
      .filter(col("supp_qty") * 2 > col("total_qty"))
      .select("l_suppkey")
    Tables.supplier(spark, dir)
      .filter(col("s_nationkey") === 3)
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"),
        round(col("s_acctbal"), 2).as("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** D37 — TPC-H Q21 shape: suppliers who kept multi-supplier orders
    * waiting — the order's ONLY late supplier (late = shipped more
    * than 30 days after the order date; the corpus has no
    * commit/receipt dates). Q21's EXISTS/NOT-EXISTS double nest is
    * re-spelled as one per-order aggregation — distinct suppliers
    * vs distinct LATE suppliers — then a semi-filterable equijoin
    * back to the late lines: same semantics, two shuffles total,
    * no quadruple self-join of the fact table. */
  def qWaitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val lines = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS")).cast("int"))
    val perOrder = lines.groupBy(col("l_orderkey").as("g_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(when(col("is_late") === 1, col("l_suppkey"))).as("n_late_supps"))
      .filter(col("n_supps") > 1 && col("n_late_supps") === 1)
      .select("g_orderkey")
    val lateOnOrder = lines.filter(col("is_late") === 1)
      .select("l_orderkey", "l_suppkey").distinct()
      .join(perOrder, col("l_orderkey") === col("g_orderkey"), "left_semi")
    lateOnOrder
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** D38: interval-OVERLAP self-join — "which customers ran
    * concurrent open orders, and how concurrent": each order becomes
    * the interval [orderdate, max shipdate of its lines]; same-key
    * (customer) interval pairs that overlap aggregate to a
    * per-customer concurrency profile. The self-join is EQUI-KEYED
    * on the customer (pair space bounded by orders-per-customer², a
    * small constant at any corpus scale) with the overlap predicate
    * as a post-join filter — the plan a real overlap join wants when
    * a natural partition key bounds the pairs; when none does, the
    * K4 grid-bucketing is the fallback shape. */
  def qOverlapOrders(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .agg(max(col("l_shipdate")).as("end_ts"))
    val a = iv.select(col("o_custkey").as("c"), col("o_orderkey").as("k1"),
      col("o_orderdate").as("s1"), col("end_ts").as("e1"))
    val b = iv.select(col("o_custkey").as("c"), col("o_orderkey").as("k2"),
      col("o_orderdate").as("s2"), col("end_ts").as("e2"))
    a.join(b, Seq("c"))
      .filter(col("k1") < col("k2") && col("s1") <= col("e2") && col("s2") <= col("e1"))
      .withColumn("overlap_days",
        datediff(least(col("e1"), col("e2")), greatest(col("s1"), col("s2"))) + 1)
      .groupBy(col("c").as("o_custkey"))
      .agg(count(lit(1)).as("n_overlap_pairs"),
        max(col("overlap_days")).as("max_overlap_days"))
  }

  /** D44: robust outlier detection by median absolute deviation —
    * the outlier battery that doesn't let the outliers poison their
    * own threshold (mean/stddev does; median/MAD doesn't — the
    * robust-statistics standard). Per region: median order cents,
    * MAD, and the count beyond 3 MAD. Exact-cents integers feed two
    * interpolated-percentile aggregations (the D14 cross-engine
    * contract); |x−med| values are half-integer-exact doubles so the
    * 3·MAD comparison is deterministic. Two region-keyed aggs + one
    * broadcast-back join. */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val med = o.groupBy("r_name")
      .agg(percentile(col("cents"), lit(0.5)).as("med"))
    val withDev = o.join(med, "r_name")
      .withColumn("dev", abs(col("cents") - col("med")))
    val mad = withDev.groupBy("r_name")
      .agg(percentile(col("dev"), lit(0.5)).as("mad"))
    withDev.join(mad, "r_name")
      .groupBy(col("r_name"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("dev") > lit(3.0) * col("mad")).cast("long")).as("n_outliers"))
      .select(col("r_name"),
        round(col("med") / 100.0, 2).as("median_price"),
        round(col("mad") / 100.0, 2).as("mad_price"),
        col("n_orders"), col("n_outliers"))
  }

  /** D40: cumulative distinct customers by month — the windowed
    * COUNT(DISTINCT) no engine supports as a window function,
    * spelled scale-correctly: each customer collapses to a
    * FIRST-ORDER month (one groupBy), months aggregate to new-customer
    * counts, and the running total is a triangular self-join over the
    * bounded month table (≤ months² tiny rows) instead of an
    * unpartitioned running-sum window — the planned SinglePartition
    * exchange J6 bans. The distinct work happens once at customer
    * grain; nothing at data scale ever sorts globally. */
  def qCumulativeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val first = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(min(date_trunc("month", col("o_orderdate"))).as("fm"))
    val monthly = first.groupBy("fm").agg(count(lit(1)).as("new_customers"))
    monthly.select(col("fm"), col("new_customers"))
      .join(monthly.select(col("fm").as("fm2"),
        col("new_customers").as("nc2")), col("fm2") <= col("fm"))
      .groupBy(col("fm").as("month"), col("new_customers"))
      .agg(sum(col("nc2")).as("cum_customers"))
      .select("month", "new_customers", "cum_customers")
  }

  /** D39: a pair must co-occur in at least this many orders to emit
    * a rule (the Apriori support cut that keeps rule count bounded). */
  val BasketMinPairs = 3L

  /** D39: market-basket association rules — directed part→part rules
    * with support, confidence, and lift over the order baskets (the
    * retail co-purchase miner; I20's session lift is the event-stream
    * sibling, this is the classic Apriori-1×1 face with CONFIDENCE
    * and a support cut). Baskets dedupe to distinct (order, part)
    * first; the pair generation is the canonical u<v self-join on the
    * order key, counted once then EXPLODED to both rule directions —
    * the expensive join runs once, not twice. Counts are integers;
    * support/confidence/lift are single fixed divisions rounded 4-6dp.
    * At 100 TB the basket self-join is the honest cost and shuffles on
    * the order key; the support cut prunes before the per-part joins. */
  def qBasketRules(spark: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = op.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val partN = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val a = op.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = op.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val pairs = a.join(b, Seq("l_orderkey")).filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= BasketMinPairs)
    val directed = pairs.select(col("pa").as("antecedent"),
        col("pb").as("consequent"), col("n_ab"))
      .unionAll(pairs.select(col("pb").as("antecedent"),
        col("pa").as("consequent"), col("n_ab")))
    directed
      .join(partN.select(col("l_partkey").as("antecedent"),
        col("n_part").as("n_ante")), "antecedent")
      .join(partN.select(col("l_partkey").as("consequent"),
        col("n_part").as("n_cons")), "consequent")
      .crossJoin(nOrders)
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_ante"), col("n_cons"),
        round(col("n_ab").cast("double") / col("n_orders"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_ante"), 4).as("confidence"),
        round((col("n_ab") * col("n_orders")).cast("double")
          / (col("n_ante") * col("n_cons")), 4).as("lift"))
  }
}
