package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Relational
import graft.kg.{GraphBuilder, KgQueries, Normalize, Triples}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator is exposed as a (SparkSession, sfDir) =>
  * DataFrame plus, where ANSI-SQL-expressible, a DuckDB oracle query over
  * the same parquet files with identical column names and rounding.
  * Family registries (Relational here, KgQueries, …) are concatenated in
  * a ListMap so iteration order — and therefore bench output — is
  * deterministic across runs.
  */
object SparkEntry {

  /** Flagship: the full KG-construction pipeline on sf0.001 — rule-based
    * triple extraction → relation standardization → typed-endpoint graph
    * edges. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val triples = Triples.kgTriples(spark, "/root/testdata/sf0.001")
    val std = Normalize.standardizeRelations(triples, "relation", "relation_std")
      .drop("relation").withColumnRenamed("relation_std", "relation")
    GraphBuilder.edges(std)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(
      "q1_pricing_summary" -> (Relational.q1PricingSummary _),
      "q3_top_orders"      -> (Relational.q3TopOrders _),
      "q5_region_revenue"  -> (Relational.q5RegionRevenue _),
      "q_window_rank"      -> (Relational.qWindowRank _),
      "q_rollup"           -> (Relational.qRollup _),
      "q_anti_join"        -> (Relational.qAntiJoin _),
      "q_cust_order_histogram" -> (Relational.qCustOrderHistogram _),
      "q_semi_join"        -> (Relational.qSemiJoin _),
      "q_monthly_revenue"  -> (Relational.qMonthlyRevenue _),
      "q_skew_join"        -> (Relational.qSkewJoin _),
      "q_range_join"       -> (Relational.qRangeJoin _),
      "q_pivot"            -> (Relational.qPivot _),
      "q_cube"             -> (Relational.qCube _),
      "q_grouping_sets"    -> (Relational.qGroupingSets _),
      "q_lead_lag"         -> (Relational.qLeadLag _),
      "q_correlated"       -> (Relational.qCorrelated _),
      "q_percentiles"      -> (Relational.qPercentiles _),
      "q_set_ops"          -> (Relational.qSetOps _),
      "q_pareto"           -> (Relational.qPareto _),
      "q_moving_revenue"   -> (Relational.qMovingRevenue _),
      "q_yoy_growth"       -> (Relational.qYoyGrowth _),
      "q_ntile"            -> (Relational.qNtile _),
      "q_global_share"     -> (Relational.qGlobalShare _),
      "q_trade_flows"      -> (Relational.qTradeFlows _),
      "q_large_orders"     -> (Relational.qLargeOrders _),
      "q_top_supplier"     -> (Relational.qTopSupplier _),
      "q_priority_shipping" -> (Relational.qPriorityShipping _),
      "q_promo_share"      -> (Relational.qPromoShare _),
      "q_disjunctive"      -> (Relational.qDisjunctiveRevenue _),
      "q_dormant_customers" -> (Relational.qDormantCustomers _),
      "q_late_orders"      -> (Relational.qOrderPriorityCount _),
      "q_forecast_revenue" -> (Relational.qForecastRevenue _),
      "q_returned_items"   -> (Relational.qReturnedItems _),
      "q_market_share"     -> (Relational.qMarketShare _),
      "q_product_profit"   -> (Relational.qProductProfit _),
      "q_min_cost_supplier" -> (Relational.qMinCostSupplier _),
      "q_parts_supplier_counts" -> (Relational.qPartsSupplierCounts _),
      "q_small_qty_revenue" -> (Relational.qSmallQtyRevenue _),
      "q_excess_suppliers" -> (Relational.qExcessSuppliers _),
      "q_waiting_suppliers" -> (Relational.qWaitingSuppliers _),
      "q_overlap_orders"   -> (Relational.qOverlapOrders _),
      "q_basket_rules"     -> (Relational.qBasketRules _),
      "q_cumulative_customers" -> (Relational.qCumulativeCustomers _),
      "q_mad_outliers"     -> (Relational.qMadOutliers _),
    ) ++ KgQueries.queries ++ graft.text.TextQueries.queries ++
      graft.multimodal.Multimodal.queries ++ graft.sources.IngestQueries.queries ++
      graft.dedup.DedupQueries.queries ++ graft.sim.SimQueries.queries ++
      graft.graph.GraphQueries.queries ++ graft.streaming.StreamQueries.queries ++
      graft.monitor.QualityQueries.queries

  def oracleSql: Map[String, String] =
    KgQueries.oracleSql ++ graft.text.TextQueries.oracleSql ++
      graft.multimodal.Multimodal.oracleSql ++
      graft.sources.IngestQueries.oracleSql ++
      graft.dedup.DedupQueries.oracleSql ++ graft.sim.SimQueries.oracleSql ++
      graft.graph.GraphQueries.oracleSql ++
      graft.streaming.StreamQueries.oracleSql ++
      graft.monitor.QualityQueries.oracleSql ++ Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        |  round(sum(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)),2) AS sum_charge,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_extendedprice),4) AS avg_price,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey, round(rev,2) AS revenue, o_orderdate, o_orderpriority FROM (
        |  SELECT l.l_orderkey, sum(l.l_extendedprice*(1.0-l.l_discount)) AS rev,
        |         o.o_orderdate, o.o_orderpriority
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_mktsegment = 'BUILDING'
        |    AND o.o_orderdate < TIMESTAMP '1998-06-30'
        |    AND l.l_shipdate  > TIMESTAMP '1998-06-30'
        |  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        |) ORDER BY rev DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n.n_name, round(sum(l.l_extendedprice*(1.0-l.l_discount)),2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_window_rank" ->
      """SELECT p_brand, p_partkey, round(p_retailprice,2) AS p_retailprice, rnk FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |         row_number() OVER (PARTITION BY p_brand
        |                            ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |  FROM part
        |) WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "q_rollup" ->
      """SELECT r_name, n_name, round(sum(o_totalprice),2) AS total,
        |       count(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, round(c_acctbal,2) AS c_acctbal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_cust_order_histogram" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey
        |) GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_monthly_revenue" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mon""".stripMargin,
    "q_pivot" -> {
      val cols = Relational.PivotRegions.map { case (value, safe) =>
        s"""round(sum(CASE WHEN r_name = '$value' THEN o_totalprice END), 2) AS "$safe""""
      }.mkString(",\n  ")
      s"""SELECT year(o_orderdate) AS yr,
         |  $cols
         |FROM orders o
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY 1""".stripMargin
    },
    // DuckDB grouping(a, b) uses the same bitmask convention as Spark's
    // grouping_id (first argument = most significant bit, 1 = rolled up)
    "q_cube" ->
      """SELECT r_name, o_orderpriority, round(sum(o_totalprice),2) AS total,
        |       count(*) AS n_orders, grouping(r_name, o_orderpriority) AS gid
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY CUBE (r_name, o_orderpriority)""".stripMargin,
    "q_grouping_sets" ->
      """SELECT r_name, o_orderpriority, round(sum(o_totalprice),2) AS total,
        |       count(*) AS n_orders, grouping(r_name, o_orderpriority) AS gid
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), (o_orderpriority))""".stripMargin,
    "q_lead_lag" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    date_diff('day',
        |      CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey) AS DATE),
        |      CAST(o_orderdate AS DATE)) AS gap_days
        |  FROM orders
        |)
        |SELECT o_custkey, count(*) AS n_orders,
        |  round(avg(gap_days), 4) AS avg_gap_days,
        |  max(gap_days) AS max_gap_days
        |FROM g GROUP BY o_custkey""".stripMargin,
    // the CORRELATED spelling on purpose — the Spark side is the
    // decorrelated window form; hash-match pins the equivalence. The
    // above-average cut is exact integer cents (cents·n > Σcents), so
    // no float-avg ulp can flip membership between engines.
    "q_correlated" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |)
        |SELECT o_custkey, count(*) AS n_above,
        |  round(sum(o_totalprice), 2) AS sum_above
        |FROM o
        |WHERE cents * (SELECT count(*) FROM o o2
        |               WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT sum(cents) FROM o o2
        |       WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_custkey""".stripMargin,
    // mirrors Relational.qPareto: exact-cents money, running sum in
    // the pinned (rank) order, one double division at the end
    "q_pareto" ->
      s"""WITH rev AS (
         |  SELECT r.r_name, o.o_custkey,
         |    sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::bigint AS rev_cents
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  JOIN region r ON n.n_regionkey = r.r_regionkey
         |  GROUP BY 1, 2
         |), w AS (
         |  SELECT r_name, o_custkey, rev_cents,
         |    row_number() OVER (PARTITION BY r_name
         |                       ORDER BY rev_cents DESC, o_custkey) AS rnk,
         |    sum(rev_cents) OVER (PARTITION BY r_name
         |                         ORDER BY rev_cents DESC, o_custkey
         |                         ROWS UNBOUNDED PRECEDING) AS cum_cents,
         |    sum(rev_cents) OVER (PARTITION BY r_name) AS total_cents
         |  FROM rev
         |)
         |SELECT r_name, rnk, o_custkey, rev_cents,
         |  round(cum_cents::double / total_cents, 6) AS cum_share
         |FROM w WHERE rnk <= ${Relational.ParetoTopN}""".stripMargin,

    // mirrors qYoyGrowth: exact-cents yearly sums, lag window, one
    // fixed growth expression
    "q_yoy_growth" ->
      """WITH yearly AS (
        |  SELECT r.r_name, year(o.o_orderdate) AS yr,
        |    sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::bigint AS rev_cents,
        |    count(*) AS n_orders
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2
        |)
        |SELECT r_name, yr, rev_cents, n_orders,
        |  round((rev_cents - lag(rev_cents) OVER (PARTITION BY r_name ORDER BY yr))::double
        |        / lag(rev_cents) OVER (PARTITION BY r_name ORDER BY yr), 6) AS yoy_growth
        |FROM yearly""".stripMargin,

    // mirrors qMovingRevenue: the same epoch-seconds RANGE frame
    // (peers by time distance, no tiebreak needed) over exact cents
    "q_moving_revenue" ->
      s"""SELECT o_custkey, o_orderkey, o_orderdate,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         |    PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         |    RANGE BETWEEN ${Relational.TrailDays * 86400} PRECEDING
         |          AND CURRENT ROW)::bigint AS trail_cents
         |FROM orders""".stripMargin,

    // mirrors qNtile: exact-cents revenue, custkey tiebreak — the
    // quartile boundary is deterministic in both engines
    "q_ntile" ->
      """WITH rev AS (
        |  SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT))::bigint AS rev_cents
        |  FROM orders GROUP BY 1
        |)
        |SELECT c.c_custkey, c.c_nationkey,
        |  round(rev_cents / 100.0, 2) AS revenue,
        |  ntile(4) OVER (PARTITION BY c.c_nationkey
        |                 ORDER BY rev_cents DESC, c.c_custkey) AS quartile
        |FROM customer c JOIN rev ON c.c_custkey = rev.o_custkey""".stripMargin,

    // mirrors qGlobalShare: same exact-cents sums, same integer-bps
    // HAVING (rev·10⁴ ≥ total·bps — Q11's scalar subquery, never a
    // float compare), share as the one fixed double expression
    "q_global_share" ->
      s"""WITH rev AS (
         |  SELECT n.n_name,
         |    sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::bigint AS rev_cents,
         |    count(*) AS n_orders
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  GROUP BY 1
         |), t AS (SELECT sum(rev_cents)::bigint AS total_cents FROM rev)
         |SELECT rev.n_name, rev.rev_cents, rev.n_orders,
         |  round(rev.rev_cents::double / t.total_cents, 6) AS share
         |FROM rev, t
         |WHERE rev.rev_cents * 10000 >= t.total_cents * ${Relational.ShareBps}""".stripMargin,

    // mirrors qTradeFlows: per-row discounted price rounded to cents
    // then integer-summed, cross-nation filter
    "q_trade_flows" ->
      """SELECT sg.supp_nation, cg.cust_nation, year(l.l_shipdate) AS yr,
        |  sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))::bigint AS rev_cents,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN (SELECT s_suppkey, n_name AS supp_nation FROM supplier
        |      JOIN nation ON s_nationkey = n_nationkey) sg
        |  ON l.l_suppkey = sg.s_suppkey
        |JOIN (SELECT c_custkey, n_name AS cust_nation FROM customer
        |      JOIN nation ON c_nationkey = n_nationkey) cg
        |  ON o.o_custkey = cg.c_custkey
        |WHERE sg.supp_nation <> cg.cust_nation
        |GROUP BY 1, 2, 3""".stripMargin,

    // mirrors qLargeOrders: integral quantities summed as bigints,
    // integer HAVING cut
    "q_large_orders" ->
      s"""WITH q AS (
         |  SELECT l_orderkey, sum(l_quantity::bigint)::bigint AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING sum(l_quantity::bigint) > ${Relational.LargeOrderQty}
         |)
         |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
         |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents,
         |  q.sum_qty
         |FROM q JOIN orders o ON q.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,

    // mirrors qTopSupplier: exact-cents revenue, argmax by scalar
    // subquery (the in-plan broadcast scalar's SQL spelling)
    "q_top_supplier" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |    sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))::bigint AS rev_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY 1
        |)
        |SELECT s.s_suppkey, s.s_name, r.rev_cents
        |FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.rev_cents = (SELECT max(rev_cents) FROM r)""".stripMargin,
    "q_priority_shipping" ->
      """SELECT l.l_returnflag,
        |  sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
        |      THEN 1 ELSE 0 END)::bigint AS high_line_count,
        |  sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
        |      THEN 0 ELSE 1 END)::bigint AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    "q_promo_share" ->
      """SELECT
        |  round(sum(CASE WHEN p.p_type = 'PROMO'
        |      THEN l.l_extendedprice * (1.0 - l.l_discount) ELSE 0.0 END), 2)
        |    AS promo_revenue,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2)
        |    AS total_revenue,
        |  round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
        |      THEN l.l_extendedprice * (1.0 - l.l_discount) ELSE 0.0 END)
        |    / sum(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS promo_share
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l.l_shipdate <  TIMESTAMP '1997-10-01'""".stripMargin,
    "q_disjunctive" ->
      """SELECT round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_late_orders" ->
      """SELECT o.o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o.o_orderdate <  TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1""".stripMargin,
    "q_dormant_customers" ->
      """SELECT c.c_mktsegment, count(*) AS n_dormant,
        |  round(sum(c.c_acctbal), 2) AS dormant_balance
        |FROM customer c
        |WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                     WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1""".stripMargin,
    "q_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_returned_items" ->
      """SELECT c_custkey, c_name, round(rev, 2) AS revenue,
        |  round(c_acctbal, 2) AS c_acctbal, n_name
        |FROM (
        |  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
        |         sum(l.l_extendedprice * (1.0 - l.l_discount)) AS rev
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE l.l_returnflag = 'R'
        |    AND o.o_orderdate >= TIMESTAMP '1997-10-01'
        |    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2, 3, 4
        |) ORDER BY rev DESC, c_custkey LIMIT 20""".stripMargin,
    "q_market_share" ->
      """SELECT year(o.o_orderdate) AS o_year,
        |  round(sum(CASE WHEN sn.n_name = 'NATION_3'
        |                 THEN l.l_extendedprice * (1.0 - l.l_discount)
        |                 ELSE 0.0 END)
        |        / sum(l.l_extendedprice * (1.0 - l.l_discount)), 6) AS mkt_share,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS total_rev
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_product_profit" ->
      """SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)
        |            - 0.6 * p.p_retailprice * l.l_quantity), 2) AS sum_profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q_min_cost_supplier" ->
      """SELECT p_partkey, p_brand, unit_cost AS min_cost,
        |  s_suppkey, s_name, s_acctbal, n_name
        |FROM (
        |  SELECT p.p_partkey, p.p_brand,
        |         l.l_extendedprice / l.l_quantity AS unit_cost,
        |         s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
        |         row_number() OVER (
        |           PARTITION BY p.p_partkey
        |           ORDER BY l.l_extendedprice / l.l_quantity, s.s_suppkey) AS rn
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |    AND p.p_size = 15 AND p.p_type = 'STANDARD'
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
        |  WHERE l.l_quantity > 0
        |) WHERE rn = 1
        |ORDER BY s_acctbal DESC, p_partkey LIMIT 25""".stripMargin,
    "q_parts_supplier_counts" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT ps.l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part p ON ps.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'MEDIUM'
        |  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND ps.l_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_small_qty_revenue" ->
      """WITH brand_lines AS (
        |  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |    AND p.p_brand = 'Brand#23' AND p.p_type = 'SMALL'
        |)
        |SELECT round(sum(b.l_extendedprice) / 7.0, 2) AS avg_yearly,
        |  count(*) AS n_small_lines
        |FROM brand_lines b
        |JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
        |      FROM brand_lines GROUP BY 1) t
        |  ON b.l_partkey = t.l_partkey
        |WHERE b.l_quantity < t.qty_threshold""".stripMargin,
    "q_excess_suppliers" ->
      """WITH li97 AS (
        |  SELECT l.l_partkey, l.l_suppkey, l.l_quantity
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size <= 10
        |  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        |)
        |SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS s_acctbal
        |FROM supplier s
        |WHERE s.s_nationkey = 3
        |  AND s.s_suppkey IN (
        |    SELECT sp.l_suppkey
        |    FROM (SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        |          FROM li97 GROUP BY 1, 2) sp
        |    JOIN (SELECT l_partkey, sum(l_quantity) AS total_qty
        |          FROM li97 GROUP BY 1) tp
        |      ON sp.l_partkey = tp.l_partkey
        |    WHERE sp.supp_qty * 2 > tp.total_qty)
        |ORDER BY s_suppkey""".stripMargin,
    "q_waiting_suppliers" ->
      """WITH lines AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        |         THEN 1 ELSE 0 END AS is_late
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |), only_late AS (
        |  SELECT l_orderkey FROM lines GROUP BY 1
        |  HAVING count(DISTINCT l_suppkey) > 1
        |     AND count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) = 1
        |)
        |SELECT s.s_suppkey, s.s_name, count(*) AS numwait
        |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE is_late = 1) ll
        |JOIN only_late ol ON ll.l_orderkey = ol.l_orderkey
        |JOIN supplier s ON ll.l_suppkey = s.s_suppkey
        |GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,

    // D38: same interval build, same closed-overlap predicate and
    // inclusive day count
    "q_overlap_orders" ->
      """WITH iv AS (
        |  SELECT o.o_custkey AS c, o.o_orderkey AS k, o.o_orderdate AS s,
        |    max(l.l_shipdate) AS e
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2, 3
        |)
        |SELECT a.c AS o_custkey, count(*) AS n_overlap_pairs,
        |  max(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1) AS max_overlap_days
        |FROM iv a JOIN iv b ON a.c = b.c AND a.k < b.k
        |WHERE a.s <= b.e AND b.s <= a.e
        |GROUP BY 1""".stripMargin,

    // D44: same exact-cents inputs, same two quantile_cont passes and
    // the 3·MAD cut on deterministic half-integer deviations
    "q_mad_outliers" ->
      """WITH o AS (
        |  SELECT r.r_name, CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |), m AS (
        |  SELECT r_name, quantile_cont(cents, 0.5) AS med FROM o GROUP BY 1
        |), d AS (
        |  SELECT o.r_name, abs(o.cents - m.med) AS dev, m.med
        |  FROM o JOIN m ON o.r_name = m.r_name
        |), md AS (
        |  SELECT r_name, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1
        |)
        |SELECT d.r_name, round(d.med / 100.0, 2) AS median_price,
        |  round(md.mad / 100.0, 2) AS mad_price,
        |  count(*) AS n_orders,
        |  sum((d.dev > 3.0 * md.mad)::int)::bigint AS n_outliers
        |FROM d JOIN md ON d.r_name = md.r_name
        |GROUP BY d.r_name, d.med, md.mad""".stripMargin,

    // D40: the oracle states the INTENT as a plain running-sum window
    // — the Spark side's triangular join must be row-identical
    "q_cumulative_customers" ->
      """WITH f AS (
        |  SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS fm
        |  FROM orders GROUP BY 1
        |), m AS (SELECT fm, count(*) AS new_customers FROM f GROUP BY 1)
        |SELECT fm AS month, new_customers,
        |  sum(new_customers) OVER (ORDER BY fm
        |    ROWS UNBOUNDED PRECEDING)::bigint AS cum_customers
        |FROM m""".stripMargin,

    // D39: same distinct baskets, same u<v pair counts exploded to
    // both directions, same fixed divisions
    "q_basket_rules" ->
      s"""WITH op AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
         |), n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
         |pn AS (SELECT l_partkey, count(*) AS n_part FROM op GROUP BY 1),
         |pairs AS (
         |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
         |  FROM op a JOIN op b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= ${Relational.BasketMinPairs}
         |), directed AS (
         |  SELECT pa AS antecedent, pb AS consequent, n_ab FROM pairs
         |  UNION ALL
         |  SELECT pb AS antecedent, pa AS consequent, n_ab FROM pairs
         |)
         |SELECT d.antecedent, d.consequent, d.n_ab,
         |  pa.n_part AS n_ante, pc.n_part AS n_cons,
         |  round(d.n_ab::double / n.n_orders, 6) AS support,
         |  round(d.n_ab::double / pa.n_part, 4) AS confidence,
         |  round((d.n_ab * n.n_orders)::double / (pa.n_part * pc.n_part), 4) AS lift
         |FROM directed d
         |JOIN pn pa ON d.antecedent = pa.l_partkey
         |JOIN pn pc ON d.consequent = pc.l_partkey
         |CROSS JOIN n""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_set_ops" ->
      """WITH y97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
        |y98 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
        |SELECT 'retained' AS tag, o_custkey FROM (SELECT o_custkey FROM y97 INTERSECT SELECT o_custkey FROM y98)
        |UNION ALL
        |SELECT 'churned', o_custkey FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y98)
        |UNION ALL
        |SELECT 'new', o_custkey FROM (SELECT o_custkey FROM y98 EXCEPT SELECT o_custkey FROM y97)""".stripMargin,
    // oracle is the naive BETWEEN join — grid bucketing must match it
    "q_range_join" -> {
      val values = Relational.PriceBands
        .map { case (b, lo, hi) => s"($b, $lo, $hi)" }.mkString(", ")
      s"""WITH bands(band_id, lo, hi) AS (VALUES $values)
         |SELECT band_id, count(*) AS n_parts,
         |  round(sum(p_retailprice), 2) AS sum_price
         |FROM part JOIN bands
         |  ON lo <= p_retailprice AND p_retailprice < hi
         |GROUP BY band_id""".stripMargin
    },
    // oracle is the PLAIN join — the salted rewrite must be row-identical
    "q_skew_join" ->
      """WITH big AS (
        |  SELECT CASE WHEN l_partkey % 10 = 0 THEN 0 ELSE l_partkey END AS k,
        |         l_quantity
        |  FROM lineitem
        |), small AS (
        |  SELECT DISTINCT CASE WHEN p_partkey % 10 = 0 THEN 0 ELSE p_partkey END AS k
        |  FROM part
        |)
        |SELECT b.k, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
        |FROM big b JOIN small s ON b.k = s.k
        |GROUP BY b.k""".stripMargin,
  )
}
