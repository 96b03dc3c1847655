package graft.monitor

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** J8: data-quality constraint battery + column profiler — the
  * Deequ-style "unit tests for data" face every production pipeline
  * runs before training-data ships (completeness, domain, uniqueness,
  * referential integrity), computed IN ONE PASS per table.
  *
  * Reference behavior anchor: the reference pipeline trusts its CSV
  * inputs blindly (Big-Data---Knowledge-graph-construction-with-LLM
  * `LOCAL/data_ingestion_batch.py` reads and concatenates with no
  * validation); at 100 TB a silent schema drift or null storm
  * poisons a training run days later, so the engine-side answer is a
  * declarative check battery whose cost is one aggregation, not one
  * job per rule.
  *
  * Scale shape: every metric is an algebraic aggregate (map-side
  * partial combine, one shuffle of O(partitions) rows); the exact
  * uniqueness check is the one count-distinct (Expand) and the RI
  * check one anti-join keyed on the FK — both the shapes a real
  * Deequ run plans. Output is metadata-scale: one row per
  * constraint, so the battery composes into CI gates and the J1
  * monitoring envelope for free.
  */
object QualityQueries {

  /** One row per constraint: (constraint, value, passed). Thresholds
    * live here next to the metrics so the battery is self-describing;
    * the non-unique synthetic (l_orderkey, l_linenumber) pair makes
    * the uniqueness rule genuinely FAIL — the battery is not a
    * tautology. */
  def dqConstraints(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val one = li.agg(
      count(lit(1)).cast("double").as("row_count"),
      (sum(when(col("l_orderkey").isNotNull, 1).otherwise(0)).cast("double") /
        count(lit(1))).as("comp_orderkey"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_discount")).as("max_disc"),
      (sum(when(col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)).cast("double") /
        count(lit(1))).as("dom_returnflag"),
      (count_distinct(col("l_orderkey"), col("l_linenumber")).cast("double") /
        count(lit(1))).as("uniq_pk"))
    val base = one.select(expr(
      """stack(6,
        |  'row_count_min_1',            row_count,
        |  'completeness_l_orderkey',    comp_orderkey,
        |  'min_l_quantity_ge_1',        min_qty,
        |  'max_l_discount_le_0.1',      max_disc,
        |  'domain_l_returnflag',        dom_returnflag,
        |  'unique_orderkey_linenumber', uniq_pk) AS (check_name, value)""".stripMargin))
    // FK integrity: orphan orders (o_custkey with no customer row).
    // Unhinted join — at test SF the dim broadcasts, at 100 TB it
    // shuffle-joins on the FK; both are the plan a real RI check wants.
    val orphans = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).cast("double").as("value"))
      .select(lit("ri_orders_custkey").as("check_name"), col("value"))
    base.unionAll(orphans)
      .select(col("check_name"), round(col("value"), 4).as("value"),
        when(col("check_name") === "row_count_min_1", col("value") >= 1.0)
          .when(col("check_name") === "completeness_l_orderkey", col("value") >= 1.0)
          .when(col("check_name") === "min_l_quantity_ge_1", col("value") >= 1.0)
          .when(col("check_name") === "max_l_discount_le_0.1", col("value") <= 0.1)
          .when(col("check_name") === "domain_l_returnflag", col("value") >= 1.0)
          .when(col("check_name") === "unique_orderkey_linenumber", col("value") >= 1.0)
          .otherwise(col("value") <= 0.0) // ri: zero orphans
          .cast("int").as("passed"))
  }

  /** Numeric column profile of lineitem in one pass: per column the
    * non-null count, exact distinct count, min/max, and mean — the
    * "what does this table even look like" scan a data engineer runs
    * first, as one job instead of one per column. */
  def dqProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"${c}__nn"),
      count_distinct(col(c)).as(s"${c}__nd"),
      min(col(c)).as(s"${c}__min"),
      max(col(c)).as(s"${c}__max"),
      avg(col(c)).as(s"${c}__mean")))
    val one = li.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nn, ${c}__nd, ${c}__min, ${c}__max, ${c}__mean").mkString(",\n")
    one.select(expr(
      s"stack(${cols.size},\n$stackArgs) AS (column_name, non_null, n_distinct, min_v, max_v, mean_v)"))
      .select(col("column_name"), col("non_null"), col("n_distinct"),
        round(col("min_v"), 4).as("min_v"), round(col("max_v"), 4).as("max_v"),
        round(col("mean_v"), 4).as("mean_v"))
  }

  /** J9: distribution-drift detection via the Population Stability
    * Index — the "did this feed silently change shape" alarm between
    * two time windows of the same stream (the check a training
    * pipeline runs between yesterday's corpus and today's before
    * mixing them). The event stream splits at its integer midpoint
    * second (s·2 ≤ min+max — no division, exact); `value` buckets
    * into 10 equal-width EXACT-CENTS bands (integer width and floor —
    * no float bucket edges to disagree on); Laplace-smoothed shares
    * p,q keep ln finite on empty bands; psi = Σ(p−q)·ln(p/q) per
    * event_type, rounded 4dp (the text_entropy log-sum precedent).
    * Scale shape: one pass computes the window tag and bucket, one
    * (type, bucket) aggregation — 10 rows per type reach the psi
    * fold. */
  def dqDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"),
      col("ts").cast("long").as("s"),
      round(col("value") * 100).cast("long").as("cents"))
    val bounds = ev.agg(min("s").as("min_s"), max("s").as("max_s"),
      min("cents").as("min_c"), max("cents").as("max_c"))
    val width = expr("(max_c - min_c) div 10 + 1")
    val tagged = ev.crossJoin(bounds)
      .withColumn("win",
        when(col("s") * 2 <= col("min_s") + col("max_s"), "a").otherwise("b"))
      .withColumn("bucket", expr("(cents - min_c) div ((max_c - min_c) div 10 + 1)"))
    val counts = tagged.groupBy("event_type", "bucket").agg(
      sum(when(col("win") === "a", 1L).otherwise(0L)).as("a_n"),
      sum(when(col("win") === "b", 1L).otherwise(0L)).as("b_n"))
    // dense (type × bucket 0..9) grid so empty bands still contribute
    // their smoothed share
    val grid = counts.select("event_type").distinct()
      .crossJoin(spark.range(10).select(col("id").cast("int").as("bucket")))
    val dense = grid.join(counts, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("a_n"), lit(0L)).as("a_n"),
        coalesce(col("b_n"), lit(0L)).as("b_n"))
    val tot = dense.groupBy("event_type")
      .agg(sum("a_n").as("a_total"), sum("b_n").as("b_total"))
    val p = (col("a_n") + 1).cast("double") / (col("a_total") + 10)
    val q = (col("b_n") + 1).cast("double") / (col("b_total") + 10)
    dense.join(tot, "event_type")
      .withColumn("_term", (p - q) * log(p / q))
      .groupBy(col("event_type"), col("a_total"), col("b_total"))
      .agg(round(sum(col("_term")), 4).as("psi"))
      .select("event_type", "a_total", "b_total", "psi")
  }

  /** J10: k-anonymity threshold — equivalence classes smaller than K
    * are re-identification risks. */
  val KanonK = 5L
  /** J10: width of the n_chars generalization bucket (the numeric
    * quasi-identifier is coarsened before classing, as a real
    * anonymity audit would). */
  val KanonLenBucket = 100L

  /** J10: k-anonymity audit over the corpus quasi-identifiers — the
    * privacy gate a pipeline runs AFTER G9's PII redaction: direct
    * identifiers are gone, but a (lang, source, length-bucket)
    * combination shared by fewer than [[KanonK]] documents still
    * re-identifies via linkage. One row per equivalence class with its
    * size k, the at-risk flag, and the actionable signal: would
    * generalizing away `source` (the next rung on the generalization
    * lattice) lift the class above K? `rescued` distinguishes "coarsen
    * the release" classes from "suppress the rows" classes.
    *
    * Reference behavior anchor: the reference ships extracted entities
    * straight to Neo4j with no privacy audit (main_neo4j_loader.py);
    * at 100 TB with real user-generated text, the k-anonymity audit is
    * the release gate.
    *
    * Scale shape: two map-side-combinable aggregations (classes, then
    * the source-generalized roll-up OF THE CLASS FRAME — class-scale,
    * not corpus-scale input) and one class-scale join; output is
    * metadata-scale (one row per equivalence class). */
  def dqKanon(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("lang"), col("source"),
      expr(s"n_chars div $KanonLenBucket").as("len_bucket"))
    val cls = d.groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("k"))
    val gen = cls.groupBy("lang", "len_bucket").agg(sum("k").as("k_gen"))
    cls.join(gen, Seq("lang", "len_bucket"))
      .select(col("lang"), col("source"), col("len_bucket"), col("k"),
        (col("k") < KanonK).cast("int").as("at_risk"),
        (col("k") < KanonK && col("k_gen") >= KanonK).cast("int")
          .as("rescued"))
      .orderBy("lang", "source", "len_bucket")
  }

  /** J11: minimum distinct sensitive values per equivalence class. */
  val DiversityL = 3L

  /** J11: l-diversity audit — the homogeneity-attack check k-anonymity
    * misses: a class can hold k ≥ K rows and still leak if they all
    * share one SENSITIVE value (knowing someone is in the class IS
    * knowing their value). Classes are J10's (lang, source,
    * length-bucket); the sensitive attribute is the document's leading
    * term (the content signature a release would protect — the
    * machinery, not the column choice, is the point). Per class:
    * k, the distinct sensitive count l, the modal sensitive count, and
    * two flags — diverse (l ≥ [[DiversityL]]) and homogeneous
    * (one value covers the class, the worst case). All evidence stays
    * in EXACT integers (distinct counts and the modal count) rather
    * than a float entropy — the well-distributed variant's ln() sums
    * would ride cross-engine float-order differences for no extra
    * signal at the audit grain.
    *
    * Scale shape: two map-side-combinable aggregations ((class, sens)
    * counts, then the class roll-up of THAT frame); output one row per
    * class — metadata-scale. */
  def dqLdiversity(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("lang"), col("source"),
      expr(s"n_chars div $KanonLenBucket").as("len_bucket"),
      regexp_extract(col("text"), "^ *([^ ]+)", 1).as("sens"))
    d.groupBy("lang", "source", "len_bucket", "sens")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("lang", "source", "len_bucket")
      .agg(sum(col("cnt")).as("k"),
        count(lit(1)).as("l_distinct"),
        max(col("cnt")).as("max_sens_cnt"))
      .select(col("lang"), col("source"), col("len_bucket"), col("k"),
        col("l_distinct"), col("max_sens_cnt"),
        (col("l_distinct") >= DiversityL).cast("int").as("diverse"),
        (col("max_sens_cnt") === col("k")).cast("int").as("homogeneous"))
      .orderBy("lang", "source", "len_bucket")
  }

  /** J11 over a SECOND sensitive attribute, composed with J10's
    * generalization-rescue signal at the DIVERSITY level: the second
    * attribute is the document's second leading term (a release
    * protects every sensitive column independently — one diverse
    * attribute says nothing about another), and for every class that
    * fails l-diversity the audit answers the actionable question J10
    * answers for k: would generalizing away `source` (the same next
    * rung on the lattice) lift the class's distinct-sensitive count
    * to L? `l_gen` is the distinct count over the GENERALIZED class
    * (lang, len_bucket) — counted from the (class, sens)-distinct
    * frame, class-scale input, never a second corpus scan. All
    * evidence exact integers (the J11 discipline).
    *
    * Scale shape: the same two map-side-combinable aggregations as
    * [[dqLdiversity]] plus one class-frame roll-up and a class-scale
    * join; output one row per class — metadata-scale. */
  def dqLdiversity2(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("lang"), col("source"),
      expr(s"n_chars div $KanonLenBucket").as("len_bucket"),
      regexp_extract(col("text"), "^ *[^ ]+ +([^ ]+)", 1).as("sens"))
    val sc = d.groupBy("lang", "source", "len_bucket", "sens")
      .agg(count(lit(1)).as("cnt"))
    val cls = sc.groupBy("lang", "source", "len_bucket")
      .agg(sum(col("cnt")).as("k"),
        count(lit(1)).as("l_distinct"),
        max(col("cnt")).as("max_sens_cnt"))
    val gen = sc.select("lang", "len_bucket", "sens").distinct()
      .groupBy("lang", "len_bucket").agg(count(lit(1)).as("l_gen"))
    cls.join(gen, Seq("lang", "len_bucket"))
      .select(col("lang"), col("source"), col("len_bucket"), col("k"),
        col("l_distinct"), col("max_sens_cnt"), col("l_gen"),
        (col("l_distinct") >= DiversityL).cast("int").as("diverse"),
        (col("l_distinct") < DiversityL && col("l_gen") >= DiversityL)
          .cast("int").as("rescued"))
      .orderBy("lang", "source", "len_bucket")
  }

  /** J13: maximum tolerated total-variation distance, in thousandths
    * (t = 0.4) — kept integral so the flag is an exact comparison. */
  val TCloseMillis = 400L

  /** The flag comparison in LOWEST terms: tv ≤ t ⇔ tv_num·den ≤
    * num·k·N with num/den = 2t reduced (4/5 at t = 0.4). The naive
    * ×1000 spelling overflowed Long at k·N > 4.6e15 — inside the
    * query's own claimed scale, where Spark wraps silently and DuckDB
    * errors (r16 review); den = 5 pushes the bound to k·N ≈ 9.2e17
    * (tv_num ≤ 2·k·N, so tv_num·5 needs 10·k·N headroom). */
  private val tCloseGcd = java.math.BigInteger.valueOf(2L * TCloseMillis)
    .gcd(java.math.BigInteger.valueOf(1000L)).longValueExact()
  val TCloseNum: Long = 2L * TCloseMillis / tCloseGcd
  val TCloseDen: Long = 1000L / tCloseGcd

  /** J13: t-closeness audit (Li et al. 2007) — the third rung of the
    * privacy battery: a class can be k-anonymous (J10) AND l-diverse
    * (J11) and still leak by SKEW — if a class's sensitive-value
    * DISTRIBUTION sits far from the corpus-wide one, membership alone
    * shifts an attacker's posterior (the "all three distinct salaries
    * in this class are the three lowest" attack l-diversity cannot
    * see). Distance is total variation over the categorical sensitive
    * attribute: TV = ½ Σ_s |p_class(s) − p_global(s)|, computed in
    * EXACT integers scaled by 2·k·N — the per-value term is
    * |cnt_cs·N − cnt_g·k| and values ABSENT from the class contribute
    * (N − Σ_{s∈class} cnt_g)·k in one closed form, so no per-class ×
    * global-vocabulary explosion and no float until the one display
    * division. The t_close flag compares scaled integers
    * (tv_num·1000 ≤ 2·t_millis·k·N) — a boundary class cannot flip on
    * an ulp. Shapes: the same (class, sens) count frame as J11, one
    * global roll-up of THAT frame, one class-scale join back —
    * metadata-scale output. */
  def dqTcloseness(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("lang"), col("source"),
      expr(s"n_chars div $KanonLenBucket").as("len_bucket"),
      regexp_extract(col("text"), "^ *([^ ]+)", 1).as("sens"))
    val sc = d.groupBy("lang", "source", "len_bucket", "sens")
      .agg(count(lit(1)).as("cnt"))
    val g = sc.groupBy("sens").agg(sum(col("cnt")).as("cnt_g"))
    val n = broadcast(g.agg(sum(col("cnt_g")).as("n_total")))
    val kf = sc.groupBy("lang", "source", "len_bucket")
      .agg(sum(col("cnt")).as("k"))
    val per = sc.join(kf, Seq("lang", "source", "len_bucket"))
      .join(g, "sens").crossJoin(n)
      .groupBy("lang", "source", "len_bucket")
      .agg(max(col("k")).as("k"), max(col("n_total")).as("n_total"),
        sum(abs(col("cnt") * col("n_total") - col("cnt_g") * col("k")))
          .as("present_term"),
        sum(col("cnt_g")).as("cov_g"))
    val tvNum = col("present_term") + (col("n_total") - col("cov_g")) * col("k")
    per.select(col("lang"), col("source"), col("len_bucket"), col("k"),
      tvNum.as("tv_num"),
      round(tvNum.cast("double") / (lit(2.0) * col("k") * col("n_total")), 6)
        .as("tv"),
      (tvNum * TCloseDen <= lit(TCloseNum) * col("k") * col("n_total"))
        .cast("int").as("t_close"))
  }

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "dq_tcloseness"  -> (dqTcloseness _),
    "dq_constraints" -> (dqConstraints _),
    "dq_profile"     -> (dqProfile _),
    "dq_drift"       -> (dqDrift _),
    "dq_kanon"       -> (dqKanon _),
    "dq_ldiversity"  -> (dqLdiversity _),
    "dq_ldiversity2" -> (dqLdiversity2 _),
  )

  def oracleSql: Map[String, String] = Map(
    // mirrors dqTcloseness: same class/sens frames, the scaled-integer
    // TV numerator with the absent-values closed form, the one display
    // division, the exact-integer flag comparison
    "dq_tcloseness" ->
      s"""WITH q AS (
         |  SELECT lang, source, n_chars // $KanonLenBucket AS len_bucket,
         |    regexp_extract(text, '^ *([^ ]+)', 1) AS sens
         |  FROM documents
         |), sc AS (
         |  SELECT lang, source, len_bucket, sens, count(*)::bigint AS cnt
         |  FROM q GROUP BY 1, 2, 3, 4
         |), g AS (SELECT sens, sum(cnt)::bigint AS cnt_g FROM sc GROUP BY 1),
         |n AS (SELECT sum(cnt_g)::bigint AS n_total FROM g),
         |kf AS (
         |  SELECT lang, source, len_bucket, sum(cnt)::bigint AS k
         |  FROM sc GROUP BY 1, 2, 3
         |), p AS (
         |  SELECT sc.lang, sc.source, sc.len_bucket,
         |    max(kf.k) AS k, max(n.n_total) AS n_total,
         |    sum(abs(sc.cnt * n.n_total - g.cnt_g * kf.k))::bigint AS present_term,
         |    sum(g.cnt_g)::bigint AS cov_g
         |  FROM sc
         |  JOIN kf ON sc.lang = kf.lang AND sc.source = kf.source
         |    AND sc.len_bucket = kf.len_bucket
         |  JOIN g ON sc.sens = g.sens
         |  CROSS JOIN n
         |  GROUP BY 1, 2, 3
         |)
         |SELECT lang, source, len_bucket, k,
         |  (present_term + (n_total - cov_g) * k)::bigint AS tv_num,
         |  round((present_term + (n_total - cov_g) * k)::double
         |    / (2.0 * k * n_total), 6) AS tv,
         |  ((present_term + (n_total - cov_g) * k) * $TCloseDen
         |    <= $TCloseNum * k * n_total)::int AS t_close
         |FROM p""".stripMargin,
    // mirrors dqLdiversity: same leading-term regex, same truncating
    // bucket division, two-stage (class, sens)-count → class roll-up,
    // int-cast flags — all evidence exact integers
    "dq_ldiversity" ->
      s"""WITH q AS (
         |  SELECT lang, source, n_chars // $KanonLenBucket AS len_bucket,
         |    regexp_extract(text, '^ *([^ ]+)', 1) AS sens
         |  FROM documents
         |), sc AS (
         |  SELECT lang, source, len_bucket, sens, count(*)::bigint AS cnt
         |  FROM q GROUP BY 1, 2, 3, 4
         |)
         |SELECT lang, source, len_bucket,
         |  sum(cnt)::bigint AS k,
         |  count(*)::bigint AS l_distinct,
         |  max(cnt)::bigint AS max_sens_cnt,
         |  (count(*) >= $DiversityL)::int AS diverse,
         |  (max(cnt) = sum(cnt))::int AS homogeneous
         |FROM sc GROUP BY 1, 2, 3""".stripMargin,
    // mirrors dqLdiversity2: second-leading-term regex, the same
    // two-stage roll-up, plus the generalized distinct count from the
    // (class, sens)-distinct frame and the rescue flag
    "dq_ldiversity2" ->
      s"""WITH q AS (
         |  SELECT lang, source, n_chars // $KanonLenBucket AS len_bucket,
         |    regexp_extract(text, '^ *[^ ]+ +([^ ]+)', 1) AS sens
         |  FROM documents
         |), sc AS (
         |  SELECT lang, source, len_bucket, sens, count(*)::bigint AS cnt
         |  FROM q GROUP BY 1, 2, 3, 4
         |), cls AS (
         |  SELECT lang, source, len_bucket,
         |    sum(cnt)::bigint AS k,
         |    count(*)::bigint AS l_distinct,
         |    max(cnt)::bigint AS max_sens_cnt
         |  FROM sc GROUP BY 1, 2, 3
         |), gen AS (
         |  SELECT lang, len_bucket, count(DISTINCT sens)::bigint AS l_gen
         |  FROM sc GROUP BY 1, 2
         |)
         |SELECT c.lang, c.source, c.len_bucket, c.k, c.l_distinct,
         |  c.max_sens_cnt, g.l_gen,
         |  (c.l_distinct >= $DiversityL)::int AS diverse,
         |  (c.l_distinct < $DiversityL AND g.l_gen >= $DiversityL)::int AS rescued
         |FROM cls c JOIN gen g
         |  ON c.lang = g.lang AND c.len_bucket = g.len_bucket""".stripMargin,
    // mirrors dqKanon: same truncating length-bucket division, the
    // class count, the class-frame roll-up for the generalized k, and
    // int-cast flags (the dq_constraints `passed` precedent)
    "dq_kanon" ->
      s"""WITH q AS (
         |  SELECT lang, source, n_chars // $KanonLenBucket AS len_bucket
         |  FROM documents
         |), cls AS (
         |  SELECT lang, source, len_bucket, count(*)::bigint AS k
         |  FROM q GROUP BY 1, 2, 3
         |), gen AS (
         |  SELECT lang, len_bucket, sum(k)::bigint AS k_gen
         |  FROM cls GROUP BY 1, 2
         |)
         |SELECT c.lang, c.source, c.len_bucket, c.k,
         |  (c.k < $KanonK)::int AS at_risk,
         |  (c.k < $KanonK AND g.k_gen >= $KanonK)::int AS rescued
         |FROM cls c JOIN gen g
         |  ON c.lang = g.lang AND c.len_bucket = g.len_bucket""".stripMargin,
    // mirrors dqDrift: floor(epoch) for the truncating ts→long cast,
    // the same no-division midpoint and integer band arithmetic, the
    // same Laplace-smoothed psi fold
    "dq_drift" ->
      """WITH ev AS (
        |  SELECT event_type, floor(epoch(ts))::bigint AS s,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), bounds AS (
        |  SELECT min(s) AS min_s, max(s) AS max_s,
        |    min(cents) AS min_c, max(cents) AS max_c
        |  FROM ev
        |), tagged AS (
        |  SELECT event_type,
        |    CASE WHEN s * 2 <= min_s + max_s THEN 'a' ELSE 'b' END AS win,
        |    (cents - min_c) // ((max_c - min_c) // 10 + 1) AS bucket
        |  FROM ev, bounds
        |), counts AS (
        |  SELECT event_type, bucket,
        |    sum(CASE WHEN win = 'a' THEN 1 ELSE 0 END)::bigint AS a_n,
        |    sum(CASE WHEN win = 'b' THEN 1 ELSE 0 END)::bigint AS b_n
        |  FROM tagged GROUP BY 1, 2
        |), grid AS (
        |  SELECT t.event_type, b.bucket
        |  FROM (SELECT DISTINCT event_type FROM counts) t
        |  CROSS JOIN (SELECT unnest(range(10)) AS bucket) b
        |), dense AS (
        |  SELECT g.event_type, g.bucket,
        |    coalesce(c.a_n, 0) AS a_n, coalesce(c.b_n, 0) AS b_n
        |  FROM grid g LEFT JOIN counts c
        |    ON g.event_type = c.event_type AND g.bucket = c.bucket
        |), tot AS (
        |  SELECT event_type, sum(a_n)::bigint AS a_total,
        |    sum(b_n)::bigint AS b_total
        |  FROM dense GROUP BY 1
        |)
        |SELECT d.event_type, t.a_total, t.b_total,
        |  round(sum(
        |    ((d.a_n + 1)::double / (t.a_total + 10)
        |      - (d.b_n + 1)::double / (t.b_total + 10))
        |    * ln(((d.a_n + 1)::double / (t.a_total + 10))
        |         / ((d.b_n + 1)::double / (t.b_total + 10)))), 4) AS psi
        |FROM dense d JOIN tot t ON d.event_type = t.event_type
        |GROUP BY 1, 2, 3""".stripMargin,

    "dq_constraints" ->
      """WITH m AS (
        |  SELECT count(*)::double AS row_count,
        |    sum(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END)::double / count(*) AS comp_orderkey,
        |    min(l_quantity) AS min_qty,
        |    max(l_discount) AS max_disc,
        |    sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END)::double / count(*) AS dom_returnflag,
        |    count(DISTINCT (l_orderkey, l_linenumber))::double / count(*) AS uniq_pk
        |  FROM lineitem
        |), ri AS (
        |  SELECT count(*)::double AS orphans FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |), rules AS (
        |  SELECT 'row_count_min_1' AS check_name, row_count AS value, row_count >= 1.0 AS ok FROM m
        |  UNION ALL SELECT 'completeness_l_orderkey', comp_orderkey, comp_orderkey >= 1.0 FROM m
        |  UNION ALL SELECT 'min_l_quantity_ge_1', min_qty, min_qty >= 1.0 FROM m
        |  UNION ALL SELECT 'max_l_discount_le_0.1', max_disc, max_disc <= 0.1 FROM m
        |  UNION ALL SELECT 'domain_l_returnflag', dom_returnflag, dom_returnflag >= 1.0 FROM m
        |  UNION ALL SELECT 'unique_orderkey_linenumber', uniq_pk, uniq_pk >= 1.0 FROM m
        |  UNION ALL SELECT 'ri_orders_custkey', orphans, orphans <= 0.0 FROM ri
        |)
        |SELECT check_name, round(value, 4) AS value, ok::int AS passed FROM rules""".stripMargin,
    "dq_profile" ->
      """SELECT column_name, non_null, n_distinct,
        |  round(min_v, 4) AS min_v, round(max_v, 4) AS max_v, round(mean_v, 4) AS mean_v
        |FROM (
        |  SELECT 'l_quantity' AS column_name, count(l_quantity) AS non_null,
        |    count(DISTINCT l_quantity) AS n_distinct, min(l_quantity) AS min_v,
        |    max(l_quantity) AS max_v, avg(l_quantity) AS mean_v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', count(l_extendedprice),
        |    count(DISTINCT l_extendedprice), min(l_extendedprice),
        |    max(l_extendedprice), avg(l_extendedprice) FROM lineitem
        |  UNION ALL SELECT 'l_discount', count(l_discount),
        |    count(DISTINCT l_discount), min(l_discount),
        |    max(l_discount), avg(l_discount) FROM lineitem
        |  UNION ALL SELECT 'l_tax', count(l_tax),
        |    count(DISTINCT l_tax), min(l_tax),
        |    max(l_tax), avg(l_tax) FROM lineitem
        |) p""".stripMargin,
  )
}
