package graft

/** The pure-SQL user journey: views + functions registered once, then
  * everything — relational, vector, sketch — drives from spark.sql. */
class GraftSqlSpec extends SparkSpec {

  test("registerSql exposes tables and graft functions to plain SQL") {
    Graft.registerSql(spark, sfDir)
    val top = spark.sql(
      """SELECT n.n_name, count(*) AS n_cust
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n_cust DESC, n_name LIMIT 3""".stripMargin)
    assert(top.count() == 3)
    // vector function family reachable from SQL over the views
    val cos = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) AS c
        |FROM embeddings a JOIN embeddings b ON b.vec_id = 0
        |WHERE a.vec_id = 1""".stripMargin).collect()
    assert(cos.length == 1 && math.abs(cos.head.getDouble(1)) <= 1.0)
    // events view carries the converted timestamp (not the raw ns long)
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema("ts")
      .dataType.typeName == "timestamp")
    // r7 functions reachable from SQL: unit normalization + the
    // Misra-Gries heavy-hitters aggregate
    val nrm = spark.sql(
      """SELECT graft_dot(graft_normalize(embedding), graft_normalize(embedding)) AS n
        |FROM embeddings WHERE vec_id = 0""".stripMargin).collect()
    assert(nrm.length == 1 && math.abs(nrm.head.getDouble(0) - 1.0) < 1e-9)
    val hh = spark.sql(
      "SELECT graft_topk(event_type, 8) AS top FROM events").collect()
    assert(hh.length == 1 && hh.head.getMap[String, Long](0).nonEmpty)
    // the remaining registry entries: simhash aggregate + quantile hist
    // — with this, EVERY graft_* function is exercised from plain SQL
    val sh = spark.sql(
      """SELECT graft_simhash_agg(xxhash64(t.tok)) AS sig
        |FROM (SELECT explode(split(text, ' ')) AS tok FROM documents
        |      WHERE doc_id = 0) t""".stripMargin).collect()
    assert(sh.length == 1 && !sh.head.isNullAt(0))
    val qh = spark.sql(
      "SELECT graft_qhist(n_chars, 0, 4096, 16) AS h FROM documents").collect()
    assert(qh.length == 1 && qh.head.getAs[Seq[Long]](0).sum > 0)
    // r8: string-similarity kernel from SQL
    val jw = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw").collect()
    assert(jw.head.getDouble(0) == 0.9611111111111111)
    // r8: Count-Min frequency sketch from SQL
    val cms = spark.sql(
      "SELECT graft_cms(event_type, 4, 64) AS s FROM events").collect()
    assert(cms.length == 1 && cms.head.getAs[Seq[Long]](0).sum > 0)
    // r10: CDC boundary kernel from SQL — first boundary is always 1
    val cdc = spark.sql(
      "SELECT graft_cdc_boundaries(text, 8, 64) AS b FROM documents WHERE doc_id = 0")
      .collect()
    assert(cdc.length == 1 && cdc.head.getAs[Seq[Int]](0).headOption.contains(1))
    // r10: the as-of marker drives the K15 merge operator from SQL
    graft.plans.AsofJoin.ensureInstalled(spark)
    val asof = spark.sql(
      """SELECT count(*) AS n FROM
        |  (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |LEFT OUTER JOIN
        |  (SELECT user_id AS u2, ts AS ts2, max(event_id) AS rid
        |   FROM events WHERE event_type = 'click' GROUP BY 1, 2) c
        |ON p.user_id = c.u2 AND graft_asof_match(p.ts, c.ts2)""".stripMargin)
      .collect()
    val purchases = spark.sql(
      "SELECT count(*) FROM events WHERE event_type = 'purchase'")
      .collect().head.getLong(0)
    assert(asof.head.getLong(0) == purchases,
      "as-of from SQL must emit exactly one row per left row")
    // r11: theta sketch + set ops from SQL — distinct langs is small,
    // so exact mode makes the self-intersection exactly the count
    val theta = spark.sql(
      """SELECT graft_theta_estimate(sk) AS est,
        |  graft_theta_intersect(sk, sk) AS self_inter
        |FROM (SELECT graft_theta(lang) AS sk FROM documents)""".stripMargin)
      .collect().head
    val nLangs = spark.sql("SELECT count(DISTINCT lang) FROM documents")
      .collect().head.getLong(0)
    assert(theta.getDouble(0) == nLangs.toDouble &&
      theta.getDouble(1) == nLangs.toDouble,
      s"theta from SQL: $theta vs $nLangs")
  }
}
