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
  }
}
