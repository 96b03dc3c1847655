package graft.sim

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-facing similarity queries (SURVEY §2 F1-F2) with generated
  * DuckDB oracles; the hyperplane matrix is computed once in Scala and
  * embedded literally in BOTH the Spark plan and the oracle SQL.
  */
object SimQueries {

  val K = 5
  val NumQueries = 10      // query set: vec_id < 10
  val NumTables = 8        // LSH tables (union of candidates)
  val PlanesPerTable = 3
  val Dims = 64
  lazy val Tables64: Seq[Seq[Seq[Int]]] =
    Similarity.planeSigns(NumTables * PlanesPerTable, Dims)
      .grouped(PlanesPerTable).toSeq

  def simTopkBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteTopK(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < NumQueries), K)
  }

  def simAnnLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.annLsh(Tables.embeddings(spark, dir), "vec_id", "embedding",
      col("id") < NumQueries, K, Tables64)

  val NCentroids = 8
  val NProbe = 2

  def simIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfSearch(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < NumQueries), K, NCentroids, NProbe)
  }

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "sim_topk_brute" -> (simTopkBrute _),
    "sim_ann_lsh"    -> (simAnnLsh _),
    "sim_ivf"        -> (simIvf _),
  )

  // --- generated DuckDB oracles -------------------------------------

  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), z -> z[1]::double * z[2]::double))
       |      / (sqrt(list_sum(list_transform($a, x -> x::double * x::double)))
       |         * sqrt(list_sum(list_transform($b, x -> x::double * x::double))))""".stripMargin

  private def bucketSql(v: String, planes: Seq[Seq[Int]]): String =
    planes.map { pl =>
      val lits = pl.mkString("[", ", ", "]")
      s"CASE WHEN list_sum(list_transform(list_zip($v, $lits), z -> z[1]::double * z[2])) >= 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")

  def oracleSql: Map[String, String] = Map(
    "sim_topk_brute" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < $NumQueries),
         |n AS (SELECT vec_id AS n_id, embedding AS nv FROM embeddings),
         |s AS (
         |  SELECT q_id, n_id, ${cosSql("qv", "nv")} AS cos
         |  FROM q, n WHERE q_id <> n_id
         |), r AS (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM s
         |)
         |SELECT q_id, n_id, round(cos, 4) AS cos, rnk FROM r WHERE rnk <= $K""".stripMargin,

    "sim_ann_lsh" -> {
      val bandSelects = Tables64.zipWithIndex.map { case (pl, t) =>
        s"SELECT vec_id AS id, $t AS t, ${bucketSql("embedding", pl)} AS bucket FROM embeddings"
      }.mkString("\nUNION ALL\n")
      s"""WITH b AS (
         |$bandSelects
         |), q AS (SELECT id AS q_id, t, bucket FROM b WHERE id < $NumQueries),
         |cand AS (
         |  SELECT DISTINCT q.q_id, b.id
         |  FROM q JOIN b ON q.t = b.t AND q.bucket = b.bucket AND q.q_id <> b.id
         |), s AS (
         |  SELECT c.q_id, c.id AS n_id, ${cosSql("qe.embedding", "ne.embedding")} AS cos
         |  FROM cand c
         |  JOIN embeddings qe ON qe.vec_id = c.q_id
         |  JOIN embeddings ne ON ne.vec_id = c.id
         |), r AS (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM s
         |)
         |SELECT q_id, n_id, round(cos, 4) AS cos, rnk FROM r WHERE rnk <= $K""".stripMargin
    },

    "sim_ivf" ->
      s"""WITH c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings WHERE vec_id < $NCentroids),
         |v AS (SELECT vec_id AS id, embedding AS vv FROM embeddings),
         |asg AS (
         |  SELECT id, vv, c_id FROM (
         |    SELECT v.id, v.vv, c.c_id,
         |      row_number() OVER (PARTITION BY v.id
         |        ORDER BY ${cosSql("vv", "cv")} DESC, c.c_id) AS r
         |    FROM v, c) WHERE r = 1
         |),
         |q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < $NumQueries),
         |pr AS (
         |  SELECT q_id, qv, c_id FROM (
         |    SELECT q.q_id, q.qv, c.c_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${cosSql("qv", "cv")} DESC, c.c_id) AS r
         |    FROM q, c) WHERE r <= $NProbe
         |),
         |s AS (
         |  SELECT pr.q_id, asg.id AS n_id, ${cosSql("qv", "asg.vv")} AS cos
         |  FROM pr JOIN asg ON pr.c_id = asg.c_id WHERE pr.q_id <> asg.id
         |), r AS (
         |  SELECT q_id, n_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM s
         |)
         |SELECT q_id, n_id, round(cos, 4) AS cos, rnk FROM r WHERE rnk <= $K""".stripMargin,
  )
}
