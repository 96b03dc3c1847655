package graft.graph

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.kg.{KgQueries, Triples, GraphBuilder}

/** Driver-facing graph-analytics queries (SURVEY §2 C1-C6).
  *
  * graph_degrees / graph_bfs / graph_triangles are DuckDB-oracled
  * (BFS via a bounded recursive CTE). graph_cc / graph_pagerank are
  * iterative float/fixpoint algorithms — rows-only checks here,
  * exact-semantics coverage in GraphSpec on known graphs.
  */
object GraphQueries {

  val BfsSeed = "Nation|NATION_0" // synthetic testdata nation names are NATION_0..24
  val BfsHops = 3
  val TriangleMinQty = 45

  /** Built-once edge table per (session, dir): graph ANALYTICS consume
    * the constructed KG the way production does — the graph is built
    * once (kg_nodes/kg_edges are that build) and analytic queries read
    * the materialized table instead of re-extracting triples each time.
    * localCheckpoint stands in for the bucketed parquet table a real
    * deployment would write (BucketingSpec shows that path). */
  private val edgeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def kgEdges(spark: SparkSession, dir: String): DataFrame =
    edgeCache.getOrElseUpdate((spark, dir),
      GraphBuilder.edges(Triples.kgTriples(spark, dir)).localCheckpoint(eager = true))

  /** Geography subgraph (customer/supplier → nation → region): the
    * located-in/part-of relations only. Small diameter, converges in
    * 2-3 rounds — the right demo surface for iterative algorithms,
    * while full-corpus behavior is covered by GraphSpec. */
  private def geoEdges(spark: SparkSession, dir: String): DataFrame =
    kgEdges(spark, dir).filter(col("rel").isin("LOCATED_IN", "PART_OF"))

  def graphDegrees(spark: SparkSession, dir: String): DataFrame =
    Graphs.degrees(kgEdges(spark, dir))

  def graphBfs(spark: SparkSession, dir: String): DataFrame =
    Graphs.bfs(Graphs.undirectedIds(kgEdges(spark, dir)), BfsSeed, BfsHops)

  /** Triangle count over the high-quantity co-order part graph (two
    * parts are linked when some order contains both with quantity ≥
    * 45). Edges oriented low→high, counted by the two-join wedge
    * closure — the standard distributed triangle enumeration. */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= TriangleMinQty)
      .select(col("l_orderkey"), col("l_partkey"))
    val a = l.select(col("l_orderkey"), col("l_partkey").as("u"))
    val b = l.select(col("l_orderkey"), col("l_partkey").as("v"))
    val e = a.join(b, Seq("l_orderkey")).filter(col("u") < col("v"))
      .select("u", "v").distinct()
    val e1 = e.select(col("u").as("x"), col("v").as("y"))
    val e2 = e.select(col("u").as("y"), col("v").as("z"))
    val e3 = e.select(col("u").as("x"), col("v").as("z"))
    e1.join(e2, "y").join(e3, Seq("x", "z"))
      .agg(count(lit(1)).as("triangles"))
  }

  def graphCc(spark: SparkSession, dir: String): DataFrame =
    Graphs.connectedComponents(Graphs.undirectedIds(geoEdges(spark, dir)))

  def graphPagerank(spark: SparkSession, dir: String): DataFrame =
    Graphs.pageRank(Graphs.undirectedIds(geoEdges(spark, dir)), iterations = 10)

  val LpaIterations = 3

  def graphLpa(spark: SparkSession, dir: String): DataFrame =
    Graphs.labelPropagation(Graphs.undirectedIds(geoEdges(spark, dir)), LpaIterations)

  /** Degree distribution of the KG (count of nodes per total degree) —
    * the first structural sanity check on any built graph. */
  def graphDegreeDist(spark: SparkSession, dir: String): DataFrame =
    Graphs.degrees(kgEdges(spark, dir))
      .groupBy("total_deg").agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("total_deg"))

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "graph_degrees"   -> (graphDegrees _),
    "graph_degree_dist" -> (graphDegreeDist _),
    "graph_bfs"       -> (graphBfs _),
    "graph_triangles" -> (graphTriangles _),
    "graph_cc"        -> (graphCc _),
    "graph_pagerank"  -> (graphPagerank _),
    "graph_lpa"       -> (graphLpa _),
  )

  // --- oracles ------------------------------------------------------

  private val edgesCte =
    s"WITH t AS (${KgQueries.triplesSql}),\ne AS (\n${KgQueries.edgesSelectSql}\n)"

  def oracleSql: Map[String, String] = Map(
    "graph_degrees" ->
      s"""$edgesCte,
         |o AS (SELECT src_label AS label, src AS name, count(*) AS out_deg FROM e GROUP BY 1,2),
         |i AS (SELECT dst_label AS label, dst AS name, count(*) AS in_deg FROM e GROUP BY 1,2)
         |SELECT coalesce(o.label, i.label) AS label, coalesce(o.name, i.name) AS name,
         |  coalesce(out_deg, 0) AS out_deg, coalesce(in_deg, 0) AS in_deg,
         |  coalesce(out_deg, 0) + coalesce(in_deg, 0) AS total_deg
         |FROM o FULL OUTER JOIN i ON o.label = i.label AND o.name = i.name""".stripMargin,

    "graph_bfs" -> {
      // RECURSIVE must be declared on the WITH that opens the query
      val body = edgesCte.replaceFirst("WITH ", "WITH RECURSIVE ")
      s"""$body,
         |und0 AS (
         |  SELECT DISTINCT
         |    least(src_label || '|' || src, dst_label || '|' || dst) AS u,
         |    greatest(src_label || '|' || src, dst_label || '|' || dst) AS v
         |  FROM e WHERE src_label || '|' || src <> dst_label || '|' || dst
         |),
         |und AS (SELECT u, v FROM und0 UNION ALL SELECT v, u FROM und0),
         |bfs(id, d) AS (
         |  SELECT '$BfsSeed', 0
         |  UNION
         |  SELECT und.v, bfs.d + 1 FROM bfs JOIN und ON und.u = bfs.id
         |  WHERE bfs.d < $BfsHops
         |)
         |SELECT id, min(d) AS depth FROM bfs GROUP BY id""".stripMargin
    },

    "graph_degree_dist" ->
      s"""$edgesCte,
         |o AS (SELECT src_label AS label, src AS name, count(*) AS out_deg FROM e GROUP BY 1,2),
         |i AS (SELECT dst_label AS label, dst AS name, count(*) AS in_deg FROM e GROUP BY 1,2),
         |d AS (
         |  SELECT coalesce(out_deg, 0) + coalesce(in_deg, 0) AS total_deg
         |  FROM o FULL OUTER JOIN i ON o.label = i.label AND o.name = i.name
         |)
         |SELECT total_deg, count(*) AS n_nodes FROM d GROUP BY 1""".stripMargin,

    "graph_lpa" -> {
      val iterCtes = (1 to LpaIterations).map { i =>
        s"""lbl$i AS (
           |  SELECT id, lbl FROM (
           |    SELECT und.u AS id, l.lbl, count(*) AS n,
           |      row_number() OVER (PARTITION BY und.u
           |        ORDER BY count(*) DESC, l.lbl) AS r
           |    FROM und JOIN lbl${i - 1} l ON und.v = l.id
           |    GROUP BY und.u, l.lbl
           |  ) WHERE r = 1
           |)""".stripMargin
      }.mkString(",\n")
      s"""$edgesCte,
         |g AS (SELECT * FROM e WHERE rel IN ('LOCATED_IN', 'PART_OF')),
         |und0 AS (
         |  SELECT DISTINCT
         |    least(src_label || '|' || src, dst_label || '|' || dst) AS u,
         |    greatest(src_label || '|' || src, dst_label || '|' || dst) AS v
         |  FROM g WHERE src_label || '|' || src <> dst_label || '|' || dst
         |),
         |und AS (SELECT u, v FROM und0 UNION ALL SELECT v, u FROM und0),
         |lbl0 AS (SELECT DISTINCT u AS id, u AS lbl FROM und),
         |$iterCtes
         |SELECT id, lbl FROM lbl$LpaIterations""".stripMargin
    },

    "graph_triangles" ->
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |)
         |SELECT count(*) AS triangles
         |FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v""".stripMargin,
    // graph_cc / graph_pagerank: iterative fixpoints — rows-only.
  )
}
