package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX interop for the graph-analytics family (SURVEY §2 C2/C3
  * parity path — the north star names GraphX for graph operations).
  *
  * The DataFrame-native algorithms in [[Graphs]] are the primary
  * implementations (AQE, codegen, no RDD serialization overhead); this
  * module provides the same results through GraphX for users invested
  * in its API, and GraphSpec cross-validates the two paths against
  * each other — a strong mutual correctness check.
  *
  * Vertex ids: GraphX needs Long ids; we key vertices by xxhash64 of
  * the string id (stable, partition-independent). A 64-bit collision
  * over realistic vertex counts (<10^9) is ~10^-? negligible, and the
  * mapping frame carries the string id back to results.
  */
object GraphxInterop {

  /** (graph, vertex frame (vid, id)) from an undirected (u, v) edge
    * frame. Each undirected edge becomes two directed GraphX edges. */
  def toGraphX(und: DataFrame): (Graph[String, Int], DataFrame) = {
    val spark = und.sparkSession
    import spark.implicits._
    val verts = und.select(col("u").as("id")).unionAll(und.select(col("v").as("id")))
      .distinct().withColumn("vid", xxhash64(col("id")))
    val vertexRdd = verts.select("vid", "id").as[(Long, String)].rdd
    val edgeRdd = und
      .select(xxhash64(col("u")).as("src"), xxhash64(col("v")).as("dst"))
      .as[(Long, Long)].rdd
      .flatMap { case (s, d) => Seq(Edge(s, d, 1), Edge(d, s, 1)) }
    (Graph(vertexRdd.map { case (vid, id) => (vid: VertexId, id) }, edgeRdd), verts)
  }

  /** C2 via GraphX: (id, component) where component is the
    * lexicographically smallest member STRING id — the same canonical
    * labeling Graphs.connectedComponents produces, so the two paths
    * are directly comparable. */
  def connectedComponents(und: DataFrame): DataFrame = {
    val spark = und.sparkSession
    import spark.implicits._
    val (g, verts) = toGraphX(und)
    val cc = g.connectedComponents().vertices // (vid, min-vid of component)
      .toDF("vid", "cvid")
    val named = cc.join(verts, "vid").select(col("id"), col("cvid"))
    // canonicalize: min string id per component
    val canon = named.groupBy("cvid").agg(min(col("id")).as("component"))
    named.join(canon, "cvid").select(col("id"), col("component"))
  }

  /** C3 via GraphX staticPageRank. NOTE: GraphX semantics differ from
    * Graphs.pageRank in normalization (ranks sum to ~N, not 1) and
    * dangling-mass handling; rankings agree, absolute values do not —
    * see GraphSpec. Returns (id, rank). */
  def pageRank(und: DataFrame, iterations: Int = 10): DataFrame = {
    val spark = und.sparkSession
    import spark.implicits._
    val (g, verts) = toGraphX(und)
    g.staticPageRank(iterations).vertices.toDF("vid", "rank")
      .join(verts, "vid").select(col("id"), col("rank"))
  }
}
