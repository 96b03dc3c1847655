package graft.graph

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.kg.{KgQueries, Triples, GraphBuilder}

/** Driver-facing graph-analytics queries (SURVEY §2 C1-C6).
  *
  * Every query is DuckDB-oracled: BFS and connected components via
  * recursive CTEs (CC is the same min-label closure proven by the
  * dedup_survivors oracle), PageRank via generated fixed-iteration SQL
  * (the graph_lpa pattern) mirroring Graphs.pageRank's float operations
  * step for step, rounded to 6 decimals on both sides.
  */
object GraphQueries {

  val BfsSeed = "Nation|NATION_0" // synthetic testdata nation names are NATION_0..24
  val BfsHops = 3
  val TriangleMinQty = 45
  val PrIterations = 10
  /** PPR converges to source-relative proximity much faster than the
    * uniform walk (teleport keeps re-concentrating mass); 5 rounds is
    * the demo sweet spot and halves the second 10-round loop's bench
    * cost. The oracle generator shares this constant. */
  val PprIterations = 5
  val PrDamping = 0.85

  /** Built-once PERSISTED edge table per (session, dir): graph
    * ANALYTICS consume the constructed KG the way production does — the
    * graph is built once (kg_nodes/kg_edges are that build) and
    * analytic queries read the bucketed parquet table instead of
    * re-extracting triples each time. Unlike the r2 localCheckpoint
    * cache this survives as a real table (write-once / query-many,
    * shareable across jobs), bucketed by src for src-keyed joins. */
  private def kgEdges(spark: SparkSession, dir: String): DataFrame =
    KgQueries.storedEdges(spark, dir)

  /** Geography subgraph (customer/supplier → nation → region): the
    * located-in/part-of relations only. Small diameter, converges in
    * 2-3 rounds — the right demo surface for iterative algorithms,
    * while full-corpus behavior is covered by GraphSpec. */
  private def geoEdges(spark: SparkSession, dir: String): DataFrame =
    kgEdges(spark, dir).filter(col("rel").isin("LOCATED_IN", "PART_OF"))

  def graphDegrees(spark: SparkSession, dir: String): DataFrame =
    Graphs.degrees(kgEdges(spark, dir))

  /** Persisted HASHED traversal surface (r5; doubled r10): the
    * xxhash64 edge list with BOTH directions materialized, and the
    * (hash → string id) vertex dictionary, bucketed parquet next to
    * the edge table. BFS's per-query cost was dominated by re-deriving
    * these from the edge table — hashing every edge, a corpus-wide
    * string distinct for the dictionary, and (until r10) a per-query
    * union+localCheckpoint to double the one-direction frame — on
    * EVERY call; at 100 TB the traversal structure is exactly what you
    * materialize once beside the graph. Storing the doubled frame
    * bucketed on u means a hop join against a broadcast frontier reads
    * the store and moves nothing. */
  private def storedUndHashed(spark: SparkSession, dir: String): DataFrame = {
    import graft.store.GraftStore
    spark.table(GraftStore.ensureBucketed(
      spark, s"graft_undh2_${GraftStore.dirKey(dir)}", 32, Seq("u")) {
      val one = Graphs.undirectedIds(kgEdges(spark, dir), dedupe = false)
        .select(xxhash64(col("u")).as("u"), xxhash64(col("v")).as("v"))
      one.unionAll(one.select(col("v").as("u"), col("u").as("v")))
    })
  }

  /** Persisted DIRECTED hashed edge list (r8) — dagLayers' input. The
    * r8 profile put graph_layers' per-round cost almost entirely in
    * carrying ~25-byte composite-string keys through six join+agg
    * rounds; two xxhash64 longs per edge cut the round shuffles and the
    * per-round level-frame broadcast to 8-byte keys (the bfsHashed
    * move applied to the layering loop). Collision headroom: 166k
    * vertices at sf0.1 → P(any collision) ≈ 7e-10; even 10⁹ vertices
    * (100 TB KG) stays ≈ 2.7e-2 against a 64-bit space — and a
    * collision can only merge two vertices' levels, never diverge the
    * walk. Distinct on the hashed pair mirrors the string distinct. */
  private def storedDirHashed(spark: SparkSession, dir: String): DataFrame = {
    import graft.store.GraftStore
    spark.table(GraftStore.ensureBucketed(
      spark, s"graft_dirh_${GraftStore.dirKey(dir)}", 32, Seq("u")) {
      kgEdges(spark, dir).select(
          xxhash64(concat_ws("|", col("src_label"), col("src"))).as("u"),
          xxhash64(concat_ws("|", col("dst_label"), col("dst"))).as("v"))
        .distinct()
    })
  }

  private def storedVertexDict(spark: SparkSession, dir: String): DataFrame = {
    import graft.store.GraftStore
    spark.table(GraftStore.ensureBucketed(
      spark, s"graft_vdict_${GraftStore.dirKey(dir)}", 32, Seq("h")) {
      val und = Graphs.undirectedIds(kgEdges(spark, dir), dedupe = false)
      // rank: dense position in lexicographic id order — an
      // order-isomorphic integer surrogate, so min-label closures
      // (graph_scc) propagate 8-byte longs instead of ~25-byte strings
      // and still resolve to the same representative when mapped back.
      // r11: built by Graphs.rankedAsc (distributed range-sort +
      // per-partition-offset rank) — the previous
      // row_number().over(Window.orderBy(id)) collapsed the whole
      // vertex set into ONE task, the last single-partition global
      // sort in the repo; the two-pass rank keeps every stage
      // `parts`-way parallel at any vertex count.
      val ids = und.select(col("u").as("id"))
        .unionAll(und.select(col("v").as("id"))).distinct()
      Graphs.rankedAsc(ids, "id", "rank")
        .select(xxhash64(col("id")).as("h"), col("id"), col("rank"))
    })
  }

  /** Persisted undirected geo edge list (deduped, canonical
    * least→greatest string ids) — the shared input of the iterative
    * family (cc / pagerank / lpa), which each re-derived it (scan +
    * filter + corpus distinct) per query until r5. Bucketed by u: every
    * iterative algorithm's per-round join keys on the vertex id. */
  private def storedGeoUnd(spark: SparkSession, dir: String): DataFrame = {
    import graft.store.GraftStore
    spark.table(GraftStore.ensureBucketed(
      spark, s"graft_geound_${GraftStore.dirKey(dir)}", 32, Seq("u")) {
      Graphs.undirectedIds(geoEdges(spark, dir))
    })
  }

  /** Persisted geo vertex set: saves pagerank/lpa the per-query
    * union+distinct over the edge list (and pagerank's count action
    * reads this narrow table instead of the derived frame). */
  private def storedGeoVerts(spark: SparkSession, dir: String): DataFrame = {
    import graft.store.GraftStore
    spark.table(GraftStore.ensureBucketed(
      spark, s"graft_geoverts_${GraftStore.dirKey(dir)}", 32, Seq("id")) {
      val und = storedGeoUnd(spark, dir)
      und.select(col("u").as("id")).unionAll(und.select(col("v").as("id"))).distinct()
    })
  }

  /** Bench hook: force the one-time traversal-table builds so they are
    * paid (and reported) outside per-query timings. */
  def warmStores(spark: SparkSession, dir: String): Unit = {
    storedUndHashed(spark, dir); storedVertexDict(spark, dir)
    storedDirHashed(spark, dir)
    storedGeoUnd(spark, dir); storedGeoVerts(spark, dir)
    storedCoOrder(spark, dir); storedLouvain1(spark, dir)
    storedLpaLabels(spark, dir); storedNeighborhood(spark, dir); ()
  }

  /** K18: recursive CTE through the SQL front door (Spark 4's
    * WITH RECURSIVE → UnionLoopExec) — the geo containment hierarchy
    * (region → nation → supplier/customer) expanded with depth and a
    * materialized root-to-node path, written as DECLARATIVE SQL a
    * migrating warehouse user would hand the engine verbatim. Spark's
    * recursion supports UNION ALL only (probed: UNION raises
    * UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so the shape is chosen
    * where UNION ALL is exact: the hierarchy is a TREE (each child
    * one parent under MERGE-deduped edges), so path enumeration IS
    * node enumeration — no walk explosion at any scale, recursion
    * depth bound by the hierarchy's (2), not the data size. Cyclic /
    * high-fan traversals stay on the hand-built frontier loops
    * ([[graphBfs]]) — that split is the 100 TB design point. The
    * DuckDB oracle runs the same recursion over its own edge CTEs. */
  def graphHierarchy(spark: SparkSession, dir: String): DataFrame = {
    geoEdges(spark, dir).select(
        concat_ws("|", col("src_label"), col("src")).as("child"),
        concat_ws("|", col("dst_label"), col("dst")).as("parent"))
      .distinct()
      .createOrReplaceTempView("graft_geo_cp")
    spark.sql(
      """WITH RECURSIVE h(id, depth, path) AS (
        |  SELECT DISTINCT parent, 0, parent
        |  FROM graft_geo_cp WHERE parent LIKE 'Region|%'
        |  UNION ALL
        |  SELECT c.child, h.depth + 1, h.path || '/' || c.child
        |  FROM h JOIN graft_geo_cp c ON c.parent = h.id
        |)
        |SELECT id, depth, path FROM h""".stripMargin)
  }

  def graphBfs(spark: SparkSession, dir: String): DataFrame =
    // dedupe=false upstream: min-depth is invariant to parallel edges,
    // so the stored edge list skips the corpus-wide distinct; the
    // store is already doubled, so the loop runs with zero per-query
    // edge materialization
    Graphs.bfsHashedOn(storedUndHashed(spark, dir),
      storedVertexDict(spark, dir), BfsSeed, BfsHops)

  /** High-quantity co-order part graph (two parts are linked when some
    * order contains both with quantity ≥ 45), edges oriented low→high,
    * deduped — the non-tree demo graph for triangles and k-core (the
    * geo subgraph is a tree, whose every k≥2 core is empty).
    *
    * PERSISTED (r7): eight queries (triangles, kcore, sssp, harmonic,
    * betweenness, assortativity, jaccard + the weighted variant) each
    * re-derived this lineitem self-join per query; the store pays it
    * once. One (u, v, cnt) table serves BOTH the unweighted edge set
    * (its key set) and the weighted graph (w = 1/cnt): the weighted
    * derivation's distinct (order, part) self-join groups to exactly
    * the same key set the unweighted distinct produces. */
  private def storedCoOrder(spark: SparkSession, dir: String): DataFrame = {
    import graft.store.GraftStore
    spark.table(GraftStore.ensureBucketed(
      spark, s"graft_coord_${GraftStore.dirKey(dir)}", 32, Seq("u")) {
      val l = Tables.lineitem(spark, dir)
        .filter(col("l_quantity") >= TriangleMinQty)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val a = l.select(col("l_orderkey"), col("l_partkey").as("u"))
      val b = l.select(col("l_orderkey"), col("l_partkey").as("v"))
      a.join(b, Seq("l_orderkey")).filter(col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("cnt"))
    })
  }

  private def coOrderEdges(spark: SparkSession, dir: String): DataFrame =
    storedCoOrder(spark, dir).select("u", "v")

  /** Triangle count by the two-join wedge closure — the standard
    * distributed triangle enumeration. */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    val e = coOrderEdges(spark, dir)
    val e1 = e.select(col("u").as("x"), col("v").as("y"))
    val e2 = e.select(col("u").as("y"), col("v").as("z"))
    val e3 = e.select(col("u").as("x"), col("v").as("z"))
    e1.join(e2, "y").join(e3, Seq("x", "z"))
      .agg(count(lit(1)).as("triangles"))
  }

  /** C37: Gini coefficient of the degree distribution — ONE number
    * for "how hub-dominated is this graph" (0 = regular, →1 = a few
    * hubs own every edge); the inequality lens on C1's degree
    * histogram. Sorted-rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σx) /
    * (n·Σx) over degrees ranked ascending — the global sort is the
    * DISTRIBUTED rankedAsc on a composite (deg·2³² + id) key (range
    * sort + per-partition offsets, no single-partition stage), the
    * sums are exact integers, one final division. */
  def graphDegreeGini(spark: SparkSession, dir: String): DataFrame = {
    val e = coOrderEdges(spark, dir)
    val degRaw = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)
    // the composite (deg·2³² + id) key is only order-correct while
    // id < 2³² and deg < 2³¹ (no collision, no long overflow) — guard
    // it explicitly rather than silently mis-rank at extreme scale
    // (one tiny agg over the already-checkpointed frame)
    val b = degRaw.agg(max(col("x").cast("long")).as("mx"),
      max(col("deg")).as("md")).head()
    require(b.isNullAt(0) || (b.getLong(0) < 4294967296L && b.getLong(1) < 2147483648L),
      s"graphDegreeGini composite key domain exceeded (max id=${b.get(0)}, " +
        s"max deg=${b.get(1)}): rank on a (deg, id) struct instead")
    val deg = degRaw
      // composite key: unique per vertex, orders by (deg, id)
      .select((col("deg") * lit(4294967296L) + col("x")).as("key"),
        col("deg"))
    val ranked = Graphs.rankedAsc(deg.select("key"), "key", "rnk")
    deg.join(ranked, "key")
      .agg(count(lit(1)).as("n"),
        sum(col("deg")).as("sd"),
        sum(col("rnk") * col("deg")).as("srd"))
      .select(col("n").as("n_vertices"), col("sd").as("sum_degree"),
        round((lit(2L) * col("srd") - (col("n") + 1) * col("sd"))
          .cast("double") / (col("n") * col("sd")), 6).as("gini"))
  }

  /** C36: global graphlet census + transitivity — one row summarizing
    * the graph's shape: edges, wedges (Σ deg·(deg−1)/2), triangles,
    * and the transitivity coefficient 3·△/wedges — the GLOBAL
    * companion to C19's per-vertex clustering (the two diverge
    * exactly when hubs exist: transitivity weights hubs by their
    * wedge counts, the lcc average doesn't — reporting both is the
    * textbook topology hygiene). Integer counts from frames already
    * computed elsewhere; one display division. */
  def graphTransitivity(spark: SparkSession, dir: String): DataFrame = {
    val e = coOrderEdges(spark, dir).localCheckpoint(eager = true)
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val wedges = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("deg"))
      .agg(sum(col("deg") * (col("deg") - 1)).as("_w2"))
      .select(expr("_w2 div 2").as("n_wedges"))
    val e1 = e.select(col("u").as("x"), col("v").as("y"))
    val e2 = e.select(col("u").as("y"), col("v").as("z"))
    val e3 = e.select(col("u").as("x"), col("v").as("z"))
    val tri = e1.join(e2, "y").join(e3, Seq("x", "z"))
      .agg(count(lit(1)).as("n_triangles"))
    nEdges.crossJoin(wedges).crossJoin(tri)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .as("transitivity"))
  }

  /** C19 driver query: local clustering coefficient per vertex of the
    * co-order part graph — lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),
    * the per-vertex "how clique-like is my neighborhood" signal C4's
    * global count can't give. One wedge-closure triangle enumeration
    * (each triangle credits its 3 corners) + one degree aggregation;
    * same oriented u<v edge input as graph_triangles, so the joins
    * reuse the stored co-order layout. Exact integer counts; the one
    * float is a fixed expression both engines evaluate identically. */
  def graphClustering(spark: SparkSession, dir: String): DataFrame =
    Graphs.localClustering(coOrderEdges(spark, dir))

  val KCoreK = 3
  val KCoreIterations = 6 // ≥ observed convergence depth on this graph

  def graphKcore(spark: SparkSession, dir: String): DataFrame =
    Graphs.kCore(coOrderEdges(spark, dir), KCoreK, KCoreIterations)

  val OnionKMax = 3
  val OnionRoundsPerK = 4

  /** C38 driver query: onion decomposition of the co-order part graph
    * — per vertex its coreness AND the peel round (layer) it survived
    * to. The fixed (k ≤ 3, 4 rounds per k) schedule defines the
    * result; sequential stages converge faster than graph_kcore's
    * direct k=3 peel because the k<3 shells are already gone, and
    * GraphSpec pins coreness-3 == the independent kCore fixpoint. */
  def graphOnion(spark: SparkSession, dir: String): DataFrame =
    // kMin = 2: stage 1 is a provable no-op on an edge-derived vertex
    // set (see Graphs.onion) — a third of the barrier floors for free
    Graphs.onion(coOrderEdges(spark, dir), OnionKMax, OnionRoundsPerK,
      kMin = 2)

  val KTrussK = 3
  val KTrussIterations = 4

  /** C17 driver query: 3-truss of the co-order part graph — every
    * surviving edge sits in ≥ 1 triangle of the surviving subgraph
    * (edge-level cohesion; the k-core of edges). Fixed-round peel over
    * the stored canonical edge set. */
  def graphKtruss(spark: SparkSession, dir: String): DataFrame =
    Graphs.kTruss(coOrderEdges(spark, dir), KTrussK, KTrussIterations)

  val WalkSteps = 4

  /** C18 driver query: deterministic random-walk corpus over the
    * co-order part graph — one walk per vertex, 4 hops, hash-driven
    * neighbor choice (the graph-embedding training-data generator). */
  def graphWalks(spark: SparkSession, dir: String): DataFrame =
    Graphs.randomWalks(coOrderEdges(spark, dir), WalkSteps)

  /** C32 driver query: node2vec second-order biased walks over the
    * same co-order graph (p = 4, q = 2 — BFS-leaning; see
    * Graphs.node2vecWalks for the integer-exponent draw). */
  def graphNode2vec(spark: SparkSession, dir: String): DataFrame =
    Graphs.node2vecWalks(coOrderEdges(spark, dir), WalkSteps)

  val SsspIterations = 4

  /** Co-order graph with weights: w = 1 / #orders-containing-both, so
    * frequently co-ordered parts are "close". Lineitems dedupe to
    * (order, part) first so a part repeated within one order counts
    * once. Reads the persisted (u, v, cnt) store table. */
  private def coOrderWeighted(spark: SparkSession, dir: String): DataFrame =
    storedCoOrder(spark, dir)
      .select(col("u"), col("v"), (lit(1.0) / col("cnt")).as("w"))

  /** C9 driver query: Bellman-Ford distances from the minimum part key
    * in the co-order graph. The seed rides IN-PLAN as a one-row
    * aggregate (min over the edge frame — the oracle computes the same
    * min in-SQL), so the query issues zero pre-plan driver actions,
    * the same convention as the PageRank family's in-plan scalars. */
  def graphSssp(spark: SparkSession, dir: String): DataFrame = {
    val e = coOrderWeighted(spark, dir).localCheckpoint(eager = true)
    Graphs.ssspFrom(e, e.agg(min(col("u")).as("id")), SsspIterations)
      .select(col("id"), round(col("d"), 6).as("dist"))
  }

  def graphCc(spark: SparkSession, dir: String): DataFrame =
    Graphs.connectedComponents(storedGeoUnd(spark, dir))

  /** C34: degree cutoffs the rich-club pass evaluates. */
  val RichClubKs: Seq[Int] = Seq(2, 4, 8)

  /** C34: rich-club coefficient φ(k) = 2·E_k / (N_k·(N_k−1)) over the
    * co-order graph — do high-degree parts preferentially co-order
    * with EACH OTHER (φ→1: an elite clique of staples; φ≈ the global
    * density: no club)? The classic topology probe next to C14's
    * assortativity. One degree table + per-k two semi-joins and two
    * 1-row counts — each k's subgraph restriction reuses the same
    * canonical edge frame — [integer counts, one display division]. */
  def graphRichClub(spark: SparkSession, dir: String): DataFrame = {
    val e = coOrderEdges(spark, dir).localCheckpoint(eager = true)
    val deg = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)
    RichClubKs.map { k =>
      val rich = deg.filter(col("deg") > k).select(col("x"))
      val nN = rich.agg(count(lit(1)).as("n_nodes"))
      val eK = e.join(rich.select(col("x").as("u")), Seq("u"), "left_semi")
        .join(rich.select(col("x").as("v")), Seq("v"), "left_semi")
        .agg(count(lit(1)).as("n_edges"))
      nN.crossJoin(eK).select(lit(k).as("k"), col("n_nodes"), col("n_edges"),
        when(col("n_nodes") >= 2,
          round(lit(2.0) * col("n_edges")
            / (col("n_nodes") * (col("n_nodes") - 1)), 6)).as("phi"))
    }.reduce(_ unionAll _)
  }

  /** C33: component-size histogram — the corpus-health view over C2
    * ("one giant component + dust" is the shape every entity-graph
    * audit checks first; a flat histogram means the blocking/ER step
    * under-merged). Two bounded aggregations over the CC labels —
    * output is histogram-scale, never vertex-scale. */
  def graphCcSizes(spark: SparkSession, dir: String): DataFrame =
    graphCc(spark, dir)
      .groupBy(col("component")).agg(count(lit(1)).as("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n_components"))

  /** C27 driver query: Borůvka MSF over the co-order graph with the
    * EXACT integer co-occurrence count as weight (min-cnt forest —
    * the skeleton of weakest links; no float ties to tie-break, and
    * struct(w, u, v) uniquifies picks regardless). Rows-only by
    * design: a minimum spanning forest is not SQL-expressible
    * (Kruskal/Prim are inherently sequential); semantics are pinned
    * by GraphSpec against an in-test Kruskal over the same edges with
    * the same total order — forest = the unique MSF, per-component
    * edge counts n−1, identical total weight.
    *
    * Bench-cost note (r11, measured ~17 s at sf0.1): the wall is
    * ~75 small jobs (O(log V) Borůvka rounds, each nesting a
    * star-contraction CC that runs 2 jobs per iteration on a
    * shrinking component graph), i.e. fixed per-job overhead in
    * local mode — NOT data volume; per-job data is tiny and the
    * job count is independent of scale, so the same plan on a
    * cluster at 1000× data pays the same ~75 rounds of latency
    * while each round stays fully parallel. */
  /** Round budget shared by the driver query and its generated oracle
    * (16 ≫ the O(log V) rounds Borůvka needs; converged rounds pick
    * nothing on both sides). */
  val MsfRounds = 16

  def graphMsf(spark: SparkSession, dir: String): DataFrame =
    Graphs.boruvkaMsf(coOrderCnt(spark, dir), maxRounds = MsfRounds)

  /** The (u, v, cnt→w) co-order edge list graph_msf runs on —
    * public so GraphSpec can Kruskal-check the forest on the SAME
    * input. */
  def coOrderCnt(spark: SparkSession, dir: String): DataFrame =
    storedCoOrder(spark, dir).select(col("u"), col("v"), col("cnt").as("w"))

  /** Ranks rounded to 6 decimals so the fixed-iteration SQL oracle can
    * hash-match: both engines run identical IEEE double operations in
    * element order; rounding absorbs the last-ulp difference from
    * engine-specific aggregation order. */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame =
    // checkpoint the stored vertex table ONCE per query: pageRank joins
    // it every iteration, and ten parquet re-reads cost more than one
    // materialization of a narrow frame (measured +0.8 s unbuffered)
    Graphs.pageRank(storedGeoUnd(spark, dir),
        vertices = Some(storedGeoVerts(spark, dir).localCheckpoint(eager = true)),
        iterations = PrIterations, damping = PrDamping)
      .select(col("id"), round(col("rank"), 6).as("rank"))

  val KatzIterations = 6
  /** Below 1/λmax for the geo graph across SFs (λmax ≈ √maxdeg; the
    * hub nations carry the largest degrees) so the Katz series
    * contracts rather than amplifies round over round. */
  val KatzAlpha = 0.005

  /** C26 driver query: Katz centrality over BOTH orientations of the
    * geo graph (symmetric Katz) — walk-counting importance where hubs
    * amplify, complementing graph_pagerank's degree-normalized rank;
    * same rounding contract (round 6 absorbs sum-order ulp). */
  def graphKatz(spark: SparkSession, dir: String): DataFrame = {
    val und = storedGeoUnd(spark, dir)
    val both = und.select(col("u"), col("v"))
      .unionAll(und.select(col("v").as("u"), col("u").as("v")))
    Graphs.katz(both, iterations = KatzIterations, alpha = KatzAlpha,
        beta = 1.0,
        vertices = Some(storedGeoVerts(spark, dir).localCheckpoint(eager = true)))
      .select(col("id"), round(col("katz"), 6).as("katz"))
  }

  /** PPR teleport set: the region vertices of the geo graph (ids are
    * "label|name", so the prefix selects exactly the 5 regions). */
  val PprSourcePrefix = "region|"

  /** C12 driver query: personalized PageRank from the region vertices —
    * proximity-weighted importance relative to the regions. Same
    * iteration count/damping (and rounding contract) as graph_pagerank. */
  def graphPpr(spark: SparkSession, dir: String): DataFrame = {
    val verts = storedGeoVerts(spark, dir).localCheckpoint(eager = true)
    Graphs.pageRankPersonalized(storedGeoUnd(spark, dir),
        verts.filter(col("id").startsWith(PprSourcePrefix)),
        iterations = PprIterations, damping = PrDamping,
        vertices = Some(verts))
      .select(col("id"), round(col("rank"), 6).as("rank"))
  }

  /** C31 iteration count — fewer than C12's: the batch frame carries
    * |seeds|× the state, and 5 rounds already separate the regions. */
  val PprBatchIterations = 5

  /** C31 driver query: one independent PPR vector per region seed —
    * the landmark-proximity features ("how close is every geo node to
    * EACH region"), 5 vectors in one keyed frame. */
  def graphPprBatch(spark: SparkSession, dir: String): DataFrame = {
    val verts = storedGeoVerts(spark, dir)
    Graphs.pageRankPersonalizedBatch(storedGeoUnd(spark, dir),
        verts.filter(col("id").startsWith(PprSourcePrefix)),
        iterations = PprBatchIterations, damping = PrDamping)
      .select(col("seed"), col("id"), round(col("rank"), 6).as("rank"))
      .filter(col("rank") >= 1e-6)
  }

  val LpaIterations = 3

  def graphLpa(spark: SparkSession, dir: String): DataFrame =
    storedLpaLabels(spark, dir)

  /** Persisted LPA sweep over the geo graph (r13) — built ONCE and
    * read by graph_lpa, graph_modularity, and graph_modularity_null
    * (each re-ran the full [[LpaIterations]]-round propagation before;
    * the storedLouvain1 discipline applied to C5). Bucketed by id:
    * every consumer joins labels on the vertex. */
  private def storedLpaLabels(spark: SparkSession, dir: String): DataFrame = {
    import graft.store.GraftStore
    spark.table(GraftStore.ensureBucketed(
      spark, s"graft_lpa_${GraftStore.dirKey(dir)}", 32, Seq("id")) {
      Graphs.labelPropagation(storedGeoUnd(spark, dir), LpaIterations,
        vertices = Some(storedGeoVerts(spark, dir)))
    })
  }

  /** C5w driver query: WEIGHTED label propagation over the co-order
    * part graph, votes summed by co-order COUNT (exact integers — the
    * strength signal graph_pagerank_w ranks by, driving communities):
    * parts that are frequently ordered together pull each other into
    * one community even against more numerous weak links. */
  def graphLpaWeighted(spark: SparkSession, dir: String): DataFrame =
    Graphs.labelPropagationWeighted(
      storedCoOrder(spark, dir).select(col("u"), col("v"), col("cnt").as("w")),
      LpaIterations)

  val LouvainRounds = 3

  /** C21 driver query: exact-integer Louvain one-level move over the
    * stored co-order weighted graph (integer co-order counts as
    * weights — the same weight column C5w votes with). */
  def graphLouvain(spark: SparkSession, dir: String): DataFrame =
    storedLouvain1(spark, dir)

  /** Persisted level-1 Louvain sweep over the co-order graph — built
    * ONCE and read by graph_louvain and every level-2+ consumer
    * (graph_louvain2 / _gain / _multi each re-ran the full level-1
    * sweep before; the F16 stored-graph discipline). */
  private def storedLouvain1(spark: SparkSession, dir: String): DataFrame = {
    import graft.store.GraftStore
    spark.table(GraftStore.ensureBucketed(
      spark, s"graft_louv1_${GraftStore.dirKey(dir)}", 32, Seq("id")) {
      Graphs.louvainMoveGuarded(
        storedCoOrder(spark, dir).select(col("u"), col("v"), col("cnt").as("w")),
        LouvainRounds)
    })
  }

  /** C21 level 2: condense level-1 communities to a super-graph
    * (exact integer inter-community weight sums) and re-run the
    * integer-gain sweep — the Blondel multi-level move. */
  def graphLouvain2(spark: SparkSession, dir: String): DataFrame =
    Graphs.louvainTwoLevel(
      storedCoOrder(spark, dir).select(col("u"), col("v"), col("cnt").as("w")),
      LouvainRounds, Some(storedLouvain1(spark, dir)))

  /** C21 multi-level depth (Blondel's outer loop, fixed). */
  val LouvainLevels = 3

  /** C21 full loop: the fixed-depth multi-level dendrogram — one
    * (id, level, community) row per vertex per level. */
  def graphLouvainMulti(spark: SparkSession, dir: String): DataFrame =
    Graphs.louvainLevels(
      storedCoOrder(spark, dir).select(col("u"), col("v"), col("cnt").as("w")),
      LouvainRounds, LouvainLevels, Some(storedLouvain1(spark, dir)))

  /** C21 quality dial: WEIGHTED modularity of the level-1 vs the
    * level-2 partition — the measurement that makes "level 2 merges
    * communities" an improvement claim, not a structural one. Exact
    * to the last bit before one display division: Q = Σc[e_in/m −
    * (d_c/2m)²] re-arranged to (4m·ΣE_in − Σd_c²)/(4m²), where ΣE_in
    * (intra-community weight), Σd_c² and m are exact integer sums —
    * no float accumulates across communities, so the cross-engine
    * float-sum-order trap never opens. */
  def graphLouvainGain(spark: SparkSession, dir: String): DataFrame = {
    val und = storedCoOrder(spark, dir)
      .select(col("u"), col("v"), col("cnt").as("w"))
      .localCheckpoint(eager = true)
    val both = Graphs.louvainTwoLevel(und, LouvainRounds,
        Some(storedLouvain1(spark, dir)))
      .localCheckpoint(eager = true)
    val deg = und.select(col("u").as("id"), col("w"))
      .unionAll(und.select(col("v").as("id"), col("w")))
      .groupBy("id").agg(sum("w").as("deg"))
    val mw = und.agg(sum("w")).head().getLong(0)
    def qOf(comm: DataFrame, level: Int): DataFrame = {
      val cm = comm.select(col("id"), col("c"))
      val ein = und
        .join(cm.select(col("id").as("u"), col("c").as("cu")), "u")
        .join(cm.select(col("id").as("v"), col("c").as("cv")), "v")
        .filter(col("cu") === col("cv"))
        .agg(coalesce(sum("w"), lit(0L)).as("e_in_w"))
      val d2 = cm.join(deg, "id").groupBy("c").agg(sum("deg").as("ds"))
        .agg(sum(col("ds") * col("ds")).as("d2_sum"),
          count(lit(1)).as("n_communities"))
      ein.crossJoin(d2).select(
        lit(level).as("level"), col("n_communities"),
        col("e_in_w"), col("d2_sum"),
        round((lit(4L) * lit(mw) * col("e_in_w") - col("d2_sum"))
          .cast("double") / (lit(4.0) * mw * mw), 6).as("q"))
    }
    qOf(both.select(col("id"), col("community_l1").as("c")), 1)
      .unionAll(qOf(both.select(col("id"), col("community").as("c")), 2))
  }

  /** Shared base CTEs for the Louvain oracles: the co-order weighted
    * graph, symmetrized edges, integer degrees, 2m, singleton seed. */
  private lazy val louvainBaseCtes: String =
    s"""l AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
       |  WHERE l_quantity >= $TriangleMinQty
       |), e0 AS MATERIALIZED (
       |  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS cnt
       |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |), und AS MATERIALIZED (
       |  SELECT u, v, cnt FROM e0 UNION ALL SELECT v, u, cnt FROM e0
       |), deg AS MATERIALIZED (
       |  SELECT u AS id, sum(cnt)::bigint AS deg FROM und GROUP BY 1
       |), tm AS (SELECT sum(deg)::bigint AS two_m FROM deg),
       |c0 AS MATERIALIZED (SELECT id, id AS c FROM deg)""".stripMargin

  /** The generated per-round MATERIALIZED k/D/cand/argmax CTEs of the
    * integer-gain sweep, parameterized by name prefix and the
    * edge/degree/2m CTEs so graph_louvain2 can run the SAME rounds
    * over the condensed super-graph in one statement. */
  private def louvainRoundCtesSql(pfx: String, und: String, deg: String,
      tm: String): String =
    (1 to LouvainRounds).map { i =>
      val prev = s"${pfx}c${i - 1}"
      s"""${pfx}k$i AS MATERIALIZED (
         |  SELECT und.u AS id, cm.c, sum(und.cnt)::bigint AS k
         |  FROM $und und JOIN $prev cm ON und.v = cm.id GROUP BY 1, 2
         |), ${pfx}dc$i AS MATERIALIZED (
         |  SELECT cm.c, sum(deg.deg)::bigint AS d_c
         |  FROM $prev cm JOIN $deg deg ON cm.id = deg.id GROUP BY 1
         |), ${pfx}cand$i AS MATERIALIZED (
         |  SELECT id, c, max(k)::bigint AS k FROM (
         |    SELECT id, c, k FROM ${pfx}k$i
         |    UNION ALL SELECT id, c, 0 AS k FROM $prev
         |  ) GROUP BY 1, 2
         |), ${pfx}c$i AS MATERIALIZED (
         |  SELECT id, c FROM (
         |    SELECT cand.id, cand.c,
         |      row_number() OVER (PARTITION BY cand.id ORDER BY
         |        ((SELECT two_m FROM $tm) * cand.k
         |          - deg.deg * (dc.d_c
         |              - CASE WHEN cand.c = cur.c THEN deg.deg ELSE 0 END)) DESC,
         |        cand.c) AS r
         |    FROM ${pfx}cand$i cand
         |    JOIN ${pfx}dc$i dc ON cand.c = dc.c
         |    JOIN $deg deg ON cand.id = deg.id
         |    JOIN $prev cur ON cand.id = cur.id
         |  ) WHERE r = 1
         |)""".stripMargin
    }.mkString(",\n")

  val LayerRounds = 6

  /** C22 driver query: longest-path layers over the FULL directed
    * typed-edge KG (composite label|name ids; the deepest legal chain
    * here is order→part→supplier→nation→region = 4 edges, so 6
    * rounds are exact and level 6 would flag a cycle). r8: iterates on
    * the stored hashed edge list (8-byte keys through all six rounds)
    * and maps hashes back to string ids through the vertex dictionary
    * ONCE at the end — the dict join keys on its bucket column. The
    * dict covers every layer vertex: it indexes all kg edge endpoints
    * and the corpus has zero self-loops (B14), so the inner join drops
    * nothing. */
  def graphLayers(spark: SparkSession, dir: String): DataFrame =
    Graphs.dagLayers(storedDirHashed(spark, dir), LayerRounds)
      .withColumnRenamed("id", "h")
      .join(storedVertexDict(spark, dir), "h")
      .select(col("id"), col("level"))

  /** Rounds for the SCC min-label closures — the LayerRounds bound
    * (longest legal KG chain is 4 edges, so 6 ≥ diameter makes both
    * closures exact on this corpus). */
  val SccRounds = 6

  /** C23 driver query: one forward-backward phase of SCC coloring
    * over the directed KG. fwd_min(v) = min composite id reachable
    * FROM v, bwd_min(v) = min id that REACHES v (both within
    * SccRounds ≥ diameter, so exact closures). The coloring theorem:
    * fwd and bwd are CONSTANT on an SCC (mutually-reachable vertices
    * share descendant and ancestor sets), and fwd_min(v) == bwd_min(v)
    * == m puts m in both sets, so the color class {v : fwd=bwd=m} is
    * exactly SCC(m) — sound and SCC-complete for every class that
    * colors. Classes whose min-reachable and min-reaching labels
    * disagree (a cycle fed by a smaller upstream id) stay uncolored in
    * one phase; the full decomposition peels colored vertices and
    * repeats, and a 2+-member class here — scc_id shared by two rows —
    * is already a proven sameAs-style cycle. GraphSpec pins both the
    * exact coloring of a pure cycle and the uncolored fed-cycle case;
    * C22's saturation stays the corpus-wide cycle alarm. String ids,
    * not hashes: the closure min is lexicographic, which the DuckDB
    * oracle mirrors. */
  def graphScc(spark: SparkSession, dir: String): DataFrame = {
    // runs on the stored hashed edge list with dictionary RANKS as the
    // propagated labels (order-isomorphic to the lexicographic string
    // min the oracle computes), so all SccRounds move 8-byte vertex
    // keys and 4-byte labels; the three dict joins at the end resolve
    // the vertex and both representative mins back to string ids
    // (same hash-collision headroom argument as storedDirHashed)
    val dict = storedVertexDict(spark, dir)
    Graphs.sccColoring(
        storedDirHashed(spark, dir), SccRounds,
        labels = Some(dict.select(col("h").as("id"), col("rank").as("lbl"))),
        pinEdges = false)
      .select(col("id").as("h"), col("fwd_min").as("fr"), col("bwd_min").as("br"))
      .join(dict.select(col("h"), col("id")), "h")
      .join(dict.select(col("rank").as("fr"), col("id").as("fwd_min")), "fr")
      .join(dict.select(col("rank").as("br"), col("id").as("bwd_min")), "br")
      .select(col("id"), col("fwd_min"), col("bwd_min"),
        when(col("fr") === col("br"), col("fwd_min")).as("scc_id"))
  }

  val HitsIterations = 5

  /** C10 driver query: HITS over the canonical-orientation geo edges
    * (same directed graph pageRank ranks), scores rounded to 6 decimals
    * for the generated fixed-iteration SQL oracle. */
  def graphHits(spark: SparkSession, dir: String): DataFrame =
    Graphs.hits(storedGeoUnd(spark, dir), HitsIterations,
        vertices = Some(storedGeoVerts(spark, dir).localCheckpoint(eager = true)))
      .select(col("id"), round(col("hub"), 6).as("hub"),
        round(col("auth"), 6).as("auth"))

  /** C13 driver query: modularity of the LPA partition over the geo
    * graph — how well the propagated communities separate the edges. */
  def graphModularity(spark: SparkSession, dir: String): DataFrame =
    Graphs.modularity(storedGeoUnd(spark, dir), storedLpaLabels(spark, dir))

  /** C39 driver query: modularity EXCESS over a degree-preserving
    * null model — "is Q = 0.12 actually good?" is unanswerable
    * without the configuration-model baseline (Newman's null
    * hypothesis: same degree sequence, random wiring). The rewiring
    * is DETERMINISTIC: each edge contributes two stubs, stubs rank by
    * md5("cfg|u|v|side") via the distributed rankedAsc (no global
    * window), and consecutive ranks pair into null edges — degrees
    * are preserved BY CONSTRUCTION (each vertex keeps exactly its
    * stub count; dsq_null == dsq_real in the output IS that proof),
    * self-loops/multi-edges kept per the standard model. Both Qs are
    * spelled as ONE division of exact integers — Q = (4m·Σe_in −
    * Σd_c²)/4m² (the louvain-gain spelling) — so no cross-engine
    * float-sum order exists anywhere. Output: the integer evidence +
    * both Qs + the excess. */
  def graphModularityNull(spark: SparkSession, dir: String): DataFrame = {
    val und = storedGeoUnd(spark, dir).select(col("u"), col("v"))
      .localCheckpoint(eager = true)
    val labels = storedLpaLabels(spark, dir)
    // guarded driver scalars (the adjudicated pattern): three exact
    // integers per face
    def pieces(e: DataFrame): (Long, Long, Long) = {
      val bi = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val deg = bi.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
      // every endpoint carries an LPA label, so the inner join keeps
      // all m edges — one action yields m AND e_in
      val r = e
        .join(labels.select(col("id").as("u"), col("lbl").as("lbl_u")), "u")
        .join(labels.select(col("id").as("v"), col("lbl").as("lbl_v")), "v")
        .agg(count(lit(1)).as("m"),
          sum((col("lbl_u") === col("lbl_v")).cast("long")).as("e_in"))
        .head
      val dsq = labels.join(deg, "id").groupBy("lbl")
        .agg(sum(col("deg")).as("d"))
        .agg(sum(col("d") * col("d"))).head.getLong(0)
      (r.getLong(0), r.getLong(1), dsq)
    }
    val (m, eInR, dsqR) = pieces(und)
    // key = 32-char md5 ++ "|" ++ vid: sliced back BY POSITION, so a
    // vertex id may contain any character (geo ids are strings)
    val stubs = und.select(col("u").as("vid"),
        md5(concat_ws("|", lit("cfg"), col("u"), col("v"), lit(0))).as("h"))
      .unionAll(und.select(col("v").as("vid"),
        md5(concat_ws("|", lit("cfg"), col("u"), col("v"), lit(1))).as("h")))
      .select(concat(col("h"), lit("|"), col("vid")).as("k"))
    val nullE = Graphs.rankedAsc(stubs, "k", "rn")
      .select(expr("substr(k, 34)").as("vid"),
        col("rn"), expr("(rn - 1) div 2").as("grp"))
      .groupBy("grp")
      .agg(expr("min_by(vid, rn)").as("u"), expr("max_by(vid, rn)").as("v"))
      .select(col("u"), col("v")).localCheckpoint(eager = true)
    val (m2, eInN, dsqN) = pieces(nullE)
    require(m2 == m, s"stub pairing must preserve edge count: $m2 != $m")
    def q(eIn: Long, dsq: Long): Double =
      (4L * m * eIn - dsq).toDouble / (4L * m * m).toDouble
    spark.range(1).select(lit(m).as("m"),
      lit(eInR).as("e_in_real"), lit(eInN).as("e_in_null"),
      lit(dsqR).as("dsq_real"), lit(dsqN).as("dsq_null"),
      round(lit(q(eInR, dsqR)), 6).as("q_real"),
      round(lit(q(eInN, dsqN)), 6).as("q_null"),
      round(lit(q(eInR, dsqR) - q(eInN, dsqN)), 6).as("q_excess"))
  }

  val HarmonicSources = 4
  val HarmonicHops = 3

  /** C15 driver query: harmonic centrality over the co-order part graph
    * from the 4 lowest-keyed part vertices (deterministic landmarks —
    * the IVF-pivot trick), one multi-source BFS loop for all of them. */
  def graphHarmonic(spark: SparkSession, dir: String): DataFrame = {
    val e = coOrderEdges(spark, dir)
    val verts = e.select(col("u").as("id"))
      .unionAll(e.select(col("v").as("id"))).distinct()
    Graphs.harmonicFromLandmarks(e,
      verts.orderBy(col("id")).limit(HarmonicSources), HarmonicHops)
  }

  /** C20 driver query: radius-bounded ECCENTRICITY per landmark over
    * the co-order graph — max BFS depth from each of the same 4
    * deterministic landmarks graph_harmonic uses (one multi-source
    * loop for all K), whose maximum is the standard DIAMETER LOWER
    * BOUND (exact diameter needs all-pairs BFS; landmark eccentricity
    * is the scalable estimator, same contract as C15/C16). */
  def graphEccentricity(spark: SparkSession, dir: String): DataFrame = {
    val e = coOrderEdges(spark, dir)
    val verts = e.select(col("u").as("id"))
      .unionAll(e.select(col("v").as("id"))).distinct()
    Graphs.multiSourceBfs(e,
        verts.orderBy(col("id")).limit(HarmonicSources), HarmonicHops)
      .groupBy("src")
      .agg(max(col("depth")).as("ecc"),
        count(when(col("depth") > 0, 1)).as("n_reached"))
  }

  /** Weighted-PageRank demo iteration count (the PPR reasoning: the
    * co-order graph is small-diameter, 5 rounds is the sweet spot). */
  val PrwIterations = 5

  /** C3w driver query: WEIGHTED PageRank over the co-order part graph
    * (w = 1/#co-orders, so strongly co-ordered parts pass more rank) —
    * strength-of-connection ranking where graph_pagerank ranks edge
    * counts. Both directions of each undirected edge carry the weight. */
  def graphPagerankWeighted(spark: SparkSession, dir: String): DataFrame = {
    val w0 = coOrderWeighted(spark, dir)
    val und = w0.unionAll(w0.select(col("v").as("u"), col("u").as("v"), col("w")))
    Graphs.pageRankWeighted(und, PrwIterations, PrDamping)
      .select(col("id"), round(col("rank"), 6).as("rank"))
  }

  /** C14 driver query: degree assortativity of the co-order part graph. */
  def graphAssortativity(spark: SparkSession, dir: String): DataFrame =
    Graphs.assortativity(coOrderEdges(spark, dir))

  /** C16 driver query: approximate betweenness over the co-order part
    * graph from the same 4 deterministic landmarks graph_harmonic uses
    * (sampled, radius-bounded Brandes — one multi-source BFS + one σ
    * pass + one δ pass for all of them). */
  def graphBetweenness(spark: SparkSession, dir: String): DataFrame = {
    val e = coOrderEdges(spark, dir)
    val verts = e.select(col("u").as("id"))
      .unionAll(e.select(col("v").as("id"))).distinct()
    Graphs.betweennessFromLandmarks(e,
      verts.orderBy(col("id")).limit(HarmonicSources), HarmonicHops)
  }

  val JaccardMinSim = 0.25

  /** C11 driver query: neighborhood-Jaccard link prediction over the
    * co-order part graph (already quantity-thresholded sparse). */
  def graphJaccard(spark: SparkSession, dir: String): DataFrame =
    Graphs.neighborJaccard(coOrderEdges(spark, dir), JaccardMinSim)

  val AaMinCommon = 2L

  /** C24 driver query: Adamic-Adar link prediction over the co-order
    * part graph — candidate (non-adjacent) pairs with ≥ 2 common
    * neighbors, scored by Σ 1/ln(deg of shared neighbor). */
  def graphAdamicAdar(spark: SparkSession, dir: String): DataFrame =
    Graphs.adamicAdar(coOrderEdges(spark, dir), AaMinCommon)

  val NbRounds = 3

  /** C25 driver query: neighborhood function over the geo subgraph —
    * HyperBall's N(r) with the exact pair closure as the verification
    * face and the per-vertex HLL-union loop as the scale face, the
    * est_ok flag pinning the sketch within 500 bps of exact. The geo
    * graph's small diameter makes 3 rounds reach near-saturation (the
    * N(r) curve flattening IS the effective-diameter signal).
    *
    * Bench-cost note (r11, re-measured): the exact face is now a
    * dense-bitmap BFS (see Graphs.neighborhoodFunction) — both faces
    * move V fixed-width pages per round, so the query no longer pays
    * the Σ|B(r)|·deg pair-expansion that made the first spelling
    * 16.6 s at sf0.1. The exact face still exists only to oracle the
    * sketch IN-PLAN, per the sim_ann_recall convention. */
  /** The persisted NF curve (4 rows) — two consumers now recompute it
    * (graph_neighborhood reports it, graph_eff_diameter derives from
    * it), so the HyperBall rounds run once per (session, dir) and the
    * build lands in bench build_sec (the store discipline). */
  private def storedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    import graft.store.GraftStore
    spark.table(GraftStore.ensureBucketed(
      spark, s"graft_nf_${GraftStore.dirKey(dir)}", 1, Seq("radius")) {
      // xxhash64 the ~25-byte composite ids once at the edge: the
      // vertex-rank dictionary sorts and joins 8-byte longs instead of
      // strings, and the HLL face sketches the hashes with identical
      // register mechanics. Counts are collision-exact at any plausible
      // vertex count (the storedUndHashed argument: P ≈ V²/2⁶⁴).
      val h = storedGeoUnd(spark, dir)
        .select(xxhash64(col("u")).as("u"), xxhash64(col("v")).as("v"))
      // lgK=10 (1 KB/vertex): the sketch face shuffles V sketches per
      // round, so register width is the direct cost knob; rsd(2^10) ≈
      // 3.2% stays inside the 500 bps est_ok tolerance with margin
      // (errors over the Σ_v sum partially cancel besides)
      Graphs.neighborhoodFunction(
        h.unionAll(h.select(col("v").as("u"), col("u").as("v"))), NbRounds,
        lgK = 10)
    })
  }

  def graphNeighborhood(spark: SparkSession, dir: String): DataFrame =
    storedNeighborhood(spark, dir).orderBy("radius")

  /** C41: effective diameter at q=0.9 from the NF curve (the HyperBall
    * deliverable HyperANF was built for): the smallest radius whose
    * reachable-pair count covers ≥ 90% of the largest observed count —
    * integer cross-multiplication, no division. Reported next to the
    * curve endpoints so the oracle value-checks the derivation, not
    * just the pick. Reads the persisted 4-row curve: metadata-scale. */
  def graphEffDiameter(spark: SparkSession, dir: String): DataFrame = {
    val nf = storedNeighborhood(spark, dir).select("radius", "n_pairs")
    val mx = nf.agg(max(col("n_pairs")).as("n_max"))
    nf.crossJoin(mx)
      .filter(col("n_pairs") * 10L >= col("n_max") * 9L)
      .agg(min(col("radius")).as("eff_diameter_90"))
      .crossJoin(mx)
  }

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
    "graph_hierarchy" -> (graphHierarchy _),
    "graph_triangles" -> (graphTriangles _),
    "graph_clustering" -> (graphClustering _),
    "graph_kcore"     -> (graphKcore _),
    "graph_onion"     -> (graphOnion _),
    "graph_ktruss"    -> (graphKtruss _),
    "graph_walks"     -> (graphWalks _),
    "graph_node2vec"  -> (graphNode2vec _),
    "graph_sssp"      -> (graphSssp _),
    "graph_cc"        -> (graphCc _),
    "graph_cc_sizes"  -> (graphCcSizes _),
    "graph_rich_club" -> (graphRichClub _),
    "graph_transitivity" -> (graphTransitivity _),
    "graph_degree_gini" -> (graphDegreeGini _),
    "graph_msf"       -> (graphMsf _),
    "graph_pagerank"  -> (graphPagerank _),
    "graph_pagerank_w" -> (graphPagerankWeighted _),
    "graph_katz"      -> (graphKatz _),
    "graph_ppr"       -> (graphPpr _),
    "graph_ppr_batch" -> (graphPprBatch _),
    "graph_lpa"       -> (graphLpa _),
    "graph_lpa_w"     -> (graphLpaWeighted _),
    "graph_louvain"   -> (graphLouvain _),
    "graph_louvain2"  -> (graphLouvain2 _),
    "graph_louvain_gain" -> (graphLouvainGain _),
    "graph_louvain_multi" -> (graphLouvainMulti _),
    "graph_layers"    -> (graphLayers _),
    "graph_scc"       -> (graphScc _),
    "graph_modularity" -> (graphModularity _),
    "graph_modularity_null" -> (graphModularityNull _),
    "graph_hits"      -> (graphHits _),
    "graph_jaccard"   -> (graphJaccard _),
    "graph_adamic_adar" -> (graphAdamicAdar _),
    "graph_neighborhood" -> (graphNeighborhood _),
    "graph_assortativity" -> (graphAssortativity _),
    "graph_harmonic"  -> (graphHarmonic _),
    "graph_eccentricity" -> (graphEccentricity _),
    "graph_betweenness" -> (graphBetweenness _),
    "graph_mis"       -> (graphMis _),
    "graph_matching"  -> (graphMatching _),
    "graph_coloring"  -> (graphColoring _),
    "graph_eff_diameter" -> (graphEffDiameter _),
  )

  val MisRounds = 4

  /** C28 driver query: Luby MIS over the geo graph with salted-hash
    * priorities (48-bit md5 prefix — identical bigints in both
    * engines; strict `<` needs no tie-break, see Graphs.lubyMis).
    * Emits decided vertices only, so the output is exact for the
    * fixed round budget; maximality at this graph's scale is asserted
    * in GraphSpec, the per-round semantics here by the generated
    * fixed-round oracle. */
  def graphMis(spark: SparkSession, dir: String): DataFrame = {
    val und = storedGeoUnd(spark, dir)
    val verts = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id"))).distinct()
      .select(col("id"),
        conv(substring(md5(concat(lit("mis|"), col("id"))), 1, 12), 16, 10)
          .cast("long").as("p"))
      .localCheckpoint(eager = true)
    Graphs.lubyMis(und, verts, MisRounds)
  }

  val ColorRounds = 6

  /** C40 driver query: Jones-Plassmann coloring over the geo graph
    * with salted-hash priorities (the MIS convention — 48-bit md5
    * prefix, strict `<` needs no tie-break). Emits decided vertices
    * with their color and round; the generated fixed-round oracle
    * restates priority-minima selection and the {0}∪{c+1}−S mex
    * verbatim, and GraphSpec pins properness (no decided edge is
    * monochrome) plus mex minimality on a hand fixture. */
  def graphColoring(spark: SparkSession, dir: String): DataFrame = {
    val und = storedGeoUnd(spark, dir)
    val verts = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id"))).distinct()
      .select(col("id"),
        conv(substring(md5(concat(lit("color|"), col("id"))), 1, 12), 16, 10)
          .cast("long").as("p"))
      .localCheckpoint(eager = true)
    Graphs.jpColoring(und, verts, ColorRounds)
  }

  val MatchRounds = 6

  /** C29 driver query: Luby maximal matching over the geo graph. The
    * unique priority key is hash-prefix ++ canonical pair, so the
    * local-minimum rule has no tie cases (see Graphs.maximalMatching);
    * the oracle restates the rounds verbatim. */
  def graphMatching(spark: SparkSession, dir: String): DataFrame = {
    val und = storedGeoUnd(spark, dir)
    val pkey = concat(
      substring(md5(concat(lit("match|"), col("u"), lit("|"), col("v"))), 1, 12),
      lit("|"), col("u"), lit("|"), col("v"))
    Graphs.maximalMatching(und.select(col("u"), col("v"), pkey.as("pkey")),
      MatchRounds)
  }

  // --- oracles ------------------------------------------------------

  /** The exact NF curve — shared by graph_neighborhood and the C41
    * effective-diameter derivation. */
  private lazy val oracleSqlNeighborhood: String = {
    val bCtes = (1 to NbRounds).map { r =>
      s"""b$r AS MATERIALIZED (
         |  SELECT DISTINCT src, reached FROM (
         |    SELECT src, reached FROM b${r - 1}
         |    UNION ALL
         |    SELECT p.src, und.v FROM b${r - 1} p JOIN und ON und.u = p.reached
         |  ) x
         |)""".stripMargin
    }.mkString(",\n")
    val counts = (0 to NbRounds).map(r =>
      s"SELECT $r AS radius, count(*)::bigint AS n_pairs, 1 AS est_ok FROM b$r")
      .mkString("\nUNION ALL\n")
    s"""$edgesCte,
       |$geoUndCtes,
       |b0 AS MATERIALIZED (SELECT DISTINCT u AS src, u AS reached FROM und),
       |$bCtes
       |$counts""".stripMargin
  }

  private val edgesCte =
    s"WITH t AS (${KgQueries.triplesSql}),\ne AS (\n${KgQueries.edgesSelectSql}\n)"

  /** Geo subgraph as a canonical undirected edge list — the input CTEs
    * shared by the lpa / cc / pagerank oracles (mirrors
    * Graphs.undirectedIds over geoEdges). */
  private val geoUndCtes =
    """g AS (SELECT * FROM e WHERE rel IN ('LOCATED_IN', 'PART_OF')),
      |und0 AS MATERIALIZED (
      |  SELECT DISTINCT
      |    least(src_label || '|' || src, dst_label || '|' || dst) AS u,
      |    greatest(src_label || '|' || src, dst_label || '|' || dst) AS v
      |  FROM g WHERE src_label || '|' || src <> dst_label || '|' || dst
      |),
      |und AS MATERIALIZED (SELECT u, v FROM und0 UNION ALL SELECT v, u FROM und0)""".stripMargin

  /** Fixed-iteration LPA label chain (lbl0 → lblN), shared by the
    * graph_lpa and graph_modularity oracles. */
  private def lpaLabelCtes: String = {
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
    s"""lbl0 AS (SELECT DISTINCT u AS id, u AS lbl FROM und),
       |$iterCtes""".stripMargin
  }

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

    // same recursion the Spark SQL front door runs (UNION ALL is
    // exact on the containment TREE), over DuckDB's own edge CTEs
    "graph_hierarchy" -> {
      val body = edgesCte.replaceFirst("WITH ", "WITH RECURSIVE ")
      s"""$body,
         |cp AS (
         |  SELECT DISTINCT src_label || '|' || src AS child,
         |    dst_label || '|' || dst AS parent
         |  FROM e WHERE rel IN ('LOCATED_IN', 'PART_OF')
         |),
         |h(id, depth, path) AS (
         |  SELECT DISTINCT parent, 0, parent FROM cp WHERE parent LIKE 'Region|%'
         |  UNION ALL
         |  SELECT cp.child, h.depth + 1, h.path || '/' || cp.child
         |  FROM h JOIN cp ON cp.parent = h.id
         |)
         |SELECT id, depth, path FROM h""".stripMargin
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

    "graph_lpa" ->
      s"""$edgesCte,
         |$geoUndCtes,
         |$lpaLabelCtes
         |SELECT id, lbl FROM lbl$LpaIterations""".stripMargin,

    // mirrors Graphs.labelPropagationWeighted over the co-order graph:
    // the lpa iteration chain with sum(cnt) votes instead of count(*)
    // — exact bigint sums, min-label ties, drift-proof
    "graph_lpa_w" -> {
      val iterCtes = (1 to LpaIterations).map { i =>
        s"""lbl$i AS (
           |  SELECT id, lbl FROM (
           |    SELECT und.u AS id, l.lbl, sum(und.cnt) AS n,
           |      row_number() OVER (PARTITION BY und.u
           |        ORDER BY sum(und.cnt) DESC, l.lbl) AS r
           |    FROM und JOIN lbl${i - 1} l ON und.v = l.id
           |    GROUP BY und.u, l.lbl
           |  ) WHERE r = 1
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH l AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
         |  WHERE l_quantity >= $TriangleMinQty
         |), e0 AS MATERIALIZED (
         |  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS cnt
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2
         |), und AS MATERIALIZED (
         |  SELECT u, v, cnt FROM e0 UNION ALL SELECT v, u, cnt FROM e0
         |),
         |lbl0 AS (SELECT DISTINCT u AS id, u AS lbl FROM und),
         |$iterCtes
         |SELECT id, lbl FROM lbl$LpaIterations""".stripMargin
    },

    // mirrors Graphs.dagLayers round for round: (max, +1) relaxation
    // over the distinct directed composite-id edge set
    "graph_layers" -> {
      val roundCtes = (1 to LayerRounds).map { i =>
        s"""l$i AS MATERIALIZED (
           |  SELECT id, max(level)::int AS level FROM (
           |    SELECT id, level FROM l${i - 1}
           |    UNION ALL
           |    SELECT d.v AS id, l.level + 1 AS level
           |    FROM d JOIN l${i - 1} l ON d.u = l.id
           |  ) GROUP BY 1
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (${KgQueries.triplesSql}),
         |e AS MATERIALIZED (
         |${KgQueries.edgesSelectSql}
         |),
         |d AS MATERIALIZED (
         |  SELECT DISTINCT src_label || '|' || src AS u,
         |    dst_label || '|' || dst AS v FROM e
         |),
         |verts AS (SELECT u AS id FROM d UNION SELECT v FROM d),
         |l0 AS MATERIALIZED (SELECT id, 0 AS level FROM verts),
         |$roundCtes
         |SELECT id, level FROM l$LayerRounds""".stripMargin
    },

    // mirrors Graphs.minLabelClosure round for round (the full
    // recurrence — the Spark side's delta frontier is value-identical
    // per round by the Bellman-Ford argument in its doc comment):
    // R-round forward and backward min-id closures, then the
    // fwd==bwd coloring join
    "graph_scc" -> {
      def chain(pfx: String, fromCol: String, toCol: String) =
        (1 to SccRounds).map { i =>
          s"""$pfx$i AS MATERIALIZED (
             |  SELECT id, min(m) AS m FROM (
             |    SELECT id, m FROM $pfx${i - 1}
             |    UNION ALL
             |    SELECT d.$fromCol AS id, f.m FROM d JOIN $pfx${i - 1} f ON d.$toCol = f.id
             |  ) GROUP BY 1
             |)""".stripMargin
        }.mkString(",\n")
      s"""WITH t AS (${KgQueries.triplesSql}),
         |e AS MATERIALIZED (
         |${KgQueries.edgesSelectSql}
         |),
         |d AS MATERIALIZED (
         |  SELECT DISTINCT src_label || '|' || src AS u,
         |    dst_label || '|' || dst AS v FROM e
         |),
         |verts AS (SELECT u AS id FROM d UNION SELECT v FROM d),
         |f0 AS MATERIALIZED (SELECT id, id AS m FROM verts),
         |${chain("f", "u", "v")},
         |b0 AS MATERIALIZED (SELECT id, id AS m FROM verts),
         |${chain("b", "v", "u")}
         |SELECT f.id, f.m AS fwd_min, b.m AS bwd_min,
         |  CASE WHEN f.m = b.m THEN f.m END AS scc_id
         |FROM f$SccRounds f JOIN b$SccRounds b ON f.id = b.id""".stripMargin
    },

    // mirrors Graphs.louvainMove round for round: integer score
    // 2m·k − d_u·D_c^{−u}, stay-candidate via the UNION ALL k=0 row,
    // min-community ties — every CTE materialized (the iteration-CTE
    // inlining lesson), no float anywhere
    "graph_louvain" -> {
      s"""WITH $louvainBaseCtes,
         |${louvainRoundCtesSql("", "und", "deg", "tm")}
         |SELECT id, c AS community FROM c$LouvainRounds""".stripMargin
    },

    // C21 level 2: condense the level-1 communities (exact integer
    // weight sums; self-loops carry intra weight and the UNION ALL
    // symmetrization doubles them, preserving 2m) and re-run the same
    // generated round CTEs with an "s" prefix over the super-graph
    "graph_louvain2" -> {
      s"""WITH $louvainBaseCtes,
         |${louvainRoundCtesSql("", "und", "deg", "tm")},
         |s1 AS MATERIALIZED (SELECT id, c FROM c$LouvainRounds),
         |se AS MATERIALIZED (
         |  SELECT least(ca.c, cb.c) AS u, greatest(ca.c, cb.c) AS v,
         |    sum(e0.cnt)::bigint AS cnt
         |  FROM e0 JOIN s1 ca ON e0.u = ca.id JOIN s1 cb ON e0.v = cb.id
         |  GROUP BY 1, 2
         |), und2 AS MATERIALIZED (
         |  SELECT u, v, cnt FROM se UNION ALL SELECT v, u, cnt FROM se
         |), deg2 AS MATERIALIZED (
         |  SELECT u AS id, sum(cnt)::bigint AS deg FROM und2 GROUP BY 1
         |), tm2 AS (SELECT sum(deg)::bigint AS two_m FROM deg2),
         |sc0 AS MATERIALIZED (SELECT id, id AS c FROM deg2),
         |${louvainRoundCtesSql("s", "und2", "deg2", "tm2")}
         |SELECT s1.id, s1.c AS community_l1, f.c AS community
         |FROM s1 JOIN sc$LouvainRounds f ON s1.c = f.id""".stripMargin
    },

    // C21 multi-level: level-1 rounds, then per level l: condense the
    // previous level's edge list by its sweep, re-run the generated
    // round CTEs under an "l<n>" prefix, compose the global map —
    // long-format dendrogram out
    "graph_louvain_multi" -> {
      val sb = new StringBuilder
      sb ++= s"WITH $louvainBaseCtes,\n"
      sb ++= louvainRoundCtesSql("", "und", "deg", "tm") + ",\n"
      sb ++= s"mp1 AS MATERIALIZED (SELECT id, c FROM c$LouvainRounds)"
      var prevEdges = "e0"
      var prevSweep = "mp1"
      for (l <- 2 to LouvainLevels) {
        val p = s"l$l"
        sb ++= s""",
           |${p}se AS MATERIALIZED (
           |  SELECT least(ca.c, cb.c) AS u, greatest(ca.c, cb.c) AS v,
           |    sum(e.cnt)::bigint AS cnt
           |  FROM $prevEdges e JOIN $prevSweep ca ON e.u = ca.id
           |                    JOIN $prevSweep cb ON e.v = cb.id
           |  GROUP BY 1, 2
           |), ${p}und AS MATERIALIZED (
           |  SELECT u, v, cnt FROM ${p}se UNION ALL SELECT v, u, cnt FROM ${p}se
           |), ${p}deg AS MATERIALIZED (
           |  SELECT u AS id, sum(cnt)::bigint AS deg FROM ${p}und GROUP BY 1
           |), ${p}tm AS (SELECT sum(deg)::bigint AS two_m FROM ${p}deg),
           |${p}c0 AS MATERIALIZED (SELECT id, id AS c FROM ${p}deg),
           |${louvainRoundCtesSql(p, s"${p}und", s"${p}deg", s"${p}tm")},
           |${p}sw AS MATERIALIZED (SELECT id, c FROM ${p}c$LouvainRounds),
           |mp$l AS MATERIALIZED (
           |  SELECT m.id, s.c FROM mp${l - 1} m JOIN ${p}sw s ON m.c = s.id
           |)""".stripMargin
        prevEdges = s"${p}se"
        prevSweep = s"${p}sw"
      }
      sb ++= "\n" + (1 to LouvainLevels).map(l =>
        s"SELECT id, $l AS level, c AS community FROM mp$l")
        .mkString("\nUNION ALL ")
      sb.toString
    },

    // C21 quality dial: weighted modularity of both louvain levels in
    // the exact-integer spelling Q = (4m·E_in − Σd_c²)/4m² — integer
    // sums per level, one display division each
    "graph_louvain_gain" -> {
      def qLeg(lv: String, level: Int): String =
        s"""SELECT $level AS level,
           |  (SELECT count(DISTINCT c) FROM $lv) AS n_communities,
           |  (SELECT coalesce(sum(e.cnt), 0)::bigint FROM e0 e
           |     JOIN $lv a ON e.u = a.id JOIN $lv b ON e.v = b.id
           |     WHERE a.c = b.c) AS e_in_w,
           |  (SELECT sum(ds * ds)::bigint FROM (
           |     SELECT sum(degw.deg)::bigint AS ds FROM $lv
           |     JOIN degw ON $lv.id = degw.id GROUP BY $lv.c)) AS d2_sum,
           |  round((4 * (SELECT mw FROM mq) *
           |      (SELECT coalesce(sum(e.cnt), 0)::bigint FROM e0 e
           |         JOIN $lv a ON e.u = a.id JOIN $lv b ON e.v = b.id
           |         WHERE a.c = b.c)
           |    - (SELECT sum(ds * ds)::bigint FROM (
           |         SELECT sum(degw.deg)::bigint AS ds FROM $lv
           |         JOIN degw ON $lv.id = degw.id GROUP BY $lv.c)))::double
           |    / (4.0 * (SELECT mw FROM mq) * (SELECT mw FROM mq)), 6) AS q""".stripMargin
      s"""WITH $louvainBaseCtes,
         |${louvainRoundCtesSql("", "und", "deg", "tm")},
         |s1 AS MATERIALIZED (SELECT id, c FROM c$LouvainRounds),
         |se AS MATERIALIZED (
         |  SELECT least(ca.c, cb.c) AS u, greatest(ca.c, cb.c) AS v,
         |    sum(e0.cnt)::bigint AS cnt
         |  FROM e0 JOIN s1 ca ON e0.u = ca.id JOIN s1 cb ON e0.v = cb.id
         |  GROUP BY 1, 2
         |), und2 AS MATERIALIZED (
         |  SELECT u, v, cnt FROM se UNION ALL SELECT v, u, cnt FROM se
         |), deg2 AS MATERIALIZED (
         |  SELECT u AS id, sum(cnt)::bigint AS deg FROM und2 GROUP BY 1
         |), tm2 AS (SELECT sum(deg)::bigint AS two_m FROM deg2),
         |sc0 AS MATERIALIZED (SELECT id, id AS c FROM deg2),
         |${louvainRoundCtesSql("s", "und2", "deg2", "tm2")},
         |lv1 AS MATERIALIZED (SELECT id, c FROM s1),
         |lv2 AS MATERIALIZED (
         |  SELECT s1.id, f.c FROM s1 JOIN sc$LouvainRounds f ON s1.c = f.id
         |), mq AS (SELECT sum(cnt)::bigint AS mw FROM e0),
         |degw AS MATERIALIZED (
         |  SELECT u AS id, sum(cnt)::bigint AS deg FROM und GROUP BY 1
         |)
         |${qLeg("lv1", 1)}
         |UNION ALL
         |${qLeg("lv2", 2)}""".stripMargin
    },

    "graph_modularity" ->
      s"""$edgesCte,
         |$geoUndCtes,
         |$lpaLabelCtes,
         |m AS (SELECT count(*)::double AS m FROM und0),
         |deg AS (SELECT u AS id, count(*) AS deg FROM und GROUP BY 1),
         |e_in AS (
         |  SELECT a.lbl AS community, count(*) AS e_in
         |  FROM und0 e JOIN lbl$LpaIterations a ON e.u = a.id
         |              JOIN lbl$LpaIterations b ON e.v = b.id
         |  WHERE a.lbl = b.lbl GROUP BY 1
         |),
         |d AS (
         |  SELECT l.lbl AS community, count(*) AS n_nodes,
         |    sum(deg)::bigint AS deg_sum
         |  FROM lbl$LpaIterations l JOIN deg ON l.id = deg.id GROUP BY 1
         |)
         |SELECT d.community, d.n_nodes, coalesce(e_in.e_in, 0) AS e_in, d.deg_sum,
         |  round(coalesce(e_in.e_in, 0)::double / (SELECT m FROM m)
         |    - (deg_sum::double / (2 * (SELECT m FROM m)))
         |      * (deg_sum::double / (2 * (SELECT m FROM m))), 6) AS q_contrib
         |FROM d LEFT JOIN e_in ON d.community = e_in.community""".stripMargin,

    // mirrors graphModularityNull: the stub ranking is a plain
    // row_number over the SAME "<md5>|<vid>" strings rankedAsc orders
    // (byte-lexicographic in both engines); both Qs one exact-integer
    // division — no float sum anywhere
    "graph_modularity_null" -> {
      def piecesSql(edges: String, p: String): String =
        s"""${p}deg AS (
           |  SELECT id, count(*) AS deg FROM (
           |    SELECT u AS id FROM $edges UNION ALL SELECT v FROM $edges
           |  ) GROUP BY 1
           |),
           |${p}ein AS (
           |  SELECT count(*)::bigint AS e_in
           |  FROM $edges e JOIN lbl$LpaIterations a ON e.u = a.id
           |                JOIN lbl$LpaIterations b ON e.v = b.id
           |  WHERE a.lbl = b.lbl
           |),
           |${p}dsq AS (
           |  SELECT sum(d * d)::bigint AS dsq FROM (
           |    SELECT sum(deg)::bigint AS d
           |    FROM lbl$LpaIterations l JOIN ${p}deg g ON l.id = g.id
           |    GROUP BY l.lbl
           |  )
           |)""".stripMargin
      s"""$edgesCte,
         |$geoUndCtes,
         |$lpaLabelCtes,
         |m AS (SELECT count(*)::bigint AS m FROM und0),
         |stubs AS (
         |  SELECT md5('cfg|' || u || '|' || v || '|0') || '|' || u AS k FROM und0
         |  UNION ALL
         |  SELECT md5('cfg|' || u || '|' || v || '|1') || '|' || v AS k FROM und0
         |),
         |rk AS (SELECT k, row_number() OVER (ORDER BY k) AS rn FROM stubs),
         |ne AS (
         |  SELECT min_by(substr(k, 34), rn) AS u,
         |         max_by(substr(k, 34), rn) AS v
         |  FROM rk GROUP BY (rn - 1) // 2
         |),
         |${piecesSql("und0", "r")},
         |${piecesSql("ne", "n")}
         |SELECT (SELECT m FROM m) AS m,
         |  (SELECT e_in FROM rein) AS e_in_real,
         |  (SELECT e_in FROM nein) AS e_in_null,
         |  (SELECT dsq FROM rdsq) AS dsq_real,
         |  (SELECT dsq FROM ndsq) AS dsq_null,
         |  round((4 * m * (SELECT e_in FROM rein) - (SELECT dsq FROM rdsq))::double
         |    / (4 * m * m), 6) AS q_real,
         |  round((4 * m * (SELECT e_in FROM nein) - (SELECT dsq FROM ndsq))::double
         |    / (4 * m * m), 6) AS q_null,
         |  round((4 * m * (SELECT e_in FROM rein) - (SELECT dsq FROM rdsq))::double
         |      / (4 * m * m)
         |    - (4 * m * (SELECT e_in FROM nein) - (SELECT dsq FROM ndsq))::double
         |      / (4 * m * m), 6) AS q_excess
         |FROM m""".stripMargin
    },

    "graph_cc" -> {
      // Min-label closure as a recursive CTE (the dedup_survivors
      // technique applied to the geo edge list): the component min
      // label m propagates to every member because m < every other id.
      val body = edgesCte.replaceFirst("WITH ", "WITH RECURSIVE ")
      s"""$body,
         |$geoUndCtes,
         |closure(id, lbl) AS (
         |  SELECT u, u FROM und
         |  UNION
         |  SELECT und.v, c.lbl FROM closure c JOIN und ON und.u = c.id
         |  WHERE c.lbl < und.v
         |)
         |SELECT id, min(lbl) AS component FROM closure GROUP BY id""".stripMargin
    },

    // C34: same co-order edge CTE as graph_walks; per-k restriction
    // + the 2E/(N(N−1)) formula
    "graph_rich_club" -> {
      val legs = RichClubKs.map { k =>
        s"""SELECT $k AS k,
           |  (SELECT count(*) FROM deg WHERE deg > $k) AS n_nodes,
           |  (SELECT count(*) FROM e0
           |   WHERE u IN (SELECT x FROM deg WHERE deg > $k)
           |     AND v IN (SELECT x FROM deg WHERE deg > $k)) AS n_edges""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |), deg AS MATERIALIZED (
         |  SELECT x, count(*) AS deg FROM (
         |    SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1
         |), legs AS (
         |$legs
         |)
         |SELECT k, n_nodes, n_edges,
         |  CASE WHEN n_nodes >= 2 THEN
         |    round(2.0 * n_edges / (n_nodes * (n_nodes - 1)), 6) END AS phi
         |FROM legs""".stripMargin
    },

    // C33: the same min-label closure rolled to a size histogram
    "graph_cc_sizes" -> {
      val body = edgesCte.replaceFirst("WITH ", "WITH RECURSIVE ")
      s"""$body,
         |$geoUndCtes,
         |closure(id, lbl) AS (
         |  SELECT u, u FROM und
         |  UNION
         |  SELECT und.v, c.lbl FROM closure c JOIN und ON und.u = c.id
         |  WHERE c.lbl < und.v
         |),
         |comp AS (SELECT id, min(lbl) AS component FROM closure GROUP BY id),
         |sz AS (SELECT component, count(*) AS size FROM comp GROUP BY 1)
         |SELECT size, count(*) AS n_components FROM sz GROUP BY 1""".stripMargin
    },

    // mirrors Graphs.katz over both orientations: x0 = 1, x_{t+1} =
    // 1 + α Σ_in x_t; MATERIALIZED per level (the pagerank lesson),
    // round(6) absorbs sum-order ulp
    // C29: fixed-round Luby matching restated round for round — same
    // unique string priority keys (hash prefix ++ canonical pair), so
    // the strict local-minimum rule has no tie cases in either engine
    "graph_matching" -> {
      val rounds = (1 to MatchRounds).map { i =>
        s"""vm$i AS MATERIALIZED (
           |  SELECT x, min(pkey) AS mk FROM (
           |    SELECT u AS x, pkey FROM a${i - 1}
           |    UNION ALL SELECT v, pkey FROM a${i - 1}) GROUP BY x
           |),
           |m$i AS MATERIALIZED (
           |  SELECT a.u, a.v FROM a${i - 1} a
           |  JOIN vm$i mu ON a.u = mu.x
           |  JOIN vm$i mv ON a.v = mv.x
           |  WHERE a.pkey = mu.mk AND a.pkey = mv.mk
           |),
           |t$i AS MATERIALIZED (
           |  SELECT u AS x FROM m$i UNION ALL SELECT v FROM m$i
           |),
           |a$i AS MATERIALIZED (
           |  SELECT u, v, pkey FROM a${i - 1}
           |  WHERE u NOT IN (SELECT x FROM t$i)
           |    AND v NOT IN (SELECT x FROM t$i)
           |)""".stripMargin
      }.mkString(",\n")
      val out = (1 to MatchRounds).map { i =>
        s"SELECT u, v, $i::int AS matched_round FROM m$i"
      }.mkString("\nUNION ALL ")
      s"""$edgesCte,
         |$geoUndCtes,
         |a0 AS MATERIALIZED (
         |  SELECT u, v,
         |    substr(md5('match|' || u || '|' || v), 1, 12)
         |      || '|' || u || '|' || v AS pkey
         |  FROM und0
         |),
         |$rounds
         |$out""".stripMargin
    },

    // C28: fixed-round Luby MIS restated round for round — identical
    // salted 48-bit priorities, strict < against the neighbor min with
    // the same Long.MaxValue sentinel, dominated = active neighbors of
    // the round's MIS, retirement by anti-join
    "graph_mis" -> {
      val rounds = (1 to MisRounds).map { i =>
        s"""n$i AS MATERIALIZED (
           |  SELECT und.u AS id, min(a.p) AS mp
           |  FROM und JOIN a${i - 1} a ON und.v = a.id GROUP BY und.u
           |),
           |m$i AS MATERIALIZED (
           |  SELECT a.id FROM a${i - 1} a LEFT JOIN n$i n ON a.id = n.id
           |  WHERE a.p < coalesce(n.mp, 9223372036854775807)
           |),
           |d$i AS MATERIALIZED (
           |  SELECT DISTINCT und.u AS id FROM und JOIN m$i m ON und.v = m.id
           |  WHERE und.u IN (SELECT id FROM a${i - 1})
           |),
           |a$i AS MATERIALIZED (
           |  SELECT id, p FROM a${i - 1}
           |  WHERE id NOT IN (SELECT id FROM m$i UNION ALL SELECT id FROM d$i)
           |)""".stripMargin
      }.mkString(",\n")
      val out = (1 to MisRounds).map { i =>
        s"""SELECT id, 1::int AS in_mis, $i::int AS decided_round FROM m$i
           |UNION ALL SELECT id, 0::int, $i::int FROM d$i""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""$edgesCte,
         |$geoUndCtes,
         |v AS MATERIALIZED (SELECT DISTINCT u AS id FROM und),
         |a0 AS MATERIALIZED (
         |  SELECT id, ('0x' || substr(md5('mis|' || id), 1, 12))::bigint AS p
         |  FROM v
         |),
         |$rounds
         |$out""".stripMargin
    },

    "graph_coloring" -> {
      // fixed-round Jones-Plassmann mirror: the MIS local-minimum CTE
      // pair plus the mex as {0} ∪ {color+1} − neighborColors (one
      // union + one anti-join — no per-vertex ranges to generate)
      val rounds = (1 to ColorRounds).map { i =>
        s"""n$i AS MATERIALIZED (
           |  SELECT und.u AS id, min(a.p) AS mp
           |  FROM und JOIN a${i - 1} a ON und.v = a.id GROUP BY und.u
           |),
           |m$i AS MATERIALIZED (
           |  SELECT a.id FROM a${i - 1} a LEFT JOIN n$i n ON a.id = n.id
           |  WHERE a.p < coalesce(n.mp, 9223372036854775807)
           |),
           |nc$i AS MATERIALIZED (
           |  SELECT DISTINCT m.id, c.color
           |  FROM m$i m JOIN und ON und.u = m.id
           |  JOIN col${i - 1} c ON und.v = c.id
           |),
           |cand$i AS (
           |  SELECT id, 0::bigint AS c FROM m$i
           |  UNION ALL SELECT id, color + 1 FROM nc$i
           |),
           |mex$i AS MATERIALIZED (
           |  SELECT c.id, min(c.c) AS color
           |  FROM cand$i c LEFT JOIN nc$i n ON c.id = n.id AND c.c = n.color
           |  WHERE n.id IS NULL GROUP BY c.id
           |),
           |col$i AS MATERIALIZED (
           |  SELECT id, color, r FROM col${i - 1}
           |  UNION ALL SELECT id, color, $i::int AS r FROM mex$i
           |),
           |a$i AS MATERIALIZED (
           |  SELECT id, p FROM a${i - 1} WHERE id NOT IN (SELECT id FROM m$i)
           |)""".stripMargin
      }.mkString(",\n")
      s"""$edgesCte,
         |$geoUndCtes,
         |v AS MATERIALIZED (SELECT DISTINCT u AS id FROM und),
         |a0 AS MATERIALIZED (
         |  SELECT id, ('0x' || substr(md5('color|' || id), 1, 12))::bigint AS p
         |  FROM v
         |),
         |col0 AS (SELECT CAST(NULL AS VARCHAR) AS id,
         |  CAST(NULL AS BIGINT) AS color, CAST(NULL AS INT) AS r
         |  WHERE false),
         |$rounds
         |SELECT id, color, r AS decided_round FROM col$ColorRounds""".stripMargin
    },

    "graph_katz" -> {
      val iters = (1 to KatzIterations).map { i =>
        s"""c$i AS MATERIALIZED (
           |  SELECT e.dst AS id, sum(x.x) AS c
           |  FROM e2 e JOIN x${i - 1} x ON e.src = x.id
           |  GROUP BY e.dst
           |),
           |x$i AS MATERIALIZED (
           |  SELECT v.id,
           |    1.0::double + ${KatzAlpha}::double * coalesce(c.c, 0.0::double) AS x
           |  FROM v LEFT JOIN c$i c ON v.id = c.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""$edgesCte,
         |$geoUndCtes,
         |e2 AS MATERIALIZED (SELECT u AS src, v AS dst FROM und0
         |  UNION ALL SELECT v AS src, u AS dst FROM und0),
         |v AS MATERIALIZED (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e2 UNION ALL SELECT dst FROM e2)),
         |x0 AS (SELECT id, 1.0::double AS x FROM v),
         |$iters
         |SELECT id, round(x, 6) AS katz FROM x$KatzIterations""".stripMargin
    },

    "graph_pagerank" -> {
      // Fixed-iteration generated SQL mirroring Graphs.pageRank exactly:
      // directed on the canonical (least → greatest) orientation,
      // per-round dangling-mass redistribution, identical IEEE double
      // constants ((1-d)/n etc. evaluate to the same doubles in both
      // engines); round(,6) absorbs aggregation-order ulp drift.
      // every iteration CTE is MATERIALIZED: c$i is referenced twice
      // (join + dangling-mass scalar subquery), so un-materialized
      // inlining would double the plan per level — 2^10 by r10
      val iters = (1 to PrIterations).map { i =>
        s"""c$i AS MATERIALIZED (
           |  SELECT e.dst AS id, sum(r.rank / o.deg) AS c
           |  FROM e2 e JOIN r${i - 1} r ON e.src = r.id JOIN od o ON e.src = o.src
           |  GROUP BY e.dst
           |),
           |r$i AS MATERIALIZED (
           |  SELECT v.id,
           |    (1 - $PrDamping) / (SELECT n FROM nn)
           |      + $PrDamping * (coalesce(c.c, 0)
           |        + (1 - (SELECT sum(c) FROM c$i)) / (SELECT n FROM nn)) AS rank
           |  FROM v LEFT JOIN c$i c ON v.id = c.id
           |)""".stripMargin
      }.mkString(",\n")
      // AS MATERIALIZED: without it DuckDB re-inlines the 7-way parquet
      // union into every one of the 10 iteration CTEs and exhausts the
      // process file-handle limit; materializing the base edge list
      // evaluates the scans exactly once.
      s"""$edgesCte,
         |$geoUndCtes,
         |e2 AS MATERIALIZED (SELECT u AS src, v AS dst FROM und0),
         |v AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e2 UNION ALL SELECT dst FROM e2)),
         |od AS MATERIALIZED (SELECT src, count(*) AS deg FROM e2 GROUP BY src),
         |nn AS MATERIALIZED (SELECT count(*)::double AS n FROM v),
         |r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM v),
         |$iters
         |SELECT id, round(rank, 6) AS rank FROM r$PrIterations""".stripMargin
    },

    // mirrors Graphs.pageRankWeighted over the co-order weighted graph:
    // identical shape to the graph_pagerank oracle with Σw replacing
    // out-degree and rank·w/sw contributions (same association order)
    "graph_pagerank_w" -> {
      val iters = (1 to PrwIterations).map { i =>
        s"""c$i AS MATERIALIZED (
           |  SELECT e.dst AS id, sum(r.rank * e.w / o.sw) AS c
           |  FROM e2 e JOIN r${i - 1} r ON e.src = r.id JOIN ow o ON e.src = o.src
           |  GROUP BY e.dst
           |),
           |r$i AS MATERIALIZED (
           |  SELECT v.id,
           |    (1 - $PrDamping) / (SELECT n FROM nn)
           |      + $PrDamping * (coalesce(c.c, 0)
           |        + (1 - (SELECT sum(c) FROM c$i)) / (SELECT n FROM nn)) AS rank
           |  FROM v LEFT JOIN c$i c ON v.id = c.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH l AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
         |  WHERE l_quantity >= $TriangleMinQty
         |), e0 AS MATERIALIZED (
         |  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS cnt
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2
         |), e2 AS MATERIALIZED (
         |  SELECT u AS src, v AS dst, 1.0::double / cnt AS w FROM e0
         |  UNION ALL
         |  SELECT v, u, 1.0::double / cnt FROM e0
         |),
         |v AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e2 UNION ALL SELECT dst FROM e2)),
         |ow AS MATERIALIZED (SELECT src, sum(w) AS sw FROM e2 GROUP BY src),
         |nn AS MATERIALIZED (SELECT count(*)::double AS n FROM v),
         |r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM v),
         |$iters
         |SELECT id, round(rank, 6) AS rank FROM r$PrwIterations""".stripMargin
    },

    "graph_ppr" -> {
      // Personalized variant: teleport vector p concentrated on the
      // region vertices; dangling mass returns to the sources (lost·p).
      // Damping arithmetic forced ::double on the SQL side so both
      // engines run the identical IEEE ops ((1 - 0.85) differs by an
      // ulp between decimal and double evaluation).
      val iters = (1 to PprIterations).map { i =>
        s"""c$i AS MATERIALIZED (
           |  SELECT e.dst AS id, sum(r.rank / o.deg) AS c
           |  FROM e2 e JOIN r${i - 1} r ON e.src = r.id JOIN od o ON e.src = o.src
           |  GROUP BY e.dst
           |),
           |r$i AS MATERIALIZED (
           |  SELECT p.id,
           |    (1 - $PrDamping::double) * p.p
           |      + $PrDamping::double * (coalesce(c.c, 0)
           |        + (1 - (SELECT sum(c) FROM c$i)) * p.p) AS rank
           |  FROM p LEFT JOIN c$i c ON p.id = c.id
           |)""".stripMargin
      }.mkString(",\n")
      s"""$edgesCte,
         |$geoUndCtes,
         |e2 AS MATERIALIZED (SELECT u AS src, v AS dst FROM und0),
         |v AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e2 UNION ALL SELECT dst FROM e2)),
         |od AS MATERIALIZED (SELECT src, count(*) AS deg FROM e2 GROUP BY src),
         |s AS MATERIALIZED (SELECT id FROM v WHERE id LIKE '$PprSourcePrefix%'),
         |ns AS (SELECT count(*)::double AS n FROM s),
         |p AS MATERIALIZED (
         |  SELECT v.id,
         |    CASE WHEN s.id IS NOT NULL THEN 1.0::double / (SELECT n FROM ns)
         |         ELSE 0.0::double END AS p
         |  FROM v LEFT JOIN s ON v.id = s.id
         |),
         |r0 AS (SELECT id, p AS rank FROM p),
         |$iters
         |SELECT id, round(rank, 6) AS rank FROM r$PprIterations""".stripMargin
    },

    "graph_ppr_batch" -> {
      // C31: the C12 iteration lifted by a seed dimension — per-seed
      // contributions, per-seed dangling loss returned to the seed,
      // sparse state (rows exist only where mass arrived). The two
      // rank terms per (seed, id) sum commutatively (IEEE a+b = b+a),
      // so the union-then-sum matches Spark's plan exactly.
      val d = PrDamping
      val iters = (1 to PprBatchIterations).map { i =>
        s"""c$i AS MATERIALIZED (
           |  SELECT r.seed, e.dst AS id, sum(r.rank / o.deg) AS c
           |  FROM e2 e JOIN r${i - 1} r ON e.src = r.id JOIN od o ON e.src = o.src
           |  GROUP BY 1, 2
           |),
           |l$i AS (
           |  SELECT s.seed, 1 - coalesce(cs.sc, 0) AS lost
           |  FROM s LEFT JOIN (SELECT seed, sum(c) AS sc FROM c$i GROUP BY 1) cs
           |    ON cs.seed = s.seed
           |),
           |r$i AS MATERIALIZED (
           |  SELECT seed, id, sum(rank) AS rank FROM (
           |    SELECT seed, id, $d::double * c AS rank FROM c$i
           |    UNION ALL
           |    SELECT seed, seed AS id,
           |      (1 - $d::double) + $d::double * lost AS rank FROM l$i
           |  ) GROUP BY 1, 2
           |)""".stripMargin
      }.mkString(",\n")
      s"""$edgesCte,
         |$geoUndCtes,
         |e2 AS MATERIALIZED (SELECT u AS src, v AS dst FROM und0),
         |v AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e2 UNION ALL SELECT dst FROM e2)),
         |od AS MATERIALIZED (SELECT src, count(*) AS deg FROM e2 GROUP BY src),
         |s AS MATERIALIZED (SELECT DISTINCT id AS seed FROM v WHERE id LIKE '$PprSourcePrefix%'),
         |r0 AS (SELECT seed, seed AS id, 1.0::double AS rank FROM s),
         |$iters
         |SELECT seed, id, round(rank, 6) AS rank FROM r$PprBatchIterations
         |WHERE round(rank, 6) >= 0.000001""".stripMargin
    },

    "graph_hits" -> {
      // fixed-iteration SQL mirroring Graphs.hits: same join supports,
      // same Σ-normalization expression per half-step; MATERIALIZED for
      // the same double-reference reason as the pagerank oracle
      val iters = (1 to HitsIterations).map { i =>
        s"""a$i AS MATERIALIZED (
           |  SELECT e.dst AS id, sum(h.h) AS a
           |  FROM e2 e JOIN h${i - 1} h ON e.src = h.id GROUP BY e.dst
           |),
           |an$i AS MATERIALIZED (
           |  SELECT id, a / (SELECT sum(a) FROM a$i) AS a FROM a$i
           |),
           |hh$i AS MATERIALIZED (
           |  SELECT e.src AS id, sum(a.a) AS h
           |  FROM e2 e JOIN an$i a ON e.dst = a.id GROUP BY e.src
           |),
           |h$i AS MATERIALIZED (
           |  SELECT id, h / (SELECT sum(h) FROM hh$i) AS h FROM hh$i
           |)""".stripMargin
      }.mkString(",\n")
      s"""$edgesCte,
         |$geoUndCtes,
         |e2 AS MATERIALIZED (SELECT u AS src, v AS dst FROM und0),
         |v AS MATERIALIZED (SELECT DISTINCT id FROM (SELECT src AS id FROM e2 UNION ALL SELECT dst FROM e2)),
         |h0 AS (SELECT id, 1.0::double AS h FROM v),
         |$iters
         |SELECT v.id, round(coalesce(h.h, 0), 6) AS hub,
         |  round(coalesce(a.a, 0), 6) AS auth
         |FROM v LEFT JOIN h$HitsIterations h ON v.id = h.id
         |LEFT JOIN an$HitsIterations a ON v.id = a.id""".stripMargin
    },

    "graph_jaccard" ->
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |),
         |und AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
         |deg AS MATERIALIZED (SELECT u AS id, count(*) AS deg FROM und GROUP BY 1),
         |c AS (
         |  SELECT a.u AS u, b.u AS v, count(*) AS common
         |  FROM und a JOIN und b ON a.v = b.v AND a.u < b.u
         |  GROUP BY 1, 2
         |)
         |SELECT c.u, c.v, common,
         |  round(common::DOUBLE / (du.deg + dv.deg - common), 4) AS jaccard
         |FROM c JOIN deg du ON c.u = du.id JOIN deg dv ON c.v = dv.id
         |WHERE common::DOUBLE / (du.deg + dv.deg - common) >= $JaccardMinSim""".stripMargin,

    "graph_triangles" ->
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |)
         |SELECT count(*) AS triangles
         |FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v""".stripMargin,

    // C37: the oracle states the intent with a global rank window;
    // the distributed composite-key rank must agree
    "graph_degree_gini" ->
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |), deg AS (
         |  SELECT x, count(*) AS deg FROM (
         |    SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY 1
         |), r AS (
         |  SELECT deg, row_number() OVER (ORDER BY deg, x) AS rnk FROM deg
         |)
         |SELECT count(*) AS n_vertices, sum(deg)::bigint AS sum_degree,
         |  round((2 * sum(rnk * deg) - (count(*) + 1) * sum(deg))::double
         |        / (count(*) * sum(deg)), 6) AS gini
         |FROM r""".stripMargin,

    // C36: wedges from the degree sum, triangles from the same
    // closure as graph_triangles, 3△/wedges
    "graph_transitivity" ->
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |), deg AS (
         |  SELECT x, count(*) AS deg FROM (
         |    SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY 1
         |), w AS (SELECT sum(deg * (deg - 1))::bigint // 2 AS n_wedges FROM deg),
         |t AS (
         |  SELECT count(*) AS n_triangles
         |  FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
         |), ne AS (SELECT count(*) AS n_edges FROM e)
         |SELECT ne.n_edges, w.n_wedges, t.n_triangles,
         |  CASE WHEN w.n_wedges > 0 THEN
         |    round(3.0 * t.n_triangles / w.n_wedges, 6) END AS transitivity
         |FROM ne, w, t""".stripMargin,

    // mirrors Graphs.adamicAdar: same wedge closure + 1/ln(deg)
    // weight; candidate row set pinned by the integer common-count
    // threshold and the NOT-adjacent anti-join, score round-4
    "graph_adamic_adar" ->
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |),
         |und AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
         |deg AS MATERIALIZED (SELECT u AS id, count(*) AS deg FROM und GROUP BY 1),
         |c AS (
         |  SELECT a.u AS u, b.u AS v, count(*) AS common,
         |    sum(1.0 / ln(d.deg)) AS aa
         |  FROM und a JOIN und b ON a.v = b.v AND a.u < b.u
         |  JOIN deg d ON d.id = a.v
         |  GROUP BY 1, 2
         |)
         |SELECT c.u, c.v, common, round(aa, 4) AS adamic_adar
         |FROM c
         |WHERE common >= $AaMinCommon
         |  AND NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.u AND e.v = c.v)""".stripMargin,

    // mirrors the EXACT face of the neighborhood function round for
    // round (per-round distinct pair closure over the doubled geo
    // edges); est_ok is the constant 1 the in-plan HLL flag must hit
    "graph_neighborhood" -> oracleSqlNeighborhood,

    // C41: nests the NF oracle (the F5 nested-oracle pattern) so the
    // derivation cannot drift from the curve it reads
    "graph_eff_diameter" ->
      s"""WITH nf AS (
         |  SELECT radius, n_pairs FROM ($oracleSqlNeighborhood)
         |), mx AS (SELECT max(n_pairs) AS n_max FROM nf)
         |SELECT min(radius) AS eff_diameter_90, (SELECT n_max FROM mx) AS n_max
         |FROM nf, mx WHERE n_pairs * 10 >= n_max * 9""".stripMargin,

    // mirrors graphClustering: same wedge closure per corner + degree
    // agg; lcc is ONE fixed double expression over exact counts
    "graph_clustering" ->
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |), tri AS (
         |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
         |  FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
         |), tc AS (
         |  SELECT id, count(*) AS n_tri FROM (
         |    SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
         |  ) GROUP BY 1
         |), deg AS (
         |  SELECT id, count(*) AS deg FROM (
         |    SELECT u AS id FROM e UNION ALL SELECT v FROM e
         |  ) GROUP BY 1
         |)
         |SELECT deg.id, deg.deg, coalesce(tc.n_tri, 0) AS n_tri,
         |  CASE WHEN deg.deg >= 2
         |    THEN round(2.0 * coalesce(tc.n_tri, 0) / (deg.deg * (deg.deg - 1)), 4)
         |    ELSE 0.0 END AS lcc
         |FROM deg LEFT JOIN tc ON deg.id = tc.id""".stripMargin,

    "graph_harmonic" ->
      s"""WITH RECURSIVE l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e0 AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |), und AS (
         |  SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
         |), seeds AS (
         |  SELECT id FROM (SELECT u AS id FROM e0 UNION SELECT v FROM e0)
         |  ORDER BY id LIMIT $HarmonicSources
         |), bfs(src, id, d) AS (
         |  SELECT id, id, 0 FROM seeds
         |  UNION
         |  SELECT bfs.src, und.v, bfs.d + 1 FROM bfs JOIN und ON und.u = bfs.id
         |  WHERE bfs.d < $HarmonicHops
         |), md AS (
         |  SELECT src, id, min(d) AS d FROM bfs GROUP BY 1, 2
         |)
         |SELECT id, count(*) AS n_reached,
         |  round(sum(1.0::double / d), 4) AS harmonic
         |FROM md WHERE d > 0 GROUP BY id""".stripMargin,

    // mirrors graphEccentricity over the same recursive-CTE min-depth
    // frame as graph_harmonic, grouped by landmark
    "graph_eccentricity" ->
      s"""WITH RECURSIVE l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e0 AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |), und AS (
         |  SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
         |), seeds AS (
         |  SELECT id FROM (SELECT u AS id FROM e0 UNION SELECT v FROM e0)
         |  ORDER BY id LIMIT $HarmonicSources
         |), bfs(src, id, d) AS (
         |  SELECT id, id, 0 FROM seeds
         |  UNION
         |  SELECT bfs.src, und.v, bfs.d + 1 FROM bfs JOIN und ON und.u = bfs.id
         |  WHERE bfs.d < $HarmonicHops
         |), md AS (
         |  SELECT src, id, min(d) AS d FROM bfs GROUP BY 1, 2
         |)
         |SELECT src, max(d) AS ecc,
         |  count(CASE WHEN d > 0 THEN 1 END) AS n_reached
         |FROM md GROUP BY src""".stripMargin,

    // mirrors Graphs.betweennessFromLandmarks level for level: the
    // recursive-CTE BFS min-depths (= the harmonic oracle), then one
    // MATERIALIZED CTE per σ level (exact BIGINT path counts) and one
    // per δ level (the same σv/σw·(1+δw) double expression; sums are
    // the one order-sensitive reduction, absorbed by the final round 4)
    "graph_betweenness" -> {
      val sg = (1 to HarmonicHops).map { d =>
        s"""sg$d AS MATERIALIZED (
           |  SELECT s.src, und.v AS id, sum(s.sigma)::bigint AS sigma
           |  FROM sg${d - 1} s
           |  JOIN und ON und.u = s.id
           |  JOIN md ON md.src = s.src AND md.id = und.v AND md.d = $d
           |  GROUP BY 1, 2
           |)""".stripMargin
      }.mkString(",\n")
      val dlBoundary =
        s"dl$HarmonicHops AS MATERIALIZED (SELECT src, id, 0.0::double AS delta FROM sg$HarmonicHops)"
      val dl = (HarmonicHops - 1 to 1 by -1).map { d =>
        s"""dl$d AS MATERIALIZED (
           |  SELECT cur.src, cur.id,
           |    sum((cur.sigma::double / w.sigma) * (1.0::double + coalesce(dw.delta, 0.0::double))) AS delta
           |  FROM sg$d cur
           |  JOIN und e ON e.u = cur.id
           |  JOIN sg${d + 1} w ON w.src = cur.src AND w.id = e.v
           |  LEFT JOIN dl${d + 1} dw ON dw.src = w.src AND dw.id = w.id
           |  GROUP BY 1, 2
           |)""".stripMargin
      }.mkString(",\n")
      val accUnion = (HarmonicHops to 1 by -1)
        .map(d => s"SELECT src, id, delta FROM dl$d").mkString("\nUNION ALL\n")
      s"""WITH RECURSIVE l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e0 AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |), und AS MATERIALIZED (
         |  SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
         |), seeds AS (
         |  SELECT id FROM (SELECT u AS id FROM e0 UNION SELECT v FROM e0)
         |  ORDER BY id LIMIT $HarmonicSources
         |), bfs(src, id, d) AS (
         |  SELECT id, id, 0 FROM seeds
         |  UNION
         |  SELECT bfs.src, und.v, bfs.d + 1 FROM bfs JOIN und ON und.u = bfs.id
         |  WHERE bfs.d < $HarmonicHops
         |), md AS MATERIALIZED (
         |  SELECT src, id, min(d) AS d FROM bfs GROUP BY 1, 2
         |), sg0 AS MATERIALIZED (
         |  SELECT id AS src, id, 1::bigint AS sigma FROM seeds
         |),
         |$sg,
         |$dlBoundary,
         |$dl
         |SELECT id, round(sum(delta), 4) AS betweenness
         |FROM ($accUnion) GROUP BY id""".stripMargin
    },

    "graph_assortativity" ->
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e0 AS (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |), bi AS (
         |  SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
         |), deg AS (
         |  SELECT u AS id, count(*) AS deg FROM bi GROUP BY 1
         |), s AS (
         |  SELECT count(*) AS m, sum(a.deg)::bigint AS sx,
         |    sum(a.deg * a.deg)::bigint AS sxx, sum(a.deg * b.deg)::bigint AS sxy
         |  FROM bi JOIN deg a ON bi.u = a.id JOIN deg b ON bi.v = b.id
         |)
         |SELECT m AS m_directed, sx, sxx, sxy,
         |  round(CASE WHEN sxx::double / m - (sx::double / m) * (sx::double / m) = 0
         |             THEN NULL
         |             ELSE (sxy::double / m - (sx::double / m) * (sx::double / m))
         |                  / (sxx::double / m - (sx::double / m) * (sx::double / m))
         |        END, 6) AS assortativity
         |FROM s""".stripMargin,

    "graph_sssp" -> {
      // fixed-round Bellman-Ford mirroring Graphs.sssp. Doubles agree
      // without rounding (identical association order per round; min is
      // order-independent); round(,6) kept as the output convention.
      // 1.0::double forced: a bare 1.0 is DECIMAL in DuckDB and
      // decimal/bigint division would diverge from Spark's double math.
      val rounds = (1 to SsspIterations).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT id, min(d) AS d FROM (
           |    SELECT id, d FROM d${i - 1}
           |    UNION ALL
           |    SELECT e.v AS id, p.d + e.w AS d
           |    FROM e2 e JOIN d${i - 1} p ON e.u = p.id
           |  ) GROUP BY id
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH l AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
         |  WHERE l_quantity >= $TriangleMinQty
         |), e0 AS MATERIALIZED (
         |  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS cnt
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2
         |), e2 AS MATERIALIZED (
         |  SELECT u, v, 1.0::double / cnt AS w FROM e0
         |  UNION ALL
         |  SELECT v, u, 1.0::double / cnt FROM e0
         |),
         |d0 AS MATERIALIZED (SELECT min(u) AS id, 0.0::double AS d FROM e0),
         |$rounds
         |SELECT id, round(d, 6) AS dist FROM d$SsspIterations""".stripMargin
    },

    // C27 Borůvka MSF (r15 verdict #6's "may follow the same route"):
    // generated per-round CTEs over the SAME co-order edge derivation
    // as graph_sssp's oracle. Per round: cross-component edges, each
    // component's min struct(w,u,v,cu,cv) pick (DuckDB struct min is
    // the same lexicographic field-order comparison as Spark's), then
    // the label merge as a RECURSIVE min-label reachability closure
    // over the picked component pairs — the SQL mirror of the guarded
    // driver union-find, whose min-label union makes every final root
    // the minimum of its connected component. Labels are id::varchar
    // (the Spark loop rides string labels from round 0), so the min is
    // LEXICOGRAPHIC in both engines. Converged rounds pick nothing on
    // both sides; the forest is the union of all rounds' picks.
    "graph_msf" -> {
      val rounds = (1 to MsfRounds).map { i =>
        s"""ce$i AS MATERIALIZED (
           |  SELECT e.u, e.v, e.w, x.c AS cu, y.c AS cv
           |  FROM ed e JOIN comp${i - 1} x ON e.u = x.id JOIN comp${i - 1} y ON e.v = y.id
           |  WHERE x.c <> y.c
           |),
           |ch$i AS MATERIALIZED (
           |  SELECT DISTINCT struct_extract(e, 'u') AS u, struct_extract(e, 'v') AS v,
           |    struct_extract(e, 'w') AS w,
           |    struct_extract(e, 'cu') AS cu, struct_extract(e, 'cv') AS cv
           |  FROM (
           |    SELECT c, min({'w': w, 'u': u, 'v': v, 'cu': cu, 'cv': cv}) AS e FROM (
           |      SELECT cu AS c, u, v, w, cu, cv FROM ce$i
           |      UNION ALL SELECT cv AS c, u, v, w, cu, cv FROM ce$i
           |    ) GROUP BY c
           |  )
           |),
           |pg$i AS (SELECT cu AS a, cv AS b FROM ch$i UNION SELECT cv, cu FROM ch$i),
           |lab$i AS (
           |  SELECT a AS c, a AS r FROM pg$i
           |  UNION
           |  SELECT p.a AS c, l.r FROM pg$i p JOIN lab$i l ON l.c = p.b
           |),
           |mg$i AS MATERIALIZED (SELECT c, min(r) AS nc FROM lab$i GROUP BY c),
           |comp$i AS MATERIALIZED (
           |  SELECT v.id, coalesce(m.nc, v.c) AS c
           |  FROM comp${i - 1} v LEFT JOIN mg$i m ON v.c = m.c
           |)""".stripMargin
      }.mkString(",\n")
      val forest = (1 to MsfRounds)
        .map(i => s"SELECT u, v, w FROM ch$i").mkString("\nUNION ALL ")
      s"""WITH RECURSIVE l AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
         |  WHERE l_quantity >= $TriangleMinQty
         |),
         |ed AS MATERIALIZED (
         |  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*)::bigint AS w
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2
         |),
         |comp0 AS MATERIALIZED (
         |  SELECT id, id::varchar AS c FROM (SELECT u AS id FROM ed UNION SELECT v FROM ed)
         |),
         |$rounds
         |$forest""".stripMargin
    },

    // mirrors Graphs.randomWalks step for step: the same neighbor-rank
    // table, the same md5-mod-degree choice, one MATERIALIZED CTE per
    // hop — the hash IS the randomness, so both engines walk the same
    // paths
    "graph_walks" -> {
      val hops = (1 to WalkSteps).map { i =>
        s"""w$i AS MATERIALIZED (
           |  SELECT p.walk_src, n.v AS cur
           |  FROM w${i - 1} p
           |  JOIN deg d ON p.cur = d.u
           |  JOIN nbrs n ON n.u = p.cur
           |   AND n.rn = ('0x' || substr(md5('walk|' || p.walk_src || '|' || $i), 1, 8))::bigint
           |               % d.deg + 1
           |)""".stripMargin
      }.mkString(",\n")
      val out = (0 to WalkSteps)
        .map(i => s"SELECT walk_src, $i AS step, cur AS vertex FROM w$i")
        .mkString("\nUNION ALL\n")
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |), und AS MATERIALIZED (
         |  SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
         |), nbrs AS MATERIALIZED (
         |  SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) AS rn FROM und
         |), deg AS MATERIALIZED (
         |  SELECT u, max(rn) AS deg FROM nbrs GROUP BY u
         |), w0 AS MATERIALIZED (
         |  SELECT DISTINCT u AS walk_src, u AS cur FROM und
         |),
         |$hops
         |$out""".stripMargin
    },

    // mirrors Graphs.node2vecWalks: identical co-order base CTEs as
    // graph_walks, first-order w1 (seed n2v), then per-hop candidate
    // scoring — u from the same md5 window, score = u⁴/u/u² by
    // prev-distance class (pure multiplication chains, no pow)
    "graph_node2vec" -> {
      val hops = (2 to WalkSteps).map { i =>
        s"""w$i AS MATERIALIZED (
           |  SELECT walk_src, cur0 AS prev, cand AS cur FROM (
           |    SELECT s.*, row_number() OVER (PARTITION BY s.walk_src
           |        ORDER BY CASE WHEN s.cand = s.prev0 THEN s.u*s.u*s.u*s.u
           |                      WHEN s.hit IS NOT NULL THEN s.u
           |                      ELSE s.u*s.u END DESC, s.cand) AS r
           |    FROM (
           |      SELECT p.walk_src, p.prev AS prev0, p.cur AS cur0, n.v AS cand,
           |        (('0x' || substr(md5('n2v|' || p.walk_src || '|' || $i || '|' || n.v), 1, 8))::bigint)::double
           |          / 4294967296.0 AS u,
           |        e.u AS hit
           |      FROM w${i - 1} p
           |      JOIN nbrs n ON n.u = p.cur
           |      LEFT JOIN und e ON e.u = p.prev AND e.v = n.v
           |    ) s
           |  ) WHERE r = 1
           |)""".stripMargin
      }.mkString(",\n")
      val out = (0 to WalkSteps)
        .map(i => s"SELECT walk_src, $i AS step, cur AS vertex FROM w$i")
        .mkString("\nUNION ALL\n")
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |), und AS MATERIALIZED (
         |  SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
         |), nbrs AS MATERIALIZED (
         |  SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) AS rn FROM und
         |), deg AS MATERIALIZED (
         |  SELECT u, max(rn) AS deg FROM nbrs GROUP BY u
         |), w0 AS MATERIALIZED (
         |  SELECT DISTINCT u AS walk_src, u AS cur FROM und
         |), w1 AS MATERIALIZED (
         |  SELECT p.walk_src, p.cur AS prev, n.v AS cur
         |  FROM w0 p
         |  JOIN deg d ON p.cur = d.u
         |  JOIN nbrs n ON n.u = p.cur
         |   AND n.rn = ('0x' || substr(md5('n2v|' || p.walk_src || '|1'), 1, 8))::bigint
         |               % d.deg + 1
         |),
         |$hops
         |$out""".stripMargin
    },

    // mirrors Graphs.kTruss round for round: triangle enumeration,
    // per-edge support, support-filtered keep (the kCore MATERIALIZED
    // discipline — t/s/k CTEs are each referenced twice per level)
    "graph_ktruss" -> {
      val rounds = (1 to KTrussIterations).map { i =>
        s"""t$i AS MATERIALIZED (
           |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
           |  FROM e${i - 1} e1
           |  JOIN e${i - 1} e2 ON e1.v = e2.u
           |  JOIN e${i - 1} e3 ON e3.u = e1.u AND e3.v = e2.v
           |),
           |s$i AS MATERIALIZED (
           |  SELECT u, v, count(*) AS support FROM (
           |    SELECT a AS u, b AS v FROM t$i
           |    UNION ALL SELECT b, c FROM t$i
           |    UNION ALL SELECT a, c FROM t$i
           |  ) GROUP BY 1, 2
           |),
           |k$i AS MATERIALIZED (
           |  SELECT e.u, e.v, coalesce(s.support, 0) AS support
           |  FROM e${i - 1} e LEFT JOIN s$i s ON e.u = s.u AND e.v = s.v
           |  WHERE coalesce(s.support, 0) >= ${KTrussK - 2}
           |),
           |e$i AS MATERIALIZED (SELECT u, v FROM k$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |),
         |$rounds
         |SELECT u, v, support::bigint AS support FROM k$KTrussIterations""".stripMargin
    },

    "graph_onion" -> {
      // fixed-(k, round) peel mirroring Graphs.onion; vertices tracked
      // explicitly (zero-filled left join) so an edge-orphaned vertex
      // still drops WITH its layer. Every CTE MATERIALIZED — the
      // graph_kcore re-inline trap
      // kMin = 2 like the Spark face: the k = 1 stage is a provable
      // no-op (every edge-derived vertex has deg ≥ 1)
      val stages = (for (k <- 2 to OnionKMax; r <- 1 to OnionRoundsPerK)
        yield {
          val i = (k - 2) * OnionRoundsPerK + r
          s"""d$i AS MATERIALIZED (
             |  SELECT w.id, coalesce(g.deg, 0) AS deg
             |  FROM v${i - 1} w LEFT JOIN (
             |    SELECT id, count(*) AS deg FROM (
             |      SELECT u AS id FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1}
             |    ) GROUP BY id
             |  ) g ON w.id = g.id
             |),
             |x$i AS MATERIALIZED (
             |  SELECT id, ${k - 1} AS coreness, $i AS layer FROM d$i WHERE deg < $k
             |),
             |v$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= $k),
             |e$i AS MATERIALIZED (
             |  SELECT u, v FROM e${i - 1}
             |  WHERE u IN (SELECT id FROM v$i) AND v IN (SELECT id FROM v$i)
             |)""".stripMargin
        }).mkString(",\n")
      val n = (OnionKMax - 1) * OnionRoundsPerK
      val drops = (1 to n).map(i =>
        s"SELECT id, coreness, layer FROM x$i").mkString("\nUNION ALL\n")
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |), v0 AS MATERIALIZED (
         |  SELECT DISTINCT id FROM (
         |    SELECT u AS id FROM e0 UNION ALL SELECT v FROM e0
         |  )
         |),
         |$stages
         |SELECT id, coreness::int AS coreness, layer::int AS layer FROM (
         |$drops
         |UNION ALL
         |SELECT id, $OnionKMax AS coreness, ${n + 1} AS layer FROM v$n
         |)""".stripMargin
    },

    "graph_kcore" -> {
      // fixed-round peel mirroring Graphs.kCore; every CTE MATERIALIZED
      // or DuckDB re-inlines e_{i-1} into d_i, k_i AND e_i and the plan
      // grows 3^rounds (the un-materialized probe ran away; see the
      // pagerank oracle for the same trap)
      val rounds = (1 to KCoreIterations).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT id, count(*) AS deg FROM (
           |    SELECT u AS id FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1}
           |  ) GROUP BY id
           |),
           |k$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= $KCoreK),
           |e$i AS MATERIALIZED (
           |  SELECT u, v FROM e${i - 1}
           |  WHERE u IN (SELECT id FROM k$i) AND v IN (SELECT id FROM k$i)
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH l AS (
         |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= $TriangleMinQty
         |), e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |),
         |$rounds
         |SELECT id, count(*) AS deg FROM (
         |  SELECT u AS id FROM e$KCoreIterations UNION ALL SELECT v FROM e$KCoreIterations
         |) GROUP BY id""".stripMargin
    },
  )
}
