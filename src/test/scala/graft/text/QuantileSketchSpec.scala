package graft.text

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** K5 mergeable quantile sketch (QuantileHistAgg / graft_qhist):
  * partitioning-invariance (the merge path), accuracy vs exact
  * quantiles (error ≤ one bin width), and the driver query's estimate
  * semantics.
  */
class QuantileSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("qhist is invariant to partitioning (merge = vector add)") {
    val d = Tables.documents(spark, dir)
    def hist(parts: Int): Seq[Seq[Long]] =
      d.repartition(parts)
        .groupBy("lang")
        .agg(VectorFunctions.qhist(spark, length(col("text")), 0.0, 1024.0, 64).as("h"))
        .orderBy("lang")
        .collect().toIndexedSeq.map(_.getSeq[Long](1))
    assert(hist(1) == hist(13),
      "histogram sketch must not depend on partitioning / merge order")
  }

  test("qhist counts match a SQL conditional-sum formulation") {
    val d = Tables.documents(spark, dir)
    val viaAgg = d.agg(VectorFunctions
        .qhist(spark, length(col("text")), 0.0, 1024.0, 64).as("h"))
      .select(posexplode(col("h")).as(Seq("bin", "cnt")))
      .filter(col("cnt") > 0)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val viaSql = d.select(least(lit(63), greatest(lit(0),
        floor((length(col("text")) - lit(0.0)) / lit(16.0)))).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaSql)
  }

  test("sketch quantile estimates are within one bin width of exact") {
    val est = TextQueries.textQuantileSketch(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val d = Tables.documents(spark, dir)
    val w = (TextQueries.QHi - TextQueries.QLo) / TextQueries.QBins
    for (lang <- Seq("en", "fr", "de", "es", "zh"); q <- TextQueries.Qs) {
      val exact = d.filter(col("lang") === lang)
        .select(expr(s"percentile(length(text), $q)")).first().getDouble(0)
      val e = est((lang, q))
      assert(math.abs(e - exact) <= w,
        s"$lang q=$q: sketch $e vs exact $exact exceeds bin width $w")
    }
  }
}
