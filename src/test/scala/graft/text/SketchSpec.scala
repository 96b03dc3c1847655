package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Mergeable-sketch surface for corpus statistics at 100 TB: Spark's
  * built-in Apache DataSketches HLL functions (the Spark-first answer —
  * no custom sketch code needed). Sketches serialize to binary, so
  * per-partition/per-day sketches can be stored and unioned later —
  * the pattern exact distinct counts cannot scale to.
  */
class SketchSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.01"

  test("HLL sketch estimates distinct tokens within error bound, and sketches merge") {
    val toks = Tables.documents(spark, docs)
      .select(col("source"), explode(split(trim(col("text")), " +")).as("t"))
      .cache()
    val exact = toks.select(countDistinct(col("t"))).first().getLong(0)
    // per-source sketches → union → estimate (the scale path)
    val perSource = toks.groupBy("source")
      .agg(hll_sketch_agg(col("t")).as("sk"))
    val merged = perSource.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .first().getLong(0)
    val relErr = math.abs(merged - exact).toDouble / exact
    assert(relErr < 0.05, s"HLL union estimate $merged vs exact $exact (err $relErr)")
    // single-pass estimate agrees with the merged-sketch estimate
    val direct = toks.select(hll_sketch_estimate(hll_sketch_agg(col("t"))))
      .first().getLong(0)
    assert(direct == merged, "sketch union must equal single-pass sketch")
    toks.unpersist()
  }
}
