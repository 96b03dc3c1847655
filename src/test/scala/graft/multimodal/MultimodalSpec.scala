package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("H1 assets carry binary payload + typed metadata struct") {
    val a = Multimodal.assets(spark, sfDir)
    val schema = a.schema
    assert(schema("payload").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("mime", "lang", "source", "n_chars"))
    assert(a.count() > 0)
  }

  test("H2 stub decode yields fixed-dim deterministic features per asset") {
    val a = Multimodal.assets(spark, sfDir).limit(20).cache()
    val f1 = Multimodal.stubDecodeFeatures(a).collect().sortBy(_.doc_id)
    val f2 = Multimodal.stubDecodeFeatures(a).collect().sortBy(_.doc_id)
    assert(f1.length == 20)
    assert(f1.forall(r => r.dim == 8 && r.features.length == 8))
    assert(f1.forall(r => r.features.forall(v => v >= 0f && v < 1f)))
    // deterministic across runs
    assert(f1.zip(f2).forall { case (x, y) => x.features.sameElements(y.features) })
    a.unpersist()
  }

  test("H3 frame sampling chunks payload into fixed windows that reassemble") {
    val a = Multimodal.assets(spark, sfDir).limit(5).cache()
    val frames = Multimodal.frameSample(a, frameBytes = 16)
    val re = frames.orderBy("doc_id", "frame_idx")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(length(col("frame"))).as("total_bytes"))
    val orig = a.select(col("doc_id"), length(col("payload")).as("len"))
    val joined = re.join(orig, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (n, total, len) = (r.getAs[Long]("n"), r.getAs[Long]("total_bytes"), r.getAs[Int]("len"))
      assert(total == len, s"frames must cover payload exactly for doc ${r.get(0)}")
      assert(n == math.ceil(len / 16.0).toLong)
    }
    a.unpersist()
  }
}
