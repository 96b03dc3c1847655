package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

class VectorExpressionsSpec extends SparkSpec {

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v) /
      (sqrt(aggregate(transform(ad, x => x * x), lit(0.0), (acc, v) => acc + v)) *
        sqrt(aggregate(transform(bd, x => x * x), lit(0.0), (acc, v) => acc + v)))
  }

  test("codegen cosine is bit-identical to the HOF formulation on real data") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va")).limit(40)
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb")).limit(40)
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib"))
    val diff = pairs.select(
      (VectorFunctions.cosineSim(spark, col("va"), col("vb")) -
        hofCosine(col("va"), col("vb"))).as("d"))
      .agg(max(abs(col("d")))).first().getDouble(0)
    assert(diff == 0.0, s"codegen and HOF cosine diverge by $diff")
  }

  test("interpreted eval path matches codegen path") {
    val x = Literal.create(Seq(1.0f, 2.0f, 3.0f), ArrayType(FloatType))
    val y = Literal.create(Seq(-1.0f, 0.5f, 2.0f), ArrayType(FloatType))
    val got = CosineSimilarity(x, y).eval(null).asInstanceOf[Double]
    val expected = {
      val dot = -1.0 + 1.0 + 6.0
      dot / (math.sqrt(1 + 4 + 9) * math.sqrt(1 + 0.25 + 4))
    }
    assert(math.abs(got - expected) < 1e-15)
    val d = DotProduct(
      Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)),
      Literal.create(Seq(3.0, 4.0), ArrayType(DoubleType))).eval(null)
    assert(d == 11.0)
  }

  test("simhash aggregate matches the 32-sum formulation") {
    import spark.implicits._
    // direct vote arithmetic on known hashes: h=1 (bit0), h=3 (bits0,1)
    val df = Seq((1L, 1L), (1L, 3L), (1L, 3L)).toDF("id", "h")
    val got = df.groupBy("id")
      .agg(VectorFunctions.simhashAgg(spark, col("h")).as("s"))
      .first().getLong(1)
    // bit0: votes +3 → set; bit1: +1 → set; bits 2..31: -3 → clear
    assert(got == 3L)
  }

  test("GraftExtensions injects all registered functions") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("null arrays propagate null; registration is idempotent") {
    import spark.implicits._
    VectorFunctions.ensureRegistered(spark)
    VectorFunctions.ensureRegistered(spark)
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    val r = df.select(VectorFunctions.cosineSim(spark, col("a"), col("b"))).first()
    assert(r.isNullAt(0))
  }
}
