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

  test("jaro-winkler matches the published values and the DuckDB parameterization") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String) = JaroWinklerImpl.jaroWinkler(u(a), u(b))
    // classic textbook pairs (values probed against DuckDB's
    // jaro_winkler_similarity — exact doubles, no tolerance)
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    // boost threshold: jaro 0.6 <= 0.7 gets NO prefix bonus
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    // prefix bonus capped at 4 chars
    assert(jw("abcdefg", "abcdxyz") == 0.8285714285714286)
    // empties are 0, not 1 (the DuckDB convention)
    assert(jw("", "") == 0.0 && jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    // codegen path agrees with the static impl
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("Pablo Picasso", "P. Picasso"))
      .toDF("a", "b")
      .select(VectorFunctions.jaroWinkler(spark, col("a"), col("b")).as("jw"))
    assert(df.collect().map(_.getDouble(0)).toSeq ==
      Seq(0.9611111111111111, 0.7776923076923077))
  }

  test("cdc boundary kernel matches the per-position md5 re-derivation") {
    import org.apache.spark.unsafe.types.UTF8String
    val gram = 8
    val mod = 64
    // independent re-derivation of the oracle expression: i=1 plus
    // every i ≤ len-gram+1 whose gram's md5 u16 prefix ≡ 0 (mod 64)
    def expected(s: String): Seq[Int] = {
      val digest = java.security.MessageDigest.getInstance("MD5")
      1 +: (2 to math.max(s.length - gram + 1, 1)).filter { i =>
        val h = digest.digest(
          s.substring(i - 1, i - 1 + gram)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % mod == 0
      }
    }
    def actual(s: String): Seq[Int] =
      CdcBoundariesImpl.boundaries(UTF8String.fromString(s), gram, mod)
        .toIntArray().toSeq
    // real corpus text: every doc at the smallest SF, plus edge shapes
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").collect().map(_.getString(0)).filter(_.nonEmpty)
    assert(docs.nonEmpty)
    (docs.toSeq :+ "x" :+ "exactly8" :+ "ninechars" :+ "ü8ü8ü8ü8ü8")
      .foreach { s =>
        assert(actual(s) == expected(s), s"boundaries diverge on '${s.take(40)}'")
      }
    // at least one real doc must have an interior boundary, or the
    // fixture proves nothing about the hash path
    assert(docs.exists(s => actual(s).length > 1), "no interior boundaries")
  }

  test("cdc boundary kernel property: random strings incl. multi-byte and edge lengths") {
    import org.apache.spark.unsafe.types.UTF8String
    val gram = 8
    val mod = 16 // coarser mod → denser boundaries → more hash-path coverage
    def expected(s: String): Seq[Int] = {
      val digest = java.security.MessageDigest.getInstance("MD5")
      val cps = s.codePoints().toArray
      1 +: (2 to math.max(cps.length - gram + 1, 1)).filter { i =>
        val g = new String(cps, i - 1, gram)
        val h = digest.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % mod == 0
      }
    }
    val rnd = new scala.util.Random(7)
    val alphabets = Seq("ab", "abcdefgh 0123", "äöü€aβ", "aé中")
    for (trial <- 1 to 40) {
      val alpha = alphabets(trial % alphabets.length)
      val len = trial % 12 match {
        case 0 => 0
        case 1 => gram - 1
        case 2 => gram
        case _ => 1 + rnd.nextInt(200)
      }
      val s = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      if (s.nonEmpty) {
        val got = CdcBoundariesImpl.boundaries(UTF8String.fromString(s), gram, mod)
          .toIntArray().toSeq
        assert(got == expected(s), s"trial $trial diverged on '${s.take(40)}'")
      }
    }
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
