package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {

  test("normalizeLabel camel-cases multi-word and underscored labels") {
    import spark.implicits._
    val df = Seq("oil_painting", "museum", "fine ART work", "", null.asInstanceOf[String])
      .toDF("l")
      .select(Normalize.normalizeLabel(col("l")).as("n"))
    assert(df.as[String].collect().toSeq ==
      Seq("OilPainting", "Museum", "FineArtWork", "Entity", "Entity"))
  }

  test("normalizeRelation upper-snakes and defaults") {
    import spark.implicits._
    val df = Seq("placed by", "supplied-by", "  ", null.asInstanceOf[String])
      .toDF("r")
      .select(Normalize.normalizeRelation(col("r")).as("n"))
    assert(df.as[String].collect().toSeq ==
      Seq("PLACED_BY", "SUPPLIED_BY", "RELATED_TO", "RELATED_TO"))
  }

  test("normalizeEntity: bounded year wins, ISO reformat only otherwise") {
    import spark.implicits._
    val in = Seq(
      ("1975-01-01", "date"),   // reference worked example → year
      ("circa 1999", "note"),   // contains-a-year
      ("12345", "code"),        // NOT a year (bounded match)
      ("2150-01-01", "date"),   // year outside range → dd/mm/yyyy
      ("plain  text", "note"),  // whitespace collapse
    ).toDF("v", "t")
    val (nv, nt) = Normalize.normalizeEntity(col("v"), col("t"))
    val out = in.select(nv.as("v"), nt.as("t")).as[(String, String)].collect().toSeq
    assert(out == Seq(
      ("1975", "Year"),
      ("1999", "Year"),
      ("12345", "code"),
      ("01/01/2150", "date"),
      ("plain text", "note")))
  }

  test("standardizeRelations maps synonyms, first-wins on collisions") {
    import spark.implicits._
    val df = Seq("Painted By", "gift of", "fashioned by", "HOUSED_IN", "novel thing")
      .toDF("rel")
    val out = Normalize.standardizeRelations(df, "rel", "std")
      .select("std").as[String].collect().toSeq
    assert(out == Seq("painted", "donated by", "sculpted", "located in", "novel thing"))
  }
}
