package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity / relation / label normalization (SURVEY §2 B3-B6).
  *
  * Re-expresses the reference's normalization semantics as pure Catalyst
  * column expressions — no UDFs, so everything stays inside whole-stage
  * codegen and is portable to any ANSI engine (the DuckDB oracles mirror
  * these formulas exactly):
  *  - normalize_label / normalize_relation:
  *    reference Art-Knowledge-Graph-Local/Graph/graph_builder.py:29-37
  *  - entity date rules: the normalize prompt in
  *    Art-Knowledge-Graph-Local/LLM/chains.py:36-51
  *  - CANONICAL_RELATIONS synonym dictionary:
  *    Art-Knowledge-Graph-AWS/LLM/chains.py:37-141
  */
object Normalize {

  /** Node label → CamelCase ("oil_painting" → "OilPainting"); empty/null
    * → "Entity". graph_builder.py:30 `normalize_label`. */
  def normalizeLabel(c: Column): Column = {
    val words = split(regexp_replace(trim(coalesce(c, lit(""))), "_", " "), " +")
    val camel = array_join(
      transform(words, w => concat(upper(substring(w, 1, 1)), lower(substring(w, 2, 1 << 24)))),
      "")
    when(camel === "", lit("Entity")).otherwise(camel)
  }

  /** Relation → UPPER_SNAKE ("placed by" → "PLACED_BY"); empty/null →
    * "RELATED_TO". graph_builder.py:35 `normalize_relation`. */
  def normalizeRelation(c: Column): Column = {
    val cleaned = upper(regexp_replace(regexp_replace(trim(coalesce(c, lit(""))), "-", "_"), " ", "_"))
    when(cleaned === "", lit("RELATED_TO")).otherwise(cleaned)
  }

  /** Entity value date rules (LLM normalize prompt, rule 3,
    * Art-Knowledge-Graph-AWS/LLM/chains.py:135). Pinned semantics
    * (mirrored exactly by the kg_normalize_entities oracle):
    *  1. contains-a-year wins — the reference's worked example maps
    *     "1975-01-01" → "1975" with type Year. The year match is
    *     word-bounded and range-bounded (1000-2099) so "12345" is NOT
    *     a year (r1 verdict bug).
    *  2. otherwise ISO dates → dd/mm/yyyy (only reachable for years
    *     outside 1000-2099, by construction).
    *  3. otherwise: trimmed, whitespace-collapsed passthrough.
    * Returns (value, type) expressions. \b works in both Java regex
    * (Spark) and RE2 (DuckDB), unlike lookbehind. */
  def normalizeEntity(value: Column, vtype: Column): (Column, Column) = {
    val v = regexp_replace(trim(coalesce(value, lit(""))), " +", " ")
    val isIsoDate = v.rlike("^\\d{4}-\\d{2}-\\d{2}$")
    val yearIn = regexp_extract(v, "\\b(1[0-9]{3}|20[0-9]{2})\\b", 1)
    val outVal =
      when(yearIn =!= "", yearIn)
        .when(isIsoDate, concat(substring(v, 9, 2), lit("/"), substring(v, 6, 2), lit("/"), substring(v, 1, 4)))
        .otherwise(v)
    val outType = when(yearIn =!= "", lit("Year")).otherwise(vtype)
    (outVal, outType)
  }

  /** The reference's canonical-relation synonym dictionary
    * (Art-Knowledge-Graph-AWS/LLM/chains.py:37-141), kept verbatim as
    * data: canonical key → accepted variants. */
  val canonicalRelations: Seq[(String, Seq[String])] = Seq(
    "painted" -> Seq("painted by", "created by", "made by", "realized by", "painted_by", "created_by", "made_by", "realized_by"),
    "sculpted" -> Seq("sculpted by", "carved by", "modeled by", "fashioned by"),
    "drawn" -> Seq("drawn by", "sketched by", "illustrated by", "drafted by"),
    "engraved" -> Seq("engraved by", "etched by", "incised by"),
    "photographed" -> Seq("photographed by", "captured by", "shot by"),
    "composed_music" -> Seq("composed by", "music by", "score by", "written music by"),
    "written_text" -> Seq("written by", "authored by", "penned by", "scripted by"),
    "crafted" -> Seq("crafted by", "handmade by", "fashioned by"),
    "published" -> Seq("published by", "issued by", "released by"),
    "exhibited_at" -> Seq("exhibited at", "displayed at", "shown at", "presented at"),
    "cataloged_by" -> Seq("cataloged by", "listed by", "documented by"),
    "curated_by" -> Seq("curated by", "organized by", "managed by"),
    "owned_by" -> Seq("owned by", "property of", "collection of"),
    "in_collection_of" -> Seq("in collection of", "part of collection", "held by"),
    "donated_by" -> Seq("donated by", "gift of", "bequeathed by"),
    "acquired_by" -> Seq("acquired by", "purchased by", "obtained by"),
    "loaned_by" -> Seq("loaned by", "on loan from"),
    "restored_by" -> Seq("restored by", "conserved by", "repaired by"),
    "conserved_by" -> Seq("conserved by", "maintained by"),
    "commissioned_by" -> Seq("commissioned by", "ordered by", "requested by"),
    "patron_of" -> Seq("patron of", "sponsor of", "benefactor of"),
    "collaborated_with" -> Seq("collaborated with", "worked with", "in partnership with"),
    "student_of" -> Seq("student of", "pupil of", "disciple of"),
    "teacher_of" -> Seq("teacher of", "mentor of", "master of"),
    "influenced_by" -> Seq("influenced by", "inspired by", "affected by"),
    "influenced" -> Seq("influenced", "shaped", "affected"),
    "depicts" -> Seq("depicts", "represents", "portrays", "illustrates"),
    "illustrates" -> Seq("illustrates", "visualizes", "depicts concept"),
    "dedicated_to" -> Seq("dedicated to", "in honor of", "commemorating"),
    "replica_of" -> Seq("replica of", "copy of", "reproduction of"),
    "inspired" -> Seq("inspired", "motivated", "sparked by"),
    "style" -> Seq("in style of", "artistic style", "movement"),
    "medium" -> Seq("medium", "material", "technique"),
    "dimensions" -> Seq("dimensions", "size", "measurements"),
    "signed_by" -> Seq("signed by", "autographed by"),
    "dated" -> Seq("dated", "inscribed with date", "year of creation"),
    "awarded" -> Seq("awarded", "prize received", "honored with"),
    "located_in" -> Seq("located in", "housed in", "kept at", "stored in"),
    "displayed_in_room" -> Seq("displayed in room", "exhibited in gallery", "shown in hall"),
    "part_of_exhibition" -> Seq("part of exhibition", "included in show"),
    "belongs_to_period" -> Seq("belongs to period", "from era", "dating to", "associated with period"),
    "belongs_to_movement" -> Seq("belongs to movement", "art movement", "associated with style"),
    "restored_in_year" -> Seq("restored in year", "conserved in year"),
    "donated_in_year" -> Seq("donated in year", "gifted in year"),
    "acquired_in_year" -> Seq("acquired in year", "purchased in year"),
  )

  /** variant (lower, space-form) → canonical (lower, space-form).
    * Canonical keys map to themselves; first-wins on variant collisions
    * (e.g. "fashioned by" appears under both sculpted and crafted —
    * dict order wins, matching a dict lookup in insertion order). */
  val variantToCanonical: Map[String, String] = {
    val b = scala.collection.mutable.LinkedHashMap.empty[String, String]
    canonicalRelations.foreach { case (canon, variants) =>
      val spaced = canon.replace("_", " ")
      if (!b.contains(spaced)) b(spaced) = spaced
      variants.foreach { v =>
        val key = v.toLowerCase.replace("_", " ")
        if (!b.contains(key)) b(key) = spaced
      }
    }
    b.toMap
  }

  /** Standardize a relation column: lowercase, underscores → spaces, then
    * map synonyms to the canonical relation (space form); unknown
    * relations stay lower-cased (standardize_rel prompt, rules 1-3).
    * Implemented as a broadcast map join — the dictionary is tiny and
    * the fact side never shuffles. */
  def standardizeRelations(df: DataFrame, relCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dict = variantToCanonical.toSeq.toDF("variant", "canonical")
    val cleaned = lower(regexp_replace(trim(coalesce(col(relCol), lit(""))), "_", " "))
    df.withColumn("__cleaned", cleaned)
      .join(broadcast(dict), col("__cleaned") === col("variant"), "left")
      .withColumn(outCol, coalesce(col("canonical"), col("__cleaned")))
      .drop("__cleaned", "variant", "canonical")
  }
}
