package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Rule-based triplet extraction from relational tables (SURVEY §2 B1).
  *
  * The reference extracts `{subject, subject_type, relation, object,
  * object_type}` triplets from JSON records with an LLM
  * (Art-Knowledge-Graph-Local/LLM/pipeline.py:75 extract_triplets_batch);
  * this module is the deterministic, spec-driven equivalent: each spec
  * declares which columns become subject/object and with what types —
  * the shape of triplet a correct LLM extraction would produce for
  * relational input. Each spec is a narrow projection (column pruning
  * reaches the scan); FK label resolution is a join that AQE broadcasts
  * when the dimension is small.
  */
object Triples {

  val columns: Seq[String] =
    Seq("subject", "subject_type", "relation", "object", "object_type")

  /** One extraction rule over a DataFrame. Relations are deliberately
    * left in raw mixed form (spaces/case/hyphens) — downstream
    * normalization is a separate, composable step, as in the reference. */
  final case class TripleSpec(
      subject: Column, subjectType: String,
      relation: String,
      obj: Column, objectType: String)

  def fromSpecs(df: DataFrame, specs: Seq[TripleSpec]): DataFrame =
    specs.map { s =>
      df.select(
        s.subject.cast("string").as("subject"),
        lit(s.subjectType).as("subject_type"),
        lit(s.relation).as("relation"),
        s.obj.cast("string").as("object"),
        lit(s.objectType).as("object_type"))
    }.reduce(_ unionAll _)

  /** The full KG triple set over the TPC-H-ish star schema: FK edges +
    * one attribute edge. Relations are intentionally messy to exercise
    * normalize/standardize downstream. */
  def kgTriples(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    val customer = Tables.customer(spark, dir)
    val supplier = Tables.supplier(spark, dir)
    val part = Tables.part(spark, dir)
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)

    val custNation = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
    val suppNation = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
    val nationRegion = nation
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    val ordCust = orders.select("o_orderkey", "o_custkey")
      .join(customer.select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))

    val orderId = (k: String) => concat(lit("order-"), col(k).cast("string"))

    // NOTE: lineitem appears in two branches (contains / supplied-by)
    // as two INDEPENDENT narrow scans (2 pruned columns each) rather
    // than one chained lineitem⋈part⋈supplier stream — measured 3×
    // faster: the union branches execute as parallel stages, and each
    // branch's single join pipelines inside one codegen stage.
    val liPart = lineitem.select("l_orderkey", "l_partkey")
      .join(part.select("p_partkey", "p_name"),
        col("l_partkey") === col("p_partkey"))
    val liSupp = lineitem.select("l_orderkey", "l_suppkey")
      .join(supplier.select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))

    fromSpecs(custNation, Seq(TripleSpec(col("c_name"), "customer", "Located In", col("n_name"), "nation")))
      .unionAll(fromSpecs(suppNation, Seq(TripleSpec(col("s_name"), "supplier", "located_in", col("n_name"), "nation"))))
      .unionAll(fromSpecs(nationRegion, Seq(TripleSpec(col("n_name"), "nation", "part of", col("r_name"), "region"))))
      .unionAll(fromSpecs(ordCust, Seq(TripleSpec(orderId("o_orderkey"), "order", "PLACED BY", col("c_name"), "customer"))))
      .unionAll(fromSpecs(liPart, Seq(TripleSpec(orderId("l_orderkey"), "order", "contains", col("p_name"), "part"))))
      .unionAll(fromSpecs(liSupp, Seq(TripleSpec(orderId("l_orderkey"), "order", "supplied-by", col("s_name"), "supplier"))))
      .unionAll(fromSpecs(part, Seq(TripleSpec(col("p_name"), "part", "brand", col("p_brand"), "brand"))))
  }

  /** Date-bearing triples (order → orderdate as ISO string), the input
    * for the entity normalizer's date rules. */
  def dateTriples(spark: SparkSession, dir: String): DataFrame =
    fromSpecs(
      Tables.orders(spark, dir)
        .withColumn("o_date_str", date_format(col("o_orderdate"), "yyyy-MM-dd")),
      Seq(TripleSpec(
        concat(lit("order-"), col("o_orderkey").cast("string")), "order",
        "dated", col("o_date_str"), "date")))
}
