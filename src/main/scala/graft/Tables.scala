package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table access over a scale-factor directory of parquet files.
  *
  * Mirrors the reference's ingestion root (a directory of heterogeneous
  * files — /root/reference/Art-Knowledge-Graph-Local/ingestion/
  * data_ingestion_batch.py:118 `load_all`), but parquet-first: at 100 TB
  * the lake is columnar, and Spark's parquet source gives predicate
  * pushdown + column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")

  /** The events table's `ts` has shipped in two physical forms:
    * parquet TIMESTAMP(NANOS) (pandas ns — Spark's vectorized reader
    * rejects it; read nanos as long, integer-DIV to micros, exactly
    * DuckDB's ns→µs read) and native TIMESTAMP(MICROS) (reads as
    * TIMESTAMP_NTZ). Dispatch on the read schema and normalize both
    * to session-TZ TimestampType (session TZ is pinned UTC, so the
    * NTZ cast is instant-preserving) — downstream operators and
    * oracles see one contract regardless of generator vintage. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Name-dispatched loader that applies per-table quirks (events'
    * nanosecond-timestamp conversion) — what view registration and
    * generic tooling should use instead of raw apply. */
  def load(s: SparkSession, d: String, name: String): DataFrame =
    if (name == "events") events(s, d) else apply(s, d, name)
}
