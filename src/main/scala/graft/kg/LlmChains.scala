package graft.kg

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable LLM-chain surface + tolerant triplet recovery (SURVEY §2
  * B2/B9).
  *
  * The reference calls Groq via LangChain chains
  * (Art-Knowledge-Graph-Local/LLM/chains.py) and distributes the calls
  * with `df.rdd.mapPartitions`
  * (Art-Knowledge-Graph-AWS/LLM/main-llm-triplets-extraction.py:16).
  * Inference is external to the engine, so here it is a trait invoked
  * partition-wise over a Dataset[String]; `StubChain` is the
  * deterministic stand-in used by tests (echoes input fields as triplet
  * JSON with trailing prose noise, like a chatty model).
  */
object LlmChains {

  /** One prompt→completion chain, applied to a partition's prompts.
    * Implementations must be serializable (executed on executors). */
  trait Chain extends Serializable {
    def invoke(prompts: Iterator[String]): Iterator[String]
  }

  /** Deterministic fake "LLM": wraps each input line in a triplet JSON
    * array plus trailing chatter (exercises the tolerant parser). */
  object StubChain extends Chain {
    def invoke(prompts: Iterator[String]): Iterator[String] =
      prompts.map { p =>
        // strip quotes AND braces/brackets: echoed JSON structure inside
        // a string value would defeat any flat-object recovery regex
        // (the reference's \{.*?\} has the same blind spot)
        val clean = p.replaceAll("[\"{}\\[\\]]", "").take(40)
        s"""Here are the triplets:[{"subject":"$clean","subject_type":"text","relation":"mentions","object":"stub","object_type":"entity"}] hope this helps!"""
      }
  }

  /** Retry/backoff decorator for flaky chains (rate limits, transient
    * API errors) — the reference's call_with_retry
    * (Art-Knowledge-Graph-Local/LLM/pipeline.py:36-68): exponential
    * backoff, maxAttempts, then rethrow. Wraps any Chain; prompts are
    * retried one-at-a-time so one poisoned prompt doesn't re-bill the
    * whole partition. */
  final case class RetryingChain(inner: Chain, maxAttempts: Int = 3,
      baseDelayMs: Long = 100) extends Chain {
    def invoke(prompts: Iterator[String]): Iterator[String] =
      prompts.map { p =>
        var attempt = 0
        var out: Option[String] = None
        var last: Throwable = null
        while (out.isEmpty && attempt < maxAttempts) {
          try out = Some(inner.invoke(Iterator(p)).next())
          catch {
            case e: Throwable =>
              last = e
              attempt += 1
              if (attempt < maxAttempts)
                Thread.sleep(baseDelayMs * (1L << (attempt - 1)))
          }
        }
        out.getOrElse(throw last)
      }
  }

  /** Distribute a chain over a Dataset of prompts — the Spark-native
    * equivalent of the reference's rdd.mapPartitions(process_partition).
    */
  def invokePartitionwise(prompts: Dataset[String], chain: Chain): Dataset[String] = {
    import prompts.sparkSession.implicits._
    prompts.mapPartitions(chain.invoke)
  }

  /** Schema of one recovered triplet. */
  val tripletSchema = "subject string, subject_type string, relation string, object string, object_type string"

  /** Tolerant triplet recovery from raw LLM text (LLM/pipeline.py:13
    * extract_json): find every flat `{...}` object and parse it; prose,
    * markdown fences, trailing notes are ignored. For flat (non-nested)
    * objects this equals the reference's whole-parse-then-regex strategy
    * on both valid arrays and noisy output.
    *
    * r11 spelling: explode each regex fragment to its own row and run
    * from_json + the one-sided-triple filter per ROW — every step is
    * codegen'd. The previous `transform`+`filter` array-lambda form
    * computed the same rows but evaluated the lambdas interpreted
    * (Catalyst HOFs have no doGenCode), the one §3-rule violation left
    * on a query path. Row order and multiplicity are unchanged:
    * explode-then-filter keeps exactly the fragments the
    * filter-then-explode form kept. */
  def extractTripletRows(raw: DataFrame, text: Column): DataFrame =
    raw.select(explode(
        regexp_extract_all(text, lit("\\{[^{}]*\\}"), lit(0))).as("_frag"))
      .select(from_json(col("_frag"),
        org.apache.spark.sql.types.StructType.fromDDL(tripletSchema)).as("t"))
      // keep one-sided triples: the reference's insert_triplets still
      // creates the single named node (graph_builder.py:64-77)
      .filter(col("t").isNotNull &&
        (col("t.subject").isNotNull || col("t.object").isNotNull))
      .select(col("t.subject"), col("t.subject_type"), col("t.relation"),
        col("t.object"), col("t.object_type"))

  /** End-to-end stub extraction pipeline: records (as JSON strings) →
    * stub chain → recovered triplet rows. */
  def extractFromRecords(records: Dataset[String]): DataFrame =
    extractTripletRows(invokePartitionwise(records, StubChain).toDF(), col("value"))
}
