package graft

import graft.SparkSpec
import graft.kg.LlmChains
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("end-to-end pipeline builds a KG from the reference data directory") {
    val out = Pipeline.run(spark, "/root/reference/data")
    // tabular: artists.csv + artists2.csv load; the malformed JSON is skipped
    assert(out.records.count() > 0)
    val triples = out.triples.cache()
    assert(triples.count() > 100)
    // both sources contribute: stub-LLM triples + RDF triples
    val rels = triples.select("relation").distinct().collect().map(_.getString(0)).toSet
    assert(rels.contains("mentions"), "stub-LLM triples missing")
    assert(rels.exists(Set("same as", "note", "is related to")), s"RDF triples missing: $rels")
    // graph is MERGE-built and joinable
    assert(out.nodes.count() > 0 && out.edges.count() > 0)
    val joined = out.edges.join(out.nodes,
      col("src_label") === col("label") && col("src") === col("name"), "left_anti")
    assert(joined.count() == 0, "every edge source must exist as a node")
    triples.unpersist()
  }

  test("RetryingChain retries transient failures with backoff then succeeds") {
    class Flaky(failures: Int) extends LlmChains.Chain {
      // executor-local state: fails the first `failures` calls
      @transient private var n = 0
      def invoke(ps: Iterator[String]): Iterator[String] = ps.map { p =>
        n += 1
        if (n <= failures) throw new RuntimeException(s"rate limited ($n)")
        s"ok:$p"
      }
    }
    val c = LlmChains.RetryingChain(new Flaky(2), maxAttempts = 3, baseDelayMs = 1)
    assert(c.invoke(Iterator("x")).toSeq == Seq("ok:x"))
    val tooFlaky = LlmChains.RetryingChain(new Flaky(5), maxAttempts = 3, baseDelayMs = 1)
    intercept[RuntimeException] { tooFlaky.invoke(Iterator("x")).toSeq }
  }
}
