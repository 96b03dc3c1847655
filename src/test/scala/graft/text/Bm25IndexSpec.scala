package graft.text

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** K24: the persisted inverted index must (1) reproduce the corpus-scan
  * BM25 ranking EXACTLY and (2) actually prune buckets on the term
  * filter — otherwise it's just a cached retokenization, not an index. */
class Bm25IndexSpec extends SparkSpec {

  test("K24 indexed BM25 equals corpus-scan BM25 row for row") {
    val direct = TextQueries.textBm25(spark, sfDir).collect().toSeq
    val indexed = TextQueries.textBm25Indexed(spark, sfDir).collect().toSeq
    assert(indexed == direct)
  }

  test("K24 the postings scan bucket-prunes on the query-term IN filter") {
    import graft.store.GraftStore
    TextQueries.textBm25Indexed(spark, sfDir).collect() // ensure built
    val key = GraftStore.dirKey(sfDir)
    val post = spark.table(s"bm25_postings_$key")
      .filter(col("term").isin(TextQueries.Bm25QueryTerms: _*))
    post.collect()
    val plan = post.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collectFirst { case s: FileSourceScanExec => s }.get
    val selected = scan.optionalBucketSet.map(_.cardinality()).getOrElse(Int.MaxValue)
    assert(selected < 8, s"expected bucket pruning, selected $selected of 8")
    // 3 query terms can occupy at most 3 buckets
    assert(selected <= TextQueries.Bm25QueryTerms.size)
  }
}
