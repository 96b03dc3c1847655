package graft

import org.apache.spark.sql.functions._

/** A8 scale path: bucketed tables co-locate fact-fact joins so the
  * join runs with NO shuffle exchange — the pre-partitioning strategy
  * the 100 TB design relies on for repeated joins on the same key.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-join-key tables join without a shuffle exchange") {
    noBroadcast {
      try {
        val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
        val lineitem = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
        orders.write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable("b_orders")
        lineitem.write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable("b_lineitem")
        val joined = spark.table("b_lineitem")
          .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        assert(joined.count() == lineitem.count(),
          "inner join on FK must keep all lineitems")
        assert(countExchanges(joined) == 0, "bucketed join must not shuffle")
      } finally {
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
      }
    }
  }
}
