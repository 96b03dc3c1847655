package graft

import org.apache.spark.sql.SparkSession

/** The SQL front door: register every corpus table as a temp view and
  * the graft function family on the session, so a user can drive the
  * whole engine from `spark.sql(...)` (or a Thrift/Connect endpoint)
  * without touching the Scala API.
  */
object Graft {

  /** Idempotently expose `region … embeddings` as temp views over the
    * scale-factor dir and register graft_cosine / graft_dot /
    * graft_simhash_agg / graft_qhist. */
  def registerSql(spark: SparkSession, dir: String): Unit = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    Tables.names.foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
  }
}
