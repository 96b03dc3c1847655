package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join helpers (SURVEY §3).
  *
  * AQE's skew-join split handles most runtime skew; `saltedJoin` is the
  * explicit tool for the pathological case AQE can't fix — one key so
  * hot that a single join task cannot hold its hash bucket: the big
  * side's hot rows are spread across `saltFactor` sub-keys
  * (deterministically, from a row hash — no RNG state) and the small
  * side is replicated `saltFactor` times, so the hot key becomes
  * `saltFactor` parallel tasks. Result is row-identical to the plain
  * join.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // per-row deterministic salt: hash of the whole row spreads a hot
    // key's rows evenly without any RNG
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltFactor)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
