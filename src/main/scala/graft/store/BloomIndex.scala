package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K22: per-file Bloom-filter index — point-lookup file skipping for
  * HIGH-CARDINALITY columns the table is NOT clustered on. The zone
  * map ([[ZoneMap]]) skips files by range and needs the data laid out
  * on the zone column; a needle query on any OTHER column (user_id in
  * a time-clustered event table — the classic GDPR / debugging
  * lookup) intersects every zone. A Bloom filter per file answers
  * "can this file contain key k?" with no false negatives and ~1%
  * false positives at 10 bits/key, so the lookup plans over the one
  * or two files that might hold the key instead of all of them.
  *
  * Build is ONE distributed aggregation: Spark's own
  * BloomFilterAggregate (the engine's runtime-filter sketch, reused
  * as a persistent index) keyed by input_file_name(), over
  * xxhash64(col) — fixed-width hashes in, one serialized filter per
  * file out. Probe is BloomFilterMightContain on the tiny stats
  * table, then a scan of only the surviving files with the equality
  * re-applied (false positives filter out; false negatives cannot
  * exist).
  */
object BloomIndex {

  /** Per-file Bloom over xxhash64 of `c`: (file, bloom). Size the
    * filter for `expectedPerFile` keys at ~10 bits/key (≈1% fpp). */
  def build(spark: SparkSession, path: String, c: String,
      expectedPerFile: Long = 1000000L): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(call_function("graft_bloom_agg",
        xxhash64(col(c)), lit(expectedPerFile)).as("bloom"))
  }

  /** The files whose filter admits `key` (no false negatives). The
    * stats table is one row per file — the probe collects it and
    * evaluates membership driver-side through the public sketch API
    * (Spark's own might_contain only accepts a CONSTANT filter, so a
    * per-row column probe must deserialize each file's filter anyway;
    * doing it on the driver holds exactly what FileSourceScanExec
    * holds after listing, one entry per file). The key is hashed with
    * the SAME XxHash64 the build used. */
  def pruneFiles(statsDf: DataFrame, key: Any,
      keyType: Option[org.apache.spark.sql.types.DataType] = None): Array[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
    // the probe must hash the key AS THE INDEXED COLUMN'S TYPE — an
    // Int probe against a Long-indexed column hashes 4 bytes vs 8 and
    // silently never matches (r11 review); callers that know the
    // column type pass it, lookup() always does
    val lit0 = Literal(key)
    // timezone-dependent casts (e.g. String → Timestamp) need a zone id
    // or Cast.eval throws (r11 advisor). A cast that still fails (or a
    // null result — an unparseable key) must NOT hash the uncast bytes:
    // a differently-typed hash risks a FALSE-NEGATIVE prune. Degrade to
    // the documented conservative behavior instead: keep every file.
    val lit: Option[Literal] = keyType.filter(_ != lit0.dataType) match {
      case None => Some(lit0)
      case Some(t) => scala.util.Try {
        val tz = SparkSession.active.sessionState.conf.sessionLocalTimeZone
        Option(Cast(lit0, t, Some(tz)).eval(null)).map(Literal.create(_, t))
      }.toOption.flatten
    }
    lit match {
      case None =>
        statsDf.select("file").collect().map(_.getString(0))
      case Some(l) =>
        // seed 42 = the default the xxhash64() SQL function uses at build
        val hash = XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]
        statsDf.select("file", "bloom").collect().iterator.filter { r =>
          org.apache.spark.util.sketch.BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
            .mightContainLong(hash)
        }.map(_.getString(0)).toArray
    }
  }

  /** The files whose filter admits ANY of `keys` — the batch probe a
    * CDC merge wants ("which files might hold any changed key"):
    * each file's filter deserializes ONCE and tests every key, so a
    * K-key batch over N files is N deserializations + N·K O(1)
    * probes, all metadata-side. Cast failures keep all files (the
    * [[pruneFiles]] conservative contract). */
  def pruneFilesAny(statsDf: DataFrame, keys: Seq[Any],
      keyType: org.apache.spark.sql.types.DataType): Array[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
    val hashes: Option[Seq[Long]] = scala.util.Try {
      val tz = SparkSession.active.sessionState.conf.sessionLocalTimeZone
      keys.filter(_ != null).map { k =>
        val lit0 = Literal(k)
        val l =
          if (lit0.dataType == keyType) lit0
          else Literal.create(Cast(lit0, keyType, Some(tz)).eval(null), keyType)
        XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]
      }
    }.toOption
    hashes match {
      case None => statsDf.select("file").collect().map(_.getString(0))
      case Some(hs) =>
        statsDf.select("file", "bloom").collect().iterator.filter { r =>
          val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
          hs.exists(bf.mightContainLong)
        }.map(_.getString(0)).toArray
    }
  }

  /** Point lookup planning over only the admitted files, equality
    * re-applied (Bloom positives may be false; the filter makes them
    * cheap, correctness never depends on them). */
  def lookup(spark: SparkSession, path: String, statsDf: DataFrame,
      c: String, key: Any): DataFrame = {
    val full = spark.read.parquet(path)
    val files = pruneFiles(statsDf, key, Some(full.schema(c).dataType))
    if (files.isEmpty) full.limit(0)
    else spark.read.schema(full.schema).parquet(files: _*)
      .filter(col(c) === lit(key))
  }
}
