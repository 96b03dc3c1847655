package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A24: minimal Delta Lake TABLE READER — interop with the most
  * widespread open lakehouse format WITHOUT the delta-lake jars (the
  * protocol is public: a `_delta_log/` of ordered JSON commits, each a
  * set of `add`/`remove`/`metaData`/`protocol` actions, optionally
  * compacted into parquet checkpoints named by `_last_checkpoint`).
  * A training-data pipeline meets Delta tables CONSTANTLY — vendor
  * drops, feature stores, curated corpora — and "read the live file
  * set as of a version" needs only the log replay, not the writer
  * machinery this repo's own SnapshotStore covers.
  *
  * Scope (guarded, not silent): reader protocol version 1 —
  * unpartitioned or partition-values-ignored reads, no deletion
  * vectors, no column mapping; a table demanding minReaderVersion > 1
  * throws instead of misreading. Log replay is driver-side metadata
  * work (the SnapshotStore discipline — a log is KB-scale); the data
  * read is the stock vectorized parquet scan over exactly the live
  * files, with the schema from the latest `metaData` action (the
  * Delta design: schema lives in the log, never sniffed from
  * footers).
  */
object DeltaLog {

  private def fsOf(p: Path, spark: SparkSession) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(tablePath: String) = new Path(tablePath, "_delta_log")

  private def versionOf(name: String): Option[Long] =
    if (name.endsWith(".json") && name.length == 25)
      scala.util.Try(name.stripSuffix(".json").toLong).toOption
    else None

  /** The `_last_checkpoint` pointer, if present: (version). */
  private def lastCheckpoint(spark: SparkSession, tablePath: String): Option[Long] = {
    val p = new Path(logDir(tablePath), "_last_checkpoint")
    val fs = fsOf(p, spark)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      "\"version\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    }
  }

  /** One action row pulled out of a commit or checkpoint frame. */
  private case class Act(version: Long, addPath: String, removePath: String,
      schemaJson: String, minReader: Int,
      partValues: Map[String, String], partCols: Seq[String])

  /** Collect (version, action) rows from a set of log files — ONE
    * Spark json/parquet read over metadata-scale files, columns
    * guarded because a log with no removes never materializes the
    * column. */
  private def actionsOf(df: DataFrame, version: org.apache.spark.sql.Column): Seq[Act] = {
    def optCol(name: String, tpe: String = "string") =
      if (scala.util.Try(df(name)).isSuccess) df(name).cast(tpe)
      else lit(null).cast(tpe)
    df.select(
      version.cast("long").as("v"),
      optCol("add.path").as("ap"),
      optCol("remove.path").as("rp"),
      optCol("metaData.schemaString").as("ss"),
      optCol("protocol.minReaderVersion", "int").as("mr"),
      optCol("add.partitionValues", "map<string,string>").as("pv"),
      optCol("metaData.partitionColumns", "array<string>").as("pc"))
      .collect()
      .map(r => Act(r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) -1 else r.getInt(4),
        if (r.isNullAt(5)) Map.empty
        else r.getMap[String, String](5).toMap,
        if (r.isNullAt(6)) null else r.getSeq[String](6))).toSeq
  }

  /** Replay the log up to `asOfVersion` (inclusive; None = head):
    * (live data file paths, schema, per-file partitionValues,
    * partitionColumns). Starts from the newest parquet checkpoint at
    * or below the target when the pre-checkpoint JSON commits are
    * gone (Delta's log-cleanup reality), else replays the JSON
    * commits alone. */
  private def snapshotFull(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long] = None)
      : (Seq[String], StructType, Map[String, Map[String, String]], Seq[String]) = {
    val dir = logDir(tablePath)
    val fs = fsOf(dir, spark)
    require(fs.exists(dir), s"not a Delta table (no _delta_log): $tablePath")
    val jsonVs = fs.listStatus(dir).iterator.map(_.getPath.getName)
      .flatMap(versionOf).toSeq.sorted
    require(jsonVs.nonEmpty || lastCheckpoint(spark, tablePath).nonEmpty,
      s"empty _delta_log: $tablePath")
    val head = (jsonVs.lastOption.toSeq ++
      lastCheckpoint(spark, tablePath).toSeq).max
    val target = asOfVersion.getOrElse(head)
    require(target <= head, s"version $target does not exist (head $head)")

    // base: the newest checkpoint <= target whose replay tail (the
    // JSON commits in (ckpt, target]) is fully present; else JSON-only
    val ckpt = lastCheckpoint(spark, tablePath).filter(_ <= target)
    val jsonNeeded = ckpt match {
      case Some(c) => ((c + 1) to target)
      case None => (0L to target)
    }
    require(jsonNeeded.forall(jsonVs.contains),
      s"missing commit json for versions ${jsonNeeded.filterNot(jsonVs.contains)} " +
        s"of $tablePath (vacuumed past the requested version?)")

    val base: Seq[Act] = ckpt.map { c =>
      val cp = new Path(dir, f"$c%020d.checkpoint.parquet")
      require(fs.exists(cp), s"dangling _last_checkpoint: $cp missing")
      actionsOf(spark.read.parquet(cp.toString), lit(c))
    }.getOrElse(Seq.empty)
    val tail: Seq[Act] =
      if (jsonNeeded.isEmpty) Seq.empty
      else {
        val paths = jsonNeeded.map(v => new Path(dir, f"$v%020d.json").toString)
        // explicit partial schema: partitionValues must parse as a MAP
        // (inference would explode its keys into struct fields), and
        // absent actions become null columns instead of vanishing
        val commitSchema = StructType.fromDDL(
          "add struct<path:string,partitionValues:map<string,string>>, " +
            "remove struct<path:string>, " +
            "metaData struct<schemaString:string,partitionColumns:array<string>>, " +
            "protocol struct<minReaderVersion:int>")
        actionsOf(
          spark.read.schema(commitSchema).json(paths: _*)
            .withColumn("_v", regexp_extract(
              input_file_name(), "(\\d{20})\\.json", 1)),
          col("_v"))
      }
    val acts = (base ++ tail).sortBy(_.version)

    acts.map(_.minReader).filter(_ > 0).foreach(mr =>
      require(mr <= 1, s"unsupported Delta reader protocol $mr " +
        "(deletion vectors / column mapping not implemented — refusing " +
        "to misread)"))
    val schemaJson = acts.filter(_.schemaJson != null).lastOption
      .map(_.schemaJson)
      .getOrElse(throw new IllegalArgumentException(
        s"no metaData action found in the replayed log of $tablePath"))
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(schemaJson).asInstanceOf[StructType]

    // fold per version: removes drop, adds insert (Delta forbids the
    // same path added AND removed in one commit, so order within a
    // version is immaterial); paths are URL-encoded relative URIs
    def abs(rel: String): String =
      new Path(tablePath,
        java.net.URLDecoder.decode(rel, "UTF-8")).toString
    val live = scala.collection.mutable.LinkedHashMap
      .empty[String, Map[String, String]]
    acts.groupBy(_.version).toSeq.sortBy(_._1).foreach { case (_, va) =>
      va.filter(_.removePath != null).foreach(a => live -= abs(a.removePath))
      va.filter(_.addPath != null).foreach(a =>
        live += (abs(a.addPath) -> a.partValues))
    }
    val partCols = acts.filter(_.partCols != null).lastOption
      .map(_.partCols).getOrElse(Seq.empty)
    (live.toSeq.map(_._1), schema, live.toMap, partCols)
  }

  /** Replay the log up to `asOfVersion`: (live data files, schema). */
  def snapshot(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long] = None): (Seq[String], StructType) = {
    val (files, schema, _, _) = snapshotFull(spark, tablePath, asOfVersion)
    (files, schema)
  }

  /** The table as a DataFrame — the live files at `asOfVersion` under
    * the log's schema, through the stock vectorized parquet scan. An
    * empty snapshot yields an empty frame WITH the schema. A
    * PARTITIONED table (metaData.partitionColumns non-empty)
    * reconstructs the partition columns from each file's
    * `partitionValues` — Delta data files do NOT store partition
    * columns, the log does: files group by their partition tuple, each
    * group reads under the data-only schema with the tuple attached as
    * typed literals, groups union (at fixture/table scale; Spark's own
    * Delta reader folds this into a FileIndex — same semantics). */
  def readTable(spark: SparkSession, tablePath: String,
      asOfVersion: Option[Long] = None): DataFrame = {
    val (files, schema, pvOf, partCols) =
      snapshotFull(spark, tablePath, asOfVersion)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else if (partCols.isEmpty)
      spark.read.schema(schema).parquet(files: _*)
    else {
      val dataSchema = StructType(
        schema.fields.filterNot(f => partCols.contains(f.name)))
      val ordered = schema.fieldNames.map(col).toSeq
      files.groupBy(pvOf).map { case (pv, fs) =>
        partCols.foldLeft(
          spark.read.schema(dataSchema).parquet(fs: _*)) { (df, pc) =>
          val tpe = schema(pc).dataType
          df.withColumn(pc,
            pv.get(pc).map(v => lit(v).cast(tpe))
              .getOrElse(lit(null).cast(tpe)))
        }.select(ordered: _*)
      }.reduce(_ unionAll _)
    }
  }
}
