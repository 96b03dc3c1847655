package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** K65: export a [[SnapshotStore]] table AS a Delta Lake table — the
  * write direction of the A24 interop (the read direction is
  * graft.sources.DeltaLog): any Delta-speaking engine can consume
  * this store's corpora without this library. The export is
  * METADATA-ONLY — zero data movement: the Delta log lands in
  * `_delta_log/` under the store table's OWN directory and references
  * the store's immutable data files by table-relative path, which is
  * exactly the Delta contract (a table is a log over files under its
  * root; both formats agree that data files are immutable, so one
  * file set can serve both logs simultaneously).
  *
  * Incremental by construction: each export diffs the store's current
  * file set against the Delta log's live set (read back through this
  * repo's OWN A24 reader — the two sides can't drift) and commits
  * only the adds/removes; an export with nothing to say is a no-op
  * returning the existing version. */
object DeltaExport {

  /** The exported table's root path — hand this to any Delta reader
    * (the store keeps tableDir package-private; the export makes the
    * location part of the interop contract). */
  def tablePath(name: String): String = SnapshotStore.tableDir(name).toString

  /** I62: the exactly-once streaming sink whose commits are
    * IMMEDIATELY consumable by any Delta engine — the I30 batchId
    * idempotence composed with a per-batch metadata export: each
    * micro-batch publishes one store version and mirrors it as one
    * Delta commit over the same files; a REPLAYED batch no-ops on
    * both sides (the store resolves the batchId, the export finds no
    * file diff). Downstream Delta consumers tail the log and see
    * exactly the batches the store admitted — the serving half of the
    * streaming front door. Usage:
    * `ds.writeStream.foreachBatch(DeltaExport.streamSink(t) _)`. */
  def streamSink(name: String, queryId: String = "")(
      df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
    SnapshotStore.commitStreamBatch(name, df, batchId, queryId)
    export(df.sparkSession, name)
    ()
  }

  /** Export the CURRENT store snapshot of `name` as the next Delta
    * commit. Returns the Delta version (−1 only never; a no-change
    * export returns the latest existing version). */
  def export(spark: SparkSession, name: String): Long = synchronized {
    val vs = SnapshotStore.versions(name)
    require(vs.nonEmpty, s"store table $name does not exist")
    val tableDir = SnapshotStore.tableDir(name)
    val tablePath = tableDir.toString
    val fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def rel(abs: String): String = {
      val t = new Path(abs).toUri.getPath
      val root = tableDir.toUri.getPath.stripSuffix("/")
      require(t.startsWith(root + "/"),
        s"store file $abs is not under the table root $root")
      t.stripPrefix(root + "/")
    }
    val current = SnapshotStore.files(name, vs.last).map(rel).toSet
    val schema = SnapshotStore.schemaOf(name, vs.last).getOrElse(
      throw new IllegalArgumentException(s"$name: no schema at v${vs.last}"))

    val logDir = new Path(tableDir, "_delta_log")
    val existing: Seq[Long] =
      if (!fs.exists(logDir)) Seq.empty
      else fs.listStatus(logDir).iterator.map(_.getPath.getName)
        .filter(n => n.endsWith(".json") && n.length == 25)
        .flatMap(n => scala.util.Try(n.stripSuffix(".json").toLong).toOption)
        .toSeq.sorted
    val live: Set[String] =
      if (existing.isEmpty) Set.empty
      else graft.sources.DeltaLog.snapshot(spark, tablePath)._1
        .map(rel).toSet

    val adds = (current -- live).toSeq.sorted
    val removes = (live -- current).toSeq.sorted
    val deltaV = existing.lastOption.map(_ + 1).getOrElse(0L)
    if (existing.nonEmpty && adds.isEmpty && removes.isEmpty)
      return existing.last

    val schemaJson = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val header: Seq[String] =
      if (existing.isEmpty)
        Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
          s"""{"metaData":{"id":"graft-$name","schemaString":"$schemaJson","partitionColumns":[]}}""")
      else Seq.empty
    def enc(p: String): String =
      new java.net.URI(null, null, p, null).getRawPath
    val lines = header ++
      removes.map(p => s"""{"remove":{"path":"${enc(p)}","dataChange":true}}""") ++
      adds.map { p =>
        val size = scala.util.Try(
          fs.getFileStatus(new Path(tableDir, p)).getLen).getOrElse(0L)
        s"""{"add":{"path":"${enc(p)}","size":$size,"dataChange":true}}"""
      }
    fs.mkdirs(logDir)
    // same atomic-publish discipline as the store's own manifests:
    // write-temp + rename, so a Delta reader never sees a torn commit
    val tmp = new Path(logDir, f".$deltaV%020d.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new Path(logDir, f"$deltaV%020d.json")),
      s"delta export commit $deltaV failed (concurrent exporter?)")
    deltaV
  }
}
