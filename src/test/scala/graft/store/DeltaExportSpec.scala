package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** K65: store-snapshot → Delta-log export — metadata-only interop in
  * the write direction, verified through the repo's OWN A24 reader so
  * the two sides cannot drift. */
class DeltaExportSpec extends SparkSpec {

  private def deltaRows(name: String): Set[(Long, String)] =
    graft.sources.DeltaLog.readTable(spark, DeltaExport.tablePath(name))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("s"))))
      .toSet

  private def storeRows(name: String): Set[(Long, String)] =
    SnapshotStore.read(spark, name).collect()
      .map(r => (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("s"))))
      .toSet

  test("K65 export: appends diff to adds, overwrites to removes+adds, no-change no-ops, and NO data file is ever copied") {
    import spark.implicits._
    val name = "dexp_spec"
    SnapshotStore.commitAppend(name, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    assert(DeltaExport.export(spark, name) == 0L)
    assert(deltaRows(name) == storeRows(name))

    def parquetCount(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(DeltaExport.tablePath(name).stripPrefix("file:")))
        .count(_.getName.endsWith(".parquet"))
    }
    val filesAfterV0 = parquetCount()

    // a store APPEND exports as an adds-only Delta commit
    SnapshotStore.commitAppend(name, Seq((3L, "c")).toDF("k", "s"))
    assert(DeltaExport.export(spark, name) == 1L)
    assert(deltaRows(name) == storeRows(name) &&
      deltaRows(name) == Set((1L, "a"), (2L, "b"), (3L, "c")))

    // a store OVERWRITE exports removes for every dropped file
    SnapshotStore.commitOverwrite(name, Seq((9L, "z")).toDF("k", "s"))
    assert(DeltaExport.export(spark, name) == 2L)
    assert(deltaRows(name) == Set((9L, "z")))

    // nothing changed: the export is a no-op returning the live version
    assert(DeltaExport.export(spark, name) == 2L)
    val log = new java.io.File(
      DeltaExport.tablePath(name).stripPrefix("file:"), "_delta_log")
    assert(log.listFiles().count(_.getName.endsWith(".json")) == 3,
      "a no-change export must not write a fourth commit")

    // the export moved METADATA only: every parquet file under the
    // table root predates it (the overwrite's own file is the store's)
    assert(parquetCount() == filesAfterV0 + 2,
      "exactly the two store commits' files exist — the export copied nothing")

    // and time travel through the exported log sees the pre-overwrite
    // state (Delta version 1 = store head at export time)
    val v1 = graft.sources.DeltaLog.readTable(spark,
      DeltaExport.tablePath(name), Some(1L)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1 == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("I62 streaming Delta sink: every micro-batch is immediately Delta-visible; a replay no-ops on BOTH logs") {
    import spark.implicits._
    val name = "dexp_stream"
    val sink = DeltaExport.streamSink(name) _
    sink(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), 0L)
    assert(deltaRows(name) == Set((1L, "a"), (2L, "b")),
      "batch 0 must be Delta-consumable the moment the sink returns")
    sink(Seq((3L, "c")).toDF("k", "s"), 1L)
    assert(deltaRows(name) == storeRows(name) &&
      deltaRows(name) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    val log = new java.io.File(
      DeltaExport.tablePath(name).stripPrefix("file:"), "_delta_log")
    def commits = log.listFiles().count(_.getName.endsWith(".json"))
    val (sv, dv) = (SnapshotStore.versions(name).size, commits)
    // replay of batch 0: the store resolves the batchId, the export
    // finds no diff — neither log grows, no duplicate rows
    sink(Seq((9L, "POISON")).toDF("k", "s"), 0L)
    assert(deltaRows(name) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(SnapshotStore.versions(name).size == sv && commits == dv,
      "a replayed batch must no-op on both the store and the Delta log")
  }
}
