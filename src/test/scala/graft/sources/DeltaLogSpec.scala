package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A24: the minimal Delta reader's protocol edges — checkpoint-based
  * replay after log cleanup, the reader-version refusal guard, the
  * missing-commit error, and the empty-snapshot schema contract. The
  * happy-path replay itself is value-oracled by ing_delta /
  * ing_delta_asof. */
class DeltaLogSpec extends SparkSpec {

  private def mkTable(name: String): (String, java.io.File) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_$name")
      .toString
    val log = new java.io.File(root, "_delta_log")
    log.mkdirs()
    (root, log)
  }

  private def commit(log: java.io.File, v: Long, lines: Seq[String]): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(log.toString, f"$v%020d.json"),
      lines.mkString("\n").getBytes("UTF-8"))

  private def writeData(root: String, sub: String,
      rows: Seq[(Long, String)]): Seq[String] = {
    import spark.implicits._
    rows.toDF("k", "s").coalesce(1).write.mode("overwrite")
      .parquet(s"$root/$sub")
    new java.io.File(s"$root/$sub").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => s"$sub/${f.getName}").toSeq.sorted
  }

  private val schemaJson = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("s",
      org.apache.spark.sql.types.StringType))).json

  private def metaLine =
    s"""{"metaData":{"id":"t","schemaString":"${schemaJson.replace("\"", "\\\"")}","partitionColumns":[]}}"""
  private def addLine(p: String) =
    s"""{"add":{"path":"$p","size":1,"dataChange":true}}"""

  test("A24 checkpoint replay: a vacuumed log (pre-checkpoint commits gone) reads through the checkpoint parquet + JSON tail") {
    import spark.implicits._
    val (root, log) = mkTable("dl_ckpt")
    val a = writeData(root, "da", Seq((1L, "a")))
    val b = writeData(root, "db", Seq((2L, "b")))
    val c = writeData(root, "dc", Seq((3L, "c")))
    // checkpoint at v1 summarizes: protocol+meta+add(a)+add(b) (v0),
    // remove is not needed — the checkpoint holds the RESOLVED state
    val ckpt = Seq(
      (Some("da/" + a.head.split("/").last), None: Option[String],
        Some(schemaJson), Some(1)),
      (Some("db/" + b.head.split("/").last), None, None, None))
      .toDF("p", "rp", "ss", "mr")
      .select(struct(col("p").as("path")).as("add"),
        when(col("rp").isNotNull, struct(col("rp").as("path"))).as("remove"),
        when(col("ss").isNotNull,
          struct(col("ss").as("schemaString"))).as("metaData"),
        when(col("mr").isNotNull,
          struct(col("mr").as("minReaderVersion"))).as("protocol"))
    ckpt.coalesce(1).write.mode("overwrite")
      .parquet(s"$root/_ckpt_stage")
    val part = new java.io.File(s"$root/_ckpt_stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(log.toString,
        f"${1L}%020d.checkpoint.parquet"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(log.toString, "_last_checkpoint"),
      """{"version":1,"size":2}""".getBytes("UTF-8"))
    // the JSON tail AFTER the checkpoint: v2 removes b, adds c —
    // and the pre-checkpoint commits were vacuumed (never written)
    commit(log, 2L,
      Seq(s"""{"remove":{"path":"db/${b.head.split("/").last}","dataChange":true}}""",
        addLine(c.head)))
    val got = DeltaLog.readTable(spark, root)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (3L, "c")),
      "checkpoint base + JSON tail must replay to the live set")
    // asking for a version BELOW the checkpoint whose commits are gone
    // fails loudly, never silently serves the wrong snapshot
    val e = intercept[IllegalArgumentException] {
      DeltaLog.snapshot(spark, root, Some(0L))
    }
    assert(e.getMessage.contains("missing commit json"), e.getMessage)
  }

  test("A24 guards: unsupported reader protocol refuses; a non-table and an over-head version fail loudly; empty snapshot keeps the schema") {
    import spark.implicits._
    val (root, log) = mkTable("dl_guard")
    val a = writeData(root, "da", Seq((1L, "a")))
    commit(log, 0L,
      Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}""",
        metaLine) ++ a.map(addLine))
    val e = intercept[IllegalArgumentException] {
      DeltaLog.readTable(spark, root)
    }
    assert(e.getMessage.contains("unsupported Delta reader protocol"),
      "a v3-reader table (deletion vectors / column mapping) must refuse")

    val (root2, log2) = mkTable("dl_guard2")
    val b = writeData(root2, "da", Seq((1L, "a")))
    commit(log2, 0L,
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        metaLine) ++ b.map(addLine))
    // over-head version
    intercept[IllegalArgumentException] {
      DeltaLog.snapshot(spark, root2, Some(7L))
    }
    // not a delta table
    intercept[IllegalArgumentException] {
      DeltaLog.snapshot(spark,
        java.nio.file.Files.createTempDirectory("dl_none").toString)
    }
    // v1 removes the only file: the snapshot is EMPTY but typed
    commit(log2, 1L,
      Seq(s"""{"remove":{"path":"${b.head}","dataChange":true}}"""))
    val empty = DeltaLog.readTable(spark, root2)
    assert(empty.count() == 0L)
    assert(empty.schema.fieldNames.toSeq == Seq("k", "s"),
      "an empty snapshot must keep the log's schema")
  }
}
