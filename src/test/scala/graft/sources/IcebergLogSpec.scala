package graft.sources

import graft.SparkSpec

/** A25: the minimal Iceberg reader's protocol edges — v2
  * delete-manifest refusal, unknown-snapshot and complex-type errors,
  * metadata discovery without a version hint. The status-code replay
  * itself (EXISTING/ADDED/DELETED) is value-oracled by ing_iceberg /
  * ing_iceberg_asof. */
class IcebergLogSpec extends SparkSpec {

  import org.apache.avro.generic.{GenericData, GenericRecord}

  private def writeAvro(dir: java.io.File, file: String, schemaJson: String,
      rows: Seq[org.apache.avro.Schema => GenericRecord]): Unit = {
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, file))
    try rows.foreach(mk => w.append(mk(schema))) finally w.close()
  }

  private val listSchema =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"content","type":"int","default":0}]}""".stripMargin
  private val entrySchema =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"record_count","type":"long"}]}}]}""".stripMargin

  private def mkTable(metaJson: String,
      avro: Map[String, (String, Seq[org.apache.avro.Schema => GenericRecord])],
      versionHint: Boolean = true): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_iceberg").toString
    val mdir = new java.io.File(root, "metadata"); mdir.mkdirs()
    avro.foreach { case (f, (sch, rows)) => writeAvro(mdir, f, sch, rows) }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(mdir.toString, "v1.metadata.json"),
      metaJson.replace("$ROOT", root).getBytes("UTF-8"))
    if (versionHint)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(mdir.toString, "version-hint.text"),
        "1".getBytes("UTF-8"))
    root
  }

  private def mf(path: String, content: Int = 0)(
      s: org.apache.avro.Schema): GenericRecord = {
    val r = new GenericData.Record(s)
    r.put("manifest_path", path); r.put("content", content); r
  }
  private def entry(status: Int, path: String)(
      s: org.apache.avro.Schema): GenericRecord = {
    val r = new GenericData.Record(s)
    val d = new GenericData.Record(s.getField("data_file").schema())
    d.put("file_path", path); d.put("record_count", 1L)
    r.put("status", status); r.put("data_file", d); r
  }

  private val meta =
    """{"format-version": 2, "location": "$ROOT",
      |"current-schema-id": 0,
      |"schemas": [{"schema-id": 0, "type": "struct", "fields": [
      |  {"id": 1, "name": "k", "required": false, "type": "long"}]}],
      |"current-snapshot-id": 1,
      |"snapshots": [{"snapshot-id": 1, "manifest-list": "metadata/snap-1.avro"}]}""".stripMargin

  test("A25 guards: a v2 DELETE manifest refuses; an unknown snapshot and a complex column type fail loudly") {
    import spark.implicits._
    val root = mkTable(meta, Map(
      "snap-1.avro" -> (listSchema, Seq(mf("metadata/m1.avro", content = 1) _)),
      "m1.avro" -> (entrySchema, Seq(entry(1, "data/x.parquet") _))))
    val e = intercept[IllegalArgumentException] {
      IcebergLog.readTable(spark, root)
    }
    assert(e.getMessage.contains("unsupported DELETE manifest"),
      "row-level delete manifests must refuse, never over-report rows")

    // a healthy table: data file + data manifest
    val root2 = mkTable(meta, Map.empty)
    Seq((1L, ())).map(_._1).toDF("k").coalesce(1)
      .write.mode("overwrite").parquet(s"$root2/data/d")
    val part = new java.io.File(s"$root2/data/d").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getName
    val mdir = new java.io.File(root2, "metadata")
    writeAvro(mdir, "m1.avro", entrySchema, Seq(entry(1, s"data/d/$part") _))
    writeAvro(mdir, "snap-1.avro", listSchema, Seq(mf("metadata/m1.avro") _))
    assert(IcebergLog.readTable(spark, root2).as[Long].collect().toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      IcebergLog.snapshot(spark, root2, Some(99L))
    }

    // a complex column type is out of the primitive read scope
    val badMeta = meta.replace("\"type\": \"long\"",
      "\"type\": {\"type\": \"list\", \"element\": \"long\"}")
    val root3 = mkTable(badMeta, Map(
      "snap-1.avro" -> (listSchema, Seq.empty),
      "m1.avro" -> (entrySchema, Seq.empty)))
    val e3 = intercept[IllegalArgumentException] {
      IcebergLog.snapshot(spark, root3)
    }
    assert(e3.getMessage.contains("unsupported complex type"), e3.getMessage)
  }

  test("A25 discovery: without version-hint.text the highest vN.metadata.json wins") {
    import spark.implicits._
    val root = mkTable(meta, Map(
      "snap-1.avro" -> (listSchema, Seq.empty[org.apache.avro.Schema => GenericRecord])),
      versionHint = false)
    val mdir = new java.io.File(root, "metadata")
    // a STALE v2 pointing at nothing would fail; the reader must pick
    // the HIGHEST version (v3), which reads an empty-but-typed table
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(mdir.toString, "v1.metadata.json"),
      java.nio.file.Paths.get(mdir.toString, "v3.metadata.json"))
    val df = IcebergLog.readTable(spark, root)
    assert(df.count() == 0L && df.schema.fieldNames.toSeq == Seq("k"),
      "empty snapshot keeps the metadata schema")
  }
}
