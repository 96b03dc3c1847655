package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** A25: minimal Apache Iceberg TABLE READER — the A24 sibling for the
  * other open lakehouse format, again WITHOUT the format's own jars
  * (the spec is public: a `metadata/vN.metadata.json` naming
  * snapshots, each snapshot pointing at an Avro MANIFEST LIST whose
  * rows point at Avro MANIFEST files, whose entries carry a status
  * code and a `data_file` struct). The container's stock Apache Avro
  * Java library (bundled with Spark) decodes the manifests
  * DRIVER-side — manifests are metadata-scale, the same discipline as
  * the Delta log replay and this store's own manifest reads; the data
  * read is the stock vectorized parquet scan over exactly the live
  * files under the schema from the metadata JSON (never sniffed from
  * footers).
  *
  * Scope (guarded, not silent): v1-shape reads — primitive column
  * types, no positional/equality DELETE files (format-version 2
  * tables that carry delete manifests are REFUSED), no partition
  * transforms applied (identity reads of unpartitioned data files).
  * Manifest entries honor the spec status codes: 0 = EXISTING
  * (carried), 1 = ADDED, 2 = DELETED (dropped). */
object IcebergLog {

  private def fsOf(p: Path, spark: SparkSession) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The current metadata file: `version-hint.text` when present (the
    * HadoopCatalog convention), else the highest vN.metadata.json. */
  private def currentMetadataPath(spark: SparkSession, tablePath: String): Path = {
    val mdir = new Path(tablePath, "metadata")
    val fs = fsOf(mdir, spark)
    require(fs.exists(mdir), s"not an Iceberg table (no metadata/): $tablePath")
    val hint = new Path(mdir, "version-hint.text")
    if (fs.exists(hint)) {
      val in = fs.open(hint)
      val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      new Path(mdir, s"v$v.metadata.json")
    } else {
      val vs = fs.listStatus(mdir).iterator.map(_.getPath.getName)
        .flatMap { n =>
          "^v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(n).map(_.group(1).toLong)
        }.toSeq
      require(vs.nonEmpty, s"no vN.metadata.json under $mdir")
      new Path(mdir, s"v${vs.max}.metadata.json")
    }
  }

  private def readText(spark: SparkSession, p: Path): String = {
    val in = fsOf(p, spark).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Iceberg JSON schema → Spark StructType (primitive types; a
    * nested/complex field type REFUSES — out of the read scope). */
  private[sources] def sparkSchemaOf(schema: org.json4s.JValue): StructType = {
    import org.json4s._
    def prim(t: String): DataType = t match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "string" => StringType
      case "binary" => BinaryType
      case s if s.startsWith("decimal(") =>
        val Array(p, sc) = s.stripPrefix("decimal(").stripSuffix(")").split(",")
        DecimalType(p.trim.toInt, sc.trim.toInt)
      case "timestamp" | "timestamptz" => TimestampType
      case other => throw new IllegalArgumentException(
        s"unsupported Iceberg column type '$other' (primitive scope)")
    }
    val fields = (schema \ "fields") match {
      case JArray(fs) => fs.map { f =>
        val name = (f \ "name") match { case JString(s) => s; case _ =>
          throw new IllegalArgumentException("schema field without a name") }
        val required = (f \ "required") match {
          case JBool(b) => b; case _ => false }
        val tpe = (f \ "type") match {
          case JString(s) => prim(s)
          case _ => throw new IllegalArgumentException(
            s"unsupported complex type on column '$name' (primitive scope)")
        }
        StructField(name, tpe, nullable = !required)
      }
      case _ => throw new IllegalArgumentException("schema without fields")
    }
    StructType(fields)
  }

  /** Read every record of an Avro file (driver-side, streaming). */
  private def avroRecords(spark: SparkSession, p: Path)
      : Seq[org.apache.avro.generic.GenericRecord] = {
    val in = fsOf(p, spark).open(p)
    val reader = new org.apache.avro.file.DataFileStream(
      in, new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try {
      val out = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.avro.generic.GenericRecord]
      while (reader.hasNext) out += reader.next()
      out.toSeq
    } finally reader.close()
  }

  /** Resolve a manifest-carried location: full URIs and absolute paths
    * verbatim, else relative to the table root. */
  private def resolve(tablePath: String, loc: String): String =
    if (loc.contains("://") || loc.startsWith("/")) loc
    else new Path(tablePath, loc).toString

  /** The live data files + schema at `snapshotId` (None = the
    * metadata's current snapshot). */
  def snapshot(spark: SparkSession, tablePath: String,
      snapshotId: Option[Long] = None): (Seq[String], StructType) = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val meta = JsonMethods.parse(
      readText(spark, currentMetadataPath(spark, tablePath)))

    val schema: StructType = {
      val currentId = (meta \ "current-schema-id") match {
        case JInt(i) => Some(i.toLong); case _ => None }
      val fromList = (meta \ "schemas") match {
        case JArray(ss) => currentId.flatMap(id => ss.find(s =>
          (s \ "schema-id") match {
            case JInt(i) => i.toLong == id; case _ => false
          })).orElse(ss.headOption)
        case _ => None
      }
      sparkSchemaOf(fromList.getOrElse(meta \ "schema"))
    }

    val snaps: Seq[(Long, String)] = (meta \ "snapshots") match {
      case JArray(ss) => ss.map { s =>
        val id = (s \ "snapshot-id") match { case JInt(i) => i.toLong
          case _ => throw new IllegalArgumentException("snapshot without id") }
        val ml = (s \ "manifest-list") match { case JString(m) => m
          case _ => throw new IllegalArgumentException(
            s"snapshot $id without a manifest-list (v1 manifests-array " +
              "layout not supported)") }
        (id, ml)
      }
      case _ => Seq.empty
    }
    require(snaps.nonEmpty, s"no snapshots in $tablePath")
    val current = (meta \ "current-snapshot-id") match {
      case JInt(i) => i.toLong
      case _ => snaps.map(_._1).max
    }
    val target = snapshotId.getOrElse(current)
    val manifestList = snaps.toMap.getOrElse(target,
      throw new IllegalArgumentException(
        s"snapshot $target does not exist in $tablePath " +
          s"(have ${snaps.map(_._1).sorted.mkString(", ")})"))

    val manifests = avroRecords(spark,
      new Path(resolve(tablePath, manifestList)))
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    manifests.foreach { m =>
      // v2 delete manifests (content = 1) carry row-level deletes this
      // reader cannot apply — refuse instead of over-reporting rows
      val content = Option(m.get("content")).map(_.toString.toInt).getOrElse(0)
      require(content == 0,
        "unsupported DELETE manifest (Iceberg v2 row-level deletes " +
          "not implemented — refusing to misread)")
      val mp = resolve(tablePath, m.get("manifest_path").toString)
      avroRecords(spark, new Path(mp)).foreach { e =>
        val status = e.get("status").toString.toInt
        val df = e.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        val path = resolve(tablePath, df.get("file_path").toString)
        if (status == 2) live -= path else live += path
      }
    }
    (live.toSeq, schema)
  }

  /** The table as a DataFrame at `snapshotId` (None = current). */
  def readTable(spark: SparkSession, tablePath: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val (files, schema) = snapshot(spark, tablePath, snapshotId)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }
}
