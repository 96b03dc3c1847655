package graft.multimodal

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column handling (SURVEY §2 H1-H3): opaque binary payloads
  * with typed metadata, a deterministic stub decoder, and binary frame
  * sampling.
  *
  * The container has no image/audio codecs, so `stubDecodeFeatures` is a
  * clearly-marked deterministic fake (md5-derived floats) — but ALL the
  * Spark plumbing is real: the asset schema, the mapPartitions batch
  * shape an inference UDF would use, and the chunking arithmetic. On a
  * real cluster you swap `fakeEmbedding` for the codec call and nothing
  * else changes.
  */
object Multimodal {

  /** One decoded fake feature row. */
  final case class AssetFeatures(doc_id: Long, dim: Int, features: Array[Float])

  /** H1: wrap a text corpus as multimodal assets: binary payload +
    * typed metadata struct — the schema contract for any downstream
    * decode/extract stage. Payload bytes are the UTF-8 text (stand-in
    * for image/audio bytes); per-asset work only, no shuffle. */
  def assets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("lang"),
        col("source"),
        col("n_chars")).as("meta"))

  /** Deterministic fake "decoder": 8 floats derived from the md5 of the
    * payload (each hex quad scaled to [0,1)). STUB — replace with a
    * real codec on a cluster that has one. */
  private[multimodal] def fakeEmbedding(payload: Array[Byte]): Array[Float] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString
    (0 until 8).map { i =>
      Integer.parseInt(hex.substring(i * 4, i * 4 + 4), 16) / 65536.0f
    }.toArray
  }

  /** H2: partition-wise feature extraction with the batch shape a real
    * inference step needs (iterator-in/iterator-out per partition, so a
    * model handle could be initialized once per partition and reused). */
  def stubDecodeFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (model/codec handle)
        it.map { case (id, payload) =>
          val f = fakeEmbedding(payload)
          AssetFeatures(id, f.length, f)
        }
      }
  }

  /** H3: chunk each payload into fixed-size frames (windowed binary
    * slices) — the video-frame / audio-window sampling shape. Pure
    * expressions: sequence + transform + substring on binary, then
    * posexplode; no UDF, no shuffle. */
  def frameSample(assets: DataFrame, frameBytes: Int): DataFrame = {
    val len = length(col("payload"))
    val nFrames = ceil(len.cast("double") / frameBytes).cast("int")
    assets.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), nFrames - 1),
        i => substring(col("payload"), (i * frameBytes + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
  }

  /** H1 driver query: flattened asset features (byte length + md5 +
    * metadata) — DuckDB-oracle-checkable without binary columns in the
    * output. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir).select(
      col("doc_id"),
      length(col("payload")).as("byte_len"),
      md5(col("payload")).as("payload_md5"),
      col("meta.mime").as("mime"),
      col("meta.lang").as("lang"),
      col("meta.source").as("source"),
      col("meta.n_chars").as("n_chars"))

  val FrameBytes = 64

  /** H3 driver query: per-frame index, md5 and length (payloads are
    * ASCII text stand-ins, so byte slices == char slices and the
    * DuckDB oracle can mirror the chunking exactly). */
  def mmFrames(spark: SparkSession, dir: String): DataFrame =
    frameSample(assets(spark, dir), FrameBytes).select(
      col("doc_id"),
      col("frame_idx"),
      md5(col("frame")).as("frame_md5"),
      length(col("frame")).as("frame_len"))

  /** H2 driver query: the REAL mapPartitions decode path, flattened to
    * (doc_id, dim_idx, value) so the md5-derived stub features are
    * oracle-checkable value by value. */
  def mmDecode(spark: SparkSession, dir: String): DataFrame = {
    val feats = stubDecodeFeatures(assets(spark, dir))
    feats.toDF().select(col("doc_id"), posexplode(col("features")))
      .select(col("doc_id"), col("pos").as("dim_idx"),
        round(col("col").cast("double"), 4).as("value"))
  }

  /** Big-endian u32 at 1-based byte offset `off` of a binary column —
    * pure codegen'd slicing (substring on binary + hex + conv). */
  def beU32(bin: org.apache.spark.sql.Column, off: Int): org.apache.spark.sql.Column =
    conv(hex(substring(bin, off, 4)), 16, 10).cast("long")

  /** PNG 8-byte signature, lowercase hex. */
  val PngSigHex = "89504e470d0a1a0a"

  /** Parse (valid_sig, width, height) from a PNG byte stream: the
    * signature is bytes 1-8, IHDR width/height are big-endian u32 at
    * bytes 17-20 / 21-24. No codec — header-only binary slicing, the
    * metadata-extraction pass an image pipeline runs before any decode. */
  def pngHeader(bin: org.apache.spark.sql.Column): (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column, org.apache.spark.sql.Column) =
    ((lower(hex(substring(bin, 1, 8))) === PngSigHex).cast("int"),
      beU32(bin, 17), beU32(bin, 21))

  /** H4 driver query: synthesize a REAL PNG signature+IHDR prefix per
    * asset (dims derived from metadata — the container has no images,
    * like the H2 stub), then parse the dims back from the BYTES with
    * pngHeader. The oracle reproduces the same hex string and slices
    * it textually, so the binary round-trip is value-checked. */
  def mmPngDims(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val w = (col("n_chars") % 1024 + 1).cast("int")
    val h = (col("doc_id") % 768 + 1).cast("int")
    val ihdrHex = concat(lit(PngSigHex),
      lit("0000000d"), lit("49484452"), // IHDR chunk length 13 + type
      lpad(lower(hex(w)), 8, "0"), lpad(lower(hex(h)), 8, "0"),
      lit("0806000000")) // bit depth 8, RGBA, deflate/adam7 defaults
    val bin = unhex(ihdrHex)
    val (sig, width, height) = pngHeader(bin)
    d.select(col("doc_id"), sig.as("valid_sig"),
      width.as("width"), height.as("height"))
  }

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "mm_features" -> (mmFeatures _),
    "mm_frames"   -> (mmFrames _),
    "mm_decode"   -> (mmDecode _),
    "mm_png_dims" -> (mmPngDims _),
  )

  def oracleSql: Map[String, String] = Map(
    "mm_features" ->
      """SELECT doc_id, octet_length(text::BLOB) AS byte_len, md5(text) AS payload_md5,
        |  'text/plain' AS mime, lang, source, n_chars
        |FROM documents""".stripMargin,

    "mm_frames" ->
      s"""WITH f AS (
         |  SELECT doc_id, text,
         |    unnest(range(0, (octet_length(text::BLOB) + ${FrameBytes - 1}) // $FrameBytes))::int AS frame_idx
         |  FROM documents
         |)
         |SELECT doc_id, frame_idx,
         |  md5(substr(text, frame_idx * $FrameBytes + 1, $FrameBytes)) AS frame_md5,
         |  length(substr(text, frame_idx * $FrameBytes + 1, $FrameBytes)) AS frame_len
         |FROM f""".stripMargin,

    "mm_png_dims" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    '$PngSigHex' || '0000000d' || '49484452'
         |      || lpad(lower(hex(n_chars % 1024 + 1)), 8, '0')
         |      || lpad(lower(hex(doc_id % 768 + 1)), 8, '0')
         |      || '0806000000' AS hx
         |  FROM documents
         |)
         |SELECT doc_id,
         |  (substr(hx, 1, 16) = '$PngSigHex')::int AS valid_sig,
         |  ('0x' || substr(hx, 33, 8))::bigint AS width,
         |  ('0x' || substr(hx, 41, 8))::bigint AS height
         |FROM b""".stripMargin,

    "mm_decode" ->
      """WITH d AS (
        |  SELECT doc_id, md5(text) AS h, unnest(range(0, 8))::int AS dim_idx
        |  FROM documents
        |)
        |SELECT doc_id, dim_idx,
        |  round((('0x' || substr(h, dim_idx * 4 + 1, 4))::int / 65536.0), 4) AS value
        |FROM d""".stripMargin,
  )
}
