package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side shape is real (schema, partitioning, batch iteration);
  * the codec itself is a clearly-marked STUB — the container has no
  * image/audio libraries, so `decodeStub` derives deterministic fake
  * features from the bytes. A production deployment swaps `decodeStub`'s
  * body for the real decoder without touching the plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
    )), nullable = false),
  ))

  /** Synthesize a deterministic binary payload + metadata from the documents
    * table (stands in for reading real image bytes from object storage).
    */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      to_binary(md5(col(textCol)), lit("hex")).as("media"),
      struct(
        lit("fake/rgb8").as("format"),
        (lit(64) + pmod(length(col(textCol)), lit(512))).cast("int").as("width"),
        (lit(64) + pmod(col(idCol) * 7, lit(512))).cast("int").as("height"),
      ).as("meta"))

  /** Batch "decode + feature-extract": iterates each partition once (the
    * batch shape a vectorized decode needs), emitting per-item features.
    * STUB: features are deterministic functions of the bytes; a real
    * implementation would decode pixels here.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("byte_len", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_byte", DoubleType, nullable = false),
    ))
    val rdd = media.select("doc_id", "media", "meta.width", "meta.height")
      .filter(col("doc_id").isNotNull) // unkeyable row: nothing to attach features to
      .rdd.mapPartitions { it =>
      // one pass per partition == one decode batch
      it.map { r =>
        // schema claims media non-null, but a null payload (e.g. upstream
        // md5(null)) must yield empty features, not an executor NPE
        val bytes = Option(r.getAs[Array[Byte]]("media")).getOrElse(Array.emptyByteArray)
        // STUB decode: a real codec call goes here (e.g. JPEG -> pixels).
        val mean = if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
        Row(r.getAs[Long]("doc_id"), bytes.length, r.getAs[Int]("width"), r.getAs[Int]("height"),
          math.rint(mean * 10000) / 10000)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** "Resize" plumbing: metadata-only transform scaling width/height.
    * `round`, not `floor`: floor on the double ratio can land the longest
    * side at maxSide−1 (e.g. 300·(100/300) = 99.999… → 99); rounding puts
    * it at exactly maxSide.
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame =
    media
      .withColumn("scale",
        when(greatest(col("meta.width"), col("meta.height")) > maxSide,
          lit(maxSide).cast("double") / greatest(col("meta.width"), col("meta.height")))
        .otherwise(lit(1.0d)))
      .withColumn("meta", struct(
        col("meta.format").as("format"),
        round(col("meta.width") * col("scale")).cast("int").as("width"),
        round(col("meta.height") * col("scale")).cast("int").as("height")))
      .drop("scale")

  /** Frame-sampling plumbing for "video" payloads: every `stride`-th
    * fixed-size byte window becomes one frame row. Slices the BINARY payload
    * (byte offsets), then base64-encodes each frame for a portable output.
    *
    * Frame `i` covers bytes `[i·frameBytes·stride, +frameBytes)`; the count
    * is `floor((len − frameBytes) / (frameBytes·stride)) + 1` — every FULLY
    * in-bounds window, including the tail one the old `len / (fb·stride)`
    * formula dropped. Payloads shorter than one frame emit zero rows (not a
    * phantom empty frame).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val len = length(col("media"))
    val n = when(len >= frameBytes,
      floor((len - frameBytes) / (frameBytes * stride)).cast("int") + 1).otherwise(lit(0))
    media.select(col("doc_id"),
      posexplode(
        when(n > 0, transform(
          sequence(lit(0), n - 1),
          i => base64(col("media").substr(i * lit(frameBytes * stride) + lit(1), lit(frameBytes)))))
        .otherwise(array())))
      .withColumnRenamed("pos", "frame_no").withColumnRenamed("col", "frame")
  }
}
