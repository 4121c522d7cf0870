package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (training-data op; reference evidence: the
  * raw HTML/image archive at minio/data/bronze/web/04-01-2025/{html,image}
  * — SURVEY.md §1.2 "historical surfaces").
  *
  * Images/audio/video are opaque `binary` columns + typed metadata. The
  * Spark-side plumbing — schema, partition-wise batch iteration, UDF
  * signatures — is real and tested. Image decode is REAL (`decodeImage`
  * uses the JDK's own `javax.imageio` codecs, headless); the feature
  * vector is still a deterministic content-hash stand-in for a vision
  * encoder, and audio/video demuxing stays stubbed (no codec libraries
  * in this container) — exactly where a Pandas-UDF/JNI decoder would
  * plug in at scale.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video|html
    StructField("content", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Long,
                           format: String, width: Int, height: Int,
                           feature: Array[Float])

  /** Load a directory of raw files as assets (S14: binaryFile source —
    * splittable listing, content read lazily per task). */
  def readAssets(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        xxhash64(col("path")).as("asset_id"),
        when(col("path").endsWith(".png") || col("path").endsWith(".jpg"), "image")
          .when(col("path").endsWith(".html"), "html")
          .when(col("path").endsWith(".pdf"), "pdf")
          .otherwise("binary").as("modality"),
        col("content"),
        map(lit("path"), col("path"), lit("length"), col("length").cast("string")).as("meta"))

  /** Modality-dispatched text extraction (reference crawl_web.py:127-138:
    * text/html → bs4 extractor, application/pdf → PDF loader): html goes
    * through the entity-decoding tag stripper, pdf through the pure-JVM
    * content-stream extractor (F8), anything else is read as UTF-8. */
  def extractText(assets: DataFrame): DataFrame = {
    import graft.functions.{PdfText, TextFunctions}
    assets.withColumn("text",
      when(col("modality") === "html", TextFunctions.htmlToTextUdf(col("content").cast("string")))
        .when(col("modality") === "pdf", PdfText.pdfToTextUdf(col("content")))
        .otherwise(col("content").cast("string")))
  }

  /** Real image decode via the JDK's own codecs (`javax.imageio`,
    * headless — PNG/JPEG/GIF/BMP/TIFF ship with the JDK): the matching
    * reader supplies the format name and header dimensions WITHOUT a full
    * pixel decode (`getWidth(0)` parses only the header), so this stays
    * cheap enough for the per-batch executor path. Returns
    * ("empty",0,0) for null/blank bytes, ("unknown",0,0) when no
    * installed reader claims the bytes, and (fmt,0,0) for bytes a reader
    * claims but whose header is truncated/corrupt. */
  def decodeImage(bytes: Array[Byte]): (String, Int, Int) = {
    if (bytes == null || bytes.isEmpty) return ("empty", 0, 0)
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return ("unknown", 0, 0)
      val r = readers.next()
      try {
        r.setInput(iis, true, true)
        try (r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0))
        catch { case _: Exception => (r.getFormatName.toLowerCase, 0, 0) }
      } finally r.dispose()
    } finally iis.close()
  }

  /** Partition-wise feature extraction: iterate assets in bounded batches
    * (the reference's batch-100 pattern, seed_milvus.py:78-86, done
    * executor-side), decode, and emit a fixed-dim feature vector (hash of
    * content bytes — the stub stand-in for a vision/audio encoder). */
  def extractFeatures(spark: SparkSession, assets: DataFrame, dim: Int = 16,
                      batchSize: Int = 100): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would amortize model/codec setup per batch here
          batch.iterator.map { case (id, modality, bytes) =>
            val (fmt, w, h) = decodeImage(bytes)
            val feat = new Array[Float](dim)
            if (bytes != null) {
              var i = 0
              while (i < bytes.length) {
                feat(math.floorMod(java.lang.Byte.hashCode(bytes(i)) * 31 + i, dim)) += 1f
                i += 1
              }
            }
            AssetFeatures(id, modality, if (bytes == null) 0L else bytes.length.toLong,
              fmt, w, h, feat)
          }
        }
      }
  }

  /** Frame-sampling plan for video assets (STUB: emits the byte offsets a
    * real demuxer would seek to — one per `everyNBytes` — demonstrating
    * the 1-to-N explode shape of frame extraction). */
  def sampleFrameOffsets(assets: DataFrame, everyNBytes: Long = 1024L): DataFrame =
    assets
      .withColumn("n_frames",
        greatest((col("meta.length").cast("long") / everyNBytes).cast("long"), lit(1L)))
      .select(col("asset_id"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * everyNBytes)
}
