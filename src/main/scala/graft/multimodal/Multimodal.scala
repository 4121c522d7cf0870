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
  * uses the JDK's own `javax.imageio` codecs, headless), and WAV/RIFF
  * audio demux is REAL (`decodeWav`/`wavRmsWindows` parse the container
  * and compute PCM16 energy features with no codec library), and the
  * image feature vector is a REAL mean-pooled raster descriptor
  * (`imageDescriptor` — resolution-invariant color layout over the
  * decoded pixels). Compressed audio (mp3/aac) + video demuxing stay
  * stubbed (no codec libraries in this container) — exactly where a
  * Pandas-UDF/JNI decoder would plug in at scale.
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
          .when(col("path").endsWith(".wav"), "audio")
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

  /** REAL image resize via the JDK's own raster pipeline (headless
    * `BufferedImage` + bilinear `Graphics2D` draw, PNG re-encode) — the
    * preprocessing step a vision encoder front-end needs, runnable
    * executor-side with no native codec. Transparency is FLATTENED ONTO
    * WHITE (the conventional preprocessing matte; the RGB output has no
    * alpha channel). The decode reads through a memory-cached image
    * stream — the default ImageIO cache would spill each in-memory byte
    * array to a temp FILE, per asset, on the executor hot path. Returns
    * None when the bytes don't decode, the target is degenerate, or the
    * PNG encode fails. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty || w <= 0 || h <= 0) return None
    val src =
      try javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => null }
    if (src == null) return None
    val dst = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, w, h)
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    // guarded like the decode path: a missing/failing PNG writer degrades
    // to None, never an executor-killing exception or an empty payload
    val wrote =
      try javax.imageio.ImageIO.write(dst, "png", out)
      catch { case _: Exception => false }
    if (wrote && out.size() > 0) Some(out.toByteArray) else None
  }

  /** Distributed resize over an asset frame: (asset_id, resized PNG or
    * NULL) — the batch shape of an image-preprocessing stage. */
  def resizeAssets(spark: SparkSession, assets: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("content")).as[(Long, Array[Byte])]
      .map { case (id, bytes) => (id, resizeImage(bytes, w, h).orNull) }
      .toDF("asset_id", "resized")
  }

  /** REAL image feature vector: a mean-pooled G×G×RGB descriptor over
    * the decoded raster — the classic color-layout signature a vision
    * encoder front-end computes. The raster is partitioned into a G×G
    * grid (G = ⌊√(dim/3)⌋, so dim=48 → 4×4 cells) by integer index
    * scaling (cell = y·G/h — every pixel lands in exactly one cell at
    * ANY resolution, which is what makes the descriptor resolution-
    * invariant); each cell emits its mean R,G,B in [0,1]. Transparency
    * is flattened onto white, the same matte as [[resizeImage]], so a
    * decode→resize→re-encode round trip maps to a near-identical
    * descriptor (cosine ≈ 1, asserted in MultimodalSpec) while distinct
    * content diverges. Returns None when the bytes don't decode. */
  def imageDescriptor(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    if (bytes == null || bytes.isEmpty || dim < 3) return None
    val img =
      try javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => null }
    descriptorFromRaster(img, dim)
  }

  /** The descriptor core on an already-decoded raster, so callers that
    * also need format/dimension metadata (extractFeatures) decode the
    * payload exactly once. */
  private[graft] def descriptorFromRaster(img: java.awt.image.BufferedImage,
                                          dim: Int): Option[Array[Float]] = {
    if (img == null || dim < 3 || img.getWidth <= 0 || img.getHeight <= 0) return None
    val g = math.max(1, math.sqrt(dim / 3.0).toInt)
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](g * g * 3)
    val counts = new Array[Long](g * g)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      val cy = y * g / h
      var x = 0
      while (x < w) {
        val cx = x * g / w
        val argb = row(x)
        val a = ((argb >>> 24) & 0xff) / 255.0
        val matte = 1.0 - a // white matte contribution
        val ci = (cy * g + cx) * 3
        sums(ci) += (((argb >> 16) & 0xff) / 255.0) * a + matte
        sums(ci + 1) += (((argb >> 8) & 0xff) / 255.0) * a + matte
        sums(ci + 2) += ((argb & 0xff) / 255.0) * a + matte
        counts(cy * g + cx) += 1
        x += 1
      }
      y += 1
    }
    val feat = new Array[Float](dim)
    var c = 0
    while (c < g * g) {
      if (counts(c) > 0) {
        feat(c * 3) = (sums(c * 3) / counts(c)).toFloat
        feat(c * 3 + 1) = (sums(c * 3 + 1) / counts(c)).toFloat
        feat(c * 3 + 2) = (sums(c * 3 + 2) / counts(c)).toFloat
      }
      c += 1
    }
    Some(feat)
  }

  /** One-decode metadata+raster probe for the batch feature path: the
    * same memory-cached stream and matching reader supply the format
    * name, header dimensions, AND the decoded raster, so extractFeatures
    * runs ImageIO's pixel decode once per payload instead of once for
    * metadata and again for the descriptor. Failure ladder mirrors
    * [[decodeImage]]: ("empty",0,0,None) / ("unknown",0,0,None) /
    * (fmt,0,0,None) for claimed-but-corrupt headers; (fmt,w,h,None) when
    * the header parses but the pixel decode throws. */
  private[graft] def decodeImageFull(bytes: Array[Byte])
      : (String, Int, Int, Option[java.awt.image.BufferedImage]) = {
    if (bytes == null || bytes.isEmpty) return ("empty", 0, 0, None)
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return ("unknown", 0, 0, None)
      val r = readers.next()
      try {
        r.setInput(iis, true, true)
        val fmt = r.getFormatName.toLowerCase
        try {
          val (w, h) = (r.getWidth(0), r.getHeight(0))
          val img = try Option(r.read(0)) catch { case _: Exception => None }
          (fmt, w, h, img)
        } catch { case _: Exception => (fmt, 0, 0, None) }
      } finally r.dispose()
    } finally iis.close()
  }

  /** Partition-wise feature extraction: iterate assets in bounded batches
    * (the reference's batch-100 pattern, seed_milvus.py:78-86, done
    * executor-side) and emit a fixed-dim feature vector. Images get the
    * REAL mean-pooled raster descriptor ([[descriptorFromRaster]], off a
    * single [[decodeImageFull]] decode); payloads that don't decode as a
    * raster fall back to a deterministic byte-histogram content signature
    * (exact-content matching only — a mp3/aac/video encoder would replace
    * it, no codec libs here). */
  def extractFeatures(spark: SparkSession, assets: DataFrame, dim: Int = 48,
                      batchSize: Int = 100): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would amortize model/codec setup per batch here
          batch.iterator.map { case (id, modality, bytes) =>
            val (fmt, w, h, raster) = decodeImageFull(bytes)
            val feat = raster.flatMap(descriptorFromRaster(_, dim)).getOrElse {
              val f = new Array[Float](dim)
              if (bytes != null) {
                var i = 0
                while (i < bytes.length) {
                  f(math.floorMod(java.lang.Byte.hashCode(bytes(i)) * 31 + i, dim)) += 1f
                  i += 1
                }
              }
              f
            }
            AssetFeatures(id, modality, if (bytes == null) 0L else bytes.length.toLong,
              fmt, w, h, feat)
          }
        }
      }
  }

  /** Image near-duplicate pairs over the SAME production ANN path as
    * text/embedding near-dup (q40): mean-pooled raster descriptors
    * ([[extractFeatures]], one decode per asset) feed the self-sizing
    * multiprobe-LSH candidate join + exact cosine confirm
    * (`VectorOps.lshNearDupPairs` with `autoBits(n)` width). The
    * reference archives raw crawled images precisely so they can be
    * dedup'd (capability S14/A8); this runs that dedup distributed,
    * with candidate cost O(Σ bucket²) instead of O(n²) image pairs.
    *
    * `dim` defaults to 64 to match the LSH plane arity — the 4×4×RGB
    * descriptor fills 48 components and zero-pads the rest, which
    * changes no cosine (dot and norms are unaffected by zero dims).
    * Only assets whose raster header decodes participate (the
    * byte-histogram fallback of extractFeatures is an exact-content
    * signature, not a perceptual one). Resized / re-encoded copies land
    * above the default 0.98 threshold, distinct content below it
    * (MultimodalSpec pins both, through this exact path). */
  def imageNearDupPairs(spark: SparkSession, assets: DataFrame,
                        thresh: Double = 0.98, dim: Int = 64): DataFrame = {
    val feats = extractFeatures(spark, assets, dim)
      .filter(f => f.width > 0 && f.height > 0)
      .toDF()
      .select(col("asset_id").as("vec_id"), col("feature").as("embedding"))
    import graft.queries.VectorOps
    VectorOps.lshNearDupPairs(
        feats, VectorOps.LshTables, VectorOps.autoBits(feats.count()), thresh)
      .select(col("id_a").as("asset_a"), col("id_b").as("asset_b"), col("cosine"))
  }

  case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                     nFrames: Long, durationMs: Long)

  /** REAL audio header demux for WAV/RIFF PCM — a container format simple
    * enough to parse without codec libraries (unlike mp3/aac, which stay
    * stubbed). Walks the RIFF chunk list (chunks are not guaranteed to be
    * fmt-then-data; LIST/INFO chunks may intervene), reads the `fmt `
    * parameters, and sizes frames from the `data` chunk. Returns None for
    * bytes that are not a well-formed RIFF/WAVE header. */
  def decodeWav(bytes: Array[Byte]): Option[WavMeta] = {
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes == null || bytes.length < 44) return None
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // the offset walks in LONG: near-2GB arrays with a chunk size close
    // to the buffer length would overflow an Int offset negative and
    // index out of bounds — the never-throw contract forbids that
    var off = 12L
    var rate = 0; var ch = 0; var bps = 0; var dataLen = -1L
    while (off + 8 <= bytes.length && (rate == 0 || dataLen < 0)) {
      val o = off.toInt
      val id = tag(o); val sz = le32(o + 4)
      if (id == "fmt " && off + 24 <= bytes.length) {
        ch = le16(o + 10); rate = le32(o + 12).toInt; bps = le16(o + 22)
      } else if (id == "data") {
        // data bytes may be truncated in a partial fetch; frame count uses
        // the bytes actually present, not the declared size
        dataLen = math.min(sz, bytes.length - off - 8)
      }
      // chunks are 2-byte aligned; Long arithmetic cannot wrap (sz < 2^32)
      off += 8L + sz + (sz & 1L)
    }
    if (rate <= 0 || ch <= 0 || bps <= 0 || dataLen < 0) None
    else {
      val frameBytes = ch * (bps / 8)
      if (frameBytes <= 0) None
      else {
        val n = dataLen / frameBytes
        Some(WavMeta(rate, ch, bps, n, n * 1000L / rate))
      }
    }
  }

  /** PCM16 feature extraction: mono-mixed RMS energy per fixed window of
    * frames — the real batch shape of an audio encoder front-end (energy/
    * VAD features), computed executor-side from the raw bytes. Empty for
    * non-PCM16 or unparseable input. */
  def wavRmsWindows(bytes: Array[Byte], windowFrames: Int = 1024): Array[Float] =
    decodeWav(bytes) match {
      case Some(m) if m.bitsPerSample == 16 && m.nFrames > 0 =>
        // locate the data chunk again (cheap header walk)
        def le32(o: Int): Long =
          (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
            ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
        // Long offsets for the same overflow reason as decodeWav
        var off = 12L; var dataOff = -1
        while (off + 8 <= bytes.length && dataOff < 0) {
          val o = off.toInt
          val id = new String(bytes, o, 4, "US-ASCII"); val sz = le32(o + 4)
          if (id == "data") dataOff = o + 8
          else off += 8L + sz + (sz & 1L)
        }
        if (dataOff < 0) return Array.empty
        val frameBytes = m.channels * 2
        val out = Array.newBuilder[Float]
        var f = 0L
        while (f < m.nFrames) {
          val end = math.min(f + windowFrames, m.nFrames)
          var acc = 0.0; var i = f
          while (i < end) {
            var c = 0; var mix = 0.0
            while (c < m.channels) {
              val o = dataOff + (i * frameBytes).toInt + c * 2
              val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort
              mix += s / 32768.0; c += 1
            }
            mix /= m.channels
            acc += mix * mix; i += 1
          }
          out += math.sqrt(acc / (end - f)).toFloat
          f = end
        }
        out.result()
      case _ => Array.empty
    }

  /** Audio features over an asset frame: WAV headers demuxed for real,
    * RMS-energy windows from the PCM samples. Columns are NULL/empty for
    * non-WAV content (same dispatch posture as [[extractText]]). */
  def extractAudioFeatures(spark: SparkSession, assets: DataFrame,
                           windowFrames: Int = 1024): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("content")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val meta = decodeWav(bytes)
        (id, meta.map(_.sampleRate), meta.map(_.channels), meta.map(_.bitsPerSample),
          meta.map(_.nFrames), meta.map(_.durationMs), wavRmsWindows(bytes, windowFrames))
      }
      .toDF("asset_id", "sample_rate", "channels", "bits_per_sample",
        "n_frames", "duration_ms", "rms_windows")
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
