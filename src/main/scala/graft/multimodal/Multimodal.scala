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
  * decoded pixels). MP4 video DEMUX is REAL (`demuxMp4` /
  * `mp4SampleTable`: ISO-BMFF box walk + stsz/stsc/stco sample-layout
  * resolution — every sample's exact byte offset/size without decoding
  * a frame), and MP3 metadata probing is REAL (`probeMp3`: frame-chain
  * walk). Only SAMPLE DECODE of compressed audio/video stays stubbed
  * (that genuinely needs a codec library, absent in this container) —
  * exactly where a Pandas-UDF/JNI decoder would plug in at scale,
  * consuming the fetch plan `videoFrameSamples` emits.
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
          .when(col("path").endsWith(".wav") || col("path").endsWith(".mp3"), "audio")
          .when(col("path").endsWith(".mp4"), "video")
          .when(col("path").endsWith(".html"), "html")
          .when(col("path").endsWith(".pdf"), "pdf")
          .otherwise("binary").as("modality"),
        col("content"),
        map(lit("path"), col("path"), lit("length"), col("length").cast("string")).as("meta"))

  /** Modality-dispatched text extraction (reference crawl_web.py:127-138:
    * text/html → bs4 extractor, application/pdf → PDF loader): html goes
    * through the entity-decoding tag stripper, pdf through the pure-JVM
    * content-stream extractor (F8), anything else is read as UTF-8.
    *
    * The extractor's scope boundary is a COUNTED column, not silence:
    * `extract_status` is `ok` when text was recovered, `quarantined` when
    * a non-empty payload yielded no text — for PDFs that is the
    * documented out-of-scope corpus (PdfText.scala header: CFF-only
    * embeddings, real user passwords, AES-256), the extract-or-quarantine
    * posture of the A4 reliability family. A PDF whose text came through
    * the round-12 no-ToUnicode font-program path reports
    * `no_tounicode_decoded` — recovered, but resting on the font's
    * glyph→unicode claims rather than the writer's explicit ToUnicode
    * map, so corpus health can count it separately from plain `ok`.
    * Downstream keeps a corpus-health metric
    * (`count(extract_status = 'quarantined')`) instead of mistaking
    * extractor scope for genuinely empty documents. */
  def extractText(assets: DataFrame): DataFrame = extractText(assets, None)

  /** [[extractText]] with a per-document password column (null/"" rows
    * fall back to the empty-password default): crawled corpora sometimes
    * carry known credentials per source, and threading them through
    * unlocks R2-R6 protected documents that would otherwise land in the
    * quarantine count. */
  def extractText(assets: DataFrame, passwordCol: Option[String]): DataFrame = {
    import graft.functions.{PdfText, TextFunctions}
    val pdfDetail = udf((b: Array[Byte], pw: String) => {
      val r = PdfText.extractFull(b, if (pw == null) "" else pw)
      (r.text, r.viaFontProgram, r.passwordRequired)
    })
    val pw = passwordCol.map(col).getOrElse(lit(""))
    assets.withColumn("_pdf",
        when(col("modality") === "pdf", pdfDetail(col("content"), pw)))
      .withColumn("text",
        when(col("modality") === "html", TextFunctions.htmlToTextUdf(col("content").cast("string")))
          .when(col("modality") === "pdf", col("_pdf._1"))
          .otherwise(col("content").cast("string")))
      .withColumn("extract_status",
        when(length(trim(col("text"))) > 0,
          when(col("modality") === "pdf" && col("_pdf._2"), "no_tounicode_decoded")
            .otherwise("ok"))
          // encrypted + this password can't open it: count separately so
          // the crawl team routes these to a credential lookup, not the bin
          .when(col("modality") === "pdf" && col("_pdf._3"), "password_required")
          .when(col("content").isNotNull && length(col("content")) > 0, "quarantined")
          .otherwise("empty"))
      .drop("_pdf")
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

  /** Image descriptors in the vector-store ingest shape
    * (`vec_id, embedding, label` — [[graft.streaming.EmbeddingsStream.embSchema]])
    * so the STANDING IVF index serves multimodal near-dup through the same
    * incremental path text embeddings already have: write each crawl
    * batch's descriptors as a parquet drop, `EmbeddingsStream.ivfIngest`
    * appends them to the centroid-partitioned index, and
    * `EmbeddingsStream.searchIndex` retrieves with DPP-pruned partition
    * scans — no index rebuild per crawl day. `label` 1 marks a real
    * raster descriptor (perceptual matching valid), 0 the byte-histogram
    * fallback (exact-content signature only); searchers can filter on it.
    * Descriptors are `dim`=64 to match the LSH/IVF plane arity, as in
    * [[imageNearDupPairs]]. */
  def descriptorDrop(spark: SparkSession, assets: DataFrame, dim: Int = 64): DataFrame =
    extractFeatures(spark, assets, dim).toDF()
      .select(col("asset_id").as("vec_id"), col("feature").as("embedding"),
        when(col("width") > 0 && col("height") > 0, 1).otherwise(0)
          .cast("int").as("label"))

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

  /** Frame-sampling plan for opaque binary assets (STUB: emits the byte
    * offsets a generic sampler would seek to — one per `everyNBytes` —
    * demonstrating the 1-to-N explode shape of frame extraction). For
    * real MP4 video the engine now has an actual container demuxer:
    * [[videoFrameSamples]] emits exact per-sample (offset, size) from
    * the stsz/stsc/stco tables. */
  def sampleFrameOffsets(assets: DataFrame, everyNBytes: Long = 1024L): DataFrame =
    assets
      .withColumn("n_frames",
        greatest((col("meta.length").cast("long") / everyNBytes).cast("long"), lit(1L)))
      .select(col("asset_id"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * everyNBytes)

  // ------------------------------------------------------------------
  // MP4 (ISO-BMFF) container demux — pure JVM, no codec library.
  // Demuxing is container parsing, not decoding: the box tree yields the
  // movie/track metadata and the stsz/stsc/stco sample tables yield the
  // exact (byte offset, size) of every sample, which is all a downstream
  // GPU/worker decoder needs to fetch frames without re-parsing the file.
  // SAMPLE DECODE stays out of scope (that genuinely needs a codec).
  // ------------------------------------------------------------------

  case class Mp4Track(trackType: String, codec: String, width: Int, height: Int,
                      durationMs: Long, sampleCount: Long)
  case class Mp4Meta(majorBrand: String, durationMs: Long, tracks: Seq[Mp4Track])

  private def be16(b: Array[Byte], o: Long): Int =
    ((b(o.toInt) & 0xff) << 8) | (b(o.toInt + 1) & 0xff)
  private def be32(b: Array[Byte], o: Long): Long = {
    val i = o.toInt
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  }
  private def be64(b: Array[Byte], o: Long): Long = (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Long): String =
    new String(b, o.toInt, 4, "US-ASCII")

  /** Visit each box in [start, end): f(boxType, payloadStart, payloadEnd).
    * Handles 64-bit largesize and size-0 (to-end) boxes; stops at the
    * first malformed header instead of throwing. */
  private def walkBoxes(b: Array[Byte], start: Long, end: Long)
                       (f: (String, Long, Long) => Unit): Unit = {
    var off = start
    var ok = true
    while (ok && off + 8 <= end) {
      var size = be32(b, off)
      val typ = fourcc(b, off + 4)
      var hdr = 8L
      if (size == 1L && off + 16 <= end) { size = be64(b, off + 8); hdr = 16L }
      else if (size == 0L) size = end - off
      if (size < hdr || off + size > end) ok = false
      else {
        f(typ, off + hdr, off + size)
        off += size
      }
    }
  }

  /** Parsed per-track sample layout (enough to demux every sample). */
  private case class TrackTables(trackType: String, codec: String,
                                 width: Int, height: Int, durationMs: Long,
                                 sizes: Array[Long], chunkOffsets: Array[Long],
                                 stsc: Array[(Long, Long)]) // (firstChunk, samplesPerChunk)

  private def parseTrak(b: Array[Byte], ts: Long, te: Long): Option[TrackTables] = {
    var w = 0; var h = 0
    var mdhdTs = 0L; var mdhdDur = 0L
    var handler = ""; var codec = ""
    var sizes: Array[Long] = Array.empty
    var chunkOffsets: Array[Long] = Array.empty
    var stsc: Array[(Long, Long)] = Array.empty
    walkBoxes(b, ts, te) {
      case ("tkhd", s, e) =>
        val v = b(s.toInt) & 0xff
        val base = s + (if (v == 1) 4 + 8 + 8 + 4 + 4 + 8 else 4 + 4 + 4 + 4 + 4 + 4)
        // + reserved(8) layer(2) alternate(2) volume(2) reserved(2) matrix(36)
        val wOff = base + 8 + 2 + 2 + 2 + 2 + 36
        if (wOff + 8 <= e) { // 16.16 fixed point
          w = (be32(b, wOff) >> 16).toInt
          h = (be32(b, wOff + 4) >> 16).toInt
        }
      case ("mdia", ms, me) =>
        walkBoxes(b, ms, me) {
          case ("mdhd", s, e) =>
            val v = b(s.toInt) & 0xff
            if (v == 1 && s + 32 <= e) { mdhdTs = be32(b, s + 20); mdhdDur = be64(b, s + 24) }
            else if (s + 24 <= e) { mdhdTs = be32(b, s + 12); mdhdDur = be32(b, s + 16) }
          case ("hdlr", s, e) =>
            if (s + 12 <= e) handler = fourcc(b, s + 8)
          case ("minf", fs, fe) =>
            walkBoxes(b, fs, fe) {
              case ("stbl", ss, se) =>
                walkBoxes(b, ss, se) {
                  case ("stsd", s, e) =>
                    // entry_count(4) then sample entries [size(4) format(4cc) ...]
                    if (s + 16 <= e && be32(b, s + 4) >= 1) codec = fourcc(b, s + 12)
                  case ("stsz", s, e) =>
                    if (s + 12 <= e) {
                      val uniform = be32(b, s + 4)
                      val n = be32(b, s + 8)
                      // the uniform branch has no per-entry data to bound n
                      // against the box, so a crafted sample_count could
                      // demand a multi-GB allocation; cap it (16M samples
                      // is hours of video) and treat beyond as malformed —
                      // an OutOfMemoryError would escape the Exception
                      // catch and kill the executor
                      if (uniform != 0L) {
                        if (n >= 0L && n <= (1L << 24))
                          sizes = Array.fill(n.toInt)(uniform)
                      } else if (s + 12 + 4 * n <= e)
                        sizes = Array.tabulate(n.toInt)(i => be32(b, s + 12 + 4L * i))
                    }
                  case ("stsc", s, e) =>
                    if (s + 8 <= e) {
                      val n = be32(b, s + 4)
                      if (s + 8 + 12 * n <= e)
                        stsc = Array.tabulate(n.toInt) { i =>
                          (be32(b, s + 8 + 12L * i), be32(b, s + 12 + 12L * i))
                        }
                    }
                  case ("stco", s, e) =>
                    if (s + 8 <= e) {
                      val n = be32(b, s + 4)
                      if (s + 8 + 4 * n <= e)
                        chunkOffsets = Array.tabulate(n.toInt)(i => be32(b, s + 8 + 4L * i))
                    }
                  case ("co64", s, e) =>
                    if (s + 8 <= e) {
                      val n = be32(b, s + 4)
                      if (s + 8 + 8 * n <= e)
                        chunkOffsets = Array.tabulate(n.toInt)(i => be64(b, s + 8 + 8L * i))
                    }
                  case _ =>
                }
              case _ =>
            }
          case _ =>
        }
      case _ =>
    }
    if (handler.isEmpty && codec.isEmpty) None
    else Some(TrackTables(
      trackType = handler match {
        case "vide" => "video"; case "soun" => "audio"; case other => other
      },
      codec = codec, width = w, height = h,
      durationMs = if (mdhdTs > 0) mdhdDur * 1000L / mdhdTs else 0L,
      sizes = sizes, chunkOffsets = chunkOffsets, stsc = stsc))
  }

  private def parseMp4(bytes: Array[Byte]): Option[(String, Long, Seq[TrackTables])] = {
    if (bytes == null || bytes.length < 16) return None
    try {
      var brand = ""
      var mvhdTs = 0L; var mvhdDur = 0L
      val tracks = scala.collection.mutable.ArrayBuffer.empty[TrackTables]
      walkBoxes(bytes, 0L, bytes.length.toLong) {
        case ("ftyp", s, e) => if (s + 4 <= e) brand = fourcc(bytes, s)
        case ("moov", ms, me) =>
          walkBoxes(bytes, ms, me) {
            case ("mvhd", s, e) =>
              val v = bytes(s.toInt) & 0xff
              if (v == 1 && s + 32 <= e) { mvhdTs = be32(bytes, s + 20); mvhdDur = be64(bytes, s + 24) }
              else if (s + 24 <= e) { mvhdTs = be32(bytes, s + 12); mvhdDur = be32(bytes, s + 16) }
            case ("trak", ts, te) => parseTrak(bytes, ts, te).foreach(tracks += _)
            case _ =>
          }
        case _ =>
      }
      if (brand.isEmpty || mvhdTs <= 0L) None
      else Some((brand, mvhdDur * 1000L / mvhdTs, tracks.toSeq))
    } catch { case _: Exception => None } // malformed boxes must yield None, never throw
  }

  /** MP4 movie + per-track metadata (brand, durations, codec fourccs,
    * video dimensions, sample counts) from the container alone. None for
    * anything that is not a well-formed ISO-BMFF file. */
  def demuxMp4(bytes: Array[Byte]): Option[Mp4Meta] =
    parseMp4(bytes).map { case (brand, durMs, tracks) =>
      Mp4Meta(brand, durMs,
        tracks.map(t => Mp4Track(t.trackType, t.codec, t.width, t.height,
          t.durationMs, t.sizes.length.toLong)))
    }

  /** Exact demux of the sample layout: (trackIdx, sampleIdx, byteOffset,
    * byteSize) for every sample, reconstructed from stsz (sizes) + stsc
    * (chunk → samples-per-chunk runs) + stco/co64 (chunk offsets) — the
    * standard ISO-BMFF resolution every demuxer performs. Offsets are
    * absolute file positions; a frame-sampling pipeline can fetch any
    * subset without touching the rest of the file. */
  def mp4SampleTable(bytes: Array[Byte]): Seq[(Int, Long, Long, Long)] =
    parseMp4(bytes).map { case (_, _, tracks) =>
      tracks.zipWithIndex.flatMap { case (t, ti) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
        var sample = 0
        var ci = 0
        while (ci < t.chunkOffsets.length && sample < t.sizes.length) {
          val chunkNo = ci + 1L
          // stsc runs: the entry with the greatest firstChunk <= this chunk
          val spc = t.stsc.foldLeft(0L) { case (acc, (fc, n)) =>
            if (fc <= chunkNo) n else acc
          }
          var within = 0L
          var s = 0L
          while (s < spc && sample < t.sizes.length) {
            out += ((ti, sample.toLong, t.chunkOffsets(ci) + within, t.sizes(sample)))
            within += t.sizes(sample)
            sample += 1
            s += 1
          }
          ci += 1
        }
        out
      }
    }.getOrElse(Seq.empty)

  // ------------------------------------------------------------------
  // MP3 frame-header probe — pure JVM, no decoder. Walks the contiguous
  // frame chain (after any ID3v2 tag), validating each 4-byte header and
  // stepping by the computed frame length; yields frame count, duration,
  // sample rate and mean bitrate — the filter/dedup metadata a pipeline
  // wants BEFORE paying for decode. Layer III (the "mp3" in mp3) only.
  // ------------------------------------------------------------------

  case class Mp3Meta(mpegVersion: String, frames: Int, sampleRate: Int,
                     avgBitrateKbps: Int, durationMs: Long)

  private val Mp3BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3RateV1 = Array(44100, 48000, 32000)

  def probeMp3(bytes: Array[Byte]): Option[Mp3Meta] = {
    if (bytes == null || bytes.length < 4) return None
    var off = 0L
    // ID3v2 prefix: "ID3" vv flags size(4 × 7-bit syncsafe); the size
    // excludes the 10-byte header AND the optional 10-byte footer
    // (ID3v2.4 flag bit 4), so a footered tag needs an extra skip or the
    // walk lands on the "3DI" footer and reports a valid file as None
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7fL) << 21) | ((bytes(7) & 0x7fL) << 14) |
        ((bytes(8) & 0x7fL) << 7) | (bytes(9) & 0x7fL)
      off = 10L + sz + (if ((bytes(5) & 0x10) != 0) 10L else 0L)
    }
    var frames = 0
    var totalKbps = 0L
    var sampleRate = 0
    var version = ""
    var samplesTotal = 0L
    var ok = true
    while (ok && off + 4 <= bytes.length) {
      val o = off.toInt
      val sync = (bytes(o) & 0xff) == 0xff && (bytes(o + 1) & 0xe0) == 0xe0
      if (!sync) ok = false
      else {
        val verBits = (bytes(o + 1) >> 3) & 0x3   // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        val layerBits = (bytes(o + 1) >> 1) & 0x3 // 1 = Layer III
        val brIdx = (bytes(o + 2) >> 4) & 0xf
        val srIdx = (bytes(o + 2) >> 2) & 0x3
        val padding = (bytes(o + 2) >> 1) & 0x1
        if (layerBits != 1 || verBits == 1 || brIdx == 0 || brIdx == 15 || srIdx == 3) ok = false
        else {
          val v1 = verBits == 3
          val kbps = (if (v1) Mp3BitrateV1L3 else Mp3BitrateV2L3)(brIdx)
          val sr = Mp3RateV1(srIdx) / (if (v1) 1 else if (verBits == 2) 2 else 4)
          val frameLen = (if (v1) 144 else 72) * kbps * 1000 / sr + padding
          if (off + frameLen > bytes.length) ok = false // partial trailing frame
          else {
            frames += 1
            totalKbps += kbps
            samplesTotal += (if (v1) 1152 else 576)
            sampleRate = sr
            version = if (v1) "MPEG1" else if (verBits == 2) "MPEG2" else "MPEG2.5"
            off += frameLen
          }
        }
      }
    }
    if (frames == 0) None
    else Some(Mp3Meta(version, frames, sampleRate, (totalKbps / frames).toInt,
      samplesTotal * 1000L / sampleRate))
  }

  case class AdtsMeta(frames: Int, sampleRate: Int, channels: Int,
                      profile: String, durationMs: Long)

  private val AdtsRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)
  private val AdtsProfiles = Array("Main", "LC", "SSR", "LTP")

  /** AAC ADTS transport probe (the "aac" of mp3/aac): each ADTS header
    * carries an EXPLICIT 13-bit frame length, so the chain walk needs no
    * bitrate table — validate the 12-bit syncword + fields, step by the
    * declared length, accumulate 1024 samples per frame. None for
    * anything that is not a contiguous ADTS chain. */
  def probeAdts(bytes: Array[Byte]): Option[AdtsMeta] = {
    if (bytes == null || bytes.length < 7) return None
    var off = 0L
    var frames = 0
    var sampleRate = 0; var channels = 0; var profile = ""
    var ok = true
    while (ok && off + 7 <= bytes.length) {
      val o = off.toInt
      val sync = (bytes(o) & 0xff) == 0xff && (bytes(o + 1) & 0xf6) == 0xf0
      if (!sync) ok = false
      else {
        val profIdx = (bytes(o + 2) >> 6) & 0x3
        val srIdx = (bytes(o + 2) >> 2) & 0xf
        val ch = ((bytes(o + 2) & 0x1) << 2) | ((bytes(o + 3) >> 6) & 0x3)
        val frameLen = ((bytes(o + 3) & 0x3) << 11) |
          ((bytes(o + 4) & 0xff) << 3) | ((bytes(o + 5) >> 5) & 0x7)
        if (srIdx >= AdtsRates.length || ch == 0 || frameLen < 7 ||
            off + frameLen > bytes.length) ok = false
        else {
          frames += 1
          sampleRate = AdtsRates(srIdx)
          channels = ch
          profile = AdtsProfiles(profIdx)
          off += frameLen
        }
      }
    }
    if (frames == 0 || sampleRate == 0) None
    else Some(AdtsMeta(frames, sampleRate, channels, profile,
      frames * 1024L * 1000L / sampleRate))
  }

  /** Distributed MP4 metadata demux: one row per asset with the movie
    * brand/duration and the FIRST video track's codec/dimensions/sample
    * count (null metadata for assets that are not well-formed MP4). */
  def demuxVideoAssets(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("content")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m = demuxMp4(bytes)
        val v = m.flatMap(_.tracks.find(_.trackType == "video"))
        (id, m.map(_.majorBrand), m.map(_.durationMs), m.map(_.tracks.size),
          v.map(_.codec), v.map(_.width), v.map(_.height), v.map(_.sampleCount))
      }
      .toDF("asset_id", "major_brand", "duration_ms", "n_tracks",
        "video_codec", "width", "height", "n_samples")
  }

  /** Distributed frame-sampling demux: every `everyN`-th sample of each
    * MP4 asset as (asset_id, track_idx, sample_idx, byte_offset, n_bytes)
    * — the exact fetch plan a decode stage (Pandas UDF / GPU worker)
    * consumes, produced without decoding a single frame. Non-MP4 assets
    * contribute no rows. */
  def videoFrameSamples(spark: SparkSession, assets: DataFrame,
                        everyN: Int = 1): DataFrame = {
    import spark.implicits._
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    assets.select(col("asset_id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        mp4SampleTable(bytes).iterator
          .filter(_._2 % everyN == 0)
          .map { case (ti, si, o, n) => (id, ti, si, o, n) }
      }
      .toDF("asset_id", "track_idx", "sample_idx", "byte_offset", "n_bytes")
  }

  /** Motion-JPEG sample-entry fourccs: every video sample is a complete
    * JPEG image, so the JDK's own ImageIO decodes REAL frames with no
    * codec library. */
  private val MjpegCodecs = Set("jpeg", "mjpa", "mjpb", "MJPG", "dmb1")

  /** REAL video frame decode for MJPEG-in-MP4: slice every `everyN`-th
    * video sample at its exact demuxed byte range ([[mp4SampleTable]]),
    * decode the JPEG with ImageIO, and emit the same mean-pooled raster
    * descriptor still images get ([[descriptorFromRaster]]) — one row
    * per decoded frame, ANN-ready for the near-dup / standing-index
    * paths. Codecs the JDK cannot decode (avc1/hvc1/…) contribute no
    * rows here; for those, [[videoFrameSamples]] remains the exact fetch
    * plan handed to an external decode stage. This closes the
    * "demux-only" scope for the one compressed-video family a pure-JVM
    * engine can decode end-to-end. */
  def decodeVideoFrames(spark: SparkSession, assets: DataFrame,
                        everyN: Int = 1, dim: Int = 48): DataFrame = {
    import spark.implicits._
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    assets.select(col("asset_id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val codecs = demuxMp4(bytes).map(_.tracks.map(_.codec)).getOrElse(Seq.empty)
        mp4SampleTable(bytes).iterator
          .filter { case (ti, si, off, len) =>
            ti < codecs.length && MjpegCodecs.contains(codecs(ti)) &&
              si % everyN == 0 && off + len <= bytes.length && len > 0 }
          .flatMap { case (ti, si, off, len) =>
            val sample = java.util.Arrays.copyOfRange(
              bytes, off.toInt, (off + len).toInt)
            val (_, w, h, raster) = decodeImageFull(sample)
            raster.flatMap(descriptorFromRaster(_, dim))
              .map(f => (id, ti, si, w, h, f))
          }
      }
      .toDF("asset_id", "track_idx", "sample_idx", "width", "height", "feature")
  }

  /** Per-asset video-codec boundary as a COUNTED column (the
    * `extract_status` posture applied to video): which assets
    * [[decodeVideoFrames]] decodes in-engine vs which it hands off.
    *  - `decoded`: ≥1 video track in the MJPEG family — frames decode
    *    here, no codec library;
    *  - `external_decoder_handoff`: video tracks exist but none are
    *    JDK-decodable (avc1/hvc1/…) — [[videoFrameSamples]] is the
    *    exact per-sample fetch plan handed to an external decode stage;
    *  - `no_video_track`: well-formed MP4, audio/other tracks only;
    *  - `not_mp4`: demux failed (not ISO-BMFF or malformed boxes).
    * `video_codecs` carries the fourccs so the handoff count is
    * attributable per codec downstream. */
  def videoCodecStatus(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("content")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        demuxMp4(bytes) match {
          case None => (id, None: Option[String], "not_mp4")
          case Some(meta) =>
            val vts = meta.tracks.filter(_.trackType == "video")
            if (vts.isEmpty) (id, None, "no_video_track")
            else {
              val codecs = Some(vts.map(_.codec).distinct.sorted.mkString(","))
              if (vts.exists(t => MjpegCodecs.contains(t.codec))) (id, codecs, "decoded")
              else (id, codecs, "external_decoder_handoff")
            }
        }
      }
      .toDF("asset_id", "video_codecs", "codec_status")
  }

  /** Distributed compressed-audio metadata probe (frame-chain walks, no
    * decode): codec-dispatched MP3 then AAC/ADTS; null metadata for
    * assets that are neither. `variant` is the MPEG version for mp3 and
    * the AAC profile for aac; bitrate is mp3-only (ADTS declares frame
    * lengths, not bitrate). */
  def probeAudioAssets(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("asset_id"), col("content")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m3 = probeMp3(bytes)
        val aac = if (m3.isEmpty) probeAdts(bytes) else None
        (id,
          m3.map(_ => "mp3").orElse(aac.map(_ => "aac")),
          m3.map(_.mpegVersion).orElse(aac.map(_.profile)),
          m3.map(_.frames).orElse(aac.map(_.frames)),
          m3.map(_.sampleRate).orElse(aac.map(_.sampleRate)),
          m3.map(_.avgBitrateKbps),
          m3.map(_.durationMs).orElse(aac.map(_.durationMs)))
      }
      .toDF("asset_id", "codec", "variant", "n_frames", "sample_rate",
        "avg_bitrate_kbps", "duration_ms")
  }
}
