package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Multimodal plumbing: binaryFile ingest, real ImageIO decode,
  * partition-wise feature extraction, frame-offset explode. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** REAL encoded image bytes (deterministic pixels) via the JDK's own
    * encoders — what a crawler would actually land in the binary column. */
  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) & 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  /** tiny single-object PDF with one plain content stream. */
  private def pdfBytes(text: String): Array[Byte] = {
    val stream = s"BT /F1 12 Tf 72 720 Td ($text) Tj ET"
    (s"%PDF-1.4\n1 0 obj << /Length ${stream.length} >>\nstream\n" + stream +
      "\nendstream\nendobj\n%%EOF").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private lazy val assetDir: String = {
    val dir = Files.createTempDirectory("graft-mm")
    Files.write(dir.resolve("a.png"), imageBytes("png", 640, 480))
    Files.write(dir.resolve("b.png"), imageBytes("png", 32, 32))
    Files.write(dir.resolve("c.jpg"), imageBytes("jpg", 20, 10))
    Files.write(dir.resolve("page.html"), "<html><body>x</body></html>".getBytes)
    Files.write(dir.resolve("doc.pdf"), pdfBytes("Bao cao thuy van"))
    dir.toString
  }

  test("readAssets: binaryFile ingest with modality dispatch") {
    val assets = Multimodal.readAssets(spark, assetDir)
    assert(assets.schema.fieldNames.toSeq == Seq("asset_id", "modality", "content", "meta"))
    val byModality = assets.groupBy("modality").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byModality == Map("image" -> 3L, "html" -> 1L, "pdf" -> 1L))
  }

  test("extractText dispatches html and pdf payloads to their extractors") {
    val texts = Multimodal.extractText(Multimodal.readAssets(spark, assetDir))
      .filter(col("modality").isin("html", "pdf"))
      .select(col("modality"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(texts("html") == "x")
    assert(texts("pdf") == "Bao cao thuy van")
  }

  test("decodeImage decodes real PNG and JPEG bytes with correct dimensions") {
    assert(Multimodal.decodeImage(imageBytes("png", 640, 480)) == ("png", 640, 480))
    assert(Multimodal.decodeImage(imageBytes("jpg", 31, 17)) == ("jpeg", 31, 17))
    assert(Multimodal.decodeImage("not an image at all".getBytes) == ("unknown", 0, 0))
    assert(Multimodal.decodeImage(null) == ("empty", 0, 0))
    // claimed-but-truncated: JPEG magic with no SOF header → (jpeg, 0, 0)
    assert(Multimodal.decodeImage(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)) == ("jpeg", 0, 0))
  }

  test("extractFeatures: partition-wise batched, fixed-dim, deterministic") {
    val assets = Multimodal.readAssets(spark, assetDir).repartition(3)
    val feats = Multimodal.extractFeatures(spark, assets, dim = 16, batchSize = 2).collect()
    assert(feats.length == 5)
    assert(feats.forall(_.feature.length == 16))
    val png = feats.filter(_.format == "png")
    assert(png.map(f => (f.width, f.height)).toSet == Set((640, 480), (32, 32)))
    val jpeg = feats.filter(_.format == "jpeg")
    assert(jpeg.map(f => (f.width, f.height)).toSet == Set((20, 10)))
    // determinism: rerun produces identical features
    val again = Multimodal.extractFeatures(spark, assets, dim = 16, batchSize = 2).collect()
    assert(feats.sortBy(_.asset_id).zip(again.sortBy(_.asset_id))
      .forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("sampleFrameOffsets explodes 1-to-N with correct offsets") {
    val assets = Multimodal.readAssets(spark, assetDir)
    val frames = Multimodal.sampleFrameOffsets(assets, everyNBytes = 10L)
    val forPng = frames.join(assets.select(col("asset_id"), col("meta.length").cast("long").as("len")), "asset_id")
      .collect()
    assert(forPng.nonEmpty)
    forPng.foreach { r =>
      val off = r.getAs[Long]("byte_offset")
      val len = r.getAs[Long]("len")
      assert(off < math.max(len, 10L))
      assert(off % 10L == 0L)
    }
  }
}
