package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Multimodal plumbing: binaryFile ingest, stub decode, partition-wise
  * feature extraction, frame-offset explode. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  /** minimal valid 3x2 PNG header (signature + IHDR length/type + dims). */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    val ihdrLen = Array[Byte](0, 0, 0, 13)
    val ihdrTag = "IHDR".getBytes
    def be(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    sig ++ ihdrLen ++ ihdrTag ++ be(w) ++ be(h) ++ Array[Byte](8, 6, 0, 0, 0)
  }

  /** tiny single-object PDF with one plain content stream. */
  private def pdfBytes(text: String): Array[Byte] = {
    val stream = s"BT /F1 12 Tf 72 720 Td ($text) Tj ET"
    (s"%PDF-1.4\n1 0 obj << /Length ${stream.length} >>\nstream\n" + stream +
      "\nendstream\nendobj\n%%EOF").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private lazy val assetDir: String = {
    val dir = Files.createTempDirectory("graft-mm")
    Files.write(dir.resolve("a.png"), pngBytes(640, 480))
    Files.write(dir.resolve("b.png"), pngBytes(32, 32))
    Files.write(dir.resolve("c.jpg"), Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte))
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

  test("decodeStub reads real PNG dimensions, flags JPEG, rejects garbage") {
    assert(Multimodal.decodeStub(pngBytes(640, 480)) == ("png", 640, 480))
    assert(Multimodal.decodeStub(Array[Byte](0xFF.toByte, 0xD8.toByte, 0, 0, 0, 0, 0, 0)) == ("jpeg", -1, -1))
    assert(Multimodal.decodeStub("not an image at all".getBytes) == ("unknown", 0, 0))
    assert(Multimodal.decodeStub(null) == ("empty", 0, 0))
  }

  test("extractFeatures: partition-wise batched, fixed-dim, deterministic") {
    val assets = Multimodal.readAssets(spark, assetDir).repartition(3)
    val feats = Multimodal.extractFeatures(spark, assets, dim = 16, batchSize = 2).collect()
    assert(feats.length == 5)
    assert(feats.forall(_.feature.length == 16))
    val png = feats.filter(_.format == "png")
    assert(png.map(f => (f.width, f.height)).toSet == Set((640, 480), (32, 32)))
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
