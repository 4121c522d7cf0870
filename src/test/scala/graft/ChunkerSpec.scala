package graft

import graft.functions.TextFunctions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the recursive chunker (SURVEY.md §5 item 2:
  * chunker invariants replace a DuckDB oracle for this UDF).
  * Seeded-random generation keeps runs deterministic. */
class ChunkerSpec extends AnyFunSuite {

  private def genText(rnd: Random): String = {
    val n = rnd.nextInt(400)
    val sb = new StringBuilder
    for (_ <- 0 until n) {
      rnd.nextInt(10) match {
        case 0 => sb.append("\n\n")
        case 1 => sb.append("\n")
        case 2 => sb.append(" ")
        case _ => sb.append(Random.javaRandomToRandom(new java.util.Random(rnd.nextLong()))
          .alphanumeric.take(1 + rnd.nextInt(12)).mkString.toLowerCase).append(" ")
      }
    }
    sb.toString
  }

  test("every chunk is non-empty and within size") {
    val rnd = new Random(42)
    for (_ <- 0 until 300) {
      val text = genText(rnd)
      val size = 10 + rnd.nextInt(190)
      val chunks = chunkText(text, size, size / 10)
      assert(chunks.forall(c => c.nonEmpty && c.length <= size),
        s"size=$size text=${text.take(80)}")
    }
  }

  test("short inputs round-trip unchanged") {
    val rnd = new Random(43)
    for (_ <- 0 until 300) {
      val text = genText(rnd).take(100)
      if (text.nonEmpty) assert(chunkText(text, 100, 10) == Vector(text))
    }
  }

  test("concatenation with overlap removed reproduces the input") {
    val rnd = new Random(44)
    for (_ <- 0 until 300) {
      val text = genText(rnd)
      if (text.nonEmpty) {
        val size = 20 + rnd.nextInt(100)
        val overlap = size / 5
        val chunks = chunkWithCarry(text, size, overlap)
        val rebuilt = chunks.map { case (c, carry) => c.substring(carry) }.mkString
        assert(rebuilt == text, s"size=$size text=${text.take(80)}")
        // the declared carry really is a suffix of the previous chunk
        for (i <- 1 until chunks.size) {
          val (c, carry) = chunks(i)
          assert(chunks(i - 1)._1.endsWith(c.substring(0, carry)))
          assert(carry <= overlap)
        }
      }
    }
  }

  test("empty input gives no chunks") {
    assert(chunkText("", 100, 10).isEmpty)
  }

  test("pathological single-token input is hard-split to size") {
    val text = "x" * 1234
    val chunks = chunkText(text, 100, 10)
    assert(chunks.forall(_.length <= 100))
    assert(chunks.map(_.length).sum >= 1234) // covers everything (plus overlap)
  }

  test("reference-shaped config (5000/500) chunks a long doc") {
    val para = ("lorem ipsum " * 40).trim + "\n\n"
    val doc = para * 50 // ~24k chars
    val chunks = chunkText(doc, 5000, 500)
    assert(chunks.forall(_.length <= 5000))
    assert(chunks.size >= doc.length / 5000)
  }

  test("idempotent: chunking a chunk returns it whole") {
    val rnd = new Random(45)
    for (_ <- 0 until 100) {
      val text = genText(rnd)
      for (c <- chunkText(text, 80, 8))
        assert(chunkText(c, 80, 8) == Vector(c))
    }
  }
}
