package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB top-k path (per-partition heaps) must return exactly the
  * declarative window result; hashEmbed invariants. */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("topKPartitioned equals topKWindow exactly") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .repartition(7) // force multiple partitions so partial top-k matters
    val a = Similarity.topKWindow(q, c, 5).collect().map(_.toSeq).toSet
    val b = Similarity.topKPartitioned(spark, q, c, 5).collect().map(_.toSeq).toSet
    assert(a.nonEmpty)
    assert(a == b)
  }

  test("ivfTopK probes only the query's centroid partition") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val ivf = Similarity.ivfTopK(q, c, cents, 5).collect()
    assert(ivf.nonEmpty)
    // every query got at most k ranked hits, ranks contiguous from 1
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // IVF hits are a subset of the full corpus ordering semantics:
    // each hit's cosine must be <= the exact top-1 cosine for that query
    val exact = Similarity.topKWindow(q, c, 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    ivf.foreach(r => assert(r.getDouble(2) <= exact(r.getLong(0)) + 1e-12))
  }

  test("hashEmbed is deterministic, fixed-dim, L2-normalized") {
    val v1 = VectorFunctions.hashEmbed("the quick brown fox", 64)
    val v2 = VectorFunctions.hashEmbed("the quick brown fox", 64)
    assert(v1.toSeq == v2.toSeq)
    assert(v1.length == 64)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // different text -> different vector (overwhelmingly)
    val v3 = VectorFunctions.hashEmbed("a completely different sentence", 64)
    assert(v1.toSeq != v3.toSeq)
    // empty/null-safe
    assert(VectorFunctions.hashEmbed("", 16).toSeq == Seq.fill(16)(0f))
    assert(VectorFunctions.hashEmbed(null, 16).toSeq == Seq.fill(16)(0f))
  }

  test("q40 multiprobe-LSH near-dup recalls every exact q25 pair at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q25_embedding_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q40_lsh_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(exact.subsetOf(lsh), s"LSH missed exact pairs: ${exact -- lsh}")
  }

  test("approx_count_distinct is the scale form of A5 (sanity, not oracle)") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val exact = docs.select(countDistinct(sha2(col("text"), 256))).head.getLong(0)
    val approx = docs.select(approx_count_distinct(sha2(col("text"), 256), 0.02)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }
}
