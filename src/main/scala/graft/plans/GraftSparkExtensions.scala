package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` injection point for the engine's native
  * expressions — the builder-prompt path for custom operators
  * ("registered via SparkSessionExtensions"): a cluster operator enables
  * the whole function surface with
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions`, no driver
  * code required. [[GraftExpressions.register]] remains the imperative
  * session-local equivalent for embedded use.
  *
  * Injected SQL functions:
  *  - `cosine_sim(a, b)` — codegen'd cosine over two array<float>
  *  - `dot_product(a, b)` — codegen'd dot product (pair kernel of the
  *    norm-precomputed cosine form)
  *  - `chunk_text(text, size, overlap)` — recursive chunker Generator
  *    (LATERAL VIEW / table-generating select)
  *  - `lsh_keys(embedding, tables, bits, mult)` — fused multiprobe-LSH
  *    table keys (tables/bits/mult must be foldable integer literals)
  *  - `lsh_probe_keys(embedding, tables, bits, probes, mult)` —
  *    confidence-ordered multiprobe key sets (exact key + lowest-margin
  *    plane flips) per table
  *  - `distinct_shingles(text, n)` — distinct word n-gram shingles in
  *    first-occurrence order, byte-level and codegen-native (the
  *    near-dup family's per-row kernel)
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftSparkExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("chunk_text"),
      info("chunk_text", "chunk_text(text, size, overlap) - recursive chunk generator"),
      (exprs: Seq[Expression]) => ChunkTextGen(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("lsh_keys"),
      info("lsh_keys", "lsh_keys(embedding, tables, bits, mult) - multiprobe LSH table keys"),
      (exprs: Seq[Expression]) => GraftExpressions.lshKeysFromSql(exprs)))
    ext.injectFunction((FunctionIdentifier("lsh_probe_keys"),
      info("lsh_probe_keys",
        "lsh_probe_keys(embedding, tables, bits, probes, mult) - confidence-ordered multiprobe key sets"),
      (exprs: Seq[Expression]) => GraftExpressions.lshProbeKeysFromSql(exprs)))
    ext.injectFunction((FunctionIdentifier("distinct_shingles"),
      info("distinct_shingles",
        "distinct_shingles(text, n) - distinct word n-gram shingles, first-occurrence order"),
      (exprs: Seq[Expression]) => DistinctShingles(exprs(0),
        GraftExpressions.litLong(exprs(1), "distinct_shingles", "n").toInt)))
  }
}
