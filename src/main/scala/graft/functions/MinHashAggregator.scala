package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** MinHash signature as a typed `Aggregator` — the custom-UDAF surface of
  * SURVEY §2.7 realized on a hot path: one pass over a group's hashed
  * shingles folds all `perms` permutation minima into a single long-array
  * buffer. `merge` is element-wise min, so Spark gets map-side partial
  * aggregation for free and the shuffle carries one buffer per
  * (group, partition) instead of the raw shingle rows — identical shuffle
  * posture to the 16-column `min()` form in TextOps.minhashSig, which
  * TextOpsSpec proves it bit-equal to (same permutation arithmetic:
  * `(a_i * h + b_i) mod P`, P = 2^31 - 1).
  *
  * The column form stays the production path (16 codegen'd min aggs beat
  * a typed buffer's ser/de); this is the demonstration that a custom
  * aggregation semantics Spark lacks would slot in as an `Aggregator`
  * without touching Catalyst.
  */
case class MinHashAggregator(permAs: Array[Long], permBs: Array[Long], p: Long)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(permAs.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], hm: Long): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      val v = (permAs(i) * hm + permBs(i)) % p
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashAggregator {
  /** q22-parameterized instance: same 16 permutations as
    * `TextOps.minhashSig`. */
  def q22: MinHashAggregator = MinHashAggregator(
    Array.tabulate(16)(graft.queries.TextOps.permA),
    Array.tabulate(16)(graft.queries.TextOps.permB),
    graft.queries.TextOps.P)

  /** Column surface over a hashed-shingle column (also registrable by
    * name: `spark.udf.register("minhash_agg", udafColumn)`). */
  def udafColumn(hm: Column): Column = udaf(q22).apply(hm)
}
