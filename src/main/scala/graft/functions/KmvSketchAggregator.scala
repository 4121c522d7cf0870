package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count synopsis (Bar-Yossef et al. 2002;
  * Beyer et al., SIGMOD 2007): the k smallest DISTINCT hash values of the
  * group, sorted ascending. The buffer IS the sketch — bounded at k longs
  * however large the group — and `merge` folds one sketch into another,
  * which is exactly KMV's mergeability property: the k smallest of a
  * union of per-shard k-smallest sets equals the k smallest of the union,
  * so map-side partial aggregation reconstructs the global sketch without
  * ever shuffling the raw hash stream. That is what makes this the
  * 100 TB distinct-counter: per (group, partition) the shuffle carries
  * one ≤k array, while exact distinct shuffles every value.
  *
  * Estimation (done downstream in SQL so the oracle can recompute it):
  * if the sketch holds fewer than k values it IS the distinct set
  * (estimate = size); otherwise distinct ≈ (k−1)·H / h_(k) with H the
  * hash-space size and h_(k) the sketch's largest element.
  *
  * Differs from [[MinKLongsAggregator]] (q63's posting lists) in exactly
  * one rule: duplicates are DROPPED, not kept — a value already in the
  * buffer is a no-op, which is what makes the k-th element the k-th
  * smallest distinct value rather than a multiplicity-weighted one.
  */
case class KmvSketchAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Sorted distinct insert capped at k. O(1) after the buffer fills for
    * v above the current max (the common case on a hot group). */
  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    if (buf.length >= k && v >= buf(buf.length - 1)) return buf
    var pos = 0
    while (pos < buf.length && buf(pos) < v) pos += 1
    if (pos < buf.length && buf(pos) == v) return buf // already sketched
    val outLen = math.min(buf.length + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, pos)
    out(pos) = v
    System.arraycopy(buf, pos, out, pos + 1, outLen - pos - 1)
    out
  }

  override def reduce(buf: Array[Long], v: Long): Array[Long] = insert(buf, v)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var acc = b1
    var i = 0
    while (i < b2.length) { acc = insert(acc, b2(i)); i += 1 }
    acc
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
