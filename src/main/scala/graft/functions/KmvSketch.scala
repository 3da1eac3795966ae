package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k (KMV) distinct sketch as a typed one-pass `Aggregator` — the
  * MERGEABLE form of q346's per-source window rank: the buffer is the k
  * smallest DISTINCT hash values seen so far, so the shuffle carries at
  * most k longs per group regardless of stream length, and two sketches
  * union by merging buffers and keeping the k smallest (both the
  * estimator and the uniform vocabulary sample stay valid — the KMV
  * property).
  *
  * Duplicate safety without a distinct pass (the reason KMV runs
  * ONLINE): evictions only ever remove the current maximum, so every
  * evicted value is ≥ the buffer's max at all later times; a duplicate
  * h is therefore either still IN the buffer (skipped by the membership
  * check) or ≥ max (irrelevant to the bottom-k). No stream-side dedup
  * state is needed — exactly like HLL's max-rank registers (q300).
  *
  * The buffer is kept SORTED ascending; insert is an O(k) array splice
  * (k = 16 here — branch-light and allocation-bounded on the hot path).
  */
class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], h: Long): Seq[Long] = {
    if (b.contains(h)) b
    else if (b.length < k) (b :+ h).sorted
    else if (h < b.last) ((b.init :+ h)).sorted
    else b
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
