package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded K-Minimum-Values distinct-count sketch: keeps the k smallest
  * DISTINCT 60-bit hash values seen, in ascending order.
  *
  * This is the real KMV structure (Bar-Yossef et al., "Counting distinct
  * elements in a data stream"): duplicates collapse inside the sketch at
  * insert time, so — unlike a window `row_number() <= k` over a
  * pre-`DISTINCT`ed frame — no distinct-shuffle of the full key set is
  * needed. Map-side partial aggregation bounds every buffer at k longs,
  * so the shuffle carries k·groups·mappers values regardless of input
  * size; the estimator `(k-1)·2^60 / h_(k)` then needs only the k-th
  * minimum. Both reduce and merge keep the buffer sorted-distinct and
  * truncated, which makes the result independent of partitioning and
  * merge order — the determinism the oracle hash-compare requires.
  */
class KmvAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0)

  override def zero: Seq[Long] = Nil

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.length == k && buf.last <= h) buf
    else merge(buf, Seq(h))

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](k)
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      val next =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (out.isEmpty || out.last != next) out += next
    }
    out.toSeq
  }

  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object KmvAggregator {
  /** Column form: `kmv(k)(hashCol)` → ascending array of the k smallest
    * distinct hash values in the group.
    */
  def kmv(k: Int): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new KmvAggregator(k), Encoders.scalaLong)
      .apply(_)
}
