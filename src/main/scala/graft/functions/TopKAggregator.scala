package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row: `v` ranks (higher is better), `id` breaks ties
  * (lower wins) and makes the result deterministic.
  */
case class Scored(v: Double, id: Long)

/** Bounded top-k per group as a typed [[Aggregator]].
  *
  * The scale story: the window formulation (`row_number() OVER
  * (PARTITION BY g ORDER BY v DESC) <= k`) must shuffle and sort EVERY
  * row of the table. As a TypedImperativeAggregate this runs with
  * map-side partial aggregation: each task keeps at most k rows per
  * group (sorted insert into a bounded buffer), so the shuffle carries
  * ≤ k rows per (group, mapper) instead of the whole table — at 100 TB
  * that is the difference between shuffling terabytes and megabytes.
  *
  * Buffers are kept sorted (v desc, id asc) and truncated to k, so
  * reduce/merge are order-insensitive and the result is deterministic.
  */
class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  private def better(a: Scored, b: Scored): Boolean =
    a.v > b.v || (a.v == b.v && a.id < b.id)

  override def zero: Seq[Scored] = Nil

  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
    if (buf.length == k && better(buf.last, in)) buf
    else merge(buf, Seq(in))

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = {
    val out = new scala.collection.mutable.ArrayBuffer[Scored](k)
    var i = 0; var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
    }
    out.toSeq
  }

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Column-level entry; the product encoder flattens [[Scored]], so the
    * call shape is `topK(3)(vCol, idCol)`.
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k), Encoders.product[Scored])
}
