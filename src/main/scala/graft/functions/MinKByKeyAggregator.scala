package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One keyed row: `key` ranks (lexicographically smaller wins), `id`
  * breaks ties (lower wins) and makes the result deterministic.
  */
case class KeyedId(key: String, id: Long)

/** Bounded min-k per group by a STRING sort key — the companion of
  * [[TopKAggregator]] for hash-ranked selection (derandomized reservoir
  * sampling ranks by md5(text), which no double can hold faithfully).
  *
  * Same scale story: map-side partial aggregation keeps at most k rows
  * per (group, mapper), so the shuffle carries k·groups·mappers tiny
  * structs instead of every row of the stratum. Buffers stay sorted
  * (key asc, id asc) and truncated to k, so reduce/merge are
  * order-insensitive and the result is deterministic — and, because the
  * FULL key string is compared, exactly equal to the window
  * formulation `row_number() OVER (ORDER BY key, id) <= k`.
  */
class MinKByKeyAggregator(k: Int)
    extends Aggregator[KeyedId, Seq[KeyedId], Seq[KeyedId]] {
  require(k > 0)

  private def better(a: KeyedId, b: KeyedId): Boolean = {
    val c = a.key.compareTo(b.key)
    c < 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Seq[KeyedId] = Nil

  override def reduce(buf: Seq[KeyedId], in: KeyedId): Seq[KeyedId] =
    if (buf.length == k && better(buf.last, in)) buf
    else merge(buf, Seq(in))

  override def merge(a: Seq[KeyedId], b: Seq[KeyedId]): Seq[KeyedId] = {
    val out = new scala.collection.mutable.ArrayBuffer[KeyedId](k)
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

  override def finish(r: Seq[KeyedId]): Seq[KeyedId] = r

  override def bufferEncoder: Encoder[Seq[KeyedId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[KeyedId]] = ExpressionEncoder()
}

object MinKByKeyAggregator {
  /** Column-level entry; the product encoder flattens [[KeyedId]], so
    * the call shape is `minKByKey(20)(keyCol, idCol)`.
    */
  def minKByKey(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinKByKeyAggregator(k), Encoders.product[KeyedId])
}
