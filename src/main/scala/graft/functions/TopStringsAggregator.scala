package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: per-group top-k (string, integer-score) pairs by
  * (score desc, string asc) — the string-payload sibling of
  * [[TopKAggregator]], same rationale: `row_number().over(Window)` sorts
  * every group's full item list inside one shuffle partition (a language's
  * whole vocabulary, a document's whole term list), while this aggregator
  * carries at most k elements per group through partial aggregation, so
  * item lists of any size reduce to k entries before the exchange.
  */
final class TopStringsAggregator(k: Int)
    extends Aggregator[(String, Long), Seq[(Long, String)], Seq[(Long, String)]] {

  private def trim(buf: Seq[(Long, String)]): Seq[(Long, String)] = {
    val sorted = buf.sortBy { case (s, w) => (-s, w) }
    if (sorted.size > k) sorted.take(k) else sorted
  }

  override def zero: Seq[(Long, String)] = Seq.empty

  // same O(1) full-buffer reject as TopKAggregator: the buffer is sorted
  // by construction, so a candidate the worst entry beats must not pay a
  // sort-per-insert (one re-sort per input row wedges large groups)
  override def reduce(buf: Seq[(Long, String)], in: (String, Long)): Seq[(Long, String)] = {
    if (buf.size >= k) {
      val (ws, ww) = buf.last
      if (in._2 < ws || (in._2 == ws && in._1 >= ww)) return buf
    }
    trim((in._2, in._1) +: buf)
  }

  override def merge(a: Seq[(Long, String)], b: Seq[(Long, String)]): Seq[(Long, String)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, String)]): Seq[(Long, String)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, String)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, String)]] = ExpressionEncoder()
}
