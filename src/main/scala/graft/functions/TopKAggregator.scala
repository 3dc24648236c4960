package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: per-group top-k by (score desc, id asc) with a bounded
  * k-sized buffer — the scale-correct alternative to
  * `row_number().over(Window)` for top-k: the window form sorts every
  * group's full candidate list inside one shuffle partition, while this
  * aggregator carries at most k elements per group through partial
  * aggregation (map-side combine), so candidate lists of any size reduce
  * to k entries before the shuffle.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // buffer invariant: sorted by (score desc, id asc). The common case on
  // a large candidate stream is REJECT — the full buffer's worst entry
  // already beats the candidate — which must be O(1) with zero
  // allocation: a sort-per-insert re-sorts the buffer once per input ROW
  // (found by the sf1-shaped sweep: 8M candidate pairs wedged one task
  // for >10 CPU-minutes in sortBy).
  private def insert(buf: Seq[(Double, Long)], score: Double, id: Long)
      : Seq[(Double, Long)] = {
    if (buf.size >= k) {
      val (ws, wi) = buf.last
      if (score < ws || (score == ws && id >= wi)) return buf
    }
    val merged = ((score, id) +: buf)
      .sortBy { case (s, i) => (-s, i) }
    if (merged.size > k) merged.take(k) else merged
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] =
    insert(buf, in._2, in._1)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val merged = (a ++ b).sortBy { case (s, i) => (-s, i) }
    if (merged.size > k) merged.take(k) else merged
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
