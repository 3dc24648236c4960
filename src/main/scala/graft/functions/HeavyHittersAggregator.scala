package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: mergeable Misra-Gries heavy-hitters sketch over a string
  * stream, plus the exact stream length.
  *
  * The buffer carries at most `m` (item, counter) pairs however large the
  * stream is, and the MERGE operation (Agarwal et al., "Mergeable
  * Summaries", PODS 2012: sum counters, subtract the (m+1)-th largest,
  * drop non-positive) preserves the Misra-Gries guarantee across
  * partitions: every item with true frequency > N/(m+1) SURVIVES the
  * sketch, and each surviving counter underestimates its true count by at
  * most N/(m+1).
  *
  * Why not `GROUP BY term` + HAVING? That shuffles the entire vocabulary
  * — at 100 TB the term universe is billions of keys — to answer a
  * question about the top handful. This sketch reduces every partition to
  * ≤ m entries before the exchange; a second exact pass over the ≤ m
  * candidates (a broadcast isin filter) turns the superset into the exact
  * answer. Unlike [[TopStringsAggregator]]'s top-k-of-partials trim
  * (fine for per-group ranking where k bounds the group), Misra-Gries
  * carries the decrement bookkeeping that makes the survival guarantee
  * actually hold under adversarial partition layouts.
  */
final class HeavyHittersAggregator(m: Int)
    extends Aggregator[String, (Map[String, Long], Long),
                       (Seq[(String, Long)], Long)] {
  require(m > 0, "capacity must be positive")

  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  override def reduce(buf: (Map[String, Long], Long),
                      w: String): (Map[String, Long], Long) = {
    val (cnt, n) = buf
    val upd =
      if (cnt.contains(w)) cnt.updated(w, cnt(w) + 1L)
      else if (cnt.size < m) cnt.updated(w, 1L)
      // full and w absent: decrement every counter, drop zeros — the
      // classic MG step (amortized O(1): each decrement pays back an
      // earlier increment)
      else cnt.flatMap { case (k, v) =>
        if (v > 1L) Some(k -> (v - 1L)) else None
      }
    (upd, n + 1L)
  }

  override def merge(a: (Map[String, Long], Long),
                     b: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val summed = b._1.foldLeft(a._1) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    val trimmed =
      if (summed.size <= m) summed
      else {
        // subtract the (m+1)-th largest counter from everything, keep > 0
        val cut = summed.valuesIterator.toIndexedSeq.sorted(
          Ordering[Long].reverse)(m)
        summed.flatMap { case (k, v) =>
          if (v > cut) Some(k -> (v - cut)) else None
        }
      }
    (trimmed, a._2 + b._2)
  }

  override def finish(buf: (Map[String, Long], Long)): (Seq[(String, Long)], Long) =
    (buf._1.toSeq.sortBy { case (w, c) => (-c, w) }, buf._2)

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[(Seq[(String, Long)], Long)] =
    ExpressionEncoder()
}
