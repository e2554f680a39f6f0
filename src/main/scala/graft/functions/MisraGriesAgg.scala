package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom AGGREGATE: a Misra-Gries heavy-hitter summary (capacity
  * [[MisraGriesAgg.Capacity]] counters) over a stream of string keys.
  *
  * The buffer is an O(capacity) key->count map, so the aggregate is
  * partial-mergeable — map-side combine works and NO task ever holds more
  * than `Capacity` counters, regardless of the distinct-key cardinality of
  * its input split. That is the whole point at 100 TB: a `groupBy(key)`
  * materializes every distinct key through a shuffle; this sketch finds
  * frequency > n/k candidates with a constant-size state per task and an
  * O(capacity) merge at the reducer.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries", PODS 2012): sum the
  * two summaries pointwise, then subtract the (capacity+1)-th largest count
  * from every counter and drop the non-positive ones. The total undercount
  * across any merge tree is bounded by n/(capacity+1), so every key with
  * true frequency > n/(capacity+1) is guaranteed to survive — the summary
  * is a SUPERSET of the true heavy hitters (possible false positives, no
  * false negatives above the bound). Callers verify candidates with one
  * exact counting pass restricted to the O(capacity) candidate set (see
  * `q_heavy_hitters` in GenericQueries); the final answer is exact and
  * deterministic even though intermediate summaries depend on merge order.
  *
  * Reference behavior this generalizes: log-ship's per-sink counters are
  * exact maps over a FIXED tiny key domain (delivery metrics,
  * log-ship/src/metrics.rs); this is the unbounded-domain analogue.
  */
object MisraGriesAgg extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  /** 64 counters: undercount bound n/65 — comfortably below the n/16
    * decision threshold used by q_heavy_hitters. */
  val Capacity = 64

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1L)
      case None if buf.size < Capacity => buf.updated(key, 1L)
      case None =>
        // classic MG decrement-all; drops keys reaching zero, so the
        // result has at most Capacity-? entries and the new key is NOT
        // inserted (its "count" is absorbed by the global decrement).
        buf.iterator
          .map { case (k, c) => (k, c - 1L) }
          .filter(_._2 > 0L)
          .toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (combined.size <= Capacity) combined
    else {
      // subtract the (Capacity+1)-th largest count from everything
      val counts = combined.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (Capacity + 1))
      combined.iterator
        .map { case (k, c) => (k, c - cut) }
        .filter(_._2 > 0L)
        .toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
