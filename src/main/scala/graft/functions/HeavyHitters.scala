package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy hitters as a typed `Aggregator` (SURVEY.md §2.3 UDAF
  * row): bounded-memory frequent-items summary over an unbounded token
  * stream — the O(k) answer to "top terms" when the distinct-token
  * universe does not fit anywhere (the exact q63 terms agg shuffles one
  * row per distinct token; this shuffles at most k counters per map
  * partition, like the built-in sketch aggregates' binary buffers).
  *
  * Deterministic given a partitioning, but the counter values depend on
  * arrival/merge order — engine-specific by design, so the query entry is
  * bench-only and HeavyHittersSpec asserts the structural guarantee
  * instead: after observing n items with k counters,
  *
  *   true(w) - n/(k+1)  <=  est(w)  <=  true(w)
  *
  * and every w with true(w) > n/(k+1) is present in the summary (the
  * classic Misra-Gries bound; merge uses the Agarwal et al. "subtract the
  * (k+1)-th largest and truncate" rule, which preserves it).
  */
case class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], w: String): Map[String, Long] =
    m.get(w) match {
      case Some(c)              => m.updated(w, c + 1)
      case None if m.size < k   => m.updated(w, 1L)
      // all counters decrement; zeros drop (the classic MG step)
      case None                 => m.flatMap { case (t, c) =>
                                     if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from every counter, truncate
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    Encoders.kryo[Seq[(String, Long)]]
}
