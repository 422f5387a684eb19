package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` (SURVEY.md §2.3 UDAF row): the
  * buffer is a k-bounded list ordered by (score desc, id asc), so Spark's
  * partial aggregation does the per-partition pre-reduce for free and the
  * shuffle carries at most k (id, score) pairs per group per map task —
  * the aggregate-with-bounded-buffer shape that a window + row_number
  * top-k cannot express.
  *
  * Ordering ties break toward the LOWER id, matching the exact top-k
  * ranking (`ORDER BY score DESC, id`) everywhere in the engine. */
case class TopK[I](k: Int, item: I => (Long, Double))
    extends Aggregator[I, List[(Long, Double)], Seq[(Long, Double)]] {

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  override def zero: List[(Long, Double)] = Nil

  override def reduce(buf: List[(Long, Double)], in: I): List[(Long, Double)] =
    insert(buf, item(in))

  override def merge(a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] =
    b.foldLeft(a)(insert)

  /** Insert keeping the list sorted best-first and bounded at k. */
  private def insert(buf: List[(Long, Double)], in: (Long, Double)): List[(Long, Double)] = {
    if (buf.lengthCompare(k) >= 0 && !better(in, buf.last)) buf
    else {
      val (pre, post) = buf.span(better(_, in))
      (pre ::: in :: post).take(k)
    }
  }

  override def finish(buf: List[(Long, Double)]): Seq[(Long, Double)] = buf

  // kryo: the buffer is an opaque k-bounded blob on the shuffle wire,
  // exactly like the built-in sketch aggregates' binary buffers
  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    Encoders.kryo[List[(Long, Double)]]

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    Encoders.kryo[Seq[(Long, Double)]]
}
