package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed `Aggregator` — the engine's analog of the ES
  * `scripted_metric` aggregation (user-supplied map/combine/reduce over a
  * group): the map script accumulates (sum of ln x, count) per partition,
  * combine merges the pairs, reduce finishes with exp(sum/count). The
  * buffer is two scalars, so partial aggregation pre-reduces each map
  * task's rows and the shuffle carries one 16-byte pair per group per
  * task — the same bounded-buffer posture as [[TopK]].
  *
  * Non-positive inputs are skipped (a geometric mean is defined over
  * positive reals); an all-skipped group finishes as NaN.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {

  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
