package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The bounded-top-k Aggregator's algebra, checked directly (no Spark):
  * bounded buffers, ranking order, and merge associativity — the property
  * partial aggregation depends on. */
class TopKAggregatorSpec extends AnyFunSuite {

  private val agg = TopK[(Long, Double)](3, identity)

  test("reduce keeps the best k in ranking order (score desc, id asc)") {
    val items = Seq((1L, 0.5), (2L, 0.9), (3L, 0.1), (4L, 0.9), (5L, 0.7))
    val buf = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) === Seq((2L, 0.9), (4L, 0.9), (5L, 0.7)))
  }

  test("merge of partial buffers == reduce over the concatenation, any split") {
    val r = new scala.util.Random(5)
    val items = Seq.fill(50)((r.nextInt(30).toLong, math.rint(r.nextDouble() * 10) / 10))
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    for (cut <- Seq(0, 1, 25, 49, 50)) {
      val (a, b) = items.splitAt(cut)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
                             b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === agg.finish(whole), s"cut=$cut")
    }
  }

  test("buffer never exceeds k") {
    val buf = (1 to 100).map(i => (i.toLong, i / 100.0)).foldLeft(agg.zero)(agg.reduce)
    assert(buf.size === 3)
  }
}
