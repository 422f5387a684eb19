package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSuite

/** q225 — integer fixed-point PageRank pinned three ways: href capture in
  * the HTML tokenizer, hand-verifiable graph shapes, and EXACT equality
  * of the distributed recurrence against a driver-side integer replay on
  * the fixture graph (possible only because the arithmetic is integral —
  * the design point of the operator).
  */
class LinkGraphSpec extends GraftSuite {

  test("href capture: double/single quotes, attribute order, decoys") {
    val doc = Html.parse(
      """<body><a class="x" href="/doc/3">a</a><a href='/doc/7'>b</a>
        |<a name="no-href">c</a><p>href="/doc/99" is text, not a link</p></body>""".stripMargin)
    assert(doc.hrefs == Seq("/doc/3", "/doc/7"))
  }

  test("3-cycle stays uniform; a hub's target outranks the rest") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], n: Long) = {
      val nodes = (0L until n).toDF("v")
      LinkGraph.pagerank(nodes, edges.toDF("src", "dst"), n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val cycle = run(Seq((0L, 1L), (1L, 2L), (2L, 0L)), 3)
    assert(cycle.values.toSet.size == 1, s"cycle must stay uniform: $cycle")
    // 0,1,2 all point at 3; 3 points at 0. 1 and 2 have no in-links:
    // both the hub target and the hub's own target outrank them, and
    // symmetry holds exactly. (3-vs-0 ordering still oscillates at 8
    // iterations — finite-iterate PageRank, not the stationary limit.)
    val hub = run(Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 0L)), 4)
    assert(hub(3L) > hub(1L) && hub(0L) > hub(1L) && hub(1L) == hub(2L), s"$hub")
  }

  test("BFS layers: path depths exact, discovery round is FIRST reach, cap honored") {
    import spark.implicits._
    // path 0->1->...->9 plus a shortcut 0->4: node 4 must be depth 1 (first
    // discovery), nodes beyond the cap must be absent
    val edges = ((0L to 8L).map(i => i -> (i + 1)) :+ (0L -> 4L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("v")
    val got = LinkGraph.bfsDepths(edges, seeds, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 4L -> 1, 2L -> 2, 5L -> 2, 3L -> 3, 6L -> 3))
  }

  test("HITS: hubs and authorities separate; mutual recursion == driver replay") {
    import spark.implicits._
    // bipartite-ish shape: 1,2,3 all point at 0 and 4 — pure hubs with
    // identical out-profiles; 0 and 4 are pure authorities. HITS must
    // give the spokes equal positive hub mass and zero authority, and
    // the targets equal positive authority and zero hub mass.
    val edges = Seq(1L -> 0L, 1L -> 4L, 2L -> 0L, 2L -> 4L, 3L -> 0L, 3L -> 4L)
    val got = LinkGraph.hits((0L to 4L).toDF("v"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L)._1 > 0 && got(1L) == got(2L) && got(2L) == got(3L), s"$got")
    assert(got(0L)._2 > 0 && got(0L) == got(4L), s"$got")
    assert(got(1L)._2 == 0 && got(0L)._1 == 0, s"$got")

    // degenerate graph: no edges -> all-zero scores, never NULL poison
    val deg = LinkGraph.hits((0L to 2L).toDF("v"),
        Seq.empty[(Long, Long)].toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(deg.toSet == (0L to 2L).map(v => (v, 0L, 0L)).toSet, s"${deg.toSeq}")

    // fixture graph: distributed == independent driver integer replay
    val n = graft.core.Tables(spark, sf, "documents").count()
    val fEdges = (0L until n).flatMap(id =>
      LinkGraph.edgeTargets(id, n).toSet.map((t: Long) => id -> t))
    val dist = LinkGraph.hits(
        graft.core.Tables(spark, sf, "documents").select(col("doc_id").as("v")),
        fEdges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val inE = fEdges.groupBy(_._2)
    val outE = fEdges.groupBy(_._1)
    def l1(m: Map[Long, Long]): Map[Long, Long] = {
      val t = m.values.sum
      m.map { case (v, x) => v -> 1000000L * x / t }
    }
    var h = (0L until n).map(_ -> 1000000L).toMap
    var a = h
    for (_ <- 1 to LinkGraph.HitsIterations) {
      a = l1((0L until n).map(v =>
        v -> inE.getOrElse(v, Seq.empty).map { case (u, _) => h(u) }.sum).toMap)
      h = l1((0L until n).map(v =>
        v -> outE.getOrElse(v, Seq.empty).map { case (_, w) => a(w) }.sum).toMap)
    }
    assert(dist == (0L until n).map(v => v -> (h(v), a(v))).toMap,
      "distributed HITS vs driver replay diverged")
  }

  test("distributed recurrence == driver-side integer replay on the fixture graph") {
    import spark.implicits._
    val n = graft.core.Tables(spark, sf, "documents").count()
    val nodes = graft.core.Tables(spark, sf, "documents").select(col("doc_id").as("v"))
    val edges = (0L until n).flatMap(id => LinkGraph.edgeTargets(id, n).toSet.map((t: Long) => id -> t))
    val got = LinkGraph.pagerank(nodes, edges.toDF("src", "dst"), n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent replay: plain Scala maps, same integer recurrence
    val outd = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inEdges = edges.groupBy(_._2)
    val base = (15L * LinkGraph.Scale) / (100L * n)
    var r = (0L until n).map(_ -> LinkGraph.Scale / n).toMap
    for (_ <- 1 to LinkGraph.Iterations)
      r = (0L until n).map { v =>
        val s = inEdges.getOrElse(v, Seq.empty).map { case (u, _) => r(u) / outd(u) }.sum
        v -> (base + 85L * s / 100L)
      }.toMap
    assert(got == r, "distributed vs driver replay diverged")
    // mass stays bounded by construction (damping leaks at truncation)
    assert(r.values.sum <= LinkGraph.Scale)
    // the fixture graph must NOT be degenerate: conditional edges vary
    // in-degree, so scores spread and the oracle hash pins real mass
    // propagation (round-13's all-bijection graph converged to ONE value,
    // leaving src/dst orientation untested)
    assert(r.values.toSet.size > 10,
      s"fixture PageRank degenerate: only ${r.values.toSet.size} distinct scores")
  }

  test("trustrank: mass confined to the seed-reachable set; driver replay agrees") {
    import spark.implicits._
    // 0 -> 1 -> 2 -> 3 cycle back to 0; 4 -> 5 isolated from the seed
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (4L, 5L))
    val nodes = (0L until 6L).toDF("v")
    val got = LinkGraph.trustrank(nodes, edges.toDF("src", "dst"),
        org.apache.spark.sql.functions.col("v") === 0L, 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // nodes 4,5 are unreachable from the seed: zero trust, exactly
    assert(got(4L) == 0L && got(5L) == 0L, s"trust leaked off-seed: $got")
    assert(got(0L) > 0L && got(1L) > 0L && got(2L) > 0L && got(3L) > 0L)
    // independent integer replay of the seeded recurrence
    val outd = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inE = edges.groupBy(_._2)
    def base(v: Long) = if (v == 0L) 15L * LinkGraph.Scale / 100L else 0L
    var r = (0L until 6L).map(v => v -> (if (v == 0L) LinkGraph.Scale else 0L)).toMap
    for (_ <- 1 to LinkGraph.Iterations)
      r = (0L until 6L).map { v =>
        val s = inE.getOrElse(v, Seq.empty).map { case (u, _) => r(u) / outd(u) }.sum
        v -> (base(v) + 85L * s / 100L)
      }.toMap
    assert(got == r, "trust replay diverged")
  }
}
