package graft.ops

import graft.SparkSpec

/** [[Graph.triangleStats]] — the degree-oriented neighborhood-intersection
  * count must equal the combinatorial truth on graphs with known triangle
  * structure, including hubs where the naive (unoriented) wedge count would
  * explode.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val r = Graph.triangleStats(edges.toDF("u", "v")).collect().head
    (r.getAs[Long]("n_vertices"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"))
  }

  test("K4 has 4 triangles; adding a pendant edge adds none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val (v, e, _, t) = stats(k4)
    assert((v, e, t) === ((4L, 6L, 4L)))
    val (v2, e2, _, t2) = stats(k4 :+ (4L, 5L))
    assert((v2, e2, t2) === ((5L, 7L, 4L)))
  }

  test("triangle-free bipartite star-of-stars counts zero") {
    // hub 0 connected to 1..20, each of 1..20 connected to 100+i: no cycles
    val edges = (1L to 20L).map(i => (0L, i)) ++ (1L to 20L).map(i => (i, 100L + i))
    val (v, e, w, t) = stats(edges)
    assert((v, e, t) === ((41L, 40L, 0L)))
    // orientation caps the hub: every oriented out-degree is small, so the
    // wedge bound stays linear-ish even though the hub's naive wedge count
    // would be C(20,2) = 190
    assert(w < 190L)
  }

  test("hub fan with closing rim matches a brute-force count") {
    // wheel graph: hub 0 to rim 1..12, rim cycle 1-2-...-12-1 -> 12 triangles
    val rim = (1L to 12L).map(i => (i, if (i == 12L) 1L else i + 1))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val edges = (1L to 12L).map(i => (0L, i)) ++ rim
    val (v, e, _, t) = stats(edges)
    assert((v, e, t) === ((13L, 24L, 12L)))
  }

  /** Single-threaded reference of the integer-token recurrence. */
  private def pageRankRef(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nbrs = (edges ++ edges.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = nbrs.view.mapValues(_.size.toLong).toMap
    var t = deg.map { case (x, _) => x -> 1000000L }
    (1 to rounds).foreach { _ =>
      t = t.keys.map { x =>
        x -> (150000L + nbrs(x).map(u => (t(u) * 85L / 100L) / deg(u)).sum)
      }.toMap
    }
    t
  }

  private def pageRankGot(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    Graph.pageRankTokens(edges.toDF("u", "v"), rounds)
      .collect().map(r => r.getAs[Long]("x") -> r.getAs[Long]("t")).toMap

  test("pageRankTokens: regular graphs are a fixed point at 1,000,000") {
    // K3 is 2-regular: every vertex sends 2x425000 and keeps 150000
    val k3 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    assert(pageRankGot(k3, 3).values.toSet === Set(1000000L))
  }

  test("graph_components equals a union-find over the support-2 backbone") {
    val dir = "/root/testdata/sf0.001"
    val got = Graph.components.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("component") -> r.getAs[Long]("size")).toMap
    // brute force: collect backbone edges, union-find, min-label components
    val items = graft.core.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
    val pairCounts = items.groupBy(_._1).values
      .flatMap(b => b.map(_._2).sorted.distinct.combinations(2))
      .map(p => (p(0), p(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val edges = pairCounts.filter(_._2 >= 2).keys.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val want = parent.keys.toSeq.groupBy(find).map { case (r, m) => r -> m.size.toLong }
    assert(got === want)
  }

  test("graph_bfs_hops equals a single-threaded BFS from the same hub") {
    val dir = "/root/testdata/sf0.001"
    val got = Graph.bfsHops.fn(spark, dir).collect()
      .map(r => r.getAs[Int]("dist") -> r.getAs[Long]("n_vertices")).toMap
    // rebuild the graph + hub and run textbook BFS
    val items = graft.core.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
    val edges = items.groupBy(_._1).values
      .flatMap(b => b.map(_._2).distinct.sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    val nbrs = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hub = nbrs.toSeq.map { case (x, n) => (x, n.size) }
      .sortBy { case (x, d) => (-d, x) }.head._1
    var dist = Map(hub -> 0)
    var frontier = Set(hub)
    for (r <- 1 to 6) {
      frontier = frontier.flatMap(nbrs(_)).diff(dist.keySet)
      dist = dist ++ frontier.map(_ -> r)
    }
    val want = dist.values.groupBy(identity).map { case (d, v) => d -> v.size.toLong }
    assert(got === want)
    assert(got(0) === 1L)
  }

  test("bfsExpandStep: guard pins the regime — broadcast plan under it, shuffle-only past it") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val frontier = Seq(1L).toDF("x")
    val visited = Seq(1L).toDF("x")
    // small regime: both joins carry the explicit broadcast hint
    val small = Graph.bfsExpandStep(und, frontier, 1L, visited, 1L, guard = Long.MaxValue)
    assert(small.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"))
    // big regime: with auto-broadcast off, neither join may broadcast — the
    // shuffled 100 TB fallback plan (sort-merge / shuffled-hash only)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = Graph.bfsExpandStep(und, frontier, 1L, visited, 1L, guard = 0L)
      val plan = big.queryExecution.sparkPlan.toString
      assert(!plan.contains("Broadcast"), s"shuffled regime must not broadcast:\n$plan")
      assert(plan.contains("Join"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("graph_bfs_hops: shuffled fallback regime (guard=1) equals the broadcast path") {
    val dir = "/root/testdata/sf0.001"
    val viaBroadcast = Graph.bfsHops.fn(spark, dir).collect()
      .map(r => r.getAs[Int]("dist") -> r.getAs[Long]("n_vertices")).toMap
    val priorThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // pin the guard to 1 (only the size-1 seed frontier qualifies) and turn
      // off auto-broadcast, so rounds 1..6 all run the shuffled-join +
      // visited-rematerialization path — the code a >4M-vertex frontier hits
      spark.conf.set("spark.graft.bfs.broadcastIds", "1")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val viaShuffle = Graph.bfsHops.fn(spark, dir).collect()
        .map(r => r.getAs[Int]("dist") -> r.getAs[Long]("n_vertices")).toMap
      assert(viaShuffle === viaBroadcast)
    } finally {
      spark.conf.unset("spark.graft.bfs.broadcastIds")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThresh)
    }
  }

  test("graph_assortativity: matches a direct Pearson over edge-end degrees; r in [-1,1]") {
    val r = Graph.assortativity.fn(spark, "/root/testdata/sf0.001").collect().head
    val items = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
    val edges = items.groupBy(_._1).values
      .flatMap(b => b.map(_._2).distinct.sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet.toSeq
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pts = edges.flatMap { case (u, v) => Seq((deg(u), deg(v)), (deg(v), deg(u))) }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val syy = pts.map(p => p._2 * p._2).sum.toDouble
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(r.getAs[Long]("n_endpoints") === pts.size.toLong)
    assert(r.getAs[Double]("assortativity") === want)
    assert(math.abs(want) <= 1.0)
  }

  test("pageRankTokens: matches the single-threaded recurrence on a hub graph") {
    val rnd = new scala.util.Random(7)
    // star of 20 + random chords: irregular degrees exercise the flooring
    val star = (1L to 20L).map(i => (0L, i))
    val chords = Seq.fill(15)((rnd.nextInt(20) + 1L, rnd.nextInt(20) + 1L))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val edges = (star ++ chords).distinct
    for (rounds <- Seq(1, 3)) {
      assert(pageRankGot(edges, rounds) === pageRankRef(edges, rounds))
    }
  }
}
