package graft

import scala.collection.mutable
import scala.util.Random

import graft.graph._

/**
 * Property tests on seeded random graphs against driver-side (plain Scala)
 * oracles (SURVEY.md §6.3): Σpr = 1 every run, PageRank matches a sequential
 * reference implementation, CC matches BFS, triangles match brute force.
 */
class GraphPropertySpec extends SparkSpec {
  import spark.implicits._

  /** sequential reference PageRank — independent of the engine code path. */
  def refPageRank(edges: Seq[(Long, Long)], d: Double = 0.85,
                  eps: Double = 1e-10, maxIter: Int = 300): Map[Long, Double] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n     = verts.size
    val out   = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r     = verts.map(_ -> 1.0 / n).toMap
    var it    = 0
    var l1    = Double.MaxValue
    while (l1 >= eps && it < maxIter) {
      val dm  = verts.filter(v => !out.contains(v)).map(r).sum
      val acc = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      edges.foreach { case (s, t) => acc(t) += r(s) / out(s) }
      val nr = verts.map(v => v -> ((1 - d) / n + d * (acc(v) + dm / n))).toMap
      l1 = verts.map(v => math.abs(nr(v) - r(v))).sum
      r = nr; it += 1
    }
    r
  }

  def refCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    def add(a: Long, b: Long): Unit = adj.getOrElseUpdate(a, mutable.Set.empty) += b
    edges.foreach { case (s, t) => add(s, t); add(t, s) }
    val verts = adj.keys.toSeq.sorted
    val label = mutable.Map.empty[Long, Long]
    verts.foreach { v =>
      if (!label.contains(v)) {
        val q = mutable.Queue(v); label(v) = v
        while (q.nonEmpty) {
          val u = q.dequeue()
          adj(u).foreach(w => if (!label.contains(w)) { label(w) = v; q.enqueue(w) })
        }
      }
    }
    label.toMap
  }

  def refTriangles(edges: Seq[(Long, Long)]): Long = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val set = und.toSet
    val vs  = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    (for {
      i <- vs.indices; j <- (i + 1) until vs.size if set((vs(i), vs(j)))
      k <- (j + 1) until vs.size
      if set((vs(i), vs(k))) && set((vs(j), vs(k)))
    } yield 1).size.toLong
  }

  def randomGraph(seed: Int, n: Int, m: Int): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    (1 to m).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
  }

  for (seed <- Seq(11, 23, 47)) {
    test(s"random graph seed=$seed: PageRank/CC/triangles match sequential oracles") {
      val edges = randomGraph(seed, 40, 120)
      val df    = edges.toDF("src", "dst")

      val res = PageRank.run(spark, df, PageRankConfig(eps = 1e-10, numPartitions = 4))
      val got = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = refPageRank(edges)
      assert(math.abs(got.values.sum - 1.0) < 1e-9, "Σpr must be 1")
      assert(got.keySet == want.keySet)
      want.foreach { case (v, p) => assert(math.abs(got(v) - p) < 1e-6, s"vid=$v") }

      val gotCc = ConnectedComponents.run(spark, df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // HashMin labels are the min id of the component — same as BFS-from-min
      val wantCc = refCc(edges)
      val canonical = wantCc.groupBy(_._2).flatMap { case (_, m) =>
        val mn = m.keys.min; m.keys.map(_ -> mn)
      }
      assert(gotCc == canonical)

      // O(log n)-round alternating variant: exactly the same labels
      val gotAlt = ConnectedComponents.runAlternating(spark, df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotAlt == canonical)

      assert(Triangles.countTriangles(spark, df) == refTriangles(edges))
    }
  }

  test("alternating CC converges in O(log n) rounds on a high-diameter chain") {
    // a 400-node path: HashMin would need 400 supersteps (= diameter); the
    // star-contraction variant must finish well inside 15 alternating rounds
    // (2·log2(400) ≈ 17 is the paper's bound; observed ~5)
    val chain = (0L until 399L).map(i => (i, i + 1))
    val labels = ConnectedComponents.runAlternating(spark, chain.toDF("src", "dst"),
      maxIter = 15).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 400)
    assert(labels.values.forall(_ == 0L), "every chain vertex labels to vertex 0")
  }

  /** brute-force SCC via Floyd–Warshall reachability — independent of the
    * engine's trim/color/confirm decomposition. */
  def refScc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx   = verts.zipWithIndex.toMap
    val n     = verts.size
    val r     = Array.fill(n, n)(false)
    edges.foreach { case (s, t) => if (s != t) r(idx(s))(idx(t)) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (r(i)(k) && r(k)(j)) r(i)(j) = true
    verts.map { v =>
      val i = idx(v)
      v -> verts.filter(u => u == v || (r(i)(idx(u)) && r(idx(u))(i))).min
    }.toMap
  }

  test("SCC: hand bowtie — two cycles, a bridge, DAG tendrils, a self-loop") {
    // 0→1, cycle {1,2,3}, bridge 3→5, cycle {5,6}, tendril 6→9, self-loop 7
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (3L, 5L),
      (5L, 6L), (6L, 5L), (6L, 9L), (7L, 7L)).toDF("src", "dst")
    val got = StronglyConnectedComponents.run(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 9L -> 9L, 7L -> 7L))
  }

  for (seed <- Seq(13, 29)) {
    test(s"random directed graph seed=$seed: SCC matches Floyd–Warshall reference") {
      val edges = randomGraph(seed, 30, 55) // sparse → nontrivial SCC structure
      val got = StronglyConnectedComponents.run(spark, edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refScc(edges))
    }
  }

  test("landmarkIter: chain distances TO the landmark, unreachable = sentinels") {
    // 3→2→1→0→5; only vid 0 is a landmark (0 % 97 == 0). Forward distance
    // vid→0 is the chain position; 5 cannot reach 0 (edges point away).
    val edges = Seq((3L, 2L), (2L, 1L), (1L, 0L), (0L, 5L)).toDF("src", "dst")
    val got = operators.DocGraph.landmarkIterEdges(spark, edges, 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      0L -> ((1L, 0L, 0L)), 1L -> ((1L, 1L, 1L)), 2L -> ((1L, 2L, 2L)),
      3L -> ((1L, 3L, 3L)), 5L -> ((0L, -1L, -1L))))
  }

  test("linkPrediction: square graph predicts exactly the two diagonals at Jaccard 1") {
    // 1-2, 1-3, 4-2, 4-3: non-adjacent (1,4) share {2,3}, (2,3) share {1,4};
    // every adjacent pair shares 0 neighbors. Jaccard = 2/(2+2-2) = 1.
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L), (4L, 3L)).toDF("src", "dst")
    val got = GraphOps.linkPrediction(edges, minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 4L, 2L, 1000000L), (2L, 3L, 2L, 1000000L)))
  }

  test("linkPrediction: hub cap drops wedges whose CENTER exceeds the degree cap") {
    // star: center 0 — the only wedge center — has degree 6 > cap 5
    val star = (1L to 6L).map(l => (0L, l)).toDF("src", "dst")
    assert(GraphOps.linkPrediction(star, minCommon = 1, maxHubDegree = 5).isEmpty)
    // raising the cap admits the wedges: all 15 leaf pairs share neighbor 0
    assert(GraphOps.linkPrediction(star, minCommon = 1, maxHubDegree = 6).count() == 15L)
  }
}
