package graft

import graft.graph.WlRefine

/**
 * WL refinement must equal a sequential simulation of the same rounds
 * (dense rank over (color, cnt, sum, min, max) signatures), strictly REFINE
 * the partition round over round (same color at i+1 implies same at i),
 * stay constant on a vertex-transitive graph, and split a path into its
 * orbit classes.
 */
class WlSpec extends SparkSpec {
  import spark.implicits._

  private def und(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val pairs = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.filter(p => p._1 != p._2)
    pairs.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
  }

  /** Sequential replay: k rounds of dense-rank refinement from degree colors. */
  private def brute(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val nb = und(edges)
    var c: Map[Long, Long] = nb.map { case (v, ns) => v -> ns.size.toLong }
    for (_ <- 1 to k) {
      val sig = nb.keys.map { v =>
        val ncs = nb(v).toSeq.map(c)
        v -> (c(v), ncs.size.toLong, ncs.sum, ncs.min, ncs.max)
      }.toMap
      val ranks = sig.values.toSeq.distinct.sorted.zipWithIndex
        .map { case (s, i) => s -> (i + 1L) }.toMap
      c = sig.map { case (v, s) => v -> ranks(s) }
    }
    c
  }

  private def engine(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    WlRefine.refine(spark, edges.toDF("src", "dst"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val n = 110L
  private val hashed: Seq[(Long, Long)] =
    (0L until n).flatMap { i =>
      (0L to i % 4).map(j => (i, (i * 2654435761L + j * 97L + 13L) % n))
    }.filter { case (a, b) => a != b }.distinct

  test("refine equals the sequential dense-rank replay at k=1,2,3") {
    for (k <- Seq(1, 2, 3))
      assert(engine(hashed, k) == brute(hashed, k), s"WL colors diverged at k=$k")
  }

  test("each round refines the previous partition") {
    val c1 = brute(hashed, 1); val c2 = brute(hashed, 2); val c3 = brute(hashed, 3)
    def refines(fine: Map[Long, Long], coarse: Map[Long, Long]): Boolean =
      fine.keys.forall(u => fine.keys.forall(v =>
        fine(u) != fine(v) || coarse(u) == coarse(v)))
    assert(refines(c2, c1) && refines(c3, c2))
    // and the engine agrees with the refined rounds (checked above); sanity:
    // the class count never decreases
    assert(c2.values.toSet.size >= c1.values.toSet.size)
    assert(c3.values.toSet.size >= c2.values.toSet.size)
  }

  test("vertex-transitive cycle stays monochromatic at every round") {
    val cyc = (0L until 8L).map(i => (i, (i + 1) % 8))
    for (k <- Seq(1, 4))
      assert(engine(cyc, k).values.toSet.size == 1, s"cycle split at k=$k")
  }

  test("path P4 stabilizes into its two orbit classes") {
    val p4 = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val c = engine(p4, 3)
    assert(c(0L) == c(3L) && c(1L) == c(2L) && c(0L) != c(1L), s"got $c")
  }
}
