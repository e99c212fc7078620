package graft

import org.apache.spark.sql.functions._

import graft.graph.Truss

/**
 * k-truss peel against hand-checkable fixtures, including the cascade case
 * (an edge whose support only drops below threshold AFTER round 1 removes a
 * neighboring edge — the behavior that distinguishes iterative truss peel
 * from a one-shot support filter).
 */
class TrussSpec extends SparkSpec {
  import spark.implicits._

  private def peelSet(edges: Seq[(Long, Long)], k: Int, rounds: Int): Set[(Long, Long)] =
    Truss.peel(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("K4 is a 4-truss; a lone triangle is not") {
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val tri = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    // every K4 edge has support 2 → survives k=4; triangle edges have
    // support 1 → all peeled in round 1
    assert(peelSet(k4 ++ tri, 4, 2) == k4.toSet)
    // at k=3 both survive (every edge is in ≥1 triangle)
    assert(peelSet(k4 ++ tri, 3, 2) == (k4 ++ tri).toSet)
  }

  test("cascading deletion: losing a neighbor edge kills the second triangle") {
    // two triangles sharing edge (1,2): {1,2,3} and {1,2,4}, plus a pendant
    // edge (3,5). k=4 (support ≥2): only (1,2) has support 2 in round 1, but
    // its triangles' other edges (support 1) are peeled that same round, so
    // round 2 removes (1,2) too — the fixpoint is empty.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 5L))
    assert(peelSet(g, 4, 1) == Set((1L, 2L)))  // one round: not yet cascaded
    assert(peelSet(g, 4, 2) == Set.empty)      // cascade completes
  }

  test("direction and duplication do not matter — peel canonicalizes") {
    val tri = Seq((3L, 1L), (1L, 2L), (2L, 3L), (2L, 1L)) // reversed + dup
    assert(peelSet(tri, 3, 2) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
