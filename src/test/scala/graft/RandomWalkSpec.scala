package graft

import graft.operators.RandomWalk

/** Hand-checkable walk semantics; cross-engine parity is q_randwalk3's
  * oracle row — this pins the sentinel algebra and determinism. */
class RandomWalkSpec extends SparkSpec {
  import spark.implicits._

  test("dead ends emit -1 and stay -1; single-option steps are forced") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("seed")
    val got = RandomWalk.walk(edges, seeds, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // 1 → 2 → 3 → dead; 5 has no out-edges at all
    assert(got == Set((1L, 2L, 3L, -1L), (5L, -1L, -1L, -1L)))
  }

  test("walks are deterministic: same input twice gives identical rows") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 2L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 2L, 3L, 4L).toDF("seed")
    val a = RandomWalk.walk(edges, seeds, 4).collect().map(_.toSeq).toSet
    val b = RandomWalk.walk(edges, seeds, 4).collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.size == 4)
  }
}
