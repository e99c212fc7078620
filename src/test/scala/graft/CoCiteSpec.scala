package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/**
 * Co-citation / bibliographic coupling: brute-force pair-count parity on a
 * hashed digraph, and the fan cap must EXCLUDE hub centers entirely (the
 * scale guarantee: no center ever emits more than cap² pairs).
 */
class CoCiteSpec extends SparkSpec {
  import spark.implicits._

  private val n = 80L
  private val rawEdges: Seq[(Long, Long)] =
    (0L until n).flatMap { i =>
      (0L to i % 5).map(j => (i, (i * 2654435761L + j * 131L + 7L) % n))
    }.filter { case (a, b) => a != b }.distinct

  private def brutePairs(zn: Seq[(Long, Long)], minCommon: Int, cap: Int): Map[(Long, Long), Long] = {
    val byZ = zn.groupBy(_._1).filter(_._2.size <= cap)
    byZ.values.toSeq
      .flatMap(es => for (a <- es.map(_._2); b <- es.map(_._2) if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minCommon).toMap
  }

  test("coCitation equals the brute replay") {
    val got = GraphOps.coCitation(rawEdges.toDF("src", "dst"), 2, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == brutePairs(rawEdges, 2, 64))
  }

  test("coupling equals the brute replay (dual orientation)") {
    val got = GraphOps.coupling(rawEdges.toDF("src", "dst"), 2, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == brutePairs(rawEdges.map { case (s, d) => (d, s) }, 2, 64))
  }

  test("a hub center above the fan cap emits NO pairs") {
    // hub 100 cites 70 targets (> cap 64); sources 1 and 2 each cite 10/11/12
    val hub  = (0L until 70L).map(t => (100L, 200L + t))
    val tame = for (s <- Seq(1L, 2L); t <- Seq(10L, 11L, 12L)) yield (s, t)
    val got = GraphOps.coCitation((hub ++ tame).toDF("src", "dst"), 2, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((10L, 11L) -> 2L, (10L, 12L) -> 2L, (11L, 12L) -> 2L),
      s"hub pairs leaked or tame pairs lost: $got")
  }
}
