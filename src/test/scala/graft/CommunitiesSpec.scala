package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Communities

/**
 * Modularity ground truth: the two-triangles-plus-bridge graph is small
 * enough to evaluate Newman's formula by hand, and the integer-scaled
 * output must also satisfy the structural identities Σd_c = 2m and
 * Σe_c ≤ m on any input. A second fixture cross-checks the operator
 * against a local brute-force evaluation of the same formula.
 */
class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  // two triangles {0,1,2} and {3,4,5} joined by one bridge (2,3); the raw
  // edge list carries a duplicate reverse edge and a self-loop that the
  // canonical undirected set must absorb
  private def bridgeEdges: DataFrame = Seq(
    (0L, 1L), (1L, 2L), (2L, 0L), (1L, 0L), (2L, 2L),
    (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L)
  ).toDF("src", "dst")

  private def bridgeMember: DataFrame = Seq(
    (0L, "A"), (1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"), (5L, "B")
  ).toDF("vid", "comm")

  test("hand-computed modularity of two triangles with a bridge") {
    // m=7 und edges; e_A=e_B=3, d_A=d_B=7, so Q·4m² = (4·7·3 − 49)·2 = 70
    val rows = Communities.modularity(spark, bridgeEdges, bridgeMember)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(("A", 3L, 7L, 35L), ("B", 3L, 7L, 35L)))
  }

  test("structural identities: sum(d_c) = 2m, sum(e_c) <= m") {
    val und = graph.GraphOps.undirected(bridgeEdges)
    val m = und.count()
    val rows = Communities.modularity(spark, bridgeEdges, bridgeMember).collect()
    assert(rows.map(_.getLong(2)).sum == 2 * m)
    assert(rows.map(_.getLong(1)).sum <= m)
  }

  test("matches local brute-force Newman formula on a hashed graph") {
    val edges = (0L until 40L).map(i => (i % 20, (i * 7 + 3) % 20)).toDF("src", "dst")
    val member = (0L until 20L).map(v => (v, s"c${v % 3}")).toDF("vid", "comm")
    val got = Communities.modularity(spark, edges, member)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // brute force over the collected canonical undirected set
    val und = graph.GraphOps.undirected(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val m = und.size.toLong
    val comm = (0L until 20L).map(v => v -> s"c${v % 3}").toMap
    val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val eC = und.toSeq.filter { case (a, b) => comm(a) == comm(b) }
      .groupBy { case (a, _) => comm(a) }.map { case (c, xs) => c -> xs.size.toLong }
    val dC = deg.toSeq.groupBy { case (v, _) => comm(v) }
      .map { case (c, xs) => c -> xs.map(_._2).sum }
    val want = dC.map { case (c, d) =>
      val e = eC.getOrElse(c, 0L)
      (c, e, d, 4 * m * e - d * d)
    }.toSet
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("hand-computed conductance of two triangles with a bridge") {
    // cut edge set = {(2,3)} — one cut edge per side; vol_A = vol_B = 7,
    // 2m = 14 so min(vol, 2m−vol) = 7; φ_ppm = ⌊10⁶/7⌋ = 142857
    val rows = Communities.conductance(spark, bridgeEdges, bridgeMember)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(("A", 1L, 7L, 142857L), ("B", 1L, 7L, 142857L)))
  }

  test("conductance matches a local brute force on a hashed graph") {
    val edges = (0L until 40L).map(i => (i % 20, (i * 7 + 3) % 20)).toDF("src", "dst")
    val member = (0L until 20L).map(v => (v, s"c${v % 3}")).toDF("vid", "comm")
    val got = Communities.conductance(spark, edges, member)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val und = graph.GraphOps.undirected(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val m = und.size.toLong
    val comm = (0L until 20L).map(v => v -> s"c${v % 3}").toMap
    val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val vol = deg.toSeq.groupBy { case (v, _) => comm(v) }
      .map { case (c, xs) => c -> xs.map(_._2).sum }
    val cut = und.toSeq.filter { case (a, b) => comm(a) != comm(b) }
      .flatMap { case (a, b) => Seq(comm(a), comm(b)) }
      .groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    val want = vol.map { case (c, v) =>
      val cu = cut.getOrElse(c, 0L)
      val mn = math.min(v, 2 * m - v)
      (c, cu, v, if (mn > 0) 1000000L * cu / mn else -1L)
    }.toSet
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("conductance sentinel: a single community holding all volume reports -1") {
    val member1 = (0L to 5L).map(v => (v, "ALL")).toDF("vid", "comm")
    val rows = Communities.conductance(spark, bridgeEdges, member1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("ALL", 0L, 14L, -1L)))
  }

  test("contract keeps the diagonal and counts directed links") {
    val got = Communities.contract(bridgeEdges, bridgeMember)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // directed, self-loop (2,2) removed by edges' caller? contract takes the
    // RAW directed table — here (2,2) stays as an A→A link and (1,0) is a
    // distinct directed row from (0,1)
    assert(got == Set(("A", "A", 5L), ("B", "B", 3L), ("A", "B", 1L)))
  }
}
