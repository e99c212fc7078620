package graft

import graft.graph._
import graft.sources.PageSynth

/** §4.4 packed-CSR superstep path: bit-level math parity with the Catalyst
  * engine on graphs with dangling vertices and hub skew. */
class CsrPageRankSpec extends SparkSpec {

  private def rankMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("CSR path matches the DataFrame engine to 1e-12 (Zipf graph with dangling)") {
    val edges = PageSynth.edgeList(spark, 1500).toDF()
    val sql = PageRank.run(spark, edges,
      PageRankConfig(eps = 1e-10, maxIter = 40, numPartitions = 4, ckptEvery = 0))
    val csr = CsrPageRank.run(spark, edges, eps = 1e-10, maxIter = 40, numPartitions = 4)
    assert(csr.iterations == sql.iterations,
      s"csr=${csr.iterations} sql=${sql.iterations}")
    val a = rankMap(sql.ranks); val b = rankMap(csr.ranks)
    assert(a.keySet == b.keySet)
    a.foreach { case (v, r) => assert(math.abs(b(v) - r) < 1e-12, s"vid=$v") }
    assert(math.abs(b.values.sum - 1.0) < 1e-9, "Σpr must stay 1")
  }

  test("CSR path matches on a hub-skewed graph") {
    val edges = PageSynth.edgeListWithHubOut(spark, 800, hubOut = 1200).toDF()
    val sql = PageRank.run(spark, edges,
      PageRankConfig(eps = 0.0, maxIter = 12, numPartitions = 4, ckptEvery = 0,
        hubDegreeThreshold = 0))
    val csr = CsrPageRank.run(spark, edges, eps = 0.0, maxIter = 12, numPartitions = 4)
    val a = rankMap(sql.ranks); val b = rankMap(csr.ranks)
    assert(a.keySet == b.keySet)
    a.foreach { case (v, r) => assert(math.abs(b(v) - r) < 1e-12, s"vid=$v") }
    // per-partition lineage stats populated by the fused stats sweep
    assert(csr.metrics.forall(_.partStats.map(_.rows).sum == a.size))
  }
}
