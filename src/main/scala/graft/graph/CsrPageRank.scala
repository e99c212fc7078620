package graft.graph

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/**
 * §4.4 literal packed-CSR superstep — the documented `mapPartitions` escape
 * hatch, implemented to MEASURE against the Catalyst path (PageRank.run),
 * not to replace it. Same math, same results (CsrPageRankSpec asserts
 * equality to 1e-12); different physical execution:
 *
 *  - edges live as ONE CSR block per partition (primitive `Array[Long]` /
 *    `Array[Int]` — no Tungsten rows, no codegen, no per-row iterator);
 *  - ranks are an `RDD[(Long, Double)]` hash-partitioned like the CSR srcs,
 *    so the gather side needs no shuffle — identical to the SQL design;
 *  - the scatter accumulates into an open-addressing long→double table per
 *    partition (the map-side partial aggregate, hand-rolled), then ONE
 *    `reduceByKey` shuffle of ≤O(|V|) partials — identical communication
 *    volume to the SQL path's groupBy(dst);
 *  - the closing pass computes new ranks, L1, and transmitted mass
 *    per-partition in one `zipPartitions` sweep (the SQL path's fused
 *    closing aggregate, hand-rolled).
 *
 * What this buys at local[32]: no UnsafeRow encode/decode on the O(|E|)
 * inner loop. What it costs: no AQE, no codegen evolution for free, RDD
 * serialization of blocks if they spill. Benchmark result is recorded in
 * BENCH/BASELINE.md; the DataFrame path stays the default engine.
 */
object CsrPageRank {

  /** One partition's adjacency in CSR form: srcs[i] owns dsts[offs(i) until offs(i+1)). */
  final case class CsrBlock(srcs: Array[Long], offs: Array[Int], dsts: Array[Long]) {
    def nSrcs: Int = srcs.length
  }

  /** Open-addressing long→double accumulator (linear probing, power-of-two
    * capacity). `Long.MinValue` is handled out-of-band so any vid is legal. */
  final class LongDoubleAcc(expected: Int) {
    private var cap  = Integer.highestOneBit(math.max(16, expected * 2) - 1) << 1
    private var mask = cap - 1
    private var keys = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var vals = new Array[Double](cap)
    private var n    = 0
    private var hasMin = false
    private var minVal = 0.0

    private def grow(): Unit = {
      val ok = keys; val ou = used; val ov = vals
      cap <<= 1; mask = cap - 1
      keys = new Array[Long](cap); used = new Array[Boolean](cap); vals = new Array[Double](cap)
      n = 0
      var i = 0
      while (i < ok.length) { if (ou(i)) add(ok(i), ov(i)); i += 1 }
    }

    def add(k: Long, v: Double): Unit = {
      if (k == Long.MinValue) { hasMin = true; minVal += v; return }
      if (n * 2 >= cap) grow()
      var i = (java.lang.Long.hashCode(k * 0x9E3779B97F4A7C15L) & mask)
      while (used(i) && keys(i) != k) i = (i + 1) & mask
      if (!used(i)) { used(i) = true; keys(i) = k; n += 1 }
      vals(i) += v
    }

    def get(k: Long, default: Double): Double = {
      if (k == Long.MinValue) return if (hasMin) minVal else default
      var i = (java.lang.Long.hashCode(k * 0x9E3779B97F4A7C15L) & mask)
      while (used(i) && keys(i) != k) i = (i + 1) & mask
      if (used(i)) vals(i) else default
    }

    def iterator: Iterator[(Long, Double)] = {
      val base = (0 until cap).iterator.filter(used(_)).map(i => (keys(i), vals(i)))
      if (hasMin) base ++ Iterator.single((Long.MinValue, minVal)) else base
    }
  }

  /** Build one CSR block from a partition's (src, dst) pairs. */
  private def buildBlock(it: Iterator[(Long, Long)]): CsrBlock = {
    val pairs = it.toArray
    java.util.Arrays.sort(pairs, (a: (Long, Long), b: (Long, Long)) =>
      java.lang.Long.compare(a._1, b._1))
    val srcs = new scala.collection.mutable.ArrayBuffer[Long]()
    val offs = new scala.collection.mutable.ArrayBuffer[Int]()
    val dsts = new Array[Long](pairs.length)
    var i = 0
    var prev = 0L
    var first = true
    while (i < pairs.length) {
      val (s, d) = pairs(i)
      if (first || s != prev) { srcs += s; offs += i; prev = s; first = false }
      dsts(i) = d
      i += 1
    }
    offs += pairs.length
    CsrBlock(srcs.toArray, offs.toArray, dsts)
  }

  final case class CsrResult(ranks: DataFrame, metrics: Seq[IterMetrics], iterations: Int)

  def run(spark: SparkSession, edges: DataFrame,
          eps: Double = 1e-9, maxIter: Int = 200,
          numPartitions: Int = 0, damping: Double = 0.85): CsrResult = {
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val part = new HashPartitioner(parts)

    // --- static layout: one CSR block per hash(src) partition. Edge
    // multiplicity is PRESERVED, exactly like PageRank.run (dedup is the
    // ingest layer's job — GraphOps.edgesFromPages/DocGraph already dedup)
    val pairs = edges.select("src", "dst").as[(Long, Long)].rdd
    val csr: RDD[CsrBlock] = pairs
      .partitionBy(part)
      .mapPartitions(it => Iterator.single(buildBlock(it.map(kv => (kv._1, kv._2)))), true)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // vertex set, co-partitioned with the CSR srcs
    val verts: RDD[Long] = pairs.flatMap(p => Iterator(p._1, p._2)).distinct()
      .map(v => (v, ()))
      .partitionBy(part)
      .keys
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = verts.count()
    require(n > 0, "empty graph")
    val edgeCount = csr.map(_.dsts.length.toLong).sum().toLong
    val d = damping

    var ranks: RDD[(Long, Double)] = verts.map(v => (v, 1.0 / n))
    ranks = ranks.localCheckpoint()
    // transmitted mass of current ranks: Σ rank over vids that are CSR srcs
    var transmitted = csr.zipPartitions(ranks, true) { (cIt, rIt) =>
      val b = cIt.next()
      val isSrc = new LongDoubleAcc(b.nSrcs)
      var i = 0
      while (i < b.nSrcs) { isSrc.add(b.srcs(i), 1.0); i += 1 }
      var t = 0.0
      rIt.foreach { case (v, r) => if (isSrc.get(v, 0.0) > 0) t += r }
      Iterator.single(t)
    }.sum()

    var metrics = Vector.empty[IterMetrics]
    var l1   = Double.MaxValue
    var iter = 0
    while (l1 >= eps && iter < maxIter) {
      val t0 = System.nanoTime()
      val dangling = math.max(0.0, 1.0 - transmitted)
      val base = (1.0 - d) / n + d * dangling / n

      // gather-scatter: local rank lookup (co-partitioned — no shuffle),
      // CSR walk, per-partition partial sums (the map-side combine).
      // preservesPartitioning MUST be false: the output is keyed by dst, not
      // src — claiming the inherited src partitioning would make the
      // reduceByKey below skip its shuffle and silently drop every
      // cross-partition contribution.
      val partials: RDD[(Long, Double)] = csr.zipPartitions(ranks, false) { (cIt, rIt) =>
        val b = cIt.next()
        val rank = new LongDoubleAcc(1 << 12)
        rIt.foreach { case (v, r) => rank.add(v, r) }
        val acc = new LongDoubleAcc(1 << 12)
        var i = 0
        while (i < b.nSrcs) {
          val s  = b.srcs(i)
          val lo = b.offs(i); val hi = b.offs(i + 1)
          val w  = rank.get(s, 0.0) / (hi - lo)
          var j  = lo
          while (j < hi) { acc.add(b.dsts(j), w); j += 1 }
          i += 1
        }
        acc.iterator
      }
      val sums = partials.reduceByKey(part, _ + _) // the ONE shuffle per superstep

      // new ranks: old rank side only provides the vertex set (left-outer
      // semantics of the SQL path), sums provide the aggregated contributions
      val nextRanks: RDD[(Long, Double)] = ranks.zipPartitions(sums, true) {
        (rIt, sIt) =>
          val s = new LongDoubleAcc(1 << 12)
          sIt.foreach { case (v, x) => s.add(v, x) }
          rIt.map { case (v, _) => (v, base + d * s.get(v, 0.0)) }
      }
      val next = nextRanks.localCheckpoint()

      // stats pass over the (now materialized) next state — one job total:
      // the localCheckpoint materializes during this first action
      val stats = next.zipPartitions(ranks, csr, true) { (nIt, oIt, cIt) =>
        val b = cIt.next()
        val isSrc = new LongDoubleAcc(b.nSrcs)
        var i = 0
        while (i < b.nSrcs) { isSrc.add(b.srcs(i), 1.0); i += 1 }
        val old = new LongDoubleAcc(1 << 12)
        oIt.foreach { case (v, r) => old.add(v, r) }
        var l = 0.0; var t = 0.0; var rows = 0L
        nIt.foreach { case (v, r) =>
          l += math.abs(r - old.get(v, 0.0))
          if (isSrc.get(v, 0.0) > 0) t += r
          rows += 1
        }
        Iterator.single((l, t, rows))
      }.collect()
      l1 = stats.iterator.map(_._1).sum
      transmitted = stats.iterator.map(_._2).sum
      val partStats = stats.zipWithIndex.map { case ((_, _, rows), pid) => PartStat(pid, rows) }.toSeq

      val wallMs = (System.nanoTime() - t0) / 1000000
      metrics = metrics :+ IterMetrics(iter, l1, dangling, edgeCount, wallMs, partStats)
      ranks.unpersist(false)
      ranks = next
      iter += 1
    }

    val out = ranks.toDF("vid", "rank")
    csr.unpersist(false)
    verts.unpersist(false)
    CsrResult(out, metrics, iter)
  }
}
