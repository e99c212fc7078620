package graft

import org.apache.spark.sql.SparkSession

import graft.graph.{PageRank, PageRankConfig}
import graft.sources.PageSynth

/**
 * Round bench (driver contract): times every SparkEntry query on
 * `SPARK_GRAFT_SF_DIR`, plus the headline metric of BASELINE.md — PageRank
 * superstep throughput (edges/sec/superstep) on a deterministic synthetic
 * Zipf link graph large enough that shuffle work dominates fixed job
 * overhead. Prints exactly ONE JSON line.
 *
 * Hygiene rules (each exists because its absence skewed a measured round):
 *  - the headline superstep bench runs FIRST, before the 37-query sweep, so
 *    no residual cached blocks from other operators pressure its run;
 *  - the headline is measured `repeats` times and the best run is reported
 *    (this box has exogenous load bursts; min-of-k isolates engine cost);
 *  - `spark.catalog.clearCache()` between queries so one operator's cache
 *    can't poison the rest of the sweep;
 *  - a failing query records -1, never a silent partial wall time;
 *  - /proc/loadavg before/after is embedded for contention context.
 *
 * Keys beyond per-query seconds:
 *   `pagerank_superstep_bench`      — seconds of the best measured run
 *   `pagerank_edges_per_sec`        — whole-run edges/sec/superstep (headline)
 *   `pagerank_median_edges_per_sec` — median-superstep rate of the best run
 *   `pagerank_salted_edges_per_sec` — same engine on a hub-skewed graph where
 *                                     the salted-join path is actually active
 * `SPARK_GRAFT_CSR_BENCH=1` additionally times the §4.4 packed-CSR engine
 * under the same warmed best-of-k protocol (default off — EngineAB is the
 * matched-window A/B instrument for that comparison).
 * Scaling-efficiency evidence (local[8] vs local[32]) is produced by
 * [[graft.tools.ScalingBench]] and recorded in BENCH/BASELINE.md.
 */
object Bench {

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(",")
    catch { case _: Throwable => "" }

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

    val loadStart = loadavg()
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    // keys that are rates/counts/ratios, NOT wall seconds — excluded from
    // `total` explicitly (a name-suffix convention silently breaks the first
    // time a metric key without the magic suffix is added)
    val metricKeys = scala.collection.mutable.Set[String]()
    def metric(k: String, v: Double): Unit = { results(k) = v; metricKeys += k }

    // ---- headline: superstep throughput on a ~9M-edge Zipf graph ----------
    val nPages  = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "2000000").toLong
    val iters   = 8
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt
    val edges   = PageSynth.edgeList(spark, nPages)
    val nEdges  = edges.count()
    // warm-up run materializes the partitioned cache + JIT
    PageRank.run(spark, edges.toDF(), PageRankConfig(eps = 0.0, maxIter = 2, ckptEvery = 0))
    // best single run wins; its OWN median superstep is reported (min-sec and
    // min-median from different runs would mix two load contexts into one
    // "run" that never happened)
    var bestSec = Double.MaxValue
    var bestMedMs = Long.MaxValue
    (1 to repeats).foreach { _ =>
      val t0  = System.nanoTime()
      val res = PageRank.run(spark, edges.toDF(),
        PageRankConfig(eps = 0.0, maxIter = iters, ckptEvery = 0))
      val sec = (System.nanoTime() - t0) / 1e9
      val walls = res.metrics.map(_.wallMs).sorted
      if (sec < bestSec) { bestSec = sec; bestMedMs = walls(walls.length / 2) }
    }
    results("pagerank_superstep_bench")      = bestSec
    metric("pagerank_edges_per_sec",           nEdges.toDouble * iters / bestSec)
    metric("pagerank_median_edges_per_sec",    nEdges.toDouble / (bestMedMs / 1000.0))
    spark.catalog.clearCache()

    // §4.4 packed-CSR engine (measured alternative; Catalyst is the default —
    // BENCH/BASELINE.md A/B). OFF by default: a single cold run here published
    // a contended 478 k/s against EngineAB's matched-window 4.57 M/s and added
    // 152 s to the official bench wall. EngineAB is the A/B instrument; set
    // SPARK_GRAFT_CSR_BENCH=1 for an in-bench number (warmed, best-of-k,
    // same-run median — same protocol as the Catalyst headline above).
    if (sys.env.get("SPARK_GRAFT_CSR_BENCH").contains("1")) {
      graft.graph.CsrPageRank.run(spark, edges.toDF(), eps = 0.0, maxIter = 2) // warm-up
      var csrBestSec = Double.MaxValue
      var csrBestMedMs = Long.MaxValue
      (1 to repeats).foreach { _ =>
        val t0 = System.nanoTime()
        val res = graft.graph.CsrPageRank.run(spark, edges.toDF(), eps = 0.0, maxIter = iters)
        val sec = (System.nanoTime() - t0) / 1e9
        val walls = res.metrics.map(_.wallMs).sorted
        if (sec < csrBestSec) { csrBestSec = sec; csrBestMedMs = walls(walls.length / 2) }
      }
      results("pagerank_csr_bench")            = csrBestSec
      metric("pagerank_csr_edges_per_sec",       nEdges.toDouble * iters / csrBestSec)
      metric("pagerank_csr_median_edges_per_sec", nEdges.toDouble / (csrBestMedMs / 1000.0))
      spark.catalog.clearCache()
    }

    // ---- salted path: hub-skewed graph where hub detection actually fires --
    val hubPages = nPages / 4
    val hubEdges = PageSynth.edgeListWithHubOut(spark, hubPages, hubOut = 200000)
    val nHubE    = hubEdges.count()
    PageRank.run(spark, hubEdges.toDF(), PageRankConfig(eps = 0.0, maxIter = 2, ckptEvery = 0))
    val ts0 = System.nanoTime()
    val saltRes = PageRank.run(spark, hubEdges.toDF(),
      PageRankConfig(eps = 0.0, maxIter = 4, ckptEvery = 0))
    val saltedSec = (System.nanoTime() - ts0) / 1e9
    results("pagerank_salted_bench")         = saltedSec
    metric("pagerank_salted_edges_per_sec",    nHubE.toDouble * 4 / saltedSec)
    // proof the salted path was active, not dead code (hub set non-empty)
    metric("pagerank_salted_hub_count",        saltRes.hubCount.toDouble)
    spark.catalog.clearCache()

    // ---- per-query sweep ----------------------------------------------------
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      results(name) = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      spark.catalog.clearCache()
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // total is wall seconds only — explicitly-registered metric keys (rates,
    // counts) and -1 failure markers are excluded
    val total = results.collect {
      case (k, v) if !metricKeys.contains(k) && v >= 0 => v
    }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","load_start":"$loadStart","load_end":"${loadavg()}"}""")
    spark.stop()
  }
}
