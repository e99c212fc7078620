package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{CsrPageRank, PageRank, PageRankConfig}
import graft.sources.PageSynth

/**
 * Matched-window A/B of the two superstep engines (Catalyst vs §4.4
 * packed-CSR): alternates engines within ONE JVM so exogenous load bursts
 * hit both fairly, reports best-of-k per engine with per-run loadavg.
 *
 *   sbt "runMain graft.tools.EngineAB [cores] [nPages] [iters] [rounds]"
 */
object EngineAB {
  private def loadavg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val cores  = if (args.length > 0) args(0).toInt else 32
    val nPages = if (args.length > 1) args(1).toLong else 2000000L
    val iters  = if (args.length > 2) args(2).toInt else 8
    val rounds = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val edges  = PageSynth.edgeList(spark, nPages, numPartitions = cores).toDF()
    val nEdges = edges.count()
    val cfg = PageRankConfig(eps = 0.0, maxIter = iters, ckptEvery = 0, numPartitions = cores)
    // warm both paths
    PageRank.run(spark, edges, cfg.copy(maxIter = 2))
    CsrPageRank.run(spark, edges, eps = 0.0, maxIter = 2, numPartitions = cores)

    val results = scala.collection.mutable.Map[String, List[(Double, Long, Double)]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to rounds; eng <- Seq("sql", "csr")) {
      val l0 = loadavg()
      val t0 = System.nanoTime()
      val ms = eng match {
        case "sql" => PageRank.run(spark, edges, cfg).metrics
        case _     => CsrPageRank.run(spark, edges, eps = 0.0, maxIter = iters,
          numPartitions = cores).metrics
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val med = ms.map(_.wallMs).sorted.apply(ms.length / 2)
      results(eng) = (sec, med, l0) :: results(eng)
      System.err.println(f"$eng%s run: $sec%.1f s, median ${med}ms, load $l0%.1f")
    }
    val out = Seq("sql", "csr").map { eng =>
      val rs   = results(eng)
      val best = rs.minBy(_._1)
      val runs = rs.reverse.map { case (s, m, l) =>
        s"""{"sec":$s,"median_ms":$m,"load":$l}""" }.mkString("[", ",", "]")
      s""""$eng":{"best_sec":${best._1},"best_median_ms":${best._2},"best_median_edges_per_sec":${nEdges * 1000.0 / best._2},"runs":$runs}"""
    }.mkString(",")
    println(s"""{"bench":"engine_ab","cores":$cores,"edges":$nEdges,"supersteps":$iters,$out}""")
    spark.stop()
  }
}
