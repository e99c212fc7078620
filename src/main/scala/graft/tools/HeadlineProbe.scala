package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{PageRank, PageRankConfig}
import graft.sources.PageSynth

/** Headline-scale strategy A/B under the Bench protocol (same graph, same
  * warmup, best-of-k): shuffle_hash (today's auto pick at 2M vertices) vs
  * broadcast + dst-laid edges (r6 zero-shuffle superstep).
  *   sbt "runMain graft.tools.HeadlineProbe [nPages] [iters] [cores]"
  */
object HeadlineProbe {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 2000000L
    val iters  = if (args.length > 1) args(1).toInt else 8
    val cores  = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges  = PageSynth.edgeList(spark, nPages)
    val nEdges = edges.count()
    println(s"[probe] nPages=$nPages nEdges=$nEdges")

    def leg(tag: String, strategy: String): Unit = {
      val r = PageRank.run(spark, edges.toDF(),
        PageRankConfig(eps = 0.0, maxIter = iters, ckptEvery = 0, joinStrategy = strategy))
      val walls = r.metrics.map(_.wallMs).sorted
      val total = r.metrics.map(_.wallMs).sum / 1000.0
      println(f"[probe] $tag strategy=$strategy sumstep=$total%.2f s " +
        f"med=${walls(walls.length / 2)} ms eps_med=${nEdges * 1000.0 / walls(walls.length / 2)}%.0f")
      spark.catalog.clearCache()
    }
    // warmup matching Bench (2 iters)
    PageRank.run(spark, edges.toDF(), PageRankConfig(eps = 0.0, maxIter = 2, ckptEvery = 0))
    leg("shj1", "shuffle_hash"); leg("shj2", "shuffle_hash")
    leg("bc1", "broadcast"); leg("bc2", "broadcast")
    leg("shj3", "shuffle_hash"); leg("bc3", "broadcast")
    spark.stop()
  }
}
