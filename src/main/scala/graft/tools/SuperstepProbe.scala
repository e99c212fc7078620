package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph._
import graft.operators.DocGraph

/** Decomposes q_pagerank's cost at the bench scale: layout wall, per-superstep
  * wall distribution, and broadcast-vs-shuffle_hash strategy A/B — guide §1
  * (measure first) for the single biggest sweep query.
  *   sbt "runMain graft.tools.SuperstepProbe [sfDir] [iters] [cores]"
  */
object SuperstepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 40
    val cores = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(tag: String, strategy: String): Unit = {
      val t0 = System.nanoTime()
      val e  = DocGraph.edges(spark, sfDir)
      val res = PageRank.run(spark, e,
        PageRankConfig(eps = 0.0, maxIter = iters, ckptEvery = 0, joinStrategy = strategy))
      val n = res.ranks.count()
      val total = (System.nanoTime() - t0) / 1e9
      val walls = res.metrics.map(_.wallMs)
      val sorted = walls.sorted
      println(f"[probe] $tag strategy=$strategy rows=$n total=$total%.2f s " +
        f"supersteps=${walls.size} sumstep=${walls.sum / 1000.0}%.2f s " +
        f"med=${sorted(sorted.size / 2)} ms min=${sorted.head} max=${sorted.last} ms " +
        f"layout+rest=${total - walls.sum / 1000.0}%.2f s")
      spark.catalog.clearCache()
    }
    once("warm0", "auto")
    once("auto1", "auto"); once("auto2", "auto")
    once("shj1", "shuffle_hash"); once("shj2", "shuffle_hash")
    once("bc1", "broadcast"); once("bc2", "broadcast")
    spark.stop()
  }
}
