package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{PageRank, PageRankConfig}
import graft.sources.PageSynth

/** Times the Bench salted leg shape (hub-skewed 500k-page graph, 4 iters,
  * auto strategy → broadcast regime) — the leg the r6 dst-relayout touches.
  *   sbt "runMain graft.tools.SaltedProbe [cores]"
  */
object SaltedProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hubEdges = PageSynth.edgeListWithHubOut(spark, 500000L, hubOut = 200000)
    val nHubE = hubEdges.count()
    println(s"[probe] salted graph edges=$nHubE")
    PageRank.run(spark, hubEdges.toDF(), PageRankConfig(eps = 0.0, maxIter = 2, ckptEvery = 0))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val r = PageRank.run(spark, hubEdges.toDF(),
        PageRankConfig(eps = 0.0, maxIter = 4, ckptEvery = 0))
      println(f"[probe] salted$i wall=${(System.nanoTime() - t0) / 1e9}%.2f s hubs=${r.hubCount}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
