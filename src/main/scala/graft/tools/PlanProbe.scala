package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph._
import graft.sources.PageSynth

/** Prints the physical plan of one PageRank superstep — used to keep the
  * per-superstep exchange count honest (target: the groupBy(dst) shuffle only). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val edges = GraphOps.partitionForIteration(
      PageSynth.edgeList(spark, 50000).toDF(), 8)
    edges.count()
    val outDeg = GraphOps.outDegrees(edges).repartition(8, col("vid")).persist()
    val verts  = GraphOps.vertices(edges).repartition(8, col("vid")).persist()
    val n      = verts.count()
    val ranks  = verts.select(col("vid"), lit(1.0 / n).as("rank")).localCheckpoint(true)

    val rankDeg = ranks.join(outDeg, "vid")
      .select(col("vid"), (col("rank") / col("outDeg")).as("w"))
    val contribs = edges.join(rankDeg, edges("src") === rankDeg("vid"))
      .select(edges("dst"), rankDeg("w"))
    val sums = contribs.groupBy("dst").agg(sum(col("w")).as("s"))
    println("==== superstep sums plan ====")
    sums.explain("formatted")

    sums.persist().count()
    val next = ranks.join(sums, ranks("vid") === sums("dst"), "left")
      .select(ranks("vid"),
        (lit(0.15 / n) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("rank"))
    println("==== new-ranks plan ====")
    next.explain("formatted")
    spark.stop()
  }
}
