package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph._
import graft.operators.DocGraph

/** A/B probe: fixed-k PageRank as (a) the one-job-per-superstep engine
  * (PageRank.run — today's q_pagerank path) vs (b) a zero-actions-per-
  * superstep lazy localCheckpoint chain with the dangling-mass scalar
  * computed IN-PLAN (constant-key broadcast equi-join, bfsIter's
  * discipline). Prints totals, result parity vs (a) at the e7 pin, and
  * whether the scalar join planned as BNLJ (banned) or BHJ.
  *   sbt "runMain graft.tools.DeferredPrProbe [sfDir] [k] [cores]"
  */
object DeferredPrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k     = if (args.length > 1) args(1).toInt else 40
    val cores = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def deferred(partsOverride: Int = 0): DataFrame = {
      val (e, _, parts) =
        if (partsOverride > 0) {
          val e0 = GraphOps.partitionForIteration(DocGraph.edges(spark, sfDir)
            .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")), partsOverride)
          (e0, e0.count(), partsOverride)
        } else GraphOps.layoutForIteration(
        DocGraph.edges(spark, sfDir)
          .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
        spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      val outdeg = GraphOps.outDegrees(e).repartition(parts, col("vid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val verts = GraphOps.vertices(e).repartition(parts, col("vid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = verts.count()
      val d = 0.85
      val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
      var r = verts.join(outdeg, Seq("vid"), "left")
        .select(col("vid"), lit(1.0 / n).as("rank"), col("outDeg"))
        .localCheckpoint(false)
      inter += r
      var lastPlan: String = ""
      for (_ <- 1 to k) {
        val tm = r.filter(col("outDeg").isNotNull)
          .agg(sum(col("rank")).as("tm")).select(coalesce(col("tm"), lit(0.0)).as("tm"))
          .withColumn("__k", (col("tm") * 0).cast("int"))
        val rankDeg = r.filter(col("outDeg").isNotNull)
          .select(col("vid"), (col("rank") / col("outDeg")).as("w"))
        val sums = e.join(rankDeg.hint("shuffle_hash"), e("src") === rankDeg("vid"))
          .groupBy(e("dst").as("dvid")).agg(sum(col("w")).as("s"))
        val dang = greatest(lit(0.0), lit(1.0) - col("tm"))
        val base = lit(1.0 - d) / lit(n.toDouble) + (lit(d) * dang) / lit(n.toDouble)
        val newRank = base + lit(d) * coalesce(col("s"), lit(0.0))
        val next = r.join(sums.hint("shuffle_hash"), r("vid") === sums("dvid"), "left")
          .withColumn("__k", (r("vid") * 0).cast("int"))
          .join(broadcast(tm), Seq("__k"))
          .select(r("vid"), newRank.as("rank"), r("outDeg"))
        lastPlan = next.queryExecution.sparkPlan.toString
        r = next.localCheckpoint(false)
        inter += r
      }
      println("[probe] scalar-join BNLJ=" + lastPlan.contains("BroadcastNestedLoopJoin")
        + " BHJ=" + lastPlan.contains("BroadcastHashJoin")
        + " cartesian=" + lastPlan.contains("CartesianProduct"))
      val out = r.select(col("vid"),
        floor(col("rank") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"pr${k}e7"))
        .localCheckpoint(true)
      inter.foreach(GraphOps.freeCheckpoint)
      e.unpersist(false); outdeg.unpersist(false); verts.unpersist(false)
      out
    }

    def time(tag: String)(f: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val df = f
      val n  = df.count()
      println(f"[probe] $tag rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      df
    }

    time("warm-classic")(DocGraph.prIter(spark, sfDir, k))
    val a = time("classic1")(DocGraph.prIter(spark, sfDir, k)).localCheckpoint(true)
    time("classic2")(DocGraph.prIter(spark, sfDir, k))
    val b = time("deferred1")(deferred())
    time("deferred2")(deferred())
    time("deferred-p1a")(deferred(1))
    time("deferred-p1b")(deferred(1))
    time("deferred-p2")(deferred(2))
    val mism = a.join(b, Seq("vid"))
      .filter(a(s"pr${k}e7") =!= b(s"pr${k}e7")).count()
    val cntA = a.count(); val cntB = b.count()
    println(s"[probe] parity: rowsA=$cntA rowsB=$cntB e7-mismatches=$mism")
    spark.stop()
  }
}
