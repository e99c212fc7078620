package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph._
import graft.sources.PageSynth

/**
 * Smoke CLI: drives the whole engine end-to-end on a synthetic crawl —
 * pages → extract outlinks → edge table → PageRank / CC / triangles —
 * and prints a one-screen summary. Usage:
 *   sbt "runMain graft.tools.PipelineDemo [nPages] [cores] [ckptDir]"
 *
 * When `ckptDir` is given, ranks are durably checkpointed there via
 * IcebergLikeStore and the run resumes from the latest snapshot if one exists
 * (re-run the same command to watch it resume instead of recompute).
 */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val n     = if (args.length > 0) args(0).toLong else 2000L
    val cores = if (args.length > 1) args(1).toInt else 8
    val ckptDir = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0    = System.nanoTime()
    val store = ckptDir.map(d => new graft.ckpt.IcebergLikeStore(spark, d))
    // §4.1 ingest honoring the BASELINE input contract: the crawl is COMMITTED
    // to the store as a `pages` table first and extraction reads the committed
    // snapshot (not the live generator plan); the edge table is then committed
    // as its own snapshot and downstream jobs consume that.
    val (pages, edges) = store match {
      case Some(st) =>
        // reuse an existing pages snapshot ONLY if it matches the requested
        // crawl size — otherwise a re-run with a different n would silently
        // compute on the stale crawl
        val stale = st.currentSnapshot("pages")
          .exists(m => st.read("pages", Some(m.snapshotId)).count() != n)
        if (st.currentSnapshotId("pages").isEmpty || stale) {
          if (stale) println(s"== existing pages snapshot row count != $n; committing fresh crawl ==")
          st.commit("pages", PageSynth.pages(spark, n).toDF())
        }
        val p = st.read("pages")
        println(s"== pages snapshot ${st.currentSnapshotId("pages").get} ==")
        st.commit("edges", GraphOps.edgesFromPages(p))
        println(s"== committed edges snapshot ${st.currentSnapshotId("edges").get} ==")
        (p, st.read("edges"))
      case None =>
        val p = PageSynth.pages(spark, n).toDF()
        (p, GraphOps.edgesFromPages(p))
    }
    val ckpt = ckptDir
      .map(d => new graft.ckpt.IcebergLikeStore(spark, d).rankCheckpointer())
      .getOrElse(PageRank.NoopCheckpointer)
    ckpt.latest().foreach { case (it, _, _) =>
      println(s"== resuming from durable snapshot at superstep $it ==") }
    val res   = PageRank.run(spark, edges, PageRankConfig(eps = 1e-8, maxIter = 60), ckpt)
    val urls  = GraphOps.vertexUrls(pages)
    println(f"== PageRank converged in ${res.iterations} iters, final L1=${res.metrics.last.l1}%.3e ==")
    println("top 10 pages by rank:")
    res.ranks.join(urls, "vid")
      .orderBy(org.apache.spark.sql.functions.desc("rank"), org.apache.spark.sql.functions.col("vid"))
      .limit(10).collect()
      .foreach(r => println(f"  ${r.getAs[Double]("rank")}%.8f  ${r.getAs[String]("url")}"))

    val cc  = ConnectedComponents.run(spark, edges)
    val nCc = cc.select("label").distinct().count()
    val tri = Triangles.countTriangles(spark, edges)
    val dangling = GraphOps.danglingVertices(edges).count()
    println(s"== vertices=${GraphOps.vertices(edges).count()} edges=${edges.count()} " +
      s"components=$nCc triangles=$tri dangling=$dangling ==")
    println(f"total wall: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
