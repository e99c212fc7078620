package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.ConnectedComponents
import graft.operators.Dedup

/** Cost decomposition of the q_dup_clusters pipeline at bench scale:
  * candidate band, exact-Jaccard pairs, CC on the pair graph, final joins.
  *   sbt "runMain graft.tools.DupClusterProbe [sfDir] [cores]"
  */
object DupClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cores = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val dd = docs.select(col("doc_id"), col("text"))
      val cand = dd.select(col("doc_id").as("a"))
        .withColumn("k", explode(array(lit(1L), lit(2L), lit(3L))))
        .select(col("a"), (col("a") + col("k")).as("b"))
        .join(dd.select(col("doc_id").as("b")), Seq("b"), "left_semi")
      t("cand.count")(cand.count())
      val jc = Dedup.jaccardCounts(dd, cand, "doc_id", "text")
        .select(col("a"), col("b"),
          call_function("div", col("inter") * lit(1000000L),
            col("sza") + col("szb") - col("inter")).as("ppm"))
        .filter(col("ppm") >= 8000L)
      val pairs = t("pairs materialize")(jc.localCheckpoint(true))
      t("pairs.count")(pairs.count())
      val cc = t("cc.run")(ConnectedComponents.run(spark,
        pairs.select(col("a").as("src"), col("b").as("dst"))).localCheckpoint(true))
      val out = t("final join+count") {
        docs.select(col("doc_id"))
          .join(cc.withColumnRenamed("vid", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
          .withColumn("is_rep", col("doc_id") === col("cluster_id"))
          .count()
      }
      println(s"[probe] rows=$out")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
