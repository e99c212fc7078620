package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    t("shingles")(docs.select(explode(Dedup.shingleHashes(col("text")))).count())
    val sigs = docs.select(col("doc_id").as("id"),
      Dedup.minhashSignature(Dedup.shingleHashes(col("text")), 64).as("sig")).persist()
    t("signatures")(sigs.select(explode(col("sig"))).count())
    val bk = Dedup.lshBuckets(sigs, "id", "sig", 16, 4).persist()
    t("buckets")(bk.count())
    t("candidates")(bk.as("x").join(bk.as("y"),
      col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
        col("x.id") < col("y.id")).select(col("x.id"), col("y.id")).distinct().count())
    t("full_neardup")(Dedup.nearDuplicates(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
