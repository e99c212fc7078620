package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * One-screen check that the three planted-twin recall gates recover 100% of
 * their planted pairs at every test sf — the empirical pin behind their exact
 * DuckDB oracles (q_neardup_minhash_recall is provable; the two sign-LSH
 * gates are deterministic-but-not-provable, so this probe is the evidence).
 */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq
              else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (d <- sfs) {
      val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
      val nEmb  = spark.read.parquet(s"$d/embeddings.parquet").count()
      val planted = Map(
        "q_neardup_minhash_recall"   -> (nDocs + 9) / 10,
        "q_neardup_embedding_recall" -> nEmb,
        "q_ann_lsh_recall"           -> math.min(50L, nEmb),
        "q_ann_ivf_recall"           -> math.min(50L, nEmb))
      for (q <- planted.keys.toSeq.sorted) {
        val got = graft.SparkEntry.queries(q)(spark, d).count()
        val want = planted(q)
        println(s"$d $q: found=$got planted=$want ${if (got == want) "OK" else "MISS"}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
