package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/**
 * ANN scale probe: synthesizes N deterministic 64-dim vectors plus exact
 * twins for every 1000th id, then times the two approximate paths end-to-end
 * at that scale and reports planted-twin rank-1 recall:
 *
 *  - sign-LSH top-k with 20 planes (≈1M buckets — the bucket count must grow
 *    with the corpus or candidate lists explode; at the harness's 12 planes
 *    a 1M corpus would put ~250 vectors per bucket);
 *  - IVF top-k, capped at 200k vectors: FLAT IVF's candidate volume is
 *    N·nProbe·N/nlist rows through the top-k shuffle, and with nlist clamped
 *    at 4096 that grows quadratically — measured: the 1M-vector IVF leg ran
 *    >20 min (≈2 B candidate rows) while LSH stays near-linear. That is the
 *    honest scale boundary of single-level IVF; the web-scale path is LSH or
 *    a two-level (coarse+fine) IVF hierarchy, recorded in Similarity's
 *    scaladoc.
 *
 * Usage: sbt "runMain graft.tools.AnnScaleProbe [n] [cores]"
 */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val n     = if (args.length > 0) args(0).toLong else 1000000L
    val cores = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val off = 10000000L
    require(n < off, "corpus collides with twin offset")
    val base = spark.range(0, n, 1, cores.toInt).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => ((pmod(xxhash64(col("id"), i), lit(2000001L)) - 1000000L) / 1000000.0)
          .cast("float")).as("embedding"))
    val twins = base.filter(col("vec_id") % 1000 === 0)
      .select((col("vec_id") + off).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(twins).persist()
    val total = corpus.count()
    val planted = (n + 999) / 1000
    println(s"ANN_SCALE corpus=$total planted_twins=$planted")

    def recallOf(label: String, nVec: Long, nPlanted: Long)(
        df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val hits = df.filter(col("qid") % 1000 === 0 && col("qid") < n &&
          col("nn") === col("qid") + off && col("rnk") === 1)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"ANN_SCALE $label vectors=$nVec sec=$sec%.1f " +
        f"rank1_twin_recall=${hits.toDouble / nPlanted}%.4f " +
        f"rate=${nVec / sec / 1000.0}%.0f Kvec/s")
    }

    recallOf("lsh_topk_20planes", total, planted) {
      Similarity.lshTopK(corpus, "vec_id", "embedding", k = 5, nPlanes = 20)
    }
    // two-level IVF at FULL scale — the coarse-router variant exists exactly
    // to remove flat IVF's quadratic candidate envelope: nlist grows with N
    // (list sizes stay O(1)), routing is nCoarse + cProbe·nlist/nCoarse
    // compiled dots per row
    recallOf("ivf2_topk", total, planted) {
      Similarity.ivfTopKTwoLevel(corpus, "vec_id", "embedding", k = 5)
    }
    // flat IVF's quadratic candidate envelope (see scaladoc) — probe at 200k
    val ivfN = math.min(n, 200000L)
    val ivfBase = base.filter(col("vec_id") < ivfN)
    val ivfCorpus = ivfBase.unionByName(
      ivfBase.filter(col("vec_id") % 1000 === 0)
        .select((col("vec_id") + off).as("vec_id"), col("embedding"))).persist()
    val ivfTotal = ivfCorpus.count()
    recallOf("ivf_topk_sqrtN_lists_200k", ivfTotal, (ivfN + 999) / 1000) {
      Similarity.ivfTopK(ivfCorpus, "vec_id", "embedding", k = 5)
    }
    spark.stop()
  }
}
