package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/**
 * Decides VERDICT r2 #5/#8: does the `CodegenFallback` boundary of the
 * HashExprs expressions (MinHash/SimHash/Fingerprint) cost anything that
 * `doGenCode` would win back?
 *
 * Two pieces of evidence, printed one per line:
 *  1. the executed plan of a simhash projection — Spark embeds a
 *     CodegenFallback expression INSIDE the WholeStageCodegen stage (the
 *     generated code calls the expression's eval), so fusion of the
 *     surrounding scan/project/agg is NOT broken; this prints the span;
 *  2. wall clock over an N-row corpus for (a) a pure-codegen floor projection
 *     (xxhash64 of the text), (b) the simhash Expression, (c) the fingerprint
 *     Expression — (b)−(a) bounds the per-row eval-boundary + loop cost.
 *
 * Usage: sbt "runMain graft.tools.CodegenProbe [rows] [cores]"
 */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val n     = if (args.length > 0) args(0).toLong else 2000000L
    val cores = if (args.length > 1) args(1) else "8"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic text corpus, wide enough that per-row cost dominates scan
    val corpus = spark.range(0, n, 1, cores.toInt)
      .select(col("id"),
        concat_ws(" ", (0 until 24).map(i =>
          conv(xxhash64(col("id"), lit(i)) % 1000, 10, 36)): _*).as("text"))
      .persist()
    corpus.count()

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      df.queryExecution.executedPlan // force planning outside the timer
      val t0 = System.nanoTime()
      df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CODEGEN_PROBE $label rows=$n sec=$sec%.2f")
      sec
    }

    // 1. fusion evidence: the fallback expression sits inside WholeStageCodegen
    val planStr = corpus
      .select(Dedup.simhash(Dedup.shingleHashes(col("text"))).as("sig"))
      .queryExecution.executedPlan.toString
    val fused = planStr.contains("WholeStageCodegen")
    println(s"CODEGEN_PROBE simhash_project_in_wholestagecodegen=$fused")

    // 2. marginal cost vs a pure-codegen floor (both end in one sum)
    time("floor_xxhash64") {
      corpus.select(sum(shiftright(xxhash64(col("text")), 32)).as("s"))
    }
    val a = time("simhash_expr") {
      corpus.select(sum(shiftright(Dedup.simhash(Dedup.shingleHashes(col("text"))), 32)).as("s"))
    }
    val b = time("fingerprint_expr") {
      corpus.select(sum(shiftright(graft.operators.TextOps.fingerprint(col("text")), 32)).as("s"))
    }
    // repeat to exclude JIT warm-up from the conclusion
    time("floor_xxhash64_2") {
      corpus.select(sum(shiftright(xxhash64(col("text")), 32)).as("s"))
    }
    time("simhash_expr_2") {
      corpus.select(sum(shiftright(Dedup.simhash(Dedup.shingleHashes(col("text"))), 32)).as("s"))
    }
    time("fingerprint_expr_2") {
      corpus.select(sum(shiftright(graft.operators.TextOps.fingerprint(col("text")), 32)).as("s"))
    }
    println(f"CODEGEN_PROBE verdict_inputs simhash=$a%.2f fingerprint=$b%.2f")
    spark.stop()
  }
}
