package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/**
 * Term / URL dictionary encoding — the WebGraph preprocessing step (Boldi &
 * Vigna, "The WebGraph framework I", WWW 2004): map every distinct string
 * key to a dense 0-based integer id in lexicographic order, then re-express
 * the corpus over the ids. Dense sorted ids are what make the downstream
 * graph compressible (gap-encoded adjacency) and joinable on fixed-width
 * keys instead of strings.
 *
 * The id assignment is `GraphOps.globalRank` — range-partition + in-partition
 * sequence + broadcast per-partition offsets — NOT a single-partition
 * `row_number()` window, so the dictionary build scales with the vocabulary
 * (a 10^12-page crawl has ~10^12 URLs; one task sorting them is the
 * textbook failure). Lexicographic order is binary-collation string order,
 * identical in Spark (UTF8String byte compare) and the DuckDB oracle for
 * the ASCII corpus; the operator itself never assumes ASCII.
 *
 * 100 TB shape: build = one distinct (shuffle on the string) + the
 * globalRank range exchange; encode = one equi-join of the token stream
 * against the dictionary — broadcast when the vocabulary is small, shuffle
 * hash co-partitioned when it is crawl-sized. Nothing else.
 */
object Dictionary {

  /** Distinct values of `keyCol` → (term, id) with dense 0-based ids in
    * lexicographic order. */
  def build(df: DataFrame, keyCol: String, parts: Int): DataFrame = {
    val dict = GraphOps.globalRank(
      df.select(col(keyCol).as("term")).filter(col("term").isNotNull).distinct(),
      parts, 0, col("term"))
    dict.withColumn("id", col("rn") - lit(1L)).drop("rn")
  }

  /** Encode a (docCol, keyCol) token stream over the dictionary and emit the
    * per-document integer checksums (count / sum / min / max of ids) — the
    * exact fingerprint of the encoding that a hash-compare can pin without
    * shipping full id arrays. */
  def encodeSummary(tokens: DataFrame, docCol: String, keyCol: String,
                    dict: DataFrame): DataFrame =
    tokens.select(col(docCol), col(keyCol).as("term"))
      .join(dict, "term")
      .groupBy(docCol)
      .agg(count(lit(1)).as("n_tok"), sum(col("id")).as("sum_id"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
}
