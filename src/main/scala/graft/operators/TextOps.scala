package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a large-scale training-data pipeline: token
 * counting, quality scoring, language identification, and document
 * fingerprinting. All per-row, codegen-friendly (pure `functions._`
 * expressions — no UDFs), deterministic everywhere.
 */
object TextOps {

  /**
   * Token count for single-space-normalized text: spaces + 1. Pure string
   * arithmetic — exactly expressible in ANSI SQL for the DuckDB oracle
   * (unlike regex splits, whose engine-specific edge cases break parity).
   */
  def tokenCount(text: Column): Column =
    when(length(text) === 0, lit(0L))
      .otherwise(length(text) - length(replace(text, lit(" "), lit(""))) + lit(1))
      .cast("long")

  /** Whitespace tokenizer used by the Scala-side operators. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Quality features (integer-exact, oracle-friendly). */
  def alphaChars(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("long")
  def punctChars(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", "")).cast("long")
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) / lit(needle.length)).cast("long")

  /**
   * Composite quality score in [0,1] — length, alpha ratio, stopword signal.
   * The oracled harness query emits the raw integer features; this scalar is
   * the pipeline-filtering form.
   */
  def qualityScore(text: Column): Column = {
    val n          = length(text).cast("double")
    val lenScore   = least(n / lit(500.0), lit(1.0))
    val alphaScore = when(n > 0, alphaChars(text).cast("double") / n).otherwise(lit(0.0))
    val stopScore  = least(occurrences(text, "the").cast("double") / lit(5.0), lit(1.0))
    round(lit(0.3) * lenScore + lit(0.4) * alphaScore + lit(0.3) * stopScore, 6)
  }

  // --------------------------------------------------------------------------
  // Language identification — marker-word (function-word) profile heuristic.
  // Profiles are pinned constants; scoring is a codegen'd sum of substring
  // hit counts; argmax with a deterministic tie-break. Validated on its own
  // multilingual fixtures in TextOpsSpec (the testdata `lang` column is a
  // synthetic label unrelated to the text content).
  // --------------------------------------------------------------------------
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " ist ", " ein "),
    "es" -> Seq(" el ", " la ", " que ", " es ", " los "),
    "fr" -> Seq(" le ", " les ", " est ", " une ", " dans "),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Predicted language tag: argmax marker-hit score; ties break toward the
    * earlier tag in `langMarkers` order (en first). */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val ranked = langMarkers.zipWithIndex.map { case ((tag, markers), i) =>
      val score = markers.map(m => occurrences(padded, m)).reduce(_ + _)
      struct(score.as("score"), lit(-i).as("nrank"), lit(tag).as("tag"))
    }
    greatest(ranked: _*).getField("tag")
  }

  /**
   * 64-bit document fingerprint: order-sensitive rolling hash chain —
   * acc' = xxhash64(acc, token) folded over the token sequence via the
   * `aggregate` higher-order function. Content reorderings change the
   * fingerprint; pure Catalyst, deterministic, overflow-free (ANSI-safe).
   */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(5381L),
      (acc, t) => xxhash64(acc, t))
}
