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

  /** BPE-ish pre-tokenizer pattern: letter runs, digit runs, single
    * non-alnum marks — the GPT-2-style pre-split a subword tokenizer counts
    * over. Restricted to explicit ASCII classes so Java regex (Spark) and
    * RE2 (DuckDB) agree character-for-character — no \\w/\\b (unicode
    * semantics differ) and no \\s: Java's \\s includes vertical tab \\x0B,
    * RE2's does not (verified divergence), so the whitespace set is spelled
    * out explicitly. */
  val BpeishPattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"

  /** Subword-run token count under [[BpeishPattern]] (an upper-ish proxy for
    * BPE token counts that needs no vocabulary — the standard cheap budget
    * estimator in training-data pipelines). */
  def tokenCountBpeish(text: Column): Column =
    regexp_count(text, lit(BpeishPattern)).cast("long")

  /** Matching DuckDB SQL for [[tokenCountBpeish]] (same pattern constant). */
  def tokenCountBpeishSql(t: String): String =
    s"CAST(len(regexp_extract_all($t, '$BpeishPattern')) AS BIGINT)"

  /** PII detection/redaction patterns, ASCII-only classes for the same
    * Java-regex == RE2 parity reason as [[BpeishPattern]] (no \\w, \\b, \\s).
    * Email: RFC-loose local part, dotted domain, ≥2-letter TLD. Phone:
    * +CC-AAA-NNNN international-lite. Both engines' greedy matching agrees
    * here — RE2 reproduces leftmost-first (Perl) semantics for patterns
    * without backreferences. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val PhonePattern: String = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern)).cast("long")
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern)).cast("long")

  /** Redact emails then phones with fixed tags — the scrubbing pass every
    * training-data pipeline runs before publishing text. Pure codegen'd
    * string expressions; order (email first) is part of the contract. */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Matching DuckDB SQL (same pattern constants; 'g' = replace-all, which
    * is Spark's only mode). */
  def emailCountSql(t: String): String =
    s"CAST(len(regexp_extract_all($t, '$EmailPattern')) AS BIGINT)"
  def phoneCountSql(t: String): String =
    s"CAST(len(regexp_extract_all($t, '$PhonePattern')) AS BIGINT)"
  def piiRedactSql(t: String): String =
    s"regexp_replace(regexp_replace($t, '$EmailPattern', '<EMAIL>', 'g'), '$PhonePattern', '<PHONE>', 'g')"

  /** Quality features (integer-exact, oracle-friendly). */
  def alphaChars(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("long")
  def punctChars(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", "")).cast("long")
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) / lit(needle.length)).cast("long")

  /** ANSI-safe integer division (Catalyst IntegralDivide via the registry —
    * same truncation semantics as DuckDB `//` on non-negative operands). */
  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /**
   * Composite quality score in parts-per-million of [0,1] — length, alpha
   * ratio, stopword signal, weighted 0.3/0.4/0.3. Pure BIGINT arithmetic so
   * the DuckDB oracle reproduces it bit-exactly (no float rounding seam):
   * lenPpm = min(n·2000, 10⁶) (i.e. n/500 capped), alphaPpm = alpha·10⁶ div n,
   * stopPpm = min(occ("the")·200000, 10⁶) (i.e. occ/5 capped).
   */
  def qualityScorePpm(text: Column): Column = {
    val n        = length(text).cast("long")
    val lenPpm   = least(n * lit(2000L), lit(1000000L))
    val alphaPpm = when(n > 0, idiv(alphaChars(text) * lit(1000000L), n)).otherwise(lit(0L))
    val stopPpm  = least(occurrences(text, "the") * lit(200000L), lit(1000000L))
    idiv(lenPpm * lit(3L) + alphaPpm * lit(4L) + stopPpm * lit(3L), lit(10L))
  }

  /** Matching DuckDB SQL for [[qualityScorePpm]] over a `text` column. */
  def qualityScorePpmSql(t: String): String =
    s"""CAST((least(length($t)*2000, 1000000)*3
       | + (CASE WHEN length($t) > 0
       |    THEN (length(regexp_replace($t, '[^A-Za-z]', '', 'g'))*1000000) // length($t)
       |    ELSE 0 END)*4
       | + least(((length($t) - length(replace($t, 'the', ''))) // 3)*200000, 1000000)*3
       |) // 10 AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Convenience double form of the quality score (ppm / 1e6). */
  def qualityScore(text: Column): Column =
    qualityScorePpm(text).cast("double") / lit(1000000.0)

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

  /** DuckDB SQL producing [[langId]]'s exact output over a text expression:
    * per-language marker-hit scores, cascading argmax with ties toward the
    * earlier tag (generated from the same [[langMarkers]] table — one source
    * of truth for both engines). */
  def langIdSql(t: String): String = {
    val padded = s"(' ' || lower($t) || ' ')"
    val scores = langMarkers.map { case (tag, markers) =>
      val s = markers.map { m =>
        s"(length($padded) - length(replace($padded, '$m', ''))) // ${m.length}"
      }.mkString(" + ")
      tag -> s"($s)"
    }
    val branches = scores.zipWithIndex.map { case ((tag, _), i) =>
      val later = scores.drop(i + 1)
      if (later.isEmpty) s"ELSE '$tag' END"
      else {
        val cond = later.map { case (_, sj) => s"${scores(i)._2} >= $sj" }.mkString(" AND ")
        s"WHEN $cond THEN '$tag'"
      }
    }
    s"CASE ${branches.mkString(" ")}"
  }

  /**
   * 64-bit document fingerprint: order-sensitive rolling hash chain —
   * acc' = xxhash64(acc, token) folded over the token sequence. Content
   * reorderings change the fingerprint; deterministic, overflow-free
   * (xxhash64 chain, ANSI-safe). Computed by a compiled custom Expression
   * (graft.functions.HashExprs.FingerprintExpr) — bit-identical to the
   * `aggregate` higher-order-function form but without its per-element
   * lambda interpretation cost (same fix as the minhash/simhash signatures).
   */
  def fingerprint(text: Column): Column =
    graft.functions.HashExprs.fingerprint(tokens(text))
}
