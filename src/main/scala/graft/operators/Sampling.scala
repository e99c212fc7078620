package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines. At 100 TB, sampling
 * must be (a) reproducible — re-running the pipeline keeps the same rows,
 * (b) shuffle-free — a pure projection predicate evaluated at the scan, and
 * (c) stratified — per-class rates, not one global fraction. RNG-based
 * `df.sample` gives none of those; the standard fix is a hash of a stable
 * key against a per-stratum threshold, which is what this does.
 */
object Sampling {

  /**
   * Keep a row iff `(key·2654435761 + seed) mod 1000 < ratePerMille(stratum)`
   * — Knuth's multiplicative hash of the stable integer key against a
   * per-stratum permille threshold. Pure integer arithmetic (expressible in
   * ANSI SQL, so the harness oracle replays it exactly), pure filter (no
   * shuffle; composes with predicate pushdown), deterministic (same key ⇒
   * same decision across runs and engines). Key must be a non-negative
   * integer well below 2⁶³/2654435761 ≈ 3.5e9 so the product cannot
   * overflow — true for every id column in this engine's data model; callers
   * with wider ids should pre-hash into that range.
   */
  def hashStratifiedPerMille(df: DataFrame, keyCol: String, strataCol: String,
                             ratesPerMille: Map[String, Int],
                             defaultPerMille: Int, seed: Long = 17L): DataFrame = {
    val bucket = (col(keyCol) * lit(2654435761L) + lit(seed)) % lit(1000L)
    val rate: Column = ratesPerMille.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPerMille)) { case (acc, (s, r)) =>
        when(col(strataCol) === s, lit(r)).otherwise(acc)
      }
    df.filter(bucket < rate)
  }

  /** The same predicate as ANSI SQL (one source of truth for the oracle). */
  def hashStratifiedPerMilleSql(keyCol: String, strataCol: String,
                                ratesPerMille: Map[String, Int],
                                defaultPerMille: Int, seed: Long = 17L): String = {
    val cases = ratesPerMille.toSeq.sortBy(_._1).reverse
      .map { case (s, r) => s"WHEN $strataCol = '$s' THEN $r" }.mkString(" ")
    s"($keyCol*2654435761 + $seed) % 1000 < (CASE $cases ELSE $defaultPerMille END)"
  }
}
