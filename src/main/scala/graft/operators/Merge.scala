package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Changeset application (MERGE / upsert-delete) — the lakehouse write
 * primitive that keeps a 100 TB table current without rewriting it from
 * source: apply a (typically small) batch of inserts / updates / deletes to
 * a large base snapshot. Pairs with [[graft.ckpt.IcebergLikeStore]]: the
 * merged frame is what a new snapshot commit would persist.
 *
 * Semantics (per key, keys unique within `changes`):
 *  - `D`: the base row with that key is removed;
 *  - `U`: the base row is replaced by the change row's image;
 *  - `I`: the change row is added (key expected absent from base — an `I`
 *    whose key exists behaves like `U`, a `D` for an absent key is a no-op;
 *    both degenerate cases fall out of the algebra below, no special paths).
 *
 * Shape and 100 TB rationale: ONE left-anti equi-join of base against the
 * changed-key set, then a union with the non-delete change images —
 *  - the base is touched exactly once and never sorted;
 *  - the key set is |changes|-sized, so Catalyst/AQE broadcasts it in the
 *    common small-changeset case and the base never shuffles at all;
 *    a huge changeset degrades gracefully to one hash shuffle per side;
 *  - the union is plan-level only (no data movement).
 * This is the same plan MERGE INTO compiles to in lakehouse engines when
 * the ON clause is a pure key equality (e.g. Delta/Iceberg merge-on-read
 * write paths, Spark's own ReplaceData planning).
 */
object Merge {

  /**
   * Apply `changes` (base's columns plus `opCol` ∈ {"I","U","D"}) to `base`,
   * keyed by `keyCol`. Keys must be unique within `changes` — two images for
   * one key would both survive (document-level contract, not a runtime scan:
   * checking uniqueness would cost an extra aggregate over the changeset;
   * callers that need it can assert on `changes.groupBy(keyCol).count()`).
   */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   opCol: String = "op"): DataFrame = {
    // op outside {I,U,D} (including NULL) must fail LOUDLY at execution: a
    // plain `op =!= "D"` filter would evaluate NULL-op rows to NULL → the
    // row silently vanishes from the re-insert union while its key still
    // anti-joins the base row away — a silent delete. raise_error makes the
    // contract a per-row codegen'd check, no extra pass over the changeset.
    val opChecked = when(col(opCol).isin("I", "U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"Merge: op column '$opCol' must be I, U or D; got "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))
    val changedKeys = changes.select(col(keyCol))
    base.join(changedKeys, Seq(keyCol), "left_anti")
      .unionByName(changes.filter(opChecked =!= "D").drop(opCol)
        // normalize to base's column order so the merged frame's schema is
        // positionally identical to the base snapshot it replaces
        .select(base.columns.map(col).toIndexedSeq: _*))
  }
}
