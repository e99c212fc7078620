package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Incremental maintenance of a keyed counted-sum aggregate under a MERGE
 * changeset — the materialized-view delta rule (Gupta & Mumick, "Maintenance
 * of materialized views: problems, techniques, and applications", IEEE Data
 * Eng. Bull. 1995) specialized to count/sum, the self-maintainable case.
 *
 * Why it exists: at 100 TB the aggregate over a table is cheap to KEEP but
 * ruinous to RECOMPUTE. Given the previous aggregate state and a changeset,
 * the new state costs:
 *  - one point-lookup semi-join of the changed keys against the base (to
 *    fetch old images of replaced/deleted rows — |changes|-sized, the key
 *    set broadcasts; the base table itself never rescans or shuffles),
 *  - one aggregate over ±contributions (|changes|-sized),
 *  - one outer join against the state table (|groups|-sized).
 * Nothing in the plan is proportional to |base| except the broadcast-probed
 * lookup, which reads only the join column pages of matching row groups.
 *
 * The delta algebra mirrors [[Merge.applyChanges]] EXACTLY, degenerate
 * cases included: every change key that exists in base retracts its old row
 * (regardless of op — an `I` on an existing key behaves like `U` there, so
 * it must retract here), every non-`D` image contributes, `D` on an absent
 * key is a no-op because the semi-join finds nothing. IncrementalAggSpec
 * pins `maintain(aggregate(base), …) == aggregate(applyChanges(base, …))`
 * row-for-row on fixtures that exercise each degenerate path; the value
 * column must be integral so the equality is exact, not float-drift-close.
 */
object IncrementalAgg {

  /** The maintained shape: (group, n, s). Build the initial state with the
    * same module that maintains it so the two can never disagree. */
  def aggregate(df: DataFrame, groupCol: String, value: Column): DataFrame =
    df.groupBy(groupCol).agg(count(lit(1)).as("n"), sum(value).as("s"))

  /** New state after applying `changes` (base columns + `opCol` ∈ I/U/D,
    * keys unique within the changeset — [[Merge.applyChanges]]'s contract)
    * to the aggregate `state` of `base`. Groups whose count reaches zero
    * drop out of the state, matching a fresh aggregate of the merged table
    * (which would have no row for an emptied group). */
  def maintain(state: DataFrame, base: DataFrame, changes: DataFrame,
               keyCol: String, groupCol: String, value: Column,
               opCol: String = "op"): DataFrame = {
    // same loud op contract as Merge.applyChanges: a NULL/unknown op would
    // silently retract (its key semi-joins) without contributing back
    val opChecked = when(col(opCol).isin("I", "U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"IncrementalAgg: op column '$opCol' must be I, U or D; got "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))
    val changedKeys = changes.select(col(keyCol))
    val retracted = base.join(changedKeys, Seq(keyCol), "left_semi")
      .select(col(groupCol).as("g"), lit(-1L).as("dn"), (-value).as("ds"))
    val added = changes.filter(opChecked =!= "D")
      .select(col(groupCol).as("g"), lit(1L).as("dn"), value.as("ds"))
    val delta = retracted.unionByName(added)
      .groupBy("g").agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
    state.select(col(groupCol).as("g"), col("n"), col("s"))
      .join(delta, Seq("g"), "full_outer")
      .select(col("g").as(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .filter(col("n") > 0)
  }
}
