package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * 2-D Pareto frontier (skyline) per group, both dimensions maximized —
 * the dominance query of Börzsönyi, Kossmann & Stocker, "The Skyline
 * Operator" (ICDE 2001), restricted to two dimensions where it has an
 * exact one-sort formulation instead of the general block-nested loop:
 *
 * a row is dominated iff some other row in its group is ≥ in both
 * dimensions and strictly greater in at least one. Splitting on the x
 * comparison, row r is dominated iff
 *   max{ y' : x' > x }  ≥ y     (strictly-better x, no-worse y)   or
 *   max{ y' : x' = x }  > y     (equal x, strictly-better y)
 * Both maxima are RANGE-frame window aggregates over ONE sort by x:
 * frame (1 FOLLOWING, ∞) gives the strict-upper set when x is integral,
 * frame (CURRENT ROW, CURRENT ROW) is exactly the x-peer set. No
 * self-join, no quadratic pair blowup — the plan is one hash exchange on
 * the group key plus an in-partition sort.
 *
 * `xCol` must be integral (the +1 range offset IS the strictness); ties in
 * both dimensions survive together (neither dominates — no strict edge).
 *
 * 100 TB shape: cost is a single sort per group partition. A single
 * pathologically hot group serializes into one task's sort — the same
 * envelope as asofJoin's per-key window, and the same mitigation applies
 * (range-split the group by x with per-split suffix maxima stitched, the
 * GraphOps.globalRank two-pass pattern). Harness groups (order priority,
 * ~5 values over orders) sit far inside it.
 */
object Skyline {

  def frontier2D(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val wHi = Window.partitionBy(groupCol).orderBy(col(xCol))
      .rangeBetween(1L, Window.unboundedFollowing)
    val wEq = Window.partitionBy(groupCol).orderBy(col(xCol))
      .rangeBetween(Window.currentRow, Window.currentRow)
    val y: Column = col(yCol)
    df.withColumn("_sky_hi", max(y).over(wHi))
      .withColumn("_sky_eq", max(y).over(wEq))
      // _sky_hi is NULL for the max-x rows: no strictly-better x exists,
      // that disjunct is false (coalesce, not null-propagate)
      .filter(!(coalesce(col("_sky_hi") >= y, lit(false)) || col("_sky_eq") > y))
      .drop("_sky_hi", "_sky_eq")
  }
}
