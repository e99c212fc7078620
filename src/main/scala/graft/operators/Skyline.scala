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
 * Both maxima collapse onto the DISTINCT x values of the group: aggregate
 * max(y) per (group, x) — that IS the x-peer maximum — then a running
 * ROWS-frame max over the distinct x values in descending-x order,
 * excluding the current row, gives the strict-upper maximum. Join the two
 * back on (group, x) and filter. Every stage is linear: one hash exchange
 * for the per-x aggregate (map-side combined), one in-partition sort over
 * the (much smaller) distinct-x set for the running max, one equi-join.
 *
 * NOT a RANGE frame (1 FOLLOWING, ∞) over the raw rows: Spark executes a
 * moving-lower-bound/unbounded-upper RANGE frame with
 * UnboundedFollowingWindowFunctionFrame, which rescans the whole remaining
 * frame for EVERY row — O(n²) per group. Measured on sf0.1 orders
 * (150 k rows, ~5 groups): 97 s for the RANGE-frame form vs well under a
 * second for this one; at web scale the RANGE form never finishes.
 * (The ROWS frame below is a running frame — O(1) per row.)
 *
 * Ties in both dimensions survive together (neither dominates — no strict
 * edge). Any orderable x works; integrality is not required.
 *
 * 100 TB shape: the per-x aggregate shuffles on (group, x) — no hot-group
 * serialization there even for a single giant group. Only the distinct-x
 * running max serializes a group into one task, and its input is the
 * deduplicated x set, already one row per distinct x. The join-back is a
 * plain equi-join on (group, x); AQE broadcasts the aggregated side when
 * the skyline input is dimension-sized.
 */
object Skyline {

  def frontier2D(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val y: Column = col(yCol)
    val perX = df.groupBy(col(groupCol), col(xCol)).agg(max(y).as("_sky_eq"))
    val wStrict = Window.partitionBy(groupCol).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val maxima = perX.withColumn("_sky_hi", max(col("_sky_eq")).over(wStrict))
    df.join(maxima, Seq(groupCol, xCol))
      // _sky_hi is NULL for the max-x rows: no strictly-better x exists,
      // that disjunct is false (coalesce, not null-propagate)
      .filter(!(coalesce(col("_sky_hi") >= y, lit(false)) || col("_sky_eq") > y))
      .select(df.columns.map(col): _*)
  }
}
