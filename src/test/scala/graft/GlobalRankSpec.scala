package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/**
 * GraphOps.globalRank (two-pass range-partitioned global rank/ntile) must
 * equal Spark's own `rank()`/`ntile()` over the single-partition global
 * window EXACTLY — the scale-safe form is only admissible as q_rank_window's
 * plan if it is output-indistinguishable from the window form the oracle
 * runs. Cases: duplicate sort values (strict order restored by the id
 * tiebreaker), n % t ≠ 0, n < t, and a partition count larger than distinct
 * range keys (empty range partitions).
 */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def check(n: Int, parts: Int, tiles: Int): Unit = {
    // duplicate-heavy values so range partitions split inside ties
    val df = (0 until n).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val got = GraphOps.globalRank(df, parts, tiles, desc("v"), col("id"))
      .select(col("id"), col("rn"), col("tile"))
    val w = Window.orderBy(desc("v"), col("id"))
    val want = df.select(col("id"),
      rank().over(w).cast("long").as("rn"),
      ntile(tiles).over(w).cast("long").as("tile"))
    val diff = got.except(want).count() + want.except(got).count()
    assert(diff == 0, s"globalRank(n=$n parts=$parts tiles=$tiles) diverges from window form")
  }

  test("globalRank == rank()/ntile() over the global window") {
    check(n = 200, parts = 8, tiles = 10)  // n % t == 0
    check(n = 203, parts = 8, tiles = 10)  // n % t != 0 → first 3 buckets bigger
    check(n = 7,   parts = 4, tiles = 10)  // n < t → one row per bucket
    check(n = 50,  parts = 32, tiles = 3)  // more partitions than ~distinct keys
  }

  test("globalRank plans no unpartitioned window") {
    val df = (0 until 100).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "v")
    val plan = GraphOps.globalRank(df, 4, 10, desc("v"), col("id"))
      .queryExecution.sparkPlan
    val wins = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.isEmpty, "globalRank must not use a Window at all")
  }
}
