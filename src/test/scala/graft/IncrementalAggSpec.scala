package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAgg, Merge}

/**
 * The delta rule must equal a fresh aggregate of the merged table on every
 * path, INCLUDING Merge.applyChanges's documented degenerate cases (I on an
 * existing key acts as U; D on an absent key is a no-op) and group
 * birth/death (an insert creating a new group; deletes emptying one).
 */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def base: DataFrame = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L), (5L, "c", 50L)
  ).toDF("k", "g", "v")

  private def check(changes: DataFrame): Unit = {
    val got = IncrementalAgg.maintain(
      IncrementalAgg.aggregate(base, "g", col("v")), base, changes, "k", "g", col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = IncrementalAgg.aggregate(
      Merge.applyChanges(base, changes, "k"), "g", col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"delta-maintained state diverged from recompute:\n$got\n$want")
  }

  test("plain I/U/D mix matches recompute") {
    check(Seq((2L, "a", 25L, "U"), (3L, "b", 0L, "D"), (9L, "a", 9L, "I"))
      .toDF("k", "g", "v", "op"))
  }

  test("degenerate: I on existing key retracts the old image (acts as U)") {
    check(Seq((1L, "a", 111L, "I")).toDF("k", "g", "v", "op"))
  }

  test("degenerate: D on absent key is a no-op") {
    check(Seq((42L, "zz", 0L, "D")).toDF("k", "g", "v", "op"))
  }

  test("group death and birth: empty group c, create group d") {
    check(Seq((5L, "c", 0L, "D"), (6L, "d", 60L, "I")).toDF("k", "g", "v", "op"))
    // and explicitly: group c must be ABSENT, not n=0
    val st = IncrementalAgg.maintain(
      IncrementalAgg.aggregate(base, "g", col("v")), base,
      Seq((5L, "c", 0L, "D")).toDF("k", "g", "v", "op"), "k", "g", col("v"))
    assert(!st.collect().exists(_.getString(0) == "c"))
  }

  test("update that moves a row BETWEEN groups matches recompute") {
    // U image carries a different group: retraction hits the old group via
    // the base lookup, contribution lands in the new one
    check(Seq((4L, "c", 41L, "U")).toDF("k", "g", "v", "op"))
  }

  test("unknown op fails loudly instead of silently retracting") {
    val bad = Seq((2L, "a", 25L, "X")).toDF("k", "g", "v", "op")
    val ex = intercept[Exception] {
      IncrementalAgg.maintain(
        IncrementalAgg.aggregate(base, "g", col("v")), base, bad, "k", "g", col("v"))
        .collect()
    }
    assert(ex.getMessage.contains("must be I, U or D")
      || Option(ex.getCause).exists(_.getMessage.contains("must be I, U or D")))
  }
}
