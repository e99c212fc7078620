package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{IncrementalJoin, Merge}

/**
 * The join-view delta rule must reproduce a full recompute EXACTLY:
 * maintain(view(A,B), dA, dB) == view(applyChanges(A,dA), applyChanges(B,dB))
 * row-for-row, on fixtures that exercise each degenerate path — fact update
 * that MOVES the join key, dimension delete cascading view rows away,
 * fact insert pointing at a dimension key that only arrives in the SAME
 * changeset batch, delete of an absent key (no-op), update behaving as
 * replace.
 */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  // fact (pk, fk, v) and dimension (k, attr)
  private def fact: DataFrame = Seq(
    (1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L),
    (4L, 30L, 400L), (5L, 40L, 500L)
  ).toDF("pk", "fk", "v")

  private def dim: DataFrame = Seq(
    (10L, "a"), (20L, "b"), (30L, "c"), (40L, "d")
  ).toDF("k", "attr")

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long, String)] =
    df.select("pk", "fk", "v", "k", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet

  private def check(da: DataFrame, db: DataFrame): Unit = {
    val v0 = IncrementalJoin.view(fact, dim, "fk", "k")
    val got = IncrementalJoin.maintain(v0, fact, da, "pk", "fk", dim, db, "k")
    val want = IncrementalJoin.view(
      Merge.applyChanges(fact, da, "pk"), Merge.applyChanges(dim, db, "k"), "fk", "k")
    assert(rows(got) == rows(want),
      s"\ngot  ${rows(got).toSeq.sorted}\nwant ${rows(want).toSeq.sorted}")
  }

  private def emptyFactChanges: DataFrame =
    Seq.empty[(Long, Long, Long, String)].toDF("pk", "fk", "v", "op")
  private def emptyDimChanges: DataFrame =
    Seq.empty[(Long, String, String)].toDF("k", "attr", "op")

  test("fact update that moves the join key") {
    check(Seq((2L, 20L, 222L, "U")).toDF("pk", "fk", "v", "op"), emptyDimChanges)
  }

  test("dimension delete cascades its view rows away") {
    check(emptyFactChanges, Seq((10L, "x", "D")).toDF("k", "attr", "op"))
  }

  test("fact insert whose dimension key arrives in the same batch") {
    check(
      Seq((6L, 50L, 600L, "I")).toDF("pk", "fk", "v", "op"),
      Seq((50L, "e", "I")).toDF("k", "attr", "op"))
  }

  test("mixed batch: I/U/D both sides, absent-key delete no-op") {
    check(
      Seq((1L, 40L, 111L, "U"),   // moves 10 -> 40
          (3L, 20L, 0L, "D"),      // delete
          (7L, 20L, 700L, "I"),    // insert to existing dim
          (99L, 10L, 0L, "D")      // absent pk: no-op
      ).toDF("pk", "fk", "v", "op"),
      Seq((40L, "dd", "U"),        // attr replace (every 40-fk row re-images)
          (30L, "x", "D")          // cascade: pk=4 row drops
      ).toDF("k", "attr", "op"))
  }

  test("dangling fact rows stay out until their dimension appears") {
    // fk=99 has no dimension row: insert the fact now, the dim in a second
    // batch — the first maintain must NOT emit it, the second must.
    val v0 = IncrementalJoin.view(fact, dim, "fk", "k")
    val da1 = Seq((8L, 99L, 800L, "I")).toDF("pk", "fk", "v", "op")
    val f1 = Merge.applyChanges(fact, da1, "pk")
    val v1 = IncrementalJoin.maintain(v0, fact, da1, "pk", "fk", dim, emptyDimChanges, "k")
    assert(!rows(v1).exists(_._1 == 8L), "dangling fact row leaked into the view")
    val db2 = Seq((99L, "z", "I")).toDF("k", "attr", "op")
    val v2 = IncrementalJoin.maintain(v1, f1, emptyFactChanges, "pk", "fk", dim, db2, "k")
    val want = IncrementalJoin.view(f1, Merge.applyChanges(dim, db2, "k"), "fk", "k")
    assert(rows(v2) == rows(want))
  }
}
