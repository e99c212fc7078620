package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

/** Changeset-application semantics on hand-checkable data, including the
  * degenerate cases the operator's algebra is supposed to absorb. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "s", "v")

  test("insert, update, delete apply per key; untouched rows survive verbatim") {
    val changes = Seq(
      (2L, "B", 22.0, "U"),   // update
      (3L, "c", 30.0, "D"),   // delete (payload ignored)
      (9L, "i", 90.0, "I")    // insert
    ).toDF("k", "s", "v", "op")
    val got = Merge.applyChanges(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 10.0), (2L, "B", 22.0), (4L, "d", 40.0), (9L, "i", 90.0)))
  }

  test("degenerate cases: D of an absent key is a no-op; I of a present key acts as U") {
    val changes = Seq(
      (42L, "x", 0.0, "D"),   // absent key
      (1L, "A", 11.0, "I")    // present key, declared insert
    ).toDF("k", "s", "v", "op")
    val got = Merge.applyChanges(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "A", 11.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("an op outside {I,U,D} — including NULL — fails loudly, never a silent delete") {
    val changes = Seq((2L, "b2", 20.0, null.asInstanceOf[String]))
      .toDF("k", "s", "v", "op")
    val ex = intercept[Exception] {
      Merge.applyChanges(base, changes, "k").collect()
    }
    assert(ex.getMessage.contains("Merge") || ex.getMessage.contains("USER_RAISED_EXCEPTION"),
      s"expected the contract error, got: ${ex.getMessage}")
  }

  test("empty changeset is the identity") {
    val changes = Seq.empty[(Long, String, Double, String)].toDF("k", "s", "v", "op")
    val got = Merge.applyChanges(base, changes, "k").collect().toSet
    assert(got == base.collect().toSet)
  }

  test("changes column order differs from base — output schema follows base") {
    val changes = Seq(("U", 5.0, "bb", 2L)).toDF("op", "v", "s", "k")
    val out = Merge.applyChanges(base, changes, "k")
    assert(out.columns.toSeq == Seq("k", "s", "v"))
    val r2 = out.filter(col("k") === 2L).collect().head
    assert((r2.getString(1), r2.getDouble(2)) == (("bb", 5.0)))
  }
}
