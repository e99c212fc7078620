package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental maintenance of an INNER equi-join materialized view under
 * per-side MERGE changesets — the join-view delta rule (Gupta & Mumick,
 * IEEE Data Eng. Bull. 1995; Blakeley, Larson & Tompa, "Efficiently
 * updating materialized views", SIGMOD 1986) in its touched-key recompute
 * form: rows of the view whose contributing base rows are untouched
 * survive verbatim; everything touching a changed key is recomputed from
 * the post-merge tables, which costs |changeset|-sized joins — never a
 * rescan of either base table or of the view beyond two anti-joins.
 *
 * Contract: the B side (dimension) is keyed by the join key itself
 * (bPk == its join column), so a B update can never move a join key; the
 * A side (fact) has an independent primary key and its updates MAY move
 * the join key — covered because every changed-A-pk view row is dropped
 * and recomputed from the new image. [[Merge.applyChanges]]'s changeset
 * contract applies per side (unique keys, op ∈ I/U/D loud-checked there).
 *
 * 100 TB shape:
 *  - survivors: two anti-joins of the view against the |dA|- and
 *    |dB|-sized key sets — small sets broadcast, the view never shuffles;
 *  - touched-A leg: |dA|-sized semi against the merged fact, then a join
 *    whose LEFT side is |dA|-sized (AQE broadcasts it — the dimension
 *    never shuffles);
 *  - touched-B leg: one point-lookup semi of the fact on the |dB| changed
 *    join keys (reads only matching row groups), then the same small join.
 * IncrementalJoinSpec pins maintain(view, …) == view(applyChanges(A),
 * applyChanges(B)) row-for-row on fixtures exercising every degenerate
 * path (join-key move, dimension delete cascade, insert-before-dimension).
 */
object IncrementalJoin {

  /** The maintained shape: build the initial view with the same module that
    * maintains it. Column names of `a` and `b` must be disjoint. */
  def view(a: DataFrame, b: DataFrame, aJoinKey: String, bJoinKey: String): DataFrame =
    a.join(b, a(aJoinKey) === b(bJoinKey))

  def maintain(view: DataFrame,
               a: DataFrame, da: DataFrame, aPk: String, aJoinKey: String,
               b: DataFrame, db: DataFrame, bPk: String,
               opCol: String = "op"): DataFrame = {
    val aNew = Merge.applyChanges(a, da, aPk, opCol)
    val bNew = Merge.applyChanges(b, db, bPk, opCol)
    val oStar = da.select(col(aPk))
    val cStar = db.select(col(bPk))
    val survivors = view
      .join(oStar, Seq(aPk), "left_anti")
      .join(cStar, Seq(bPk), "left_anti")
    val touchedA = aNew.join(oStar, Seq(aPk), "left_semi")
    val touchedB = aNew.join(oStar, Seq(aPk), "left_anti")
      .join(cStar.withColumnRenamed(bPk, aJoinKey), Seq(aJoinKey), "left_semi")
    val recomputed = touchedA.unionByName(touchedB)
      .join(bNew, col(aJoinKey) === bNew(bPk))
    recomputed.select(view.columns.map(col).toIndexedSeq: _*)
      .unionByName(survivors.select(view.columns.map(col).toIndexedSeq: _*))
  }
}
