package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality audit — the "expectations" gate every production
 * pipeline runs before publishing a table (the pattern behind Delta
 * constraints / Great Expectations / dbt tests). A feed of checks compiles
 * into the minimum number of passes over the data:
 *
 *  - ALL row-level predicates and uniqueness checks fold into ONE aggregate
 *    scan of the table (violation counts are `sum(when(...))` columns of
 *    the same job; map-side combined, no extra shuffle per check);
 *  - each referential-integrity check is one left-anti equi-join reduced to
 *    a single count — the only per-check pass, and the join key is the
 *    natural shuffle key.
 *
 * Output is long-format `(check_name, n_violations)` — integers, so a
 * downstream gate (`n_violations == 0`) or the driver's exact oracle
 * consumes it directly. At 100 TB the audit cost is one scan + one
 * anti-join per FK, independent of how many predicates are registered.
 */
object DataQuality {

  sealed trait Check { def name: String }

  /** Rows where `violation` evaluates true count against the check.
    * NULL predicate results count as violations too (a range check on a
    * NULL value is not a pass) — callers encode NULL-tolerance explicitly. */
  final case class RowCheck(name: String, violation: Column) extends Check

  /** Violations = count(*) − count(distinct cols): the number of surplus
    * rows occupying an already-claimed key. */
  final case class UniqueCheck(name: String, cols: Seq[String]) extends Check

  /** Child rows whose `childCol` has no match in `parent.parentCol`. */
  final case class FkCheck(name: String, childCol: String,
                           parent: DataFrame, parentCol: String) extends Check

  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val rowChecks = checks.collect { case c: RowCheck => c }
    val uniques   = checks.collect { case c: UniqueCheck => c }
    val fks       = checks.collect { case c: FkCheck => c }
    val aggCols =
      rowChecks.map(c => sum(when(coalesce(c.violation, lit(true)), 1L).otherwise(0L)).as(c.name)) ++
        uniques.map(c =>
          (count(lit(1)) - countDistinct(col(c.cols.head), c.cols.tail.map(col): _*)).as(c.name))
    val scanPart: Seq[DataFrame] =
      if (aggCols.isEmpty) Nil
      else {
        val names = rowChecks.map(_.name) ++ uniques.map(_.name)
        Seq(df.agg(aggCols.head, aggCols.tail: _*)
          .select(explode(array(names.map(n =>
            struct(lit(n).as("check_name"), col(n).as("n_violations"))): _*)).as("kv"))
          .select(col("kv.check_name").as("check_name"), col("kv.n_violations").as("n_violations")))
      }
    val fkParts = fks.map { c =>
      df.join(c.parent.select(col(c.parentCol).as(c.childCol)), Seq(c.childCol), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(c.name).as("check_name"), col("n_violations"))
    }
    (scanPart ++ fkParts).reduce(_.unionByName(_))
  }
}
