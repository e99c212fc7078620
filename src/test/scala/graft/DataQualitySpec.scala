package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.DataQuality._

/**
 * The harness corpus is clean (q_dq_checks reads all zeros), so this spec
 * plants every violation class in a fixture and pins the exact counts —
 * proof the audit counts violations rather than constants.
 */
class DataQualitySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("v", DoubleType, nullable = true),
    StructField("fk", LongType, nullable = true)))

  private def df = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, 10.0, 100L),
      Row(2L, -3.0, 100L),     // range violation
      Row(2L, 5.0, 200L),      // duplicate key, orphan fk
      Row(null, null, 100L),   // null key, NULL predicate -> violation
      Row(4L, 60.0, null)),    // range violation, null fk -> orphan
      2), schema)

  private def parent = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(Row(100L)), 1),
    StructType(Seq(StructField("pk", LongType, nullable = false))))

  test("audit counts every planted violation class exactly") {
    val got = audit(df, Seq(
      RowCheck("k_not_null", col("k").isNull),
      UniqueCheck("k_unique", Seq("k")),
      RowCheck("v_range", !col("v").between(0, 50)),
      FkCheck("fk_parent", "fk", parent, "pk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "k_not_null" -> 1L,
      "k_unique" -> 2L,   // 5 rows − 3 distinct non-null keys (distinct skips NULL; SQL count(DISTINCT) agrees — pinned below)
      "v_range" -> 3L,    // -3.0, 60.0, and the NULL v (NULL predicate = violation)
      "fk_parent" -> 2L)) // fk=200 orphan + fk=null (anti-join keeps null-keyed rows)
  }

  test("uniqueness arithmetic is count minus countDistinct (nulls excluded from distinct)") {
    // 5 rows, distinct non-null keys {1,2,4} = 3 -> violations = 2 if nulls
    // counted as surplus; Spark's countDistinct ignores NULL, so the audit
    // reports 5 - 3 = 2 when a null key exists. Pin that contract.
    val v = audit(df, Seq(UniqueCheck("u", Seq("k")))).head().getLong(1)
    assert(v == 2L)
  }
}
