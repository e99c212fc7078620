package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/**
 * Storage-layout scale proofs: the two parquet-layout levers that decide
 * whether a 100 TB job shuffles/scans the world or only its slice, asserted
 * on executed plans over real written files — not by convention.
 *
 *  1. **Bucketed co-located join** (`bucketBy` + `sortBy` + `saveAsTable`):
 *     two tables bucketed the same way on the join key join with ZERO
 *     shuffle exchanges — the layout IS the exchange, paid once at write
 *     time and amortized over every subsequent join. At 100 TB this converts
 *     the fact⋈fact join from a full two-sided shuffle into a local
 *     per-bucket merge.
 *  2. **Partition-pruned scan** (`partitionBy` at write): a filter on the
 *     partition column prunes directories BEFORE any file is opened —
 *     the scan's partition count collapses from all partitions to the
 *     selected ones, independent of table size.
 */
class StorageLayoutSpec extends SparkSpec {

  private def tmp(tag: String) =
    s"${sys.props("java.io.tmpdir")}/graft_layout_${tag}_${System.nanoTime()}"

  /** Strip the AQE wrapper so collected nodes reflect the final plan. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }

  test("bucketed co-located join runs with zero shuffle exchanges and exact results") {
    val wh = tmp("warehouse")
    val s2 = spark.newSession()
    // bucket pruning/alignment needs the bucketed-scan flag (default on; pin
    // it so the proof doesn't depend on ambient conf)
    s2.conf.set("spark.sql.sources.bucketing.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    import s2.implicits._

    val orders = s2.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val li     = s2.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // external tables with explicit paths — the warehouse dir is a static
    // conf the shared test JVM can't change
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").mode("overwrite").saveAsTable("lineitem_b")

    val joined = s2.table("lineitem_b")
      .join(s2.table("orders_b"), $"l_orderkey" === $"o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("long")).as("qty"))
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // the join itself must be exchange-free; the closing groupBy aggregates
    // 5 rows per bucket, so the ONLY tolerated exchange is the one feeding
    // the final aggregate, never one on a join key. Assert on the printed
    // final plan: AQE wraps executed stages in QueryStageExec LEAF nodes, so
    // tree `collect` cannot see inside them — the string form can.
    val plan = finalPlan(joined).toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffled join operator:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan did not use the bucketed layout:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles its inputs on the join key:\n$plan")

    // exactness vs the plain (shuffling) join on the raw parquet
    val want = li.join(orders, $"l_orderkey" === $"o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("long")).as("qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)

    s2.sql("DROP TABLE IF EXISTS orders_b")
    s2.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("partition-column filter prunes partitions at the scan, before any file is read") {
    val dir = tmp("events_parted")
    val ev  = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(dir)

    val one = spark.read.parquet(dir).filter(col("event_type") === "click")
      .select("event_id", "event_type")
    val planStr = one.queryExecution.executedPlan.toString
    // partition filters are applied to the directory listing — they must NOT
    // appear as (unpushable) data filters, and the scan must record them
    assert(planStr.contains("PartitionFilters:") &&
      planStr.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(event_type"),
      s"partition filter not recognized:\n$planStr")

    // behavioral proof, not just plan text: the pruned scan reads exactly the
    // one directory's files
    val scans = one.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val types = ev.select("event_type").distinct().count()
    assert(types >= 2, "corpus must have several event types for the proof to bite")
    val prunedFiles = scans.map(_.selectedPartitions.totalNumberOfFiles).sum
    val allFiles = spark.read.parquet(dir).select("event_id")
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.selectedPartitions.totalNumberOfFiles).sum
    assert(prunedFiles < allFiles,
      s"pruned scan reads $prunedFiles of $allFiles files — no pruning happened")

    // and the values are right
    val n = one.count()
    val want = ev.filter(col("event_type") === "click").count()
    assert(n == want)
  }
}
