package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synchronous label propagation for community detection (Raghavan, Albert,
 * Kumara 2007; mandated BASELINE.json:6). Exactness requires a fully pinned
 * schedule (SURVEY.md §7.3 #1):
 *
 *  - labels init to own vertex id;
 *  - **synchronous** supersteps (all vertices update from the previous
 *    iteration's labels — no async order-dependence);
 *  - new label = the most frequent label among undirected neighbors,
 *    deterministic tie-break = smallest label (built-in `max_by` over the
 *    ordering key `(count, -label)` — no UDAF, stays in codegen);
 *  - isolated vertices keep their own label;
 *  - fixed `maxIter` cap (synchronous LPA can 2-cycle on bipartite
 *    structures; the cap pins the output deterministically).
 */
object LabelPropagation {

  def run(spark: SparkSession, edges: DataFrame,
          numPartitions: Int = 0, maxIter: Int = 20,
          broadcastMaxRows: Long = 500000L): DataFrame = {
    // explicit numPartitions honored exactly; otherwise right-sized from the
    // materialized symmetric edge count (same rationale as PageRank.run)
    val (sym, _, parts) =
      if (numPartitions > 0) {
        val s0 = GraphOps.partitionForIteration(GraphOps.symmetrized(edges), numPartitions)
        (s0, s0.count(), numPartitions)
      } else {
        GraphOps.layoutForIteration(GraphOps.symmetrized(edges),
          spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      }

    var labels = GraphOps.vertices(sym)
      .select(col("vid"), col("vid").as("label"))
      .repartition(parts, col("vid"))
      .localCheckpoint(true)

    // same broadcast-or-shuffle-hash selection as PageRank/CC: broadcast the
    // O(|V|) label side while it fits, co-partitioned SHJ beyond — never SMJ
    val nV = labels.count()
    def pin(df: DataFrame): DataFrame =
      if (nV <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")

    var iter    = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbr = sym.join(pin(labels), sym("src") === labels("vid"))
        .select(sym("dst").as("vid"), labels("label"))
      val freq = nbr.groupBy("vid", "label").agg(count(lit(1)).as("cnt"))
      // tie-break toward the smallest label via an overflow-free descending
      // key: ~label is monotone-decreasing over all longs (ANSI-safe, unlike
      // -label which throws on Long.MinValue)
      val winner = freq.groupBy("vid")
        .agg(max_by(col("label"),
          struct(col("cnt"), bitwise_not(col("label")).as("nl"))).as("newLabel"))
      // ONE job per superstep: carry the previous label through the join and
      // fold the changed-count into the materializing aggregate
      val next = labels.join(pin(winner), Seq("vid"), "left")
        .select(col("vid"), coalesce(col("newLabel"), col("label")).as("label"),
          col("label").as("old"))
      val mat = next.localCheckpoint(false) // materialized by the agg below
      changed = mat.agg(sum(when(col("label") =!= col("old"), 1L).otherwise(0L)))
        .first().getLong(0)
      GraphOps.freeCheckpoint(labels)
      labels = mat.select("vid", "label")
      iter += 1
    }
    sym.unpersist(false)
    labels
  }
}
