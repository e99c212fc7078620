package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Connected components via iterative min-label hash-join propagation
 * (HashMin — BASELINE.json:6; cf. Kiveris et al., "Connected Components in
 * MapReduce and Beyond", SoCC 2014). Labels are **exact**: label(v) = min
 * vertex id reachable from v treating edges as undirected.
 *
 * Each superstep: every vertex sends its current label along every undirected
 * edge; new label = min(own, received). Converged when no label changes —
 * integer exactness makes the stop test exact. Lineage truncated per
 * superstep; messages use the same src-partitioned cached edge table pattern
 * as PageRank, so per-superstep shuffle is O(|V|) labels, not O(|E|) edges.
 *
 * HashMin rounds = graph diameter; web graphs are small-diameter so this is
 * the right trade at scale (the alternating large-star/small-star variant is
 * a drop-in behind the same signature if ever needed).
 */
object ConnectedComponents {

  def run(spark: SparkSession, edges: DataFrame,
          numPartitions: Int = 0, maxIter: Int = 100,
          broadcastMaxRows: Long = 500000L): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val sym = GraphOps.partitionForIteration(GraphOps.symmetrized(edges), parts)
    sym.count()

    var labels = GraphOps.vertices(sym)
      .select(col("vid"), col("vid").as("label"))
      .repartition(parts, col("vid"))
      .localCheckpoint(true)

    // same broadcast-or-shuffle-hash selection as PageRank: broadcast the
    // O(|V|) label side while it fits, co-partitioned SHJ beyond — never SMJ
    // (it would re-sort the cached O(|E|) edge side every superstep)
    val nV = labels.count()
    def pin(df: DataFrame): DataFrame =
      if (nV <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")

    var changed = 1L
    var iter    = 0
    while (changed > 0 && iter < maxIter) {
      // ONE job per superstep: the vertex's own row carries its previous
      // label in `old` (messages carry null), so min(label)/min(old) in the
      // same aggregate yields both the new state and the exact change count —
      // no separate convergence-check join (mirrors PageRank's closing agg).
      val msgs = sym.join(pin(labels), sym("src") === labels("vid"))
        .select(sym("dst").as("vid"), labels("label"),
          lit(null).cast("long").as("old"))
      val own = labels.select(col("vid"), col("label"), col("label").as("old"))
      val next = msgs.unionByName(own)
        .groupBy("vid").agg(min(col("label")).as("label"), min(col("old")).as("old"))
      val mat = next.localCheckpoint(false) // materialized by the agg below
      changed = mat.agg(sum(when(col("label") < col("old"), 1L).otherwise(0L)))
        .first().getLong(0)
      GraphOps.freeCheckpoint(labels)
      labels = mat.select("vid", "label")
      iter += 1
    }
    sym.unpersist(false)
    labels
  }
}
