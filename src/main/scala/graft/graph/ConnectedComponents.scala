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
          numPartitions: Int = 0, maxIter: Int = 100): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val sym = GraphOps.partitionForIteration(GraphOps.symmetrized(edges), parts)
    sym.count()

    var labels = GraphOps.vertices(sym)
      .select(col("vid"), col("vid").as("label"))
      .repartition(parts, col("vid"))
      .localCheckpoint(true)

    var changed = 1L
    var iter    = 0
    while (changed > 0 && iter < maxIter) {
      val msgs = sym.join(labels.hint("shuffle_hash"), sym("src") === labels("vid"))
        .select(sym("dst").as("vid"), labels("label"))
      val next = msgs.union(labels)
        .groupBy("vid").agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("label", "old").hint("shuffle_hash"), "vid")
        .filter(col("label") =!= col("old")).count()
      GraphOps.freeCheckpoint(labels)
      labels = next
      iter += 1
    }
    sym.unpersist(false)
    labels
  }
}
