package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Condensation (SCC quotient) of a directed graph and topological layering
 * over it — the structural read of the web bowtie (Broder et al., WWW 2000):
 * contracting every strongly connected component yields a DAG whose
 * longest-path depth from its sources is the "layer" of a component, i.e.
 * how far downstream of the crawl frontier a page cluster sits.
 *
 * `layer_k(c)` = max number of condensation edges on any path ending at c,
 * over paths of ≤ k edges — computed by k max-plus supersteps
 * (lᵢ₊₁(c) = max(lᵢ(c), max_{c'→c} lᵢ(c') + 1), l₀ ≡ 0), the MAX-PLUS dual
 * of [[graft.operators.DocGraph.bfsIter]]'s min-plus relaxation. On a DAG
 * of depth ≤ k this is the exact topological layer; at fixed k it is exact
 * truncated semantics either way (both engines replay it identically).
 *
 * 100 TB shape: SCC is the dominant cost (see
 * [[StronglyConnectedComponents]]); condensing is two membership equi-joins
 * + a distinct whose output is |condensation| ≪ |E| for web graphs (one
 * giant SCC absorbs the core). The layering loop then runs on the SMALL
 * condensed DAG: zero driver actions per superstep (lazy checkpoint chain,
 * one materializing action), same discipline as every iterative driver here.
 */
object Condensation {

  /** Distinct condensation edges (cs, cd) of `edges` under the (vid, scc_id)
    * membership `scc`: one row per ordered SCC pair with any cross link,
    * self-pairs (intra-SCC edges) dropped. */
  def condense(edges: DataFrame, scc: DataFrame): DataFrame = {
    val sa = scc.select(col("vid").as("src"), col("scc_id").as("cs"))
    val sb = scc.select(col("vid").as("dst"), col("scc_id").as("cd"))
    edges.join(sa, Seq("src")).join(sb, Seq("dst"))
      .filter(col("cs") =!= col("cd"))
      .select(col("cs"), col("cd")).distinct()
  }

  /** Per-vertex topological layer after exactly k max-plus supersteps over
    * the condensation of `edges`: (vid, scc_id, layer_k). */
  def topoLayers(spark: SparkSession, edges: DataFrame, k: Int,
                 assumeDistinct: Boolean = false,
                 broadcastMaxRows: Long = 500000L): DataFrame = {
    val scc = StronglyConnectedComponents.run(spark, edges,
      assumeDistinct = assumeDistinct).localCheckpoint(true)
    val ce  = condense(edges, scc).localCheckpoint(true)
    // r6 crossover pin: the layering state is one row per CONDENSATION
    // component (≤ |V|, ≪ |V| on web graphs) — below the crossover it
    // broadcasts instead of re-shuffling per max-plus superstep; the
    // membership count is a cheap scan of the eager scc checkpoint
    val nV = scc.count()
    def pin(df: DataFrame): DataFrame =
      if (nV <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var st = scc.select(col("scc_id").as("c")).distinct()
      .select(col("c"), lit(0L).as("l"))
      .localCheckpoint(false)
    inter += st
    for (_ <- 1 to k) {
      val msgs = ce.join(pin(st), ce("cs") === st("c"))
        .select(ce("cd").as("c"), (col("l") + 1L).as("l"))
      st = msgs.unionByName(st.select(col("c"), col("l")))
        .groupBy("c").agg(max(col("l")).as("l"))
        .localCheckpoint(false)
      inter += st
    }
    val out = scc.join(pin(st), scc("scc_id") === st("c"))
      .select(col("vid"), col("scc_id"), col("l").as(s"layer$k"))
      .localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    GraphOps.freeCheckpoint(scc)
    GraphOps.freeCheckpoint(ce)
    out
  }

  /** Oracle SQL for [[topoLayers]]: recursive-closure SCC ground truth
    * (q_scc's convention — algorithm-independent), condensation, then k
    * chained max-plus CTEs. `edgesCte` must define `edges(src, dst)`. */
  def topoLayersSql(edgesCte: String, k: Int): String = {
    val b = new StringBuilder(edgesCte.replaceFirst("^WITH ", "WITH RECURSIVE "))
    b.append(
      """,
        |verts AS MATERIALIZED (SELECT DISTINCT vid FROM
        |  (SELECT src AS vid FROM edges UNION ALL SELECT dst FROM edges)),
        |reach AS (
        |  SELECT src AS s, dst AS t FROM edges
        |  UNION
        |  SELECT r.s, e.dst FROM reach r JOIN edges e ON e.src = r.t),
        |mn AS MATERIALIZED (
        |  SELECT r1.s AS u, min(r1.t) AS m
        |  FROM reach r1 JOIN reach r2 ON r1.s = r2.t AND r1.t = r2.s
        |  GROUP BY r1.s),
        |scc AS MATERIALIZED (
        |  SELECT v.vid, CAST(least(v.vid, coalesce(mn.m, v.vid)) AS BIGINT) AS scc_id
        |  FROM verts v LEFT JOIN mn ON mn.u = v.vid),
        |ce AS MATERIALIZED (SELECT DISTINCT sa.scc_id AS cs, sb.scc_id AS cd
        |  FROM edges e JOIN scc sa ON e.src = sa.vid JOIN scc sb ON e.dst = sb.vid
        |  WHERE sa.scc_id <> sb.scc_id),
        |l0 AS MATERIALIZED (SELECT DISTINCT scc_id AS c, CAST(0 AS BIGINT) AS l FROM scc)""".stripMargin)
    for (i <- 1 to k) {
      val p = i - 1
      b.append(s""",
        |l$i AS MATERIALIZED (SELECT c, max(l) AS l FROM (
        |  SELECT ce.cd AS c, lp.l + 1 AS l FROM ce JOIN l$p lp ON ce.cs = lp.c
        |  UNION ALL SELECT c, l FROM l$p) GROUP BY c)""".stripMargin)
    }
    b.append(s"\nSELECT s.vid, s.scc_id, l$k.l AS layer$k FROM scc s JOIN l$k ON s.scc_id = l$k.c")
    b.toString
  }
}
