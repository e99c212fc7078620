package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic hash-guided graph walks — DeepWalk/node2vec-style corpus
 * generation (Perozzi et al., KDD 2014) with the RNG replaced by an explicit
 * integer hash of (step, current, candidate), so the "random" choice is a
 * pure function of the graph: reproducible across runs, partitionings, AND
 * engines (the DuckDB oracle replays the identical arithmetic — a builtin
 * like xxhash64 would diverge cross-engine).
 *
 * Scale shape: step i is ONE equi-join of the frontier against the edge
 * list on the current vertex plus ONE aggregate choosing the arg-min-hash
 * neighbor (`min` over a (hash, dst) struct — lexicographic struct ordering
 * gives the deterministic tie-break for free, no sort, no window). k steps
 * = k join+agg rounds over |seeds| rows each; the edge side co-partitions
 * with any src-hash layout, and walk state rides the frontier row, so at
 * 100 TB this is k narrow shuffles of the (small) walk table, never a
 * re-shuffle of the edges.
 *
 * Dead ends (dangling vertex, or a walk already dead) emit the −1 sentinel
 * and stay −1: the left join finds no neighbor, `min` over no candidates is
 * NULL, and coalesce pins the sentinel — no special-case branch.
 */
object RandomWalk {

  /** Multiplicative-hash step scorer; all operands are small non-negative
    * vertex ids (≤ ~1e7 on the harness corpora), so the products stay far
    * from Long overflow under ANSI arithmetic. */
  private def score(step: Int, v: Column, d: Column): Column =
    (v * lit(2654435761L) + d * lit(40503L) + lit(step * 9973L)) % lit(1000003L)

  /**
   * Walk `k` hash-guided steps from every row of `seeds` (column `seed`)
   * over `edges` (`src`, `dst`). Returns (seed, v1, …, vk), −1 once dead.
   */
  def walk(edges: DataFrame, seeds: DataFrame, k: Int): DataFrame = {
    var cur = seeds.select(col("seed"), col("seed").as("v"))
    for (i <- 1 to k) {
      val carried = cur.columns.filter(_ != "v").toSeq
      // fresh projection with renamed columns per step: after step 1 the
      // frontier's lineage already contains the edge table, and an unrenamed
      // second join would be an ambiguous self-join
      val e = edges.select(col("src").as("__w_src"), col("dst").as("__w_dst"))
      val chosen = cur.join(e, cur("v") === col("__w_src"), "left")
        .groupBy((carried :+ "v").map(cur(_)): _*)
        .agg(min(when(col("__w_dst").isNotNull,
          struct(score(i, cur("v"), col("__w_dst")).as("h"),
            col("__w_dst").as("d")))).as("m"))
      cur = chosen.select(
        (carried.map(col) :+ coalesce(col("m.d"), lit(-1L)).as(s"v$i")): _*)
        .withColumn("v", col(s"v$i"))
    }
    cur.drop("v")
  }

  /** The same walk, emitted as oracle SQL over the `edges`/`verts` CTEs of
    * [[DocGraph.graphCtes]] — one window-ranked CTE per step, constants
    * generated from the identical expressions the Column path uses. */
  def walkSql(seedPred: String, k: Int): String = {
    val sb = new StringBuilder(
      s",\nw0 AS (SELECT vid AS seed, vid AS v FROM verts WHERE $seedPred)")
    for (i <- 1 to k) {
      val p = i - 1
      sb.append(s""",
        |n$i AS (SELECT w$p.seed, e.dst, row_number() OVER (PARTITION BY w$p.seed
        |        ORDER BY (w$p.v*2654435761 + e.dst*40503 + ${i * 9973}) % 1000003, e.dst) AS rn
        |        FROM w$p JOIN edges e ON e.src = w$p.v),
        |w$i AS (SELECT w$p.* REPLACE (coalesce(s.dst, -1) AS v), coalesce(s.dst, -1) AS v$i
        |        FROM w$p LEFT JOIN (SELECT seed, dst FROM n$i WHERE rn = 1) s USING (seed))"""
        .stripMargin)
    }
    sb.toString
  }
}
