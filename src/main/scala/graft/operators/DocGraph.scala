package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph._

/**
 * Harness-facing deterministic link graph derived from the driver's
 * `documents.parquet` (FIXTURES.md §5). The derivation uses only
 * SQL-expressible integer arithmetic so every downstream query has an exact
 * DuckDB oracle on the same parquet:
 *
 *   doc i  →  (i*2654435761 + j*97 + 13) mod n      for j in 0..(i mod 7)
 *   (self-loops removed, duplicates removed)
 *
 * `doc_id` is contiguous 0..n-1 in the testdata, so vertex ids are doc ids.
 */
object DocGraph {

  def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  // One count() job per sfDir per JVM, not per query: the testdata tables are
  // immutable for a run, and ~20 graph queries each need |docs| to derive the
  // edge table — uncached that is one extra Spark job per query.
  private val nDocsMemo = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def nDocs(spark: SparkSession, sfDir: String): Long =
    nDocsMemo.computeIfAbsent(sfDir, d => docs(spark, d).count()).longValue()

  /** The derived edge table (src, dst) — matches the `edges` CTE in oracle SQL. */
  def edges(spark: SparkSession, sfDir: String): DataFrame = {
    val n = nDocs(spark, sfDir)
    docs(spark, sfDir)
      .select(col("doc_id"))
      .withColumn("j", explode(sequence(lit(0L), col("doc_id") % lit(7L))))
      .select(col("doc_id").as("src"),
        ((col("doc_id") * lit(2654435761L) + col("j") * lit(97L) + lit(13L)) % lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** SQL prefix defining the same edge table for the DuckDB oracle.
    * Iterative oracles chain CTEs that are each referenced more than once —
    * `AS MATERIALIZED` stops DuckDB from inlining them (inlining doubles the
    * plan per iteration: 2^k blowup for a k-superstep oracle). */
  val edgesCte: String =
    """WITH edges AS MATERIALIZED (
      |  SELECT DISTINCT d.doc_id AS src,
      |         (d.doc_id*2654435761 + f.j*97 + 13) % (SELECT count(*) FROM documents) AS dst
      |  FROM documents d
      |  JOIN (SELECT unnest(range(0,7)) AS j) f ON f.j <= d.doc_id % 7
      |  WHERE d.doc_id <> (d.doc_id*2654435761 + f.j*97 + 13) % (SELECT count(*) FROM documents)
      |)""".stripMargin

  /** Shared graph CTEs on top of `edges` (undirected set, degrees, vertices). */
  val graphCtes: String = edgesCte +
    """,
      |und AS MATERIALIZED (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM edges),
      |sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b AS src, a AS dst FROM und),
      |verts AS MATERIALIZED (SELECT DISTINCT vid FROM (SELECT src AS vid FROM edges UNION ALL SELECT dst AS vid FROM edges)),
      |outdeg AS MATERIALIZED (SELECT src AS vid, count(*) AS c FROM edges GROUP BY src),
      |nv AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)""".stripMargin

  /**
   * Exactly k PageRank supersteps (same arithmetic as PageRank.run). Output
   * is the rank scaled to an integer, `floor(r*1e7 + 0.5 + 1e-6)`: the two
   * engines compute r identically to ≲1e-11 absolute at this scale, and the
   * 1e-6 nudge moves the discretization boundary away from the exact .5
   * points that plain `round` hits when ranks are short decimal fractions —
   * making the integer comparison robust cross-engine.
   */
  def prIter(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val e   = edges(spark, sfDir)
    val res = PageRank.run(spark, e,
      PageRankConfig(eps = 0.0, maxIter = k, ckptEvery = 0))
    res.ranks.select(col("vid"),
      floor(col("rank") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"pr${k}e7"))
  }

  /** Oracle SQL for exactly k PageRank supersteps (k small; CTE per superstep). */
  def prIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      """,
        |r0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE)/nv.n AS r FROM verts CROSS JOIN nv)""".stripMargin)
    for (i <- 1 to k) {
      sb.append(s""",
        |s$i AS MATERIALIZED (SELECT e.dst AS vid, sum(r${i - 1}.r / o.c) AS s
        |        FROM edges e JOIN r${i - 1} ON e.src = r${i - 1}.vid JOIN outdeg o ON e.src = o.vid
        |        GROUP BY e.dst),
        |d$i AS MATERIALIZED (SELECT CAST(1.0 AS DOUBLE) - sum(s) AS dm FROM s$i),
        |r$i AS MATERIALIZED (SELECT v.vid,
        |               CAST(0.15 AS DOUBLE)/nv.n + CAST(0.85 AS DOUBLE)*d$i.dm/nv.n
        |                 + CAST(0.85 AS DOUBLE)*coalesce(s$i.s, 0) AS r
        |        FROM verts v CROSS JOIN nv CROSS JOIN d$i LEFT JOIN s$i ON v.vid = s$i.vid)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, CAST(floor(r*1e7 + 0.500001) AS BIGINT) AS pr${k}e7 FROM r$k")
    sb.toString
  }

  /** Nullable global double sum as a driver scalar — the one audited idiom
    * behind the fixed-k iterative drivers' normalization/dangling terms
    * (`ifEmpty` covers the empty-frontier case each caller documents). */
  private def scalarSum(df: DataFrame, c: String, ifEmpty: Double): Double = {
    val r = df.agg(sum(c)).first()
    if (r.isNullAt(0)) ifEmpty else r.getDouble(0)
  }

  /**
   * Exactly k personalized-PageRank supersteps (random walk with restart to
   * the seed set `vid % 100 == 0`): r₀ = uniform over seeds;
   * rᵢ₊₁(v) = (1−d)·p(v) + d·(Σ_{u→v} rᵢ(u)/out(u) + danglingᵢ·p(v)), with
   * dangling mass restarted at the seeds (Σ r stays exactly 1). Same
   * integer pinning and cross-engine arithmetic-order discipline as
   * [[prIter]] (the 1e7 floor absorbs the ≲1e-11 partial-sum-order drift).
   */
  def pprIter(spark: SparkSession, sfDir: String, k: Int,
              d: Double = 0.85): DataFrame = {
    val e      = edges(spark, sfDir)
    val verts  = GraphOps.vertices(e)
    val outdeg = GraphOps.outDegrees(e)
    val nS = verts.filter(col("vid") % 100 === 0).count().toDouble
    require(nS > 0, "no seed vertices")
    var r = verts.select(col("vid"),
      when(col("vid") % 100 === 0, lit(1.0 / nS)).otherwise(lit(0.0)).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to k) {
      val sums = e.join(r, e("src") === r("vid"))
        .join(outdeg.withColumnRenamed("vid", "ov").withColumnRenamed("outDeg", "c"),
          e("src") === col("ov"))
        .groupBy(e("dst").as("dvid")).agg(sum(col("r") / col("c")).as("s"))
        .localCheckpoint(true)
      val dm = 1.0 - scalarSum(sums, "s", ifEmpty = 0.0)
      r = verts.join(sums, verts("vid") === sums("dvid"), "left")
        .select(verts("vid"),
          (when(verts("vid") % 100 === 0,
            lit((1.0 - d) / nS) + lit(d * dm / nS)).otherwise(lit(0.0))
            + lit(d) * coalesce(col("s"), lit(0.0))).as("r"))
        .localCheckpoint(true)
    }
    r.select(col("vid"),
      floor(col("r") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"ppr${k}e7"))
  }

  /** Oracle SQL for exactly k personalized-PageRank supersteps. `d` must
    * match the engine call's damping — the constants are generated from it
    * (Double.toString round-trips exactly through DuckDB's literal parser),
    * so a non-default damping can't silently diverge from its oracle. */
  def pprIterSql(k: Int, d: Double = 0.85): String = {
    val restart = (1.0 - d).toString
    val damp    = d.toString
    val sb = new StringBuilder(graphCtes)
    sb.append(
      """,
        |sd AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS ns FROM verts WHERE vid % 100 = 0),
        |p0 AS MATERIALIZED (SELECT v.vid,
        |        CASE WHEN v.vid % 100 = 0 THEN CAST(1.0 AS DOUBLE)/sd.ns ELSE CAST(0.0 AS DOUBLE) END AS r
        |        FROM verts v CROSS JOIN sd)""".stripMargin)
    for (i <- 1 to k) {
      sb.append(s""",
        |ps$i AS MATERIALIZED (SELECT e.dst AS vid, sum(p${i - 1}.r / o.c) AS s
        |        FROM edges e JOIN p${i - 1} ON e.src = p${i - 1}.vid JOIN outdeg o ON e.src = o.vid
        |        GROUP BY e.dst),
        |pd$i AS MATERIALIZED (SELECT CAST(1.0 AS DOUBLE) - sum(s) AS dm FROM ps$i),
        |p$i AS MATERIALIZED (SELECT v.vid,
        |        CASE WHEN v.vid % 100 = 0
        |          THEN CAST($restart AS DOUBLE)/sd.ns + CAST($damp AS DOUBLE)*pd$i.dm/sd.ns
        |          ELSE CAST(0.0 AS DOUBLE) END
        |          + CAST($damp AS DOUBLE)*coalesce(ps$i.s, 0) AS r
        |        FROM verts v CROSS JOIN sd CROSS JOIN pd$i LEFT JOIN ps$i ON v.vid = ps$i.vid)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, CAST(floor(r*1e7 + 0.500001) AS BIGINT) AS ppr${k}e7 FROM p$k")
    sb.toString
  }

  /**
   * Exactly k HITS iterations (Kleinberg 1999): h₀ = 1;
   * aᵢ(v) = Σ_{u→v} hᵢ₋₁(u), L1-normalized; hᵢ(v) = Σ_{v→w} aᵢ(w),
   * L1-normalized. L1 (not the textbook L2) keeps every operation a
   * sum/divide with bit-reproducible cross-engine shape — the fixed-point
   * direction is identical and the e7 floor pins the output exactly, the
   * same discipline as [[prIter]]/[[pprIter]].
   */
  def hitsIter(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val e     = edges(spark, sfDir)
    val verts = GraphOps.vertices(e)
    var h = verts.select(col("vid"), lit(1.0).as("h")).localCheckpoint(true)
    var a = h.select(col("vid"), col("h").as("a")) // overwritten in iteration 1
    for (_ <- 1 to k) {
      val ar = e.join(h, e("src") === h("vid"))
        .groupBy(e("dst").as("dvid")).agg(sum(col("h")).as("s"))
        .localCheckpoint(true)
      // ifEmpty = 1.0: an edgeless graph has an empty frontier; dividing the
      // all-zero raw scores by 1 keeps them zero instead of NaN
      val aSum = scalarSum(ar, "s", ifEmpty = 1.0)
      a = verts.join(ar, verts("vid") === ar("dvid"), "left")
        .select(verts("vid"), (coalesce(col("s"), lit(0.0)) / lit(aSum)).as("a"))
        .localCheckpoint(true)
      val hr = e.join(a, e("dst") === a("vid"))
        .groupBy(e("src").as("svid")).agg(sum(col("a")).as("s"))
        .localCheckpoint(true)
      val hSum = scalarSum(hr, "s", ifEmpty = 1.0)
      h = verts.join(hr, verts("vid") === hr("svid"), "left")
        .select(verts("vid"), (coalesce(col("s"), lit(0.0)) / lit(hSum)).as("h"))
        .localCheckpoint(true)
    }
    a.join(h, Seq("vid"))
      .select(col("vid"),
        floor(col("a") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"auth${k}e7"),
        floor(col("h") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"hub${k}e7"))
  }

  /** Oracle SQL for exactly k HITS iterations (L1-normalized, see [[hitsIter]]). */
  def hitsIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(",\nh0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE) AS h FROM verts)")
    for (i <- 1 to k) {
      sb.append(s""",
        |ar$i AS MATERIALIZED (SELECT e.dst AS vid, sum(h${i - 1}.h) AS s
        |        FROM edges e JOIN h${i - 1} ON e.src = h${i - 1}.vid GROUP BY e.dst),
        |at$i AS MATERIALIZED (SELECT sum(s) AS t FROM ar$i),
        |a$i AS MATERIALIZED (SELECT v.vid, coalesce(ar$i.s, CAST(0.0 AS DOUBLE))/at$i.t AS a
        |        FROM verts v CROSS JOIN at$i LEFT JOIN ar$i ON v.vid = ar$i.vid),
        |hr$i AS MATERIALIZED (SELECT e.src AS vid, sum(a$i.a) AS s
        |        FROM edges e JOIN a$i ON e.dst = a$i.vid GROUP BY e.src),
        |ht$i AS MATERIALIZED (SELECT sum(s) AS t FROM hr$i),
        |h$i AS MATERIALIZED (SELECT v.vid, coalesce(hr$i.s, CAST(0.0 AS DOUBLE))/ht$i.t AS h
        |        FROM verts v CROSS JOIN ht$i LEFT JOIN hr$i ON v.vid = hr$i.vid)""".stripMargin)
    }
    sb.append(s"""
      |SELECT a$k.vid, CAST(floor(a*1e7 + 0.500001) AS BIGINT) AS auth${k}e7,
      |       CAST(floor(h*1e7 + 0.500001) AS BIGINT) AS hub${k}e7
      |FROM a$k JOIN h$k ON a$k.vid = h$k.vid""".stripMargin)
    sb.toString
  }

  /**
   * Exactly k multi-source BFS supersteps over DIRECTED edges from the
   * vid%100 seed set: dist₀ = 0 at seeds; distᵢ₊₁(v) = min(distᵢ(v),
   * min_{u→v} distᵢ(u)+1). Exact integer arithmetic — unreached vertices
   * report -1 (a NULL-free sentinel for the driver's hash compare).
   */
  def bfsIter(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val e     = edges(spark, sfDir)
    val verts = GraphOps.vertices(e)
    var dist = verts.select(col("vid"),
      when(col("vid") % 100 === 0, lit(0L)).otherwise(lit(null).cast("long")).as("d"))
    for (_ <- 1 to k) {
      val msgs = e.join(dist, e("src") === dist("vid"))
        .filter(col("d").isNotNull)
        .select(e("dst").as("vid"), (col("d") + 1L).as("d"))
      // checkpoint per superstep: the self-referencing union would otherwise
      // double the logical plan each round (2^k analysis cost)
      dist = msgs.unionByName(dist.select(col("vid"), col("d")))
        .groupBy("vid").agg(min(col("d")).as("d"))
        .localCheckpoint(true)
    }
    dist.select(col("vid"), coalesce(col("d"), lit(-1L)).as(s"dist$k"))
  }

  /** Oracle SQL for exactly k multi-source BFS supersteps (see [[bfsIter]]). */
  def bfsIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      """,
        |b0 AS MATERIALIZED (SELECT vid,
        |        CASE WHEN vid % 100 = 0 THEN CAST(0 AS BIGINT) ELSE NULL END AS d FROM verts)""".stripMargin)
    for (i <- 1 to k) {
      sb.append(s""",
        |b$i AS MATERIALIZED (SELECT vid, min(d) AS d FROM (
        |          SELECT e.dst AS vid, b${i - 1}.d + 1 AS d
        |          FROM edges e JOIN b${i - 1} ON e.src = b${i - 1}.vid
        |          WHERE b${i - 1}.d IS NOT NULL
        |          UNION ALL SELECT vid, d FROM b${i - 1}
        |        ) GROUP BY vid)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, coalesce(d, -1) AS dist$k FROM b$k")
    sb.toString
  }

  /** Exactly k HashMin connected-component supersteps (exact integer labels). */
  def ccIter(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val sym = GraphOps.symmetrized(edges(spark, sfDir))
    var labels = GraphOps.vertices(sym).select(col("vid"), col("vid").as("label"))
    for (_ <- 1 to k) {
      val msgs = sym.join(labels, sym("src") === labels("vid"))
        .select(sym("dst").as("vid"), labels("label"))
      labels = msgs.union(labels).groupBy("vid").agg(min(col("label")).as("label"))
    }
    labels
  }

  def ccIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(",\nl0 AS (SELECT vid, vid AS label FROM verts)")
    for (i <- 1 to k) {
      sb.append(s""",
        |l$i AS MATERIALIZED (SELECT vid, min(label) AS label FROM (
        |          SELECT s.dst AS vid, l${i - 1}.label FROM sym s JOIN l${i - 1} ON s.src = l${i - 1}.vid
        |          UNION ALL SELECT vid, label FROM l${i - 1}
        |        ) GROUP BY vid)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, label FROM l$k")
    sb.toString
  }

  /** Engine formula of the PageRank base case is shared with PageRank.run; engine
    * arithmetic and the oracle SQL agree to <1e-15 per value, pinned by round(,7). */

  /** Exactly k synchronous label-propagation supersteps (LabelPropagation
    * semantics: most frequent neighbor label, ties → smallest label). */
  def lpIter(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val sym = GraphOps.symmetrized(edges(spark, sfDir))
    var labels = GraphOps.vertices(sym).select(col("vid"), col("vid").as("label"))
    for (_ <- 1 to k) {
      val nbr = sym.join(labels, sym("src") === labels("vid"))
        .select(sym("dst").as("vid"), labels("label"))
      val freq = nbr.groupBy("vid", "label").agg(count(lit(1)).as("cnt"))
      val winner = freq.groupBy("vid")
        .agg(max_by(col("label"),
          struct(col("cnt"), bitwise_not(col("label")).as("nl"))).as("newLabel"))
      labels = labels.join(winner, Seq("vid"), "left")
        .select(col("vid"), coalesce(col("newLabel"), col("label")).as("label"))
    }
    labels
  }

  def lpIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(",\np0 AS (SELECT vid, vid AS label FROM verts)")
    for (i <- 1 to k) {
      sb.append(s""",
        |n$i AS MATERIALIZED (SELECT s.dst AS vid, p${i - 1}.label FROM sym s JOIN p${i - 1} ON s.src = p${i - 1}.vid),
        |f$i AS MATERIALIZED (SELECT vid, label, count(*) AS c FROM n$i GROUP BY vid, label),
        |w$i AS MATERIALIZED (SELECT vid, label FROM (
        |          SELECT vid, label, row_number() OVER (PARTITION BY vid ORDER BY c DESC, label ASC) AS rn
        |          FROM f$i) WHERE rn = 1),
        |p$i AS MATERIALIZED (SELECT p.vid, coalesce(w$i.label, p.label) AS label
        |        FROM p${i - 1} p LEFT JOIN w$i ON p.vid = w$i.vid)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, label FROM p$k")
    sb.toString
  }
}
