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
  def edges(spark: SparkSession, sfDir: String): DataFrame =
    rawEdges(spark, sfDir).distinct()

  /** [[edges]] minus the final dedup — the input the one-exchange laid-out
    * builders below fold their dedup into. Self-loops already removed. */
  private def rawEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val n = nDocs(spark, sfDir)
    docs(spark, sfDir)
      .select(col("doc_id"))
      .withColumn("j", explode(sequence(lit(0L), col("doc_id") % lit(7L))))
      .select(col("doc_id").as("src"),
        ((col("doc_id") * lit(2654435761L) + col("j") * lit(97L) + lit(13L)) % lit(n)).as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** Expected |E| with NO job: each doc emits `doc_id % 7 + 1` candidate
    * links (mean 4, exact over any id-contiguous corpus); self-loop and
    * duplicate losses are ≲0.2 %. Only ever used to pick a partition count
    * (GraphOps.rightSizedParts) — correctness never depends on it. */
  private def estEdges(spark: SparkSession, sfDir: String): Long =
    4L * math.max(1L, nDocs(spark, sfDir))

  private def confParts(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Directed doc edge table laid out for iteration — same rows as
    * [[edges]], produced with ONE exchange (dedup folded into the
    * src-partitioned layout shuffle, guide §2.4) instead of the former
    * distinct-exchange → repartition-exchange → re-layout triple.
    * Returns (cached edges, |E|, parts); callers unpersist. */
  private[graft] def laidDirected(spark: SparkSession, sfDir: String): (DataFrame, Long, Int) =
    GraphOps.layoutDedupForIteration(rawEdges(spark, sfDir),
      confParts(spark), estEdges(spark, sfDir))

  /** [[laidDirected]] partitioned on `dst` instead of `src` — the layout the
    * broadcast-regime fixed-k PageRank wants: its per-superstep groupBy(dst)
    * lands on the cached partitioning (zero exchange), while the rank side
    * ships as a broadcast hash relation and never needs src clustering. */
  private[graft] def laidDirectedDst(spark: SparkSession, sfDir: String): (DataFrame, Long, Int) =
    GraphOps.layoutDedupForIteration(rawEdges(spark, sfDir),
      confParts(spark), estEdges(spark, sfDir), keyCol = "dst")

  /** Directed doc edges REVERSED (dst→src), laid out in one exchange —
    * the landmark driver's propagation orientation. */
  private[graft] def laidReversed(spark: SparkSession, sfDir: String): (DataFrame, Long, Int) =
    GraphOps.layoutDedupForIteration(
      rawEdges(spark, sfDir).select(col("dst").as("src"), col("src").as("dst")),
      confParts(spark), estEdges(spark, sfDir))

  /** Symmetric doc edge set (both orientations, distinct — identical rows to
    * `GraphOps.symmetrized(edges(…))`), laid out in ONE exchange: distinct of
    * the union of both orientations ≡ both orientations of the distinct
    * undirected set. */
  private[graft] def laidSym(spark: SparkSession, sfDir: String): (DataFrame, Long, Int) = {
    val r = rawEdges(spark, sfDir)
    GraphOps.layoutDedupForIteration(
      r.unionByName(r.select(col("dst").as("src"), col("src").as("dst"))),
      confParts(spark), 2L * estEdges(spark, sfDir))
  }

  /** Canonical undirected pairs a < b as (src, dst) — identical rows to
    * `GraphOps.undirected(edges(…))` under that renaming — laid out in ONE
    * exchange. */
  private[graft] def laidUnd(spark: SparkSession, sfDir: String): (DataFrame, Long, Int) =
    GraphOps.layoutDedupForIteration(
      rawEdges(spark, sfDir).select(
        least(col("src"), col("dst")).as("src"), greatest(col("src"), col("dst")).as("dst")),
      confParts(spark), estEdges(spark, sfDir))

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
    // below the broadcast crossover, lay the edges by DST and broadcast the
    // O(|V|) sides: the superstep then has zero exchanges (the groupBy(dst)
    // reuses the cached layout); beyond it, src layout + co-partitioned SHJ.
    // The crossover compares |V| (= nDocs, rank rows are one per vertex)
    // against the row threshold — PageRank.run's exact rule, not the 4×-
    // conservative edge estimate (r6 review fix).
    val bmr = 500000L
    if (nDocs(spark, sfDir) <= bmr)
      prIterLaid(spark, laidDirectedDst(spark, sfDir), k, broadcastPins = true)
    else
      prIterLaid(spark, laidDirected(spark, sfDir), k, broadcastPins = false)
  }

  /**
   * Fixed-k PageRank as a ZERO-actions-per-superstep lazy localCheckpoint
   * chain (bfsIter's discipline) — r6 optimization of the former
   * PageRank.run delegation, which paid one driver action per superstep to
   * fetch the dangling-mass scalar (plus per-superstep query planning):
   * measured 10.4–11.8 s → 7.5–8.5 s for k=40 at sf0.1/local[32], e7
   * output bit-identical (DeferredPrProbe, 0 mismatches).
   *
   * The dangling term moves IN-PLAN: a one-row aggregate of the previous
   * state (Σ rank over non-dangling — the same formulation PageRank.run
   * uses) attached by a broadcast HASH join on a degenerate non-foldable
   * key (`attr*0`), never a BroadcastNestedLoopJoin (PlanSpec's ban) and
   * never a cartesian. Arithmetic order mirrors PageRank.run's driver
   * computation term by term, so the ≲1e-11 summation-order drift the e7
   * floor absorbs is unchanged in kind. PageRank.run remains the
   * convergence/metrics/checkpoint engine (headline bench, entry(),
   * goldens, resume); this is the fixed-k oracle path only.
   */
  private[graft] def prIterLaid(spark: SparkSession, laid: (DataFrame, Long, Int),
                                k: Int, d: Double = 0.85,
                                broadcastPins: Boolean = false): DataFrame = {
    val (e, _, parts) = laid
    // pin the O(|V|) sides to match the caller's layout choice: broadcast
    // (dst-laid edges, zero-exchange superstep) below the crossover,
    // co-partitioned shuffle-hash (src-laid edges) beyond it
    def pin(df: DataFrame): DataFrame =
      if (broadcastPins) broadcast(df) else df.hint("shuffle_hash")
    val outdeg = GraphOps.outDegrees(e).repartition(parts, col("vid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = GraphOps.vertices(e).repartition(parts, col("vid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = verts.count()
    require(n > 0, "empty graph")
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var r = verts.join(outdeg, Seq("vid"), "left")
      .select(col("vid"), lit(1.0 / n).as("rank"), col("outDeg"))
      .localCheckpoint(false)
    inter += r
    for (_ <- 1 to k) {
      // transmitted mass of the current state, as a 1-row side table
      // attached by GraphOps.attachScalar (broadcast HASH join on a
      // degenerate non-foldable key — the audited BNLJ-free idiom)
      val tm = r.filter(col("outDeg").isNotNull)
        .agg(sum(col("rank")).as("tm"))
        .select(coalesce(col("tm"), lit(0.0)).as("tm"))
      val rankDeg = r.filter(col("outDeg").isNotNull)
        .select(col("vid"), (col("rank") / col("outDeg")).as("w"))
      val sums = e.join(pin(rankDeg), e("src") === rankDeg("vid"))
        .groupBy(e("dst").as("dvid")).agg(sum(col("w")).as("s"))
      val dang = greatest(lit(0.0), lit(1.0) - col("tm"))
      val base = lit(1.0 - d) / lit(n.toDouble) + (lit(d) * dang) / lit(n.toDouble)
      val newRank = base + lit(d) * coalesce(col("s"), lit(0.0))
      val joined = r.join(pin(sums), r("vid") === sums("dvid"), "left")
      val next = GraphOps.attachScalar(joined, r("vid"), tm, col("tm"))
        .select(r("vid"), newRank.as("rank"), r("outDeg"))
      // broadcast regime: fully lazy chain (zero actions per superstep).
      // Shuffle regime (big graphs): EAGER per-superstep checkpoint — the
      // scalar broadcast build otherwise becomes the job that materializes
      // the whole previous superstep inside spark.sql.broadcastTimeout
      // (300 s), a failure mode the per-superstep work of a 100 TB graph
      // could genuinely hit; there the one driver action per superstep is
      // noise against the superstep's own shuffle (r6 review fix).
      r = next.localCheckpoint(!broadcastPins)
      inter += r
    }
    val out = r.select(col("vid"),
      floor(col("rank") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"pr${k}e7"))
      .localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    e.unpersist(false); outdeg.unpersist(false); verts.unpersist(false)
    out
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

  // (the former scalarSum driver helper is gone — every fixed-k driver's
  // normalization/dangling scalar moved IN-PLAN via GraphOps.attachScalar,
  // r6; see prIterLaid for the idiom and its eager/lazy regime)

  /**
   * Exactly k personalized-PageRank supersteps (random walk with restart to
   * the seed set `vid % 100 == 0`): r₀ = uniform over seeds;
   * rᵢ₊₁(v) = (1−d)·p(v) + d·(Σ_{u→v} rᵢ(u)/out(u) + danglingᵢ·p(v)), with
   * dangling mass restarted at the seeds (Σ r stays exactly 1). Same
   * integer pinning and cross-engine arithmetic-order discipline as
   * [[prIter]] (the 1e7 floor absorbs the ≲1e-11 partial-sum-order drift —
   * including the dangling term's: like PageRank.run, dangling mass is
   * derived as 1 − Σ_{non-dangling} rᵢ from the PREVIOUS superstep's closing
   * aggregate, which equals the oracle's 1 − Σ sums up to summation order).
   */
  def pprIter(spark: SparkSession, sfDir: String, k: Int,
              d: Double = 0.85): DataFrame =
    pprIterLaid(spark, laidDirected(spark, sfDir), k, d)

  /**
   * [[pprIter]] core on an explicit edge table, ONE Spark job per superstep
   * (VERDICT r4 #2 — the former shape ran an eager checkpoint + scalar-sum
   * + eager checkpoint, 3 driver actions each round): ranks carry the static
   * nullable out-degree, the superstep's closing aggregate computes the next
   * round's transmitted mass while materializing the lazily-checkpointed new
   * state, exactly PageRank.run's pattern. JobCountSpec pins the count.
   */
  private[graft] def pprIterEdges(spark: SparkSession, edges0: DataFrame, k: Int,
                                  d: Double = 0.85,
                                  broadcastMaxRows: Long = 500000L): DataFrame =
    pprIterLaid(spark, GraphOps.layoutForIteration(
      edges0.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
      confParts(spark)), k, d, broadcastMaxRows)

  private def pprIterLaid(spark: SparkSession, laid: (DataFrame, Long, Int), k: Int,
                          d: Double = 0.85,
                          broadcastMaxRows: Long = 500000L): DataFrame = {
    val (e, nE, parts) = laid
    val outdeg = GraphOps.outDegrees(e).repartition(parts, col("vid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = GraphOps.vertices(e).repartition(parts, col("vid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nS = verts.filter(col("vid") % 100 === 0).count().toDouble
    require(nS > 0, "no seed vertices")
    // r6 crossover pin sized from the laid |E| (see matchIterLaid)
    def pin(df: DataFrame): DataFrame =
      if (nE <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")

    // r6: ZERO driver actions per superstep (prIterLaid's deferral) — the
    // dangling term moves IN-PLAN as a one-row transmitted-mass aggregate of
    // the previous state, attached by a broadcast HASH join on a degenerate
    // non-foldable key; arithmetic order mirrors the former driver scalar
    // term by term, so only the e7-absorbed summation-order drift changes.
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var r = verts.join(outdeg, Seq("vid"), "left")
      .select(col("vid"),
        when(col("vid") % 100 === 0, lit(1.0 / nS)).otherwise(lit(0.0)).as("r"),
        col("outDeg"))
      .localCheckpoint(false)
    inter += r

    // broadcast regime: fully lazy; shuffle regime: eager per-superstep
    // state so the scalar broadcast build never carries a whole superstep
    // inside the broadcast timeout (see prIterLaid, r6 review fix)
    val eagerState = nE > broadcastMaxRows
    for (_ <- 1 to k) {
      val tm = r.filter(col("outDeg").isNotNull)
        .agg(sum(col("r")).as("tm"))
        .select(coalesce(col("tm"), lit(0.0)).as("tm"))
      val rankDeg = r.filter(col("outDeg").isNotNull)
        .select(col("vid"), (col("r") / col("outDeg")).as("w"))
      val sums = e.join(pin(rankDeg), e("src") === rankDeg("vid"))
        .groupBy(e("dst").as("dvid")).agg(sum(col("w")).as("s"))
      val dmTerm = (lit(d) * (lit(1.0) - col("tm"))) / lit(nS)
      val joined = r.join(pin(sums), r("vid") === sums("dvid"), "left")
      val next = GraphOps.attachScalar(joined, r("vid"), tm, col("tm"))
        .select(r("vid"),
          (when(r("vid") % 100 === 0,
            lit((1.0 - d) / nS) + dmTerm).otherwise(lit(0.0))
            + lit(d) * coalesce(col("s"), lit(0.0))).as("r"),
          r("outDeg"))
      r = next.localCheckpoint(eagerState)
      inter += r
    }
    val out = r.select(col("vid"),
      floor(col("r") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"ppr${k}e7"))
      .localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    e.unpersist(false); outdeg.unpersist(false); verts.unpersist(false)
    out
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
        |pd$i AS MATERIALIZED (SELECT CAST(1.0 AS DOUBLE) - coalesce(sum(s), CAST(0.0 AS DOUBLE)) AS dm FROM ps$i),
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
  def hitsIter(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    hitsIterCore(spark, linkAnalysisLaid(spark, laidDirected(spark, sfDir)), k)

  /**
   * Shared HITS/SALSA layout: co-partitioned edges plus degree-PRE-JOINED,
   * persisted vertex tables — a degree join inside the iteration loop
   * would re-run per half-step, and its unpinned BroadcastExchange submits
   * an extra async job each time (the per-superstep action creep the r4
   * rewrite removed). Callers unpersist all three.
   */
  private def linkAnalysisLayout(spark: SparkSession, edges0: DataFrame)
      : (DataFrame, DataFrame, DataFrame, Long) =
    linkAnalysisLaid(spark, GraphOps.layoutForIteration(
      edges0.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
      confParts(spark)))

  private def linkAnalysisLaid(spark: SparkSession, laid: (DataFrame, Long, Int))
      : (DataFrame, DataFrame, DataFrame, Long) = {
    val (e, _, parts) = laid
    val vertsOut = GraphOps.vertices(e)
      .join(GraphOps.outDegrees(e), Seq("vid"), "left")
      .repartition(parts, col("vid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vertsIn = GraphOps.vertices(e)
      .join(GraphOps.inDegrees(e), Seq("vid"), "left")
      .repartition(parts, col("vid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (e, vertsOut, vertsIn, vertsOut.count())
  }

  /**
   * [[hitsIter]] core on an explicit edge table, ZERO driver actions per
   * half-step (r6; the r4 shape ran one job per half-step to fetch the
   * normalizer). The identity is unchanged — the normalizer each half-step
   * needs is derivable from the PREVIOUS state:
   * Σ_{(u→v)} h(u) = Σ_u h(u)·out(u) and Σ_{(u→v)} a(v) = Σ_v a(v)·in(v) —
   * so `h` rows carry the static nullable out-degree and `a` rows the
   * in-degree; r6 moves that one-row aggregate IN-PLAN (broadcast hash join
   * on a degenerate non-foldable key, prIterLaid's deferral), making the
   * whole k-iteration run a lazy checkpoint chain with one materializing
   * action. Summation order differs from the oracle's Σ-of-groups by
   * ≲1e-15 relative; the e7 floor pins it (same discipline as prIter).
   */
  private[graft] def hitsIterEdges(spark: SparkSession, edges0: DataFrame, k: Int,
                                   broadcastMaxRows: Long = 500000L): DataFrame =
    hitsIterCore(spark, linkAnalysisLayout(spark, edges0), k, broadcastMaxRows)

  private def hitsIterCore(spark: SparkSession,
                           layout: (DataFrame, DataFrame, DataFrame, Long), k: Int,
                           broadcastMaxRows: Long = 500000L): DataFrame = {
    val (e, vertsOut, vertsIn, nV) = layout
    def pin(df: DataFrame): DataFrame =
      if (nV <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")
    // ifEmpty = 1.0 below: an edgeless graph has an empty frontier (every
    // degree null ⇒ the weighted sum has no non-null term); dividing the
    // all-zero raw scores by 1 keeps them zero instead of NaN — identical to
    // the former Σ-over-empty-frontier-rows semantics (degree is non-null on
    // exactly the vertices a frontier row could reach).
    def weighted(df: DataFrame, score: String, deg: String): DataFrame =
      df.filter(col(deg).isNotNull).select((col(score) * col(deg)).as("ws"))

    // r6: ZERO driver actions per half-step — each half-step's L1
    // normalizer (Σ score·degree of the previous state) becomes an in-plan
    // one-row aggregate attached by a broadcast hash join on a degenerate
    // non-foldable key (prIterLaid's deferral); `coalesce(Σ, 1.0)` keeps
    // the former ifEmpty semantics. Division order is unchanged — only the
    // e7-absorbed summation order of the normalizer itself moves.
    def normOf(df: DataFrame, score: String, deg: String): DataFrame =
      weighted(df, score, deg).agg(sum(col("ws")).as("nrm"))
        .select(coalesce(col("nrm"), lit(1.0)).as("nrm"))
    // eager state beyond the crossover — see prIterLaid (r6 review fix)
    val eagerState = nV > broadcastMaxRows
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var h = vertsOut
      .select(col("vid"), lit(1.0).as("h"), col("outDeg"))
      .localCheckpoint(false)
    inter += h
    var a = h.select(col("vid"), col("h").as("a")) // overwritten in iteration 1
    for (_ <- 1 to k) {
      val aNorm = normOf(h, "h", "outDeg")
      val ar = e.join(pin(h.select(col("vid"), col("h"))), e("src") === col("vid"))
        .groupBy(e("dst").as("dvid")).agg(sum(col("h")).as("s"))
      val nextA = GraphOps.attachScalar(
          vertsIn.join(pin(ar), col("vid") === ar("dvid"), "left"),
          col("vid"), aNorm, col("nrm"))
        .select(col("vid"), (coalesce(col("s"), lit(0.0)) / col("nrm")).as("a"),
          col("inDeg"))
      val matA = nextA.localCheckpoint(eagerState)
      inter += matA
      val hNorm = normOf(matA, "a", "inDeg")
      val hr = e.join(pin(matA.select(col("vid"), col("a"))), e("dst") === col("vid"))
        .groupBy(e("src").as("svid")).agg(sum(col("a")).as("s"))
      val nextH = GraphOps.attachScalar(
          vertsOut.join(pin(hr), col("vid") === hr("svid"), "left"),
          col("vid"), hNorm, col("nrm"))
        .select(col("vid"), (coalesce(col("s"), lit(0.0)) / col("nrm")).as("h"),
          col("outDeg"))
      val matH = nextH.localCheckpoint(eagerState)
      inter += matH
      h = matH
      a = matA
    }
    val out = a.join(h, Seq("vid"))
      .select(col("vid"),
        floor(col("a") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"auth${k}e7"),
        floor(col("h") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"hub${k}e7"))
      .localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    e.unpersist(false); vertsOut.unpersist(false); vertsIn.unpersist(false)
    out
  }

  /**
   * Exactly k SALSA iterations (Lempel & Moran, "The stochastic approach
   * for link-structure analysis", WWW 2000): HITS's mutual reinforcement
   * with each contribution divided by the SENDER's degree —
   * a(v) = Σ_{u→v} h(u)/outdeg(u), h(u) = Σ_{u→v} a(v)/indeg(v). The
   * per-edge division makes each half-step a stochastic matrix multiply,
   * so L1 mass is conserved over the non-dangling set and NO normalizer
   * aggregate is needed: unlike [[hitsIterEdges]] the loop runs ZERO
   * driver actions per round — a pure lazy-checkpoint chain materialized
   * by the consumer (bfsIter's discipline). e7 floor pins FP summation
   * order like every double-valued driver here.
   */
  def salsaIter(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    salsaIterCore(spark, linkAnalysisLaid(spark, laidDirected(spark, sfDir)), k)

  private[graft] def salsaIterEdges(spark: SparkSession, edges0: DataFrame, k: Int,
                                    broadcastMaxRows: Long = 500000L): DataFrame =
    salsaIterCore(spark, linkAnalysisLayout(spark, edges0), k, broadcastMaxRows)

  private def salsaIterCore(spark: SparkSession,
                            layout: (DataFrame, DataFrame, DataFrame, Long), k: Int,
                            broadcastMaxRows: Long = 500000L): DataFrame = {
    require(k >= 1, s"k=$k")
    val (e, vertsOut, vertsIn, nV) = layout
    def pin(df: DataFrame): DataFrame =
      if (nV <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var h = vertsOut.select(col("vid"), lit(1.0).as("h"), col("outDeg"))
      .localCheckpoint(false)
    inter += h
    var a: DataFrame = null
    for (_ <- 1 to k) {
      val ca = e.join(
          pin(h.filter(col("outDeg").isNotNull)
            .select(col("vid"), (col("h") / col("outDeg")).as("c"))),
          e("src") === col("vid"))
        .groupBy(e("dst").as("dvid")).agg(sum(col("c")).as("s"))
      a = vertsIn.join(pin(ca), col("vid") === col("dvid"), "left")
        .select(col("vid"), coalesce(col("s"), lit(0.0)).as("a"), col("inDeg"))
        .localCheckpoint(false)
      inter += a
      val ch = e.join(
          pin(a.filter(col("inDeg").isNotNull)
            .select(col("vid"), (col("a") / col("inDeg")).as("c"))),
          e("dst") === col("vid"))
        .groupBy(e("src").as("svid")).agg(sum(col("c")).as("s"))
      h = vertsOut.join(pin(ch), col("vid") === col("svid"), "left")
        .select(col("vid"), coalesce(col("s"), lit(0.0)).as("h"), col("outDeg"))
        .localCheckpoint(false)
      inter += h
    }
    val out = a.select(col("vid"), col("a"))
      .join(h.select(col("vid"), col("h")), Seq("vid"))
      .select(col("vid"),
        floor(col("a") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"salsa_a${k}e7"),
        floor(col("h") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"salsa_h${k}e7"))
      .localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    e.unpersist(false); vertsOut.unpersist(false); vertsIn.unpersist(false)
    out
  }

  /** Oracle SQL for exactly k SALSA iterations (see [[salsaIter]]). */
  def salsaIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      """,
        |indeg AS MATERIALIZED (SELECT dst AS vid, count(*) AS c FROM edges GROUP BY dst),
        |s_h0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE) AS h FROM verts)""".stripMargin)
    for (i <- 1 to k) {
      val p = i - 1
      sb.append(s""",
        |s_ar$i AS MATERIALIZED (SELECT e.dst AS vid, sum(s_h$p.h / od.c) AS s
        |        FROM edges e JOIN s_h$p ON e.src = s_h$p.vid
        |        JOIN outdeg od ON od.vid = e.src GROUP BY e.dst),
        |s_a$i AS MATERIALIZED (SELECT v.vid, coalesce(s_ar$i.s, CAST(0.0 AS DOUBLE)) AS a
        |        FROM verts v LEFT JOIN s_ar$i ON v.vid = s_ar$i.vid),
        |s_hr$i AS MATERIALIZED (SELECT e.src AS vid, sum(s_a$i.a / idg.c) AS s
        |        FROM edges e JOIN s_a$i ON e.dst = s_a$i.vid
        |        JOIN indeg idg ON idg.vid = e.dst GROUP BY e.src),
        |s_h$i AS MATERIALIZED (SELECT v.vid, coalesce(s_hr$i.s, CAST(0.0 AS DOUBLE)) AS h
        |        FROM verts v LEFT JOIN s_hr$i ON v.vid = s_hr$i.vid)""".stripMargin)
    }
    sb.append(s"""
      |SELECT s_a$k.vid, CAST(floor(a*1e7 + 0.500001) AS BIGINT) AS salsa_a${k}e7,
      |       CAST(floor(h*1e7 + 0.500001) AS BIGINT) AS salsa_h${k}e7
      |FROM s_a$k JOIN s_h$k ON s_a$k.vid = s_h$k.vid""".stripMargin)
    sb.toString
  }

  /** Oracle SQL for exactly k HITS iterations (L1-normalized, see [[hitsIter]]). */
  def hitsIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(",\nh0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE) AS h FROM verts)")
    for (i <- 1 to k) {
      sb.append(s""",
        |ar$i AS MATERIALIZED (SELECT e.dst AS vid, sum(h${i - 1}.h) AS s
        |        FROM edges e JOIN h${i - 1} ON e.src = h${i - 1}.vid GROUP BY e.dst),
        |at$i AS MATERIALIZED (SELECT coalesce(sum(s), CAST(1.0 AS DOUBLE)) AS t FROM ar$i),
        |a$i AS MATERIALIZED (SELECT v.vid, coalesce(ar$i.s, CAST(0.0 AS DOUBLE))/at$i.t AS a
        |        FROM verts v CROSS JOIN at$i LEFT JOIN ar$i ON v.vid = ar$i.vid),
        |hr$i AS MATERIALIZED (SELECT e.src AS vid, sum(a$i.a) AS s
        |        FROM edges e JOIN a$i ON e.dst = a$i.vid GROUP BY e.src),
        |ht$i AS MATERIALIZED (SELECT coalesce(sum(s), CAST(1.0 AS DOUBLE)) AS t FROM hr$i),
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
  def bfsIter(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    bfsIterLaid(spark, laidDirected(spark, sfDir), k)

  /**
   * [[bfsIter]] core on an explicit edge table. BFS needs NO per-superstep
   * driver scalar (unlike PageRank/PPR/HITS), so the per-superstep
   * checkpoint is LAZY: `localCheckpoint(false)` truncates the logical plan
   * immediately (the self-referencing union would otherwise double it each
   * round — 2^k analysis cost), while execution defers to the caller's ONE
   * materializing action, which computes and caches the whole k-superstep
   * chain as a single multi-stage job. Zero driver actions per extra
   * superstep (JobCountSpec pins the delta at the frontier-agnostic
   * fixed-k cost); the edge table is laid out and cached once so the single
   * job reads the scan once, not k times.
   */
  private[graft] def bfsIterEdges(spark: SparkSession, edges0: DataFrame, k: Int,
                                  broadcastMaxRows: Long = 500000L): DataFrame =
    bfsIterLaid(spark, GraphOps.layoutForIteration(
      edges0.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
      confParts(spark)), k, broadcastMaxRows)

  private def bfsIterLaid(spark: SparkSession, laid: (DataFrame, Long, Int), k: Int,
      broadcastMaxRows: Long = 500000L): DataFrame = {
    val (e, nE, parts) = laid
    val verts = GraphOps.vertices(e).repartition(parts, col("vid"))
    // the dist side is always the FULL vertex set (not a shrinking frontier):
    // broadcasting it per superstep is the scale anti-pattern, so beyond the
    // crossover it stays shuffle-hash-pinned against the src-partitioned
    // cached edges; below the crossover (laid |E| is a real size stat the
    // former blanket pin lacked) the broadcast is cheap and removes the
    // per-superstep state exchange (r6, see matchIterLaid)
    def pin(df: DataFrame): DataFrame =
      if (nE <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var dist = verts.select(col("vid"),
      when(col("vid") % 100 === 0, lit(0L)).otherwise(lit(null).cast("long")).as("d"))
      .localCheckpoint(false)
    inter += dist
    for (_ <- 1 to k) {
      val msgs = e.join(pin(dist), e("src") === dist("vid"))
        .filter(col("d").isNotNull)
        .select(e("dst").as("vid"), (col("d") + 1L).as("d"))
      dist = msgs.unionByName(dist.select(col("vid"), col("d")))
        .groupBy("vid").agg(min(col("d")).as("d"))
        .localCheckpoint(false)
      inter += dist
    }
    // the ONE materializing action for the whole chain; then free the k
    // intermediate checkpoint block sets and the edge cache — the result is
    // independent of them after the eager checkpoint
    val out = dist.select(col("vid"), coalesce(col("d"), lit(-1L)).as(s"dist$k"))
      .localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    e.unpersist(false)
    out
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

  /**
   * Exactly k Bellman-Ford supersteps of multi-source WEIGHTED single-source
   * shortest path over DIRECTED edges with the deterministic integer weight
   * w(u,v) = (u+v) mod 5 + 1 (the [[wprIter]] convention): dist₀ = 0 at the
   * vid%100 seeds; distᵢ₊₁(v) = min(distᵢ(v), min_{u→v} distᵢ(u) + w(u,v)).
   * The min-plus semiring generalizes [[bfsIter]]'s hop count (w ≡ 1);
   * after k supersteps dist(v) is exact over all ≤k-edge paths. Exact
   * integers; unreached vertices report -1.
   *
   * Same scale shape as BFS: no per-superstep driver scalar, lazy
   * localCheckpoint chain truncates the self-union's plan growth, ONE
   * materializing action for the whole chain, edge table laid out and
   * cached once (JobCountSpec pins zero extra driver actions per
   * superstep).
   */
  def ssspIter(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    ssspIterLaid(spark, laidDirected(spark, sfDir), k)

  private[graft] def ssspIterEdges(spark: SparkSession, edges0: DataFrame, k: Int,
                                   broadcastMaxRows: Long = 500000L): DataFrame =
    ssspIterLaid(spark, GraphOps.layoutForIteration(
      edges0.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
      confParts(spark)), k, broadcastMaxRows)

  private def ssspIterLaid(spark: SparkSession, laid: (DataFrame, Long, Int), k: Int,
      broadcastMaxRows: Long = 500000L): DataFrame = {
    val (e, nE, parts) = laid
    val verts = GraphOps.vertices(e).repartition(parts, col("vid"))
    // r6 crossover pin sized from the laid |E| (see matchIterLaid)
    def pin(df: DataFrame): DataFrame =
      if (nE <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var dist = verts.select(col("vid"),
      when(col("vid") % 100 === 0, lit(0L)).otherwise(lit(null).cast("long")).as("d"))
      .localCheckpoint(false)
    inter += dist
    for (_ <- 1 to k) {
      val msgs = e.join(pin(dist), e("src") === dist("vid"))
        .filter(col("d").isNotNull)
        .select(e("dst").as("vid"),
          (col("d") + (e("src") + e("dst")) % 5L + 1L).as("d"))
      dist = msgs.unionByName(dist.select(col("vid"), col("d")))
        .groupBy("vid").agg(min(col("d")).as("d"))
        .localCheckpoint(false)
      inter += dist
    }
    val out = dist.select(col("vid"), coalesce(col("d"), lit(-1L)).as(s"sdist$k"))
      .localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    e.unpersist(false)
    out
  }

  /** Oracle SQL for exactly k weighted Bellman-Ford supersteps (see [[ssspIter]]). */
  def ssspIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      """,
        |s0 AS MATERIALIZED (SELECT vid,
        |        CASE WHEN vid % 100 = 0 THEN CAST(0 AS BIGINT) ELSE NULL END AS d FROM verts)""".stripMargin)
    for (i <- 1 to k) {
      sb.append(s""",
        |s$i AS MATERIALIZED (SELECT vid, min(d) AS d FROM (
        |          SELECT e.dst AS vid, s${i - 1}.d + (e.src + e.dst) % 5 + 1 AS d
        |          FROM edges e JOIN s${i - 1} ON e.src = s${i - 1}.vid
        |          WHERE s${i - 1}.d IS NOT NULL
        |          UNION ALL SELECT vid, d FROM s${i - 1}
        |        ) GROUP BY vid)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, coalesce(d, -1) AS sdist$k FROM s$k")
    sb.toString
  }

  /**
   * Truncated Katz centrality (Katz, "A new status index derived from
   * sociometric analysis", Psychometrika 1953) with attenuation α = 1/8,
   * cut at k hops and scaled by 8^k so every quantity is an exact BIGINT:
   * katz_k(v)·8^k = Σ_{i=1..k} walks_i(v) · 8^{k-i}, where walks_i(v) is
   * the number of directed length-i walks ending at v. Computed by the
   * recurrence acc_i = 8·acc_{i-1} + w_i with w_i(v) = Σ_{u→v} w_{i-1}(u),
   * w_0 ≡ 1 — one edges⋈state join + aggregate per superstep, zero driver
   * actions (lazy chain like [[bfsIter]]).
   *
   * Overflow envelope: walks_i ≤ (max in-degree)^i, so at k = 3 a vertex
   * fed by three consecutive 10⁶-degree hubs reaches ~10¹⁸ — the BIGINT
   * edge. This integer form is the small-k verification path; large-k /
   * web-hub Katz belongs in floats (same division of labor as
   * [[graft.operators.Neighborhood.harmonic]] vs hyperBall).
   */
  def katzIter(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    katzIterLaid(spark, laidDirected(spark, sfDir), k)

  private[graft] def katzIterEdges(spark: SparkSession, edges0: DataFrame, k: Int,
                                   broadcastMaxRows: Long = 500000L): DataFrame =
    katzIterLaid(spark, GraphOps.layoutForIteration(
      edges0.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
      confParts(spark)), k, broadcastMaxRows)

  private def katzIterLaid(spark: SparkSession, laid: (DataFrame, Long, Int), k: Int,
      broadcastMaxRows: Long = 500000L): DataFrame = {
    val (e, nE, parts) = laid
    val verts = GraphOps.vertices(e).repartition(parts, col("vid"))
    // r6 crossover pin sized from the laid |E| (see matchIterLaid)
    def pin(df: DataFrame): DataFrame =
      if (nE <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var st = verts.select(col("vid"), lit(1L).as("w"), lit(0L).as("acc"))
      .localCheckpoint(false)
    inter += st
    for (_ <- 1 to k) {
      val msgs = e.join(pin(st), e("src") === st("vid"))
        .select(e("dst").as("vid"), col("w"))
        .groupBy("vid").agg(sum(col("w")).as("wn"))
      st = st.join(pin(msgs), Seq("vid"), "left")
        .select(col("vid"),
          coalesce(col("wn"), lit(0L)).as("w"),
          (col("acc") * 8L + coalesce(col("wn"), lit(0L))).as("acc"))
        .localCheckpoint(false)
      inter += st
    }
    val out = st.select(col("vid"), col("acc").as(s"katz${k}s")).localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    e.unpersist(false)
    out
  }

  /** Oracle SQL for k truncated-Katz supersteps (see [[katzIter]]). */
  def katzIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      """,
        |k0 AS MATERIALIZED (SELECT vid, CAST(1 AS BIGINT) AS w,
        |        CAST(0 AS BIGINT) AS acc FROM verts)""".stripMargin)
    for (i <- 1 to k) {
      val p = i - 1
      sb.append(s""",
        |kw$i AS MATERIALIZED (SELECT e.dst AS vid, sum(s.w) AS wn
        |        FROM edges e JOIN k$p s ON e.src = s.vid GROUP BY e.dst),
        |k$i AS MATERIALIZED (SELECT s.vid, CAST(coalesce(w.wn, 0) AS BIGINT) AS w,
        |        CAST(s.acc*8 + coalesce(w.wn, 0) AS BIGINT) AS acc
        |        FROM k$p s LEFT JOIN kw$i w ON s.vid = w.vid)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, acc AS katz${k}s FROM k$k")
    sb.toString
  }

  /** Injective hash priority for [[misIter]]: v ↦ (v·2654435761 + 17) mod P
    * with P = 1e9+7 prime and the multiplier coprime to P, so the map is a
    * bijection on [0, P) — priorities are UNIQUE for vid < P (doc-graph vids
    * are doc ids < |docs|, far inside), and min() needs no tie-break. */
  private val MisPrime = 1000000007L
  private def misPri(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (v * lit(2654435761L) + lit(17L)) % lit(MisPrime)

  /**
   * Exactly k rounds of Luby's maximal-independent-set algorithm (Luby,
   * "A simple parallel algorithm for the maximal independent set problem",
   * SIAM J. Comput. 1986) over the UNDIRECTED doc graph, derandomized with
   * the injective hash priority [[misPri]]: an active vertex joins the MIS
   * when its priority beats every active neighbor's; MIS members' active
   * neighbors are removed; repeat. Deterministic, exact-integer, and each
   * round strictly shrinks the active set (expected-constant fraction per
   * round — O(log n) rounds to empty whp).
   *
   * Output: (vid, mis_st) with 1 = in MIS, 2 = removed (dominated by a MIS
   * neighbor), 0 = still active after k rounds. Same lazy-checkpoint chain
   * as [[bfsIterEdges]]: zero driver actions per round, ONE materializing
   * action for the whole chain.
   *
   * 100 TB shape: each round is two src-keyed hash joins against the cached
   * symmetric edge table plus a groupBy min — the PageRank superstep's
   * shuffle profile, with the message volume shrinking as vertices settle.
   */
  def misIter(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    misIterLaid(spark, laidSym(spark, sfDir), k)

  private[graft] def misIterEdges(spark: SparkSession, edges0: DataFrame, k: Int,
                                  broadcastMaxRows: Long = 500000L): DataFrame =
    misIterLaid(spark, GraphOps.layoutForIteration(GraphOps.symmetrized(
      edges0.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))),
      confParts(spark)), k, broadcastMaxRows)

  private def misIterLaid(spark: SparkSession, laid: (DataFrame, Long, Int), k: Int,
      broadcastMaxRows: Long = 500000L): DataFrame = {
    val (e, nE, parts) = laid
    val verts = GraphOps.vertices(e).repartition(parts, col("vid"))
    // r6 crossover pin sized from the laid |E| (see matchIterLaid)
    def pin(df: DataFrame): DataFrame =
      if (nE <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var st = verts.select(col("vid"), misPri(col("vid")).as("pri"),
      lit(0L).as("st")).localCheckpoint(false)
    inter += st
    for (_ <- 1 to k) {
      val act = st.filter(col("st") === 0L)
      // min active-neighbor priority per vertex (sym edges: src side carries
      // the neighbor's priority to dst)
      val nm = e.join(pin(act), e("src") === act("vid"))
        .select(e("dst").as("vid"), col("pri"))
        .groupBy("vid").agg(min(col("pri")).as("nm"))
      val win = act.join(pin(nm), Seq("vid"), "left")
        .filter(col("pri") < coalesce(col("nm"), lit(Long.MaxValue)))
        .select(col("vid"))
      val rm = e.join(pin(win), e("src") === win("vid"))
        .select(e("dst").as("vid")).distinct()
      // O(|V|)-state joins stay shuffle-hash-pinned: broadcasting vertex
      // state per round is the scale anti-pattern (same rationale as BFS)
      st = st
        .join(pin(win.withColumn("w", lit(1L))), Seq("vid"), "left")
        .join(pin(rm.withColumn("r", lit(1L))), Seq("vid"), "left")
        .select(col("vid"), col("pri"),
          when(col("st") =!= 0L, col("st"))
            .when(col("w").isNotNull, lit(1L))
            .when(col("r").isNotNull, lit(2L))
            .otherwise(lit(0L)).as("st"))
        .localCheckpoint(false)
      inter += st
    }
    val out = st.select(col("vid"), col("st").as("mis_st")).localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    e.unpersist(false)
    out
  }

  /** Oracle SQL for exactly k Luby MIS rounds (see [[misIter]]). */
  def misIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      s""",
        |s0 AS MATERIALIZED (SELECT vid, (vid*2654435761 + 17) % $MisPrime AS pri,
        |        CAST(0 AS BIGINT) AS st FROM verts)""".stripMargin)
    for (i <- 1 to k) {
      val p = i - 1
      sb.append(s""",
        |nm$i AS MATERIALIZED (SELECT e.dst AS vid, min(s.pri) AS nm
        |        FROM sym e JOIN s$p s ON e.src = s.vid AND s.st = 0 GROUP BY e.dst),
        |w$i AS MATERIALIZED (SELECT s.vid FROM s$p s LEFT JOIN nm$i n ON s.vid = n.vid
        |        WHERE s.st = 0 AND s.pri < coalesce(n.nm, 9223372036854775807)),
        |r$i AS MATERIALIZED (SELECT DISTINCT e.dst AS vid FROM sym e JOIN w$i w ON e.src = w.vid),
        |s$i AS MATERIALIZED (SELECT s.vid, s.pri,
        |        CASE WHEN s.st <> 0 THEN s.st
        |             WHEN w.vid IS NOT NULL THEN CAST(1 AS BIGINT)
        |             WHEN r.vid IS NOT NULL THEN CAST(2 AS BIGINT)
        |             ELSE CAST(0 AS BIGINT) END AS st
        |        FROM s$p s LEFT JOIN w$i w ON s.vid = w.vid
        |                   LEFT JOIN r$i r ON s.vid = r.vid)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, st AS mis_st FROM s$k")
    sb.toString
  }

  /**
   * Exactly k rounds of Luby-style greedy graph coloring over the
   * UNDIRECTED doc graph: each round, every still-uncolored vertex whose
   * [[misPri]] priority beats all its UNCOLORED neighbors' takes the round
   * index as its color. The round's winners are an independent set of the
   * residual graph, so two adjacent vertices can never receive the same
   * color — a proper partial coloring by construction, using ≤ k colors.
   * This is the round-synchronous member of the Jones–Plassmann / Luby
   * family (Jones & Plassmann, "A parallel graph coloring heuristic",
   * SIAM J. Sci. Comput. 1993), trading color count for a message pattern
   * identical to [[misIter]] minus the removal wave: one neighbor-min
   * shuffle + one state join per round, volume shrinking as vertices color.
   *
   * Output: (vid, color) with color ∈ [1, k], or 0 = still uncolored after
   * k rounds. Same lazy-checkpoint chain as [[misIterEdges]]: zero driver
   * actions per round, ONE materializing action for the whole chain.
   */
  def colorIter(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    colorIterLaid(spark, laidSym(spark, sfDir), k)

  private[graft] def colorIterEdges(spark: SparkSession, edges0: DataFrame, k: Int,
                                    broadcastMaxRows: Long = 500000L): DataFrame =
    colorIterLaid(spark, GraphOps.layoutForIteration(GraphOps.symmetrized(
      edges0.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))),
      confParts(spark)), k, broadcastMaxRows)

  private def colorIterLaid(spark: SparkSession, laid: (DataFrame, Long, Int), k: Int,
      broadcastMaxRows: Long = 500000L): DataFrame = {
    val (e, nE, parts) = laid
    val verts = GraphOps.vertices(e).repartition(parts, col("vid"))
    // r6 crossover pin sized from the laid |E| (see matchIterLaid)
    def pin(df: DataFrame): DataFrame =
      if (nE <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var st = verts.select(col("vid"), misPri(col("vid")).as("pri"),
      lit(0L).as("color")).localCheckpoint(false)
    inter += st
    for (i <- 1 to k) {
      val act = st.filter(col("color") === 0L)
      val nm = e.join(pin(act), e("src") === act("vid"))
        .select(e("dst").as("vid"), col("pri"))
        .groupBy("vid").agg(min(col("pri")).as("nm"))
      val win = act.join(pin(nm), Seq("vid"), "left")
        .filter(col("pri") < coalesce(col("nm"), lit(Long.MaxValue)))
        .select(col("vid"), lit(1L).as("w"))
      st = st.join(pin(win), Seq("vid"), "left")
        .select(col("vid"), col("pri"),
          when(col("color") =!= 0L, col("color"))
            .when(col("w").isNotNull, lit(i.toLong))
            .otherwise(lit(0L)).as("color"))
        .localCheckpoint(false)
      inter += st
    }
    val out = st.select(col("vid"), col("color")).localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    e.unpersist(false)
    out
  }

  /** Oracle SQL for exactly k Luby-coloring rounds (see [[colorIter]]). */
  def colorIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      s""",
        |c0 AS MATERIALIZED (SELECT vid, (vid*2654435761 + 17) % $MisPrime AS pri,
        |        CAST(0 AS BIGINT) AS color FROM verts)""".stripMargin)
    for (i <- 1 to k) {
      val p = i - 1
      sb.append(s""",
        |cn$i AS MATERIALIZED (SELECT e.dst AS vid, min(s.pri) AS nm
        |        FROM sym e JOIN c$p s ON e.src = s.vid AND s.color = 0 GROUP BY e.dst),
        |cw$i AS MATERIALIZED (SELECT s.vid FROM c$p s LEFT JOIN cn$i n ON s.vid = n.vid
        |        WHERE s.color = 0 AND s.pri < coalesce(n.nm, 9223372036854775807)),
        |c$i AS MATERIALIZED (SELECT s.vid, s.pri,
        |        CASE WHEN s.color <> 0 THEN s.color
        |             WHEN w.vid IS NOT NULL THEN CAST($i AS BIGINT)
        |             ELSE CAST(0 AS BIGINT) END AS color
        |        FROM c$p s LEFT JOIN cw$i w ON s.vid = w.vid)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, color FROM c$k")
    sb.toString
  }

  /** Injective per-edge priority for [[matchIter]] on canonical pairs
    * (a < b): the scalar hash hp = (misPri(a) + (b·40503 + 29) mod P) mod P
    * CAN collide across edges, so the algorithm's total order is the tuple
    * (hp, a, b) — unique because (a, b) is. Engine compares it as a struct
    * min (Spark structs order lexicographically); the oracle replays the
    * same order via row_number() OVER (ORDER BY hp, a, b). */
  private def edgePri(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    (misPri(a) + (b * lit(40503L) + lit(29L)) % lit(MisPrime)) % lit(MisPrime)

  /**
   * Exactly k rounds of derandomized parallel greedy MAXIMAL MATCHING over
   * the UNDIRECTED doc graph (the Israeli–Itai family, "An improved parallel
   * algorithm for maximal matching", IPL 1986, derandomized like [[misIter]]):
   * each round, an edge between two unmatched endpoints joins the matching
   * iff its (hp, a, b) priority is the minimum among active edges incident
   * to BOTH endpoints. Winners are vertex-disjoint by construction (two
   * winners sharing v would both be v's unique incident minimum), so the
   * update never conflicts; each round strictly shrinks the active edge set
   * and at fixpoint the matching is maximal. Deterministic, exact-integer.
   *
   * Output: (vid, mate) = matched partner vid, or −1 if unmatched after k
   * rounds. Same lazy-checkpoint chain as [[misIterEdges]]: zero driver
   * actions per round, ONE materializing action for the whole chain.
   *
   * 100 TB shape: per round, two semi-joins restrict the cached canonical
   * edge set to active×active, one union+groupBy computes the per-vertex
   * incident minimum (message volume = 2·|active edges|, shrinking), two
   * equi-joins select winners. No step is super-linear in |E|; state is
   * O(|V|) and stays shuffle-hash-pinned like every iterative driver here.
   */
  def matchIter(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    matchIterLaid(spark, laidUnd(spark, sfDir), k)

  private[graft] def matchIterEdges(spark: SparkSession, edges0: DataFrame, k: Int,
                                    broadcastMaxRows: Long = 500000L): DataFrame = {
    val und0 = GraphOps.undirected(
      edges0.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
    // layoutForIteration wants (src, dst); partition on the a-side key
    matchIterLaid(spark, GraphOps.layoutForIteration(
      und0.select(col("a").as("src"), col("b").as("dst")), confParts(spark)), k,
      broadcastMaxRows)
  }

  private def matchIterLaid(spark: SparkSession, laid: (DataFrame, Long, Int), k: Int,
                            broadcastMaxRows: Long = 500000L): DataFrame = {
    val (eu, nE, parts) = laid
    val und = eu.select(col("src").as("a"), col("dst").as("b"))
    val verts = GraphOps.vertices(eu).repartition(parts, col("vid"))
    // r6 crossover pin (the house broadcast-or-SHJ rule, sized from the laid
    // |E|): below the crossover the O(|V|)-state sides broadcast — the former
    // blanket shuffle_hash pin re-shuffled them per round (the measured
    // anti-pattern that once cost q_lp 3x); beyond it (state too big to
    // ship) the co-partitioned SHJ path is unchanged and the pin is inert.
    def pin(df: DataFrame): DataFrame =
      if (nE <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var st = verts.select(col("vid"), lit(null).cast("long").as("mate"))
      .localCheckpoint(false)
    inter += st
    for (_ <- 1 to k) {
      val act = st.filter(col("mate").isNull).select(col("vid"))
      val ae = und
        .join(pin(act.select(col("vid").as("a"))), Seq("a"), "left_semi")
        .join(pin(act.select(col("vid").as("b"))), Seq("b"), "left_semi")
        .withColumn("pr", struct(edgePri(col("a"), col("b")).as("hp"),
          col("a").as("pa"), col("b").as("pb")))
      val vm = ae.select(col("a").as("vid"), col("pr"))
        .unionByName(ae.select(col("b").as("vid"), col("pr")))
        .groupBy("vid").agg(min(col("pr")).as("mp"))
      val win = ae
        .join(pin(vm.select(col("vid").as("a"), col("mp").as("mpa"))), Seq("a"))
        .join(pin(vm.select(col("vid").as("b"), col("mp").as("mpb"))), Seq("b"))
        .filter(col("pr") === col("mpa") && col("pr") === col("mpb"))
      val newm = win.select(col("a").as("vid"), col("b").as("m2"))
        .unionByName(win.select(col("b").as("vid"), col("a").as("m2")))
      st = st.join(pin(newm), Seq("vid"), "left")
        .select(col("vid"), coalesce(col("mate"), col("m2")).as("mate"))
        .localCheckpoint(false)
      inter += st
    }
    val out = st.select(col("vid"), coalesce(col("mate"), lit(-1L)).as(s"mate$k"))
      .localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    eu.unpersist(false)
    out
  }

  /** Oracle SQL for exactly k greedy maximal-matching rounds (see [[matchIter]]). */
  def matchIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      s""",
        |mm0 AS MATERIALIZED (SELECT vid, CAST(NULL AS BIGINT) AS mate FROM verts)""".stripMargin)
    for (i <- 1 to k) {
      val p = i - 1
      sb.append(s""",
        |mae$i AS MATERIALIZED (SELECT u.a, u.b,
        |        ((u.a*2654435761 + 17) % $MisPrime
        |         + (u.b*40503 + 29) % $MisPrime) % $MisPrime AS hp
        |        FROM und u JOIN mm$p sa ON u.a = sa.vid JOIN mm$p sb ON u.b = sb.vid
        |        WHERE sa.mate IS NULL AND sb.mate IS NULL),
        |minc$i AS MATERIALIZED (SELECT vid, a, b FROM (
        |        SELECT vid, a, b, row_number() OVER (PARTITION BY vid ORDER BY hp, a, b) AS rn
        |        FROM (SELECT a AS vid, hp, a, b FROM mae$i
        |              UNION ALL SELECT b AS vid, hp, a, b FROM mae$i)) WHERE rn = 1),
        |mw$i AS MATERIALIZED (SELECT e.a, e.b FROM mae$i e
        |        JOIN minc$i va ON va.vid = e.a AND va.a = e.a AND va.b = e.b
        |        JOIN minc$i vb ON vb.vid = e.b AND vb.a = e.a AND vb.b = e.b),
        |mm$i AS MATERIALIZED (SELECT s.vid, coalesce(s.mate, n.m2) AS mate
        |        FROM mm$p s LEFT JOIN (SELECT a AS vid, b AS m2 FROM mw$i
        |                               UNION ALL SELECT b AS vid, a AS m2 FROM mw$i) n
        |        ON s.vid = n.vid)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, coalesce(mate, -1) AS mate$k FROM mm$k")
    sb.toString
  }

  /**
   * Landmark distance sketch (Potamias, Bonchi, Castillo & Gionis, "Fast
   * shortest path distance estimation in large networks", CIKM 2009): exact
   * hop distances from every vertex TO a fixed landmark set within k
   * supersteps — the embedding behind scalable closeness-centrality and
   * point-to-point distance estimates (d(u,v) ≲ min over landmarks of
   * d(u,l)+d(l,v)). Unlike [[bfsIter]] (min over the seed SET), the state
   * here is PER-LANDMARK: key (vid, seed), so the shuffle distributes over
   * both and a hub vertex's rows spread across |L| keys. State volume is
   * O(|V|·|L|) worst case — the landmark-count knob is the scale envelope,
   * stated here rather than discovered: |L| = |V|/97 keeps the sketch a
   * constant factor of the vertex table. Same lazy-checkpoint chain as BFS
   * (zero driver actions per superstep, ONE materializing action).
   *
   * Output per vertex (exact integers, −1/0 sentinels — no NULLs in the
   * hash): n_lm = landmarks reached within k hops, sum_d = Σ distances to
   * them (the closeness numerator), min_d = nearest-landmark distance.
   * Landmarks are propagated along REVERSED edges so `d` is the forward
   * distance vid→landmark.
   */
  def landmarkIter(spark: SparkSession, sfDir: String, k: Int): DataFrame =
    landmarkIterLaid(spark, laidReversed(spark, sfDir), k)

  private[graft] def landmarkIterEdges(spark: SparkSession, edges0: DataFrame, k: Int,
                                       broadcastMaxRows: Long = 500000L): DataFrame =
    landmarkIterLaid(spark, GraphOps.layoutForIteration(
      edges0.select(col("dst").cast("long").as("src"), col("src").cast("long").as("dst")),
      confParts(spark)), k, broadcastMaxRows)

  private def landmarkIterLaid(spark: SparkSession, laid: (DataFrame, Long, Int), k: Int,
      broadcastMaxRows: Long = 500000L): DataFrame = {
    val (e, nE, parts) = laid
    val verts = GraphOps.vertices(e).repartition(parts, col("vid"))
    // r6 crossover pin sized from the laid |E| (see matchIterLaid)
    def pin(df: DataFrame): DataFrame =
      if (nE <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var dist = verts.filter(col("vid") % 97 === 0)
      .select(col("vid"), col("vid").as("seed"), lit(0L).as("d"))
      .localCheckpoint(false)
    inter += dist
    for (_ <- 1 to k) {
      val msgs = e.join(pin(dist), e("src") === dist("vid"))
        .select(e("dst").as("vid"), dist("seed"), (col("d") + 1L).as("d"))
      dist = msgs.unionByName(dist.select(col("vid"), col("seed"), col("d")))
        .groupBy("vid", "seed").agg(min(col("d")).as("d"))
        .localCheckpoint(false)
      inter += dist
    }
    val sk = dist.groupBy("vid").agg(count(lit(1)).as("n_lm"),
      sum(col("d")).as("sum_d"), min(col("d")).as("min_d"))
    val out = verts.join(sk, Seq("vid"), "left")
      .select(col("vid"), coalesce(col("n_lm"), lit(0L)).as("n_lm"),
        coalesce(col("sum_d"), lit(-1L)).as("sum_d"),
        coalesce(col("min_d"), lit(-1L)).as("min_d"))
      .localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    e.unpersist(false)
    out
  }

  /** Oracle SQL for exactly k landmark-sketch supersteps (see [[landmarkIter]]).
    * Edges are reversed in the propagation join, mirroring the engine. */
  def landmarkIterSql(k: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      """,
        |l0 AS MATERIALIZED (SELECT vid, vid AS seed, CAST(0 AS BIGINT) AS d
        |        FROM verts WHERE vid % 97 = 0)""".stripMargin)
    for (i <- 1 to k) {
      sb.append(s""",
        |l$i AS MATERIALIZED (SELECT vid, seed, min(d) AS d FROM (
        |          SELECT e.src AS vid, l${i - 1}.seed, l${i - 1}.d + 1 AS d
        |          FROM edges e JOIN l${i - 1} ON e.dst = l${i - 1}.vid
        |          UNION ALL SELECT vid, seed, d FROM l${i - 1}
        |        ) GROUP BY vid, seed)""".stripMargin)
    }
    sb.append(s""",
      |sk AS MATERIALIZED (SELECT vid, count(*) AS n_lm, CAST(sum(d) AS BIGINT) AS sum_d,
      |        CAST(min(d) AS BIGINT) AS min_d FROM l$k GROUP BY vid)
      |SELECT v.vid, coalesce(sk.n_lm, 0) AS n_lm, coalesce(sk.sum_d, -1) AS sum_d,
      |       coalesce(sk.min_d, -1) AS min_d
      |FROM verts v LEFT JOIN sk ON sk.vid = v.vid""".stripMargin)
    sb.toString
  }

  /**
   * Exactly `rounds` peel rounds toward the K-core of the UNDIRECTED doc
   * graph: S₀ = V; Sᵢ₊₁ = { v ∈ Sᵢ : deg_{Sᵢ}(v) ≥ K }. After ≥ degeneracy
   * rounds this is the exact K-core; the fixed round count keeps an exact
   * chained-CTE oracle (same fixed-k discipline as [[prIter]]). Output:
   * (vid, deg) for v ∈ S_rounds, deg being its degree within S_{rounds-1}
   * (the value the final selection used) — exact integers.
   */
  def kcoreIter(spark: SparkSession, sfDir: String, kCore: Int, rounds: Int): DataFrame =
    kcoreIterLaid(spark, laidSym(spark, sfDir), kCore, rounds)

  /** [[kcoreIter]] core on an explicit edge table. Like BFS, peeling needs
    * no per-round driver scalar, so rounds chain LAZY checkpoints (plan
    * truncated each round, 2^r analysis blowup avoided) and ONE closing
    * action materializes the chain; per-round cost is two semi-joins against
    * the src-partitioned cached symmetric edges + one degree aggregate. */
  private[graft] def kcoreIterEdges(spark: SparkSession, edges0: DataFrame,
                                    kCore: Int, rounds: Int,
                                    broadcastMaxRows: Long = 500000L): DataFrame =
    kcoreIterLaid(spark, GraphOps.layoutForIteration(
      GraphOps.symmetrized(edges0.select(
        col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))),
      confParts(spark)), kCore, rounds, broadcastMaxRows)

  private def kcoreIterLaid(spark: SparkSession, laid: (DataFrame, Long, Int),
                            kCore: Int, rounds: Int,
                            broadcastMaxRows: Long = 500000L): DataFrame = {
    require(rounds >= 1, "need at least one peel round")
    val (sym, nE, parts) = laid
    // r6 crossover pin sized from the laid |E| (see matchIterLaid)
    def pin(df: DataFrame): DataFrame =
      if (nE <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var surv = GraphOps.vertices(sym).repartition(parts, col("vid"))
      .localCheckpoint(false)
    inter += surv
    var deg: DataFrame = null
    for (_ <- 1 to rounds) {
      val alive = sym
        .join(pin(surv), sym("src") === surv("vid"), "left_semi")
        .join(pin(surv.withColumnRenamed("vid", "v2")),
          col("dst") === col("v2"), "left_semi")
      deg = alive.groupBy(col("src").as("vid")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= kCore)
        .localCheckpoint(false)
      inter += deg
      surv = deg.select("vid")
    }
    val out = deg.localCheckpoint(true) // the one materializing action
    inter.foreach(GraphOps.freeCheckpoint)
    sym.unpersist(false)
    out
  }

  /** Oracle SQL for exactly `rounds` K-core peel rounds (see [[kcoreIter]]). */
  def kcoreIterSql(kCore: Int, rounds: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(",\nk0 AS MATERIALIZED (SELECT vid FROM verts)")
    for (i <- 1 to rounds) {
      sb.append(s""",
        |kd$i AS MATERIALIZED (SELECT s.src AS vid, count(*) AS deg FROM sym s
        |        JOIN k${i - 1} a ON s.src = a.vid JOIN k${i - 1} b ON s.dst = b.vid
        |        GROUP BY s.src),
        |k$i AS MATERIALIZED (SELECT vid, deg FROM kd$i WHERE deg >= $kCore)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, deg FROM k$rounds")
    sb.toString
  }

  /**
   * Exactly k WEIGHTED PageRank supersteps over the doc graph with the
   * deterministic edge weight w(u,v) = (u+v) mod 5 + 1: rank flows
   * proportionally to weight — contribution of u along (u,v) is
   * r(u)·w(u,v)/S(u), S(u) = Σ_x w(u,x) the out-strength. Dangling mass and
   * damping exactly as [[prIter]]; per-edge arithmetic is written
   * (r·w)/S in BOTH engines so even the floating-point op order matches;
   * the e7 floor pins the output. One job per superstep (PageRank.run's
   * closing-aggregate pattern — Σ transmitted = Σ r over non-dangling holds
   * because Σ_v w(u,v)/S(u) = 1 exactly as in the unweighted case).
   */
  def wprIter(spark: SparkSession, sfDir: String, k: Int,
              d: Double = 0.85): DataFrame =
    wprIterLaid(spark, laidDirected(spark, sfDir), k, d)

  private[graft] def wprIterEdges(spark: SparkSession, edges0: DataFrame, k: Int,
                                  d: Double = 0.85,
                                  broadcastMaxRows: Long = 500000L): DataFrame =
    wprIterLaid(spark, GraphOps.layoutForIteration(
      edges0.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
      confParts(spark)), k, d, broadcastMaxRows)

  private def wprIterLaid(spark: SparkSession, laid: (DataFrame, Long, Int), k: Int,
                          d: Double = 0.85,
                          broadcastMaxRows: Long = 500000L): DataFrame = {
    val (e0, _, parts) = laid
    val e = e0.withColumn("w", (col("src") + col("dst")) % 5L + 1L)
    val outS = e.groupBy(col("src").as("vid")).agg(sum(col("w")).as("outS"))
      .repartition(parts, col("vid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = GraphOps.vertices(e0).repartition(parts, col("vid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nV = verts.count()
    require(nV > 0, "empty graph")
    def pin(df: DataFrame): DataFrame =
      if (nV <= broadcastMaxRows) broadcast(df) else df.hint("shuffle_hash")

    // r6: ZERO driver actions per superstep — in-plan transmitted-mass
    // scalar, prIterLaid's deferral (see pprIterLaid for the shape)
    val inter = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var r = verts.join(outS, Seq("vid"), "left")
      .select(col("vid"), lit(1.0 / nV).as("r"), col("outS"))
      .localCheckpoint(false)
    inter += r

    // eager state beyond the crossover — see prIterLaid (r6 review fix)
    val eagerState = nV > broadcastMaxRows
    for (_ <- 1 to k) {
      val tm = r.filter(col("outS").isNotNull)
        .agg(sum(col("r")).as("tm"))
        .select(coalesce(col("tm"), lit(0.0)).as("tm"))
      val state = r.filter(col("outS").isNotNull)
        .select(col("vid"), col("r"), col("outS"))
      val sums = e.join(pin(state), e("src") === state("vid"))
        .groupBy(e("dst").as("dvid"))
        .agg(sum(col("r") * col("w") / col("outS")).as("s"))
      val dmTerm = (lit(d) * (lit(1.0) - col("tm"))) / lit(nV.toDouble)
      val joined = r.join(pin(sums), r("vid") === sums("dvid"), "left")
      val next = GraphOps.attachScalar(joined, r("vid"), tm, col("tm"))
        .select(r("vid"),
          (lit((1.0 - d) / nV) + dmTerm
            + lit(d) * coalesce(col("s"), lit(0.0))).as("r"),
          r("outS"))
      r = next.localCheckpoint(eagerState)
      inter += r
    }
    val out = r.select(col("vid"),
      floor(col("r") * lit(1.0e7) + lit(0.500001)).cast("long").as(s"wpr${k}e7"))
      .localCheckpoint(true)
    inter.foreach(GraphOps.freeCheckpoint)
    e0.unpersist(false); outS.unpersist(false); verts.unpersist(false)
    out
  }

  /** Oracle SQL for exactly k weighted-PageRank supersteps (see [[wprIter]]). */
  def wprIterSql(k: Int, d: Double = 0.85): String = {
    val restart = (1.0 - d).toString
    val damp    = d.toString
    val sb = new StringBuilder(graphCtes)
    sb.append(
      """,
        |we AS MATERIALIZED (SELECT src, dst, (src + dst) % 5 + 1 AS w FROM edges),
        |wstr AS MATERIALIZED (SELECT src AS vid, sum(w) AS s FROM we GROUP BY src),
        |w0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE)/nv.n AS r FROM verts CROSS JOIN nv)""".stripMargin)
    for (i <- 1 to k) {
      sb.append(s""",
        |ws$i AS MATERIALIZED (SELECT e.dst AS vid, sum(w${i - 1}.r * e.w / o.s) AS s
        |        FROM we e JOIN w${i - 1} ON e.src = w${i - 1}.vid JOIN wstr o ON e.src = o.vid
        |        GROUP BY e.dst),
        |wd$i AS MATERIALIZED (SELECT CAST(1.0 AS DOUBLE) - coalesce(sum(s), CAST(0.0 AS DOUBLE)) AS dm FROM ws$i),
        |w$i AS MATERIALIZED (SELECT v.vid,
        |               CAST($restart AS DOUBLE)/nv.n + CAST($damp AS DOUBLE)*wd$i.dm/nv.n
        |                 + CAST($damp AS DOUBLE)*coalesce(ws$i.s, 0) AS r
        |        FROM verts v CROSS JOIN nv CROSS JOIN wd$i LEFT JOIN ws$i ON v.vid = ws$i.vid)""".stripMargin)
    }
    sb.append(s"\nSELECT vid, CAST(floor(r*1e7 + 0.500001) AS BIGINT) AS wpr${k}e7 FROM w$k")
    sb.toString
  }

  /** Exactly k HashMin connected-component supersteps (exact integer labels).
    * r6: reads the one-exchange cached laid symmetric table — the former
    * inline `symmetrized(edges(…))` subtree appeared k+1 times in the
    * single-execution plan and paid its own dedup exchanges. */
  def ccIter(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val (sym, _, _) = laidSym(spark, sfDir)
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
    * semantics: most frequent neighbor label, ties → smallest label).
    * r6: laid symmetric table, same rationale as [[ccIter]]. */
  def lpIter(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val (sym, _, _) = laidSym(spark, sfDir)
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
