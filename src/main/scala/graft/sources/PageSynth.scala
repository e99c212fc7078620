package graft.sources

import java.sql.Timestamp
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style page row (schema fixed by BASELINE.json:15). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/**
 * S2 — deterministic synthetic page source (SURVEY.md §3.1, FIXTURES.md §1).
 *
 * Pure function of `(docId, seed)` — splitmix64 mixing, no `Random`, no wall
 * clock — so the same `(n, seed)` always yields byte-identical pages on any
 * cluster. Link structure: truncated-Zipf out-degree (α≈2, max 64), ~1/17 of
 * pages dangling (zero outlinks), a handful of hub pages that receive in-links
 * from ~10% of all pages (drives the salted-join skew path, BASELINE.json:6).
 *
 * `text` is defined as `Html.extractText(html)` so the per-row byte-identity
 * invariant (BASELINE.json:15) holds by construction; the extractor itself is
 * pinned against hand-written goldens in HtmlSpec.
 */
object PageSynth {

  val Langs: Array[String] = Array("en", "de", "es", "fr", "zh")

  /** splitmix64 — public-domain mixing constant schedule (Steele et al. 2014). */
  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def mix2(a: Long, b: Long): Long = mix(mix(a) ^ (b * 0xC2B2AE3D27D4EB4FL))

  /** uniform double in (0,1] from a hash. */
  private def unit(h: Long): Double = ((h >>> 11) + 1).toDouble / (1L << 53).toDouble

  def url(docId: Long, hosts: Int): String =
    s"https://site${docId % hosts}.example/p/$docId"

  def hubIds(n: Long, nHubs: Int): Array[Long] =
    Array.tabulate(nHubs)(i => (mix(1000L + i) & Long.MaxValue) % n)

  /** Out-degree: truncated Zipf(α≈2, max 64); every 17th page dangling. */
  def outDegree(docId: Long, seed: Long): Int = {
    if (docId % 17 == 0) 0
    else {
      val u = unit(mix2(seed, docId * 3 + 1))
      math.min(64, math.max(1, (1.0 / u).toInt))
    }
  }

  /** Outlink target doc ids (self-links removed, duplicates kept — dedup is the engine's job). */
  def targets(docId: Long, n: Long, seed: Long, hubs: Array[Long]): Seq[Long] = {
    val k    = outDegree(docId, seed)
    val base = (0 until k).map(j => (mix2(seed, docId * 131 + j * 7 + 2) & Long.MaxValue) % n)
    val withHub =
      if (k > 0 && (mix2(seed, docId * 17 + 5) & Long.MaxValue) % 10 == 0)
        base :+ hubs(((mix2(seed, docId * 19 + 6) & Long.MaxValue) % hubs.length).toInt)
      else base
    withHub.filter(_ != docId)
  }

  def htmlFor(docId: Long, n: Long, seed: Long, hosts: Int, hubs: Array[Long]): Array[Byte] = {
    val ts  = targets(docId, n, seed, hubs)
    val anchors = ts.zipWithIndex
      .map { case (t, j) => s"""<a href="${url(t, hosts)}">L$j</a>""" }
      .mkString
    val body =
      s"page $docId about topic ${mix(docId) % 50} with ${ts.length} links &amp; entities"
    val doc =
      s"<html><head><title>T$docId</title><script>var x=$docId;</script></head>" +
        s"<body><p>$body</p>$anchors</body></html>"
    doc.getBytes(StandardCharsets.UTF_8)
  }

  def page(docId: Long, n: Long, seed: Long, hosts: Int, hubs: Array[Long]): Page = {
    val html = htmlFor(docId, n, seed, hosts, hubs)
    Page(
      url     = url(docId, hosts),
      warc_ts = new Timestamp(1704067200000L + docId * 137000L), // 2024-01-01T00:00:00Z + id*137s
      html    = html,
      text    = graft.functions.Html.extractText(html),
      lang    = Langs(((mix(docId * 11 + 3) & Long.MaxValue) % 5).toInt))
  }

  /**
   * Directly materialized edge list of the same link graph the html pages
   * encode (minus the url round-trip) — the bench path for graph-engine
   * throughput at 10⁶–10⁸ edges without paying html generation+extraction.
   */
  def edgeList(spark: SparkSession, n: Long, seed: Long = 42L,
               nHubs: Int = 4, numPartitions: Int = 0): Dataset[graft.graph.Edge] = {
    import spark.implicits._
    val hubs  = hubIds(n, nHubs)
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts)
      .flatMap(id => targets(id, n, seed, hubs).map(t => graft.graph.Edge(id, t)))
  }

  /**
   * Edge list with genuinely hub-skewed OUT-degree: the base Zipf graph plus
   * `hubOut` outlinks from each of the `nHubs` hub pages. The base generator's
   * out-degree is capped at 64, which never crosses any realistic salting
   * threshold — this variant is the bench/test input that actually exercises
   * the salted contribution join (J4) against real skew. Deterministic in
   * `(n, seed, hubOut)`; hub targets are generated distributed (one task per
   * range partition), never on the driver.
   */
  def edgeListWithHubOut(spark: SparkSession, n: Long, hubOut: Int,
                         seed: Long = 42L, nHubs: Int = 4,
                         numPartitions: Int = 0): Dataset[graft.graph.Edge] = {
    import spark.implicits._
    val hubs  = hubIds(n, nHubs)
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    val hubEdges = spark.range(0, hubOut.toLong, 1, parts).flatMap { j =>
      hubs.map { h =>
        val t = (mix2(seed, h * 1000003L + j * 31L + 11L) & Long.MaxValue) % n
        graft.graph.Edge(h, if (t == h) (t + 1) % n else t)
      }
    }
    edgeList(spark, n, seed, nHubs, numPartitions).union(hubEdges)
  }

  /**
   * Distributed generator: `spark.range(n)` → one task per partition maps ids
   * to pages. Scales linearly with partitions (no driver materialization) —
   * the 100 TB story is "raise n and numPartitions", nothing else changes.
   */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
            hosts: Int = 97, nHubs: Int = 4,
            numPartitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val hubs  = hubIds(n, nHubs)
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).map(id => page(id, n, seed, hosts, hubs))
  }
}
