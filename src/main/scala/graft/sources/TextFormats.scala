package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * CSV / JSON-lines source + sink surface (SURVEY §3.1), proven by lossless
 * round-trips: write a table out, read it back with an EXPLICIT schema, and
 * let the driver's DuckDB oracle verify an aggregate over the round-tripped
 * rows equals the same aggregate over the parquet originals.
 *
 * Scale rules encoded here (each is a 100 TB decision, not a style choice):
 *  - **Explicit schema, never inference.** `inferSchema` is a full extra
 *    pass over the data (2× read at 100 TB) and its verdict can drift with
 *    sampling; a production text source always declares its schema.
 *  - **FAILFAST parse mode.** The default PERMISSIVE mode silently turns a
 *    corrupt row into nulls — at web scale that is a data-loss bug you find
 *    weeks later. A correctness-first engine throws at the first bad record.
 *  - **Microsecond-explicit timestamp formats** on both write and read, so
 *    the round-trip is bit-exact for the engine's timestamp[us] columns
 *    (the default writer format keeps milliseconds only).
 *  - **`\N` null sentinel** (the classic text-dump convention) so NULL and
 *    empty-string survive a CSV round-trip as distinct values. CONTRACT
 *    LIMIT, inherent to the convention (MySQL dumps share it): a string
 *    value exactly equal to the sentinel reads back as NULL — the sentinel
 *    match applies after unquoting, so quoting cannot protect it. Pinned by
 *    TextFormatsSpec; longer strings containing `\N` are unaffected.
 *  - **`multiLine` CSV read** so embedded newlines in quoted strings
 *    round-trip instead of failing the parse. Cost, stated plainly: a
 *    multiLine CSV file is not splittable (one task per file), so the CSV
 *    path trades scan parallelism for fidelity — at 100 TB, JSONL (which
 *    escapes newlines natively and stays splittable) is the right text
 *    format; CSV is the compat/interchange path.
 *  - Doubles round-trip exactly with no options: both writers emit the
 *    shortest decimal representation (`Double.toString`), whose parse is
 *    the identity by the Java floating-point grammar.
 *
 * Paths are per-application and overwritten per call: deterministic output,
 * no cross-JVM staleness, no cleanup dependency.
 */
object TextFormats {
  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private val common = Map(
    "timestampFormat"    -> TsFmt,
    "timestampNTZFormat" -> TsFmt,
    "nullValue"          -> "\\N")

  private def dir(spark: SparkSession, fmt: String, tag: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_fmt/${spark.sparkContext.applicationId}/${fmt}_$tag"

  /** Write `df` as headered CSV, read it back with `df`'s own schema. */
  def csvRoundTrip(spark: SparkSession, df: DataFrame, tag: String): DataFrame = {
    val path = dir(spark, "csv", tag)
    df.write.mode(SaveMode.Overwrite).options(common).option("header", "true").csv(path)
    spark.read.schema(df.schema).options(common)
      .option("header", "true").option("mode", "FAILFAST")
      .option("multiLine", "true").csv(path)
  }

  /** Write `df` as JSON lines, read it back with `df`'s own schema. */
  def jsonlRoundTrip(spark: SparkSession, df: DataFrame, tag: String): DataFrame = {
    val path = dir(spark, "jsonl", tag)
    df.write.mode(SaveMode.Overwrite).options(common).json(path)
    spark.read.schema(df.schema).options(common).option("mode", "FAILFAST").json(path)
  }

  /** Write `df` as ORC, read it back with `df`'s own schema.
    *
    * ORC is the third columnar interchange format a warehouse migration
    * meets (Hive-era lakes are ORC-at-rest). Unlike the text paths above it
    * is binary and typed, so the round-trip is type-exact by construction
    * and needs no sentinel/format options; the value of the surface is that
    * the scan keeps parquet's scale behaviors — predicate pushdown, column
    * pruning, and splittable stripes — which the q_orc_source oracle plus
    * the shared PlanSpec assertions exercise. Schema is still passed
    * explicitly (same no-inference rule: ORC self-describes per file, but
    * pinning the expected schema turns writer drift into a loud read error
    * instead of a silent union-by-position). */
  def orcRoundTrip(spark: SparkSession, df: DataFrame, tag: String): DataFrame = {
    val path = dir(spark, "orc", tag)
    df.write.mode(SaveMode.Overwrite).orc(path)
    spark.read.schema(df.schema).orc(path)
  }
}
