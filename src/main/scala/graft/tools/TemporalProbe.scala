package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/**
 * Scale probe for the temporal joins: synthesizes N events (deterministic
 * ids/timestamps/types over `users` keys spread across 30 days), then times
 * [[TemporalJoins.asofJoin]] and [[TemporalJoins.countInRange]] end-to-end.
 * Evidence for the at-scale claims: as-of = one hash shuffle + in-partition
 * sort (no pair blowup), range-count = constant 2× fan-out equi-join.
 *
 * Usage: sbt "runMain graft.tools.TemporalProbe [events] [users] [cores]"
 */
object TemporalProbe {
  def main(args: Array[String]): Unit = {
    val n     = if (args.length > 0) args(0).toLong else 10000000L
    val users = if (args.length > 1) args(1).toLong else 100000L
    val cores = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = 1700000000000000L // µs epoch
    val span = 30L * 24 * 3600 * 1000000L
    val ev = spark.range(0, n, 1, cores.toInt).select(
        col("id").as("event_id"),
        pmod(xxhash64(col("id"), lit(7)), lit(users)).as("user_id"),
        timestamp_micros(lit(base) + pmod(xxhash64(col("id"), lit(11)), lit(span))).as("ts"),
        when(pmod(xxhash64(col("id"), lit(13)), lit(10)) < 8, "click").otherwise("error")
          .as("event_type"))
      .persist()
    val total = ev.count()
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TEMPORAL_PROBE $label events=$total rows=$rows sec=$sec%.1f rate=${total / sec / 1e6}%.2f M-events/s")
    }

    time("asof_join") {
      TemporalJoins.asofJoin(errors, clicks, "user_id", "ts")
        .filter(col("click_id").isNotNull).count()
    }
    time("count_in_range_1h") {
      // the summed match count IS the sanity signal (a broken window would
      // read 0) — not the row count of the one global-aggregate row
      val r = TemporalJoins.countInRange(errors, clicks, "user_id", "ts", "ts", 3600L * 1000000L)
        .agg(sum("n_in_range")).first()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }

    // ---- hot-key skew leg (VERDICT r4 #4): asofJoin partitions by key
    // alone, so one hyperactive key (a bot holding 10% of all events)
    // serializes into a single task's sort — measure that envelope.
    val evHot = spark.range(0, n, 1, cores.toInt).select(
        col("id").as("event_id"),
        when(pmod(col("id"), lit(10)) === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id"), lit(7)), lit(users))).as("user_id"),
        timestamp_micros(lit(base) + pmod(xxhash64(col("id"), lit(11)), lit(span))).as("ts"),
        when(pmod(xxhash64(col("id"), lit(13)), lit(10)) < 8, "click").otherwise("error")
          .as("event_type"))
      .persist()
    evHot.count()
    val hotErrors = evHot.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val hotClicks = evHot.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    time("asof_join_hotkey_10pct") {
      TemporalJoins.asofJoin(hotErrors, hotClicks, "user_id", "ts")
        .filter(col("click_id").isNotNull).count()
    }
    spark.stop()
  }
}
