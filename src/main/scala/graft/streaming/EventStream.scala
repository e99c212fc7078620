package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming surface (SURVEY.md §3.8 mapping, built out for
 * completeness of the operator inventory): watermarked tumbling/sliding
 * window aggregation and session windows over the `events` table schema.
 *
 * Streams are read with `readStream` over parquet directories — the same
 * transforms run unchanged against Kafka or any other streaming source; at
 * scale the shuffle is keyed by (window, event_type), and the watermark
 * bounds state size so long-running queries don't accumulate unbounded
 * window state.
 */
object EventStream {

  def eventsSchema(spark: SparkSession, path: String): StructType =
    spark.read.parquet(path).schema

  /** Watermarked tumbling (or sliding, if `slide` given) window aggregation. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     slide: Option[String] = None,
                     watermark: String = "2 hours"): DataFrame = {
    val win = slide.map(sl => window(col("ts"), window_, sl))
      .getOrElse(window(col("ts"), window_))
    events
      // testdata stores ts as TIMESTAMP_NTZ; watermarks need TIMESTAMP (session TZ is UTC, cast is identity)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(win.as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("win.start").as("win_start"), col("event_type"), col("n"), col("total_value"))
  }

  /** Per-user session windows (gap-based) with event counts. */
  def sessionized(events: DataFrame, gap: String = "30 minutes",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("sess.start").as("sess_start"), col("sess.end").as("sess_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Run a streaming DataFrame to completion against a memory sink; return the result table. */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
                  outputMode: String = "append"): DataFrame = {
    val q = streamed.writeStream
      .format("memory").queryName(name).outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
