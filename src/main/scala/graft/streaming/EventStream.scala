package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Custom streaming state per user (mapGroupsWithState — §3.8 stateful surface). */
final case class UserRunning(user_id: Long, n_events: Long, total_cents: Long)

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

  /**
   * Custom per-key state via `mapGroupsWithState` — the escape hatch for
   * stateful logic window/session aggregates can't express. Keeps one
   * `UserRunning` row per user (event count + exact integer-cent total),
   * updated per micro-batch; NoTimeout because the key space (users) is
   * bounded, unlike windows whose state watermarks must expire.
   *
   * Money is folded in integer cents so the streamed total is EXACTLY equal
   * to the batch groupBy total regardless of micro-batch boundaries — a
   * float fold would drift with batch slicing and break the equality test.
   */
  def runningUserStats(spark: SparkSession, events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events.select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0L))
          var n = prev.n_events
          var c = prev.total_cents
          rows.foreach { r => n += 1; c += r._2 }
          val next = UserRunning(uid, n, c)
          state.update(next)
          next
      }
  }

  /**
   * Streaming exact dedup by key (`flatMapGroupsWithState` — the zero-or-more
   * emission surface `mapGroupsWithState` can't express): each key's row is
   * emitted the FIRST time the key is seen and never again, regardless of
   * micro-batch slicing — exact dedup at ingest, the streaming member of the
   * [[graft.operators.Dedup]] suite. State is one boolean per key
   * (NoTimeout: dedup keys are long-lived by definition; a TTL'd variant
   * would swap in EventTimeTimeout and re-admit keys past the watermark).
   */
  def streamingDedupFirst(spark: SparkSession, events: DataFrame,
                          keyCol: String = "user_id"): Dataset[(Long, Long)] = {
    import spark.implicits._
    events.select(col(keyCol), col("event_id")).as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single((key, rows.next()._2)) }
      }
  }

  /**
   * Stream-stream INNER join with an event-time interval condition — the
   * two-stream member of the §3.8 surface (windows/sessions/stateful cover
   * single streams): for every error, the clicks by the same user in the
   * preceding hour, the streaming form of
   * [[graft.operators.TemporalJoins.countInRange]]'s feature. The equi key
   * (user) drives a symmetric hash join; the interval bound PLUS both
   * watermarks are what let Spark expire buffered rows on both sides —
   * without them stream-stream join state grows forever. Inner-join matches
   * are emitted as soon as both rows have arrived (the watermark only
   * gates state cleanup), so end-of-stream output equals the batch join
   * exactly — pinned by StreamingSpec.
   */
  def clicksBeforeErrors(errors: DataFrame, clicks: DataFrame,
                         watermark: String = "2 hours",
                         windowSql: String = "INTERVAL 1 HOUR"): DataFrame =
    intervalJoined(errors, clicks, watermark, windowSql, "inner")
      .select(col("error_id"), col("click_id"), col("e_user").as("user_id"))

  /** The one copy of the watermarked interval-join predicate both
    * stream-stream joins share — two copies of the e_user/c_ts bounds
    * would drift independently. */
  private def intervalJoined(errors: DataFrame, clicks: DataFrame,
                             watermark: String, windowSql: String,
                             joinType: String): DataFrame = {
    val e = errors.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"))
    val c = clicks.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    e.join(c, col("e_user") === col("c_user") &&
      col("c_ts") >= col("e_ts") - expr(windowSql) && col("c_ts") < col("e_ts"),
      joinType)
  }

  /**
   * LEFT OUTER stream-stream join: every error row emits — matched errors as
   * soon as both sides arrive, UNMATCHED errors only when the watermark
   * passes their join window (outer emission is watermark-DRIVEN, not
   * end-of-stream-driven: an error younger than max-event-time − watermark
   * is still buffered when the stream idles, and its outer row is withheld —
   * StreamingSpec pins exactly that). Unmatched click_id → −1 sentinel.
   */
  def clicksBeforeErrorsOuter(errors: DataFrame, clicks: DataFrame,
                              watermark: String = "2 hours",
                              windowSql: String = "INTERVAL 1 HOUR"): DataFrame =
    intervalJoined(errors, clicks, watermark, windowSql, "leftOuter")
      .select(col("error_id"), coalesce(col("click_id"), lit(-1L)).as("click_id"),
        col("e_user").as("user_id"))

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
