package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Structured Streaming surface: stream results must equal the batch plan. */
class StreamingSpec extends SparkSpec {

  // readStream needs a directory; the testdata table is a single file — link it
  val path: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.createSymbolicLink(
      d.resolve("part-0.parquet"),
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"))
    d.toString
  }

  test("windowed streaming aggregation equals batch computation") {
    val schema   = EventStream.eventsSchema(spark, path)
    val streamed = EventStream.windowedCounts(
      spark.readStream.schema(schema).parquet(path), "1 hour")
    // append mode would hold back windows the watermark hasn't passed at
    // end-of-stream; complete mode emits the full aggregation state
    val got = EventStream.runToMemory(spark, streamed, "win_counts", outputMode = "complete")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val want = spark.read.parquet(path)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("mapGroupsWithState running totals equal the batch aggregate exactly") {
    val schema = EventStream.eventsSchema(spark, path)
    // split into 4 files and trigger one file per micro-batch so the state
    // genuinely accumulates ACROSS batches (one batch would never read state)
    val multi = java.nio.file.Files.createTempDirectory("graft-stream-multi").toString
    spark.read.parquet(path).repartition(4).write.mode("overwrite").parquet(multi)
    // update mode re-emits a user's row each micro-batch it changes in; the
    // memory sink keeps them all — the LAST row per user is the final state
    val got = EventStream.runToMemory(spark,
        EventStream.runningUserStats(spark,
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(multi)).toDF(),
        "running_users", outputMode = "update")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = spark.read.parquet(path)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("flatMapGroupsWithState dedup emits each key exactly once across micro-batches") {
    val schema = EventStream.eventsSchema(spark, path)
    val multi = java.nio.file.Files.createTempDirectory("graft-stream-dedup").toString
    // 4 files, one per micro-batch: most users appear in SEVERAL batches, so
    // exactly-once emission genuinely depends on cross-batch state
    spark.read.parquet(path).repartition(4).write.mode("overwrite").parquet(multi)
    val got = EventStream.runToMemory(spark,
        EventStream.streamingDedupFirst(spark,
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(multi)).toDF(),
        "dedup_first", outputMode = "append")
      .collect().map(_.getLong(0))
    val want = spark.read.parquet(path).select("user_id").distinct()
      .collect().map(_.getLong(0))
    assert(got.length == got.distinct.length, "a key was emitted more than once")
    assert(got.toSet == want.toSet && got.nonEmpty)
    // and the emitted event genuinely belongs to the key
    val rows = spark.table("dedup_first").collect().map(r => (r.getLong(0), r.getLong(1)))
    val byEvent = spark.read.parquet(path).select("event_id", "user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (uid, eid) => assert(byEvent(eid) == uid) }
  }

  test("stream-stream interval join equals the batch join exactly") {
    val schema = EventStream.eventsSchema(spark, path)
    // two INDEPENDENT streams from the same source dir, multi-file so rows
    // of a matching pair can arrive in different micro-batches (the join
    // state genuinely buffers across batches). The repartitioned files are
    // TIME-DISORDERED, so the watermark must exceed that disorder (the whole
    // 30-day span) or rows legitimately drop as late — observed: 2/7 pairs
    // survive a 2h watermark. Real pipelines pick the watermark from real
    // arrival lateness; equality-vs-batch needs no-late-drops here.
    val multi = java.nio.file.Files.createTempDirectory("graft-stream-ssj").toString
    spark.read.parquet(path).repartition(4).write.mode("overwrite").parquet(multi)
    def stream(tpe: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(multi)
      .filter(col("event_type") === tpe)
    val got = EventStream.runToMemory(spark,
        EventStream.clicksBeforeErrors(stream("error"), stream("click"),
          watermark = "2400 hours"),
        "ssj", outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = spark.read.parquet(multi).withColumn("ts", col("ts").cast("timestamp"))
    val want = batch.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("e_ts"))
      .join(batch.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts")),
        Seq("user_id"))
      .filter(col("c_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR") && col("c_ts") < col("e_ts"))
      .select("error_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty, s"stream ${got.size} vs batch ${want.size} pairs")
  }

  test("left-outer stream-stream join: outer rows emit on watermark passage, young state is withheld") {
    import spark.implicits._
    import java.sql.Timestamp
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-stream-louter").toString
    def ts(s: String) = Timestamp.valueOf(s)
    def writeBatch(rows: Seq[(Long, Timestamp, Long, String)], modMs: Long): Unit = {
      val before = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .map(_.getName).toSet
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.mode("append").parquet(dir)
      new java.io.File(dir).listFiles().foreach { f =>
        if (!before(f.getName) && !f.getName.startsWith("_") && !f.getName.startsWith("."))
          Files.setLastModifiedTime(f.toPath,
            java.nio.file.attribute.FileTime.fromMillis(modMs))
      }
    }
    // batch 1: clicks (one matching, one orphan); batch 2: three errors;
    // batch 3: a far-future sentinel error; batch 4: a far-future orphan
    // click. Under the default multipleWatermarkPolicy=min the GLOBAL
    // watermark is the min over both inputs, and the click side is stuck
    // at 08:30 (batch-1 max 09:30 − 1 h) until batch 4 advances it — which
    // is why a 3-batch version of this fixture emits NO outer rows: the
    // error side's watermark alone can never evict. Batch 4 raises the
    // click-side (hence global) watermark past every real error, and the
    // watermark-advance no-data batch after it flushes the outer rows.
    // The sentinel error stays YOUNGER than every watermark the query ever
    // ran with, so its outer row must be withheld at stream end — pinning
    // that outer emission is watermark-driven, never end-of-stream-driven.
    writeBatch(Seq((101L, ts("2024-01-01 09:30:00"), 1L, "click"),
                   (102L, ts("2024-01-01 09:00:00"), 4L, "click")), 10000000L)
    writeBatch(Seq((1L, ts("2024-01-01 10:00:00"), 1L, "error"),
                   (2L, ts("2024-01-01 10:00:00"), 2L, "error"),
                   (3L, ts("2024-01-01 20:00:00"), 3L, "error")), 20000000L)
    writeBatch(Seq((9L, ts("2024-01-11 10:00:00"), 99L, "error")), 30000000L)
    writeBatch(Seq((103L, ts("2024-01-21 10:00:00"), 77L, "click")), 40000000L)
    val schema = spark.read.parquet(dir).schema
    def stream(tpe: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .filter(col("event_type") === tpe)
    val got = EventStream.runToMemory(spark,
        EventStream.clicksBeforeErrorsOuter(stream("error"), stream("click")),
        "ssj_louter", outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 101L), (2L, -1L), (3L, -1L)),
      s"expected matched user1 + two watermark-expired outer rows, sentinel withheld; got $got")
  }

  test("session windows produce per-user sessions with positive event counts") {
    val schema   = EventStream.eventsSchema(spark, path)
    val sessions = EventStream.runToMemory(spark,
      EventStream.sessionized(spark.readStream.schema(schema).parquet(path), "30 minutes"),
      "sessions")
    val rows = sessions.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getTimestamp(1).before(r.getTimestamp(0))))
    assert(rows.forall(_.getLong(3) > 0))
  }
}
