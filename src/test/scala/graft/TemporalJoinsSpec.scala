package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** As-of and bounded-range temporal joins: pinned micro-semantics (equal-ts
  * inclusion, no-match nulls, half-open boundary) plus a brute-force
  * cross-check on the real events table. */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asofJoin: latest right at-or-before, equal ts matches, no-match is null") {
    val left = Seq(
      (1L, ts(100), "l1"), // after r@50 and r@100 → equal-ts r@100 wins
      (1L, ts(99), "l2"),  // only r@50 precedes
      (1L, ts(10), "l3"),  // nothing precedes → null
      (2L, ts(500), "l4")  // other key: r@400
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts(50), "r50"), (1L, ts(100), "r100"), (1L, ts(150), "r150"),
      (2L, ts(400), "r400")
    ).toDF("k", "t", "rv")
    val got = TemporalJoins.asofJoin(left, right, "k", "t")
      .select($"lv", $"rv").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("l1" -> "r100", "l2" -> "r50", "l3" -> null, "l4" -> "r400"))
  }

  test("countInRange: half-open [t-w, t), cross-bin windows, zero-match rows kept") {
    val w = 100L * 1000000L // 100 s in µs
    val left = Seq(
      (1L, 10L, ts(1000)),  // right at 900 (=t-w: IN), 999 (IN), 1000 (=t: OUT)
      (1L, 11L, ts(950)),   // right at 900 IN; 850 (=t-w) IN
      (2L, 12L, ts(1000))   // no rights for key 2 → 0
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, ts(850)), (1L, ts(900)), (1L, ts(999)), (1L, ts(1000)), (1L, ts(800))
    ).toDF("k", "t")
    val got = TemporalJoins.countInRange(left, right, "k", "t", "t", w)
      .select($"id", $"n_in_range").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 2L, 11L -> 2L, 12L -> 0L))
  }

  test("countInRange keeps rows with NULL payload columns") {
    // regression: the former inner-join + join-back-on-all-columns pattern
    // silently returned 0 for left rows with a NULL column (null-unsafe
    // equality); the left-join + count-matched form must count them normally
    val w = 100L * 1000000L
    val left = Seq((1L, Option("x"), ts(1000)), (1L, Option.empty[String], ts(1000)))
      .toDF("k", "tag", "t")
    val right = Seq((1L, ts(950))).toDF("k", "t")
    val got = TemporalJoins.countInRange(left, right, "k", "t", "t", w)
      .select($"tag", $"n_in_range").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got == Map(Some("x") -> 1L, None -> 1L))
  }

  test("both joins match the brute-force oracle on real events data") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))

    // brute force via inequality joins (fine at spec scale)
    val bruteAsof = errors.as("e").join(clicks.as("c"),
        $"e.user_id" === $"c.user_id" && $"e.ts" >= $"c.ts", "left")
      .groupBy($"e.event_id").agg(max(struct($"c.ts", $"c.click_id")).as("m"))
      .select($"event_id", $"m.click_id".as("click_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val gotAsof = TemporalJoins.asofJoin(
        errors.select($"user_id", $"ts", $"event_id"), clicks, "user_id", "ts")
      .select($"event_id", $"click_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(gotAsof == bruteAsof && gotAsof.nonEmpty)

    val w = 3600L * 1000000L
    val bruteRange = errors.as("e").join(clicks.as("c"),
        $"e.user_id" === $"c.user_id" &&
          $"c.ts" >= $"e.ts" - expr("INTERVAL 1 HOUR") && $"c.ts" < $"e.ts", "left")
      .groupBy($"e.event_id").agg(count($"c.click_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotRange = TemporalJoins.countInRange(errors, clicks, "user_id", "ts", "ts", w)
      .select($"event_id", $"n_in_range")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotRange == bruteRange && gotRange.nonEmpty)
  }
}
