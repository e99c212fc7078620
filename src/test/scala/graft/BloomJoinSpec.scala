package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** Bloom pre-filtered semi-join: exactness (never drops a match), false
  * positives removed by the closing semi-join, real probe-side reduction,
  * and a live `doGenCode` path for the membership expression. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin equals the exact semi-join, incl. absent and null keys") {
    // probe: 10k keys, build: every 97th key plus some misses; null probe key
    val big = spark.range(0, 10000).select(
        when(col("id") === 5000L, lit(null).cast("long")).otherwise(col("id")).as("k"),
        (col("id") % 7).as("payload"))
    val small = spark.range(0, 10000, 97).select(col("id").as("sk"))
      .unionByName(Seq(123456789L, 987654321L).toDF("sk")) // keys with no probe match
    val got = BloomJoin.bloomSemiJoin(big, "k", small, "sk")
      .select("k", "payload").orderBy("k").collect()
    val want = big.join(small, col("k") === col("sk"), "left_semi")
      .select("k", "payload").orderBy("k").collect()
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
    assert(!got.exists(_.isNullAt(0)), "null keys must not survive a semi-join")
  }

  test("the bloom pre-filter actually reduces the probe side (selectivity + fpp)") {
    val big   = spark.range(0, 100000).toDF("k")
    val small = spark.range(0, 100000, 1000).toDF("sk") // 0.1% selectivity
    val expected = math.max(small.count(), 1L)
    val bf = small.stat.bloomFilter("sk", expected, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val survivors = big.filter(BloomJoin.mightContain(col("k"), bos.toByteArray)).count()
    // 100 true matches + ~1% false positives of 100k = ~1100; a broken filter
    // passing everything would read 100k, a lossy one would read < 100
    assert(survivors >= 100, s"bloom dropped true matches: $survivors")
    assert(survivors < 5000, s"bloom pre-filter not selective: $survivors of 100000")
  }

  test("BloomMightContainLong codegen compiles under CODEGEN_ONLY") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    import s2.implicits._
    val small = Seq(1L, 3L, 5L).toDF("sk")
    val bf = small.stat.bloomFilter("sk", 3, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val kept = s2.range(0, 8).select(col("id").as("k"))
      .filter(BloomJoin.mightContain(col("k"), bos.toByteArray))
      .collect().map(_.getLong(0)).toSet
    assert(Set(1L, 3L, 5L).subsetOf(kept), s"false negative under codegen: $kept")
  }
}
