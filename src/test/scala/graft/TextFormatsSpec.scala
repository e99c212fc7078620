package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.TextFormats

/** Lossless round-trip proof for the CSV / JSON-lines source surface on the
  * value classes the engine actually carries: int64 keys, strings with CSV
  * metacharacters and unicode, doubles across the exponent range (shortest-
  * repr round-trip), microsecond timestamps, and NULLs distinct from empty
  * strings. */
class TextFormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true),
    StructField("t", TimestampType, nullable = true)))

  private val ts = Timestamp.valueOf("2024-03-01 01:02:03.123456")

  private val rows = Seq(
    Row(1L, "plain", 1.5, ts),
    Row(2L, "comma, \"quoted\" text", -0.1, Timestamp.valueOf("1999-12-31 23:59:59.999999")),
    Row(3L, null, java.lang.Double.MIN_VALUE, null),
    Row(4L, "", java.lang.Double.MAX_VALUE, ts),
    Row(5L, "ünïcødé ☃ 中文", -1.23456789012345e-300, ts),
    Row(6L, "\\N lookalike payload", null, ts), // literal backslash-N INSIDE a longer string
    Row(7L, "line one\nline two\r\nline three", 2.5, ts)) // embedded newlines (multiLine read)

  private def df = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 2), schema)

  private def canon(rs: Array[Row]): Set[(Long, Option[String], Option[Long], Option[Long])] =
    rs.map { r =>
      (r.getLong(0),
        Option(r.get(1)).map(_.toString),
        // compare doubles by raw bits (covers -0.0 and subnormals exactly)
        Option(r.get(2)).map(v => java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double])),
        Option(r.get(3)).map(_.asInstanceOf[Timestamp].getTime * 1000 +
          r.getAs[Timestamp](3).getNanos / 1000 % 1000))
    }.toSet

  test("CSV round-trip is lossless incl. nulls vs empty strings and micro-ts") {
    val got = TextFormats.csvRoundTrip(spark, df, "spec_csv").collect()
    assert(canon(got) == canon(df.collect()))
    val byK = got.map(r => r.getLong(0) -> r).toMap
    assert(byK(3L).isNullAt(1), "NULL string must stay NULL")
    assert(byK(4L).getString(1) == "", "empty string must stay empty, not NULL")
  }

  test("JSONL round-trip is lossless") {
    val got = TextFormats.jsonlRoundTrip(spark, df, "spec_jsonl").collect()
    assert(canon(got) == canon(df.collect()))
  }

  test("ORC round-trip is lossless — binary+typed, no sentinel collision") {
    val got = TextFormats.orcRoundTrip(spark, df, "spec_orc").collect()
    assert(canon(got) == canon(df.collect()))
    val byK = got.map(r => r.getLong(0) -> r).toMap
    assert(byK(3L).isNullAt(1), "NULL string must stay NULL")
    assert(byK(4L).getString(1) == "", "empty string must stay empty, not NULL")
    // the CSV sentinel's contract limit does NOT apply to a typed format:
    // a string exactly equal to \N survives an ORC round-trip
    val collide = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, "\\N", 1.0, ts)), 1), schema)
    val back = TextFormats.orcRoundTrip(spark, collide, "spec_orc_sentinel").collect()
    assert(back.head.getString(1) == "\\N", "literal \\N string survives ORC")
  }

  test("sentinel collision is PINNED: string exactly \\N reads back NULL from CSV, survives JSONL") {
    // the documented contract limit of the \N dump convention — this test
    // exists so the behavior is a recorded decision, not a surprise
    val schema1 = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "\\N")), 1), schema1)
    val csv = TextFormats.csvRoundTrip(spark, d, "spec_sentinel").collect()
    assert(csv.head.isNullAt(1), "CSV: a literal \\N string is absorbed by the null sentinel")
    val jsonl = TextFormats.jsonlRoundTrip(spark, d, "spec_sentinel").collect()
    assert(jsonl.head.getString(1) == "\\N", "JSONL escapes natively — no sentinel collision")
  }

  test("FAILFAST read throws on a corrupt CSV row instead of nulling it") {
    val dirPath = s"${sys.props("java.io.tmpdir")}/graft_fmt_corrupt_${System.nanoTime()}"
    val p = new java.io.File(dirPath); p.mkdirs()
    val f = new java.io.FileWriter(new java.io.File(p, "part-0.csv"))
    f.write("k,s,v,t\n1,ok,1.5,2024-03-01 01:02:03.000000\nnot_a_long,bad,x,y\n")
    f.close()
    val read = spark.read.schema(schema)
      .option("header", "true").option("mode", "FAILFAST")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(dirPath)
    intercept[org.apache.spark.SparkException] { read.collect() }
  }
}
