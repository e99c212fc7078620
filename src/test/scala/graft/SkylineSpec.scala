package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

/**
 * The two-pass distinct-x skyline must equal the quadratic dominance
 * definition exactly — verified by brute force on a hashed fixture dense
 * enough to contain x-ties, y-ties and full (x,y) duplicates.
 */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  // deterministic, collision-rich: x,y in small ranges so ties are common
  private val rows: Seq[(String, Long, Long, Long)] =
    (0L until 300L).map { i =>
      (s"g${i % 3}", i, (i * 2654435761L + 7) % 17, (i * 40503L + 11) % 13)
    }

  private def brute(): Set[(String, Long)] = {
    val byG = rows.groupBy(_._1)
    byG.flatMap { case (_, rs) =>
      rs.filterNot { r =>
        rs.exists(o => o != r && o._3 >= r._3 && o._4 >= r._4
          && (o._3 > r._3 || o._4 > r._4))
      }
    }.map(r => (r._1, r._2)).toSet
  }

  test("frontier2D equals brute-force dominance on a tie-rich fixture") {
    val df = rows.toDF("g", "id", "x", "y")
    val got = Skyline.frontier2D(df, "g", "x", "y")
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == brute(), s"skyline diverged from the dominance definition")
  }

  test("exact (x,y) duplicates survive together — no strict edge between them") {
    val df = Seq(("g", 1L, 10L, 10L), ("g", 2L, 10L, 10L), ("g", 3L, 5L, 20L))
      .toDF("g", "id", "x", "y")
    val got = Skyline.frontier2D(df, "g", "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("a dominated duplicate pair is removed entirely") {
    val df = Seq(("g", 1L, 10L, 10L), ("g", 2L, 10L, 10L), ("g", 3L, 11L, 10L))
      .toDF("g", "id", "x", "y")
    val got = Skyline.frontier2D(df, "g", "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(3L))
  }
}
