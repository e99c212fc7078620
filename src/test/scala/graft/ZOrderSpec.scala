package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/**
 * Z-order clustering: (1) the column expression equals a reference bit
 * interleave exactly, (2) the layout measurably narrows per-file min/max
 * ranges on BOTH dimensions — the quantity parquet footer-stats skipping
 * actually consumes — where a single-column sort narrows only its own.
 */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** reference interleave, independent loop shape (mask-accumulate). */
  private def refZ(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zvalue equals the reference interleave incl. bit boundaries") {
    val rnd = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), ((1L << 21) - 1, (1L << 21) - 1),
      (1L << 20, 1L)) ++ Seq.fill(200)((rnd.nextInt(1 << 21).toLong, rnd.nextInt(1 << 21).toLong))
    val df = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y"), 21).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == refZ(r.getLong(0), r.getLong(1), 21),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // 31-bit ceiling stays in the positive long range
    val top = Seq(((1L << 31) - 1, (1L << 31) - 1)).toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y"), 31).as("z")).head().getLong(0)
    assert(top == refZ((1L << 31) - 1, (1L << 31) - 1, 31) && top > 0)
  }

  test("cluster narrows per-file min/max on BOTH dims; x-sort only on x") {
    // 40k points on a 512x512 grid, row-major-with-stride order so the raw
    // row order correlates with NEITHER dim's locality
    val n = 40000
    val base = spark.range(n)
      .select((col("id") * 7919 % 512).as("x"), (col("id") * 104729 % 512).as("y"))
    val root = s"${sys.props("java.io.tmpdir")}/graft_zorder/${spark.sparkContext.applicationId}"
    val files = 16
    ZOrder.cluster(base, ZOrder.zvalue(col("x"), col("y"), 9), files)
      .write.mode("overwrite").parquet(s"$root/z")
    base.repartitionByRange(files, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$root/xsort")

    /** mean per-file (max-min+1) extent of each dim, as a fraction of 512. */
    def meanExtent(dir: String): (Double, Double) = {
      val fs = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      assert(fs.length > 4, s"expected several files in $dir")
      val ext = fs.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        ((r.getLong(1) - r.getLong(0) + 1).toDouble / 512,
          (r.getLong(3) - r.getLong(2) + 1).toDouble / 512)
      }
      (ext.map(_._1).sum / ext.length, ext.map(_._2).sum / ext.length)
    }

    val (zx, zy) = meanExtent(s"$root/z")
    val (sx, sy) = meanExtent(s"$root/xsort")
    // 16 files over a 512^2 grid: z-curve tiles ⇒ both extents shrink well
    // below the full span; the x-sort shrinks x but leaves y at ~full span
    assert(zx < 0.5 && zy < 0.5, s"z-layout extents ($zx, $zy) should both narrow")
    assert(sx < 0.2, s"x-sorted layout must narrow x (got $sx)")
    assert(sy > 0.9, s"x-sorted layout leaves y unhelpful (got $sy)")
    assert(zx < sy / 2 && zy < sy / 2,
      s"z-layout must beat the unsorted dim by 2x+ on both axes ($zx, $zy vs $sy)")
  }
}
