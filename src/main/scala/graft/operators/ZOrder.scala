package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering — the multi-dimensional data-skipping layout
 * behind lakehouse `OPTIMIZE ... ZORDER BY` (Morton 1966; the interleaved
 * curve of Orenstein & Merrett, "A class of data structures for associative
 * searching", PODS 1984). Sorting by a single column makes its file-level
 * min/max stats selective and every other column's useless; sorting by the
 * bit-interleaved z-value makes BOTH dimensions' per-file ranges narrow
 * (side length ~ span / 2^(k/2) after k interleaved bits), so a parquet
 * scan with a predicate on EITHER column skips most files/row-groups on
 * footer stats alone. At 100 TB this is the difference between a full scan
 * and reading a few stripes — paid once at write, like bucketing.
 *
 * The z-value is pure integer bit math (shifts/AND/add of disjoint bits) —
 * codegen'd built-ins end to end, no UDF — and [[zvalueSql]] emits the same
 * formula as ANSI SQL from the same loop, so the cross-engine oracle is
 * exact by construction (same discipline as `Sampling`).
 */
object ZOrder {

  /** Bit-interleave of the low `bits` bits of `x` (even positions) and `y`
    * (odd positions): z = Σᵢ ((x≫i)&1)≪2i + ((y≫i)&1)≪(2i+1). The terms
    * occupy disjoint bit positions, so `+` ≡ `|` — addition keeps the whole
    * expression in integer codegen on both engines.
    *
    * CONTRACT: inputs must lie in [0, 2^bits). Larger values interleave
    * only their low bits (the curve stops being an injection and range
    * pruning silently weakens) — pick `bits` ≥ ⌈log₂(max+1)⌉ or mask first.
    * `bits` ≤ 31 keeps z in the low 62 bits of a signed long. */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** The identical formula as ANSI SQL (DuckDB/engine-portable). */
  def zvalueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})", s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")
  }

  /** Rewrite `df` into `numFiles` z-clustered output partitions: range
    * partition by the z-value (so files tile the curve in disjoint runs),
    * then sort inside each (so row-group stats narrow too). This is the
    * whole `OPTIMIZE ZORDER BY` write path — downstream readers need no
    * cooperation, the parquet footer stats do the skipping. */
  def cluster(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
}
