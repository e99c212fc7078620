package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/**
 * HyperLogLog register primitives for HyperBall-style neighborhood
 * functions (Flajolet et al., AofA 2007; Boldi & Vigna, "In-core
 * computation of geometric centralities with HyperBall", 2013 — the
 * standard way to measure ball sizes / effective diameter on web graphs).
 *
 * A vertex's ball counter is `m` one-byte registers packed into a BINARY
 * column; the HyperBall superstep unions counters along edges, and an HLL
 * union is the elementwise register max — commutative, associative and
 * IDEMPOTENT, so `BytesMaxAgg` is safe under any merge order AND under
 * Spark's partial aggregation (map-side combine halves the superstep
 * shuffle exactly like a sum would).
 *
 * Everything is hash-deterministic: `HllInitExpr` seeds one register from
 * splitmix64(vid) (Steele et al., public-domain mixing constants — same
 * family the repo already uses for minhash), so a given graph always
 * produces bit-identical registers and therefore a deterministic estimate,
 * which is what lets the harness gate approximate ball sizes against the
 * exact 2-hop oracle without float-drift flakiness.
 */
object HllExprs {

  /** Registers per counter. m=64 (p=6) → 8 bytes of shuffle payload per
    * vertex per 8 registers; at 1σ ≈ 1.04/√m ≈ 13% raw HLL error, with the
    * small-range linear-counting regime (ball ≤ 2.5·m = 160) far tighter —
    * the regime every ≤2-hop ball of a bounded-out-degree crawl sits in. */
  val M = 64
  private val P = 6 // log2(M)

  private[graft] def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Reference add — shared by the expression and its spec. */
  private[graft] def addToRegisters(regs: Array[Byte], vid: Long): Unit = {
    val h = splitmix64(vid)
    val idx = (h >>> (64 - P)).toInt        // top p bits pick the register
    val w = h << P                           // remaining bits, left-aligned
    // ρ ≤ 65−P = 59 always fits positive in a byte: signed compare is exact
    val rho = (if (w == 0L) 65 - P else java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
    if (regs(idx) < rho) regs(idx) = rho
  }

  /** Reference estimate with small-range correction. */
  private[graft] def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      invSum += java.lang.Math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / invSum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** vid:LONG → fresh m-byte counter containing exactly {vid}. Evaluated
    * once per vertex at superstep 0 — not a hot-loop expression, so
    * CodegenFallback costs nothing measurable. */
  case class HllInitExpr(child: Expression, m: Int)
      extends UnaryExpression with CodegenFallback {
    require(m == M, s"registers fixed at $M")
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any = {
      val regs = new Array[Byte](m)
      addToRegisters(regs, v.asInstanceOf[Long])
      regs
    }
    override protected def withNewChildInternal(c: Expression): HllInitExpr = copy(child = c)
  }

  /** counter:BINARY → estimated cardinality (double). Deterministic given
    * deterministic registers. */
  case class HllEstimateExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any = estimate(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): HllEstimateExpr = copy(child = c)
  }

  /**
   * Elementwise max over BINARY values — HLL register union as a real
   * Catalyst aggregate (TypedImperativeAggregate), so it participates in
   * partial aggregation: each map task pre-unions its local counters and
   * the superstep shuffles ONE counter per (vertex × map partition), not
   * one per edge. The buffer is the m-byte array itself; serialize /
   * deserialize are identity.
   *
   * All inputs must share one length (the operator's m is fixed per query);
   * a mismatch is a loud error, never a silent prefix union.
   */
  case class BytesMaxAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

    private def unionInto(acc: Array[Byte], v: Array[Byte]): Array[Byte] =
      if (v == null || v.isEmpty) acc
      else if (acc.isEmpty) v.clone() // adopt a copy — never alias input memory
      else {
        require(acc.length == v.length,
          s"BytesMaxAgg: register width mismatch ${acc.length} vs ${v.length}")
        var i = 0
        while (i < acc.length) {
          // registers are small non-negative values (ρ ≤ 59): signed byte
          // compare is exact
          if (v(i) > acc(i)) acc(i) = v(i)
          i += 1
        }
        acc
      }

    override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] =
      unionInto(buffer, child.eval(input).asInstanceOf[Array[Byte]])

    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
      unionInto(b1, b2)

    override def eval(buffer: Array[Byte]): Any =
      if (buffer.isEmpty) null else buffer

    override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
    override def deserialize(storage: Array[Byte]): Array[Byte] = storage

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true

    override def withNewMutableAggBufferOffset(o: Int): BytesMaxAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BytesMaxAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): BytesMaxAgg =
      copy(child = c)
  }

  def hllInit(vid: Column): Column =
    ColumnShim.column(HllInitExpr(ColumnShim.expression(vid), M))

  def hllEstimate(regs: Column): Column =
    ColumnShim.column(HllEstimateExpr(ColumnShim.expression(regs)))

  def hllUnionAgg(regs: Column): Column =
    ColumnShim.column(BytesMaxAgg(ColumnShim.expression(regs)).toAggregateExpression())
}
