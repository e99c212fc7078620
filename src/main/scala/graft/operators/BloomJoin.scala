package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Bloom-filter pre-filtered semi-join — the shuffle-volume reducer for
 * "big probe side ⋈ selective small side" at web scale (Bloom 1970,
 * "Space/time trade-offs in hash coding with allowable errors"; the same
 * sideways-information-passing pattern Spark's own InjectRuntimeFilter
 * applies internally, here exposed as a first-class operator the user can
 * aim at any join).
 *
 * Shape and 100 TB rationale:
 *  1. ONE pass over the (small) build side constructs a `BloomFilter`
 *     (`DataFrameStatFunctions.bloomFilter` — distributed build, driver
 *     merge), serialized into a compiled [[BloomJoin.BloomMightContainLong]]
 *     predicate that ships with the plan once per executor.
 *  2. The probe side is filtered BEFORE its shuffle: with match selectivity
 *     s and false-positive rate p, shuffle volume drops from |big| to
 *     (s + p)·|big| — at 100 TB probe scale and a 1% match rate this is
 *     the difference between shuffling 100 TB and ~2 TB.
 *  3. A closing left-semi equi-join removes the ≤p false positives, so the
 *     result is EXACT: a Bloom filter has no false negatives by
 *     construction, hence pre-filtering can never drop a matching row.
 *
 * The predicate is a real Catalyst expression with `doGenCode` (the probe
 * filter is the hot path — one virtual call into the shared filter per row
 * inside the WholeStageCodegen body, no per-row UDF serde), deserialized
 * lazily once per executor JVM from the plan-shipped bytes.
 */
object BloomJoin {

  /** Compiled membership probe against a plan-shipped serialized Bloom
    * filter. Long keys only (every join key in this engine's tables is
    * int64); null in → null out (dropped by Filter and semi-join alike). */
  case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
      extends UnaryExpression with ExpectsInputTypes {
    // input validation must run at ANALYSIS time, not construction — `col("k")`
    // is an UnresolvedAttribute with no dataType until the plan is analyzed
    override def inputTypes = Seq(LongType) // AbstractDataType is private[sql]; infer
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = child.nullable

    // rebuilt at most once per (JVM, expression instance); the bytes ride
    // the serialized plan, not a broadcast, so tiny filters stay zero-cost
    @transient private lazy val bloom: BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

    /** Public: called from generated code via the reference object. */
    def contains(v: Long): Boolean = bloom.mightContainLong(v)

    override def nullSafeEval(v: Any): Any = contains(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContainLong].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.contains($v);")
    }

    override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
      copy(child = c)
  }

  def mightContain(key: Column, bloomBytes: Array[Byte]): Column =
    ColumnShim.column(BloomMightContainLong(ColumnShim.expression(key), bloomBytes))

  /**
   * Exact semi-join of `big` (on long column `bigKey`) against the key set
   * of `small` (`smallKey`), probe side pre-filtered by a Bloom filter built
   * from the build side. Two driver actions on the SMALL side only (count
   * for sizing + the filter-build aggregate); the big side is touched once,
   * post-filter.
   */
  def bloomSemiJoin(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
                    fpp: Double = 0.01): DataFrame = {
    // ONE pass computes the deduped build-side key set; the sizing count,
    // the filter-build aggregate, and the closing semi-join all read the
    // checkpointed blocks instead of re-running the (possibly expensive)
    // plan behind `small` three times. The blocks are |keys|-sized — small
    // by this operator's contract — and live until the frame is GC'd.
    val keys = small.select(col(smallKey).as("__bj_key")).distinct()
      .localCheckpoint(true)
    val expected = math.max(keys.count(), 1L)
    val bf  = keys.stat.bloomFilter("__bj_key", expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val pre = big.filter(mightContain(col(bigKey), bos.toByteArray))
    // false-positive cleanup: exact equi-semi-join against the build keys
    // (typically broadcast; survivors, not |big|, shuffle if it is not)
    pre.join(keys, col(bigKey) === col("__bj_key"), "left_semi")
  }
}
