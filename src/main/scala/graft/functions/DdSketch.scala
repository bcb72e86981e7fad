package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Mergeable quantile sketch with a GUARANTEED relative-error band —
  * the slot in the sketch family where the exact fixed-width histogram
  * ([[graft.ops.Sketches.dailyValueHistogram]]) gives out: on a
  * heavy-tailed value domain (file sizes, token counts) fixed-width
  * state is O(value_range/width) per cell, while log-spaced bins are
  * O(log(range)/α) — ~1.4k bins cover 12 orders of magnitude at
  * α = 1%.
  *
  * Design: logarithmic binning (the DDSketch construction, Masson,
  * Lee & Rim, VLDB 2019): γ = (1+α)/(1−α), bin(x) = ⌈log_γ x⌉ for
  * x > 0, estimate(b) = 2γᵇ/(γ+1). Any x in bin b satisfies
  * |estimate − x| ≤ α·x by construction, so the value read off at any
  * rank is within relative α of the exact order statistic at that
  * rank. Values ≤ 0 collect in a dedicated bottom bin estimating 0
  * (o_totalprice-like domains never hit it; the spec covers it).
  *
  * Why log bins instead of KLL compactors (the other candidate for
  * this slot): KLL's compaction is RANDOMIZED, and Spark merges
  * partial aggregation buffers in shuffle-arrival order — a KLL merge
  * would make the declared query's output run-dependent, which the
  * exact-hash oracle protocol cannot gate. Log-bin state merges by
  * ADDING COUNTS: fully order-independent, bit-stable, and the
  * daily→monthly rollup is provably lossless (same property that makes
  * [[graft.ops.Sketches.monthlyDistinctUsers]]'s HLL verdict checkable).
  * The trade is a guaranteed RELATIVE error vs KLL's rank error — the
  * right guarantee for heavy-tailed value domains, where relative
  * precision at the tail is the point.
  *
  * State bound: `maxBins` caps the buffer (default 2048 ≈ γ^2048 ≈
  * 17 orders of magnitude at α=1% before engaging). On overflow the
  * LOWEST bins collapse into their ceiling (the collapsing variant of
  * the paper, §2.3): tail quantiles — the ones a heavy-tailed monitor
  * cares about — keep their guarantee; only quantiles that land in the
  * collapsed floor lose precision. Hot path stays an integer
  * HashMap update; the buffer ships ≤ maxBins (bin, count) pairs per
  * partition, merged associatively.
  */
case class DdSketch(
    child: Expression, alpha: Double, maxBins: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Int, Long]] {

  require(alpha > 0 && alpha < 1, "need 0 < alpha < 1")
  require(maxBins >= 16, "need maxBins >= 16")

  /** Bin index for non-positive values (estimates 0). */
  private val ZeroBin = Int.MinValue

  private val gamma = (1 + alpha) / (1 - alpha)
  private val lnGamma = StrictMath.log(gamma)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bin", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_dd_sketch"

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty

  private def binOf(v: Double): Int =
    if (v <= 0 || v.isNaN) ZeroBin
    // StrictMath: bit-identical binning on every executor JVM
    else StrictMath.ceil(StrictMath.log(v) / lnGamma).toInt

  /** Collapse the lowest bins into the lowest SURVIVING bin until the
    * buffer fits — tail precision is preserved, the floor coarsens
    * (DDSketch §2.3). Deterministic in the buffer content alone.
    */
  private def collapse(buf: mutable.HashMap[Int, Long]): Unit =
    while (buf.size > maxBins) {
      val keys = buf.keysIterator.filter(_ != ZeroBin).toSeq.sorted
      val lowest = keys.head
      val next = keys(1)
      val n = buf.remove(lowest).get
      buf.update(next, buf.getOrElse(next, 0L) + n)
    }

  override def update(buf: mutable.HashMap[Int, Long], input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = binOf(v.asInstanceOf[Double])
      buf.update(b, buf.getOrElse(b, 0L) + 1L)
      if (buf.size > maxBins) collapse(buf)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Int, Long], other: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
    // counts add: merge is order-independent and lossless (absent
    // collapse), so shuffle-arrival order can never change the result
    other.foreach { case (b, n) => buf.update(b, buf.getOrElse(b, 0L) + n) }
    if (buf.size > maxBins) collapse(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[Int, Long]): Any = {
    val sorted = buf.toSeq.sortBy(_._1)
    new GenericArrayData(sorted.map { case (b, n) => InternalRow(b, n) })
  }

  override def serialize(buf: mutable.HashMap[Int, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (b, n) => out.writeInt(b); out.writeLong(n) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Int, Long]
    var i = 0
    while (i < n) { buf.update(in.readInt(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DdSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): DdSketch =
    copy(child = newChildren.head)
}

object DdSketch {

  val DefaultAlpha: Double = 0.01
  val DefaultMaxBins: Int = 2048

  /** γ for a given α — needed by the readoff (estimate = 2γᵇ/(γ+1)). */
  def gammaOf(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** Idempotent per-session registration (alpha / maxBins as literals).
    * SQL fractional literals parse as DECIMAL (0.01 → DECIMAL(3,2)), not
    * DOUBLE — both registration paths (this registry one and the
    * GraftExtensions injection) must accept the same literal spellings,
    * so the coercion here mirrors GraftExtensions.doubleLit/intLit.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dd_sketch",
      exprs => {
        val alpha = exprs(1) match {
          case Literal(v: Double, DoubleType) => v
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_dd_sketch alpha must be a numeric literal, got $other")
        }
        val bins = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case Literal(v: Long, LongType) => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_dd_sketch maxBins must be an integer literal, got $other")
        }
        DdSketch(Cast(exprs(0), DoubleType), alpha, bins).toAggregateExpression()
      },
      "built-in")

  /** Column-API entry point (use inside `.agg(...)`): the sketch state
    * as array<struct<bin:int, n:bigint>>, ascending by bin.
    */
  def sketch(spark: SparkSession, c: Column,
             alpha: Double = DefaultAlpha,
             maxBins: Int = DefaultMaxBins): Column = {
    register(spark)
    call_function("graft_dd_sketch", c, lit(alpha), lit(maxBins))
  }
}
