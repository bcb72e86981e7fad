package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Per-group Bloom filter aggregate — the build side of the FILE-LEVEL
  * BLOOM INDEX ([[graft.pipeline.ManifestTable.setBloomIndex]]). Grouped
  * by `input_file_name`, it condenses each data file's column values
  * into one serialized filter, so a point lookup on an UNCLUSTERED
  * high-cardinality column can skip files that min/max stats can never
  * prune (a uniformly-scattered key is inside every file's [min,max]).
  * This is the Delta Lake bloom-filter-index design.
  *
  * Spark's own `sketch.BloomFilter` supplies the bit math (public
  * `spark-sketch` API); this aggregate only adapts it to Catalyst.
  * PUT CONVENTION (the probe kernels [[BloomFileAgg.probeLong]] /
  * [[BloomFileAgg.probeUtf8]] must mirror it exactly): integral types
  * put as LONG; strings put as UTF-8 BYTES. Other types are rejected at construction — floating
  * keys round badly in equality lookups anyway.
  *
  * Merge unions bit sets (both buffers are created with identical
  * (expectedItems, fpp), so layouts are compatible) — order-independent
  * like every aggregate in this codebase, though the index path groups
  * by file and never merges across groups in practice.
  */
case class BloomFileAgg(
    child: Expression, expectedItems: Long, fpp: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "need expectedItems > 0")
  require(fpp > 0 && fpp < 1, "need 0 < fpp < 1")

  private val isString = child.dataType == StringType
  private val isIntegral = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  require(isString || isIntegral,
    s"bloom index supports integral and string columns, got ${child.dataType}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_file_bloom"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) {
      if (isString) buf.putBinary(v.asInstanceOf[UTF8String].getBytes)
      else buf.putLong(v match {
        case l: Long  => l
        case i: Int   => i.toLong
        case s: Short => s.toLong
        case b: Byte  => b.toLong
      })
    }
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter =
    buf.mergeInPlace(other)

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomFileAgg =
    copy(child = newChildren.head)
}

/** Native scalar probe over a PER-ROW serialized filter — the executor
  * side of the file-level bloom index. Spark's own
  * `BloomFilterMightContain` cannot serve here: it requires its filter
  * operand foldable (one filter for the whole plan, cached once on the
  * driver), while the sidecar table carries a DIFFERENT filter per row
  * (one per data file). This expression deserializes the row's bits and
  * tests the probe value with the exact put convention of
  * [[BloomFileAgg]] (integrals as long, strings as UTF-8 bytes).
  *
  * Scale shape: this is what lets a point lookup probe the index
  * DISTRIBUTIVELY — the sidecar parquet is scanned executor-side, each
  * task tests its own files' filters, and only file NAMES flow to the
  * driver (KBs at 10⁶ files) instead of O(table-filter-bytes) blobs.
  * Per-row deserialization is inherent to per-file filters and bounded
  * by O(live files) rows total, not O(data).
  *
  * Codegen: one call into [[BloomFileAgg.probeLong]]/[[BloomFileAgg.probeUtf8]]
  * via an embedded reference — same shape as [[SimHash64]]; the
  * whole-stage span stays unbroken.
  */
case class BloomProbe(bits: Expression, value: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private val isString = value.dataType == StringType
  private val isIntegral = value.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  require(isString || isIntegral,
    s"bloom probe supports integral and string values, got ${value.dataType}")
  require(bits.dataType == BinaryType,
    s"bloom probe needs serialized filter bytes, got ${bits.dataType}")

  override def left: Expression = bits
  override def right: Expression = value
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def nullSafeEval(b: Any, v: Any): Any =
    if (isString)
      java.lang.Boolean.valueOf(BloomFileAgg.probeUtf8(
        b.asInstanceOf[Array[Byte]], v.asInstanceOf[UTF8String]))
    else
      java.lang.Boolean.valueOf(BloomFileAgg.probeLong(
        b.asInstanceOf[Array[Byte]], v match {
          case l: Long  => l
          case i: Int   => i.toLong
          case s: Short => s.toLong
          case x: Byte  => x.toLong
        }))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val obj = "graft.functions.BloomFileAgg"
    if (isString)
      nullSafeCodeGen(ctx, ev,
        (b, v) => s"${ev.value} = $obj.probeUtf8($b, $v);")
    else
      nullSafeCodeGen(ctx, ev,
        (b, v) => s"${ev.value} = $obj.probeLong($b, (long) $v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(bits = newLeft, value = newRight)
}

object BloomFileAgg {

  /** Idempotent per-session registration (items / fpp as literals). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_probe",
      exprs => BloomProbe(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_file_bloom",
      exprs => {
        val items = exprs(1) match {
          case Literal(v: Long, LongType) => v
          case Literal(v: Int, IntegerType) => v.toLong
          case other => throw new IllegalArgumentException(
            s"graft_file_bloom expectedItems must be an integer literal, got $other")
        }
        val fpp = exprs(2) match {
          case Literal(v: Double, DoubleType) => v
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_file_bloom fpp must be a numeric literal, got $other")
        }
        BloomFileAgg(exprs(0), items, fpp).toAggregateExpression()
      },
      "built-in")
  }

  /** Column-API entry point (use inside `.agg(...)`). */
  def bloom(spark: SparkSession, c: Column, expectedItems: Long,
            fpp: Double): Column = {
    register(spark)
    call_function("graft_file_bloom", c, lit(expectedItems), lit(fpp))
  }

  /** Column-API probe of a PER-ROW serialized filter (executor-side;
    * see [[BloomProbe]]). `bits` is the sidecar's binary column; `value`
    * the lookup literal. */
  def probe(spark: SparkSession, bits: Column, value: Column): Column = {
    register(spark)
    call_function("graft_bloom_probe", bits, value)
  }

  /** Executor-side probe kernels (called from [[BloomProbe]] codegen).
    * MUST mirror the put convention: integrals as long, strings as
    * UTF-8 bytes. */
  def probeLong(bits: Array[Byte], value: Long): Boolean =
    BloomFilter.readFrom(new ByteArrayInputStream(bits)).mightContainLong(value)

  def probeUtf8(bits: Array[Byte], value: UTF8String): Boolean =
    BloomFilter.readFrom(new ByteArrayInputStream(bits))
      .mightContainBinary(value.getBytes)
}
