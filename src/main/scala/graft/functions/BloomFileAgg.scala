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
  * PUT CONVENTION (the probe side [[BloomFileAgg.mightContain]] must
  * mirror it exactly): integral types put as LONG; strings put as
  * UTF-8 BYTES. Other types are rejected at construction — floating
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

object BloomFileAgg {

  /** Idempotent per-session registration (items / fpp as literals). */
  def register(spark: SparkSession): Unit =
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

  /** Column-API entry point (use inside `.agg(...)`). */
  def bloom(spark: SparkSession, c: Column, expectedItems: Long,
            fpp: Double): Column = {
    register(spark)
    call_function("graft_file_bloom", c, lit(expectedItems), lit(fpp))
  }

  /** Probe a serialized filter — MUST mirror the put convention above:
    * integrals as long, strings as UTF-8 bytes. False means the file
    * definitely lacks the value; true means "maybe" at the index fpp.
    */
  def mightContain(bits: Array[Byte], value: Any): Boolean = {
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(bits))
    value match {
      case l: Long   => bf.mightContainLong(l)
      case i: Int    => bf.mightContainLong(i.toLong)
      case s: Short  => bf.mightContainLong(s.toLong)
      case b: Byte   => bf.mightContainLong(b.toLong)
      case s: String => bf.mightContainBinary(s.getBytes("UTF-8"))
      case other => throw new IllegalArgumentException(
        s"bloom probe supports integral and string values, got " +
          s"${Option(other).map(_.getClass.getName).getOrElse("null")}")
    }
  }
}
