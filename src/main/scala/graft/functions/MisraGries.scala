package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native
  * `TypedImperativeAggregate`: top-`k` most frequent string values with
  * count estimates, using a bounded buffer of `capacity` counters.
  *
  * Guarantees (classic MG): every value with true frequency
  * > n/(capacity+1) is present in the buffer; estimates are lower bounds
  * with error ≤ n/(capacity+1). When the distinct-value count never
  * exceeds `capacity`, no decrements happen and the counts are EXACT —
  * which is what makes the declared query oracle-checkable on the
  * fixtures while remaining a true sketch at scale.
  *
  * Why this instead of groupBy(value).count + top-k: the exact form
  * shuffles one row per DISTINCT value (unbounded at 100 TB — think
  * n-grams); this sketch shuffles ≤ `capacity` counters per partition,
  * a fixed few KB, merged associatively.
  */
case class MisraGries(
    child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1 && capacity >= k, "need capacity >= k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], v: String, c: Long): Unit = {
    var rem = c
    while (rem > 0) {
      buf.get(v) match {
        case Some(n) =>
          buf.update(v, n + rem); rem = 0
        case None if buf.size < capacity =>
          buf.update(v, rem); rem = 0
        case None =>
          // decrement-all by min(remaining, current minimum); zeroed
          // counters free slots for the incoming value on the next pass
          val dec = math.min(rem, buf.valuesIterator.min)
          buf.mapValuesInPlace((_, n) => n - dec)
          buf.filterInPlace((_, n) => n > 0)
          rem -= dec
      }
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    // Non-string children are counted by their string rendering rather
    // than failing with a ClassCastException mid-job (ExpectsInputTypes
    // is off the table: AbstractDataType is private[sql] in Spark 4, see
    // repo NOTES.md). The facade additionally casts to string so the
    // declared output type is honest at analysis time.
    val v = child.eval(input)
    v match {
      case null              => ()
      case u: UTF8String     => add(buf, u.toString, 1L)
      case other             => add(buf, other.toString, 1L)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    // deterministic merge order → deterministic estimates across runs
    other.toSeq.sortBy(_._1).foreach { case (v, c) => add(buf, v, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (v, n) => (-n, v) }.take(k)
    new GenericArrayData(top.map { case (v, n) =>
      InternalRow(UTF8String.fromString(v), n)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, n) => out.writeUTF(v); out.writeLong(n) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {

  /** Idempotent per-session registration (k / capacity as int literals). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_hitters",
      exprs => {
        val k = exprs(1) match { case Literal(v: Int, IntegerType) => v }
        val cap = exprs(2) match { case Literal(v: Int, IntegerType) => v }
        MisraGries(exprs(0), k, cap).toAggregateExpression()
      },
      "built-in")

  /** Column-API entry point (use inside `.agg(...)`). */
  def heavyHitters(spark: SparkSession, c: Column, k: Int, capacity: Int = 256): Column = {
    register(spark)
    call_function("graft_heavy_hitters", c, lit(k), lit(capacity))
  }
}
