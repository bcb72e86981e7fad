package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, col}
import org.apache.spark.sql.types._

/** Morton (Z-order) key of two int columns: their bits interleaved into
  * one long whose total order follows the Z-space-filling curve. Sorting
  * or range-partitioning by this key clusters rows so that parquet
  * row-group min/max stats are tight on BOTH dimensions — the actual
  * Z-ORDER clustering Delta's `OPTIMIZE ... ZORDER BY` provides
  * (reference `src/etl_pipeline.py:87-88`; Delta Lake paper §3.3, VLDB
  * 2020), which lexicographic range clustering only approximates on the
  * leading column (SURVEY §4 deferred this — now implemented).
  *
  * Inputs are treated as signed ints: the sign bit is flipped before
  * spreading (order-preserving map onto unsigned), and the interleaved
  * result has its top bit flipped back so plain signed-long comparison
  * orders the curve correctly.
  *
  * Full `doGenCode` — the key feeds a repartitionByRange+sort, so it is
  * evaluated once per row on the entire table being clustered.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  // null in -> null out (nullSafeEval): lets constraint inference use
  // isnotnull(children) instead of duplicating this expression in filters
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = ZOrderKey.spread((a.asInstanceOf[Int] ^ Int.MinValue).toLong & 0xFFFFFFFFL)
    val y = ZOrderKey.spread((b.asInstanceOf[Int] ^ Int.MinValue).toLong & 0xFFFFFFFFL)
    java.lang.Long.valueOf(((y << 1) | x) ^ Long.MinValue)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spread = ctx.addNewFunction("graftZSpread",
      s"""
         |private long graftZSpread(long x) {
         |  x &= 0xFFFFFFFFL;
         |  x = (x | (x << 16)) & 0x0000FFFF0000FFFFL;
         |  x = (x | (x << 8))  & 0x00FF00FF00FF00FFL;
         |  x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL;
         |  x = (x | (x << 2))  & 0x3333333333333333L;
         |  x = (x | (x << 1))  & 0x5555555555555555L;
         |  return x;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // simple local statements — janino rejects the fused multi-line
      // expression form (parses the parenthesized shift as a cast type)
      val zx = ctx.freshName("zx")
      val zy = ctx.freshName("zy")
      s"""
         |long $zx = $spread(((long)($x ^ 0x80000000)) & 0xFFFFFFFFL);
         |long $zy = $spread(((long)($y ^ 0x80000000)) & 0xFFFFFFFFL);
         |${ev.value} = (($zy << 1) | $zx) ^ 0x8000000000000000L;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** Spread the low 32 bits of x into the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Idempotent per-session registration. The builder casts to int like
    * the Column facade — without it the SQL surface diverged on BIGINT
    * args (interpreted threw ClassCastException, codegen truncated).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zorder",
      exprs => ZOrderKey(Cast(exprs(0), IntegerType), Cast(exprs(1), IntegerType)),
      "built-in")

  /** Column-API entry point; casts both keys to int. */
  def zorder(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_zorder", a.cast(IntegerType), b.cast(IntegerType))
  }

  /** Cluster a frame along the Z-curve of two columns: range-partition
    * and sort by the interleaved key, then drop it — the write that
    * follows inherits the layout (the Delta OPTIMIZE ZORDER analog).
    */
  def clusterBy(df: org.apache.spark.sql.DataFrame,
                c1: String, c2: String,
                numPartitions: Int = 0): org.apache.spark.sql.DataFrame = {
    val keyed = df.withColumn("_zkey", zorder(df.sparkSession, col(c1), col(c2)))
    // numPartitions > 0 pins the output file count (the OPTIMIZE-style
    // target-file-size knob; 0 = planner/AQE-chosen)
    val ranged =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col("_zkey"))
      else keyed.repartitionByRange(col("_zkey"))
    ranged.sortWithinPartitions(col("_zkey")).drop("_zkey")
  }
}
