package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, col}
import org.apache.spark.sql.types._

/** N-ARY Morton (Z-order) key: round-robin bit interleave of 2–8 int
  * coordinates into one long ordered along the N-dimensional Z curve —
  * delta-spark's `OPTIMIZE ... ZORDER BY (c1, ..., cN)` for more than
  * two columns (the two-column case has the dedicated spread-based
  * [[ZOrderKey]], whose bit-twiddle form is faster; this general form
  * takes the top ⌊63/N⌋ bits of each order-preserved unsigned
  * coordinate and interleaves from the MSB down).
  *
  * Order preservation: each signed-int input flips its sign bit
  * (monotone map onto unsigned), is truncated to its top `bits` bits
  * (monotone), and the interleaved result is ≤63 bits, so plain signed
  * long comparison orders the curve. Truncation costs nothing for
  * clustering — file-level locality only needs the leading bits.
  *
  * Full `doGenCode`: the key drives a whole-table
  * repartitionByRange+sort, evaluated once per row.
  */
case class ZOrderKeyN(children: Seq[Expression]) extends Expression {

  require(children.length >= 2 && children.length <= 8,
    s"graft_zorder_n takes 2..8 columns, got ${children.length}")

  private val n = children.length
  private val bits = 63 / n

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder_n"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var i = 0
    val us = new Array[Long](n)
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      // sign-flip -> unsigned order, keep the top `bits` bits
      us(i) = (((v.asInstanceOf[Int] ^ Int.MinValue).toLong & 0xFFFFFFFFL)
        >>> (32 - bits))
      i += 1
    }
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      var d = 0
      while (d < n) {
        out = (out << 1) | ((us(d) >>> b) & 1L)
        d += 1
      }
      b -= 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evs = children.map(_.genCode(ctx))
    val us = ctx.freshName("zu")
    val out = ctx.freshName("zout")
    val b = ctx.freshName("zb")
    val loads = evs.zipWithIndex.map { case (c, i) =>
      s"""
         |${c.code}
         |if (${c.isNull}) { ${ev.isNull} = true; }
         |else { $us[$i] = ((((long)(${c.value} ^ 0x80000000)) & 0xFFFFFFFFL) >>> ${32 - bits}); }
       """.stripMargin
    }.mkString("\n")
    val inner = (0 until n).map(d =>
      s"$out = ($out << 1) | (($us[$d] >>> $b) & 1L);").mkString("\n")
    val src =
      s"""
         |boolean ${ev.isNull} = false;
         |long ${ev.value} = 0L;
         |long[] $us = new long[$n];
         |$loads
         |if (!${ev.isNull}) {
         |  long $out = 0L;
         |  for (int $b = ${bits - 1}; $b >= 0; $b--) {
         |$inner
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    ev.copy(code = code"$src")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKeyN =
    copy(children = newChildren)
}

object ZOrderKeyN {

  /** Idempotent per-session registration; casts every arg to int like
    * the binary [[ZOrderKey]].
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zorder_n",
      exprs => ZOrderKeyN(exprs.map(Cast(_, IntegerType))),
      "built-in")

  def zorderN(spark: SparkSession, cols: Seq[Column]): Column = {
    register(spark)
    call_function("graft_zorder_n", cols.map(_.cast(IntegerType)): _*)
  }

  /** Cluster a frame along the N-dimensional Z curve (the >2-column
    * OPTIMIZE ZORDER path; [[ZOrderKey.clusterBy]] covers N = 2).
    */
  def clusterByN(df: DataFrame, cols: Seq[String],
                 numPartitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("_zkey",
      zorderN(df.sparkSession, cols.map(col)))
    val ranged =
      if (numPartitions > 0)
        keyed.repartitionByRange(numPartitions, col("_zkey"))
      else keyed.repartitionByRange(col("_zkey"))
    ranged.sortWithinPartitions(col("_zkey")).drop("_zkey")
  }
}
