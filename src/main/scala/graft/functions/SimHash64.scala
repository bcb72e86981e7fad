package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a 64-bit SimHash of a text
  * column in one pass: whitespace-tokenize, xxhash64 each token
  * (seed 42 — identical to Spark's `xxhash64` function), accumulate ±1
  * votes per bit, sign → bit.
  *
  * Why an Expression and not composed built-ins: the composed form needs
  * 64 `aggregate()` higher-order calls, each re-walking (and re-hashing)
  * the token array — 64× redundant work and far outside codegen-friendly
  * shapes. This expression hashes each token exactly once.
  *
  * Codegen: `doGenCode` emits one call into [[compute]] through an
  * embedded expression reference — the same shape Spark's own regexp
  * expressions use. The whole-stage span stays unbroken (CodegenFallback
  * would force an InternalRow materialization boundary per row) and the
  * kernel loop is a JIT-compiled JVM method rather than janino source.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  // null in -> null out (nullSafeEval): declaring null intolerance lets
  // Catalyst's constraint inference rewrite isnotnull(f(x)) to
  // isnotnull(x) instead of pushing a duplicated evaluation of this
  // expression into a scan-level Filter.
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  /** Kernel shared by interpreted eval and generated code. */
  def compute(input: UTF8String): Long = {
    val toks = input.toString.trim.split("\\s+")
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = XxHash64Function.hash(UTF8String.fromString(toks(i)), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSimhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Registration + Column-API entry points for graft's native expressions. */
object GraftFunctions {

  /** Idempotent per-session registration (builder casts like the Column
    * facade so SQL and Column surfaces agree on off-type args). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64",
      exprs => SimHash64(Cast(exprs.head, StringType)), "built-in")

  def simhash64(spark: SparkSession, c: Column): Column = {
    register(spark)
    // cast → analysis-time coercion instead of a mid-job CCE
    call_function("graft_simhash64", c.cast(StringType))
  }
}
