package graft.plans

import graft.functions.{CosineSim, HyperplaneSig, SimHash64, ZOrderKey}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session-extension entry point: registers graft's native expressions
  * as SQL functions for every session built with
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`), making them usable from
  * pure SQL — `SELECT graft_cosine(a.v, b.v) FROM …` — not just the
  * Column API, and on every executor without per-session registration
  * calls.
  *
  * No optimizer rules or strategies are injected on purpose: the
  * expressions declare determinism and foldability, so Catalyst's own
  * ConstantFolding / ColumnPruning / predicate pushdown already treat
  * them correctly (SURVEY §4 — "custom Catalyst work required: none").
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "graft_zorder"),
      (exprs: Seq[Expression]) => ZOrderKey(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "graft_hyperplane_sig"),
      (exprs: Seq[Expression]) => HyperplaneSig(exprs(0),
        intLit(exprs(1), "numPlanes"), intLit(exprs(2), "planeOffset"))))
  }
}
