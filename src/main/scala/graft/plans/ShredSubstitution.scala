package graft.plans

import graft.pipeline.VariantShred
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SHRED SUBSTITUTION — the read-side transparency rule for
  * [[VariantShred variant shredding]]: a query that spells
  * `variant_get(v, '$.k', 'long')` over a shredded table silently
  * reads the MATERIALIZED `_shred_k` column instead of re-walking the
  * variant encoding per row. This is what turns shredding from an
  * API convention into a table property: SQL users (and BI tools)
  * keep writing the standard variant accessor, and because the
  * substituted reference is an ordinary typed column, BOTH pruning
  * layers engage for free — parquet row-group min/max under the
  * pushed filter, and the manifest's file-level data skipping.
  *
  * Post-resolution analyzer rule (injected from [[GraftExtensions]]),
  * which is the altitude that makes it sound: at analysis time no
  * column pruning has run, so the relation's full output — including
  * the shreds — is still in scope beneath every operator; the
  * substitution then lets Catalyst's own ColumnPruning drop the
  * variant column when nothing else needs it.
  *
  * Soundness contract: `_shred_<path>` is the writer-reserved
  * namespace ([[VariantShred.shredName]]) — each shred was computed
  * at write time by EXACTLY the expression being substituted, over
  * the same rows. The rule requires (a) the accessor's path is a
  * literal, (b) the substituting attribute comes from the SAME child
  * that produces the variant attribute (a join of a shredded table
  * with an unshredded variant-bearing one must never serve one
  * table's shred for the other's rows — and with same-child scoping
  * each side of a self-join substitutes its own shred), (c) it is
  * UNIQUE there, (d) its type equals the accessor's target type —
  * anything else leaves the expression untouched.
  */
case class ShredSubstitution(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case node if node.childrenResolved =>
        if (node.children.isEmpty) node
        else {
          val inScope = node.children.flatMap(_.output)
          node.transformExpressionsUp {
            case vg @ VariantGet(a: AttributeReference,
                Literal(p: UTF8String, StringType), _, _, _)
                if vg.resolved =>
              val name = VariantShred.shredName(p.toString)
              // descend to the subtree that PRODUCES the variant
              // attribute (through joins/aliases — exprIds are
              // preserved) so only ITS shred can substitute: row-
              // source identity is the contract, and each side of a
              // self-join resolves to its own copy
              @scala.annotation.tailrec
              def producer(pl: LogicalPlan): LogicalPlan =
                pl.children.find(_.outputSet.contains(a)) match {
                  case Some(c) => producer(c)
                  case None => pl
                }
              val cands = producer(node).output
                .filter(o => o.name == name && o.dataType == vg.dataType)
              cands match {
                // the producer's shred must still be VISIBLE in this
                // node's scope (an intermediate projection may have
                // dropped it — substituting then would dangle)
                case Seq(shred)
                    if inScope.exists(_.exprId == shred.exprId) => shred
                case _ => vg
              }
          }
        }
    }
}
