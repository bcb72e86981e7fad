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
  * Soundness contract — WRITER-BOUND, not name-bound (round 18): the
  * rule substitutes only when the written schema's METADATA proves
  * the identity, never on the `_shred_` name alone. Required:
  *
  *  (a) the accessor's path is a literal;
  *  (b) the VARIANT attribute itself carries the writer's shredded
  *      marker naming the path ([[VariantShred.MarkerKey]] — set by
  *      the commit staging pass, carried by the committed schema into
  *      every read). A frame that RE-DERIVES the variant
  *      (`withColumn("v", transform(v))`) mints a fresh attribute with
  *      EMPTY metadata, so stale pre-transform shreds in the same
  *      scope can never substitute; a user-minted
  *      `withColumn("_shred_k", ...)` has no binding metadata and is
  *      never a candidate;
  *  (c) the candidate's binding metadata names THIS variant column
  *      and THIS path ([[VariantShred.ShredOfKey]] /
  *      [[VariantShred.ShredPathKey]]);
  *  (d) the candidate comes from the SAME child subtree that produces
  *      the variant attribute (a join of two shredded tables — or a
  *      self-join — must never serve one side's shred for the other's
  *      rows) and is UNIQUE there;
  *  (e) it is still VISIBLE in this node's scope;
  *  (f) its type equals the accessor's target type.
  *
  * Anything else leaves the expression untouched — the live variant
  * walk is always correct, just slower.
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
              val pathStr = p.toString
              // (b) writer's marker on the variant attribute itself —
              // the proof this is the column the shreds were computed
              // from, not a later re-derivation of it
              val markerOk = a.metadata.contains(VariantShred.MarkerKey) &&
                a.metadata.getString(VariantShred.MarkerKey)
                  .split(";").contains(pathStr)
              if (!markerOk) vg
              else {
                // (d) descend to the subtree that PRODUCES the variant
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
                // (c) + (f): binding metadata names this variant
                // column and path, type matches the accessor's target
                val cands = producer(node).output.filter { o =>
                  o.dataType == vg.dataType &&
                    o.metadata.contains(VariantShred.ShredOfKey) &&
                    // BOTH binding keys must be present — a column
                    // carrying only one (foreign metadata, a partial
                    // copy) is simply not a candidate; the rule's
                    // contract is to leave expressions untouched, not
                    // to throw during analysis
                    o.metadata.contains(VariantShred.ShredPathKey) &&
                    o.metadata.getString(VariantShred.ShredOfKey) == a.name &&
                    o.metadata.getString(VariantShred.ShredPathKey) == pathStr
                }
                cands match {
                  // (e) the producer's shred must still be VISIBLE in
                  // this node's scope (an intermediate projection may
                  // have dropped it — substituting then would dangle)
                  case Seq(shred)
                      if inScope.exists(_.exprId == shred.exprId) => shred
                  case _ => vg
                }
              }
          }
        }
    }
}
