package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StringType

/** Layout-aware partition-predicate injection — the (c) rung of the
  * custom-operator ladder as an OPTIMIZER RULE: a user filtering the
  * letter-partitioned index by `term` should not have to know the layout
  * to get partition pruning. For every top-level `term = 'lit'` /
  * `term IN (...)` conjunct over the index scan, the rule conjoins the
  * implied `first_letter` predicate, which FileSourceStrategy then turns
  * into real partition pruning (directories never listed — the
  * reference's `./index/<c>` file-seek,
  * `/root/reference/helper_reduce.c:238`, recovered automatically).
  *
  * Soundness: `first_letter = substr(term, 1, 1)` is an invariant of
  * [[graft.operators.Indexer.writeIndex]]'s layout; the injected letter
  * set is the UNION over equality conjuncts (a superset of the feasible
  * letters, so never filters a valid row); nothing is extracted from
  * under OR / NOT. The rule is ANCHORED to the physical layout, not to
  * column names: it matches only when the filtered `term` attribute is —
  * by exprId — an unmodified output of a leaf file-source relation that
  * is actually partitioned by `first_letter` and carries the full index
  * schema. A plan that merely has columns NAMED like the index (or one
  * where `term` was recomputed, e.g. `withColumn("term", upper($"term"))`
  * — a fresh exprId under an Alias) can never fire the rule. The
  * already-references-first_letter guard (checked against the SAME
  * relation's attribute) makes the rule idempotent under fixed-point
  * batches.
  */
object LetterPruningRule extends Rule[LogicalPlan] {

  private val indexCols = Set("first_letter", "term", "doc_id", "tf")

  /** `(term, first_letter)` attribute pairs of pristine index scans under
    * `plan`: leaf file-source relations genuinely partitioned by
    * `first_letter` whose output carries the full index layout. Attribute
    * identity (exprId) survives pass-through Project/Aggregate but NOT
    * recomputation, which is exactly the provenance guarantee the
    * injected predicate needs. Subtrees under a Union are SKIPPED
    * entirely: Union reuses its first child's exprIds, so an exprId match
    * through a Union would anchor the invariant to rows that may come
    * from the OTHER children, where first_letter = substr(term, 1, 1)
    * need not hold.
    */
  private def indexScanPairs(plan: LogicalPlan): Seq[(Attribute, Attribute)] =
    plan match {
      case _: Union => Seq.empty
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation
              if fs.partitionSchema.fieldNames.contains("first_letter") &&
                indexCols.subsetOf(lr.output.map(_.name).toSet) =>
            (for {
              t <- lr.output.find(a => a.name == "term" && a.dataType == StringType)
              l <- lr.output.find(a => a.name == "first_letter" && a.dataType == StringType)
            } yield (t, l)).toSeq
          case _ => Seq.empty
        }
      case other => other.children.flatMap(indexScanPairs)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val pairs = indexScanPairs(child).filter { case (t, l) =>
        child.outputSet.contains(t) && child.outputSet.contains(l) &&
          !cond.references.contains(l)
      }
      val preds = pairs.flatMap { case (t, l) =>
        val letters = termEqualityLetters(cond, t)
        if (letters.isEmpty) None
        else if (letters.size == 1) Some(EqualTo(l, Literal(letters.head)))
        else Some(In(l, letters.toSeq.sorted.map(Literal(_))))
      }
      if (preds.isEmpty) f
      else Filter(And(cond, preds.reduce(And)), child)
  }

  /** First letters implied by equality conjuncts on THIS scan's `term`
    * attribute (exprId match, not name match). Only TOP-LEVEL AND is
    * split; In-list letters union (sound — any row matching the conjunct
    * has its letter in the set).
    */
  private def termEqualityLetters(cond: Expression, term: Attribute): Set[String] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    def lit(e: Expression): Option[String] = e match {
      case Literal(s, StringType) if s != null => Some(s.toString)
      case _ => None
    }
    def isTerm(e: Expression): Boolean = e match {
      case a: AttributeReference => a.exprId == term.exprId
      case _ => false
    }
    // first CODE POINT, not first UTF-16 code unit: the indexer writes
    // first_letter via Spark substring(term, 1, 1), which is code-point
    // based — String.take(1) on a non-BMP term would inject a lone
    // surrogate matching no partition and silently drop valid rows
    def firstCp(s: String): String =
      if (s.isEmpty) "" else s.substring(0, s.offsetByCodePoints(0, 1))
    conjuncts(cond).flatMap {
      case EqualTo(a, l) if isTerm(a) => lit(l).map(firstCp).filter(_.nonEmpty).toSeq
      case EqualTo(l, a) if isTerm(a) => lit(l).map(firstCp).filter(_.nonEmpty).toSeq
      case In(a, elems) if isTerm(a) && elems.nonEmpty && elems.forall(lit(_).isDefined) =>
        // if ANY element's letter is unrepresentable (empty string), this
        // conjunct must contribute NOTHING — injecting the remaining
        // letters would wrongly filter a term = '' row
        val letters = elems.flatMap(e => lit(e).map(firstCp))
        if (letters.exists(_.isEmpty)) Seq.empty else letters
      case _ => Seq.empty
    }.toSet
  }
}
