package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Layout-aware partition-predicate injection — the (c) rung of the
  * custom-operator ladder as an OPTIMIZER RULE: a user filtering the
  * letter-partitioned index by `term` should not have to know the layout
  * to get partition pruning. For every top-level `term = 'lit'` /
  * `term IN (...)` conjunct over a relation carrying the index schema,
  * the rule conjoins the implied `first_letter` predicate, which
  * FileSourceStrategy then turns into real partition pruning (directories
  * never listed — the reference's `./index/<c>` file-seek,
  * `/root/reference/helper_reduce.c:238`, recovered automatically).
  *
  * Soundness: `first_letter = substr(term, 1, 1)` is an invariant of
  * [[graft.operators.Indexer.writeIndex]]'s layout, the injected letter
  * set is the UNION over equality conjuncts (a superset of the feasible
  * letters, so never filters a valid row), and nothing is extracted from
  * under OR / NOT. The already-references-first_letter guard makes the
  * rule idempotent under fixed-point batches.
  */
object LetterPruningRule extends Rule[LogicalPlan] {

  private val indexCols = Set("first_letter", "term", "doc_id", "tf")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child)
        if indexCols.subsetOf(child.output.map(_.name).toSet) &&
          !cond.references.exists(_.name == "first_letter") =>
      val letters = termEqualityLetters(cond)
      if (letters.isEmpty) f
      else {
        val la = child.output.find(_.name == "first_letter").get
        val pred =
          if (letters.size == 1) EqualTo(la, Literal(letters.head))
          else In(la, letters.toSeq.sorted.map(Literal(_)))
        Filter(And(cond, pred), child)
      }
  }

  /** First letters implied by `term`-equality conjuncts. Only TOP-LEVEL
    * AND is split; In-list letters union (sound — any row matching the
    * conjunct has its letter in the set).
    */
  private def termEqualityLetters(cond: Expression): Set[String] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    def lit(e: Expression): Option[String] = e match {
      case Literal(s, StringType) if s != null => Some(s.toString)
      case _ => None
    }
    def isTerm(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == "term"
      case _ => false
    }
    conjuncts(cond).flatMap {
      case EqualTo(a, l) if isTerm(a) => lit(l).map(_.take(1)).filter(_.nonEmpty).toSeq
      case EqualTo(l, a) if isTerm(a) => lit(l).map(_.take(1)).filter(_.nonEmpty).toSeq
      case In(a, elems) if isTerm(a) && elems.nonEmpty && elems.forall(lit(_).isDefined) =>
        elems.flatMap(e => lit(e).map(_.take(1)).filter(_.nonEmpty))
      case _ => Seq.empty
    }.toSet
  }
}
