package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** MATERIALIZED-VIEW QUERY REWRITE — the optimizer half of incremental
  * view maintenance ([[graft.operators.Incremental]] keeps aggregate
  * state fresh; this rule makes queries USE it without the user knowing
  * the view exists). An aggregate over the registered base table whose
  * grouping keys are (expressions over) the view's keys and whose
  * aggregates all merge from the view's stored partial states is
  * rewritten to re-aggregate the view — at 100 TB that turns a full
  * fact-table scan into a scan of a group-count-sized parquet.
  *
  * Soundness is COMPILER-GRADE conservative; the rule rewrites only when
  * every piece maps, and otherwise returns the plan untouched:
  *  - the aggregate's child must destructure to alias-inlinable
  *    Project/Filter steps over a file-source relation whose root paths
  *    are a registered base (path identity, not names);
  *  - every grouping expression, filter conjunct, and non-aggregate
  *    subtree must — after replacing each subtree that is semantically
  *    equal to a view key's defining expression with the view's key
  *    column — reference only view columns (so a filter on a key, e.g.
  *    `event_type IN (...)` or `date_trunc('hour', ts) >= X`, rewrites;
  *    a filter on a non-key column vetoes the rewrite);
  *  - every AggregateExpression must match a registered mergeable
  *    template (count ↦ sum of stored counts, sum of an EXACT type ↦
  *    sum of stored partial sums, min/max ↦ min/max of stored bounds);
  *    DISTINCT and FILTER aggregates veto (their partials don't merge —
  *    the honest incremental form is a sketch);
  *  - the rewritten output must carry the original column-by-column
  *    dataTypes and exprIds, so parent operators never see the change.
  *
  * Exactness note: a view qualifies only if re-aggregating its partials
  * is BIT-IDENTICAL to aggregating the base — counts/longs/decimals
  * (associative) and min/max qualify; a double sum does not (regrouping
  * reorders the additions), which is why the events view stores its sum
  * as decimal. Template expressions are produced by the same analyzer
  * that will analyze user queries and are re-bound to each candidate
  * relation's attributes by name before semantic comparison.
  */
object AggRewriteRule extends Rule[LogicalPlan] {

  /** One registered view: the analyzed scan of the materialized parquet,
    * key columns with their defining expressions over the base relation
    * (template attribute names re-bound at match time), mergeable
    * aggregate templates (base aggregate function ↦ view column + merge
    * function over it), and the base's file-listing signature AS OF THE
    * VIEW BUILD — the staleness guard: a query whose base relation lists
    * different files (append, overwrite, compaction) must NOT be served
    * from the view, so a signature mismatch vetoes the rewrite and the
    * query falls back to the base scan. Serving stale data silently is
    * the one failure mode a rewrite rule can never have.
    */
  /** keys: (view column name, base-side template, view-side builder).
    * The builder turns the view column's attribute into the expression
    * that REPLACES a matched template — `identity` for the key itself,
    * or a derivation for functions of the key that compose through the
    * stored granularity (e.g. `date_trunc('day', ts)` over an hourly key
    * becomes `date_trunc('day', hour_ts)`: truncating hours to days IS
    * truncating raw timestamps to days, so coarser time hierarchies
    * serve from the finer view with no extra machinery downstream).
    */
  /** gen: when the view is defined over an EXPLODED base (the inverted
    * index: documents → explode(tokens(text)) → count per (term, doc)),
    * the template is the Generate's generator expression over base
    * columns and the view column holding the generator's output. A query
    * destructures through at most one matching non-outer Generate; its
    * generator-output references map to that view column. A query with
    * no Generate never matches a generated view (the view's rows are
    * per-ELEMENT, not per-row) and vice versa.
    */
  /** family: the view's logical identity within a base's registry —
    * re-registering the same family (a refresh's new generation, the
    * streaming-maintained copy) REPLACES the old spec, while a different
    * family (hourly vs per-type vs postings over one base) coexists and
    * competes at match time. Empty family falls back to the mv scan's
    * root path as the identity (legacy single-generation behavior).
    */
  final case class MvSpec(
      mvPlan: LogicalPlan,
      keys: Seq[(String, Expression, Attribute => Expression)],
      aggs: Seq[(AggregateFunction2, String, Attribute => AggregateFunction2)],
      baseSig: String,
      gen: Option[(Expression, String)] = None,
      family: String = "") {

    /** Replacement identity within one base's spec list. */
    private[plans] def identity: String =
      if (family.nonEmpty) family
      else mvPlan.collectFirst { case lr: LogicalRelation => lr }
        .flatMap(rootKey).getOrElse(toString)

    /** Serving cost proxy: the stored parquet bytes (in-memory FileIndex
      * metadata — no FS call, no job). Cells are fixed-width-ish rows, so
      * bytes order ≡ cell-count order, which is what "serve from the
      * cheapest qualifying view" needs.
      */
    private[plans] def storedBytes: Long =
      mvPlan.collectFirst { case lr: LogicalRelation => lr }
        .map(_.relation.sizeInBytes).getOrElse(Long.MaxValue)
  }

  // the catalyst class is named AggregateFunction; alias locally to keep
  // the public MvSpec signature readable next to AggregateExpression
  type AggregateFunction2 =
    org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction

  // one base table → MANY registered views (hourly + per-type + postings
  // can all summarize the same base); a query is matched against each and
  // served from the cheapest qualifying one
  private val registry = TrieMap.empty[String, Seq[MvSpec]]

  /** Canonical identity of a file-source relation: its sorted root paths. */
  private[graft] def rootKey(lr: LogicalRelation): Option[String] =
    lr.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.location.rootPaths.map(_.toString).sorted.mkString(";"))
      case _ => None
    }

  /** Content signature of a file-source relation: the sorted
    * (path, length, mtime) listing. The FileIndex caches its listing, so
    * this is an in-memory walk at optimization time, not an FS call; any
    * base mutation (append, overwrite, compaction) changes it.
    */
  private[graft] def fileSig(lr: LogicalRelation): Option[String] =
    lr.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.location.listFiles(Nil, Nil)
          .flatMap(_.files)
          .map(f => s"${f.getPath}:${f.getLen}:${f.getModificationTime}")
          .sorted.mkString("\n"))
      case _ => None
    }

  /** Register (or refresh) a view for a base relation and make sure the
    * rule itself is installed in the session's optimizer. A spec with the
    * same identity (family, or mv path when family is empty) replaces its
    * predecessor — a refresh generation supersedes, a different view over
    * the same base coexists.
    */
  def register(spark: SparkSession, baseKey: String, spec: MvSpec): Unit = {
    registry.synchronized {
      val prev = registry.getOrElse(baseKey, Nil)
      registry.put(baseKey,
        prev.filterNot(_.identity == spec.identity) :+ spec)
    }
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(AggRewriteRule))
      exp.extraOptimizations = exp.extraOptimizations :+ AggRewriteRule
  }

  private[graft] def registered(baseKey: String): Boolean =
    registry.get(baseKey).exists(_.nonEmpty)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transform {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** An Aggregate reduced to relation level: Project aliases inlined
    * into the grouping/aggregate expression copies, Filter conditions
    * collected (inlined the same way as the walk descends), and at most
    * one non-outer Generate recorded as (generator expression — itself
    * inlined as the walk passes Projects below it — and the generator's
    * output exprIds, which survive in g/a/fs as free references).
    */
  private[graft] final case class Destructured(
      rel: LogicalRelation, g: Seq[Expression], a: Seq[Expression],
      fs: Seq[Expression], gen: Option[(Expression, Seq[ExprId])] = None)

  private[graft] def destructure(agg: Aggregate): Option[Destructured] = {
    var g: Seq[Expression] = agg.groupingExpressions
    var a: Seq[Expression] = agg.aggregateExpressions
    var fs: Seq[Expression] = Nil
    var gen: Option[(Expression, Seq[ExprId])] = None
    var cur: LogicalPlan = agg.child
    while (true) cur match {
      case Project(pl, ch)
          if pl.forall(ne => ne.isInstanceOf[AttributeReference] ||
            ne.isInstanceOf[Alias]) =>
        val m: Map[ExprId, Expression] =
          pl.collect { case al: Alias => al.exprId -> al.child }.toMap
        def inline(e: Expression): Expression = e.transformUp {
          case ar: AttributeReference if m.contains(ar.exprId) => m(ar.exprId)
        }
        g = g.map(inline); a = a.map(inline); fs = fs.map(inline)
        gen = gen.map { case (e, ids) => (inline(e), ids) }
        cur = ch
      case Filter(cond, ch) =>
        fs = fs :+ cond
        cur = ch
      case gn: Generate if !gn.outer && gen.isEmpty =>
        gen = Some((gn.generator, gn.generatorOutput.map(_.exprId)))
        cur = gn.child
      // partitioning is semantics-free under an Aggregate: the scan-spread
      // (Tables.documents) plants a round-robin Repartition above the
      // relation, and walking through it keeps every documents-based
      // aggregate destructurable/MV-servable exactly as before
      case rp: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation =>
        cur = rp.child
      case lr: LogicalRelation =>
        return Some(Destructured(lr, g, a, fs, gen))
      case _ => return None
    }
    None // unreachable
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val d = destructure(agg).getOrElse(return None)
    val specs = rootKey(d.rel).flatMap(registry.get).getOrElse(return None)
    if (specs.isEmpty) return None
    // every registered view over this base gets a chance; serve from the
    // cheapest qualifying one (fewest stored bytes ≈ fewest cells), with
    // a deterministic identity tie-break so plans are stable run-to-run
    val sig = fileSig(d.rel)
    val candidates = specs.flatMap { spec =>
      rewriteWith(agg, d, spec, sig).map(p => (spec.storedBytes, spec.identity, p))
    }
    candidates.sortBy(c => (c._1, c._2)).headOption.map(_._3)
  }

  private def rewriteWith(agg: Aggregate, d: Destructured, spec: MvSpec,
                          sig: Option[String]): Option[LogicalPlan] = {
    val Destructured(rel, g, a, fs, dgen) = d

    // staleness guard: the query's base listing must be the one the view
    // was built from, or the view's contents no longer summarize the base
    if (!sig.contains(spec.baseSig)) return None

    // 2. fresh view-scan instance (new exprIds per use) + column lookup
    val mv = spec.mvPlan.transformUp {
      case lr: LogicalRelation => lr.newInstance()
    }
    val mvAttr: Map[String, Attribute] = mv.output.map(x => x.name -> x).toMap

    // 3. re-bind a template expression's attributes onto THIS relation's
    //    output by name (None if a name is absent)
    val relByName: Map[String, Attribute] = rel.output.map(x => x.name -> x).toMap
    def rebind(e: Expression): Option[Expression] = {
      var ok = true
      val r = e.transformUp {
        case ar: AttributeReference =>
          relByName.get(ar.name) match {
            case Some(x) => x
            case None => ok = false; ar
          }
      }
      if (ok) Some(r) else None
    }
    // generator alignment: a query exploding the same generator as the
    // view maps its generator-output references to the view's gen column;
    // a shape mismatch (either side has a Generate the other lacks, or a
    // different generator expression) vetoes — the view's rows are
    // per-ELEMENT, so nothing else is sound
    val genMap: Map[ExprId, Attribute] = (dgen, spec.gen) match {
      case (None, None) => Map.empty
      case (Some((ge, ids)), Some((tmpl, viewCol))) =>
        val bound = rebind(tmpl).getOrElse(return None)
        if (!bound.semanticEquals(ge)) return None
        val attr = mvAttr.getOrElse(viewCol, return None)
        ids.map(_ -> attr).toMap
      case _ => return None
    }

    val keyPairs: Seq[(Expression, Expression)] = for {
      (name, tmpl, build) <- spec.keys
      bound <- rebind(tmpl)
      attr <- mvAttr.get(name)
    } yield (bound, build(attr))
    val aggPairs: Seq[(Expression, AggregateFunction2)] = for {
      (tmpl, name, build) <- spec.aggs
      bound <- rebind(tmpl)
      attr <- mvAttr.get(name)
    } yield (bound, build(attr))

    // 4. map every AggregateExpression through a mergeable template;
    //    any unmapped aggregate (or DISTINCT / FILTER form) vetoes
    var failed = false
    def mapAggs(e: Expression): Expression = e.transformDown {
      case ae: AggregateExpression =>
        if (ae.isDistinct || ae.filter.isDefined) { failed = true; ae }
        else aggPairs.find(_._1.semanticEquals(ae.aggregateFunction)) match {
          case Some((_, merged)) => ae.copy(aggregateFunction = merged)
          case None => failed = true; ae
        }
    }
    // 5. replace each view-key-defining subtree with the view column
    //    (generator outputs first — they are free references, matched by
    //    exprId, not semantic equality)
    def substKeys(e: Expression): Expression = e.transformDown {
      case ar: AttributeReference if genMap.contains(ar.exprId) =>
        genMap(ar.exprId)
      case s if keyPairs.exists(_._1.semanticEquals(s)) =>
        keyPairs.find(_._1.semanticEquals(s)).get._2
    }
    val aNew = a.map(e => substKeys(mapAggs(e)))
    if (failed) return None
    val gNew = g.map(substKeys)
    val fNew = fs.map(substKeys)

    // 6. everything must now live on the view, with identical types
    val mvOut = mv.outputSet
    if (!(gNew ++ aNew ++ fNew).forall(_.references.subsetOf(mvOut))) return None
    if (a.zip(aNew).exists { case (o, n) => o.dataType != n.dataType }) return None

    // 7. reassemble, preserving the original output names, exprIds AND
    //    nullability so parents (sorts, projections, V2 writes — whose
    //    outputResolved checks nullability compatibility) resolve
    //    unchanged; prune the view scan to the referenced columns.
    //    Nullability can only WIDEN in a sound rewrite (parquet view
    //    columns are nullable, count↦sum turns non-null into nullable),
    //    and the widened value is provably the same non-null value the
    //    base plan produced, so KnownNotNull restores the contract.
    val aNamed: Seq[NamedExpression] = agg.aggregateExpressions.zip(aNew).map {
      case (orig, t: NamedExpression)
          if t.exprId == orig.exprId && t.nullable == orig.nullable => t
      case (orig, t) =>
        val body = t match { case al: Alias => al.child; case e => e }
        val fixed = if (!orig.nullable && body.nullable) KnownNotNull(body)
          else body
        Alias(fixed, orig.name)(exprId = orig.exprId)
    }
    var child: LogicalPlan = mv
    if (fNew.nonEmpty) child = Filter(fNew.reduce(And), child)
    val needed = mv.output.filter(
      (gNew ++ aNew).flatMap(_.references).toSet)
    if (needed.size < mv.output.size) child = Project(needed, child)
    Some(Aggregate(gNew, aNamed, child))
  }
}
