package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.annotation.tailrec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** Registry of published summary views for [[MvRewrite]] — the
  * warehouse's materialized-view catalog (the reference precomputes
  * `game_neighbors` and serves reads from the precompute,
  * `definitions/game_neighbors.sqlx:16`; BigQuery/Snowflake generalize
  * that into transparent MV routing, re-expressed here as a Catalyst
  * rule over the versioned [[graft.operators.TableStore]]).
  *
  * An entry maps ONE committed base version's data directory to the
  * view that aggregates exactly that version. Keying by the version
  * dir is the freshness guard: a query over any other version (newer
  * publish, older pin) misses the registry and falls back to the base
  * scan, so the rewrite can never serve stale or future data. Views
  * are kept current by the IVM machinery ([[graft.operators.Ivm]]
  * `applyDelta` — O(changes) per publish, gated by `i3`), after which
  * [[register]] re-points the new version at the new view: maintenance
  * at write time, routing at read time, never an O(table) recompute on
  * either path.
  */
object MvCatalog {

  /** @param sumCols base column -> view decimal-sum column; sound only
    *                for the exact-decimal sum pattern (see
    *                [[MvRewrite]] soundness notes)
    * @param predicate SQL text of the base predicate this view
    *                  aggregated under (a PARTIAL view: `agg(σ_p
    *                  base)`); None = the full base. A query routes
    *                  only if its own filter CONTAINS p — every
    *                  predicate conjunct of the view must match a
    *                  query conjunct semantically, and only the
    *                  leftover conjuncts (which must sit on grouping
    *                  columns) survive as the view-side residual.
    */
  final case class MvDef(
      baseDir: String,
      viewPath: String,
      groupCols: Seq[String],
      sumCols: Map[String, String],
      minCols: Map[String, String],
      maxCols: Map[String, String],
      predicate: Option[String] = None)

  // several views may cover one base version (a fine-grained rollup
  // source plus coarser pre-rollups); lookup returns all of them and
  // the rule picks the coarsest that covers the query
  private val defs = new ConcurrentHashMap[String, List[MvDef]]()

  private[plans] def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Root data dirs of the file relations a DataFrame reads. */
  private def rootDirs(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.map(p => normalize(p.toString))
        case _ => Nil
      }
    }.flatten

  /** Register `viewPath` (the [[graft.operators.Ivm.aggregate]] /
    * `aggregateWithExtrema` shape: `groupCols..., n, sum_<c>...,
    * min_<c>..., max_<c>...`) as covering version `version` of the
    * TableStore at `basePath`. The covered data dir is resolved
    * through `readVersion`, so CAS-pointer commits key correctly.
    */
  def register(spark: SparkSession, basePath: String, version: Long,
      viewPath: String, groupCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      predicate: Option[String] = None): Unit = {
    val base = graft.operators.TableStore.readVersion(spark, basePath, Some(version))
    val dirs = rootDirs(base)
    require(dirs.size == 1,
      s"MV base must read exactly one data dir, got: $dirs")
    val d = MvDef(dirs.head, viewPath, groupCols,
      sumCols.map(c => c -> s"sum_$c").toMap,
      minCols.map(c => c -> s"min_$c").toMap,
      maxCols.map(c => c -> s"max_$c").toMap,
      predicate)
    defs.merge(dirs.head, List(d),
      (old, add) => add ::: old.filterNot(_.viewPath == d.viewPath))
  }

  /** All views covering `dir`, COARSEST first (fewest grouping
    * columns = fewest rows under any dimension cardinality — the
    * cost-based preference when several candidates cover a query).
    */
  def lookup(dir: String): Seq[MvDef] =
    Option(defs.get(dir)).getOrElse(Nil).sortBy(_.groupCols.size)

  /** A materialized JOIN view: the raw (multiset-exact) inner
    * equi-join of two covered base versions, stored expanded — the
    * denormalization MV. Keyed by BOTH sides' version data dirs, so
    * freshness is version-exact on both tables at once.
    *
    * @param keys join key column names (shared by both sides; all
    *             other column names must be disjoint — enforced at
    *             [[registerJoin]])
    */
  final case class JoinDef(dirLeft: String, dirRight: String,
      viewPath: String, keys: Set[String])

  private val joinDefs = new ConcurrentHashMap[(String, String), JoinDef]()

  private def oneDir(spark: SparkSession, basePath: String,
      version: Long): String = {
    val dirs = rootDirs(
      graft.operators.TableStore.readVersion(spark, basePath, Some(version)))
    require(dirs.size == 1,
      s"MV base must read exactly one data dir, got: $dirs")
    dirs.head
  }

  /** Register `viewPath` (the expanded `A JOIN B USING keys` result —
    * key columns once, then both sides' payloads) as covering
    * (`basePathA`@`versionA`) ⋈ (`basePathB`@`versionB`).
    */
  def registerJoin(spark: SparkSession,
      basePathA: String, versionA: Long,
      basePathB: String, versionB: Long,
      viewPath: String, keys: Seq[String]): Unit = {
    val a = graft.operators.TableStore.readVersion(spark, basePathA, Some(versionA))
    val b = graft.operators.TableStore.readVersion(spark, basePathB, Some(versionB))
    val shared = (a.columns.toSet & b.columns.toSet) -- keys
    require(shared.isEmpty,
      s"non-key column names must be disjoint across the join MV's sides: $shared")
    val dirA = oneDir(spark, basePathA, versionA)
    val dirB = oneDir(spark, basePathB, versionB)
    joinDefs.put((dirA, dirB), JoinDef(dirA, dirB, viewPath, keys.toSet))
  }

  def lookupJoin(dirLeft: String, dirRight: String): Option[JoinDef] =
    Option(joinDefs.get((dirLeft, dirRight)))
      .orElse(Option(joinDefs.get((dirRight, dirLeft))))

  def isEmpty: Boolean = defs.isEmpty && joinDefs.isEmpty
  def clear(): Unit = { defs.clear(); joinDefs.clear() }

  // ------------------------------------------------------ persistence

  /** The catalog's one-table schema: one row per registered view,
    * both kinds flattened — the on-disk registry a warehouse keeps
    * beside its tables. Maps serialize as "k=v" entry arrays (plain
    * Row IO: the registry is tiny and schema-stable).
    */
  private val CatSchema = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("dir_left", StringType, nullable = false),
    StructField("dir_right", StringType, nullable = false),
    StructField("view_path", StringType, nullable = false),
    StructField("group_cols", ArrayType(StringType), nullable = false),
    StructField("sum_cols", ArrayType(StringType), nullable = false),
    StructField("min_cols", ArrayType(StringType), nullable = false),
    StructField("max_cols", ArrayType(StringType), nullable = false),
    StructField("keys", ArrayType(StringType), nullable = false),
    StructField("pred", StringType, nullable = false)))

  private def packMap(m: Map[String, String]): Seq[String] =
    m.toSeq.sorted.map { case (k, v) => s"$k=$v" }
  private def unpackMap(s: Seq[String]): Map[String, String] =
    s.map { e =>
      val i = e.indexOf('=')
      e.substring(0, i) -> e.substring(i + 1)
    }.toMap

  /** Persist the registry as one small parquet table (overwrite —
    * the catalog is a snapshot, not a log).
    */
  def save(spark: SparkSession, path: String): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    val aggRows = defs.values.asScala.flatten.map(d =>
      Row("agg", d.baseDir, "", d.viewPath, d.groupCols, packMap(d.sumCols),
        packMap(d.minCols), packMap(d.maxCols), Seq.empty[String],
        d.predicate.getOrElse(""))).toSeq
    val joinRows = joinDefs.values.asScala.map(j =>
      Row("join", j.dirLeft, j.dirRight, j.viewPath, Seq.empty[String],
        Seq.empty[String], Seq.empty[String], Seq.empty[String],
        j.keys.toSeq, "")).toSeq
    graft.operators.TableStore.overwrite(
      spark.createDataFrame((aggRows ++ joinRows).asJava, CatSchema), path)
  }

  /** Load a saved registry, REPLACING the in-memory one (a restart,
    * not a merge). Registered dirs are stored normalized, so routing
    * resumes exactly where the saving process left it.
    */
  def load(spark: SparkSession, path: String): Unit = {
    val rows = spark.read.parquet(path).collect()
    clear()
    rows.foreach { r =>
      def strs(i: Int): Seq[String] = r.getSeq[String](i)
      r.getString(0) match {
        case "agg" =>
          val vp = r.getString(3)
          defs.merge(r.getString(1),
            List(MvDef(r.getString(1), vp, strs(4), unpackMap(strs(5)),
              unpackMap(strs(6)), unpackMap(strs(7)),
              Option(r.getString(9)).filter(_.nonEmpty))),
            (old, add) => add ::: old.filterNot(_.viewPath == vp))
        case "join" =>
          joinDefs.put((r.getString(1), r.getString(2)),
            JoinDef(r.getString(1), r.getString(2), r.getString(3),
              strs(8).toSet)): Unit
        case other => sys.error(s"unknown MV catalog row kind: $other")
      }
    }
  }
}

/** Optimizer rule: route an aggregate over a registered base-table
  * version to its published summary view —
  *
  *   `Aggregate(G, aggs, [Filter(p)] [Project] Scan(base@v))`
  *     ==>  `Aggregate(G, aggs', [Filter(p')] Scan(view))`
  *
  * when the view groups by `K ⊇ G` (G = K is the direct hit; G ⊂ K is
  * the classic summary-table ROLLUP derivation — re-aggregating the
  * view's partial groups) and every aggregate is derivable from the
  * view columns:
  *
  *   - `count(1)`/`count(*)`       -> `coalesce(sum(n), 0)` — the
  *     coalesce keeps the global-grouping-over-empty-table case
  *     returning 0, as count does
  *   - `sum(cast(c as decimal(30,2)))` -> `sum(sum_c)` — ONLY the
  *     exact-decimal house pattern ([[graft.queries.dsum]]) rewrites:
  *     decimal partial sums reassociate exactly, so view-then-total
  *     equals direct-total to the bit. A plain `sum(double)` must NOT
  *     route (float addition order would change the low bits — the
  *     rewrite would alter results), so it is left untouched.
  *   - `min(c)` / `max(c)`         -> `min(min_c)` / `max(max_c)`
  *     when the view stores extrema (min of group minima == min)
  *
  * A residual filter may sit between the aggregate and the scan iff it
  * is deterministic and references only view GROUPING columns: all
  * base rows of one view group share those values, so filtering the
  * view's group rows partitions base rows identically (a predicate on
  * a non-grouping column would need row-level data the view no longer
  * has — no rewrite). Grouping attrs keep their `exprId`s through
  * re-aliasing and every rewritten aggregate preserves its result
  * type, so parent operators (HAVING filters, sorts, projections)
  * resolve unchanged.
  *
  * The 100 TB story: the base scan this removes is the whole table;
  * the view is |groups| rows. Freshness is version-exact by
  * construction (see [[MvCatalog]]) and the view itself is maintained
  * incrementally, so the end-to-end cost of "publish a batch, query
  * the aggregate" is O(changes) + O(groups touched) — never O(table).
  * `s31_mv_rewrite` / `s32_mv_maintain_requery` gate the semantics
  * against the DuckDB oracle (with an in-query guard that fails loudly
  * if the plan did NOT route through the view); `MvRewriteSpec` pins
  * the plan shape and the refusal cases.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) — runs inside the operator-optimization
  * fixed point, so the spliced view subtree is itself column-pruned
  * and filter-pushed by the surrounding batch.
  */
object MvRewrite {
  /** Idempotently install the rule on a session that was not built
    * with `spark.sql.extensions` (the catalog-query path — same
    * discipline as [[BandJoinRewrite]]'s installs).
    */
  def ensure(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[MvRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new MvRewrite(spark)

  /** Loud in-query proof that the rule actually routed: the optimized
    * plan must scan under `viewPath` and must NOT scan under any
    * `forbidden` root — a silently-dead rule turns the gate row red
    * instead of degrading to a table scan.
    */
  def assertRouted(df: DataFrame, viewPath: String,
      forbidden: Seq[String], tag: String): Unit = {
    val dirs = df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.map(p => MvCatalog.normalize(p.toString))
        case _ => Nil
      }
    }.flatten
    require(dirs.exists(_.startsWith(viewPath)),
      s"$tag: MV rewrite did not fire — scans: $dirs")
    forbidden.foreach(b => require(!dirs.exists(_.startsWith(b)),
      s"$tag: base table still scanned alongside the view: $dirs"))
  }
}

class MvRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvCatalog.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
      // the optimizer's usual shape is Project over Join (column
      // pruning / USING-dedup) — matching it keeps the view scan
      // pruned to the projected columns
      case p @ Project(plist, j: Join) =>
        rewriteJoin(j, Some(plist)).getOrElse(p)
      case j: Join => rewriteJoin(j, None).getOrElse(j)
    }

  @tailrec
  private def peel(p: LogicalPlan, cond: Option[Expression])
      : Option[(LogicalRelation, Option[Expression])] = p match {
    case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
      Some((lr, cond))
    case proj: Project
        if proj.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      peel(proj.child, cond)
    case f: Filter if f.condition.deterministic =>
      peel(f.child, Some(cond.map(And(_, f.condition)).getOrElse(f.condition)))
    case _ => None
  }

  /** Route `[Project] (A@v ⋈_keys B@w)` to the registered expanded
    * join view. Soundness:
    *
    *   - INNER joins only, condition EXACTLY the registered key
    *     equalities (an extra theta conjunct would need row pairs the
    *     view pre-filtered away — refuse);
    *   - side filters below the join hoist above the view:
    *     `σ_p(A) ⋈ B = σ_p(A ⋈ B)` for inner joins because p
    *     references one side's columns, which survive expansion;
    *   - both sides' relations must match their covered version dirs
    *     (two-table freshness guard, same keying as the aggregate
    *     path);
    *   - every replaced output attribute re-aliases a view column
    *     under its ORIGINAL exprId — the USING-dedup'd key, both
    *     sides' payloads, and computed projections all resolve
    *     unchanged upstream. The duplicated key attr of the raw Join
    *     output (a.k, b.k) maps both names to the one view key column,
    *     exact because the inner equi-join guarantees equality.
    */
  private def rewriteJoin(j: Join, plist: Option[Seq[NamedExpression]])
      : Option[LogicalPlan] = {
    if (j.joinType != org.apache.spark.sql.catalyst.plans.Inner) return None
    val cond = j.condition.getOrElse(return None)
    for {
      (relL, condL) <- peel(j.left, None)
      (relR, condR) <- peel(j.right, None)
      dirL <- singleDir(relL)
      dirR <- singleDir(relR)
      jd <- MvCatalog.lookupJoin(dirL, dirR)
      equated <- keyEqualities(cond, j.left, j.right)
      if equated == jd.keys
      out <- buildJoin(j, plist, condL, condR, jd)
    } yield out
  }

  /** The names equated by a pure conjunction of cross-side
    * `EqualTo(attr, attr)` conjuncts with matching names — None if any
    * conjunct is anything else.
    */
  private def keyEqualities(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Set[String]] = {
    val conjuncts = splitConjuncts(cond)
    val names = conjuncts.map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name == b.name &&
            ((left.outputSet.contains(a) && right.outputSet.contains(b)) ||
              (left.outputSet.contains(b) && right.outputSet.contains(a))) =>
        Some(a.name)
      case _ => None
    }
    if (names.forall(_.isDefined)) Some(names.flatten.toSet) else None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def singleDir(lr: LogicalRelation): Option[String] = {
    val dirs = lr.relation.asInstanceOf[HadoopFsRelation]
      .location.rootPaths.map(p => MvCatalog.normalize(p.toString))
    if (dirs.size == 1) Some(dirs.head) else None
  }

  private def buildJoin(j: Join, plist: Option[Seq[NamedExpression]],
      condL: Option[Expression], condR: Option[Expression],
      jd: MvCatalog.JoinDef): Option[LogicalPlan] = {
    val viewPlan = session.read.parquet(jd.viewPath).queryExecution.analyzed
    val vAttr: Map[String, AttributeReference] =
      viewPlan.output.collect { case a: AttributeReference => a.name -> a }.toMap

    def mapped(e: Expression): Option[Expression] = e match {
      case a: AttributeReference =>
        vAttr.get(a.name).filter(_.dataType == a.dataType)
      case _ =>
        val kids = e.children.map(mapped)
        if (kids.exists(_.isEmpty)) None
        else Some(e.withNewChildren(kids.map(_.get)))
    }

    val hoisted = Seq(condL, condR).flatten
    val hoistedMapped = hoisted.map(mapped)
    if (hoistedMapped.exists(_.isEmpty)) return None
    val child = hoistedMapped.flatten
      .reduceOption(And)
      .map(Filter(_, viewPlan))
      .getOrElse(viewPlan)

    val outExprs: Seq[NamedExpression] =
      plist.getOrElse(j.output.map(a => a: NamedExpression))
    val mappedOut = outExprs.map {
      case a: AttributeReference =>
        mapped(a).map(m => Alias(m, a.name)(exprId = a.exprId))
      case al: Alias =>
        mapped(al.child).map(nc =>
          Alias(nc, al.name)(exprId = al.exprId, qualifier = al.qualifier))
      case _ => None
    }
    if (mappedOut.exists(_.isEmpty)) return None
    val newOut = mappedOut.map(_.get)
    val origOut = plist.map(_.map(_.toAttribute)).getOrElse(j.output)
    if (origOut.map(_.dataType) != newOut.map(_.dataType)) return None
    Some(Project(newOut, child))
  }

  private def rewrite(agg: Aggregate): Option[Aggregate] =
    peel(agg.child, None).flatMap { case (lr, cond) =>
      singleDir(lr).flatMap { dir =>
        // coarsest covering candidate wins (lookup pre-sorts)
        MvCatalog.lookup(dir).view.flatMap { mv =>
          groupingNames(agg, mv).flatMap { gn =>
            residualAfter(cond, mv, lr).flatMap { residual =>
              if (residual.forall(c => c.references.forall(a =>
                mv.groupCols.contains(a.name))))
                build(agg, residual, mv, gn)
              else None
            }
          }
        }.headOption
      }
    }

  /** PARTIAL-view containment: a view registered over `σ_p(base)`
    * serves a query iff the query's own filter CONTAINS p — every
    * predicate conjunct matches a query conjunct semantically
    * (resolved against the same relation attributes, compared
    * canonicalized) — and returns the LEFTOVER query conjuncts as the
    * view-side residual. Inferred `IsNotNull(a)` leftovers are
    * dropped when a matched null-rejecting comparison already
    * constrains `a` (the optimizer adds them FROM that conjunct, and
    * every σ_p row satisfies it). A full view (no predicate) passes
    * the whole filter through unchanged.
    */
  private def residualAfter(cond: Option[Expression], mv: MvCatalog.MvDef,
      lr: LogicalRelation): Option[Option[Expression]] = mv.predicate match {
    case None => Some(cond)
    case Some(pSql) =>
      val attrByName = lr.output.map(a => a.name -> a).toMap
      val parsed =
        try session.sessionState.sqlParser.parseExpression(pSql)
        catch { case scala.util.control.NonFatal(_) => return None }
      var resolvable = true
      val resolved = parsed.transformUp {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          attrByName.get(u.nameParts.last) match {
            case Some(a) => a
            case None => resolvable = false; u
          }
      }
      if (!resolvable) return None
      val pcs = splitConjuncts(resolved)
      var remaining = cond.map(splitConjuncts).getOrElse(Nil)
      val matched = scala.collection.mutable.ArrayBuffer.empty[Expression]
      val allFound = pcs.forall { pc =>
        remaining.indexWhere(_.semanticEquals(pc)) match {
          case -1 => false
          case i =>
            matched += remaining(i)
            remaining = remaining.patch(i, Nil, 1)
            true
        }
      }
      if (!allFound) None
      else {
        def nullRejecting(e: Expression, a: AttributeReference): Boolean =
          e match {
            case Not(inner) => nullRejecting(inner, a)
            case b: BinaryComparison => b.references.contains(a)
            case _ => false
          }
        val kept = remaining.filterNot {
          case IsNotNull(a: AttributeReference) =>
            matched.exists(m => nullRejecting(m, a))
          case _ => false
        }
        Some(kept.reduceOption(And))
      }
  }

  /** Query grouping must be plain attributes covered by the view's
    * grouping key (equality or rollup).
    */
  private def groupingNames(agg: Aggregate, mv: MvCatalog.MvDef)
      : Option[Set[String]] = {
    val attrs = agg.groupingExpressions.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) => Some(a.name)
      case _ => None
    }
    if (attrs.forall(_.isDefined)) Some(attrs.flatten.toSet) else None
  }

  private def build(agg: Aggregate, cond: Option[Expression],
      mv: MvCatalog.MvDef, groupNames: Set[String]): Option[Aggregate] = {
    // fresh exprIds per splice: two rewrites in one plan must not share
    val viewPlan = session.read.parquet(mv.viewPath).queryExecution.analyzed
    val vAttr: Map[String, AttributeReference] =
      viewPlan.output.collect { case a: AttributeReference => a.name -> a }.toMap
    // the view must actually carry every column the mapping promises
    if (!mv.groupCols.forall(vAttr.contains) || !vAttr.contains("n") ||
      !(mv.sumCols.values ++ mv.minCols.values ++ mv.maxCols.values)
        .forall(vAttr.contains)) return None

    def mapAgg(ae: AggregateExpression): Option[Expression] = ae match {
      case AggregateExpression(f, Complete, false, None, _) => f match {
        case Count(Seq(l: Literal)) if l.value != null =>
          Some(KnownNotNull(Coalesce(Seq(
            ae.copy(aggregateFunction = new Sum(vAttr("n"))),
            Literal(0L)))))
        case Sum(Cast(a: AttributeReference, dt: DecimalType, _, _), _)
            if dt.precision == 30 && dt.scale == 2 &&
              mv.sumCols.contains(a.name) =>
          Some(ae.copy(aggregateFunction = new Sum(vAttr(mv.sumCols(a.name)))))
        case Min(a: AttributeReference) if mv.minCols.contains(a.name) =>
          Some(ae.copy(aggregateFunction = Min(vAttr(mv.minCols(a.name)))))
        case Max(a: AttributeReference) if mv.maxCols.contains(a.name) =>
          Some(ae.copy(aggregateFunction = Max(vAttr(mv.maxCols(a.name)))))
        case _ => None
      }
      case _ => None
    }

    def mapExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => mapAgg(ae)
      case a: AttributeReference if groupNames.contains(a.name) =>
        Some(vAttr(a.name))
      case a: AttributeReference => None // non-grouping base ref
      case _ =>
        val kids = e.children.map(mapExpr)
        if (kids.exists(_.isEmpty)) None
        else Some(e.withNewChildren(kids.map(_.get)))
    }

    val mapped = agg.aggregateExpressions.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Some(Alias(vAttr(a.name), a.name)(exprId = a.exprId))
      case al: Alias =>
        mapExpr(al.child).map(nc =>
          Alias(nc, al.name)(exprId = al.exprId, qualifier = al.qualifier))
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) return None
    val newAggExprs = mapped.map(_.get)
    // result types must be bit-compatible or the rewrite is unsound
    if (agg.output.map(_.dataType) != newAggExprs.map(_.dataType)) return None

    val child = cond match {
      case Some(c) =>
        Filter(c.transform { case a: AttributeReference => vAttr(a.name) },
          viewPlan)
      case None => viewPlan
    }
    val newGrouping = agg.groupingExpressions.map {
      case a: AttributeReference => vAttr(a.name)
    }
    Some(Aggregate(newGrouping, newAggExprs, child))
  }
}
