package graft.plans

import graft.merge.Scd1Merge
import graft.pipeline.IncrementalAgg.AggSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Coalesce, Divide, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Transparent MATERIALIZED-VIEW REWRITE for incrementally-maintained
  * aggregates ([[graft.pipeline.IncrementalAgg]]): a query that
  * aggregates the 100 TB BASE table is answered from the MV-sized
  * aggregate table instead — the classic warehouse rewrite (Oracle
  * QUERY REWRITE / BigQuery smart-tuning), done the Spark way as an
  * optimizer [[Rule]] so the USER'S QUERY TEXT NEVER CHANGES. The
  * reference has no equivalent: its gold notebooks re-aggregate the
  * full silver table every run (gold_fact.py:12) AND every dashboard
  * query re-reads gold; here the maintenance is O(delta)
  * (IncrementalAgg) and the read is O(groups).
  *
  * Soundness gates — the rewrite fires ONLY when ALL hold, and every
  * failure is a silent fall-through to the base plan (a rewrite is an
  * optimization, never a semantic):
  *
  *  - SHAPE: `Aggregate(groups, aggs, Project(attrs)* over a single
  *    parquet scan)` with NO Filter between aggregate and scan, every
  *    projection a bare attribute (no computed or renamed columns —
  *    a value-preserving pass-through only), and every group
  *    expression a bare attribute of the registered MV's group
  *    columns. Output expressions may wrap the aggregates arbitrarily
  *    (`round(avg(x), 4)`, `sum(a) + count(*)` — CollapseProject
  *    folds post-aggregation projections into the Aggregate node),
  *    but every AggregateExpression inside them must be one of
  *    `sum(measure)`, `count(*)`/`count(1)`, or `avg(measure)` — no
  *    DISTINCT, no FILTER clauses — and every bare column a group
  *    column. Grouping by a SUBSET of the MV's group columns rewrites
  *    too (roll-up): SUM and COUNT are abelian, so re-aggregating the
  *    MV is exact, and AVG lowers to `sum(sum)/sum(count)` —
  *    bit-identical to the base's Average, which computes the same
  *    (sum, count) pair.
  *  - OWNERSHIP: the scan's files all live under the registered base
  *    table's directory.
  *  - SNAPSHOT: the scan's file set equals the base table's CURRENT
  *    live file set — a time-travel read of an older snapshot never
  *    rewrites.
  *  - FRESHNESS: the MV's commit stamp is `base-commit-N` for the
  *    base's current commit N (the exactly-once stamp
  *    [[graft.pipeline.IncrementalAgg.applyChanges]] writes). A base
  *    commit not yet folded into the MV disables the rewrite — the
  *    query sees the new data from the base, never a stale answer.
  *
  * The rewritten Aggregate preserves the original output attributes
  * (names, exprIds, types), so parent operators — sorts, joins,
  * HAVING filters — are untouched.
  *
  * Installed like [[GraftAutoBroadcast]]: `injectOptimizerRule` on
  * extension-built sessions, `experimental.extraOptimizations` on
  * live ones (applied by [[graft.SessionConfs]]). With no registered
  * MVs the rule is a no-op comparison. */
object GraftMvRewrite extends Rule[LogicalPlan] {

  /** A registered MV: the aggregate table at `mvPath` maintains
    * `spec` over the graft table at `basePath`. */
  final case class MvReg(basePath: String, mvPath: String, spec: AggSpec)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MvReg]()

  /** Declare `mvPath` as a maintained aggregate of `basePath`.
    * Registration is session-global (the rule object is shared) and
    * keyed by the MV — a base may carry SEVERAL MVs with different
    * group sets; the rewrite tries each candidate and takes the first
    * that lowers. Unregister (by base) when MVs are dropped. */
  def register(basePath: String, mvPath: String, spec: AggSpec): Unit =
    registry.put(mvPath, MvReg(basePath, mvPath, spec))

  def unregister(basePath: String): Unit = {
    registry.entrySet().removeIf(e => e.getValue.basePath == basePath)
    forgetArmed(basePath)
  }

  /** Remove ONE MV by its own path (DROP MATERIALIZED VIEW — other
    * MVs over the same base stay armed). */
  def unregisterMv(mvPath: String): Unit = {
    Option(registry.remove(mvPath)).foreach(r => forgetArmed(r.basePath))
  }

  /** Disarm every registration that READS `path` (a dropped base —
    * single-table MVs over it and join MVs on either side). */
  def unregisterReaders(path: String): Unit = {
    unregister(path)
    joinRegistry.entrySet().removeIf(e =>
      e.getValue.factPath == path ||
      e.getValue.dims.exists(_.dimPath == path))
    forgetArmed(path)
  }

  def clear(): Unit = {
    registry.clear(); joinRegistry.clear(); armedBases.clear()
    PlanCaches.clear()
  }

  /** Rewrites applied since session start — spec/judged-entry
    * observability (proving a plan DID rewrite, like lastPrune). */
  @volatile var rewriteCount: Long = 0L

  /** One dim side of a registered join MV: its table path and the
    * equi-join key pair (`fk` on the fact, `dk` on this dim). */
  final case class DimJoin(dimPath: String, fk: String, dk: String)

  /** A registered JOIN MV ([[graft.pipeline.IncrementalJoinAgg]]):
    * `mvPath` maintains `spec` over `fact ⋈ dim1 ⋈ … ⋈ dimN` (each
    * dim on its own fk=dk pair) — measures on the fact side, group
    * columns on any side. */
  final case class JoinMvReg(factPath: String, dims: Seq[DimJoin],
                             mvPath: String, spec: AggSpec)

  object JoinMvReg {
    /** Single-dim convenience form (the pre-star call shape). */
    def apply(factPath: String, dimPath: String, fk: String, dk: String,
              mvPath: String, spec: AggSpec): JoinMvReg =
      JoinMvReg(factPath, Seq(DimJoin(dimPath, fk, dk)), mvPath, spec)
  }

  private val joinRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, JoinMvReg]()

  def registerJoin(reg: JoinMvReg): Unit = joinRegistry.put(reg.mvPath, reg)

  /** Remove ONE join MV by its own path — and forget the fact's
    * arming memo, so a later CREATE over the same fact re-arms from
    * the catalog (the single-table [[unregisterMv]] posture). */
  def unregisterJoin(mvPath: String): Unit =
    Option(joinRegistry.remove(mvPath)).foreach(r => forgetArmed(r.factPath))

  /** Every MV path armed in THIS session (both kinds) — `SHOW
    * MATERIALIZED VIEWS` unions this with the persisted catalog. */
  def registeredMvPaths: Seq[String] = {
    import scala.jdk.CollectionConverters._
    (registry.values.asScala.map(_.mvPath) ++
      joinRegistry.values.asScala.map(_.mvPath)).toSeq.distinct
  }

  /** Scheme-tolerant "file lives under dir" — a real PREFIX match
    * (`/a/b-extra/f` is NOT under `/a/b`), unlike a substring
    * `contains` which a suffix-named sibling table could satisfy.
    * Scan file paths may carry a `file:`/`file://` scheme. */
  private def underDir(file: String, dir: String): Boolean = {
    def norm(p: String): String =
      "/" + p.stripPrefix("file:").dropWhile(_ == '/')
    val d = norm(dir)
    norm(file).startsWith(if (d.endsWith("/")) d else d + "/")
  }

  /** Is `colName` PROVEN non-null on the base table by an enforced
    * CHECK constraint `<col> IS NOT NULL`? Constraints run on every
    * write path, so the proof holds for future rows too — the
    * soundness condition the AVG lowering needs when the scan
    * attribute itself is nullable (parquet scans always are).
    * Canonical-text match only: anything fancier falls through. */
  private def notNullByConstraint(basePath: String, colName: String): Boolean = {
    val cs: Map[String, String] =
      if (graft.merge.PartitionedTable.tableExists(basePath))
        graft.merge.PartitionedTable.tableConstraints(basePath)
      else if (Scd1Merge.tableExists(basePath))
        Scd1Merge.tableConstraints(basePath)
      else Map.empty
    def canon(s: String): String = {
      val t = s.replace("`", "").trim.replaceAll("\\s+", " ").toLowerCase
      if (t.startsWith("(") && t.endsWith(")")) t.drop(1).dropRight(1).trim
      else t
    }
    val want = canon(colName) + " is not null"
    cs.values.exists(canon(_) == want)
  }

  /** Bases already auto-armed from the disk catalog this session —
    * each base's `_graft_mv` sidecars are read at most once. */
  private val armedBases =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Reset the arming memo (a DROP/unregister must let a later
    * CREATE re-arm from disk). */
  private def forgetArmed(path: String): Unit = { armedBases.remove(path); () }

  /** AUTO-ARM from the persisted catalog: MVs created by an EARLIER
    * session rewrite here with no REFRESH ritual. For each cataloged
    * base that owns the plan's scan files, read its MVs' `_graft_mv`
    * definitions once and register them — arming is NOT trusting: the
    * per-query freshness/snapshot gates still decide whether the
    * rewrite actually fires. No catalog root → no-op. */
  private def armFromCatalog(files: Seq[String]): Unit = {
    val bases = graft.sql.GraftCatalog.basesWithMvs
    if (bases.isEmpty) return
    bases.filter(b => files.forall(underDir(_, b))).foreach { base =>
      if (armedBases.add(base))
        graft.sql.GraftCatalog.mvsOver(base).foreach { mvPath =>
          if (!registry.containsKey(mvPath) &&
              !joinRegistry.containsKey(mvPath))
            graft.pipeline.MvDef.read(mvPath).foreach { d =>
              if (d.joins.isEmpty) register(d.basePath, mvPath, d.spec)
              else registerJoin(JoinMvReg(d.basePath,
                d.joins.map(j => DimJoin(j.dimPath, j.fk, j.dk)),
                mvPath, d.spec))
            }
        }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty && joinRegistry.isEmpty &&
        graft.sql.GraftCatalog.basesWithMvs.isEmpty) return plan
    plan.transform {
      case agg: Aggregate =>
        tryRewrite(agg).orElse(tryRewriteJoin(agg)).getOrElse(agg)
    }
  }

  // ---- predicate / expression canonicalization (filtered and
  // expression-group MVs match the QUERY's optimized trees against
  // the DEFINITION's, both rendered through the same pipeline) ----

  private def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjunctsOf(l) ++ conjunctsOf(r)
    case x => Seq(x)
  }

  /** Canonical SQL rendering: IDENTIFIERS are normalized (attribute
    * names lowercased, table-alias qualifiers stripped — exprIds
    * never print, so two resolutions of the same text compare
    * equal) while LITERALS keep their case: `'EU'` and `'eu'` are
    * DIFFERENT values under Spark's case-sensitive string comparison,
    * and `'yyyy-MM'` vs `'yyyy-mm'` are different date-format
    * patterns — a whole-string lowercase would canonicalize them
    * together and rewrite a query onto an MV holding different data.
    * Function names need no handling: both sides render through the
    * same resolved-node `prettyName`s. */
  private def canonExprStr(e: Expression): String =
    e.transform {
      case a: AttributeReference =>
        a.withQualifier(Nil).withName(a.name.toLowerCase)
    }.sql

  /** A filter condition as a canonical-conjunct MAP (canonical text →
    * a representative Expression — the subsumption rewrite re-applies
    * residual conjuncts over the MV, so it needs the trees, not just
    * the strings), with `IsNotNull(a)` conjuncts dropped when `a` is
    * already constrained by a null-intolerant comparison — the
    * optimizer infers those asymmetrically between the query plan and
    * the definition's resolution, and they are semantically redundant
    * there. */
  private def canonFilterMap(cond: Expression): Map[String, Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, In, InSet, IsNotNull, StringPredicate}
    val cs = conjunctsOf(cond)
    val compared: Set[String] = cs.flatMap {
      case b: BinaryComparison => b.references.toSeq.map(_.name.toLowerCase)
      case i: In => i.value.references.toSeq.map(_.name.toLowerCase)
      case i: InSet => i.child.references.toSeq.map(_.name.toLowerCase)
      case s: StringPredicate => s.references.toSeq.map(_.name.toLowerCase)
      case _ => Nil
    }.toSet
    cs.filter {
      case IsNotNull(a: Attribute) => !compared(a.name.toLowerCase)
      case _ => true
    }.map(e => canonExprStr(e) -> e).toMap
  }

  private def canonFilterSet(cond: Expression): Set[String] =
    canonFilterMap(cond).keySet

  /** A SUBSUMPTION residual conjunct re-expressed over the MV's
    * output: plain group attrs map by name, subtrees canonically
    * equal to a registered group expression map to their materialized
    * column, anything touching another attribute kills it (a residual
    * on a measure or a non-MV column cannot apply over the
    * pre-aggregated table). NONDETERMINISTIC conjuncts are rejected
    * outright: σ_p ∘ γ_G = γ_G ∘ σ_p needs p to be a FUNCTION of the
    * group columns, and `rand() < 0.5` is not — over the base it
    * samples ROWS, over the MV it would sample whole GROUPS
    * (`deterministic` is false whenever any descendant is, so one
    * top-level check covers Rand however deeply it is nested). */
  private def residualOverMv(e: Expression, plainGroupCols: Seq[String],
                             exprGroups: Map[String, String],
                             mvByName: Map[String, AttributeReference])
      : Option[Expression] = {
    if (!e.deterministic) return None
    val whole = e match {
      case a: AttributeReference =>
        if (plainGroupCols.exists(_.equalsIgnoreCase(a.name)))
          mvByName.get(a.name.toLowerCase)
        else None
      case other => exprGroups.get(canonExprStr(other))
        .flatMap(n => mvByName.get(n.toLowerCase))
    }
    whole.orElse(e match {
      case _: AttributeReference => None
      case leaf if leaf.children.isEmpty => Some(leaf)
      case other =>
        val kids = other.children.map(
          residualOverMv(_, plainGroupCols, exprGroups, mvByName))
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    })
  }

  /** The DEFINITION side of both canonical forms, resolved against
    * the base table and run through the SAME optimizer the query
    * went through. Cached — predicates/expressions are pure text. */
  private val defCanonCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[AnyRef]]()

  private def defFilterCanon(spark: SparkSession, basePath: String,
                             filterSql: String): Option[Set[String]] =
    defCanonCache.computeIfAbsent(s"f $basePath $filterSql", { _ =>
      try {
        import org.apache.spark.sql.catalyst.plans.logical.Filter
        val base =
          if (graft.merge.PartitionedTable.tableExists(basePath))
            graft.merge.PartitionedTable.readTable(spark, basePath)
          else Scd1Merge.readTable(spark, basePath)
        base.filter(filterSql).queryExecution.optimizedPlan.collectFirst {
          case f: Filter => canonFilterSet(f.condition)
        }.map(_.asInstanceOf[AnyRef])
      } catch { case _: Exception => None }
    }).map(_.asInstanceOf[Set[String]])

  private def defGroupExprCanon(spark: SparkSession, basePath: String,
                                exprSql: String): Option[String] =
    defCanonCache.computeIfAbsent(s"g $basePath $exprSql", { _ =>
      try {
        val base =
          if (graft.merge.PartitionedTable.tableExists(basePath))
            graft.merge.PartitionedTable.readTable(spark, basePath)
          else Scd1Merge.readTable(spark, basePath)
        base.select(org.apache.spark.sql.functions.expr(exprSql).as("__g"))
          .queryExecution.optimizedPlan.collectFirst {
            case Project(Seq(Alias(child, _)), _) => canonExprStr(child)
          }
      } catch { case _: Exception => None }
    }).map(_.asInstanceOf[String])

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    // ---- SHAPE: Projects of bare attrs and ALIASED expressions
    // (PullOutGroupingExpressions rewrites `GROUP BY month(ts)` into
    // `_groupingexpression` aliases below the Aggregate — we carry
    // the alias map so the group gate can match the PULLED expression
    // canonically), AT MOST ONE Filter per branch, over one parquet
    // scan — or a UNION of such chains (a PARTITIONED base read; a
    // pushed-down MV filter appears once per branch and every branch
    // must carry the SAME condition). An alias that does NOT match a
    // registered group expression simply fails the lowering — a safe
    // fall-through, never a wrong rewrite.
    type Chain = (Seq[String], Option[Map[String, Expression]],
      Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression])
    def scanChain(p: LogicalPlan): Option[Chain] =
      p match {
        case Project(items, child)
            if items.forall(i => i.isInstanceOf[AttributeReference] ||
              i.isInstanceOf[Alias]) =>
          scanChain(child).map { case (fs, f, pulled) =>
            (fs, f, pulled ++ items.collect {
              case al @ Alias(e, _) => al.exprId -> e })
          }
        case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
          scanChain(child).flatMap {
            case (fs, None, pulled) =>
              Some((fs, Some(canonFilterMap(cond)), pulled))
            case _ => None // two stacked filters: not a shape we admit
          }
        case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
          val kids = u.children.map(scanChain)
          if (kids.exists(_.isEmpty)) None
          else {
            val conds = kids.flatten.map(_._2.map(_.keySet)).distinct
            if (conds.size != 1) None // branches disagree on the filter
            else Some((kids.flatten.flatMap(_._1),
              kids.flatten.head._2,
              kids.flatten.flatMap(_._3).toMap))
          }
        case lr: LogicalRelation => lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            Some((fs.location.inputFiles.toSeq, None, Map.empty))
          case _ => None
        }
        case _ => None
      }
    val (files, planFilter, pulled) =
      scanChain(agg.child).getOrElse(return None)
    if (files.isEmpty) return None
    armFromCatalog(files)
    // ---- OWNERSHIP: registered MVs whose base owns these files — a
    // base may carry several MVs (different group sets); try each,
    // SMALLEST first (manifest row counts, a driver metadata read):
    // with rollup chains a base can carry several ADMISSIBLE MVs for
    // the same query (daily and monthly both admit a monthly ask) and
    // path order could pick one orders of magnitude bigger than the
    // best. Missing stats rank last; mvPath tie-breaks for
    // determinism.
    val cands = {
      import scala.jdk.CollectionConverters._
      registry.values.asScala.filter(r =>
        files.forall(underDir(_, r.basePath))).toSeq
        .sortBy(r => (Scd1Merge.tableRowsEstimate(r.mvPath)
          .getOrElse(Long.MaxValue), r.mvPath))
    }
    if (cands.isEmpty) return None
    val spark = SparkSession.active
    // SNAPSHOT resolved once per distinct base (driver metadata —
    // cheap, and only for plans that genuinely scan a registered base)
    val snapshotOk = scala.collection.mutable.Map.empty[String, Boolean]
    def baseCurrent(basePath: String): Boolean =
      snapshotOk.getOrElseUpdate(basePath,
        // commit-keyed cache: re-lists only when the commit moved
        PlanCaches.liveFiles(spark, basePath).exists(_._2 == files.toSet))
    cands.view.flatMap { reg =>
      // ---- FILTER gate, with SUBSUMPTION: the query's conjunct set
      // must CONTAIN the definition's (equal when the MV is
      // unfiltered and the query carries no filter), and every
      // RESIDUAL conjunct must re-express over the MV's group
      // columns — group-measurable predicates commute with the
      // aggregation (σ_p ∘ γ_G = γ_G ∘ σ_p when p reads only G), so
      // the residual applies over the MV-sized table instead of the
      // base. A residual touching a measure or any non-group column
      // falls through; a top-level disjunction with the definition's
      // predicate is ONE unmatched conjunct and falls through too.
      lazy val exprGroups: Map[String, String] =
        reg.spec.groupExprs.flatMap { case (out, sql) =>
          defGroupExprCanon(spark, reg.basePath, sql).map(_ -> out)
        }
      val plainGroupCols = reg.spec.groupCols
        .filterNot(reg.spec.groupExprs.contains)
      val queryMap = planFilter.getOrElse(Map.empty[String, Expression])
      val residual: Option[Seq[Expression]] =
        (reg.spec.filterSql match {
          case None => Some(Set.empty[String])
          case Some(rf) => defFilterCanon(spark, reg.basePath, rf)
        }) match {
          case Some(ds) if ds.subsetOf(queryMap.keySet) =>
            Some((queryMap -- ds).values.toSeq)
          case _ => None
        }
      // ---- GROUP gate: bare attrs among the MV's PLAIN group
      // columns, or expressions canonically equal to a registered
      // group expression (matched to its materialized MV column)
      val groupsOk = residual.isDefined && agg.groupingExpressions.forall {
        case a: AttributeReference if pulled.contains(a.exprId) =>
          exprGroups.contains(canonExprStr(pulled(a.exprId)))
        case a: AttributeReference =>
          plainGroupCols.exists(_.equalsIgnoreCase(a.name))
        case e => exprGroups.contains(canonExprStr(e))
      }
      val commit =
        (if (graft.merge.PartitionedTable.tableExists(reg.basePath))
           graft.merge.PartitionedTable.tableCommit(reg.basePath)
         else Scd1Merge.tableCommit(reg.basePath)).getOrElse(-1)
      val fresh = commit >= 0 && Scd1Merge.tableBatchId(reg.mvPath)
        .contains(f"base-commit-$commit%09d")
      if (!groupsOk || !fresh || !baseCurrent(reg.basePath)) None
      else {
        val mvRead =
          Scd1Merge.readTable(spark, reg.mvPath).queryExecution.analyzed
        val mvByName: Map[String, AttributeReference] =
          mvRead.output.collect {
            case a: AttributeReference => a.name.toLowerCase -> a
          }.toMap
        val residualMv: Option[Seq[Expression]] = {
          val mapped = residual.get.map(
            residualOverMv(_, plainGroupCols, exprGroups, mvByName))
          if (mapped.exists(_.isEmpty)) None else Some(mapped.map(_.get))
        }
        residualMv.flatMap { res =>
          val mvPlan =
            if (res.isEmpty) mvRead
            else org.apache.spark.sql.catalyst.plans.logical.Filter(
              res.reduce(org.apache.spark.sql.catalyst.expressions.And(_, _)),
              mvRead)
          lowerOnto(agg, reg.spec, mvPlan,
            measureSide = _ => true,
            nonNullOk = a => !a.nullable ||
              notNullByConstraint(reg.basePath, a.name),
            exprGroups = exprGroups, pulled = pulled,
            qskHashCanon =
              if (reg.spec.quantiles.isEmpty) None
              else defGroupExprCanon(spark, reg.basePath,
                s"xxhash64(${reg.spec.sampleKeys.mkString(", ")})"))
        }.map { rewritten =>
          rewriteCount += 1
          logInfo(s"graft MV rewrite: aggregate over ${reg.basePath} " +
            s"answered from ${reg.mvPath} (commit $commit)")
          rewritten
        }
      }
    }.headOption
  }

  /** JOIN-MV rewrite: `Aggregate(groups, aggs, fact ⋈ dim1 ⋈ … ⋈
    * dimN)` answered from a registered
    * [[graft.pipeline.IncrementalJoinAgg]] star table — the dashboard
    * shape over a star schema, any number of dims. Same posture as
    * the single-table path plus the join-specific gates:
    *
    *  - a tree of INNER equi-joins whose leaves biject onto the
    *    registered (fact, dims): the fact leaf owns exactly one
    *    registered MV's factPath, each remaining leaf exactly one of
    *    its dims, and each join condition is exactly one dim's
    *    (fk, dk) pair — attrs checked by LEAF MEMBERSHIP, either
    *    orientation, one condition per dim, none left over;
    *  - each leaf a Project/IsNotNull(join-key)-only chain to one
    *    scan (the optimizer INFERS `isnotnull` on inner-join keys —
    *    those filters are semantics-preserving w.r.t. the join, so
    *    they are the ONE filter shape admitted; anything else falls
    *    through);
    *  - group attributes are bare MV group columns (any side),
    *    summed measures resolve on the FACT leaf (checked by exprId
    *    membership, not just name);
    *  - EVERY side passes the snapshot gate and the MV carries the
    *    `fact@F,dim@D1[,dim@D2…]` stamp for all sides' CURRENT
    *    commits. */
  private def tryRewriteJoin(agg: Aggregate): Option[LogicalPlan] = {
    if (joinRegistry.isEmpty &&
        graft.sql.GraftCatalog.basesWithMvs.isEmpty) return None
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, IsNotNull}
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint}
    import org.apache.spark.sql.catalyst.plans.Inner
    // `GROUP BY expr` plans carry `_groupingexpression` aliases in a
    // Project between the Aggregate and the join — collected by the
    // flatten step (above-join Projects ONLY: a renaming alias inside
    // a leaf could smuggle a renamed column past the name-keyed
    // measure gate, so leaf walks stay attribute-only) so the group
    // gate can match the PULLED expression canonically
    var pulled =
      Map.empty[org.apache.spark.sql.catalyst.expressions.ExprId, Expression]
    // one leaf: Project/Filter chains down to a single parquet scan —
    // or a UNION of such chains, which is exactly a PARTITIONED fact
    // read (one child scan per partition, unioned by name). Filter
    // conjuncts split three ways, mirroring [[canonFilterMap]]:
    // IsNotNull subsumed by a same-leaf comparison drops (the
    // optimizer infers it), other IsNotNull attrs go to `notNull`
    // (join-key inference — validated against the registered keys),
    // and everything else becomes the leaf's canonical EXTRA map —
    // admitted on the FACT leaf when it matches a registered filtered
    // star's definition predicate, and on a DIM leaf when that dim's
    // fact-side key is one of the MV's group columns (the predicate
    // then applies at rewrite time through a re-join). Keeps the side
    // ROOT for outputSet membership checks. A UNION's branches must
    // agree on the extra set (a pushed MV filter appears once per
    // partition branch).
    final case class Leaf(root: LogicalPlan, files: Seq[String],
                          extra: Map[String, Expression])
    def leaf(p: LogicalPlan): Option[(Leaf, Seq[AttributeReference])] = {
      var notNull = Seq.empty[AttributeReference]
      def classify(cond: Expression): Map[String, Expression] = {
        val cs = conjunctsOf(cond)
        val compared: Set[String] = cs.flatMap {
          case IsNotNull(_) => Nil
          case other => other.references.toSeq.map(_.name.toLowerCase)
        }.toSet
        cs.flatMap {
          case IsNotNull(a: AttributeReference) =>
            if (compared(a.name.toLowerCase)) Nil
            else { notNull :+= a; Nil }
          case other => Seq(canonExprStr(other) -> other)
        }.toMap
      }
      def walk(q: LogicalPlan)
          : Option[(Seq[String], Map[String, Expression])] = q match {
        case Project(items, child)
            if items.forall(_.isInstanceOf[AttributeReference]) =>
          walk(child)
        case Filter(cond, child) =>
          walk(child).map { case (fs, ex) => (fs, ex ++ classify(cond)) }
        case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
          val kids = u.children.map(walk)
          if (kids.exists(_.isEmpty)) None
          else {
            val extras = kids.flatten.map(_._2.keySet).distinct
            if (extras.size != 1) None // branches disagree on the filter
            else Some((kids.flatten.flatMap(_._1), kids.flatten.head._2))
          }
        case lr: LogicalRelation => lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            Some((fs.location.inputFiles.toSeq, Map.empty[String, Expression]))
          case _ => None
        }
        case _ => None
      }
      walk(p).map { case (fs, ex) => (Leaf(p, fs, ex), notNull) }
    }
    // flatten the inner-join tree: leaves + attr=attr conjuncts
    def eqConjuncts(e: Expression): Option[Seq[EqualTo]] = {
      val cs = conjunctsOf(e).map {
        case eq @ EqualTo(_: AttributeReference, _: AttributeReference) =>
          Some(eq)
        case _ => None
      }
      if (cs.exists(_.isEmpty)) None else Some(cs.flatten)
    }
    def flatten(p: LogicalPlan)
        : Option[(Seq[Leaf], Seq[EqualTo], Seq[AttributeReference])] =
      p match {
        case Project(items, child)
            if items.forall(i => i.isInstanceOf[AttributeReference] ||
              i.isInstanceOf[Alias]) &&
              child.isInstanceOf[Join] =>
          pulled ++= items.collect { case al @ Alias(e, _) => al.exprId -> e }
          flatten(child)
        case jn: Join if jn.joinType == Inner && jn.condition.isDefined =>
          for { (ll, lc, ln) <- flatten(jn.left)
                (rl, rc, rn) <- flatten(jn.right)
                cs <- eqConjuncts(jn.condition.get) }
          yield (ll ++ rl, lc ++ rc ++ cs, ln ++ rn)
        case other => leaf(other).map { case (lf, nn) => (Seq(lf), Nil, nn) }
      }
    val (leaves, conds, notNulls) = flatten(agg.child).getOrElse(return None)
    if (leaves.size < 2 || leaves.exists(_.files.isEmpty)) return None
    leaves.foreach(l => armFromCatalog(l.files))
    // which registered star MV do these leaves biject onto?
    def assign(r: JoinMvReg): Option[(Leaf, Seq[Leaf])] = {
      if (leaves.size != r.dims.size + 1) return None
      val facts = leaves.filter(_.files.forall(underDir(_, r.factPath)))
      if (facts.size != 1) return None
      val factLeaf = facts.head
      val rest = leaves.filterNot(_ eq factLeaf)
      val picked = r.dims.map { d =>
        rest.filter(_.files.forall(underDir(_, d.dimPath))) match {
          case Seq(one) => one
          case _ => return None
        }
      }
      if (picked.distinct.size != rest.size) return None
      Some((factLeaf, picked))
    }
    val spark = SparkSession.active
    // Every bijecting registration runs the FULL gate (filters,
    // groups, snapshot, freshness) — a base may carry several star
    // MVs and only one admits this query; stopping at the first
    // bijection would miss the serving MV. Candidates are ordered
    // smallest-first by manifest row count (driver metadata) so when
    // SEVERAL admit — a daily and a monthly rollup both admitting a
    // monthly ask — the cheapest answers; mvPath tie-breaks.
    def tryWithReg(reg: JoinMvReg, factLeaf: Leaf,
                   dimLeaves: Seq[Leaf]): Option[LogicalPlan] = {
    // ---- FILTER gates. FACT leaf, with SUBSUMPTION (the
    // single-table posture): its conjunct set must CONTAIN the
    // registered star's definition filter (resolved against the fact
    // through the SAME optimizer; both empty when unfiltered), and
    // every RESIDUAL conjunct must later re-express over the MV's
    // group columns — group-measurable fact predicates commute with
    // the aggregation, so the residual applies over the MV-sized
    // table. DIM leaves: a predicate is admissible ONLY when that
    // dim's fact-side join key is one of the MV's group columns — the
    // MV then holds per-key rows, and the predicate applies at
    // rewrite time through a broadcast re-join against the
    // (snapshot-checked, freshness-stamped) dim; any other dim
    // predicate falls through.
    val defSet: Set[String] = reg.spec.filterSql match {
      case None => Set.empty
      case Some(rf) =>
        defFilterCanon(spark, reg.factPath, rf).getOrElse(return None)
    }
    if (!defSet.subsetOf(factLeaf.extra.keySet)) return None
    val factResiduals: Seq[Expression] =
      (factLeaf.extra -- defSet).values.toSeq
    val filteredDims: Seq[Int] =
      reg.dims.indices.filter(i => dimLeaves(i).extra.nonEmpty)
    if (filteredDims.exists(i => !reg.spec.groupCols.exists(
        _.equalsIgnoreCase(reg.dims(i).fk)))) return None
    // each condition is exactly one dim's (fk, dk) pair — one per
    // dim, none left over, attrs on their registered leaves
    def pairOf(eq: EqualTo): Seq[Int] = {
      val (a, b) = (eq.left.asInstanceOf[AttributeReference],
        eq.right.asInstanceOf[AttributeReference])
      reg.dims.indices.filter { i =>
        val d = reg.dims(i); val dl = dimLeaves(i)
        def m(x: AttributeReference, y: AttributeReference) =
          x.name.equalsIgnoreCase(d.fk) && factLeaf.root.outputSet.contains(x) &&
          y.name.equalsIgnoreCase(d.dk) && dl.root.outputSet.contains(y)
        m(a, b) || m(b, a)
      }
    }
    val condDims = conds.map(pairOf)
    if (conds.size != reg.dims.size || condDims.exists(_.size != 1) ||
        condDims.flatten.distinct.size != reg.dims.size) return None
    // inferred not-null filters may only name the join keys
    val keyNames = (reg.dims.map(_.fk) ++ reg.dims.map(_.dk))
      .map(_.toLowerCase).toSet
    if (!notNulls.forall(a => keyNames(a.name.toLowerCase))) return None
    // groups. A BARE attr must be one of the MV's PLAIN group columns
    // and owned by exactly ONE leaf — maintenance sourced a shared
    // name from ONE side (sideOf prefers the fact), so a name that
    // schema evolution has since made ambiguous across the joined
    // leaves could be answered with the OTHER side's values;
    // ambiguity rejects, and the attr's exprId must belong to the
    // single owning leaf. A grouping EXPRESSION (raw, or a PULLED
    // `_groupingexpression` attr) must reference the FACT leaf alone
    // (maintenance derives it on the fact side) and canonically equal
    // a registered group expression resolved against the same fact.
    val exprGroups: Map[String, String] =
      reg.spec.groupExprs.flatMap { case (out, sql) =>
        defGroupExprCanon(spark, reg.factPath, sql).map(_ -> out)
      }
    val plainGroupCols = reg.spec.groupCols
      .filterNot(reg.spec.groupExprs.contains)
    def exprGroupOk(e: Expression): Boolean =
      e.references.forall(factLeaf.root.outputSet.contains) &&
      exprGroups.contains(canonExprStr(e))
    val allLeaves = factLeaf +: dimLeaves
    val groupsOk = agg.groupingExpressions.forall {
      case a: AttributeReference if pulled.contains(a.exprId) =>
        exprGroupOk(pulled(a.exprId))
      case a: AttributeReference =>
        plainGroupCols.exists(_.equalsIgnoreCase(a.name)) && {
          val owners = allLeaves.filter(
            _.root.output.exists(_.name.equalsIgnoreCase(a.name)))
          owners.size == 1 && owners.head.root.outputSet.contains(a)
        }
      case e => exprGroupOk(e)
    }
    if (!groupsOk) return None
    // SNAPSHOT every side + the all-sides FRESHNESS stamp (the fact
    // may be PARTITIONED: parent commit, pin-set-resolved snapshot)
    val factPart = graft.merge.PartitionedTable.tableExists(reg.factPath)
    val cf = (if (factPart)
        graft.merge.PartitionedTable.tableCommit(reg.factPath)
      else Scd1Merge.tableCommit(reg.factPath)).getOrElse(return None)
    val cds = reg.dims.map(d =>
      Scd1Merge.tableCommit(d.dimPath).getOrElse(return None))
    val wantStamp = f"fact@$cf%09d" +
      cds.map(c => f",dim@$c%09d").mkString
    if (!Scd1Merge.tableBatchId(reg.mvPath).contains(wantStamp)) return None
    if (!PlanCaches.liveFiles(spark, reg.factPath)
        .exists(_._2 == factLeaf.files.toSet)) return None
    if (reg.dims.indices.exists(i =>
        !PlanCaches.liveFiles(spark, reg.dims(i).dimPath)
          .exists(_._2 == dimLeaves(i).files.toSet)))
      return None
    val factOut = factLeaf.root.outputSet
    // the MV read — re-joined to each PREDICATE-carrying dim on
    // `mv.<fk> = dim.<dk>` (BROADCAST: dims are dimension-sized by
    // contract) with the query's own conjuncts rebound onto the fresh
    // dim read by name (one table, names unique), then projected back
    // to the MV's columns so the shared lowering sees exactly the MV.
    // The re-join is group-sized work: the predicate dim's key is one
    // of the MV's group columns (gated above), so each MV row joins
    // at most one dim row, the filter drops whole groups, and the
    // re-aggregation below rolls the survivors up to the query's
    // groups — never touching the base join.
    val mvRead =
      Scd1Merge.readTable(spark, reg.mvPath).queryExecution.analyzed
    // fact-leaf RESIDUALS (subsumption) re-express over the MV and
    // apply innermost — before any predicate-dim re-join
    val mvBase: LogicalPlan = if (factResiduals.isEmpty) mvRead else {
      val mvByName: Map[String, AttributeReference] =
        mvRead.output.collect {
          case a: AttributeReference => a.name.toLowerCase -> a
        }.toMap
      val mapped = factResiduals.map(
        residualOverMv(_, plainGroupCols, exprGroups, mvByName))
      if (mapped.exists(_.isEmpty)) return None
      Filter(mapped.map(_.get).reduce(And(_, _)), mvRead)
    }
    val mvPlan: LogicalPlan =
      if (filteredDims.isEmpty) mvBase
      else {
        val joined = filteredDims.foldLeft(mvBase: LogicalPlan) { (acc, i) =>
          val d = reg.dims(i)
          val dimPlan = Scd1Merge.readTable(spark, d.dimPath)
            .queryExecution.analyzed
          val mvFk = mvRead.output.find(_.name.equalsIgnoreCase(d.fk))
            .getOrElse(return None)
          val dimDk = dimPlan.output.find(_.name.equalsIgnoreCase(d.dk))
            .getOrElse(return None)
          val preds = dimLeaves(i).extra.values.toSeq.map(_.transform {
            case a: AttributeReference =>
              dimPlan.output.find(_.name.equalsIgnoreCase(a.name))
                .getOrElse(return None)
          })
          Filter(preds.reduce(And(_, _)),
            Join(acc, dimPlan, Inner, Some(EqualTo(mvFk, dimDk)),
              JoinHint(None, Some(HintInfo(Some(BROADCAST))))))
        }
        Project(mvRead.output, joined)
      }
    lowerOnto(agg, reg.spec, mvPlan,
      measureSide = a => factOut.contains(a),
      nonNullOk = a => !a.nullable ||
        notNullByConstraint(reg.factPath, a.name),
      exprGroups = exprGroups, pulled = pulled).map { rewritten =>
      rewriteCount += 1
      logInfo(s"graft MV rewrite: star aggregate over ${reg.factPath} ⋈ " +
        s"${reg.dims.map(_.dimPath).mkString(" ⋈ ")} answered from " +
        s"${reg.mvPath} ($wantStamp)")
      rewritten
    }
    } // tryWithReg
    {
      import scala.jdk.CollectionConverters._
      joinRegistry.values.asScala.toSeq
        .sortBy(r => (Scd1Merge.tableRowsEstimate(r.mvPath)
          .getOrElse(Long.MaxValue), r.mvPath))
        .view
        .flatMap(r => assign(r).flatMap { case (f, ds) =>
          tryWithReg(r, f, ds) })
        .headOption
    }
  }

  /** The shared substitution core: rewrite every supported
    * AggregateExpression subtree (sum / count(*) / avg — each output
    * expression may wrap them arbitrarily: CollapseProject folds
    * post-agg projections into the Aggregate) and every group
    * attribute onto the MV's columns, preserving the original output
    * names and exprIds; None on ANY unsupported piece. `measureSide`
    * additionally gates WHICH attributes may serve as summed measures
    * (the join path restricts them to the fact side). */
  private def lowerOnto(agg: Aggregate,
                        spec: AggSpec, mvPlan: LogicalPlan,
                        measureSide: AttributeReference => Boolean,
                        nonNullOk: AttributeReference => Boolean,
                        exprGroups: Map[String, String] = Map.empty,
                        pulled: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression] = Map.empty,
                        // canonical form of `xxhash64(sampleKeys)`
                        // resolved against the base — the quantile
                        // aggregate's hash child must match it, or the
                        // query samples DIFFERENT row identities than
                        // maintenance stored
                        qskHashCanon: Option[String] = None): Option[LogicalPlan] = {
    val mvByName: Map[String, AttributeReference] =
      mvPlan.output.collect {
        case a: AttributeReference => a.name.toLowerCase -> a
      }.toMap
    // grouping targets: a PULLED `_groupingexpression` attr resolves
    // ONLY through its pulled expression's canonical form (its name is
    // synthetic); plain attrs map by name; raw expressions map by
    // canonical form to their materialized MV column
    val plainGroups = spec.groupCols.filterNot(spec.groupExprs.contains)
    def groupTarget(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference if pulled.contains(a.exprId) =>
        exprGroups.get(canonExprStr(pulled(a.exprId)))
          .flatMap(n => mvByName.get(n.toLowerCase))
      case a: AttributeReference
          if plainGroups.exists(_.equalsIgnoreCase(a.name)) =>
        mvByName.get(a.name.toLowerCase)
      case a: AttributeReference => None
      case other => exprGroups.get(canonExprStr(other))
        .flatMap(n => mvByName.get(n.toLowerCase))
    }
    val groupAttrs = agg.groupingExpressions.collect {
      case a: AttributeReference => a
    }
    val sumsByMeasure = spec.sums.map { case (m, out) => m.toLowerCase -> out }.toMap
    val minsByMeasure = spec.mins.map { case (m, out) => m.toLowerCase -> out }.toMap
    val maxsByMeasure = spec.maxs.map { case (m, out) => m.toLowerCase -> out }.toMap
    val sketchesByMeasure =
      spec.sketches.map { case (m, out) => m.toLowerCase -> out }.toMap
    val quantilesByMeasure =
      spec.quantiles.map { case (m, out) => m.toLowerCase -> out }.toMap
    // min/max re-aggregate exactly on roll-up (idempotent semilattice
    // aggregates) — maintenance is where they are hard, not rewrite
    def extremeOf(e: Expression, byMeasure: Map[String, String]): Option[String] =
      e match {
        case a: AttributeReference if measureSide(a) =>
          byMeasure.get(a.name.toLowerCase)
        case _ => None
      }
    def measureOf(e: Expression): Option[String] = e match {
      case a: AttributeReference if measureSide(a) =>
        sumsByMeasure.get(a.name.toLowerCase)
      case Cast(a: AttributeReference, LongType, _, _) if measureSide(a) =>
        sumsByMeasure.get(a.name.toLowerCase)
      case _ => None
    }
    def sumAgg(c: String): Option[Expression] =
      mvByName.get(c.toLowerCase).map(a => AggregateExpression(Sum(a),
        org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
        isDistinct = false))
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case s: Sum => measureOf(s.child).flatMap(sumAgg)
          case c: Count => c.children match {
            case Seq(Literal(_, _)) => sumAgg(spec.countName)
              .map(s => Coalesce(Seq(s, Literal(0L))))
            case _ => None
          }
          // avg lowers to sum(sum_x)/sum(count) where count = count(*)
          // per group — sound ONLY when the measure cannot be null
          // (SQL Average divides by the NON-NULL count). The proof is
          // either scan-level nullability or an enforced `IS NOT
          // NULL` CHECK constraint on the base; a merely-nullable
          // measure falls through to the base plan rather than
          // silently under-averaging
          case mn: org.apache.spark.sql.catalyst.expressions.aggregate.Min =>
            extremeOf(mn.child, minsByMeasure).flatMap(out =>
              mvByName.get(out.toLowerCase).map(c => AggregateExpression(
                org.apache.spark.sql.catalyst.expressions.aggregate.Min(c),
                org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
                isDistinct = false)))
          case mx: org.apache.spark.sql.catalyst.expressions.aggregate.Max =>
            extremeOf(mx.child, maxsByMeasure).flatMap(out =>
              mvByName.get(out.toLowerCase).map(c => AggregateExpression(
                org.apache.spark.sql.catalyst.expressions.aggregate.Max(c),
                org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
                isDistinct = false)))
          // hll_sketch_agg(x) over the base answers as the exact
          // UNION of the stored per-group sketches (register maxima
          // merge losslessly, so the roll-up estimate is the same
          // sketch a base scan would build) — default lgK only, the
          // precision the maintenance stored. The usual wrapper
          // `hll_sketch_estimate(...)` rides along like any other
          // output expression around a rewritten aggregate.
          case sk: org.apache.spark.sql.catalyst.expressions.aggregate.HllSketchAgg =>
            val lgkDefault = sk.right match {
              case l: Literal if l.foldable =>
                Option(l.eval()).map(_.asInstanceOf[Number].intValue)
                  .contains(12)
              case _ => false
            }
            val m = sk.left match {
              case a: AttributeReference
                  if lgkDefault && measureSide(a) =>
                sketchesByMeasure.get(a.name.toLowerCase)
              case _ => None
            }
            m.flatMap(out => mvByName.get(out.toLowerCase).map(c =>
              AggregateExpression(
                new org.apache.spark.sql.catalyst.expressions.aggregate
                  .HllUnionAgg(c),
                org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
                isDistinct = false)))
          // qsk_agg(xxhash64(keys), m) over the base answers as the
          // exact UNION of the stored per-group samples (bottom-k
          // unions are lossless — QuantileSketch Scaladoc); the hash
          // child must canonically match the registered sampleKeys
          // hash, and k must equal the STORED precision (a k=256 MV
          // serves a k=256 query and falls through any other — the
          // stored sketches simply are not the sketch the query
          // names).
          // `qsk_quantile(...)` rides along like any output wrapper.
          case qa: graft.functions.QskAgg
              if qa.k == spec.qskK &&
                qskHashCanon.contains(canonExprStr(qa.hash)) =>
            val m = qa.value match {
              case a: AttributeReference if measureSide(a) =>
                quantilesByMeasure.get(a.name.toLowerCase)
              case _ => None
            }
            m.flatMap(out => mvByName.get(out.toLowerCase).map(c =>
              AggregateExpression(graft.functions.QskUnionAgg(c),
                org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
                isDistinct = false)))
          // OPT-IN (spark.graft.mv.serveApproxPercentile):
          // `approx_percentile(m, p, accuracy)` — the shape native
          // dashboards emit — served from the stored qsk sample as
          // `qsk_quantile(qsk_union_agg(sketch), p)`. This is an
          // approximate-for-approximate SWAP, not an exact rewrite:
          // approx_percentile(acc) bounds rank error by 1/acc
          // deterministically; the qsk sample bounds it by ~1.65/√k
          // at 95% confidence. The gate therefore requires the MV's
          // bound to be at least as tight: 1.65/√k ≤ 1/acc, i.e.
          // acc ≤ √k/1.65 — a tighter-accuracy query falls through
          // to the base scan. Scalar percentile literals only (the
          // array form would need a CreateArray of estimates; out of
          // scope until asked for).
          case ap: org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile
              if org.apache.spark.sql.internal.SQLConf.get.getConfString(
                   "spark.graft.mv.serveApproxPercentile", "false").toBoolean =>
            // scalar OR array percentile literals — dashboards emit
            // `approx_percentile(m, array(0.5, 0.95, 0.99), acc)`;
            // the array form serves as a CreateArray of per-percentile
            // estimates over ONE stored-sketch union (physical
            // planning dedups the repeated aggregate)
            import org.apache.spark.sql.types.ArrayType
            val isArray = ap.percentageExpression.dataType match {
              case ArrayType(DoubleType, _) => true
              case _ => false
            }
            val pLits: Option[Seq[Double]] = ap.percentageExpression match {
              case l: Literal if l.foldable && l.dataType == DoubleType =>
                Option(l.eval()).map(d => Seq(d.asInstanceOf[Double]))
              case e if e.foldable && isArray =>
                Option(e.eval())
                  .map(_.asInstanceOf[
                    org.apache.spark.sql.catalyst.util.ArrayData]
                    .toDoubleArray().toSeq)
                  .filter(_.nonEmpty)
              case _ => None
            }
            val accOk = ap.accuracyExpression match {
              case l: Literal if l.foldable =>
                Option(l.eval()).map(_.asInstanceOf[Number].doubleValue)
                  .exists(acc => acc > 0 &&
                    acc <= math.sqrt(spec.qskK.toDouble) / 1.65)
              case _ => false
            }
            val m = ap.child match {
              case a: AttributeReference
                  if pLits.nonEmpty && accOk && measureSide(a) =>
                quantilesByMeasure.get(a.name.toLowerCase)
              case _ => None
            }
            m.flatMap(out => mvByName.get(out.toLowerCase).map { c =>
              val union = AggregateExpression(
                graft.functions.QskUnionAgg(c),
                org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
                isDistinct = false)
              // approx_percentile returns the CHILD's type (it picks
              // an element); the sample estimate is also an element,
              // carried as double — cast back so the served schema
              // matches the query's
              def estFor(p: Double, elemType: org.apache.spark.sql.types.DataType)
                  : Expression = {
                val est = graft.functions.QskQuantile(union,
                  Literal(p, DoubleType))
                if (elemType == DoubleType) est else Cast(est, elemType)
              }
              if (isArray) {
                val elemType = ap.dataType match {
                  case ArrayType(et, _) => et
                  case other => other
                }
                org.apache.spark.sql.catalyst.expressions.CreateArray(
                  pLits.get.map(estFor(_, elemType)))
              } else estFor(pLits.get.head, ap.dataType)
            })
          case a: Average if a.child.dataType == LongType =>
            val attr = a.child match {
              case ar: AttributeReference => Some(ar)
              case Cast(ar: AttributeReference, LongType, _, _) => Some(ar)
              case _ => None
            }
            attr.filter(ar => measureSide(ar) && nonNullOk(ar)).flatMap {
              ar =>
                sumsByMeasure.get(ar.name.toLowerCase).flatMap { m =>
                  for (s <- sumAgg(m); n <- sumAgg(spec.countName))
                    yield Divide(Cast(s, DoubleType), Cast(n, DoubleType))
                }
            }
          case _ => None
        }
      case _: AggregateExpression => None
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        groupTarget(a)
      case _: AttributeReference => None
      // an EXPRESSION GROUP's output re-states the grouping expression
      // (`SELECT month(ts) AS m ... GROUP BY month(ts)`) — map the
      // whole subtree to its materialized MV column
      case other if exprGroups.nonEmpty &&
          groupTarget(other).isDefined => groupTarget(other)
      case leaf if leaf.children.isEmpty => Some(leaf)
      case other =>
        val kids = other.children.map(rewriteExpr)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }
    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(rewriteExpr(a).getOrElse(return None), a.name)(exprId = a.exprId)
      case al @ Alias(child, _) =>
        Alias(rewriteExpr(child).getOrElse(return None), al.name)(exprId = al.exprId)
      case _ => return None
    }
    val newGroups = agg.groupingExpressions.map(g =>
      groupTarget(g).getOrElse(return None))
    Some(Aggregate(newGroups, newAggs, mvPlan))
  }
}
