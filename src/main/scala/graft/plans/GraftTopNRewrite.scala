package graft.plans

import graft.merge.Scd1Merge
import graft.pipeline.TopNMv.TopNSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, AttributeReference, Descending, LessThan, LessThanOrEqual, Literal, NullsFirst, NullsLast, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Transparent TOP-N-PER-GROUP rewrite: the leaderboard query shape
  *
  *   `... row_number() OVER (PARTITION BY g ORDER BY m DESC, keys)
  *    AS rn ... WHERE rn <= k`
  *
  * over a base with a registered, FRESH [[graft.pipeline.TopNMv]] is
  * answered from the MV's N-per-group rows instead of a full window
  * sort over the base — the [[GraftMvRewrite]] posture for a query
  * no aggregate MV can serve (the answer is N whole ROWS per group).
  * The splice replaces only the window's CHILD: the query's own
  * Window + Filter recompute `row_number` over the MV's ≤N rows per
  * group (trivial work), so every output exprId survives and the
  * answer is exactly the base plan's — the MV stores the top-N by the
  * SAME deterministic ordering the gate requires of the query.
  *
  * Gates (every failure a silent fall-through):
  *  - SHAPE: one window expression, `row_number()`; the filter is a
  *    single `rn <= k` / `rn < k+1` conjunct on it with k ≤ N;
  *    partition columns are bare attrs equal (as a set) to the MV's
  *    group columns; the ORDER is exactly the registered
  *    deterministic ordering — order column in the registered
  *    direction with its default null ordering, then the base keys
  *    ascending (a different tie-break could legally select different
  *    tied rows than maintenance stored);
  *  - the window's child projects bare attributes of the registered
  *    base's scan, all of them stored in the MV;
  *  - SNAPSHOT: the scan's files equal the base's current live set;
  *  - FRESHNESS: the MV's `base-commit-N` stamp names the base's
  *    current commit. */
object GraftTopNRewrite extends Rule[LogicalPlan] {

  final case class TopNReg(mvPath: String, basePath: String,
                           baseKeys: Seq[String], spec: TopNSpec)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, TopNReg]()

  def register(spark: SparkSession, mvPath: String, basePath: String,
               baseKeys: Seq[String], spec: TopNSpec): Unit =
    registry.put(mvPath, TopNReg(mvPath, basePath, baseKeys, spec))
  def unregister(mvPath: String): Unit = { registry.remove(mvPath); () }
  def clear(): Unit = { registry.clear(); PlanCaches.clear() }

  /** Registered top-N MV paths — the maintenance sweep's inventory. */
  def registeredMvPaths: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet.asScala.toSeq.sorted
  }

  @volatile var rewriteCount: Long = 0L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty) return plan
    plan transformUp {
      case f @ Filter(_, w: Window) =>
        tryRewrite(f, w).getOrElse(f)
    }
  }

  private def conjunctsOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjunctsOf(l) ++ conjunctsOf(r)
    case other => Seq(other)
  }

  private def tryRewrite(f: Filter, w: Window): Option[LogicalPlan] = {
    // ---- one window expression: row_number, or rank (the
    // ties-included leaderboard — serviceable only from a ties MV)
    val (rnAlias, isRank) = w.windowExpressions match {
      case Seq(al @ Alias(we: WindowExpression, _)) =>
        we.windowFunction match {
          case _: org.apache.spark.sql.catalyst.expressions.RowNumber =>
            (al, false)
          case _: org.apache.spark.sql.catalyst.expressions.Rank =>
            (al, true)
          case _ => return None // dense_rank: its <=k set is NOT
          // contained in rank<=n storage (k distinct values can carry
          // unboundedly many rows) — falls through by design
        }
      case _ => return None
    }
    // ---- the filter carries exactly ONE `rn <= k` (or `rn < k+1`)
    // conjunct on the window output; every OTHER conjunct is a
    // RESIDUAL that survives the splice untouched (it filters the
    // recomputed rows, which are identical to the base plan's — any
    // deterministic residual is sound here; nondeterministic falls
    // through conservatively)
    val cs = conjunctsOf(f.condition)
    val ks = cs.collect {
      case LessThanOrEqual(a: AttributeReference, Literal(v: Int, _))
          if a.exprId == rnAlias.exprId => v
      case LessThan(a: AttributeReference, Literal(v: Int, _))
          if a.exprId == rnAlias.exprId => v - 1
    }
    if (ks.size != 1) return None
    val k = ks.head
    if (k < 1) return None
    val residuals = cs.filterNot {
      case LessThanOrEqual(a: AttributeReference, _) =>
        a.exprId == rnAlias.exprId
      case LessThan(a: AttributeReference, _) => a.exprId == rnAlias.exprId
      case _ => false
    }
    if (residuals.exists(r => !r.deterministic ||
        r.references.exists(_.exprId == rnAlias.exprId))) return None
    // ---- the child: bare attribute Projects over a single scan —
    // optionally through ONE Filter directly over it (the optimizer
    // pushes group-column predicates below the Window; gated below to
    // partition columns only, where σ_g commutes with per-group
    // top-N) — or over a UNION of Project/scan chains (a PARTITIONED
    // base read; filters under a union fall through conservatively).
    // Spark's InferWindowGroupLimit inserts a WindowGroupLimit node
    // (its own partial top-k pushdown) — traverse it; the splice
    // drops it, which is sound: the MV already holds the ≤N rows/group.
    var belowFilter: Option[Filter] = None
    var scanOut: Option[org.apache.spark.sql.catalyst.expressions.AttributeSet] = None
    def filesOf(lr: LogicalRelation): Option[Seq[String]] =
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          Some(fs.location.inputFiles.toSeq)
        case _ => None
      }
    def walk(p: LogicalPlan): Option[Seq[String]] = p match {
      case Project(items, child)
          if items.forall(_.isInstanceOf[AttributeReference]) => walk(child)
      case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
          if wgl.limit >= k => // never admit a tighter cap than the query's
        walk(wgl.child)
      case u: org.apache.spark.sql.catalyst.plans.logical.Union
          if belowFilter.isEmpty =>
        // partitioned read: every branch a bare Project/scan chain
        def branch(b: LogicalPlan): Option[Seq[String]] = b match {
          case Project(items, child)
              if items.forall(_.isInstanceOf[AttributeReference]) =>
            branch(child)
          case lr: LogicalRelation => filesOf(lr)
          case _ => None
        }
        val per = u.children.map(branch)
        if (per.exists(_.isEmpty)) None
        else { scanOut = Some(u.outputSet); Some(per.flatMap(_.get)) }
      case fl @ Filter(_, lr: LogicalRelation) if belowFilter.isEmpty =>
        belowFilter = Some(fl); scanOut = Some(lr.outputSet); filesOf(lr)
      case lr: LogicalRelation =>
        scanOut = Some(lr.outputSet); filesOf(lr)
      case _ => None
    }
    val files = walk(w.child).getOrElse(return None).toSet
    val scanOutput = scanOut.getOrElse(return None)
    val spark = SparkSession.active
    // ---- candidates: every registration over this exact file set
    // with k <= N, each tried against the FULL gate (a base may carry
    // several top-N MVs — different groups or ordering — and only one
    // of them matches this query's window spec; stopping at the first
    // file-set match would silently miss the serving MV)
    def tryWithReg(reg: TopNReg): Option[LogicalPlan] = {
      // ---- rank() needs TIES storage: a row_number-maintained MV may
      // have cut tied rows at the storage boundary, so a rank query
      // against it could return short
      if (isRank && !reg.spec.ties) return None
      // ---- FRESHNESS: the stamp names the base's live commit
      // (parent commit for a partitioned base)
      val live = (if (graft.merge.PartitionedTable.tableExists(reg.basePath))
          graft.merge.PartitionedTable.tableCommit(reg.basePath)
        else Scd1Merge.tableCommit(reg.basePath)).getOrElse(return None)
      if (!Scd1Merge.tableBatchId(reg.mvPath)
          .contains(f"base-commit-$live%09d")) return None
      // ---- partition = the MV's group columns (bare attrs, as a set)
      val partNames = w.partitionSpec.map {
        case a: AttributeReference if scanOutput.contains(a) =>
          a.name.toLowerCase
        case _ => return None
      }.toSet
      if (partNames != reg.spec.groupCols.map(_.toLowerCase).toSet)
        return None
      // ---- order: row_number needs EXACTLY the registered
      // deterministic ordering (order column, then the base keys —
      // a different tie-break could legally select different tied
      // rows than maintenance stored); rank needs the order column
      // ALONE (rank is tie-stable: a tie-break would change nothing
      // it computes, and the stored ties set covers every tied row)
      val want: Seq[(String, Boolean)] = // (colName, descending)
        if (isRank) Seq((reg.spec.orderCol, reg.spec.desc))
        else (reg.spec.orderCol, reg.spec.desc) +:
          reg.baseKeys.map(_ -> false)
      if (w.orderSpec.size != want.size) return None
      w.orderSpec.zip(want).foreach {
        case (SortOrder(a: AttributeReference, dir, nulls, _), (name, desc))
            if a.name.equalsIgnoreCase(name) &&
              scanOutput.contains(a) &&
              dir == (if (desc) Descending else Ascending) &&
              nulls == (if (desc) NullsLast else NullsFirst) => ()
        case _ => return None
      }
      // ---- a below-window filter must read ONLY partition columns
      // (it then keeps or drops whole GROUPS, commuting with the
      // per-group top-N — the MV's stored rows for surviving groups
      // are exactly the base's)
      belowFilter.foreach { bf =>
        if (!bf.condition.deterministic) return None
        if (!bf.condition.references.subsetOf(scanOutput)) return None
        if (!bf.condition.references.forall(a =>
            reg.spec.groupCols.exists(_.equalsIgnoreCase(a.name))))
          return None
      }
      // ---- every child output column must be stored in the MV
      if (!w.child.output.forall(a =>
          reg.spec.cols.exists(_.equalsIgnoreCase(a.name)))) return None
      // ---- splice: the window's child becomes the MV read, projected
      // back to the ORIGINAL attributes (names + exprIds preserved),
      // with the below-window group filter re-applied above the
      // Project (its attrs ARE the original exprIds)
      val mvRead =
        Scd1Merge.readTable(spark, reg.mvPath).queryExecution.analyzed
      val mvByName = mvRead.output.collect {
        case a: AttributeReference => a.name.toLowerCase -> a
      }.toMap
      val items = w.child.output.map { a =>
        val src = mvByName.getOrElse(a.name.toLowerCase, return None)
        Alias(src, a.name)(exprId = a.exprId)
      }
      val mvChild: LogicalPlan = Project(items, mvRead)
      val newChild = belowFilter
        .map(bf => bf.withNewChildren(Seq(mvChild)): LogicalPlan)
        .getOrElse(mvChild)
      rewriteCount += 1
      logInfo(s"graft TOP-N rewrite: ${if (isRank) "rank" else "row_number"} " +
        s"top-$k over ${reg.basePath} answered from ${reg.mvPath} " +
        s"(n=${reg.spec.n}, ties=${reg.spec.ties}, commit $live)")
      Some(f.withNewChildren(Seq(w.withNewChildren(Seq(newChild)))))
    }
    import scala.jdk.CollectionConverters._
    // snapshot gate via the commit-keyed cache: ONE manifest-header
    // read per (registration, planning) — a re-listing only when that
    // base's commit actually moved (PlanCaches Scaladoc)
    registry.values.asScala.toSeq.sortBy(_.mvPath).view
      .filter { r =>
        k <= r.spec.n &&
          PlanCaches.liveFiles(spark, r.basePath).exists(_._2 == files)
      }
      .flatMap(tryWithReg)
      .headOption
  }
}
