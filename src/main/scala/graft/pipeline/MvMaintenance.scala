package graft.pipeline

import graft.merge.Scd1Merge
import graft.sql.GraftCatalog
import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession

/** AUTO-MAINTAINED materialized views — closing the pull-only gap:
  * a rewrite with sound freshness gates still silently falls through
  * to the full base scan the moment the base moves, and it stays
  * there until someone remembers `REFRESH MATERIALIZED VIEW`. At
  * 100 TB that fall-through IS the outage (one forgotten refresh
  * turns a dashboard into a fact scan), so maintenance must ride the
  * write path, not the operator's memory.
  *
  * Two complementary mechanisms, both built on the engine's existing
  * primitives (persisted `_graft_mv` definitions, base-commit stamps,
  * the change feed):
  *
  *  - WRITE-THROUGH (`AUTO REFRESH`): an MV flagged `auto` in its
  *    persisted definition is refreshed IMMEDIATELY AFTER every
  *    commit to its base (or, for a star MV, to any of its dims).
  *    The hook fires from the table layers' post-commit drain —
  *    after the writer's lock is released, so the base's critical
  *    section never grows — and folds exactly the new delta
  *    (O(delta), the standard refresh path). A chain MV refreshes in
  *    dependency order for free: folding MV1 commits MV1, whose own
  *    post-commit hook refreshes MV2.
  *  - SWEEP ([[refreshAllStale]]): one call refreshes every cataloged
  *    MV whose stamp lags its inputs — the janitor for crash windows
  *    (a writer that died between the base commit and the hook) and
  *    for bases written by engines without the hook. Chains converge
  *    because the sweep loops until no MV is stale (a child MV made
  *    stale by its parent's refresh is picked up in the next pass).
  *
  * CRASH CONTRACT: the hook runs AFTER the base commit, so a crash
  * between them leaves a stale-but-sound MV (the rewrite's freshness
  * gate keeps falling back to the base — never wrong answers). The
  * NEXT touch converges it: any later base commit's hook folds the
  * entire seen→live lag, and so does a sweep. Exactly-once holds
  * throughout — refresh is the stamped, replay-safe
  * [[IncrementalAgg.applyChanges]] path. */
object MvMaintenance extends Logging {

  /** MV paths auto-refreshed by THIS thread's in-flight hook cascade —
    * the cycle guard (an MV-over-MV loop would otherwise recurse). */
  private val inFlight = new ThreadLocal[Set[String]] {
    override def initialValue: Set[String] = Set.empty
  }

  /** Session-level auto registrations for engine-API users (SQL users
    * get durability via the `auto` flag in `_graft_mv`): mvPath set. */
  private val sessionAuto =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Arm `mvPath` for write-through maintenance: persist `auto=true`
    * into its definition (durable — any later session's hook sees it)
    * and arm this session. The MV must already exist with a
    * definition ([[MvDef]] / CREATE GRAFT MATERIALIZED VIEW). */
  def enableAuto(mvPath: String): Unit = {
    val d = MvDef.read(mvPath).getOrElse(throw new IllegalStateException(
      s"MvMaintenance.enableAuto: $mvPath has no _graft_mv definition"))
    if (!d.auto) MvDef.write(mvPath, d.copy(auto = true))
    sessionAuto.add(mvPath)
    armHooks()
  }

  def disableAuto(mvPath: String): Unit = {
    MvDef.read(mvPath).filter(_.auto)
      .foreach(d => MvDef.write(mvPath, d.copy(auto = false)))
    sessionAuto.remove(mvPath)
    ()
  }

  /** Install the post-commit hook (idempotent; the partitioned layer
    * routes its parent commits through the same drain). Also called
    * by the SQL CREATE path when it sees AUTO REFRESH. */
  def armHooks(): Unit =
    Scd1Merge.onCommitHook = onBaseCommit

  /** Spec hygiene: disarm the hook and forget this session's
    * registrations (persisted `auto=true` definitions are untouched —
    * a later armHooks() honors them again). */
  def reset(): Unit = {
    Scd1Merge.onCommitHook = _ => ()
    sessionAuto.clear()
  }

  /** Every known MV path: the persisted catalog inventory plus this
    * session's engine-API registrations. */
  private def knownMvs: Seq[String] =
    (GraftCatalog.basesWithMvs.flatMap(GraftCatalog.mvsOver) ++
      scala.jdk.CollectionConverters.SetHasAsScala(sessionAuto).asScala)
      .distinct.sorted

  /** The post-commit hook: refresh every AUTO MV reading `path` (as
    * base or as a star dim). Runs on the writer's thread after its
    * lock released; any failure logs and stands down — maintenance
    * must never fail the write that triggered it (the sweep converges
    * later). */
  private[graft] def onBaseCommit(path: String): Unit = {
    val spark = SparkSession.getActiveSession.getOrElse(return)
    // inFlight tracks MVs BEING REFRESHED on this thread — the cycle
    // guard (A-over-B-over-A would recurse forever). The committed
    // path itself is deliberately NOT excluded: an MV's own refresh
    // commit is exactly what cascades a CHAIN (mv2-over-mv1 refreshes
    // when mv1's refresh commits).
    knownMvs.foreach { mv =>
      if (!inFlight.get.contains(mv)) {
        val d = try MvDef.read(mv) catch { case _: Exception => None }
        val reads = d.exists(dd => dd.basePath == path ||
          dd.joins.exists(_.dimPath == path))
        val auto = d.exists(_.auto) || sessionAuto.contains(mv)
        if (reads && auto) {
          val prev = inFlight.get
          inFlight.set(prev + mv)
          try { refreshMv(spark, mv); () }
          catch { case e: Exception =>
            // stand down loudly-in-logs: the base write SUCCEEDED and
            // must not be failed by its maintenance rider; the MV is
            // stale-but-sound (freshness gate) until the next touch
            logError(s"graft auto-refresh of $mv after commit to " +
              s"$path failed (MV stays stale-but-sound)", e)
          }
          finally inFlight.set(prev)
        }
      }
    }
    // TOP-N MVs flagged auto (the `_graft_topn` auto line): fold the
    // new delta immediately — same stand-down contract. The sidecar
    // PROBE is itself isolated: one corrupt `_graft_topn` must not
    // throw out of the hook and silently skip the remaining top-N MVs
    // and the ANN maintenance for this commit.
    (graft.plans.GraftTopNRewrite.registeredMvPaths ++
      GraftCatalog.allTopNMvs).distinct.foreach { mv =>
      val wants = !inFlight.get.contains(mv) &&
        (try TopNMv.readDefFull(mv).exists(d => d._5 && d._1 == path)
         catch { case e: Exception =>
           logError(s"graft auto-refresh probe of top-N MV $mv failed " +
             "(corrupt definition? — skipped this commit)", e)
           false
         })
      if (wants) {
        val prev = inFlight.get
        inFlight.set(prev + mv)
        try { TopNMv.refresh(spark, mv); () }
        catch { case e: Exception =>
          logError(s"graft auto-refresh of top-N MV $mv after commit " +
            s"to $path failed (stays stale-but-sound)", e)
        }
        finally inFlight.set(prev)
      }
    }
    // ANN indexes registered with autoMaintain: fold the corpus
    // change-feed window and re-stamp (the codes-table commits this
    // makes re-enter the hook but match no registration — no cycle).
    // armPath first (cheap containsKey fast-path): a FRESH session's
    // first commit to a base whose persisted marker says auto=true
    // must maintain write-through without waiting for a query or a
    // sweep to arm the session registry.
    val annArmed = try graft.plans.GraftAnnRewrite.armPath(spark, path)
      catch { case e: Exception =>
        logError(s"graft ANN marker probe of $path failed " +
          "(corrupt marker? — skipped this commit)", e)
        false
      }
    if (annArmed && graft.plans.GraftAnnRewrite.isAuto(path) &&
        !inFlight.get.contains(path)) {
      val prev = inFlight.get
      inFlight.set(prev + path)
      // maintainAuto: only the write-through registrations fold — a
      // non-auto index on the same (multimodal) base opted out of
      // the write path and stays pull-maintained
      try { graft.plans.GraftAnnRewrite.maintainAuto(spark, path); () }
      catch { case e: Exception =>
        logError(s"graft auto-maintain of the ANN index over $path " +
          "failed (falls back to the exact scan until maintained)", e)
      }
      finally inFlight.set(prev)
    }
  }

  /** Refresh ONE MV from its persisted definition — the engine-level
    * body of `REFRESH MATERIALIZED VIEW` (the SQL command delegates
    * here). Folds every unseen input commit through the change feed
    * (O(delta)) and re-arms the query rewrite. Returns commits
    * applied (0 = already fresh, re-armed only). */
  def refreshMv(spark: SparkSession, mvPath: String): Long = {
    val d = MvDef.read(mvPath).getOrElse(throw new IllegalStateException(
      s"refreshMv: $mvPath has no _graft_mv definition"))
    if (d.joins.nonEmpty) {
      val applied = IncrementalJoinAgg.refreshStar(spark, mvPath,
        d.basePath, d.baseKeys, d.joins, d.spec, retain = d.retain)
      graft.plans.GraftMvRewrite.registerJoin(
        graft.plans.GraftMvRewrite.JoinMvReg(d.basePath,
          d.joins.map(j =>
            graft.plans.GraftMvRewrite.DimJoin(j.dimPath, j.fk, j.dk)),
          mvPath, d.spec))
      return applied.sum.toLong
    }
    val live =
      (if (graft.merge.PartitionedTable.tableExists(d.basePath))
         graft.merge.PartitionedTable.tableCommit(d.basePath)
       else Scd1Merge.tableCommit(d.basePath)).getOrElse(
        throw new IllegalStateException(
          s"refreshMv: base ${d.basePath} has no manifest"))
    val seen = Scd1Merge.tableBatchId(mvPath).collect {
      case s if s.startsWith("base-commit-") =>
        s.stripPrefix("base-commit-").toInt
    }.getOrElse(throw new IllegalStateException(
      s"refreshMv: $mvPath carries no base-commit stamp"))
    if (live > seen)
      IncrementalAgg.applyChanges(spark, mvPath, d.basePath, d.baseKeys,
        d.spec, fromBack = live - seen, toBack = 0,
        retainVersions = d.retain)
    graft.plans.GraftMvRewrite.register(d.basePath, mvPath, d.spec)
    math.max(0L, (live - seen).toLong)
  }

  /** Is `mvPath` stale — stamp ≠ its inputs' current commits? (The
    * SHOW MATERIALIZED VIEWS freshness probe, driver metadata only.) */
  private def isStale(mvPath: String): Boolean = {
    def commitOf(p: String): Option[Int] =
      if (graft.merge.PartitionedTable.tableExists(p))
        graft.merge.PartitionedTable.tableCommit(p)
      else Scd1Merge.tableCommit(p)
    MvDef.read(mvPath).exists { d =>
      val stamp = Scd1Merge.tableBatchId(mvPath)
      val want =
        if (d.joins.isEmpty)
          commitOf(d.basePath).map(c => f"base-commit-$c%09d")
        else for {
          cf <- commitOf(d.basePath)
          cds = d.joins.map(j => commitOf(j.dimPath))
          if cds.forall(_.isDefined)
        } yield f"fact@$cf%09d" +
          cds.flatten.map(c => f",dim@$c%09d").mkString
      want.isEmpty || stamp != want
    }
  }

  /** Refresh every cataloged MV whose stamp lags its inputs, looping
    * until the inventory is quiescent — a parent MV's refresh commits
    * it, which makes its CHILD MVs stale, which the next pass folds
    * (dependency order without computing the graph; bounded by the
    * chain depth). Then sweep the OTHER maintained artifact families
    * from DURABLE state (session registries ∪ the persisted catalog —
    * a fresh session sweeps definitions no query has touched yet):
    * top-N MVs fold their lag ([[TopNMv.refresh]] no-ops
    * when current) and ANN indexes fold their corpus
    * change-feed window
    * ([[graft.plans.GraftAnnRewrite.maintain]] — O(changed rows),
    * re-stamping the rewrite). One statement turns EVERY maintained
    * artifact fresh. Returns (path, commits-or-rows applied) for
    * every artifact actually refreshed. */
  def refreshAllStale(spark: SparkSession): Seq[(String, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    // PER-ARTIFACT failure isolation: one dangling MV (base dropped
    // but still cataloged, a corrupt sidecar) must never abort the
    // sweep — the healthy inventory still converges, the failure is
    // logged, and the broken MV is skipped THIS sweep (it stays
    // stale-but-sound; fixing or dropping it is an operator act).
    val failed = scala.collection.mutable.Set.empty[String]
    def attempt(path: String, what: String)(body: => Long): Unit =
      if (!failed.contains(path)) {
        try {
          val n = body
          if (n != 0L) out += path -> n
        } catch { case e: Exception =>
          failed += path
          logError(s"graft REFRESH ALL: $what $path failed — " +
            "skipped for this sweep (stays stale-but-sound)", e)
        }
      }
    var pass = 0
    var progressed = true
    while (progressed && pass < 16) {
      progressed = false
      knownMvs.filter(mv => !failed.contains(mv) && isStale(mv))
        .foreach { mv =>
          attempt(mv, "aggregate MV") {
            val n = refreshMv(spark, mv)
            // report even a 0-commit re-arm pass like the old sweep
            out += mv -> n
            progressed = true
            0L
          }
        }
      pass += 1
    }
    // top-N MVs: the session registry UNION the durable catalog —
    // a fresh session sweeps `_graft_topn` definitions no query has
    // touched yet (the cross-session REFRESH ALL contract)
    (graft.plans.GraftTopNRewrite.registeredMvPaths ++
      GraftCatalog.allTopNMvs).distinct.sorted.foreach { mv =>
      attempt(mv, "top-N MV")(TopNMv.refresh(spark, mv))
    }
    // ANN corpora: session registrations plus cataloged bases armed
    // directly from their persisted `_graft_ann` markers — the arming
    // PROBE isolated like the refresh bodies (one unreadable marker
    // must not fail the whole REFRESH ALL statement)
    val annBases = (graft.plans.GraftAnnRewrite.registeredBases ++
      GraftCatalog.allAnnBases.filter { b =>
        try graft.plans.GraftAnnRewrite.armPath(spark, b)
        catch { case e: Exception =>
          logError(s"graft REFRESH ALL: arming ANN base $b from its " +
            "marker failed — skipped for this sweep", e)
          false
        }
      }).distinct.sorted
    annBases.foreach { b =>
      attempt(b, "ANN index over")(
        graft.plans.GraftAnnRewrite.maintain(spark, b))
    }
    out.toSeq
  }
}
