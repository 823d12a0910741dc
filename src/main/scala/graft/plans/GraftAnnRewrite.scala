package graft.plans

import graft.merge.Scd1Merge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Descending, EqualTo, Expression, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Join, JoinHint, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{broadcast, col, round, sum}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Transparent ANN-INDEX REWRITE for vector top-k: `ORDER BY
  * vec_cosine(vecCol, <literal query>) DESC LIMIT k` over a
  * registered corpus table is answered by probing its PERSISTED
  * IVF-PQ index ([[graft.similarity.Similarity.ivfPqIndexBuild]])
  * instead of scanning every vector — the [[GraftMvRewrite]] posture
  * applied to similarity search. At 100 TB the exact plan reads the
  * whole embedding column (dim floats × corpus) per query; the
  * rewritten plan reads nprobe cells' CODE ROWS (m ints per
  * candidate) plus candFactor·k exact vectors.
  *
  * REGISTRATION IS THE OPT-IN: index-served top-k is approximate
  * (recall < 1 by design — the judged entry pins the measured
  * recall), so the rule only ever fires on a base the user explicitly
  * registered via [[register]], and every gate failure falls through
  * to the exact scan:
  *
  *  - SHAPE: `Limit(k, Sort([s DESC], Project(items, scan)))` where
  *    `s` is an output of the Project aliasing
  *    `vec_cosine(<vecCol attr>, <foldable array literal>)`, the
  *    literal's length equals the registered `dim`, and the child is
  *    one of the serving matrix's four shapes: the registered base's
  *    BARE parquet relation; a deterministic `Filter` directly over
  *    it (served by the FILTERED path below — candidates join
  *    against survivor counts with escalation, never a silent
  *    recall cliff); a `Union` of a partitioned corpus's child
  *    relations ([[tryRewriteUnion]] — per-branch candidate
  *    semi-joins preserve partition pruning); or a filtered such
  *    Union. Any other child falls through to the exact scan.
  *  - SNAPSHOT: the scan's file set equals the base's CURRENT live
  *    set — a time-travel read never rewrites.
  *  - FRESHNESS: the registration's commit stamp equals the base's
  *    current commit. A base write after the index build disables the
  *    rewrite (the index does not cover the new rows) until
  *    [[refresh]] re-stamps it — the caller's contract is to refresh
  *    only after [[graft.similarity.Similarity.ivfPqIndexUpdate]]
  *    (or a rebuild) has folded the base's new state in.
  *
  * The rewrite splices a LEFT-SEMI join against the ADC candidate set
  * UNDER the original Project — the query's own Sort/Limit and every
  * output exprId survive untouched, and the final ordering is the
  * EXACT cosine over the candidates (the probe only narrows the
  * rows). The per-query distance table is computed DRIVER-SIDE from
  * the collected model (nprobe × m × ksub doubles, KBs — the
  * broadcast-literal shape [[graft.similarity.Similarity.ivfPqTopKFromCodes]]
  * computes distributedly for query SETS), so the candidate plan is
  * one broadcast equi-join on (cell, sub, code) ints plus a
  * map-side-combinable sum — no vector math on the corpus side.
  *
  * A rewritten plan's Project child is a Join, which the SHAPE gate
  * rejects — the rule never re-fires on its own output. */
object GraftAnnRewrite extends Rule[LogicalPlan] {

  /** A registered ANN-served base: the IVF-PQ index at `indexPath`
    * covers the graft table at `basePath` as of `baseCommit` (with
    * `baseFiles` its live file set at registration — the snapshot
    * gate's reference). */
  final case class AnnReg(basePath: String, indexPath: String,
                          idCol: String, vecCol: String, dim: Int,
                          nprobe: Int, candFactor: Int,
                          baseCommit: Int, baseFiles: Set[String],
                          payloadCols: Seq[String] = Nil,
                          auto: Boolean = false,
                          driftFactor: Option[Double] = None)

  // keyed by (basePath, lowercase vector column) — a MULTIMODAL
  // corpus carries several embedding columns (text + image), each
  // with its own index; every base-level operation (maintain, sweep,
  // DROP TABLE) walks regsOf(basePath)
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, AnnReg]()

  private def regKey(basePath: String, vecCol: String): String =
    basePath + "\u0000" + vecCol.toLowerCase

  private def regsOf(basePath: String): Seq[AnnReg] = {
    import scala.jdk.CollectionConverters._
    registry.values.asScala.filter(_.basePath == basePath).toSeq
      .sortBy(_.vecCol.toLowerCase)
  }

  // ---- persistence: a `_graft_ann` marker INSIDE the corpus table
  // directory (the MvDef posture) makes the registration survive a
  // JVM restart — a later session's first matching query lazily arms
  // from disk ([[armFromDisk]]), with the per-query snapshot/
  // freshness gates still deciding whether the rewrite fires.
  private val ArmFileName = "_graft_ann"
  private val armedDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Serialize EVERY registration of `basePath` into its marker — a
    * MULTIMODAL corpus writes one block per indexed vector column,
    * separated by a bare `--` line (a single-block file is exactly
    * the legacy format, so pre-multi markers parse unchanged). */
  private def persistAll(basePath: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
    val blocks = regsOf(basePath).map { r =>
      (Seq(
        s"index=${enc(r.indexPath)}", s"id=${enc(r.idCol)}",
        s"vec=${enc(r.vecCol)}", s"dim=${r.dim}", s"nprobe=${r.nprobe}",
        s"candfactor=${r.candFactor}", s"commit=${r.baseCommit}") ++
        (if (r.payloadCols.nonEmpty)
          Seq(s"payload=${r.payloadCols.map(enc).mkString(",")}") else Nil) ++
        (if (r.auto) Seq("auto=true") else Nil) ++
        r.driftFactor.toSeq.map(f => s"driftfactor=$f"))
        .mkString("\n")
    }
    if (blocks.isEmpty) {
      Files.deleteIfExists(Paths.get(basePath, ArmFileName)); return
    }
    val body = blocks.mkString("\n--\n")
    val tmp = Paths.get(basePath, ArmFileName + ".tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(basePath, ArmFileName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** AUTO-ARM from disk: walk a scan file's ancestor directories for
    * the `_graft_ann` marker; on first touch, register with the
    * PERSISTED covered-commit stamp (and the base's current files —
    * when the live commit differs from the stamp, the freshness gate
    * falls back until an index update re-stamps). Memoized per dir. */
  // negative memo: parquet dirs already probed without a marker — a
  // miss never re-probes this session (clear() resets; a marker
  // persisted by ANOTHER session mid-flight arms after a clear() or
  // restart, which is the restart-recovery contract anyway)
  private val probedMisses =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def armFromDisk(spark: SparkSession, files: Set[String]): Unit = {
    if (files.isEmpty) return
    val f0 = files.head.stripPrefix("file:")
    if (!probedMisses.add(java.nio.file.Paths.get(f0).getParent.toString))
      return
    var dir = java.nio.file.Paths.get(f0).getParent
    var depth = 0
    while (dir != null && depth < 5) {
      if (java.nio.file.Files.exists(dir.resolve(ArmFileName))) {
        armPath(spark, dir.toString)
        return
      }
      dir = dir.getParent; depth += 1
    }
  }

  /** Arm `basePath` directly from its persisted `_graft_ann` marker
    * (no scan-file walk) — the maintenance sweep's entry point for a
    * cataloged base no query has touched yet this session. Returns
    * whether the base is registered afterwards. */
  def armPath(spark: SparkSession, basePath: String): Boolean = {
    if (regsOf(basePath).nonEmpty) return true
    val marker = java.nio.file.Paths.get(basePath, ArmFileName)
    if (!java.nio.file.Files.exists(marker)) return false
    if (armedDirs.add(basePath)) {
      // the READ sits inside the try too: an unreadable (not just
      // malformed) marker must degrade to "unarmed", never throw out
      // of a maintenance hook or sweep
      try {
        val files = corpusRead(spark, basePath).inputFiles.toSet
        // one block per indexed vector column ("--"-separated; a
        // legacy single-block file is one block)
        java.nio.file.Files.readString(marker).split("\n--\n")
          .iterator.filter(_.trim.nonEmpty).foreach { block =>
            try {
              val kv = block.split("\n").iterator.map(_.split("=", 2))
                .collect { case Array(k, v) => k -> v }.toMap
              val vec = dec(kv("vec"))
              registry.put(regKey(basePath, vec),
                AnnReg(basePath, dec(kv("index")),
                  dec(kv("id")), vec, kv("dim").toInt,
                  kv("nprobe").toInt, kv("candfactor").toInt,
                  kv("commit").toInt, files,
                  kv.get("payload").map(_.split(",").iterator
                    .filter(_.nonEmpty).map(dec).toSeq).getOrElse(Nil),
                  kv.get("auto").exists(_.toBoolean),
                  kv.get("driftfactor").map(_.toDouble)))
            } catch { case _: Exception => () } // malformed block: skip
          }
      } catch { case _: Exception => () } // unreadable marker: skip
    }
    regsOf(basePath).nonEmpty
  }

  // ---- the corpus may be FLAT or PARTITIONED (the month-partitioned
  // 100 TB corpus shape): commit = parent commit, snapshot = the
  // pin-set-resolved file union — same stamp contract either way
  private def corpusPartitioned(basePath: String): Boolean =
    graft.merge.PartitionedTable.tableExists(basePath)

  private def corpusCommit(basePath: String): Option[Int] =
    if (corpusPartitioned(basePath))
      graft.merge.PartitionedTable.tableCommit(basePath)
    else Scd1Merge.tableCommit(basePath)

  private def corpusRead(spark: SparkSession,
                         basePath: String): org.apache.spark.sql.DataFrame =
    if (corpusPartitioned(basePath))
      graft.merge.PartitionedTable.readTable(spark, basePath)
    else Scd1Merge.readTable(spark, basePath)

  /** The registration's covered base commit (None when unregistered;
    * the MINIMUM across a multimodal base's registrations — the most
    * conservative freshness answer) — what an index-maintenance job
    * diffs against the live commit to pick its change-feed window. */
  def coveredCommit(basePath: String): Option[Int] =
    regsOf(basePath).map(_.baseCommit).minOption

  /** Is any of `basePath`'s registrations WRITE-THROUGH maintained
    * ([[register]]'s `autoMaintain`) — the post-commit hook's probe. */
  def isAuto(basePath: String): Boolean =
    regsOf(basePath).exists(_.auto)

  /** The registered index location(s) serving `basePath` — the SQL
    * DROP/SHOW commands' resolver. */
  def indexPathOf(basePath: String): Option[String] =
    regsOf(basePath).headOption.map(_.indexPath)

  /** Every (vecCol, indexPath) registered over `basePath`. */
  def indexesOf(basePath: String): Seq[(String, String)] =
    regsOf(basePath).map(r => (r.vecCol, r.indexPath))

  /** The per-index auto-drift factor of one registration (None =
    * session-conf fallback governs) — spec/SHOW observability. */
  def driftFactorOf(basePath: String, vecCol: String): Option[Double] =
    Option(registry.get(regKey(basePath, vecCol))).flatMap(_.driftFactor)

  /** Every registration of `basePath` as (vecCol, indexPath,
    * coveredCommit, auto) — the SQL SHOW command's row source. */
  def registrationsOf(basePath: String): Seq[(String, String, Int, Boolean)] =
    regsOf(basePath).map(r => (r.vecCol, r.indexPath, r.baseCommit, r.auto))

  /** Registered corpus base paths — the maintenance sweep's inventory. */
  def registeredBases: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.values.asScala.map(_.basePath).toSeq.distinct.sorted
  }

  /** Opt `basePath` into index-served top-k from `indexPath`. Stamps
    * the base's CURRENT commit + file snapshot (and persists the
    * registration inside the table directory, so it survives a
    * restart): call (or [[refresh]]) only when the index covers
    * exactly that state. */
  def register(spark: SparkSession, basePath: String, indexPath: String,
               idCol: String, vecCol: String, dim: Int,
               nprobe: Int = 4, candFactor: Int = 16,
               payloadCols: Seq[String] = Nil,
               autoMaintain: Boolean = false,
               driftFactor: Option[Double] = None): Unit = {
    // arm persisted SIBLING registrations first: persistAll below
    // rewrites the whole marker from the in-memory registry, so a
    // fresh session (empty registry) registering ONE column of a
    // multimodal base would otherwise drop the other column's
    // persisted block (the SQL CREATE path was safe only because its
    // duplicate check happened to call armPath)
    armPath(spark, basePath)
    val commit = corpusCommit(basePath).getOrElse(
      throw new IllegalArgumentException(
        s"GraftAnnRewrite.register: $basePath is not a graft table"))
    val files = corpusRead(spark, basePath).inputFiles.toSet
    registry.put(regKey(basePath, vecCol),
      AnnReg(basePath, indexPath, idCol, vecCol,
        dim, nprobe, candFactor, commit, files, payloadCols, autoMaintain,
        driftFactor))
    persistAll(basePath)
    // superseded-commit escalation outcomes can never hit again —
    // free their LRU slots now
    PlanCaches.escalationEvictStale(indexPath, commit)
    if (autoMaintain) graft.pipeline.MvMaintenance.armHooks()
    // durable inventory row (no-op without a catalog root): a FRESH
    // session's maintenance sweep finds this base without waiting for
    // a query to lazily arm it
    graft.sql.GraftCatalog.putAnnBase(basePath, indexPath)
  }

  /** Re-stamp after an index update/rebuild has folded the base's
    * new commits — until then a written-to base falls back to exact.
    * A multimodal base re-stamps EVERY registration (the caller's
    * contract is that each index now covers the live state). */
  def refresh(spark: SparkSession, basePath: String): Unit = {
    val regs = regsOf(basePath)
    if (regs.isEmpty) throw new IllegalArgumentException(
      s"GraftAnnRewrite.refresh: $basePath is not registered")
    regs.foreach(r => register(spark, basePath, r.indexPath, r.idCol,
      r.vecCol, r.dim, r.nprobe, r.candFactor, r.payloadCols, r.auto,
      r.driftFactor))
  }

  /** ONE-CALL index maintenance: diff the registration's covered
    * commit against the base's live commit, fold exactly that
    * change-feed window into the persisted codes
    * ([[graft.similarity.Similarity.ivfPqIndexUpdateFromTable]] —
    * O(changed rows), per-child diffs on a partitioned corpus), and
    * re-stamp the registration so the rewrite serves again. Returns
    * change rows folded (0 = already current, a no-op). */
  def maintain(spark: SparkSession, basePath: String): Long =
    maintainWhere(spark, basePath, _ => true)

  /** The hook's variant: fold only WRITE-THROUGH (auto) registrations
    * — a non-auto index on the same multimodal base opted out of the
    * write path and stays pull-maintained. */
  private[graft] def maintainAuto(spark: SparkSession,
                                  basePath: String): Long =
    maintainWhere(spark, basePath, _.auto)

  private def maintainWhere(spark: SparkSession, basePath: String,
                            pick: AnnReg => Boolean): Long = {
    val regs = regsOf(basePath).filter(pick)
    if (regs.isEmpty) throw new IllegalArgumentException(
      s"GraftAnnRewrite.maintain: $basePath is not registered")
    // Snapshot (commit, files) CONSISTENTLY: list files, then verify
    // the commit did not move while listing (bounded retry). The
    // stamp below must be exactly what the fold covered — re-reading
    // the commit AFTER the fold would let a racing base commit be
    // stamped as covered when the codes do not contain it (the gate
    // would then serve an index missing the newest vectors: fail-
    // UNSAFE, where stamping the folded commit merely makes the
    // racing commit fall back to the exact scan until the next
    // maintain()).
    var live = -1; var files = Set.empty[String]; var tries = 0
    var consistent = false
    while (!consistent && tries < 5) {
      tries += 1
      val c1 = corpusCommit(basePath).getOrElse(
        throw new IllegalStateException(s"$basePath has no manifest"))
      files = corpusRead(spark, basePath).inputFiles.toSet
      val c2 = corpusCommit(basePath).getOrElse(-1)
      if (c1 == c2) { live = c1; consistent = true }
    }
    if (!consistent) throw new IllegalStateException(
      s"GraftAnnRewrite.maintain: $basePath is being committed to " +
      "faster than its state can be snapshotted; retry when quiescent")
    // each registration folds ITS OWN window (covered commits can
    // differ after a partial failure) and re-stamps independently
    var total = 0L
    var restamped = false
    regs.foreach { reg =>
      if (live != reg.baseCommit) {
        restamped = true
        require(live > reg.baseCommit,
          s"GraftAnnRewrite.maintain: covered commit ${reg.baseCommit} " +
          s"of ${reg.indexPath} is AHEAD of live $live — the base was " +
          "restored past the index; rebuild")
        total += graft.similarity.Similarity.ivfPqIndexUpdateFromTable(
          spark, reg.indexPath, basePath, reg.idCol, reg.vecCol,
          fromCommit = reg.baseCommit, toCommit = live,
          dim = reg.dim, batchId = f"base-commit-$live%09d",
          payloadCols = reg.payloadCols)
        // stamp EXACTLY the folded commit + its snapshot — never the
        // current commit, which may already be past what was folded
        registry.put(regKey(basePath, reg.vecCol),
          reg.copy(baseCommit = live, baseFiles = files))
        PlanCaches.escalationEvictStale(reg.indexPath, live)
        autoDriftProbe(spark, basePath, reg, reg.baseCommit, live)
      }
    }
    if (restamped) persistAll(basePath)
    total
  }

  /** AUTO DRIFT-TRIGGERED RETRAIN (per-index `driftFactor` — the
    * CREATE statement's `OPTIONS (driftfactor=…)`, persisted in the
    * marker block — with conf
    * `spark.graft.ann.autoDriftResidualFactor` as the session-wide
    * fallback; neither set = off): until now drift repair was
    * PULL-only — a continuously-ingesting corpus served from a
    * drifting model until someone issued REFRESH (the judged drift
    * fixture reads recall 0.64 before repair). With a factor set,
    * every FOLDED maintenance window also answers "did this batch
    * land far from the trained centroids?" at O(folded rows) cost
    * ([[graft.similarity.Similarity.ivfPqBatchMeanResidual]] — never
    * the corpus-wide stats job): when the window's mean residual
    * reaches `factor ×` the trained-time baseline, the SCOPED repair
    * ([[graft.similarity.Similarity.ivfPqIndexMaintainScoped]]) runs
    * — its own global monitor + per-cell localization decide
    * none/scoped/full, and both baselines refresh so the next window
    * compares against the repaired state. Non-drifted commits pay the
    * batch-sized probe plus one stats read; a probe failure degrades
    * to "no repair", never fails the maintain. Model geometry
    * (nlist/m/ksub) is derived from the cached model — no extra
    * registration state. */
  private def autoDriftProbe(spark: SparkSession, basePath: String,
                             reg: AnnReg, fromCommit: Int,
                             toCommit: Int): Unit = {
    val factorOpt = reg.driftFactor.orElse {
      val s = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.ann.autoDriftResidualFactor", "").trim
      if (s.isEmpty) None else s.toDoubleOption
    }
    if (factorOpt.isEmpty) return
    try {
      val factor = factorOpt.get
      val sim = graft.similarity.Similarity
      val changes = (if (corpusPartitioned(basePath))
          graft.merge.PartitionedTable.readChangesAtCommits(spark, basePath,
            fromCommit, toCommit)
        else Scd1Merge.readChangesAtCommits(spark, basePath,
          Scd1Merge.tableKeys(basePath).getOrElse(Seq(reg.idCol)),
          fromCommit, toCommit))
        .filter(org.apache.spark.sql.functions.col("_change_type")
          .isin("insert", "update"))
      val windowMean = sim.ivfPqBatchMeanResidual(spark, reg.indexPath,
        changes, reg.idCol, reg.vecCol)
      val (_, baseResidual) = sim.ivfPqIndexBaseline(spark, reg.indexPath)
      lastAutoDriftProbe = windowMean.map((_, baseResidual))
      if (windowMean.exists(_ >= baseResidual * factor)) {
        val (cents, books) = PlanCaches.annModel(spark, reg.indexPath)
        val action = sim.ivfPqIndexMaintainScoped(spark, reg.indexPath,
          corpusRead(spark, basePath), reg.idCol, reg.vecCol,
          nlist = cents.length, m = books.length, ksub = books.head.length,
          iters = 2, dim = reg.dim, batchId = f"drift-$toCommit%09d")
        if (action != "none") {
          autoDriftRepairs += 1
          logInfo(s"graft ANN auto drift repair: window residual " +
            s"${windowMean.get} ≥ $factor × baseline $baseResidual on " +
            s"${reg.indexPath} — $action repair ran")
        }
      }
    } catch { case e: Exception =>
      logWarning(s"graft ANN auto drift probe failed on " +
        s"${reg.indexPath} (serving unaffected): ${e.getMessage}")
    }
  }

  /** Scoped/full repairs the auto drift probe has triggered this
    * session — spec observability. */
  @volatile var autoDriftRepairs: Long = 0L

  /** The last probe's (window mean residual, trained-time baseline)
    * — spec observability. */
  @volatile var lastAutoDriftProbe: Option[(Double, Double)] = None

  /** QUERY-SET serving — batch k-NN from the registered index: the
    * single-vector rewrite admits one foldable literal, but offline
    * jobs (recommendation backfills, eval sweeps, dedup passes) carry
    * HUNDREDS of query vectors, and planning them one-by-one would
    * pay per-query planning and per-query probes. This entry point
    * gates exactly like the rewrite (registration + freshness) and
    * lowers onto
    * [[graft.similarity.Similarity.ivfPqTopKFromCodes]]'s DISTRIBUTED
    * distance-table shape: ONE broadcast of all queries' per-cell
    * tables, ONE equi-join over the persisted codes, one exact
    * re-rank — cost amortizes across the whole set, zero per-query
    * planning. A stale or unregistered base answers with the exact
    * top-k instead (never wrong, the [[apply]] fallback contract);
    * [[lastBatchServedFromIndex]] records which path ran.
    *
    * `queries`: a DataFrame carrying the registered id and vector
    * columns (broadcast — keep it query-set-sized). Output:
    * (query_id, rank, vec_id, cos_sim). A STALE base answers with the
    * exact top-k instead (never wrong); an UNREGISTERED base is a
    * loud error (there is no index to serve from — exact batch top-k
    * is [[graft.similarity.Similarity.topK]]).
    *
    * `filterSql`: an optional metadata predicate (SQL text over
    * corpus columns). Conjuncts over payload-DECLARED columns push
    * into the codes scan — every query's candidates are then drawn
    * from covered-admissible vectors only (the single-query
    * payload-pushdown story, amortized across the set); RESIDUAL
    * conjuncts (undeclared columns) are enforced by the exact re-rank
    * and can under-fill, which the fill-k repair below absorbs. A
    * predicate with NO covered conjunct filters the EXACT batch
    * answer instead (unconstrained candidates under a selective
    * undeclared predicate would under-fill most of the set — the
    * repair would degenerate to the exact scan anyway; at 100 TB,
    * declare at least one selective column).
    *
    * FILL-K REPAIR (the batch analogue of the single-query
    * escalation): after each distributed serve, per-query result
    * counts (result-sized work) name the under-filled queries; ONLY
    * those re-serve at doubled widths (nprobe toward nlist, then
    * candFactor), and an irreducible remainder — probed cells or the
    * covered candidate pool genuinely holding fewer than k
    * admissible matches — answers EXACTLY over the filtered corpus,
    * restricted to just those queries. The batch is therefore never
    * short while [[lastBatchServedFromIndex]] reads true, and repair
    * work is (under-filled subset)-sized, never set-sized. */
  def topKBatch(spark: SparkSession, basePath: String,
                queries: org.apache.spark.sql.DataFrame,
                k: Int,
                filterSql: Option[String] = None,
                vecCol: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    armPath(spark, basePath)
    val regs = regsOf(basePath)
    val reg = vecCol match {
      case Some(v) => regs.find(_.vecCol.equalsIgnoreCase(v)).getOrElse(
        throw new IllegalArgumentException(
          s"GraftAnnRewrite.topKBatch: $basePath has no index on '$v' " +
          s"(indexed: ${regs.map(_.vecCol).mkString(", ")})"))
      case None => regs match {
        case Seq(one) => one
        case Nil => throw new IllegalArgumentException(
          s"GraftAnnRewrite.topKBatch: $basePath is not registered")
        case many => throw new IllegalArgumentException(
          s"GraftAnnRewrite.topKBatch: $basePath has " +
          s"${many.size} indexed vector columns " +
          s"(${many.map(_.vecCol).mkString(", ")}) — name one")
      }
    }
    val corpus0 = corpusRead(spark, basePath)
    val corpus = filterSql.map(corpus0.filter).getOrElse(corpus0)
    // split the (resolved) predicate into payload-covered conjuncts
    // and the residual — exactly the single-query partial-pushdown
    // partition
    val conjuncts: Seq[Expression] = filterSql.toSeq.flatMap { f =>
      corpus0.filter(f).queryExecution.analyzed.collectFirst {
        case flt: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          conjunctsOf(flt.condition)
      }.getOrElse(Nil)
    }
    val (covered, residual) = conjuncts.partition(c =>
      reg.payloadCols.nonEmpty && c.references.nonEmpty &&
        c.references.forall(a =>
          reg.payloadCols.exists(_.equalsIgnoreCase(a.name))))
    val servable = filterSql.isEmpty ||
      (conjuncts.nonEmpty && covered.nonEmpty)
    lastBatchEscalations = 0
    lastBatchUnderfilled = 0
    lastBatchPartial = false
    if (servable && corpusCommit(basePath).contains(reg.baseCommit)) {
      lastBatchServedFromIndex = true
      lastBatchPartial = covered.nonEmpty && residual.nonEmpty
      val (cents, books) = PlanCaches.annModel(spark, reg.indexPath)
      val codes0 = graft.similarity.Similarity.readCodes(spark, reg.indexPath)
      val codes =
        if (covered.isEmpty) codes0
        else codes0.filter(canonPred(covered.reduce(And)))
      val rowsEst = (if (corpusPartitioned(basePath))
          graft.merge.PartitionedTable.tableRowsEstimate(basePath)
        else Scd1Merge.tableRowsEstimate(basePath))
        .getOrElse(Long.MaxValue)
      var np = reg.nprobe
      var cf = reg.candFactor
      // the still-under-filled query subset (ids collected: the
      // queries DataFrame is query-set-sized by contract)
      var pending = queries
      var pendingIds: Seq[Any] =
        queries.select(col(reg.idCol)).collect().map(_.get(0)).toSeq
      var acc: Option[org.apache.spark.sql.DataFrame] = None
      var rounds = 0
      var out: org.apache.spark.sql.DataFrame = null
      while (out == null) {
        // persist the round's answer (RESULT-sized: ≤ pending×k rows
        // — bounded, unlike the probe intermediates): the fill-count
        // job below and every caller action then read the cached rows
        // instead of re-running the ADC join + re-rank; unreferenced
        // frames are reclaimed by Spark's ContextCleaner
        val served = graft.similarity.Similarity.ivfPqTopKFromCodes(
          corpus, pending, reg.idCol, reg.vecCol, k, cents, books, codes,
          np, reg.dim, cf)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cnts = served.groupBy(col("query_id"))
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("__n"))
          .collect().map(r => r.get(0) -> r.getLong(1)).toMap
        val under = pendingIds.filterNot(id => cnts.getOrElse(id, 0L) >= k)
        val keep =
          if (under.isEmpty) served
          else served.filter(!col("query_id").isin(under: _*))
        acc = Some(acc.map(_.unionByName(keep)).getOrElse(keep))
        if (under.isEmpty) out = acc.get
        else {
          val exhaustive = np >= cents.length && cf.toLong * k >= rowsEst
          if (exhaustive || rounds >= 6) {
            // irreducible remainder (or widening budget spent): the
            // EXACT answer over the filtered corpus for JUST these
            // queries — never a short batch (persisted: the exact
            // scan must not replay on every caller action either)
            lastBatchUnderfilled = under.size
            out = acc.get.unionByName(graft.similarity.Similarity.topK(
                corpus, pending.filter(col(reg.idCol).isin(under: _*)),
                reg.idCol, reg.vecCol, k)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          } else {
            pending = pending.filter(col(reg.idCol).isin(under: _*))
            pendingIds = under
            if (np < cents.length) np = math.min(cents.length, np * 2)
            else cf *= 2
            rounds += 1
            lastBatchEscalations += 1
          }
        }
      }
      out
    } else {
      // stale index, or a predicate with no pushable conjunct: the
      // exact batch answer, never a wrong or short one
      lastBatchServedFromIndex = false
      graft.similarity.Similarity.topK(corpus, queries,
        reg.idCol, reg.vecCol, k)
    }
  }

  /** Did the last [[topKBatch]] serve from the index (vs the exact
    * fallback) — spec/judged-entry observability. */
  @volatile var lastBatchServedFromIndex: Boolean = false

  /** Widening rounds the last [[topKBatch]] ran for under-filled
    * queries — spec/judged-entry observability. */
  @volatile var lastBatchEscalations: Int = 0

  /** Queries the last [[topKBatch]] repaired with exact answers after
    * widening was exhausted — spec/judged-entry observability. */
  @volatile var lastBatchUnderfilled: Int = 0

  /** Did the last [[topKBatch]] push covered conjuncts while
    * escalating a residual (the mixed-predicate mode) —
    * spec/judged-entry observability. */
  @volatile var lastBatchPartial: Boolean = false

  /** Remove EVERY registration of `basePath`, its persisted marker,
    * and its catalog inventory row. */
  def unregister(basePath: String): Unit = {
    regsOf(basePath).foreach(r =>
      registry.remove(regKey(basePath, r.vecCol)))
    armedDirs.remove(basePath)
    try java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(basePath, ArmFileName))
    catch { case _: Exception => () }
    graft.sql.GraftCatalog.removeAnnBase(basePath)
  }

  /** Remove ONE vector column's registration; the marker re-persists
    * with the remaining blocks (deleted when none remain). Returns
    * whether anything was removed. */
  def unregisterCol(basePath: String, vecCol: String): Boolean = {
    val removed =
      registry.remove(regKey(basePath, vecCol)) != null
    if (removed) {
      if (regsOf(basePath).isEmpty) {
        armedDirs.remove(basePath)
        try java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(basePath, ArmFileName))
        catch { case _: Exception => () }
        graft.sql.GraftCatalog.removeAnnBase(basePath)
      } else persistAll(basePath)
    }
    removed
  }

  /** Session-state reset (registrations persisted on disk re-arm on
    * first touch — the restart simulation specs use exactly this).
    * Also drops the plan-time caches: a spec recreating a table at
    * the SAME path could otherwise collide on commit numbers. */
  def clear(): Unit = {
    registry.clear(); armedDirs.clear(); probedMisses.clear()
    PlanCaches.clear()
  }

  /** Rewrites applied since session start — plan-pin observability. */
  @volatile var rewriteCount: Long = 0L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan transformUp {
      case gl @ GlobalLimit(Literal(k: Int, _),
          LocalLimit(_, srt @ Sort(
            Seq(SortOrder(sref: AttributeReference, Descending, _, _)),
            true, child, _))) if k > 0 =>
        (child match {
          case proj: Project => tryRewrite(k, sref, proj)
          case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
            tryRewriteUnion(k, sref, u)
          case _ => None
        }).map { newChild =>
          gl.withNewChildren(Seq(gl.child.withNewChildren(
            Seq(srt.withNewChildren(Seq(newChild))))))
        }.getOrElse(gl)
    }
  }

  private def cosine(a: Array[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** One cell's ADC distance-table rows: d²(query residual sub,
    * codeword) for every (sub, code). */
  private def cellDtRows(qv: Array[Float], cents: Array[Seq[Float]],
                         books: Array[Array[Seq[Float]]],
                         cell: Int): Seq[(Int, Int, Int, Double)] = {
    val mSub = books.length
    val dsub = qv.length / mSub
    val rq = qv.indices.map(i => qv(i) - cents(cell)(i))
    for {
      sub <- 0 until mSub
      sv = rq.slice(sub * dsub, (sub + 1) * dsub)
      (cw, code) <- books(sub).zipWithIndex
    } yield {
      var d2 = 0.0; var i = 0
      while (i < dsub) {
        val d = sv(i) - cw(i).toDouble; d2 += d * d; i += 1
      }
      (cell, sub, code, d2)
    }
  }

  /** The per-query ADC distance table rows for `nprobe` cells —
    * driver-side KBs, computed ONCE per rewrite attempt. */
  private def distanceRows(qv: Array[Float], cents: Array[Seq[Float]],
                           books: Array[Array[Seq[Float]]],
                           nprobe: Int): Seq[(Int, Int, Int, Double)] = {
    val probed = cents.zipWithIndex
      .map { case (c, i) => (cosine(qv, c), i) }
      .sortBy { case (s, i) => (-s, i) }.take(nprobe).map(_._2)
    probed.toSeq.flatMap(cellDtRows(qv, cents, books, _))
  }

  /** PER-CELL DISTANCE-TABLE PRUNING — what lets payload-pushdown
    * probes survive nlist ≫ [[FullProbeMaxCells]] with a BOUNDED
    * broadcast (SCALE.md's named lift for the full-width cap):
    * preselect 4·width cells by query-centroid cosine (O(nlist·dim),
    * the standard coarse ranking), compute THEIR distance tables,
    * then keep only the `width` cells whose best-case ADC bound
    * L(cell) = Σ_sub min_code d²(residual_sub, codeword) is smallest
    * — a vector in a pruned cell has quantized distance ≥ L(cell) ≥
    * every kept cell's bound, so the cells least able to place a
    * candidate in the top-k are dropped BEFORE the broadcast is
    * built. The table stays ≤ width·m·ksub rows regardless of nlist;
    * fill-k stays guaranteed because the pushdown paths that use this
    * run under survivor-count escalation (width doubles toward nlist
    * if the kept cells under-fill). */
  private def distanceRowsPruned(qv: Array[Float], cents: Array[Seq[Float]],
                                 books: Array[Array[Seq[Float]]],
                                 width: Int): Seq[(Int, Int, Int, Double)] = {
    val pre = cents.zipWithIndex
      .map { case (c, i) => (cosine(qv, c), i) }
      .sortBy { case (s, i) => (-s, i) }
      .take(math.min(cents.length, 4 * width)).map(_._2)
    val withBounds = pre.map { cell =>
      val rows = cellDtRows(qv, cents, books, cell)
      val lower = rows.groupBy(_._2).valuesIterator
        .map(_.iterator.map(_._4).min).sum
      (lower, cell, rows)
    }
    withBounds.sortBy { case (l, cell, _) => (l, cell) }
      .take(width).flatMap(_._3).toSeq
  }

  /** Candidate-id plan: broadcast the distance table onto the
    * persisted code rows, top candFactor·k by quantized ADC. Built
    * FRESH per call site — every splice needs its own exprIds (a
    * reused subtree in two union branches would self-conflict). The
    * OPTIMIZED subtree (not analyzed): the outer optimizer has
    * already run EliminateResolvedHint, so a spliced analyzed tree
    * would reach the planner with a raw ResolvedHint — internal
    * error. */
  private def candsPlanFromRows(spark: SparkSession, indexPath: String,
                                dtRows: Seq[(Int, Int, Int, Double)],
                                k: Int, candFactor: Int,
                                payloadPredSql: Option[String] = None)
      : LogicalPlan = {
    import spark.implicits._
    lastDistanceTableCells = dtRows.iterator.map(_._1).toSet.size
    val dt = dtRows.toDF("__cluster", "sub", "code", "__d2")
    val codes0 = graft.similarity.Similarity.readCodes(spark, indexPath)
    // payload pushdown: the predicate prunes code rows BEFORE the
    // ADC join — a vector's m rows carry identical payload values,
    // so vectors are kept or dropped whole and the sum stays total.
    // Catalyst pushes the filter into the parquet scan.
    val codes = payloadPredSql.map(codes0.filter).getOrElse(codes0)
    codes
      .join(broadcast(dt), Seq("__cluster", "sub", "code"))
      .groupBy(col("vec_id"))
      // 1e-9-quantized ADC sums: partial-agg-order independence (the
      // ivfPqTopKFromCodes argument)
      .agg(round(sum(col("__d2")) * 1e9).cast("long").as("__adq"))
      .orderBy(col("__adq").asc, col("vec_id").asc)
      .limit(k * candFactor)
      .select(col("vec_id"))
      .queryExecution.optimizedPlan
  }

  /** The UNION shape — a PARTITIONED corpus read (one Project +
    * child scan per partition, unioned): every branch must compute
    * the SAME `vec_cosine(vecCol, literal)` at the sort column's
    * POSITION (union output is positional), the union's file set must
    * be the registered base's pin-resolved snapshot, and the splice
    * narrows EACH branch with its own candidate semi-join (fresh
    * exprIds per branch). Cost at 100 TB: the per-month scans each
    * shrink to their candidates' rows; the index is one corpus-wide
    * code table, maintained through the partitioned change feed. */
  private def tryRewriteUnion(k: Int, sref: AttributeReference,
      u: org.apache.spark.sql.catalyst.plans.logical.Union)
      : Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    // branches: Project over a scan, optionally through ONE Filter —
    // a predicate over a partitioned read pushes down into EVERY
    // union branch, so the FILTERED partitioned top-k appears as the
    // same (canonically equal) condition per branch
    val branches: Seq[(Project, Option[Filter], LogicalRelation)] =
      u.children.map {
        case p @ Project(_, lr: LogicalRelation) => (p, None, lr)
        case p @ Project(_, f @ Filter(_, lr: LogicalRelation)) =>
          (p, Some(f), lr)
        case _ => return None
      }
    def filesOf(lr: LogicalRelation): Option[Seq[String]] = lr.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        Some(fs.location.inputFiles.toSeq)
      case _ => None
    }
    val perBranch = branches.map(b => filesOf(b._3))
    if (perBranch.exists(_.isEmpty)) return None
    val files = perBranch.flatMap(_.get).toSet
    val spark = SparkSession.active
    var cands = candidateRegs(files)
    if (cands.isEmpty) {
      armFromDisk(spark, files)
      cands = candidateRegs(files)
      if (cands.isEmpty) return None
    }
    val p = u.output.indexWhere(_.exprId == sref.exprId)
    if (p < 0) return None
    // the sorted union column picks WHICH index serves (one
    // registration per vector column on a multimodal base): every
    // branch's p-th item must be vec_cosine(that reg's vecCol, the
    // SAME dim-length literal)
    def branchQv(proj: Project, scan: LogicalRelation,
                 r: AnnReg): Option[Array[Float]] =
      proj.projectList(p) match {
        case Alias(graft.functions.CosineSimilarity(
            v: AttributeReference, q), _)
            if v.name.equalsIgnoreCase(r.vecCol) &&
              scan.outputSet.contains(v) && q.foldable =>
          q.dataType match {
            case ArrayType(FloatType, _) =>
              Option(q.eval().asInstanceOf[ArrayData]).map(_.toFloatArray())
            case _ => None
          }
        case _ => None
      }
    val (reg, qv) = cands.iterator.flatMap { r =>
      val qvs = branches.map { case (proj, _, scan) => branchQv(proj, scan, r) }
      if (qvs.exists(_.isEmpty)) None
      else {
        val arrs = qvs.map(_.get)
        if (arrs.exists(_.length != r.dim) ||
            arrs.exists(a => !java.util.Arrays.equals(a, arrs.head))) None
        else Some(r -> arrs.head)
      }
    }.nextOption().getOrElse(return None)
    if (!corpusCommit(reg.basePath).contains(reg.baseCommit))
      return None
    // FILTER gates: all branches or none; the SAME canonical
    // condition everywhere (exprIds differ per branch — compare the
    // qualifier-stripped lowercase rendering); deterministic,
    // branch-scan columns only, never the vector column
    val isFiltered = branches.forall(_._2.isDefined)
    if (!isFiltered && branches.exists(_._2.isDefined)) return None
    if (isFiltered) {
      if (branches.map(b => canonPred(b._2.get.condition)).distinct.size != 1)
        return None
      branches.foreach { case (_, fl, scan) =>
        val cond = fl.get.condition
        if (!cond.deterministic) return None
        if (!cond.references.subsetOf(scan.outputSet)) return None
        if (cond.references.exists(_.name.equalsIgnoreCase(reg.vecCol)))
          return None
      }
    }
    val (cents, books) = PlanCaches.annModel(spark, reg.indexPath)
    // per-branch splice at a given probe width: the branch's own
    // Filter (if any) stays ABOVE its candidate semi-join, so the
    // final answer is the exact cosine top-k over (cands ∩ predicate)
    def childrenFor(nprobe: Int, candFactor: Int,
                    predSql: Option[String] = None)
        : Option[Seq[LogicalPlan]] = {
      val dtRows =
        if (predSql.nonEmpty && nprobe < cents.length &&
            cents.length > FullProbeMaxCells)
          distanceRowsPruned(qv, cents, books, nprobe)
        else distanceRows(qv, cents, books, nprobe)
      Some(branches.map { case (proj, flOpt, scan) =>
        val idAttr = scan.output.find(_.name.equalsIgnoreCase(reg.idCol))
          .getOrElse(return None)
        val cp = candsPlanFromRows(spark, reg.indexPath, dtRows, k,
          candFactor, predSql)
        val join = Join(scan, cp, LeftSemi,
          Some(EqualTo(idAttr, cp.output.head)), JoinHint.NONE)
        proj.withNewChildren(Seq(
          flOpt.map(fl => fl.withNewChildren(Seq(join)): LogicalPlan)
            .getOrElse(join)))
      })
    }
    if (!isFiltered) {
      val newChildren = childrenFor(reg.nprobe, reg.candFactor)
        .getOrElse(return None)
      rewriteCount += 1
      logInfo(s"graft ANN rewrite: top-$k over PARTITIONED " +
        s"${reg.basePath} (${branches.size} partitions) served from " +
        s"${reg.indexPath} (commit ${reg.baseCommit})")
      return Some(u.withNewChildren(newChildren))
    }
    // ---- FILTERED partitioned: split into payload-COVERED conjuncts
    // and the RESIDUAL, exactly like the flat path. Fully covered →
    // full-width pushdown with zero plan-time jobs; partially covered
    // → push the covered part and escalate only the residual
    // (candFactor-only widening, candidate-sized counts); nothing
    // covered → generic escalation. Each branch's own Filter stays
    // above its semi-join (exactness) in every mode.
    val fCond = branches.head._2.get.condition
    val (covered, residual) = conjunctsOf(fCond).partition(c =>
      reg.payloadCols.nonEmpty && c.references.forall(a =>
        reg.payloadCols.exists(_.equalsIgnoreCase(a.name))))
    val fullyCovered = covered.nonEmpty && residual.isEmpty
    val partialCovered = covered.nonEmpty && residual.nonEmpty
    if (fullyCovered && cents.length <= FullProbeMaxCells) {
      try childrenFor(cents.length, reg.candFactor,
          Some(canonPred(fCond))) match {
        case Some(kids) =>
          lastFilteredEscalations = 0
          lastPayloadPushdowns += 1
          rewriteCount += 1
          logInfo(s"graft ANN rewrite: PAYLOAD-filtered top-$k over " +
            s"PARTITIONED ${reg.basePath} served from ${reg.indexPath} " +
            s"(full-width probe over ${cents.length} cells, 0 escalations)")
          return Some(u.withNewChildren(kids))
        case None => () // malformed branch: generic path decides
      } catch { case _: Exception => () } // pushdown error: fall back
    }
    // pushdown-with-escalation modes: PARTIAL (covered conjuncts ride
    // into every branch's candidate plan, residual escalates) and
    // PRUNED-FULL (fully covered but the model exceeds the broadcast
    // cap — pruned per-cell tables, survivor-counted). The loop below
    // starts at the widest bounded probe and widens candFactor after
    // nprobe tops out.
    val pushMode = partialCovered ||
      (fullyCovered && cents.length > FullProbeMaxCells)
    val partial = partialCovered
    val pushSql =
      if (!pushMode) None
      else Some(canonPred(
        if (partial) covered.reduce(And) else fCond))
    val nprobe0 =
      if (pushMode) math.min(cents.length, FullProbeMaxCells)
      else reg.nprobe
    val escKey = PlanCaches.EscKey(reg.indexPath, reg.baseCommit,
      canonPred(branches.head._2.get.condition) +
        s"|np0=$nprobe0,cf0=${reg.candFactor}" +
        (if (partial) "|partial"
         else if (pushMode) "|prunedfull" else ""),
      k, PlanCaches.qvHash(qv))
    def countPartial(): Unit = if (pushMode) {
      lastPayloadPushdowns += 1
      if (partial) lastPartialPushdowns += 1
    }
    PlanCaches.escalationHit(escKey).foreach { case (np, cf) =>
      lastFilteredEscalations = 0
      escalationCacheHits += 1
      val kids = childrenFor(np, cf, pushSql).getOrElse(return None)
      rewriteCount += 1
      countPartial()
      logInfo(s"graft ANN rewrite: FILTERED top-$k over PARTITIONED " +
        s"${reg.basePath} served from ${reg.indexPath} at CACHED " +
        s"escalation widths (nprobe=$np, candFactor=$cf)")
      return Some(u.withNewChildren(kids))
    }
    val deadline = System.nanoTime() + escalationBudgetNanos
    val rowsEst = graft.merge.PartitionedTable
      .tableRowsEstimate(reg.basePath).getOrElse(Long.MaxValue)
    val target = math.min(OverFetch.toLong * k, math.max(k.toLong, rowsEst))
    var nprobe = nprobe0
    var candFactor = reg.candFactor
    var rounds = 0
    lastFilteredEscalations = 0
    var fallback: Option[Seq[LogicalPlan]] = None
    var fallbackWidths: Option[(Int, Int)] = None
    def serveFallback(): Option[LogicalPlan] = {
      fallbackWidths.foreach(w =>
        PlanCaches.escalationPut(escKey, w._1, w._2))
      fallback.map { ks =>
        rewriteCount += 1; countPartial(); u.withNewChildren(ks)
      }
    }
    while (rounds < 12) {
      val kids = childrenFor(nprobe, candFactor, pushSql)
        .getOrElse(return None)
      val exhaustive = nprobe >= cents.length &&
        candFactor.toLong * k >= rowsEst
      val survivors =
        if (exhaustive) target
        else org.apache.spark.sql.GraftExpressionBridge
          .ofRows(spark, u.withNewChildren(kids)).count()
      if (survivors >= target) {
        rewriteCount += 1
        countPartial()
        logInfo(s"graft ANN rewrite: FILTERED top-$k over PARTITIONED " +
          s"${reg.basePath} served from ${reg.indexPath} " +
          s"(nprobe=$nprobe, candFactor=$candFactor, $survivors " +
          s"survivors, ${lastFilteredEscalations} escalations" +
          s"${if (partial) ", covered conjuncts pushed" else ""})")
        PlanCaches.escalationPut(escKey, nprobe, candFactor)
        return Some(u.withNewChildren(kids))
      }
      if (survivors >= k) {
        fallback = Some(kids)
        fallbackWidths = Some((nprobe, candFactor))
      }
      if (System.nanoTime() > deadline) return serveFallback()
      if (nprobe < cents.length)
        nprobe = math.min(cents.length, nprobe * 2)
      else if (candFactor < (1 << 16)) candFactor *= 2
      else return serveFallback()
      rounds += 1
      lastFilteredEscalations += 1
    }
    serveFallback()
  }

  /** The Project-level rewrite: locate the sort column's
    * `vec_cosine(vecCol, literal)` alias, gate, and splice the
    * candidate semi-join under the (otherwise untouched) Project.
    *
    * FILTERED top-k (`WHERE <metadata pred> ORDER BY vec_cosine DESC
    * LIMIT k` — the dominant production vector-search shape): admitted
    * when ONE deterministic Filter sits between the Project and the
    * scan and references only non-vector scan columns. The predicate
    * changes which vectors are admissible, so a fixed candidate set
    * can UNDER-FILL (fewer than k survivors) — the rewrite therefore
    * probes with ESCALATION at plan time: serve candFactor·k
    * candidates, count survivors under the predicate (a driver-run
    * job over the candidate-sized semi-join), and double nprobe (to
    * nlist) then candFactor until k survive; when the candidate set
    * provably covers the whole corpus (nprobe = nlist and
    * candFactor·k ≥ the manifest row count) the rewrite is EXACT and
    * serves regardless; an exhausted escalation falls back to the
    * exact scan rather than returning short. The splice keeps the
    * query's own Filter node — candidates only narrow the rows, so
    * the final answer is the exact cosine top-k over (candidates ∩
    * predicate). For a PERMANENTLY selective predicate column the
    * scale answer beyond escalation is payload pushdown — carry the
    * filter column into the code table so survivors count inside the
    * probe itself; future work, the escalation is the general
    * mechanism. */
  private def tryRewrite(k: Int, sref: AttributeReference,
                         proj: Project): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    // the scan: the registered base's bare relation — or ONE Filter
    // over it — at the current snapshot
    val (scan, filterOpt) = proj.child match {
      case lr: LogicalRelation => (lr, None)
      case f @ Filter(_, lr: LogicalRelation) => (lr, Some(f))
      case _ => return None
    }
    val files = scan.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.inputFiles.toSet
      case _ => return None
    }
    var cands = candidateRegs(files)
    if (cands.isEmpty) {
      // a registration persisted by an earlier session arms lazily
      armFromDisk(SparkSession.active, files)
      cands = candidateRegs(files)
      if (cands.isEmpty) return None
    }
    // the sort column picks WHICH index serves: a MULTIMODAL base has
    // one registration per vector column, and the query's
    // vec_cosine(<col>, literal) names exactly one of them
    val (reg, qv) = cands.iterator
      .flatMap(r => extractQv(proj, sref, scan, r).map(r -> _))
      .nextOption().getOrElse(return None)
    // FRESHNESS: the stamp must name the base's live commit
    if (!corpusCommit(reg.basePath).contains(reg.baseCommit))
      return None
    // FILTER gates: deterministic, scan-column-only, and never the
    // vector column itself (a predicate READING the vectors could
    // admit rows by vector content the probe never saw; metadata
    // predicates only narrow the candidate→survivor step)
    filterOpt.foreach { f =>
      if (!f.condition.deterministic) return None
      if (!f.condition.references.subsetOf(scan.outputSet)) return None
      if (f.condition.references.exists(
          _.name.equalsIgnoreCase(reg.vecCol))) return None
    }
    val idAttr = scan.output.find(_.name.equalsIgnoreCase(reg.idCol))
      .getOrElse(return None)
    val spark = SparkSession.active
    // ---- the candidate plan: driver-side distance table (KBs),
    // broadcast onto the persisted code rows, top candFactor·k by ADC.
    // Model via the commit-keyed cache — collect jobs only when a
    // retrain/rebuild actually moved the model tables
    val (cents, books) = PlanCaches.annModel(spark, reg.indexPath)
    def candsPlanFor(nprobe: Int, candFactor: Int,
                     predSql: Option[String] = None): LogicalPlan = {
      // pushdown probes over LARGE models use the PRUNED table: the
      // broadcast stays ≤ nprobe·m·ksub rows no matter the nlist,
      // with the kept cells chosen by best-case ADC bound
      val rows =
        if (predSql.nonEmpty && nprobe < cents.length &&
            cents.length > FullProbeMaxCells)
          distanceRowsPruned(qv, cents, books, nprobe)
        else distanceRows(qv, cents, books, nprobe)
      candsPlanFromRows(spark, reg.indexPath, rows, k, candFactor, predSql)
    }
    def splice(candsPlan: LogicalPlan): LogicalPlan = {
      val join = Join(scan, candsPlan, LeftSemi,
        Some(EqualTo(idAttr, candsPlan.output.head)), JoinHint.NONE)
      rewriteCount += 1
      proj.withNewChildren(Seq(
        filterOpt.map(f => f.withNewChildren(Seq(join)): LogicalPlan)
          .getOrElse(join)))
    }
    // ---- PAYLOAD PUSHDOWN (the filtered-search scale answer): when
    // every filter column was DECLARED at registration and carried
    // into the code table, the predicate prunes code rows INSIDE the
    // probe — candidates are then all admissible, so the filtered
    // query is exactly as index-quality-bound as an unfiltered one
    // (candFactor·k ADC-best MATCHING candidates from nprobe cells)
    // and typically serves with ZERO escalations. Escalation remains
    // only for probed cells holding fewer than k matches; at
    // nprobe = nlist the candidate set contains EVERY matching
    // vector, so a short answer is exact. Any pushdown failure
    // (schema drift, unresolvable predicate) falls back to the
    // generic survivor-count path below — never an error.
    def payloadServe(f: org.apache.spark.sql.catalyst.plans.logical.Filter)
        : Option[LogicalPlan] = {
      // FULL-WIDTH probe: with the predicate pruning code rows INSIDE
      // the scan, cost is bounded by the predicate's selectivity, not
      // by cells probed — probing every cell reads exactly the
      // matching code rows (a 1% predicate reads ~1% of the code
      // table, strictly less than the generic escalation's terminal
      // widths read), candidates are the ADC-best candFactor·k among
      // ALL matching vectors (recall is the index's own ADC quality,
      // not a cell-coverage lottery), a short answer is EXACT (every
      // matching vector is a candidate), and planning runs ZERO Spark
      // jobs — no survivor counts, no escalation rounds. The one
      // bound: the per-query distance table is nlist·m·ksub doubles,
      // driver-computed and broadcast, so very large models fall back
      // to the generic survivor-count path instead of a huge
      // broadcast.
      if (cents.length > FullProbeMaxCells) return None
      lastFilteredEscalations = 0
      lastPayloadPushdowns += 1
      logInfo(s"graft ANN rewrite: PAYLOAD-filtered top-$k over " +
        s"${reg.basePath} served from ${reg.indexPath} " +
        s"(full-width probe over ${cents.length} cells, predicate " +
        "pruned inside the scan, 0 escalations)")
      Some(splice(candsPlanFor(cents.length, reg.candFactor,
        Some(canonPred(f.condition)))))
    }
    // the FILTERED serving escalation, shared by two modes:
    //  - GENERIC (predSql = None, nprobe starts at the registration):
    //    survivor-count escalation over (candidates ∩ predicate),
    //    widening nprobe then candFactor — see the tryRewrite Scaladoc.
    //  - PARTIAL PUSHDOWN (predSql = the payload-covered conjuncts,
    //    nprobe starts FULL-WIDTH): the covered conjuncts prune code
    //    rows inside the probe (selectivity-priced, all cells), so
    //    candidates are all covered-admissible and only the RESIDUAL
    //    conjuncts can under-fill — escalation widens candFactor
    //    alone, and every survivor count stays CANDIDATE-sized (the
    //    semi-join narrows the corpus scan to ≤ candFactor·k rows).
    def escalatedFiltered(f: org.apache.spark.sql.catalyst.plans.logical.Filter,
                          predSql: Option[String],
                          nprobe0: Int, escTag: String)
        : Option[LogicalPlan] = {
        // ---- escalation: count survivors (candidate-sized work) and
        // widen the probe until OverFetch·k survive or the candidate
        // set provably covers the corpus. The CONVERGED widths are
        // cached by (index, covered commit, canonical predicate +
        // starting widths + mode, k, query vector) — a RE-planning of
        // the same query (every .count()/.collect() on a fresh
        // DataFrame replans) skips the probe jobs entirely and serves
        // at the cached widths; any base commit, registration change,
        // or new predicate/vector misses and probes fresh.
        val escKey = PlanCaches.EscKey(reg.indexPath, reg.baseCommit,
          canonPred(f.condition) +
            s"|np0=$nprobe0,cf0=${reg.candFactor}$escTag",
          k, PlanCaches.qvHash(qv))
        PlanCaches.escalationHit(escKey).foreach { case (np, cf) =>
          lastFilteredEscalations = 0
          escalationCacheHits += 1
          logInfo(s"graft ANN rewrite: FILTERED top-$k over " +
            s"${reg.basePath} served from ${reg.indexPath} at CACHED " +
            s"escalation widths (nprobe=$np, candFactor=$cf)")
          return Some(splice(candsPlanFor(np, cf, predSql)))
        }
        val deadline = System.nanoTime() + escalationBudgetNanos
        val rowsEst = (if (corpusPartitioned(reg.basePath))
            graft.merge.PartitionedTable.tableRowsEstimate(reg.basePath)
          else Scd1Merge.tableRowsEstimate(reg.basePath))
          .getOrElse(Long.MaxValue)
        // k survivors make the plan CORRECT-SHAPED (never short);
        // the QUALITY target over-fetches to OverFetch·k survivors so
        // the top-k among them approaches the true filtered top-k —
        // a k-survivor-exact stop keeps only the filter's thin
        // intersection with the probe and its recall collapses
        val target = math.min(OverFetch.toLong * k, math.max(k.toLong, rowsEst))
        var nprobe = nprobe0
        var candFactor = reg.candFactor
        var rounds = 0
        lastFilteredEscalations = 0
        // the best plan seen with ≥ k survivors — served if the
        // escalation budget runs out before the quality target
        var fallback: Option[LogicalPlan] = None
        var fallbackWidths: Option[(Int, Int)] = None
        while (rounds < 12) {
          val cp = candsPlanFor(nprobe, candFactor, predSql)
          val exhaustive = nprobe >= cents.length &&
            candFactor.toLong * k >= rowsEst
          val survivors =
            if (exhaustive) target // covers the corpus: serve as-is
            else org.apache.spark.sql.GraftExpressionBridge.ofRows(spark,
              Filter(f.condition, Join(scan, cp, LeftSemi,
                Some(EqualTo(idAttr, cp.output.head)), JoinHint.NONE)))
              .count()
          if (survivors >= target) {
            logInfo(s"graft ANN rewrite: FILTERED top-$k over " +
              s"${reg.basePath} served from ${reg.indexPath} " +
              s"(nprobe=$nprobe, candFactor=$candFactor, " +
              s"$survivors survivors, ${lastFilteredEscalations} " +
              s"escalations${if (predSql.nonEmpty) ", covered conjuncts pushed" else ""})")
            PlanCaches.escalationPut(escKey, nprobe, candFactor)
            return Some(splice(cp))
          }
          if (survivors >= k) {
            fallback = Some(cp)
            fallbackWidths = Some((nprobe, candFactor))
          }
          // wall-clock bound: planning latency must never dwarf the
          // query — past the budget, serve the best ≥k plan seen or
          // fall through to the exact scan
          if (System.nanoTime() > deadline) {
            fallbackWidths.foreach(w =>
              PlanCaches.escalationPut(escKey, w._1, w._2))
            return fallback.map(splice)
          }
          // widen: nprobe first (recall-per-cost), then candFactor
          // (bounded — past the cap the exact scan is the honest plan)
          if (nprobe < cents.length)
            nprobe = math.min(cents.length, nprobe * 2)
          else if (candFactor < (1 << 16)) candFactor *= 2
          else {
            fallbackWidths.foreach(w =>
              PlanCaches.escalationPut(escKey, w._1, w._2))
            return fallback.map(splice)
          }
          rounds += 1
          lastFilteredEscalations += 1
        }
        // budget exhausted: a ≥k-survivor plan serves best-effort;
        // otherwise the exact scan answers (never a short result)
        fallbackWidths.foreach(w =>
          PlanCaches.escalationPut(escKey, w._1, w._2))
        fallback.map(splice)
    }
    filterOpt match {
      case None =>
        val candsPlan = candsPlanFor(reg.nprobe, reg.candFactor)
        logInfo(s"graft ANN rewrite: top-$k over ${reg.basePath} served " +
          s"from ${reg.indexPath} (commit ${reg.baseCommit}, " +
          s"${reg.nprobe} cells probed)")
        Some(splice(candsPlan))
      case Some(f) =>
        // split the predicate into payload-COVERED conjuncts (pushed
        // into the codes scan) and the RESIDUAL. Fully covered → the
        // zero-jobs full-width pushdown; PARTIALLY covered → push the
        // covered part and escalate only the residual (candidate-
        // sized counts, candFactor-only widening — the common
        // composite shape `tenant = X AND quality > t` with only
        // `tenant` declared no longer falls all the way back to
        // corpus-coverage probes); nothing covered → the generic
        // escalation. Any pushdown failure degrades to generic.
        val (covered, residual) = conjunctsOf(f.condition).partition(c =>
          reg.payloadCols.nonEmpty && c.references.forall(a =>
            reg.payloadCols.exists(_.equalsIgnoreCase(a.name))))
        val viaPayload =
          if (covered.isEmpty) None
          else if (residual.isEmpty && cents.length <= FullProbeMaxCells)
            // small model, fully covered: the zero-jobs full-width
            // pushdown (short answers provably exact)
            (try payloadServe(f) catch { case _: Exception => None })
          else (try {
            // mixed predicate, AND/OR a model past the broadcast cap:
            // push the covered conjuncts, start at the widest BOUNDED
            // probe (pruned per-cell tables when nlist exceeds the
            // cap), and escalate under survivor counts
            val covSql = canonPred(
              if (residual.isEmpty) f.condition else covered.reduce(And))
            val tag = if (residual.isEmpty) "|prunedfull" else "|partial"
            val out = escalatedFiltered(f, Some(covSql),
              nprobe0 = math.min(cents.length, FullProbeMaxCells),
              escTag = tag)
            if (out.nonEmpty) {
              lastPayloadPushdowns += 1
              if (residual.nonEmpty) lastPartialPushdowns += 1
            }
            out
          } catch { case _: Exception => None })
        viaPayload.orElse(escalatedFiltered(f, None,
          nprobe0 = reg.nprobe, escTag = ""))
    }
  }

  /** Conjunct split of a filter predicate. */
  private def conjunctsOf(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
    case other => Seq(other)
  }

  /** Registrations whose snapshot matches the scan's file set — a
    * MULTIMODAL base yields several; the caller picks the one whose
    * vector column the query actually scores. */
  private def candidateRegs(files: Set[String]): Seq[AnnReg] = {
    import scala.jdk.CollectionConverters._
    registry.values.asScala.filter(_.baseFiles == files).toSeq
      .sortBy(_.vecCol.toLowerCase)
  }

  /** The sort column's query vector — when the Project aliases
    * `vec_cosine(<reg.vecCol attr>, <dim-length foldable literal>)`
    * at the sorted exprId. */
  private def extractQv(proj: Project, sref: AttributeReference,
                        scan: LogicalRelation,
                        reg: AnnReg): Option[Array[Float]] =
    proj.projectList.collectFirst {
      case al @ Alias(graft.functions.CosineSimilarity(
          v: AttributeReference, q), _)
          if al.exprId == sref.exprId &&
            v.name.equalsIgnoreCase(reg.vecCol) &&
            scan.outputSet.contains(v) && q.foldable =>
        q.dataType match {
          case ArrayType(FloatType, _) =>
            Option(q.eval().asInstanceOf[ArrayData]).map(_.toFloatArray())
          case _ => None
        }
    }.flatten.filter(_.length == reg.dim)


  /** Escalation rounds of the last FILTERED rewrite attempt on this
    * JVM — spec/plan-pin observability. */
  @volatile var lastFilteredEscalations: Int = 0

  /** Escalation-cache hits since session start (a hit serves a
    * previously-converged probe width with ZERO survivor-count jobs)
    * — spec/plan-pin observability. */
  @volatile var escalationCacheHits: Long = 0L

  /** Payload-pushdown servings since session start (filtered queries
    * whose predicate pruned candidates INSIDE the probe) —
    * spec/plan-pin observability. */
  @volatile var lastPayloadPushdowns: Long = 0L

  /** PARTIAL pushdown servings (mixed predicates: covered conjuncts
    * pushed into the codes scan, residual conjuncts escalated over
    * candidate-sized survivor counts) — spec/plan-pin observability. */
  @volatile var lastPartialPushdowns: Long = 0L

  /** Wall-clock budget for one filtered escalation (ms, conf
    * `spark.graft.ann.escalationBudgetMs`): planning latency must
    * never dwarf the query it plans — past the budget the best
    * ≥k-survivor plan serves, else the exact scan answers. */
  private def escalationBudgetNanos: Long =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.ann.escalationBudgetMs", "30000")
      .toLong * 1000000L

  /** Qualifier-stripped lowercase rendering — the cross-branch /
    * cache-key canonical form of a filter predicate (exprIds differ
    * per plan; names do not). */
  private def canonPred(e: Expression): String = e.transform {
    case a: AttributeReference =>
      a.withQualifier(Nil).withName(a.name.toLowerCase)
  }.sql

  /** Survivor over-fetch multiple for FILTERED serving: escalation
    * aims for OverFetch·k predicate survivors (not just k) so the
    * exact re-rank picks from a candidate pool deep enough to track
    * the true filtered top-k. */
  private val OverFetch = 4

  /** Payload pushdown's full-width probe cap (conf
    * `spark.graft.ann.fullProbeMaxCells`): the per-query distance
    * table is cells·m·ksub doubles (driver-computed, broadcast) — at
    * 1024 cells × 16 subs × 256 codes it is ~32 MB, the sane ceiling.
    * A model with MORE cells no longer falls back: pushdown probes go
    * through [[distanceRowsPruned]] — best-case-ADC cell pruning keeps
    * the broadcast ≤ this many cells, under survivor-count escalation
    * so fill-k still holds (the one behavior change vs the zero-jobs
    * small-model path: the first planning of a pruned probe pays
    * candidate-sized count jobs, amortized by the escalation cache). */
  private def FullProbeMaxCells: Int =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.ann.fullProbeMaxCells", "1024").toInt

  /** Distinct cells in the last candidate plan's broadcast distance
    * table — the bounded-broadcast spec pin. */
  @volatile var lastDistanceTableCells: Int = 0
}
