package graft.pipeline

import graft.merge.Scd1Merge
import graft.pipeline.IncrementalAgg.AggSpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an aggregate over an EQUI-JOIN of two
  * tables (the star-schema gold view: γ_{g(dim), Σ m(fact)}(F ⋈ D))
  * from the tables' change feeds — one step up from
  * [[IncrementalAgg]], which maintains a single-table aggregate. The
  * reference's gold job re-reads the full silver join every run
  * (gold_fact.py:12); at 100 TB the join MUST move by deltas.
  *
  * Delta rule (exact, signed-multiset bilinearity):
  *
  *   Δ(F ⋈ D) = ΔF ⋈ D_new  ∪  F_old ⋈ ΔD
  *
  * where ΔF/ΔD are the signed change feeds (insert/update = +row,
  * update_preimage/delete = −row), D_new is the dim AFTER its delta
  * and F_old the fact BEFORE its own. Each signed joined row carries
  * its fact measures into [[IncrementalAgg.applyChangesFrame]], so
  * sums move by (new − old), counts by the signed row balance, and
  * groups whose count reaches zero are tombstoned and swept — a dim
  * row whose group column CHANGES moves its fact rows' mass between
  * groups in one batch.
  *
  * Contract: measures live on the FACT side, group columns on the DIM
  * side, and the dim is UNIQUE on the join key (it is an SCD1 table
  * keyed on it — enforced by its own merge). Exactly-once by the same
  * stamp protocol as [[IncrementalAgg]]: the consumed (fact, dim)
  * commit pair is the aggregate commit's batch stamp; replays see the
  * stamp and only re-run the idempotent tombstone sweep.
  *
  * 100 TB cost shape, per batch:
  *  - fact-side changes (the hot path — appends and corrections):
  *    ΔF ⋈ D_new with ΔF BROADCAST — batch-sized work, the fact table
  *    is never scanned, the dim streams map-side.
  *  - dim-side changes (rare — SCD1 dim corrections): F_old ⋈ ΔD with
  *    ΔD broadcast — one fact scan with NO shuffle (map-side hash
  *    probe) and column pruning down to (fk, measures). This is the
  *    price of a dimension rewrite in any IVM system; co-bucketing
  *    the fact on the join key would turn it into a bucket-pruned
  *    read, at the cost of skew on hot dimension keys.
  *  - the merge into the aggregate touches only delta groups
  *    ([[IncrementalAgg.applyChangesFrame]]'s left-join shape).
  */
object IncrementalJoinAgg {

  /** Initial build: aggregate the current join, committed stamped. */
  def bootstrap(spark: SparkSession, aggPath: String, fact: DataFrame,
                dim: DataFrame, fk: String, dk: String, spec: AggSpec,
                numBuckets: Int = 0, batchId: String = ""): Unit =
    IncrementalAgg.bootstrap(spark, aggPath,
      fact.as("f").join(dim.as("d"), col(s"f.$fk") === col(s"d.$dk")),
      spec, numBuckets, batchId)

  /** [[bootstrap]] from the committed fact/dim TABLES, stamped with
    * the `fact@F,dim@D` commit pair — the form a registered join MV
    * needs ([[graft.plans.GraftMvRewrite]] trusts exactly this stamp)
    * and the anchor [[refresh]] resumes from. */
  def bootstrapFrom(spark: SparkSession, aggPath: String,
                    factPath: String, dimPath: String,
                    fk: String, dk: String, spec: AggSpec,
                    numBuckets: Int = 0): Unit = {
    val cf = commitOf(factPath, "bootstrapFrom")
    val cd = commitOf(dimPath, "bootstrapFrom")
    bootstrap(spark, aggPath, Scd1Merge.readTable(spark, factPath),
      Scd1Merge.readTable(spark, dimPath), fk, dk, spec, numBuckets,
      batchId = f"fact@$cf%09d,dim@$cd%09d")
  }

  /** The full registered-MV creation: [[bootstrapFrom]] + persisted
    * definition ([[MvDef]] — so `REFRESH MATERIALIZED VIEW` in a NEW
    * session knows both sides) + the transparent query rewrite armed
    * ([[graft.plans.GraftMvRewrite.registerJoin]]). */
  def createMv(spark: SparkSession, mvPath: String,
               factPath: String, factKeys: Seq[String],
               dimPath: String, dimKeys: Seq[String],
               fk: String, dk: String, spec: AggSpec,
               numBuckets: Int = 0): Unit =
    createMvStar(spark, mvPath, factPath, factKeys,
      Seq(MvDef.JoinSrc(dimPath, dimKeys, fk, dk)), spec, numBuckets)

  // ======================= STAR (N-dim) forms =======================
  // The bilinear delta rule extends to N dims by TELESCOPING — each
  // term swaps exactly one side for its delta, sides BEFORE it in the
  // order at their OLD version, sides AFTER at NEW:
  //
  //   Δ(F ⋈ D1 ⋈ … ⋈ Dn) =  ΔF    ⋈ D1_new ⋈ … ⋈ Dn_new
  //                        ∪ F_old ⋈ ΔD1    ⋈ D2_new ⋈ … ⋈ Dn_new
  //                        ∪ F_old ⋈ D1_old ⋈ ΔD2 ⋈ D3_new ⋈ …
  //                        ∪ …
  //                        ∪ F_old ⋈ D1_old ⋈ … ⋈ ΔDn
  //
  // (exact in signed-multiset semantics: summing the terms telescopes
  // to F_new⋈D1_new⋈…⋈Dn_new − F_old⋈D1_old⋈…⋈Dn_old, regardless of
  // how the physical commits interleaved — the identity is over table
  // STATES). Group columns may live on ANY side (resolved per term by
  // schema membership); measures stay on the fact. 100 TB cost: every
  // delta side is BROADCAST (batch-sized by contract) and every dim
  // is broadcast (dimension-sized), so the only big input ever
  // scanned is F_old — once per changed-dim term, shuffle-free.

  /** The exactly-once stamp for a star MV: the consumed commit of the
    * fact then each dim in registered order. One dim = the legacy
    * `fact@F,dim@D` format, unchanged. */
  private def starStamp(cf: Int, cds: Seq[Int]): String =
    f"fact@$cf%09d" + cds.map(c => f",dim@$c%09d").mkString

  // ---- the star FACT may be FLAT or PARTITIONED (the 100 TB fact's
  // actual layout): commit = parent commit, feed = per-partition
  // child diffs, snapshot reads resolve through the parent pin set.
  // Dims stay flat — they are dimension-sized SCD1 tables by contract.

  private def factPartitioned(path: String): Boolean =
    graft.merge.PartitionedTable.tableExists(path)

  private def factCommitOf(path: String, op: String): Int =
    (if (factPartitioned(path))
       graft.merge.PartitionedTable.tableCommit(path)
     else Scd1Merge.tableCommit(path)).getOrElse(
      throw new IllegalStateException(s"$op: $path has no manifest"))

  private def factReadAt(spark: SparkSession, path: String,
                         back: Int): DataFrame =
    if (factPartitioned(path))
      graft.merge.PartitionedTable.readTableAt(spark, path, back)
    else Scd1Merge.readTableAt(spark, path, back)

  // ABSOLUTE-commit forms — maintenance resolves every snapshot and
  // window against the commit NUMBERS captured once (the stamp's
  // coordinates), so a commit landing mid-refresh can never shift
  // what a stamp claims was applied (the GraftSource offset-race
  // posture, applied to MV maintenance)

  private def factAtCommit(spark: SparkSession, path: String,
                           commit: Int): DataFrame =
    if (factPartitioned(path))
      graft.merge.PartitionedTable.readTableAtCommit(spark, path, commit)
    else Scd1Merge.readTableAtCommit(spark, path, commit)

  private def factChangesAt(spark: SparkSession, path: String,
                            keys: Seq[String], from: Int, to: Int): DataFrame =
    if (factPartitioned(path))
      graft.merge.PartitionedTable.readChangesAtCommits(spark, path, from, to)
    else Scd1Merge.readChangesAtCommits(spark, path, keys, from, to)

  /** A star spec's optional `filterSql` must reference FACT columns
    * only: the predicate then commutes with every telescoped term
    * (each signed row evaluates it independently — exactly the
    * single-table filtered-MV algebra) AND can be applied to the fact
    * side BEFORE the joins, so filtered-out mass never joins at all.
    * A dim-column predicate would change which fact rows pass when
    * the DIM row changes — rejected loudly at create (the SQL layer
    * lowers a dim-attribute WHERE to "keep that dim's fk in the
    * groups", so the predicate applies at REWRITE time instead).
    *
    * `groupExprs` likewise must be FACT-column expressions: derived
    * here on the fact side BEFORE the joins, they ride every
    * telescoped term like any other fact column (a dim-column
    * expression would need deriving on each dim version — out of
    * scope; group by the bare dim column instead). */
  private def factPrepared(fact: DataFrame, spec: AggSpec): DataFrame = {
    val derived = spec.groupExprs.toSeq.sortBy(_._1).foldLeft(fact) {
      case (d, (out, sql)) => d.withColumn(out, expr(sql))
    }
    spec.filterSql.map(f => derived.filter(
      coalesce(expr(f).cast("boolean"), lit(false)))).getOrElse(derived)
  }

  /** The spec the POST-JOIN layers see: the fact filter and the group
    * expressions were already applied/derived on the fact side, so
    * the downstream aggregation treats every group column as a plain
    * column and never re-evaluates the predicate (the joined frame's
    * columns would be ambiguous across sides). */
  private def postJoinSpec(spec: AggSpec): AggSpec =
    spec.copy(filterSql = None, groupExprs = Map.empty)

  /** Every measure column the downstream fold needs, once each (a
    * column may be summed, min/maxed, AND sketched). */
  private def starMeasureCols(spec: AggSpec): Seq[String] =
    (spec.sums.map(_._1) ++ spec.mins.map(_._1) ++ spec.maxs.map(_._1) ++
      spec.sketches.map(_._1))
      .foldLeft(Vector.empty[String])((acc, m) =>
        if (acc.exists(_.equalsIgnoreCase(m))) acc else acc :+ m)

  /** Which join alias carries group column `c` — the fact wins a
    * shared name (a dim-filtered MV keeps the fact-side JOIN KEY in
    * its groups, which may share the dim key's name). The projection
    * built from this is what keeps the joined frame unambiguous: the
    * post-join aggregation only ever sees side-resolved columns. */
  private def starSideOf(factCols: Set[String], dimCols: Seq[Set[String]],
                         c: String): String =
    if (factCols(c.toLowerCase)) "f"
    else dimCols.indexWhere(_(c.toLowerCase)) match {
      case -1 => throw new IllegalArgumentException(
        s"star MV: group column '$c' is on no side")
      case i => s"d$i"
    }

  /** Initial build over the CURRENT star join, stamped with every
    * side's commit. Dims join in order on `fk = dk`; group columns
    * resolve on whichever side carries them. */
  def bootstrapStar(spark: SparkSession, aggPath: String,
                    factPath: String, dims: Seq[MvDef.JoinSrc],
                    spec: AggSpec, numBuckets: Int = 0,
                    retain: Int = Scd1Merge.DefaultRetainVersions): Unit = {
    require(dims.nonEmpty, "bootstrapStar: at least one dim")
    val cf = factCommitOf(factPath, "bootstrapStar")
    val cds = dims.map(d => commitOf(d.dimPath, "bootstrapStar"))
    // every side read AT its captured commit — the stamp names
    // exactly the snapshot the bootstrap aggregated, even under
    // concurrent writers
    val factF = factPrepared(factAtCommit(spark, factPath, cf), spec)
    val dimFrames = dims.zipWithIndex.map { case (d, i) =>
      Scd1Merge.readTableAtCommit(spark, d.dimPath, cds(i)) }
    val joined = dims.zipWithIndex.foldLeft(factF.as("f"): DataFrame) {
      case (acc, (d, i)) =>
        acc.join(broadcast(dimFrames(i).as(s"d$i")),
          col(s"f.${d.fk}") === col(s"d$i.${d.dk}"))
    }
    // filter + group expressions already applied on the fact side;
    // the SIDE-RESOLVED projection keeps the aggregation unambiguous
    // (a group column's name may exist on several sides — e.g. the
    // fact join key a dim-filtered MV keeps in its groups) and prunes
    // the join output to exactly (groups, measures)
    val factCols = factF.columns.map(_.toLowerCase).toSet
    val dimCols = dimFrames.map(_.columns.map(_.toLowerCase).toSet)
    val projected = joined.select(
      spec.groupCols.map(c => col(s"${starSideOf(factCols, dimCols, c)}.$c")) ++
      starMeasureCols(spec).map(m => col(s"f.$m")): _*)
    IncrementalAgg.bootstrap(spark, aggPath, projected,
      postJoinSpec(spec), numBuckets,
      batchId = starStamp(cf, cds), retainVersions = retain)
  }

  /** Registered star-MV creation: [[bootstrapStar]] + persisted
    * definition + the transparent rewrite armed + durable catalog
    * entry (so a NEW session auto-arms from disk). */
  def createMvStar(spark: SparkSession, mvPath: String,
                   factPath: String, factKeys: Seq[String],
                   dims: Seq[MvDef.JoinSrc], spec: AggSpec,
                   numBuckets: Int = 0,
                   retain: Int = Scd1Merge.DefaultRetainVersions,
                   auto: Boolean = false): Unit = {
    // the filter, every group EXPRESSION, and every min/max measure
    // must resolve on the FACT ALONE — filters and expressions then
    // commute with every telescoped term (both are evaluated on the
    // fact side BEFORE the joins), and the extremes' flagged-group
    // rescan reads fact measures off the re-joined view
    val factFrame = factReadAt(spark, factPath, 0)
    val factCols = factFrame.columns.map(_.toLowerCase).toSet
    spec.filterSql.foreach { f =>
      try factFrame.filter(f).queryExecution.analyzed
      catch { case e: Exception => throw new IllegalArgumentException(
        s"star MV filter '$f' must reference fact columns only: " +
        e.getMessage) }
    }
    spec.groupExprs.foreach { case (out, sql) =>
      try factFrame.select(expr(sql).as(out)).queryExecution.analyzed
      catch { case e: Exception => throw new IllegalArgumentException(
        s"star MV group expression '$sql' must reference fact columns " +
        s"only: ${e.getMessage}") }
    }
    (spec.mins ++ spec.maxs).foreach { case (m, out) =>
      require(factCols(m.toLowerCase),
        s"star MV extreme '$out' aggregates '$m', which is not a fact " +
        "column — min/max measures live on the fact (the flagged-group " +
        "rescan reads them off the re-joined view)")
    }
    spec.sketches.foreach { case (m, out) =>
      require(factCols(m.toLowerCase),
        s"star MV sketch '$out' aggregates '$m', which is not a fact " +
        "column — sketch measures live on the fact (the flagged-group " +
        "rescan reads them off the re-joined view)")
    }
    require(spec.quantiles.isEmpty,
      "star MVs do not carry quantile sketches yet — maintain them on " +
      "a flat (single-table) MV over the fact")
    // a measure sharing a group column's NAME would collide in the
    // per-term projection (groups project from their side, measures
    // from the fact) — reject the pathological shape loudly
    (spec.sums ++ spec.mins ++ spec.maxs ++ spec.sketches).map(_._1)
      .foreach { m =>
        require(!spec.groupCols.exists(_.equalsIgnoreCase(m)),
          s"star MV measure '$m' collides with a group column name")
      }
    bootstrapStar(spark, mvPath, factPath, dims, spec, numBuckets, retain)
    MvDef.write(mvPath,
      MvDef.Def(factPath, factKeys, spec, dims, retain = retain,
        auto = auto))
    if (auto) MvMaintenance.enableAuto(mvPath)
    graft.plans.GraftMvRewrite.registerJoin(
      graft.plans.GraftMvRewrite.JoinMvReg(factPath,
        dims.map(d => graft.plans.GraftMvRewrite.DimJoin(d.dimPath, d.fk, d.dk)),
        mvPath, spec))
    // durable arming: catalogued under the FACT side (the arming
    // probe keys on the scanned fact's files)
    graft.sql.GraftCatalog.putMv(mvPath, factPath)
  }

  /** Fold every commit ANY side has made since the MV's stamp — one
    * exact telescoped batch over the whole lag window, exactly-once
    * by the stamp protocol. Returns commits applied per side
    * (fact +: dims, registered order); all-zero = current. Lagging
    * past any side's retention fails loudly (the CDC contract). */
  def refreshStar(spark: SparkSession, aggPath: String,
                  factPath: String, factKeys: Seq[String],
                  dims: Seq[MvDef.JoinSrc], spec: AggSpec,
                  retain: Int = Scd1Merge.DefaultRetainVersions): Seq[Int] = {
    val stamp = Scd1Merge.tableBatchId(aggPath).getOrElse(
      throw new IllegalStateException(
        s"refreshStar: $aggPath carries no stamp — bootstrap it first"))
    val SideRe = """(fact|dim)@(\d+)""".r
    val seen = stamp.split(",").toSeq.map {
      case SideRe(_, n) => n.toInt
      case other => throw new IllegalStateException(
        s"refreshStar: $aggPath stamp piece '$other' is not fact@F/dim@D")
    }
    require(seen.size == dims.size + 1,
      s"refreshStar: stamp '$stamp' has ${seen.size} sides, " +
      s"expected ${dims.size + 1} (fact + ${dims.size} dims)")
    val cur = factCommitOf(factPath, "refreshStar") +:
      dims.map(d => commitOf(d.dimPath, "refreshStar"))
    val lags = cur.zip(seen).map { case (c, s) => math.max(0, c - s) }
    if (lags.forall(_ == 0)) return lags
    // ABSOLUTE windows from the commits captured above — commits
    // landing from here on belong to the NEXT refresh, and the stamp
    // names exactly what was applied
    applyStarChanges(spark, aggPath, factPath, factKeys, dims, spec,
      factWindow = (seen.head, math.max(seen.head, cur.head)),
      dimWindows = seen.tail.zip(cur.tail).map { case (s, c) =>
        (s, math.max(s, c)) },
      retain = retain)
    lags
  }

  /** Apply one telescoped batch over ABSOLUTE commit windows — each
    * side's `(seen, target)` pair; seen == target = that side did not
    * change. Every snapshot and change window resolves against these
    * pinned commit numbers (never "live"), and the batch stamps the
    * target vector — so a replay is a no-op and a commit landing
    * mid-call can never shift what the stamp claims. */
  def applyStarChanges(spark: SparkSession, aggPath: String,
                       factPath: String, factKeys: Seq[String],
                       dims: Seq[MvDef.JoinSrc], spec: AggSpec,
                       factWindow: (Int, Int),
                       dimWindows: Seq[(Int, Int)],
                       numBuckets: Int = 0,
                       retain: Int = Scd1Merge.DefaultRetainVersions): Unit = {
    require(dims.size == dimWindows.size, "one window per dim")
    val (sf, cf) = factWindow
    require(cf >= sf && dimWindows.forall(w => w._2 >= w._1),
      "applyStarChanges: windows must not run backwards")
    require(cf > sf || dimWindows.exists(w => w._2 > w._1),
      "applyStarChanges: no delta on any side")
    val cds = dimWindows.map(_._2)
    // the star filter applies to BOTH fact legs row-by-row: a change
    // row failing it contributes nothing (preimage and postimage drop
    // together), a boundary-crossing update nets exactly the visible
    // transition — the single-table filtered-MV algebra, commuting
    // with the join because the predicate reads fact columns only.
    // Group EXPRESSIONS derive on the same fact legs (fact-column
    // expressions by contract — they ride every term like a column).
    val factOld = factPrepared(factAtCommit(spark, factPath, sf), spec)
    val factDelta = if (cf > sf)
      Some(factPrepared(
        factChangesAt(spark, factPath, factKeys, sf, cf), spec))
    else None
    val dimOld = dims.zip(dimWindows).map { case (d, (s, _)) =>
      Scd1Merge.readTableAtCommit(spark, d.dimPath, s) }
    val dimNew = dims.zip(dimWindows).map { case (d, (_, c)) =>
      Scd1Merge.readTableAtCommit(spark, d.dimPath, c) }
    val dimDelta = dims.zip(dimWindows).map { case (d, (s, c)) =>
      if (c > s)
        Some(Scd1Merge.readChangesAtCommits(spark, d.dimPath, d.dimKeys, s, c))
      else None }
    // which alias carries each group column (schemas are stable
    // across the lag window — evolution mid-window is out of scope)
    val factCols = factOld.columns.map(_.toLowerCase).toSet
    val dimCols = dimOld.map(_.columns.map(_.toLowerCase).toSet)
    def sideOf(c: String): String = starSideOf(factCols, dimCols, c)
    // every measure the fold needs, once each (a column may be both
    // summed and min/maxed) — create rejects group-name collisions
    val measureCols = starMeasureCols(spec)
    // one signed term: the delta side (alias `ct`) broadcast, every
    // dim broadcast, projected to (groups, fact measures, sign)
    def term(fact: DataFrame, factIsDelta: Boolean,
             dimFs: Seq[DataFrame], ct: String): DataFrame = {
      val seed: DataFrame =
        if (factIsDelta) broadcast(fact.as("f")) else fact.as("f")
      val joined = dims.indices.foldLeft(seed) { (acc, i) =>
        acc.join(broadcast(dimFs(i).as(s"d$i")),
          col(s"f.${dims(i).fk}") === col(s"d$i.${dims(i).dk}"))
      }
      joined.select(spec.groupCols.map(c => col(s"${sideOf(c)}.$c")) ++
        measureCols.map(m => col(s"f.$m")) :+
        col(s"$ct._change_type").as("_change_type"): _*)
    }
    val factTerm = factDelta.map(fd =>
      term(fd, factIsDelta = true, dimNew, ct = "f")).toSeq
    val dimTerms = dims.indices.flatMap { i =>
      dimDelta(i).map { dd =>
        val sides = dims.indices.map(j =>
          if (j < i) dimOld(j) else if (j == i) dd else dimNew(j))
        term(factOld, factIsDelta = false, sides, ct = s"d$i")
      }
    }
    // min/max + sketches: the flagged-group rescan reads the NEW
    // joined state (fact@target ⋈ dims@target — exactly what the
    // stamp claims the MV now reflects), projected to (groups, rescan
    // measures); the fact leg was prepared above, so filter and
    // expressions hold
    val extBase =
      if (spec.rescanCols.isEmpty) None
      else {
        val factNew =
          if (cf > sf) factPrepared(factAtCommit(spark, factPath, cf), spec)
          else factOld
        val joined = dims.indices.foldLeft(factNew.as("f"): DataFrame) {
          (acc, i) =>
            acc.join(broadcast(dimNew(i).as(s"d$i")),
              col(s"f.${dims(i).fk}") === col(s"d$i.${dims(i).dk}"))
        }
        val extMeasures = (spec.mins.map(_._1) ++ spec.maxs.map(_._1) ++
          spec.sketches.map(_._1))
          .foldLeft(Vector.empty[String])((acc, m) =>
            if (acc.exists(_.equalsIgnoreCase(m))) acc else acc :+ m)
        Some(joined.select(spec.groupCols.map(c =>
          col(s"${sideOf(c)}.$c")) ++
          extMeasures.map(m => col(s"f.$m")): _*))
      }
    // the filter and group expressions were applied to the fact legs
    // above; the folded terms carry only (groups, measures, sign)
    IncrementalAgg.applyChangesFrame(spark, aggPath,
      (factTerm ++ dimTerms).reduce(_ unionByName _),
      postJoinSpec(spec), numBuckets, starStamp(cf, cds),
      retainVersions = retain, extremesBase = extBase)
  }

  /** Fold every commit EITHER side has made since the MV's stamp —
    * one exact bilinear batch (`ΔF ⋈ D_new ∪ F_old ⋈ ΔD` over the
    * whole lag window), exactly-once by the stamp protocol. Returns
    * (fact commits applied, dim commits applied); (0,0) = current.
    * Lagging past either side's retention fails loudly (the feed is
    * gone — the CDC contract). */
  def refresh(spark: SparkSession, aggPath: String,
              factPath: String, factKeys: Seq[String],
              dimPath: String, dimKeys: Seq[String],
              fk: String, dk: String, spec: AggSpec): (Int, Int) = {
    // delegate to the star form: same stamp format at one dim, and
    // the absolute-commit windows close the mid-refresh commit race
    val r = refreshStar(spark, aggPath, factPath, factKeys,
      Seq(MvDef.JoinSrc(dimPath, dimKeys, fk, dk)), spec)
    (r(0), r(1))
  }

  private def commitOf(p: String, op: String): Int =
    Scd1Merge.tableCommit(p).getOrElse(
      throw new IllegalStateException(s"$op: $p has no manifest"))

  /** One signed join term: every (delta row ⋈ other side) pair,
    * projected to (group cols, measures, _change_type). The delta side
    * is broadcast — delta-sized by contract. */
  private def term(factSide: DataFrame, dimSide: DataFrame, fk: String,
                   dk: String, spec: AggSpec, ct: Column,
                   broadcastFact: Boolean): DataFrame = {
    val f = factSide.as("f")
    val d = dimSide.as("d")
    val joined =
      if (broadcastFact) d.join(broadcast(f), col(s"f.$fk") === col(s"d.$dk"))
      else f.join(broadcast(d), col(s"f.$fk") === col(s"d.$dk"))
    joined.select(spec.groupCols.map(c => col(s"d.$c")) ++
      spec.sums.map(p => col(s"f.${p._1}")) :+ ct.as("_change_type"): _*)
  }

  /** Apply one batch of join deltas from ALREADY-READ frames.
    * `factOld` is the fact BEFORE `factDelta` (pass the live fact when
    * `factDelta` is None); `dimNew` the dim AFTER `dimDelta`. */
  def applyJoinChanges(spark: SparkSession, aggPath: String,
                       factDelta: Option[DataFrame], factOld: DataFrame,
                       dimDelta: Option[DataFrame], dimNew: DataFrame,
                       fk: String, dk: String, spec: AggSpec,
                       numBuckets: Int = 0, stamp: String = ""): Unit = {
    require(stamp.nonEmpty, "applyJoinChanges needs a batch stamp")
    val terms =
      factDelta.map(df => term(df, dimNew, fk, dk, spec,
        col("f._change_type"), broadcastFact = true)).toSeq ++
      dimDelta.map(df => term(factOld, df, fk, dk, spec,
        col("d._change_type"), broadcastFact = false)).toSeq
    require(terms.nonEmpty, "applyJoinChanges: no delta on either side")
    IncrementalAgg.applyChangesFrame(spark, aggPath,
      terms.reduce(_ unionByName _), spec, numBuckets, stamp)
  }

  /** Table-level form: read the change feeds and snapshots from the
    * committed fact/dim tables. `factBack`/`dimBack` are
    * (fromCommitsBack, toCommitsBack) ranges per
    * [[Scd1Merge.readChanges]]; None = that side did not change. The
    * stamp is derived from the consumed (fact, dim) target commits, so
    * a replayed call is a no-op. */
  def applyChanges(spark: SparkSession, aggPath: String,
                   factPath: String, factKeys: Seq[String],
                   dimPath: String, dimKeys: Seq[String],
                   fk: String, dk: String, spec: AggSpec,
                   factBack: Option[(Int, Int)] = None,
                   dimBack: Option[(Int, Int)] = None,
                   numBuckets: Int = 0, batchId: String = ""): Unit = {
    def commitOf(p: String): Int = Scd1Merge.tableCommit(p).getOrElse(
      throw new IllegalStateException(s"applyChanges: $p has no manifest"))
    val factTarget = commitOf(factPath) - factBack.map(_._2).getOrElse(0)
    val dimTarget = commitOf(dimPath) - dimBack.map(_._2).getOrElse(0)
    val stamp = if (batchId.nonEmpty) batchId
      else f"fact@$factTarget%09d,dim@$dimTarget%09d"
    val factDelta = factBack.map { case (from, to) =>
      Scd1Merge.readChanges(spark, factPath, factKeys, from, to) }
    val dimDelta = dimBack.map { case (from, to) =>
      Scd1Merge.readChanges(spark, dimPath, dimKeys, from, to) }
    val factOld = Scd1Merge.readTableAt(spark, factPath,
      factBack.map(_._1).getOrElse(0))
    val dimNew = Scd1Merge.readTableAt(spark, dimPath,
      dimBack.map(_._2).getOrElse(0))
    applyJoinChanges(spark, aggPath, factDelta, factOld, dimDelta, dimNew,
      fk, dk, spec, numBuckets, stamp)
  }
}
