package graft.pipeline

import graft.merge.Scd1Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a keyed SUM/COUNT aggregate table from a
  * base table's CHANGE FEED — the scale path the reference's gold
  * layer lacks: its aggregate notebooks re-read the full silver/fact
  * table every run (gold_fact.py:12 re-reads silver; the ad-hoc gold
  * aggregate recomputes from scratch), which at 100 TB turns every
  * batch into a full-table scan. Here each batch applies only the
  * rows that CHANGED: `Scd1Merge.readChanges` yields the commit's
  * (insert, update + update_preimage, delete) rows from
  * manifest-diff-pruned buckets, the signed per-group delta folds in
  * one small aggregation, and the merge into the aggregate table
  * rewrites only the group buckets the delta touches.
  *
  * Cost per batch: O(changed base rows) for the delta + a join against
  * the aggregate table (|distinct groups| rows — orders of magnitude
  * smaller than the base) + a bucket-pruned upsert. The base table is
  * never rescanned.
  *
  * SUM/COUNT are self-maintainable under insert/update/delete because
  * they are abelian-group aggregates (+row is +value, -row is -value);
  * MIN/MAX are not (a deleted minimum needs a rescan of its group) and
  * are deliberately not offered here. Measures must be EXACT types
  * (integral / decimal — e.g. money as integer cents): float sums
  * would drift from a recompute by addition order.
  *
  * Group keys must be non-null (they key the aggregate table's merge;
  * null would silently drop from the equi-joins) — map nulls to a
  * sentinel upstream if needed.
  */
object IncrementalAgg {

  /** Aggregate spec: `sums` maps each base measure column to its
    * output name; `countName` is the row-count column. The count
    * doubles as the group liveness ledger — a group whose count
    * reaches 0 is REMOVED from the aggregate table.
    *
    * `filterSql` makes this a FILTERED aggregate (`WHERE` baked into
    * the MV): only rows satisfying the predicate contribute — under
    * maintenance each change row is evaluated independently, so a
    * filtered update nets exactly the visible transition (old row
    * passed + new fails = −old; old failed + new passes = +new; the
    * [[applyChanges]] rowFilter algebra).
    *
    * `groupExprs` maps a group column name to the SQL EXPRESSION that
    * derives it from base columns (`m -> "date_format(ts,'yyyy-MM')"`)
    * — the MV materializes the computed value as a real group column
    * (Iceberg-transform-style roll-ups: `GROUP BY month(ts)` answered
    * O(months)); names absent from the map are plain base columns.
    *
    * `mins`/`maxs` maintain per-group extremes. MIN/MAX are not
    * abelian — a retraction CAN require rescanning its group — so
    * maintenance is two-speed: inserts FOLD (`least`/`greatest`, pure
    * O(delta), the append hot path), and only groups where a
    * retraction touches the stored extreme (deleted value ≤ stored
    * min / ≥ stored max — the conservative flag) RECOMPUTE their
    * extremes from the base, a group-semi-joined scan. That per-group
    * rescan is the honest price every IVM system pays for non-abelian
    * aggregates; the flag keeps it off the append path entirely.
    *
    * `sketches` maintain per-group HLL DISTINCT-COUNT sketches
    * (Datasketches `hll_sketch_agg` binaries — the APPROXIMATE MV:
    * `hll_sketch_estimate` over the stored sketch answers
    * distinct-count dashboards O(groups), and sketches UNION exactly
    * on roll-up where exact COUNT(DISTINCT) cannot re-aggregate at
    * all without the full IncrementalDistinct multiplicity table).
    * Sketch maintenance is the min/max two-speed shape with a blunter
    * flag: inserts UNION into the stored sketch (pure O(delta) — HLL
    * registers fold commutatively), but a sketch has NO inverse and
    * no "not at the extreme" shortcut, so ANY non-null retraction
    * flags its group for a semi-joined base rescan. Append-heavy
    * corpora — the shape sketches exist for — never touch the base. */
  /** `quantiles` maintain per-group QUANTILE sketches
    * ([[graft.functions.QuantileSketch]] — a deterministic bottom-k
    * row-sample, losslessly mergeable, so the rewrite's roll-up union
    * is bit-exact; percentile dashboards answer O(groups)). Same
    * two-speed shape as `sketches`: inserts UNION into the stored
    * sketch O(delta); any non-null retraction flags its group for a
    * semi-joined base rescan (a sample has no inverse, and an
    * UPDATE's re-inserted row hash would shadow its old value).
    * `sampleKeys` names the row-identity columns hashed for the
    * sample (the base's merge keys) — REQUIRED with quantiles.
    * `qskK` is the stored sketches' sample size (the p99.9 dial: a
    * bigger k tightens the ~1.65/√k rank error at O(k) state per
    * group) — every quantile column of one MV shares it, and the
    * rewrite serves only a query asking for exactly this precision
    * (sketches at different k would union down to min(k), changing
    * the answer the query asked for). */
  final case class AggSpec(groupCols: Seq[String], sums: Seq[(String, String)],
                           countName: String,
                           filterSql: Option[String] = None,
                           groupExprs: Map[String, String] = Map.empty,
                           mins: Seq[(String, String)] = Nil,
                           maxs: Seq[(String, String)] = Nil,
                           sketches: Seq[(String, String)] = Nil,
                           quantiles: Seq[(String, String)] = Nil,
                           sampleKeys: Seq[String] = Nil,
                           qskK: Int = graft.functions.QuantileSketch.DefaultK) {
    require(quantiles.isEmpty || sampleKeys.nonEmpty,
      "quantile sketches need sampleKeys (the row-identity columns " +
      "hashed for the bottom-k sample)")
    require(qskK > 0, s"qskK must be positive, got $qskK")
    def extremeCols: Seq[String] = mins.map(_._2) ++ maxs.map(_._2)
    /** Columns whose retraction path needs the base frame. */
    def rescanCols: Seq[String] =
      extremeCols ++ sketches.map(_._2) ++ quantiles.map(_._2)
  }

  /** `qsk_agg(xxhash64(sampleKeys), m)` as a Column. */
  private def qskAggCol(spec: AggSpec, m: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(graft.functions.QskAgg(
      expression(xxhash64(spec.sampleKeys.map(col): _*)),
      expression(m), spec.qskK).toAggregateExpression())
  }

  private def qskMergeCol(a: org.apache.spark.sql.Column,
                          b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(graft.functions.QskMerge(expression(a), expression(b)))
  }

  /** Derive expression-group columns, then apply the MV filter — the
    * shared pre-aggregation step of bootstrap and maintenance (each
    * row independently: exactly what makes the signed-delta algebra
    * correct for filtered MVs). */
  private def prepared(df: DataFrame, spec: AggSpec): DataFrame = {
    val derived = spec.groupExprs.toSeq.sortBy(_._1).foldLeft(df) {
      case (d, (out, sql)) => d.withColumn(out, expr(sql))
    }
    spec.filterSql.map(f =>
      derived.filter(coalesce(expr(f).cast("boolean"), lit(false))))
      .getOrElse(derived)
  }

  /** Initial build: one full aggregation of the base's CURRENT content,
    * committed as the aggregate table (keyed on the group columns).
    * Call once when the aggregate table does not yet exist; every
    * later base commit is an [[applyChanges]]. */
  def bootstrap(spark: SparkSession, aggPath: String, base: DataFrame,
                spec: AggSpec, numBuckets: Int = 0, batchId: String = "",
                retainVersions: Int = Scd1Merge.DefaultRetainVersions): Unit = {
    val exprs = spec.sums.map(p => sum(col(p._1)).as(p._2)) ++
      spec.mins.map(p => min(col(p._1)).as(p._2)) ++
      spec.maxs.map(p => max(col(p._1)).as(p._2)) ++
      spec.sketches.map(p => hll_sketch_agg(col(p._1)).as(p._2)) ++
      spec.quantiles.map(p => qskAggCol(spec, col(p._1)).as(p._2)) :+
      count(lit(1)).as(spec.countName)
    val aggd = prepared(base, spec)
      .groupBy(spec.groupCols.map(col): _*).agg(exprs.head, exprs.tail: _*)
    Scd1Merge.upsert(spark, aggPath, aggd, spec.groupCols, numBuckets,
      retainVersions = retainVersions,
      statsColumns = Seq(spec.countName), batchId = batchId)
  }

  /** [[bootstrap]] from the base TABLE (not a free frame), stamping
    * the aggregate with the base commit it captured — the stamp
    * [[applyChanges]] writes and [[graft.plans.GraftMvRewrite]]'s
    * freshness gate checks. Use this form when the aggregate is a
    * registered MV: a bare bootstrap carries no stamp, so the rewrite
    * (correctly) refuses to trust it. */
  def bootstrapFrom(spark: SparkSession, aggPath: String, basePath: String,
                    spec: AggSpec, numBuckets: Int = 0,
                    retainVersions: Int = Scd1Merge.DefaultRetainVersions): Unit = {
    val commit = baseCommitOf(basePath)
    bootstrap(spark, aggPath, baseReadOf(spark, basePath), spec,
      numBuckets, batchId = f"base-commit-$commit%09d",
      retainVersions = retainVersions)
  }

  // ---- the base may be FLAT or PARTITIONED: same stamp, same feed
  // contract — the partitioned forms resolve through the parent pin
  // set (commit = parent commit, feed = per-partition child diffs)

  private def partitioned(basePath: String): Boolean =
    graft.merge.PartitionedTable.tableExists(basePath)

  private def baseCommitOf(basePath: String): Int =
    (if (partitioned(basePath))
       graft.merge.PartitionedTable.tableCommit(basePath)
     else Scd1Merge.tableCommit(basePath)).getOrElse(
      throw new IllegalStateException(s"$basePath has no manifest"))

  private def baseReadOf(spark: SparkSession, basePath: String): DataFrame =
    if (partitioned(basePath))
      graft.merge.PartitionedTable.readTable(spark, basePath)
    else Scd1Merge.readTable(spark, basePath)

  /** Apply one commit range of the base table's change feed to the
    * aggregate table. `fromBack`/`toBack` follow
    * [[Scd1Merge.readChanges]] (1, 0 = the latest base commit).
    *
    * Delta algebra: insert/update rows carry +1, update_preimage/
    * delete rows carry −1 — an update contributes (new − old) to its
    * group's sums and 0 to its count, a row that MOVES groups
    * contributes −old to the old group and +new to the new one.
    * Groups whose maintained count hits 0 are committed as ZERO-COUNT
    * TOMBSTONES in the same stamped commit, then swept by a
    * stats-pruned `delete(count = 0)` (the count column is a declared
    * stats column, so the sweep probes only buckets whose count range
    * reaches 0).
    *
    * EXACTLY-ONCE: the aggregate commit is stamped with the base
    * commit number it consumed (`batchId` overrides the stamp text);
    * a call whose stamp already matches the aggregate's only re-runs
    * the idempotent tombstone sweep. A crash at ANY point therefore
    * replays safely — before the stamped commit, the delta recomputes
    * from the unchanged base snapshots; after it, the only possible
    * residue is tombstones, which the replay sweeps. Offset-based CDC
    * consumption with the consumed offset stored transactionally in
    * the consumer's own commit.
    */
  /** @param rowFilter predicate applied to the change frame before the
    *   delta fold — rows failing it contribute NOTHING to the aggregate
    *   (their preimage/postimage signs drop together per-row, so a
    *   filtered update nets exactly the visible transition: old row
    *   passed + new fails = −old; old failed + new passes = +new).
    *   [[IncrementalDistinct]] uses it to give NULL values SQL
    *   COUNT(DISTINCT) semantics. */
  def applyChanges(spark: SparkSession, aggPath: String, basePath: String,
                   baseKeys: Seq[String], spec: AggSpec,
                   fromBack: Int = 1, toBack: Int = 0,
                   numBuckets: Int = 0, batchId: String = "",
                   retainVersions: Int = Scd1Merge.DefaultRetainVersions,
                   rowFilter: org.apache.spark.sql.Column = lit(true)): Unit = {
    // sample the live commit ONCE and resolve the window + recompute
    // snapshot ABSOLUTELY against it — a base commit landing mid-call
    // can never shift what the stamp claims was applied (the
    // GraftSource offset-race posture)
    val live = baseCommitOf(basePath)
    val baseCommit = live - toBack
    val fromCommit = live - fromBack
    val stamp = if (batchId.nonEmpty) batchId else f"base-commit-$baseCommit%09d"
    if (Scd1Merge.tableBatchId(aggPath).contains(stamp)) {
      // already applied — finish a possibly-interrupted tombstone sweep
      sweepTombstones(spark, aggPath, spec, retainVersions)
      return
    }
    val changes = (if (partitioned(basePath))
        graft.merge.PartitionedTable.readChangesAtCommits(spark, basePath,
          fromCommit, baseCommit)
      else Scd1Merge.readChangesAtCommits(spark, basePath, baseKeys,
        fromCommit, baseCommit))
      .filter(rowFilter)
    // min/max + sketches: the recompute leg reads the base AT the
    // consumed commit
    val extBase =
      if (spec.rescanCols.isEmpty) None
      else Some(if (partitioned(basePath))
        graft.merge.PartitionedTable.readTableAtCommit(spark, basePath, baseCommit)
      else Scd1Merge.readTableAtCommit(spark, basePath, baseCommit))
    applyChangesFrame(spark, aggPath, changes, spec, numBuckets, stamp,
      retainVersions, extremesBase = extBase)
  }

  /** The feed-application core over an ALREADY-READ change frame —
    * what a [[graft.streaming.ChangeStream]] consumer calls per
    * delivered batch (the decoupled silver→gold chain: the gold job
    * never touches the base table, only its delivered feed).
    * Exactly-once by the same stamp contract as [[applyChanges]]:
    * a batch whose stamp matches the aggregate's only re-runs the
    * idempotent tombstone sweep. */
  def applyChangesFrame(spark: SparkSession, aggPath: String,
                        changes: DataFrame, spec: AggSpec,
                        numBuckets: Int = 0, stamp: String = "",
                        retainVersions: Int = Scd1Merge.DefaultRetainVersions,
                        extremesBase: Option[DataFrame] = None): Unit = {
    require(stamp.nonEmpty, "applyChangesFrame needs a batch stamp")
    require(spec.rescanCols.isEmpty || extremesBase.isDefined,
      "min/max and sketch maintenance need the base frame " +
      "(extremesBase) — a retraction rescans its group")
    if (Scd1Merge.tableBatchId(aggPath).contains(stamp)) {
      sweepTombstones(spark, aggPath, spec, retainVersions)
      return
    }
    val sign = when(col("_change_type").isin("insert", "update"), lit(1L))
      .otherwise(lit(-1L))
    // (measure, out, isMin) for both extreme families
    val exts: Seq[(String, String, Boolean)] =
      spec.mins.map(p => (p._1, p._2, true)) ++
      spec.maxs.map(p => (p._1, p._2, false))
    // `sums` may be empty (pure maintained COUNT — the multiplicity
    // layer of IncrementalDistinct); the count expr is always present.
    // Extremes fold TWO per-group helpers: the inserted-side extreme
    // (the pure-fold leg) and the retracted-side extreme (the
    // recompute flag's evidence).
    val deltaExprs = spec.sums.map(p =>
      sum(col("__sign") * col(p._1)).as(p._2)) ++
      exts.flatMap { case (m, out, isMin) => Seq(
        (if (isMin) min(when(col("__sign") === 1L, col(m)))
         else max(when(col("__sign") === 1L, col(m)))).as(s"__ins_$out"),
        (if (isMin) min(when(col("__sign") === -1L, col(m)))
         else max(when(col("__sign") === -1L, col(m)))).as(s"__del_$out"))
      } ++
      // sketches: the insert-side union leg, and the blunt retraction
      // flag (no inverse, no extreme shortcut — any non-null delete
      // MAY have removed a distinct value's last copy)
      spec.sketches.flatMap { case (m, out) => Seq(
        hll_sketch_agg(when(col("__sign") === 1L, col(m)))
          .as(s"__ins_$out"),
        max(when(col("__sign") === -1L && col(m).isNotNull, lit(true)))
          .as(s"__del_$out"))
      } ++
      // quantile samples: identical two-speed shape (a bottom-k
      // sample has no inverse either; an update's re-inserted hash
      // would shadow its old value — the preimage flags the group)
      spec.quantiles.flatMap { case (m, out) => Seq(
        qskAggCol(spec, when(col("__sign") === 1L, col(m)))
          .as(s"__ins_$out"),
        max(when(col("__sign") === -1L && col(m).isNotNull, lit(true)))
          .as(s"__del_$out"))
      } :+ sum(col("__sign")).as(spec.countName)
    val delta = prepared(changes, spec)
      .withColumn("__sign", sign)
      .groupBy(spec.groupCols.map(col): _*)
      .agg(deltaExprs.head, deltaExprs.tail: _*)
    val valueCols = spec.sums.map(_._2) :+ spec.countName
    val exists = Scd1Merge.tableExists(aggPath)
    // left join keeps the scan on the (small) aggregate side keyed
    // by the delta's groups; untouched groups never enter the plan
    // output and their buckets are never rewritten by the upsert
    val joined =
      if (!exists) delta.as("d")
      else delta.as("d")
        .join(Scd1Merge.readTable(spark, aggPath).as("c"),
          spec.groupCols, "left")
    def stored(out: String) =
      if (exists) col(s"c.$out") else lit(null)
    // per-extreme: the insert-side fold, and the conservative
    // recompute flag (a retraction AT or PAST the stored extreme —
    // or into an unknown group — may have removed the extreme row)
    val extSelect = exts.flatMap { case (_, out, isMin) => Seq(
      (if (isMin) least(stored(out), col(s"d.__ins_$out"))
       else greatest(stored(out), col(s"d.__ins_$out"))).as(out),
      (col(s"d.__del_$out").isNotNull && (stored(out).isNull ||
        (if (isMin) col(s"d.__del_$out") <= stored(out)
         else col(s"d.__del_$out") >= stored(out)))).as(s"__flag_$out"))
    }
    // sketches: insert-side UNION into the stored sketch (an empty
    // insert leg unions as identity); the retraction flag is blunt
    val skSelect = spec.sketches.flatMap { case (_, out) => Seq(
      when(col(s"d.__ins_$out").isNull, stored(out))
        .when(stored(out).isNull, col(s"d.__ins_$out"))
        .otherwise(hll_union(stored(out), col(s"d.__ins_$out"))).as(out),
      coalesce(col(s"d.__del_$out"), lit(false)).as(s"__flag_$out"))
    }
    // quantile samples: bottom-k unions are lossless and commute, so
    // the fold is the hll shape verbatim (qsk_merge is the union)
    val qsSelect = spec.quantiles.flatMap { case (_, out) => Seq(
      when(col(s"d.__ins_$out").isNull, stored(out))
        .when(stored(out).isNull, col(s"d.__ins_$out"))
        .otherwise(qskMergeCol(stored(out), col(s"d.__ins_$out"))).as(out),
      coalesce(col(s"d.__del_$out"), lit(false)).as(s"__flag_$out"))
    }
    val merged = joined.select(spec.groupCols.map(col) ++
      valueCols.map(v =>
        (coalesce(stored(v), lit(0L)) + col(s"d.$v")).as(v)) ++
      extSelect ++ skSelect ++ qsSelect: _*)
    val outCols = spec.groupCols ++ spec.sums.map(_._2) ++
      spec.mins.map(_._2) ++ spec.maxs.map(_._2) ++
      spec.sketches.map(_._2) ++ spec.quantiles.map(_._2) :+ spec.countName
    val flagOuts = exts.map(_._2) ++ spec.sketches.map(_._2) ++
      spec.quantiles.map(_._2)
    val fin =
      if (flagOuts.isEmpty) merged.select(outCols.map(col): _*)
      else {
        // RECOMPUTE leg: only flagged groups rescan — a semi-joined
        // group-pruned base aggregation (the non-abelian price, kept
        // entirely off the append path: insert-only batches flag
        // nothing and never touch the base)
        val flagged = merged
          .filter(flagOuts.map(o => col(s"__flag_$o")).reduce(_ || _))
          .select(spec.groupCols.map(col): _*)
        val recExprs = exts.map { case (m, out, isMin) =>
          (if (isMin) min(col(m)) else max(col(m))).as(s"__rec_$out") } ++
          spec.sketches.map { case (m, out) =>
            hll_sketch_agg(col(m)).as(s"__rec_$out") } ++
          spec.quantiles.map { case (m, out) =>
            qskAggCol(spec, col(m)).as(s"__rec_$out") }
        val rec = prepared(extremesBase.get, spec)
          .join(flagged, spec.groupCols, "left_semi")
          .groupBy(spec.groupCols.map(col): _*)
          .agg(recExprs.head, recExprs.tail: _*)
        merged.join(rec, spec.groupCols, "left")
          .select(outCols.map { v =>
            if (flagOuts.contains(v))
              when(col(s"__flag_$v"), col(s"__rec_$v"))
                .otherwise(col(v)).as(v)
            else col(v)
          }: _*)
      }
    Scd1Merge.upsert(spark, aggPath, fin, spec.groupCols, numBuckets,
      retainVersions = retainVersions,
      statsColumns = Seq(spec.countName), batchId = stamp)
    sweepTombstones(spark, aggPath, spec, retainVersions)
  }

  /** Remove zero-count tombstone rows. Idempotent; the count-column
    * stats prune the probe to buckets whose count range reaches 0. */
  private def sweepTombstones(spark: SparkSession, aggPath: String,
                              spec: AggSpec,
                              retainVersions: Int = Scd1Merge.DefaultRetainVersions): Unit =
    if (Scd1Merge.tableExists(aggPath)) {
      Scd1Merge.delete(spark, aggPath, spec.groupCols,
        col(spec.countName) === 0L, retainVersions)
      ()
    }
}
