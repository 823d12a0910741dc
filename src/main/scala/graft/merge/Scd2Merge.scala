package graft.merge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCD Type-2 history dimension — the next thing a warehouse user asks
  * of an SCD1 engine: instead of overwriting a changed dim row (the
  * reference's `whenMatchedUpdateAll`, gold_dim_branch.py:177-184),
  * keep every version with a validity interval:
  *
  *   (naturalKeys…, attrs…, valid_from, valid_to, is_current)
  *
  * Each batch snapshot is diffed against the CURRENT version per key
  * (null-safe `<=>` on every attribute — the same change-detection rule
  * DimBuilder uses, so a null attribute doesn't re-version forever):
  *  - new key           → insert (valid_from = seq, valid_to = null)
  *  - changed attrs     → close the current row (valid_to = seq,
  *                        is_current = false) AND insert the new version
  *  - unchanged         → untouched: its bucket is not even rewritten
  *
  * The whole batch commits as ONE [[Scd1Merge.upsert]] keyed by
  * (naturalKeys…, valid_from): the close REPLACES the old version row
  * in place (same key), the insert lands a new one — so SCD2 inherits
  * the manifest commit's atomicity, writer lock, snapshot retention,
  * and partial-bucket rewrites without any new storage machinery, and
  * replaying a batch is a no-op (the diff finds nothing changed).
  *
  * Quirk note (SURVEY.md §2.7 Q3): SCD1 merges on the SURROGATE key for
  * idempotency; SCD2's natural idempotency unit is (natural key,
  * version), which (naturalKeys, valid_from) encodes directly —
  * documented deviation, same replay-safety guarantee, judged against
  * a window-over-batch-sequence oracle (`s16_scd2_dim`).
  *
  * Scale: per batch, one left join of the batch against the CURRENT
  * slice (is_current filter pushes to the scan; AQE broadcasts small
  * batches), and the upsert rewrites only changed keys' buckets. The
  * history grows append-only; [[Scd1Merge.compact]] handles the files.
  */
object Scd2Merge {

  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"
  val IsCurrent = "is_current"

  /** Apply one batch snapshot (one row per natural key; every non-key
    * column is an attribute) at monotonically-increasing `batchSeq`.
    * Replaying the latest batch is a no-op; an out-of-order older
    * batch fails loudly. */
  def upsertBatch(spark: SparkSession, tablePath: String, batch: DataFrame,
                  naturalKeys: Seq[String], batchSeq: Long,
                  numBuckets: Int = 0): Unit = {
    val attrs = batch.columns.toSeq.filterNot(naturalKeys.contains)
    val mergeKeys = naturalKeys :+ ValidFrom
    def versioned(rows: DataFrame, from: Column): DataFrame =
      rows.select((naturalKeys ++ attrs).map(col) :+
        from.cast("bigint").as(ValidFrom) :+
        lit(null).cast("bigint").as(ValidTo) :+
        lit(true).as(IsCurrent): _*)

    if (!Scd1Merge.tableExists(tablePath)) {
      Scd1Merge.upsert(spark, tablePath, versioned(batch, lit(batchSeq)),
        mergeKeys, numBuckets)
      return
    }
    val current = Scd1Merge.readTable(spark, tablePath).filter(col(IsCurrent))
    // rename the current side so batch attrs keep their names post-join
    val cur = current.select(
      naturalKeys.map(col) ++
      (col(ValidFrom).as("__c_from") +: attrs.map(a => col(a).as(s"__c_$a"))): _*)
    val changed = batch.join(cur, naturalKeys, "left")
      .filter(col("__c_from").isNull ||
        attrs.map(a => !(col(a) <=> col(s"__c_$a"))).reduce(_ || _))
    if (changed.isEmpty) return // replay / no-change batch: no commit at all
    val maxFrom = current.agg(max(col(ValidFrom))).first().getLong(0)
    require(batchSeq > maxFrom,
      s"SCD2 batch sequence must advance: got $batchSeq, table is at $maxFrom")
    val inserts = versioned(changed, lit(batchSeq))
    val closes = changed.filter(col("__c_from").isNotNull).select(
      naturalKeys.map(col) ++
      attrs.map(a => col(s"__c_$a").as(a)) :+
      col("__c_from").as(ValidFrom) :+
      lit(batchSeq).cast("bigint").as(ValidTo) :+
      lit(false).as(IsCurrent): _*)
    Scd1Merge.upsert(spark, tablePath, closes.unionByName(inserts),
      mergeKeys, numBuckets)
  }

  /** Apply one CDC batch (a [[Scd1Merge.readChanges]] /
    * [[graft.streaming.ChangeStream]] frame) to the SCD2 history —
    * the medallion chain's "silver CDC feeds the gold history dim"
    * leg, which [[upsertBatch]]'s full-snapshot contract cannot
    * express: a change feed names only the keys that MOVED, and it
    * carries DELETES.
    *
    *  - insert/update rows version exactly like a batch snapshot of
    *    the changed keys (diffed against current, so a replayed
    *    no-op feed commits nothing);
    *  - delete rows CLOSE the current version with no successor —
    *    the key's history simply ends, and a later re-insert opens a
    *    fresh version;
    *  - update_preimage rows are ignored (the current SCD2 row IS
    *    the preimage).
    *
    * One commit for closes + inserts, same (naturalKeys, valid_from)
    * idempotency and bucket-partial rewrite as the snapshot path. */
  def applyChanges(spark: SparkSession, tablePath: String, changes: DataFrame,
                   naturalKeys: Seq[String], batchSeq: Long,
                   numBuckets: Int = 0): Unit = {
    val attrs = changes.columns.toSeq
      .filterNot(c => naturalKeys.contains(c) || c == "_change_type")
    val mergeKeys = naturalKeys :+ ValidFrom
    def versioned(rows: DataFrame, from: Column): DataFrame =
      rows.select((naturalKeys ++ attrs).map(col) :+
        from.cast("bigint").as(ValidFrom) :+
        lit(null).cast("bigint").as(ValidTo) :+
        lit(true).as(IsCurrent): _*)
    val ups = changes.filter(col("_change_type").isin("insert", "update"))
      .select((naturalKeys ++ attrs).map(col): _*)
    val dels = changes.filter(col("_change_type") === "delete")
      .select(naturalKeys.map(col): _*)

    if (!Scd1Merge.tableExists(tablePath)) {
      // feed from an empty upstream: deletes have nothing to close
      Scd1Merge.upsert(spark, tablePath, versioned(ups, lit(batchSeq)),
        mergeKeys, numBuckets)
      return
    }
    val current = Scd1Merge.readTable(spark, tablePath).filter(col(IsCurrent))
    val cur = current.select(
      naturalKeys.map(col) ++
      (col(ValidFrom).as("__c_from") +: attrs.map(a => col(a).as(s"__c_$a"))): _*)
    val changedUps = ups.join(cur, naturalKeys, "left")
      .filter(col("__c_from").isNull ||
        attrs.map(a => !(col(a) <=> col(s"__c_$a"))).reduce(_ || _))
    val delCur = current.join(dels, naturalKeys, "left_semi")
    if (changedUps.isEmpty && delCur.isEmpty) return
    val maxFrom = current.agg(max(col(ValidFrom))).first().getLong(0)
    require(batchSeq > maxFrom,
      s"SCD2 batch sequence must advance: got $batchSeq, table is at $maxFrom")
    val inserts = versioned(changedUps, lit(batchSeq))
    val closesUp = changedUps.filter(col("__c_from").isNotNull).select(
      naturalKeys.map(col) ++
      attrs.map(a => col(s"__c_$a").as(a)) :+
      col("__c_from").as(ValidFrom) :+
      lit(batchSeq).cast("bigint").as(ValidTo) :+
      lit(false).as(IsCurrent): _*)
    val closesDel = delCur.select(
      (naturalKeys ++ attrs).map(col) :+
      col(ValidFrom) :+
      lit(batchSeq).cast("bigint").as(ValidTo) :+
      lit(false).as(IsCurrent): _*)
    Scd1Merge.upsert(spark, tablePath,
      closesUp.unionByName(closesDel).unionByName(inserts),
      mergeKeys, numBuckets)
  }
}
