package graft.streaming

import graft.merge.Scd1Merge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The bucketed table as a STREAMING SOURCE — Delta CDF-streaming
  * parity for table-to-table incremental chains (the reference's whole
  * architecture: silver tables feeding gold tables,
  * `silver_notebook.py:59-62` → `gold_fact.py:12`; at 100 TB that
  * chain must move deltas, never rescan).
  *
  * Shape: a micro-batch executor with the same contract Structured
  * Streaming's `Trigger.AvailableNow` + `foreachBatch` gives a file
  * source — durable offsets, ordered redelivery after a crash, and a
  * deterministic per-batch id the sink uses for exactly-once — except
  * the offset domain is the TABLE'S COMMIT COUNTER instead of file
  * names, and each batch's rows come from [[Scd1Merge.readChanges]]
  * (O(changed buckets), not O(table)).
  *
  * Protocol per trigger:
  *   1. read the durable consumer offset `o` (atomic file, one per
  *      checkpoint dir; 0 = never consumed),
  *   2. read the table's live commit `c`; every commit in `(o, c]` is
  *      pending,
  *   3. deliver batches in commit order — the FIRST batch for a new
  *      consumer is the initial snapshot tagged `insert` (Delta's
  *      starting-snapshot convention; history to commit 1 may already
  *      be vacuumed, so "replay from 0" is not generally available),
  *      after that each batch is the net change feed of up to
  *      `maxCommitsPerBatch` commits,
  *   4. the offset advances (atomic rename) only AFTER the sink
  *      returns — a crash between sink and advance redelivers the same
  *      rows under the SAME batch id, which a stamping sink
  *      ([[upsertSink]]) turns into exactly-once.
  *
  * Falling behind retention fails loudly: `readChanges` throws when
  * the `from` snapshot aged out — the consumer must raise the source
  * table's `retainVersions` (same contract as Delta CDF + VACUUM).
  */
object ChangeStream {

  /** Durable consumer offset: the last table commit fully applied
    * downstream. 0 = nothing consumed. */
  def committedOffset(checkpointDir: String): Int = {
    val p = Paths.get(checkpointDir, "offset")
    if (!Files.exists(p)) 0
    else new String(Files.readAllBytes(p), UTF_8).trim.toInt
  }

  private def advanceOffset(checkpointDir: String, commit: Int): Unit = {
    Files.createDirectories(Paths.get(checkpointDir))
    val tmp = Paths.get(checkpointDir, "offset.tmp")
    Files.write(tmp, commit.toString.getBytes(UTF_8))
    Files.move(tmp, Paths.get(checkpointDir, "offset"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Deterministic id for the batch that advances the offset TO
    * `commit` — stable across redeliveries, so sinks can stamp it. */
  def batchIdFor(commit: Int): String = s"cdf@$commit"

  /** Sub-commit progress for bucket-paged delivery: `(target commit,
    * pages fully applied)`. Lives beside the offset file; cleared when
    * the commit's last page lands and the main offset advances. */
  private def pagesApplied(checkpointDir: String, target: Int): Int = {
    val p = Paths.get(checkpointDir, "suboffset")
    if (!Files.exists(p)) 0
    else new String(Files.readAllBytes(p), UTF_8).trim.split(":", 2) match {
      case Array(t, g) if t.toInt == target => g.toInt
      case _ => 0 // progress belongs to an older, fully-applied commit
    }
  }

  private def advancePages(checkpointDir: String, target: Int, pages: Int): Unit = {
    Files.createDirectories(Paths.get(checkpointDir))
    val tmp = Paths.get(checkpointDir, "suboffset.tmp")
    Files.write(tmp, s"$target:$pages".getBytes(UTF_8))
    Files.move(tmp, Paths.get(checkpointDir, "suboffset"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Consume every commit of `tablePath` past this checkpoint's offset,
    * AvailableNow-style: batches of up to `maxCommitsPerBatch` commits,
    * in commit order, `sink(changes, batchId)` per batch, offset
    * advanced after each. `changes` carries the table's logical columns
    * plus `_change_type` (`insert`/`update`/`update_preimage`/
    * `delete`). Returns the number of batches delivered (0 = caught
    * up — a replayed trigger commits nothing).
    *
    * ADMISSION CONTROL (`maxBucketsPerTrigger` > 0): the
    * `maxFilesPerTrigger` dial for table feeds. A backfill commit
    * touching every bucket would otherwise arrive as ONE giant
    * micro-batch; with a limit, each commit's bucket-pruned feed is
    * PAGED `maxBucketsPerTrigger` buckets at a time — and the initial
    * snapshot pages the same way over the live buckets. Ordering and
    * exactly-once survive paging: keys hash to exactly one bucket, so
    * pages partition the commit's key space (no key spans two pages);
    * each page gets a stable derived batch id (`cdf@<c>#<page>`) a
    * stamping sink dedupes on redelivery, and durable sub-commit
    * progress (`suboffset`) resumes a crashed drain mid-commit.
    * Commits are paged one at a time (`maxCommitsPerBatch` is
    * capped to 1 while a bucket limit is set — mixing both dials
    * would interleave key spaces across commits). */
  def runAvailableNow(spark: SparkSession, tablePath: String, keys: Seq[String],
                      checkpointDir: String, maxCommitsPerBatch: Int = 1,
                      maxBucketsPerTrigger: Int = 0)(
                      sink: (DataFrame, String) => Unit): Int = {
    require(maxCommitsPerBatch >= 1, "maxCommitsPerBatch must be >= 1")
    val live = Scd1Merge.tableCommit(tablePath).getOrElse(
      throw new IllegalStateException(
        s"readChangesStream: $tablePath has no manifest (not a committed bucketed table)"))
    var batches = 0
    var o = committedOffset(checkpointDir)
    while (o < live) {
      // a NEW consumer starts from the full live snapshot in one batch
      // (commit-by-commit replay from 1 would need unbounded history);
      // an established one pages through commits
      val target =
        if (o == 0) live
        else if (maxBucketsPerTrigger > 0) o + 1
        else math.min(o + maxCommitsPerBatch, live)
      def deliver(changes: DataFrame, batchId: String): Unit = {
        // persist for the sink's lifetime: a change feed is join-heavy
        // lineage and a sink typically splits it (emptiness probes +
        // upsert leg + delete leg = up to 3 evaluations otherwise)
        val pinned = changes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try sink(pinned, batchId)
        finally pinned.unpersist(blocking = false)
        batches += 1
      }
      if (maxBucketsPerTrigger <= 0) {
        deliver(
          if (o == 0)
            Scd1Merge.readTable(spark, tablePath)
              .withColumn("_change_type", lit("insert"))
          else
            Scd1Merge.readChanges(spark, tablePath, keys,
              fromCommitsBack = live - o, toCommitsBack = live - target),
          batchIdFor(target))
      } else {
        val pageBuckets: Seq[Int] =
          if (o == 0) Scd1Merge.liveBucketIds(tablePath)
          else Scd1Merge.changedBucketIds(spark, tablePath,
            fromCommitsBack = live - o, toCommitsBack = live - target)
        val nb = Scd1Merge.tableNumBuckets(tablePath).get
        val pages = pageBuckets.grouped(maxBucketsPerTrigger).toSeq
        pages.zipWithIndex.drop(pagesApplied(checkpointDir, target))
          .foreach { case (page, i) =>
            val changes =
              if (o == 0)
                // the engine's own bucket hash routes each key to one
                // page — the same pmod(hash(keys), nb) the table is laid
                // out with
                Scd1Merge.readTable(spark, tablePath)
                  .filter(pmod(hash(keys.map(col): _*), lit(nb))
                    .isin(page: _*))
                  .withColumn("_change_type", lit("insert"))
              else
                Scd1Merge.readChanges(spark, tablePath, keys,
                  fromCommitsBack = live - o, toCommitsBack = live - target,
                  bucketFilter = Some(page.toSet))
            deliver(changes, s"${batchIdFor(target)}#$i")
            advancePages(checkpointDir, target, i + 1)
          }
      }
      advanceOffset(checkpointDir, target)
      o = target
    }
    Files.deleteIfExists(Paths.get(checkpointDir, "suboffset"))
    batches
  }

  /** The standard downstream: apply each change batch to a SECOND
    * bucketed table, exactly-once under redelivery. Upserts (insert +
    * update images) and keyed deletes land as separate commits, so the
    * stamp distinguishes "fully applied" (`batchId`) from "upsert
    * landed, delete pending" (`batchId:u`) — a crash at any point
    * resumes without double-applying either half. Preimages are
    * dropped (the destination holds state, not history). */
  def upsertSink(spark: SparkSession, dstPath: String, keys: Seq[String],
                 numBuckets: Int = 0): (DataFrame, String) => Unit =
    (changes: DataFrame, batchId: String) => {
      val stamped = Scd1Merge.tableBatchId(dstPath)
      if (!stamped.contains(batchId)) {
        val upserts = changes
          .filter(col("_change_type").isin("insert", "update"))
          .drop("_change_type")
        val deletes = changes.filter(col("_change_type") === "delete")
          .select(keys.map(col): _*)
        // ONE probe job decides both legs (the runner persists
        // `changes`, so this is an in-memory agg, not a recompute)
        val byType = changes.groupBy(col("_change_type")).count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val hasUp = byType.contains("insert") || byType.contains("update")
        val hasDel = byType.contains("delete")
        // single-leg batches stamp the full id directly; only a batch
        // with BOTH legs needs the half stamp to survive a crash
        // between the two commits without double-applying the first
        val upStamp = if (hasDel) batchId + ":u" else batchId
        if (hasUp && !stamped.contains(upStamp))
          Scd1Merge.upsert(spark, dstPath, upserts, keys, numBuckets,
            batchId = upStamp)
        if (hasDel)
          Scd1Merge.deleteSoftKeys(spark, dstPath, keys, deletes,
            batchId = batchId)
      }
    }
}
