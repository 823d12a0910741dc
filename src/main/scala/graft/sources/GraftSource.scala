package graft.sources

import graft.merge.Scd1Merge
import org.apache.spark.sql.{DataFrame, GraftExpressionBridge, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => ConnectorOffset}
import org.apache.spark.sql.execution.streaming.{Source, Offset => V1Offset}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The graft table as a STANDARD Structured Streaming SOURCE:
  * `spark.readStream.format("graft").load(path)` yields the table's
  * change-data feed — rows plus `_change_type` (`insert` / `update` /
  * `update_preimage` / `delete`), Delta CDF-streaming parity through
  * the stock API with no library glue (ChangeStream's custom executor
  * remains for bucket-paged admission control; this doorway serves
  * every existing Spark streaming integration unmodified).
  *
  * OFFSETS are the table's COMMIT COUNTER — the natural exactly-once
  * coordinate: Structured Streaming's own checkpoint WAL persists
  * them, so restarts resume mid-history and a replayed trigger
  * delivers nothing. Batch (a, b] is [[Scd1Merge.readChanges]]
  * between the RETAINED manifests of commits a and b — cost O(changed
  * buckets), never a table rescan; at 100 TB a downstream consumer
  * moves deltas only. A brand-new checkpoint's first batch is the
  * table SNAPSHOT at the offered commit tagged `insert` (Delta's
  * starting-snapshot convention — history back to commit 1 may
  * already be vacuumed).
  *
  * `option("maxCommitsPerTrigger", n)` pages an established
  * consumer's catch-up n commits per micro-batch (after a restart
  * the first batch may cover all pending commits — the engine's
  * checkpoint, not this source, owns the committed position).
  * Falling behind retention fails LOUDLY (readChanges' contract):
  * raise the upstream table's `retainVersions`, the same dial as
  * Delta CDF + VACUUM. */
class GraftSource(spark: SparkSession, path: String,
                  metadataPath: String,
                  maxCommitsPerTrigger: Option[Int])
    extends Source with SupportsTriggerAvailableNow {
  // one seam serves BOTH layouts: flat tables stream their commit
  // counter, partitioned tables stream the PARENT commit counter (a
  // parent commit = one atomic multi-partition batch; its feed diffs
  // only the partitions whose pins moved — see
  // [[graft.merge.PartitionedTable.readChanges]])
  private val partitioned = graft.merge.PartitionedTable.tableExists(path)
  private def live: Long =
    (if (partitioned) graft.merge.PartitionedTable.tableCommit(path)
     else Scd1Merge.tableCommit(path)).getOrElse(0).toLong
  // ABSOLUTE commit coordinates end to end: the checkpointed offsets
  // ARE commit numbers, and resolving them by distance-from-live
  // would shift the window when a commit lands between the `live`
  // read and the manifest read — duplicates or skipped changes under
  // a concurrent writer. The *AtCommit forms resolve history
  // manifests by number, so a replayed batch is bit-identical.
  private def snapshotAtCommit(commit: Int): DataFrame =
    if (partitioned)
      graft.merge.PartitionedTable.readTableAtCommit(spark, path, commit)
    else Scd1Merge.readTableAtCommit(spark, path, commit)
  private def changesAt(fromCommit: Int, toCommit: Int): DataFrame =
    if (partitioned)
      graft.merge.PartitionedTable.readChangesAtCommits(spark, path,
        fromCommit, toCommit)
    else Scd1Merge.readChangesAtCommits(spark, path, keys, fromCommit, toCommit)
  private val keys: Seq[String] =
    (if (partitioned) graft.merge.PartitionedTable.tableKeys(path)
     else Scd1Merge.tableKeys(path))
      .filter(_.nonEmpty).getOrElse(throw new IllegalStateException(
        s"graft stream read: $path has no manifest merge keys"))

  override val schema: StructType = GraftSource.schemaOf(spark, path)

  // AvailableNow cap: everything pending AT RUN START, un-paced —
  // latestOffset then pages toward it (the FileStreamSource shape:
  // the run cap and the per-trigger limit are separate dials)
  @volatile private var availableCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableCap = Some(live)

  private def parse(o: ConnectorOffset): Long = o match {
    case GraftSourceOffset(c) => c
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json().trim.toLong
  }

  /** Admission control (the engine consults THIS, not getOffset, for
    * a `SupportsAdmissionControl` source): `startOffset` is the
    * engine's committed position — null/absent means a brand-new
    * checkpoint, whose first batch is the initial snapshot (never
    * paged: commit-by-commit replay from 1 would need unbounded
    * history). After that, `maxCommitsPerTrigger` commits per batch
    * toward the cap. */
  override def latestOffset(startOffset: ConnectorOffset,
                            limit: ReadLimit): ConnectorOffset = {
    val l = availableCap.getOrElse(live)
    if (l <= 0) return null
    val base = Option(startOffset).map(parse).getOrElse(-1L)
    val next = (base, maxCommitsPerTrigger) match {
      case (-1L, _) => l // first offer ever: snapshot up to live
      case (o, Some(m)) => math.min(l, o + math.max(1, m))
      case (o, None) => math.max(o, l)
    }
    GraftSourceOffset(next)
  }

  override def getOffset: Option[V1Offset] = {
    // legacy entry (not used once SupportsAdmissionControl is
    // implemented) — the un-paged answer
    val l = availableCap.getOrElse(live)
    if (l <= 0) None else Some(GraftSourceOffset(l))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endC = parse(end).toInt
    val startC = start.map(parse).getOrElse(0L).toInt
    val out =
      if (startC <= 0)
        // initial snapshot AT the offered commit (commits may have
        // landed since getOffset — the retained manifest pins it)
        snapshotAtCommit(endC)
          .withColumn("_change_type", lit("insert"))
      else changesAt(startC, endC)
    GraftExpressionBridge.streamingBatch(
      out.select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def stop(): Unit = ()
}

object GraftSource {
  /** Feed schema: the table's logical columns + `_change_type` —
    * either layout. */
  def schemaOf(spark: SparkSession, path: String): StructType = {
    val base =
      if (graft.merge.PartitionedTable.tableExists(path))
        graft.merge.PartitionedTable.readTable(spark, path)
      else Scd1Merge.readTable(spark, path)
    StructType(base.schema.fields :+
      StructField("_change_type", StringType, nullable = false))
  }
}

/** Offset in the table's commit-counter domain (json = the number). */
case class GraftSourceOffset(commit: Long) extends V1Offset {
  override def json(): String = commit.toString
}
