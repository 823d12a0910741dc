package graft.store

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Idempotent small-file compaction for APPEND-ONLY zones (bronze /
  * silver dirs, where every ingest batch lands another handful of
  * files and nothing ever rewrites them — SalesReplay's append sinks,
  * IngestRunner's bronze). The manifest-table counterpart is
  * [[graft.merge.Scd1Merge.compact]]; plain parquet dirs have no
  * manifest to swap, so the swap unit here is the DIRECTORY:
  *
  *   write compacted copy → hidden sibling `.{name}.compacting`
  *   dir  → `.{name}.old`   (atomic rename)
  *   tmp  → dir             (atomic rename)
  *   delete `.{name}.old`
  *
  * Both residue names start with '.', which Spark's file index ignores
  * — a crash mid-protocol never double-exposes rows to a partition
  * discovery over the parent dir. The one non-atomic window (between
  * the two renames the dir is absent) is closed on the next call by
  * the recovery rule: dir missing + `.old` present → move `.old` back.
  * Run it from the zone's single writer between batches (the ingest
  * loop owns the zone; concurrent readers of a zone being compacted
  * see before-or-after content except in that instant — schedule in
  * the ingest gap, as SalesReplay does).
  *
  * At 100 TB: `targetFiles` ≈ partition_bytes / 256 MB; compact each
  * FINISHED partition dir (e.g. `silver/__batch=N` right after batch N
  * commits — O(batch) work), never the whole zone per batch (O(table)).
  */
object ZoneCompactor {

  private def hidden(dir: String, suffix: String): Path = {
    val p = Paths.get(dir)
    p.getParent.resolve("." + p.getFileName.toString + suffix)
  }

  private def parquetFiles(p: Path): Long =
    graft.merge.FsList.walk(p).iterator
      .count(_.getFileName.toString.endsWith(".parquet"))

  /** Compact `dir` in place; returns (filesBefore, filesAfter).
    * No-op (after = before) when already at or under target.
    *
    * @param partitionCols hive-style partition columns of the dir, if
    *        any — preserved in the rewrite (one file per partition per
    *        target "slot"); empty for a flat dir.
    */
  def compactZone(spark: SparkSession, dir: String,
                  partitionCols: Seq[String] = Nil,
                  targetFiles: Int = 1): (Long, Long) = {
    val d = Paths.get(dir)
    val old = hidden(dir, ".old")
    val tmp = hidden(dir, ".compacting")
    // crash recovery: a previous run died between the two renames
    if (!Files.exists(d) && Files.exists(old))
      Files.move(old, d, StandardCopyOption.ATOMIC_MOVE)
    graft.merge.Scd1Merge.deleteRecursively(old)
    graft.merge.Scd1Merge.deleteRecursively(tmp)
    if (!Files.exists(d)) return (0L, 0L)
    val before = parquetFiles(d)
    val floor = if (partitionCols.isEmpty) targetFiles.toLong else 0L
    if (before <= floor) return (before, before)
    val df = spark.read.parquet(dir)
    val shaped =
      if (partitionCols.isEmpty) df.coalesce(targetFiles)
      // one shuffle partition per partition value → one file each;
      // coalesce would interleave partitions into shared tasks and
      // still write a file per (task, partition) pair
      else df.repartition(partitionCols.map(col): _*)
    val writer = shaped.write.mode(SaveMode.Overwrite)
    (if (partitionCols.isEmpty) writer else writer.partitionBy(partitionCols: _*))
      .parquet(tmp.toString)
    val after = parquetFiles(tmp)
    if (after >= before) { // nothing gained (already compact): keep as-is
      graft.merge.Scd1Merge.deleteRecursively(tmp)
      (before, before)
    } else {
      Files.move(d, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp, d, StandardCopyOption.ATOMIC_MOVE)
      graft.merge.Scd1Merge.deleteRecursively(old)
      (before, after)
    }
  }
}
