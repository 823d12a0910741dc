package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Deletion-vector (soft delete) mechanics: zero bucket churn on the
  * delete, reader exclusion everywhere (live, filtered, snapshot,
  * change feed), reinsert-clears-tombstone, materialization folding,
  * and GC safety of the dv dirs. */
class DvSpec extends SparkSpecBase {

  import spark.implicits._

  private def loaded(): String = {
    val path = Tmp.dir("dv_spec") + "/t"
    val dim = (0 until 40).map(i => (i.toLong, s"name_$i", i % 5))
      .toDF("k", "name", "region")
    Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = 4)
    path
  }

  private def bucketDirs(path: String): Set[String] =
    graft.merge.FsList.list(Paths.get(path, "data")).iterator
      .map(_.getFileName.toString).filter(_.startsWith("b")).toSet

  test("soft delete rewrites NO bucket dir and hides the rows everywhere") {
    val path = loaded()
    val before = bucketDirs(path)
    val n = Scd1Merge.deleteSoft(spark, path, Seq("k"), col("k") % 10 === 0)
    assert(n == 4, s"expected 4 tombstoned rows, got $n")
    assert(bucketDirs(path) == before,
      "a soft delete must not create or replace any bucket version")
    assert(Scd1Merge.readTable(spark, path).count() == 36)
    // filtered read excludes them too (dv applies after skipping)
    assert(Scd1Merge.readTableWhere(spark, path, col("k") === 10L).count() == 0)
    assert(Scd1Merge.readTableWhere(spark, path, col("k") === 11L).count() == 1)
    // double-tombstone: re-running matches nothing new
    assert(Scd1Merge.deleteSoft(spark, path, Seq("k"), col("k") % 10 === 0) == 0)
  }

  test("snapshot before the soft delete still sees the rows; change feed says delete") {
    val path = loaded()
    Scd1Merge.deleteSoft(spark, path, Seq("k"), col("k") === 7L)
    assert(Scd1Merge.readTableAt(spark, path, 1).count() == 40)
    assert(Scd1Merge.readTable(spark, path).count() == 39)
    val feed = Scd1Merge.readChanges(spark, path, Seq("k"), fromCommitsBack = 1)
    val rows = feed.select(col("k"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((7L, "delete")),
      s"dv-only commit must surface exactly the tombstoned key as delete: $rows")
  }

  test("upserting a tombstoned key resurrects it (tombstone cleared)") {
    val path = loaded()
    Scd1Merge.deleteSoft(spark, path, Seq("k"), col("k") === 3L || col("k") === 5L)
    Scd1Merge.upsert(spark, path,
      Seq((3L, "NAME_3_BACK", 3)).toDF("k", "name", "region"), Seq("k"))
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 39) // 40 - 2 + 1 back
    assert(got.filter(col("k") === 3L).select("name").first().getString(0)
      == "NAME_3_BACK")
    assert(got.filter(col("k") === 5L).count() == 0, "key 5 stays deleted")
    // change feed across the upsert: key 3 is an update (back to life
    // against the dv'd snapshot? the pre-state excluded it -> insert)
    val feed = Scd1Merge.readChanges(spark, path, Seq("k"), fromCommitsBack = 1)
    val t3 = feed.filter(col("k") === 3L).select("_change_type")
      .collect().map(_.getString(0)).toSet
    assert(t3 == Set("insert"),
      s"a resurrected key was absent before the commit, so it inserts: $t3")
  }

  test("materializeDeletes rewrites only dv-key buckets, clears the dv, content invariant") {
    val path = loaded()
    Scd1Merge.deleteSoft(spark, path, Seq("k"), col("k") === 8L) // one key -> one bucket
    val before = canon(Scd1Merge.readTable(spark, path))
    val dirsBefore = bucketDirs(path)
    val rewrote = Scd1Merge.materializeDeletes(spark, path)
    assert(rewrote == 1, s"one tombstoned key lives in one bucket, got $rewrote")
    val changed = bucketDirs(path).diff(dirsBefore)
    assert(changed.size == 1,
      s"exactly one new bucket version expected, got $changed")
    assert(canon(Scd1Merge.readTable(spark, path)) == before,
      "materialization must not change table content")
    // dv gone: another materialize is a no-op
    assert(Scd1Merge.materializeDeletes(spark, path) == 0)
    // deep-clean: after vacuum(0) no dv dir remains on disk
    Scd1Merge.vacuum(path, retain = 0)
    assert(!graft.merge.FsList.list(Paths.get(path, "data")).iterator
      .exists(_.getFileName.toString.startsWith("dv_")),
      "materialized dv dirs must be reclaimable")
  }

  test("dv dirs survive sweeps while referenced (retention + snapshot reads)") {
    val path = loaded()
    Scd1Merge.deleteSoft(spark, path, Seq("k"), col("k") === 1L)
    // an unrelated commit (touches other rows) must not strand or sweep
    // the still-referenced dv
    Scd1Merge.upsert(spark, path,
      Seq((100L, "new", 0)).toDF("k", "name", "region"), Seq("k"))
    assert(Scd1Merge.readTable(spark, path).filter(col("k") === 1L).count() == 0,
      "the dv must survive an unrelated upsert commit")
    assert(Scd1Merge.readTable(spark, path).count() == 40) // 39 + 1 new
  }

  test("the dv anti-join broadcasts (no table-side shuffle to read a tombstoned table)") {
    val path = loaded()
    Scd1Merge.deleteSoft(spark, path, Seq("k"), col("k") === 1L)
    val p = Scd1Merge.readTable(spark, path)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected a broadcast left-anti dv join:\n$p")
  }

  test("hard delete and update do not see soft-deleted rows") {
    val path = loaded()
    Scd1Merge.deleteSoft(spark, path, Seq("k"), col("k") === 2L)
    // update matching ALL rows: the tombstoned one must not resurrect
    val updated = Scd1Merge.update(spark, path, Seq("k"),
      col("region") === 2, Map("name" -> lit("touched")))
    assert(updated == 7, s"region 2 holds 8 keys, one tombstoned: $updated")
    assert(Scd1Merge.readTable(spark, path).filter(col("k") === 2L).count() == 0)
    val deleted = Scd1Merge.delete(spark, path, Seq("k"), col("region") === 2)
    assert(deleted == 7, "hard delete counts only visible rows")
  }
}
