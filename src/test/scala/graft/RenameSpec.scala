package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Column-mapping (rename without rewrite) mechanics: metadata-only
  * rename, logical view on every read path, logical→physical
  * translation on every write path, schema time travel, data skipping
  * on the renamed name, and materialization via rebucket. */
class RenameSpec extends SparkSpecBase {

  import spark.implicits._

  private def loaded(): String = {
    val path = Tmp.dir("rename_spec") + "/t"
    val dim = (0 until 40).map(i => (i.toLong, s"name_$i", i % 5))
      .toDF("k", "name", "region")
    Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = 4)
    path
  }

  private def bucketDirs(path: String): Set[String] =
    graft.merge.FsList.list(Paths.get(path, "data")).iterator
      .map(_.getFileName.toString).toSet

  test("rename is metadata-only and renames the read view") {
    val path = loaded()
    val before = bucketDirs(path)
    Scd1Merge.renameColumn(spark, path, "name", "label")
    assert(bucketDirs(path) == before, "a rename must move zero data")
    val got = Scd1Merge.readTable(spark, path)
    assert(got.columns.toSeq == Seq("k", "label", "region"))
    assert(got.filter(col("k") === 3L).select("label").first().getString(0)
      == "name_3")
  }

  test("upsert with the NEW name merges correctly after a rename") {
    val path = loaded()
    Scd1Merge.renameColumn(spark, path, "name", "label")
    Scd1Merge.upsert(spark, path,
      Seq((3L, "RELABELED", 3), (100L, "fresh", 0)).toDF("k", "label", "region"),
      Seq("k"))
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 41)
    assert(got.filter(col("k") === 3L).select("label").first().getString(0)
      == "RELABELED")
    // physical files still carry the OLD name (no rewrite happened)
    val anyBucket = graft.merge.FsList.list(Paths.get(path, "data")).iterator
      .filter(p => p.getFileName.toString.startsWith("b")).toSeq.head
    val phys = spark.read.parquet(anyBucket.toString).columns.toSeq
    assert(phys.contains("name") && !phys.contains("label"),
      s"files keep physical names: $phys")
  }

  test("renaming a MERGE KEY works end to end") {
    val path = loaded()
    Scd1Merge.renameColumn(spark, path, "k", "id")
    Scd1Merge.upsert(spark, path,
      Seq((5L, "KEYED", 0)).toDF("id", "name", "region"), Seq("id"))
    val got = Scd1Merge.readTable(spark, path)
    assert(got.columns.head == "id")
    assert(got.filter(col("id") === 5L).select("name").first().getString(0)
      == "KEYED")
    // point lookup on the renamed key still hash-prunes to one bucket
    assert(Scd1Merge.readTableWhere(spark, path, col("id") === 5L).count() == 1)
    val (cand, total) = Scd1Merge.lastPrune
    assert(cand == 1 && total == 4, s"expected 1/4 buckets, got $cand/$total")
  }

  test("snapshot reads time-travel the schema (old name before the rename)") {
    val path = loaded()
    Scd1Merge.renameColumn(spark, path, "name", "label")
    assert(Scd1Merge.readTableAt(spark, path, 1).columns.toSeq
      == Seq("k", "name", "region"))
    assert(Scd1Merge.readTable(spark, path).columns.toSeq
      == Seq("k", "label", "region"))
  }

  test("delete/update speak the logical names; change feed outputs them") {
    val path = loaded()
    Scd1Merge.renameColumn(spark, path, "name", "label")
    val n = Scd1Merge.update(spark, path, Seq("k"),
      col("label") === "name_7", Map("label" -> lit("touched")))
    assert(n == 1)
    val feed = Scd1Merge.readChanges(spark, path, Seq("k"), fromCommitsBack = 1)
    assert(feed.columns.contains("label") && !feed.columns.contains("name"))
    val types = feed.filter(col("k") === 7L)
      .select("_change_type").collect().map(_.getString(0)).toSet
    assert(types == Set("update", "update_preimage"))
    assert(Scd1Merge.delete(spark, path, Seq("k"), col("label") === "touched") == 1)
  }

  test("rebucket materializes the mapping: files get logical names, map clears") {
    val path = loaded()
    Scd1Merge.renameColumn(spark, path, "name", "label")
    Scd1Merge.rebucket(spark, path, Seq("k"), 8)
    val got = Scd1Merge.readTable(spark, path)
    assert(got.columns.toSeq == Seq("k", "label", "region"))
    val anyBucket = graft.merge.FsList.list(Paths.get(path, "data")).iterator
      .filter(p => p.getFileName.toString.startsWith("b")).toSeq
      .maxBy(_.getFileName.toString) // a new-layout dir
    val phys = spark.read.parquet(anyBucket.toString).columns.toSeq
    assert(phys.contains("label") && !phys.contains("name"),
      s"rebucket must materialize logical names: $phys")
    // renaming again after materialization still works
    Scd1Merge.renameColumn(spark, path, "label", "title")
    assert(Scd1Merge.readTable(spark, path).columns.contains("title"))
  }

  test("collisions and unknown columns fail loudly") {
    val path = loaded()
    intercept[IllegalArgumentException] {
      Scd1Merge.renameColumn(spark, path, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      Scd1Merge.renameColumn(spark, path, "name", "region")
    }
    // rename back to the physical name drops the mapping entry
    Scd1Merge.renameColumn(spark, path, "name", "label")
    Scd1Merge.renameColumn(spark, path, "label", "name")
    assert(Scd1Merge.readTable(spark, path).columns.toSeq
      == Seq("k", "name", "region"))
  }

  test("reserved PHYSICAL names stay unusable: rename and evolving upsert reject them") {
    val path = loaded()
    Scd1Merge.renameColumn(spark, path, "name", "label")
    // 'name' is gone LOGICALLY but lives physically in every file —
    // renaming another column onto it would make the colmap fold
    // ambiguous (old 'name' data would surface under the new column)
    intercept[IllegalArgumentException] {
      Scd1Merge.renameColumn(spark, path, "region", "name")
    }
    // same reservation on the write path: an evolving upsert must not
    // introduce a source column named after a colmap physical key
    intercept[IllegalArgumentException] {
      Scd1Merge.upsert(spark, path,
        Seq((3L, "x", 3, "smuggled")).toDF("k", "label", "region", "name"),
        Seq("k"), evolveSchema = true)
    }
    // the table is untouched by both rejections
    val got = Scd1Merge.readTable(spark, path)
    assert(got.columns.toSeq == Seq("k", "label", "region"))
    assert(got.count() == 40)
  }
}
