package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Column DROP via column mapping (drop without rewrite): metadata-only
  * drop, narrowed view on every read path, schema time travel, reserved
  * physical name on the write path, and materialization via rebucket —
  * the mirror of RenameSpec for the other half of the mapping. */
class DropSpec extends SparkSpecBase {

  import spark.implicits._

  private def loaded(): String = {
    val path = Tmp.dir("drop_spec") + "/t"
    val dim = (0 until 40).map(i => (i.toLong, s"name_$i", i % 5, i * 10.0))
      .toDF("k", "name", "region", "score")
    Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = 4)
    path
  }

  private def bucketDirs(path: String): Set[String] =
    graft.merge.FsList.list(Paths.get(path, "data")).iterator
      .map(_.getFileName.toString).toSet

  test("drop is metadata-only: zero dir churn, bytes stay, view narrows") {
    val path = loaded()
    val before = bucketDirs(path)
    Scd1Merge.dropColumn(spark, path, "score")
    assert(bucketDirs(path) == before, "a drop must move zero data")
    val got = Scd1Merge.readTable(spark, path)
    assert(got.columns.toSeq == Seq("k", "name", "region"))
    // the bytes are still physically in the files (no rewrite happened)
    val anyBucket = graft.merge.FsList.list(Paths.get(path, "data")).iterator
      .filter(_.getFileName.toString.startsWith("b")).toSeq.head
    assert(spark.read.parquet(anyBucket.toString).columns.contains("score"))
  }

  test("snapshot reads time-travel the schema (pre-drop snapshot shows the column)") {
    val path = loaded()
    Scd1Merge.dropColumn(spark, path, "score")
    assert(Scd1Merge.readTableAt(spark, path, 1).columns.toSeq
      == Seq("k", "name", "region", "score"))
    assert(Scd1Merge.readTable(spark, path).columns.toSeq
      == Seq("k", "name", "region"))
  }

  test("upserts after the drop speak the narrowed schema; feed omits the column") {
    val path = loaded()
    Scd1Merge.dropColumn(spark, path, "score")
    Scd1Merge.upsert(spark, path,
      Seq((3L, "REDONE", 3), (100L, "fresh", 0)).toDF("k", "name", "region"),
      Seq("k"))
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 41)
    assert(got.columns.toSeq == Seq("k", "name", "region"))
    val feed = Scd1Merge.readChanges(spark, path, Seq("k"), fromCommitsBack = 1)
    assert(!feed.columns.contains("score"), s"feed: ${feed.columns.toSeq}")
  }

  test("dropped physical names stay RESERVED until a rebucket frees them") {
    val path = loaded()
    Scd1Merge.dropColumn(spark, path, "score")
    // evolving a same-named column back in would resurrect the old
    // bytes under it on mergeSchema reads — reject loudly
    intercept[IllegalArgumentException] {
      Scd1Merge.upsert(spark, path,
        Seq((3L, "x", 3, 99.0)).toDF("k", "name", "region", "score"),
        Seq("k"), evolveSchema = true)
    }
    // renaming another column onto the dropped name is the same hazard
    intercept[IllegalArgumentException] {
      Scd1Merge.renameColumn(spark, path, "name", "score")
    }
    // rebucket materializes the narrow schema and FREES the name
    Scd1Merge.rebucket(spark, path, Seq("k"), 8)
    val anyBucket = graft.merge.FsList.list(Paths.get(path, "data")).iterator
      .filter(_.getFileName.toString.startsWith("b")).toSeq
      .maxBy(_.getFileName.toString)
    assert(!spark.read.parquet(anyBucket.toString).columns.contains("score"),
      "rebucket must physically shed dropped columns")
    Scd1Merge.upsert(spark, path,
      Seq((3L, "x", 3, 99.0)).toDF("k", "name", "region", "score"),
      Seq("k"), evolveSchema = true)
    val got = Scd1Merge.readTable(spark, path)
    assert(got.columns.contains("score"))
    assert(got.filter(col("k") === 3L).select("score").first().getDouble(0)
      == 99.0)
  }

  test("drop composes with rename; keys and sole columns cannot drop") {
    val path = loaded()
    Scd1Merge.renameColumn(spark, path, "score", "points")
    Scd1Merge.dropColumn(spark, path, "points") // drops via the LOGICAL name
    assert(Scd1Merge.readTable(spark, path).columns.toSeq
      == Seq("k", "name", "region"))
    intercept[IllegalArgumentException] {
      Scd1Merge.dropColumn(spark, path, "k") // merge key
    }
    intercept[IllegalArgumentException] {
      Scd1Merge.dropColumn(spark, path, "points") // already gone
    }
    // stats-pruned point lookups still work on the narrowed table
    assert(Scd1Merge.readTableWhere(spark, path, col("k") === 5L).count() == 1)
  }
}
