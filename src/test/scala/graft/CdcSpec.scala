package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Full-MERGE (applyCdc) mechanics: update+insert+delete land as ONE
  * commit, the change feed tags all three populations, deletes that
  * empty a bucket drop it from the manifest, and the multiple-match
  * ambiguity (incl. delete+upsert of one key) fails loudly. */
class CdcSpec extends SparkSpecBase {

  import spark.implicits._

  private def loaded(n: Int = 40, buckets: Int = 4): String = {
    val path = Tmp.dir("cdc_spec") + "/t"
    val dim = (0 until n).map(i => (i.toLong, s"name_$i", i % 5))
      .toDF("k", "name", "region")
    Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = buckets)
    path
  }

  test("update+insert+delete apply in ONE commit; change feed tags all three") {
    val path = loaded()
    val before = Scd1Merge.tableCommit(path).get
    val cdc = Seq(
      (3L, "NAME_3_V2", 3, "update"),
      (100L, "fresh", 0, "insert"),
      (7L, "ignored", 2, "delete")
    ).toDF("k", "name", "region", "_op")
    Scd1Merge.applyCdc(spark, path, cdc, Seq("k"))
    assert(Scd1Merge.tableCommit(path).get == before + 1,
      "the whole CDC batch must be one commit")
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 40) // 40 - 1 deleted + 1 inserted
    assert(got.filter(col("k") === 3L).select("name").first().getString(0) == "NAME_3_V2")
    assert(got.filter(col("k") === 7L).count() == 0)
    assert(got.filter(col("k") === 100L).count() == 1)
    val feed = Scd1Merge.readChanges(spark, path, Seq("k"), fromCommitsBack = 1)
    val tags = feed.select(col("k"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(tags.contains((3L, "update")) && tags.contains((3L, "update_preimage")))
    assert(tags.contains((100L, "insert")))
    assert(tags.contains((7L, "delete")))
  }

  test("a delete for an absent key is a MERGE no-op") {
    val path = loaded()
    val cdc = Seq((9999L, "x", 0, "delete")).toDF("k", "name", "region", "_op")
    Scd1Merge.applyCdc(spark, path, cdc, Seq("k"))
    assert(Scd1Merge.readTable(spark, path).count() == 40)
  }

  test("deletes that empty a bucket drop it from the manifest") {
    val path = loaded(n = 8, buckets = 8) // ~1 row per bucket
    val all = (0 until 8).map(i => (i.toLong, "", 0, "delete"))
      .toDF("k", "name", "region", "_op")
    // keep key 0 alive so the table itself survives
    Scd1Merge.applyCdc(spark, path,
      all.filter(col("k") =!= 0L), Seq("k"))
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 1 && got.first().getLong(0) == 0L)
    // after reclaiming retention, only the surviving bucket dirs remain
    Scd1Merge.vacuum(path, retain = 0)
    val dirs = graft.merge.FsList.list(Paths.get(path, "data")).size.toLong
    assert(dirs < 8, s"emptied buckets must leave the manifest (dirs=$dirs)")
  }

  test("delete+upsert of the same key in one batch is the multiple-match error") {
    val path = loaded()
    val cdc = Seq((5L, "v2", 1, "update"), (5L, "", 1, "delete"))
      .toDF("k", "name", "region", "_op")
    intercept[IllegalArgumentException] {
      Scd1Merge.applyCdc(spark, path, cdc, Seq("k"))
    }
  }

  test("applyCdc on an uncommitted path creates the table from non-delete rows") {
    val path = Tmp.dir("cdc_spec_new") + "/t"
    val cdc = Seq((1L, "a", 0, "insert"), (2L, "b", 1, "delete"))
      .toDF("k", "name", "region", "_op")
    Scd1Merge.applyCdc(spark, path, cdc, Seq("k"), numBuckets = 2)
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 1 && got.first().getLong(0) == 1L)
  }
}
