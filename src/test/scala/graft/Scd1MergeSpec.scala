package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** SCD1 merge semantics (Delta-MERGE parity, quirks Q3/Q8) and the
  * bucketed partial-rewrite commit. */
class Scd1MergeSpec extends SparkSpecBase {
  import spark.implicits._

  test("merge replaces matched rows, keeps unmatched, inserts new") {
    val target = Seq((1L, "old1"), (2L, "old2")).toDF("k", "v")
    val source = Seq((2L, "new2"), (3L, "new3")).toDF("k", "v")
    assert(canon(Scd1Merge.merge(target, source, Seq("k"))) ==
      Seq(Seq("1", "old1"), Seq("2", "new2"), Seq("3", "new3")))
  }

  test("merge is idempotent: replaying the same source changes nothing") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val source = Seq((2L, "b2"), (3L, "c")).toDF("k", "v")
    val once = Scd1Merge.merge(target, source, Seq("k"))
    val twice = Scd1Merge.merge(once, source, Seq("k"))
    assertSameRows(once, twice)
  }

  test("Q8: duplicate source keys abort the merge (Delta multiple-match parity)") {
    val target = Seq((1L, "a")).toDF("k", "v")
    val dupSource = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Scd1Merge.merge(target, dupSource, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate source rows"))
    // unique keys sail through the same plan
    val ok = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    assert(Scd1Merge.merge(target, ok, Seq("k")).count() == 2)
  }

  private def bucketDirs(path: String): Map[String, Long] =
    Files.list(Paths.get(path)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("__bucket="))
      .map { d =>
        val newest = Files.list(d).iterator().asScala
          .map(f => Files.getLastModifiedTime(f).toMillis).max
        d.getFileName.toString -> newest
      }.toMap

  test("upsert rewrites only the buckets the source batch touches") {
    val path = Tmp.dir("scd1_bucket") + "/t"
    val initial = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    // explicit numBuckets: adaptive sizing would give this tiny table
    // few buckets; 32 makes the bounded-rewrite assertion sharp
    Scd1Merge.upsert(spark, path, initial, Seq("k"), numBuckets = 32)
    val before = bucketDirs(path)
    assert(before.size > 10, "initial load should span many buckets")

    Thread.sleep(20) // mtime resolution
    val batch = Seq((1L, "v1x"), (501L, "v501x")).toDF("k", "v")
    Scd1Merge.upsert(spark, path, batch, Seq("k"))
    val after = bucketDirs(path)

    val changed = after.filter { case (d, t) => before.get(d).exists(_ != t) }.keySet
    assert(changed.size <= 2, s"a 2-row batch must touch <=2 buckets, rewrote: $changed")

    // content is the merged table
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 1000)
    assert(canon(got.filter($"k".isin(1L, 501L, 2L))) ==
      Seq(Seq("1", "v1x"), Seq("2", "v2"), Seq("501", "v501x")))
  }

  test("upsert inserts new keys and is idempotent across replays") {
    val path = Tmp.dir("scd1_replay") + "/t"
    val initial = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Scd1Merge.upsert(spark, path, initial, Seq("k"))
    val batch = Seq((2L, "b2"), (3L, "c")).toDF("k", "v")
    Scd1Merge.upsert(spark, path, batch, Seq("k"))
    Scd1Merge.upsert(spark, path, batch, Seq("k")) // replay: no-op
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "a"), Seq("2", "b2"), Seq("3", "c")))
  }

  test("upsert migrates a legacy flat (pre-bucketing) table in place") {
    val path = Tmp.dir("scd1_legacy") + "/t"
    // simulate a table written before the bucketed layout existed
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.parquet(path)
    Scd1Merge.upsert(spark, path, Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), Seq("k"))
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "a"), Seq("2", "b2"), Seq("3", "c")))
    // migrated: next upsert takes the bucketed partial-rewrite path
    assert(bucketDirs(path).nonEmpty)
    Scd1Merge.upsert(spark, path, Seq((4L, "d")).toDF("k", "v"), Seq("k"))
    assert(Scd1Merge.readTable(spark, path).count() == 4)
  }

  test("explicit numBuckets conflicting with the stored layout is an error") {
    val path = Tmp.dir("scd1_nbconflict") + "/t"
    Scd1Merge.upsert(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 8)
    assertThrows[IllegalArgumentException] {
      Scd1Merge.upsert(spark, path, Seq((2L, "b")).toDF("k", "v"), Seq("k"), numBuckets = 16)
    }
  }

  test("upsert of an empty batch leaves the table untouched") {
    val path = Tmp.dir("scd1_empty") + "/t"
    Scd1Merge.upsert(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    val before = bucketDirs(path)
    Scd1Merge.upsert(spark, path, Seq.empty[(Long, String)].toDF("k", "v"), Seq("k"))
    assert(bucketDirs(path) == before)
  }
}
