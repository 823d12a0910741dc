package graft

import graft.merge.{Scd1Merge, Scd2Merge}
import org.apache.spark.sql.functions._

/** SCD2 semantics: close-old + insert-new per changed key, null-safe
  * change detection, replay idempotency, sequence monotonicity. */
class Scd2MergeSpec extends SparkSpecBase {
  import spark.implicits._

  test("versions open and close across batches; unchanged keys keep one row") {
    val path = Tmp.dir("scd2_basic") + "/d"
    Scd2Merge.upsertBatch(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("k", "attr"), Seq("k"), 1L, numBuckets = 2)
    Scd2Merge.upsertBatch(spark, path,
      Seq((1L, "a2"), (2L, "b")).toDF("k", "attr"), Seq("k"), 2L, numBuckets = 2)
    Scd2Merge.upsertBatch(spark, path,
      Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("k", "attr"), Seq("k"), 3L, numBuckets = 2)
    assert(canon(Scd1Merge.readTable(spark, path)
      .select("k", "attr", "valid_from", "valid_to", "is_current")) == Seq(
      Seq("1", "a", "1", "2", "false"),
      Seq("1", "a2", "2", "null", "true"),
      Seq("2", "b", "1", "null", "true"),
      Seq("3", "c", "3", "null", "true")).sortBy(_.mkString("")))
  }

  test("replaying a batch is a no-op; regressing the sequence fails loudly") {
    val path = Tmp.dir("scd2_replay") + "/d"
    Scd2Merge.upsertBatch(spark, path, Seq((1L, "a")).toDF("k", "attr"), Seq("k"), 1L)
    Scd2Merge.upsertBatch(spark, path, Seq((1L, "a2")).toDF("k", "attr"), Seq("k"), 2L)
    val before = canon(Scd1Merge.readTable(spark, path))
    Scd2Merge.upsertBatch(spark, path, Seq((1L, "a2")).toDF("k", "attr"), Seq("k"), 2L)
    assert(canon(Scd1Merge.readTable(spark, path)) == before, "replay must not re-version")
    // an out-of-order CHANGED batch must throw, not silently rewrite history
    intercept[IllegalArgumentException] {
      Scd2Merge.upsertBatch(spark, path, Seq((1L, "old")).toDF("k", "attr"), Seq("k"), 1L)
    }
  }

  test("CDC apply: deletes close with no successor; a re-insert reopens") {
    val path = Tmp.dir("scd2_cdc") + "/d"
    def feed(rows: Seq[(Long, String, String)]) =
      rows.toDF("k", "attr", "_change_type")
    // seq 1: snapshot inserts
    Scd2Merge.applyChanges(spark, path,
      feed(Seq((1L, "a", "insert"), (2L, "b", "insert"))), Seq("k"), 1L)
    // seq 2: k=1 updated (preimage row must be ignored), k=2 DELETED
    Scd2Merge.applyChanges(spark, path,
      feed(Seq((1L, "a2", "update"), (1L, "a", "update_preimage"),
        (2L, "b", "delete"))), Seq("k"), 2L)
    val afterDel = Scd1Merge.readTable(spark, path)
      .select("k", "attr", "valid_from", "valid_to", "is_current")
    assert(canon(afterDel) == Seq(
      Seq("1", "a", "1", "2", "false"),
      Seq("1", "a2", "2", "null", "true"),
      Seq("2", "b", "1", "2", "false")).sortBy(_.mkString("")),
      s"delete must close k=2 with NO successor: ${canon(afterDel)}")
    // seq 3: k=2 re-inserted -> fresh version after the history ended
    Scd2Merge.applyChanges(spark, path,
      feed(Seq((2L, "b3", "insert"))), Seq("k"), 3L)
    assert(canon(Scd1Merge.readTable(spark, path).filter($"k" === 2L)
      .select("k", "attr", "valid_from", "valid_to", "is_current")) == Seq(
      Seq("2", "b", "1", "2", "false"),
      Seq("2", "b3", "3", "null", "true")).sortBy(_.mkString("")))
    // replayed no-change feed commits nothing
    val before = canon(Scd1Merge.readTable(spark, path))
    Scd2Merge.applyChanges(spark, path,
      feed(Seq((2L, "b3", "insert"))), Seq("k"), 4L)
    assert(canon(Scd1Merge.readTable(spark, path)) == before,
      "an already-applied feed must be a no-op")
  }

  test("null attributes do not re-version forever (null-safe diff)") {
    val path = Tmp.dir("scd2_null") + "/d"
    val withNull = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "attr")
    Scd2Merge.upsertBatch(spark, path, withNull, Seq("k"), 1L)
    Scd2Merge.upsertBatch(spark, path, withNull, Seq("k"), 2L)
    val t = Scd1Merge.readTable(spark, path)
    assert(t.count() == 2, "identical null attr must not open a new version")
    // null -> value IS a change
    Scd2Merge.upsertBatch(spark, path,
      Seq((1L, Some("now")), (2L, Some("x"))).toDF("k", "attr"), Seq("k"), 3L)
    assert(canon(Scd1Merge.readTable(spark, path).filter($"k" === 1L)
      .select("k", "attr", "valid_from", "valid_to", "is_current")) == Seq(
      Seq("1", "null", "1", "3", "false"),
      Seq("1", "now", "3", "null", "true")).sortBy(_.mkString("")))
  }
}
