package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Numeric type widening (Delta type-widening parity): a later batch
  * carrying int→long / float→double for an existing measure commits;
  * only its touched buckets rewrite wide, untouched buckets keep
  * their narrow files, and every read path presents ONE widened
  * column over the mixed files via the manifest's widened map. */
class WideningSpec extends SparkSpecBase {
  import spark.implicits._

  private def build(tag: String): String = {
    val path = graft.Tmp.dir(s"graft_widen_$tag") + "/t"
    val dim = (0L until 40L).map(i => (i, s"n_$i", i.toInt * 10, i.toFloat / 4))
      .toDF("k", "name", "m_int", "m_float")
    Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = 4,
      retainVersions = 3)
    path
  }

  test("int→long widening in STRICT mode: touched buckets wide, untouched readable, values exact") {
    val path = build("strict")
    // widen k<5 rows: values only a long can hold
    val widen = (0L until 5L).map(i => (i, s"n_$i", 10000000000L + i, i.toFloat / 4))
      .toDF("k", "name", "m_int", "m_float")
    Scd1Merge.upsert(spark, path, widen, Seq("k")) // strict — no evolve flag
    val t = Scd1Merge.readTable(spark, path)
    assert(t.schema("m_int").dataType == LongType,
      s"m_int must read as BIGINT, got ${t.schema("m_int").dataType}")
    assert(t.count() == 40)
    assert(t.filter($"k" === 2).select("m_int").as[Long].head() == 10000000002L)
    // untouched narrow rows still readable, values intact
    assert(t.filter($"k" === 30).select("m_int").as[Long].head() == 300L)
    // aggregate over the mixed files is exact
    assert(t.agg(sum("m_int")).as[Long].head() ==
      (5L * 10000000000L + (0L until 5L).sum) + (5L until 40L).map(_ * 10).sum)
  }

  test("float→double widening; pruned reads of all-narrow buckets still present the wide type") {
    val path = build("float")
    val widen = Seq((1L, "n_1", 10, 1.23456789012d))
      .toDF("k", "name", "m_int", "m_float")
    Scd1Merge.upsert(spark, path, widen, Seq("k"))
    val t = Scd1Merge.readTable(spark, path)
    assert(t.schema("m_float").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(t.filter($"k" === 1).select("m_float").as[Double].head()
      == 1.23456789012d)
    // a key-equality read pruned to an ALL-NARROW bucket must still
    // present the widened schema (the manifest map, not file luck)
    val pruned = Scd1Merge.readTableWhere(spark, path, $"k" === 30)
    assert(pruned.schema("m_float").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(pruned.count() == 1)
  }

  test("widening survives downstream ops: update, delete, change feed, compact") {
    val path = build("ops")
    Scd1Merge.upsert(spark, path,
      Seq((3L, "n_3", 20000000000L, 0.75f)).toDF("k", "name", "m_int", "m_float"),
      Seq("k"), retainVersions = 3)
    // change feed across the WIDENING commit classifies exactly (the
    // two sides of the diff have different physical types)
    val ch = Scd1Merge.readChanges(spark, path, Seq("k"),
      fromCommitsBack = 1, toCommitsBack = 0)
    assert(ch.filter($"_change_type" === "update" && $"k" === 3L)
      .select("m_int").as[Long].head() == 20000000000L)
    // predicate update over mixed files
    Scd1Merge.update(spark, path, Seq("k"), $"k" === 10,
      Map("m_int" -> ($"m_int" + 1)))
    assert(Scd1Merge.readTable(spark, path)
      .filter($"k" === 10).select("m_int").as[Long].head() == 101L)
    // delete over mixed files
    Scd1Merge.delete(spark, path, Seq("k"), $"k" === 11)
    assert(Scd1Merge.readTable(spark, path).count() == 39)
    // compact keeps content
    Scd1Merge.compact(spark, path)
    assert(Scd1Merge.readTable(spark, path)
      .filter($"k" === 3).select("m_int").as[Long].head() == 20000000000L)
  }

  test("time travel: the pre-widening snapshot reads back with its own (narrow) schema") {
    val path = build("tt")
    Scd1Merge.upsert(spark, path,
      Seq((0L, "n_0", 30000000000L, 0f)).toDF("k", "name", "m_int", "m_float"),
      Seq("k"), retainVersions = 3)
    val before = Scd1Merge.readTableAt(spark, path, 1)
    assert(before.schema("m_int").dataType ==
      org.apache.spark.sql.types.IntegerType,
      "the old snapshot predates the widening — its schema is narrow")
    assert(before.count() == 40)
    assert(Scd1Merge.readTable(spark, path).schema("m_int").dataType == LongType)
  }

  test("merge keys cannot widen (the bucket hash is type-sensitive); incompatible types stay loud") {
    val path0 = graft.Tmp.dir("graft_widen_key") + "/t"
    Scd1Merge.upsert(spark, path0,
      (0 until 20).map(i => (i, s"n_$i")).toDF("k", "name"),
      Seq("k"), numBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      Scd1Merge.upsert(spark, path0,
        Seq((5L, "wide")).toDF("k", "name"), Seq("k"))
    }
    assert(e.getMessage.contains("cannot widen merge key"))
    // int vs string remains a loud analysis error, not a silent cast
    intercept[Exception] {
      Scd1Merge.upsert(spark, path0,
        Seq((6, 123)).toDF("k", "name"), Seq("k"))
    }
  }
}
