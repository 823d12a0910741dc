package graft

import graft.merge.{PartitionedTable, Scd1Merge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DERIVED ("hidden") partition columns — Iceberg-style transforms
  * over a merge key: `month(d)` / `year(d)` / `day(d)` / `bucket(n,k)`.
  * The partition value lives only in the path + parent manifest (no
  * maintenance column in the data), and predicates on the SOURCE
  * column prune whole partitions by path: ranges/equality/IN via the
  * period's half-open interval, bucket via hashing the literal.
  * Pruning is conservative — an unmappable conjunct keeps partitions,
  * never drops them. */
class HiddenPartitionSpec extends SparkSpecBase {
  import spark.implicits._

  private def dfact(days: Seq[String], per: Int = 8): DataFrame =
    days.flatMap(d => (0 until per).map(i =>
      (java.sql.Date.valueOf(d), s"$d#$i".hashCode.toLong & 0xffffff,
        (i + 1) * 10L)))
      .toDF("d", "id", "cents").dropDuplicates("d", "id")

  private val keys = Seq("id", "d")

  test("month(d): routing, read parity, and NO derived column in the data") {
    val path = graft.Tmp.dir("hp_month") + "/t"
    val base = dfact(Seq("2024-01-05", "2024-01-20", "2024-02-10", "2024-03-15"))
    PartitionedTable.upsert(spark, path, base, keys, "month(d)", numBuckets = 2)
    val got = PartitionedTable.readTable(spark, path)
    assert(got.columns.sorted.toSeq == Seq("cents", "d", "id"),
      s"derived month value must NOT appear in the data: ${got.columns.toSeq}")
    assertSameRows(got.orderBy("id", "d"), base.orderBy("id", "d"))
    // the month value is the path
    assert(got.inputFiles.forall(f => f.contains("/p=2024-")),
      got.inputFiles.take(3).mkString(","))
  }

  test("range predicate on the SOURCE column prunes month partitions by path") {
    val path = graft.Tmp.dir("hp_range") + "/t"
    val base = dfact(Seq("2024-01-05", "2024-02-10", "2024-03-15", "2024-04-01"))
    PartitionedTable.upsert(spark, path, base, keys, "month(d)", numBuckets = 2)
    val pruned = PartitionedTable.readTableWhere(spark, path,
      $"d" >= "2024-02-01" && $"d" < "2024-04-01")
    assert(PartitionedTable.lastPartitionPrune == (2, 4),
      s"expected 2/4 months, got ${PartitionedTable.lastPartitionPrune}")
    assert(pruned.inputFiles.forall(f =>
      f.contains("/p=2024-02/") || f.contains("/p=2024-03/")))
    assertSameRows(pruned.orderBy("id", "d"),
      base.filter($"d" >= "2024-02-01" && $"d" < "2024-04-01").orderBy("id", "d"))
    // equality and IN prune too
    PartitionedTable.readTableWhere(spark, path,
      $"d" === "2024-03-15").collect()
    assert(PartitionedTable.lastPartitionPrune == (1, 4))
    PartitionedTable.readTableWhere(spark, path,
      $"d".isin("2024-01-05", "2024-04-01")).collect()
    assert(PartitionedTable.lastPartitionPrune == (2, 4))
    // an unmappable conjunct is conservative: keeps every partition
    PartitionedTable.readTableWhere(spark, path,
      abs(datediff($"d", lit("2024-02-10"))) < 3).collect()
    assert(PartitionedTable.lastPartitionPrune == (4, 4))
  }

  test("year(ts) over a timestamp source prunes range predicates") {
    val rows = Seq("2023-03-01 10:00:00", "2024-06-02 11:30:00",
      "2025-01-03 23:59:59").zipWithIndex.map { case (t, i) =>
      (java.sql.Timestamp.valueOf(t), i.toLong, 100L) }
    val path = graft.Tmp.dir("hp_year") + "/t"
    val base = rows.toDF("ts", "id", "v")
    PartitionedTable.upsert(spark, path, base, Seq("id", "ts"), "year(ts)",
      numBuckets = 1)
    val pruned = PartitionedTable.readTableWhere(spark, path,
      $"ts" >= "2024-01-01 00:00:00")
    assert(PartitionedTable.lastPartitionPrune == (2, 3),
      s"got ${PartitionedTable.lastPartitionPrune}")
    assertSameRows(pruned.orderBy("id"),
      base.filter($"ts" >= "2024-01-01 00:00:00").orderBy("id"))
  }

  test("bucket(n, k): equality prunes to one partition, ranges keep all") {
    val path = graft.Tmp.dir("hp_bucket") + "/t"
    val base = (0L until 64L).map(i => (i, i * 3)).toDF("k", "v")
    PartitionedTable.upsert(spark, path, base, Seq("k"), "bucket(4,k)",
      numBuckets = 1)
    val total = PartitionedTable.partitions(spark, path).count().toInt
    assert(total > 1 && total <= 4, s"expected up to 4 hash partitions, got $total")
    val pruned = PartitionedTable.readTableWhere(spark, path, $"k" === 17L)
    assert(PartitionedTable.lastPartitionPrune == (1, total),
      s"got ${PartitionedTable.lastPartitionPrune}")
    assert(pruned.select("k").collect().map(_.getLong(0)).toSeq == Seq(17L))
    // a range cannot map through a hash — conservative keep
    PartitionedTable.readTableWhere(spark, path, $"k" > 10L).collect()
    assert(PartitionedTable.lastPartitionPrune == (total, total))
    // full read parity
    assertSameRows(PartitionedTable.readTable(spark, path).orderBy("k"),
      base.orderBy("k"))
  }

  test("multi-level (year(d), bucket(2,id)): subset pruning per level") {
    val path = graft.Tmp.dir("hp_multi") + "/t"
    val base = dfact(Seq("2023-05-01", "2024-05-01", "2025-05-01"), per = 16)
    PartitionedTable.upsertMulti(spark, path, base, keys,
      Seq("year(d)", "bucket(2,id)"), numBuckets = 1)
    val total = PartitionedTable.partitions(spark, path).count().toInt
    // year-only predicate prunes the year level, keeps both buckets
    PartitionedTable.readTableWhere(spark, path, $"d" >= "2024-01-01").collect()
    val (kept, all) = PartitionedTable.lastPartitionPrune
    assert(all == total && kept < total && kept >= 2,
      s"got ${PartitionedTable.lastPartitionPrune} of $total")
    // fully-pinned predicate reaches exactly one partition
    val one = base.filter($"d" === "2024-05-01").limit(1).collect().head
    PartitionedTable.readTableWhere(spark, path,
      $"d" === lit(one.getDate(0)) && $"id" === one.getLong(1)).collect()
    assert(PartitionedTable.lastPartitionPrune._1 == 1)
  }

  test("incremental batch routes through derived partitions; untouched children never commit") {
    val path = graft.Tmp.dir("hp_incr") + "/t"
    PartitionedTable.upsert(spark, path,
      dfact(Seq("2024-01-05", "2024-02-10")), keys, "month(d)", numBuckets = 1)
    val c1 = Scd1Merge.tableCommit(s"$path/p=2024-01").get
    PartitionedTable.upsert(spark, path, dfact(Seq("2024-03-01")), keys,
      "month(d)")
    assert(Scd1Merge.tableCommit(s"$path/p=2024-01").get == c1,
      "untouched month must not commit")
    assert(Scd1Merge.tableCommit(s"$path/p=2024-03").get == 1)
    assert(PartitionedTable.readTable(spark, path).count() ==
      dfact(Seq("2024-01-05", "2024-02-10")).count() +
        dfact(Seq("2024-03-01")).count())
  }

  test("rejections: non-key source, non-temporal trunc source, spec drift") {
    val path = graft.Tmp.dir("hp_rej") + "/t"
    val base = dfact(Seq("2024-01-05"))
    val e1 = intercept[IllegalArgumentException] {
      PartitionedTable.upsert(spark, path, base, Seq("id"), "month(d)",
        numBuckets = 1)
    }
    assert(e1.getMessage.contains("merge keys"))
    val e2 = intercept[IllegalArgumentException] {
      PartitionedTable.upsert(spark, path, base, Seq("id", "cents"),
        "month(cents)", numBuckets = 1)
    }
    assert(e2.getMessage.contains("date or timestamp"))
    PartitionedTable.upsert(spark, path, base, keys, "month(d)", numBuckets = 1)
    val e3 = intercept[IllegalArgumentException] {
      PartitionedTable.upsert(spark, path, base, keys, "year(d)")
    }
    assert(e3.getMessage.contains("partitioned by"))
    // same spec with cosmetic whitespace is NOT drift
    PartitionedTable.upsert(spark, path, base, keys, "MONTH( d )")
  }
}
