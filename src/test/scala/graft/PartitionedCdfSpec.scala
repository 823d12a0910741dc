package graft

import graft.merge.{PartitionedTable, Scd1Merge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Change-data feed over the PARTITIONED layout: the parent pin-set
  * diff reads ONLY partitions whose pinned child commit moved (child
  * diffs for updates, full pinned snapshots for new/dropped
  * partitions), and the same feed streams through
  * `spark.readStream.format("graft")` on the parent path — flat-table
  * parity end to end. Also pins the dropPartitionsWhere containment
  * polarity: a predicate that cannot decide whole partitions is
  * rejected loudly, never silently widened. */
class PartitionedCdfSpec extends SparkSpecBase {
  import spark.implicits._

  private def dfact(days: Seq[String], per: Int = 6): DataFrame =
    days.flatMap(d => (0 until per).map(i =>
      (java.sql.Date.valueOf(d), s"$d#$i".hashCode.toLong & 0xffffff,
        (i + 1) * 10L)))
      .toDF("d", "id", "cents").dropDuplicates("d", "id")

  private val keys = Seq("id", "d")

  private def build(path: String): Unit = {
    PartitionedTable.upsert(spark, path,
      dfact(Seq("2024-01-05", "2024-02-10", "2024-03-15")), keys,
      "month(d)", numBuckets = 2)
    // c2: update February + a brand-new April partition
    PartitionedTable.upsert(spark, path,
      dfact(Seq("2024-02-10")).withColumn("cents", $"cents" + 1)
        .unionByName(dfact(Seq("2024-04-01"))), keys, "month(d)")
    // c3: metadata-only whole-partition drop of January
    val n = PartitionedTable.dropPartitionsWhere(spark, path,
      $"d" < "2024-02-01")
    assert(n == 1)
  }

  test("readChanges legs: child diff, new-partition inserts, dropped-partition deletes") {
    val path = Tmp.dir("pcdf_legs") + "/t"
    build(path)
    val per = dfact(Seq("2024-02-10")).count()
    val feed = PartitionedTable.readChanges(spark, path, fromCommitsBack = 2)
    val byType = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map(
      "update" -> per, "update_preimage" -> per,
      "insert" -> per, "delete" -> per), s"got $byType")
    // updated images carry the new value
    assert(feed.filter($"_change_type" === "update")
      .select("cents").as[Long].collect().forall(_ % 10 == 1))
    // untouched March is never read — the feed's files are confined
    // to the changed partitions
    val files = feed.inputFiles
    assert(files.nonEmpty && !files.exists(_.contains("/p=2024-03/")),
      files.filter(_.contains("2024-03")).mkString(","))
    // window (2,1]: just the update + new-partition commit
    val mid = PartitionedTable.readChanges(spark, path, 2, 1)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(mid == Map("update" -> per, "update_preimage" -> per,
      "insert" -> per), s"got $mid")
    // window (1,0]: just the drop, surfaced as deletes
    val tail = PartitionedTable.readChanges(spark, path, 1)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(tail == Map("delete" -> per), s"got $tail")
  }

  test("dropPartitionsWhere containment: undecidable predicates reject loudly") {
    val path = Tmp.dir("pcdf_drop") + "/t"
    PartitionedTable.upsert(spark, path,
      dfact(Seq("2024-01-05", "2024-02-10")), keys, "month(d)",
      numBuckets = 1)
    // non-partition column: loud, not drop-everything
    val e1 = intercept[IllegalArgumentException] {
      PartitionedTable.dropPartitionsWhere(spark, path, $"cents" > 0)
    }
    assert(e1.getMessage.contains("non-partition columns"))
    // a mid-month bound cannot decide the whole month
    assert(PartitionedTable.dropPartitionsWhere(spark, path,
      $"d" < "2024-01-15") == 0)
    // closed date bound on the month's last day DOES decide it
    assert(PartitionedTable.dropPartitionsWhere(spark, path,
      $"d" <= "2024-01-31") == 1)
    assert(PartitionedTable.readTable(spark, path)
      .select(date_format($"d", "yyyy-MM")).distinct()
      .as[String].collect().toSeq == Seq("2024-02"))
  }

  test("partitioned table streams through readStream.format(\"graft\")") {
    val path = Tmp.dir("pcdf_stream") + "/t"
    val ckpt = Tmp.dir("pcdf_stream_ckpt")
    PartitionedTable.upsert(spark, path,
      dfact(Seq("2024-01-05", "2024-02-10")), keys, "month(d)",
      numBuckets = 2)

    def drain(): Seq[DataFrame] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val q = spark.readStream.format("graft").load(path).writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          got += org.apache.spark.sql
            .GraftExpressionBridge.materializedBatch(batch).cache()
          ()
        }
        .start()
      q.awaitTermination()
      got.toSeq
    }

    // initial snapshot: every row tagged insert
    val b1 = drain()
    assert(b1.size == 1 && b1.head.count() == 12)
    assert(b1.head.select("_change_type").distinct()
      .as[String].collect().toSeq == Seq("insert"))

    // a parent commit touching ONE partition arrives as its delta
    PartitionedTable.upsert(spark, path,
      dfact(Seq("2024-02-10")).limit(2).withColumn("cents", lit(777L)),
      keys, "month(d)")
    val b2 = drain()
    assert(b2.size == 1)
    val byType = b2.head.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("update" -> 2L, "update_preimage" -> 2L),
      s"got $byType")
    // caught up: silence
    assert(drain().isEmpty)
  }
}
