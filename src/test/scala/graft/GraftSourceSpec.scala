package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `spark.readStream.format("graft")` — the table's change feed
  * through the STANDARD streaming API (GraftSource): commit-counter
  * offsets checkpointed by the engine, initial-snapshot convention,
  * O(changed buckets) delta batches, loud caught-up idempotence, and
  * commit paging via maxCommitsPerTrigger. */
class GraftSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def drain(path: String, ckpt: String,
                    options: Map[String, String] = Map.empty): Seq[(Long, DataFrame)] = {
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, DataFrame)]
    val reader = options.foldLeft(spark.readStream.format("graft")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load(path).writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        got += ((id, org.apache.spark.sql
          .GraftExpressionBridge.materializedBatch(batch).cache()))
        ()
      }
      .start()
    q.awaitTermination()
    got.toSeq
  }

  test("change feed through the standard doorway: snapshot, deltas, caught-up silence") {
    val path = Tmp.dir("gsrc_cdf") + "/t"
    val ckpt = Tmp.dir("gsrc_cdf_ckpt")
    val v1 = (0 until 20).map(i => (i.toLong, i * 10L)).toDF("k", "n")
    // retention >= the consumer's max lag in commits (the CDF+VACUUM
    // contract — the source reads RETAINED manifests)
    Scd1Merge.upsert(spark, path, v1, Seq("k"), numBuckets = 4,
      retainVersions = 8)

    // trigger 1: the initial snapshot, every row tagged insert
    val b1 = drain(path, ckpt)
    assert(b1.size == 1)
    assert(b1.head._2.count() == 20)
    assert(b1.head._2.select("_change_type").distinct()
      .as[String].collect().toSeq == Seq("insert"))

    // two commits land while the consumer is away
    Scd1Merge.upsert(spark, path,
      Seq((3L, 999L), (100L, 1000L)).toDF("k", "n"), Seq("k"),
      retainVersions = 8)
    Scd1Merge.deleteSoft(spark, path, Seq("k"), $"k" === 7,
      retainVersions = 8)

    // trigger 2: the pending commits arrive as ONE delta batch
    val b2 = drain(path, ckpt)
    assert(b2.size == 1)
    val feed = b2.head._2
    val byType = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map(
      "update" -> 1L,           // k=3 new image
      "update_preimage" -> 1L,  // k=3 old image
      "insert" -> 1L,           // k=100
      "delete" -> 1L))          // k=7
    assert(feed.filter($"_change_type" === "update" && $"k" === 3)
      .select("n").as[Long].head() == 999L)

    // trigger 3: caught up — no batch at all
    assert(drain(path, ckpt).isEmpty)
  }

  test("maxCommitsPerTrigger pages catch-up one commit per batch") {
    val path = Tmp.dir("gsrc_page") + "/t"
    val ckpt = Tmp.dir("gsrc_page_ckpt")
    Scd1Merge.upsert(spark, path,
      Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 2,
      retainVersions = 8)
    drain(path, ckpt) // consume the snapshot
    // three commits pending
    (2 to 4).foreach(i =>
      Scd1Merge.upsert(spark, path, Seq((i.toLong, s"v$i")).toDF("k", "v"),
        Seq("k"), retainVersions = 8))
    val batches = drain(path, ckpt, Map("maxCommitsPerTrigger" -> "1"))
    assert(batches.size == 3, s"expected one batch per commit, got ${batches.size}")
    batches.foreach(b => assert(b._2.count() == 1))
    assert(batches.flatMap(_._2.select("k").as[Long].collect()).sorted == Seq(2L, 3L, 4L))
  }

  test("standard-API chain: graft source feeding graft sink mirrors the table") {
    val up = Tmp.dir("gsrc_chain") + "/up"
    val down = Tmp.dir("gsrc_chain") + "/down"
    val ckpt = Tmp.dir("gsrc_chain_ckpt")
    val rows = (0 until 30).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    Scd1Merge.upsert(spark, up, rows, Seq("k"), numBuckets = 4)
    Scd1Merge.upsert(spark, up, Seq((5L, "CHANGED")).toDF("k", "v"), Seq("k"))
    def run(): Unit = {
      val q = spark.readStream.format("graft").load(up)
        .filter($"_change_type".isin("insert", "update"))
        .drop("_change_type")
        .writeStream.format("graft")
        .option("keys", "k").option("buckets", "2")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(down)
      q.awaitTermination()
    }
    run()
    assertSameRows(
      Scd1Merge.readTable(spark, down).orderBy("k"),
      Scd1Merge.readTable(spark, up).orderBy("k"))
    // more upstream commits; the same chain moves ONLY the delta
    Scd1Merge.upsert(spark, up, Seq((31L, "new")).toDF("k", "v"), Seq("k"))
    run()
    assertSameRows(
      Scd1Merge.readTable(spark, down).orderBy("k"),
      Scd1Merge.readTable(spark, up).orderBy("k"))
  }
}
