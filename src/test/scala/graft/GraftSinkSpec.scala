package graft

import graft.merge.{PartitionedTable, Scd1Merge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** `writeStream.format("graft")` — the streaming-SINK doorway
  * (GraftSink): micro-batches land through the engine's committed
  * write path, first batch creates the table from writer options,
  * append = keyed upsert, Complete = per-trigger replacement,
  * `.partitionBy` targets the partitioned layout, and checkpoint
  * replay of an already-committed batch is a zero-rewrite skip. */
class GraftSinkSpec extends SparkSpecBase {
  import spark.implicits._

  private def fileSource(tag: String, frames: Seq[org.apache.spark.sql.DataFrame]): String = {
    val dir = Tmp.dir(s"gsink_src_$tag")
    frames.zipWithIndex.foreach { case (f, i) =>
      f.coalesce(1).write.mode("append").parquet(dir)
      if (i < frames.size - 1) Thread.sleep(1100) // deterministic file order
    }
    dir
  }

  test("streaming append: creation via options, micro-batches upsert by key") {
    val b1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val b2 = Seq((2L, "B2"), (4L, "d")).toDF("k", "v")
    val src = fileSource("append", Seq(b1, b2))
    val out = Tmp.dir("gsink_out") + "/t"
    val q = spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", 1)
      .parquet(src)
      .writeStream.format("graft")
      .option("keys", "k").option("buckets", "2")
      .option("checkpointLocation", Tmp.dir("gsink_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start(out)
    q.awaitTermination()
    // k=2 replaced by the later batch, k=4 inserted: one row per key
    assertSameRows(
      Scd1Merge.readTable(spark, out).orderBy("k"),
      Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")).toDF("k", "v"))
  }

  test("replayed batch id is a zero-rewrite skip (flat-table stamp)") {
    val out = Tmp.dir("gsink_replay") + "/t"
    val sink = new graft.sources.GraftSink(out,
      Map("keys" -> "k", "buckets" -> "2"), None, OutputMode.Append())
    val b = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    sink.addBatch(0, b)
    val commits = Scd1Merge.tableCommit(out).get
    sink.addBatch(0, b) // crash-replay of the same micro-batch
    assert(Scd1Merge.tableCommit(out).get == commits,
      "a replayed batch must not commit again")
    sink.addBatch(1, Seq((3L, "c")).toDF("k", "v"))
    assert(Scd1Merge.tableCommit(out).get == commits + 1)
    assert(Scd1Merge.readTable(spark, out).count() == 3)
  }

  test("Complete mode replaces the table every trigger; vanished keys drop") {
    val out = Tmp.dir("gsink_complete") + "/t"
    val sink = new graft.sources.GraftSink(out,
      Map("keys" -> "k"), None, OutputMode.Complete())
    sink.addBatch(0, Seq((1L, 10L), (2L, 20L)).toDF("k", "n"))
    sink.addBatch(1, Seq((2L, 25L), (3L, 30L)).toDF("k", "n")) // k=1 vanished
    assertSameRows(
      Scd1Merge.readTable(spark, out).orderBy("k"),
      Seq((2L, 25L), (3L, 30L)).toDF("k", "n"))
  }

  test("partitionBy on the stream writer creates the partitioned layout") {
    val b1 = Seq(("p0", 1L, 1.0), ("p1", 2L, 2.0)).toDF("part", "k", "x")
    val src = fileSource("part", Seq(b1))
    val out = Tmp.dir("gsink_part") + "/t"
    val q = spark.readStream.schema(b1.schema).parquet(src)
      .writeStream.format("graft")
      .option("keys", "part,k")
      .option("checkpointLocation", Tmp.dir("gsink_pckpt"))
      .partitionBy("part")
      .trigger(Trigger.AvailableNow())
      .start(out)
    q.awaitTermination()
    assert(PartitionedTable.tableExists(out))
    assert(PartitionedTable.partitions(spark, out).count() == 2)
    assertSameRows(PartitionedTable.readTable(spark, out).orderBy("k"),
      b1.orderBy("k"))
  }
}
