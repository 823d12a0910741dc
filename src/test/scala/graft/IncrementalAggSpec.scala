package graft

import graft.merge.Scd1Merge
import graft.pipeline.IncrementalAgg
import graft.pipeline.IncrementalAgg.AggSpec
import org.apache.spark.sql.functions._

/** Change-feed aggregate maintenance vs full recompute, step by step,
  * including the cases the judged pipe7 query can't exercise: a row
  * MOVING between groups, duplicate sync calls (exactly-once), and a
  * crash between the stamped commit and the tombstone sweep. */
class IncrementalAggSpec extends SparkSpecBase {
  import spark.implicits._

  private val aggSpec = AggSpec(Seq("g"), Seq("v" -> "sum_v"), "n")

  test("maintenance tracks recompute through insert/update/move/delete; dead groups vanish") {
    val dir = graft.Tmp.dir("graft_incagg_spec")
    val t = dir + "/base"
    val a = dir + "/agg"
    def sync(): Unit = IncrementalAgg.applyChanges(spark, a, t, Seq("k"), aggSpec)
    def checkAgainstRecompute(): Unit = assertSameRows(
      Scd1Merge.readTable(spark, a).select($"g", $"sum_v", $"n").orderBy($"g"),
      Scd1Merge.readTable(spark, t)
        .groupBy($"g").agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
        .orderBy($"g"))

    Scd1Merge.upsert(spark, t,
      Seq((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 7L)).toDF("k", "g", "v"),
      Seq("k"), numBuckets = 2)
    IncrementalAgg.bootstrap(spark, a, Scd1Merge.readTable(spark, t), aggSpec,
      numBuckets = 2)
    checkAgainstRecompute()

    // insert a row + update a measure in place
    Scd1Merge.upsert(spark, t,
      Seq((4L, "b", 1L), (1L, "a", 20L)).toDF("k", "g", "v"), Seq("k"))
    sync()
    checkAgainstRecompute()

    // GROUP MOVE: k=2 relocates a -> b (preimage -a, update +b)
    Scd1Merge.upsert(spark, t, Seq((2L, "b", 5L)).toDF("k", "g", "v"), Seq("k"))
    sync()
    checkAgainstRecompute()

    // duplicate sync is a no-op (stamp matches)
    sync()
    checkAgainstRecompute()

    // delete group a entirely + shrink b: a's row must VANISH from the
    // aggregate, not linger at zero
    Scd1Merge.delete(spark, t, Seq("k"), $"g" === "a" || $"k" === 2L)
    sync()
    checkAgainstRecompute()
    assert(Scd1Merge.readTable(spark, a).filter($"g" === "a").isEmpty,
      "fully-vanished group must be removed")
  }

  test("crash between stamped commit and tombstone sweep self-heals on replay") {
    val dir = graft.Tmp.dir("graft_incagg_crash")
    val t = dir + "/base"
    val a = dir + "/agg"
    Scd1Merge.upsert(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("k", "g", "v"), Seq("k"), numBuckets = 2)
    IncrementalAgg.bootstrap(spark, a, Scd1Merge.readTable(spark, t), aggSpec,
      numBuckets = 2)
    // kill group a in the base, then construct the torn state directly:
    // the stamped tombstone commit landed but the sweep never ran —
    // exactly what a crash between applyChanges' two commits leaves.
    Scd1Merge.delete(spark, t, Seq("k"), $"g" === "a")
    val torn = Scd1Merge.readTable(spark, a)
      .withColumn("sum_v", when($"g" === "a", lit(0L)).otherwise($"sum_v"))
      .withColumn("n", when($"g" === "a", lit(0L)).otherwise($"n"))
    val stamp = f"base-commit-${Scd1Merge.tableCommit(t).get}%09d"
    Scd1Merge.upsert(spark, a, torn, Seq("g"), statsColumns = Seq("n"),
      batchId = stamp)
    assert(Scd1Merge.readTable(spark, a).filter($"n" === 0L).count() == 1,
      "precondition: a tombstone row is present")
    // replay: stamp matches -> delta NOT reapplied, sweep finishes
    IncrementalAgg.applyChanges(spark, a, t, Seq("k"), aggSpec)
    assert(Scd1Merge.readTable(spark, a).filter($"n" === 0L).isEmpty,
      "replay must sweep the tombstone")
    assertSameRows(
      Scd1Merge.readTable(spark, a).select($"g", $"sum_v", $"n").orderBy($"g"),
      Scd1Merge.readTable(spark, t)
        .groupBy($"g").agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
        .orderBy($"g"))
  }
}
