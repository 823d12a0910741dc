package graft

import graft.merge.Scd1Merge
import graft.pipeline.{IncrementalAgg, IncrementalJoinAgg}
import org.apache.spark.sql.functions._

/** The join-MV must equal a from-scratch recompute of the view after
  * every delta application — fact updates, fact deletes, and the hard
  * case, a dim row MOVING groups (mass migrates, emptied groups are
  * tombstone-swept) — and a replayed application must be a no-op. */
class IncrementalJoinSpec extends SparkSpecBase {

  import spark.implicits._

  private val spec =
    IncrementalAgg.AggSpec(Seq("grp"), Seq("m" -> "sum_m"), "n")

  private def mvState(mv: String) =
    canon(Scd1Merge.readTable(spark, mv)
      .select(col("grp"), col("sum_m"), col("n")).orderBy(col("grp")))

  private def recompute(factP: String, dimP: String) =
    canon(Scd1Merge.readTable(spark, factP).as("f")
      .join(Scd1Merge.readTable(spark, dimP).as("d"),
        col("fk") === col("dk"))
      .groupBy(col("grp"))
      .agg(sum(col("m")).as("sum_m"), count(lit(1)).as("n"))
      .orderBy(col("grp")))

  test("join-MV tracks the recompute through fact and dim deltas; replay no-ops") {
    val base = Tmp.dir("ijoin")
    val factP = base + "/fact"; val dimP = base + "/dim"; val mv = base + "/mv"
    Scd1Merge.upsert(spark, factP,
      Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 20L, 7L)).toDF("k", "fk", "m"),
      Seq("k"), numBuckets = 2, retainVersions = 5)
    Scd1Merge.upsert(spark, dimP,
      Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("dk", "grp"),
      Seq("dk"), numBuckets = 2, retainVersions = 5)
    IncrementalJoinAgg.bootstrap(spark, mv,
      Scd1Merge.readTable(spark, factP), Scd1Merge.readTable(spark, dimP),
      "fk", "dk", spec, batchId = "boot")
    assert(mvState(mv) == recompute(factP, dimP), "bootstrap state")

    // fact delta: k=1 re-measured 100→40 (preimage −100 +40), k=4 lands
    // on the previously-factless dim key 30 (group 'c' appears)
    Scd1Merge.upsert(spark, factP,
      Seq((1L, 10L, 40L), (4L, 30L, 9L)).toDF("k", "fk", "m"),
      Seq("k"), retainVersions = 5)
    IncrementalJoinAgg.applyChanges(spark, mv, factP, Seq("k"), dimP, Seq("dk"),
      "fk", "dk", spec, factBack = Some((1, 0)))
    assert(mvState(mv) == recompute(factP, dimP), "after fact update+insert")

    // fact delete: k=3 vanishes, emptying group 'b' (tombstone sweep)
    Scd1Merge.delete(spark, factP, Seq("k"), col("k") === 3L,
      retainVersions = 5)
    IncrementalJoinAgg.applyChanges(spark, mv, factP, Seq("k"), dimP, Seq("dk"),
      "fk", "dk", spec, factBack = Some((1, 0)))
    assert(mvState(mv) == recompute(factP, dimP), "after fact delete")
    assert(Scd1Merge.readTable(spark, mv).filter(col("grp") === "b").isEmpty,
      "an emptied group must be swept, not left at zero")

    // dim delta: dk=10 MOVES a→z — both fact rows' mass migrates and
    // group 'a' empties
    Scd1Merge.upsert(spark, dimP, Seq((10L, "z")).toDF("dk", "grp"),
      Seq("dk"), retainVersions = 5)
    IncrementalJoinAgg.applyChanges(spark, mv, factP, Seq("k"), dimP, Seq("dk"),
      "fk", "dk", spec, dimBack = Some((1, 0)))
    assert(mvState(mv) == recompute(factP, dimP), "after dim group move")
    assert(Scd1Merge.readTable(spark, mv).filter(col("grp") === "a").isEmpty,
      "the moved-away group must be swept")

    // replay of the dim application: same derived stamp → no-op
    val before = mvState(mv)
    IncrementalJoinAgg.applyChanges(spark, mv, factP, Seq("k"), dimP, Seq("dk"),
      "fk", "dk", spec, dimBack = Some((1, 0)))
    assert(mvState(mv) == before, "a replayed delta application must no-op")
  }
}
