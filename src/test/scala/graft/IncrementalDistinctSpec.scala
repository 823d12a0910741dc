package graft

import graft.merge.Scd1Merge
import graft.pipeline.{IncrementalAgg, IncrementalDistinct}
import graft.pipeline.IncrementalDistinct.Spec
import org.apache.spark.sql.functions._

/** COUNT(DISTINCT) maintenance vs full recompute through every
  * transition class, plus the two-table chain's crash window (mult
  * committed, dc not) that the judged pipe16 query can't exercise. */
class IncrementalDistinctSpec extends SparkSpecBase {
  import spark.implicits._

  private val dSpec = Spec(Seq("g"), "v")

  test("distinct counts track recompute through birth/move/death; last-copy death detected") {
    val dir = graft.Tmp.dir("graft_incdc_spec")
    val t = dir + "/base"
    val m = dir + "/mult"
    val d = dir + "/dc"
    def sync(): Unit =
      IncrementalDistinct.applyChanges(spark, m, d, t, Seq("k"), dSpec)
    def check(): Unit = assertSameRows(
      Scd1Merge.readTable(spark, d).select($"g", $"n_distinct").orderBy($"g"),
      Scd1Merge.readTable(spark, t)
        .groupBy($"g").agg(countDistinct($"v").as("n_distinct"))
        .orderBy($"g"))

    // g=a holds v∈{1,1,2}; g=b holds v∈{9}
    Scd1Merge.upsert(spark, t,
      Seq((1L, "a", 1L), (2L, "a", 1L), (3L, "a", 2L), (4L, "b", 9L))
        .toDF("k", "g", "v"),
      Seq("k"), numBuckets = 2)
    IncrementalDistinct.bootstrap(spark, m, d,
      Scd1Merge.readTable(spark, t), dSpec, numBuckets = 2)
    check()

    // NON-last copy dies (k=1: a still holds v=1 via k=2) — count must
    // NOT drop; then the LAST copy dies (k=2) — count must drop
    Scd1Merge.delete(spark, t, Seq("k"), $"k" === 1L)
    sync(); check()
    Scd1Merge.delete(spark, t, Seq("k"), $"k" === 2L)
    sync(); check()

    // value MOVE in one batch: k=3 changes v 2→5 — death of 2 AND
    // birth of 5 ride the same update/preimage pair
    Scd1Merge.upsert(spark, t, Seq((3L, "a", 5L)).toDF("k", "g", "v"), Seq("k"))
    sync(); check()

    // duplicate sync is a no-op end to end
    sync(); check()

    // whole group dies
    Scd1Merge.delete(spark, t, Seq("k"), $"g" === "a")
    sync(); check()
    assert(Scd1Merge.readTable(spark, d).filter($"g" === "a").count() == 0)
  }

  test("NULL values follow SQL COUNT(DISTINCT): ignored at bootstrap and through every transition") {
    val dir = graft.Tmp.dir("graft_incdc_null")
    val t = dir + "/base"
    val m = dir + "/mult"
    val d = dir + "/dc"
    def row(k: Long, g: String, v: java.lang.Long) = (k, g, v)
    def sync(): Unit =
      IncrementalDistinct.applyChanges(spark, m, d, t, Seq("k"), dSpec)
    def check(): Unit = assertSameRows(
      Scd1Merge.readTable(spark, d).select($"g", $"n_distinct").orderBy($"g"),
      Scd1Merge.readTable(spark, t)
        .groupBy($"g").agg(countDistinct($"v").as("n_distinct"))
        .filter($"n_distinct" > 0).orderBy($"g"))

    // bootstrap with NULLs present: a={1, null}, b={null} — b must be
    // ABSENT from dc (its countDistinct is 0 — no live values), not 1
    Scd1Merge.upsert(spark, t,
      Seq(row(1L, "a", 1L), row(2L, "a", null), row(3L, "b", null))
        .toDF("k", "g", "v"),
      Seq("k"), numBuckets = 2)
    IncrementalDistinct.bootstrap(spark, m, d,
      Scd1Merge.readTable(spark, t), dSpec, numBuckets = 2)
    check()
    assert(Scd1Merge.readTable(spark, d).filter($"g" === "b").count() == 0)

    // null→value birth (k=3: b gains its first real value)
    Scd1Merge.upsert(spark, t, Seq(row(3L, "b", 9L)).toDF("k", "g", "v"), Seq("k"))
    sync(); check()
    // value→null death of a's only copy of 1
    Scd1Merge.upsert(spark, t, Seq(row(1L, "a", null)).toDF("k", "g", "v"), Seq("k"))
    sync(); check()
    // deleting a pure-null row changes nothing
    Scd1Merge.delete(spark, t, Seq("k"), $"k" === 2L)
    sync(); check()
  }

  test("crash between mult and dc commits: next sync catches dc up over the gap") {
    val dir = graft.Tmp.dir("graft_incdc_crash")
    val t = dir + "/base"
    val m = dir + "/mult"
    val d = dir + "/dc"
    Scd1Merge.upsert(spark, t,
      Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "g", "v"),
      Seq("k"), numBuckets = 2)
    IncrementalDistinct.bootstrap(spark, m, d,
      Scd1Merge.readTable(spark, t), dSpec, numBuckets = 2)

    // batch: new value for a, and b's only row deleted
    Scd1Merge.upsert(spark, t, Seq((3L, "a", 7L)).toDF("k", "g", "v"), Seq("k"))
    // simulate the crash: ONLY the mult layer runs (the judged flow's
    // applyChanges dies before the dc layer)
    IncrementalAgg.applyChanges(spark, m, t, Seq("k"),
      IncrementalAgg.AggSpec(Seq("g", "v"), Nil, "mult"),
      retainVersions = IncrementalDistinct.MultRetain)
    // dc is now stale; the full sync must no-op mult and catch dc up
    IncrementalDistinct.applyChanges(spark, m, d, t, Seq("k"), dSpec)
    assertSameRows(
      Scd1Merge.readTable(spark, d).select($"g", $"n_distinct").orderBy($"g"),
      Scd1Merge.readTable(spark, t)
        .groupBy($"g").agg(countDistinct($"v").as("n_distinct"))
        .orderBy($"g"))

    // a second batch spanning MULTIPLE mult commits (merge + sweep)
    // while dc lags: delete kills b entirely (mult death → sweep)
    Scd1Merge.delete(spark, t, Seq("k"), $"g" === "b")
    IncrementalDistinct.applyChanges(spark, m, d, t, Seq("k"), dSpec)
    assert(Scd1Merge.readTable(spark, d).filter($"g" === "b").count() == 0)
    assert(Scd1Merge.readTable(spark, d).filter($"g" === "a")
      .select($"n_distinct").as[Long].head() == 2L)
  }
}
