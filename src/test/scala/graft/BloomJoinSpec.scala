package graft

import graft.ops.BloomJoin
import org.apache.spark.sql.functions._

/** Bloom-pruned join: exact-result equivalence to the plain join, a
  * prune that actually drops non-candidate rows, and the filter
  * sitting BELOW the join in the physical plan (pre-shuffle). */
class BloomJoinSpec extends SparkSpecBase {
  import spark.implicits._

  // probe 50k rows, build keys = the 2% divisible by 50
  private def probe = spark.range(0, 50000)
    .select($"id".as("k"), ($"id" % 97).as("payload"))
  private def build = spark.range(0, 50000)
    .filter($"id" % 50 === 0).select($"id".as("k"), lit("b").as("tag"))

  test("bloomPrunedJoin result equals the plain join") {
    val got = BloomJoin.bloomPrunedJoin(probe, build, Seq("k"),
      expectedItems = 1000L)
    val want = probe.join(build, Seq("k"))
    assert(canon(got) == canon(want))
  }

  test("the sketch prunes: surviving probe rows are candidate-sized") {
    val sketch = BloomJoin.buildSketch(build, Seq(col("k")),
      expectedItems = 1000L, numBits = 16 * 1024)
    val kept = BloomJoin.prune(probe, Seq(col("k")), sketch).count()
    // 1000 true keys + fp residue; the point is ≪ 50000
    assert(kept >= 1000 && kept < 5000, s"kept $kept of 50000")
  }

  test("might_contain filters below the join, and false positives die") {
    val joined = BloomJoin.bloomPrunedJoin(probe, build, Seq("k"),
      expectedItems = 1000L, fpp = 0.5) // sloppy sketch on purpose
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
    // the filter must appear in the probe branch, not above the join
    val joinIdx = plan.indexOf("Join")
    assert(plan.indexOf("might_contain") > joinIdx,
      "prune filter should be inside a join child subtree")
    assert(joined.count() == 1000) // exact despite fpp = 0.5
  }

  test("multi-column keys hash as a tuple on both sides") {
    val p2 = probe.select(($"k" / 100).cast("long").as("a"), ($"k" % 100).as("b"))
    val b2 = build.select(($"k" / 100).cast("long").as("a"), ($"k" % 100).as("b"))
      .distinct()
    val got = BloomJoin.bloomPrunedJoin(p2, b2, Seq("a", "b"), 1000L)
    assert(canon(got) == canon(p2.join(b2, Seq("a", "b"))))
  }
}
