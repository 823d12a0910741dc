package graft

import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("asofLeft matches the latest right time at or before each left time") {
    val left = Seq((1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 5L),
                   (4L, "u2", 50L), (5L, "u3", 7L)).toDF("id", "k", "t")
    val right = Seq(("u1", 10L), ("u1", 15L), ("u2", 60L)).toDF("k", "rt")
    val got = canon(AsofJoin.asofLeft(left, right, Seq("k"), "t", "rt", "m")
      .select($"id", $"m"))
    assert(got == Seq(
      Seq("1", "10"),   // exact tie: >= semantics match
      Seq("2", "15"),   // latest of two priors
      Seq("3", "null"), // right rows all later
      Seq("4", "null"), // u2's only right row is later
      Seq("5", "null")  // key with no right rows at all
    ))
  }

  test("asofLeft keeps every left row and all left columns") {
    val left = Seq((1L, "u1", 10L, "x")).toDF("id", "k", "t", "payload")
    val right = Seq(("u1", 9L)).toDF("k", "rt")
    val out = AsofJoin.asofLeft(left, right, Seq("k"), "t", "rt", "m")
    assert(out.columns.toSeq == Seq("id", "k", "t", "payload", "m"))
    assert(out.count() == 1)
  }
}
