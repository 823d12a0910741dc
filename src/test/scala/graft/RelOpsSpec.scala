package graft

import graft.ops.RelOps
import org.apache.spark.sql.functions._

/** RelOps invariants, including the equivalence the Scaladoc of
  * newOldSplitNative promises. */
class RelOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def fixture = {
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("k", "v")
    val sink = Seq((2L, 20L), (4L, 40L)).toDF("k", "dim_key")
    (src, sink)
  }

  test("newOldSplit ≡ native left_semi/left_anti split") {
    val (src, sink) = fixture
    val (oldJ, newJ) = RelOps.newOldSplit(src, sink, "k", "dim_key")
    val (oldN, newN) = RelOps.newOldSplitNative(src, sink, "k")
    assertSameRows(oldJ.select($"k", $"v"), oldN.select($"k", $"v"))
    assertSameRows(newJ.select($"k", $"v"), newN.select($"k", $"v"))
    // and the join form carries the sink key for matched rows
    assert(canon(oldJ) == Seq(Seq("2", "b", "20"), Seq("4", "d", "40")))
  }

  test("positional union keeps duplicates and column positions") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((2L, "y"), (3L, "z")).toDF("k", "v")
    val u = RelOps.positionalUnion(a, b)
    assert(u.count() == 4) // UNION ALL semantics, no dedup
    assertSameRows(u, a.unionByName(b))
  }

  test("emptyWithSchema keeps schema, returns zero rows, folds to LocalRelation") {
    val df = spark.range(10).select($"id", lit("s").as("v"))
    val empty = RelOps.emptyWithSchema(df)
    assert(empty.schema == df.schema)
    assert(empty.count() == 0)
    assert(empty.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LocalRelation")))
  }

  test("dupAudit reports only keys with count > 1") {
    val df = Seq(1, 1, 1, 2, 3, 3).toDF("k")
    assert(canon(RelOps.dupAudit(df, Seq("k"))) ==
      Seq(Seq("1", "3"), Seq("3", "2")))
  }

  test("maxKeyScalar returns default on empty input") {
    val df = Seq.empty[(Long, String)].toDF("k", "v")
    assert(RelOps.maxKeyScalar(df, "k", 7L) == 7L)
    assert(RelOps.maxKeyScalar(Seq((41L, "x")).toDF("k", "v"), "k", 7L) == 41L)
  }
}
