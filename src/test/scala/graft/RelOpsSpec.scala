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

  test("RangeJoin.binned equals the naive theta join, boundaries included") {
    import graft.ops.RangeJoin
    // values straddle bin boundaries; intervals overlap, sit exactly on
    // bin edges, and include v == lo (in) and v == hi (out) cases
    val left = (0L to 400L by 7L).map(v => (v, v.toDouble)).toDF("id", "v")
    val right = Seq(
      (1L, 0.0, 100.0),    // bin-aligned
      (2L, 50.0, 250.0),   // overlaps band 1, crosses bins
      (3L, 99.0, 101.0),   // narrow, straddles a bin edge
      (4L, 350.0, 350.0)   // empty interval [350, 350): matches nothing
    ).toDF("band", "lo", "hi")
    val got = RangeJoin.binned(left, "v", right, "lo", "hi", binWidth = 100.0)
    val want = RangeJoin.naive(left, "v", right, "lo", "hi")
    assertSameRows(got.orderBy($"id", $"band"), want.orderBy($"id", $"band"))
    assert(got.filter($"band" === 4L).isEmpty)
    assert(got.filter($"v" === 0.0 && $"band" === 1L).count() == 1, "v == lo is in")
    assert(got.filter($"v" === 245.0 && $"band" === 2L).count() == 1)
    // the bin join is an EQUI join — no nested-loop/cartesian operator
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"bin key must drive an equi-join:\n$plan")
  }

  test("saltedEquiJoin equals the unsalted join and actually spreads the hot key") {
    import spark.implicits._
    import graft.ops.RelOps
    // key 7 is hot: 500 of 520 left rows
    val left = spark.range(0, 500).select(col("id"), lit(7L).as("k"))
      .unionByName(spark.range(500, 520).select(col("id"), (col("id") % 5).as("k")))
    val right = Seq((7L, "hot"), (1L, "one"), (2L, "two")).toDF("k", "v")
    for (jt <- Seq("inner", "left")) {
      val got = RelOps.saltedEquiJoin(left, right, Seq("k"),
        saltOn = col("id"), salts = 8, joinType = jt)
      val want = left.join(right, Seq("k"), jt)
      assertSameRows(got.orderBy("id"), want.orderBy("id"))
    }
    // the hot key's left rows really occupy many salt values
    val nSalts = left.filter($"k" === 7L)
      .select(pmod(hash(col("id")), lit(8)).as("s")).distinct().count()
    assert(nSalts == 8, s"hot key spread over $nSalts salts, want all 8")
    // replication is rejected where it would break semantics
    intercept[IllegalArgumentException] {
      RelOps.saltedEquiJoin(left, right, Seq("k"), col("id"), 8, "full_outer")
    }
  }

  test("profile counts nulls and distincts per column in one pass") {
    import spark.implicits._
    // the judged a27 row runs on null-free testdata, so the null path
    // (map VALUES may be null; only keys must not be) is pinned here
    val df = Seq(
      (1L, Some("a"), Some(2.0)),
      (2L, None, Some(2.0)),
      (3L, Some("b"), None),
      (4L, None, Some(7.5))
    ).toDF("id", "s", "d")
    val got = RelOps.profile(df, Seq(
        "id" -> col("id"),
        "s" -> col("s"),
        "d" -> col("d").cast("decimal(18,2)")))
      .orderBy("column")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(got.toSeq == Seq(
      ("d", 4L, 1L, 2L, "2.00", "7.50"),
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 2L, 2L, "a", "b")))
  }

  test("skewReport: planted hot key tops the hitters with the exact skew ratio") {
    import spark.implicits._
    // 3 cold keys x 10 rows + 1 hot key x 70 rows: avg = 100/4 = 25,
    // skew = 70/25 = 2.8 exactly
    val df = ((1 to 3).flatMap(k => Seq.fill(10)(k.toLong)) ++
      Seq.fill(70)(99L)).toDF("k")
    val got = RelOps.skewReport(df, Seq("k"), topN = 2)
      .orderBy("rank").collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("key") == "99" && got(0).getAs[Long]("cnt") == 70L)
    assert(got(0).getAs[Long]("n_keys") == 4L && got(0).getAs[Long]("n_rows") == 100L)
    assert(got(0).getAs[Double]("skew_ratio") == 2.8)
    assert(got(0).getAs[Double]("p50_cnt") == 10.0)
    // deterministic tie-break on the key rendering
    assert(got(1).getAs[String]("key") == "1" && got(1).getAs[Long]("cnt") == 10L)
  }

  test("profile numericCols orders extremes numerically, not lexicographically") {
    import spark.implicits._
    // '10.00' < '2.00' lexicographically and '9996' > '10000' — the
    // classic string-profiler lie; declared numeric columns must report
    // the NUMERIC extremes (still as the caller's rendering)
    val df = Seq((10000L, 10.0), (9996L, 2.0), (9999L, 7.5))
      .toDF("k", "v")
    val got = RelOps.profile(df, Seq(
        "k" -> col("k"),
        "v" -> col("v").cast("decimal(18,2)")),
        numericCols = Set("k", "v"))
      .orderBy("column")
      .collect().map(r => (r.getString(0), r.getString(4), r.getString(5)))
    assert(got.toSeq == Seq(("k", "9996", "10000"), ("v", "2.00", "10.00")))
    // undeclared columns keep lexicographic order (ISO dates, strings)
    val lex = RelOps.profile(df, Seq("k" -> col("k")))
      .collect().map(r => (r.getString(4), r.getString(5))).head
    assert(lex == ("10000", "9999"))
  }
}
