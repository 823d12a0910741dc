package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._

/** Data-skipping stats (Delta file-skipping parity over the manifest):
  * per-bucket min/max written at commit time, consumed by
  * readTableWhere and the delete probe. Two pruning levers, both
  * pinned here via `inputFiles` and the lastPrune breadcrumb:
  * key-equality hash pruning (exact — the lever min/max cannot provide
  * in a hash-bucketed layout) and min/max range pruning on declared
  * stats columns. */
class StatsSkippingSpec extends SparkSpecBase {
  import spark.implicits._

  /** Typed probe frame the predicates resolve against (the prune path
    * resolves them the same way, against a one-bucket read). Parquet-
    * backed deliberately: over a LocalRelation the optimizer would
    * evaluate the filter away instead of leaving a Filter node. */
  private lazy val probe = {
    val p = Tmp.dir("skip_probe") + "/probe"
    Seq((1, 1.0, "a")).toDF("x", "y", "s").write.parquet(p)
    spark.read.parquet(p)
  }
  private def expr(c: org.apache.spark.sql.Column) =
    Scd1Merge.resolvedPredicate(probe, c).get

  test("canMatch bounds logic over l-typed stats") {
    val st = Map("x" -> Scd1Merge.ColStats('l', "10", "20"))
    assert(Scd1Merge.canMatch(st, expr(col("x") === 15)))
    assert(!Scd1Merge.canMatch(st, expr(col("x") === 25)))
    assert(!Scd1Merge.canMatch(st, expr(lit(25) === col("x"))))
    assert(!Scd1Merge.canMatch(st, expr(col("x") > 20)))
    assert(Scd1Merge.canMatch(st, expr(col("x") >= 20)))
    assert(!Scd1Merge.canMatch(st, expr(col("x") < 10)))
    assert(Scd1Merge.canMatch(st, expr(col("x") <= 10)))
    assert(Scd1Merge.canMatch(st, expr(col("x") === 25 || col("x") === 12)))
    assert(!Scd1Merge.canMatch(st, expr(col("x") === 25 || col("x") === 30)))
    // (x=15 && x=25 would be constant-propagated to FALSE and the whole
    // filter folded away before pruning ever sees it — use a satisfiable
    // conjunction whose out-of-range leg must veto the bucket)
    assert(!Scd1Merge.canMatch(st, expr(col("x") === 25 && col("y") === 1.0)))
    assert(Scd1Merge.canMatch(st, expr(col("y") === 99)), "untracked column is can-match")
    assert(!Scd1Merge.canMatch(st, expr(col("x").isin(1, 2, 3))))
    assert(Scd1Merge.canMatch(st, expr(col("x").isin(1, 15))))
    // fractional literal: analysis widens the int column to double —
    // an exact widening, pruned through the cast with exact decimal math
    assert(!Scd1Merge.canMatch(st, expr(col("x") > lit(20.5))))
    assert(Scd1Merge.canMatch(st, expr(col("x") > lit(19.5))))
    // != prunes only a constant bucket
    val cst = Map("x" -> Scd1Merge.ColStats('l', "7", "7"))
    assert(!Scd1Merge.canMatch(cst, expr(col("x") =!= 7)))
    assert(Scd1Merge.canMatch(cst, expr(col("x") =!= 8)))
    // null-literal comparison: the optimizer folds the filter away
    // entirely (it matches nothing); pruning just doesn't engage
    assert(Scd1Merge.resolvedPredicate(probe, col("x") === lit(null))
      .forall(e => Scd1Merge.canMatch(st, e)))
  }

  test("canMatch over string stats uses UTF-8 byte order") {
    val st = Map("s" -> Scd1Merge.ColStats('s', "banana", "mango"))
    assert(Scd1Merge.canMatch(st, expr(col("s") === "cherry")))
    assert(!Scd1Merge.canMatch(st, expr(col("s") === "apple")))
    assert(!Scd1Merge.canMatch(st, expr(col("s") > "mango")))
    assert(Scd1Merge.canMatch(st, expr(col("s") >= "mango")))
    assert(!Scd1Merge.canMatch(st, expr(col("s") < "banana")))
  }

  test("key-equality read prunes to exactly one bucket (hash pruning)") {
    val path = Tmp.dir("skip_eq") + "/t"
    val df = (1L to 500L).map(i => (i, s"v$i")).toDF("k", "v")
    Scd1Merge.upsert(spark, path, df, Seq("k"), numBuckets = 16)
    val full = Scd1Merge.readTable(spark, path)
    val got = Scd1Merge.readTableWhere(spark, path, col("k") === 137L)
    assert(Scd1Merge.lastPrune._1 == 1, s"prune=${Scd1Merge.lastPrune}")
    assert(got.inputFiles.length < full.inputFiles.length,
      "selective predicate must read fewer files than the full table")
    assertSameRows(got, full.filter(col("k") === 137L))
    // cross-type literal (Int vs Long column): safe numeric cast, still one bucket
    val got2 = Scd1Merge.readTableWhere(spark, path, col("k") === 137)
    assert(Scd1Merge.lastPrune._1 == 1)
    assertSameRows(got2, got)
    // unprunable predicate: every bucket is a candidate, content still right
    val all = Scd1Merge.readTableWhere(spark, path, pmod(col("k"), lit(100)) === 37)
    assert(Scd1Merge.lastPrune._1 == Scd1Merge.lastPrune._2)
    assertSameRows(all, full.filter(pmod(col("k"), lit(100)) === 37))
    // IN-list: the batched point lookup reads only its keys' buckets
    val in = Scd1Merge.readTableWhere(spark, path, col("k").isin(3L, 137L, 400L))
    assert(Scd1Merge.lastPrune._1 <= 3, s"prune=${Scd1Merge.lastPrune}")
    assertSameRows(in, full.filter(col("k").isin(3L, 137L, 400L)))
    // oversized IN-list: hash pruning opts out, content still right
    val big = (1L to 200L)
    val inBig = Scd1Merge.readTableWhere(spark, path, col("k").isin(big: _*))
    assertSameRows(inBig, full.filter(col("k").isin(big: _*)))
  }

  /** Stats column whose per-bucket ranges are disjoint BY CONSTRUCTION:
    * ts = bucket*100 + (k mod 50), computed from the same hash the
    * writer buckets by, so bucket b's ts range is [100b, 100b+49]. */
  private def disjointTsFrame(nb: Int, n: Long) =
    (1L to n).toDF("k")
      .withColumn("ts", pmod(hash(col("k")), lit(nb)) * 100 + pmod(col("k"), lit(50)))
      .select("k", "ts")

  test("range read on a declared stats column prunes to overlapping buckets") {
    val path = Tmp.dir("skip_rng") + "/t"
    val nb = 8
    Scd1Merge.upsert(spark, path, disjointTsFrame(nb, 400L), Seq("k"),
      numBuckets = nb, statsColumns = Seq("ts"))
    val p = col("ts") >= 210 && col("ts") <= 240 // only bucket 2's range
    val got = Scd1Merge.readTableWhere(spark, path, p)
    assert(Scd1Merge.lastPrune == (1, nb), s"prune=${Scd1Merge.lastPrune}")
    val full = Scd1Merge.readTable(spark, path)
    assert(got.inputFiles.length < full.inputFiles.length)
    assertSameRows(got, full.filter(p))
    // non-matching range between two buckets' ranges: zero buckets read
    val none = Scd1Merge.readTableWhere(spark, path, col("ts") >= 60 && col("ts") <= 90)
    assert(Scd1Merge.lastPrune._1 == 0)
    assert(none.count() == 0)
    assert(none.columns.toSeq == Seq("k", "ts"), "empty read keeps the schema")
  }

  test("stats survive later commits on untouched buckets and refresh on touched ones") {
    val path = Tmp.dir("skip_keep") + "/t"
    val nb = 8
    Scd1Merge.upsert(spark, path, disjointTsFrame(nb, 400L), Seq("k"),
      numBuckets = nb, statsColumns = Seq("ts"))
    // a 1-row merge touches ONE bucket; the other buckets' manifest
    // stats must round-trip the commit unscathed (the r6 dead-scaffold
    // bug class: stats silently dropped on the next commit)
    val k = 137L
    val bkt = spark.range(1).select(pmod(hash(lit(k)), lit(nb))).head.getInt(0)
    val batch = Seq((k, bkt * 100L + k % 50)).toDF("k", "ts")
    Scd1Merge.upsert(spark, path, batch, Seq("k"), statsColumns = Seq("ts"))
    val p = col("ts") >= 210 && col("ts") <= 240
    Scd1Merge.readTableWhere(spark, path, p).count()
    assert(Scd1Merge.lastPrune == (1, nb),
      s"stats must survive an unrelated commit; prune=${Scd1Merge.lastPrune}")
  }

  test("delete probe prunes: key equality probes one bucket, range probes overlapping") {
    val path = Tmp.dir("skip_del") + "/t"
    val nb = 8
    Scd1Merge.upsert(spark, path, disjointTsFrame(nb, 400L), Seq("k"),
      numBuckets = nb, statsColumns = Seq("ts"))
    val n1 = Scd1Merge.delete(spark, path, Seq("k"), col("k") === 137L)
    assert(n1 == 1L)
    assert(Scd1Merge.lastPrune._1 == 1, s"prune=${Scd1Merge.lastPrune}")
    val n2 = Scd1Merge.delete(spark, path, Seq("k"), col("ts") >= 210 && col("ts") <= 240)
    assert(Scd1Merge.lastPrune._1 <= 1, s"prune=${Scd1Merge.lastPrune}")
    // no-op delete outside every range: zero buckets probed, no Spark job
    val n3 = Scd1Merge.delete(spark, path, Seq("k"), col("ts") === 9999)
    assert(n3 == 0L)
    assert(Scd1Merge.lastPrune._1 == 0)
    assert(Scd1Merge.readTable(spark, path).count() == 400L - n1 - n2)
  }

  test("date and timestamp stats prune with typed literals") {
    val path = Tmp.dir("skip_date") + "/t"
    val nb = 4
    val rows = (1L to 200L).toDF("k")
      .withColumn("d", date_add(lit(java.sql.Date.valueOf("2020-01-01")),
        (pmod(hash(col("k")), lit(nb)) * 100).cast("int")))
      .select("k", "d")
    Scd1Merge.upsert(spark, path, rows, Seq("k"), numBuckets = nb, statsColumns = Seq("d"))
    val p = col("d") === lit(java.sql.Date.valueOf("2020-01-01")) // bucket-0 rows only
    val got = Scd1Merge.readTableWhere(spark, path, p)
    assert(Scd1Merge.lastPrune == (1, nb), s"prune=${Scd1Merge.lastPrune}")
    assertSameRows(got, Scd1Merge.readTable(spark, path).filter(p))
  }

  test("mismatched merge keys are rejected once the manifest records them") {
    val path = Tmp.dir("skip_keys") + "/t"
    Scd1Merge.upsert(spark, path,
      Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    val e = intercept[IllegalArgumentException] {
      Scd1Merge.upsert(spark, path, Seq(("b", 2L)).toDF("v", "k"), Seq("v"))
    }
    assert(e.getMessage.contains("bucketed on keys"))
  }
}
