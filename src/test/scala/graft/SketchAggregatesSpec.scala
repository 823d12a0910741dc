package graft

import graft.functions.SketchAggregates.approxTopK
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The Misra–Gries frequent-items aggregate: the survival guarantee
  * (every item with true freq > n/(cap+1) is in the sketch) under real
  * partial/merge execution, estimate bounds, exactness when the
  * vocabulary fits, and the ObjectHashAggregate partial-agg plan. */
class SketchAggregatesSpec extends SparkSpecBase {
  import spark.implicits._

  /** Zipf-ish stream: item i appears ~N/(i+1) times, shuffled and
    * split across partitions so merge() really runs. */
  private def zipf(n: Int, seed: Int): Seq[String] = {
    val rng = new scala.util.Random(seed)
    rng.shuffle((0 until n).flatMap(i =>
      Seq.fill(math.max(n / (i + 1), 1))(s"item_$i")))
  }

  test("survival guarantee: every true heavy hitter is in the sketch") {
    val data = zipf(200, 7)
    val n = data.size.toLong
    val cap = 16
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val heavies = exact.filter(_._2 * (cap + 1) > n).keySet
    assert(heavies.nonEmpty, "test data must contain heavy hitters")
    val sk = data.toDF("tok").repartition(13)
      .agg(approxTopK($"tok", cap).as("sk"))
      .head.getSeq[Row](0)
    val cands = sk.map(_.getString(0)).toSet
    assert(sk.size <= cap)
    assert(heavies.subsetOf(cands), s"missing: ${heavies -- cands}")
    // estimate bounds: true - n/(cap+1) <= est <= true
    sk.foreach { r =>
      val (item, est) = (r.getString(0), r.getLong(1))
      val t = exact(item)
      assert(est <= t && est >= t - n / (cap + 1) - 1,
        s"$item: est=$est true=$t n=$n")
    }
  }

  test("exact when the vocabulary fits in capacity, any partitioning") {
    val data = zipf(10, 3) // 10 distinct << 64
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 5, 32)) {
      val sk = data.toDF("tok").repartition(parts)
        .agg(approxTopK($"tok", 64).as("sk")).head.getSeq[Row](0)
      assert(sk.map(r => r.getString(0) -> r.getLong(1)).toMap == exact,
        s"parts=$parts")
    }
  }

  test("nulls skipped; all-null group evaluates to empty array") {
    val df = Seq((0, Some("a")), (0, None), (1, None)).toDF("g", "tok")
    val out = df.groupBy($"g").agg(approxTopK($"tok", 4).as("sk"))
      .orderBy($"g").collect()
    assert(out(0).getSeq[Row](1).map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("a", 1L)))
    assert(out(1).getSeq[Row](1).isEmpty)
  }

  test("deterministic output order: est desc, then item asc") {
    val sk = Seq("b", "a", "c", "a", "b", "d").toDF("tok")
      .agg(approxTopK($"tok", 8).as("sk")).head.getSeq[Row](0)
    assert(sk.map(_.getString(0)) == Seq("a", "b", "c", "d"))
  }

  test("plans as partial-agg ObjectHashAggregate") {
    val plan = zipf(50, 1).toDF("tok").repartition(4)
      .agg(approxTopK($"tok", 8))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert("ObjectHashAggregate".r.findAllIn(plan).size == 2)
  }

  test("SQL registration: approx_top_k usable from spark.sql") {
    GraftExtensions.register(spark)
    zipf(30, 5).toDF("tok").createOrReplaceTempView("toks_sketch_sql")
    val sk = spark.sql(
      "SELECT approx_top_k(tok, 8) AS sk FROM toks_sketch_sql")
      .head.getSeq[Row](0)
    assert(sk.nonEmpty && sk.size <= 8)
  }
}
