package graft

import graft.merge.Scd1Merge
import graft.ops.KeyGenStrategy
import graft.pipeline.{DimBuilder, DimSpec, SalesReplay}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.io.Source

/** Golden end-to-end test on the reference's own SalesData.csv
  * (SURVEY.md §5 item 3): the 3-batch replay must reproduce the
  * committed dim snapshots exactly, and the faithful notebook variants
  * (Q2 non-distinct source, MonotonicId keys) are pinned structurally —
  * their keys are partition-dependent so content can't be compared by
  * value. */
class GoldenSalesSpec extends SparkSpecBase {

  private lazy val root: String = {
    val r = Tmp.dir("golden_replay")
    SalesReplay.run(spark, r)
    r
  }

  private def golden(name: String): Seq[String] = {
    // explicit codec: the forked test JVM's default charset may not be
    // UTF-8, and BranchName/DealerName contain non-ASCII characters
    val src = Source.fromResource(s"golden/$name.psv")(scala.io.Codec.UTF8)
    try src.getLines().toList finally src.close()
  }

  private def asPsv(df: DataFrame): Seq[String] = {
    val lines = df.collect().toSeq
      .map(r => (0 until r.length)
        .map(i => if (r.isNullAt(i)) "<NULL>" else r.get(i).toString).mkString("|"))
      .sorted
    df.columns.mkString("|") +: lines
  }

  for (dim <- Seq("dim_branch", "dim_dealer", "dim_model", "dim_date")) {
    test(s"replayed $dim matches the committed golden snapshot") {
      assert(asPsv(Scd1Merge.readTable(spark, s"$root/$dim")) == golden(dim))
    }
  }

  test("fact has one row per CSV row with fully-resolved surrogate keys") {
    val fact = Scd1Merge.readTable(spark, s"$root/factsales")
    assert(fact.count() == 1849)
    val nulls = fact.filter(
      col("dim_branch_key").isNull || col("dim_dealer_key").isNull ||
      col("dim_model_key").isNull || col("dim_date_key").isNull).count()
    assert(nulls == 0, "every FK must resolve (incl. the 31 null-DealerName rows)")
  }

  test("replaying the last batch again changes nothing (end-to-end idempotency)") {
    root // materialize the replay
    val before = canon(Scd1Merge.readTable(spark, s"$root/factsales"))
    SalesReplay.run(spark, root) // watermark is at max -> all batches no-op
    assert(canon(Scd1Merge.readTable(spark, s"$root/factsales")) == before)
  }

  test("scale-mode replay (per-batch-partition gold build) ≡ fidelity replay") {
    val scaleRoot = Tmp.dir("golden_scale")
    val scaleFact = SalesReplay.runScale(spark, scaleRoot)
    assert(canon(scaleFact) == canon(Scd1Merge.readTable(spark, s"$root/factsales")),
      "fact content must be identical between fidelity and scale modes")
    for (dim <- Seq("dim_branch", "dim_dealer", "dim_model", "dim_date"))
      assert(canon(Scd1Merge.readTable(spark, s"$scaleRoot/$dim")) ==
             canon(Scd1Merge.readTable(spark, s"$root/$dim")),
        s"$dim diverged between fidelity and scale modes")
    // the scale invariant itself: silver landed as one partition per batch
    val parts = new java.io.File(s"$scaleRoot/silver").listFiles()
      .filter(_.getName.startsWith("__batch=")).map(_.getName).sorted
    assert(parts.length == 3, s"expected 3 batch partitions, got ${parts.toSeq}")
  }

  test("Q2 faithful variant: non-distinct dim keeps one row per silver row") {
    val raw = SalesReplay.readSalesCsv(spark)
    val spec = DimSpec("dim_branch_q2", Seq("Branch_ID"), "k",
      distinctSource = false, KeyGenStrategy.Scalable, attrs = Seq("BranchName"))
    val dim = DimBuilder.build(spark, raw, spec, None, "0")
    assert(dim.count() == 1849, "Q2: branch/dealer/date do NOT dedup their source")
    assert(dim.select(col("k")).distinct().count() == 1849,
      "duplicate natural rows still get distinct surrogate keys")
  }

  test("MonotonicId faithful variant: unique keys above the base (structural, Q4)") {
    val raw = SalesReplay.readSalesCsv(spark)
      .withColumn("model_category", split(col("Model_ID"), "-").getItem(0))
    val spec = DimSpec("dim_model_mono", Seq("Model_ID"), "k",
      distinctSource = true, KeyGenStrategy.MonotonicId, attrs = Seq("model_category"))
    val dim = DimBuilder.build(spark, raw, spec, None, "0")
    assert(dim.count() == 277)
    assert(dim.select(col("k")).distinct().count() == 277)
    assert(dim.agg(min(col("k"))).first().getLong(0) >= 2L)
  }
}
