package graft

import graft.merge.Scd1Merge
import graft.sql.GraftTables
import org.apache.spark.sql.functions._

/** DataSource V2 surface: `spark.read.format("graft")` must be
  * bit-identical to the library read, pushed filters must reach the
  * engine's bucket pruning (not just the row filter), column pruning
  * must narrow the scan, and the `TableCatalog` must serve registered
  * names to a vanilla session with no parser injection. */
class GraftDsv2Spec extends SparkSpecBase {
  import spark.implicits._

  private def mkTable(tag: String, n: Int = 40): String = {
    val path = graft.Tmp.dir(s"graft_dsv2_$tag") + "/t"
    val dim = (0 until n).map(i => (i.toLong, s"name_$i", (i % 5).toLong))
      .toDF("k", "name", "region")
    Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = 4)
    path
  }

  test("format read == library read; load() without a path is loud") {
    val path = mkTable("parity")
    assertSameRows(
      spark.read.format("graft").load(path).orderBy("k"),
      Scd1Merge.readTable(spark, path).orderBy("k"))
    intercept[Exception] { spark.read.format("graft").load() }
  }

  test("pushed filters reach the engine's bucket pruning and show in the plan") {
    val path = mkTable("push")
    // reset BEFORE planning: the V1Scan bridge builds the engine read
    // (and takes the prune decision) at plan time
    Scd1Merge.lastPrune = (-1, -1)
    val df = spark.read.format("graft").load(path).filter($"k" === 7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(k,7)"),
      s"pushdown missing from plan:\n$plan")
    assert(df.collect().map(_.getString(1)).toSeq == Seq("name_7"))
    // the key-equality filter probed ONE bucket of 4 — the pushdown
    // reached the manifest-level prune, not just the row filter
    assert(Scd1Merge.lastPrune == (1, 4),
      s"expected 1/4 buckets, got ${Scd1Merge.lastPrune}")
  }

  test("column pruning narrows the scan; unconvertible filters stay residual") {
    val path = mkTable("prune")
    val df = spark.read.format("graft").load(path).select("name")
    assert(df.columns.toSeq == Seq("name"))
    assert(df.count() == 40)
    // a filter the source cannot convert (arbitrary expression) still
    // evaluates correctly as Spark's residual
    val r = spark.read.format("graft").load(path)
      .filter(length($"name") % 2 === 1 && $"k" < 10)
    assertSameRows(r.orderBy("k"),
      Scd1Merge.readTable(spark, path)
        .filter(length($"name") % 2 === 1 && $"k" < 10).orderBy("k"))
  }

  test("TableCatalog: registered names readable from vanilla SQL, SHOW TABLES lists them") {
    val path = mkTable("cat")
    spark.conf.set("spark.sql.catalog.gcat", classOf[graft.sources.GraftCatalog].getName)
    GraftTables.register("dsv2_dim", path)
    try {
      // plain spark.sql on a NON-extension session — no splice path
      val agg = spark.sql(
        "SELECT region, count(*) AS n FROM gcat.default.dsv2_dim GROUP BY region")
      assert(agg.count() == 5 && agg.agg(sum("n")).as[Long].head() == 40L)
      val shown = spark.sql("SHOW TABLES IN gcat.default")
        .select("tableName").as[String].collect().toSeq
      assert(shown.contains("dsv2_dim"), s"SHOW TABLES gave $shown")
      // predicate through the catalog read prunes too (reset before
      // planning — the scan builds at plan time)
      Scd1Merge.lastPrune = (-1, -1)
      assert(spark.sql("SELECT name FROM gcat.default.dsv2_dim WHERE k = 3")
        .as[String].head() == "name_3")
      assert(Scd1Merge.lastPrune == (1, 4))
      // unknown name is a loud catalog error
      intercept[Exception] { spark.sql("SELECT * FROM gcat.default.nope").collect() }
      // creation through the catalog is declined with guidance
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE gcat.default.newt (a INT)").collect()
      }
      assert(e.getMessage.contains("engine API") ||
        e.getMessage.toLowerCase.contains("not support"))
    } finally {
      GraftTables.unregister("dsv2_dim")
      spark.conf.unset("spark.sql.catalog.gcat")
    }
  }

  test("DSv2 read composes: joins and aggregates over two format reads") {
    val p1 = mkTable("j1", 20); val p2 = mkTable("j2", 10)
    val a = spark.read.format("graft").load(p1)
    val b = spark.read.format("graft").load(p2).withColumnRenamed("name", "bname")
    val j = a.join(b, Seq("k", "region")).groupBy("region")
      .agg(count(lit(1)).as("n")).orderBy("region")
    val expect = Scd1Merge.readTable(spark, p1)
      .join(Scd1Merge.readTable(spark, p2).withColumnRenamed("name", "bname"),
        Seq("k", "region"))
      .groupBy("region").agg(count(lit(1)).as("n")).orderBy("region")
    assertSameRows(j, expect)
  }
}
