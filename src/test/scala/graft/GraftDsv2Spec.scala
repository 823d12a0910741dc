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

  test("format read dispatches to the PARTITIONED layout; pushed filters prune by path") {
    import graft.merge.PartitionedTable
    val path = graft.Tmp.dir("graft_dsv2_part") + "/t"
    val fact = (0 until 40).map(i => (s"m${i % 4}", i.toLong, i.toLong * 3))
      .toDF("month", "k", "cents")
    PartitionedTable.upsert(spark, path, fact, Seq("month", "k"), "month",
      numBuckets = 2)
    // same doorway, partitioned table behind it
    assertSameRows(
      spark.read.format("graft").load(path).orderBy("month", "k"),
      fact.orderBy("month", "k"))
    // the pushed partition filter reaches the PATH-level prune
    PartitionedTable.lastPartitionPrune = (-1, -1)
    val df = spark.read.format("graft").load(path).filter($"month" === "m2")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(month,m2)"))
    assert(df.count() == 10)
    assert(PartitionedTable.lastPartitionPrune == (1, 4),
      s"expected 1/4 partitions, got ${PartitionedTable.lastPartitionPrune}")
    assert(df.inputFiles.forall(_.contains("/p=m2/")))
  }

  test("DSv2 write: creation needs keys; append is the keyed upsert; overwrite replaces atomically") {
    val path = graft.Tmp.dir("graft_dsv2_write") + "/t"
    val b1 = (0 until 20).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    // creation without declared merge keys is loud, never guessed
    val e = intercept[Exception] {
      b1.write.format("graft").mode("append").save(path)
    }
    assert(e.getMessage.contains("keys"))
    b1.write.format("graft").option("keys", "k").option("buckets", "4")
      .mode("append").save(path)
    assertSameRows(spark.read.format("graft").load(path).orderBy("k"), b1.orderBy("k"))
    // append = upsert: k=3 replaced, k=100 inserted
    Seq((3L, "NEW"), (100L, "added")).toDF("k", "v")
      .write.format("graft").mode("append").save(path)
    val after = Scd1Merge.readTable(spark, path)
    assert(after.count() == 21)
    assert(after.filter($"k" === 3).select("v").as[String].head() == "NEW")
    // a conflicting keys option on an existing table is rejected
    intercept[Exception] {
      Seq((1L, "x")).toDF("k", "v").write.format("graft")
        .option("keys", "v").mode("append").save(path)
    }
    // mode("overwrite") = full atomic replacement, one applyCdc commit
    val before = Scd1Merge.tableCommit(path).get
    val repl = Seq((3L, "only"), (7L, "rows")).toDF("k", "v")
    repl.write.format("graft").mode("overwrite").save(path)
    assertSameRows(spark.read.format("graft").load(path).orderBy("k"), repl.orderBy("k"))
    assert(Scd1Merge.tableCommit(path).get == before + 1,
      "overwrite must be ONE commit (old or new content, never a gap)")
  }

  test("DSv2 write: partitioned creation via options, new-partition append, full vs dynamic overwrite") {
    import graft.merge.PartitionedTable
    val path = graft.Tmp.dir("graft_dsv2_wpart") + "/t"
    val b1 = (0 until 30).map(i => (s"p${i % 3}", i.toLong, i.toLong * 2))
      .toDF("part", "k", "cents")
    b1.write.format("graft").option("keys", "part,k")
      .option("buckets", "2").option("partitionBy", "part")
      .mode("append").save(path)
    assert(PartitionedTable.tableExists(path))
    assert(PartitionedTable.partitions(spark, path).count() == 3)
    // append lands a NEW partition through the same doorway
    Seq(("p9", 1000L, 1L)).toDF("part", "k", "cents")
      .write.format("graft").mode("append").save(path)
    assert(PartitionedTable.partitions(spark, path).count() == 4)
    // dynamic overwrite (file-source convention: mode("overwrite") +
    // partitionOverwriteMode=dynamic): only the touched partition
    // replaced, others untouched
    Seq(("p1", 500L, 9L)).toDF("part", "k", "cents")
      .write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(path)
    val now = PartitionedTable.readTable(spark, path)
    assert(now.filter($"part" === "p1").count() == 1)   // replaced wholesale
    assert(now.filter($"part" === "p0").count() == 10)  // untouched
    assert(now.filter($"part" === "p9").count() == 1)
    // full overwrite: absent partitions DROP in the same parent swap
    Seq(("p0", 1L, 1L), ("pX", 2L, 2L)).toDF("part", "k", "cents")
      .write.format("graft").mode("overwrite").save(path)
    val fin = PartitionedTable.readTable(spark, path)
    assert(fin.count() == 2)
    assert(fin.select("part").distinct().as[String].collect().toSet == Set("p0", "pX"))
    // catalog writeTo().overwritePartitions(): the NATIVE BatchWrite
    // path (no V1 fallback exec exists in Spark for dynamic
    // overwrite) — only the touched partition replaced
    spark.conf.set("spark.sql.catalog.gcat", classOf[graft.sources.GraftCatalog].getName)
    GraftTables.register("dsv2_wpart", path)
    try {
      Seq(("p0", 501L, 9L)).toDF("part", "k", "cents")
        .writeTo("gcat.default.dsv2_wpart").overwritePartitions()
      val dyn = PartitionedTable.readTable(spark, path)
      assert(dyn.filter($"part" === "p0").count() == 1,
        "overwritePartitions must replace the touched partition wholesale")
      assert(dyn.filter($"part" === "pX").count() == 1,
        "overwritePartitions must leave untouched partitions intact")
    } finally {
      GraftTables.unregister("dsv2_wpart")
      spark.conf.unset("spark.sql.catalog.gcat")
    }
    // dynamic overwrite on a FLAT table is declined loudly
    val flat = mkTable("flatdyn")
    val e2 = intercept[Exception] {
      Seq((1L, "x", 0L)).toDF("k", "name", "region")
        .write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").save(flat)
    }
    assert(e2.getMessage.toLowerCase.contains("partition"))
  }

  test("DSv2 write is NATIVE: BATCH_WRITE capability, empty batch commits clean, flat overwritePartitions declines at planning") {
    import org.apache.spark.sql.connector.catalog.TableCapability
    val path = mkTable("nativew", 10)
    val caps = new graft.sources.GraftDsv2Table(path,
      Scd1Merge.readTable(spark, path).schema).capabilities()
    assert(caps.contains(TableCapability.BATCH_WRITE),
      "the write path must be a real BatchWrite, not the V1 fallback")
    assert(!caps.contains(TableCapability.V1_BATCH_WRITE))
    assert(caps.contains(TableCapability.OVERWRITE_DYNAMIC),
      "dynamic overwrite is only plannable against a native BatchWrite")
    // an EMPTY batch stages nothing and commits a clean no-op upsert
    val before = Scd1Merge.readTable(spark, path).count()
    Scd1Merge.readTable(spark, path).filter(lit(false))
      .write.format("graft").mode("append").save(path)
    assert(Scd1Merge.readTable(spark, path).count() == before)
    // no staging residue after the writes
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(path, "_graft_staging")) ||
      graft.merge.FsList.list(
        java.nio.file.Paths.get(path, "_graft_staging")).size.toLong == 0)
    // overwritePartitions on a FLAT table: loud at the write builder
    spark.conf.set("spark.sql.catalog.gcat", classOf[graft.sources.GraftCatalog].getName)
    GraftTables.register("dsv2_flatdynw", path)
    try {
      val e = intercept[Exception] {
        Seq((1L, "x", 0L)).toDF("k", "name", "region")
          .writeTo("gcat.default.dsv2_flatdynw").overwritePartitions()
      }
      assert(e.getMessage.toLowerCase.contains("partition"))
    } finally {
      GraftTables.unregister("dsv2_flatdynw")
      spark.conf.unset("spark.sql.catalog.gcat")
    }
  }

  test("DSv2 write: catalog INSERT INTO and writeTo().append() route to the upsert") {
    val path = mkTable("catwrite", 10)
    spark.conf.set("spark.sql.catalog.gcat", classOf[graft.sources.GraftCatalog].getName)
    GraftTables.register("dsv2_wcat", path)
    try {
      // SQL INSERT through the catalog (positional, resolver renames
      // to table columns before the write sees them)
      spark.sql("INSERT INTO gcat.default.dsv2_wcat VALUES (3L, 'sqlnew', 9L), (77L, 'ins', 1L)")
      val t = Scd1Merge.readTable(spark, path)
      assert(t.count() == 11)
      assert(t.filter($"k" === 3).select("name").as[String].head() == "sqlnew")
      // DataFrameWriterV2 append
      Seq((78L, "v2", 2L)).toDF("k", "name", "region")
        .writeTo("gcat.default.dsv2_wcat").append()
      assert(Scd1Merge.readTable(spark, path).count() == 12)
    } finally {
      GraftTables.unregister("dsv2_wcat")
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

  test("aggregate pushdown: bare COUNT/MIN/MAX answer from the manifest, zero scan") {
    val path = mkTable("agg", 40)
    Scd1Merge.lastStatsAgg = None
    val r = spark.read.format("graft").load(path)
      .agg(count(lit(1)).as("cnt"), min($"k").as("mn"), max($"k").as("mx"))
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), s"no agg pushdown:\n$plan")
    assert(Scd1Merge.lastStatsAgg.isDefined, "must answer from the manifest")
    val row = r.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == (40L, 0L, 39L))
  }

  test("aggregate pushdown bails conservatively: filter, string, grouping, avg, deletion vector") {
    val path = mkTable("aggbail", 40)
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      Scd1Merge.lastStatsAgg = None
      df.queryExecution.executedPlan.toString
    }
    // each face must DECLINE the metadata path yet still answer right
    val faces = Seq(
      spark.read.format("graft").load(path).filter($"region" === 2)
        .agg(count(lit(1)).as("v")) -> 8L,        // filter present
      spark.read.format("graft").load(path)
        .agg(count($"name").as("v")) -> 40L,      // COUNT(col), not COUNT(*)
      spark.read.format("graft").load(path).groupBy($"region")
        .agg(count(lit(1)).as("v")).agg(max("v").as("v")) -> 8L, // grouping
      spark.read.format("graft").load(path)
        .agg(sum($"k").as("v")) -> (0L until 40L).sum) // unsupported func
    faces.foreach { case (df, expect) =>
      val plan = planOf(df)
      assert(Scd1Merge.lastStatsAgg.isEmpty, s"should have bailed:\n$plan")
      assert(df.collect().head.getLong(0) == expect)
    }
    // string MIN/MAX: parquet footer bounds may be truncated — bail
    val smin = spark.read.format("graft").load(path).agg(min($"name").as("v"))
    planOf(smin)
    assert(Scd1Merge.lastStatsAgg.isEmpty, "string extremes must not trust footers")
    assert(smin.collect().head.getString(0) == "name_0")
    // a deletion vector makes counts/extremes stale — bail, stay right
    Scd1Merge.deleteSoft(spark, path, Seq("k"), $"k" >= 30)
    val dv = spark.read.format("graft").load(path)
      .agg(count(lit(1)).as("cnt"), max($"k").as("mx"))
    planOf(dv)
    assert(Scd1Merge.lastStatsAgg.isEmpty, "deletion vectors must bail")
    val r = dv.collect().head
    assert((r.getLong(0), r.getLong(1)) == (30L, 29L))
  }

  test("versionAsOf / timestampAsOf options time-travel the format read") {
    val path = graft.Tmp.dir("graft_dsv2_asof") + "/t"
    val v1 = (0 until 10).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Scd1Merge.upsert(spark, path, v1, Seq("k"), numBuckets = 2)
    Thread.sleep(15)
    val tBetween = System.currentTimeMillis()
    Thread.sleep(15)
    Scd1Merge.upsert(spark, path,
      Seq((3L, "NEW"), (100L, "added")).toDF("k", "v"), Seq("k"))
    // versionAsOf = absolute commit (the SQL VERSION AS OF coordinate)
    assertSameRows(
      spark.read.format("graft").option("versionAsOf", "1").load(path).orderBy("k"),
      v1.orderBy("k"))
    assertSameRows(
      spark.read.format("graft").option("versionAsOf", "2").load(path).orderBy("k"),
      Scd1Merge.readTable(spark, path).orderBy("k"))
    // timestampAsOf resolves the youngest commit at or before the stamp
    assertSameRows(
      spark.read.format("graft")
        .option("timestampAsOf", tBetween.toString).load(path).orderBy("k"),
      v1.orderBy("k"))
    intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", "1")
        .option("timestampAsOf", "0").load(path).collect()
    }
    intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", "99").load(path).collect()
    }
  }

  test("manifest stats reach the CBO: a small dim AUTO-broadcasts, no hint") {
    val dim = mkTable("cbo", 30)
    // the probe side is too big to broadcast itself (range stats =
    // 8 bytes x 5M >> 10MB threshold), so a BroadcastHashJoin can only
    // come from the DIM side's manifest-derived size estimate
    val big = spark.range(0, 5000000).selectExpr("id % 30 as k", "id as payload")
    val d = spark.read.format("graft").load(dim)
    val j = big.join(d, "k")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected an auto-broadcast from reported stats:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
    assert(j.count() == 5000000)
    // the estimate itself: exact rows, real bytes (the optimizer holds
    // the V1ScanWrapper — unwrap to the engine scan)
    val scan = j.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        (r.scan match {
          case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper => w.v1Scan
          case s => s
        }).asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
    }.get.estimateStatistics()
    assert(scan.numRows().getAsLong == 30L)
    assert(scan.sizeInBytes().getAsLong > 0)
  }

  test("aggregate pushdown covers date/timestamp/ntz/double extremes exactly") {
    val path = graft.Tmp.dir("graft_dsv2_aggty") + "/t"
    val df = (0 until 24).map { i =>
      (i.toLong, java.sql.Date.valueOf(f"2024-${i % 12 + 1}%02d-15"),
        java.time.LocalDateTime.of(2024, i % 12 + 1, 3, i % 24, 30),
        i * 1.5 - 3.0)
    }.toDF("k", "d", "ts", "x")
    Scd1Merge.upsert(spark, path, df, Seq("k"), numBuckets = 3,
      statsColumns = Seq("d", "ts", "x"))
    Scd1Merge.lastStatsAgg = None
    val r = spark.read.format("graft").load(path).agg(
      min($"d").as("dmin"), max($"d").as("dmax"),
      min($"ts").as("tmin"), max($"ts").as("tmax"),
      min($"x").as("xmin"), max($"x").as("xmax"))
    r.queryExecution.executedPlan
    assert(Scd1Merge.lastStatsAgg.isDefined, "typed extremes must answer from stats")
    val expect = Scd1Merge.readTable(spark, path).agg(
      min($"d").as("dmin"), max($"d").as("dmax"),
      min($"ts").as("tmin"), max($"ts").as("tmax"),
      min($"x").as("xmin"), max($"x").as("xmax"))
    assertSameRows(r, expect)
  }
}
