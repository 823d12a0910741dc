package graft

import graft.merge.Scd1Merge
import graft.pipeline.{IncrementalAgg, MvDef, MvMaintenance}
import graft.pipeline.IncrementalAgg.AggSpec
import graft.plans.GraftMvRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AUTO-MAINTAINED MVs (MvMaintenance): the write-through hook folds
  * the delta immediately after a base commit (no manual REFRESH), a
  * crash between commit and maintenance converges on the next touch,
  * chains refresh in dependency order, and refreshAllStale sweeps the
  * whole inventory. Plan-routing pins follow MvRewriteSpec's posture:
  * positives assert the optimized plan reads the MV's files. */
class MvMaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten

  private def readsOnly(df: DataFrame, dir: String): Boolean = {
    val ps = scanPaths(df)
    ps.nonEmpty && ps.forall(_.contains(dir + "/"))
  }

  /** base + registered MV with a persisted definition (the
    * engine-API creation path AUTO REFRESH rides on). */
  private def fixture(tag: String): (String, String, AggSpec) = {
    val root = Tmp.dir(s"mv_auto_$tag")
    val base = root + "/base"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, base,
      (1L to 100L).map(i => (i, s"g${i % 5}", i * 10)).toDF("id", "g", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 6)
    val spec = AggSpec(Seq("g"), Seq("cents" -> "sum_cents"), "n")
    IncrementalAgg.bootstrapFrom(spark, mv, base, spec, numBuckets = 1,
      retainVersions = 6)
    MvDef.write(mv, MvDef.Def(base, Seq("id"), spec, retain = 6))
    GraftMvRewrite.register(base, mv, spec)
    (base, mv, spec)
  }

  private def q(base: String): DataFrame =
    Scd1Merge.readTable(spark, base).groupBy($"g")
      .agg(sum($"cents").as("sc"))

  test("AUTO REFRESH: a base wave re-arms the rewrite with NO manual refresh") {
    val (base, mv, _) = fixture("wave")
    try {
      MvMaintenance.enableAuto(mv)
      assert(MvDef.read(mv).exists(_.auto), "auto flag must persist")
      assert(readsOnly(q(base), mv))
      // the wave: WITHOUT the hook this would route to the base until
      // someone ran REFRESH — with it, the commit's own thread folds
      // the delta right after its lock drops
      Scd1Merge.upsert(spark, base,
        Seq((900L, "g1", 7777L)).toDF("id", "g", "cents"), Seq("id"), retainVersions = 6)
      assert(readsOnly(q(base), mv),
        s"auto-maintained MV must serve IMMEDIATELY, read ${scanPaths(q(base))}")
      // and the served values include the new row
      val sc = q(base).filter($"g" === "g1").select("sc").as[Long].head()
      GraftMvRewrite.unregister(base)
      val expect = q(base).filter($"g" === "g1").select("sc").as[Long].head()
      assert(sc == expect && sc > 7777L)
    } finally { MvMaintenance.reset(); GraftMvRewrite.unregister(base) }
  }

  test("crash window: a commit whose maintenance never ran converges on the NEXT touch (and via the sweep)") {
    val (base, mv, _) = fixture("crash")
    try {
      MvMaintenance.enableAuto(mv)
      // simulate the crash: the base commit lands, the process dies
      // before the hook runs (here: hook disarmed for one wave)
      Scd1Merge.onCommitHook = _ => ()
      Scd1Merge.upsert(spark, base,
        Seq((901L, "g2", 1000L)).toDF("id", "g", "cents"), Seq("id"), retainVersions = 6)
      assert(readsOnly(q(base), base),
        "stale-but-sound: the missed wave must route to the base")
      // next touch: a later commit's hook folds the ENTIRE lag
      MvMaintenance.armHooks()
      Scd1Merge.upsert(spark, base,
        Seq((902L, "g2", 2000L)).toDF("id", "g", "cents"), Seq("id"), retainVersions = 6)
      assert(readsOnly(q(base), mv), "the next touch must converge")
      val sc = q(base).filter($"g" === "g2").select("sc").as[Long].head()
      GraftMvRewrite.unregister(base)
      assert(sc == q(base).filter($"g" === "g2").select("sc").as[Long].head())
      GraftMvRewrite.register(base, mv,
        MvDef.read(mv).get.spec)
      // and the SWEEP alone also converges a missed wave
      Scd1Merge.onCommitHook = _ => ()
      Scd1Merge.upsert(spark, base,
        Seq((903L, "g3", 3000L)).toDF("id", "g", "cents"), Seq("id"), retainVersions = 6)
      assert(readsOnly(q(base), base))
      val swept = MvMaintenance.refreshAllStale(spark)
      assert(swept.exists(_._1 == mv), s"sweep must refresh $mv: $swept")
      assert(readsOnly(q(base), mv))
    } finally { MvMaintenance.reset(); GraftMvRewrite.unregister(base) }
  }

  test("CHAIN: one base wave auto-refreshes parent then child, in dependency order") {
    val root = Tmp.dir("mv_auto_chain")
    val base = root + "/base"; val mv1 = root + "/mv1"; val mv2 = root + "/mv2"
    Scd1Merge.upsert(spark, base,
      (1L to 100L).map(i => (i, s"g${i % 10}", s"r${i % 2}", i * 10))
        .toDF("id", "g", "region", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 8)
    // mv1: by (g, region); mv2: by region OVER mv1 (the pipe30 chain
    // shape — mv1's keys are its group columns)
    val spec1 = AggSpec(Seq("g", "region"), Seq("cents" -> "sum_cents"), "n1")
    IncrementalAgg.bootstrapFrom(spark, mv1, base, spec1, numBuckets = 1,
      retainVersions = 8)
    MvDef.write(mv1, MvDef.Def(base, Seq("id"), spec1, retain = 8))
    val spec2 = AggSpec(Seq("region"), Seq("sum_cents" -> "sum_cents2"), "n2")
    IncrementalAgg.bootstrapFrom(spark, mv2, mv1, spec2, numBuckets = 1,
      retainVersions = 8)
    MvDef.write(mv2, MvDef.Def(mv1, Seq("g", "region"), spec2, retain = 8))
    try {
      MvMaintenance.enableAuto(mv1)
      MvMaintenance.enableAuto(mv2)
      // ONE base wave: the hook refreshes mv1; mv1's own commit fires
      // the hook again, refreshing mv2 — dependency order for free
      Scd1Merge.upsert(spark, base,
        Seq((901L, "g1", "r1", 5000L)).toDF("id", "g", "region", "cents"),
        Seq("id"), retainVersions = 8)
      val c1 = Scd1Merge.tableCommit(base).get
      assert(Scd1Merge.tableBatchId(mv1)
        .contains(f"base-commit-$c1%09d"), "mv1 must be fresh")
      val c2 = Scd1Merge.tableCommit(mv1).get
      assert(Scd1Merge.tableBatchId(mv2)
        .contains(f"base-commit-$c2%09d"), "mv2 must be fresh w.r.t. mv1")
      // values converge end to end
      val got = Scd1Merge.readTable(spark, mv2)
        .filter($"region" === "r1").select("sum_cents2").as[Long].head()
      val expect = Scd1Merge.readTable(spark, base)
        .filter($"region" === "r1").agg(sum($"cents")).as[Long].head()
      assert(got == expect, s"$got vs $expect")
    } finally MvMaintenance.reset()
  }

  test("the sweep covers every maintained family: a stale top-N MV and a stale ANN index fold their lag too") {
    import graft.pipeline.TopNMv
    import graft.pipeline.TopNMv.TopNSpec
    import graft.plans.{GraftAnnRewrite, GraftTopNRewrite}
    val root = Tmp.dir("mv_sweep_all")
    // top-N MV over a flat base
    val base = root + "/base"; val topMv = root + "/topmv"
    Scd1Merge.upsert(spark, base,
      (1L to 100L).map(i => (i, s"g${i % 4}", i * 10)).toDF("id", "g", "cents"),
      Seq("id"), numBuckets = 1, retainVersions = 6)
    TopNMv.createMv(spark, topMv, base,
      TopNSpec(Seq("g"), "cents", desc = true, n = 2,
        cols = Seq("id", "g", "cents")), numBuckets = 1, retain = 6)
    // ANN-registered corpus
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 2,
      retainVersions = 6)
    graft.similarity.Similarity.ivfPqIndexBuild(spark, idx,
      Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iters = 1, dim = 64)
    GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
      dim = 64)
    try {
      // stale BOTH: a base wave behind the top-N MV, a corpus ingest
      // behind the index
      Scd1Merge.upsert(spark, base,
        Seq((900L, "g0", 99999L)).toDF("id", "g", "cents"), Seq("id"),
        retainVersions = 6)
      Scd1Merge.upsert(spark, corpusT,
        emb.filter($"vec_id" < 4).withColumn("vec_id", $"vec_id" + 10000000L),
        Seq("vec_id"), retainVersions = 6)
      val swept = MvMaintenance.refreshAllStale(spark)
      assert(swept.exists(_._1 == topMv),
        s"the sweep must fold the top-N MV's lag: $swept")
      assert(swept.exists(e => e._1 == corpusT && e._2 == 4L),
        s"the sweep must fold the ANN index's 4-row feed: $swept")
      // both artifacts serve again
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"cents".desc, $"id".asc)
      val topQ = Scd1Merge.readTable(spark, base)
        .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      assert(readsOnly(topQ, topMv), "swept top-N MV must serve")
      val qv = emb.filter($"vec_id" === 3)
        .select($"embedding").head().getSeq[Float](0)
      val annQ = Scd1Merge.readTable(spark, corpusT)
        .select($"vec_id",
          graft.functions.VectorFunctions.vecCosine($"embedding",
            typedLit(qv)).as("s"))
        .orderBy($"s".desc).limit(5)
      assert(scanPaths(annQ).exists(_.contains(idx + "/codes/")),
        "swept ANN index must serve")
      // a second sweep is a no-op
      assert(MvMaintenance.refreshAllStale(spark).isEmpty)
    } finally {
      GraftTopNRewrite.clear(); GraftAnnRewrite.unregister(corpusT)
      MvMaintenance.reset()
    }
  }

  test("CROSS-SESSION sweep: a FRESH session's refreshAllStale folds a stale top-N MV and ANN index it never queried (durable catalog inventory)") {
    import graft.pipeline.TopNMv
    import graft.pipeline.TopNMv.TopNSpec
    import graft.plans.{GraftAnnRewrite, GraftTopNRewrite}
    val root = Tmp.dir("mv_sweep_xsession")
    graft.sql.GraftCatalog.setRoot(root + "/cat")
    val base = root + "/base"; val topMv = root + "/topmv"
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    try {
      Scd1Merge.upsert(spark, base,
        (1L to 100L).map(i => (i, s"g${i % 4}", i * 10)).toDF("id", "g", "cents"),
        Seq("id"), numBuckets = 1, retainVersions = 6)
      TopNMv.createMv(spark, topMv, base,
        TopNSpec(Seq("g"), "cents", desc = true, n = 2,
          cols = Seq("id", "g", "cents")), numBuckets = 1, retain = 6)
      val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .limit(400)
      Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 2,
        retainVersions = 6)
      graft.similarity.Similarity.ivfPqIndexBuild(spark, idx,
        Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16, iters = 1, dim = 64)
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64)
      // both go stale, then the "session" restarts: registries wiped,
      // only the persisted catalog + sidecar definitions remain
      Scd1Merge.upsert(spark, base,
        Seq((900L, "g0", 99999L)).toDF("id", "g", "cents"), Seq("id"),
        retainVersions = 6)
      Scd1Merge.upsert(spark, corpusT,
        emb.filter($"vec_id" < 4).withColumn("vec_id", $"vec_id" + 10000000L),
        Seq("vec_id"), retainVersions = 6)
      GraftTopNRewrite.clear(); GraftAnnRewrite.clear()
      assert(GraftTopNRewrite.registeredMvPaths.isEmpty)
      // ONE statement turns the whole inventory fresh — no prior
      // query, no by-path refresh
      val swept = MvMaintenance.refreshAllStale(spark)
      assert(swept.exists(_._1 == topMv),
        s"the fresh session's sweep must find the cataloged top-N MV: $swept")
      assert(swept.exists(e => e._1 == corpusT && e._2 == 4L),
        s"the fresh session's sweep must arm + fold the cataloged ANN base: $swept")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"cents".desc, $"id".asc)
      val topQ = Scd1Merge.readTable(spark, base)
        .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      assert(readsOnly(topQ, topMv), "swept top-N MV must serve")
      assert(MvMaintenance.refreshAllStale(spark).isEmpty, "quiescent")
    } finally {
      GraftTopNRewrite.clear(); GraftAnnRewrite.unregister(corpusT)
      graft.sql.GraftCatalog.removeTopNMvsTouching(topMv)
      graft.sql.GraftCatalog.clearRoot()
      MvMaintenance.reset()
    }
  }

  test("WRITE-THROUGH top-N and ANN: an AUTO top-N MV serves immediately after a wave; an autoMaintain ANN index folds on corpus commit") {
    import graft.pipeline.TopNMv
    import graft.pipeline.TopNMv.TopNSpec
    import graft.plans.{GraftAnnRewrite, GraftTopNRewrite}
    val root = Tmp.dir("mv_auto_topn_ann")
    val base = root + "/base"; val topMv = root + "/topmv"
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    try {
      // SQL AUTO REFRESH on a top-N MV
      Scd1Merge.upsert(spark, base,
        (1L to 100L).map(i => (i, s"g${i % 4}", i * 10)).toDF("id", "g", "cents"),
        Seq("id"), numBuckets = 1, retainVersions = 6)
      graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT MATERIALIZED VIEW graft.`$topMv` BUCKETS 1 RETAIN 6
           |AUTO REFRESH AS
           |SELECT id, g, cents FROM (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY g ORDER BY cents DESC, id ASC) AS rn
           |  FROM graft.`$base`) WHERE rn <= 2""".stripMargin)
      assert(TopNMv.readAuto(topMv), "the auto flag must persist")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"cents".desc, $"id".asc)
      def topQ = Scd1Merge.readTable(spark, base)
        .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      assert(readsOnly(topQ, topMv))
      // the wave: WITHOUT the hook this would route to the base
      Scd1Merge.upsert(spark, base,
        Seq((900L, "g0", 99999L)).toDF("id", "g", "cents"), Seq("id"),
        retainVersions = 6)
      assert(readsOnly(topQ, topMv),
        "an AUTO top-N MV must serve immediately after the wave")
      // autoMaintain ANN: a corpus commit folds the feed in-line
      val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .limit(300)
      Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 1,
        retainVersions = 6)
      graft.similarity.Similarity.ivfPqIndexBuild(spark, idx,
        Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16, iters = 1, dim = 64)
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, autoMaintain = true)
      val qv = emb.filter($"vec_id" === 3)
        .select($"embedding").head().getSeq[Float](0)
      def annQ = Scd1Merge.readTable(spark, corpusT)
        .select($"vec_id",
          graft.functions.VectorFunctions.vecCosine($"embedding",
            typedLit(qv)).as("s"))
        .orderBy($"s".desc).limit(5)
      assert(scanPaths(annQ).exists(_.contains(idx + "/codes/")))
      Scd1Merge.upsert(spark, corpusT,
        emb.filter($"vec_id" < 3).withColumn("vec_id", $"vec_id" + 777777L),
        Seq("vec_id"), retainVersions = 6)
      assert(scanPaths(annQ).exists(_.contains(idx + "/codes/")),
        "an autoMaintain ANN index must serve immediately after the " +
        "corpus commit (the hook folded the feed in-line)")
    } finally {
      GraftTopNRewrite.clear(); GraftAnnRewrite.unregister(corpusT)
      MvMaintenance.reset()
    }
  }

  test("sweep resilience: a dangling cataloged MV (base dropped) is skipped and logged — the healthy inventory still converges") {
    val root = Tmp.dir("mv_sweep_dangling")
    graft.sql.GraftCatalog.setRoot(root + "/cat")
    try {
      val (base, mv, _) = fixture("resilient")
      graft.sql.GraftCatalog.putMv(mv, base)
      // the dangling entry: an MV whose definition exists but whose
      // base is GONE (isStale marks want.isEmpty as stale; refreshMv
      // would throw 'has no manifest')
      val deadBase = root + "/deadbase"; val deadMv = root + "/deadmv"
      Scd1Merge.upsert(spark, deadBase,
        Seq((1L, "g0", 5L)).toDF("id", "g", "cents"), Seq("id"),
        retainVersions = 6)
      val spec = IncrementalAgg.AggSpec(Seq("g"),
        Seq("cents" -> "sum_cents"), "n")
      IncrementalAgg.bootstrapFrom(spark, deadMv, deadBase, spec,
        numBuckets = 1, retainVersions = 6)
      MvDef.write(deadMv, MvDef.Def(deadBase, Seq("id"), spec, retain = 6))
      graft.sql.GraftCatalog.putMv(deadMv, deadBase)
      Scd1Merge.deleteRecursively(java.nio.file.Paths.get(deadBase))
      // a healthy MV goes stale behind the dangler (alphabetical
      // order puts deadmv before mv only sometimes — either way the
      // sweep must reach the healthy one)
      Scd1Merge.upsert(spark, base,
        Seq((900L, "g0", 7L)).toDF("id", "g", "cents"), Seq("id"),
        retainVersions = 6)
      val swept = MvMaintenance.refreshAllStale(spark)
      assert(swept.exists(_._1 == mv),
        s"the healthy MV must refresh despite the dangling one: $swept")
      assert(!swept.exists(_._1 == deadMv), "the dangler is skipped")
      assert(readsOnly(q(base), mv), "healthy MV serves after the sweep")
    } finally {
      graft.sql.GraftCatalog.clearRoot()
      GraftMvRewrite.clear()
      MvMaintenance.reset()
    }
  }

  test("hook cost: N commits to a base with NO dependent MVs parse zero definition sidecars (stat-validated caches)") {
    import graft.pipeline.TopNMv
    import graft.pipeline.TopNMv.TopNSpec
    val root = Tmp.dir("mv_hook_cost")
    try {
      // the inventory the hook walks: one auto agg MV + one auto
      // top-N MV over baseA — and an UNRELATED baseB the commits hit
      val (baseA, mv, _) = fixture("hookcost")
      MvMaintenance.enableAuto(mv)
      val topMv = root + "/topmv"
      Scd1Merge.upsert(spark, baseA + "2",
        (1L to 50L).map(i => (i, s"g${i % 4}", i * 10)).toDF("id", "g", "cents"),
        Seq("id"), numBuckets = 1, retainVersions = 6)
      TopNMv.createMv(spark, topMv, baseA + "2",
        TopNSpec(Seq("g"), "cents", desc = true, n = 2,
          cols = Seq("id", "g", "cents")), numBuckets = 1, retain = 6,
        auto = true)
      val baseB = root + "/plain"
      Scd1Merge.upsert(spark, baseB,
        Seq((1L, 10L)).toDF("id", "v"), Seq("id"), retainVersions = 6)
      // prime: the first hooked commit may parse each definition once
      Scd1Merge.upsert(spark, baseB,
        Seq((2L, 20L)).toDF("id", "v"), Seq("id"), retainVersions = 6)
      val p0 = MvDef.parseCount; val t0 = TopNMv.parseCount
      (3L to 7L).foreach { i =>
        Scd1Merge.upsert(spark, baseB,
          Seq((i, i * 10)).toDF("id", "v"), Seq("id"), retainVersions = 6)
      }
      assert(MvDef.parseCount == p0,
        s"agg-MV sidecars must not re-parse per commit (${MvDef.parseCount - p0} parses)")
      assert(TopNMv.parseCount == t0,
        s"top-N sidecars must not re-parse per commit (${TopNMv.parseCount - t0} parses)")
    } finally {
      graft.plans.GraftTopNRewrite.clear()
      GraftMvRewrite.clear()
      MvMaintenance.reset()
    }
  }

  test("hook + sweep isolation: a CORRUPT _graft_topn sidecar is skipped loudly — the healthy MVs and the ANN leg still maintain") {
    import graft.pipeline.TopNMv
    val root = Tmp.dir("mv_corrupt_topn")
    graft.sql.GraftCatalog.setRoot(root + "/cat")
    try {
      val (base, mv, _) = fixture("corrupt")
      MvMaintenance.enableAuto(mv)
      // the corrupt artifact: a cataloged top-N MV whose sidecar is
      // garbage — before isolation, its probe threw OUT of the hook
      // (silently skipping the remaining families for that commit)
      // and failed the whole REFRESH ALL statement
      val badMv = root + "/badtopn"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(badMv))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(badMv, "_graft_topn"), "not-a-definition")
      graft.sql.GraftCatalog.putTopNMv(badMv, base)
      // a HEALTHY auto top-N MV that walks AFTER the corrupt one
      // ("badtopn" < "ztopn" in the catalog's sorted inventory, and
      // the session registry is wiped below so the catalog order is
      // the walk order) — the victim the pre-fix skip silently starved
      val goodTop = root + "/ztopn"
      TopNMv.createMv(spark, goodTop, base,
        TopNMv.TopNSpec(Seq("g"), "cents", desc = true, n = 2,
          cols = Seq("id", "g", "cents")), numBuckets = 1, retain = 6,
        auto = true)
      graft.plans.GraftTopNRewrite.clear() // catalog-only inventory
      // the hook: commit to the base — both the agg MV and the
      // healthy top-N MV must refresh despite the corrupt sidecar
      // earlier in the walk
      Scd1Merge.upsert(spark, base,
        Seq((900L, "g1", 4242L)).toDF("id", "g", "cents"), Seq("id"),
        retainVersions = 6)
      assert(readsOnly(q(base), mv),
        "the healthy auto MV must refresh despite the corrupt top-N sidecar")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"cents".desc, $"id".asc)
      def topQ = Scd1Merge.readTable(spark, base)
        .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      assert(readsOnly(topQ, goodTop),
        "the healthy auto top-N MV AFTER the corrupt one must refresh too")
      // the sweep: stale healthy MVs + corrupt sidecar → converges
      Scd1Merge.onCommitHook = _ => ()
      Scd1Merge.upsert(spark, base,
        Seq((901L, "g1", 1L)).toDF("id", "g", "cents"), Seq("id"),
        retainVersions = 6)
      val swept = MvMaintenance.refreshAllStale(spark)
      assert(swept.exists(_._1 == mv),
        s"REFRESH ALL must survive the corrupt sidecar and fold the healthy MV: $swept")
      assert(swept.exists(_._1 == goodTop),
        s"REFRESH ALL must reach the healthy top-N MV after the corrupt one: $swept")
      // and a corrupt _graft_ann marker neither throws nor arms
      val badBase = root + "/badann"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(badBase))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(badBase, "_graft_ann"), "garbage")
      assert(!graft.plans.GraftAnnRewrite.armPath(spark, badBase))
    } finally {
      graft.sql.GraftCatalog.clearRoot()
      graft.plans.GraftTopNRewrite.clear()
      GraftMvRewrite.clear()
      MvMaintenance.reset()
    }
  }

  test("FRESH-SESSION write-through ANN: a persisted auto=true marker maintains on the first corpus commit — no query, no sweep") {
    import graft.plans.GraftAnnRewrite
    val root = Tmp.dir("mv_ann_fresh_auto")
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    try {
      val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .limit(300)
      Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 1,
        retainVersions = 6)
      graft.similarity.Similarity.ivfPqIndexBuild(spark, idx,
        Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16, iters = 1, dim = 64)
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, autoMaintain = true)
      // the "restart": session ANN registry wiped; only the marker
      // (auto=true) persists. Hooks re-arm (any session using
      // maintenance does), but the ANN registry is EMPTY — before the
      // fix, the hook's isAuto probe saw nothing and silently skipped
      // the write-through until a query happened to arm it.
      GraftAnnRewrite.clear()
      MvMaintenance.armHooks()
      assert(GraftAnnRewrite.coveredCommit(corpusT).isEmpty, "unarmed")
      Scd1Merge.upsert(spark, corpusT,
        emb.filter($"vec_id" < 3).withColumn("vec_id", $"vec_id" + 555555L),
        Seq("vec_id"), retainVersions = 6)
      val live = Scd1Merge.tableCommit(corpusT).get
      assert(GraftAnnRewrite.coveredCommit(corpusT).contains(live),
        "the persisted auto marker must take effect in a fresh session: " +
        s"covered ${GraftAnnRewrite.coveredCommit(corpusT)} vs live $live")
    } finally {
      graft.plans.GraftAnnRewrite.unregister(corpusT)
      MvMaintenance.reset()
    }
  }

  test("STREAMING ingest keeps an autoMaintain vector index fresh: each micro-batch's post-commit hook folds the feed in-line") {
    import graft.plans.GraftAnnRewrite
    import org.apache.spark.sql.streaming.Trigger
    val root = Tmp.dir("mv_ann_stream")
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    try {
      val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .limit(300)
      Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 1,
        retainVersions = 8)
      graft.similarity.Similarity.ivfPqIndexBuild(spark, idx,
        Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16, iters = 1, dim = 64)
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, autoMaintain = true)
      // the stream: two micro-batches of new vectors land through
      // writeStream.format("graft") — each addBatch commit fires the
      // post-commit drain on the STREAMING thread, which folds the
      // change feed into the codes and re-stamps the registration
      val srcDir = Tmp.dir("mv_ann_stream_src")
      val b1 = emb.filter($"vec_id" < 3)
        .withColumn("vec_id", $"vec_id" + 800000L)
      val b2 = emb.filter($"vec_id" >= 3 && $"vec_id" < 6)
        .withColumn("vec_id", $"vec_id" + 900000L)
      b1.coalesce(1).write.mode("append").parquet(srcDir)
      Thread.sleep(1100) // deterministic file (and so trigger) order
      b2.coalesce(1).write.mode("append").parquet(srcDir)
      val q = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream.format("graft")
        .option("keys", "vec_id")
        .option("checkpointLocation", Tmp.dir("mv_ann_stream_ckpt"))
        .trigger(Trigger.AvailableNow())
        .start(corpusT)
      q.awaitTermination()
      assert(Scd1Merge.readTable(spark, corpusT).count() == 306)
      // NO manual refresh anywhere: the index covers the live commit
      // and the rewrite serves, with a streamed-in vector findable
      val live = Scd1Merge.tableCommit(corpusT).get
      assert(GraftAnnRewrite.coveredCommit(corpusT).contains(live),
        s"the hook must have folded every micro-batch: " +
        s"covered ${GraftAnnRewrite.coveredCommit(corpusT)} vs live $live")
      val qv = emb.filter($"vec_id" === 4)
        .select($"embedding").head().getSeq[Float](0)
      val annQ = Scd1Merge.readTable(spark, corpusT)
        .select($"vec_id",
          graft.functions.VectorFunctions.vecCosine($"embedding",
            typedLit(qv)).as("s"))
        .orderBy($"s".desc).limit(3)
      assert(scanPaths(annQ).exists(_.contains(idx + "/codes/")),
        "the streamed-into corpus must serve from the index")
      assert(annQ.collect().map(_.getLong(0)).contains(900004L),
        "the streamed twin must be findable through the index")
    } finally {
      graft.plans.GraftAnnRewrite.unregister(corpusT)
      MvMaintenance.reset()
    }
  }

  test("AUTO DRIFT-TRIGGERED RETRAIN: a hooked drifted ingest triggers the scoped repair in-line — no REFRESH anywhere; in-distribution commits pay the probe, never a retrain") {
    import graft.plans.GraftAnnRewrite
    import graft.similarity.Similarity
    val root = Tmp.dir("mv_ann_autodrift")
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    try {
      val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      val corpus0 = emb.filter(pmod($"vec_id", lit(4)) =!= 3)
      Scd1Merge.upsert(spark, corpusT, corpus0, Seq("vec_id"),
        numBuckets = 1, retainVersions = 8)
      Similarity.ivfPqIndexBuild(spark, idx,
        Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
        nlist = 16, m = 16, ksub = 16, iters = 2, dim = 64)
      // PER-INDEX factor (the CREATE statement's OPTIONS
      // (driftfactor=…) shape) — no session conf anywhere in this
      // test; the factor persists in the marker block
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16, autoMaintain = true,
        driftFactor = Some(2.0))
      assert(GraftAnnRewrite.driftFactorOf(corpusT, "embedding")
        .contains(2.0))
      val rep0 = GraftAnnRewrite.autoDriftRepairs
      val modelCommit0 = Scd1Merge.tableCommit(idx + "/centroids").get
      // IN-DISTRIBUTION hooked commit: the fold runs, the O(batch)
      // probe runs, the model is untouched
      Scd1Merge.upsert(spark, corpusT,
        emb.filter($"vec_id" === 0).withColumn("vec_id", lit(700001L)),
        Seq("vec_id"), retainVersions = 8)
      assert(GraftAnnRewrite.coveredCommit(corpusT)
        .contains(Scd1Merge.tableCommit(corpusT).get), "hook folded")
      assert(GraftAnnRewrite.autoDriftRepairs == rep0,
        s"an in-distribution window must not retrain: probe " +
        s"${GraftAnnRewrite.lastAutoDriftProbe}")
      assert(Scd1Merge.tableCommit(idx + "/centroids").get == modelCommit0,
        "the model must be untouched by a non-drifted commit")
      // the DRIFTED ingest (the sim_index_drift shift: compress +
      // offset, ~7× the baseline mean residual) lands in a "FRESH
      // SESSION" — registry wiped, only the marker (auto=true +
      // driftfactor=2.0) persists, so the hook must re-arm the
      // factor from disk; it folds the window, the probe trips, and
      // the SCOPED repair runs in-line — no REFRESH statement exists
      // anywhere in this test
      GraftAnnRewrite.clear()
      MvMaintenance.armHooks()
      val shifted = emb.filter(pmod($"vec_id", lit(4)) === 3)
        .withColumn("embedding",
          transform($"embedding", x => x * lit(0.1f) + lit(3.0f))
            .cast("array<float>"))
      Scd1Merge.upsert(spark, corpusT, shifted, Seq("vec_id"),
        retainVersions = 8)
      assert(GraftAnnRewrite.autoDriftRepairs == rep0 + 1,
        s"the drifted window must trigger a repair: probe " +
        s"${GraftAnnRewrite.lastAutoDriftProbe}, " +
        s"scoped ${Similarity.lastScopedStats}")
      assert(Similarity.lastScopedStats._1 != "none",
        s"the repair must have acted: ${Similarity.lastScopedStats}")
      // the registration still covers the live commit (the repair
      // touches index tables, never the base stamp) and recall for
      // shifted queries recovered without any manual refresh
      assert(GraftAnnRewrite.coveredCommit(corpusT)
        .contains(Scd1Merge.tableCommit(corpusT).get))
      val full = Scd1Merge.readTable(spark, corpusT)
      val q = shifted.filter($"vec_id" < 200)
      val exact = Similarity.topK(full, q, "vec_id", "embedding", 5)
        .select($"query_id", $"vec_id")
      val nExact = exact.count()
      val hits = Similarity.ivfPqTopKIndexed(spark, idx, full, q,
          "vec_id", "embedding", 5, nprobe = 4, dim = 64, candFactor = 16)
        .select($"query_id", $"vec_id").intersect(exact).count()
      info(f"auto-repaired recall@5 for shifted queries = ${
        hits.toDouble / nExact}%.2f")
      assert(hits.toDouble / nExact >= 0.7,
        s"recall must have recovered through the auto repair: " +
        s"$hits/$nExact")
    } finally {
      graft.plans.GraftAnnRewrite.unregister(corpusT)
      MvMaintenance.reset()
    }
  }

  test("SQL lifecycle: CREATE ... AUTO REFRESH serves across a wave; REFRESH ALL MATERIALIZED VIEWS sweeps") {
    val root = Tmp.dir("mv_auto_sql")
    val base = root + "/base"; val mv = root + "/mv"
    Scd1Merge.upsert(spark, base,
      (1L to 100L).map(i => (i, s"g${i % 5}", i * 10)).toDF("id", "g", "cents"),
      Seq("id"), numBuckets = 2, retainVersions = 6)
    try {
      graft.sql.GraftSql.sql(spark,
        s"CREATE GRAFT MATERIALIZED VIEW graft.`$mv` BUCKETS 1 AUTO REFRESH " +
        s"AS SELECT g, sum(cents) AS sum_cents, count(*) AS n " +
        s"FROM graft.`$base` GROUP BY g")
      assert(MvDef.read(mv).exists(_.auto), "SQL AUTO REFRESH must persist")
      Scd1Merge.upsert(spark, base,
        Seq((900L, "g0", 9999L)).toDF("id", "g", "cents"), Seq("id"), retainVersions = 6)
      assert(readsOnly(q(base), mv),
        "SQL-created AUTO MV must serve immediately after the wave")
      // sweep statement: disarm, miss a wave, REFRESH ALL converges
      Scd1Merge.onCommitHook = _ => ()
      Scd1Merge.upsert(spark, base,
        Seq((901L, "g0", 1L)).toDF("id", "g", "cents"), Seq("id"), retainVersions = 6)
      assert(readsOnly(q(base), base))
      val rows = graft.sql.GraftSql.sql(spark,
        "REFRESH ALL MATERIALIZED VIEWS").collect()
      assert(rows.exists(_.getString(0) == mv), rows.mkString(","))
      assert(readsOnly(q(base), mv))
    } finally {
      MvMaintenance.reset()
      GraftMvRewrite.unregister(base)
      graft.sql.GraftCatalog.removeMv(mv)
    }
  }
}
