package graft

import graft.merge.Scd1Merge
import graft.plans.GraftAnnRewrite
import graft.similarity.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The transparent ANN top-k rewrite (GraftAnnRewrite): routing
  * positives AND the conservative negatives — every gate failure must
  * fall through to the exact scan, never mis-serve. Mirrors
  * MvRewriteSpec's posture: positives assert the PLAN reads the index
  * codes, negatives assert it does not. */
class AnnRewriteSpec extends SparkSpecBase {

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten

  private def servedBy(df: DataFrame, idx: String): Boolean =
    scanPaths(df).exists(_.contains(idx + "/codes/"))

  private val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  private def freshCorpus(name: String): (String, String) = {
    val root = Tmp.dir(name)
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 4,
      retainVersions = 4, batchId = "c1")
    Similarity.ivfPqIndexBuild(spark, idx,
      Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iters = 2, dim = 64, batchId = "b1")
    (corpusT, idx)
  }

  private val qv = emb.filter(col("vec_id") === 3)
    .select(col("embedding")).head().getSeq[Float](0)

  private def topk(corpusT: String, k: Int = 10): DataFrame =
    Scd1Merge.readTable(spark, corpusT)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.vecCosine(col("embedding"),
          typedLit(qv)).as("s"))
      .orderBy(col("s").desc).limit(k)

  test("registered fresh corpus serves from the index; values are the exact cosines over candidates") {
    val (corpusT, idx) = freshCorpus("annrw_pos")
    try {
      val exact = topk(corpusT).collect().map(r => (r.getLong(0), r.getDouble(1)))
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16)
      val n0 = GraftAnnRewrite.rewriteCount
      val served = topk(corpusT)
      assert(servedBy(served, idx), "plan must read the index codes")
      assert(GraftAnnRewrite.rewriteCount > n0)
      val rows = served.collect().map(r => (r.getLong(0), r.getDouble(1)))
      // the served scores are EXACT cosines (the semi-join only
      // narrows rows): every served pair present in the exact top-k
      // must carry the identical double
      val exactMap = exact.toMap
      rows.foreach { case (id, s) =>
        exactMap.get(id).foreach(es => assert(es == s,
          s"served score for $id must be the exact cosine: $s vs $es"))
      }
      // high overlap at these parameters (full-fidelity candidates)
      val recall = rows.map(_._1).toSet
        .intersect(exact.map(_._1).toSet).size / 10.0
      info(f"transparent-rewrite recall@10 = $recall%.2f")
      assert(recall >= 0.7, s"recall $recall collapsed")
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("conservative fall-throughs: vector-column filter, nondeterministic filter, ascending sort, wrong literal, unregistered") {
    val (corpusT, idx) = freshCorpus("annrw_neg")
    try {
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16)
      // a predicate READING the vector column could admit rows by
      // vector content the probe never saw: no rewrite
      val vecFiltered = Scd1Merge.readTable(spark, corpusT)
        .filter(element_at(col("embedding"), 1) > -10f)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("s"))
        .orderBy(col("s").desc).limit(10)
      assert(!servedBy(vecFiltered, idx),
        "vector-column filter must not rewrite")
      // nondeterministic predicates fall through conservatively
      val randFiltered = Scd1Merge.readTable(spark, corpusT)
        .filter(rand(7) < 0.9)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("s"))
        .orderBy(col("s").desc).limit(10)
      assert(!servedBy(randFiltered, idx),
        "nondeterministic filter must not rewrite")
      // ascending (bottom-k) is not a similarity probe
      val asc = Scd1Merge.readTable(spark, corpusT)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("s"))
        .orderBy(col("s").asc).limit(10)
      assert(!servedBy(asc, idx), "ascending sort must not rewrite")
      // wrong-dimension literal
      val wrongDim = Scd1Merge.readTable(spark, corpusT)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(Seq(1.0f, 2.0f))).as("s"))
        .orderBy(col("s").desc).limit(10)
      assert(!servedBy(wrongDim, idx), "dim-mismatched literal must not rewrite")
      GraftAnnRewrite.unregister(corpusT)
      assert(!servedBy(topk(corpusT), idx), "unregistered must not rewrite")
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("PAYLOAD PUSHDOWN: a declared filter column prunes candidates inside the probe — zero escalations, exact scores; undeclared columns use the generic path; maintenance carries payloads") {
    val root = Tmp.dir("annrw_payload")
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 4,
      retainVersions = 4, batchId = "c1")
    Similarity.ivfPqIndexBuild(spark, idx,
      Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iters = 2, dim = 64, batchId = "b1",
      payloadCols = Seq("label"))
    try {
      // the EXACT baseline, computed before registration arms anything
      val exact = filteredTopk(corpusT, col("label") === 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16,
        payloadCols = Seq("label"))
      val pd0 = GraftAnnRewrite.lastPayloadPushdowns
      val served = filteredTopk(corpusT, col("label") === 3)
      assert(servedBy(served, idx), "payload-covered filter must serve")
      assert(GraftAnnRewrite.lastPayloadPushdowns == pd0 + 1,
        "the pushdown path must have served it")
      assert(GraftAnnRewrite.lastFilteredEscalations == 0,
        "a selective declared predicate must serve with ZERO escalations")
      val rows = served.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.length == 10, "pushdown must still fill k")
      val exactMap = exact.toMap
      rows.foreach { case (id, sc) =>
        exactMap.get(id).foreach(es => assert(es == sc, "scores exact")) }
      val recall = rows.map(_._1).toSet
        .intersect(exact.map(_._1).toSet).size / 10.0
      info(f"payload-pushdown recall@10 = $recall%.2f")
      assert(recall >= 0.6, s"pushdown recall $recall collapsed")
      // an UNDECLARED column's predicate still serves via the generic
      // survivor-count path (no pushdown counted)
      val pd1 = GraftAnnRewrite.lastPayloadPushdowns
      assert(servedBy(filteredTopk(corpusT, col("vec_id") % 7 === 0), idx))
      assert(GraftAnnRewrite.lastPayloadPushdowns == pd1,
        "undeclared columns must not claim the pushdown path")
      // fewer than k matches in the whole corpus: exhaustive probing
      // serves the complete SHORT answer — exactly the exact plan's
      val rare = col("label") === 3 && col("vec_id") < 30
      // rare is label-and-vec_id: vec_id undeclared → generic path;
      // an all-declared rare predicate goes through pushdown:
      val rareLabel = col("label") === 99999
      val servedRare = filteredTopk(corpusT, rareLabel)
      assert(servedBy(servedRare, idx))
      assert(servedRare.count() == 0,
        "a zero-match pushdown serves the exact (empty) answer")
      assert(servedBy(filteredTopk(corpusT, rare), idx))
      // maintenance: an ingest re-encodes WITH payloads; the new
      // vectors are findable through the declared filter
      Scd1Merge.upsert(spark, corpusT,
        emb.filter(col("vec_id") === 3).withColumn("vec_id", lit(7777777L))
          .withColumn("label", lit(424242)),
        Seq("vec_id"), retainVersions = 4, batchId = "c2")
      assert(GraftAnnRewrite.maintain(spark, corpusT) == 1L)
      val found = filteredTopk(corpusT, col("label") === 424242, k = 3)
      assert(servedBy(found, idx), "post-maintain payload filter serves")
      val ids = found.collect().map(_.getLong(0))
      assert(ids.contains(7777777L),
        s"the ingested vector must be findable by its payload: ${ids.toSeq}")
      // FILTERED BATCH serving: a covered predicate prunes the codes
      // for the whole query SET in one probe; an uncovered one serves
      // the exact filtered batch answer (never short)
      val q2 = emb.filter(col("vec_id") < 20)
      val batch = GraftAnnRewrite.topKBatch(spark, corpusT, q2, 3,
        Some("label = 3"))
      assert(GraftAnnRewrite.lastBatchServedFromIndex,
        "a covered batch filter must serve from the index")
      val l3 = emb.filter(col("label") === 3)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val bRows = batch.select(col("query_id"), col("vec_id")).collect()
      assert(bRows.nonEmpty && bRows.forall(r => l3.contains(r.getLong(1))),
        "every served candidate must match the pushed predicate")
      val exB = GraftAnnRewrite.topKBatch(spark, corpusT, q2.limit(2), 3,
        Some("vec_id % 2 = 0"))
      assert(!GraftAnnRewrite.lastBatchServedFromIndex,
        "an uncovered batch filter must serve the exact answer")
      assert(exB.collect().forall(_.getLong(2) % 2 == 0))
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("PARTIAL PAYLOAD PUSHDOWN: a mixed predicate pushes its covered conjuncts into the codes scan and escalates only the residual, candidate-sized") {
    val root = Tmp.dir("annrw_partial")
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 4,
      retainVersions = 4, batchId = "c1")
    Similarity.ivfPqIndexBuild(spark, idx,
      Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iters = 2, dim = 64, batchId = "b1",
      payloadCols = Seq("label"))
    try {
      // `label = 3 AND vec_id % 2 = 0` — label declared, vec_id not:
      // before the split this shape fell ALL the way back to the
      // generic corpus-coverage escalation; now the covered conjunct
      // prunes code rows inside the probe and only the residual
      // escalates, starting from already-matching candidates
      val mixed = col("label") === 3 && col("vec_id") % 2 === 0
      val exact = filteredTopk(corpusT, mixed)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16,
        payloadCols = Seq("label"))
      val pp0 = GraftAnnRewrite.lastPartialPushdowns
      val served = filteredTopk(corpusT, mixed)
      assert(servedBy(served, idx), "the mixed predicate must serve")
      assert(GraftAnnRewrite.lastPartialPushdowns == pp0 + 1,
        "the PARTIAL pushdown path must have served it")
      // the COVERED conjunct reached the codes side: the optimized
      // plan filters `label` directly over the codes relation (from
      // there Catalyst pushes it into the parquet scan — the
      // executed-plan string carries it as a pushed data filter)
      val codesFilters = served.queryExecution.optimizedPlan.collect {
        case fl @ org.apache.spark.sql.catalyst.plans.logical.Filter(_,
            lr: org.apache.spark.sql.execution.datasources.LogicalRelation)
            if lr.relation.isInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
              lr.relation.asInstanceOf[
                org.apache.spark.sql.execution.datasources.HadoopFsRelation]
                .location.inputFiles.exists(_.contains(idx + "/codes/")) => fl
      }
      assert(codesFilters.nonEmpty && codesFilters.forall(
          _.condition.references.exists(_.name.equalsIgnoreCase("label"))),
        "the covered conjunct must be pushed into the codes scan: " +
        served.queryExecution.optimizedPlan.toString.take(2000))
      // CANDIDATE-sized escalation: the candidate subtree is bounded
      // by a Limit (candFactor·k), so every survivor-count job and
      // the served plan read candidate-sized data, never the corpus
      assert(served.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => l
      }.nonEmpty, "the candidate subtree must stay Limit-bounded")
      // exactness of what is served: scores are the true cosines, and
      // the answer fills k (escalation guarantees it at this SF)
      val rows = served.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.length == 10, s"must fill k: ${rows.length}")
      val exactMap = exact.toMap
      rows.foreach { case (id, sc) =>
        exactMap.get(id).foreach(es => assert(es == sc, "scores exact")) }
      val recall = rows.map(_._1).toSet
        .intersect(exact.take(10).map(_._1).toSet).size / 10.0
      info(f"partial-pushdown recall@10 = $recall%.2f")
      assert(recall >= 0.6, s"partial pushdown recall $recall collapsed")
      // replanning the same query hits the escalation cache — the
      // partial mode keys separately from generic
      val hits0 = GraftAnnRewrite.escalationCacheHits
      val pp1 = GraftAnnRewrite.lastPartialPushdowns
      assert(servedBy(filteredTopk(corpusT, mixed), idx))
      assert(GraftAnnRewrite.escalationCacheHits == hits0 + 1,
        "re-planning must replay the converged partial widths")
      assert(GraftAnnRewrite.lastPartialPushdowns == pp1 + 1)
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("MULTIMODAL: two vector columns on one corpus each serve from THEIR index; multi-block marker re-arms; maintain folds both; DROP by column") {
    val root = Tmp.dir("annrw_multicol")
    val corpusT = root + "/corpus"
    val idxA = root + "/idx_a"; val idxB = root + "/idx_b"
    graft.sql.GraftCatalog.setRoot(root + "/cat")
    try {
      // the multimodal shape: text + image embeddings on one corpus
      // (here: the embedding and its reversal — cosine-isometric, so
      // exact answers agree and recall floors hold for both)
      val two = emb.withColumn("embedding2",
        reverse(col("embedding")).cast("array<float>"))
      Scd1Merge.upsert(spark, corpusT, two, Seq("vec_id"), numBuckets = 2,
        retainVersions = 6, batchId = "c1")
      Similarity.ivfPqIndexBuild(spark, idxA,
        Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16, iters = 1, dim = 64, batchId = "a1")
      Similarity.ivfPqIndexBuild(spark, idxB,
        Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding2",
        nlist = 8, m = 8, ksub = 16, iters = 1, dim = 64, batchId = "b1")
      GraftAnnRewrite.register(spark, corpusT, idxA, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16)
      GraftAnnRewrite.register(spark, corpusT, idxB, "vec_id", "embedding2",
        dim = 64, nprobe = 4, candFactor = 16)
      val qv2 = qv.reverse
      def topkOn(vecC: String, q: Seq[Float]): DataFrame =
        Scd1Merge.readTable(spark, corpusT)
          .select(col("vec_id"),
            graft.functions.VectorFunctions.vecCosine(col(vecC),
              typedLit(q)).as("s"))
          .orderBy(col("s").desc).limit(10)
      // each column routes to ITS index — never the sibling's
      val sA = topkOn("embedding", qv)
      assert(servedBy(sA, idxA) && !servedBy(sA, idxB))
      val sB = topkOn("embedding2", qv2)
      assert(servedBy(sB, idxB) && !servedBy(sB, idxA))
      // the reversal is a cosine isometry: both served answers track
      // the same exact id set
      val exactIds = {
        GraftAnnRewrite.unregister(corpusT) // exact plans
        val ids = topkOn("embedding", qv).collect().map(_.getLong(0)).toSet
        assert(topkOn("embedding2", qv2).collect().map(_.getLong(0)).toSet
          == ids, "reversal must be cosine-isometric")
        ids
      }
      // SESSION WIPE: the multi-block marker is gone with unregister —
      // re-register, then wipe ONLY the session registry; both blocks
      // re-arm from the persisted marker
      GraftAnnRewrite.register(spark, corpusT, idxA, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16)
      GraftAnnRewrite.register(spark, corpusT, idxB, "vec_id", "embedding2",
        dim = 64, nprobe = 4, candFactor = 16)
      GraftAnnRewrite.clear()
      assert(servedBy(topkOn("embedding", qv), idxA),
        "block A must re-arm from the multi-block marker")
      assert(servedBy(topkOn("embedding2", qv2), idxB),
        "block B must re-arm from the multi-block marker")
      val rA = topkOn("embedding", qv).collect().map(_.getLong(0)).toSet
      val rB = topkOn("embedding2", qv2).collect().map(_.getLong(0)).toSet
      assert(rA.intersect(exactIds).size >= 7, s"recall A: ${rA.intersect(exactIds).size}")
      assert(rB.intersect(exactIds).size >= 7, s"recall B: ${rB.intersect(exactIds).size}")
      // a wave stales BOTH; one maintain() folds both feeds
      Scd1Merge.upsert(spark, corpusT,
        two.filter(col("vec_id") < 2).withColumn("vec_id",
          col("vec_id") + 440000L),
        Seq("vec_id"), retainVersions = 6, batchId = "c2")
      assert(!servedBy(topkOn("embedding", qv), idxA))
      assert(GraftAnnRewrite.maintain(spark, corpusT) == 4L,
        "maintain must fold the 2-row feed into BOTH indexes (2+2)")
      assert(servedBy(topkOn("embedding", qv), idxA))
      assert(servedBy(topkOn("embedding2", qv2), idxB))
      // SHOW: one row per registration, vec_col discriminating
      val shown = graft.sql.GraftSql.sql(spark, "SHOW VECTOR INDEXES")
        .collect().filter(_.getString(0) == corpusT)
      assert(shown.length == 2 &&
        shown.map(_.getString(6)).sorted.toSeq == Seq("embedding", "embedding2") &&
        shown.forall(_.getBoolean(4)), shown.mkString(","))
      // batch: ambiguous without a column, served with one
      intercept[IllegalArgumentException] {
        GraftAnnRewrite.topKBatch(spark, corpusT, emb.limit(2), 3)
      }
      GraftAnnRewrite.topKBatch(spark, corpusT, emb.limit(2), 3,
        vecCol = Some("embedding")).count()
      assert(GraftAnnRewrite.lastBatchServedFromIndex)
      // DROP: bare form is ambiguous; the column form drops ONE —
      // the sibling keeps serving
      intercept[IllegalStateException] {
        graft.sql.GraftSql.sql(spark,
          s"DROP GRAFT VECTOR INDEX ON graft.`$corpusT`").collect()
      }
      graft.sql.GraftSql.sql(spark,
        s"DROP GRAFT VECTOR INDEX ON graft.`$corpusT` (embedding2)")
      assert(!servedBy(topkOn("embedding2", qv2), idxB),
        "the dropped column must fall back")
      assert(servedBy(topkOn("embedding", qv), idxA),
        "the sibling index must keep serving")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(idxB)))
      // and now the bare DROP is unambiguous
      graft.sql.GraftSql.sql(spark,
        s"DROP GRAFT VECTOR INDEX ON graft.`$corpusT`")
      assert(!servedBy(topkOn("embedding", qv), idxA))
    } finally {
      GraftAnnRewrite.unregister(corpusT)
      graft.sql.GraftCatalog.clearRoot()
    }
  }

  test("BATCH serving: topKBatch answers a query SET from the index in one distributed probe; stale answers exact; maintain restores; unregistered is loud") {
    val (corpusT, idx) = freshCorpus("annrw_batch")
    try {
      val queries = emb.filter(col("vec_id") < 100)
      val exact = Similarity.topK(Scd1Merge.readTable(spark, corpusT),
          queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 8, candFactor = 16)
      val served = GraftAnnRewrite.topKBatch(spark, corpusT, queries, 5)
      assert(GraftAnnRewrite.lastBatchServedFromIndex,
        "fresh registration must serve the batch from the index")
      val pairs = served.select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.size == 500, s"every query fills k: ${pairs.size}")
      val recall = pairs.intersect(exact).size / 500.0
      info(f"batch recall@5 over 100 queries = $recall%.2f")
      assert(recall >= 0.7, s"batch recall $recall collapsed")
      // stale corpus: the EXACT batch answer, flagged
      Scd1Merge.upsert(spark, corpusT,
        emb.filter(col("vec_id") === 7).withColumn("vec_id", lit(987654L)),
        Seq("vec_id"), retainVersions = 4, batchId = "c2")
      val fb = GraftAnnRewrite.topKBatch(spark, corpusT, queries.limit(2), 5)
      assert(!GraftAnnRewrite.lastBatchServedFromIndex)
      assert(fb.count() == 10, "the exact fallback still fills k")
      // maintain folds the feed; the index serves again
      assert(GraftAnnRewrite.maintain(spark, corpusT) == 1L)
      GraftAnnRewrite.topKBatch(spark, corpusT, queries.limit(2), 5).count()
      assert(GraftAnnRewrite.lastBatchServedFromIndex)
      // unregistered: loud, not silently exact
      GraftAnnRewrite.unregister(corpusT)
      intercept[IllegalArgumentException] {
        GraftAnnRewrite.topKBatch(spark, corpusT, queries.limit(1), 5)
      }
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("PER-CELL PRUNING: payload pushdown survives nlist past the broadcast cap with a BOUNDED distance table; selective predicates still escalate to fill k") {
    val root = Tmp.dir("annrw_prune")
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 4,
      retainVersions = 4, batchId = "c1")
    Similarity.ivfPqIndexBuild(spark, idx,
      Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
      nlist = 32, m = 8, ksub = 16, iters = 2, dim = 64, batchId = "b1",
      payloadCols = Seq("label"))
    // the cap is 8 cells — the 32-cell model is "too big to broadcast
    // full-width", the 100 TB nlist ≈ 10⁵ shape scaled to the fixture
    spark.conf.set("spark.graft.ann.fullProbeMaxCells", "8")
    try {
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16, payloadCols = Seq("label"))
      // BROAD covered predicate: serves at the bounded pruned width —
      // before this round the >cap model fell back to the generic
      // corpus-coverage escalation for every payload query
      val broad = col("label") >= 0
      val exact = filteredTopk(corpusT, broad)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val pd0 = GraftAnnRewrite.lastPayloadPushdowns
      val served = filteredTopk(corpusT, broad)
      assert(servedBy(served, idx), "the pruned pushdown must serve")
      assert(GraftAnnRewrite.lastPayloadPushdowns == pd0 + 1)
      assert(GraftAnnRewrite.lastDistanceTableCells <= 8,
        s"the broadcast must stay bounded by the cap: " +
        s"${GraftAnnRewrite.lastDistanceTableCells} cells")
      val rows = served.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.length == 10, s"must fill k: ${rows.length}")
      val exactMap = exact.toMap
      rows.foreach { case (id, sc) =>
        exactMap.get(id).foreach(es => assert(es == sc, "scores exact")) }
      val recall = rows.map(_._1).toSet
        .intersect(exact.take(10).map(_._1).toSet).size / 10.0
      info(f"pruned-pushdown recall@10 (8/32 cells) = $recall%.2f")
      assert(recall >= 0.6, s"pruned recall $recall collapsed")
      // SELECTIVE covered predicate: the kept cells may under-fill —
      // escalation widens toward the full model and still fills k
      val sel = col("label") === 3
      val exactSel = filteredTopk(corpusT, sel)
        .collect().map(_.getLong(0)).toSet
      val servedSel = filteredTopk(corpusT, sel)
      assert(servedBy(servedSel, idx))
      val selIds = servedSel.collect().map(_.getLong(0))
      assert(selIds.length == 10,
        s"escalation must fill k under pruning: ${selIds.length}")
      val selRecall = selIds.toSet.intersect(exactSel).size / 10.0
      info(f"pruned selective recall@10 = $selRecall%.2f")
      assert(selRecall >= 0.6, s"selective recall $selRecall collapsed")
    } finally {
      spark.conf.unset("spark.graft.ann.fullProbeMaxCells")
      GraftAnnRewrite.unregister(corpusT)
    }
  }

  test("PLAN-TIME CACHES: re-planning an unchanged commit re-lists nothing and replays no escalation jobs; a base commit invalidates both") {
    val (corpusT, idx) = freshCorpus("annrw_cache")
    try {
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 2, candFactor = 2)
      // first FILTERED planning: escalation probes run and the
      // converged widths land in the cache
      val first = filteredTopk(corpusT, col("label") === 3)
      assert(servedBy(first, idx))
      val rows1 = first.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val hits0 = GraftAnnRewrite.escalationCacheHits
      // second planning (fresh DataFrame = fresh optimization): the
      // cache serves the SAME widths with zero survivor-count jobs
      val second = filteredTopk(corpusT, col("label") === 3)
      assert(servedBy(second, idx))
      assert(GraftAnnRewrite.escalationCacheHits == hits0 + 1,
        "a re-planned identical filtered query must hit the escalation cache")
      assert(GraftAnnRewrite.lastFilteredEscalations == 0,
        "a cache hit replays no probe rounds")
      assert(second.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        == rows1, "cached widths must serve the identical answer")
      // a DIFFERENT predicate / k misses (sound: new survivor math)
      val before = GraftAnnRewrite.escalationCacheHits
      assert(servedBy(filteredTopk(corpusT, col("label") === 2), idx))
      assert(GraftAnnRewrite.escalationCacheHits == before,
        "a different predicate must not reuse another's widths")
      // a base commit invalidates: the index is stale (falls back),
      // and after maintain() the NEW commit's first planning probes
      // fresh rather than serving pre-commit widths
      Scd1Merge.upsert(spark, corpusT,
        emb.filter(col("vec_id") < 5)
          .withColumn("vec_id", col("vec_id") + 100000L),
        Seq("vec_id"), retainVersions = 4, batchId = "c2")
      assert(!servedBy(filteredTopk(corpusT, col("label") === 3), idx),
        "a stale index must fall back regardless of cached widths")
      GraftAnnRewrite.maintain(spark, corpusT)
      val hitsAfter = GraftAnnRewrite.escalationCacheHits
      assert(servedBy(filteredTopk(corpusT, col("label") === 3), idx))
      assert(GraftAnnRewrite.escalationCacheHits == hitsAfter,
        "a new covered commit must probe fresh, not reuse stale widths")
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("SQL SURFACE: CREATE GRAFT VECTOR INDEX builds + serves (PAYLOAD pushdown included); SHOW reports; DROP removes marker, catalog row, and index tables") {
    val root = Tmp.dir("annrw_sql")
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    graft.sql.GraftCatalog.setRoot(root + "/cat")
    try {
      Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 4,
        retainVersions = 4, batchId = "c1")
      val exact = topk(corpusT).collect().map(_.getLong(0)).toSet
      val row = graft.sql.GraftSql.sql(spark,
        s"""CREATE GRAFT VECTOR INDEX graft.`$idx` ON graft.`$corpusT`
           |(embedding) OPTIONS (nlist=16, m=16, ksub=16, iters=2)
           |PAYLOAD (label)""".stripMargin).collect().head
      assert(row.getString(2) == "vec_id" && row.getLong(3) == 64L &&
        row.getLong(4) == 16L, s"CREATE output: $row")
      val served = topk(corpusT)
      assert(servedBy(served, idx), "the SQL-created index must serve")
      // recall floor (the judged entry pins the exact value)
      val hits = served.collect().map(_.getLong(0)).toSet.intersect(exact)
      assert(hits.size >= 8, s"recall floor: ${hits.size}/10")
      // the declared PAYLOAD column serves filtered queries through
      // the pushdown path — the SQL surface plumbs payloadCols intact
      val pd0 = GraftAnnRewrite.lastPayloadPushdowns
      val filtered = Scd1Merge.readTable(spark, corpusT)
        .filter(col("label") === 3)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("s"))
        .orderBy(col("s").desc).limit(5)
      assert(servedBy(filtered, idx))
      assert(GraftAnnRewrite.lastPayloadPushdowns == pd0 + 1,
        "PAYLOAD (label) must enable the pushdown path")
      // duplicate CREATE is refused loudly
      intercept[IllegalArgumentException] {
        graft.sql.GraftSql.sql(spark,
          s"CREATE GRAFT VECTOR INDEX graft.`${root}/idx2` ON " +
          s"graft.`$corpusT` (embedding)").collect()
      }
      // a wave stales the index; REFRESH GRAFT VECTOR INDEX folds the
      // feed by statement and serving resumes — and the re-stamp
      // evicts the superseded commit's cached escalation outcomes
      Scd1Merge.upsert(spark, corpusT,
        emb.filter(col("vec_id") === 5).withColumn("vec_id", lit(777001L)),
        Seq("vec_id"), retainVersions = 4, batchId = "c2")
      assert(!servedBy(topk(corpusT), idx), "stale falls back")
      val refreshed = graft.sql.GraftSql.sql(spark,
        s"REFRESH GRAFT VECTOR INDEX ON graft.`$corpusT`").collect().head
      assert(refreshed.getLong(1) == 1L,
        s"REFRESH must fold exactly the 1-row feed: $refreshed")
      assert(servedBy(topk(corpusT), idx), "refreshed index serves again")
      // SHOW: one fresh row
      val shown = graft.sql.GraftSql.sql(spark, "SHOW VECTOR INDEXES")
        .collect().filter(_.getString(0) == corpusT)
      assert(shown.length == 1 && shown.head.getString(1) == idx &&
        shown.head.getBoolean(4) && !shown.head.getBoolean(5),
        shown.mkString(","))
      // DROP: rewrite disarmed, marker + catalog row gone, index
      // tables deleted (derived data)
      graft.sql.GraftSql.sql(spark,
        s"DROP GRAFT VECTOR INDEX ON graft.`$corpusT`")
      assert(!servedBy(topk(corpusT), idx))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(corpusT, "_graft_ann")))
      assert(!graft.sql.GraftCatalog.allAnnBases.contains(corpusT))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(idx)),
        "DROP must delete the derived index tables")
      assert(Scd1Merge.tableExists(corpusT), "the corpus is untouched")
    } finally {
      GraftAnnRewrite.unregister(corpusT)
      graft.sql.GraftCatalog.clearRoot()
    }
  }

  test("PLAN-CACHE BOUNDS: the escalation cache is a size-capped LRU; liveFiles snapshots (commit, files) consistently under a mid-listing commit") {
    import graft.plans.PlanCaches
    // ---- LRU bound: EscKey carries the query vector, so production
    // serving adds one entry per distinct query — the cap is what
    // keeps a long-lived driver from leaking. Oldest-out, hot-stays.
    PlanCaches.clear()
    val n = PlanCaches.EscalationMaxEntries
    (0 until n + 10).foreach { i =>
      PlanCaches.escalationPut(
        PlanCaches.EscKey("idx", 1, "p", 10, i.toLong), 4, 16)
    }
    assert(PlanCaches.escalationSize == n,
      s"cap must hold: ${PlanCaches.escalationSize} entries")
    assert(PlanCaches.escalationHit(
      PlanCaches.EscKey("idx", 1, "p", 10, 0L)).isEmpty,
      "the eldest entry must have been evicted")
    assert(PlanCaches.escalationHit(
      PlanCaches.EscKey("idx", 1, "p", 10, (n + 9).toLong)).nonEmpty,
      "the newest entry must survive")
    // re-stamp eviction: superseded-commit entries free their slots
    // immediately (they can never hit — the key carries the commit)
    PlanCaches.escalationPut(PlanCaches.EscKey("idx", 2, "p", 10, 1L), 8, 32)
    PlanCaches.escalationEvictStale("idx", 2)
    assert(PlanCaches.escalationHit(
      PlanCaches.EscKey("idx", 2, "p", 10, 1L)).nonEmpty,
      "the covered commit's entries survive the eviction")
    assert(PlanCaches.escalationHit(
      PlanCaches.EscKey("idx", 1, "p", 10, (n + 9).toLong)).isEmpty,
      "superseded-commit entries are evicted on re-stamp")
    PlanCaches.clear()
    // ---- liveFiles torn-snapshot: a manifest swap landing between
    // the commit read and the listing must never cache a mislabeled
    // (old commit, new files) pair — the entry a future freshness
    // consumer would trust. The test seam injects the racing commit.
    val root = Tmp.dir("plancache_race")
    val t = root + "/t"
    import spark.implicits._
    Scd1Merge.upsert(spark, t, Seq((1L, 10L)).toDF("id", "v"), Seq("id"),
      retainVersions = 4)
    assert(PlanCaches.liveFiles(spark, t).map(_._1)
      == Scd1Merge.tableCommit(t), "prime")
    Scd1Merge.upsert(spark, t, Seq((2L, 20L)).toDF("id", "v"), Seq("id"),
      retainVersions = 4)
    var raced = false
    PlanCaches.onListForTest = () => if (!raced) {
      raced = true
      Scd1Merge.upsert(spark, t, Seq((3L, 30L)).toDF("id", "v"), Seq("id"),
        retainVersions = 4)
    }
    try {
      val got = PlanCaches.liveFiles(spark, t)
      assert(raced, "the interleaved commit must have fired")
      val live = Scd1Merge.tableCommit(t).get
      assert(got.map(_._1).contains(live),
        s"the cached commit must label the state actually listed: $got vs $live")
      assert(got.map(_._2) ==
        Some(Scd1Merge.readTable(spark, t).inputFiles.toSet),
        "the cached file set must be the live set")
    } finally {
      PlanCaches.onListForTest = () => ()
      PlanCaches.clear()
    }
  }

  test("PARTITIONED CODES TABLE: a one-month ingest's code commit writes only that month's child; serving reads the union transparently") {
    import graft.merge.PartitionedTable
    val root = Tmp.dir("annrw_pcodes")
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    PartitionedTable.upsert(spark, corpusT, emb, Seq("label", "vec_id"),
      "label", numBuckets = 1, retainVersions = 6)
    Similarity.ivfPqIndexBuild(spark, idx,
      PartitionedTable.readTable(spark, corpusT), "vec_id", "embedding",
      nlist = 8, m = 8, ksub = 16, iters = 1, dim = 64, batchId = "b1",
      payloadCols = Seq("label"), codesPartitionBy = Some("label"))
    try {
      assert(PartitionedTable.tableExists(idx + "/codes"),
        "the codes table must be a partitioned graft table")
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16, payloadCols = Seq("label"))
      // the bare partitioned top-k serves from the partitioned codes
      val q = PartitionedTable.readTable(spark, corpusT)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("s"))
        .orderBy(col("s").desc).limit(10)
      assert(servedBy(q, idx), s"partitioned-codes serving: ${scanPaths(q)}")
      assert(q.count() == 10)
      // pins BEFORE the one-month ingest
      def pins(): Map[String, Int] =
        PartitionedTable.partitions(spark, idx + "/codes").collect()
          .map(r => r.get(0).toString -> r.getInt(2)).toMap
      val before = pins()
      // ingest into ONE label (month) only
      val oneMonth = emb.filter(col("label") === 3).limit(4)
        .withColumn("vec_id", col("vec_id") + 5000000L)
      PartitionedTable.upsert(spark, corpusT, oneMonth,
        Seq("label", "vec_id"), "label", retainVersions = 6)
      assert(GraftAnnRewrite.maintain(spark, corpusT) == 4L)
      val after = pins()
      assert(after("3") > before("3"),
        "the ingested month's codes child must have advanced")
      assert(before.removed("3") == after.removed("3"),
        s"ONLY the ingested month's child may move: $before vs $after")
      // and the maintained index serves again (stamp re-armed)
      val q2 = PartitionedTable.readTable(spark, corpusT)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("s"))
        .orderBy(col("s").desc).limit(10)
      assert(servedBy(q2, idx), "post-maintain partitioned codes serve")
      // the UNION path's payload pushdown: a declared-column filter
      // over the partitioned corpus serves with zero escalations
      val pd0 = GraftAnnRewrite.lastPayloadPushdowns
      val fq = PartitionedTable.readTable(spark, corpusT)
        .filter(col("label") === 3)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("s"))
        .orderBy(col("s").desc).limit(10)
      assert(servedBy(fq, idx), "partitioned payload filter must serve")
      assert(GraftAnnRewrite.lastPayloadPushdowns == pd0 + 1 &&
        GraftAnnRewrite.lastFilteredEscalations == 0,
        "the union path must use the pushdown, zero escalations")
      assert(fq.count() == 10)
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("persisted registration survives a session-registry wipe; unregister removes the marker") {
    val (corpusT, idx) = freshCorpus("annrw_persist")
    try {
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16)
      assert(servedBy(topk(corpusT), idx))
      GraftAnnRewrite.clear() // simulated restart: session state gone
      assert(servedBy(topk(corpusT), idx),
        "first touch must re-arm from the persisted _graft_ann marker")
      GraftAnnRewrite.unregister(corpusT) // removes the marker too
      GraftAnnRewrite.clear()
      assert(!servedBy(topk(corpusT), idx),
        "no marker on disk → no arm → exact plan")
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  private def filteredTopk(corpusT: String, pred: org.apache.spark.sql.Column,
                           k: Int = 10): DataFrame =
    Scd1Merge.readTable(spark, corpusT)
      .filter(pred)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.vecCosine(col("embedding"),
          typedLit(qv)).as("s"))
      .orderBy(col("s").desc).limit(k)

  test("FILTERED top-k: a metadata predicate serves from the index with escalation; k survivors guaranteed; scores exact") {
    val (corpusT, idx) = freshCorpus("annrw_filt")
    try {
      val exact = filteredTopk(corpusT, col("label") === 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(exact.length == 10)
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16)
      val served = filteredTopk(corpusT, col("label") === 3)
      assert(servedBy(served, idx),
        "metadata-filtered top-k must serve from the index")
      val rows = served.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.length == 10, "escalation must guarantee k survivors")
      // served scores are exact cosines; overlap with the exact
      // filtered top-k stays high
      val exactMap = exact.toMap
      rows.foreach { case (id, s) =>
        exactMap.get(id).foreach(es => assert(es == s)) }
      val recall = rows.map(_._1).toSet
        .intersect(exact.map(_._1).toSet).size / 10.0
      info(f"filtered-rewrite recall@10 = $recall%.2f")
      assert(recall >= 0.6, s"filtered recall $recall collapsed")
      // ---- under-filling first probe: candFactor=1 yields ~1
      // matching candidate per probe round — the rewrite must
      // ESCALATE until k survive, not return short
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 2, candFactor = 1)
      val tight = filteredTopk(corpusT, col("label") === 3)
      assert(servedBy(tight, idx), "escalated probe must still serve")
      assert(GraftAnnRewrite.lastFilteredEscalations > 0,
        "the first probe must have under-filled")
      assert(tight.count() == 10, "escalation must reach k survivors")
      // ---- fewer than k matching rows in the WHOLE corpus: the
      // exhaustive-coverage path serves the complete (short) answer —
      // exactly what the exact plan returns
      val rare = col("label") === 3 && col("vec_id") < 30
      val exactRare = filteredTopk(corpusT, rare).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(exactRare.size < 10, "fixture: the rare slice is short")
      val servedRare = filteredTopk(corpusT, rare)
      assert(servedBy(servedRare, idx),
        "exhaustive coverage must serve the short slice")
      assert(servedRare.collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq == exactRare,
        "a provably-complete candidate set is EXACT")
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("PARTITIONED corpus: the union read serves; a one-partition ingest updates only that slice through the change feed") {
    import graft.merge.PartitionedTable
    val root = Tmp.dir("annrw_part")
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    // month-partitioned posture: label plays the partition column
    PartitionedTable.upsert(spark, corpusT, emb,
      Seq("label", "vec_id"), "label", numBuckets = 2, retainVersions = 6)
    Similarity.ivfPqIndexBuild(spark, idx,
      PartitionedTable.readTable(spark, corpusT), "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iters = 2, dim = 64, batchId = "b1")
    def ptopk(k: Int = 10): DataFrame =
      PartitionedTable.readTable(spark, corpusT)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("s"))
        .orderBy(col("s").desc).limit(k)
    try {
      val exact = ptopk().collect().map(r => (r.getLong(0), r.getDouble(1)))
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16)
      val served = ptopk()
      assert(servedBy(served, idx),
        s"partitioned corpus must serve: ${scanPaths(served).take(3)}")
      val rows = served.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val exactMap = exact.toMap
      rows.foreach { case (id, s) =>
        exactMap.get(id).foreach(es => assert(es == s)) }
      val recall = rows.map(_._1).toSet
        .intersect(exact.map(_._1).toSet).size / 10.0
      info(f"partitioned-rewrite recall@10 = $recall%.2f")
      assert(recall >= 0.6)
      // ---- FILTERED + PARTITIONED: a metadata predicate pushes into
      // every union branch; escalation fills k survivors
      def pfiltered(): DataFrame = PartitionedTable
        .readTable(spark, corpusT)
        .filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("s"))
        .orderBy(col("s").desc).limit(10)
      // exact twin: unregister (clear() alone would re-arm from the
      // persisted marker on first touch), then re-register
      GraftAnnRewrite.unregister(corpusT)
      val exactF2 = pfiltered().collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16)
      val servedF = pfiltered()
      assert(servedBy(servedF, idx),
        "filtered partitioned top-k must serve from the index")
      val rowsF = servedF.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rowsF.length == 10, "escalation must fill k survivors")
      val recallF = rowsF.map(_._1).toSet
        .intersect(exactF2.map(_._1).toSet).size / 10.0
      info(f"filtered-partitioned recall@10 = $recallF%.2f")
      assert(recallF >= 0.6, s"filtered-partitioned recall $recallF")
      // a predicate on the PARTITION column over the plain union read
      // pushes into every branch like any metadata predicate (the
      // plain read does not prune branches) — it serves too, with all
      // k rows; a genuinely partition-PRUNED read (fewer branches)
      // would fall through the file-set gate
      val partPred = PartitionedTable.readTable(spark, corpusT)
        .filter(col("label") === 3)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("s"))
        .orderBy(col("s").desc).limit(10)
      assert(servedBy(partPred, idx),
        "a partition-column predicate over the full union must serve")
      assert(partPred.count() == 10)
      // ---- ingest ONE partition (label=3): the stale index falls
      // back; maintain() folds ONLY the feed's rows and re-serves
      val wave = emb.filter(col("vec_id") < 8)
        .withColumn("vec_id", col("vec_id") + 10000000L) // beyond any SF's id range: twins must INSERT, never collide-update
        .withColumn("label", lit(3))
      PartitionedTable.upsert(spark, corpusT, wave,
        Seq("label", "vec_id"), "label")
      assert(!servedBy(ptopk(), idx), "stale index must fall back")
      val folded = GraftAnnRewrite.maintain(spark, corpusT)
      assert(folded == 8L,
        s"the change feed must carry ONLY the ingested partition's rows, got $folded")
      assert(servedBy(ptopk(), idx), "maintained index must serve again")
      // the maintained index actually covers the new rows: a query AT
      // one of the new vectors finds itself on top
      val nq = emb.filter(col("vec_id") === 3)
        .select(col("embedding")).head().getSeq[Float](0)
      val self = PartitionedTable.readTable(spark, corpusT)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(nq)).as("s"))
        .orderBy(col("s").desc).limit(2)
      assert(servedBy(self, idx))
      val top2 = self.collect().map(_.getLong(0)).toSet
      assert(top2.contains(10000003L),
        s"the ingested twin of vec 3 must rank at the top, got $top2")
      // maintain() is idempotent when current
      assert(GraftAnnRewrite.maintain(spark, corpusT) == 0L)
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("vacuum keeps the _graft_ann marker (durable sidecar, not GC residue)") {
    val (corpusT, idx) = freshCorpus("annrw_vacuum")
    try {
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16)
      Scd1Merge.vacuum(corpusT, retain = 0)
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(corpusT, "_graft_ann")),
        "vacuum must not reclaim the ANN registration marker")
      GraftAnnRewrite.clear() // restart: must re-arm from the marker
      assert(servedBy(topk(corpusT), idx),
        "post-vacuum restart must still auto-arm from _graft_ann")
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("staleness: a base write falls back; index update + refresh serves again; time-travel never serves") {
    val (corpusT, idx) = freshCorpus("annrw_stale")
    try {
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16)
      assert(servedBy(topk(corpusT), idx))
      // time-travel read of the SAME commit content but different
      // snapshot route: the file-set gate must hold (readAtCommit
      // builds a different plan shape/file set; never mis-serve)
      Scd1Merge.upsert(spark, corpusT,
        emb.filter(col("vec_id") < 10)
          .withColumn("embedding",
            transform(col("embedding"), x => x + lit(1.0f))
              .cast("array<float>")),
        Seq("vec_id"), retainVersions = 4, batchId = "c2")
      assert(!servedBy(topk(corpusT), idx),
        "a written-to base must fall back to the exact scan")
      Similarity.ivfPqIndexUpdate(spark, idx,
        Scd1Merge.readTable(spark, corpusT).filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, batchId = "u3")
      GraftAnnRewrite.refresh(spark, corpusT)
      assert(servedBy(topk(corpusT), idx),
        "an updated + re-stamped index must serve again")
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("BATCH FILL-K: a selective covered predicate serves the set from the index and still fills k per query — widening then exact repair, never short") {
    val root = Tmp.dir("annrw_batchfill")
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 4,
      retainVersions = 4, batchId = "c1")
    Similarity.ivfPqIndexBuild(spark, idx,
      Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iters = 2, dim = 64, batchId = "b1",
      payloadCols = Seq("label"))
    try {
      // nprobe=1: the first round sees ONE cell's matching code rows,
      // so the selective predicate under-fills and the batch path
      // must WIDEN (the single-query escalation, amortized across the
      // still-under-filled subset) instead of serving short
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 1, candFactor = 4, payloadCols = Seq("label"))
      val queries = emb.filter(col("vec_id") < 40)
      val filtered = Scd1Merge.readTable(spark, corpusT)
        .filter(col("label") === 3)
      val matches = filtered.count()
      assert(matches >= 10, s"fixture: label=3 holds $matches rows")
      val served = GraftAnnRewrite.topKBatch(spark, corpusT, queries, 10,
        filterSql = Some("label = 3"))
      assert(GraftAnnRewrite.lastBatchServedFromIndex,
        "a fully covered predicate must serve from the index")
      assert(!GraftAnnRewrite.lastBatchPartial)
      val byQuery = served.groupBy(col("query_id")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byQuery.size == 40 && byQuery.values.forall(_ == 10L),
        s"every query must fill k=10: ${byQuery.values.toSeq.distinct}")
      assert(GraftAnnRewrite.lastBatchEscalations > 0,
        "nprobe=1 under a selective predicate must have widened")
      // every answer satisfies the predicate (candidates drawn from
      // covered-admissible vectors; the re-rank joins the filtered
      // corpus)
      val okIds = filtered.select(col("vec_id")).collect()
        .map(_.getLong(0)).toSet
      assert(served.select(col("vec_id")).collect()
        .forall(r => okIds(r.getLong(0))))
      // k PAST the matching pool: widening exhausts, the remainder is
      // repaired with EXACT per-query answers — each query gets every
      // admissible match (pool minus a possible self), never silence
      val big = GraftAnnRewrite.topKBatch(spark, corpusT, queries.limit(5),
        matches.toInt + 50, filterSql = Some("label = 3"))
      assert(GraftAnnRewrite.lastBatchServedFromIndex)
      assert(GraftAnnRewrite.lastBatchUnderfilled == 5,
        "an unfillable k must route every query through exact repair")
      val bigCounts = big.groupBy(col("query_id")).count()
        .collect().map(_.getLong(1))
      assert(bigCounts.length == 5 &&
        bigCounts.forall(n => n == matches || n == matches - 1),
        s"exact repair must return the whole admissible pool: " +
        s"${bigCounts.toSeq} vs $matches")
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("BATCH MIXED predicate: covered conjuncts push into the codes scan, the residual escalates over the under-filled subset; nothing covered still answers exact") {
    val root = Tmp.dir("annrw_batchmix")
    val corpusT = root + "/corpus"; val idx = root + "/ivfpq"
    Scd1Merge.upsert(spark, corpusT, emb, Seq("vec_id"), numBuckets = 4,
      retainVersions = 4, batchId = "c1")
    Similarity.ivfPqIndexBuild(spark, idx,
      Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iters = 2, dim = 64, batchId = "b1",
      payloadCols = Seq("label"))
    try {
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16, payloadCols = Seq("label"))
      val queries = emb.filter(col("vec_id") < 30)
      // label covered, vec_id residual — before this round ONE
      // undeclared column cost the whole set a full exact scan
      val pred = "label >= 2 AND vec_id % 2 = 0"
      val served = GraftAnnRewrite.topKBatch(spark, corpusT, queries, 5,
        filterSql = Some(pred))
      assert(GraftAnnRewrite.lastBatchServedFromIndex,
        "a mixed predicate must serve from the index, not refuse")
      assert(GraftAnnRewrite.lastBatchPartial,
        "the mixed mode must be flagged")
      val byQuery = served.groupBy(col("query_id")).count()
        .collect().map(_.getLong(1))
      assert(byQuery.length == 30 && byQuery.forall(_ == 5L),
        "the residual must never leave a query short")
      // answers satisfy BOTH conjuncts, and track the exact filtered
      // top-k
      val exactPairs = Similarity.topK(
          Scd1Merge.readTable(spark, corpusT).filter(pred),
          queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val pairs = served.select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs.foreach { case (_, v) =>
        assert(v % 2 == 0, "residual conjunct enforced") }
      val recall = pairs.intersect(exactPairs).size / 150.0
      info(f"batch mixed-predicate recall@5 = $recall%.2f")
      assert(recall >= 0.7, s"mixed-batch recall $recall collapsed")
      // NO covered conjunct: the documented exact refusal stands
      GraftAnnRewrite.topKBatch(spark, corpusT, queries.limit(2), 5,
        filterSql = Some("vec_id % 2 = 0")).count()
      assert(!GraftAnnRewrite.lastBatchServedFromIndex,
        "an entirely uncovered predicate answers exact, flagged")
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("FRESH-SESSION re-register of one modality preserves the sibling's persisted block; re-stamping one index never evicts the sibling's cached escalations") {
    val root = Tmp.dir("annrw_sibling")
    val corpusT = root + "/corpus"
    val idxA = root + "/idx_a"; val idxB = root + "/idx_b"
    try {
      val two = emb.withColumn("embedding2",
        reverse(col("embedding")).cast("array<float>"))
      Scd1Merge.upsert(spark, corpusT, two, Seq("vec_id"), numBuckets = 2,
        retainVersions = 6, batchId = "c1")
      Similarity.ivfPqIndexBuild(spark, idxA,
        Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16, iters = 1, dim = 64, batchId = "a1")
      Similarity.ivfPqIndexBuild(spark, idxB,
        Scd1Merge.readTable(spark, corpusT), "vec_id", "embedding2",
        nlist = 8, m = 8, ksub = 16, iters = 1, dim = 64, batchId = "b1")
      GraftAnnRewrite.register(spark, corpusT, idxA, "vec_id", "embedding",
        dim = 64)
      GraftAnnRewrite.register(spark, corpusT, idxB, "vec_id", "embedding2",
        dim = 64)
      // the FRESH SESSION: registry wiped, only the 2-block marker
      // persists. Re-registering ONE column (say after a rebuild)
      // re-persists the marker — before the fix, from a registry
      // holding only that column, silently destroying the sibling's
      // block
      GraftAnnRewrite.clear()
      GraftAnnRewrite.register(spark, corpusT, idxA, "vec_id", "embedding",
        dim = 64)
      val regs = GraftAnnRewrite.registrationsOf(corpusT)
      assert(regs.map(_._1).sorted == Seq("embedding", "embedding2"),
        s"the sibling block must survive a fresh-session re-register: $regs")
      val marker = java.nio.file.Files.readString(
        java.nio.file.Paths.get(corpusT, "_graft_ann"))
      assert(marker.contains("embedding2"),
        "the persisted marker must still carry the sibling's block")
      // ESCALATION-CACHE HYGIENE (multicol): entries key on the
      // INDEX path, so re-stamping A evicts only A's superseded
      // commits — B's cached widths stay resident
      val commit = Scd1Merge.tableCommit(corpusT).get
      graft.plans.PlanCaches.escalationPut(
        graft.plans.PlanCaches.EscKey(idxA, commit - 1, "p", 10, 1L), 4, 16)
      graft.plans.PlanCaches.escalationPut(
        graft.plans.PlanCaches.EscKey(idxB, commit - 1, "p", 10, 1L), 4, 16)
      GraftAnnRewrite.register(spark, corpusT, idxA, "vec_id", "embedding",
        dim = 64) // re-stamp A at the live commit
      assert(graft.plans.PlanCaches.escalationHit(
        graft.plans.PlanCaches.EscKey(idxA, commit - 1, "p", 10, 1L)).isEmpty,
        "A's superseded-commit entry must be evicted")
      assert(graft.plans.PlanCaches.escalationHit(
        graft.plans.PlanCaches.EscKey(idxB, commit - 1, "p", 10, 1L))
          .contains((4, 16)),
        "B's cached escalations must survive A's re-stamp")
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("graft_ann_topk TVF: malformed arguments are diagnostic errors; the relation composes under ordinary SQL") {
    val (corpusT, idx) = freshCorpus("annrw_tvf")
    try {
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 8, candFactor = 16)
      emb.filter(col("vec_id") < 10).createOrReplaceTempView("annrw_tvf_q")
      // happy path + composability: the TVF is a FROM-position
      // relation — joins/aggregates/predicates apply like any table
      val top1 = graft.sql.GraftSql.sql(spark,
        s"SELECT count(*) AS n FROM graft_ann_topk(graft.`$corpusT`, " +
        "annrw_tvf_q, 3) WHERE rank = 1").collect().head.getLong(0)
      assert(top1 == 10, s"10 queries must each have one rank-1 row: $top1")
      assert(GraftAnnRewrite.lastBatchServedFromIndex)
      // arity and argument-shape errors are loud and name the usage
      val e1 = intercept[IllegalArgumentException] {
        graft.sql.GraftSql.sql(spark,
          s"SELECT * FROM graft_ann_topk(graft.`$corpusT`, annrw_tvf_q)")
      }
      assert(e1.getMessage.contains("expected 3-5 arguments"))
      val e2 = intercept[IllegalArgumentException] {
        graft.sql.GraftSql.sql(spark,
          s"SELECT * FROM graft_ann_topk(graft.`$corpusT`, annrw_tvf_q, 0)")
      }
      assert(e2.getMessage.contains("positive integer k"))
      val e3 = intercept[IllegalArgumentException] {
        graft.sql.GraftSql.sql(spark,
          "SELECT * FROM graft_ann_topk(annrw_no_such_name, " +
          "annrw_tvf_q, 3)")
      }
      assert(e3.getMessage.contains("graft corpus table"))
    } finally GraftAnnRewrite.unregister(corpusT)
  }

  test("CREATE GRAFT VECTOR INDEX: a malformed OPTIONS entry is a diagnostic parse error, not a MatchError") {
    val ex = intercept[IllegalArgumentException] {
      graft.sql.GraftSql.sql(spark,
        "CREATE GRAFT VECTOR INDEX graft.`/tmp/nope_idx` ON " +
        "graft.`/tmp/nope_base` (embedding) OPTIONS (nlist)")
    }
    assert(ex.getMessage.contains("bad OPTIONS entry 'nlist'"),
      s"got: ${ex.getMessage}")
  }
}
