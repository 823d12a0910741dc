package graft

import org.apache.spark.sql.functions._

/** approx_count_distinct has no cross-engine oracle (sketches differ);
  * bound its relative error against the exact answer instead. */
class ApproxSpec extends SparkSpecBase {

  test("approx_count_distinct tracks the exact count within its precision class") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val exact = orders.select(countDistinct(col("o_custkey"))).first().getLong(0)
    // rsd is a standard deviation, not a bound: the default 5% sketch
    // lands ~6.7% off on this column. A 1% sketch stays well inside 3%.
    val approx = orders
      .select(approx_count_distinct(col("o_custkey"), 0.01)).first().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.03, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("approx_percentile rank error obeys the n/accuracy bound; tighter accuracy tightens it") {
    val o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .select(col("o_totalprice").as("x"))
    val n = o.count()
    def maxRankErr(accuracy: Int): Double = {
      val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
      val vs = o.agg(expr(
          s"approx_percentile(x, array(${ps.mkString(", ")}), $accuracy)").as("v"))
        .head.getSeq[Double](0)
      val aggs = ps.zip(vs).map { case (p, v) =>
        sum(when(col("x") <= v, 1L).otherwise(0L)).as(s"r_$p") }
      val r = o.agg(aggs.head, aggs.tail: _*).head
      ps.indices.map(i => math.abs(r.getLong(i) - ps(i) * n)).max
    }
    val loose = maxRankErr(50)
    val tight = maxRankErr(5000)
    assert(loose <= n / 50.0 + 1, s"accuracy 50: rank err $loose > ${n / 50.0}")
    assert(tight <= n / 5000.0 + 1, s"accuracy 5000: rank err $tight")
    assert(tight <= loose, "higher accuracy must not be worse")
  }

  test("ANN recall@5 at PRUNING parameters: measured floors hold (deterministic)") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
    val nExact = exact.count()
    // This corpus's neighbors are WEAK (top cos ~0.2, near-random): the
    // sign-LSH collision rate for a pair at angle θ is (1-θ/π)^bits per
    // table, so aggressive pruning necessarily sheds recall here.
    // Measured curve (seeded hyperplanes, fixed data → deterministic):
    //   (8,10)→0.060   (8,6)→0.384   (16,4)→0.864   (32,4)→0.992
    // Floors pinned just below the measured values — a regression in
    // bucketing/probing/re-ranking trips them.
    for ((t, b, floor) <- Seq((8, 10, 0.05), (8, 6, 0.35), (16, 4, 0.82), (32, 4, 0.95))) {
      val ann = Similarity.annTopK(emb, queries, "vec_id", "embedding", 5,
        tables = t, bits = b).select(col("query_id"), col("vec_id"))
      val recall = ann.intersect(exact).count().toDouble / nExact
      info(f"tables=$t%2d bits=$b%2d recall@5=$recall%.4f (floor $floor)")
      assert(recall >= floor, f"tables=$t bits=$b recall=$recall%.4f < floor $floor")
    }
  }

  test("HLL sketch rollup: estimates within 5% of exact; union ≡ direct sketch") {
    val o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val per = o.groupBy(col("o_orderstatus"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val unionEst = per.agg(hll_union_agg(col("sk")).as("u"))
      .select(hll_sketch_estimate(col("u"))).first().getLong(0)
    val directEst = o.agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))))
      .first().getLong(0)
    // the union path is not bit-identical to the direct sketch (the
    // merge runs through the HLL union gadget: measured 1488 vs 1492
    // on exact 1500) but stays inside the same accuracy class — that
    // is the mergeability contract pre-aggregated sketch tables need
    val exact = o.select(countDistinct(col("o_custkey"))).first().getLong(0)
    assert(math.abs(unionEst - directEst).toDouble / exact <= 0.01,
      s"union $unionEst vs direct $directEst drifts > 1% of exact $exact")
    assert(math.abs(unionEst - exact).toDouble / exact <= 0.05,
      s"estimate $unionEst vs exact $exact exceeds 5%")
    assert(math.abs(directEst - exact).toDouble / exact <= 0.05,
      s"direct estimate $directEst vs exact $exact exceeds 5%")
  }

  test("ANN mutual-kNN graph recall floor holds (16×4: measured 0.898)") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = Similarity.knnGraph(emb, "vec_id", "embedding", 5)
      .select(col("id_a"), col("id_b"))
    val nExact = exact.count()
    val ann = Similarity.knnGraphAnn(emb, "vec_id", "embedding", 5,
        tables = 16, bits = 4, dim = 64)
      .select(col("id_a"), col("id_b"))
    val recall = ann.intersect(exact).count().toDouble / nExact
    info(f"mutual-kNN ANN recall=$recall%.4f (floor 0.85)")
    assert(recall >= 0.85, f"graph recall $recall%.4f < 0.85 floor (measured 0.898)")
  }

  test("multiprobe buys recall without more tables (8×4: 0.696 single → 1.0 multiprobe)") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
    val nExact = exact.count()
    val single = Similarity.annTopK(emb, queries, "vec_id", "embedding", 5,
      tables = 8, bits = 4).select(col("query_id"), col("vec_id"))
    val multi = Similarity.annTopKMultiprobe(emb, queries, "vec_id", "embedding", 5,
      tables = 8, bits = 4).select(col("query_id"), col("vec_id"))
    val rs = single.intersect(exact).count().toDouble / nExact
    val rm = multi.intersect(exact).count().toDouble / nExact
    info(f"8x4: single=$rs%.3f multiprobe=$rm%.3f")
    assert(rm > rs, f"multiprobe ($rm%.3f) must beat single-probe ($rs%.3f) at equal config")
    assert(rm >= 0.98, f"multiprobe 8x4 recall $rm%.3f < 0.98 floor (measured 1.0)")
  }

  test("PQ-ADC recall@5 floor holds and beats coarse codebooks (deterministic)") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
    val nExact = exact.count()
    // Measured (deterministic seeding + quantized Lloyd/ADC):
    //   m=4  ksub=16 cf=4 → 0.344 ; m=8 ksub=16 cf=8 → 0.708 (judged pin)
    // Floor just below the judged config's measurement.
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 5,
        m = 8, ksub = 16, iters = 2, dim = 64, candFactor = 8)
      .select(col("query_id"), col("vec_id"))
    val recall = pq.intersect(exact).count().toDouble / nExact
    info(f"pq 8x16 recall@5=$recall%.4f")
    assert(recall >= 0.68, f"pq recall $recall%.4f < 0.68 floor (measured 0.708)")
  }

  test("IVF-PQ fused recall equals IVF-flat at equal probed cells; scan stays code-sized") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
    val nExact = exact.count()
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nlist = 16, nprobe = 4, iters = 2)
      .select(col("query_id"), col("vec_id"))
    val fused = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 5,
        nlist = 16, nprobe = 4, m = 16, ksub = 16, iters = 2, dim = 64,
        candFactor = 16)
      .select(col("query_id"), col("vec_id"))
    val (scanned, reranked) = Similarity.lastIvfPqScanned
    val rIvf = ivf.intersect(exact).count().toDouble / nExact
    val rFused = fused.intersect(exact).count().toDouble / nExact
    info(f"ivf=$rIvf%.4f fused=$rFused%.4f scanned=$scanned reranked=$reranked")
    // the judged claim: no recall lost to the residual codes at the
    // same probed cells (measured EQUAL, 0.696 both)
    assert(rFused >= rIvf - 1e-9,
      f"fused $rFused%.4f must not lose recall vs ivf-flat $rIvf%.4f at equal cells")
    assert(rFused >= 0.68, f"fused recall $rFused%.4f < 0.68 floor (measured 0.696)")
    // the memory claim: vectors fetched stay below the code-row scan
    assert(reranked < scanned,
      s"rerank fetches ($reranked) must stay below the scanned code pairs ($scanned)")
  }

  test("index drift: shifted ingest decays recall and trips the monitor; retrain recovers the floor; fresh baseline no-ops") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val idx = Tmp.dir("drift_spec") + "/ivfpq"
    val corpus0 = emb.filter(pmod(col("vec_id"), lit(4)) =!= 3)
    Similarity.ivfPqIndexBuild(spark, idx, corpus0, "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iters = 2, dim = 64, batchId = "b1")
    val (bi, br) = Similarity.ivfPqIndexBaseline(spark, idx)
    val shifted = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(0.1f) + lit(3.0f))
          .cast("array<float>"))
    Similarity.ivfPqIndexUpdate(spark, idx, shifted, "vec_id", "embedding",
      dim = 64, batchId = "i2")
    val full = corpus0.unionByName(shifted)
    val (ci, cr) = Similarity.ivfPqIndexDriftStats(spark, idx, full,
      "vec_id", "embedding")
    info(f"imbalance $bi%.3f -> $ci%.3f, residual $br%.4f -> $cr%.4f")
    assert(ci >= 2 * bi && cr >= 2 * br,
      "the shifted ingest must move BOTH drift signals far past baseline")
    val q = shifted.filter(col("vec_id") < 200)
    val exact = Similarity.topK(full, q, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
    val nExact = exact.count()
    def recall(): Double = Similarity.ivfPqTopKIndexed(spark, idx, full, q,
        "vec_id", "embedding", 5, nprobe = 4, dim = 64, candFactor = 16)
      .select(col("query_id"), col("vec_id"))
      .intersect(exact).count().toDouble / nExact
    val before = recall()
    assert(Similarity.ivfPqIndexMaintain(spark, idx, full,
      "vec_id", "embedding", nlist = 16, m = 16, ksub = 16,
      iters = 2, dim = 64, batchId = "r3"), "monitor must trip")
    val after = recall()
    info(f"recall before=$before%.4f after=$after%.4f (measured 0.64 -> 0.884)")
    assert(after >= 0.85, f"post-retrain recall $after%.4f < 0.85 floor")
    assert(after >= before + 0.1,
      f"retrain must recover materially: $before%.4f -> $after%.4f")
    // the fresh baseline reflects the full corpus: no re-trip
    assert(!Similarity.ivfPqIndexMaintain(spark, idx, full,
      "vec_id", "embedding", nlist = 16, m = 16, ksub = 16,
      iters = 2, dim = 64, batchId = "n4"),
      "a freshly retrained index must not re-trip the monitor")
  }

  test("SCOPED drift repair: only the drifted cells' vectors re-encode; recall floor recovers; repaired baseline no-ops") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val idx = Tmp.dir("drift_scoped_spec") + "/ivfpq"
    val corpus0 = emb.filter(pmod(col("vec_id"), lit(4)) =!= 3)
    Similarity.ivfPqIndexBuild(spark, idx, corpus0, "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iters = 2, dim = 64, batchId = "b1")
    val shifted = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(0.1f) + lit(3.0f))
          .cast("array<float>"))
    Similarity.ivfPqIndexUpdate(spark, idx, shifted, "vec_id", "embedding",
      dim = 64, batchId = "i2")
    val full = corpus0.unionByName(shifted)
    val q = shifted.filter(col("vec_id") < 200)
    val exact = Similarity.topK(full, q, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
    val nExact = exact.count()
    def recall(): Double = Similarity.ivfPqTopKIndexed(spark, idx, full, q,
        "vec_id", "embedding", 5, nprobe = 4, dim = 64, candFactor = 16)
      .select(col("query_id"), col("vec_id"))
      .intersect(exact).count().toDouble / nExact
    val before = recall()
    val action = Similarity.ivfPqIndexMaintainScoped(spark, idx, full,
      "vec_id", "embedding", nlist = 16, m = 16, ksub = 16,
      iters = 2, dim = 64, batchId = "s3")
    assert(action == "scoped", s"expected a cell-scoped repair, got $action")
    val (_, cells, reenc, total) = Similarity.lastScopedStats
    info(s"scoped: $cells drifted cells, $reenc / $total re-encoded")
    assert(cells > 0 && cells < 16, s"drift must localize: $cells cells")
    assert(reenc < total,
      s"the scoped repair must not touch the whole corpus: $reenc / $total")
    val after = recall()
    info(f"recall before=$before%.4f scoped=$after%.4f")
    assert(after >= before + 0.1,
      f"scoped repair must recover materially: $before%.4f -> $after%.4f")
    assert(after >= 0.78,
      f"scoped-repair recall $after%.4f < 0.78 floor (measured 0.804)")
    // both baselines refreshed: a second scoped maintain is a no-op
    assert(Similarity.ivfPqIndexMaintainScoped(spark, idx, full,
      "vec_id", "embedding", nlist = 16, m = 16, ksub = 16,
      iters = 2, dim = 64, batchId = "n4") == "none",
      "a freshly repaired index must not re-trip the monitor")
    // the fallback: drift past the full-rebuild threshold rebuilds —
    // force it by shrinking the full factors below the trip factors
    Similarity.ivfPqIndexUpdate(spark, idx,
      shifted.withColumn("embedding",
        transform(col("embedding"), x => x * lit(0.1f) - lit(4.0f))
          .cast("array<float>"))
        .withColumn("vec_id", col("vec_id") + lit(1000000L)),
      "vec_id", "embedding", dim = 64, batchId = "i5")
    val full2 = full.unionByName(
      shifted.withColumn("embedding",
        transform(col("embedding"), x => x * lit(0.1f) - lit(4.0f))
          .cast("array<float>"))
        .withColumn("vec_id", col("vec_id") + lit(1000000L)))
    val a2 = Similarity.ivfPqIndexMaintainScoped(spark, idx, full2,
      "vec_id", "embedding", nlist = 16, m = 16, ksub = 16,
      iters = 2, dim = 64,
      fullImbalanceFactor = 2.0, fullResidualFactor = 1.25,
      batchId = "f6")
    assert(a2 == "full", s"past-threshold drift must full-rebuild: $a2")
  }

  test("SCOPED + FULL drift repair over a PARTITIONED payload codes table: layout survives, payloads stay correct, nothing drops") {
    import graft.merge.PartitionedTable
    import graft.similarity.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val idx = Tmp.dir("drift_scoped_part") + "/ivfpq"
    val corpus0 = emb.filter(pmod(col("vec_id"), lit(4)) =!= 3)
    Similarity.ivfPqIndexBuild(spark, idx, corpus0, "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 16, iters = 2, dim = 64, batchId = "b1",
      payloadCols = Seq("label"), codesPartitionBy = Some("label"))
    assert(PartitionedTable.tableExists(idx + "/codes"), "partitioned build")
    val shifted = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(0.1f) + lit(3.0f))
          .cast("array<float>"))
    Similarity.ivfPqIndexUpdate(spark, idx, shifted, "vec_id", "embedding",
      dim = 64, batchId = "i2", payloadCols = Seq("label"))
    val full = corpus0.unionByName(shifted)
    // SCOPED repair: used to throw on a partitioned codes table; now
    // commits through the partitioned CDC path
    val action = Similarity.ivfPqIndexMaintainScoped(spark, idx, full,
      "vec_id", "embedding", nlist = 16, m = 16, ksub = 16,
      iters = 2, dim = 64, batchId = "s3")
    assert(action == "scoped", s"expected a cell-scoped repair, got $action")
    assert(PartitionedTable.tableExists(idx + "/codes"),
      "the repair must not flatten the partitioned codes table")
    def codes() = Similarity.readCodes(spark, idx)
    // payloads SURVIVE the re-encode and stay CORRECT (the pushdown
    // gate serves from them — the pre-fix scoped path dropped them)
    assert(codes().columns.contains("label"))
    val mism = codes().select(col("vec_id"), col("label")).distinct()
      .join(full.select(col("vec_id"), col("label").as("l2")), "vec_id")
      .filter(col("label") =!= col("l2")).count()
    assert(mism == 0, s"$mism re-encoded rows carry a wrong payload")
    assert(codes().select(col("vec_id")).distinct().count() == full.count(),
      "every corpus vector keeps its code rows")
    // FULL fallback over the same table: layout + payloads preserved
    // (the bare-signature rebuild used to write a FLAT payload-less
    // codes table over the partitioned one)
    val shifted2 = shifted
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(0.1f) - lit(4.0f))
          .cast("array<float>"))
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    Similarity.ivfPqIndexUpdate(spark, idx, shifted2, "vec_id", "embedding",
      dim = 64, batchId = "i4", payloadCols = Seq("label"))
    val full2 = full.unionByName(shifted2)
    val a2 = Similarity.ivfPqIndexMaintainScoped(spark, idx, full2,
      "vec_id", "embedding", nlist = 16, m = 16, ksub = 16,
      iters = 2, dim = 64,
      fullImbalanceFactor = 2.0, fullResidualFactor = 1.25,
      batchId = "f5")
    assert(a2 == "full", s"past-threshold drift must full-rebuild: $a2")
    assert(PartitionedTable.tableExists(idx + "/codes"),
      "the full rebuild must keep the partitioned layout")
    assert(codes().columns.contains("label"),
      "the full rebuild must keep the payload columns")
    assert(codes().select(col("vec_id")).distinct().count() == full2.count())
  }

  test("PCA-reduced recall@5 floor holds; more components monotonically help") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.topK(emb, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("vec_id"))
    val nExact = exact.count()
    // Measured (quantized covariance/components/projections, stable
    // across core counts): d=8 → lower, d=16 cf=8 → 0.708 (judged pin)
    def recallAt(d: Int): Double = {
      val model = Similarity.pcaTrain(emb, "vec_id", "embedding", d)
      Similarity.pcaTopK(emb, queries, "vec_id", "embedding", 5, model,
          candFactor = 8)
        .select(col("query_id"), col("vec_id"))
        .intersect(exact).count().toDouble / nExact
    }
    val r16 = recallAt(16)
    val r8 = recallAt(8)
    info(f"pca d=16 recall@5=$r16%.4f ; d=8 recall@5=$r8%.4f")
    assert(r16 >= 0.68, f"pca d=16 recall $r16%.4f < 0.68 floor (measured 0.708)")
    assert(r16 >= r8 - 0.02,
      f"more components must not lose recall: d=16 $r16%.4f vs d=8 $r8%.4f")
  }

  test("embedding near-dup at production parameters: ground truth is real, recall floor holds") {
    // Guards the dedup_embedding_recall pinned oracle (threshold 0.9,
    // planted clones, 8×8-bit pruning — measured 203/206 = 0.985):
    //  - the planted ground truth must be substantial AND selective
    //    (some clones fall below the threshold, so the exact filter is
    //    doing work — not "every clone counts");
    //  - recall at the pruning config must stay above a floor pinned
    //    just below the measured value.
    val row = graft.queries.QueriesLLM.queries("dedup_embedding_recall")(
      spark, "/root/testdata/sf0.01").first()
    val (nExact, nHits) = (row.getAs[Long]("n_exact"), row.getAs[Long]("n_hits"))
    val recall = row.getAs[Double]("recall")
    info(f"n_exact=$nExact n_hits=$nHits recall=$recall%.4f")
    assert(nExact >= 150 && nExact <= 250,
      s"planted ground truth out of band: $nExact (250 clones, some sub-threshold)")
    assert(recall >= 0.95, f"production-config recall $recall%.4f < 0.95 floor")
  }
}
