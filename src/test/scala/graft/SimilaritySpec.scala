package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("cosine is the sequential-fold double cosine") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 2.0f)),
                 (Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
                 (Array(3.0f, 4.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b").as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
  }

  test("topK returns k best per query with deterministic tie-break") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3)
    val got = Similarity.topK(emb, q, "vec_id", "embedding", 4)
    val byQuery = got.groupBy($"query_id").count().collect()
    assert(byQuery.length == 3 && byQuery.forall(_.getLong(1) == 4L))
    // ranks are 1..4 and cos_sim non-increasing within each query
    got.collect().groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 4))
      val sims = sorted.map(_.getAs[Double]("cos_sim")).toSeq
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
      // self-match excluded
      assert(!rows.exists(r => r.getAs[Long]("vec_id") == r.getAs[Long]("query_id")))
    }
  }

  test("annTopK achieves exact recall at the judged parameter point") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 5)
    val exact = canon(Similarity.topK(emb, q, "vec_id", "embedding", 5)
      .select($"query_id", $"rank", $"vec_id"))
    val ann = canon(Similarity.annTopK(emb, q, "vec_id", "embedding", 5,
        tables = 64, bits = 4, dim = 64)
      .select($"query_id", $"rank", $"vec_id"))
    assert(ann == exact)
  }

  test("ivfTopK with nprobe = nlist reproduces the exact top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 5)
    val exact = canon(Similarity.topK(emb, q, "vec_id", "embedding", 5))
    val ivf = canon(Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 8, iters = 2))
    assert(ivf == exact, "scanning every cluster must equal brute force")
  }

  test("ivfTopK recall@5 at pruning parameters: measured floors hold (deterministic)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.filter($"vec_id" < 50)
    val exact = Similarity.topK(emb, q, "vec_id", "embedding", 5)
      .select($"query_id", $"vec_id")
    val nExact = exact.count()
    // Measured curve (deterministic seeding + Lloyd): recall vs scanned
    // fraction ≈ nprobe/nlist. Geometry-aware clustering beats the
    // random-hyperplane LSH at equal scan share on this weak-neighbor
    // corpus (LSH needs near-full candidate coverage for 0.86).
    //   (16,4) → 0.696 @ ~25%   (16,2) → 0.532 @ ~12.5%   (32,4) → 0.740 @ ~12.5%
    for ((nlist, nprobe, floor) <- Seq((16, 4, 0.65), (16, 2, 0.50), (32, 4, 0.70))) {
      val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
          nlist = nlist, nprobe = nprobe, iters = 2)
        .select($"query_id", $"vec_id")
      val recall = ivf.intersect(exact).count().toDouble / nExact
      info(f"nlist=$nlist%2d nprobe=$nprobe recall@5=$recall%.4f (floor $floor)")
      assert(recall >= floor, f"nlist=$nlist nprobe=$nprobe recall=$recall%.4f < $floor")
    }
  }

  test("annTopK plan has no cartesian product") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 5)
    val plan = Similarity.annTopK(emb, q, "vec_id", "embedding", 5,
      tables = 8, bits = 4, dim = 64).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "candidate join must be an equi-join")
  }

  test("pqEncode emits one in-range code per (vector, subspace)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val books = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 4, ksub = 8, iters = 1, dim = 64)
    assert(books.length == 4 && books.forall(_.length == 8)
      && books.forall(_.forall(_.length == 16)))
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books, dim = 64)
    val n = emb.count()
    assert(codes.count() == 4 * n)
    assert(codes.groupBy($"vec_id").count().filter($"count" =!= 4).isEmpty)
    assert(codes.filter($"code" < 0 || $"code" >= 8).isEmpty)
  }

  test("pqTopK surfaces an exact duplicate at rank 1 (rerank is exact)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // plant an exact clone of vector 3 under a fresh id
    val clone = emb.filter($"vec_id" === 3)
      .select(lit(900000L).as("vec_id"), $"embedding", $"label")
    val corpus = emb.unionByName(clone)
    val q = emb.filter($"vec_id" === 3)
    val top = Similarity.pqTopK(corpus, q, "vec_id", "embedding", 5,
        m = 8, ksub = 16, iters = 2, dim = 64, candFactor = 8)
      .filter($"rank" === 1).collect()
    assert(top.length == 1)
    assert(top.head.getAs[Long]("vec_id") == 900000L)
    assert(math.abs(top.head.getAs[Double]("cos_sim") - 1.0) < 1e-12)
  }

  test("jacobiEigen recovers eigenpairs of a rotated diagonal matrix") {
    // A = R diag(3,1) R^T with R = 45-degree rotation: eigenvalues
    // {3, 1}, eigenvectors (1,1)/sqrt2 and (1,-1)/sqrt2
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0)) // eigen {3,1}
    val (values, vectors) = Similarity.jacobiEigen(a)
    val pairs = values.zip(vectors).sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-10)
    assert(math.abs(pairs(1)._1 - 1.0) < 1e-10)
    // A v = lambda v for both
    pairs.foreach { case (l, v) =>
      val av = Array(a(0)(0) * v(0) + a(0)(1) * v(1),
        a(1)(0) * v(0) + a(1)(1) * v(1))
      assert(math.abs(av(0) - l * v(0)) < 1e-9 &&
        math.abs(av(1) - l * v(1)) < 1e-9)
    }
    // 4x4 with a known spectral gap: A v = lambda v holds across the board
    val b = Array(
      Array(4.0, 1.0, 0.0, 0.5), Array(1.0, 3.0, 0.2, 0.0),
      Array(0.0, 0.2, 2.0, 0.1), Array(0.5, 0.0, 0.1, 1.0))
    val (bv, bw) = Similarity.jacobiEigen(b)
    bv.zip(bw).foreach { case (l, v) =>
      (0 until 4).foreach { i =>
        val avi = (0 until 4).map(j => b(i)(j) * v(j)).sum
        assert(math.abs(avi - l * v(i)) < 1e-8)
      }
    }
  }

  test("pcaTrain finds a planted 2D subspace; pcaTopK recall with exact re-rank") {
    import spark.implicits._
    // planted rank-2 data in 8 dims: x = a*e0 + b*e1 + 0.01 noise
    val rows = (0 until 300).map { i =>
      val a = math.sin(i * 1.7) * 3; val b = math.cos(i * 2.3) * 2
      val v = Array.tabulate(8)(d =>
        (if (d == 0) a else if (d == 1) b else 0.0) +
          0.01 * math.sin(i * 0.91 + d)).map(_.toFloat)
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Similarity.pcaTrain(df, "vec_id", "embedding", d = 2)
    // the top-2 components live (almost) entirely in the e0/e1 plane
    model.components.foreach { c =>
      val planar = c(0) * c(0) + c(1) * c(1)
      assert(planar > 0.95, s"component leaks out of the planted plane: $c")
    }
    // reduced-space candidates + exact re-rank recover the exact top-k
    // on low-rank data (the truncated tail is the 0.01 noise)
    val q = df.filter($"vec_id" < 5)
    val exact = Similarity.topK(df, q, "vec_id", "embedding", 5)
      .select($"query_id", $"vec_id")
    val pca = Similarity.pcaTopK(df, q, "vec_id", "embedding", 5, model)
      .select($"query_id", $"vec_id")
    val hits = pca.intersect(exact).count()
    assert(hits >= 23, s"pca recall too low on planted low-rank data: $hits/25")
  }

  test("persisted LSH index: probe == full cosineNearDup restricted to new endpoints; corpus never re-hashed") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 200)
    val corpusSide = emb.filter(pmod($"vec_id", lit(5)) =!= 0)
    val batch = emb.filter(pmod($"vec_id", lit(5)) === 0)
    val idx = Tmp.dir("simidx_spec") + "/emb_index"
    Similarity.embeddingIndexUpdate(spark, idx, corpusSide,
      "vec_id", "embedding", tables = 32, bits = 4, dim = 64, batchId = "c@1")
    val got = Similarity.embeddingIndexedNearDup(spark, idx, emb, batch,
      "vec_id", "embedding", threshold = 0.3, tables = 32, bits = 4, dim = 64,
      batchId = "b@2")
    val full = Similarity.cosineNearDup(emb, "vec_id", "embedding",
        threshold = 0.3, tables = 32, bits = 4, dim = 64)
      .filter(pmod($"id_a", lit(5)) === 0 || pmod($"id_b", lit(5)) === 0)
    assertSameRows(got.orderBy("id_a", "id_b"), full.orderBy("id_a", "id_b"))
    // scan-shape pins: the probe hashed ONLY the new batch, and fetched
    // at most candidate-many vectors — never the corpus
    val (idxRows, signed, candVecs) = Similarity.lastEmbIndexStats
    assert(signed == batch.count(), "only the new batch gets hashed")
    assert(idxRows == emb.count() * 32, "index holds one row per (id, table)")
    assert(candVecs <= emb.count(), "verification fetches candidates, not the corpus")
  }

  test("persisted IVF index: indexed probe == fresh ivfTopK; batch update assigns only new rows") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 5)
    val idx = Tmp.dir("ivfidx_spec") + "/ivf"
    Similarity.ivfIndexBuild(spark, idx, emb, "vec_id", "embedding",
      nlist = 8, iters = 2, batchId = "b@1")
    val indexed = Similarity.ivfTopKIndexed(spark, idx, emb, q,
      "vec_id", "embedding", 5, nprobe = 3)
    val fresh = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 3, iters = 2)
    assertSameRows(indexed.orderBy("query_id", "rank"),
      fresh.orderBy("query_id", "rank"))
    // incremental update: new vectors join the assignment table against
    // the TRAINED codebook; the corpus rows are not re-assigned (their
    // table rows are byte-identical), and the merged table equals a
    // one-shot assignment of the union under the same centroids
    val newVecs = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 800000L).as("vec_id"), $"embedding")
    val assignBefore = graft.merge.Scd1Merge
      .readTable(spark, s"$idx/assign").filter($"vec_id" < 800000L)
      .orderBy("vec_id").collect().toSeq
    Similarity.ivfIndexUpdate(spark, idx, newVecs, "vec_id", "embedding",
      batchId = "b@2")
    val after = graft.merge.Scd1Merge.readTable(spark, s"$idx/assign")
    assert(after.count() == emb.count() + 3)
    assert(after.filter($"vec_id" < 800000L).orderBy("vec_id")
      .collect().toSeq == assignBefore, "corpus assignments untouched by the batch")
    // the new rows' clusters match what the trained codebook says
    val cents = graft.merge.Scd1Merge.readTable(spark, s"$idx/centroids")
      .orderBy("__cluster").collect().map(_.getSeq[Float](1))
    assertSameRows(
      after.filter($"vec_id" >= 800000L).orderBy("vec_id"),
      Similarity.ivfAssign(newVecs, "vec_id", "embedding", cents).orderBy("vec_id"))
  }
}
