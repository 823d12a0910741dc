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

  test("conservative fall-throughs: filter, ascending sort, wrong literal, unregistered") {
    val (corpusT, idx) = freshCorpus("annrw_neg")
    try {
      GraftAnnRewrite.register(spark, corpusT, idx, "vec_id", "embedding",
        dim = 64, nprobe = 4, candFactor = 16)
      // a filtered top-k changes the admissible rows: no rewrite
      val filtered = Scd1Merge.readTable(spark, corpusT)
        .filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vecCosine(col("embedding"),
            typedLit(qv)).as("s"))
        .orderBy(col("s").desc).limit(10)
      assert(!servedBy(filtered, idx), "filtered top-k must not rewrite")
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
}
