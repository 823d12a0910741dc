package graft

import graft.merge.Scd1Merge
import graft.ops.KeyGenStrategy
import graft.pipeline.IngestRunner
import graft.store.WatermarkStore
import graft.pipeline.{DimBuilder, DimSpec}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pipeline semantics: quirk pins (Q2/Q4/Q7) and the incremental ≡
  * full-load invariant over random batch splits. */
class PipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def spec(distinct: Boolean, keyGen: KeyGenStrategy = KeyGenStrategy.Scalable) =
    DimSpec("dim_t", Seq("nk"), "key", distinctSource = distinct, keyGen = keyGen,
      attrs = Seq("attr"))

  private def silverOf(rows: Seq[(String, String)]) = rows.toDF("nk", "attr")

  test("incremental dedup table: first-seen hash wins, replays are no-ops") {
    // the pipe8 shape distilled: later batches never replace an existing
    // hash (anti-join before commit), even when they carry a SMALLER id
    val path = Tmp.dir("graft_incdd_spec") + "/seen"
    def commit(batch: Seq[(Long, String)], id: String): Unit = {
      val hashed = batch.toDF("doc_id", "text")
        .groupBy(sha2($"text", 256).as("content_hash"))
        .agg(min($"doc_id").as("doc_id"))
      val fresh =
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) hashed
        else hashed.join(Scd1Merge.readTable(spark, path).select($"content_hash"),
          Seq("content_hash"), "left_anti")
      Scd1Merge.upsert(spark, path, fresh, Seq("content_hash"), numBuckets = 2,
        batchId = id)
    }
    commit(Seq(10L -> "dup text", 11L -> "only b1"), "B0001")
    commit(Seq(5L -> "dup text", 12L -> "only b2"), "B0002") // 5 < 10 but loses
    val got = Scd1Merge.readTable(spark, path)
      .select($"doc_id").orderBy($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L, 11L, 12L), "first-seen batch keeps the hash")
    commit(Seq(5L -> "dup text", 12L -> "only b2"), "B0002") // full replay
    assert(Scd1Merge.readTable(spark, path).count() == 3, "replay adds nothing")
  }

  test("Q2: only distinctSource dims dedup — non-distinct keeps duplicate rows with distinct keys") {
    val silver = silverOf(Seq(("a", "x"), ("a", "x"), ("b", "y")))
    val dup = DimBuilder.build(spark, silver, spec(distinct = false), None, "0")
    val ded = DimBuilder.build(spark, silver, spec(distinct = true), None, "0")
    assert(dup.count() == 3, "non-distinct keeps the duplicate source row")
    assert(dup.select($"key").distinct().count() == 3, "dup rows get distinct keys")
    assert(ded.count() == 2)
  }

  test("Q4: initial-load base is 1, so row_number keys start at 2") {
    val dim = DimBuilder.build(spark, silverOf(Seq(("a", "x"), ("b", "y"))),
      spec(distinct = true), None, incrementalFlag = "0")
    assert(dim.agg(min($"key")).first().getLong(0) == 2L)
  }

  test("Q7: any flag other than '0' means incremental (continues from max key)") {
    val existing = Seq((5L, "a", "x")).toDF("key", "nk", "attr")
    // flag "banana" != "0" -> incremental: base = max(existing.key) = 5
    val dim = DimBuilder.build(spark, silverOf(Seq(("a", "x"), ("b", "y"))),
      spec(distinct = true), Some(existing), incrementalFlag = "banana")
    val newRow = dim.filter($"nk" === "b").first()
    assert(newRow.getAs[Long]("key") == 6L)
  }

  test("replaying a batch is a no-op (Q3 upsert idempotency through the table path)") {
    val path = Tmp.dir("pipe_idem") + "/dim"
    val silver = silverOf(Seq(("a", "x"), ("b", "y")))
    val r1 = canon(DimBuilder.buildAndCommit(spark, silver, spec(distinct = true), path, "0"))
    val r2 = canon(DimBuilder.buildAndCommit(spark, silver, spec(distinct = true), path, "1"))
    assert(r1 == r2)
  }

  test("SCD1 attribute updates for matched keys propagate through buildAndCommit") {
    val path = Tmp.dir("pipe_scd1attr") + "/dim"
    DimBuilder.buildAndCommit(spark, silverOf(Seq(("a", "x"), ("b", "y"))),
      spec(distinct = true), path, "0")
    // same natural key "a", changed attribute -> whenMatchedUpdateAll parity
    val after = DimBuilder.buildAndCommit(spark, silverOf(Seq(("a", "x2"))),
      spec(distinct = true), path, "1")
    val row = after.filter(col("nk") === "a").first()
    assert(row.getAs[String]("attr") == "x2", "matched-row attribute update was dropped")
    assert(after.count() == 2, "unmatched rows must survive the update")
  }

  test("null-attr dim rows are NOT re-upserted on a no-change batch (null-safe change detection)") {
    val path = Tmp.dir("pipe_nullattr") + "/dim"
    // "b" has a NULL attribute — the reference data's 31 null DealerNames
    val silver = Seq(("a", "x"), ("b", null)).toDF("nk", "attr")
    DimBuilder.buildAndCommit(spark, silver, spec(distinct = true), path, "0")
    def snapshot(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      graft.merge.FsList.walk(java.nio.file.Paths.get(path)).iterator
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = snapshot()
    // replay the identical batch: with null-safe (<=>) change detection
    // the null-attr row matches its stored copy, nothing is committed,
    // and no bucket file is rewritten
    val after = DimBuilder.buildAndCommit(spark, silver, spec(distinct = true), path, "1")
    assert(snapshot() == before, "no-change batch must not rewrite any bucket file")
    assert(after.count() == 2)
    assert(after.filter($"nk" === "b" && $"attr".isNull).count() == 1)
    // a REAL attr change on the null row (null -> value) still propagates
    val changed = DimBuilder.buildAndCommit(spark,
      Seq(("b", "now_set")).toDF("nk", "attr"), spec(distinct = true), path, "1")
    assert(changed.filter($"nk" === "b").first().getAs[String]("attr") == "now_set")
  }

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("gen failed"))

  test("incremental load over k batches ≡ one full load (property, 4 seeded cases)") {
    val rowsGen = Gen.chooseNum(2, 60).flatMap(n =>
      Gen.listOfN(n, Gen.identifier.map(_.take(8))).map(_.distinct.map(k => (k, s"attr_$k"))))
    for (seed <- 1L to 4L) {
      val rows = sample(rowsGen, seed)
      val nCuts = sample(Gen.chooseNum(1, 4), seed * 7)
      val batches = rows.grouped(math.max(1, rows.size / nCuts)).toSeq

      // incremental: commit batch by batch
      val incPath = Tmp.dir(s"pipe_prop_inc$seed") + "/dim"
      batches.zipWithIndex.foreach { case (b, i) =>
        DimBuilder.buildAndCommit(spark, silverOf(b), spec(distinct = true), incPath,
          if (i == 0) "0" else "1")
      }
      val inc = graft.merge.Scd1Merge.readTable(spark, incPath)

      // full: one-shot load
      val fullPath = Tmp.dir(s"pipe_prop_full$seed") + "/dim"
      DimBuilder.buildAndCommit(spark, silverOf(rows), spec(distinct = true), fullPath, "0")
      val full = graft.merge.Scd1Merge.readTable(spark, fullPath)

      // natural-key contents identical
      assert(canon(inc.select($"nk", $"attr")) == canon(full.select($"nk", $"attr")),
        s"content diverged for seed=$seed")
      // surrogate keys: a bijection onto a dense range starting at 2,
      // not necessarily the same assignment (batch order differs)
      val incKeys = inc.select($"key").collect().map(_.getLong(0)).sorted
      assert(incKeys.toSeq == (2L until 2L + rows.size).toSeq,
        s"keys not dense for seed=$seed")
    }
  }

  test("late-data reprocess floor: a late row lands exactly once; no floor = never") {
    val store = new WatermarkStore(Tmp.dir("late_wm"))
    store.init("0")
    val t = Tmp.dir("late_t") + "/bronze"
    val onTime = Seq((1L, "d1"), (3L, "d3")).toDF("k", "d")
    IngestRunner.runWithReprocess(spark, onTime, "d", store, t, Seq("k"), numBuckets = 2)
    assert(store.read() == "d3")
    // a late row (2, "d2") arrives AFTER the watermark moved past d2:
    // the faithful incremental scan can never see it again
    val all = Seq((1L, "d1"), (2L, "d2"), (3L, "d3")).toDF("k", "d")
    assert(IngestRunner.runWithReprocess(spark, all, "d", store, t, Seq("k")) == 0L)
    assert(Scd1Merge.readTable(spark, t).count() == 2)
    // with a reprocessing floor it lands; a replay stays exactly-once
    IngestRunner.runWithReprocess(spark, all, "d", store, t, Seq("k"), Some("0"))
    IngestRunner.runWithReprocess(spark, all, "d", store, t, Seq("k"), Some("0"))
    assert(canon(Scd1Merge.readTable(spark, t)) ==
      Seq(Seq("1", "d1"), Seq("2", "d2"), Seq("3", "d3")))
    assert(store.read() == "d3", "reprocessing must not regress the watermark")
  }

  test("batch stamps detect a dims-ahead-of-fact crash and name the idempotent rerun") {
    import graft.pipeline.Pipeline
    val base = graft.Tmp.dir("graft_batch_spec")
    val dimT = base + "/dim"
    val factT = base + "/fact"
    def commitDim(rows: Seq[(Long, String)], batch: String): Unit =
      Scd1Merge.upsert(spark, dimT, rows.toDF("k", "v"), Seq("k"),
        numBuckets = 2, batchId = batch)
    def commitFact(rows: Seq[(Long, Long)], batch: String): Unit =
      Scd1Merge.upsert(spark, factT, rows.toDF("fk", "k"), Seq("fk"),
        numBuckets = 2, batchId = batch)
    // batch 1 lands fully, then PUBLISHES (atomic pointer over both)
    import graft.pipeline.Publish
    commitDim(Seq((1L, "a")), "B0001")
    commitFact(Seq((10L, 1L)), "B0001")
    assert(Pipeline.verifyConsistent(Seq(dimT, factT)).consistent)
    Publish.publish(base, Map("dim" -> dimT, "fact" -> factT), "B0001")
    // batch 2: dim commits, the fact commit DIES mid-protocol
    commitDim(Seq((2L, "b")), "B0002")
    Scd1Merge.testFailpoint = "before-manifest"
    intercept[IllegalStateException] { commitFact(Seq((20L, 2L)), "B0002") }
    val torn = Pipeline.verifyConsistent(Seq(dimT, factT))
    assert(!torn.consistent)
    assert(torn.head.contains("B0002"))
    assert(torn.behind == Seq(factT), "the fact table must be named as the rerun")
    assert(torn.stamps(factT).contains("B0001"), "the fact is still at batch 1")
    // PREVENTION: a reader mid-crash resolving through the pipeline
    // pointer sees the OLD consistent set — dim WITHOUT the B0002 row,
    // fact at batch 1 — while a direct readTable already sees the torn
    // dim. The half-landed batch is unobservable through the pointer.
    assert(canon(Scd1Merge.readTable(spark, dimT)) ==
      Seq(Seq("1", "a"), Seq("2", "b")), "direct read IS torn (dim ahead)")
    assert(canon(Publish.readPublished(spark, base, "dim")) ==
      Seq(Seq("1", "a")), "published read pins the pre-crash dim")
    assert(canon(Publish.readPublished(spark, base, "fact")) ==
      Seq(Seq("10", "1")))
    assert(Publish.published(base).exists(_._1 == "B0001"))
    // repair = rerun batch 2 start-to-finish; both legs are idempotent
    commitDim(Seq((2L, "b")), "B0002") // content no-op, stamp already B0002
    commitFact(Seq((20L, 2L)), "B0002")
    val repaired = Pipeline.verifyConsistent(Seq(dimT, factT))
    assert(repaired.consistent && repaired.head.contains("B0002"))
    assert(canon(Scd1Merge.readTable(spark, factT)) ==
      Seq(Seq("10", "1"), Seq("20", "2")))
    // the rerun republishes: B0002 becomes visible through the pointer
    // only now, as one flip
    Publish.publish(base, Map("dim" -> dimT, "fact" -> factT), "B0002")
    assert(canon(Publish.readPublished(spark, base, "dim")) ==
      Seq(Seq("1", "a"), Seq("2", "b")))
    assert(canon(Publish.readPublished(spark, base, "fact")) ==
      Seq(Seq("10", "1"), Seq("20", "2")))
    // an EMPTY batch still advances the stamp (manifest-only commit),
    // so "saw batch X, X was empty here" differs from "never ran X"
    commitDim(Seq((3L, "c")), "B0003")
    commitFact(Nil, "B0003")
    assert(Pipeline.verifyConsistent(Seq(dimT, factT)).consistent)
    assert(canon(Scd1Merge.readTable(spark, factT)) ==
      Seq(Seq("10", "1"), Seq("20", "2")), "the empty-batch stamp must not change data")
    // maintenance preserves the stamp
    Scd1Merge.compact(spark, factT)
    assert(Scd1Merge.tableBatchId(factT).contains("B0003"))
  }

  test("medallion chain: offset-loss redelivery is absorbed by batch stamps") {
    // the pipe13 crash case: the gold job applies a feed batch but dies
    // BEFORE its consumer offset advances (simulated by restoring the
    // offset file) — the redelivered batches carry the same stamps, so
    // re-syncing changes nothing and the chain converges to recompute
    import graft.pipeline.IncrementalAgg
    import graft.pipeline.IncrementalAgg.AggSpec
    import graft.streaming.ChangeStream
    import java.nio.file.{Files, Paths}
    val base = Tmp.dir("graft_medallion_spec")
    val silver = base + "/silver"
    val gold = base + "/gold"
    val ckpt = base + "/ckpt"
    val aspec = AggSpec(Seq("g"), Seq("v" -> "sum_v"), "n")
    def syncGold(): Int =
      ChangeStream.runAvailableNow(spark, silver, Seq("k"), ckpt) {
        (changes, bid) =>
          IncrementalAgg.applyChangesFrame(spark, gold, changes, aspec,
            numBuckets = 2, stamp = bid)
      }
    Scd1Merge.upsert(spark, silver,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "g", "v"),
      Seq("k"), numBuckets = 2)
    assert(syncGold() == 1)
    val offsetFile = Paths.get(ckpt, "offset")
    val saved = Files.readAllBytes(offsetFile)
    Scd1Merge.upsert(spark, silver,
      Seq((2L, "b", 25L), (3L, "a", 5L)).toDF("k", "g", "v"), Seq("k"))
    assert(syncGold() == 1)
    val applied = canon(Scd1Merge.readTable(spark, gold))
    Files.write(offsetFile, saved) // crash before the offset advanced
    assert(syncGold() == 1, "redelivery must re-run the batch")
    assert(canon(Scd1Merge.readTable(spark, gold)) == applied,
      "stamped redelivery must change nothing")
    val expect = Seq(Seq("a", "15", "2"), Seq("b", "25", "1"))
    assert(applied.map(_.take(3)) == expect, s"got $applied")
  }
}
