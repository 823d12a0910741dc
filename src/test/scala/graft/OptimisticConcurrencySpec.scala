package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Optimistic concurrency (upsertConcurrent): disjoint concurrent
  * commits BOTH land (rebase over the winner's footprint); overlapping
  * or metadata-changing intervening commits conflict loudly; staging
  * residue never leaks past the failure. */
class OptimisticConcurrencySpec extends SparkSpecBase {
  import spark.implicits._

  private val NB = 4

  /** keys 0..39 split by the engine's own bucket hash so the spec
    * chooses provably-disjoint / provably-overlapping batches. */
  private lazy val bucketOf: Map[Long, Int] =
    (0L until 40L).toDF("k")
      .withColumn("b", pmod(hash(col("k")), lit(NB)))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def keysIn(b: Int): Seq[Long] =
    (0L until 40L).filter(bucketOf(_) == b)

  private def build(tag: String): String = {
    val path = Tmp.dir(s"graft_occ_$tag") + "/t"
    val dim = (0L until 40L).map(i => (i, s"name_$i")).toDF("k", "v")
    Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = NB,
      retainVersions = 3)
    path
  }

  private def batch(ks: Seq[Long], suffix: String) =
    ks.map(k => (k, s"${suffix}_$k")).toDF("k", "v")

  test("two concurrent upserts to DISJOINT buckets both land (interleaved rebase)") {
    val path = build("disjoint")
    val aKeys = keysIn(0).take(3)
    val bKeys = keysIn(1).take(3)
    // writer B stages, then — INSIDE its unlocked window — writer A
    // commits a disjoint-bucket upsert; B must rebase and commit on top
    Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty // A is pessimistic; avoid re-entry
      Scd1Merge.upsert(spark, path, batch(aKeys, "A"), Seq("k"))
    })
    try Scd1Merge.upsertConcurrent(spark, path, batch(bKeys, "B"), Seq("k"))
    finally Scd1Merge.testHooks = Map.empty
    val t = Scd1Merge.readTable(spark, path)
    aKeys.foreach { k =>
      assert(t.filter($"k" === k).select("v").as[String].head() == s"A_$k") }
    bKeys.foreach { k =>
      assert(t.filter($"k" === k).select("v").as[String].head() == s"B_$k") }
    assert(t.count() == 40)
    assert(Scd1Merge.tableCommit(path).contains(3)) // create + A + B
  }

  test("overlapping concurrent upsert conflicts loudly; winner intact; staging cleaned") {
    val path = build("overlap")
    val shared = keysIn(0).take(4)
    Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      Scd1Merge.upsert(spark, path, batch(shared.take(2), "A"), Seq("k"))
    })
    val e =
      try intercept[java.util.ConcurrentModificationException] {
        Scd1Merge.upsertConcurrent(spark, path,
          batch(shared.drop(2), "B"), Seq("k")) // same bucket 0
      } finally Scd1Merge.testHooks = Map.empty
    assert(e.getMessage.contains("rewrote bucket"))
    // the winner's rows landed, the loser's did not
    val t = Scd1Merge.readTable(spark, path)
    shared.take(2).foreach { k =>
      assert(t.filter($"k" === k).select("v").as[String].head() == s"A_$k") }
    shared.drop(2).foreach { k =>
      assert(t.filter($"k" === k).select("v").as[String].head() == s"name_$k") }
    // no staging sibling left behind
    val parent = Paths.get(path).getParent
    val leftovers = graft.merge.FsList.list(parent).iterator
      .map(_.getFileName.toString).filter(_.contains(".tmp-")).toSeq
    assert(leftovers.isEmpty, s"staging residue: $leftovers")
  }

  test("metadata-changing intervening commit (deletion vector) conflicts even when disjoint") {
    val path = build("meta")
    val bKeys = keysIn(1).take(2)
    Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      // soft delete in bucket 0: dv changes — table-wide metadata
      val victim = keysIn(0).head
      Scd1Merge.deleteSoft(spark, path, Seq("k"), $"k" === victim)
      ()
    })
    val e =
      try intercept[java.util.ConcurrentModificationException] {
        Scd1Merge.upsertConcurrent(spark, path, batch(bKeys, "B"), Seq("k"))
      } finally Scd1Merge.testHooks = Map.empty
    assert(e.getMessage.contains("metadata"))
  }

  test("REAL parallel writers, disjoint buckets: both land via lock-wait") {
    val path = build("threads")
    val aKeys = keysIn(2).take(3)
    val bKeys = keysIn(3).take(3)
    // both writers stage BEFORE either takes the lock — the barrier in
    // the staged hook guarantees true overlap, not accidental serialism
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
      barrier.await(30, java.util.concurrent.TimeUnit.SECONDS); ()
    })
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(ks: Seq[Long], tag: String) = new Thread(() => {
      try Scd1Merge.upsertConcurrent(spark, path, batch(ks, tag), Seq("k"))
      catch { case t: Throwable => errs.add(t) }
    })
    val (ta, tb) = (writer(aKeys, "A"), writer(bKeys, "B"))
    try {
      ta.start(); tb.start(); ta.join(120000); tb.join(120000)
    } finally Scd1Merge.testHooks = Map.empty
    assert(errs.isEmpty, s"concurrent writers failed: ${errs.asScala.map(_.getMessage)}")
    val t = Scd1Merge.readTable(spark, path)
    aKeys.foreach { k =>
      assert(t.filter($"k" === k).select("v").as[String].head() == s"A_$k") }
    bKeys.foreach { k =>
      assert(t.filter($"k" === k).select("v").as[String].head() == s"B_$k") }
    assert(Scd1Merge.tableCommit(path).contains(3))
  }

  test("ingest rebases over a concurrent COMPACTION of other buckets; overlap still conflicts") {
    // the OCC headline use-case: maintenance beside ingest. Build a
    // table whose buckets are fragmented (record-cap write), then
    // un-fragment the ingest bucket so compaction provably won't touch
    // it; compaction runs INSIDE the ingest's staged window.
    def fragmented(tag: String): String = {
      val path = Tmp.dir(s"graft_occ_$tag") + "/t"
      val key = "spark.sql.files.maxRecordsPerFile"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "5")
      try Scd1Merge.upsert(spark, path,
        (0L until 40L).map(i => (i, s"name_$i")).toDF("k", "v"),
        Seq("k"), numBuckets = NB, retainVersions = 3)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      path
    }
    val path = fragmented("compact")
    val ingestKeys = keysIn(0).take(3)
    // commit 2: rewrite bucket 0 normally -> single file, nothing for
    // compact to do there
    Scd1Merge.upsert(spark, path, batch(ingestKeys.take(1), "pre"), Seq("k"))
    Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      val rewrote = Scd1Merge.compact(spark, path)
      assert(rewrote >= 1, "compaction must rewrite the fragmented buckets")
    })
    try Scd1Merge.upsertConcurrent(spark, path, batch(ingestKeys, "B"), Seq("k"))
    finally Scd1Merge.testHooks = Map.empty
    val t = Scd1Merge.readTable(spark, path)
    ingestKeys.foreach { k =>
      assert(t.filter($"k" === k).select("v").as[String].head() == s"B_$k") }
    assert(t.count() == 40)
    assert(Scd1Merge.tableCommit(path).contains(4)) // create, pre, compact, B

    // ...and ingest INTO a bucket the compaction rewrote conflicts
    val path2 = fragmented("compact2")
    val clashKeys = keysIn(1).take(2) // bucket 1 stays fragmented
    Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      Scd1Merge.compact(spark, path2)
      ()
    })
    val e =
      try intercept[java.util.ConcurrentModificationException] {
        Scd1Merge.upsertConcurrent(spark, path2, batch(clashKeys, "B"), Seq("k"))
      } finally Scd1Merge.testHooks = Map.empty
    assert(e.getMessage.contains("rewrote bucket"))
  }

  test("predicate DELETE rebases over a concurrent ingest to other buckets; both commit") {
    val path = build("delbase")
    val victims = keysIn(0).take(2)
    val ingest = keysIn(1).take(3)
    // the delete stages against commit 1; INSIDE its unlocked window
    // an ingest lands in a DIFFERENT bucket — the delete's footprint
    // check proves disjointness and rebases on top
    Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      Scd1Merge.upsert(spark, path, batch(ingest, "A"), Seq("k"))
    })
    val n =
      try Scd1Merge.deleteConcurrent(spark, path, Seq("k"),
        $"k".isin(victims: _*))
      finally Scd1Merge.testHooks = Map.empty
    assert(n == 2)
    val t = Scd1Merge.readTable(spark, path)
    assert(t.count() == 38)
    victims.foreach(k => assert(t.filter($"k" === k).count() == 0))
    ingest.foreach { k =>
      assert(t.filter($"k" === k).select("v").as[String].head() == s"A_$k") }
    assert(Scd1Merge.tableCommit(path).contains(3)) // create + ingest + delete
  }

  test("predicate DELETE overlapping a concurrent commit conflicts; winner intact") {
    val path = build("delclash")
    val b0 = keysIn(0)
    Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      Scd1Merge.upsert(spark, path, batch(b0.take(1), "A"), Seq("k"))
    })
    val e =
      try intercept[java.util.ConcurrentModificationException] {
        Scd1Merge.deleteConcurrent(spark, path, Seq("k"),
          $"k".isin(b0.take(3): _*)) // same bucket 0
      } finally Scd1Merge.testHooks = Map.empty
    assert(e.getMessage.contains("rewrote bucket"))
    val t = Scd1Merge.readTable(spark, path)
    assert(t.count() == 40) // nothing deleted
    assert(t.filter($"k" === b0.head).select("v").as[String].head() == s"A_${b0.head}")
    // no staging residue
    val leftovers = graft.merge.FsList.list(Paths.get(path).getParent).iterator
      .map(_.getFileName.toString).filter(_.contains(".tmp-")).toSeq
    assert(leftovers.isEmpty, s"staging residue: $leftovers")
  }

  test("predicate UPDATE rebases over a disjoint concurrent ingest") {
    val path = build("updbase")
    val victims = keysIn(2).take(2)
    val ingest = keysIn(3).take(2)
    Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      Scd1Merge.upsert(spark, path, batch(ingest, "A"), Seq("k"))
    })
    val n =
      try Scd1Merge.updateConcurrent(spark, path, Seq("k"),
        $"k".isin(victims: _*), Map("v" -> concat($"v", lit("_upd"))))
      finally Scd1Merge.testHooks = Map.empty
    assert(n == 2)
    val t = Scd1Merge.readTable(spark, path)
    victims.foreach { k =>
      assert(t.filter($"k" === k).select("v").as[String].head() == s"name_${k}_upd") }
    ingest.foreach { k =>
      assert(t.filter($"k" === k).select("v").as[String].head() == s"A_$k") }
    // serial parity: the optimistic update equals the pessimistic one
    val twin = build("updtwin")
    Scd1Merge.update(spark, twin, Seq("k"),
      $"k".isin(victims: _*), Map("v" -> concat($"v", lit("_upd"))))
    assertSameRows(
      t.filter(!$"k".isin(ingest: _*)).orderBy("k"),
      Scd1Merge.readTable(spark, twin)
        .filter(!$"k".isin(ingest: _*)).orderBy("k"))
  }

  test("applyCdcConcurrent: CDC batch (upsert + delete) lands beside a disjoint ingest") {
    val path = build("cdcbase")
    val cdcKeys = keysIn(0).take(2) // update one, delete one — bucket 0
    val ingest = keysIn(1).take(2)
    val cdc = Seq((cdcKeys(0), "cdc_upd", "upsert"),
      (cdcKeys(1), "gone", "delete")).toDF("k", "v", "_op")
    Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      Scd1Merge.upsert(spark, path, batch(ingest, "A"), Seq("k"))
    })
    try Scd1Merge.applyCdcConcurrent(spark, path, cdc, Seq("k"))
    finally Scd1Merge.testHooks = Map.empty
    val t = Scd1Merge.readTable(spark, path)
    assert(t.count() == 39)
    assert(t.filter($"k" === cdcKeys(0)).select("v").as[String].head() == "cdc_upd")
    assert(t.filter($"k" === cdcKeys(1)).count() == 0)
    ingest.foreach { k =>
      assert(t.filter($"k" === k).select("v").as[String].head() == s"A_$k") }
    assert(Scd1Merge.tableCommit(path).contains(3))

    // ...and an overlapping intervening commit still conflicts
    val path2 = build("cdcclash")
    val clash = keysIn(0).take(2)
    Scd1Merge.testHooks = Map("optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      Scd1Merge.upsert(spark, path2, batch(clash.take(1), "A"), Seq("k"))
    })
    val e =
      try intercept[java.util.ConcurrentModificationException] {
        Scd1Merge.applyCdcConcurrent(spark, path2,
          Seq((clash(1), "x", "upsert")).toDF("k", "v", "_op"), Seq("k"))
      } finally Scd1Merge.testHooks = Map.empty
    assert(e.getMessage.contains("rewrote bucket"))
  }

  test("serial upsertConcurrent (no contention) behaves exactly like upsert") {
    val pathO = build("serial_o"); val pathP = build("serial_p")
    val ks = keysIn(0).take(2) ++ keysIn(3).take(2)
    Scd1Merge.upsertConcurrent(spark, pathO, batch(ks, "X"), Seq("k"),
      batchId = "B9")
    Scd1Merge.upsert(spark, pathP, batch(ks, "X"), Seq("k"), batchId = "B9")
    assertSameRows(Scd1Merge.readTable(spark, pathO).orderBy("k"),
      Scd1Merge.readTable(spark, pathP).orderBy("k"))
    assert(Scd1Merge.tableBatchId(pathO).contains("B9"))
    // snapshot still readable (retention honored on the optimistic path)
    assert(Scd1Merge.readTableAt(spark, pathO, 1).count() == 40)
  }

  // ---------------- PARTITIONED tables (parent-level OCC) ----------

  import graft.merge.PartitionedTable

  private def buildPart(tag: String): String = {
    val path = Tmp.dir(s"graft_pocc_$tag") + "/t"
    val rows = (0 until 4).flatMap(p => (0L until 10L).map(i =>
      (s"p$p", p * 10L + i, s"init_${p * 10 + i}")))
      .toDF("part", "k", "v")
    PartitionedTable.upsert(spark, path, rows, Seq("part", "k"), "part",
      numBuckets = 2, retainVersions = 3)
    path
  }

  private def pbatch(p: String, ks: Seq[Long], suffix: String) =
    ks.map(k => (p, k, s"${suffix}_$k")).toDF("part", "k", "v")

  test("PARTITIONED: real parallel writers to disjoint partitions both land; state == serial") {
    val path = buildPart("disjoint")
    // both writers stage their child commits BEFORE either adopts —
    // the barrier guarantees true overlap of the unlocked phases
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    Scd1Merge.testHooks = Map("p-optimistic-staged" -> { () =>
      barrier.await(60, java.util.concurrent.TimeUnit.SECONDS); ()
    })
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(p: String, ks: Seq[Long], tag: String) = new Thread(() => {
      try PartitionedTable.upsertConcurrent(spark, path,
        pbatch(p, ks, tag), Seq("part", "k"), "part")
      catch { case t: Throwable => errs.add(t) }
    })
    val ta = writer("p0", Seq(0L, 1L, 100L), "A") // updates + a new key
    val tb = writer("p1", Seq(10L, 11L, 200L), "B")
    try { ta.start(); tb.start(); ta.join(180000); tb.join(180000) }
    finally Scd1Merge.testHooks = Map.empty
    assert(errs.isEmpty,
      s"parallel partitioned writers failed: ${errs.asScala.map(_.getMessage)}")
    val t = PartitionedTable.readTable(spark, path)
    assert(t.filter($"k" === 0L).select("v").as[String].head() == "A_0")
    assert(t.filter($"k" === 100L).select("v").as[String].head() == "A_100")
    assert(t.filter($"k" === 10L).select("v").as[String].head() == "B_10")
    assert(t.filter($"k" === 200L).select("v").as[String].head() == "B_200")
    assert(t.count() == 42)
    // two parent commits on top of create — the serial outcome
    assert(PartitionedTable.tableCommit(path).contains(3))
    // every pin equals its child's live commit (no residue anywhere)
    PartitionedTable.partitions(spark, path).collect().foreach { r =>
      assert(r.getAs[Int]("pinned_commit") == r.getAs[Int]("live_commit"))
    }
  }

  test("PARTITIONED: same-partition OCC overlap fails the second stager loudly; first lands") {
    val path = buildPart("overlap")
    // B stages p2, then — inside its unlocked window — A attempts an
    // OCC upsert to the SAME partition: A must fail LOUDLY at the
    // staging guard (p2's pin lags B's staged child commit), leaving
    // no trace; B then adopts cleanly
    val aErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    Scd1Merge.testHooks = Map("p-optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      try PartitionedTable.upsertConcurrent(spark, path,
        pbatch("p2", Seq(20L), "A"), Seq("part", "k"), "part")
      catch { case t: Throwable => aErr.set(t) }
    })
    try PartitionedTable.upsertConcurrent(spark, path,
      pbatch("p2", Seq(21L), "B"), Seq("part", "k"), "part")
    finally Scd1Merge.testHooks = Map.empty
    assert(aErr.get() != null, "overlapping stager must fail")
    assert(aErr.get().getMessage.contains("lags its live child commit"))
    val t = PartitionedTable.readTable(spark, path)
    assert(t.filter($"k" === 21L).select("v").as[String].head() == "B_21")
    assert(t.filter($"k" === 20L).select("v").as[String].head() == "init_20")
    // A's prescribed retry (no more contention) lands
    PartitionedTable.upsertConcurrent(spark, path,
      pbatch("p2", Seq(20L), "A2"), Seq("part", "k"), "part")
    assert(PartitionedTable.readTable(spark, path)
      .filter($"k" === 20L).select("v").as[String].head() == "A2_20")
    PartitionedTable.partitions(spark, path).collect().foreach { r =>
      assert(r.getAs[Int]("pinned_commit") == r.getAs[Int]("live_commit"))
    }
  }

  test("PARTITIONED: adopt-time conflict (touched partition dropped mid-window) rolls the child back") {
    val path = buildPart("dropconflict")
    // B stages p2; a concurrent metadata commit DROPS p2 before B's
    // adopt — the footprint check must CME, and the rollback must
    // restore the child so no unpinned residue survives
    Scd1Merge.testHooks = Map("p-optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      PartitionedTable.dropPartitionsWhere(spark, path, $"part" === "p2"); ()
    })
    val e = try intercept[java.util.ConcurrentModificationException] {
      PartitionedTable.upsertConcurrent(spark, path,
        pbatch("p2", Seq(21L), "B"), Seq("part", "k"), "part")
    } finally Scd1Merge.testHooks = Map.empty
    assert(e.getMessage.contains("p2"))
    // the drop won: p2 is gone entirely
    assert(PartitionedTable.readTable(spark, path)
      .filter($"part" === "p2").count() == 0)
    assert(PartitionedTable.readTable(spark, path).count() == 30)
  }

  test("PARTITIONED: cold-partition compaction runs beside a hot-partition ingest") {
    val path = buildPart("compact")
    // fragment p0's buckets legitimately (bounded file sizes), so the
    // child compact has real work
    spark.conf.set("spark.sql.files.maxRecordsPerFile", 2)
    try (1 to 3).foreach { i =>
      PartitionedTable.upsert(spark, path,
        pbatch("p0", (0L until 8L), s"c$i"), Seq("part", "k"), "part")
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    // compaction of p0 stages, then — inside its unlocked window — an
    // OCC ingest into p3 fully commits; compaction must REBASE
    Scd1Merge.testHooks = Map("p-compact-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      PartitionedTable.upsertConcurrent(spark, path,
        pbatch("p3", Seq(30L, 300L), "I"), Seq("part", "k"), "part")
    })
    val rewrote = try PartitionedTable.compactConcurrent(spark, path,
      predicate = $"part" === "p0")
    finally Scd1Merge.testHooks = Map.empty
    assert(rewrote > 0, "p0 had churn to compact")
    val t = PartitionedTable.readTable(spark, path)
    // both effects visible: the ingest AND the compacted content
    assert(t.filter($"k" === 30L).select("v").as[String].head() == "I_30")
    assert(t.filter($"k" === 300L).select("v").as[String].head() == "I_300")
    assert(t.filter($"k" === 0L).select("v").as[String].head() == "c3_0")
    assert(t.count() == 41)
    PartitionedTable.partitions(spark, path).collect().foreach { r =>
      assert(r.getAs[Int]("pinned_commit") == r.getAs[Int]("live_commit"))
    }
  }

  test("PARTITIONED: compaction overlapping a same-partition commit conflicts loudly") {
    val path = buildPart("compact_overlap")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", 2)
    try (1 to 2).foreach { i =>
      PartitionedTable.upsert(spark, path,
        pbatch("p1", (10L until 18L), s"c$i"), Seq("part", "k"), "part")
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    Scd1Merge.testHooks = Map("p-compact-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      PartitionedTable.upsert(spark, path,
        pbatch("p1", Seq(11L), "W"), Seq("part", "k"), "part")
    })
    val e = try intercept[java.util.ConcurrentModificationException] {
      PartitionedTable.compactConcurrent(spark, path,
        predicate = $"part" === "p1")
    } finally Scd1Merge.testHooks = Map.empty
    assert(e.getMessage.contains("p1"))
    // the intervening writer's row is intact
    assert(PartitionedTable.readTable(spark, path)
      .filter($"k" === 11L).select("v").as[String].head() == "W_11")
  }

  test("PARTITIONED: month-scoped OCC delete lands beside a disjoint ingest; final state == serial") {
    val path = buildPart("del_beside")
    // the delete stages p0's child rewrite, then — inside its
    // unlocked window — an OCC ingest into p2 fully commits; the
    // delete's adopt must REBASE over it, and both effects survive
    Scd1Merge.testHooks = Map("p-predicate-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      PartitionedTable.upsertConcurrent(spark, path,
        pbatch("p2", Seq(20L, 220L), "I"), Seq("part", "k"), "part")
    })
    val n = try PartitionedTable.deleteWhereConcurrent(spark, path,
      $"part" === "p0" && $"k" < 5L)
    finally Scd1Merge.testHooks = Map.empty
    assert(n == 5L, s"deleted $n")
    // only p0 was visited at all (partition pruning held)
    assert(PartitionedTable.lastPartitionPrune == (1, 4))
    val t = PartitionedTable.readTable(spark, path)
    assert(t.filter($"part" === "p0").count() == 5)
    assert(t.filter($"k" === 20L).select("v").as[String].head() == "I_20")
    assert(t.filter($"k" === 220L).select("v").as[String].head() == "I_220")
    assert(t.count() == 36)
    PartitionedTable.partitions(spark, path).collect().foreach { r =>
      assert(r.getAs[Int]("pinned_commit") == r.getAs[Int]("live_commit"))
    }
  }

  test("PARTITIONED: OCC update rebases over a disjoint ingest; same-partition overlap conflicts with rollback") {
    val path = buildPart("upd_beside")
    Scd1Merge.testHooks = Map("p-predicate-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      PartitionedTable.upsertConcurrent(spark, path,
        pbatch("p3", Seq(30L), "I"), Seq("part", "k"), "part")
    })
    val n = try PartitionedTable.updateWhereConcurrent(spark, path,
      $"part" === "p1" && $"k" % 2L === 0L,
      Map("v" -> lit("UPD")))
    finally Scd1Merge.testHooks = Map.empty
    assert(n == 5L, s"updated $n")
    val t = PartitionedTable.readTable(spark, path)
    assert(t.filter($"v" === "UPD").count() == 5)
    assert(t.filter($"k" === 30L).select("v").as[String].head() == "I_30")
    // OVERLAP: an intervening commit to the SAME partition the update
    // touches must CME at adopt, and the staged child must roll back
    Scd1Merge.testHooks = Map("p-predicate-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      PartitionedTable.upsert(spark, path,
        pbatch("p1", Seq(12L), "W"), Seq("part", "k"), "part")
    })
    val e = try intercept[java.util.ConcurrentModificationException] {
      PartitionedTable.updateWhereConcurrent(spark, path,
        $"part" === "p1", Map("v" -> lit("LOST")))
    } finally Scd1Merge.testHooks = Map.empty
    assert(e.getMessage.contains("p1"))
    val t2 = PartitionedTable.readTable(spark, path)
    assert(t2.filter($"v" === "LOST").count() == 0,
      "the conflicted update must leave no trace")
    assert(t2.filter($"k" === 12L).select("v").as[String].head() == "W_12")
    PartitionedTable.partitions(spark, path).collect().foreach { r =>
      assert(r.getAs[Int]("pinned_commit") == r.getAs[Int]("live_commit"))
    }
  }

  test("PARTITIONED: OCC dynamic overwrite replaces its month beside a disjoint ingest") {
    val path = buildPart("ovr_beside")
    Scd1Merge.testHooks = Map("p-predicate-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      PartitionedTable.upsertConcurrent(spark, path,
        pbatch("p0", Seq(0L, 100L), "I"), Seq("part", "k"), "part")
    })
    try PartitionedTable.overwritePartitionsConcurrent(spark, path,
      pbatch("p2", Seq(21L, 23L), "O"))
    finally Scd1Merge.testHooks = Map.empty
    val t = PartitionedTable.readTable(spark, path)
    // p2 replaced wholesale (10 -> 2 rows), the p0 ingest intact
    assert(t.filter($"part" === "p2").count() == 2)
    assert(t.filter($"k" === 21L).select("v").as[String].head() == "O_21")
    assert(t.filter($"k" === 0L).select("v").as[String].head() == "I_0")
    assert(t.filter($"k" === 100L).select("v").as[String].head() == "I_100")
    assert(t.count() == 33)
    PartitionedTable.partitions(spark, path).collect().foreach { r =>
      assert(r.getAs[Int]("pinned_commit") == r.getAs[Int]("live_commit"))
    }
  }

  test("PARTITIONED: locked writer's commit fence aborts when a stage lands in the residue-check window") {
    val path = buildPart("fence")
    // the locked writer verifies p0 carries no residue and computes
    // its expected child commit; INSIDE the check→write window a
    // foreign child commit lands (an optimistic stager's unlocked
    // phase). The fenced child write must abort loudly instead of
    // merging on top — the unfenced behavior silently adopted the
    // stager's rows into the locked pin while the stager was told
    // (via its adopt CME) that it aborted.
    val childPath = path + "/p=p0"
    Scd1Merge.testHooks = Map("p-locked-fence-window" -> { () =>
      Scd1Merge.testHooks = Map.empty
      Scd1Merge.upsert(spark, childPath,
        Seq(("p0", 900L, "S_900")).toDF("part", "k", "v"), Seq("part", "k"))
    })
    val e = try intercept[java.util.ConcurrentModificationException] {
      PartitionedTable.upsert(spark, path, pbatch("p0", Seq(0L), "L"),
        Seq("part", "k"), "part")
    } finally Scd1Merge.testHooks = Map.empty
    assert(e.getMessage.contains("expected-commit fence"))
    // nothing adopted: pins unchanged, the foreign stage is invisible
    // unpinned residue, the locked writer's own row absent
    val t = PartitionedTable.readTable(spark, path)
    assert(t.filter($"k" === 0L).select("v").as[String].head() == "init_0")
    assert(t.filter($"k" === 900L).count() == 0)
    // the prescribed retry reconciles the residue away and lands
    PartitionedTable.upsert(spark, path, pbatch("p0", Seq(0L), "L2"),
      Seq("part", "k"), "part")
    val t2 = PartitionedTable.readTable(spark, path)
    assert(t2.filter($"k" === 0L).select("v").as[String].head() == "L2_0")
    assert(t2.filter($"k" === 900L).count() == 0,
      "the foreign stage was residue — restored away, never adopted")
    PartitionedTable.partitions(spark, path).collect().foreach { r =>
      assert(r.getAs[Int]("pinned_commit") == r.getAs[Int]("live_commit"))
    }
  }

  test("PARTITIONED: conflicted stager's NEW partition rolls back to nothing (no orphan dir to adopt)") {
    val path = buildPart("orphan")
    // B stages p1 (existing) + p9 (new); inside its unlocked window a
    // locked writer commits to p1 → B's adopt CMEs on the p1
    // footprint. The rollback must remove the p9 child B created: a
    // later p9 writer would otherwise regenerate the same
    // deterministic dir name and silently adopt B's aborted rows.
    Scd1Merge.testHooks = Map("p-optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      PartitionedTable.upsert(spark, path, pbatch("p1", Seq(10L), "W"),
        Seq("part", "k"), "part")
    })
    val src = Seq(("p1", 11L, "B_11"), ("p9", 900L, "B_900"))
      .toDF("part", "k", "v")
    try intercept[java.util.ConcurrentModificationException] {
      PartitionedTable.upsertMultiConcurrent(spark, path, src,
        Seq("part", "k"), Seq("part"))
    } finally Scd1Merge.testHooks = Map.empty
    assert(!Files.exists(Paths.get(path, "p=p9")),
      "aborted creator's orphan child dir must be deleted by the rollback")
    // a later ingest into p9 contains ONLY its own rows
    PartitionedTable.upsert(spark, path, pbatch("p9", Seq(901L), "C"),
      Seq("part", "k"), "part")
    val t = PartitionedTable.readTable(spark, path)
    assert(t.filter($"k" === 900L).count() == 0,
      "aborted batch's rows must not resurrect into the recreated partition")
    assert(t.filter($"k" === 901L).select("v").as[String].head() == "C_901")
    // B's p1 leg was restored under the locked writer's reconcile
    assert(t.filter($"k" === 11L).select("v").as[String].head() == "init_11")
    assert(t.filter($"k" === 10L).select("v").as[String].head() == "W_10")
  }

  test("PARTITIONED: orphan rollback stands down when the child lock is HELD (a same-named second stager mid-write keeps its files)") {
    val path = buildPart("orphanlock")
    // B stages p1 + NEW p9; the hook makes a locked writer defeat B
    // on p1 AND plants a LIVE foreign lease on the p9 child —
    // simulating a second optimistic stager that picked the same
    // deterministic child name and is mid-write holding only the
    // CHILD lock. The rollback's delete must probe that lock and
    // stand down: an unlocked delete would remove the in-flight
    // writer's data files.
    val p9Lock = Paths.get(path, "p=p9", "_graft_lock")
    Scd1Merge.testHooks = Map("p-optimistic-staged" -> { () =>
      Scd1Merge.testHooks = Map.empty
      PartitionedTable.upsert(spark, path, pbatch("p1", Seq(10L), "W"),
        Seq("part", "k"), "part")
      Files.write(p9Lock,
        s"mid-write-stager\t${System.currentTimeMillis() + 120000L}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    })
    val src = Seq(("p1", 11L, "B_11"), ("p9", 900L, "B_900"))
      .toDF("part", "k", "v")
    try intercept[java.util.ConcurrentModificationException] {
      PartitionedTable.upsertMultiConcurrent(spark, path, src,
        Seq("part", "k"), Seq("part"), lockWaitMillis = 1500L)
    } finally Scd1Merge.testHooks = Map.empty
    assert(Files.exists(Paths.get(path, "p=p9")),
      "a lock-held child must NOT be deleted — the holder's in-flight " +
      "files would go with it")
    assert(Files.exists(p9Lock), "the holder's lease must survive")
    // the holder "finishes" (releases); the orphan residue is then
    // inert: p9 is unpinned, and a later ingest picks a FRESH child
    // name (freshChildRel sees the dir), never adopting B's rows
    Files.deleteIfExists(p9Lock)
    PartitionedTable.upsert(spark, path, pbatch("p9", Seq(901L), "C"),
      Seq("part", "k"), "part")
    val t = PartitionedTable.readTable(spark, path)
    assert(t.filter($"k" === 900L).count() == 0,
      "aborted rows must not surface through the preserved orphan dir")
    assert(t.filter($"k" === 901L).select("v").as[String].head() == "C_901")
  }

  test("PARTITIONED: re-ingest after a partition DROP starts empty (fresh child dir; no resurrection)") {
    val path = buildPart("dropreuse")
    assert(PartitionedTable.dropPartitionsWhere(spark, path,
      $"part" === "p2") == 1)
    assert(PartitionedTable.readTable(spark, path)
      .filter($"part" === "p2").count() == 0)
    // the dropped child's tree stays on disk for lagging readers and
    // time travel — re-ingesting p2 must not merge into it
    PartitionedTable.upsert(spark, path, pbatch("p2", Seq(20L), "N"),
      Seq("part", "k"), "part")
    val p2 = PartitionedTable.readTable(spark, path).filter($"part" === "p2")
    assert(p2.count() == 1,
      s"dropped rows resurrected: ${p2.collect().toSeq}")
    assert(p2.select("v").as[String].head() == "N_20")
    // time travel across the drop still reads the OLD tree (2 parent
    // commits back = before the drop)
    assert(PartitionedTable.readTableAt(spark, path, 2)
      .filter($"part" === "p2").count() == 10)
  }
}
