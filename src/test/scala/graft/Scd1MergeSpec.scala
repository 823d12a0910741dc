package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** SCD1 merge semantics (Delta-MERGE parity, quirks Q3/Q8) and the
  * bucketed partial-rewrite commit. */
class Scd1MergeSpec extends SparkSpecBase {
  import spark.implicits._

  test("merge replaces matched rows, keeps unmatched, inserts new") {
    val target = Seq((1L, "old1"), (2L, "old2")).toDF("k", "v")
    val source = Seq((2L, "new2"), (3L, "new3")).toDF("k", "v")
    assert(canon(Scd1Merge.merge(target, source, Seq("k"))) ==
      Seq(Seq("1", "old1"), Seq("2", "new2"), Seq("3", "new3")))
  }

  test("merge is idempotent: replaying the same source changes nothing") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val source = Seq((2L, "b2"), (3L, "c")).toDF("k", "v")
    val once = Scd1Merge.merge(target, source, Seq("k"))
    val twice = Scd1Merge.merge(once, source, Seq("k"))
    assertSameRows(once, twice)
  }

  test("Q8: duplicate source keys abort the merge (Delta multiple-match parity)") {
    val target = Seq((1L, "a")).toDF("k", "v")
    val dupSource = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Scd1Merge.merge(target, dupSource, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate source rows"))
    // unique keys sail through the same plan
    val ok = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    assert(Scd1Merge.merge(target, ok, Seq("k")).count() == 2)
  }

  /** Live bucket → dir entries from the manifest: the commit unit —
    * an entry changes iff its bucket was rewritten. */
  private def manifestEntries(path: String): Map[String, String] =
    Files.readAllLines(Paths.get(path, "_graft_manifest")).asScala.toSeq
      .filter(_.contains("\t")) // bucket entries; skip nb=/commit=/keys= meta lines
      .map { l => val f = l.split("\t"); f(0) -> f(1) }.toMap // 3rd field = stats

  test("upsert rewrites only the buckets the source batch touches") {
    val path = Tmp.dir("scd1_bucket") + "/t"
    val initial = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    // explicit numBuckets: adaptive sizing would give this tiny table
    // few buckets; 32 makes the bounded-rewrite assertion sharp
    Scd1Merge.upsert(spark, path, initial, Seq("k"), numBuckets = 32)
    val before = manifestEntries(path)
    assert(before.size > 10, "initial load should span many buckets")

    val batch = Seq((1L, "v1x"), (501L, "v501x")).toDF("k", "v")
    Scd1Merge.upsert(spark, path, batch, Seq("k"))
    val after = manifestEntries(path)

    val changed = after.filter { case (b, d) => before.get(b).exists(_ != d) }.keySet
    assert(changed.size <= 2, s"a 2-row batch must touch <=2 buckets, rewrote: $changed")
    assert(after.keySet == before.keySet, "untouched buckets keep their versions")

    // content is the merged table
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 1000)
    assert(canon(got.filter($"k".isin(1L, 501L, 2L))) ==
      Seq(Seq("1", "v1x"), Seq("2", "v2"), Seq("501", "v501x")))
  }

  test("crash BEFORE the manifest swap: reader sees the old table, retry recovers") {
    val path = Tmp.dir("scd1_kill1") + "/t"
    Scd1Merge.upsert(spark, path,
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), Seq("k"), numBuckets = 8)
    val before = canon(Scd1Merge.readTable(spark, path))
    val beforeManifest = manifestEntries(path)

    Scd1Merge.testFailpoint = "before-manifest"
    val batch = Seq((1L, "CRASH"), (50L, "CRASH")).toDF("k", "v")
    intercept[IllegalStateException] {
      Scd1Merge.upsert(spark, path, batch, Seq("k"))
    }
    // bucket versions were written but never referenced: the table is
    // byte-for-byte the OLD one — never a mix
    assert(manifestEntries(path) == beforeManifest)
    assert(canon(Scd1Merge.readTable(spark, path)) == before)

    // retry (single writer back up): garbage swept, commit completes
    Scd1Merge.upsert(spark, path, batch, Seq("k"))
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 100)
    assert(canon(got.filter($"k".isin(1L, 50L))) ==
      Seq(Seq("1", "CRASH"), Seq("50", "CRASH")))
  }

  test("crash AFTER the manifest swap: reader sees the new table; leftovers swept") {
    val path = Tmp.dir("scd1_kill2") + "/t"
    Scd1Merge.upsert(spark, path,
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), Seq("k"), numBuckets = 8)

    Scd1Merge.testFailpoint = "after-manifest"
    val batch = Seq((7L, "NEW")).toDF("k", "v")
    intercept[IllegalStateException] {
      Scd1Merge.upsert(spark, path, batch, Seq("k"))
    }
    // the swap is THE commit point: post-swap crash must expose the new
    // content even though the replaced version dir was not yet deleted
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 100)
    assert(canon(got.filter($"k" === 7L)) == Seq(Seq("7", "NEW")))

    // next upsert stays correct; retained history (for lagging readers)
    // is the ONLY unreferenced state left, and vacuum(0) reclaims it
    Scd1Merge.upsert(spark, path, Seq((101L, "X")).toDF("k", "v"), Seq("k"))
    assert(Scd1Merge.readTable(spark, path).count() == 101)
    Scd1Merge.vacuum(path, retain = 0)
    val referenced = manifestEntries(path).values.toSet
    val onDisk = graft.merge.FsList.list(Paths.get(path, "data")).iterator
      .map(d => s"data/${d.getFileName}").toSet
    assert(onDisk == referenced, "after vacuum(0) every on-disk version dir is referenced")
  }

  test("upsert migrates a legacy __bucket= partitioned table via a manifest write") {
    val path = Tmp.dir("scd1_legacypart") + "/t"
    // simulate the pre-manifest bucketed layout: partitioned dirs + meta
    (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v")
      .withColumn("__bucket", pmod(hash($"k"), lit(8)))
      .write.partitionBy("__bucket").parquet(path)
    Files.write(Paths.get(path, "_graft_buckets"), "8".getBytes)
    Scd1Merge.upsert(spark, path, Seq((1L, "v1x"), (51L, "new")).toDF("k", "v"), Seq("k"))
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 51)
    assert(canon(got.filter($"k".isin(1L, 51L))) ==
      Seq(Seq("1", "v1x"), Seq("51", "new")))
    // migrated: live dirs are manifest-tracked; a legacy dir survives
    // only while its bucket is untouched
    assert(manifestEntries(path).nonEmpty)
  }

  test("upsert inserts new keys and is idempotent across replays") {
    val path = Tmp.dir("scd1_replay") + "/t"
    val initial = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Scd1Merge.upsert(spark, path, initial, Seq("k"))
    val batch = Seq((2L, "b2"), (3L, "c")).toDF("k", "v")
    Scd1Merge.upsert(spark, path, batch, Seq("k"))
    Scd1Merge.upsert(spark, path, batch, Seq("k")) // replay: no-op
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "a"), Seq("2", "b2"), Seq("3", "c")))
  }

  test("upsert migrates a legacy flat (pre-bucketing) table in place") {
    val path = Tmp.dir("scd1_legacy") + "/t"
    // simulate a table written before the bucketed layout existed
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.parquet(path)
    Scd1Merge.upsert(spark, path, Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), Seq("k"))
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "a"), Seq("2", "b2"), Seq("3", "c")))
    // migrated: next upsert takes the bucketed partial-rewrite path
    assert(manifestEntries(path).nonEmpty)
    Scd1Merge.upsert(spark, path, Seq((4L, "d")).toDF("k", "v"), Seq("k"))
    assert(Scd1Merge.readTable(spark, path).count() == 4)
  }

  test("explicit numBuckets conflicting with the stored layout is an error") {
    val path = Tmp.dir("scd1_nbconflict") + "/t"
    Scd1Merge.upsert(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 8)
    assertThrows[IllegalArgumentException] {
      Scd1Merge.upsert(spark, path, Seq((2L, "b")).toDF("k", "v"), Seq("k"), numBuckets = 16)
    }
  }

  test("evolveSchema: added column joins the table; untouched buckets null-fill") {
    val path = Tmp.dir("scd1_evo") + "/t"
    Scd1Merge.upsert(spark, path,
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), Seq("k"), numBuckets = 8)
    val before = manifestEntries(path)
    val batch = Seq((1L, "v1x", 42L)).toDF("k", "v", "extra")
    Scd1Merge.upsert(spark, path, batch, Seq("k"), evolveSchema = true)
    // only the touched bucket rewrote — evolution does NOT rewrite the table
    val after = manifestEntries(path)
    assert(after.count { case (b, d) => before.get(b).exists(_ != d) } == 1)
    val got = Scd1Merge.readTable(spark, path)
    assert(got.count() == 100)
    assert(got.filter($"k" === 1L).first().getAs[Long]("extra") == 42L)
    assert(got.filter($"k" === 2L).first().isNullAt(got.columns.indexOf("extra")),
      "rows predating the column must null-fill")
    // strict mode still fails loudly when the source DROPS a column
    intercept[org.apache.spark.sql.AnalysisException] {
      Scd1Merge.upsert(spark, path, Seq((3L, 7L)).toDF("k", "extra"), Seq("k"))
    }
  }

  test("upsert of an empty batch leaves the table untouched") {
    val path = Tmp.dir("scd1_empty") + "/t"
    Scd1Merge.upsert(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    val before = manifestEntries(path)
    Scd1Merge.upsert(spark, path, Seq.empty[(Long, String)].toDF("k", "v"), Seq("k"))
    assert(manifestEntries(path) == before)
  }

  // ---------------- reader isolation / retention ----------------

  test("a reader holding the pre-upsert snapshot survives a concurrent upsert") {
    val path = Tmp.dir("scd1_snap") + "/t"
    Scd1Merge.upsert(spark, path,
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), Seq("k"), numBuckets = 4)
    val before = canon(Scd1Merge.readTable(spark, path))
    // reader resolves the table (manifest + file listing happen HERE)
    val snapshot = Scd1Merge.readTable(spark, path)
    // a concurrent writer replaces every bucket
    Scd1Merge.upsert(spark, path,
      (1L to 100L).map(i => (i, s"NEW$i")).toDF("k", "v"), Seq("k"))
    // the lagging reader materializes AFTER the commit: with the
    // replaced versions retained, it must see its full OLD snapshot —
    // not a FileNotFoundException, not a mix
    assert(canon(snapshot) == before)
    // a fresh reader sees the new table
    assert(canon(Scd1Merge.readTable(spark, path).filter($"k" === 1L)) ==
      Seq(Seq("1", "NEW1")))
  }

  test("retention keeps exactly the last retainVersions; vacuum ages the rest out") {
    val path = Tmp.dir("scd1_retain") + "/t"
    def bucketDirs: Set[String] =
      graft.merge.FsList.list(Paths.get(path, "data")).iterator
        .map(_.getFileName.toString).toSet
    // 3 commits all touching the same single bucket
    Scd1Merge.upsert(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"), numBuckets = 1)
    Scd1Merge.upsert(spark, path, Seq((1L, "b")).toDF("k", "v"), Seq("k"))
    Scd1Merge.upsert(spark, path, Seq((1L, "c")).toDF("k", "v"), Seq("k"))
    // live v2 + one retained (v1); v0 aged out by the default window
    assert(bucketDirs == Set("b0_v2", "b0_v1"))
    Scd1Merge.vacuum(path, retain = 0)
    assert(bucketDirs == Set("b0_v2"))
    assert(canon(Scd1Merge.readTable(spark, path)) == Seq(Seq("1", "c")))
  }

  test("readTableAt reconstructs retained snapshots; vacuumed history throws loudly") {
    val path = Tmp.dir("scd1_tt") + "/t"
    Scd1Merge.upsert(spark, path, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      Seq("k"), numBuckets = 1, retainVersions = 2)
    Scd1Merge.upsert(spark, path, Seq((1L, "a2")).toDF("k", "v"),
      Seq("k"), retainVersions = 2)
    Scd1Merge.upsert(spark, path, Seq((3L, "c")).toDF("k", "v"),
      Seq("k"), retainVersions = 2)
    assert(canon(Scd1Merge.readTableAt(spark, path, 2)) ==
      Seq(Seq("1", "a"), Seq("2", "b")))
    assert(canon(Scd1Merge.readTableAt(spark, path, 1)) ==
      Seq(Seq("1", "a2"), Seq("2", "b")))
    assert(canon(Scd1Merge.readTableAt(spark, path, 0)) ==
      Seq(Seq("1", "a2"), Seq("2", "b"), Seq("3", "c")))
    // beyond the table's history: loud, never a partial read
    intercept[IllegalStateException] { Scd1Merge.readTableAt(spark, path, 3) }
    // vacuum(0) collapses the window to the live commit
    Scd1Merge.vacuum(path, retain = 0)
    intercept[IllegalStateException] { Scd1Merge.readTableAt(spark, path, 1) }
    assert(canon(Scd1Merge.readTableAt(spark, path, 0)) ==
      Seq(Seq("1", "a2"), Seq("2", "b"), Seq("3", "c")))
  }

  test("readChanges tags inserts/updates/deletes between snapshots; unchanged buckets pruned") {
    val path = Tmp.dir("scd1_cdf") + "/t"
    Scd1Merge.upsert(spark, path,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      Seq("k"), numBuckets = 4, retainVersions = 2)
    Scd1Merge.upsert(spark, path, Seq((2L, "b2"), (4L, "d")).toDF("k", "v"),
      Seq("k"), retainVersions = 2)
    val feed = Scd1Merge.readChanges(spark, path, Seq("k"), fromCommitsBack = 1)
    assert(canon(feed.select("k", "v", "_change_type")) == Seq(
      Seq("2", "b", "update_preimage"), // OLD image of the updated key
      Seq("2", "b2", "update"),         // new image (Delta postimage)
      Seq("4", "d", "insert")))
    // manifest-diff pruning: the feed's scans touch ONLY the buckets
    // commit 2 rewrote (keys 2 and 4 → ≤2 buckets, ×2 sides), never
    // all 4 buckets' dirs on both sides
    val scannedDirs = feed.inputFiles
      .map(f => java.nio.file.Paths.get(new java.net.URI(f)).getParent.getFileName.toString)
      .toSet
    assert(scannedDirs.size <= 4,
      s"feed must read only changed buckets' versions, scanned: $scannedDirs")
    // DELETE: the feed carries the deleted row's OLD image
    assert(Scd1Merge.delete(spark, path, Seq("k"), $"k" === 3L,
      retainVersions = 2) == 1L)
    val feed2 = Scd1Merge.readChanges(spark, path, Seq("k"), fromCommitsBack = 1)
      .select("k", "v", "_change_type")
    assert(canon(feed2) == Seq(Seq("3", "c", "delete")))
    // and the table content reflects the delete; a snapshot read still
    // reconstructs the pre-delete state
    assert(canon(Scd1Merge.readTable(spark, path).select("k")) ==
      Seq(Seq("1"), Seq("2"), Seq("4")))
    assert(Scd1Merge.readTableAt(spark, path, 1).count() == 4)
    // NULL predicate rows are kept (SQL DELETE semantics)
    val path3 = Tmp.dir("scd1_del_null") + "/t"
    Scd1Merge.upsert(spark, path3,
      Seq((1L, Some("x")), (2L, Option.empty[String])).toDF("k", "v"), Seq("k"))
    assert(Scd1Merge.delete(spark, path3, Seq("k"), $"v" =!= "x") == 0L)
    assert(Scd1Merge.readTable(spark, path3).count() == 2)
  }

  test("update applies SET to matching rows only; keys immutable; NULL predicate = no-op; CDF sees preimages") {
    val path = Tmp.dir("scd1_upd") + "/t"
    Scd1Merge.upsert(spark, path,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L), (4L, Option.empty[String].orNull, 40L))
        .toDF("k", "grp", "amt"),
      Seq("k"), numBuckets = 4, retainVersions = 2)
    // two rows match; NULL grp row (predicate NULL) untouched
    assert(Scd1Merge.update(spark, path, Seq("k"), $"grp" === "a",
      Map("amt" -> ($"amt" + 1000L)), retainVersions = 2) == 2L)
    assert(canon(Scd1Merge.readTable(spark, path).select("k", "amt")) == Seq(
      Seq("1", "1010"), Seq("2", "20"), Seq("3", "1030"), Seq("4", "40")))
    // the change feed carries pre/post images of exactly the updated keys
    val feed = Scd1Merge.readChanges(spark, path, Seq("k"), fromCommitsBack = 1)
      .select("k", "amt", "_change_type")
    assert(canon(feed) == Seq(
      Seq("1", "10", "update_preimage"), Seq("1", "1010", "update"),
      Seq("3", "1030", "update"), Seq("3", "30", "update_preimage")))
    // SETting a merge key is a loud error, not a silent bucket scatter
    intercept[IllegalArgumentException] {
      Scd1Merge.update(spark, path, Seq("k"), lit(true), Map("k" -> lit(9L)))
    }
    // no matching rows -> no commit (version unchanged)
    val before = Scd1Merge.tableCommit(path)
    assert(Scd1Merge.update(spark, path, Seq("k"), $"grp" === "zzz",
      Map("amt" -> lit(0L))) == 0L)
    assert(Scd1Merge.tableCommit(path) == before)
  }

  test("rebucket re-cuts the bucket space; content identical; snapshots cross it") {
    val path = Tmp.dir("scd1_rebkt") + "/t"
    Scd1Merge.upsert(spark, path,
      (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v"),
      Seq("k"), numBuckets = 2, retainVersions = 2)
    val before = canon(Scd1Merge.readTable(spark, path))
    Scd1Merge.rebucket(spark, path, Seq("k"), 8, retainVersions = 2)
    val entries = manifestEntries(path)
    assert(entries.size > 2 && entries.size <= 8,
      s"expected up to 8 new buckets, got ${entries.size}")
    assert(canon(Scd1Merge.readTable(spark, path)) == before)
    // the pre-rebucket snapshot still reconstructs
    assert(canon(Scd1Merge.readTableAt(spark, path, 1)) == before)
    // the new layout accepts upserts declared at the new count, and
    // still rejects a mismatched declaration (pointing at rebucket)
    Scd1Merge.upsert(spark, path, Seq((201L, "w")).toDF("k", "v"),
      Seq("k"), numBuckets = 8)
    assert(Scd1Merge.readTable(spark, path).count() == 201)
    val e = intercept[IllegalArgumentException] {
      Scd1Merge.upsert(spark, path, Seq((202L, "x")).toDF("k", "v"),
        Seq("k"), numBuckets = 2)
    }
    assert(e.getMessage.contains("rebucket"))
  }

  // ---------------- writer mutual exclusion ----------------

  test("a second writer interleaving with a commit fails loudly; the holder's commit stands") {
    val path = Tmp.dir("scd1_lock1") + "/t"
    Scd1Merge.upsert(spark, path, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    // the loser fires INSIDE the winner's critical section, right
    // before the manifest swap — the classic interleave that would
    // lose one writer's buckets without mutual exclusion
    var loser: Option[Throwable] = None
    Scd1Merge.testHooks = Map("before-manifest" -> { () =>
      loser = Some(intercept[IllegalStateException] {
        Scd1Merge.upsert(spark, path, Seq((2L, "LOSER")).toDF("k", "v"), Seq("k"))
      })
    })
    try Scd1Merge.upsert(spark, path, Seq((1L, "WINNER")).toDF("k", "v"), Seq("k"))
    finally Scd1Merge.testHooks = Map.empty
    assert(loser.exists(_.getMessage.contains("locked by concurrent writer")))
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "WINNER"), Seq("2", "b")))
    // lock released with the commit: the next writer proceeds
    Scd1Merge.upsert(spark, path, Seq((3L, "c")).toDF("k", "v"), Seq("k"))
    assert(Scd1Merge.readTable(spark, path).count() == 3)
  }

  test("an unexpired foreign lease blocks; an expired one is taken over") {
    val path = Tmp.dir("scd1_lock2") + "/t"
    Scd1Merge.upsert(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    val lock = Paths.get(path, "_graft_lock")
    // live foreign writer (lease far in the future): fail loudly
    Files.write(lock, s"other-writer\t${System.currentTimeMillis() + 3600000}".getBytes)
    val e = intercept[IllegalStateException] {
      Scd1Merge.upsert(spark, path, Seq((1L, "x")).toDF("k", "v"), Seq("k"))
    }
    assert(e.getMessage.contains("other-writer"))
    assert(canon(Scd1Merge.readTable(spark, path)) == Seq(Seq("1", "a")))
    // crashed writer (lease expired): next writer takes the lock over
    Files.write(lock, s"dead-writer\t${System.currentTimeMillis() - 1000}".getBytes)
    Scd1Merge.upsert(spark, path, Seq((1L, "y")).toDF("k", "v"), Seq("k"))
    assert(canon(Scd1Merge.readTable(spark, path)) == Seq(Seq("1", "y")))
    assert(!Files.exists(lock), "lease released after commit")
  }

  test("a lease lost mid-write aborts BEFORE the manifest swap") {
    val path = Tmp.dir("scd1_lock3") + "/t"
    Scd1Merge.upsert(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    // simulate lease expiry + takeover while our bucket write ran: at
    // the before-manifest point, the lock suddenly belongs to another
    // writer — our commit must abort without swapping
    val lock = Paths.get(path, "_graft_lock")
    Scd1Merge.testHooks = Map("before-manifest" -> { () =>
      Files.write(lock,
        s"usurper\t${System.currentTimeMillis() + 3600000}".getBytes)
    })
    try {
      val e = intercept[IllegalStateException] {
        Scd1Merge.upsert(spark, path, Seq((1L, "OVERRUN")).toDF("k", "v"), Seq("k"))
      }
      assert(e.getMessage.contains("lost mid-commit"))
    } finally {
      Scd1Merge.testHooks = Map.empty
      Files.deleteIfExists(lock) // the "usurper's" lease
    }
    assert(canon(Scd1Merge.readTable(spark, path)) == Seq(Seq("1", "a")),
      "aborted commit must leave the table untouched")
    // and the table still works
    Scd1Merge.upsert(spark, path, Seq((2L, "b")).toDF("k", "v"), Seq("k"))
    assert(Scd1Merge.readTable(spark, path).count() == 2)
  }

  test("a CDC batch whose deletes empty EVERY bucket keeps a readable table") {
    val path = Tmp.dir("scd1_cdcempty") + "/t"
    Scd1Merge.upsert(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    Scd1Merge.applyCdc(spark, path,
      Seq((1L, "a", "delete"), (2L, "b", "delete")).toDF("k", "v", "_op"),
      Seq("k"))
    val t = Scd1Merge.readTable(spark, path)
    assert(t.columns.toSeq == Seq("k", "v") && t.count() == 0)
    Scd1Merge.upsert(spark, path, Seq((3L, "c")).toDF("k", "v"), Seq("k"))
    assert(canon(Scd1Merge.readTable(spark, path)) == Seq(Seq("3", "c")))
  }

  test("CREATE from an empty source: schema-bearing table, readable and upsertable") {
    val path = Tmp.dir("scd1_emptycreate") + "/t"
    Scd1Merge.upsert(spark, path,
      Seq((1L, "a")).toDF("k", "v").limit(0), Seq("k"), numBuckets = 3)
    assert(Scd1Merge.tableExists(path))
    val t = Scd1Merge.readTable(spark, path)
    assert(t.columns.toSeq == Seq("k", "v") && t.count() == 0)
    Scd1Merge.upsert(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    assert(canon(Scd1Merge.readTable(spark, path)) == Seq(Seq("1", "a")))
  }

  // ---------------- interrupted FIRST commits ----------------

  test("crash before the FIRST manifest (initial create): no phantom table, retry clean") {
    val path = Tmp.dir("scd1_initcrash") + "/t"
    Scd1Merge.testFailpoint = "before-manifest"
    intercept[IllegalStateException] {
      Scd1Merge.upsert(spark, path, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    }
    // bucket data landed under data/ but no manifest: that is NOT a
    // table — not for existence probes, not for readers
    assert(Files.exists(Paths.get(path, "data")))
    assert(!Scd1Merge.tableExists(path))
    intercept[IllegalStateException] { Scd1Merge.readTable(spark, path) }
    // retry sweeps the residue and commits
    Scd1Merge.upsert(spark, path, Seq((1L, "a2")).toDF("k", "v"), Seq("k"))
    assert(canon(Scd1Merge.readTable(spark, path)) == Seq(Seq("1", "a2")))
  }

  test("crash mid flat-table migration: reader sees the OLD flat table, retry does not duplicate") {
    val path = Tmp.dir("scd1_migcrash") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(path)
    Scd1Merge.testFailpoint = "before-manifest"
    intercept[IllegalStateException] {
      Scd1Merge.upsert(spark, path, Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), Seq("k"))
    }
    // data/ holds the full uncommitted rewrite NEXT TO the flat files —
    // reading both would duplicate every row; classification must
    // serve the flat (committed) content only
    assert(Files.exists(Paths.get(path, "data")))
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "a"), Seq("2", "b")))
    // retry migrates for real, exactly once
    Scd1Merge.upsert(spark, path, Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), Seq("k"))
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "a"), Seq("2", "b2"), Seq("3", "c")))
  }

  // ---------------- compaction ----------------

  test("compact coalesces fragmented buckets; content identical; kill-point safe") {
    val path = Tmp.dir("scd1_compact") + "/t"
    // fragment legitimately: a low maxRecordsPerFile makes the commit
    // write many small files per bucket (what bounding file sizes on a
    // real 100 TB table does)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", 10)
    try Scd1Merge.upsert(spark, path,
      (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val before = canon(Scd1Merge.readTable(spark, path))
    def files(): Long = graft.merge.FsList.walk(Paths.get(path, "data")).iterator
      .count(_.getFileName.toString.endsWith(".parquet"))
    val fragmented = files()
    assert(fragmented > 2, s"setup must fragment (got $fragmented files)")

    // kill-point: crash before the manifest swap → table unchanged
    Scd1Merge.testFailpoint = "before-manifest"
    intercept[IllegalStateException] { Scd1Merge.compact(spark, path) }
    assert(canon(Scd1Merge.readTable(spark, path)) == before)

    // real run: both buckets rewrite to ~one file each, content equal
    assert(Scd1Merge.compact(spark, path) == 2)
    Scd1Merge.vacuum(path, retain = 0) // count only live files
    assert(files() == 2, s"expected 1 file per bucket, got ${files()}")
    assert(canon(Scd1Merge.readTable(spark, path)) == before)
    // idempotent: nothing fragmented → no commit at all
    val manifestBefore = manifestEntries(path)
    assert(Scd1Merge.compact(spark, path) == 0)
    assert(manifestEntries(path) == manifestBefore)
  }

  test("heartbeat keeps a longer-than-the-lease commit alive; dead writers still expire") {
    val path = Tmp.dir("scd1_hb") + "/t"
    Scd1Merge.upsert(spark, path, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    val prevLease = Scd1Merge.lockLeaseMillis
    // far below the stalled commit below, but with ~2 s of scheduler-
    // starvation tolerance (lease − period): the 300 ms/1.2 s version
    // of this test flaked once under full-suite load when the daemon
    // heartbeat thread starved past the lease
    Scd1Merge.lockLeaseMillis = 3000
    // stall INSIDE the critical section for several lease lengths; a
    // concurrent writer probing mid-stall must see a LIVE (heartbeat-
    // extended) lease and fail loudly instead of taking over — without
    // the heartbeat this exact interleave aborted the outer commit
    var probed: Option[Throwable] = None
    Scd1Merge.testHooks = Map("before-manifest" -> { () =>
      Thread.sleep(7000)
      probed = Some(intercept[IllegalStateException] {
        Scd1Merge.upsert(spark, path, Seq((2L, "USURPER")).toDF("k", "v"), Seq("k"))
      })
    })
    try Scd1Merge.upsert(spark, path, Seq((1L, "SLOW")).toDF("k", "v"), Seq("k"))
    finally { Scd1Merge.testHooks = Map.empty; Scd1Merge.lockLeaseMillis = prevLease }
    assert(probed.exists(_.getMessage.contains("locked by concurrent writer")),
      s"mid-stall probe should have been locked out, got $probed")
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "SLOW"), Seq("2", "b")), "the slow commit must SUCCEED")
    // a genuinely dead writer has no heartbeat: its stale lease is
    // still taken over (the takeover path is untouched)
    val lock = Paths.get(path, "_graft_lock")
    Files.write(lock, s"dead-writer\t${System.currentTimeMillis() - 1000}".getBytes)
    Scd1Merge.upsert(spark, path, Seq((3L, "c")).toDF("k", "v"), Seq("k"))
    assert(Scd1Merge.readTable(spark, path).count() == 3)
  }

  test("vacuum() default keeps the reader-isolation window; retain=0 is the explicit opt-out") {
    val path = Tmp.dir("scd1_vacdef") + "/t"
    Scd1Merge.upsert(spark, path, Seq((1L, "v1")).toDF("k", "v"), Seq("k"), numBuckets = 2)
    Scd1Merge.upsert(spark, path, Seq((1L, "v2")).toDF("k", "v"), Seq("k"))
    // routine maintenance: the last snapshot must stay readable
    Scd1Merge.vacuum(path)
    assert(canon(Scd1Merge.readTableAt(spark, path, 1)) == Seq(Seq("1", "v1")),
      "default vacuum must not drop the retained snapshot")
    assert(canon(Scd1Merge.readTable(spark, path)) == Seq(Seq("1", "v2")))
    // full reclaim is the explicit call
    Scd1Merge.vacuum(path, retain = 0)
    intercept[IllegalStateException] { Scd1Merge.readTableAt(spark, path, 1) }
    assert(canon(Scd1Merge.readTable(spark, path)) == Seq(Seq("1", "v2")))
  }

  test("restore rewinds state as a NEW commit; table stays live; feed is the reverse diff") {
    val path = Tmp.dir("scd1_restore") + "/t"
    Scd1Merge.upsert(spark, path, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      Seq("k"), numBuckets = 2, retainVersions = 3)
    Scd1Merge.upsert(spark, path, Seq((1L, "a2")).toDF("k", "v"),
      Seq("k"), retainVersions = 3)
    Scd1Merge.upsert(spark, path, Seq((3L, "c")).toDF("k", "v"),
      Seq("k"), retainVersions = 3)
    // restore to commit 1: content rewinds, commit counter ADVANCES
    assert(Scd1Merge.restore(path, commitsBack = 2, retainVersions = 3) == 4)
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "a"), Seq("2", "b")))
    assert(Scd1Merge.tableCommit(path).contains(4))
    assert(Scd1Merge.tableBatchId(path).contains("restore-to-commit-1"))
    // the feed across the restore commit is the reverse diff of the
    // undone commits: 3's insert comes back as a delete, 2's update
    // as an update back to the old image
    assert(canon(Scd1Merge.readChanges(spark, path, Seq("k"), 1)
        .select("k", "v", "_change_type")) == Seq(
      Seq("1", "a", "update"), Seq("1", "a2", "update_preimage"),
      Seq("3", "c", "delete")))
    // restored table is live: a further upsert works and snapshots hold
    Scd1Merge.upsert(spark, path, Seq((2L, "b2")).toDF("k", "v"),
      Seq("k"), retainVersions = 3)
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "a"), Seq("2", "b2")))
    assert(canon(Scd1Merge.readTableAt(spark, path, 1)) ==
      Seq(Seq("1", "a"), Seq("2", "b")))
    // crash BEFORE the restore's manifest swap: live state untouched
    Scd1Merge.testFailpoint = "before-manifest"
    intercept[IllegalStateException] { Scd1Merge.restore(path, 1) }
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "a"), Seq("2", "b2")))
    // restoring past the retention horizon fails loudly
    Scd1Merge.vacuum(path, retain = 0)
    intercept[IllegalStateException] { Scd1Merge.restore(path, 1) }
    assert(canon(Scd1Merge.readTable(spark, path)) ==
      Seq(Seq("1", "a"), Seq("2", "b2")))
  }

  test("a DELETE that empties EVERY bucket keeps a readable, re-writable table") {
    val path = graft.Tmp.dir("scd1_empty") + "/t"
    Scd1Merge.upsert(spark, path,
      (1 to 20).map(i => (i.toLong, s"v$i")).toDF("k", "v"), Seq("k"),
      numBuckets = 4)
    assert(Scd1Merge.delete(spark, path, Seq("k"), lit(true)) == 20L)
    // empty but schema-bearing: count, filter, and schema all work
    val empty = Scd1Merge.readTable(spark, path)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("k", "v"))
    assert(Scd1Merge.readTableWhere(spark, path, $"k" > 5).count() == 0L)
    // time travel still reaches the pre-delete snapshot
    assert(Scd1Merge.readTableAt(spark, path, 1).count() == 20L)
    // the table stays writable: a fresh upsert re-populates
    Scd1Merge.upsert(spark, path, Seq((7L, "back")).toDF("k", "v"), Seq("k"))
    assert(canon(Scd1Merge.readTable(spark, path)) == Seq(Seq("7", "back")))
    // the optimistic path hits the same edge
    assert(Scd1Merge.deleteConcurrent(spark, path, Seq("k"), lit(true)) == 1L)
    assert(Scd1Merge.readTable(spark, path).count() == 0L)
    assert(Scd1Merge.readTable(spark, path).columns.toSeq == Seq("k", "v"))
  }
}
