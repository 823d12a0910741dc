package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Shallow-clone mechanics (Scd1Merge.cloneShallow): the zero-copy
  * claim, copy-on-write divergence, and GC safety in BOTH directions —
  * the clone must never be able to delete source files, and source
  * writes must not move the clone. */
class CloneSpec extends SparkSpecBase {

  private def freshPair(): (String, String) = {
    val root = Tmp.dir("clone_spec")
    (root + "/src", root + "/clone")
  }

  private def load(path: String): Unit = {
    import spark.implicits._
    val dim = (0 until 40).map(i => (i.toLong, s"name_$i", i % 5))
      .toDF("k", "name", "region")
    Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = 4)
  }

  test("clone is O(metadata): every bucket dir is a symlink, no parquet copied") {
    val (src, dst) = freshPair()
    load(src)
    Scd1Merge.cloneShallow(src, dst)
    val dataDirs = graft.merge.FsList.list(Paths.get(dst, "data"))
    assert(dataDirs.nonEmpty, "clone must reference the source buckets")
    assert(dataDirs.forall(Files.isSymbolicLink),
      s"expected only symlinks under clone/data, got ${dataDirs.map(_.getFileName)}")
    // same physical files: the clone's inputFiles resolve into the source
    val srcFiles = Scd1Merge.readTable(spark, src).inputFiles.toSet
    val cloneFiles = Scd1Merge.readTable(spark, dst).inputFiles
      .map(f => Paths.get(new java.net.URI(f).getPath).toRealPath().toString).toSet
    val srcReal = srcFiles
      .map(f => Paths.get(new java.net.URI(f).getPath).toRealPath().toString)
    assert(cloneFiles == srcReal, "clone must read the SAME files as the source")
  }

  test("copy-on-write divergence: clone upsert leaves the source bit-identical") {
    import spark.implicits._
    val (src, dst) = freshPair()
    load(src)
    val before = canon(Scd1Merge.readTable(spark, src))
    Scd1Merge.cloneShallow(src, dst)
    val batch = Seq((3L, "NAME_3_V2", 0), (100L, "newrow", 1))
      .toDF("k", "name", "region")
    Scd1Merge.upsert(spark, dst, batch, Seq("k"))
    assert(canon(Scd1Merge.readTable(spark, src)) == before,
      "a clone-side merge must not move the source")
    val got = Scd1Merge.readTable(spark, dst)
    assert(got.filter(col("k") === 3L).select("name").first().getString(0) == "NAME_3_V2")
    assert(got.count() == 41)
  }

  test("clone GC deletes only its symlinks — source files survive clone vacuum(0)") {
    import spark.implicits._
    val (src, dst) = freshPair()
    load(src)
    Scd1Merge.cloneShallow(src, dst)
    // rewrite EVERY bucket on the clone so all linked versions are replaced
    val all = (0 until 40).map(i => (i.toLong, s"rewritten_$i", i % 5))
      .toDF("k", "name", "region")
    Scd1Merge.upsert(spark, dst, all, Seq("k"))
    Scd1Merge.vacuum(dst, retain = 0)
    // clone is now standalone: no symlinks left, reads its own versions
    val left = graft.merge.FsList.list(Paths.get(dst, "data"))
    assert(left.nonEmpty && left.forall(p => !Files.isSymbolicLink(p)),
      s"vacuum(0) after a full rewrite must drop every symlink: ${left.map(_.getFileName)}")
    // and the SOURCE lost nothing
    assert(Scd1Merge.readTable(spark, src).count() == 40)
    assert(canon(Scd1Merge.readTable(spark, dst)) ==
      canon(all.select(col("k"), col("name"), col("region"))))
  }

  test("source writes after the clone are invisible to the clone (snapshot pin)") {
    import spark.implicits._
    val (src, dst) = freshPair()
    load(src)
    Scd1Merge.cloneShallow(src, dst)
    val batch = Seq((7L, "SRC_SIDE_V2", 2)).toDF("k", "name", "region")
    Scd1Merge.upsert(spark, src, batch, Seq("k"))
    val cloneRow = Scd1Merge.readTable(spark, dst)
      .filter(col("k") === 7L).select("name").first().getString(0)
    assert(cloneRow == "name_7",
      "the clone's manifest pins the cloned versions; source writes must not leak in")
  }

  test("clone dv naming never collides with the symlinked source dv (snapshot intact)") {
    import spark.implicits._
    val (src, dst) = freshPair()
    load(src) // src commit 1
    // src commit 2: soft-delete 5 keys -> src gets a dv under a
    // SOURCE-numbered name (dv_v2). The clone symlinks it but restarts
    // its own commit counter at 1, so a commit-numbered dv name on the
    // clone's next upsert would compute the SAME dv_v2 and clobber the
    // live/snapshot-referenced vector.
    Scd1Merge.deleteSoft(spark, src, Seq("k"), col("k") < 5)
    assert(Scd1Merge.readTable(spark, src).count() == 35)
    Scd1Merge.cloneShallow(src, dst) // clone commit 1, dv = symlink
    // clone commit 2: reinsert a TOMBSTONED key -> the pruned dv (4
    // keys) must land under a FRESH name, not overwrite the old one
    val batch = Seq((3L, "resurrected", 0)).toDF("k", "name", "region")
    Scd1Merge.upsert(spark, dst, batch, Seq("k"))
    assert(Scd1Merge.readTable(spark, dst).count() == 36,
      "live clone read: k=3 reinserted, 4 keys still tombstoned")
    // the snapshot BEFORE the reinsert still sees 35 rows — under the
    // collision it would read the pruned vector and resurrect k=3
    assert(Scd1Merge.readTableAt(spark, dst, 1).count() == 35,
      "clone snapshot pre-reinsert must still apply the 5-key dv")
    // and the SOURCE's dv was never touched
    assert(Scd1Merge.readTable(spark, src).count() == 35)
  }

  test("cloning a non-table or onto an existing table fails loudly") {
    val (src, dst) = freshPair()
    intercept[IllegalStateException] { Scd1Merge.cloneShallow(src, dst) }
    load(src)
    Scd1Merge.cloneShallow(src, dst)
    intercept[IllegalStateException] { Scd1Merge.cloneShallow(src, dst) }
  }
}
