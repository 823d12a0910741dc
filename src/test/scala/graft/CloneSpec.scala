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
    val dataDirs = Files.list(Paths.get(dst, "data")).iterator().asScala.toSeq
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
    val left = Files.list(Paths.get(dst, "data")).iterator().asScala.toSeq
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

  test("cloning a non-table or onto an existing table fails loudly") {
    val (src, dst) = freshPair()
    intercept[IllegalStateException] { Scd1Merge.cloneShallow(src, dst) }
    load(src)
    Scd1Merge.cloneShallow(src, dst)
    intercept[IllegalStateException] { Scd1Merge.cloneShallow(src, dst) }
  }
}
