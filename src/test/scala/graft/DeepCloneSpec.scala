package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Deep-clone mechanics (Scd1Merge.cloneDeep): full physical
  * independence — no symlinks, isolation in both directions, survival
  * of a full source vacuum (exactly where a shallow clone's retention
  * contract would dangle). */
class DeepCloneSpec extends SparkSpecBase {

  import spark.implicits._

  private def freshPair(): (String, String) = {
    val root = Tmp.dir("deep_clone_spec")
    (root + "/src", root + "/backup")
  }

  private def load(path: String): Unit = {
    val dim = (0 until 40).map(i => (i.toLong, s"name_$i", i % 5))
      .toDF("k", "name", "region")
    Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = 4)
  }

  test("deep clone copies bytes: no symlinks, disjoint physical files") {
    val (src, dst) = freshPair()
    load(src)
    Scd1Merge.cloneDeep(src, dst)
    val dataDirs = graft.merge.FsList.list(Paths.get(dst, "data"))
    assert(dataDirs.nonEmpty && dataDirs.forall(p => !Files.isSymbolicLink(p)),
      s"deep clone must copy, not link: ${dataDirs.map(_.getFileName)}")
    val srcFiles = Scd1Merge.readTable(spark, src).inputFiles
      .map(f => Paths.get(new java.net.URI(f).getPath).toRealPath().toString).toSet
    val dstFiles = Scd1Merge.readTable(spark, dst).inputFiles
      .map(f => Paths.get(new java.net.URI(f).getPath).toRealPath().toString).toSet
    assert(srcFiles.intersect(dstFiles).isEmpty,
      "deep clone must share NO physical files with the source")
    assert(canon(Scd1Merge.readTable(spark, dst)) ==
      canon(Scd1Merge.readTable(spark, src)))
  }

  test("the clone survives source mutation + full vacuum; writes are isolated both ways") {
    val (src, dst) = freshPair()
    load(src)
    Scd1Merge.deleteSoft(spark, src, Seq("k"), col("k") < 5) // live dv copies too
    val want = canon(Scd1Merge.readTable(spark, src))
    Scd1Merge.cloneDeep(src, dst)
    // mutate + fully vacuum the source underneath the clone
    Scd1Merge.delete(spark, src, Seq("k"), col("k") % 2 === 0)
    Scd1Merge.vacuum(src, retain = 0)
    assert(canon(Scd1Merge.readTable(spark, dst)) == want,
      "a deep clone must be untouched by source deletes and vacuum")
    // clone-side write invisible to the source
    Scd1Merge.upsert(spark, dst,
      Seq((100L, "bk_only", 1)).toDF("k", "name", "region"), Seq("k"))
    assert(Scd1Merge.readTable(spark, src).filter(col("k") === 100L).isEmpty)
    assert(Scd1Merge.readTable(spark, dst).filter(col("k") === 100L).count() == 1)
  }

  test("deep-cloning a shallow clone resolves links into real bytes") {
    val (src, shallow) = freshPair()
    val deep = shallow + "_deep"
    load(src)
    Scd1Merge.cloneShallow(src, shallow)
    Scd1Merge.cloneDeep(shallow, deep)
    val dataDirs = graft.merge.FsList.list(Paths.get(deep, "data"))
    assert(dataDirs.forall(p => !Files.isSymbolicLink(p)),
      "deep-of-shallow must materialize the linked dirs")
    // the deep copy outlives BOTH ancestors' data
    val want = canon(Scd1Merge.readTable(spark, deep))
    Scd1Merge.delete(spark, src, Seq("k"), lit(true))
    Scd1Merge.vacuum(src, retain = 0)
    assert(canon(Scd1Merge.readTable(spark, deep)) == want)
  }

  test("cloning a non-table or onto an existing table fails loudly") {
    val (src, dst) = freshPair()
    intercept[IllegalStateException] { Scd1Merge.cloneDeep(src, dst) }
    load(src)
    Scd1Merge.cloneDeep(src, dst)
    intercept[IllegalStateException] { Scd1Merge.cloneDeep(src, dst) }
  }
}
