package graft

import graft.merge.Scd1Merge
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Within-bucket clustering maintenance: content fidelity through the
  * commit protocol, crash safety at the manifest failpoint, and the
  * physical point of it — sorted buckets produce parquet row groups
  * with NARROW, ordered min/max footprints on the clustering columns,
  * where the unclustered write's row groups each span the full domain.
  */
class ReclusterSpec extends SparkSpecBase {

  // two independent-ish uniform columns over [0,1000)
  private def src = spark.range(0, 200000)
    .select(col("id"),
      (col("id") * 541 % 1000).as("x"),
      (col("id") * 7919 % 1000).as("y"))

  /** Per-row-group (min, max) of int64 column `c` across every parquet
    * file under the table's live bucket dirs. */
  private def rowGroupRanges(tablePath: String, c: String): Seq[(Long, Long)] = {
    val files = graft.merge.FsList.walk(Paths.get(tablePath, "data")).iterator
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    files.flatMap { f =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
        new HPath(f.toString), spark.sparkContext.hadoopConfiguration))
      try rd.getFooter.getBlocks.asScala.toSeq.map { b =>
        val cc = b.getColumns.asScala
          .find(_.getPath.toDotString == c).get.getStatistics
        (cc.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
          cc.genericGetMax.asInstanceOf[java.lang.Long].longValue())
      } finally rd.close()
    }
  }

  test("recluster keeps content, bumps the commit, survives a pre-manifest crash") {
    val path = Tmp.dir("recluster_basic") + "/t"
    Scd1Merge.upsert(spark, path, src, Seq("id"), numBuckets = 4)
    val before = canon(Scd1Merge.readTable(spark, path))
    Scd1Merge.recluster(spark, path, Seq("x"))
    assert(canon(Scd1Merge.readTable(spark, path)) == before)
    // crash before the manifest swap: table content must be untouched
    Scd1Merge.testFailpoint = "before-manifest"
    try intercept[IllegalStateException] {
      Scd1Merge.recluster(spark, path, Seq("y"))
    } finally Scd1Merge.testFailpoint = ""
    assert(canon(Scd1Merge.readTable(spark, path)) == before)
    // and the protocol recovers on the next run
    Scd1Merge.recluster(spark, path, Seq("y"))
    assert(canon(Scd1Merge.readTable(spark, path)) == before)
  }

  test("dirtyOnly reclusters only buckets diluted since the last pass") {
    val path = Tmp.dir("recluster_inc") + "/t"
    Scd1Merge.upsert(spark, path, src, Seq("id"), numBuckets = 8)
    // full pass clusters all 8; a second dirty-only pass is a no-op
    assert(Scd1Merge.recluster(spark, path, Seq("x")) == 8)
    assert(Scd1Merge.recluster(spark, path, Seq("x"), dirtyOnly = true) == 0)
    // an upsert touching a FEW keys dirties only their buckets
    val delta = spark.range(0, 3)
      .select(col("id"), lit(999L).as("x"), lit(999L).as("y"))
    Scd1Merge.upsert(spark, path, delta, Seq("id"))
    val rewrote = Scd1Merge.recluster(spark, path, Seq("x"), dirtyOnly = true)
    assert(rewrote >= 1 && rewrote <= 3, s"rewrote $rewrote of 8 buckets")
    assert(Scd1Merge.recluster(spark, path, Seq("x"), dirtyOnly = true) == 0)
    // a SPEC change dirties everything despite the markers
    assert(Scd1Merge.recluster(spark, path, Seq("y"), dirtyOnly = true) == 8)
    // content stays exact throughout
    val expect = canon(src.filter(col("id") >= 3)
      .unionByName(delta))
    assert(canon(Scd1Merge.readTable(spark, path)) == expect)
  }

  test("change feed across a recluster commit is empty (maintenance is CDF-invisible)") {
    // readChanges diffs CONTENT over changed-dir buckets, so a
    // content-identical maintenance rewrite must emit zero rows —
    // downstream incremental consumers never see phantom updates
    // from OPTIMIZE-class commits.
    val path = Tmp.dir("recluster_cdf") + "/t"
    Scd1Merge.upsert(spark, path, src.limit(5000), Seq("id"), numBuckets = 4)
    Scd1Merge.recluster(spark, path, Seq("x"))
    val feed = Scd1Merge.readChanges(spark, path, Seq("id"), fromCommitsBack = 1)
    assert(feed.count() == 0)
  }

  test("recluster tightens row-group footprints; z-order covers both columns") {
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 32 * 1024) // force many row groups
    try {
      val path = Tmp.dir("recluster_rg") + "/t"
      Scd1Merge.upsert(spark, path, src, Seq("id"), numBuckets = 2)

      def spanFrac(c: String): Double = {
        Scd1Merge.vacuum(path, retain = 0) // measure LIVE dirs only
        val rs = rowGroupRanges(path, c)
        assert(rs.size >= 16, s"want many row groups, got ${rs.size}")
        rs.map { case (mn, mx) => (mx - mn).toDouble / 1000 }.sum / rs.size
      }
      // hash-bucketed write: every row group spans ~the whole domain
      assert(spanFrac("x") > 0.8, s"unclustered x span ${spanFrac("x")}")

      Scd1Merge.recluster(spark, path, Seq("x"))
      val sx = spanFrac("x")
      assert(sx < 0.15, s"x-clustered row-group span $sx, want < 0.15")
      assert(spanFrac("y") > 0.8, "single-column sort leaves y unclustered")

      Scd1Merge.recluster(spark, path, Seq("x", "y"), zOrderBits = 5)
      val (zx, zy) = (spanFrac("x"), spanFrac("y"))
      assert(zx < 0.6 && zy < 0.6,
        s"z-order must localize BOTH columns, got x=$zx y=$zy")
      // content still exact under the ongoing predicate read path
      val got = Scd1Merge.readTableWhere(spark, path,
        col("x").between(50, 150))
      assert(canon(got) == canon(Scd1Merge.readTable(spark, path)
        .filter(col("x").between(50, 150))))
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
    }
  }
}
