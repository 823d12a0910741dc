package graft

import graft.store.ZOrder
import org.apache.spark.sql.functions._

/** Z-order clustering: content fidelity, the Morton bit math, and the
  * actual skipping payoff — a z-ordered layout prunes files on BOTH
  * clustering columns where a single-column sort prunes only its own.
  */
class ZOrderSpec extends SparkSpecBase {

  // two independent-ish uniform columns over [0,1000)
  private lazy val src =
    spark.range(0, 20000)
      .select(col("id"),
        (col("id") * 541 % 1000).as("x"),
        (col("id") * 7919 % 1000).as("y"))

  test("interleave computes the Morton code") {
    import spark.implicits._
    // x=0b11, y=0b01, bits=2 -> z = x1 y1 x0 y0 = 0b1011 = 11
    val row = spark.range(1)
      .select(ZOrder.interleave(Seq(lit(3), lit(1)), 2).as("z"))
      .as[Int].head()
    assert(row == 11)
  }

  test("binExpr is monotone and null-safe") {
    import spark.implicits._
    val out = Seq(Some(-5.0), Some(0.5), Some(1.5), Some(99.0), None).toDF("v")
      .select(ZOrder.binExpr(col("v"), Seq(0.0, 1.0, 2.0)).as("b"))
      .as[Int].collect().toSeq
    assert(out == Seq(0, 1, 2, 3, 0))
  }

  test("clustered rewrite preserves content exactly") {
    val path = Tmp.dir("zorder_roundtrip")
    ZOrder.writeClustered(spark, src, path, Seq("x", "y"), numFiles = 16)
    assertSameRows(spark.read.parquet(path).select("id", "x", "y"), src)
  }

  test("z-order skips files on both columns; linear sort only on its own") {
    val zPath = Tmp.dir("zorder_z")
    val linPath = Tmp.dir("zorder_lin")
    ZOrder.writeClustered(spark, src, zPath, Seq("x", "y"), numFiles = 16)
    // the comparison layout: same file count, sorted by x alone
    src.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linPath)

    // A 1/10-of-domain predicate on each column, placed INSIDE a
    // top-two-bit quadrant ([50,150] ~ bins 1.6-4.8 of 32): 16 files
    // over 10 z-bits means each file fixes the top 4 interleaved bits
    // = a (quarter-x × quarter-y) cell, so a quadrant-interior
    // interval touches 1 of 4 x-quarters = ~4 of 16 files. An interval
    // straddling the mid-domain (e.g. [450,550]) crosses the top-bit
    // boundary and legitimately reads ~2× that — alignment matters,
    // as it does for any space-filling curve.
    val (zx, zTotal) = ZOrder.filesIntersecting(spark, zPath, "x", 50, 150)
    val (zy, _) = ZOrder.filesIntersecting(spark, zPath, "y", 50, 150)
    val (lx, lTotal) = ZOrder.filesIntersecting(spark, linPath, "x", 50, 150)
    val (ly, _) = ZOrder.filesIntersecting(spark, linPath, "y", 50, 150)

    assert(zTotal == 16 && lTotal == 16)
    // linear layout: x-sort makes x selective but y spans every file
    assert(lx <= 3, s"x-sorted layout should skip on x, read $lx")
    assert(ly == 16, "x-sorted layout cannot skip on y")
    // quarter-interior interval: ~4 matching files + range-partition
    // straddle slack on each side
    assert(zx <= 7, s"z-order should skip on x, read $zx of $zTotal")
    assert(zy <= 7, s"z-order should skip on y, read $zy of $zTotal")
  }

  test("skew-collapsed boundaries stay monotone (constant column)") {
    val path = Tmp.dir("zorder_const")
    val const = src.withColumn("x", lit(7L))
    ZOrder.writeClustered(spark, const, path, Seq("x", "y"), numFiles = 4)
    assertSameRows(spark.read.parquet(path).select("id", "x", "y"), const)
  }
}
