package graft

import org.apache.spark.sql.functions._

/** approx_count_distinct has no cross-engine oracle (sketches differ);
  * bound its relative error against the exact answer instead. */
class ApproxSpec extends SparkSpecBase {

  test("approx_count_distinct tracks the exact count within its precision class") {
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val exact = orders.select(countDistinct(col("o_custkey"))).first().getLong(0)
    // rsd is a standard deviation, not a bound: the default 5% sketch
    // lands ~6.7% off on this column. A 1% sketch stays well inside 3%.
    val approx = orders
      .select(approx_count_distinct(col("o_custkey"), 0.01)).first().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.03, s"approx=$approx exact=$exact relErr=$relErr")
  }
}
