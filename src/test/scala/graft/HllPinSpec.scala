package graft

import org.apache.spark.sql.functions._

/** Guards the a7 pinned-literal oracle: Spark's approx_count_distinct
  * is a fixed-hash HLL++ whose register maxima merge commutatively —
  * same data, same answer, any partitioning. If this pin moves, the
  * oracle literal in QueriesLLM must move with it. */
class HllPinSpec extends SparkSpecBase {
  test("approx_count_distinct(o_custkey) is the pinned 1400 at sf0.01") {
    val v = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .agg(approx_count_distinct(col("o_custkey")).as("a")).first().getLong(0)
    assert(v == 1400L, s"pin moved: $v — update the a7 oracle literal too")
    // partitioning-independence: a different layout, same estimate
    val v2 = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .repartition(7, col("o_orderkey"))
      .agg(approx_count_distinct(col("o_custkey")).as("a")).first().getLong(0)
    assert(v2 == 1400L, "HLL merge must be partitioning-independent")
  }
}
