package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows carrying a scalar joined to right
  * rows carrying [lo, hi] intervals, `v ∈ [lo, hi)`.
  *
  * The naive form is a theta join — Spark plans it as a broadcast
  * nested loop (fine while one side is tiny) or, with two big sides, a
  * cartesian: O(|L|·|R|) comparisons. [[binned]] is the scale form:
  * quantize the value domain into fixed-width bins, explode each
  * interval to the bins it overlaps, tag each left row with its bin,
  * and equi-join on the bin — the only pairs ever materialized are
  * bin-colocated candidates, re-checked by the exact predicate. Cost is
  * O(|L| + Σ interval_width/bin_width + candidates): shuffle-parallel
  * on the bin key like every other equi-join in the engine. Pick
  * `binWidth` ≈ the typical interval width — wider wastes candidate
  * checks, narrower multiplies the exploded right side.
  */
object RangeJoin {

  /** Exact semantics twin of [[binned]] (the theta-join form) — kept
    * for tests and for genuinely tiny right sides. */
  def naive(left: DataFrame, vCol: String, right: DataFrame,
            loCol: String, hiCol: String): DataFrame =
    left.join(right, col(vCol) >= col(loCol) && col(vCol) < col(hiCol))

  /** Bin-bucketed interval join; output columns = left ++ right. */
  def binned(left: DataFrame, vCol: String, right: DataFrame,
             loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binOf(c: Column): Column = floor(c / binWidth).cast("long")
    // an interval [lo, hi) overlaps bins binOf(lo) .. binOf(hi - ulp);
    // hi is exclusive, but binOf(hi) as the inclusive upper bin is
    // merely one spare bin when hi sits exactly on a boundary — the
    // exact predicate discards the phantom candidates
    val r = right.withColumn("__bin",
      explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
    val l = left.withColumn("__bin", binOf(col(vCol)))
    l.join(r, Seq("__bin"))
      .filter(col(vCol) >= col(loCol) && col(vCol) < col(hiCol))
      .drop("__bin")
  }
}
