package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the semi-join reduction for the regime
  * where the build side's distinct-key SET is too large to broadcast
  * as a hash relation but a bits-per-key sketch still fits comfortably
  * (10M keys ≈ 17 MB at 1% fpp vs ~hundreds of MB as a broadcast hash
  * table). The probe side is filtered by `might_contain` BEFORE its
  * shuffle, so the exchange moves only rows that can possibly join;
  * the exact join afterwards removes the false-positive residue, so
  * the RESULT is identical to the plain join by construction.
  *
  * This is the stationary form of Spark's own adaptive
  * `InjectRuntimeFilter` rule (`spark.sql.optimizer.runtime.bloomFilter
  * .enabled`), which only fires under its own heuristics (selective
  * creation-side filter, size thresholds) — here the pipeline author
  * KNOWS the build side is reductive and asks for the prune
  * explicitly, e.g. "events of the 2% of users in this experiment
  * cohort" at 100 TB of events.
  *
  * Built on Spark's native `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions (codegen'd; the same pair the
  * runtime-filter rule plants): the build side aggregates xxhash64(key)
  * into one sketch — partial sketches OR-merge, so the build is one
  * pass with no shuffle of data rows — and the ~MB sketch rides to the
  * probe scan as a literal. Multi-column keys hash as one xxhash64 over
  * the column tuple on BOTH sides.
  */
object BloomJoin {
  import GraftExpressionBridge.{column, expression}

  /** The build side's key sketch: one binary blob, driver-collected
    * (sketch-sized, never data-sized). */
  def buildSketch(build: DataFrame, keys: Seq[Column],
                  expectedItems: Long, numBits: Long): Array[Byte] = {
    val hashed = expression(xxhash64(keys: _*))
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    build.select(column(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** `probe WHERE might_contain(sketch, xxhash64(keys))` — a codegen'd
    * scalar filter that pushes below the join's exchange. */
  def prune(probe: DataFrame, keys: Seq[Column], sketch: Array[Byte]): DataFrame =
    probe.filter(column(new BloomFilterMightContain(
      Literal(sketch, BinaryType), expression(xxhash64(keys: _*)))))

  /** Inner equi-join with the probe side bloom-pruned before its
    * shuffle. Result ≡ `probe.join(build, keys)` — false positives
    * die in the exact join. `expectedItems` sizes the sketch (overshoot
    * is wasted bits, undershoot inflates fpp — pass the build side's
    * key cardinality estimate); `fpp` defaults to 1%. */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(keys.nonEmpty, "bloomPrunedJoin needs at least one key")
    // standard bloom sizing: m = -n ln(p) / (ln 2)^2
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val sketch = buildSketch(build, keys.map(col), expectedItems, numBits)
    prune(probe, keys.map(col), sketch).join(build, keys)
  }
}
