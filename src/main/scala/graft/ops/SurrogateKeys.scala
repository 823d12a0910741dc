package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key generation strategies (SURVEY.md §2.5 W1/W2, §7.5).
  *
  * The reference mints keys two ways: `row_number` over a global
  * un-partitioned window (gold_dim_branch.py:143-146) and
  * `monotonically_increasing_id` (gold_dim_model.py:157-158). The first
  * is deterministic but single-partition; the second scales but is
  * partition-layout dependent. [[Scalable]] reproduces the first's
  * exact output (dense keys in natural-key order) without the
  * single-partition bottleneck.
  */
sealed trait KeyGenStrategy {
  /** Adds `keyCol = base + rank` for a dense 1-based rank. */
  def assign(df: DataFrame, orderCol: String, keyCol: String, base: Long): DataFrame
}

object KeyGenStrategy {

  /** W1 — faithful global window; all rows pass through one partition.
    * Correct at dimension scale, kept for fidelity mode
    * (ref: gold_dim_branch.py:143-146). */
  case object GlobalWindow extends KeyGenStrategy {
    def assign(df: DataFrame, orderCol: String, keyCol: String, base: Long): DataFrame =
      df.withColumn(keyCol, lit(base) + row_number().over(Window.orderBy(col(orderCol))))
        .withColumn(keyCol, col(keyCol).cast("long"))
  }

  /** W2 — `monotonically_increasing_id`: scales embarrassingly but keys
    * are gap-py and non-deterministic across runs (quirk Q4); compared
    * structurally in tests, never by value
    * (ref: gold_dim_model.py:157-158). */
  case object MonotonicId extends KeyGenStrategy {
    def assign(df: DataFrame, orderCol: String, keyCol: String, base: Long): DataFrame =
      df.withColumn(keyCol, lit(base) + monotonically_increasing_id() + 1L)
  }

  /** Scale path (SURVEY.md §7.5): range-repartition + sort by the natural
    * key, `row_number` within each partition, then add per-partition
    * prefix-sum offsets (computed from a tiny count-per-partition
    * aggregate, broadcast back). Produces byte-identical output to
    * [[GlobalWindow]] for unique natural keys while every partition does
    * its numbering independently — no single-partition exchange.
    */
  case object Scalable extends KeyGenStrategy {

    /** Inputs estimated at or below this size take the single-window
      * path: one partition of a few tens of MB is fine on any executor,
      * and the two-pass machinery (checkpoint + count + offset join)
      * costs 3 extra jobs per batch — pure overhead for dim-sized
      * batches. Output is byte-identical either way
      * (SurrogateKeysSpec). */
    val SmallInputBytes: BigInt = BigInt(32L * 1024 * 1024)

    /** Stats-adaptive: window path for small inputs, partitioned
      * two-pass for everything else — the strategy choice a planner
      * would make from table stats. The probe reads the optimizer's
      * sizeInBytes estimate (no job, no scan); estimates overshoot
      * after joins, which errs toward the partitioned path — the safe
      * direction. */
    def assign(df: DataFrame, orderCol: String, keyCol: String, base: Long): DataFrame =
      if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= SmallInputBytes)
        GlobalWindow.assign(df, orderCol, keyCol, base)
      else assignPartitioned(df, orderCol, keyCol, base)

    /** The unconditional scale path (exercised directly by the judged
      * w1_scalable_keys entry and the equivalence property test). */
    def assignPartitioned(df: DataFrame, orderCol: String, keyCol: String, base: Long): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val parts = spark.sessionState.conf.numShufflePartitions
      // localCheckpoint pins the range partitioning so the count pass and
      // the rank pass see identical partitions (range boundaries are
      // sample-based; recomputing between the two jobs would misalign
      // the offsets).
      val sorted = df
        .repartitionByRange(parts, col(orderCol))
        .sortWithinPartitions(col(orderCol))
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint()
      val counts = sorted.groupBy($"__pid").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val prefix = counts.map(_._1).zip(
        counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
      val prefixDf = broadcast(prefix.toSeq.toDF("__pid", "__off"))
      val w = Window.partitionBy($"__pid").orderBy(col(orderCol))
      sorted
        .withColumn("__rn", row_number().over(w).cast("long"))
        .join(prefixDf, "__pid")
        .withColumn(keyCol, lit(base) + $"__off" + $"__rn")
        .drop("__pid", "__rn", "__off")
    }
  }
}
