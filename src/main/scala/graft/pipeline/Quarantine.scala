package graft.pipeline

import graft.merge.Scd1Merge
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Constraint enforcement with a dead-letter table — Delta `CHECK`
  * constraints / DLT expectations re-expressed for the bucketed
  * upsert: every source batch is split by a set of named row
  * predicates; passing rows merge through the standard crash-safe
  * commit, failing rows land in a quarantine parquet zone stamped
  * with WHICH constraints failed and the batch id, so a steward can
  * replay them after a fix. Nothing silently drops.
  *
  * Scale: the split is one codegen'd projection over the batch (each
  * constraint is a boolean column; the reasons string is a
  * `concat_ws` over conditional literals — no UDF), evaluated ONCE
  * via a persisted split so source lineage doesn't run twice. The
  * quarantine zone is append-only (no keys, no merge — violations
  * are facts about a batch, not state), partitioned by batch id so
  * replays prune by path.
  *
  * A NULL constraint result counts as a VIOLATION (SQL CHECK accepts
  * NULL, but a data gate that lets NULL through lets missing data
  * through — the stricter reading is the useful one for a pipeline;
  * callers wanting SQL semantics wrap in `coalesce(c, lit(true))`).
  */
object Quarantine {

  /** Split + commit. Returns (validRows, quarantinedRows). */
  def upsertWithConstraints(spark: SparkSession, tablePath: String,
                            source: DataFrame, keys: Seq[String],
                            constraints: Map[String, Column],
                            quarantinePath: String,
                            batchId: String = "",
                            numBuckets: Int = 0): (Long, Long) = {
    require(constraints.nonEmpty, "need at least one named constraint")
    val ordered = constraints.toSeq.sortBy(_._1)
    // concat_ws skips NULL operands, so passing constraints vanish and
    // the all-pass case is the empty string
    val tagged = source.withColumn("__violations",
      concat_ws(",", ordered.map { case (name, c) =>
        when(!coalesce(c, lit(false)), lit(name))
      }: _*)).persist()
    try {
      val bad = tagged.filter(col("__violations") =!= "")
        .withColumn("_quarantine_batch",
          lit(if (batchId.nonEmpty) batchId else "unstamped"))
      val nBad = bad.count()
      if (nBad > 0)
        bad.write.mode(SaveMode.Append)
          .partitionBy("_quarantine_batch").parquet(quarantinePath)
      val good = tagged.filter(col("__violations") === "").drop("__violations")
      val nGood = good.count()
      if (nGood > 0)
        Scd1Merge.upsert(spark, tablePath, good, keys,
          numBuckets = numBuckets, batchId = batchId)
      (nGood, nBad)
    } finally tagged.unpersist(blocking = false)
  }
}
