package graft.pipeline

import graft.merge.Scd1Merge
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental maintenance of per-group COUNT(DISTINCT value) from a
  * base table's change feed — the canonical NON-self-maintainable
  * aggregate (a deleted value only lowers the count if it was the
  * group's LAST copy, which the delete row alone cannot reveal),
  * recovered exactly by composing two abelian [[IncrementalAgg]]
  * layers:
  *
  *  1. `mult` table: per (group, value) row MULTIPLICITY — a pure
  *     maintained COUNT keyed by the group+value compound. Its
  *     zero-count tombstone sweep (an [[IncrementalAgg]] invariant) is
  *     precisely the "last copy died" detector: a value's multiplicity
  *     reaching 0 DELETES its row.
  *  2. `dc` table: per group COUNT of live `mult` rows, maintained
  *     from the mult table's OWN change feed. In that feed an insert
  *     is a value being born (+1), a delete is a value dying (−1), and
  *     an update (multiplicity x→y, both > 0) nets to 0 through the
  *     usual update/update_preimage pair — exactly the distinct-count
  *     transitions, with no bespoke transition logic anywhere.
  *
  * Cost per batch: O(changed base rows) for the mult delta +
  * bucket-pruned upserts sized by the touched (group, value) pairs,
  * then O(touched pairs) for the dc layer. The base is never
  * rescanned; neither is the full mult table (the dc layer reads only
  * mult's change feed). At 100 TB the mult table is |distinct
  * (group, value)| rows — the same state lower bound any exact
  * streaming COUNT DISTINCT carries — sharded by the bucketed layout.
  *
  * EXACTLY-ONCE across the two-table chain: each layer stamps its
  * consumer commit with the producer commit number it consumed
  * ([[IncrementalAgg.applyChanges]]'s contract), and [[applyChanges]]
  * here re-derives the dc layer's lag from those stamps — a crash
  * between the mult commit and the dc commit replays safely (the mult
  * replay no-ops on its stamp; the dc layer sees `multNow > dcSeen`
  * and catches up over the net multi-commit diff readChanges gives).
  */
object IncrementalDistinct {

  /** Default manifest-history retention for the MULT table. The dc
    * layer reads mult's change feed as a snapshot diff, so mult must
    * retain history back to the dc cursor: ≥ 2 commits accrue per
    * batch (merge + tombstone sweep) and a crash can widen the gap by
    * a batch — 8 gives a comfortable margin while still GC'ing. The
    * dc table itself only ever needs the default retention. */
  val MultRetain = 8

  final case class Spec(groupCols: Seq[String], valueCol: String,
                        distinctName: String = "n_distinct")

  private def multSpec(s: Spec) =
    IncrementalAgg.AggSpec(s.groupCols :+ s.valueCol, Nil, "mult")
  private def dcSpec(s: Spec) =
    IncrementalAgg.AggSpec(s.groupCols, Nil, s.distinctName)

  /** One full pass over the base's current content: build the
    * multiplicity table, then the distinct-count table from it. The dc
    * bootstrap is stamped with the mult commit it reflects, so the
    * first [[applyChanges]] knows where the dc layer's feed cursor
    * starts (without the stamp it would re-consume mult's bootstrap
    * contents and double-count every value). */
  def bootstrap(spark: SparkSession, multPath: String, dcPath: String,
                base: DataFrame, spec: Spec, numBuckets: Int = 0,
                retainVersions: Int = MultRetain): Unit = {
    // NULL values never enter the mult layer (here and in
    // [[applyChanges]]'s rowFilter): SQL COUNT(DISTINCT) ignores NULL,
    // and a NULL would otherwise both inflate dc by one phantom value
    // and land NULL in a Scd1Merge key column (mult is keyed on
    // group+value).
    IncrementalAgg.bootstrap(spark, multPath,
      base.filter(org.apache.spark.sql.functions.col(spec.valueCol).isNotNull),
      multSpec(spec), numBuckets,
      retainVersions = retainVersions)
    val multCommit = Scd1Merge.tableCommit(multPath).getOrElse(0)
    IncrementalAgg.bootstrap(spark, dcPath,
      Scd1Merge.readTable(spark, multPath), dcSpec(spec), numBuckets,
      batchId = f"base-commit-$multCommit%09d")
  }

  /** Fold the base table's latest change feed through both layers.
    * Safe to replay at any point: each layer is idempotent on its
    * stamp, and the dc layer consumes EVERY unconsumed mult commit
    * (merge + tombstone-sweep commits alike) as one net diff. */
  def applyChanges(spark: SparkSession, multPath: String, dcPath: String,
                   basePath: String, baseKeys: Seq[String], spec: Spec,
                   fromBack: Int = 1, toBack: Int = 0,
                   retainVersions: Int = MultRetain): Unit = {
    IncrementalAgg.applyChanges(spark, multPath, basePath, baseKeys,
      multSpec(spec), fromBack, toBack, retainVersions = retainVersions,
      rowFilter = org.apache.spark.sql.functions.col(spec.valueCol).isNotNull)
    val multNow = Scd1Merge.tableCommit(multPath).getOrElse(0).toLong
    val dcSeen = Scd1Merge.tableBatchId(dcPath)
      .collect { case s if s.startsWith("base-commit-") =>
        s.stripPrefix("base-commit-").toLong }
      .getOrElse(0L)
    if (multNow > dcSeen)
      IncrementalAgg.applyChanges(spark, dcPath, multPath,
        spec.groupCols :+ spec.valueCol, dcSpec(spec),
        fromBack = (multNow - dcSeen).toInt, toBack = 0)
  }
}
