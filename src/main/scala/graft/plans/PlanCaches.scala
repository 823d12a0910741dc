package graft.plans

import graft.merge.{PartitionedTable, Scd1Merge}
import org.apache.spark.sql.SparkSession

/** Commit-keyed caches for the rewrite rules' PLAN-TIME metadata
  * probes. Catalyst re-runs every registered rule on every
  * (re-)planning of every query, so anything a gate computes is paid
  * O(registrations × plannings) on the DRIVER — at 100 TB with many
  * registered MVs/indexes that is the difference between a
  * microsecond gate and a rule that schedules file listings (or,
  * worse, Spark jobs) inside the optimizer. The invariant making the
  * caches sound: a graft table's manifest COMMIT is its version —
  * equal commit ⟺ equal live file set (every write, compaction,
  * recluster, or restore moves the commit; vacuum only deletes
  * already-unreferenced versions). So each cache keys on the commit
  * (one manifest-header read to validate) and is correct under
  * concurrent writers from ANY process, not just this session.
  *
  * Three caches, all bounded by the registration inventory (entries
  * are per-table / per-index / per-(query shape), never per-row):
  *
  *  - [[liveFiles]]: table → (commit, live file set). Replaces a
  *    DataFrame construction + FileIndex listing per (registration,
  *    planning) in the snapshot gates.
  *  - [[annModel]]: IVF-PQ index → collected (centroids, codebooks).
  *    Replaces two collect() JOBS per ANN rewrite attempt; the model
  *    is nlist×dim + m×ksub×dsub floats (KBs–MBs, driver-sized by
  *    design) and changes only when a retrain/rebuild commits to the
  *    centroids/codebooks tables.
  *  - [[escalation]]: (index, covered commit, canonical predicate,
  *    k, query vector) → the (nprobe, candFactor) the filtered
  *    escalation converged to. Replaces up to 12 driver-blocking
  *    count() jobs on every RE-planning of the same filtered ANN
  *    query — the survivor count is a pure function of the key, so
  *    replaying the probe would do identical work for an identical
  *    answer. */
object PlanCaches {

  // ---- live file sets ----
  private val files =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Set[String])]()

  /** The table's (commit, live file set), re-listed only when the
    * commit has moved since last asked; None for a non-table path. */
  def liveFiles(spark: SparkSession, basePath: String)
      : Option[(Int, Set[String])] = {
    val partitioned = PartitionedTable.tableExists(basePath)
    val commit =
      (if (partitioned) PartitionedTable.tableCommit(basePath)
       else Scd1Merge.tableCommit(basePath)).getOrElse(return None)
    val hit = files.get(basePath)
    if (hit != null && hit._1 == commit) return Some(hit)
    listingCount += 1
    val listed =
      (if (partitioned) PartitionedTable.readTable(spark, basePath)
       else Scd1Merge.readTable(spark, basePath)).inputFiles.toSet
    val entry = (commit, listed)
    files.put(basePath, entry)
    Some(entry)
  }

  /** Actual re-listings performed (cache misses) — the spec pin that
    * re-planning against an unchanged commit never lists again. */
  @volatile var listingCount: Long = 0L

  // ---- collected ANN models ----
  private final case class ModelKey(indexPath: String,
                                    centsCommit: Int, booksCommit: Int)
  private val models = new java.util.concurrent.ConcurrentHashMap[
    String, (ModelKey, (Array[Seq[Float]], Array[Array[Seq[Float]]]))]()

  /** The index's collected (centroids, codebooks), re-collected only
    * when either model table's commit has moved (a retrain / rebuild
    * — [[graft.similarity.Similarity.ivfIndexRetrainDrifted]] or a
    * fresh build both commit there). */
  def annModel(spark: SparkSession, indexPath: String)
      : (Array[Seq[Float]], Array[Array[Seq[Float]]]) = {
    val key = ModelKey(indexPath,
      Scd1Merge.tableCommit(s"$indexPath/centroids").getOrElse(-1),
      Scd1Merge.tableCommit(s"$indexPath/codebooks").getOrElse(-1))
    val hit = models.get(indexPath)
    if (hit != null && hit._1 == key) return hit._2
    val model = graft.similarity.Similarity.ivfPqIndexModel(spark, indexPath)
    models.put(indexPath, (key, model))
    model
  }

  // ---- filtered-ANN escalation outcomes ----
  final case class EscKey(indexPath: String, baseCommit: Int,
                          predCanon: String, k: Int, qvHash: Long)
  private val escalations =
    new java.util.concurrent.ConcurrentHashMap[EscKey, (Int, Int)]()

  def escalationHit(key: EscKey): Option[(Int, Int)] =
    Option(escalations.get(key))
  def escalationPut(key: EscKey, nprobe: Int, candFactor: Int): Unit =
    escalations.put(key, (nprobe, candFactor))

  /** xxhash-free stable hash of a query vector for the escalation
    * key (exact bit equality via the full array would also work; a
    * 64-bit fold of the raw bits keeps the key small and collisions
    * harmless — a collision only re-uses a CONVERGED probe width,
    * and the serving plan still re-ranks by exact cosine). */
  def qvHash(qv: Array[Float]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < qv.length) {
      h = 31 * h + java.lang.Float.floatToIntBits(qv(i))
      i += 1
    }
    h
  }

  /** Session-state reset (specs simulating restarts). */
  def clear(): Unit = {
    files.clear(); models.clear(); escalations.clear()
  }
}
