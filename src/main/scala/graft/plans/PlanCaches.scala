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
  * Three caches — [[liveFiles]] and [[annModel]] bounded by the
  * registration inventory (entries are per-table / per-index, never
  * per-row), [[escalation]] bounded by a size-capped LRU (its key
  * carries the query VECTOR, so production serving would otherwise
  * grow it one entry per distinct query forever):
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

  /** Test seam: invoked between the commit read and the listing —
    * lets a spec interleave a concurrent commit mid-listing and pin
    * that the cached (commit, files) pair stays CONSISTENT. */
  @volatile private[graft] var onListForTest: () => Unit = () => ()

  /** The table's (commit, live file set), re-listed only when the
    * commit has moved since last asked; None for a non-table path.
    *
    * The (commit, files) pair is snapshotted CONSISTENTLY — list,
    * then verify the commit did not move mid-listing, bounded retry
    * (the maintain() recipe). Without the verify, a manifest swap
    * landing between the commit read and the listing would cache a
    * mislabeled (old commit, new files) entry: fail-safe for today's
    * consumers (they compare only the file set and re-derive
    * freshness from live commits) but a fail-UNSAFE trap for any
    * future consumer reading the cached commit as a freshness gate. */
  def liveFiles(spark: SparkSession, basePath: String)
      : Option[(Int, Set[String])] = {
    val partitioned = PartitionedTable.tableExists(basePath)
    def commitNow: Option[Int] =
      if (partitioned) PartitionedTable.tableCommit(basePath)
      else Scd1Merge.tableCommit(basePath)
    var tries = 0
    while (tries < 5) {
      tries += 1
      val c1 = commitNow.getOrElse(return None)
      val hit = files.get(basePath)
      if (hit != null && hit._1 == c1) return Some(hit)
      onListForTest()
      listingCount += 1
      val listed =
        (if (partitioned) PartitionedTable.readTable(spark, basePath)
         else Scd1Merge.readTable(spark, basePath)).inputFiles.toSet
      if (commitNow.contains(c1)) {
        val entry = (c1, listed)
        files.put(basePath, entry)
        return Some(entry)
      }
      // a writer landed mid-listing: the pair is torn — retry
    }
    None // commit-storm: callers treat as "no snapshot" and fall back
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

  /** Escalation-cache entry cap: unlike the other two caches, this
    * key carries the QUERY VECTOR (and the covered commit), so a
    * long-lived serving session sees one entry per distinct query —
    * unbounded without an eviction policy. Access-ordered LRU: a hot
    * dashboard's repeated replannings stay resident; one-off queries
    * and superseded commits age out. ~100 B/entry → low MBs at cap. */
  private[graft] val EscalationMaxEntries = 4096

  private val escalations =
    new java.util.LinkedHashMap[EscKey, (Int, Int)](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[EscKey, (Int, Int)]): Boolean =
        size() > EscalationMaxEntries
    }

  def escalationHit(key: EscKey): Option[(Int, Int)] =
    escalations.synchronized { Option(escalations.get(key)) }
  def escalationPut(key: EscKey, nprobe: Int, candFactor: Int): Unit =
    escalations.synchronized { escalations.put(key, (nprobe, candFactor)); () }
  private[graft] def escalationSize: Int =
    escalations.synchronized(escalations.size)

  /** Drop cached escalation outcomes for `indexPath` at commits other
    * than `keepCommit` — called when maintain()/register re-stamps an
    * index, so superseded-commit entries free their slots immediately
    * instead of waiting to age out of the LRU (they can never hit:
    * the key carries the covered commit). */
  def escalationEvictStale(indexPath: String, keepCommit: Int): Unit =
    escalations.synchronized {
      escalations.keySet.removeIf(k =>
        k.indexPath == indexPath && k.baseCommit != keepCommit)
      ()
    }

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
    files.clear(); models.clear()
    escalations.synchronized(escalations.clear())
  }
}
