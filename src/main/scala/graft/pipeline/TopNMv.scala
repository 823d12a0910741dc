package graft.pipeline

import graft.merge.Scd1Merge
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally-maintained TOP-N-PER-GROUP materialized view — the
  * leaderboard dashboard ("top 3 orders by value per month") at
  * 100 TB: the exact answer needs a full window sort over the fact
  * per query, and no per-group SCALAR can maintain it (unlike
  * sum/count, the answer is N whole rows). The MV stores exactly the
  * top-N rows per group (keyed by the BASE KEYS, so each stored row
  * is the base row it came from), and maintenance is the min/max
  * two-speed shape lifted from scalars to row sets:
  *
  *  - INSERTS fold: a new row competes only against its own group's
  *    stored N rows — candidates = stored(group) ∪ inserts(group),
  *    re-top-N, evict what fell out. O(delta × N), never the base.
  *    (An evicted row is not lost — the base still has it; a later
  *    rescan can bring it back.)
  *  - a RETRACTION of a STORED row (delete, or an update's preimage —
  *    matched against the MV by base key) flags its group: the
  *    replacement row is exactly what the MV evicted earlier, so the
  *    group re-derives from the base via a group-semi-joined scan —
  *    the same honest non-abelian price min/max pay, confined to
  *    flagged groups and entirely off the append path. A retraction
  *    of a row that was never stored cannot change the top-N and
  *    folds to nothing.
  *
  * DETERMINISM: the registered ordering ALWAYS appends the base keys
  * as the final tie-break, so the stored row set is a pure function
  * of base content (never of partitioning) — the property the judged
  * hash-compare and the transparent rewrite
  * ([[graft.plans.GraftTopNRewrite]]) both require.
  *
  * Exactly-once by the engine's stamp contract: each maintenance
  * commit stamps `base-commit-N`; a replay sees the stamp and no-ops.
  * The definition persists as `_graft_topn` next to the MV's
  * manifests, so REFRESH works from a new session. */
object TopNMv {

  /** `cols`: every column the MV stores (must contain the group
    * columns, the order column, and the base keys). `desc`: ordering
    * direction on `orderCol`; ties always break by the base keys
    * ascending.
    *
    * `ties = true` stores the `rank() <= n` row set (ORDER BY the
    * order column alone — every row tied into the top n positions,
    * possibly MORE than n rows per group) instead of the row_number
    * top-n. That is what lets the rewrite serve `rank() <= k`
    * leaderboards soundly: a row_number-maintained MV may have cut
    * tied rows at the storage boundary, so a rank query against it
    * could return short. A ties MV still serves row_number queries
    * (its stored set is a superset of the row_number top-n, and the
    * spliced window recomputes the exact ordering). The trade: the
    * per-group storage bound is n + ties rather than exactly n —
    * adversarially all-equal data degrades to the group size, real
    * leaderboards carry a handful. */
  final case class TopNSpec(groupCols: Seq[String], orderCol: String,
                            desc: Boolean, n: Int, cols: Seq[String],
                            ties: Boolean = false)

  private val FileName = "_graft_topn"

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  def writeDef(mvPath: String, basePath: String, baseKeys: Seq[String],
               spec: TopNSpec, retain: Int,
               auto: Boolean = false): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
    val body = (Seq(
      s"base=${enc(basePath)}",
      s"keys=${baseKeys.map(enc).mkString(",")}",
      s"groups=${spec.groupCols.map(enc).mkString(",")}",
      s"order=${enc(spec.orderCol)}",
      s"desc=${spec.desc}", s"n=${spec.n}",
      s"cols=${spec.cols.map(enc).mkString(",")}",
      s"ties=${spec.ties}",
      s"retain=$retain") ++
      (if (auto) Seq("auto=true") else Nil)).mkString("\n")
    val tmp = Paths.get(mvPath, FileName + ".tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(mvPath, FileName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    statKey(Paths.get(mvPath, FileName)).foreach(k => readCache.put(mvPath,
      (k, Some((basePath, baseKeys, spec, retain, auto)))))
  }

  // Stat-validated read-through cache — the MvDef posture applied to
  // `_graft_topn`: the post-commit hook consults every top-N MV's
  // definition on every commit, so a cold read per (MV, commit) is
  // O(inventory) disk reads on the writer's thread. Keyed by
  // (fileKey, mtime, size); ATOMIC_MOVE replaces the fileKey, so
  // cross-process rewrites invalidate even within one mtime tick.
  private val readCache = new java.util.concurrent.ConcurrentHashMap[
    String, ((String, Long, Long),
             Option[(String, Seq[String], TopNSpec, Int, Boolean)])]()

  /** Definition-file PARSES (cache misses) since JVM start — the
    * maintenance specs' zero-reads-per-commit pin. */
  @volatile var parseCount: Long = 0L

  private def statKey(p: java.nio.file.Path): Option[(String, Long, Long)] =
    try {
      val a = java.nio.file.Files.readAttributes(
        p, classOf[java.nio.file.attribute.BasicFileAttributes])
      // null fileKey (no inode identity on this filesystem) degrades
      // to a CONTENT-hash validator instead of a weaker (mtime, size)
      // pair — the MvDef.statKey posture
      val fk = a.fileKey
      val ident =
        if (fk != null) fk.toString
        else {
          val md = java.security.MessageDigest.getInstance("SHA-256")
          java.util.Base64.getEncoder.encodeToString(
            md.digest(java.nio.file.Files.readAllBytes(p)))
        }
      Some((ident, a.lastModifiedTime.toMillis, a.size))
    } catch { case _: java.io.IOException => None }

  /** The full persisted definition including the `auto` flag, served
    * through the stat-validated cache. */
  def readDefFull(mvPath: String)
      : Option[(String, Seq[String], TopNSpec, Int, Boolean)] = {
    val p = java.nio.file.Paths.get(mvPath, FileName)
    val key = statKey(p)
    if (key.isEmpty) { readCache.remove(mvPath); return None }
    val hit = readCache.get(mvPath)
    if (hit != null && hit._1 == key.get) return hit._2
    val parsed = parse(p)
    readCache.put(mvPath, (key.get, parsed))
    parsed
  }

  def readDef(mvPath: String)
      : Option[(String, Seq[String], TopNSpec, Int)] =
    readDefFull(mvPath).map(d => (d._1, d._2, d._3, d._4))

  private def parse(p: java.nio.file.Path)
      : Option[(String, Seq[String], TopNSpec, Int, Boolean)] = {
    if (!java.nio.file.Files.exists(p)) return None
    parseCount += 1
    val kv = java.nio.file.Files.readString(p).split("\n").iterator
      .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
    def list(k: String): Seq[String] =
      kv.getOrElse(k, "").split(",").iterator.filter(_.nonEmpty).map(dec).toSeq
    Some((dec(kv("base")), list("keys"),
      TopNSpec(list("groups"), dec(kv("order")), kv("desc").toBoolean,
        kv("n").toInt, list("cols"),
        ties = kv.get("ties").exists(_.toBoolean)),
      kv.get("retain").map(_.toInt)
        .getOrElse(Scd1Merge.DefaultRetainVersions),
      kv.get("auto").exists(_.toBoolean)))
  }

  /** Is `mvPath` flagged for WRITE-THROUGH maintenance (the
    * `_graft_topn` `auto=true` line — [[MvMaintenance]]'s post-commit
    * hook consults this). */
  def readAuto(mvPath: String): Boolean =
    readDefFull(mvPath).exists(_._5)

  /** The registered DETERMINISTIC ordering: order column in the
    * spec'd direction, base keys ascending as the tie-break. */
  def ordering(spec: TopNSpec, baseKeys: Seq[String]): Seq[Column] =
    (if (spec.desc) col(spec.orderCol).desc else col(spec.orderCol).asc) +:
      baseKeys.map(col(_).asc)

  /** Salted two-stage top-N per group (the [[graft.similarity]]
    * top-k shape over multi-column groups): a hot group never funnels
    * through one task before the N-cap — the pre-stage caps each
    * (group, salt) slice at N, so the final per-group sort sees at
    * most N × salts rows.
    *
    * `ties` MVs rank by the order column ALONE in both stages: a row
    * with final rank ≤ n has < n strictly-better rows in the whole
    * group, hence < n strictly-better rows in its salt slice, so the
    * pre-stage keeps a superset — the same containment argument as
    * row_number, with the per-slice cap now n + that slice's ties. */
  def topN(df: DataFrame, spec: TopNSpec, baseKeys: Seq[String],
           salts: Int = 32): DataFrame = {
    val ord =
      if (spec.ties)
        Seq(if (spec.desc) col(spec.orderCol).desc else col(spec.orderCol).asc)
      else ordering(spec, baseKeys)
    def rk = if (spec.ties) rank() else row_number()
    val pre = Window
      .partitionBy(spec.groupCols.map(col) :+
        pmod(hash(baseKeys.map(col): _*), lit(salts)): _*)
      .orderBy(ord: _*)
    val fin = Window.partitionBy(spec.groupCols.map(col): _*)
      .orderBy(ord: _*)
    df.select(spec.cols.map(col): _*)
      .withColumn("__r1", rk.over(pre))
      .filter(col("__r1") <= spec.n)
      .withColumn("__rn", rk.over(fin))
      .filter(col("__rn") <= spec.n)
      .drop("__r1", "__rn")
  }

  private def stampOf(c: Int): String = f"base-commit-$c%09d"

  // ---- the base may be FLAT or PARTITIONED (the IncrementalAgg
  // posture): commit = parent commit, feed = per-child diffs, keys
  // and snapshots resolve through the parent pin set
  private def partitioned(basePath: String): Boolean =
    graft.merge.PartitionedTable.tableExists(basePath)
  private def baseKeysOf(basePath: String): Option[Seq[String]] =
    (if (partitioned(basePath))
       graft.merge.PartitionedTable.tableKeys(basePath)
     else Scd1Merge.tableKeys(basePath)).filter(_.nonEmpty)
  private def baseCommitOf(basePath: String): Option[Int] =
    if (partitioned(basePath))
      graft.merge.PartitionedTable.tableCommit(basePath)
    else Scd1Merge.tableCommit(basePath)
  private def baseAtCommit(spark: SparkSession, basePath: String,
                           commit: Int): DataFrame =
    if (partitioned(basePath))
      graft.merge.PartitionedTable.readTableAtCommit(spark, basePath, commit)
    else Scd1Merge.readTableAtCommit(spark, basePath, commit)

  /** Initial build + persisted definition + rewrite registration. */
  def createMv(spark: SparkSession, mvPath: String, basePath: String,
               spec: TopNSpec, numBuckets: Int = 0,
               retain: Int = Scd1Merge.DefaultRetainVersions,
               auto: Boolean = false): Unit = {
    val baseKeys = baseKeysOf(basePath)
      .getOrElse(throw new IllegalArgumentException(
        s"TopNMv: base $basePath records no merge keys"))
    require(spec.n > 0, s"TopNMv: n must be positive, got ${spec.n}")
    val need = (spec.groupCols :+ spec.orderCol) ++ baseKeys
    need.foreach(c => require(spec.cols.exists(_.equalsIgnoreCase(c)),
      s"TopNMv: stored columns must include '$c' (groups, order " +
      "column, and base keys)"))
    val commit = baseCommitOf(basePath).getOrElse(
      throw new IllegalArgumentException(
        s"TopNMv: $basePath is not a graft table"))
    Scd1Merge.upsert(spark, mvPath,
      topN(baseAtCommit(spark, basePath, commit), spec, baseKeys),
      baseKeys, numBuckets, batchId = stampOf(commit),
      retainVersions = retain)
    writeDef(mvPath, basePath, baseKeys, spec, retain, auto)
    graft.plans.GraftTopNRewrite.register(spark, mvPath, basePath,
      baseKeys, spec)
    // durable inventory row (no-op without a catalog root): REFRESH
    // ALL in a FRESH session sweeps this MV without it ever having
    // been queried or refreshed by path
    graft.sql.GraftCatalog.putTopNMv(mvPath, basePath)
    if (auto) MvMaintenance.armHooks()
  }

  /** Fold every base commit the MV has not seen; returns commits
    * applied. Reads the definition from disk (new-session REFRESH). */
  def refresh(spark: SparkSession, mvPath: String): Long = {
    val (basePath, baseKeys, spec, retain) = readDef(mvPath).getOrElse(
      throw new IllegalStateException(
        s"TopNMv.refresh: $mvPath has no $FileName definition"))
    val live = baseCommitOf(basePath).getOrElse(
      throw new IllegalStateException(
        s"TopNMv.refresh: base $basePath has no manifest"))
    val seen = Scd1Merge.tableBatchId(mvPath).collect {
      case s if s.startsWith("base-commit-") =>
        s.stripPrefix("base-commit-").toInt
    }.getOrElse(throw new IllegalStateException(
      s"TopNMv.refresh: $mvPath carries no base-commit stamp"))
    if (live > seen)
      applyChanges(spark, mvPath, basePath, baseKeys, spec,
        fromCommit = seen, toCommit = live, retain = retain)
    graft.plans.GraftTopNRewrite.register(spark, mvPath, basePath,
      baseKeys, spec)
    math.max(0L, (live - seen).toLong)
  }

  /** One maintenance batch over an ABSOLUTE commit window. */
  def applyChanges(spark: SparkSession, mvPath: String, basePath: String,
                   baseKeys: Seq[String], spec: TopNSpec,
                   fromCommit: Int, toCommit: Int,
                   retain: Int = Scd1Merge.DefaultRetainVersions): Unit = {
    val stamp = stampOf(toCommit)
    if (Scd1Merge.tableBatchId(mvPath).contains(stamp)) return // replayed
    val changes = (if (partitioned(basePath))
        graft.merge.PartitionedTable.readChangesAtCommits(spark, basePath,
          fromCommit, toCommit)
      else Scd1Merge.readChangesAtCommits(spark, basePath,
        baseKeys, fromCommit, toCommit))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val inserts = changes
        .filter(col("_change_type").isin("insert", "update"))
        .select(spec.cols.map(col): _*)
      val retractions = changes
        .filter(!col("_change_type").isin("insert", "update"))
        .select(baseKeys.map(col): _*)
      val stored = Scd1Merge.readTable(spark, mvPath)
      // FLAGGED groups: a retraction whose key is STORED may have
      // removed a top row — its replacement is exactly what the MV
      // evicted, so the group re-derives from the base. A retraction
      // of a never-stored row cannot change the top-N.
      val flagged = stored.join(retractions, baseKeys, "left_semi")
        .select(spec.groupCols.map(col): _*).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // FOLD groups: inserts compete against the stored N only.
        // Within a fold group a stored key and an insert key cannot
        // collide (an update whose preimage was STORED retracts that
        // key and flags the group instead) — the key-dedup preferring
        // the insert image is purely defensive.
        val insGroups = inserts.select(spec.groupCols.map(col): _*)
          .distinct().join(flagged, spec.groupCols, "left_anti")
        val wKey = Window.partitionBy(baseKeys.map(col): _*)
          .orderBy(col("__ins").desc)
        val foldCands = stored.select(spec.cols.map(col): _*)
          .join(insGroups, spec.groupCols, "left_semi")
          .withColumn("__ins", lit(0))
          .unionByName(inserts.join(insGroups, spec.groupCols, "left_semi")
            .withColumn("__ins", lit(1)))
          .withColumn("__pick", row_number().over(wKey))
          .filter(col("__pick") === 1).drop("__ins", "__pick")
        // RESCAN groups: re-derive from the base AT the target commit
        val rescanCands = baseAtCommit(spark, basePath, toCommit)
          .join(flagged, spec.groupCols, "left_semi")
          .select(spec.cols.map(col): _*)
        val newTop = topN(foldCands.unionByName(rescanCands), spec, baseKeys)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val touched = insGroups.unionByName(flagged).distinct()
          val evicted = stored.join(touched, spec.groupCols, "left_semi")
            .join(newTop.select(baseKeys.map(col): _*), baseKeys,
              "left_anti")
            .select(spec.cols.map(col): _*)
          val opCol = "__graft_topn_op"
          Scd1Merge.applyCdc(spark, mvPath,
            newTop.withColumn(opCol, lit("upsert"))
              .unionByName(evicted.withColumn(opCol, lit("delete"))),
            baseKeys, opCol = opCol, batchId = stamp,
            retainVersions = retain)
        } finally newTop.unpersist(blocking = false)
      } finally flagged.unpersist(blocking = false)
    } finally changes.unpersist(blocking = false)
  }
}
