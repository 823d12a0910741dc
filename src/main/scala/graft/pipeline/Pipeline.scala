package graft.pipeline

import graft.merge.Scd1Merge
import graft.ops.{KeyGenStrategy, RelOps}
import graft.store.WatermarkStore
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The medallion pipeline re-expressed generically (SURVEY.md §3, §7.1).
  *
  * The reference's four dim notebooks are clones differing only in
  * (natural keys, distinct-source?, key-gen strategy) — here that is ONE
  * function driven by [[DimSpec]]. Quirks preserved (SURVEY.md §2.7):
  *  - Q2: only dims with `distinctSource = true` dedup their source;
  *  - Q3: the SCD1 merge key is the SURROGATE key;
  *  - Q4: initial-load base is 1, so row_number keys start at 2;
  *  - Q7: any `incrementalFlag` other than "0" means incremental.
  */
/** @param naturalKeys the JOIN key of the new/old split — the reference
  *        joins on the id column alone (gold_dim_branch.py:79,
  *        gold_dim_dealer.py:80: `df_src.Dealer_ID == df_sink.Dealer_ID`)
  * @param attrs non-key attributes carried into the dim (BranchName,
  *        DealerName, model_category). Riding outside the join key
  *        matters: a null attr (31 null DealerNames in the reference
  *        data) would never equi-join and re-mint keys every batch. */
final case class DimSpec(
    name: String,
    naturalKeys: Seq[String],
    keyCol: String,
    distinctSource: Boolean,
    keyGen: KeyGenStrategy,
    attrs: Seq[String] = Nil) {
  def cols: Seq[String] = naturalKeys ++ attrs
}

object SilverJob {

  /** Bronze→Silver transform (silver_notebook.py:26,34): two derived
    * columns; the pipeline appends to the silver zone (S6). */
  def transform(bronze: DataFrame, splitCol: String, sep: String, catCol: String,
      numCol: String, denCol: String, ratioCol: String): DataFrame =
    RelOps.deriveRatio(
      RelOps.deriveSplitHead(bronze, splitCol, sep, catCol),
      numCol, denCol, ratioCol)

  /** The ad-hoc analytical query (silver_notebook.py:47-50). */
  def adhocAgg(silver: DataFrame, k1: String, k2: String, v: String, out: String): DataFrame =
    silver.groupBy(col(k1), col(k2))
      .agg(sum(col(v)).as(out))
      .orderBy(col(k1).asc, col(out).desc)
}

object DimBuilder {

  /** One incremental dim build = one reference gold_dim notebook run
    * (canonical trace: SURVEY.md §3.3). Returns the updated dim content
    * (key first, then natural keys) and, when `tablePath` is set,
    * commits it with the atomic SCD1 upsert.
    */
  def build(
      spark: SparkSession,
      silver: DataFrame,
      spec: DimSpec,
      existing: Option[DataFrame],
      incrementalFlag: String = "1"): DataFrame = {
    val (newKeyed, old) = buildParts(spark, silver, spec, existing, incrementalFlag)
    newKeyed.unionByName(old)
  }

  /** The new/old split with keys assigned, as separate frames:
    * (fresh rows with newly-minted keys, matched rows with their
    * existing keys), both in (key, naturals…) column order. */
  def buildParts(
      spark: SparkSession,
      silver: DataFrame,
      spec: DimSpec,
      existing: Option[DataFrame],
      incrementalFlag: String = "1"): (DataFrame, DataFrame) = {

    val naturals = spec.naturalKeys
    val srcAll = silver.select(spec.cols.map(col): _*)
    val src = if (spec.distinctSource) srcAll.distinct() else srcAll

    val sink = existing.getOrElse {
      // F1 schema trick (gold_dim_branch.py:52-58): empty relation with
      // (key, naturals…) schema — Catalyst folds it, no IO.
      RelOps.emptyWithSchema(
        src.withColumn(spec.keyCol, lit(1L)).select(
          (spec.keyCol +: spec.cols).map(col): _*))
    }

    // J1+F2+F3 — new/old split via left-outer join on the natural key
    // ONLY (attrs ride along; the reference joins on the id column,
    // gold_dim_branch.py:79). No broadcast hint: the sink dim grows
    // monotonically under SCD1, so a forced broadcast OOMs at scale —
    // AQE picks broadcast while the dim is genuinely small and switches
    // to shuffle join when it isn't.
    val joined = src.join(
      sink.select((spec.keyCol +: naturals).map(col): _*), naturals, "left")
    val old = joined.filter(col(spec.keyCol).isNotNull)
    val fresh = joined.filter(col(spec.keyCol).isNull).select(spec.cols.map(col): _*)

    // A3/S12 — max-key barrier; Q4/Q7 base semantics.
    val base =
      if (incrementalFlag == "0") 1L
      else existing.map(e => RelOps.maxKeyScalar(e, spec.keyCol, 1L)).getOrElse(1L)

    val newKeyed = spec.keyGen.assign(fresh, naturals.head, spec.keyCol, base)

    (newKeyed.select((spec.keyCol +: spec.cols).map(col): _*),
     old.select((spec.keyCol +: spec.cols).map(col): _*))
  }

  /** Build + durable commit (S7/S8): overwrite on initial load,
    * SCD1-upsert (on the surrogate key — Q3) afterwards.
    *
    * Incremental runs upsert the freshly-keyed rows plus only those
    * matched rows whose content CHANGED: an exact-match anti-join of
    * the matched rows against the stored table drops every row that is
    * byte-identical to what the table already holds (the common case —
    * naturals are the join key), while attribute updates for matched
    * keys still flow through (Delta whenMatchedUpdateAll parity).
    * Delta's MERGE exploits the same fact by rewriting only matched
    * files; here only changed rows' hash buckets are rewritten. */
  /** @param numBuckets create-time bucket count for the backing table
    *        (0 = Scd1Merge default). Size ≈ table_bytes / 256 MB; small
    *        dims want few buckets — an oversized count shatters them
    *        into one-row files and multiplies commit file ops. */
  /** @param batchId pipeline batch stamp recorded on the commit —
    *        see [[Pipeline.verifyConsistent]] ("" = unstamped). */
  def buildAndCommit(
      spark: SparkSession,
      silver: DataFrame,
      spec: DimSpec,
      tablePath: String,
      incrementalFlag: String = "1",
      numBuckets: Int = 0,
      batchId: String = ""): DataFrame = {
    // tableExists, not File.exists: a crashed first commit can leave a
    // dir holding only uncommitted residue — that is NOT a table
    val existing =
      if (Scd1Merge.tableExists(tablePath)) Some(Scd1Merge.readTable(spark, tablePath))
      else None
    val (newKeyed, old) = buildParts(spark, silver, spec, existing, incrementalFlag)
    val toCommit = existing match {
      case None    => newKeyed.unionByName(old)
      case Some(e) =>
        // NULL-SAFE equality (<=>) on every column: plain `=` treats
        // null ≠ null, so a dim row with a null attribute (31 null
        // DealerNames in the reference data) would never match its
        // stored copy and be re-committed — its bucket rewritten — on
        // every batch forever. Correctness is unaffected (the upsert is
        // idempotent); at scale it is permanent write amplification.
        val cond = old.columns.map(c => old(c) <=> e(c)).reduce(_ && _)
        newKeyed.unionByName(old.join(e, cond, "left_anti"))
    }
    Scd1Merge.upsert(spark, tablePath, toCommit, Seq(spec.keyCol), numBuckets,
      batchId = batchId)
    Scd1Merge.readTable(spark, tablePath)
  }
}

object FactBuilder {

  /** Fact build (gold_fact.py:34-38,56-59): resolve each foreign key by
    * left-joining its dim (broadcast — dims are small by construction),
    * keep measures + surrogate keys, then composite-key upsert (Q8).
    *
    * `dims` maps each dim to (dimDf, joinKeys, surrogateKey).
    */
  def resolve(
      silver: DataFrame,
      measures: Seq[String],
      dims: Seq[(DataFrame, Seq[String], String)]): DataFrame = {
    // No forced broadcast: dims grow without bound under SCD1; AQE
    // broadcasts the genuinely-small ones at runtime.
    val joined = dims.foldLeft(silver) { case (acc, (dim, keys, _)) =>
      acc.join(dim, keys, "left")
    }
    val keep = measures ++ dims.map(_._3)
    joined.select(keep.map(col): _*)
  }

  def commit(spark: SparkSession, tablePath: String, fact: DataFrame,
      surrogateKeys: Seq[String], numBuckets: Int = 0,
      batchId: String = ""): Unit =
    Scd1Merge.upsert(spark, tablePath, fact, surrogateKeys, numBuckets,
      batchId = batchId)
}

/** Cross-table batch consistency for a multi-table pipeline run.
  *
  * A medallion batch commits several tables in sequence (dims, then the
  * fact); each commit is atomic per table, but a crash BETWEEN commits
  * leaves the dims stamped with a batch the fact never saw. Reruns are
  * idempotent (the reference's own recovery posture — SCD1 re-commits
  * are content no-ops), so the repair is simply "run the batch again";
  * what was missing is DETECTING the state and naming the rerun. Every
  * commit therefore stamps the driving watermark/batch id into the
  * table manifest ([[graft.merge.Scd1Merge.upsert]]'s `batchId`), and
  * [[verifyConsistent]] — a metadata-only probe, one manifest read per
  * table, no data scanned — compares the stamps. */
final case class ConsistencyReport(
    head: Option[String],
    stamps: Map[String, Option[String]],
    behind: Seq[String]) {
  /** True iff every probed table is stamped with the head batch. */
  def consistent: Boolean = behind.isEmpty
}

/** PIPELINE-LEVEL ATOMIC PUBLISH (VERDICT r7 ask #3): one pointer file
  * covering every member table's commit, flipped by a single atomic
  * rename AFTER all the batch's member commits land. [[Pipeline
  * .verifyConsistent]] detects a torn batch; this PREVENTS readers from
  * ever observing one: a reader that resolves tables through
  * [[readPublished]] sees the last published (commit-pinned) set — a
  * crash between member commits leaves the pointer at the previous
  * batch, so the half-landed state is invisible until the rerun
  * completes and re-publishes.
  *
  * The pin is a SNAPSHOT read ([[Scd1Merge.readTableAt]]), so member
  * tables' `retainVersions` must cover the publish lag (commits landed
  * since the last publish) — the same retention contract snapshots and
  * change feeds already carry; a too-deep pin fails loudly, never
  * partially. Publishing is metadata-only: O(tables) manifest reads +
  * one file rename, no data touched. */
object Publish {
  private val PointerName = "_pipeline_manifest"
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)

  /** Pin every member table's CURRENT live commit into the pipeline
    * pointer — the batch's one commit point. Returns the pinned
    * (name → commit) map. */
  def publish(root: String, tables: Map[String, String],
              batchId: String = ""): Map[String, Int] = {
    val pins = tables.map { case (name, path) =>
      val c = Scd1Merge.tableCommit(path).getOrElse(
        throw new IllegalStateException(
          s"publish: member table '$name' ($path) has no manifest — " +
          "all member commits must land before the batch publishes"))
      (name, path, c)
    }.toSeq
    val body = (s"batch=${enc(batchId)}" +:
      pins.sortBy(_._1).map { case (n, p, c) => s"${enc(n)}\t${enc(p)}\t$c" })
      .mkString("\n")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val tmp = java.nio.file.Paths.get(root, PointerName + ".tmp")
    // fsync body before the rename — the pointer IS the pipeline's
    // commit record; an empty file after power loss would unpublish
    val ch = java.nio.channels.FileChannel.open(tmp,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      ch.force(true)
    } finally ch.close()
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(root, PointerName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    pins.map(p => p._1 -> p._3).toMap
  }

  /** The published set: (batchId, name → (path, pinned commit)); None =
    * never published. */
  def published(root: String): Option[(String, Map[String, (String, Int)])] = {
    val p = java.nio.file.Paths.get(root, PointerName)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val lines = java.nio.file.Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
      val batch = lines.find(_.startsWith("batch=")).map(l => dec(l.stripPrefix("batch="))).getOrElse("")
      val pins = lines.filter(_.contains("\t")).map { l =>
        val Array(n, path, c) = l.split("\t", 3)
        dec(n) -> (dec(path), c.toInt)
      }.toMap
      Some((batch, pins))
    }
  }

  /** Snapshot-read member `name` AT its published commit: later member
    * commits (including a torn batch's half) are invisible until the
    * next publish. */
  def readPublished(spark: SparkSession, root: String, name: String): DataFrame = {
    val (_, pins) = published(root).getOrElse(throw new IllegalStateException(
      s"readPublished: $root has no pipeline manifest (nothing published)"))
    val (path, pinned) = pins.getOrElse(name, throw new IllegalArgumentException(
      s"readPublished: '$name' is not a member of the published set (${pins.keys.mkString(",")})"))
    val live = Scd1Merge.tableCommit(path).getOrElse(throw new IllegalStateException(
      s"readPublished: member table '$name' ($path) lost its manifest"))
    Scd1Merge.readTableAt(spark, path, live - pinned)
  }
}

object Pipeline {

  /** Probe each table's manifest batch stamp and report which tables
    * are BEHIND the head (maximum) stamp — those are the tables whose
    * batch commit was lost to a crash; rerunning the head batch
    * repairs them idempotently. Batch ids must be lexicographically
    * monotone across runs (watermark strings and zero-padded sequence
    * numbers are; the reference's Date_ID watermarks are). A table
    * with no manifest or no stamp yet counts as behind any head.
    *
    * O(tables) manifest reads; nothing is locked — run it at pipeline
    * start (detect + repair before ingesting new data) or from a
    * monitor. */
  def verifyConsistent(tablePaths: Seq[String]): ConsistencyReport = {
    val stamps = tablePaths.map(p => p -> Scd1Merge.tableBatchId(p))
    val head = stamps.flatMap(_._2).maxOption
    val behind = head match {
      case None => Nil
      case Some(h) => stamps.collect { case (p, s) if !s.contains(h) => p }
    }
    ConsistencyReport(head, stamps.toMap, behind)
  }
}

object IngestRunner {

  /** One watermark-gated incremental ingest run (SURVEY.md §3.1):
    * read state → current = max(watermarkCol) → copy rows in
    * (last, current] to bronze (append) → advance state atomically.
    * The range predicate is pushed into the source scan by Catalyst
    * (F5). Returns the number of batches that did work.
    */
  def run(
      spark: SparkSession,
      source: DataFrame,
      watermarkCol: String,
      store: WatermarkStore,
      bronzeDir: String): Long = {
    val last = store.read()
    val cur = source.agg(max(col(watermarkCol).cast("string"))).first().getString(0)
    if (cur == null || cur <= last) return 0L
    val batch = source.filter(
      col(watermarkCol).cast("string") > last &&
      col(watermarkCol).cast("string") <= cur)
    batch.write.mode(SaveMode.Append).parquet(bronzeDir)
    store.advance(cur)
    1L
  }

  /** LATE-DATA variant (the SURVEY §2.6 extension). [[run]] is faithful
    * to the reference: a row whose watermark value is at or below
    * `last_load` when it ARRIVES is silently never ingested (quirk —
    * the range predicate has already moved past it). This variant
    * accepts a configurable REPROCESSING LOWER BOUND: each run scans
    * `(min(reprocessFloor, last), current]` — so late arrivals inside
    * the floor window are picked up — and lands rows EXACTLY ONCE by
    * upserting into a KEYED bronze table ([[Scd1Merge]]) instead of
    * appending: re-scanned rows that already landed dedup on their
    * primary key (idempotent buckets), late rows insert.
    *
    * At scale, set the floor to `current - lateness_bound` (e.g. 3
    * days): the re-scan is bounded by the floor window, the upsert
    * rewrites only touched buckets, and the source scan still prunes
    * on the pushed range predicate (F5).
    *
    * @return number of runs that did work (0 = nothing in range) */
  def runWithReprocess(
      spark: SparkSession,
      source: DataFrame,
      watermarkCol: String,
      store: WatermarkStore,
      bronzeTable: String,
      keys: Seq[String],
      reprocessFloor: Option[String] = None,
      numBuckets: Int = 0): Long = {
    val last = store.read()
    val lower = reprocessFloor.filter(_ < last).getOrElse(last)
    val cur = source.agg(max(col(watermarkCol).cast("string"))).first().getString(0)
    if (cur == null || cur <= lower) return 0L
    val batch = source.filter(
      col(watermarkCol).cast("string") > lower &&
      col(watermarkCol).cast("string") <= cur)
    Scd1Merge.upsert(spark, bronzeTable, batch, keys, numBuckets)
    if (cur > last) store.advance(cur)
    1L
  }
}
