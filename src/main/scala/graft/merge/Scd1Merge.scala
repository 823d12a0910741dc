package graft.merge

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, Not, Or}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, NumericType, ShortType, StringType, StructType, TimestampNTZType, TimestampType, Decimal}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** SCD Type-1 upsert without Delta Lake (SURVEY.md §7.3).
  *
  * The reference upserts with Delta `MERGE ... whenMatchedUpdateAll
  * .whenNotMatchedInsertAll` (gold_dim_branch.py:177-184,
  * gold_fact.py:53-59). No Delta jar ships in this environment, so the
  * merge is re-expressed as plain relational algebra:
  *
  *   merged = target ANTI-JOIN source ON keys   -- unmatched target rows
  *            UNION BY NAME source              -- matched rows replaced,
  *                                             --  new rows inserted
  *
  * Semantics preserved from Delta:
  *  - multiple source rows matching one target row is an error
  *    (quirk Q8) — enforced by [[requireUniqueSourceKeys]];
  *  - the merge key is whatever the caller passes (the reference merges
  *    on SURROGATE keys, quirk Q3 — load-bearing for idempotency).
  *
  * Durable layout — hash-bucketed with a MANIFEST (the poor man's Delta
  * log). The table dir holds `_graft_manifest` (one atomically-renamed
  * file naming every live bucket dir) and versioned bucket dirs
  * `data/b<bucket>_v<version>/`. A merge writes NEW versions of only
  * the source-touched buckets, then swaps the manifest in one atomic
  * rename: a reader resolves the manifest first and therefore sees the
  * whole table entirely pre-commit or entirely post-commit — a crash
  * between bucket writes is unobservable (the half-written versions are
  * unreferenced garbage, swept by the next upsert). The manifest body is
  * fsync'd before the rename (and the table dir after it, best-effort),
  * so the commit survives power loss, not just process crash.
  *
  * READER ISOLATION (snapshot retention): a commit does NOT delete the
  * bucket versions it replaces — the last [[DefaultRetainVersions]]
  * historical versions per bucket are kept, so a reader that resolved
  * the OLD manifest (a minutes-long scan on a big cluster) still finds
  * its files after a concurrent upsert lands. Only versions NEWER than
  * the live one (crash residue from an uncommitted write) are swept
  * eagerly. [[vacuum]] is the age-out dial: it drops history beyond a
  * chosen depth plus pre-migration leftovers. A reader can thus lag the
  * writer by up to `retainVersions` commits per table before its files
  * disappear — size the retention to the longest expected scan.
  *
  * WRITER MUTUAL EXCLUSION: every mutating entry point (upsert, compact,
  * vacuum) takes a lease-based lock file (`_graft_lock`, created with
  * CREATE_NEW — atomic on every real filesystem). A second concurrent
  * writer fails LOUDLY instead of silently interleaving manifest swaps
  * (Delta gets the same guarantee from optimistic concurrency). A
  * crashed writer's lease expires after [[lockLeaseMillis]]; the next
  * writer takes the stale lock over. Right before the manifest swap —
  * i.e. after the long bucket write, the part of a commit that can
  * outlive a lease — the writer re-validates and extends its lease
  * ([[refreshLease]]): a writer whose lease was taken over mid-write
  * ABORTS without touching the manifest, so even a
  * longer-than-the-lease commit cannot clobber the takeover writer.
  *
  * Scale notes: the anti-join shuffles both sides on the merge keys
  * (or broadcasts the source when it is a small batch — the common
  * incremental case, left to AQE/the broadcast threshold). Nothing here
  * is driver-bound; the dup check is an aggregate, the touched-bucket
  * probe collects ≤numBuckets rows, and the manifest is O(numBuckets)
  * lines.
  */
object Scd1Merge {

  /** Replicates Delta's multiple-match error: fails the job if any merge
    * key occurs more than once in the source batch (quirk Q8,
    * gold_fact.py:56-59 would throw inside Delta). An eager hash-agg +
    * isEmpty (partial-aggregated, early-terminating) — measured cheaper
    * than riding the merge plan with a window-count guard, whose
    * per-key sort shuffle doubled pipeline merge times. */
  def requireUniqueSourceKeys(source: DataFrame, keys: Seq[String]): Unit = {
    val dup = source.groupBy(keys.map(col): _*).count().filter(col("count") > 1)
    if (!dup.isEmpty)
      throw new IllegalArgumentException(
        s"SCD1 merge aborted: duplicate source rows for merge key ${keys.mkString(",")}")
  }

  /** Pure (in-memory) merge of `source` into `target` on `keys`. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    requireUniqueSourceKeys(source, keys)
    target.join(source, keys, "left_anti")
      .unionByName(source.select(target.columns.toIndexedSeq.map(col): _*))
  }

  /** Bucket count used when the caller doesn't choose one. At scale,
    * pick ≈ table_bytes / 256 MB at create time — NOT from
    * `optimizedPlan.stats` of the source frame: above a scan (joins,
    * windows) those estimates explode by orders of magnitude, and an
    * oversized bucket count shatters a small table into one-row files
    * (measured 2-3× slower pipeline commits). */
  val DefaultNumBuckets = 32

  /** Historical bucket versions kept per bucket after a commit (the
    * snapshot-retention dial). 1 = a reader may cross ONE concurrent
    * upsert per table and still materialize its snapshot; raise it when
    * scans can lag the writer by more commits. [[vacuum]] reclaims. */
  val DefaultRetainVersions = 1

  /** Writer-lease duration. A writer that dies without releasing its
    * lock blocks the table until the lease expires; afterwards the next
    * writer takes over. Must exceed the longest expected commit. */
  @volatile var lockLeaseMillis: Long = 15L * 60 * 1000

  /** Commit-tax phase accumulator: nanos per named protocol phase,
    * summed across every commit this JVM runs. Lets the bench separate
    * protocol cost (lock, sweep, manifest fsync) from query cost
    * (probe/merge Spark jobs) without a profiler; the overhead is two
    * nanoTime calls per phase. */
  private[graft] val phaseNanos =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] def resetPhases(): Unit = phaseNanos.clear()
  private def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    // label the phase's Spark jobs (guide §1.5) — thread-local, and
    // AQE's withThreadLocalCaptured propagates it to its stage jobs,
    // so UI/JobTrace attribution survives adaptive execution
    val sc = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext)
    val prev = sc.flatMap(c => Option(c.getLocalProperty("spark.job.description")))
    sc.foreach(_.setJobDescription(s"scd1:$name"))
    try body
    finally {
      sc.foreach(_.setJobDescription(prev.orNull))
      phaseNanos.merge(name, (System.nanoTime() - t0): java.lang.Long,
        (a: java.lang.Long, b: java.lang.Long) => a + b)
    }
  }

  private val BucketCol = "__bucket"
  private val ManifestName = "_graft_manifest"
  private val LockName = "_graft_lock"
  private val LegacyMetaName = "_graft_buckets"
  private val HistoryDir = "_graft_history"

  /** Per-column min/max for one bucket version — the data-skipping
    * unit (Delta records the same per file). Values are stored as
    * strings; `typ` picks the comparison domain: 'l' integral (incl.
    * date days / timestamp micros), 'd' floating, 's' UTF-8 string. */
  private[graft] final case class ColStats(typ: Char, min: String, max: String)

  /** Live table state: commit number + bucket count + the merge-key
    * column list the buckets are hashed on (recorded so readers can
    * compute a key-equality predicate's bucket without trusting the
    * caller; empty for legacy manifests) + bucket → live dir (relative
    * to the table path) + per-bucket column stats for the tracked
    * columns (merge keys + any declared stats columns; absent for
    * legacy/migrated buckets — readers treat missing stats as
    * can-match). Legacy pre-manifest dirs (`__bucket=N`) are valid
    * entries — migration is just writing a manifest that names them.
    * `commit` increments per manifest swap; pre-history manifests
    * parse as commit 0. */
  private final case class Manifest(numBuckets: Int, dirs: Map[Int, String],
                                    commit: Int = 0,
                                    stats: Map[Int, Map[String, ColStats]] = Map.empty,
                                    keys: Seq[String] = Nil,
                                    batch: String = "",
                                    // within-bucket clustering state (recluster):
                                    // the declared sort spec + the set of live DIR
                                    // NAMES written clustered. Dir names are
                                    // versioned, so any commit that rewrites a
                                    // bucket invalidates its marker for free —
                                    // carriers (upsert/delete/compact) just copy
                                    // these fields through.
                                    clusterCols: Seq[String] = Nil,
                                    clusterZBits: Int = 0,
                                    clustered: Set[String] = Set.empty,
                                    // DELETION VECTOR: relative dir of the
                                    // key-tombstone parquet ("" = none). Rows
                                    // whose merge keys appear there are
                                    // logically deleted — every reader
                                    // anti-joins it; see deleteSoft.
                                    dv: String = "",
                                    // COLUMN MAPPING: physical (as written in
                                    // parquet) → logical (what users see) for
                                    // columns renamed WITHOUT rewriting data;
                                    // identity entries are never stored. Keys
                                    // and stats are tracked physical; see
                                    // renameColumn.
                                    colmap: Map[String, String] = Map.empty,
                                    // DROPPED COLUMNS: physical names removed
                                    // from the logical view WITHOUT rewriting
                                    // data (dropColumn). Files keep the bytes;
                                    // readers filter, writers reject reuse.
                                    dropped: Set[String] = Set.empty,
                                    // COMMIT WALL TIME (epoch millis), stamped
                                    // by commitManifest itself — carriers never
                                    // copy it through. 0 = pre-timestamp
                                    // manifest. Powers TIMESTAMP AS OF reads
                                    // (readTableAtTime) and age-based vacuum.
                                    ts: Long = 0L,
                                    // CONCURRENCY FOOTPRINT, derived by
                                    // commitManifest itself (diff vs the
                                    // previous manifest — carriers never copy
                                    // it): the buckets THIS commit rewrote,
                                    // whether that set is recorded at all
                                    // (false = pre-footprint manifest:
                                    // conservative conflict), and whether
                                    // table-wide metadata (dv, colmap, drops,
                                    // keys, bucket count, cluster spec)
                                    // changed — a metadata change conflicts
                                    // with EVERY concurrent writer. Read by
                                    // upsertConcurrent's rebase check.
                                    touched: Set[Int] = Set.empty,
                                    touchedKnown: Boolean = false,
                                    metaChange: Boolean = false,
                                    // WIDENED TYPES: physical column →
                                    // catalog type for columns whose
                                    // files legitimately hold BOTH a
                                    // narrow and a widened numeric type
                                    // (int→long, float→double — a
                                    // widening upsert rewrites only its
                                    // touched buckets). Readers resolve
                                    // the mixed files against this map
                                    // (mergedRead); absent = plain
                                    // parquet mergeSchema.
                                    widened: Map[String, String] = Map.empty,
                                    // CHECK CONSTRAINTS: name → SQL
                                    // boolean expression over LOGICAL
                                    // columns; every write validates
                                    // incoming/post-image rows (SQL
                                    // CHECK semantics: NULL passes,
                                    // FALSE rejects the whole commit).
                                    // See addConstraint.
                                    constraints: Map[String, String] = Map.empty)

  /** Injectable wall clock (commit timestamps, age-based vacuum
    * cutoffs) — specs pin time-travel/retention boundaries without
    * sleeping; production is real time. */
  private[graft] var clockMillis: () => Long = () => System.currentTimeMillis()

  /** Injected-failure hook for the crash-consistency spec; "" in
    * production. Recognized points: "before-manifest" (bucket versions
    * written, manifest not yet swapped) and "after-manifest" (swapped,
    * old versions not yet swept) — both also fire in [[compact]] and in
    * the initial-create / flat-migration first commits. */
  private[graft] var testFailpoint: String = ""

  /** Spec-only interleave hook: runs at the named point INSIDE the
    * writer's critical section (e.g. a second upsert attempt that must
    * lose the lock race). Production: empty. */
  private[graft] var testHooks: Map[String, () => Unit] = Map.empty

  private[graft] def failpoint(name: String): Unit = {
    testHooks.get(name).foreach(_.apply())
    if (testFailpoint == name) {
      testFailpoint = ""
      throw new IllegalStateException(s"injected failure at $name")
    }
  }

  private def manifestPath(tablePath: String): Path =
    Paths.get(tablePath, ManifestName)

  private def readManifest(tablePath: String): Option[Manifest] = {
    val p = manifestPath(tablePath)
    if (!Files.exists(p)) None else Some(parseManifest(p))
  }

  // stats wire format (3rd tab field of a bucket entry):
  //   col=<typ>:<urlenc(min)>:<urlenc(max)>;col2=...
  // URL-encoding keeps arbitrary string values clear of the manifest's
  // separators; absent field = no stats (pre-stats manifests parse).
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, UTF_8)
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, UTF_8)
  private def statsToField(m: Map[String, ColStats]): String =
    m.toSeq.sortBy(_._1).map { case (c, st) =>
      s"${enc(c)}=${st.typ}:${enc(st.min)}:${enc(st.max)}" }.mkString(";")
  private def statsFromField(f: String): Map[String, ColStats] =
    f.split(";").iterator.filter(_.nonEmpty).map { part =>
      val Array(c, v) = part.split("=", 2)
      val Array(t, mn, mx) = v.split(":", 3)
      dec(c) -> ColStats(t.head, dec(mn), dec(mx))
    }.toMap

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString

  private def parseManifest(p: Path): Manifest = {
    val all = Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)
    // INTEGRITY: every manifest written since the sum line landed ends
    // with `sum=<sha256>` over the other lines. The atomic-rename +
    // fsync commit already rules out torn writes; the checksum catches
    // what that can't — bit rot, filesystem bugs, hand edits — and
    // fails LOUDLY instead of silently misreading bucket paths (a
    // corrupt dir name reads as missing data; a corrupt stats range
    // as a wrong prune). Absent sum = pre-checksum manifest, accepted.
    all.find(_.startsWith("sum=")).foreach { sl =>
      val expect = sl.stripPrefix("sum=")
      val got = sha256Hex(all.filterNot(_.startsWith("sum=")).mkString("\n"))
      if (got != expect) throw new IllegalStateException(
        s"manifest integrity check FAILED for $p: stored sum $expect, " +
        s"computed $got — the file is corrupt (bit rot, fs bug, or hand " +
        "edit); restore from _graft_history")
    }
    val lines = all.filterNot(_.startsWith("sum="))
    val (meta, entries) = lines.partition(l => !l.contains("\t"))
    val nb = meta.find(_.startsWith("nb=")).get.stripPrefix("nb=").toInt
    val commit = meta.find(_.startsWith("commit="))
      .map(_.stripPrefix("commit=").toInt).getOrElse(0)
    val keys = meta.find(_.startsWith("keys="))
      .map(_.stripPrefix("keys=").split(",").iterator.filter(_.nonEmpty).map(dec).toSeq)
      .getOrElse(Nil)
    val batch = meta.find(_.startsWith("batch="))
      .map(l => dec(l.stripPrefix("batch="))).getOrElse("")
    val clusterCols = meta.find(_.startsWith("clustercols="))
      .map(_.stripPrefix("clustercols=").split(",").iterator
        .filter(_.nonEmpty).map(dec).toSeq).getOrElse(Nil)
    val clusterZBits = meta.find(_.startsWith("clusterzbits="))
      .map(_.stripPrefix("clusterzbits=").toInt).getOrElse(0)
    val clustered = meta.find(_.startsWith("clustered="))
      .map(_.stripPrefix("clustered=").split(",").iterator
        .filter(_.nonEmpty).map(dec).toSet).getOrElse(Set.empty[String])
    val dv = meta.find(_.startsWith("dv="))
      .map(l => dec(l.stripPrefix("dv="))).getOrElse("")
    val colmap = meta.find(_.startsWith("colmap="))
      .map(_.stripPrefix("colmap=").split(",").iterator.filter(_.nonEmpty).map { e =>
        val Array(p, l) = e.split(":", 2); dec(p) -> dec(l)
      }.toMap).getOrElse(Map.empty[String, String])
    val dropped = meta.find(_.startsWith("dropped="))
      .map(_.stripPrefix("dropped=").split(",").iterator
        .filter(_.nonEmpty).map(dec).toSet).getOrElse(Set.empty[String])
    val ts = meta.find(_.startsWith("ts="))
      .map(_.stripPrefix("ts=").toLong).getOrElse(0L)
    val touchedLine = meta.find(_.startsWith("touched="))
    val touched = touchedLine
      .map(_.stripPrefix("touched=").split(",").iterator
        .filter(_.nonEmpty).map(_.toInt).toSet).getOrElse(Set.empty[Int])
    val metaChange = meta.exists(_.startsWith("metachange="))
    val widened = meta.find(_.startsWith("widened="))
      .map(_.stripPrefix("widened=").split(",").iterator.filter(_.nonEmpty).map { e =>
        val Array(c, t) = e.split(":", 2); dec(c) -> dec(t)
      }.toMap).getOrElse(Map.empty[String, String])
    val constraints = meta.find(_.startsWith("constraints="))
      .map(_.stripPrefix("constraints=").split(",").iterator.filter(_.nonEmpty).map { e =>
        val Array(n, x) = e.split(":", 2); dec(n) -> dec(x)
      }.toMap).getOrElse(Map.empty[String, String])
    val parsed = entries.map { l =>
      val fields = l.split("\t", 3)
      val b = fields(0).toInt
      (b, fields(1), if (fields.length > 2) statsFromField(fields(2)) else Map.empty[String, ColStats])
    }
    Manifest(nb, parsed.map(e => e._1 -> e._2).toMap, commit,
      parsed.filter(_._3.nonEmpty).map(e => e._1 -> e._3).toMap, keys, batch,
      clusterCols, clusterZBits, clustered, dv, colmap, dropped, ts,
      touched, touchedLine.isDefined, metaChange, widened, constraints)
  }

  /** THE commit point: write-to-tmp + fsync + atomic rename over the
    * live manifest. The body is forced to disk BEFORE the rename (a
    * rename can be durable while the data is not — an empty manifest
    * after power loss would be an unreadable table), and the table dir
    * entry is forced after it where the platform allows. Everything
    * before this call is invisible to readers; everything after is
    * garbage collection.
    *
    * Each commit also lands a HISTORY copy (`_graft_history/<n>`,
    * written before the swap — a crash between the two leaves an
    * unreferenced history file the retry overwrites). History plus
    * version retention = snapshot reads: [[readTableAt]] resolves an
    * old commit's manifest against its still-retained bucket dirs.
    *
    * Returns the manifest AS COMMITTED (with its commit number) — the
    * caller must sweep with that, not with its hand-built value, or
    * the history GC window would compute against commit 0. */
  private def commitManifest(tablePath: String, m: Manifest): Manifest = {
    val prev = readManifest(tablePath)
    val next = prev.map(_.commit + 1).getOrElse(1)
    val now = clockMillis()
    // concurrency footprint: derived HERE by diffing against the
    // manifest being replaced, so every commit path records it without
    // knowing about concurrency at all
    val touched: Set[Int] = prev match {
      case None => m.dirs.keySet
      case Some(p) =>
        (p.dirs.keySet ++ m.dirs.keySet).filter(b => p.dirs.get(b) != m.dirs.get(b))
    }
    val metaChange = prev.exists(p =>
      p.dv != m.dv || p.colmap != m.colmap || p.dropped != m.dropped ||
      p.keys.map(_.toLowerCase) != m.keys.map(_.toLowerCase) ||
      p.numBuckets != m.numBuckets || p.clusterCols != m.clusterCols ||
      p.widened != m.widened || p.constraints != m.constraints)
    val metaLines = Seq(s"nb=${m.numBuckets}", s"commit=$next", s"ts=$now",
      s"touched=${touched.toSeq.sorted.mkString(",")}") ++
      (if (metaChange) Seq("metachange=1") else Nil) ++
      (if (m.keys.nonEmpty) Seq(s"keys=${m.keys.map(enc).mkString(",")}") else Nil) ++
      (if (m.batch.nonEmpty) Seq(s"batch=${enc(m.batch)}") else Nil) ++
      (if (m.clusterCols.nonEmpty)
        Seq(s"clustercols=${m.clusterCols.map(enc).mkString(",")}",
          s"clusterzbits=${m.clusterZBits}") else Nil) ++ {
        // prune stale markers at write time: only LIVE dirs can be clustered
        val live = m.clustered.intersect(m.dirs.values.toSet)
        if (live.nonEmpty)
          Seq(s"clustered=${live.toSeq.sorted.map(enc).mkString(",")}") else Nil
      } ++
      (if (m.dv.nonEmpty) Seq(s"dv=${enc(m.dv)}") else Nil) ++
      (if (m.colmap.nonEmpty)
        Seq(s"colmap=${m.colmap.toSeq.sortBy(_._1)
          .map { case (p, l) => s"${enc(p)}:${enc(l)}" }.mkString(",")}")
       else Nil) ++
      (if (m.dropped.nonEmpty)
        Seq(s"dropped=${m.dropped.toSeq.sorted.map(enc).mkString(",")}")
       else Nil) ++
      (if (m.widened.nonEmpty)
        Seq(s"widened=${m.widened.toSeq.sortBy(_._1)
          .map { case (c, t) => s"${enc(c)}:${enc(t)}" }.mkString(",")}")
       else Nil) ++
      (if (m.constraints.nonEmpty)
        Seq(s"constraints=${m.constraints.toSeq.sortBy(_._1)
          .map { case (n, x) => s"${enc(n)}:${enc(x)}" }.mkString(",")}")
       else Nil)
    val body0 = (metaLines ++
      m.dirs.toSeq.sortBy(_._1).map { case (b, d) =>
        m.stats.get(b).filter(_.nonEmpty) match {
          case Some(st) => s"$b\t$d\t${statsToField(st)}"
          case None => s"$b\t$d"
        }
      }).mkString("\n")
    // integrity sum over everything above it (see parseManifest)
    val body = body0 + "\nsum=" + sha256Hex(body0)
    timed("m-history") {
      val hist = Paths.get(tablePath, HistoryDir)
      Files.createDirectories(hist)
      Files.writeString(hist.resolve(next.toString), body)
    }
    val tmp = Paths.get(tablePath, ManifestName + ".tmp")
    timed("m-fsync-body") {
      val ch = FileChannel.open(tmp, StandardOpenOption.CREATE,
        StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
      try { ch.write(ByteBuffer.wrap(body.getBytes(UTF_8))); ch.force(true) }
      finally ch.close()
    }
    Files.move(tmp, manifestPath(tablePath),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    timed("m-fsync-dir") { fsyncDir(Paths.get(tablePath)) }
    recordCommit(tablePath) // post-commit hook, drained at lock exit
    m.copy(commit = next, ts = now,
      touched = touched, touchedKnown = true, metaChange = metaChange)
  }

  /** Directory-entry fsync (makes the rename itself durable). Works on
    * Linux; best-effort elsewhere — some platforms refuse a read
    * channel on a directory, in which case commit durability degrades
    * to process-crash semantics there. */
  private def fsyncDir(dir: Path): Unit =
    try {
      val ch = FileChannel.open(dir, StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: Exception => () }

  // ---------------- data-skipping stats (write + prune) ----------------

  /** Column types stats are kept for; anything else is untracked
    * (absent stats = can-match — pruning can only ever SKIP a bucket
    * the stats PROVE holds no matching row, never a bucket it is
    * unsure about). 'l' compares as exact integers (incl. date
    * epoch-days and timestamp epoch-micros), 'd' as exact decimals,
    * 's' as UTF-8 bytes — the same binary order Spark's UTF8String
    * comparisons use, so string pruning agrees with filter results
    * beyond the BMP. */
  private def statsTyp(dt: DataType): Option[Char] = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType => Some('l')
    case FloatType | DoubleType | _: DecimalType => Some('d')
    case StringType => Some('s')
    case _ => None
  }

  /** External (Row-facing) agg value → the stats wire string in the
    * typ's comparison domain. */
  private def statValue(dt: DataType, v: Any): String = (dt, v) match {
    case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toString
    case (DateType, d: java.time.LocalDate) => d.toEpochDay.toString
    case (TimestampType, t: java.sql.Timestamp) =>
      val i = t.toInstant; (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    case (TimestampType, t: java.time.Instant) =>
      (t.getEpochSecond * 1000000L + t.getNano / 1000L).toString
    case (TimestampNTZType, t: java.time.LocalDateTime) =>
      // NTZ wall-clock → epoch-micros AS IF UTC: the same convention
      // Spark's internal Long encoding (and so the filter literals
      // statBounds compares against) uses for timestamp_ntz.
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    case _ => v.toString // integral / float / java BigDecimal / string
  }

  /** `statsColumns` entries prefixed `bloom:` request a per-bucket
    * BLOOM FILTER over the column instead of min/max — the
    * point-lookup complement: min/max prunes RANGES but is useless on
    * high-cardinality columns whose values interleave across buckets
    * (hashes, ids, names — every bucket's range covers every probe).
    * The bloom entry rides the same manifest stats field as a
    * pseudo-column (`bloom:<col>` → typ 'b', bitmap in `min`,
    * "m,k,type" in `max`) and [[canMatch]] vetoes equality/IN probes
    * whose hash the bitmap provably never saw — at 100 TB a point
    * lookup on a bloomed column reads ~1 bucket instead of all of
    * them. ~1.4 KiB of manifest per bucket per column
    * ([[graft.functions.BloomUtil.DefaultBits]]). */
  val BloomTag = "bloom:"
  private def isBloomCol(c: String): Boolean =
    c.regionMatches(true, 0, BloomTag, 0, BloomTag.length)
  private def bloomInner(c: String): String = c.substring(BloomTag.length)

  /** Reserved stats pseudo-column: the bucket's EXACT row count, read
    * off the parquet footers in the same metadata pass as min/max
    * (`ColStats('n', count, "")`). Never matches a real predicate
    * column (the `__` prefix is reserved — [[BucketCol]] precedent),
    * so pruning code skips it; [[statsAggregate]] sums it to answer
    * `COUNT(*)` as a driver-side manifest read — at 100 TB a bare
    * count touches ZERO data files. Absent on pre-r10 buckets →
    * conservative bail to a real scan. */
  private[graft] val RowsKey = "__rows"

  /** Stats for `cols` over a just-written staging dir: min/max for
    * plain entries, bloom bitmaps for `bloom:`-tagged ones, merged
    * per bucket. */
  private def bucketStats(spark: SparkSession, stagingDir: String,
                          cols: Seq[String]): Map[Int, Map[String, ColStats]] = {
    val (bloomCols, mmCols) = cols.distinct.partition(isBloomCol)
    val mm = bucketMinMaxStats(spark, stagingDir, mmCols)
    if (bloomCols.isEmpty) mm
    else {
      val bl = bloomBucketStats(spark, stagingDir, bloomCols.map(bloomInner))
      (mm.keySet ++ bl.keySet).iterator.map { b =>
        b -> (mm.getOrElse(b, Map.empty) ++ bl.getOrElse(b, Map.empty))
      }.filter(_._2.nonEmpty).toMap
    }
  }

  /** Per-bucket bloom bitmaps: ONE ObjectHashAggregate job over the
    * staging dir — `xxhash64(col)` (codegen'd builtin) feeding the
    * fixed-size [[graft.functions.BloomAgg]] bitmap per (bucket,
    * column). The driver collects `buckets × cols` KiB-sized bitmaps,
    * never data. Same conservative posture as min/max: any failure or
    * absent column degrades to no-stats = can-match. */
  private def bloomBucketStats(spark: SparkSession, stagingDir: String,
                               inner: Seq[String]): Map[Int, Map[String, ColStats]] = try {
    import org.apache.spark.sql.GraftExpressionBridge
    // the staging dir is the output of ONE stageWrite job — uniform
    // schema by construction, so the mergeSchema footer job is waste
    val df = spark.read.parquet(stagingDir)
    val fields = df.schema.fields.toSeq
      .filter(f => f.name != BucketCol && inner.exists(_.equalsIgnoreCase(f.name)))
    if (fields.isEmpty || !df.columns.contains(BucketCol)) Map.empty
    else {
      val aggs = fields.zipWithIndex.map { case (f, i) =>
        GraftExpressionBridge.column(
          graft.functions.BloomAgg(
            GraftExpressionBridge.expression(xxhash64(col(f.name))))
            .toAggregateExpression()).as(s"bl$i") }
      val rows = df.groupBy(col(BucketCol)).agg(aggs.head, aggs.tail: _*).collect()
      rows.map { r =>
        val st = fields.zipWithIndex.flatMap { case (f, i) =>
          Option(r.getAs[Array[Byte]](s"bl$i")).map { bytes =>
            (BloomTag + f.name) -> ColStats('b',
              java.util.Base64.getEncoder.encodeToString(bytes),
              s"${graft.functions.BloomUtil.DefaultBits}," +
                s"${graft.functions.BloomUtil.DefaultProbes},${f.dataType.catalogString}") }
        }.toMap
        r.getAs[Int](BucketCol) -> st
      }.filter(_._2.nonEmpty).toMap
    }
  } catch {
    case _: Exception => Map.empty
  }

  /** Per-bucket min/max for `cols` over a just-written staging dir.
    *
    * Primary path: the PARQUET FOOTERS — a driver-side metadata pass,
    * NO Spark job (the write that just happened already computed
    * row-group statistics; re-aggregating the data was a measured
    * ~20-25% tax on every commit). This is Delta's actual design: stats
    * ride the write, the log commit only transcribes them.
    *
    * Fallback: any tracked column the footers could NOT bound in some
    * bucket that holds live values (INT96 timestamps — Spark's legacy
    * default writer form carries no stats — NaN-suppressed floats,
    * exotic types) is re-ranged by ONE column-pruned agg job over just
    * those columns; tables whose tracked columns are all
    * footer-boundable (the common case: integer/string merge keys)
    * never pay a job.
    *
    * Correctness posture is strictly conservative either way: a
    * bucket/column gets stats only when provably bounded; anything
    * else stays absent = can-match. Parquet's own string truncation
    * (prefix min / incremented max) only ever WIDENS the range, so
    * pruning stays sound. All-null row groups legitimately contribute
    * no bound (the agg ignores nulls the same way). */
  private def bucketMinMaxStats(spark: SparkSession, stagingDir: String,
                                cols: Seq[String]): Map[Int, Map[String, ColStats]] = try {
    val root = Paths.get(stagingDir)
    if (!Files.isDirectory(root) || cols.isEmpty) Map.empty
    else {
      val hconf = spark.sessionState.newHadoopConf()
      val prefix = BucketCol + "="
      val poisoned = scala.collection.mutable.Set.empty[String]
      val footer = graft.merge.FsList.list(root)
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(prefix))
        .flatMap { bdir =>
          val b = bdir.getFileName.toString.substring(prefix.length).toInt
          // per-column fold across every row group of every file:
          // Some((typ, mn, mx)) = bounded so far; None = poisoned
          val acc = scala.collection.mutable.Map.empty[String, Option[(Char, String, String)]]
          var bucketRows = 0L
          graft.merge.FsList.list(bdir)
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .foreach { f =>
              val rdr = ParquetFileReader.open(
                HadoopInputFile.fromPath(new HadoopPath(f.toUri), hconf))
              try {
                rdr.getFooter.getBlocks.asScala.foreach { blk =>
                  bucketRows += blk.getRowCount
                  blk.getColumns.asScala.foreach { cc =>
                    val name = cc.getPath.toDotString
                    if (cols.exists(_.equalsIgnoreCase(name)) && name != BucketCol &&
                        !acc.get(name).contains(None)) {
                      val st = cc.getStatistics
                      val allNull = st != null && !st.hasNonNullValue &&
                        st.isNumNullsSet && st.getNumNulls == cc.getValueCount
                      if (allNull) () // no values -> no bound needed
                      else decodeFooterStats(cc.getPrimitiveType, st) match {
                        case Some((t, mn, mx)) =>
                          acc(name) = acc.get(name).flatten match {
                            case Some((t0, mn0, mx0)) =>
                              Some((t0,
                                if (wireLt(t0, mn, mn0)) mn else mn0,
                                if (wireLt(t0, mx0, mx)) mx else mx0))
                            case None => Some((t, mn, mx))
                          }
                        case None => acc(name) = None // live values, no usable bound
                      }
                    }
                  }
                }
              } finally rdr.close()
            }
          poisoned ++= acc.collect { case (c, None) => c }
          val st = acc.toMap.collect { case (c, Some((t, mn, mx))) =>
            c -> ColStats(t, mn, mx) }
          // the exact row count always rides (footers carry it even
          // when no column is boundable) — COUNT(*) pushdown fuel
          Some(b -> (st + (RowsKey -> ColStats('n', bucketRows.toString, ""))))
        }.toMap
      if (poisoned.isEmpty) footer
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"bucketStats: footer-unboundable columns ${poisoned.mkString(",")} in " +
            s"$stagingDir — running the pruned agg fallback")
        val agg = timed("stats-agg") { aggBucketStats(spark, stagingDir, poisoned.toSeq) }
        // agg fills exactly the footer-unboundable columns; footer
        // bounds win everywhere else
        (footer.keySet ++ agg.keySet).iterator.map { b =>
          b -> (agg.getOrElse(b, Map.empty) ++ footer.getOrElse(b, Map.empty))
        }.filter(_._2.nonEmpty).toMap
      }
    }
  } catch {
    // stats are pure optimization: a failed computation (empty staging
    // dir, exotic layout) degrades to an uncommented manifest entry —
    // absent stats = can-match — never a failed commit
    case _: Exception => Map.empty
  }

  /** The agg-job form (one column-pruned groupBy over the staging dir),
    * now only the fallback for footer-unboundable columns. */
  private def aggBucketStats(spark: SparkSession, stagingDir: String,
                             cols: Seq[String]): Map[Int, Map[String, ColStats]] = {
    // one stageWrite job wrote the staging dir: uniform schema
    val df = spark.read.parquet(stagingDir)
    val fields = df.schema.fields.toSeq
      .filter(f => f.name != BucketCol && cols.exists(_.equalsIgnoreCase(f.name)))
      .flatMap(f => statsTyp(f.dataType).map(t => (f.name, f.dataType, t)))
    if (fields.isEmpty || !df.columns.contains(BucketCol)) Map.empty
    else {
      val aggs = fields.zipWithIndex.flatMap { case ((c, _, _), i) =>
        Seq(min(col(c)).as(s"mn$i"), max(col(c)).as(s"mx$i")) }
      val rows = df.groupBy(col(BucketCol)).agg(aggs.head, aggs.tail: _*).collect()
      rows.map { r =>
        val st = fields.zipWithIndex.flatMap { case ((c, dt, t), i) =>
          (Option(r.getAs[Any](s"mn$i")), Option(r.getAs[Any](s"mx$i"))) match {
            case (Some(mn), Some(mx)) => Some(c -> ColStats(t, statValue(dt, mn), statValue(dt, mx)))
            case _ => None
          }
        }.toMap
        r.getAs[Int](BucketCol) -> st
      }.filter(_._2.nonEmpty).toMap
    }
  }

  /** Is `df` a TINY driver-local source (a LocalRelation — rows built
    * on the driver: control tables like centroids/codebooks, MV
    * markers, small fixture batches)? Checked on the ANALYZED plan
    * (already forced by any schema access, so this costs nothing) and
    * bounded so a large collected frame never rides the compact
    * path. */
  private def tinyLocalSource(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    @annotation.tailrec
    def leaf(p: LogicalPlan): Option[LocalRelation] = p match {
      case l: LocalRelation => Some(l)
      // `toDF(names)` / renames / filters stack trivial one-child
      // nodes over the LocalRelation — the rows are still driver-local
      case pr: Project => leaf(pr.child)
      case f: Filter => leaf(f.child)
      case a: SubqueryAlias => leaf(a.child)
      case _ => None
    }
    leaf(df.queryExecution.analyzed)
      .exists(_.data.lengthCompare(10000) <= 0)
  }

  /** Stage `df` bucket-partitioned under `tmp`. The repartition
    * co-locates each bucket so it lands as ~one file instead of
    * partitions × buckets shards. `compact` (tiny driver-local
    * sources, guide §2.4): the frame is already a single partition —
    * one task writes every bucket's (tiny) file, so the keyed
    * repartition exchange is pure overhead and is skipped. */
  private def stageWrite(df: DataFrame, tmp: String,
                         compact: Boolean = false): Unit =
    (if (compact) df.coalesce(1) else df.repartition(col(BucketCol)))
      .write.partitionBy(BucketCol).mode(SaveMode.Overwrite).parquet(tmp)

  /** [[stageWrite]] with a within-bucket sort: buckets may share a
    * shuffle partition, so the sort leads with the bucket id — each
    * written file (one per bucket value via partitionBy) comes out
    * ordered by `sortExprs`, which is what tightens its parquet
    * row-group stats. */
  private def stageWriteSorted(df: DataFrame, sortExprs: Seq[Column],
                               tmp: String): Unit =
    df.repartition(col(BucketCol))
      .sortWithinPartitions(col(BucketCol) +: sortExprs: _*)
      .write.partitionBy(BucketCol).mode(SaveMode.Overwrite).parquet(tmp)

  /** Footer statistics → the stats wire domain ([[statValue]] parity):
    * 'l' integers (dates epoch-days, timestamps epoch-micros), 'd'
    * decimal strings, 's' UTF-8 strings. None = unsupported, treated as
    * unbounded. INT96 timestamps carry no footer stats — SessionConfs
    * writes TIMESTAMP_MICROS so table files never hit that. */
  private def decodeFooterStats(pt: org.apache.parquet.schema.PrimitiveType,
      st: org.apache.parquet.column.statistics.Statistics[_]): Option[(Char, String, String)] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import LogicalTypeAnnotation.{DateLogicalTypeAnnotation, DecimalLogicalTypeAnnotation,
      StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation, TimeUnit}
    if (st == null || !st.hasNonNullValue) return None
    def dec(unscaled: java.math.BigInteger, scale: Int): String =
      new java.math.BigDecimal(unscaled, scale).toString
    (pt.getPrimitiveTypeName, pt.getLogicalTypeAnnotation) match {
      case (INT32, _: DateLogicalTypeAnnotation) =>
        Some(('l', st.genericGetMin.toString, st.genericGetMax.toString))
      case (INT32, d: DecimalLogicalTypeAnnotation) =>
        Some(('d',
          dec(java.math.BigInteger.valueOf(st.genericGetMin.asInstanceOf[Integer].longValue), d.getScale),
          dec(java.math.BigInteger.valueOf(st.genericGetMax.asInstanceOf[Integer].longValue), d.getScale)))
      case (INT32, _) =>
        Some(('l', st.genericGetMin.toString, st.genericGetMax.toString))
      case (INT64, ts: TimestampLogicalTypeAnnotation) => ts.getUnit match {
        case TimeUnit.MICROS =>
          Some(('l', st.genericGetMin.toString, st.genericGetMax.toString))
        case TimeUnit.MILLIS =>
          Some(('l', (st.genericGetMin.asInstanceOf[java.lang.Long] * 1000L).toString,
            (st.genericGetMax.asInstanceOf[java.lang.Long] * 1000L).toString))
        case _ => None // NANOS: not readable as TimestampType here anyway
      }
      case (INT64, d: DecimalLogicalTypeAnnotation) =>
        Some(('d',
          dec(java.math.BigInteger.valueOf(st.genericGetMin.asInstanceOf[java.lang.Long]), d.getScale),
          dec(java.math.BigInteger.valueOf(st.genericGetMax.asInstanceOf[java.lang.Long]), d.getScale)))
      case (INT64, _) =>
        Some(('l', st.genericGetMin.toString, st.genericGetMax.toString))
      case (FLOAT, _) | (DOUBLE, _) =>
        Some(('d', st.genericGetMin.toString, st.genericGetMax.toString))
      case (BINARY, _: StringLogicalTypeAnnotation) =>
        Some(('s',
          st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8,
          st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8))
      case (BINARY, d: DecimalLogicalTypeAnnotation) =>
        Some(('d',
          dec(new java.math.BigInteger(st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes), d.getScale),
          dec(new java.math.BigInteger(st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes), d.getScale)))
      case (FIXED_LEN_BYTE_ARRAY, d: DecimalLogicalTypeAnnotation) =>
        Some(('d',
          dec(new java.math.BigInteger(st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes), d.getScale),
          dec(new java.math.BigInteger(st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes), d.getScale)))
      case _ => None // INT96, BOOLEAN, raw binary, ...
    }
  }

  /** Strict less-than in a stats wire domain (used to fold bounds
    * across row groups/files; same orders the pruning compares with). */
  private def wireLt(t: Char, a: String, b: String): Boolean = t match {
    case 'l' => a.toLong < b.toLong
    case 'd' => new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) < 0
    case _   => UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0
  }

  private def attrNameOf(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Attribute name, looking through a VALUE-PRESERVING numeric
    * widening cast (analysis wraps the narrower column when the
    * literal is wider, e.g. `intCol > 20.5`). Only exact widenings
    * are stripped: byte/short/int → long/double and float → double.
    * long → double is NOT (at 2^53 magnitudes rounding could prune a
    * bucket that holds a matching row). */
  private def attrThroughCast(e: Expression): Option[String] = e match {
    case c: Cast => (c.child.dataType, c.dataType) match {
      case (ByteType | ShortType | IntegerType, LongType | DoubleType) => attrNameOf(c.child)
      case (FloatType, DoubleType) => attrNameOf(c.child)
      case _ => None
    }
    case _ => attrNameOf(e)
  }

  /** Resolve + optimize `predicate` against a (one-bucket) frame of
    * the table's schema to get a TYPED catalyst condition — coercion
    * applied, literal-side casts constant-folded. The Column DSL's own
    * tree is unresolved ColumnNodes in Spark 4 and deliberately not
    * matched by the pruning rules. None = unextractable (e.g. the
    * optimizer proved the filter constant) → callers skip pruning. */
  private[graft] def resolvedPredicate(df: DataFrame, predicate: Column): Option[Expression] =
    try df.filter(predicate).queryExecution.optimizedPlan.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    } catch { case _: Exception => None }

  private def litBig(l: Literal): Option[java.math.BigDecimal] = l.value match {
    case b: Byte => Some(java.math.BigDecimal.valueOf(b.toLong))
    case s: Short => Some(java.math.BigDecimal.valueOf(s.toLong))
    case i: Int => Some(java.math.BigDecimal.valueOf(i.toLong))
    case lo: Long => Some(java.math.BigDecimal.valueOf(lo))
    case f: Float => Some(new java.math.BigDecimal(f.toString))
    case d: Double => Some(new java.math.BigDecimal(d.toString))
    case d: Decimal => Some(d.toJavaBigDecimal)
    case _ => None
  }

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** (compare(min, v), compare(max, v)) in the stats' domain, or None
    * when the literal isn't comparable there (type mismatch, null). */
  private def statBounds(st: ColStats, l: Literal): Option[(Int, Int)] =
    if (l.value == null) None
    else st.typ match {
      case 'l' | 'd' => litBig(l).map { v =>
        (new java.math.BigDecimal(st.min).compareTo(v),
         new java.math.BigDecimal(st.max).compareTo(v))
      }
      case 's' => l.value match {
        case u: UTF8String =>
          val v = u.getBytes
          Some((cmpBytes(st.min.getBytes(UTF_8), v), cmpBytes(st.max.getBytes(UTF_8), v)))
        case _ => None
      }
      case _ => None
    }

  private def statTest(stats: Map[String, ColStats], a: Expression, l: Literal,
                       op: String): Boolean = {
    val name = attrThroughCast(a)
    val minmaxOk = (for {
      n <- name
      st <- stats.find(_._1.equalsIgnoreCase(n)).map(_._2)
      bounds <- statBounds(st, l)
    } yield {
      val (cmpMin, cmpMax) = bounds
      op match {
        case "eq" => cmpMin <= 0 && cmpMax >= 0  // min <= v <= max
        case "ne" => !(cmpMin == 0 && cmpMax == 0) // only all-v buckets can't hold a != v row
        case "lt" => cmpMin < 0                  // a row < v exists iff min < v
        case "le" => cmpMin <= 0
        case "gt" => cmpMax > 0
        case "ge" => cmpMax >= 0
      }
    }).getOrElse(true)
    // bloom can only strengthen an EQUALITY verdict (range ops can't
    // consult a membership filter)
    minmaxOk && (op != "eq" || name.forall(n => bloomTest(stats, n, l)))
  }

  /** Can a bucket's bloom stats hold `col = literal`? Absent or
    * unparseable bloom = can-match (the universal stats posture). The
    * literal is cast to the column's WRITTEN type (carried in the
    * wire's `max` field) before hashing — xxhash64 is type-sensitive,
    * and the probe must hash exactly what the write-side agg hashed;
    * an uncastable literal degrades to can-match, never a wrong
    * prune. */
  private def bloomTest(stats: Map[String, ColStats], name: String,
                        l: Literal): Boolean =
    stats.find(_._1.equalsIgnoreCase(BloomTag + name)).map(_._2) match {
      case Some(st) if st.typ == 'b' =>
        try {
          val Array(m, k, t) = st.max.split(",", 3)
          if (l.value == null) true
          else {
            val dt = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
              .parseDataType(t)
            val casted = Cast(l, dt, Some("UTC")).eval(null)
            if (casted == null) true
            else {
              val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(
                Seq(Literal.create(casted, dt))).eval(null).asInstanceOf[Long]
              graft.functions.BloomUtil.test(
                graft.functions.BloomUtil.fromBytes(
                  java.util.Base64.getDecoder.decode(st.min)),
                m.toInt, k.toInt, h)
            }
          }
        } catch { case _: Exception => true }
      case _ => true
    }

  /** Can a bucket with these stats hold a row matching `e`?
    * Recognized shapes: And/Or, the six comparisons and IN between a
    * bare column and literals (either side), Not(=). Anything else —
    * arithmetic over the column, UDFs, IsNull (stats cover non-null
    * values only) — is conservatively can-match. NULL comparisons
    * match nothing in SQL, so a null literal is simply unprunable
    * here, never wrong. */
  private[graft] def canMatch(stats: Map[String, ColStats], e: Expression): Boolean = e match {
    case And(l, r) => canMatch(stats, l) && canMatch(stats, r)
    case Or(l, r) => canMatch(stats, l) || canMatch(stats, r)
    case EqualTo(a, l: Literal) => statTest(stats, a, l, "eq")
    case EqualTo(l: Literal, a) => statTest(stats, a, l, "eq")
    case EqualNullSafe(a, l: Literal) if l.value != null => statTest(stats, a, l, "eq")
    case EqualNullSafe(l: Literal, a) if l.value != null => statTest(stats, a, l, "eq")
    case LessThan(a, l: Literal) => statTest(stats, a, l, "lt")
    case LessThan(l: Literal, a) => statTest(stats, a, l, "gt")
    case LessThanOrEqual(a, l: Literal) => statTest(stats, a, l, "le")
    case LessThanOrEqual(l: Literal, a) => statTest(stats, a, l, "ge")
    case GreaterThan(a, l: Literal) => statTest(stats, a, l, "gt")
    case GreaterThan(l: Literal, a) => statTest(stats, a, l, "lt")
    case GreaterThanOrEqual(a, l: Literal) => statTest(stats, a, l, "ge")
    case GreaterThanOrEqual(l: Literal, a) => statTest(stats, a, l, "le")
    case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => statTest(stats, a, v.asInstanceOf[Literal], "eq"))
    case InSet(a, hset) => // the optimizer's large-IN form; values are internal
      try hset.exists(v => statTest(stats, a, Literal(v, a.dataType), "eq"))
      catch { case _: Exception => true }
    case Not(EqualTo(a, l: Literal)) => statTest(stats, a, l, "ne")
    case Not(EqualTo(l: Literal, a)) => statTest(stats, a, l, "ne")
    case _ => true
  }

  /** Literal-type → column-type casts where pruning by the cast value
    * is sound (see [[equalityBucket]]): identical types, numeric ↔
    * numeric (an overflowing / truncating cast can only arise when no
    * stored value equals the literal, so the computed bucket may be
    * "wrong" only for predicates that match nothing — the pruned read
    * still returns the correct empty result), and the string → date /
    * timestamp coercion Spark itself applies in comparisons. */
  private def castSafe(lt: DataType, ct: DataType): Boolean =
    lt == ct ||
    (lt.isInstanceOf[NumericType] && ct.isInstanceOf[NumericType]) ||
    (lt == StringType && (ct == DateType || ct == TimestampType))

  /** EXACT bucket pruning for key-equality predicates: if the
    * top-level conjuncts pin EVERY merge key to a literal, the only
    * bucket that can hold a matching row is pmod(hash(keys...), nb) —
    * computed by evaluating the SAME hash expression the writer uses
    * (literals cast to the table's column types) over a one-row frame.
    * This is the pruning lever min/max stats cannot provide in a
    * hash-bucketed layout: the hash scatters the key domain, so every
    * bucket's key range spans the table — but the hash itself pins a
    * point lookup to ONE bucket at any scale. */
  /** Max key-tuple combinations an IN-list prune will hash; beyond
    * this the stats path still applies, hash pruning just opts out. */
  private val MaxInPruneCombos = 128

  /** Hash pruning generalized to IN-lists: if every merge key is
    * pinned by the top-level conjuncts to a literal (EqualTo) or a
    * literal LIST (In), the candidate buckets are the hashes of the
    * value tuples' cross product — a batched point lookup reads only
    * its keys' buckets at any scale. One Spark job over a local
    * combo frame (≤ [[MaxInPruneCombos]] rows), never per-combo. */
  private def equalityBucket(spark: SparkSession, pred: Expression, m: Manifest,
                             schema: StructType): Option[Set[Int]] = {
    if (m.keys.isEmpty) return None
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val eqs: Map[String, Seq[Literal]] = conjuncts(pred).flatMap {
      case EqualTo(a, l: Literal) => attrThroughCast(a).map(_.toLowerCase -> Seq(l))
      case EqualTo(l: Literal, a) => attrThroughCast(a).map(_.toLowerCase -> Seq(l))
      case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        attrThroughCast(a).map(_.toLowerCase -> vs.map(_.asInstanceOf[Literal]))
      case _ => None
    }.toMap
    try {
      // per key: the candidate literal columns (None = key unpinned or
      // a value unprunable -> no hash pruning at all)
      val perKey: Seq[Option[Seq[Column]]] = m.keys.map { k =>
        for {
          ls <- eqs.get(k.toLowerCase)
          f <- schema.fields.find(_.name.equalsIgnoreCase(k))
          if ls.forall(l => l.value != null && castSafe(l.dataType, f.dataType))
          cols = ls.map { l =>
            val v = CatalystTypeConverters.createToScalaConverter(l.dataType)(l.value)
            if (v == null) return None
            lit(v).cast(f.dataType)
          }
        } yield cols
      }
      if (perKey.exists(_.isEmpty)) None
      else {
        val lists = perKey.map(_.get)
        if (lists.map(_.size.toLong).product > MaxInPruneCombos) None
        else {
          val combos = lists.foldLeft(Seq(Seq.empty[Column])) { (acc, vs) =>
            acc.flatMap(prefix => vs.map(prefix :+ _))
          }
          val structs = combos.map(c => struct(c: _*))
          val n = m.keys.size
          val buckets = spark.range(1)
            .select(explode(array(structs: _*)).as("__t"))
            .select(pmod(hash((1 to n).map(i => col(s"__t.col$i")): _*),
              lit(m.numBuckets)).as("b"))
            .collect().iterator
            .filterNot(_.isNullAt(0)).map(_.getInt(0)).toSet
          Some(buckets)
        }
      }
    } catch { case _: Exception => None }
  }

  /** Diagnostic breadcrumb from the last prune decision on this JVM
    * (readTableWhere or delete): (buckets read, live buckets total).
    * Spec- and ops-facing; no correctness path consults it. */
  @volatile private[graft] var lastPrune: (Int, Int) = (-1, -1)

  /** Filtered read with DATA SKIPPING: resolve the manifest, drop every
    * bucket the predicate provably cannot match — key-equality hash
    * pruning plus per-bucket min/max stats — then read only the
    * survivors with the predicate applied as a normal row-level filter
    * (parquet row-group stats keep pruning below the bucket level). At
    * 100 TB this turns a selective read into a metadata decision plus a
    * few bucket scans instead of a full table scan — Delta data
    * skipping re-expressed over the manifest. Falls back to a plain
    * filtered [[readTable]] on legacy layouts (no manifest = no
    * stats). */
  def readTableWhere(spark: SparkSession, tablePath: String,
                     predicate: Column): DataFrame =
    readManifest(tablePath) match {
      case Some(m) if m.dirs.nonEmpty =>
        // one footer read gives the schema the predicate resolves
        // against and the column types the hash cast needs; a
        // post-evolution column missing here just skips pruning.
        // The predicate speaks LOGICAL names; the probe frame is
        // logicalized so it RESOLVES, and the optimizer then pushes
        // the filter below the rename Project, rewriting its
        // attributes to PHYSICAL names — so the pruning math runs
        // against the physical manifest/schema unchanged. (If a
        // predicate defeats pushdown, names stay logical, nothing
        // matches, and pruning degrades conservatively to all
        // buckets.)
        val anyDir = Paths.get(tablePath, m.dirs.toSeq.minBy(_._1)._2).toString
        val raw = readDir(spark, anyDir)
        val probeDf = logicalize(raw, m)
        val cands = resolvedPredicate(probeDf, predicate) match {
          case None => m.dirs.keys.toSeq.sorted // unextractable: no pruning
          case Some(pred) =>
            val hb = equalityBucket(spark, pred, m, raw.schema)
            m.dirs.keys.toSeq.sorted.filter { b =>
              hb.forall(_.contains(b)) && canMatch(m.stats.getOrElse(b, Map.empty), pred)
            }
        }
        lastPrune = (cands.size, m.dirs.size)
        val df =
          if (cands.isEmpty) logicalize(readDir(spark, anyDir), m).limit(0)
          else logicalize(applyDv(spark, tablePath, m,
            mergedRead(spark, m,
              cands.map(b => Paths.get(tablePath, m.dirs(b)).toString))), m)
        val clean = if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df
        clean.filter(predicate)
      case _ => readTable(spark, tablePath).filter(predicate)
    }

  /** Version of a live dir; legacy `__bucket=N` entries version as -1 so
    * their first rewrite lands at `data/bN_v0`. */
  private def versionOf(relDir: String): Int = {
    val i = relDir.lastIndexOf("_v")
    if (relDir.startsWith("data/") && i > 0) relDir.substring(i + 2).toInt else -1
  }

  /** Parse a `data/` entry name as (bucket, version). */
  private def parseVersionDir(name: String): Option[(Int, Int)] = {
    val m = "^b(\\d+)_v(\\d+)$".r.findFirstMatchIn(name)
    m.map(g => (g.group(1).toInt, g.group(2).toInt))
  }

  /** Next version number for bucket `b`: one past the MAX of the live
    * manifest's version and any version dir still on disk. The disk
    * scan is not just for buckets absent from the manifest (never
    * existed, or EMPTIED by a [[delete]] whose old versions are still
    * retained): after a [[restore]] the live manifest deliberately
    * references OLD versions while newer retained dirs coexist on
    * disk — continuing from the manifest alone would collide the next
    * rewrite with retained history. */
  private def nextVersion(tablePath: String, m: Manifest, b: Int): Int = {
    val data = Paths.get(tablePath, "data")
    val onDisk =
      if (!Files.exists(data)) Nil
      else graft.merge.FsList.list(data)
        .flatMap(p => parseVersionDir(p.getFileName.toString))
        .filter(_._1 == b).map(_._2)
    val floor = m.dirs.get(b).map(versionOf).toSeq ++ onDisk
    if (floor.isEmpty) 0 else floor.max + 1
  }

  /** Every manifest still in the retention window: the live one plus
    * history manifests numbered within [commit - retain, commit]. */
  private def retainedManifests(tablePath: String, live: Manifest,
                                retain: Int): Seq[Manifest] = {
    val hist = Paths.get(tablePath, HistoryDir)
    val hs =
      if (!Files.exists(hist)) Nil
      else graft.merge.FsList.list(hist).flatMap { p =>
        p.getFileName.toString.toIntOption
          .filter(n => n <= live.commit && n >= live.commit - retain && n != live.commit)
          .map(_ => parseManifest(p))
      }
    live +: hs
  }

  /** GC by REACHABILITY: first age the history manifests to the
    * retention window (newer-than-live = a crashed commit's dangling
    * copy; older = expired), then delete every `data/` version dir
    * referenced by NO remaining manifest. Subsumes all the cases in
    * one rule: crash residue was never referenced; replaced versions
    * stay exactly as long as a retained manifest names them (including
    * versions of buckets a [[delete]] emptied out of the live
    * manifest); aged history loses its manifest FIRST, so a too-deep
    * [[readTableAt]] always fails loudly rather than partially
    * resolving. */
  private def sweepVersions(tablePath: String, m: Manifest, retain: Int): Unit = {
    val hist = Paths.get(tablePath, HistoryDir)
    if (Files.exists(hist))
      graft.merge.FsList.list(hist).foreach { p =>
        p.getFileName.toString.toIntOption match {
          case Some(n) if n <= m.commit && n >= m.commit - retain => ()
          case _ => deleteRecursively(p)
        }
      }
    val referenced = retainedManifests(tablePath, m, retain)
      .flatMap(mf => mf.dirs.values ++
        (if (mf.dv.nonEmpty) Seq(mf.dv) else Nil)).toSet
    val data = Paths.get(tablePath, "data")
    if (Files.exists(data))
      graft.merge.FsList.list(data).foreach { p =>
        if (!referenced.contains(s"data/${p.getFileName}"))
          deleteRecursively(p)
      }
  }

  /** Drop unreferenced TOP-LEVEL leftovers: pre-migration flat files,
    * replaced legacy `__bucket=N` dirs, the legacy bucket-count meta.
    * These are the previous "version" of a migrated table, retained by
    * the commit path for reader isolation — only [[vacuum]] calls
    * this. Reachability includes retained history manifests, so a
    * legacy dir a snapshot still references survives a retaining
    * vacuum. */
  private def sweepTopLevel(tablePath: String, m: Manifest, retain: Int): Unit = {
    val referenced = retainedManifests(tablePath, m, retain)
      .flatMap(mf => mf.dirs.values ++
        (if (mf.dv.nonEmpty) Seq(mf.dv) else Nil)).toSet
    graft.merge.FsList.list(Paths.get(tablePath)).foreach { p =>
      val name = p.getFileName.toString
      // durable SIDECARS survive GC: the MV definition (_graft_mv —
      // REFRESH in a later session depends on it), the COPY INTO
      // loaded-files log (file-level idempotence depends on it), the
      // top-N MV spec (_graft_topn — TopNMv.refresh from a new
      // session depends on it) and the ANN index registration
      // (_graft_ann — restart auto-arm of the ANN rewrite depends on
      // it). (_graft_staging is an IN-FLIGHT DSv2 write's transient
      // dir — the write itself age-sweeps orphans; vacuuming it here
      // could kill a live concurrent batch write)
      if (name != ManifestName && name != LockName && name != "data" &&
          name != HistoryDir && name != "_graft_mv" &&
          name != "_graft_copy_log" && name != "_graft_staging" &&
          name != "_graft_topn" && name != "_graft_ann" &&
          !referenced.contains(name))
        deleteRecursively(p)
    }
  }

  /** Reclaim retained history: keep `retain` historical versions per
    * bucket and drop pre-migration top-level leftovers. The age-out
    * complement of the retention every commit leaves behind. Takes the
    * writer lock — vacuuming under a live writer would re-create the
    * reader/GC race retention exists to prevent.
    *
    * DEFAULTS to [[DefaultRetainVersions]], matching the commit path:
    * a routine `vacuum(path)` keeps the reader-isolation window the
    * commits just paid for. Full reclaim (drop every snapshot, live
    * only) is the EXPLICIT `retain = 0` — dropping isolation should
    * never be the accident. */
  def vacuum(tablePath: String, retain: Int = DefaultRetainVersions): Unit =
    readManifest(tablePath) match {
      case None => ()
      case Some(_) => withLock(tablePath) { _ =>
        readManifest(tablePath).foreach { m =>
          sweepVersions(tablePath, m, retain)
          sweepTopLevel(tablePath, m, retain)
          sweepStaleStaging(tablePath)
        }
      }
    }

  /** Reclaim abandoned staging siblings (`<table>.tmp*`) left by a
    * CRASHED writer. Age-guarded well past the lock lease so a LIVE
    * optimistic writer's unlocked staging (which by design exists
    * while vacuum holds the lock) is never swept from under it; a
    * staging older than that belongs to a dead process — the lease
    * would have expired long before. */
  private def sweepStaleStaging(tablePath: String): Unit = {
    val dir = Paths.get(tablePath).toAbsolutePath
    val parent = dir.getParent
    if (parent == null || !Files.exists(parent)) return
    val prefix = dir.getFileName.toString + ".tmp"
    val cutoff = clockMillis() - math.max(lockLeaseMillis * 4, 3600L * 1000)
    graft.merge.FsList.list(parent).foreach { p =>
      val n = p.getFileName.toString
      if (n.startsWith(prefix) &&
          (try Files.getLastModifiedTime(p).toMillis < cutoff
           catch { case _: Exception => false }))
        deleteRecursively(p)
    }
  }

  /** AGE-based vacuum — Delta's `VACUUM ... RETAIN n HOURS`: keep
    * every snapshot whose commit stamp is within the window, reclaim
    * older ones. This is the operational dial ("keep 7 days of
    * history") where [[vacuum]]'s version count is the mechanical one;
    * commits are consecutively numbered, so the time window translates
    * EXACTLY to a version-count window against the live commit and the
    * reclaim reuses the reachability sweep verbatim — one GC rule,
    * two coordinates. The live snapshot always survives, however old.
    * Metadata-only scan to pick the cutoff (O(retained commits), no
    * data read before the sweep). */
  def vacuumRetainHours(tablePath: String, hours: Double): Unit = {
    require(hours >= 0, s"vacuumRetainHours: hours must be >= 0, got $hours")
    readManifest(tablePath) match {
      case None => ()
      case Some(_) => withLock(tablePath) { _ =>
        readManifest(tablePath).foreach { live =>
          val cutoff = clockMillis() - (hours * 3600 * 1000).toLong
          val hist = Paths.get(tablePath, HistoryDir)
          val keptCommits =
            if (!Files.exists(hist)) Nil
            else graft.merge.FsList.list(hist)
              .flatMap(p => p.getFileName.toString.toIntOption
                .filter(_ <= live.commit)
                .map { n =>
                  // A pre-timestamp manifest (ts=0, legacy build) has
                  // UNKNOWN age, not infinite age: fall back to the
                  // manifest file's mtime, and if even that is
                  // unreadable, retain — the conservative direction
                  // (same posture as touchedKnown=false → conflict).
                  // Mapping unknown→0 would silently reclaim every
                  // legacy snapshot on the first age-based vacuum.
                  val recorded = parseManifest(p).ts
                  val ts =
                    if (recorded > 0) recorded
                    else (try Files.getLastModifiedTime(p).toMillis
                          catch { case _: Exception => Long.MaxValue })
                  (n, ts)
                })
              .filter(_._2 >= cutoff).map(_._1)
          val oldestKept = (live.commit +: keptCommits).min
          val retain = live.commit - oldestKept
          sweepVersions(tablePath, live, retain)
          sweepTopLevel(tablePath, live, retain)
        }
      }
    }
  }

  // ---------------- writer lock ----------------

  /** Acquire the table's writer lease. Atomic CREATE_NEW of
    * `_graft_lock` holding (holder-uuid, expiry-millis). An unexpired
    * foreign lock throws — loudly, so two writers can never interleave
    * manifest swaps; an expired (or unreadable: crashed mid-write) one
    * is taken over, with CREATE_NEW ruling the takeover race. */
  private def acquireLock(tablePath: String): String = {
    val p = Paths.get(tablePath, LockName)
    val id = java.util.UUID.randomUUID().toString
    var takeovers = 0
    while (takeovers < 3) {
      try {
        Files.write(p, s"$id\t${System.currentTimeMillis() + lockLeaseMillis}".getBytes(UTF_8),
          StandardOpenOption.CREATE_NEW)
        return id
      } catch {
        case _: FileAlreadyExistsException =>
          // lease writes are atomic renames, so an unreadable lock is
          // either pre-atomic-format residue or the file vanishing
          // between exists and read — retry briefly before concluding
          // anything, never map a transient read to "expired" (that
          // mapping would let a second writer take over a LIVE lease)
          def readLease(): Option[(String, Long)] =
            try {
              val Array(h, e) = new String(Files.readAllBytes(p), UTF_8).trim.split("\t", 2)
              Some((h, e.toLong))
            } catch { case _: Exception => None }
          val lease = readLease().orElse { Thread.sleep(50); readLease() }
            .orElse { Thread.sleep(200); readLease() }
          lease match {
            case Some((holder, expiry)) if System.currentTimeMillis() <= expiry =>
              throw new IllegalStateException(
                s"table $tablePath is locked by concurrent writer $holder " +
                s"(lease expires ${java.time.Instant.ofEpochMilli(expiry)}); " +
                "one writer per table — retry after it commits or its lease expires")
            case Some(_) => // stale lease: take over and retry
              takeovers += 1
              Files.deleteIfExists(p)
            case None => // persistently unreadable (or deleted mid-read): retry the create
              takeovers += 1
              Files.deleteIfExists(p)
          }
      }
    }
    throw new IllegalStateException(s"could not acquire writer lock for $tablePath")
  }

  /** Release only OUR lease (the lock may have been taken over after
    * expiry, or deleted with the dir on empty-create cleanup). */
  private def releaseLock(tablePath: String, id: String): Unit = {
    val p = Paths.get(tablePath, LockName)
    try {
      if (new String(Files.readAllBytes(p), UTF_8).startsWith(id + "\t"))
        Files.deleteIfExists(p)
    } catch { case _: Exception => () }
  }

  /** Heartbeat, called right before the manifest swap (i.e. AFTER the
    * long Spark write — the part of a commit that can outlive a
    * lease): extend OUR lease, or, if it expired mid-write and another
    * writer took over, ABORT before touching the manifest — the new
    * versions stay unreferenced garbage and the takeover writer's
    * commit wins. Shrinks the lease-overrun corruption window from
    * "length of the bucket write" to the ms between this check and the
    * rename. */
  /** Atomic lease write: tmp + ATOMIC_MOVE, so a concurrent
    * acquireLock can never observe a half-written (empty) lock file
    * and misread a LIVE lease as expired (the pre-atomic truncate-
    * then-write had exactly that window, widened by the periodic
    * heartbeat). Tmp name carries the holder id — two processes'
    * lease writes must not stomp each other's tmp. */
  private def writeLease(p: Path, id: String): Unit = {
    val tmp = p.resolveSibling(s"$LockName.$id.tmp")
    Files.write(tmp, s"$id\t${System.currentTimeMillis() + lockLeaseMillis}".getBytes(UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def refreshLease(tablePath: String, id: String): Unit = {
    val p = Paths.get(tablePath, LockName)
    val holder = try new String(Files.readAllBytes(p), UTF_8)
      catch { case _: Exception => "" }
    if (!holder.startsWith(id + "\t"))
      throw new IllegalStateException(
        s"writer lease for $tablePath was lost mid-commit (expired and taken " +
        "over?) — aborting WITHOUT swapping the manifest; raise lockLeaseMillis " +
        "above the longest commit")
    writeLease(p, id)
  }

  /** Background lease heartbeat for the duration of the critical
    * section: a daemon thread re-extends OUR lease every lease/3, so a
    * commit longer than [[lockLeaseMillis]] (a multi-minute bucket
    * write on a big cluster) never loses its lease while the writer is
    * actually alive — without the heartbeat the whole write would be
    * thrown away at the [[refreshLease]] abort, and the table thrashes
    * under takeover churn. A DEAD writer stops heartbeating, its lease
    * expires, and takeover proceeds exactly as before. If a takeover
    * happens during a stall (e.g. a GC pause longer than the lease),
    * the heartbeat's holder check is BEST-EFFORT — the check and the
    * extending write are not atomic, so a takeover landing exactly
    * between them can be overwritten; the actual safety net is the
    * final [[refreshLease]] check at the manifest swap, which aborts
    * this writer before the manifest is touched.
    *
    * Shutdown is race-free w.r.t. [[releaseLock]]: the stop flag is
    * flipped under the same monitor the heartbeat writes under, so
    * once the flip lands no further lease write can occur — an
    * in-flight write either completed before the flip (and is then
    * released normally) or sees the flag and skips. All tables share
    * ONE daemon scheduler (per-commit executor churn was measurable
    * on commit-heavy pipelines). */
  private lazy val heartbeatExec: java.util.concurrent.ScheduledThreadPoolExecutor = {
    val e = new java.util.concurrent.ScheduledThreadPoolExecutor(1, (r: Runnable) => {
      val t = new Thread(r, "graft-lock-heartbeat"); t.setDaemon(true); t
    })
    e.setRemoveOnCancelPolicy(true)
    e
  }

  private def withHeartbeat[T](tablePath: String, id: String)(body: => T): T = {
    val period = math.max(lockLeaseMillis / 3, 50L)
    val p = Paths.get(tablePath, LockName)
    val gate = new Object
    @volatile var stopped = false
    val task = heartbeatExec.scheduleAtFixedRate(() => {
      try gate.synchronized {
        if (!stopped) {
          val holder = try new String(Files.readAllBytes(p), UTF_8)
            catch { case _: Exception => "" }
          if (holder.startsWith(id + "\t")) writeLease(p, id)
        }
      } catch { case _: Exception => () }
    }, period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    try body finally {
      gate.synchronized { stopped = true } // waits out any in-flight write
      task.cancel(false)
    }
  }

  // ---------------- post-commit hook ----------------

  /** Fired once per committed table path AFTER the writer's lock is
    * released (never inside the critical section — maintenance work
    * must not stretch it). Installed by
    * [[graft.pipeline.MvMaintenance.armHooks]] for AUTO REFRESH MVs;
    * identity otherwise. Commits are RECORDED at [[commitManifest]]
    * (the single choke point every write path funnels through) into a
    * thread-local pending list and DRAINED by the outermost lock
    * scope on this thread — so a multi-commit op fires once per
    * distinct path, after its own lock dropped, and a hook-triggered
    * write (an MV refresh) drains its own commits recursively. */
  @volatile private[graft] var onCommitHook: String => Unit = _ => ()

  private val pendingCommits = new ThreadLocal[List[String]] {
    override def initialValue: List[String] = Nil
  }
  private val lockDepth = new ThreadLocal[Int] {
    override def initialValue: Int = 0
  }

  private def recordCommit(tablePath: String): Unit =
    pendingCommits.set(tablePath :: pendingCommits.get)

  private def drainCommits(): Unit = {
    if (lockDepth.get != 0) return // an outer scope drains
    var pending = pendingCommits.get
    while (pending.nonEmpty) {
      pendingCommits.set(Nil)
      pending.reverse.distinct.foreach { p =>
        try onCommitHook(p) catch { case _: Exception => () }
      }
      // a hook that committed WITHOUT taking a lock on this thread
      // (not a thing today, but cheap to be complete about)
      pending = pendingCommits.get
    }
  }

  // the partitioned layer shares this machinery: its parent lock
  // scopes nest into the same depth counter (so child commits during
  // a partitioned op fire only after the PARENT lock released) and
  // its parent-manifest swaps record into the same pending list
  private[graft] def recordCommitExternal(tablePath: String): Unit =
    recordCommit(tablePath)
  private[graft] def pushLockScope(): Unit =
    lockDepth.set(lockDepth.get + 1)
  private[graft] def popLockScopeAndDrain(): Unit = {
    lockDepth.set(lockDepth.get - 1)
    drainCommits()
  }

  // ---------------- expected-commit fence ----------------

  /** Thread-local expected-commit fences, keyed by table path. See
    * [[withCommitFence]]. */
  private val commitFenceTL = new ThreadLocal[Map[String, Int]] {
    override def initialValue: Map[String, Int] = Map.empty
  }

  /** Run `body` with an EXPECTED-COMMIT fence on `tablePath`: the
    * FIRST Scd1Merge write acquiring this table's lock on this thread
    * during `body` verifies — while HOLDING the lock, before touching
    * anything — that the live manifest commit still equals `expected`
    * (0 = the table must not exist yet), and aborts with
    * `ConcurrentModificationException` otherwise. Closes the
    * parent-locked partitioned writer's TOCTOU: between its
    * residue-reconcile check and its child write, only child locks
    * serialize, so an optimistic stage can land a child commit in
    * that window — an unfenced locked write would then merge ON TOP
    * of the staged rows and pin them, silently adopting a batch whose
    * owner is told (via its adopt-phase CME) that it aborted. With
    * the fence the LOCKED writer is the one that aborts loudly; the
    * stager's adopt owns the partition. Consumed on first check so a
    * multi-commit op (the fenced write itself moves the commit) never
    * trips over its own progress. */
  private[graft] def withCommitFence[T](tablePath: String, expected: Int)
                                       (body: => T): T = {
    val prev = commitFenceTL.get
    commitFenceTL.set(prev + (tablePath -> expected))
    try body finally commitFenceTL.set(prev)
  }

  private def checkCommitFence(tablePath: String): Unit = {
    val fences = commitFenceTL.get
    fences.get(tablePath).foreach { expected =>
      commitFenceTL.set(fences - tablePath) // consume: check-once
      val live = readManifest(tablePath).map(_.commit).getOrElse(0)
      if (live != expected) throw new java.util.ConcurrentModificationException(
        s"expected-commit fence: $tablePath is at commit $live, expected " +
        s"$expected — a concurrent writer committed between the " +
        "parent-locked writer's residue check and its child write; " +
        "aborting rather than adopting the foreign rows (retry the " +
        "parent operation)")
    }
  }

  private def withLock[T](tablePath: String)(body: String => T): T = {
    val id = timed("lock") { acquireLock(tablePath) }
    lockDepth.set(lockDepth.get + 1)
    try withHeartbeat(tablePath, id) {
      checkCommitFence(tablePath)
      body(id)
    }
    finally {
      lockDepth.set(lockDepth.get - 1)
      timed("lock") { releaseLock(tablePath, id) }
      drainCommits()
    }
  }

  /** Lock acquisition that WAITS (bounded, exponential backoff) on a
    * live foreign lease instead of failing — the optimistic-commit
    * posture: by the time a writer reaches the lock its expensive
    * Spark work is already staged, and the holder's critical section
    * is short (adopt + manifest swap), so waiting is the right move
    * where the pessimistic path's fail-loudly protects a full
    * merge-under-lock. */
  private def acquireLockWait(tablePath: String, timeoutMillis: Long): String = {
    val deadline = System.currentTimeMillis() + timeoutMillis
    var backoff = 25L
    while (true) {
      try return acquireLock(tablePath)
      catch {
        case e: IllegalStateException
            if e.getMessage != null &&
               e.getMessage.contains("locked by concurrent writer") =>
          if (System.currentTimeMillis() >= deadline) throw e
          Thread.sleep(backoff)
          backoff = math.min(backoff * 2, 1000L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Bounded CHILD-lock acquisition for the partitioned layer's
    * orphan reclamation ([[PartitionedTable]] rollback): deleting a
    * conflicted stager's child dir must hold the child's writer lock
    * first — a SECOND optimistic stager that picked the same
    * deterministic child name may be mid-write holding only that
    * lock (invisible to a commit probe), and an unlocked delete
    * would remove its in-flight data files. */
  private[merge] def withTableLockWait[T](tablePath: String,
                                          timeoutMillis: Long)
                                         (body: => T): T =
    withLockWait(tablePath, timeoutMillis)(_ => body)

  private def withLockWait[T](tablePath: String, timeoutMillis: Long)
                             (body: String => T): T = {
    val id = timed("lock") { acquireLockWait(tablePath, timeoutMillis) }
    lockDepth.set(lockDepth.get + 1)
    try withHeartbeat(tablePath, id) {
      checkCommitFence(tablePath)
      body(id)
    }
    finally {
      lockDepth.set(lockDepth.get - 1)
      timed("lock") { releaseLock(tablePath, id) }
      drainCommits()
    }
  }

  // ---------------- read path ----------------

  private def withBucket(df: DataFrame, keys: Seq[String], numBuckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(hash(keys.map(col): _*), lit(numBuckets)))

  /** Top-level entries that hold committed legacy data: everything but
    * the engine's own files, the versioned `data/` area, write residue,
    * and writer junk Spark itself ignores. */
  private def listNonInternal(tablePath: String): Seq[Path] =
    graft.merge.FsList.list(Paths.get(tablePath)).filter { p =>
      val n = p.getFileName.toString
      n != "data" && n != ManifestName && n != LockName && n != LegacyMetaName &&
      n != HistoryDir && n != "_graft_staging" &&
      n != "_SUCCESS" && !n.startsWith(".") && !n.endsWith(".tmp") && !n.endsWith(".crc")
    }

  /** Does the table have committed content? An empty dir, or one
    * holding only the lock / interrupted-first-commit residue, is NOT a
    * table (the data under `data/` without a manifest was never
    * committed). */
  def tableExists(tablePath: String): Boolean =
    Files.exists(manifestPath(tablePath)) ||
    (Files.exists(Paths.get(tablePath)) && listNonInternal(tablePath).nonEmpty)

  /** Read a table in any layout: manifest (resolve live dirs), legacy
    * `__bucket=N` partitioned, or legacy flat — the layout column never
    * escapes. `mergeSchema` unions per-file schemas (footer reads, not
    * data) so buckets written before a schema evolution null-fill the
    * columns they predate.
    *
    * When the manifest is ABSENT, the `data/` dir (if any) is residue
    * of an interrupted FIRST commit — uncommitted rows that must not be
    * read (in the flat-migration case they would duplicate every
    * migrated row). Read-only classification just EXCLUDES it; the next
    * locked upsert sweeps it. */
  /** The manifest's deletion-vector keys as a frame (None = no dv). */
  private def dvFrame(spark: SparkSession, tablePath: String,
                      m: Manifest): Option[DataFrame] =
    if (m.dv.isEmpty) None
    else Some(readDir(spark, Paths.get(tablePath, m.dv).toString))

  /** Apply a manifest's deletion vector to a frame of its table rows:
    * tombstoned merge keys disappear. The dv is small by design (point
    * deletes accumulate there; bulk deletes rewrite buckets), so the
    * anti-join broadcasts — no shuffle on the table side. */
  private def applyDv(spark: SparkSession, tablePath: String, m: Manifest,
                      df: DataFrame): DataFrame =
    dvFrame(spark, tablePath, m) match {
      case Some(dv) if m.keys.nonEmpty =>
        df.join(broadcast(dv), m.keys, "left_anti")
      case _ => df
    }

  // ---- column mapping (rename without rewrite) -----------------------
  // Parquet files keep their PHYSICAL column names forever; the
  // manifest's colmap renames them to the LOGICAL view at read time.
  // Keys, stats and deletion vectors are tracked physical (they live
  // next to the files); user-facing frames, predicates and source
  // batches are logical and translate at the API boundary.

  /** physical frame → logical view: dropped columns vanish first
    * (their bytes stay in the files — a drop is manifest-only), then
    * renames apply. */
  private def logicalize(df: DataFrame, m: Manifest): DataFrame = {
    val undropped = m.dropped.foldLeft(df) { (d, p) =>
      if (d.columns.contains(p)) d.drop(p) else d }
    m.colmap.foldLeft(undropped) { case (d, (p, l)) =>
      if (d.columns.contains(p)) d.withColumnRenamed(p, l) else d }
  }

  /** logical frame (a source batch) → physical write names. */
  private def physicalize(df: DataFrame, m: Manifest): DataFrame =
    m.colmap.foldLeft(df) { case (d, (p, l)) =>
      if (d.columns.contains(l)) d.withColumnRenamed(l, p) else d }

  private def physicalOf(m: Manifest, logical: String): String =
    m.colmap.collectFirst {
      case (p, l) if l.equalsIgnoreCase(logical) => p }.getOrElse(logical)

  private def logicalOf(m: Manifest, physical: String): String =
    m.colmap.getOrElse(physical, physical)

  // ---------------- numeric type widening ----------------
  // Delta type-widening parity: a later batch may carry a WIDER
  // numeric type for an existing measure (byte→short→int→long,
  // float→double). The union coerces, so only the batch's touched
  // buckets rewrite wide — narrow files in untouched buckets stay on
  // disk, which plain parquet mergeSchema refuses to reconcile. The
  // manifest's `widened` map records the wide type and [[mergedRead]]
  // reads the mixed files under one explicit schema (Spark's parquet
  // reader upcasts int32→int64 / float→double natively).

  private val widenRank: Map[DataType, Int] = Map(
    ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4)

  /** The wider of two numeric types within a widening chain; None =
    * not reconcilable by widening (callers fall back to loud errors). */
  private def widerOf(a: DataType, b: DataType): Option[DataType] =
    if (a == b) Some(a)
    else (widenRank.get(a), widenRank.get(b)) match {
      case (Some(x), Some(y)) => Some(if (x >= y) a else b)
      case _ => (a, b) match {
        case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
        case _ => None
      }
    }

  /** Merge two file schemas, widening reconcilable numeric conflicts
    * (the mergeSchema we need once widened types exist). */
  private def mergeWiden(a: StructType, b: StructType): StructType = {
    val fields = scala.collection.mutable.LinkedHashMap[String, org.apache.spark.sql.types.StructField]()
    (a.fields ++ b.fields).foreach { f =>
      fields.get(f.name.toLowerCase) match {
        case None => fields(f.name.toLowerCase) = f
        case Some(e) if e.dataType == f.dataType => ()
        case Some(e) => widerOf(e.dataType, f.dataType) match {
          case Some(w) => fields(e.name.toLowerCase) =
            e.copy(dataType = w, nullable = e.nullable || f.nullable)
          case None => throw new IllegalStateException(
            s"irreconcilable file types for column '${f.name}': " +
            s"${e.dataType.catalogString} vs ${f.dataType.catalogString}")
        }
      }
    }
    StructType(fields.values.toSeq)
  }

  /** Per-version-dir schema cache. A committed version directory is
    * immutable — the protocol stages into `.tmp`, ATOMIC_MOVEs whole
    * dirs into place under fresh `b<b>_v<v>` / `dv_v<v>` names, and
    * only ever deletes dirs on sweep, never rewrites in place — so a
    * dir's file schema can be inferred once per JVM and reused by
    * every later read. This removes the footer-inference job that
    * every `mergeSchema` read launched: commit-heavy paths paid it on
    * EVERY readTable/readChanges (measured 37 of pipe16's 181 jobs,
    * 14 of stream_table_source's 103 — guide §6 metadata overhead; at
    * 100 TB a mergeSchema read re-reads every footer of every bucket).
    * The cache key carries the lexicographically-greatest part-file
    * name (task-UUID-unique per write), so a restore/sweep sequence
    * that ever re-minted the same dir name cannot serve a stale
    * schema. Values are KB-sized StructTypes.
    */
  private val dirSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** One file's Spark schema read DRIVER-SIDE from its parquet footer
    * — every engine-written file carries the exact Spark schema in the
    * footer's key-value metadata, the same source `spark.read`'s
    * inference deserializes; reading it here skips the distributed
    * footer-inference job that `.parquet(dir).schema` launches per
    * call. Returns None for non-Spark files (then the caller pays the
    * one inference read). */
  private def footerSparkSchema(spark: SparkSession,
                                file: java.nio.file.Path): Option[StructType] = try {
    val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(
      new HadoopPath(file.toUri), spark.sessionState.newHadoopConf()))
    try Option(rdr.getFooter.getFileMetaData.getKeyValueMetaData
        .get("org.apache.spark.sql.parquet.row.metadata"))
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType])
    finally rdr.close()
  } catch { case _: Exception => None }

  private def dirSchema(spark: SparkSession, dir: String): StructType = {
    val marker =
      try graft.merge.FsList.list(Paths.get(dir)).iterator
        .map(_.getFileName.toString).filter(_.endsWith(".parquet"))
        .foldLeft("")((a, b) => if (a >= b) a else b)
      catch { case _: Exception => "" }
    if (marker.isEmpty) spark.read.parquet(dir).schema
    else dirSchemaCache.computeIfAbsent(s"$dir#$marker",
      _ => footerSparkSchema(spark, Paths.get(dir, marker))
        .getOrElse(spark.read.parquet(dir).schema))
  }

  /** Single-version-dir read with the cached schema — no inference
    * job, no footer re-read. Files within one version dir share a
    * schema by construction (each dir is the output of one staged
    * write). */
  private def readDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(dirSchema(spark, dir)).parquet(dir)

  /** The standard multi-dir table read. All version dirs carrying the
    * SAME schema (the overwhelmingly common case) read under that
    * explicit schema — zero inference work. Widened tables merge the
    * cached per-dir schemas driver-side and overlay the manifest's
    * recorded wide types (recorded, so a pruned read of all-narrow
    * buckets still presents the wide type). Only genuinely
    * heterogeneous un-widened dirs (schema evolution) still pay the
    * parquet mergeSchema read, preserving its exact column-order
    * semantics. */
  private def mergedRead(spark: SparkSession, m: Manifest,
                         dirs: Seq[String]): DataFrame = {
    val schemas = dirs.map(d => dirSchema(spark, d))
    if (m.widened.isEmpty) {
      if (schemas.nonEmpty && schemas.forall(_ == schemas.head))
        spark.read.schema(schemas.head).parquet(dirs: _*)
      else
        spark.read.option("mergeSchema", "true").parquet(dirs: _*)
    } else {
      val fileSchema = schemas.reduce(mergeWiden)
      val schema = StructType(fileSchema.fields.map { f =>
        m.widened.collectFirst { case (c, t) if c.equalsIgnoreCase(f.name) =>
          f.copy(dataType = org.apache.spark.sql.types.DataType.fromDDL(t))
        }.getOrElse(f)
      })
      spark.read.schema(schema).parquet(dirs: _*)
    }
  }

  /** New widened-type entries a source batch introduces against the
    * touched file schema. MERGE KEYS CANNOT WIDEN: the bucket hash is
    * type-sensitive (hash(5: Int) ≠ hash(5: Long)), so a widened key
    * would silently re-route every row — rejected loudly; cast the
    * source key to the table's key type instead. */
  private def widenedBy(target: StructType, source: StructType,
                        keys: Seq[String]): Map[String, String] =
    target.fields.flatMap { f =>
      source.fields.find(_.name.equalsIgnoreCase(f.name)).flatMap { s =>
        if (s.dataType == f.dataType) None
        else widerOf(s.dataType, f.dataType) match {
          case Some(w) if w != f.dataType =>
            if (keys.exists(_.equalsIgnoreCase(f.name)))
              throw new IllegalArgumentException(
                s"cannot widen merge key '${f.name}' " +
                s"(${f.dataType.catalogString} → ${s.dataType.catalogString}): " +
                "the bucket hash is type-sensitive — cast the source key to " +
                "the table's type, or rebucket to migrate")
            Some(f.name -> w.catalogString)
          case _ => None // equal, source narrower (union casts up), or
                         // irreconcilable (the union's loud error)
        }
      }
    }.toMap

  /** Align a physicalized source batch to the target FILE schema for a
    * positional-safe unionByName: a DROPPED column still lives in the
    * old files but is absent from the narrowed logical source — it
    * null-fills with the file's type (new rows carry no value for it;
    * readers filter it anyway). Any other missing column stays a loud
    * unresolved-column error, exactly as before. */
  private def alignForUnion(src: DataFrame, target: DataFrame,
                            dropped: Set[String]): DataFrame = {
    val have = src.columns.toSet
    src.select(target.columns.toIndexedSeq.map { c =>
      if (have.contains(c)) col(c)
      else if (dropped.contains(c)) lit(null).cast(target.schema(c).dataType).as(c)
      else col(c)
    }: _*)
  }

  /** Observability: Some(values) when the last [[statsAggregate]] call
    * answered from the manifest alone (spec-facing, like [[lastPrune]]). */
  @volatile private[graft] var lastStatsAgg: Option[Seq[Any]] = None

  /** Approximate LIVE row count from the manifest's per-bucket footer
    * counts ([[RowsKey]]) — driver-side COST-ESTIMATION fuel (MV
    * candidate ranking), zero data files touched. Unlike
    * [[statsAggregate]]'s exact-count contract this tolerates a
    * deletion vector (the estimate is an upper bound then — fine for
    * ranking); None only when some bucket predates the footer counts. */
  private[graft] def tableRowsEstimate(tablePath: String): Option[Long] =
    readManifest(tablePath).flatMap { m =>
      val per = m.dirs.keys.toSeq
        .map(b => m.stats.getOrElse(b, Map.empty).get(RowsKey).map(_.min.toLong))
      if (per.exists(_.isEmpty)) None else Some(per.flatten.sum)
    }

  /** METADATA-ONLY aggregates: answer `COUNT(*)` / `MIN(col)` /
    * `MAX(col)` from the manifest's per-bucket stats without touching
    * ONE data file — the DSv2 aggregate-pushdown fuel (the JDBC
    * source's `SupportsPushDownAggregates` posture, re-expressed over
    * the manifest). At 100 TB a bare `SELECT count(*) FROM fact` is a
    * driver-side manifest read instead of a 100 TB scan.
    *
    * `specs` entries: `("count","")`, `("min",col)`, `("max",col)`.
    * Returns None — caller falls back to a real scan — unless EVERY
    * spec is provably answerable:
    *  - a deletion vector makes counts and extremes stale → bail;
    *  - count needs the [[RowsKey]] footer count on every live bucket
    *    (absent on pre-r10 buckets → bail);
    *  - min/max need a stats bound on every NON-EMPTY bucket, and only
    *    numeric/date/timestamp/decimal columns qualify — parquet
    *    footer STRING stats may be truncated bounds (prefix min /
    *    incremented max), real values only for the other domains;
    *  - an all-null column in a non-empty bucket records no bound and
    *    is indistinguishable from missing stats → bail (conservative).
    * Results decode to the table's LOGICAL schema types (column
    * mapping translated, widened types honored). */
  private[graft] def statsAggregate(spark: SparkSession, tablePath: String,
      specs: Seq[(String, String)]): Option[Seq[Any]] = {
    lastStatsAgg = None
    val out = try {
      readManifest(tablePath).flatMap { m =>
        if (m.dv.nonEmpty || specs.isEmpty) None
        else {
          lazy val schema = readTable(spark, tablePath).schema
          def bucketStatsOf(b: Int): Map[String, ColStats] =
            m.stats.getOrElse(b, Map.empty)
          def rowsOf(b: Int): Option[Long] =
            bucketStatsOf(b).get(RowsKey).map(_.min.toLong)
          def minMaxSafe(dt: DataType): Boolean = dt match {
            case ByteType | ShortType | IntegerType | LongType | DateType |
                 TimestampType | TimestampNTZType | FloatType | DoubleType |
                 _: DecimalType => true
            case _ => false
          }
          def decode(dt: DataType, typ: Char, v: String): Option[Any] = (dt, typ) match {
            case (ByteType, 'l') => Some(v.toLong.toByte)
            case (ShortType, 'l') => Some(v.toLong.toShort)
            case (IntegerType, 'l') => Some(v.toLong.toInt)
            case (LongType, 'l') => Some(v.toLong)
            case (DateType, 'l') =>
              Some(java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.toLong)))
            case (TimestampType, 'l') =>
              val us = v.toLong
              val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
              t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
              Some(t)
            case (TimestampNTZType, 'l') =>
              val us = v.toLong
              Some(java.time.LocalDateTime.ofEpochSecond(
                Math.floorDiv(us, 1000000L),
                (Math.floorMod(us, 1000000L) * 1000L).toInt,
                java.time.ZoneOffset.UTC))
            case (FloatType, 'd') => Some(v.toFloat)
            case (DoubleType, 'd') => Some(v.toDouble)
            case (_: DecimalType, 'd') => Some(new java.math.BigDecimal(v))
            case _ => None
          }
          val buckets = m.dirs.keys.toSeq.sorted
          val vals: Seq[Option[Any]] = specs.map {
            case ("count", _) =>
              val per = buckets.map(rowsOf)
              if (per.exists(_.isEmpty)) None
              else Some(per.flatten.sum.asInstanceOf[Any])
            case (op, logical) if op == "min" || op == "max" =>
              val phys = physicalOf(m, logical)
              schema.fields.find(_.name.equalsIgnoreCase(logical)).flatMap { fld =>
                if (!minMaxSafe(fld.dataType)) None
                else {
                  val per: Seq[Option[Option[ColStats]]] = buckets.map { b =>
                    val st = bucketStatsOf(b)
                    st.find(_._1.equalsIgnoreCase(phys)).map(_._2) match {
                      case Some(c) => Some(Some(c))
                      case None if rowsOf(b).contains(0L) => Some(None) // empty bucket
                      case None => None                                 // unbounded → bail
                    }
                  }
                  if (per.exists(_.isEmpty)) None
                  else {
                    val bounds = per.flatten.flatten
                    if (bounds.isEmpty) Some(null) // empty table: SQL MIN/MAX = NULL
                    else {
                      val typ = bounds.head.typ
                      val wire =
                        if (op == "min") bounds.map(_.min).reduce((a, b) => if (wireLt(typ, a, b)) a else b)
                        else bounds.map(_.max).reduce((a, b) => if (wireLt(typ, a, b)) b else a)
                      decode(fld.dataType, typ, wire)
                    }
                  }
                }
              }
            case _ => None
          }
          if (vals.exists(_.isEmpty)) None else Some(vals.map(_.get))
        }
      }
    } catch { case _: Exception => None }
    lastStatsAgg = out
    out
  }

  def readTable(spark: SparkSession, tablePath: String): DataFrame = {
    val df = readManifest(tablePath) match {
      case Some(m) =>
        val dirs = m.dirs.toSeq.sortBy(_._1)
          .map { case (_, d) => Paths.get(tablePath, d).toString }
        logicalize(applyDv(spark, tablePath, m,
          mergedRead(spark, m, dirs)), m)
      case None if !Files.exists(Paths.get(tablePath)) =>
        spark.read.parquet(tablePath) // standard path-not-found error
      case None =>
        val entries = listNonInternal(tablePath)
        if (entries.isEmpty)
          throw new IllegalStateException(
            s"table $tablePath has no committed data (interrupted first commit?)")
        spark.read.option("mergeSchema", "true").parquet(entries.map(_.toString): _*)
    }
    if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df
  }

  /** SNAPSHOT (time-travel) read: the table as of `commitsBack` commits
    * before the live one, resolved through the retained history
    * manifest against the retained bucket versions. Readable while the
    * snapshot is inside the retention window — each commit rewrites a
    * bucket at most once, so `commitsBack <= retainVersions` is always
    * safe; beyond it the snapshot's manifest has been swept and this
    * throws loudly (never a silent partial read: the manifest goes
    * before its files do). `commitsBack = 0` is the live table. */
  /** Total bytes of the LIVE buckets' data files — a driver-side
    * metadata walk (O(files), no Spark job), the size half of the
    * DSv2 scan's `SupportsReportStatistics` answer. Feeding Spark's
    * CBO the real table size is what makes a small graft dim
    * AUTO-broadcast under the join threshold at any scale — without
    * it DSv2 relations default to an effectively-infinite estimate
    * and every join plans as a shuffle. */
  private[graft] def tableDataBytes(tablePath: String): Option[Long] =
    readManifest(tablePath).map { m =>
      m.dirs.values.map { d =>
        val p = Paths.get(tablePath, d)
        if (!Files.exists(p)) 0L
        else graft.merge.FsList.list(p).iterator
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(Files.size(_)).sum
      }.sum
    }

  def readTableAt(spark: SparkSession, tablePath: String, commitsBack: Int): DataFrame = {
    require(commitsBack >= 0, s"commitsBack must be >= 0, got $commitsBack")
    if (commitsBack == 0) readTable(spark, tablePath)
    else {
      val live = readManifest(tablePath).getOrElse(throw new IllegalStateException(
        s"table $tablePath has no manifest (snapshot reads need the bucketed layout)"))
      val target = live.commit - commitsBack
      val p = Paths.get(tablePath, HistoryDir, target.toString)
      if (target < 1 || !Files.exists(p))
        throw new IllegalStateException(
          s"no snapshot $commitsBack commits back of $tablePath (live commit " +
          s"${live.commit}); it predates the table or was vacuumed — raise " +
          "retainVersions to keep deeper history")
      readSnapshot(spark, tablePath, parseManifest(p))
    }
  }

  /** Materialize a retained manifest's snapshot (the snapshot's OWN
    * colmap applies: schema history time-travels with it). */
  private def readSnapshot(spark: SparkSession, tablePath: String,
                           m: Manifest): DataFrame = {
    val dirs = m.dirs.toSeq.sortBy(_._1)
      .map { case (_, d) => Paths.get(tablePath, d).toString }
    val df = logicalize(applyDv(spark, tablePath, m,
      mergedRead(spark, m, dirs)), m)
    if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df
  }

  /** `TIMESTAMP AS OF` read: the table as it stood AT wall time
    * `tsMillis` — the youngest retained commit whose stamp is ≤ the
    * target (commit number breaks clock-skew ties; commit timestamps
    * come from the writer's clock at manifest-swap time, the Delta
    * convention). How operators actually reference snapshots — "the
    * table as of last night's run" — where [[readTableAt]]'s
    * commit-count coordinate needs the reader to know how many commits
    * happened since. Loud when `tsMillis` predates the oldest retained
    * commit (vacuumed or before table creation) — never a silent
    * nearest-fit. Metadata cost: one O(retained-commits) driver listing
    * of the history manifests; data cost identical to any snapshot
    * read. Pre-timestamp manifests (ts=0) only resolve through their
    * own epoch — practically: re-committed tables adopt stamps on
    * their next write. */
  def readTableAtTime(spark: SparkSession, tablePath: String,
                      tsMillis: Long): DataFrame = {
    val live = readManifest(tablePath).getOrElse(throw new IllegalStateException(
      s"table $tablePath has no manifest (snapshot reads need the bucketed layout)"))
    if (tsMillis >= live.ts) readTable(spark, tablePath)
    else {
      val hist = Paths.get(tablePath, HistoryDir)
      val retained =
        if (!Files.exists(hist)) Nil
        else graft.merge.FsList.list(hist)
          .flatMap(p => p.getFileName.toString.toIntOption
            .filter(_ < live.commit).map(_ => parseManifest(p)))
      val candidate = retained.filter(_.ts <= tsMillis)
        .sortBy(m => (m.ts, m.commit)).lastOption
      candidate match {
        case Some(m) => readSnapshot(spark, tablePath, m)
        case None => throw new IllegalStateException(
          s"no retained snapshot of $tablePath at or before " +
          s"${java.time.Instant.ofEpochMilli(tsMillis)} (oldest retained: " +
          retained.sortBy(_.commit).headOption
            .map(m => s"commit ${m.commit} @ ${java.time.Instant.ofEpochMilli(m.ts)}")
            .getOrElse("none") +
          ") — it predates the table or was vacuumed; raise retention")
      }
    }
  }

  /** CHANGE DATA FEED between two retained snapshots: every row whose
    * content changed from `fromCommitsBack` to `toCommitsBack` (0 =
    * live), tagged `insert` / `update` / `update_preimage` / `delete`
    * in a `_change_type` column — the Delta CDF convention (`update`
    * carries the new image, Delta's `update_postimage`;
    * `update_preimage` the old image of the same key, which
    * reversal-based consumers — e.g. incremental aggregates that
    * subtract the old row and add the new — need; `delete` the old
    * image of a vanished key). The downstream primitive for
    * incremental consumers: instead of re-scanning a 100 TB table to
    * find what an upsert did, read the delta.
    *
    * Scale: the two history manifests name each side's bucket dirs, so
    * only buckets whose live dir CHANGED between the snapshots are
    * read at all — cost is O(changed buckets), not O(table); within
    * them the diff is one full-row EXCEPT (null-safe set semantics) +
    * a key-level anti/semi join, all shuffled on the merge keys.
    *
    * Schema note: the diff is computed over the OLDER snapshot's
    * columns (the newer side is projected onto them), so an update
    * whose only change is in a column added between the snapshots is
    * not surfaced — evolve-then-diff consumers should diff from the
    * first post-evolution commit.
    *
    * @param keys the table's merge keys (classify changed rows:
    *             key present on both sides = update)
    * @param bucketFilter restrict the feed to these changed buckets
    *        (ChangeStream's rate-limit paging); None = all changed */
  /** The (older, newer, changed-bucket) window behind a change feed:
    * resolves both retained snapshots and computes the buckets whose
    * content can differ — dir moves plus deletion-vector hash
    * spillover. Public face [[changedBucketIds]] lets a consumer SIZE
    * a commit's feed (metadata-only, no data read) before deciding how
    * to page it. */
  private def changeWindow(spark: SparkSession, tablePath: String,
                           fromCommitsBack: Int,
                           toCommitsBack: Int): (Manifest, Manifest, Seq[Int]) = {
    require(fromCommitsBack > toCommitsBack,
      s"from ($fromCommitsBack commits back) must be older than to ($toCommitsBack)")
    val live = readManifest(tablePath).getOrElse(throw new IllegalStateException(
      s"table $tablePath has no manifest (change feeds need the bucketed layout)"))
    def manifestAt(back: Int): Manifest =
      if (back == 0) live
      else {
        val target = live.commit - back
        val p = Paths.get(tablePath, HistoryDir, target.toString)
        if (target < 1 || !Files.exists(p))
          throw new IllegalStateException(
            s"no snapshot $back commits back of $tablePath (live commit " +
            s"${live.commit}); it predates the table or was vacuumed")
        parseManifest(p)
      }
    windowOf(spark, tablePath, manifestAt(fromCommitsBack),
      manifestAt(toCommitsBack))
  }

  /** Resolve an ABSOLUTE commit number to its manifest — live or
    * retained history — the TOCTOU-free coordinate a checkpointed
    * streaming offset needs: the `commitsBack` forms re-resolve
    * distance against live AT CALL TIME, so a commit landing between
    * offset computation and batch read shifts the window. History
    * file N is durably written BEFORE the live swap to N+1
    * ([[commitManifest]]), so: history hit → done; miss → live IS N,
    * or N was superseded in between (re-check), or N is gone. */
  private def manifestAtCommit(tablePath: String, commit: Int): Manifest = {
    val p = Paths.get(tablePath, HistoryDir, commit.toString)
    if (Files.exists(p)) parseManifest(p)
    else {
      val live = readManifest(tablePath).getOrElse(
        throw new IllegalStateException(s"table $tablePath has no manifest"))
      if (live.commit == commit) live
      else if (Files.exists(p)) parseManifest(p)
      else throw new IllegalStateException(
        s"commit $commit of $tablePath is not retained (live " +
        s"${live.commit}) — it was vacuumed or never existed; raise " +
        "retainVersions to keep deeper history")
    }
  }

  /** The table AT absolute commit `commit` — [[readTableAt]] in the
    * commit-number coordinate (see [[manifestAtCommit]]). */
  def readTableAtCommit(spark: SparkSession, tablePath: String,
                        commit: Int): DataFrame =
    readSnapshot(spark, tablePath, manifestAtCommit(tablePath, commit))

  private def windowOf(spark: SparkSession, tablePath: String,
                       from: Manifest, to: Manifest): (Manifest, Manifest, Seq[Int]) = {
    // bucket pruning: a bucket whose live dir is identical in both
    // manifests holds identical bytes — skip it entirely. A DELETION
    // VECTOR change moves rows without moving any dir, so when the dv
    // differs, the buckets its (symmetric-difference) keys hash into
    // join the changed set — dv-sized work, still O(delta).
    val dirChanged = (from.dirs.keySet ++ to.dirs.keySet)
      .filter(b => from.dirs.get(b) != to.dirs.get(b))
    val dvChanged: Set[Int] =
      if (from.dv == to.dv) Set.empty
      else {
        val sides = Seq(from, to).flatMap(dvFrame(spark, tablePath, _))
        if (sides.isEmpty || from.keys.isEmpty) Set.empty
        else {
          val nb = to.numBuckets
          sides.map(df => withBucket(df, from.keys, nb)
              .select(col(BucketCol)).distinct())
            .reduce(_.unionByName(_)).distinct()
            .collect().map(_.getInt(0)).toSet
        }
      }
    (from, to, (dirChanged ++ dvChanged).toSeq.sorted)
  }

  /** Buckets whose content changed between two retained snapshots —
    * the metadata-only sizing probe for feed consumers. */
  def changedBucketIds(spark: SparkSession, tablePath: String,
                       fromCommitsBack: Int, toCommitsBack: Int = 0): Seq[Int] =
    changeWindow(spark, tablePath, fromCommitsBack, toCommitsBack)._3

  /** Live bucket count / live bucket ids — public metadata accessors
    * (feed paging, ops). */
  def tableNumBuckets(tablePath: String): Option[Int] =
    readManifest(tablePath).map(_.numBuckets)
  def liveBucketIds(tablePath: String): Seq[Int] =
    readManifest(tablePath).map(_.dirs.keys.toSeq.sorted).getOrElse(Nil)

  def readChanges(spark: SparkSession, tablePath: String, keys: Seq[String],
                  fromCommitsBack: Int, toCommitsBack: Int = 0,
                  bucketFilter: Option[Set[Int]] = None): DataFrame =
    readChangesWindow(spark, tablePath, keys,
      changeWindow(spark, tablePath, fromCommitsBack, toCommitsBack),
      bucketFilter)

  /** [[readChanges]] in the ABSOLUTE commit coordinate: the feed of
    * `(fromCommit, toCommit]` resolved by commit NUMBER, immune to
    * concurrent commits landing mid-call (see [[manifestAtCommit]]) —
    * what a streaming source replaying checkpointed offsets must use
    * for its exactly-once contract. */
  def readChangesAtCommits(spark: SparkSession, tablePath: String,
                           keys: Seq[String], fromCommit: Int,
                           toCommit: Int): DataFrame = {
    require(fromCommit < toCommit,
      s"from (commit $fromCommit) must be older than to (commit $toCommit)")
    readChangesWindow(spark, tablePath, keys,
      windowOf(spark, tablePath, manifestAtCommit(tablePath, fromCommit),
        manifestAtCommit(tablePath, toCommit)), None)
  }

  private def readChangesWindow(spark: SparkSession, tablePath: String,
                                keys: Seq[String],
                                window: (Manifest, Manifest, Seq[Int]),
                                bucketFilter: Option[Set[Int]]): DataFrame = {
    val (from, to, changed0) = window
    // an explicit filter (ChangeStream's maxBucketsPerTrigger paging)
    // narrows the feed to a subset of the changed buckets — keys hash
    // to exactly one bucket, so paging by bucket partitions the
    // commit's key space with no overlap between pages
    val changedBuckets = bucketFilter match {
      case Some(f) => changed0.filter(f)
      case None => changed0
    }
    def readSide(m: Manifest): DataFrame = {
      val dirs = changedBuckets.flatMap(m.dirs.get)
        .map(d => Paths.get(tablePath, d).toString)
      val df =
        if (dirs.isEmpty) {
          val any = m.dirs.values.headOption.getOrElse(
            throw new IllegalStateException(s"empty manifest for $tablePath"))
          // no changed buckets: empty frame with the table schema
          readDir(spark, Paths.get(tablePath, any).toString).limit(0)
        } else applyDv(spark, tablePath, m,
          mergedRead(spark, m, dirs))
      if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df
    }
    // the diff runs over PHYSICAL columns (stable across renames — a
    // pure-rename commit moves no dirs and surfaces no rows); the
    // OUTPUT logicalizes with the NEWER side's map. A diff spanning a
    // materializing rewrite (rebucket) falls under the same
    // evolve-then-diff caveat as added columns.
    //
    // ONE-PASS diff (guide §2.4): a committed table holds exactly one
    // row per merge key per side, so the change feed is a single
    // pk-keyed FULL OUTER join —
    //   key only new            → insert   (new image)
    //   key only old            → delete   (old image)
    //   both, images differ     → update   (new image)
    //                             + update_preimage (old image)
    //   both, images equal      → no row
    // This replaces the former except + anti-join + two semi-joins +
    // tag join (≈10 exchanges, each side scanned 4-5×) with ONE join
    // (2 exchanges, each side scanned once) — the hot machinery under
    // EVERY ChangeStream consumer, incremental-MV applyChanges and
    // CDC read. Image equality is the same null-safe, NaN-equal
    // comparison except() used; numeric types are aligned by the same
    // widening coercion except() applied.
    val pk = keys.map(physicalOf(to, _))
    val older0 = readSide(from)
    val newer0 = readSide(to).select(older0.columns.toIndexedSeq.map(col): _*)
    val wide = older0.schema.fields.zip(newer0.schema.fields).map {
      case (o, n) => widerOf(o.dataType, n.dataType).getOrElse(o.dataType) }
    def aligned(df: DataFrame): DataFrame =
      df.select(df.columns.zip(wide).map { case (c, t) =>
        col(c).cast(t).as(c) }.toIndexedSeq: _*)
    val older = aligned(older0)
    val newer = aligned(newer0)
    val cols = older.columns.toIndexedSeq
    val oldS = older.select(pk.map(col) ++
      Seq(struct(cols.map(col): _*).as("__old")): _*)
    val newS = newer.select(pk.map(col) ++
      Seq(struct(cols.map(col): _*).as("__new")): _*)
    val legs = when(col("__old").isNull && col("__new").isNotNull,
        array(struct(col("__new").as("r"), lit("insert").as("t"))))
      .when(col("__new").isNull && col("__old").isNotNull,
        array(struct(col("__old").as("r"), lit("delete").as("t"))))
      .when(col("__old").isNotNull && col("__new").isNotNull &&
          !(col("__old") <=> col("__new")),
        array(struct(col("__new").as("r"), lit("update").as("t")),
          struct(col("__old").as("r"), lit("update_preimage").as("t"))))
    // unchanged keys fall through to NULL; explode emits nothing
    val out = oldS.join(newS, pk, "full_outer")
      .select(explode(legs).as("__c"))
      .select(cols.map(c => col("__c").getField("r").getField(c).as(c)) :+
        col("__c").getField("t").as("_change_type"): _*)
    logicalize(out, to)
  }

  /** Move each `__bucket=N` dir under `writtenTo` into the table as
    * version-`ver` bucket dirs; returns the manifest entries. */
  /** A DELETE that empties EVERY live bucket must not leave the table
    * dir-less: [[stageWrite]]'s dynamic `partitionBy` writes zero
    * files for an empty frame, and a manifest with no dirs breaks
    * every reader on parquet schema inference. Keep ONE
    * schema-bearing empty bucket file instead — a plain
    * (non-partitioned) single-task write, whose partition 0 always
    * emits a footer-only parquet file even with zero rows. Returns
    * the (bucket, relDir) manifest entry. */
  private def stageEmptyBucket(tablePath: String, physical: DataFrame,
                               bucket: Int, version: Int): (Int, String) = {
    val rel = s"data/b${bucket}_v$version"
    physical.drop(BucketCol).limit(0).coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(Paths.get(tablePath, rel).toString)
    bucket -> rel
  }

  private def adoptBucketDirs(tablePath: String, writtenTo: String,
                              versions: Int => Int): Map[Int, String] = {
    Files.createDirectories(Paths.get(tablePath, "data"))
    graft.merge.FsList.list(Paths.get(writtenTo))
      .filter(_.getFileName.toString.startsWith(s"$BucketCol="))
      .map { d =>
        val b = d.getFileName.toString.stripPrefix(s"$BucketCol=").toInt
        val rel = s"data/b${b}_v${versions(b)}"
        Files.move(d, Paths.get(tablePath, rel), StandardCopyOption.ATOMIC_MOVE)
        b -> rel
      }.toMap
  }

  /** Merge + durable commit, rewriting ONLY the buckets the source
    * batch touches — the replacement for Delta MERGE's matched-file
    * rewrite. A full-table rewrite per merge is the classic 100 TB
    * killer: a 1k-row batch into a 100 TB fact would rewrite 100 TB.
    * Commit protocol: see the object Scaladoc (manifest swap, writer
    * lock, version retention).
    *
    * @param evolveSchema Delta `mergeSchema` parity: columns the source
    *        adds join the table schema (UNTOUCHED buckets keep their
    *        old files — `readTable` null-fills via parquet schema
    *        merge, so evolution rewrites nothing it wasn't already
    *        rewriting); columns the source omits are null-filled on its
    *        rows. Off by default: a dropped/added column is usually a
    *        bug, and the strict path fails loudly.
    * @param retainVersions historical bucket versions kept for lagging
    *        readers (see the object Scaladoc).
    * @param statsColumns extra columns (beyond the merge keys, always
    *        tracked) to record per-bucket min/max for in the manifest —
    *        the data-skipping dial ([[readTableWhere]] and the
    *        [[delete]] probe prune on them). Declare the columns
    *        selective reads filter on (e.g. the fact's date column).
    *        A `bloom:`-prefixed entry (`bloom:content_hash`) records a
    *        per-bucket BLOOM FILTER instead — the point-lookup dial
    *        for high-cardinality columns whose value ranges overlap
    *        every bucket (see [[BloomTag]]). Only the buckets THIS
    *        commit rewrites gain the new column's stats (absent stats
    *        = can-match, so mixed manifests stay correct); a
    *        [[rebucket]] or full rewrite backfills.
    * @param batchId PIPELINE BATCH STAMP ("" = unstamped): recorded in
    *        the manifest as the driving watermark/batch id of this
    *        commit. A multi-table pipeline run stamps every table
    *        commit with the same id; a crash between two tables leaves
    *        them stamped differently, which
    *        `Pipeline.verifyConsistent` detects and names for the
    *        (idempotent) rerun. An EMPTY batch (no touched buckets)
    *        still advances the stamp with a manifest-only commit, so
    *        "this table saw batch X" holds even when X contributed no
    *        rows. Maintenance commits (delete/compact/rebucket)
    *        preserve the current stamp.
    */
  def upsert(spark: SparkSession, tablePath: String, source: DataFrame, keys: Seq[String],
             numBuckets: Int = 0, evolveSchema: Boolean = false,
             retainVersions: Int = DefaultRetainVersions,
             statsColumns: Seq[String] = Nil,
             batchId: String = ""): Unit = {
    val dir = Paths.get(tablePath)
    Files.createDirectories(dir)
    withLock(tablePath) { leaseId =>
      if (readManifest(tablePath).isEmpty) {
        // data/ (or a stale staging sibling) without a manifest is an
        // interrupted FIRST commit: sweep it BEFORE layout
        // classification, or the flat-table branch would read the
        // uncommitted files — alongside the old flat files in the
        // migration case, duplicating every row.
        deleteRecursively(dir.resolve("data"))
        deleteRecursively(Paths.get(tablePath + ".tmp"))
      }
      readManifest(tablePath) match {
        case Some(m) => upsertCommitted(spark, tablePath, source, keys,
          numBuckets, evolveSchema, retainVersions, statsColumns, m, leaseId, batchId)
        case None =>
          val entries = listNonInternal(tablePath)
          if (entries.exists(_.getFileName.toString.startsWith(s"$BucketCol="))) {
            // Legacy partitioned layout: migration is ONE atomic file
            // write — a manifest whose entries point at the existing
            // __bucket=N dirs (hashed on the caller's keys, which the
            // manifest now records; no stats until buckets rewrite).
            val legacyMeta = Paths.get(tablePath, LegacyMetaName)
            val nb =
              if (Files.exists(legacyMeta))
                new String(Files.readAllBytes(legacyMeta)).trim.toInt
              else DefaultNumBuckets
            val bucketEntries = entries
              .filter(_.getFileName.toString.startsWith(s"$BucketCol="))
              .map { d =>
                val name = d.getFileName.toString
                name.stripPrefix(s"$BucketCol=").toInt -> name
              }.toMap
            val m = commitManifest(tablePath, Manifest(nb, bucketEntries, keys = keys))
            upsertCommitted(spark, tablePath, source, keys,
              numBuckets, evolveSchema, retainVersions, statsColumns, m, leaseId, batchId)
          } else if (entries.nonEmpty) {
            // Legacy flat (pre-bucketing) layout: full merge-and-rewrite
            // into the bucketed layout. Readers see the flat table until
            // the manifest lands, the new one after; the stale flat
            // files are RETAINED for readers mid-scan (vacuum reclaims).
            val nb = if (numBuckets > 0) numBuckets else DefaultNumBuckets
            val merged = merge(readTable(spark, tablePath), source, keys)
            val tmp = tablePath + ".tmp"
            stageWrite(withBucket(merged, keys, nb), tmp)
            val stats = timed("stats") { bucketStats(spark, tmp, keys ++ statsColumns) }
            val newEntries = adoptBucketDirs(tablePath, tmp, _ => 0)
            failpoint("before-manifest")
            refreshLease(tablePath, leaseId)
            commitManifest(tablePath,
              Manifest(nb, newEntries, stats = stats, keys = keys, batch = batchId))
            deleteRecursively(Paths.get(tmp))
          } else {
            // Initial create: empty dir (bar the lock).
            val nb = if (numBuckets > 0) numBuckets else DefaultNumBuckets
            val tmp = tablePath + ".tmp"
            timed("create-write") {
              stageWrite(withBucket(source, keys, nb), tmp,
                compact = tinyLocalSource(source)) }
            val stats = timed("stats") { bucketStats(spark, tmp, keys ++ statsColumns) }
            val newEntries = timed("adopt") { adoptBucketDirs(tablePath, tmp, _ => 0) }
            if (newEntries.isEmpty) {
              // empty initial source: CREATE the table anyway — one
              // schema-bearing empty bucket (the emptied-by-DELETE
              // posture) so `CREATE ... AS SELECT ... WHERE 1=0` and
              // the create-then-COPY-INTO flow read/merge immediately
              deleteRecursively(Paths.get(tmp))
              val entry = stageEmptyBucket(tablePath,
                withBucket(source, keys, nb), 0, 0)
              failpoint("before-manifest")
              refreshLease(tablePath, leaseId)
              commitManifest(tablePath,
                Manifest(nb, Map(entry), keys = keys, batch = batchId))
            } else {
              failpoint("before-manifest")
              refreshLease(tablePath, leaseId)
              commitManifest(tablePath,
                Manifest(nb, newEntries, stats = stats, keys = keys, batch = batchId))
              deleteRecursively(Paths.get(tmp))
            }
          }
      }
    }
  }

  /** OPTIMISTIC upsert — Delta's optimistic concurrency control for
    * the established-table merge: the expensive work (probe, merge
    * read, staged bucket write, stats) runs entirely OUTSIDE the
    * writer lock against a snapshot manifest; the lock is taken only
    * for the short commit (adopt + manifest swap), WAITING on a
    * concurrent holder instead of failing. If other writers committed
    * in between, the commit REBASES onto the new manifest when every
    * intervening commit's recorded bucket footprint (`touched=` line,
    * diffed by commitManifest itself) is disjoint from this writer's
    * touched set and no table-wide metadata changed — the staged
    * buckets are then still exactly right, because disjointness means
    * the bucket dirs this merge read are byte-identical in the new
    * manifest. Overlap (or an unrecorded/metadata-changing intervening
    * commit, or history swept past the gap) throws
    * `ConcurrentModificationException` and discards the staging —
    * never a silent lost update.
    *
    * This is what lets maintenance (compact/recluster/vacuum of cold
    * buckets) run beside ingest at 100 TB without babysitting
    * schedules: logically-disjoint transactions serialize; only true
    * write-write conflicts surface. The pessimistic [[upsert]] stays
    * the default — its merge work happens under the lock, so it needs
    * no conflict reasoning at all.
    *
    * Scope: established manifest tables, strict schema (no
    * `evolveSchema` — schema changes are table-wide by nature and
    * belong on the pessimistic path). Reader isolation across a
    * concurrent winner's sweep is the standard retention contract:
    * with the default `retainVersions ≥ 1` the dirs this writer reads
    * survive one concurrent commit; an overlapping rewrite would
    * conflict at the lock anyway.
    *
    * Crash residue: an abandoned staging dir (`<table>.tmp-<id>`) is
    * unreferenced garbage, reclaimed by [[vacuum]] once older than the
    * lock lease. */
  def upsertConcurrent(spark: SparkSession, tablePath: String, source0: DataFrame,
                       keys0: Seq[String],
                       retainVersions: Int = DefaultRetainVersions,
                       statsColumns: Seq[String] = Nil,
                       batchId: String = "",
                       lockWaitMillis: Long = 60000L): Unit = {
    val m0 = readManifest(tablePath).getOrElse(throw new IllegalStateException(
      s"upsertConcurrent: $tablePath has no manifest — create/migrate the " +
      "table with upsert first (initial commits are table-wide by nature)"))
    enforceConstraints(spark, tablePath, m0, source0, "upsertConcurrent")
    // same reserved-name guards as the pessimistic path
    source0.columns.foreach { c =>
      m0.colmap.foreach { case (p, l) =>
        if (c.equalsIgnoreCase(p) && !c.equalsIgnoreCase(l))
          throw new IllegalArgumentException(
            s"upsert: source column '$c' collides with the physical name " +
            s"of renamed column '$l' — physical names are reserved until a " +
            "rebucket materializes the mapping")
      }
      if (m0.dropped.exists(_.equalsIgnoreCase(c)))
        throw new IllegalArgumentException(
          s"upsert: source column '$c' matches a DROPPED column's physical " +
          "name — dropped names are reserved until a rebucket materializes " +
          "the drop")
    }
    val keys = keys0.map(physicalOf(m0, _))
    val source = physicalize(source0, m0)
    val statsColumnsP = statsColumns.map(c =>
      if (isBloomCol(c)) BloomTag + physicalOf(m0, bloomInner(c))
      else physicalOf(m0, c))
    val nb = m0.numBuckets
    requireSameKeys(tablePath, m0, keys)
    // tiny driver-local source: single-partition commit (see upsert)
    val tiny = tinyLocalSource(source)
    val bucketed = withBucket(
        if (tiny) source.coalesce(1) else source, keys, nb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val probe = timed("probe") { bucketed
        .groupBy(col(BucketCol) +: keys.map(col): _*).agg(count(lit(1)).as("__c"))
        .groupBy(col(BucketCol)).agg(max(col("__c")).as("__maxc"))
        .collect() }
      if (probe.exists(_.getLong(1) > 1))
        throw new IllegalArgumentException(
          s"SCD1 merge aborted: duplicate source rows for merge key ${keys.mkString(",")}")
      val touchedB = probe.map(_.getInt(0)).toSet
      if (touchedB.isEmpty) {
        // empty batch: the stamp still advances, via a short locked
        // metadata commit (trivially conflict-free)
        if (batchId.nonEmpty)
          withLockWait(tablePath, lockWaitMillis) { leaseId =>
            val m1 = readManifest(tablePath).get
            if (batchId != m1.batch) {
              refreshLease(tablePath, leaseId)
              commitManifest(tablePath, m1.copy(batch = batchId))
            }
          }
        return
      }
      // ---- UNLOCKED work phase: merge + stage against the snapshot ----
      val liveTouched = touchedB.toSeq.sorted.flatMap(b => m0.dirs.get(b))
        .map(d => Paths.get(tablePath, d).toString)
      val targetOpt =
        if (liveTouched.isEmpty) None
        else Some(withBucket(mergedRead(spark, m0, liveTouched), keys, nb))
      val widenedNew = targetOpt
        .map(t => widenedBy(t.schema, bucketed.schema, keys))
        .getOrElse(Map.empty[String, String])
      val merged = targetOpt match {
        case None => bucketed
        case Some(target) =>
          target.join(bucketed, keys, "left_anti")
            .unionByName(alignForUnion(bucketed, target, m0.dropped))
      }
      // UNIQUE staging sibling: concurrent writers must never share
      // the pessimistic path's fixed `<table>.tmp`
      val tmp = tablePath + ".tmp-" +
        java.util.UUID.randomUUID().toString.substring(0, 8)
      timed("merge-write") {
        stageWrite(merged, tmp, compact = tiny && targetOpt.isEmpty) }
      touchedB.foreach { b =>
        if (!Files.exists(Paths.get(tmp, s"$BucketCol=$b")))
          throw new IllegalStateException(
            s"bucket dir missing from merge output: $tmp/$BucketCol=$b")
      }
      val newStats = timed("stats") { bucketStats(spark, tmp, keys ++ statsColumnsP) }
      failpoint("optimistic-staged")
      // ---- LOCKED commit phase: conflict check, rebase, swap ----
      try {
        withLockWait(tablePath, lockWaitMillis) { leaseId =>
          val m1 = readManifest(tablePath).getOrElse(throw new IllegalStateException(
            s"upsertConcurrent: $tablePath manifest vanished mid-commit"))
          checkFootprints(tablePath, m0, m1, touchedB, "upsertConcurrent")
          val base = readManifest(tablePath).get
          val newVersions = timed("adopt") { adoptBucketDirs(tablePath, tmp,
            b => nextVersion(tablePath, base, b)) }
          val dvRel = pruneDv(spark, tablePath, base, keys,
            bucketed.select(keys.map(col): _*))
          failpoint("before-manifest")
          refreshLease(tablePath, leaseId)
          val committed = timed("manifest") {
            commitManifest(tablePath, base.copy(
              dirs = base.dirs ++ newVersions,
              stats = base.stats -- touchedB ++ newStats, keys = keys,
              dv = dvRel,
              widened = base.widened ++ widenedNew,
              batch = if (batchId.nonEmpty) batchId else base.batch)) }
          failpoint("after-manifest")
          timed("sweep-post") { sweepVersions(tablePath, committed, retainVersions) }
        }
      } finally deleteRecursively(Paths.get(tmp))
    } finally bucketed.unpersist(blocking = false)
  }

  /** The REBASE DECISION shared by every optimistic writer: given the
    * snapshot this writer staged against (`m0`), the live manifest at
    * commit time (`m1`) and the buckets this writer rewrote, walk
    * every intervening commit's recorded footprint (`touched=` line)
    * and prove DISJOINTNESS — then the staged buckets can simply land
    * on top of the live manifest. Any overlap, any table-wide
    * metadata change, any pre-footprint commit, any swept history →
    * loud ConcurrentModificationException (the conservative
    * direction: when the footprint cannot be proven safe, the writer
    * re-runs). */
  private def checkFootprints(tablePath: String, m0: Manifest, m1: Manifest,
                              touchedB: Set[Int], opName: String): Unit = {
    if (m1.commit == m0.commit) return
    def conflict(why: String): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"$opName conflict on $tablePath: $why (this " +
        s"writer read commit ${m0.commit}, live is ${m1.commit}) — " +
        s"re-run the $opName against the current table")
    // every intervening commit's footprint, youngest = live
    val intervening = ((m0.commit + 1) to m1.commit).map { n =>
      if (n == m1.commit) m1
      else {
        val p = Paths.get(tablePath, HistoryDir, n.toString)
        if (!Files.exists(p)) conflict(
          s"history for intervening commit $n was already swept")
        parseManifest(p)
      }
    }
    intervening.foreach { mf =>
      if (!mf.touchedKnown) conflict(
        s"intervening commit ${mf.commit} predates footprint recording")
      if (mf.metaChange) conflict(
        s"intervening commit ${mf.commit} changed table-wide metadata")
      val overlap = mf.touched.intersect(touchedB)
      if (overlap.nonEmpty) conflict(
        s"intervening commit ${mf.commit} rewrote bucket(s) " +
        s"${overlap.toSeq.sorted.mkString(",")} this $opName also touches")
    }
    // belt-and-braces: the footprint chain proved these, but a
    // mismatch here would corrupt the table — verify directly
    if (m1.numBuckets != m0.numBuckets || m1.dv != m0.dv ||
        m1.colmap != m0.colmap || m1.dropped != m0.dropped ||
        m1.widened != m0.widened)
      conflict("table-wide metadata differs from the snapshot read")
  }

  /** FULL MERGE surface — Delta `MERGE ... WHEN MATCHED [AND cond]
    * THEN DELETE` parity, in the CDC-apply shape: the source carries an
    * operation column (`opCol`), rows tagged `delete` remove their key
    * from the table, every other row upserts (update-or-insert), ALL IN
    * ONE crash-safe commit through the standard protocol (lock, lease,
    * manifest swap, retention, batch stamp). The change feed across the
    * commit tags the three populations `update`/`insert`/`delete`
    * (CdcSpec pins it).
    *
    * Scale is the upsert's: ONE probe job finds touched buckets +
    * multiplicity, only touched buckets are read or rewritten (pruned
    * by PATH), a bucket whose rows are all deleted drops from the
    * manifest (its old versions stay readable through retention). A key
    * appearing twice in one batch — including delete + upsert of the
    * SAME key — is the Delta multiple-match error: resolve upstream,
    * the merge cannot know which wins.
    *
    * A delete for a key the table doesn't hold is a no-op (row
    * vanishes in the anti-join), matching MERGE: an unmatched
    * WHEN MATCHED DELETE clause fires nothing. */
  def applyCdc(spark: SparkSession, tablePath: String, source: DataFrame,
               keys: Seq[String], opCol: String = "_op",
               numBuckets: Int = 0,
               retainVersions: Int = DefaultRetainVersions,
               statsColumns: Seq[String] = Nil,
               batchId: String = ""): Unit = {
    require(source.columns.contains(opCol),
      s"applyCdc: source must carry the operation column '$opCol'")
    if (readManifest(tablePath).isEmpty) {
      // no committed target: deletes have nothing to match (MERGE
      // no-op); the surviving rows create the table
      upsert(spark, tablePath, source.filter(col(opCol) =!= "delete").drop(opCol),
        keys, numBuckets, retainVersions = retainVersions,
        statsColumns = statsColumns, batchId = batchId)
      return
    }
    withLock(tablePath) { leaseId =>
      val manifest = readManifest(tablePath).get
      // CHECK constraints see the rows ENTERING the table: the
      // upsert-tagged legs (deletes remove rows — nothing to check)
      enforceConstraints(spark, tablePath, manifest,
        source.filter(col(opCol) =!= "delete").drop(opCol), "applyCdc")
      val nb = manifest.numBuckets
      // logical → physical at the boundary (no-ops without a colmap)
      val pkeys = keys.map(physicalOf(manifest, _))
      val psource = physicalize(source, manifest)
      requireSameKeys(tablePath, manifest, pkeys)
      sweepVersions(tablePath, manifest, retainVersions)
      val bucketed = withBucket(psource, pkeys, nb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val probe = bucketed
          .groupBy(col(BucketCol) +: pkeys.map(col): _*)
          .agg(count(lit(1)).as("__c"),
            // does this key carry a NON-delete row (per bucket below:
            // such buckets MUST produce an output dir — write tripwire)
            max(when(col(opCol) === "delete", 0).otherwise(1)).as("__up"))
          .groupBy(col(BucketCol)).agg(max(col("__c")).as("__maxc"),
            max(col("__up")).as("__hasup"))
          .collect()
        if (probe.exists(_.getLong(1) > 1))
          throw new IllegalArgumentException(
            "merge aborted: a key appears in more than one source row " +
            s"(incl. delete+upsert of the same key) for keys ${keys.mkString(",")}")
        val touched: Seq[Int] = probe.map(_.getInt(0)).toSeq.sorted
        if (touched.isEmpty) {
          if (batchId.nonEmpty && batchId != manifest.batch) {
            refreshLease(tablePath, leaseId)
            commitManifest(tablePath, manifest.copy(batch = batchId))
          }
          return
        }
        val mustWrite = probe.filter(_.getInt(2) == 1).map(_.getInt(0)).toSet
        val liveTouched = touched.flatMap(b => manifest.dirs.get(b))
          .map(d => Paths.get(tablePath, d).toString)
        val upserts = bucketed.filter(col(opCol) =!= "delete")
        val targetOpt =
          if (liveTouched.isEmpty) None
          else Some(withBucket(mergedRead(spark, manifest, liveTouched), pkeys, nb))
        val widenedNew = targetOpt
          .map(t => widenedBy(t.schema, upserts.schema, pkeys))
          .getOrElse(Map.empty[String, String])
        val merged = targetOpt match {
          case None => upserts.drop(opCol)
          case Some(target) =>
            // ONE anti-join on ALL source keys (delete keys and upsert
            // keys alike drop the old image), then the new images land
            target.join(bucketed, pkeys, "left_anti")
              .unionByName(alignForUnion(upserts, target, manifest.dropped))
        }
        val tmp = tablePath + ".tmp"
        stageWrite(merged, tmp)
        mustWrite.foreach { b =>
          if (!Files.exists(Paths.get(tmp, s"$BucketCol=$b")))
            throw new IllegalStateException(
              s"bucket dir missing from merge output: $tmp/$BucketCol=$b")
        }
        // a touched bucket with NO output dir was emptied by deletes —
        // it leaves the manifest (old versions stay within retention)
        val emptied = touched.filterNot(b =>
          Files.exists(Paths.get(tmp, s"$BucketCol=$b")))
        val newStats = bucketStats(spark, tmp,
          pkeys ++ statsColumns.map(physicalOf(manifest, _)))
        val newVersions = adoptBucketDirs(tablePath, tmp,
          b => nextVersion(tablePath, manifest, b))
        // reinsert safety: every source key (upsert AND delete ops)
        // loses its tombstone — hard-deleted rows are gone physically
        val dvRel = pruneDv(spark, tablePath, manifest, pkeys,
          bucketed.select(pkeys.map(col): _*))
        // a CDC batch whose deletes empty EVERY live bucket must leave
        // a schema-bearing table, same as the rewriteWhere engines —
        // an empty-dirs manifest has no schema to read
        val dirs1 = manifest.dirs -- emptied ++ newVersions
        val finalDirs =
          if (dirs1.nonEmpty) dirs1
          else Map(stageEmptyBucket(tablePath, merged, touched.head,
            nextVersion(tablePath, manifest, touched.head)))
        failpoint("before-manifest")
        refreshLease(tablePath, leaseId)
        val committed = commitManifest(tablePath, manifest.copy(numBuckets = nb,
          dirs = finalDirs,
          stats = manifest.stats -- touched ++ newStats, keys = pkeys,
          dv = dvRel,
          widened = manifest.widened ++ widenedNew,
          batch = if (batchId.nonEmpty) batchId else manifest.batch))
        failpoint("after-manifest")
        sweepVersions(tablePath, committed, retainVersions)
        deleteRecursively(Paths.get(tmp))
      } finally bucketed.unpersist(blocking = false)
    }
  }

  /** Write a new deletion-vector dir for the NEXT commit of `m`; ""
    * when the vector is empty (dv cleared). Staged + atomic move, like
    * every other version dir. Naming is collision-proof the same way
    * [[nextVersion]] is for bucket dirs: one past the max `dv_vN` on
    * disk (floored by the commit counter) — a commit-numbered name
    * alone would collide on a CLONED table, whose symlinked dv keeps
    * its SOURCE-numbered name while the clone's commit counter restarts
    * at 1; deleting that "leftover" pre-commit would corrupt the
    * still-live manifest. Crash leftovers from a failed prior attempt
    * are unreferenced and get reaped by the reachability sweep. */
  private def writeDvDir(spark: SparkSession, tablePath: String, m: Manifest,
                         dvDf: DataFrame): String = {
    val tmp = tablePath + ".dvtmp"
    deleteRecursively(Paths.get(tmp))
    dvDf.coalesce(1).write.mode("overwrite").parquet(tmp)
    val data = Paths.get(tablePath, "data")
    val onDisk =
      if (!Files.exists(data)) Nil
      else graft.merge.FsList.list(data).flatMap(p =>
        "^dv_v(\\d+)$".r.findFirstMatchIn(p.getFileName.toString)
          .map(_.group(1).toInt))
    val rel = s"data/dv_v${(m.commit +: onDisk).max + 1}"
    val dst = Paths.get(tablePath, rel)
    Files.createDirectories(dst.getParent)
    Files.move(Paths.get(tmp), dst, StandardCopyOption.ATOMIC_MOVE)
    rel
  }

  /** Reinsert safety for the deletion vector: a key the source batch
    * carries must LIVE after the commit, so its tombstone goes. Returns
    * the new dv rel path for the commit ("" = none/cleared). */
  private def pruneDv(spark: SparkSession, tablePath: String, m: Manifest,
                      keys: Seq[String], sourceKeys: DataFrame): String =
    dvFrame(spark, tablePath, m) match {
      case None => ""
      case Some(dv) =>
        val pruned = dv.join(sourceKeys, keys, "left_anti")
        if (pruned.isEmpty) "" else writeDvDir(spark, tablePath, m, pruned)
    }

  /** Caller keys must match the keys the table's buckets are hashed on
    * (recorded in the manifest since the stats format landed): merging
    * on different keys would route rows to the wrong buckets and
    * silently duplicate. Legacy manifests (no keys line) adopt the
    * caller's keys on their next commit. Order-sensitive — the bucket
    * hash is. */
  private def requireSameKeys(tablePath: String, manifest: Manifest, keys: Seq[String]): Unit =
    if (manifest.keys.nonEmpty &&
        manifest.keys.map(_.toLowerCase) != keys.map(_.toLowerCase))
      throw new IllegalArgumentException(
        s"table $tablePath is bucketed on keys (${manifest.keys.mkString(",")}); " +
        s"got (${keys.mkString(",")}) — merge keys are fixed at create time " +
        "(a rebucket with the new keys is the migration path)")

  /** The established-table merge path (manifest in hand, lock held).
    * `keys0`/`source0` are the caller's LOGICAL view; they translate
    * to physical names here (no-ops without a colmap). */
  private def upsertCommitted(spark: SparkSession, tablePath: String, source0: DataFrame,
      keys0: Seq[String], numBuckets: Int, evolveSchema: Boolean, retainVersions: Int,
      statsColumns: Seq[String], manifest: Manifest, leaseId: String,
      batchId: String = ""): Unit = {
    enforceConstraints(spark, tablePath, manifest, source0, "upsert")
    // A source column literally named after a colmap PHYSICAL key (the
    // API boundary is logical; physical names are reserved by renames)
    // would collide when physicalize renames the logical column onto
    // it — duplicate columns, and on read logicalize would present the
    // new column's data under the OLD logical name. Reject loudly.
    source0.columns.foreach { c =>
      manifest.colmap.foreach { case (p, l) =>
        if (c.equalsIgnoreCase(p) && !c.equalsIgnoreCase(l))
          throw new IllegalArgumentException(
            s"upsert: source column '$c' collides with the physical name " +
            s"of renamed column '$l' — physical names are reserved until a " +
            "rebucket materializes the mapping")
      }
      // Same reservation for DROPPED columns: the bytes are still in
      // the files under that physical name, so re-adding it via schema
      // evolution would resurrect the old data under the new column on
      // mergeSchema reads. A rebucket frees the name.
      if (manifest.dropped.exists(_.equalsIgnoreCase(c)))
        throw new IllegalArgumentException(
          s"upsert: source column '$c' matches a DROPPED column's physical " +
          "name — dropped names are reserved until a rebucket materializes " +
          "the drop")
    }
    val keys = keys0.map(physicalOf(manifest, _))
    val source = physicalize(source0, manifest)
    val statsColumnsP = statsColumns.map(c =>
      if (isBloomCol(c)) BloomTag + physicalOf(manifest, bloomInner(c))
      else physicalOf(manifest, c))
    val nb = manifest.numBuckets
    if (numBuckets > 0 && numBuckets != nb)
      throw new IllegalArgumentException(
        s"table $tablePath is laid out with $nb buckets; an upsert cannot change " +
        s"that — run Scd1Merge.rebucket(..., $numBuckets) first (a full-rewrite commit)")
    requireSameKeys(tablePath, manifest, keys)
    // sweep crash leftovers BEFORE writing new versions so a half-moved
    // dir from a previous failed commit can't collide with this one
    // (retained history stays — it's referenced by lagging readers)
    timed("sweep-pre") { sweepVersions(tablePath, manifest, retainVersions) }
    // PERSIST the bucketed source for the life of the commit: its
    // lineage (often a CSV scan + joins upstream of the pipeline) is
    // otherwise evaluated THREE times — the probe job, the anti-join
    // side and the union side of the merge write. Measured ~3× the
    // per-commit Spark time on the sales replay. MEMORY_AND_DISK spills
    // rather than OOMs on a huge batch; Delta's MERGE materializes its
    // source for the same reason (plus a determinism guarantee we
    // inherit: probe and write see the same rows even if the source
    // lineage is non-deterministic).
    // Tiny driver-local sources additionally run the whole commit on
    // ONE partition: SinglePartition satisfies every distribution the
    // probe's aggregations require, so the commit's exchanges (and
    // their per-action AQE stage jobs) vanish (guide §2.4).
    val tiny = tinyLocalSource(source)
    val bucketed = withBucket(
        if (tiny) source.coalesce(1) else source, keys, nb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE probe job covers both pre-checks: per-bucket (touched set
      // for partition pruning) and per-key max multiplicity (the Q8
      // multiple-match error, same semantics as requireUniqueSourceKeys).
      val probe = timed("probe") { bucketed
        .groupBy(col(BucketCol) +: keys.map(col): _*).agg(count(lit(1)).as("__c"))
        .groupBy(col(BucketCol)).agg(max(col("__c")).as("__maxc"))
        .collect() }
      if (probe.exists(_.getLong(1) > 1))
        throw new IllegalArgumentException(
          s"SCD1 merge aborted: duplicate source rows for merge key ${keys.mkString(",")}")
      val touched: Seq[Int] = probe.map(_.getInt(0)).toSeq.sorted
      if (touched.isEmpty) {
        // empty batch: no buckets to merge or rewrite — but a batch
        // stamp still ADVANCES via a manifest-only commit, so
        // verifyConsistent can tell "saw batch X, X was empty here"
        // from "never ran batch X"
        if (batchId.nonEmpty && batchId != manifest.batch) {
          refreshLease(tablePath, leaseId)
          commitManifest(tablePath, manifest.copy(batch = batchId))
        }
        return
      }
      // the target is ONLY the touched buckets' live dirs — pruning by
      // path, no filter needed (a bucket the batch doesn't touch is
      // never read, never written)
      val liveTouched = touched.flatMap(b => manifest.dirs.get(b))
        .map(d => Paths.get(tablePath, d).toString)
      val targetOpt =
        if (liveTouched.isEmpty) None // all-new buckets: insert only
        else Some(withBucket(mergedRead(spark, manifest, liveTouched), keys, nb))
      // numeric type widening (int→long / float→double): accepted in
      // BOTH modes — the union writes the touched buckets wide and the
      // manifest records the wide type so readers reconcile the
      // narrow files in untouched buckets (mergedRead)
      val widenedNew = targetOpt
        .map(t => widenedBy(t.schema, bucketed.schema, keys))
        .getOrElse(Map.empty[String, String])
      val merged = targetOpt match {
        case None => bucketed
        case Some(target) =>
          // dup check already done by the probe — plain anti-join + union
          if (evolveSchema)
            target.join(bucketed, keys, "left_anti")
              .unionByName(bucketed, allowMissingColumns = true)
          else
            target.join(bucketed, keys, "left_anti")
              .unionByName(alignForUnion(bucketed, target, manifest.dropped))
      }
      val tmp = tablePath + ".tmp"
      // repartition on the bucket column before the partitioned write:
      // without it every shuffle partition spills a sliver into every
      // bucket dir (partitions × buckets small files); with it each
      // bucket's data is co-located and lands as ~one file. Tiny
      // all-new local batches (merged eq bucketed, one partition
      // already) skip the exchange.
      timed("merge-write") {
        stageWrite(merged, tmp, compact = tiny && targetOpt.isEmpty) }
      touched.foreach { b =>
        if (!Files.exists(Paths.get(tmp, s"$BucketCol=$b")))
          // every touched bucket holds >=1 source row, so the merged
          // write must produce its dir; a miss means the write went wrong.
          throw new IllegalStateException(s"bucket dir missing from merge output: $tmp/$BucketCol=$b")
      }
      // fresh stats for the rewritten buckets; untouched buckets keep
      // theirs, touched buckets NEVER keep stale ones (a stale range on
      // a new version could wrongly prune)
      val newStats = timed("stats") { bucketStats(spark, tmp, keys ++ statsColumnsP) }
      val newVersions = timed("adopt") { adoptBucketDirs(tablePath, tmp,
        b => nextVersion(tablePath, manifest, b)) }
      // reinsert safety: upserted keys lose their tombstones
      val dvRel = pruneDv(spark, tablePath, manifest, keys,
        bucketed.select(keys.map(col): _*))
      failpoint("before-manifest")
      refreshLease(tablePath, leaseId)
      val committed = timed("manifest") {
        commitManifest(tablePath, manifest.copy(numBuckets = nb,
          dirs = manifest.dirs ++ newVersions,
          stats = manifest.stats -- touched ++ newStats, keys = keys,
          dv = dvRel,
          widened = manifest.widened ++ widenedNew,
          batch = if (batchId.nonEmpty) batchId else manifest.batch)) }
      failpoint("after-manifest")
      // post-commit sweep: ONLY versions beyond the retention window
      // (the just-replaced version stays for lagging readers) + the tmp
      timed("sweep-post") { sweepVersions(tablePath, committed, retainVersions) }
      timed("tmp-del") { deleteRecursively(Paths.get(tmp)) }
    } finally bucketed.unpersist(blocking = false)
  }

  /** Change a table's bucket count in place — the create-time sizing
    * dial (numBuckets ≈ table_bytes / 256 MB) re-applied as the table
    * grows: a table created at 1 GB that reaches 100 TB needs its
    * buckets re-cut or every merge rewrites multi-TB buckets. ONE
    * full-rewrite commit through the standard protocol (locked,
    * lease-refreshed, crash-safe): the whole table is re-hashed into
    * the new bucket space and the manifest swaps wholesale. Old
    * version dirs stay reachable through retained history — snapshot
    * reads and lagging readers cross a rebucket like any other
    * commit. Necessarily O(table) — it is the one operation whose job
    * is to move every row; schedule it like a compaction. */
  def rebucket(spark: SparkSession, tablePath: String, keys: Seq[String],
               newNumBuckets: Int,
               retainVersions: Int = DefaultRetainVersions): Unit = {
    require(newNumBuckets > 0, s"newNumBuckets must be positive: $newNumBuckets")
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"rebucket: $tablePath has no manifest (legacy tables migrate via upsert first)")
    withLock(tablePath) { leaseId =>
      val manifest = readManifest(tablePath).get
      if (newNumBuckets != manifest.numBuckets) {
        sweepVersions(tablePath, manifest, retainVersions)
        val full = readTable(spark, tablePath)
        val tmp = tablePath + ".tmp"
        stageWrite(withBucket(full, keys, newNumBuckets), tmp)
        // full rewrite = full stats refresh: every previously-tracked
        // column (plus the keys) is re-ranged under the new bucketing —
        // a rebucket BACKFILLS stats declared after a bucket last wrote.
        // Tracked names translate to logical: the rewrite materialized
        // the colmap, so logical IS physical in the new files.
        val tracked = (keys ++ manifest.stats.values.flatMap(_.keySet)
          .filterNot(c => manifest.dropped.contains(
            if (isBloomCol(c)) bloomInner(c) else c))
          .map(c => if (isBloomCol(c)) BloomTag + logicalOf(manifest, bloomInner(c))
                    else logicalOf(manifest, c))).distinct
        val stats = bucketStats(spark, tmp, tracked)
        // version continuity per NEW bucket id: nextVersion consults the
        // old manifest AND the retained dirs on disk, so re-used ids
        // can't collide with history
        val newVersions = adoptBucketDirs(tablePath, tmp,
          b => nextVersion(tablePath, manifest, b))
        failpoint("before-manifest")
        refreshLease(tablePath, leaseId)
        val committed = commitManifest(tablePath,
          manifest.copy(numBuckets = newNumBuckets, dirs = newVersions,
            // the full rewrite read through readTable, which is
            // dv-filtered AND logicalized — tombstoned rows are gone
            // and renames MATERIALIZE (files now carry logical names)
            stats = stats, keys = keys, dv = "", colmap = Map.empty,
            dropped = Set.empty))
        failpoint("after-manifest")
        sweepVersions(tablePath, committed, retainVersions)
        deleteRecursively(Paths.get(tmp))
      }
    }
  }

  /** Within-bucket CLUSTERING maintenance — Delta `OPTIMIZE ZORDER BY`
    * re-expressed for the hash-bucketed layout. Bucket ASSIGNMENT stays
    * the key hash (upsert locality is untouched), but each bucket's
    * rows are rewritten sorted by `sortCols` — multi-column sorts can
    * interleave via a Morton code ([[graft.store.ZOrder]]) so EVERY
    * clustering column gets locality, not just the leading one. The
    * payoff is the pruning level BELOW the manifest: bucket-level
    * min/max on a non-key column cannot prune (the key hash scatters
    * every column's domain across all buckets), but within a sorted
    * bucket each parquet ROW GROUP covers a narrow range, so a pushed
    * range predicate skips most of the bucket's bytes from footer
    * stats alone. One commit through the standard protocol (locked,
    * lease-refreshed, crash-safe, history-retained); stats refresh for
    * all tracked columns and start tracking the clustering columns.
    *
    * With `dirtyOnly = false` this is O(table) like [[rebucket]]. With
    * `dirtyOnly = true` it is INCREMENTAL — the manifest records which
    * live dirs were written clustered under the current spec, and only
    * buckets rewritten since (by upsert/delete/compact, whose fresh
    * dir names fall out of the marker set automatically) are re-sorted.
    * That makes steady-state maintenance O(churn), not O(table):
    * schedule `recluster(dirtyOnly = true)` after every N merge
    * commits the way Delta schedules incremental OPTIMIZE. Returns the
    * number of buckets rewritten (0 = everything already clustered; the
    * commit is skipped, so it is idempotent and cheap to schedule).
    *
    * @param zOrderBits >0 with 2+ sortCols sorts by the interleaved
    *        Morton code at that per-column bit depth; 0 sorts
    *        lexicographically. */
  def recluster(spark: SparkSession, tablePath: String, sortCols0: Seq[String],
                zOrderBits: Int = 0, dirtyOnly: Boolean = false,
                retainVersions: Int = DefaultRetainVersions): Int = {
    require(sortCols0.nonEmpty, "recluster needs at least one clustering column")
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"recluster: $tablePath has no manifest (not a committed bucketed table)")
    withLock(tablePath) { leaseId =>
      val manifest0 = readManifest(tablePath).get
      require(manifest0.keys.nonEmpty,
        s"recluster: $tablePath manifest predates key tracking — run one upsert first")
      // caller sort columns are LOGICAL; files (and the clusterCols
      // spec recorded alongside them) are physical
      val sortCols = sortCols0.map(physicalOf(manifest0, _))
      val manifest = manifest0
      // dirty = live dirs NOT marked clustered under THIS spec. The
      // markers are dir names, and every rewriting commit mints new
      // dir names, so upsert/delete/compact invalidate markers with
      // zero bookkeeping of their own. A spec change dirties all.
      val sameSpec = manifest.clusterCols == sortCols &&
        manifest.clusterZBits == zOrderBits
      val dirty = manifest.dirs.toSeq.sortBy(_._1).filter { case (_, d) =>
        !(dirtyOnly && sameSpec && manifest.clustered.contains(d)) }
      if (dirty.isEmpty) 0
      else {
        sweepVersions(tablePath, manifest, retainVersions)
        // bucket ids re-attached as literals (the compact read shape) —
        // only dirty buckets are read, sorted, and rewritten
        val src = dirty.map { case (b, d) =>
            readDir(spark, Paths.get(tablePath, d).toString)
              .withColumn(BucketCol, lit(b)) }
          .reduce(_.unionByName(_, allowMissingColumns = true))
        val sortExprs =
          if (zOrderBits > 0 && sortCols.size > 1)
            // bin boundaries are estimated over the rows being rewritten;
            // footer-stat pruning only depends on each FILE's own
            // ordering, so per-run boundary drift is harmless
            Seq(graft.store.ZOrder.zvalue(src.drop(BucketCol), sortCols, zOrderBits))
          else sortCols.map(col)
        val tmp = tablePath + ".tmp"
        stageWriteSorted(src, sortExprs, tmp)
        val tracked =
          (manifest.keys ++ manifest.stats.values.flatMap(_.keySet) ++ sortCols).distinct
        val stats = timed("stats") { bucketStats(spark, tmp, tracked) }
        val newVersions = adoptBucketDirs(tablePath, tmp,
          b => nextVersion(tablePath, manifest, b))
        failpoint("before-manifest")
        refreshLease(tablePath, leaseId)
        val committed = commitManifest(tablePath,
          manifest.copy(dirs = manifest.dirs ++ newVersions,
            stats = manifest.stats -- dirty.map(_._1) ++ stats,
            clusterCols = sortCols, clusterZBits = zOrderBits,
            // survivors (clean dirs under the same spec — empty on a
            // spec change, where every bucket is dirty) + this rewrite
            clustered = manifest.clustered
              .intersect((manifest.dirs -- dirty.map(_._1)).values.toSet)
              ++ newVersions.values))
        failpoint("after-manifest")
        sweepVersions(tablePath, committed, retainVersions)
        deleteRecursively(Paths.get(tmp))
        dirty.size
      }
    }
  }

  /** Delta `DELETE FROM ... WHERE` parity: remove every row matching
    * `predicate`, rewriting ONLY the buckets that hold matching rows
    * (one bucket-tagged probe scan; ≤numBuckets rows collected). SQL
    * NULL semantics: a row where the predicate is NULL is KEPT. A
    * bucket left empty drops out of the manifest entirely. Same commit
    * protocol as upsert — locked, lease-refreshed, crash-safe,
    * retention-isolated, history'd (so [[readChanges]] feeds `delete`
    * rows downstream). Returns the number of rows deleted.
    *
    * At 100 TB: cost is one probe scan over live buckets + a rewrite
    * of matching buckets only. A key-equality predicate could prune
    * the probe to hashed buckets; kept general — Delta pays the same
    * scan for arbitrary predicates. */
  def delete(spark: SparkSession, tablePath: String, keys: Seq[String],
             predicate: org.apache.spark.sql.Column,
             retainVersions: Int = DefaultRetainVersions): Long =
    rewriteWhere(spark, tablePath, keys, predicate, retainVersions, "delete",
      (live, pred) => live.filter(!coalesce(pred, lit(false))))

  /** GENERATED COLUMNS (Delta parity): each `generated` entry is a
    * column DEFINED by an expression over the other source columns —
    * absent from a batch, it is computed; present, it is VALIDATED
    * (one count per supplied column, null-safe compare) and a
    * contradiction fails the whole batch loudly — a generated column
    * that silently disagrees with its definition poisons every
    * downstream consumer that assumes the invariant (the usual victim:
    * a partition/stats column derived from an event time). Compute
    * happens in the batch's plan (codegen'd, no extra pass); then the
    * standard upsert commit. */
  def upsertGenerated(spark: SparkSession, tablePath: String, source: DataFrame,
                      keys: Seq[String], generated: Map[String, Column],
                      numBuckets: Int = 0,
                      retainVersions: Int = DefaultRetainVersions,
                      statsColumns: Seq[String] = Nil,
                      batchId: String = ""): Unit = {
    val prepared = generated.foldLeft(source) { case (df, (name, expr)) =>
      if (!df.columns.exists(_.equalsIgnoreCase(name))) df.withColumn(name, expr)
      else {
        val bad = df.filter(!(col(name) <=> expr)).count()
        if (bad > 0) throw new IllegalArgumentException(
          s"upsertGenerated: $bad row(s) contradict generated column " +
          s"'$name' — supplied values must equal the defining expression")
        df
      }
    }
    upsert(spark, tablePath, prepared, keys, numBuckets,
      retainVersions = retainVersions, statsColumns = statsColumns,
      batchId = batchId)
  }

  /** RENAME a column WITHOUT rewriting data — Delta column-mapping
    * parity: on a 100 TB table a rename is ONE manifest swap; the
    * parquet files keep their physical names forever and every read
    * path presents the logical view ([[readTable]] and friends
    * logicalize; upsert/CDC/delete/update translate logical sources,
    * keys and predicates back to physical at the boundary). Merge KEYS
    * rename like any column — the bucket hash runs on values, not
    * names. Snapshot reads time-travel the SCHEMA too: a
    * [[readTableAt]] before the rename shows the old name (each
    * snapshot carries its own map). A full rewrite ([[rebucket]])
    * MATERIALIZES the mapping: files get the logical names and the map
    * clears. `oldName` is the current LOGICAL name. */
  /** Validate `rows` (the caller's LOGICAL view) against the table's
    * CHECK constraints — SQL CHECK semantics: a row passes when the
    * expression is TRUE or NULL; one FALSE row rejects the WHOLE
    * commit, loudly, with the constraint name and up to 3 offending
    * rows. Cost: ONE aggregation job over the incoming batch
    * validates every constraint together (reads never pay, and the
    * batch is delta-sized — at 100 TB the scan that must not happen
    * is the table, not the batch). */
  private def enforceConstraints(spark: SparkSession, tablePath: String,
      manifest: Manifest, rows: DataFrame, op: String): Unit =
    enforceCheck(spark, tablePath, manifest.constraints, rows, op)

  /** The check itself, shared with the partitioned layout's
    * parent-level constraints. */
  private[merge] def enforceCheck(spark: SparkSession, label: String,
      constraints: Map[String, String], rows: DataFrame, op: String): Unit = {
    if (constraints.isEmpty) return
    val cs = constraints.toSeq.sortBy(_._1)
    def violated(x: String): Column = !coalesce(expr(x), lit(true))
    val counts = rows.agg(
      count(when(violated(cs.head._2), 1)).as("c0"),
      cs.tail.zipWithIndex.map { case ((_, x), i) =>
        count(when(violated(x), 1)).as(s"c${i + 1}") }: _*).collect().head
    cs.zipWithIndex.foreach { case ((n, x), i) =>
      val c = counts.getLong(i)
      if (c > 0) {
        val sample = rows.filter(violated(x)).limit(3).collect().mkString("; ")
        throw new IllegalStateException(
          s"$op: CHECK constraint '$n' ($x) violated by $c row(s) at " +
          s"$label — e.g. $sample")
      }
    }
  }

  /** ADD a CHECK constraint (Delta `ALTER TABLE ADD CONSTRAINT`
    * parity): the expression — any deterministic SQL boolean over
    * LOGICAL column names; NOT NULL is spelled `col IS NOT NULL` —
    * must hold on ALL existing rows first (one table scan, the price
    * Delta documents for the same statement), then the constraint
    * commits into the manifest as a metadata swap. Every subsequent
    * write validates its delta-sized batch; a violation rejects the
    * whole commit before anything lands. Concurrent writers staged
    * against the pre-constraint manifest conflict via the commit's
    * `metaChange` footprint — no unvalidated row can slip in beside
    * the ADD. */
  def addConstraint(spark: SparkSession, tablePath: String,
                    name: String, exprSql: String,
                    retainVersions: Int = DefaultRetainVersions): Unit = {
    require(name.nonEmpty && !name.exists(c => c == ',' || c == ':'),
      s"addConstraint: name '$name' must be non-empty, without ',' or ':'")
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"addConstraint: $tablePath has no manifest (not a committed bucketed table)")
    withLock(tablePath) { leaseId =>
      val manifest = readManifest(tablePath).get
      require(!manifest.constraints.keys.exists(_.equalsIgnoreCase(name)),
        s"addConstraint: constraint '$name' already exists on $tablePath")
      enforceConstraints(spark, tablePath,
        manifest.copy(constraints = Map(name -> exprSql)),
        readTable(spark, tablePath), "addConstraint(existing rows)")
      refreshLease(tablePath, leaseId)
      val committed = commitManifest(tablePath,
        manifest.copy(constraints = manifest.constraints + (name -> exprSql)))
      sweepVersions(tablePath, committed, retainVersions)
    }
  }

  /** DROP a CHECK constraint — a pure metadata swap. Loud when the
    * name is unknown (a silently-ignored drop would leave the caller
    * believing enforcement stopped). */
  def dropConstraint(spark: SparkSession, tablePath: String, name: String,
                     retainVersions: Int = DefaultRetainVersions): Unit = {
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"dropConstraint: $tablePath has no manifest (not a committed bucketed table)")
    withLock(tablePath) { leaseId =>
      val manifest = readManifest(tablePath).get
      val key = manifest.constraints.keys.find(_.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(
          s"dropConstraint: no constraint '$name' on $tablePath " +
          s"(have: ${manifest.constraints.keys.toSeq.sorted.mkString(",") })"))
      refreshLease(tablePath, leaseId)
      val committed = commitManifest(tablePath,
        manifest.copy(constraints = manifest.constraints - key))
      sweepVersions(tablePath, committed, retainVersions)
    }
  }

  /** Live constraints: name → SQL expression. */
  def tableConstraints(tablePath: String): Map[String, String] =
    readManifest(tablePath).map(_.constraints).getOrElse(Map.empty)

  def renameColumn(spark: SparkSession, tablePath: String,
                   oldName: String, newName: String,
                   retainVersions: Int = DefaultRetainVersions): Unit = {
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"renameColumn: $tablePath has no manifest (not a committed bucketed table)")
    withLock(tablePath) { leaseId =>
      val manifest = readManifest(tablePath).get
      val anyDir = manifest.dirs.toSeq.sortBy(_._1).headOption.map(_._2)
        .getOrElse(throw new IllegalStateException(
          s"renameColumn: $tablePath has no live buckets"))
      val logicalCols = logicalize(
        readDir(spark, Paths.get(tablePath, anyDir).toString), manifest)
        .columns.filterNot(_ == BucketCol).toSeq
      require(logicalCols.exists(_.equalsIgnoreCase(oldName)),
        s"renameColumn: no column '$oldName' (have: ${logicalCols.mkString(",")})")
      require(!logicalCols.exists(_.equalsIgnoreCase(newName)),
        s"renameColumn: column '$newName' already exists")
      val physical = physicalOf(manifest, oldName)
      // The colmap must stay injective over physical AND logical names:
      // reusing a name that still exists PHYSICALLY in the files (or as
      // another colmap key) would make logicalize/physicalize fold
      // ambiguous — old physical data would silently surface under the
      // new logical name. Renaming a column back to its OWN physical
      // name is the one allowed case (the map entry just clears).
      val physicalCols = readDir(spark,
          Paths.get(tablePath, anyDir).toString)
        .columns.filterNot(_ == BucketCol)
      val clash = (physicalCols ++ manifest.colmap.keys ++ manifest.dropped)
        .exists(c => c.equalsIgnoreCase(newName) && !c.equalsIgnoreCase(physical))
      require(!clash,
        s"renameColumn: '$newName' is still a PHYSICAL column name in the " +
        "table's files — renames never rewrite data, so physical names are " +
        "reserved forever (a rebucket materializes the mapping and frees them)")
      val newMap =
        if (physical.equalsIgnoreCase(newName)) manifest.colmap - physical
        else manifest.colmap - physical + (physical -> newName)
      refreshLease(tablePath, leaseId)
      val committed = commitManifest(tablePath, manifest.copy(colmap = newMap))
      sweepVersions(tablePath, committed, retainVersions)
    }
  }

  /** DROP a column WITHOUT rewriting data — the other half of column
    * mapping (Delta `ALTER TABLE DROP COLUMN` under column-mapping
    * mode): on a 100 TB table a drop is ONE manifest swap. The parquet
    * files keep the bytes forever; every read path filters the column
    * out ([[logicalize]]), so live reads, stats-pruned reads, change
    * feeds and the streaming source all present the narrowed schema.
    * Snapshot reads TIME-TRAVEL the schema: a [[readTableAt]] before
    * the drop still shows the column (each snapshot carries its own
    * dropped set). The physical name stays RESERVED — re-adding a
    * same-named column via schema evolution is rejected loudly (the
    * old bytes would resurrect under it on mergeSchema reads) — until
    * a [[rebucket]] materializes the narrow schema and frees it.
    * Merge keys and declared cluster columns cannot drop. `name` is
    * the current LOGICAL name. */
  def dropColumn(spark: SparkSession, tablePath: String, name: String,
                 retainVersions: Int = DefaultRetainVersions): Unit = {
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"dropColumn: $tablePath has no manifest (not a committed bucketed table)")
    withLock(tablePath) { leaseId =>
      val manifest = readManifest(tablePath).get
      val anyDir = manifest.dirs.toSeq.sortBy(_._1).headOption.map(_._2)
        .getOrElse(throw new IllegalStateException(
          s"dropColumn: $tablePath has no live buckets"))
      val logicalCols = logicalize(
        readDir(spark, Paths.get(tablePath, anyDir).toString), manifest)
        .columns.filterNot(_ == BucketCol).toSeq
      require(logicalCols.exists(_.equalsIgnoreCase(name)),
        s"dropColumn: no column '$name' (have: ${logicalCols.mkString(",")})")
      val physical = physicalOf(manifest, name)
      require(!manifest.keys.exists(_.equalsIgnoreCase(physical)),
        s"dropColumn: '$name' is a merge key — keys are fixed at create " +
        "time (a rebucket with new keys is the migration path)")
      require(!manifest.clusterCols.exists(_.equalsIgnoreCase(name)),
        s"dropColumn: '$name' is a declared cluster column — change the " +
        "cluster spec (recluster) before dropping it")
      require(logicalCols.size > 1,
        s"dropColumn: '$name' is the table's only column")
      refreshLease(tablePath, leaseId)
      val committed = commitManifest(tablePath, manifest.copy(
        dropped = manifest.dropped + physical,
        colmap = manifest.colmap - physical))
      sweepVersions(tablePath, committed, retainVersions)
    }
  }

  /** SOFT DELETE — deletion-vector parity (Delta DVs): logically
    * delete every row matching `predicate` by appending its merge keys
    * to the table's tombstone file, WITHOUT rewriting a single bucket.
    * [[delete]] pays a rewrite of every matched bucket; on a 100 TB
    * table a 100-row compliance delete would rewrite multi-GB buckets
    * for 100 rows — here the write is O(matched keys) + one manifest
    * swap. Readers ([[readTable]]/[[readTableWhere]]/[[readTableAt]]/
    * [[readChanges]]) anti-join the broadcast-sized dv; an upsert of a
    * tombstoned key CLEARS its tombstone (reinsert lives);
    * [[materializeDeletes]] folds the dv into the buckets when it
    * grows. The probe is stats-pruned like [[delete]]'s, and already-
    * tombstoned rows never re-match (no double-count). Returns rows
    * newly tombstoned. */
  def deleteSoft(spark: SparkSession, tablePath: String, keys: Seq[String],
                 predicate: Column,
                 retainVersions: Int = DefaultRetainVersions,
                 batchId: String = ""): Long = {
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"deleteSoft: $tablePath has no manifest (legacy tables migrate via upsert first)")
    withLock(tablePath) { leaseId =>
      val manifest = readManifest(tablePath).get
      val pkeys = keys.map(physicalOf(manifest, _))
      requireSameKeys(tablePath, manifest, pkeys)
      sweepVersions(tablePath, manifest, retainVersions)
      // readTableWhere = stats-pruned scan, already dv-filtered; its
      // rows are LOGICAL — the dv stores PHYSICAL key names
      val matches = physicalize(
          readTableWhere(spark, tablePath, predicate)
            .select(keys.map(col): _*).distinct(), manifest)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = matches.count()
        if (n == 0L) 0L
        else {
          val newDv = dvFrame(spark, tablePath, manifest) match {
            case Some(dv) => dv.select(pkeys.map(col): _*)
              .unionByName(matches).distinct()
            case None => matches
          }
          val rel = writeDvDir(spark, tablePath, manifest, newDv)
          failpoint("before-manifest")
          refreshLease(tablePath, leaseId)
          val committed = commitManifest(tablePath, manifest.copy(dv = rel,
            keys = pkeys,
            batch = if (batchId.nonEmpty) batchId else manifest.batch))
          failpoint("after-manifest")
          sweepVersions(tablePath, committed, retainVersions)
          n
        }
      } finally matches.unpersist(blocking = false)
    }
  }

  /** Keyed soft delete: tombstone exactly the keys in `keyFrame` —
    * the CDC-APPLY primitive (a change feed names deleted KEYS, not a
    * predicate). Unlike collecting keys into an `isin` literal, the
    * frame stays distributed: one semi-join against the table bounds
    * the dv to keys that actually live (stats/bucket pruning applies),
    * then the usual dv append + manifest swap — O(delta) end to end,
    * no driver materialization at any delete-set size. */
  def deleteSoftKeys(spark: SparkSession, tablePath: String, keys: Seq[String],
                     keyFrame: DataFrame,
                     retainVersions: Int = DefaultRetainVersions,
                     batchId: String = ""): Long = {
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"deleteSoftKeys: $tablePath has no manifest (legacy tables migrate via upsert first)")
    withLock(tablePath) { leaseId =>
      val manifest = readManifest(tablePath).get
      val pkeys = keys.map(physicalOf(manifest, _))
      requireSameKeys(tablePath, manifest, pkeys)
      sweepVersions(tablePath, manifest, retainVersions)
      // live keys only: tombstoning a key no bucket holds would bloat
      // the dv with dead weight every reader anti-joins against
      val matches = physicalize(
          readTable(spark, tablePath).select(keys.map(col): _*)
            .join(keyFrame.select(keys.map(col): _*).distinct(), keys, "left_semi"),
          manifest)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = matches.count()
        if (n == 0L) 0L
        else {
          val newDv = dvFrame(spark, tablePath, manifest) match {
            case Some(dv) => dv.select(pkeys.map(col): _*)
              .unionByName(matches).distinct()
            case None => matches
          }
          val rel = writeDvDir(spark, tablePath, manifest, newDv)
          refreshLease(tablePath, leaseId)
          val committed = commitManifest(tablePath, manifest.copy(dv = rel,
            keys = pkeys,
            batch = if (batchId.nonEmpty) batchId else manifest.batch))
          sweepVersions(tablePath, committed, retainVersions)
          n
        }
      } finally matches.unpersist(blocking = false)
    }
  }

  /** Fold the deletion vector into the data: rewrite ONLY the buckets
    * holding tombstoned keys (a dv-sized bucket set — the key hash
    * names them without scanning), drop those rows physically, clear
    * the dv. Content is invariant (DvSpec pins it); this is the
    * maintenance step that keeps the read-side anti-join bounded as
    * soft deletes accumulate. Returns buckets rewritten. */
  def materializeDeletes(spark: SparkSession, tablePath: String,
                         retainVersions: Int = DefaultRetainVersions): Int = {
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"materializeDeletes: $tablePath has no manifest")
    withLock(tablePath) { leaseId =>
      val manifest = readManifest(tablePath).get
      sweepVersions(tablePath, manifest, retainVersions)
      dvFrame(spark, tablePath, manifest) match {
        case None => 0
        case Some(dv) =>
          val nb = manifest.numBuckets
          val keys = manifest.keys
          val touched = withBucket(dv, keys, nb)
            .select(col(BucketCol)).distinct()
            .collect().map(_.getInt(0)).toSeq
            .filter(manifest.dirs.contains).sorted
          if (touched.isEmpty) {
            // tombstones for keys no bucket holds: just clear the dv
            refreshLease(tablePath, leaseId)
            commitManifest(tablePath, manifest.copy(dv = ""))
            0
          } else {
            val liveTouched = touched.map(b =>
              Paths.get(tablePath, manifest.dirs(b)).toString)
            val kept = applyDv(spark, tablePath, manifest,
              withBucket(mergedRead(spark, manifest, liveTouched), keys, nb))
            val tmp = tablePath + ".tmp"
            stageWrite(kept, tmp)
            val tracked = (keys ++ manifest.stats.values.flatMap(_.keySet)).distinct
            val newStats = bucketStats(spark, tmp, tracked)
            val newVersions = adoptBucketDirs(tablePath, tmp,
              b => nextVersion(tablePath, manifest, b))
            val emptied = touched.filterNot(newVersions.contains)
            failpoint("before-manifest")
            refreshLease(tablePath, leaseId)
            val committed = commitManifest(tablePath, manifest.copy(
              dirs = manifest.dirs -- emptied ++ newVersions,
              stats = manifest.stats -- touched ++ newStats, dv = ""))
            failpoint("after-manifest")
            sweepVersions(tablePath, committed, retainVersions)
            deleteRecursively(Paths.get(tmp))
            touched.size
          }
      }
    }
  }

  /** Delta `UPDATE ... SET` parity: apply `set` expressions to every
    * row matching `predicate`, rewriting ONLY the buckets that hold
    * matching rows (the [[delete]] probe — stats-pruned the same way).
    * SQL NULL semantics: a NULL predicate leaves the row unchanged.
    * Merge keys cannot be SET (a key change moves a row across
    * buckets — that is a delete + insert, i.e. an upsert, by
    * construction). Same commit protocol; the change feed sees the
    * rewritten rows as updates with preimages. Returns rows updated. */
  def update(spark: SparkSession, tablePath: String, keys: Seq[String],
             predicate: org.apache.spark.sql.Column,
             set: Map[String, org.apache.spark.sql.Column],
             retainVersions: Int = DefaultRetainVersions): Long = {
    require(set.nonEmpty, "update needs at least one SET column")
    val clash = set.keySet.map(_.toLowerCase)
      .intersect(keys.map(_.toLowerCase).toSet)
    require(clash.isEmpty,
      s"update cannot SET merge key(s) ${clash.mkString(",")} — " +
      "a key change is a delete + insert (use upsert)")
    val aset = alignSetTypes(spark, tablePath, set, "update")
    enforceUpdatePostImage(spark, tablePath, predicate, aset, "update")
    rewriteWhere(spark, tablePath, keys, predicate, retainVersions, "update",
      (live, pred) => aset.foldLeft(live) { case (df, (c, v)) =>
        df.withColumn(c, when(coalesce(pred, lit(false)), v).otherwise(col(c)))
      })
  }

  /** SET type alignment: an UPDATE whose SET expression silently
    * changes a column's TYPE would write mixed-typed files into
    * rewritten buckets that the reader then cannot merge with
    * untouched ones (CANNOT_MERGE_SCHEMAS — a corrupted-table face,
    * found the hard way). SQL store-assignment semantics apply
    * instead: a value whose type UP-casts losslessly to the column's
    * type (int literal into a bigint column — `Cast.canUpCast`) is
    * cast implicitly; anything lossy (long→int, double→long,
    * string→numeric) is rejected loudly BEFORE any rewrite — an
    * explicit cast or a widening upsert is the supported spelling.
    * Schema-only (`limit(0)` + analysis) — no Spark job. */
  private def alignSetTypes(spark: SparkSession, tablePath: String,
      set: Map[String, org.apache.spark.sql.Column],
      op: String): Map[String, org.apache.spark.sql.Column] = {
    val live = readTable(spark, tablePath)
    val post = set.foldLeft(live.limit(0)) { case (df, (c, v)) =>
      df.withColumn(c, v) }
    set.map { case (c, v) =>
      val from = post.schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType)
      val to = live.schema.fields.find(_.name.equalsIgnoreCase(c)).map(_.dataType)
      (from, to) match {
        case (Some(f), Some(t)) if f == t => c -> v
        case (Some(f), Some(t))
            if org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(f, t) =>
          c -> v.cast(t) // store assignment: widen the VALUE to the column
        case (Some(f), Some(t)) => throw new IllegalArgumentException(
          s"$op: SET changes column '$c' from ${t.sql} to ${f.sql} — cast " +
          s"the expression back to ${t.sql}, or widen the column via an " +
          "upsert (int→long / float→double)")
        case _ => c -> v // new/unmatched column: downstream resolution is loud
      }
    }
  }

  /** UPDATE-family constraint pre-check: the POST-image of the
    * matched rows must satisfy the table's CHECK constraints BEFORE
    * any bucket rewrites (one pruned read of the matched rows —
    * delta-sized for selective predicates; nothing at all without
    * constraints). */
  private def enforceUpdatePostImage(spark: SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column], op: String): Unit =
    readManifest(tablePath).filter(_.constraints.nonEmpty).foreach { m =>
      val matched = readTableWhere(spark, tablePath, predicate)
        .filter(coalesce(predicate, lit(false)))
      val post = set.foldLeft(matched) { case (df, (c, v)) =>
        df.withColumn(c, v) }
      enforceConstraints(spark, tablePath, m, post, op)
    }

  /** OPTIMISTIC [[delete]] — the footprint-rebase protocol extended
    * from [[upsertConcurrent]] to predicate rewrites: probe + rewrite
    * + stage run UNLOCKED against the snapshot manifest; the short
    * locked commit walks intervening footprints and REBASES when they
    * are bucket-disjoint (a long predicate delete lands beside a
    * concurrent ingest to other buckets — both commit), conflicts
    * loudly on overlap. Returns rows deleted. */
  def deleteConcurrent(spark: SparkSession, tablePath: String,
                       keys: Seq[String],
                       predicate: org.apache.spark.sql.Column,
                       retainVersions: Int = DefaultRetainVersions,
                       lockWaitMillis: Long = 60000L): Long =
    rewriteWhereOptimistic(spark, tablePath, keys, predicate, retainVersions,
      "deleteConcurrent", lockWaitMillis,
      (live, pred) => live.filter(!coalesce(pred, lit(false))))

  /** OPTIMISTIC [[update]] — same protocol as [[deleteConcurrent]].
    * Returns rows updated. */
  def updateConcurrent(spark: SparkSession, tablePath: String,
                       keys: Seq[String],
                       predicate: org.apache.spark.sql.Column,
                       set: Map[String, org.apache.spark.sql.Column],
                       retainVersions: Int = DefaultRetainVersions,
                       lockWaitMillis: Long = 60000L): Long = {
    require(set.nonEmpty, "update needs at least one SET column")
    val clash = set.keySet.map(_.toLowerCase)
      .intersect(keys.map(_.toLowerCase).toSet)
    require(clash.isEmpty,
      s"update cannot SET merge key(s) ${clash.mkString(",")} — " +
      "a key change is a delete + insert (use upsert)")
    val aset = alignSetTypes(spark, tablePath, set, "updateConcurrent")
    enforceUpdatePostImage(spark, tablePath, predicate, aset, "updateConcurrent")
    rewriteWhereOptimistic(spark, tablePath, keys, predicate, retainVersions,
      "updateConcurrent", lockWaitMillis,
      (live, pred) => aset.foldLeft(live) { case (df, (c, v)) =>
        df.withColumn(c, when(coalesce(pred, lit(false)), v).otherwise(col(c)))
      })
  }

  /** OPTIMISTIC [[applyCdc]] — a CDC batch (upserts + deletes) staged
    * unlocked against the snapshot, committed with the footprint
    * rebase. The dv is pruned against the LIVE manifest inside the
    * lock (reinsert safety holds across the rebase; the metadata
    * check already proved the dv unchanged since the snapshot). */
  def applyCdcConcurrent(spark: SparkSession, tablePath: String,
                         source: DataFrame, keys0: Seq[String],
                         opCol: String = "_op",
                         retainVersions: Int = DefaultRetainVersions,
                         batchId: String = "",
                         lockWaitMillis: Long = 60000L): Unit = {
    require(source.columns.contains(opCol),
      s"applyCdc: source must carry the operation column '$opCol'")
    val m0 = readManifest(tablePath).getOrElse(throw new IllegalStateException(
      s"applyCdcConcurrent: $tablePath has no manifest — create the table " +
      "with upsert first"))
    enforceConstraints(spark, tablePath, m0,
      source.filter(col(opCol) =!= "delete").drop(opCol), "applyCdcConcurrent")
    val nb = m0.numBuckets
    val pkeys = keys0.map(physicalOf(m0, _))
    val psource = physicalize(source, m0)
    requireSameKeys(tablePath, m0, pkeys)
    val bucketed = withBucket(psource, pkeys, nb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val probe = bucketed
        .groupBy(col(BucketCol) +: pkeys.map(col): _*)
        .agg(count(lit(1)).as("__c"),
          max(when(col(opCol) === "delete", 0).otherwise(1)).as("__up"))
        .groupBy(col(BucketCol)).agg(max(col("__c")).as("__maxc"),
          max(col("__up")).as("__hasup"))
        .collect()
      if (probe.exists(_.getLong(1) > 1))
        throw new IllegalArgumentException(
          "merge aborted: a key appears in more than one source row " +
          s"(incl. delete+upsert of the same key) for keys ${keys0.mkString(",")}")
      val touched: Set[Int] = probe.map(_.getInt(0)).toSet
      if (touched.isEmpty) return
      val mustWrite = probe.filter(_.getInt(2) == 1).map(_.getInt(0)).toSet
      // ---- UNLOCKED work phase against the snapshot ----
      val liveTouched = touched.toSeq.sorted.flatMap(b => m0.dirs.get(b))
        .map(d => Paths.get(tablePath, d).toString)
      val upserts = bucketed.filter(col(opCol) =!= "delete")
      val targetOpt =
        if (liveTouched.isEmpty) None
        else Some(withBucket(mergedRead(spark, m0, liveTouched), pkeys, nb))
      val widenedNew = targetOpt
        .map(t => widenedBy(t.schema, upserts.schema, pkeys))
        .getOrElse(Map.empty[String, String])
      val merged = targetOpt match {
        case None => upserts.drop(opCol)
        case Some(target) =>
          target.join(bucketed, pkeys, "left_anti")
            .unionByName(alignForUnion(upserts, target, m0.dropped))
      }
      val tmp = tablePath + ".tmp-" +
        java.util.UUID.randomUUID().toString.substring(0, 8)
      stageWrite(merged, tmp)
      mustWrite.foreach { b =>
        if (!Files.exists(Paths.get(tmp, s"$BucketCol=$b")))
          throw new IllegalStateException(
            s"bucket dir missing from merge output: $tmp/$BucketCol=$b")
      }
      val emptied = touched.filterNot(b =>
        Files.exists(Paths.get(tmp, s"$BucketCol=$b")))
      val newStats = bucketStats(spark, tmp, pkeys)
      failpoint("optimistic-staged")
      // ---- LOCKED commit: footprint rebase, adopt, swap ----
      try {
        withLockWait(tablePath, lockWaitMillis) { leaseId =>
          val m1 = readManifest(tablePath).getOrElse(throw new IllegalStateException(
            s"applyCdcConcurrent: $tablePath manifest vanished mid-commit"))
          checkFootprints(tablePath, m0, m1, touched, "applyCdcConcurrent")
          val base = readManifest(tablePath).get
          val newVersions = adoptBucketDirs(tablePath, tmp,
            b => nextVersion(tablePath, base, b))
          val dvRel = pruneDv(spark, tablePath, base, pkeys,
            bucketed.select(pkeys.map(col): _*))
          // all-buckets-emptied CDC: keep the table schema-readable
          // (same posture as the locked applyCdc / rewrite engines)
          val dirs1 = base.dirs -- emptied ++ newVersions
          val finalDirs =
            if (dirs1.nonEmpty) dirs1
            else Map(stageEmptyBucket(tablePath, merged, touched.head,
              nextVersion(tablePath, base, touched.head)))
          failpoint("before-manifest")
          refreshLease(tablePath, leaseId)
          val committed = commitManifest(tablePath, base.copy(
            dirs = finalDirs,
            stats = base.stats -- touched ++ newStats, keys = pkeys,
            dv = dvRel,
            widened = base.widened ++ widenedNew,
            batch = if (batchId.nonEmpty) batchId else base.batch))
          failpoint("after-manifest")
          sweepVersions(tablePath, committed, retainVersions)
        }
      } finally deleteRecursively(Paths.get(tmp))
    } finally bucketed.unpersist(blocking = false)
  }

  /** The optimistic twin of [[rewriteWhere]]: candidate pruning,
    * probe, rewrite and staging all run UNLOCKED against the snapshot
    * manifest (retention keeps the snapshot's files readable under a
    * concurrent writer); the locked phase is [[checkFootprints]] +
    * dir adoption + manifest swap. Anything the footprint chain
    * cannot prove disjoint conflicts loudly — including a concurrent
    * rewrite of the same buckets, which the pessimistic path would
    * have serialized. */
  private def rewriteWhereOptimistic(spark: SparkSession, tablePath: String,
      keys: Seq[String], predicate: org.apache.spark.sql.Column,
      retainVersions: Int, opName: String, lockWaitMillis: Long,
      rewrite: (DataFrame, org.apache.spark.sql.Column) => DataFrame): Long = {
    val m0 = readManifest(tablePath).getOrElse(throw new IllegalStateException(
      s"$opName: $tablePath has no manifest (legacy tables migrate via upsert first)"))
    val nb = m0.numBuckets
    val pkeys = keys.map(physicalOf(m0, _))
    requireSameKeys(tablePath, m0, pkeys)
    val pm = m0.copy(keys = pkeys)
    // ---- UNLOCKED: prune, probe, rewrite, stage (snapshot m0) ----
    val candB = if (m0.dirs.isEmpty) Nil else {
      val anyDir = Paths.get(tablePath, m0.dirs.toSeq.minBy(_._1)._2).toString
      val raw = readDir(spark, anyDir)
      val probeDf = logicalize(raw, m0)
      resolvedPredicate(probeDf, predicate) match {
        case None => m0.dirs.keys.toSeq.sorted
        case Some(pred) =>
          val hb = equalityBucket(spark, pred, pm, raw.schema)
          m0.dirs.keys.toSeq.sorted.filter { b =>
            hb.forall(_.contains(b)) && canMatch(m0.stats.getOrElse(b, Map.empty), pred)
          }
      }
    }
    lastPrune = (candB.size, m0.dirs.size)
    if (candB.isEmpty) return 0L
    val candDirs = candB.flatMap(b => m0.dirs.get(b))
      .map(d => Paths.get(tablePath, d).toString)
    val candRead = mergedRead(spark, m0, candDirs)
    val tagged = logicalize(applyDv(spark, tablePath, pm,
      withBucket(
        if (candRead.columns.contains(BucketCol)) candRead.drop(BucketCol) else candRead,
        pkeys, nb)), m0)
    val probe = tagged.filter(predicate)
      .groupBy(col(BucketCol)).agg(count(lit(1)).as("__n"))
      .collect()
    if (probe.isEmpty) return 0L
    val touched = probe.map(_.getInt(0)).toSeq.sorted
    val nMatched = probe.map(_.getLong(1)).sum
    val liveTouched = touched.flatMap(b => m0.dirs.get(b))
      .map(d => Paths.get(tablePath, d).toString)
    val kept = rewrite(logicalize(
        applyDv(spark, tablePath, pm,
          withBucket(mergedRead(spark, m0, liveTouched), pkeys, nb)),
        m0),
      predicate)
    val tmp = tablePath + ".tmp-" +
      java.util.UUID.randomUUID().toString.substring(0, 8)
    stageWrite(physicalize(kept, m0), tmp)
    val tracked = (pkeys ++ m0.stats.values.flatMap(_.keySet)).distinct
    val newStats = bucketStats(spark, tmp, tracked)
    failpoint("optimistic-staged")
    // ---- LOCKED commit: footprint rebase, adopt, swap ----
    try {
      withLockWait(tablePath, lockWaitMillis) { leaseId =>
        val m1 = readManifest(tablePath).getOrElse(throw new IllegalStateException(
          s"$opName: $tablePath manifest vanished mid-commit"))
        checkFootprints(tablePath, m0, m1, touched.toSet, opName)
        val base = readManifest(tablePath).get
        val newVersions = adoptBucketDirs(tablePath, tmp,
          b => nextVersion(tablePath, base, b))
        val emptied = touched.filterNot(newVersions.contains)
        val dirs1 = base.dirs -- emptied ++ newVersions
        val finalDirs =
          if (dirs1.nonEmpty) dirs1
          else Map(stageEmptyBucket(tablePath,
            physicalize(kept, m0), touched.head,
            nextVersion(tablePath, base, touched.head)))
        failpoint("before-manifest")
        refreshLease(tablePath, leaseId)
        val committed = commitManifest(tablePath,
          base.copy(dirs = finalDirs,
            stats = base.stats -- touched ++ newStats, keys = pkeys))
        failpoint("after-manifest")
        sweepVersions(tablePath, committed, retainVersions)
      }
    } finally deleteRecursively(Paths.get(tmp))
    nMatched
  }

  /** Shared bucket-rewrite engine under [[delete]] and [[update]]:
    * stats-pruned candidate probe, matched-bucket rewrite via
    * `rewrite(liveRows, predicate)`, standard commit. Returns the
    * matched-row count (0 = no commit at all). */
  private def rewriteWhere(spark: SparkSession, tablePath: String,
      keys: Seq[String], predicate: org.apache.spark.sql.Column,
      retainVersions: Int, opName: String,
      rewrite: (DataFrame, org.apache.spark.sql.Column) => DataFrame): Long = {
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"$opName: $tablePath has no manifest (legacy tables migrate via upsert first)")
    withLock(tablePath) { leaseId =>
      val manifest = readManifest(tablePath).get
      val nb = manifest.numBuckets
      val pkeys = keys.map(physicalOf(manifest, _))
      requireSameKeys(tablePath, manifest, pkeys)
      sweepVersions(tablePath, manifest, retainVersions)
      // DATA SKIPPING on the probe: only buckets the predicate can
      // match are scanned at all — a key-equality delete probes ONE
      // bucket (hash pruning), a range delete on a tracked stats
      // column probes only buckets whose [min,max] overlaps. The
      // general-predicate fallback is the old full probe. The
      // predicate speaks LOGICAL names; the logicalized probe frame
      // resolves it and filter pushdown rewrites the attributes to
      // physical names (readTableWhere's rule), so the pruning math
      // runs against the physical manifest/schema.
      val pm = manifest.copy(keys = pkeys)
      val candB = if (manifest.dirs.isEmpty) Nil else {
        val anyDir = Paths.get(tablePath, manifest.dirs.toSeq.minBy(_._1)._2).toString
        val raw = readDir(spark, anyDir)
        val probeDf = logicalize(raw, manifest)
        resolvedPredicate(probeDf, predicate) match {
          case None => manifest.dirs.keys.toSeq.sorted // unextractable: no pruning
          case Some(pred) =>
            val hb = equalityBucket(spark, pred, pm, raw.schema)
            manifest.dirs.keys.toSeq.sorted.filter { b =>
              hb.forall(_.contains(b)) && canMatch(manifest.stats.getOrElse(b, Map.empty), pred)
            }
        }
      }
      lastPrune = (candB.size, manifest.dirs.size)
      if (candB.isEmpty) 0L
      else {
        val candDirs = candB.flatMap(b => manifest.dirs.get(b))
          .map(d => Paths.get(tablePath, d).toString)
        val candRead = mergedRead(spark, manifest, candDirs)
        // soft-deleted rows are not visible to DELETE/UPDATE: they
        // neither count as matched nor get rewritten back to life.
        // dv applies on the PHYSICAL frame, then the logical view is
        // what the predicate and the rewrite callback see.
        val tagged = logicalize(applyDv(spark, tablePath, manifest.copy(keys = pkeys),
          withBucket(
            if (candRead.columns.contains(BucketCol)) candRead.drop(BucketCol) else candRead,
            pkeys, nb)), manifest)
        val probe = tagged.filter(predicate)
          .groupBy(col(BucketCol)).agg(count(lit(1)).as("__n"))
          .collect()
        if (probe.isEmpty) 0L
        else {
          val touched = probe.map(_.getInt(0)).toSeq.sorted
          val nMatched = probe.map(_.getLong(1)).sum
          val liveTouched = touched.flatMap(b => manifest.dirs.get(b))
            .map(d => Paths.get(tablePath, d).toString)
          // the rewrite input is dv-filtered too: a rewritten bucket
          // drops its soft-deleted rows physically (their dv entries
          // become harmless no-ops)
          val kept = rewrite(logicalize(
              applyDv(spark, tablePath, manifest.copy(keys = pkeys),
                withBucket(mergedRead(spark, manifest, liveTouched), pkeys, nb)),
              manifest),
            predicate)
          val tmp = tablePath + ".tmp"
          stageWrite(physicalize(kept, manifest), tmp)
          // rewritten rows move ranges; recompute over whatever the
          // table was already tracking so pruning stays tight
          val tracked = (pkeys ++ manifest.stats.values.flatMap(_.keySet)).distinct
          val newStats = bucketStats(spark, tmp, tracked)
          val newVersions = adoptBucketDirs(tablePath, tmp,
            b => nextVersion(tablePath, manifest, b))
          val emptied = touched.filterNot(newVersions.contains)
          val dirs1 = manifest.dirs -- emptied ++ newVersions
          val finalDirs =
            if (dirs1.nonEmpty) dirs1
            else Map(stageEmptyBucket(tablePath,
              physicalize(kept, manifest), touched.head,
              nextVersion(tablePath, manifest, touched.head)))
          failpoint("before-manifest")
          refreshLease(tablePath, leaseId)
          val committed = commitManifest(tablePath,
            manifest.copy(numBuckets = nb,
              dirs = finalDirs,
              stats = manifest.stats -- touched ++ newStats, keys = pkeys))
          failpoint("after-manifest")
          sweepVersions(tablePath, committed, retainVersions)
          deleteRecursively(Paths.get(tmp))
          nMatched
        }
      }
    }
  }

  /** Rewrite fragmented buckets (many small files — e.g. written under
    * `spark.sql.files.maxRecordsPerFile`, or by AQE skew-split) as
    * coalesced NEW versions through the exact same manifest-swap
    * commit: content-identical, crash-safe by the same protocol,
    * reader-isolated by the same retention. The operational tool an
    * append-heavy 100 TB deployment reaches for first — the stand-in
    * for Delta OPTIMIZE, minus Z-ordering. Returns the number of
    * buckets rewritten (0 = nothing fragmented; the commit is skipped
    * entirely, so compaction is idempotent and cheap to schedule).
    *
    * One Spark job regardless of bucket count: fragmented live dirs are
    * unioned with their bucket id re-attached as a literal, then the
    * standard repartition-by-bucket write lands each as ~one file. */
  def compact(spark: SparkSession, tablePath: String,
              retainVersions: Int = DefaultRetainVersions): Int = {
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"compact: $tablePath has no manifest (not a committed bucketed table)")
    withLock(tablePath) { leaseId => compactLocked(spark, tablePath, retainVersions, leaseId) }
  }

  private def compactLocked(spark: SparkSession, tablePath: String,
                            retainVersions: Int, leaseId: String): Int = {
    val manifest = readManifest(tablePath).get
    sweepVersions(tablePath, manifest, retainVersions)
    val frag = manifest.dirs.toSeq.sortBy(_._1).filter { case (_, d) =>
      graft.merge.FsList.list(Paths.get(tablePath, d)).iterator
        .count(_.getFileName.toString.endsWith(".parquet")) > 1
    }
    if (frag.isEmpty) 0
    else {
      val union = frag.map { case (b, d) =>
          readDir(spark, Paths.get(tablePath, d).toString)
            .withColumn(BucketCol, lit(b)) }
        .reduce(_.unionByName(_, allowMissingColumns = true))
      val tmp = tablePath + ".tmp"
      stageWrite(union, tmp)
      val newVersions = adoptBucketDirs(tablePath, tmp,
        b => versionOf(manifest.dirs(b)) + 1)
      failpoint("before-manifest")
      refreshLease(tablePath, leaseId)
      // compaction is content-identical: stats, keys and the batch
      // stamp carry through
      val committed = commitManifest(tablePath,
        manifest.copy(dirs = manifest.dirs ++ newVersions))
      failpoint("after-manifest")
      sweepVersions(tablePath, committed, retainVersions)
      deleteRecursively(Paths.get(tmp))
      frag.size
    }
  }

  /** Delta `RESTORE TABLE ... TO VERSION` parity: make the live state
    * the snapshot `commitsBack` commits back, committed as a NEW
    * commit — history only ever advances, so a restore is itself
    * restorable (and visible in the commit log), never a rewind of the
    * commit counter. ZERO data movement: the restored manifest simply
    * re-references the snapshot's still-retained bucket version dirs
    * (reachability GC keeps anything the live manifest names, however
    * old), so restoring a 100 TB table is one manifest swap, not a
    * copy. The change feed across the restore commit is the honest
    * reverse diff (rows the undone commits inserted surface as
    * `delete`, their updates as updates back to the old image) —
    * incremental consumers roll back like any other commit.
    * Restoring past the retention window fails loudly (the snapshot's
    * manifest or its dirs are gone); raise `retainVersions` on the
    * table's writers to keep a deeper undo horizon.
    * Returns the new live commit number. */
  /** Metadata-only probe that the snapshot `commitsBack` commits ago
    * is still FULLY readable: its history manifest is retained and
    * every bucket dir it references is unswept. `None` = readable;
    * `Some(reason)` = the loud explanation. The partitioned parent's
    * restore validates every child pin through this BEFORE committing
    * anything (all-or-nothing: a half-validated restore never swaps). */
  private[graft] def snapshotReadable(tablePath: String,
                                      commitsBack: Int): Option[String] =
    readManifest(tablePath) match {
      case None => Some(s"$tablePath has no manifest")
      case Some(_) if commitsBack == 0 => None
      case Some(live) =>
        val target = live.commit - commitsBack
        val hp = Paths.get(tablePath, HistoryDir, target.toString)
        if (target < 1 || !Files.exists(hp))
          Some(s"snapshot $target of $tablePath predates the table or " +
            "was vacuumed")
        else {
          val missing = parseManifest(hp).dirs.values
            .filterNot(d => Files.exists(Paths.get(tablePath, d)))
          if (missing.nonEmpty)
            Some(s"snapshot $target of $tablePath references swept " +
              s"bucket dir(s) ${missing.mkString(",")}")
          else None
        }
    }

  def restore(tablePath: String, commitsBack: Int,
              retainVersions: Int = DefaultRetainVersions,
              batchId: String = ""): Int = {
    require(commitsBack >= 1, s"restore needs commitsBack >= 1, got $commitsBack")
    if (readManifest(tablePath).isEmpty) throw new IllegalStateException(
      s"restore: $tablePath has no manifest (not a committed bucketed table)")
    withLock(tablePath) { leaseId =>
      val live = readManifest(tablePath).get
      val target = live.commit - commitsBack
      val hp = Paths.get(tablePath, HistoryDir, target.toString)
      if (target < 1 || !Files.exists(hp))
        throw new IllegalStateException(
          s"no snapshot $commitsBack commits back of $tablePath (live commit " +
          s"${live.commit}); it predates the table or was vacuumed — raise " +
          "retainVersions to keep a deeper restore horizon")
      val m = parseManifest(hp)
      val missing = m.dirs.values.filterNot(d => Files.exists(Paths.get(tablePath, d)))
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"restore: snapshot $target of $tablePath references swept bucket " +
          s"dir(s) ${missing.mkString(",")} — vacuumed past the restore point")
      failpoint("before-manifest")
      refreshLease(tablePath, leaseId)
      val committed = commitManifest(tablePath, m.copy(
        batch = if (batchId.nonEmpty) batchId else s"restore-to-commit-$target"))
      failpoint("after-manifest")
      sweepVersions(tablePath, committed, retainVersions)
      committed.commit
    }
  }

  /** SHALLOW CLONE — Delta `CREATE TABLE ... SHALLOW CLONE` parity:
    * a new independent table at `dstPath` whose first commit references
    * the source's CURRENT bucket version dirs by symlink — O(buckets)
    * metadata, ZERO data copied, however large the source. The clone
    * carries the source's keys/stats/cluster state, so data skipping
    * and key-pruned lookups work immediately.
    *
    * DIVERGENCE IS COPY-ON-WRITE: a later upsert/delete on the clone
    * rewrites only the buckets it touches into clone-local version
    * dirs (version numbering continues past the linked names, so no
    * collision) and the clone's GC deletes at most the SYMLINK entries
    * it owns — `deleteRecursively` never follows links, so the
    * source's files are untouchable from the clone. Writes on the
    * SOURCE are equally invisible to the clone (its manifest pins the
    * cloned versions).
    *
    * Retention caveat (same as Delta's): the clone's references are
    * invisible to the source's reachability GC — a source `vacuum` or
    * rewrite that sweeps a still-referenced version dir breaks the
    * clone's read of that bucket. Clones share the source's retention
    * discipline, they don't extend it.
    *
    * Returns the clone's first commit number (always 1). */
  /** The source manifest `commitsBack` commits ago (0 = live) — the
    * clone-at-snapshot resolution shared by both clone flavors; loud
    * when the snapshot was vacuumed. The partitioned parent clones
    * each child AT ITS PIN through this (a crash can leave a child
    * ahead of the parent's pin; cloning child-live would leak the
    * unreferenced residue into the clone). */
  private def manifestBack(tablePath: String, commitsBack: Int,
                           op: String): Manifest = {
    val live = readManifest(tablePath).getOrElse(throw new IllegalStateException(
      s"$op: $tablePath has no manifest (not a committed bucketed table)"))
    if (commitsBack == 0) live
    else {
      val target = live.commit - commitsBack
      val hp = Paths.get(tablePath, HistoryDir, target.toString)
      if (target < 1 || !Files.exists(hp)) throw new IllegalStateException(
        s"$op: no snapshot $commitsBack commits back of $tablePath " +
        s"(live commit ${live.commit}); it predates the table or was vacuumed")
      parseManifest(hp)
    }
  }

  def cloneShallow(srcPath: String, dstPath: String,
                   batchId: String = "", commitsBack: Int = 0): Int = {
    val src = manifestBack(srcPath, commitsBack, "cloneShallow")
    if (readManifest(dstPath).isDefined) throw new IllegalStateException(
      s"cloneShallow: $dstPath is already a committed table")
    Files.createDirectories(Paths.get(dstPath, "data"))
    withLock(dstPath) { _ =>
      val linked = src.dirs.values.toSeq ++
        (if (src.dv.nonEmpty) Seq(src.dv) else Nil)
      linked.foreach { d =>
        val link = Paths.get(dstPath, d)
        Files.createDirectories(link.getParent)
        if (!Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
          Files.createSymbolicLink(link,
            Paths.get(srcPath, d).toAbsolutePath.normalize)
      }
      // We do NOT hold the source's lock, so a concurrent source commit
      // + retention sweep can GC a referenced version dir between the
      // manifest read and the links landing (createSymbolicLink succeeds
      // on a missing target). Verify every link RESOLVES before the
      // clone manifest commits — fail loudly now rather than dangle
      // until read time.
      linked.foreach { d =>
        val link = Paths.get(dstPath, d)
        if (!Files.exists(link)) // follows the link: target must exist
          throw new IllegalStateException(
            s"cloneShallow: source version dir '$d' was garbage-collected " +
            s"under us (concurrent commit + sweep on $srcPath) — retry")
      }
      val committed = commitManifest(dstPath, src.copy(
        batch = if (batchId.nonEmpty) batchId else s"clone@${src.commit}"))
      committed.commit
    }
  }

  /** DEEP clone: an INDEPENDENT physical copy of the source's live
    * state (Delta `CLONE` without `SHALLOW`) — the backup/migration
    * face of [[cloneShallow]]. Every live version dir (and the live
    * deletion vector) is byte-copied, so the clone survives any
    * source vacuum and the two tables share no storage. Stats, keys,
    * colmap, cluster state all carry over (the copy is bit-identical
    * files), history does NOT — a backup starts its own commit line.
    * Cost is O(live table bytes) — at 100 TB run it as the rare
    * deliberate migration it is; incremental sync is the change-feed
    * consumer's job ([[graft.streaming.ChangeStream]]). The
    * GC-race posture mirrors [[cloneShallow]]: copy, then verify the
    * SOURCE manifest did not advance past the copied dirs before the
    * clone manifest commits. */
  def cloneDeep(srcPath: String, dstPath: String,
                batchId: String = "", commitsBack: Int = 0): Int = {
    val src = manifestBack(srcPath, commitsBack, "cloneDeep")
    if (readManifest(dstPath).isDefined) throw new IllegalStateException(
      s"cloneDeep: $dstPath is already a committed table")
    Files.createDirectories(Paths.get(dstPath, "data"))
    withLock(dstPath) { _ =>
      val entries = src.dirs.values.toSeq ++
        (if (src.dv.nonEmpty) Seq(src.dv) else Nil)
      entries.foreach { d =>
        copyRecursively(Paths.get(srcPath, d), Paths.get(dstPath, d))
      }
      // a concurrent source commit + sweep can GC a dir mid-copy,
      // leaving a partial copy; verify every copied dir still exists
      // at the source (the sweep deletes the WHOLE dir, so a missing
      // source dir means our copy may be incomplete)
      entries.foreach { d =>
        if (!Files.isDirectory(Paths.get(srcPath, d)))
          throw new IllegalStateException(
            s"cloneDeep: source version dir '$d' was garbage-collected " +
            s"mid-copy (concurrent commit + sweep on $srcPath) — retry")
      }
      val committed = commitManifest(dstPath, src.copy(
        batch = if (batchId.nonEmpty) batchId else s"deepclone@${src.commit}"))
      committed.commit
    }
  }

  private def copyRecursively(from: Path, to: Path): Unit = {
    if (Files.isDirectory(from, java.nio.file.LinkOption.NOFOLLOW_LINKS) ||
        // a shallow-clone SOURCE may itself hold symlinked dirs: deep
        // copy resolves through them (the clone must be independent)
        Files.isDirectory(from)) {
      Files.createDirectories(to)
      graft.merge.FsList.list(from).foreach { p =>
        copyRecursively(p, to.resolve(p.getFileName.toString))
      }
    } else
      Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
  }

  /** COMMIT HISTORY — `DESCRIBE HISTORY` parity: one row per RETAINED
    * commit (the audit/debug surface; how far back it reaches follows
    * the table's `retainVersions` — history manifests age out with
    * their bucket versions, so the log never points at unreadable
    * state). Columns: commit number, the stamped batch id (pipeline
    * provenance), bucket count, live-bucket count. Metadata-only: an
    * O(retained-commits) driver read of the history manifests, no data
    * touched. */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    val live = readManifest(tablePath).getOrElse(throw new IllegalStateException(
      s"history: $tablePath has no manifest (not a committed bucketed table)"))
    val hist = Paths.get(tablePath, HistoryDir)
    val rows =
      (if (!Files.exists(hist)) Seq(live)
       else graft.merge.FsList.list(hist)
         .flatMap(p => p.getFileName.toString.toIntOption
           .filter(_ <= live.commit).map(_ => parseManifest(p))))
        .sortBy(_.commit)
    import spark.implicits._
    // commit_ts: wall-time stamp (epoch millis; 0 = pre-timestamp
    // manifest) — the TIMESTAMP AS OF coordinate readTableAtTime
    // resolves against
    rows.map(m => (m.commit, m.batch, m.numBuckets, m.dirs.size, m.ts))
      .toDF("commit", "batch_id", "num_buckets", "n_live_buckets", "commit_ts")
  }

  /** The pipeline batch id stamped on the table's live manifest (None:
    * no manifest, or the table has never been stamped). The read is the
    * cross-table consistency probe's primitive — see
    * `Pipeline.verifyConsistent`. */
  def tableBatchId(tablePath: String): Option[String] =
    readManifest(tablePath).map(_.batch).filter(_.nonEmpty)

  /** Wall time of the live commit (None = no manifest / pre-ts). */
  def lastCommitTs(tablePath: String): Option[Long] =
    readManifest(tablePath).map(_.ts).filter(_ > 0)

  /** The table's live commit number (None = no manifest). Monotone per
    * commit; the coordinate [[readChanges]]' `commitsBack` offsets are
    * relative to, and the id incremental consumers stamp into their
    * own commits for exactly-once replay. */
  def tableCommit(tablePath: String): Option[Int] =
    readManifest(tablePath).map(_.commit)

  /** The table's merge keys as LOGICAL names (colmap applied) — what
    * every public API on this object accepts. None = no manifest;
    * empty = legacy manifest that predates the keys line. The SQL DML
    * surface ([[graft.sql.GraftDml]]) resolves `MERGE INTO`/`UPDATE`/
    * `DELETE` statements against these, so SQL users never have to
    * restate what the table already knows. */
  def tableKeys(tablePath: String): Option[Seq[String]] =
    readManifest(tablePath).map(m => m.keys.map(logicalOf(m, _)))

  private[graft] def deleteRecursively(p: Path): Unit =
    // NOFOLLOW on the guard: a DANGLING symlink (a clone link whose
    // source target was vacuumed) reports follow-exists=false but must
    // still be deleted, or clone GC would strand dead entries under
    // `data/` forever. Files.walk does not follow links, so a live
    // symlink is removed as a link — never descended into.
    if (Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      graft.merge.FsList.walk(p).reverse.foreach(Files.delete)
    }
}
