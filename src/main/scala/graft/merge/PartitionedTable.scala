package graft.merge

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, StringType, StructField, StructType}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** PARTITION-COLUMN layout for graft tables — the missing level above
  * hash buckets (VERDICT r9 #1): a `WHERE month = X` query on a
  * hash-bucketed 100 TB fact must consult min/max or bloom stats on
  * EVERY bucket, because each bucket spans the full time range. A
  * date-partitioned layout prunes by PATH before listing a single
  * footer — this module adds that level without touching the
  * crash-safety core.
  *
  * DESIGN — a parent manifest over per-partition CHILD graft tables:
  *
  * {{{
  *   <table>/_graft_pmanifest        parent manifest (atomic swap)
  *   <table>/_graft_phistory/<n>     retained parents (time travel)
  *   <table>/_graft_lock             parent writer lease
  *   <table>/p=<value>/              one FULL graft table per partition
  *   <table>/p=<value>/data/b<N>_v<V>/   … the familiar bucket dirs
  * }}}
  *
  * Each partition is a complete [[Scd1Merge]] table — buckets,
  * manifest, stats, bloom, deletion vectors, retention, history — so
  * every engine capability composes per partition with ZERO new
  * write-path code. The parent manifest maps partition value →
  * (child dir, PINNED child commit): a reader resolves the parent
  * first and reads every child AT its pinned commit, so a batch that
  * touches several partitions becomes visible ATOMICALLY at the
  * parent swap — child commits that landed before a crash are simply
  * unreferenced-by-parent and invisible (and get re-pinned by the
  * idempotent retry; upsert-by-key makes the redo safe).
  *
  * THE PARTITION COLUMN MUST BE A MERGE KEY. This is what makes
  * partition-routed merges correct: a key can never "move" to another
  * partition (the value is part of its identity), so upserting each
  * sub-batch into its own partition preserves the global
  * one-row-per-key invariant without any cross-partition lookup.
  * Rejected loudly otherwise.
  *
  * 100 TB: an incremental batch touches O(few) partitions; each child
  * upsert probes only its own buckets — merge cost is independent of
  * table size AND of history length. A partition-predicate read is a
  * parent-manifest consult (driver metadata, O(partitions)) that
  * discards whole child trees by PATH, then the surviving children
  * apply the existing stats/bloom/bucket pruning. Compare the flat
  * layout: O(total buckets) stats consults minimum.
  *
  * Reference anchor: the reference's bronze/silver zones are
  * batch-partitioned directories (`Date_ID=...` watermark dirs,
  * incremental_loading.py:70-81) but its Delta gold tables rely on
  * Delta file stats only; this module gives the graft format the
  * partition level Delta gets from `PARTITIONED BY`.
  */
object PartitionedTable {

  private val PManifestName = "_graft_pmanifest"
  private val PHistoryDir = "_graft_phistory"
  private val LockName = "_graft_lock"
  /** Parent manifests retained for lagging readers / time travel. */
  val DefaultRetainParents = 8

  /** Diagnostic breadcrumb: (partitions read, partitions total) from
    * the last pruned read on this JVM — spec- and ops-facing. */
  @volatile var lastPartitionPrune: (Int, Int) = (-1, -1)

  // ---------------- parent manifest ----------------

  /** composite key → (relative child dir, pinned child commit); the
    * key is the partition columns' canonical renderings, URL-encoded
    * and "/"-joined ([[keyOf]]/[[valsOf]] — enc escapes "/", so the
    * separator is unambiguous). Single-column tables are the
    * one-element case; legacy single-`pcol` manifests parse into it
    * transparently. */
  private final case class PManifest(commit: Int, ts: Long,
                                     partCols: Seq[String],
                                     partTypes: Seq[DataType],
                                     keys: Seq[String], numBuckets: Int,
                                     parts: Map[String, (String, Int)],
                                     // parent-level CHECK constraints:
                                     // validated once per batch BEFORE
                                     // any child write (new children
                                     // inherit enforcement for free —
                                     // the check never lives in the
                                     // children)
                                     constraints: Map[String, String] =
                                       Map.empty)

  /** Composite partition key from per-column canonical renderings. */
  private def keyOf(vals: Seq[String]): String = vals.map(enc).mkString("/")
  private def valsOf(key: String): Seq[String] =
    key.split("/", -1).toSeq.map(dec)

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString
  }

  private def manifestPath(tablePath: String): Path =
    Paths.get(tablePath, PManifestName)

  def tableExists(tablePath: String): Boolean =
    Files.exists(manifestPath(tablePath))

  private def parse(p: Path): PManifest = {
    val all = Files.readString(p).split("\n").toSeq
    val (body, sumLine) = all.partition(!_.startsWith("sum="))
    sumLine.headOption.foreach { s =>
      val expect = s.stripPrefix("sum=")
      val got = sha256Hex(body.mkString("\n"))
      require(got == expect, s"corrupt partition manifest $p")
    }
    def meta(k: String): Option[String] =
      body.find(_.startsWith(k + "=")).map(_.stripPrefix(k + "="))
    val entries = body.filter(l => l.nonEmpty && !l.contains("=") || l.contains("\t"))
      .filter(_.contains("\t")).map { l =>
        // the stored key text IS the composite key (enc-joined) —
        // no dec here; legacy single-col entries (enc(v)) are the
        // one-element composite for free
        val Array(v, d, c) = l.split("\t", 3)
        v -> (dec(d), c.toInt)
      }
    // new form: pcols=/ptypes= (comma-joined, enc'd); legacy single
    // pcol=/ptype= parses into the one-element lists
    val pcols = meta("pcols")
      .map(_.split(",").iterator.filter(_.nonEmpty).map(dec).toSeq)
      .orElse(meta("pcol").map(c => Seq(dec(c))))
      .getOrElse(sys.error(s"no pcol(s) in $p"))
    val ptypes = meta("ptypes")
      .map(_.split(",").iterator.filter(_.nonEmpty).map(t =>
        org.apache.spark.sql.types.DataType.fromDDL(dec(t))).toSeq)
      .orElse(meta("ptype").map(t =>
        Seq(org.apache.spark.sql.types.DataType.fromDDL(t))))
      .getOrElse(Seq(StringType))
    PManifest(
      meta("pcommit").map(_.toInt).getOrElse(1),
      meta("ts").map(_.toLong).getOrElse(0L),
      pcols, ptypes,
      meta("keys").map(_.split(",").iterator.filter(_.nonEmpty).map(dec).toSeq)
        .getOrElse(Nil),
      meta("nb").map(_.toInt).getOrElse(0),
      entries.toMap,
      meta("constraints")
        .map(_.split(",").iterator.filter(_.nonEmpty).map { e =>
          val Array(n, x) = e.split(":", 2); dec(n) -> dec(x)
        }.toMap).getOrElse(Map.empty))
  }

  private def readPManifest(tablePath: String): Option[PManifest] = {
    val p = manifestPath(tablePath)
    if (Files.exists(p)) Some(parse(p)) else None
  }

  /** Atomic parent commit: history copy, then write-tmp + fsync +
    * rename — the same durability recipe as the child manifests. */
  private def commitPManifest(tablePath: String, m: PManifest): PManifest = {
    val next = readPManifest(tablePath).map(_.commit + 1).getOrElse(1)
    val now = Scd1Merge.clockMillis()
    val body0 = (Seq(
      s"pcommit=$next", s"ts=$now",
      s"pcols=${m.partCols.map(enc).mkString(",")}",
      s"ptypes=${m.partTypes.map(t => enc(t.sql)).mkString(",")}",
      s"keys=${m.keys.map(enc).mkString(",")}",
      s"nb=${m.numBuckets}") ++
      (if (m.constraints.nonEmpty)
        Seq(s"constraints=${m.constraints.toSeq.sortBy(_._1)
          .map { case (n, x) => s"${enc(n)}:${enc(x)}" }.mkString(",")}")
       else Nil) ++
      m.parts.toSeq.sortBy(_._1).map { case (v, (d, c)) =>
        s"$v\t${enc(d)}\t$c" }).mkString("\n")
    val body = body0 + "\nsum=" + sha256Hex(body0)
    val hist = Paths.get(tablePath, PHistoryDir)
    Files.createDirectories(hist)
    Files.writeString(hist.resolve(next.toString), body)
    val tmp = Paths.get(tablePath, PManifestName + ".tmp")
    val ch = FileChannel.open(tmp, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    try { ch.write(ByteBuffer.wrap(body.getBytes(UTF_8))); ch.force(true) }
    finally ch.close()
    Files.move(tmp, manifestPath(tablePath),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    Scd1Merge.recordCommitExternal(tablePath) // post-commit hook
    // age parent history to the retention window
    graft.merge.FsList.list(hist).foreach { h =>
      h.getFileName.toString.toIntOption.foreach { n =>
        if (n > next || n < next - DefaultRetainParents) Files.deleteIfExists(h)
      }
    }
    m.copy(commit = next, ts = now)
  }

  // ---------------- parent writer lease ----------------
  // Same contract as the child lock (CREATE_NEW atomicity, expiry
  // takeover); held across the child upserts + parent swap so two
  // partitioned writers never interleave pin updates.

  private def withPLock[T](tablePath: String)(body: => T): T = {
    Files.createDirectories(Paths.get(tablePath))
    val p = Paths.get(tablePath, LockName)
    val id = java.util.UUID.randomUUID().toString
    var acquired = false
    var attempts = 0
    while (!acquired) {
      try {
        Files.write(p,
          s"$id\t${System.currentTimeMillis() + Scd1Merge.lockLeaseMillis}".getBytes(UTF_8),
          StandardOpenOption.CREATE_NEW)
        acquired = true
      } catch {
        case _: FileAlreadyExistsException =>
          val lease = try {
            val Array(_, exp) = Files.readString(p).split("\t", 2)
            Some(exp.toLong)
          } catch { case _: Exception => None }
          if (lease.exists(_ >= System.currentTimeMillis()))
            throw new IllegalStateException(
              s"partitioned table $tablePath is locked by another writer")
          attempts += 1
          if (attempts > 3) throw new IllegalStateException(
            s"could not take over expired lock on $tablePath")
          Files.deleteIfExists(p)
      }
    }
    Scd1Merge.pushLockScope()
    try body finally {
      Files.deleteIfExists(p) // release BEFORE the post-commit drain
      Scd1Merge.popLockScopeAndDrain()
    }
  }

  // ---------------- partition specs (identity + derived) ----------

  /** A partition-column spec: either a plain column (IDENTITY — the
    * partition value IS the column) or a DERIVED transform over a
    * source column, Iceberg-style "hidden partitioning": `month(c)` /
    * `year(c)` / `day(c)` truncate a date or timestamp merge key to a
    * rendered period, `bucket(n, c)` hashes a key into n stable
    * buckets. The spelled form is what the user writes in
    * `PARTITIONED BY (...)` and what the parent manifest records.
    *
    * Derived values live ONLY in the path and the parent manifest —
    * children store the real columns, so the table schema never
    * grows a maintenance column the user didn't declare (the
    * reference's bronze zone materializes its `Date_ID` batch dirs
    * as data columns; hidden partitioning is what a 100 TB fact
    * wants instead: `WHERE order_ts BETWEEN x AND y` prunes month
    * partitions by PATH with no month column anywhere in the data).
    *
    * The SOURCE column must be a merge key — the identity-spec
    * argument verbatim: a key's derived partition value can never
    * change, so partition-routed merges stay correct. */
  private[graft] sealed trait PartSpec { def spelled: String; def srcCol: String }
  private[graft] final case class IdentitySpec(srcCol: String) extends PartSpec {
    def spelled: String = srcCol
  }
  private[graft] final case class TruncSpec(unit: String, srcCol: String)
      extends PartSpec {
    def spelled: String = s"$unit($srcCol)"
  }
  private[graft] final case class BucketSpec(n: Int, srcCol: String)
      extends PartSpec {
    def spelled: String = s"bucket($n,$srcCol)"
  }

  private val TruncRe =
    """(?i)^(month|year|day)\s*\(\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s*\)$""".r
  private val BucketRe =
    """(?i)^bucket\s*\(\s*(\d+)\s*,\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s*\)$""".r

  private[graft] def parseSpec(s: String): PartSpec = s.trim match {
    case TruncRe(u, c) => TruncSpec(u.toLowerCase, c)
    case BucketRe(n, c) =>
      require(n.toInt > 0, s"bucket($n, $c): bucket count must be positive")
      BucketSpec(n.toInt, c)
    case t => IdentitySpec(t.stripPrefix("`").stripSuffix("`"))
  }

  /** The derived partition value as a Column over the source frame —
    * used both to route rows (filter per touched partition) and to
    * enumerate a batch's touched partitions. Renderings are chosen to
    * SORT like the source (`yyyy-MM` etc.), so range predicates on
    * the rendered value mean what they look like. */
  private def specExpr(sp: PartSpec): Column = sp match {
    case IdentitySpec(c) => col(c)
    case TruncSpec("month", c) => date_format(col(c), "yyyy-MM")
    case TruncSpec("year", c) => date_format(col(c), "yyyy")
    case TruncSpec("day", c) => date_format(col(c), "yyyy-MM-dd")
    case TruncSpec(u, c) => throw new IllegalArgumentException(
      s"unknown partition transform $u($c)")
    case BucketSpec(n, c) => pmod(hash(col(c)), lit(n)).cast("int")
  }

  // ---------------- value rendering ----------------

  /** Canonical string rendering of a partition value — doubles as the
    * directory name component (`p=<enc(render)>`). Restricted to
    * types whose rendering round-trips exactly; floats and binaries
    * are rejected at create time (same posture as Hive/Delta best
    * practice, enforced instead of footgunned). */
  private def render(v: Any): String = v match {
    case null => throw new IllegalArgumentException(
      "partition column value is NULL — partition columns are merge keys " +
      "and must be non-null")
    case d: java.sql.Date => d.toString
    case ld: java.time.LocalDate => ld.toString
    case other => other.toString
  }

  /** Child dir for a composite partition: single-column keeps the
    * legacy `p=<enc(v)>` name (existing tables read on); multi-column
    * is the flat Hive-ish `<enc(c1)>=<enc(v1)>,<enc(c2)>=<enc(v2)>`
    * (enc escapes "," and "=", so the separators are unambiguous). */
  /** The CURRENT GENERATION prefix ("genNNNN/" after a partition
    * evolution, "" before any): NEW partitions must land inside the
    * live generation — a top-level dir could collide with a stale
    * same-named child from a previous layout and silently merge into
    * it. Zero-padded, so lexicographic max = numeric max. */
  private def genPrefix(m: PManifest): String =
    m.parts.values.map(_._1)
      .collect { case r if r.contains("/") && r.split("/")(0).matches("gen\\d+") =>
        r.split("/")(0) }
      .maxOption.map(_ + "/").getOrElse("")

  private def partitionDirName(m: PManifest, vals: Seq[String]): String =
    if (m.partCols.size == 1) "p=" + enc(vals.head)
    else m.partCols.zip(vals)
      .map { case (c, v) => s"${enc(c)}=${enc(v)}" }.mkString(",")

  private def supportedPartType(dt: DataType): Boolean = dt match {
    case StringType | DateType => true
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** Typed literal back from the canonical rendering. */
  private def typedLit(v: String, dt: DataType): Column = lit(v).cast(dt)

  /** The composite-key equality predicate for one partition —
    * identity columns compare directly, derived columns compare the
    * TRANSFORM's value (`date_format(ts,'yyyy-MM') = '1995-06'`). */
  private def partEq(m: PManifest, vals: Seq[String]): Column =
    m.partCols.map(parseSpec).zip(m.partTypes).zip(vals)
      .map { case ((sp, t), v) => specExpr(sp) === typedLit(v, t) }
      .reduce(_ && _)

  /** Distinct partition-value tuples of `source`, rendered — the
    * touched-partition set (KB-sized: one row per partition; derived
    * specs evaluate their transform here, so a batch's partitions
    * are known without any extra column in the data). */
  private def touchedKeys(source: DataFrame, m: PManifest): Seq[Seq[String]] = {
    val specs = m.partCols.map(parseSpec)
    source.select(specs.zipWithIndex.map { case (sp, i) =>
        specExpr(sp).as(s"__p$i") }: _*)
      .distinct().collect()
      .map(r => specs.indices.map(i => render(r.get(i))))
      .toSeq.sortBy(keyOf)
  }

  // ---------------- write path ----------------

  /** Partition-routed upsert. Creates the table on first call
    * (recording partition column, its type, keys, bucket count);
    * afterwards the recorded spec is authoritative and mismatches are
    * loud. One child upsert per TOUCHED partition (each through the
    * full commit protocol), then one atomic parent swap pinning the
    * new child commits — the cross-partition atomicity point. */
  def upsert(spark: SparkSession, tablePath: String, source: DataFrame,
             keys: Seq[String], partCol: String,
             numBuckets: Int = 0,
             statsColumns: Seq[String] = Nil,
             batchId: String = "",
             retainVersions: Int = Scd1Merge.DefaultRetainVersions): Unit =
    upsertMulti(spark, tablePath, source, keys, splitCols(partCol),
      numBuckets, statsColumns, batchId, retainVersions)

  /** `"a,b"` — the writer-option / SQL `PARTITIONED BY (a, b)`
    * spelling — into column specs. Paren-aware: `bucket(4,c)` is one
    * spec, not two. */
  private[graft] def splitCols(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach { ch =>
      if (ch == ',' && depth == 0) { out += cur.toString; cur.clear() }
      else {
        if (ch == '(') depth += 1 else if (ch == ')') depth -= 1
        cur += ch
      }
    }
    out += cur.toString
    out.iterator.map(_.trim.stripPrefix("`").stripSuffix("`"))
      .filter(_.nonEmpty).toSeq
  }

  /** Validated PARTITION-VALUE types for a spec list over a source
    * schema (identity = the column's own round-trippable type, trunc
    * = the rendered period string, bucket = the int bucket id). */
  private def specTypes(specs: Seq[PartSpec],
                        schema: StructType): Seq[DataType] =
    specs.map { sp =>
      val dt = schema.fields.find(_.name.equalsIgnoreCase(sp.srcCol))
        .map(_.dataType)
        .getOrElse(throw new IllegalArgumentException(
          s"partition column '${sp.spelled}': source '${sp.srcCol}' not in " +
          "source schema"))
      sp match {
        case IdentitySpec(pc) =>
          require(supportedPartType(dt),
            s"partition column '$pc' type ${dt.sql} is not supported (use " +
            "string, integral, or date — types whose rendering round-trips " +
            "exactly)")
          dt
        case TruncSpec(u, c) =>
          require(dt == DateType ||
              dt.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
              dt == org.apache.spark.sql.types.TimestampNTZType,
            s"$u($c) needs a date or timestamp source column, got ${dt.sql}")
          StringType // rendered period ("1995-06") — sorts like the source
        case BucketSpec(_, c) =>
          require(supportedPartType(dt),
            s"bucket($c) needs a string, integral, or date source, got ${dt.sql}")
          org.apache.spark.sql.types.IntegerType
      }
    }

  /** Multi-column partition-routed upsert — one child per DISTINCT
    * (c1, …, cn) tuple. EVERY partition column must be a merge key
    * (same argument as single-column: a key's partition is part of
    * its identity). */
  def upsertMulti(spark: SparkSession, tablePath: String, source: DataFrame,
                  keys: Seq[String], partCols: Seq[String],
                  numBuckets: Int = 0,
                  statsColumns: Seq[String] = Nil,
                  batchId: String = "",
                  // per-child history depth: a CDC/MV consumer that
                  // may LAG k commits on a partition needs k retained
                  // child versions (the flat-table feed contract)
                  retainVersions: Int = Scd1Merge.DefaultRetainVersions): Unit = {
    require(partCols.nonEmpty, "PARTITIONED BY needs at least one column")
    val specs = partCols.map(parseSpec)
    specs.foreach { sp =>
      require(keys.exists(_.equalsIgnoreCase(sp.srcCol)),
        s"partition column '${sp.spelled}': source '${sp.srcCol}' must be one " +
        s"of the merge keys (${keys.mkString(",")}): partition routing is " +
        "only a correct merge when a key cannot move between partitions")
    }
    val dts = specTypes(specs, source.schema)
    withPLock(tablePath) {
      val existing = readPManifest(tablePath)
      existing.foreach { m =>
        // compare canonical spec spellings (whitespace/backtick-proof)
        require(m.partCols.map(c => parseSpec(c).spelled.toLowerCase) ==
            specs.map(_.spelled.toLowerCase),
          s"table is partitioned by (${m.partCols.mkString(",")}), " +
          s"got (${partCols.mkString(",")})")
        require(m.keys.map(_.toLowerCase).toSet == keys.map(_.toLowerCase).toSet,
          s"table keys are ${m.keys.mkString(",")}, got ${keys.mkString(",")}")
      }
      val nb = existing.map(_.numBuckets).filter(_ > 0)
        .orElse(Some(numBuckets)).get
      val base = existing.getOrElse(
        PManifest(0, 0L, specs.map(_.spelled), dts, keys, nb, Map.empty))
      // parent-level CHECK constraints: ONE validation of the whole
      // batch before any child write (children never carry the check)
      Scd1Merge.enforceCheck(spark, tablePath, base.constraints,
        source, "upsert(partitioned)")
      val newPins = touchedKeys(source, base).map { vals =>
        val key = keyOf(vals)
        val rel = base.parts.get(key).map(_._1)
          .getOrElse(freshChildRel(tablePath, base, vals))
        val childPath = Paths.get(tablePath, rel).toString
        val expect = base.parts.get(key) match {
          case Some((_, pin)) =>
            reconcileResidue(childPath, pin, "upsert(partitioned)")
          case None => 0 // freshChildRel: the dir is unoccupied
        }
        // spec hook: the residue-check → child-write window the
        // commit fence exists to close
        Scd1Merge.failpoint("p-locked-fence-window")
        val sub = source.filter(partEq(base, vals))
        Scd1Merge.withCommitFence(childPath, expect) {
          Scd1Merge.upsert(spark, childPath, sub, keys, nb,
            statsColumns = statsColumns, batchId = batchId,
            retainVersions = retainVersions)
        }
        key -> (rel, Scd1Merge.tableCommit(childPath).get)
      }.toMap
      commitPManifest(tablePath, base.copy(parts = base.parts ++ newPins))
    }
  }

  // ---------------- optimistic concurrency (parent level) ----------

  /** Parent lock with WAIT semantics — the optimistic writers' adopt
    * phase queues behind a holder (bounded by `timeoutMillis`)
    * instead of failing, mirroring [[Scd1Merge]]'s `withLockWait`. */
  private def withPLockWait[T](tablePath: String,
                               timeoutMillis: Long)(body: => T): T = {
    val deadline = System.currentTimeMillis() + timeoutMillis
    var last: Throwable = null
    while (true) {
      try return withPLock(tablePath)(body)
      catch {
        case e: IllegalStateException
            if e.getMessage != null &&
              e.getMessage.contains("locked by another writer") =>
          last = e
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"timed out after ${timeoutMillis}ms waiting for the parent " +
              s"lock on $tablePath", last)
          Thread.sleep(50L + scala.util.Random.nextInt(100))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The parent-level REBASE DECISION ([[Scd1Merge]]'s
    * `checkFootprints` posture lifted to partitions): an intervening
    * parent commit is safe exactly when table-wide layout/metadata
    * are unchanged AND every partition this writer touched still
    * carries the (rel, pin) it staged from — partition-disjoint
    * writers rebase; overlap, evolution, recluster, drop, or
    * constraint changes conflict LOUDLY. Never a silent lost
    * update. */
  private def checkPFootprints(tablePath: String, m0: PManifest,
                               m1: PManifest, touched: Set[String],
                               op: String): Unit = {
    if (m1.commit == m0.commit) return
    def cme(why: String): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"$op on $tablePath: $why (staged from parent commit " +
        s"${m0.commit}, live is ${m1.commit}) — re-run the batch")
    if (m1.partCols.map(c => parseSpec(c).spelled.toLowerCase) !=
        m0.partCols.map(c => parseSpec(c).spelled.toLowerCase))
      cme(s"partition layout changed (${m0.partCols.mkString(",")} -> " +
        s"${m1.partCols.mkString(",")})")
    if (m1.keys.map(_.toLowerCase) != m0.keys.map(_.toLowerCase))
      cme("merge keys changed")
    if (m1.numBuckets != m0.numBuckets) cme("bucket count changed")
    if (m1.constraints != m0.constraints) cme("CHECK constraints changed")
    touched.foreach { k =>
      if (m0.parts.get(k) != m1.parts.get(k))
        cme(s"partition ${valsOf(k).mkString("/")} was committed by a " +
          "concurrent writer")
    }
  }

  /** OPTIMISTIC partition-routed upsert — [[Scd1Merge.upsertConcurrent]]
    * lifted to the partitioned layout. The child merges (the expensive
    * work) run entirely OUTSIDE the parent lock, each serialized only
    * by its own child's lock; the parent lock is taken just for the
    * conflict check + pin adopt + swap, WAITING on a holder instead of
    * failing. An intervening parent commit REBASES when it is
    * PARTITION-DISJOINT from this writer's touched set and table-wide
    * layout/metadata are unchanged — the staged child commits are then
    * still exactly right. A moved pin on a touched partition (another
    * writer or compactor got there first), a layout change, or a
    * dropped touched partition throws
    * `ConcurrentModificationException`, after rolling each staged
    * child back where nothing stacked on it — never a silent lost
    * update; the loser re-runs (upsert is content-idempotent).
    *
    * This is the 100 TB scheduling unlock the pessimistic
    * [[upsertMulti]] cannot give: a month-A backfill no longer blocks
    * a month-B ingest or cold-partition compaction — writers to
    * disjoint partitions serialize only at the sub-second pin swap.
    *
    * Scope: ESTABLISHED tables (the initial commit defines the layout
    * — table-wide by nature, pessimistic). A touched partition whose
    * pin lags its child's live commit (another writer mid-adopt, or
    * crash residue) fails loudly at staging: merging on top would
    * adopt foreign unpinned rows as a side effect. */
  def upsertMultiConcurrent(spark: SparkSession, tablePath: String,
                            source: DataFrame, keys: Seq[String],
                            partCols: Seq[String],
                            statsColumns: Seq[String] = Nil,
                            batchId: String = "",
                            retainVersions: Int = Scd1Merge.DefaultRetainVersions,
                            lockWaitMillis: Long = 60000L): Unit = {
    require(partCols.nonEmpty, "PARTITIONED BY needs at least one column")
    val specs = partCols.map(parseSpec)
    val m0 = readPManifest(tablePath).getOrElse(throw new IllegalStateException(
      s"upsertMultiConcurrent: $tablePath is not a partitioned graft table — " +
      "create it with upsert first (the initial commit is table-wide by nature)"))
    require(m0.partCols.map(c => parseSpec(c).spelled.toLowerCase) ==
        specs.map(_.spelled.toLowerCase),
      s"table is partitioned by (${m0.partCols.mkString(",")}), " +
      s"got (${partCols.mkString(",")})")
    require(m0.keys.map(_.toLowerCase).toSet == keys.map(_.toLowerCase).toSet,
      s"table keys are ${m0.keys.mkString(",")}, got ${keys.mkString(",")}")
    Scd1Merge.enforceCheck(spark, tablePath, m0.constraints, source,
      "upsertConcurrent(partitioned)")
    // ---- UNLOCKED staging: one child commit per touched partition
    val newPins = touchedKeys(source, m0).map { vals =>
      val key = keyOf(vals)
      val rel = m0.parts.get(key).map(_._1)
        .getOrElse(freshChildRel(tablePath, m0, vals))
      val childPath = Paths.get(tablePath, rel).toString
      m0.parts.get(key).foreach { case (_, pin) =>
        val liveC = Scd1Merge.tableCommit(childPath).getOrElse(pin)
        if (liveC != pin) throw new IllegalStateException(
          s"upsertMultiConcurrent: partition ${vals.mkString("/")} pin $pin " +
          s"lags its live child commit $liveC — another writer is mid-commit " +
          "on this partition, or a conflicted/crashed batch left residue; " +
          "retry, or compact() to re-pin")
      }
      Scd1Merge.upsert(spark, childPath, source.filter(partEq(m0, vals)),
        keys, m0.numBuckets, statsColumns = statsColumns, batchId = batchId,
        retainVersions = retainVersions)
      key -> (rel, Scd1Merge.tableCommit(childPath).get)
    }.toMap
    if (newPins.isEmpty) return
    Scd1Merge.failpoint("p-optimistic-staged")
    // ---- LOCKED adopt: conflict check + rebase + swap
    try {
      withPLockWait(tablePath, lockWaitMillis) {
        val m1 = readPManifest(tablePath).get
        checkPFootprints(tablePath, m0, m1, newPins.keySet,
          "upsertMultiConcurrent")
        commitPManifest(tablePath, m1.copy(parts = m1.parts ++ newPins))
      }
      ()
    } catch {
      case e: java.util.ConcurrentModificationException =>
        // discard the staging (the flat-OCC posture) — see
        // [[rollbackStaged]]: pinned children roll back where nothing
        // stacked on our commit (a stacked child keeps the residue;
        // the staging guard above makes the next writer loud about
        // it), and a brand-new child we created that nobody adopted is
        // DELETED — its deterministic dir name would otherwise be
        // regenerated by a later writer, silently adopting our rows.
        rollbackStaged(tablePath, m0, newPins, lockWaitMillis)
        throw e
    }
  }

  /** Single-spec convenience — [[upsert]]'s signature on the
    * optimistic path. */
  def upsertConcurrent(spark: SparkSession, tablePath: String,
                       source: DataFrame, keys: Seq[String], partCol: String,
                       statsColumns: Seq[String] = Nil, batchId: String = "",
                       retainVersions: Int = Scd1Merge.DefaultRetainVersions,
                       lockWaitMillis: Long = 60000L): Unit =
    upsertMultiConcurrent(spark, tablePath, source, keys, splitCols(partCol),
      statsColumns, batchId, retainVersions, lockWaitMillis)

  /** OPTIMISTIC compaction: child compacts run OUTSIDE the parent
    * lock, then one short locked adopt re-pins only partitions whose
    * child commit actually advanced — so compacting cold months runs
    * BESIDE a hot-partition ingest instead of blocking it (the
    * pessimistic [[compact]] holds the parent lock for the whole
    * rewrite). `predicate` narrows the sweep to matching partitions
    * (partition-column conjuncts, the [[deleteWhere]] pruning).
    * Conflict posture: [[checkPFootprints]] — a concurrently
    * committed touched partition aborts loudly with the compacted
    * child rolled back where possible. Returns buckets rewritten. */
  def compactConcurrent(spark: SparkSession, tablePath: String,
                        predicate: Column = lit(true),
                        lockWaitMillis: Long = 60000L): Int = {
    val m0 = requireTable(tablePath)
    val chosen = matchingPartitions(spark, tablePath, m0, predicate).toSet
    var total = 0
    val staged = m0.parts.toSeq.sortBy(_._1)
      .filter { case (v, _) => chosen(v) }
      .flatMap { case (v, (rel, pin)) =>
        val childPath = Paths.get(tablePath, rel).toString
        val liveC = Scd1Merge.tableCommit(childPath).getOrElse(pin)
        if (liveC != pin) throw new IllegalStateException(
          s"compactConcurrent: partition ${valsOf(v).mkString("/")} pin " +
          s"$pin lags its live child commit $liveC — another writer is " +
          "mid-commit; retry once it adopts")
        total += Scd1Merge.compact(spark, childPath)
        val after = Scd1Merge.tableCommit(childPath).get
        if (after == pin) None // nothing rewritten: pin already right
        else Some(v -> (rel, after))
      }.toMap
    Scd1Merge.failpoint("p-compact-staged")
    if (staged.nonEmpty) {
      try {
        withPLockWait(tablePath, lockWaitMillis) {
          val m1 = readPManifest(tablePath).get
          checkPFootprints(tablePath, m0, m1, staged.keySet,
            "compactConcurrent")
          commitPManifest(tablePath, m1.copy(parts = m1.parts ++ staged))
        }
        ()
      } catch {
        case e: java.util.ConcurrentModificationException =>
          rollbackStaged(tablePath, m0, staged, lockWaitMillis)
          throw e
      }
    }
    total
  }

  /** The shared OPTIMISTIC adopt: take the parent lock (waiting),
    * verify the staged partitions' footprints did not move since
    * `m0`, merge the staged pins over the LIVE manifest (rebase over
    * disjoint intervening commits), and on conflict roll each staged
    * child back where nothing stacked on it — the
    * [[upsertMultiConcurrent]] posture, factored so every predicate
    * DML path shares one adopt/rollback discipline. */
  private def adoptStaged(tablePath: String, m0: PManifest,
                          staged: Map[String, (String, Int)],
                          op: String, lockWaitMillis: Long): Unit = {
    if (staged.isEmpty) return
    try {
      withPLockWait(tablePath, lockWaitMillis) {
        val m1 = readPManifest(tablePath).get
        checkPFootprints(tablePath, m0, m1, staged.keySet, op)
        commitPManifest(tablePath, m1.copy(parts = m1.parts ++ staged))
      }
      ()
    } catch {
      case e: java.util.ConcurrentModificationException =>
        rollbackStaged(tablePath, m0, staged, lockWaitMillis)
        throw e
    }
  }

  /** Best-effort rollback of a conflicted optimistic stage, under a
    * BRIEF parent lock (we re-read the live manifest to decide each
    * child's fate; deciding from a stale snapshot could delete a
    * winner's committed data — partition dir names are deterministic,
    * so the child dir may since have been adopted by the very writer
    * that defeated us). Per staged child, only when NOTHING stacked
    * on our commit (`tableCommit == c` — otherwise stand down, the
    * stack owns the state):
    *  - pinned below our commit → restore the child to its pin;
    *  - absent from the live manifest AND absent from `m0` → WE
    *    created it and nobody adopted it: a fully committed orphan
    *    whose deterministic name a later writer would regenerate and
    *    merge on top of, silently adopting our aborted rows — delete
    *    the directory;
    *  - anything else (pin at/above `c`, or a concurrently dropped
    *    partition) → leave it; the locked writers' residue fences
    *    guard reuse.
    * Lock failure degrades to standing down entirely — residue is
    * loud at reuse ([[stagingGuard]]/[[reconcileResidue]]), never
    * silent. */
  private def rollbackStaged(tablePath: String, m0: PManifest,
                             staged: Map[String, (String, Int)],
                             lockWaitMillis: Long): Unit =
    try {
      withPLockWait(tablePath, lockWaitMillis) {
        val live = readPManifest(tablePath).get
        staged.foreach { case (k, (rel, c)) =>
          val childPath = Paths.get(tablePath, rel).toString
          if (Scd1Merge.tableCommit(childPath).contains(c)) {
            live.parts.get(k) match {
              case Some((_, p)) if c > p =>
                try { Scd1Merge.restore(childPath, c - p,
                  batchId = s"occ-rollback-$c"); () }
                catch { case _: Exception => () }
              case None if !m0.parts.contains(k) =>
                // take the CHILD lock before deleting: a SECOND
                // optimistic stager that picked the same deterministic
                // child name (both ran freshChildRel before either
                // created the dir) may be MID-WRITE holding only the
                // child lock — invisible to the commit probe above —
                // and an unlocked delete would remove its in-flight
                // data files and lock, letting its later commit pin a
                // child referencing deleted files. Under the lock,
                // re-verify the commit is still OURS (a racer that
                // committed meanwhile moved it → stand down; the
                // residue fences guard reuse). A held/heartbeating
                // lock times out the wait → stand down too.
                try Scd1Merge.withTableLockWait(childPath, lockWaitMillis) {
                  if (Scd1Merge.tableCommit(childPath).contains(c))
                    Scd1Merge.deleteRecursively(Paths.get(childPath))
                } catch { case _: Exception => () }
              case _ => ()
            }
          }
        }
      }
      ()
    } catch { case _: Exception => () }

  /** The staging guard every optimistic path runs per touched
    * partition BEFORE doing child work: a pin lagging its child's
    * live commit means another writer is mid-adopt (or crash residue
    * sits on the child) — merging on top would adopt foreign unpinned
    * rows as a side effect, so fail loudly and let the caller retry. */
  private def stagingGuard(tablePath: String, m: PManifest,
                           key: String, op: String): Unit =
    m.parts.get(key).foreach { case (rel, pin) =>
      val childPath = Paths.get(tablePath, rel).toString
      val liveC = Scd1Merge.tableCommit(childPath).getOrElse(pin)
      if (liveC != pin) throw new IllegalStateException(
        s"$op: partition ${valsOf(key).mkString("/")} pin $pin " +
        s"lags its live child commit $liveC — another writer is " +
        "mid-commit on this partition, or a conflicted/crashed batch " +
        "left residue; retry, or compact() to re-pin")
    }

  /** LOCKED-writer residue reconciliation: a live child commit AHEAD
    * of its parent pin is never table-visible — it is either a
    * mid-flight optimistic staging (whose adopt will CME once this
    * locked commit moves the pin) or residue of a conflicted/crashed
    * batch. A locked writer must NOT merge on top of it: that would
    * silently adopt the loser's rows into its own pin (the lost
    * update this layer exists to prevent). Instead, restore the child
    * to the pinned state first; the restore is itself a child commit,
    * so the optimistic loser's rollback probe (`tableCommit ==
    * stagedCommit`) correctly sees the stack and stands down. Only
    * callable while HOLDING the parent lock — an unlocked writer
    * restoring a staging it cannot defeat would race the stager's
    * adopt. */
  private def reconcileResidue(childPath: String, pin: Int,
                               op: String): Int = {
    val live = Scd1Merge.tableCommit(childPath).getOrElse(pin)
    if (live > pin) {
      // the restore is itself fenced at `live`: a stage landing
      // between our read of `live` and the restore's lock would make
      // `live - pin` the wrong depth (the restore would pin the
      // stager's content as our base) — fenced, it aborts loudly
      try Scd1Merge.withCommitFence(childPath, live) {
        Scd1Merge.restore(childPath, live - pin,
          batchId = s"$op-residue-$live")
      }
      catch {
        case e: java.util.ConcurrentModificationException => throw e
        case e: Exception => throw new IllegalStateException(
          s"$op: child $childPath carries unpinned residue (live commit " +
          s"$live, pin $pin) beyond restorable history — compact() to " +
          "re-pin", e)
      }
    } else live
  }

  /** The child dir name for a partition the manifest does NOT
    * contain: the deterministic name — or, when a directory already
    * OCCUPIES it, a commit-suffixed FRESH name. An occupied
    * unreferenced name is residue: an aborted optimistic creator's
    * fully committed orphan (dir names are deterministic), or a
    * DROPPED partition's tree retained for lagging readers. Writing
    * into it would merge the new batch ON TOP — silently adopting the
    * aborted writer's rows, or resurrecting every dropped row.
    * Deleting it instead would tear a live stager's in-flight write
    * and break retained time travel over the dropped pin set. A fresh
    * name does neither: the residue stays unreferenced until
    * [[vacuum]] reclaims it, and the new child starts empty. */
  private def freshChildRel(tablePath: String, m: PManifest,
                            vals: Seq[String]): String = {
    val base = genPrefix(m) + partitionDirName(m, vals)
    if (!Files.exists(Paths.get(tablePath, base))) base
    else {
      var i = m.commit
      var rel = s"$base@r$i"
      while (Files.exists(Paths.get(tablePath, rel))) { i += 1; rel = s"$base@r$i" }
      rel
    }
  }

  /** OPTIMISTIC predicate DELETE — [[deleteWhere]] with the child
    * rewrites staged OUTSIDE the parent lock ([[upsertMultiConcurrent]]
    * posture): partition-column conjuncts prune to the touched
    * children first, each child's stats-pruned delete runs under only
    * its own lock, and one short locked adopt re-pins the changed
    * children — REBASING over intervening commits to disjoint
    * partitions. The 100 TB unlock this closes: a long month-A GDPR
    * delete no longer blocks a month-B ingest; they serialize only at
    * the sub-second pin swap. A touched-partition conflict aborts
    * loudly with the staged children rolled back. Returns rows
    * deleted. */
  def deleteWhereConcurrent(spark: SparkSession, tablePath: String,
                            predicate: Column,
                            lockWaitMillis: Long = 60000L): Long = {
    val m0 = requireTable(tablePath)
    val chosen = matchingPartitions(spark, tablePath, m0, predicate).toSet
    lastPartitionPrune = (chosen.size, m0.parts.size)
    var n = 0L
    val staged = m0.parts.toSeq.sortBy(_._1)
      .filter { case (v, _) => chosen(v) }
      .flatMap { case (v, (rel, pin)) =>
        stagingGuard(tablePath, m0, v, "deleteWhereConcurrent")
        val childPath = Paths.get(tablePath, rel).toString
        n += Scd1Merge.delete(spark, childPath, m0.keys, predicate)
        val after = Scd1Merge.tableCommit(childPath).get
        if (after == pin) None else Some(v -> (rel, after))
      }.toMap
    Scd1Merge.failpoint("p-predicate-staged")
    adoptStaged(tablePath, m0, staged, "deleteWhereConcurrent",
      lockWaitMillis)
    n
  }

  /** OPTIMISTIC predicate UPDATE — [[updateWhere]] on the
    * stage-outside-lock posture of [[deleteWhereConcurrent]]. The
    * constraint pre-check runs unlocked on the pruned matched rows:
    * sound because the adopt-time footprint check aborts if ANY
    * touched partition moved since the pre-check read it. Returns
    * rows updated. */
  def updateWhereConcurrent(spark: SparkSession, tablePath: String,
                            predicate: Column, set: Map[String, Column],
                            lockWaitMillis: Long = 60000L): Long = {
    val m0 = requireTable(tablePath)
    if (m0.constraints.nonEmpty) {
      val matched = readTableWhere(spark, tablePath, predicate)
        .filter(coalesce(predicate, lit(false)))
      val post = set.foldLeft(matched) { case (df, (c, v)) =>
        df.withColumn(c, v) }
      Scd1Merge.enforceCheck(spark, tablePath, m0.constraints, post,
        "updateWhereConcurrent(partitioned)")
    }
    val chosen = matchingPartitions(spark, tablePath, m0, predicate).toSet
    lastPartitionPrune = (chosen.size, m0.parts.size)
    var n = 0L
    val staged = m0.parts.toSeq.sortBy(_._1)
      .filter { case (v, _) => chosen(v) }
      .flatMap { case (v, (rel, pin)) =>
        stagingGuard(tablePath, m0, v, "updateWhereConcurrent")
        val childPath = Paths.get(tablePath, rel).toString
        n += Scd1Merge.update(spark, childPath, m0.keys, predicate, set)
        val after = Scd1Merge.tableCommit(childPath).get
        if (after == pin) None else Some(v -> (rel, after))
      }.toMap
    Scd1Merge.failpoint("p-predicate-staged")
    adoptStaged(tablePath, m0, staged, "updateWhereConcurrent",
      lockWaitMillis)
    n
  }

  /** OPTIMISTIC dynamic partition overwrite — [[overwritePartitions]]
    * with the wholesale child replacements staged OUTSIDE the parent
    * lock: a month-repartition rewrite runs beside a disjoint ingest;
    * a touched-partition conflict aborts loudly with the staged
    * children rolled back. */
  def overwritePartitionsConcurrent(spark: SparkSession, tablePath: String,
                                    source: DataFrame,
                                    lockWaitMillis: Long = 60000L): Unit = {
    val m0 = requireTable(tablePath)
    touchedKeys(source, m0).foreach(vals =>
      stagingGuard(tablePath, m0, keyOf(vals),
        "overwritePartitionsConcurrent"))
    val staged = replaceTouched(spark, tablePath, m0, source,
      locked = false)
    Scd1Merge.failpoint("p-predicate-staged")
    adoptStaged(tablePath, m0, staged, "overwritePartitionsConcurrent",
      lockWaitMillis)
  }

  /** Dynamic partition overwrite (Spark's `partitionOverwriteMode=
    * dynamic` / Delta `replaceWhere` on partition values): every
    * partition PRESENT in the batch is replaced wholesale — its
    * existing keys absent from the batch are deleted in the same
    * child commit — and untouched partitions keep their pins. */
  def overwritePartitions(spark: SparkSession, tablePath: String,
                          source: DataFrame): Unit = {
    requireTable(tablePath)
    withPLock(tablePath) {
      // in-lock manifest (deleteWhere posture): stale routing under a
      // concurrent evolution, or stale pins, must never commit
      val live = readPManifest(tablePath).get
      val newPins = replaceTouched(spark, tablePath, live, source)
      commitPManifest(tablePath, live.copy(parts = live.parts ++ newPins))
    }
  }

  /** Replace every partition PRESENT in the batch wholesale (its
    * existing keys absent from the batch delete in the same child
    * commit) and return the new pins — the shared core of dynamic
    * and full overwrite. */
  private def replaceTouched(spark: SparkSession, tablePath: String,
      m: PManifest, source: DataFrame,
      // true only when the caller HOLDS the parent lock: locked
      // overwrites restore unpinned residue before replacing
      // ([[reconcileResidue]]); the optimistic path instead guards
      // loudly at staging and must never restore unlocked
      locked: Boolean = true): Map[String, (String, Int)] = {
    Scd1Merge.enforceCheck(spark, tablePath, m.constraints,
      source, "overwrite(partitioned)")
    val opCol = "__graft_part_op"
    touchedKeys(source, m).map { vals =>
      val key = keyOf(vals)
      val rel = m.parts.get(key).map(_._1)
        .getOrElse(freshChildRel(tablePath, m, vals))
      val childPath = Paths.get(tablePath, rel).toString
      val expect: Option[Int] = if (!locked) None else Some(
        m.parts.get(key) match {
          case Some((_, pin)) =>
            reconcileResidue(childPath, pin, "overwrite(partitioned)")
          case None => 0 // freshChildRel: the dir is unoccupied
        })
      def write(): Unit = {
        val sub = source.filter(partEq(m, vals))
        if (Scd1Merge.tableExists(childPath)) {
          val target = Scd1Merge.readTable(spark, childPath)
          val vanished = target
            .join(sub.select(m.keys.map(col): _*), m.keys, "left_anti")
            .withColumn(opCol, lit("delete"))
          Scd1Merge.applyCdc(spark, childPath,
            sub.withColumn(opCol, lit("upsert")).unionByName(vanished),
            m.keys, opCol = opCol)
        } else Scd1Merge.upsert(spark, childPath, sub, m.keys, m.numBuckets)
      }
      expect match {
        case Some(e) => Scd1Merge.withCommitFence(childPath, e) { write() }
        case None => write()
      }
      key -> (rel, Scd1Merge.tableCommit(childPath).get)
    }.toMap
  }

  /** FULL atomic replacement (DSv2 truncate-overwrite / Delta
    * `mode("overwrite")` parity): partitions present in the batch are
    * replaced via [[overwritePartitions]]' child-commit shape, and the
    * SAME parent swap pins ONLY those partitions — every partition
    * absent from the batch drops (a metadata-only removal; its tree
    * stays for lagging readers until [[vacuum]]). Readers see the old
    * table or the new one, never a mixture. */
  def overwriteTable(spark: SparkSession, tablePath: String,
                     source: DataFrame): Unit = {
    requireTable(tablePath)
    withPLock(tablePath) {
      // route against the IN-LOCK layout — a concurrent evolution
      // between pre-check and lock must not misdirect child writes
      val live = readPManifest(tablePath).get
      val newPins = replaceTouched(spark, tablePath, live, source)
      commitPManifest(tablePath, live.copy(parts = newPins))
    }
  }

  /** Delete whole partitions by predicate ON THE PARTITION LAYOUT —
    * a pure metadata commit (no data read or written): partitions
    * where the predicate provably holds for EVERY row drop from the
    * parent manifest; their trees stay on disk for lagging readers
    * until [[vacuum]]. CONTAINMENT polarity ([[containedPartitions]]):
    * a conjunct that cannot decide whole partitions — non-partition
    * columns, hash buckets, a mid-period range bound — is rejected
    * loudly instead of silently widening the drop set (the can-match
    * projection reads use would drop EVERY partition for a
    * non-partition predicate). */
  def dropPartitionsWhere(spark: SparkSession, tablePath: String,
                          predicate: Column): Int = {
    val m = requireTable(tablePath)
    withPLock(tablePath) {
      val live = readPManifest(tablePath).get
      val dropped = containedPartitions(spark, tablePath, live, predicate)
      if (dropped.nonEmpty)
        commitPManifest(tablePath, live.copy(parts = live.parts -- dropped))
      dropped.size
    }
  }

  private def requireTable(tablePath: String): PManifest =
    readPManifest(tablePath).getOrElse(throw new IllegalStateException(
      s"$tablePath is not a partitioned graft table (no $PManifestName)"))

  // ---------------- read path ----------------

  private def childRead(spark: SparkSession, tablePath: String,
                        rel: String, pinned: Int): DataFrame = {
    val childPath = Paths.get(tablePath, rel).toString
    // ABSOLUTE commit resolution: distance-from-live would shift if a
    // concurrent child commit lands between the distance computation
    // and the history read — the pin number cannot
    Scd1Merge.readTableAtCommit(spark, childPath, pinned)
  }

  /** Snapshot read: parent manifest resolved once, every child read AT
    * its pinned commit (a child that advanced under a concurrent
    * writer serves the pinned version from retention — same lagging-
    * reader contract as flat tables). */
  def readTable(spark: SparkSession, tablePath: String): DataFrame =
    readAt(spark, tablePath, requireTable(tablePath))

  private def readAt(spark: SparkSession, tablePath: String,
                     m: PManifest): DataFrame = {
    val parts = m.parts.toSeq.sortBy(_._1)
    if (parts.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(m.partCols.zip(m.partTypes)
          .map { case (c, t) => StructField(c, t) }))
    parts.map { case (_, (rel, pin)) => childRead(spark, tablePath, rel, pin) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Time travel: parent commit `commitsBack` ago — an old pin set
    * over the children's retained history. */
  def readTableAt(spark: SparkSession, tablePath: String,
                  commitsBack: Int): DataFrame = {
    val live = requireTable(tablePath)
    readAt(spark, tablePath, parentAt(tablePath, live, commitsBack))
  }

  /** `TIMESTAMP AS OF` read over the parent history: the youngest
    * retained parent manifest whose commit stamp is ≤ the target
    * (commit number breaks ties — the [[Scd1Merge.readTableAtTime]]
    * convention), children read at that parent's pin set. Loud when
    * the target predates the oldest retained parent. */
  def readTableAtTime(spark: SparkSession, tablePath: String,
                      tsMillis: Long): DataFrame = {
    val live = requireTable(tablePath)
    if (tsMillis >= live.ts) return readAt(spark, tablePath, live)
    val hist = Paths.get(tablePath, PHistoryDir)
    val retained =
      if (!Files.exists(hist)) Nil
      else graft.merge.FsList.list(hist)
        .flatMap(p => p.getFileName.toString.toIntOption
          .filter(_ < live.commit).map(_ => parse(p)))
    retained.filter(_.ts <= tsMillis).sortBy(m => (m.ts, m.commit))
      .lastOption match {
      case Some(m) => readAt(spark, tablePath, m)
      case None => throw new IllegalStateException(
        s"no retained parent snapshot of $tablePath at or before " +
        s"$tsMillis (oldest retained is newer, or was vacuumed — " +
        "raise parent retention)")
    }
  }

  /** Parent manifest `commitsBack` parent commits ago (0 = live) —
    * the [[readTableAt]] resolution, shared with the change feed. */
  private def parentAt(tablePath: String, live: PManifest,
                       commitsBack: Int): PManifest = {
    if (commitsBack == 0) return live
    val n = live.commit - commitsBack
    val h = Paths.get(tablePath, PHistoryDir, n.toString)
    require(n >= 1 && Files.exists(h),
      s"no retained parent manifest for commit $n of $tablePath " +
      s"(live ${live.commit}); it predates the table or was vacuumed")
    parse(h)
  }

  /** CHANGE-DATA FEED over the partitioned layout — the flat-table
    * [[Scd1Merge.readChanges]] contract (`_change_type` = insert /
    * update / update_preimage / delete) lifted through the parent pin
    * set: the two parent manifests are diffed PER PARTITION, and only
    * partitions whose pinned child commit moved are read at all —
    * each through the child's own O(changed buckets) diff. A
    * partition NEW between the snapshots contributes its full pinned
    * snapshot as inserts; a DROPPED partition contributes its rows as
    * deletes (metadata-only drops still surface the data change a
    * consumer must apply). At 100 TB an incremental parent commit
    * touches O(few) partitions — feed cost tracks the delta, never
    * the table. */
  def readChanges(spark: SparkSession, tablePath: String,
                  fromCommitsBack: Int, toCommitsBack: Int = 0): DataFrame = {
    require(fromCommitsBack > toCommitsBack,
      s"from ($fromCommitsBack commits back) must be older than to ($toCommitsBack)")
    val live = requireTable(tablePath)
    changesBetween(spark, tablePath,
      parentAt(tablePath, live, fromCommitsBack),
      parentAt(tablePath, live, toCommitsBack))
  }

  /** Parent manifest at an ABSOLUTE commit number — live or retained
    * history ([[Scd1Merge.manifestAtCommit]]'s resolution order:
    * history file N is written before the live swap to N+1, so a
    * history miss means live IS N or N is gone). */
  private def parentAtCommit(tablePath: String, commit: Int): PManifest = {
    val p = Paths.get(tablePath, PHistoryDir, commit.toString)
    if (Files.exists(p)) parse(p)
    else {
      val live = requireTable(tablePath)
      if (live.commit == commit) live
      else if (Files.exists(p)) parse(p)
      else throw new IllegalStateException(
        s"parent commit $commit of $tablePath is not retained (live " +
        s"${live.commit}) — it was vacuumed or never existed")
    }
  }

  /** The table AT absolute parent commit `commit` — the streaming
    * source's TOCTOU-free snapshot coordinate. */
  def readTableAtCommit(spark: SparkSession, tablePath: String,
                        commit: Int): DataFrame =
    readAt(spark, tablePath, parentAtCommit(tablePath, commit))

  /** [[readChanges]] in the ABSOLUTE parent-commit coordinate —
    * immune to parent commits landing mid-call; what checkpointed
    * streaming offsets must resolve through. */
  def readChangesAtCommits(spark: SparkSession, tablePath: String,
                           fromCommit: Int, toCommit: Int): DataFrame = {
    require(fromCommit < toCommit,
      s"from (commit $fromCommit) must be older than to (commit $toCommit)")
    changesBetween(spark, tablePath, parentAtCommit(tablePath, fromCommit),
      parentAtCommit(tablePath, toCommit))
  }

  private def changesBetween(spark: SparkSession, tablePath: String,
                             mFrom: PManifest, mTo: PManifest): DataFrame = {
    val keysOfFeed = mTo.keys
    if (mFrom.partCols.map(c => parseSpec(c).spelled.toLowerCase) !=
        mTo.partCols.map(c => parseSpec(c).spelled.toLowerCase))
      throw new IllegalStateException(
        s"change feed across a PARTITION EVOLUTION of $tablePath " +
        s"(${mFrom.partCols.mkString(",")} → ${mTo.partCols.mkString(",")}): " +
        "the evolution itself changes no rows — read windows on either " +
        "side of it, or re-bootstrap the consumer")
    val keysAll = (mFrom.parts.keySet ++ mTo.parts.keySet).toSeq.sorted
    val legs: Seq[DataFrame] = keysAll.flatMap { k =>
      (mFrom.parts.get(k), mTo.parts.get(k)) match {
        case (Some(f), Some(t)) if f == t => None // untouched partition
        case (Some((_, pinF)), Some((relT, pinT))) =>
          val childPath = Paths.get(tablePath, relT).toString
          // pins are ABSOLUTE child commits — resolve them directly
          // (a distance-from-live window shifts under a concurrent
          // child commit landing mid-call)
          if (pinF < pinT)
            Some(Scd1Merge.readChangesAtCommits(spark, childPath,
              keysOfFeed, pinF, pinT))
          else {
            // REVERSE window — a parent RESTORE moved the pin
            // backward: the forward child diff pinT→pinF, inverted
            // (inserts⇄deletes, updates swap with their preimages) —
            // same O(changed buckets) cost, and exactly the feed a
            // downstream consumer must apply to follow the restore
            val fwd = Scd1Merge.readChangesAtCommits(spark, childPath,
              keysOfFeed, pinT, pinF)
            Some(fwd.withColumn("_change_type",
              when(col("_change_type") === "insert", lit("delete"))
                .when(col("_change_type") === "delete", lit("insert"))
                .when(col("_change_type") === "update", lit("update_preimage"))
                .otherwise(lit("update"))))
          }
        case (None, Some((relT, pinT))) =>
          Some(childRead(spark, tablePath, relT, pinT)
            .withColumn("_change_type", lit("insert")))
        case (Some((relF, pinF)), None) =>
          Some(childRead(spark, tablePath, relF, pinF)
            .withColumn("_change_type", lit("delete")))
        case (None, None) => None
      }
    }
    if (legs.isEmpty)
      readAt(spark, tablePath, mTo).limit(0)
        .withColumn("_change_type", lit("insert")).limit(0)
    else legs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Partitions of `m` whose value satisfies the partition-column
    * conjuncts of `predicate` — evaluated with Spark's own expression
    * semantics on a value-per-row local frame (KB-sized: one row per
    * partition), so pruning can never disagree with the row filter.
    *
    * The Column DSL's tree is unresolved ColumnNodes in Spark 4, so
    * the predicate is first RESOLVED against a child frame (driver-
    * only analysis, no job) — the same technique the bucket-stats
    * pruning uses ([[Scd1Merge.resolvedPredicate]]) — then split on
    * the typed And; conjuncts referencing only the partition column
    * prune, everything else is conservative can-match. */
  private def matchingPartitions(spark: SparkSession, tablePath: String,
                                 m: PManifest,
                                 predicate: Column): Seq[String] = {
    val values = m.parts.keys.toSeq.sorted
    if (values.isEmpty) return values
    val probe = m.parts.toSeq.sortBy(_._1).head match {
      case (_, (rel, pin)) => childRead(spark, tablePath, rel, pin)
    }
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val specs = m.partCols.map(parseSpec)
    val identSet = specs.collect { case IdentitySpec(c) => c.toLowerCase }.toSet
    // derived specs indexed by SOURCE column — conjuncts the user
    // writes on the real column (`WHERE order_ts >= X`) prune the
    // hidden layout through these
    val bySrc: Map[String, Seq[(PartSpec, Int)]] = specs.zipWithIndex
      .collect { case (sp, i) if !sp.isInstanceOf[IdentitySpec] => (sp, i) }
      .groupBy(_._1.srcCol.toLowerCase)
    val conjsAll = Scd1Merge.resolvedPredicate(probe, predicate).toSeq
      .flatMap(split)
    val frame = valueFrame(spark, m, specs, probe, values)
    val preds: Seq[Column] = conjsAll.flatMap { c =>
      val refs = c.references.map(_.name.toLowerCase).toSet
      if (refs.nonEmpty && refs.subsetOf(identSet))
        // the resolved conjunct's attributes carry the probe frame's
        // exprIds — rebind by NAME against the value frame
        Some(GraftExpressionBridge.column(c.transform {
          case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
        }))
      else if (refs.size == 1 && bySrc.contains(refs.head))
        derivedPruning(c, bySrc(refs.head))
      else None // conservative: conjunct can't prune
    }
    if (preds.isEmpty) return values
    import spark.implicits._
    preds.foldLeft(frame)(_.filter(_))
      .select(col("__pv")).as[String].collect().toSeq
  }

  /** One row per partition: identity columns TYPED under their real
    * names (conjuncts rebind by name), derived specs contribute the
    * partition value plus src-domain interval bounds — so pruning
    * always evaluates with Spark's own expression semantics
    * (KB-sized: one row per partition). */
  private def valueFrame(spark: SparkSession, m: PManifest,
      specs: Seq[PartSpec], probe: DataFrame,
      values: Seq[String]): DataFrame = {
    import spark.implicits._
    var frame = values.map(k => (k, valsOf(k))).toDF("__pv", "__vals")
    specs.zip(m.partTypes).zipWithIndex.foreach { case ((sp, t), i) =>
      val v = element_at(col("__vals"), i + 1).cast(t)
      val srcType = probe.schema.fields
        .find(_.name.equalsIgnoreCase(sp.srcCol)).map(_.dataType)
      sp match {
        case IdentitySpec(c) => frame = frame.withColumn(c, v)
        case TruncSpec(u, _) =>
          // [lo, hix) — the period's half-open interval in the SOURCE
          // domain (hix = next period start, exact for exclusive
          // bounds; a kept-on-boundary partition is conservative)
          val lo = u match {
            case "month" => to_date(concat(v, lit("-01")))
            case "year" => to_date(concat(v, lit("-01-01")))
            case _ => to_date(v)
          }
          val hix = u match {
            case "month" => add_months(lo, 1)
            case "year" => add_months(lo, 12)
            case _ => date_add(lo, 1)
          }
          frame = frame
            .withColumn(s"__lo_$i", srcType.map(lo.cast(_)).getOrElse(lo))
            .withColumn(s"__hix_$i", srcType.map(hix.cast(_)).getOrElse(hix))
        case BucketSpec(_, _) =>
          frame = frame.withColumn(s"__bv_$i", v)
      }
    }
    frame.drop("__vals")
  }

  /** Partitions where `predicate` provably holds for EVERY possible
    * row — the whole-partition-DROP projection. OPPOSITE polarity to
    * [[matchingPartitions]]: a pruned READ may conservatively
    * over-KEEP, but a metadata drop must never over-DROP, so every
    * conjunct must be exactly decidable on the partition layout —
    * identity conjuncts evaluate exactly on the value frame, trunc
    * ranges map through FULL-interval containment, and anything else
    * (non-partition columns, bucket specs, equality on month/year) is
    * REJECTED loudly instead of silently widening the drop set. */
  private def containedPartitions(spark: SparkSession, tablePath: String,
      m: PManifest, predicate: Column): Seq[String] = {
    val values = m.parts.keys.toSeq.sorted
    if (values.isEmpty) return values
    val probe = m.parts.toSeq.sortBy(_._1).head match {
      case (_, (rel, pin)) => childRead(spark, tablePath, rel, pin)
    }
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val specs = m.partCols.map(parseSpec)
    val identSet = specs.collect { case IdentitySpec(c) => c.toLowerCase }.toSet
    val bySrc: Map[String, Seq[(PartSpec, Int)]] = specs.zipWithIndex
      .collect { case (sp, i) if !sp.isInstanceOf[IdentitySpec] => (sp, i) }
      .groupBy(_._1.srcCol.toLowerCase)
    val layoutCols = identSet ++ bySrc.keySet
    val conjsAll = Scd1Merge.resolvedPredicate(probe, predicate).toSeq
      .flatMap(split)
      // the optimizer's implied IS NOT NULL on a layout column is
      // trivially true (partition sources are non-null merge keys)
      .filterNot {
        case IsNotNull(a: AttributeReference) =>
          layoutCols.contains(a.name.toLowerCase)
        case _ => false
      }
    require(conjsAll.nonEmpty,
      "dropPartitionsWhere: predicate did not resolve to any conjunct — " +
      "to clear the whole table use overwriteTable with an empty batch")
    val preds: Seq[Column] = conjsAll.map { c =>
      val refs = c.references.map(_.name.toLowerCase).toSet
      if (refs.nonEmpty && refs.subsetOf(identSet))
        GraftExpressionBridge.column(c.transform {
          case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
        })
      else if (refs.size == 1 && bySrc.contains(refs.head))
        derivedContainment(c, bySrc(refs.head)).getOrElse(
          throw new IllegalArgumentException(
            s"dropPartitionsWhere: conjunct ${c.sql} on derived partition " +
            "source is not whole-partition decidable (use ranges on a " +
            "trunc-partitioned column, or deleteWhere for row-level deletes)"))
      else throw new IllegalArgumentException(
        s"dropPartitionsWhere: conjunct ${c.sql} does not decide whole " +
        "partitions — it references non-partition columns (use deleteWhere " +
        "for row-level deletes)")
    }
    val frame = valueFrame(spark, m, specs, probe, values)
    import spark.implicits._
    preds.foldLeft(frame)(_.filter(_))
      .select(col("__pv")).as[String].collect().toSeq
  }

  /** Containment twin of [[derivedPruning]]: the conjunct must hold
    * for the WHOLE `[lo, hix)` interval. Date sources get exact
    * closed-bound handling (`d <= last-day` drops the month);
    * timestamps use the conservative open form. */
  private def derivedContainment(conj: Expression,
      specs: Seq[(PartSpec, Int)]): Option[Column] = {
    def L(l: Literal): Column = GraftExpressionBridge.column(l)
    val shape: Option[(String, Literal)] = conj match {
      case GreaterThan(_: AttributeReference, l: Literal) => Some(("gt", l))
      case GreaterThan(l: Literal, _: AttributeReference) => Some(("lt", l))
      case GreaterThanOrEqual(_: AttributeReference, l: Literal) => Some(("gte", l))
      case GreaterThanOrEqual(l: Literal, _: AttributeReference) => Some(("lte", l))
      case LessThan(_: AttributeReference, l: Literal) => Some(("lt", l))
      case LessThan(l: Literal, _: AttributeReference) => Some(("gt", l))
      case LessThanOrEqual(_: AttributeReference, l: Literal) => Some(("lte", l))
      case LessThanOrEqual(l: Literal, _: AttributeReference) => Some(("gte", l))
      case EqualTo(_: AttributeReference, l: Literal) => Some(("eq", l))
      case EqualTo(l: Literal, _: AttributeReference) => Some(("eq", l))
      case _ => None
    }
    shape.flatMap { case (op, l) =>
      val per: Seq[Option[Column]] = specs.map {
        case (TruncSpec(u, _), i) =>
          val lo = col(s"__lo_$i"); val hix = col(s"__hix_$i")
          val isDate = l.dataType == DateType
          op match {
            case "lt" => Some(hix <= L(l))
            case "lte" =>
              Some(if (isDate) hix <= date_add(L(l), 1) else hix <= L(l))
            case "gt" =>
              Some(if (isDate) lo > L(l) else lo > L(l))
            case "gte" => Some(lo >= L(l))
            case "eq" if u == "day" && isDate => Some(lo === L(l))
            case _ => None
          }
        case _ => None // bucket/identity: never whole-partition decidable here
      }
      val got = per.flatten
      if (got.isEmpty) None else Some(got.reduce(_ && _))
    }
  }

  /** Map a conjunct on a derived spec's SOURCE column onto a
    * partition-value predicate — the inclusive-projection step of
    * hidden partitioning. Trunc specs prune ranges/equality/IN via
    * interval overlap with `[lo, hix)`; bucket specs prune equality/
    * IN by hashing the literal. Shapes beyond (attr op literal) keep
    * the partition (None = no pruning — NEVER over-prunes). */
  private def derivedPruning(conj: Expression,
      specs: Seq[(PartSpec, Int)]): Option[Column] = {
    def L(l: Literal): Column = GraftExpressionBridge.column(l)
    // normalize to (op, literals) with the attribute on the left
    val shape: Option[(String, Seq[Literal])] = conj match {
      case EqualTo(_: AttributeReference, l: Literal) => Some(("eq", Seq(l)))
      case EqualTo(l: Literal, _: AttributeReference) => Some(("eq", Seq(l)))
      case EqualNullSafe(_: AttributeReference, l: Literal) => Some(("eq", Seq(l)))
      case EqualNullSafe(l: Literal, _: AttributeReference) => Some(("eq", Seq(l)))
      case GreaterThan(_: AttributeReference, l: Literal) => Some(("gt", Seq(l)))
      case GreaterThan(l: Literal, _: AttributeReference) => Some(("lt", Seq(l)))
      case GreaterThanOrEqual(_: AttributeReference, l: Literal) => Some(("gte", Seq(l)))
      case GreaterThanOrEqual(l: Literal, _: AttributeReference) => Some(("lte", Seq(l)))
      case LessThan(_: AttributeReference, l: Literal) => Some(("lt", Seq(l)))
      case LessThan(l: Literal, _: AttributeReference) => Some(("gt", Seq(l)))
      case LessThanOrEqual(_: AttributeReference, l: Literal) => Some(("lte", Seq(l)))
      case LessThanOrEqual(l: Literal, _: AttributeReference) => Some(("gte", Seq(l)))
      case In(_: AttributeReference, ls) if ls.forall(_.isInstanceOf[Literal]) =>
        Some(("eq", ls.map(_.asInstanceOf[Literal])))
      case InSet(a: AttributeReference, vs) =>
        Some(("eq", vs.toSeq.map(v => Literal.create(v, a.dataType))))
      case _ => None
    }
    shape.flatMap { case (op, lits) =>
      val per: Seq[Column] = specs.flatMap { case (sp, i) =>
        sp match {
          case TruncSpec(_, _) =>
            val lo = col(s"__lo_$i"); val hix = col(s"__hix_$i")
            op match {
              case "eq" => Some(lits.map(l => lo <= L(l) && L(l) < hix)
                .reduce(_ || _))
              case "gt" | "gte" => Some(hix > L(lits.head))
              case "lt" => Some(lo < L(lits.head))
              case "lte" => Some(lo <= L(lits.head))
              case _ => None
            }
          case BucketSpec(n, _) =>
            // hash(literal) is only the row's bucket when the types
            // MATCH — the optimizer coerced the literal to the source
            // column's type before this shape matched, so it does
            op match {
              case "eq" => Some(lits.map(l =>
                  col(s"__bv_$i") === pmod(hash(L(l)), lit(n)).cast("int"))
                .reduce(_ || _))
              case _ => None
            }
          case IdentitySpec(_) => None
        }
      }
      if (per.isEmpty) None else Some(per.reduce(_ && _))
    }
  }


  /** Filtered read with PARTITION PRUNING: whole child trees the
    * partition-column conjuncts rule out are discarded by PATH — no
    * file listed, no footer read — then each surviving child applies
    * the existing stats/bloom/bucket pruning via
    * [[Scd1Merge.readTableWhere]]. The full predicate still applies
    * row-level (pruning is an optimization, never a semantic). */
  def readTableWhere(spark: SparkSession, tablePath: String,
                     predicate: Column): DataFrame = {
    val m = requireTable(tablePath)
    val keep = matchingPartitions(spark, tablePath, m, predicate).toSet
    lastPartitionPrune = (keep.size, m.parts.size)
    if (keep.isEmpty) {
      // every partition pruned: empty frame with the FULL table schema
      // (from any child) so predicates on non-partition columns still
      // resolve
      val empty = m.parts.toSeq.sortBy(_._1).headOption match {
        case Some((_, (rel, pin))) =>
          childRead(spark, tablePath, rel, pin).limit(0)
        case None => readAt(spark, tablePath, m)
      }
      return empty.filter(predicate)
    }
    m.parts.toSeq.filter(p => keep(p._1)).sortBy(_._1)
      .map { case (_, (rel, pin)) =>
        val childPath = Paths.get(tablePath, rel).toString
        val liveCommit = Scd1Merge.tableCommit(childPath).getOrElse(pin)
        if (liveCommit == pin)
          Scd1Merge.readTableWhere(spark, childPath, predicate)
        else
          Scd1Merge.readTableAt(spark, childPath, liveCommit - pin)
            .filter(predicate)
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Dim-driven pruned read — the DPP shape: the partitions to scan
    * are only known after evaluating a (small) driving frame, so a
    * static planner must read everything. `partValues` is that
    * frame's partition-key column, collected (KB-sized — one value
    * per partition, the same round-trip Spark's own DPP broadcasts);
    * only the named partitions are read, by path. */
  def readTablePartitions(spark: SparkSession, tablePath: String,
                          partValues: DataFrame): DataFrame = {
    val m = requireTable(tablePath)
    // one column per partition column, same order as PARTITIONED BY
    val wanted = partValues.distinct().collect()
      .map(r => keyOf((0 until r.length).map(i => render(r.get(i))))).toSet
    val keep = m.parts.filter(p => wanted(p._1))
    lastPartitionPrune = (keep.size, m.parts.size)
    if (keep.isEmpty) return (m.parts.toSeq.sortBy(_._1).headOption match {
      case Some((_, (rel, pin))) => childRead(spark, tablePath, rel, pin).limit(0)
      case None => readAt(spark, tablePath, m)
    })
    keep.toSeq.sortBy(_._1)
      .map { case (_, (rel, pin)) => childRead(spark, tablePath, rel, pin) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Partition inventory: value, pinned child commit, live buckets —
    * the `SHOW PARTITIONS` surface. */
  def partitions(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    val m = requireTable(tablePath)
    val rows = m.parts.toSeq.sortBy(_._1).map { case (k, (rel, pin)) =>
      (valsOf(k), pin,
        Scd1Merge.tableCommit(Paths.get(tablePath, rel).toString).getOrElse(0))
    }
    val base = rows.toDF("__vals", "pinned_commit", "live_commit")
    m.partCols.zipWithIndex.foldLeft(base) { case (df, (c, i)) =>
      df.withColumn(c + "_value", element_at(col("__vals"), i + 1))
    }.drop("__vals")
      .select((m.partCols.map(c => col(c + "_value")) ++
        Seq(col("pinned_commit"), col("live_commit"))): _*)
  }

  // ---------------- maintenance ----------------

  /** Compact every partition's small bucket versions, then re-pin the
    * advanced child commits in ONE parent swap. Returns buckets
    * rewritten across all partitions. */
  def compact(spark: SparkSession, tablePath: String): Int = {
    requireTable(tablePath)
    withPLock(tablePath) {
      // live manifest inside the lock — a partition committed between
      // our pre-check and lock acquisition must be compacted, not lost
      val m = readPManifest(tablePath).get
      var total = 0
      val newPins = m.parts.map { case (v, (rel, pin)) =>
        val childPath = Paths.get(tablePath, rel).toString
        val expect = reconcileResidue(childPath, pin, "compact(partitioned)")
        Scd1Merge.withCommitFence(childPath, expect) {
          total += Scd1Merge.compact(spark, childPath)
        }
        v -> (rel, Scd1Merge.tableCommit(childPath).get)
      }
      commitPManifest(tablePath, m.copy(parts = newPins))
      total
    }
  }

  /** Reclaim: each live child vacuums its own history; child trees no
    * LIVE OR RETAINED parent references (dropped partitions aged out
    * of every retained parent manifest) are deleted wholesale. */
  def vacuum(tablePath: String,
             retain: Int = Scd1Merge.DefaultRetainVersions): Unit = {
    requireTable(tablePath)
    withPLock(tablePath) {
      // `referenced` MUST be computed from the in-lock manifest: a
      // stale pre-lock snapshot would treat a concurrently added
      // partition's child tree as unreferenced and delete its data
      val m = readPManifest(tablePath).get
      m.parts.values.foreach { case (rel, _) =>
        Scd1Merge.vacuum(Paths.get(tablePath, rel).toString, retain)
      }
      val hist = Paths.get(tablePath, PHistoryDir)
      // age PARENT history to the same retain window (flat-table
      // parity: vacuum(0) leaves only the live manifest) — what lets
      // a post-evolution vacuum actually release the old generation
      if (Files.exists(hist))
        graft.merge.FsList.list(hist).foreach { h =>
          h.getFileName.toString.toIntOption.foreach { n =>
            if (n > m.commit || n < m.commit - retain) Files.deleteIfExists(h)
          }
        }
      val referenced: Set[String] =
        m.parts.values.map(_._1).toSet ++ (
          if (!Files.exists(hist)) Set.empty[String]
          else graft.merge.FsList.list(hist)
            .filter(_.getFileName.toString.toIntOption.isDefined)
            .flatMap(p => parse(p).parts.values.map(_._1)).toSet)
      def rm(x: Path): Unit = {
        if (Files.isDirectory(x))
          graft.merge.FsList.list(x).foreach(rm)
        Files.deleteIfExists(x)
      }
      graft.merge.FsList.list(Paths.get(tablePath)).foreach { p =>
        val n = p.getFileName.toString
        // partition dirs: legacy "p=<v>" or multi-col "<c>=<v>,..." —
        // anything with "=" that is not an internal "_graft_*" file
        if (n.contains("=") && !n.startsWith("_") && !referenced.contains(n))
          rm(p)
        // generation dirs (partition evolution): sweep unreferenced
        // children inside, then the dir itself once empty
        else if (n.matches("gen\\d+") && Files.isDirectory(p)) {
          graft.merge.FsList.list(p).foreach { c =>
            if (!referenced.contains(s"$n/${c.getFileName}")) rm(c)
          }
          if (graft.merge.FsList.list(p).isEmpty) Files.deleteIfExists(p)
        }
      }
    }
  }

  /** Table metadata accessors (SQL/DSv2 routing). */
  def tableKeys(tablePath: String): Option[Seq[String]] =
    readPManifest(tablePath).map(_.keys)
  def partitionColumn(tablePath: String): Option[String] =
    readPManifest(tablePath).map(_.partCols.mkString(","))
  def partitionColumns(tablePath: String): Option[Seq[String]] =
    readPManifest(tablePath).map(_.partCols)
  def tableCommit(tablePath: String): Option[Int] =
    readPManifest(tablePath).map(_.commit)
  /** Approximate live row count — the partitioned twin of
    * [[Scd1Merge.tableRowsEstimate]]: per-child manifest footer
    * counts, summed. None when any child predates the footer stats. */
  private[graft] def tableRowsEstimate(tablePath: String): Option[Long] =
    readPManifest(tablePath).flatMap { m =>
      val per = m.parts.values.toSeq.map { case (rel, _) =>
        Scd1Merge.tableRowsEstimate(Paths.get(tablePath, rel).toString)
      }
      if (per.exists(_.isEmpty)) None else Some(per.flatten.sum)
    }

  /** Live data bytes across pinned children — the partitioned twin of
    * [[Scd1Merge.tableDataBytes]] (CBO size estimate fuel). */
  private[graft] def tableDataBytes(tablePath: String): Option[Long] =
    readPManifest(tablePath).map(_.parts.values.map { case (rel, _) =>
      Scd1Merge.tableDataBytes(
        Paths.get(tablePath, rel).toString).getOrElse(0L)
    }.sum)

  /** Metadata-only aggregates over the partitioned layout: every
    * pinned child must answer ([[Scd1Merge.statsAggregate]]'s bail
    * rules per child), then counts sum and extremes fold across
    * children — still zero data files, O(partitions × buckets) driver
    * metadata. None = some child can't answer → real scan. */
  private[graft] def statsAggregate(spark: SparkSession, tablePath: String,
      specs: Seq[(String, String)]): Option[Seq[Any]] =
    readPManifest(tablePath).flatMap { m =>
      val perChild = m.parts.toSeq.map { case (_, (rel, _)) =>
        Scd1Merge.statsAggregate(spark,
          Paths.get(tablePath, rel).toString, specs)
      }
      if (perChild.exists(_.isEmpty)) None
      else if (perChild.isEmpty)
        // no partitions: COUNT = 0, extremes NULL
        Some(specs.map { case ("count", _) => 0L.asInstanceOf[Any]; case _ => null })
      else Some(specs.indices.map { i =>
        val col = perChild.map(_.get(i))
        specs(i) match {
          case ("count", _) => col.map(_.asInstanceOf[Long]).sum.asInstanceOf[Any]
          case (op, _) =>
            val nonNull = col.filter(_ != null)
            if (nonNull.isEmpty) null
            else {
              def lt(a: Any, b: Any): Boolean =
                a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
              if (op == "min") nonNull.reduce((a, b) => if (lt(a, b)) a else b)
              else nonNull.reduce((a, b) => if (lt(a, b)) b else a)
            }
        }
      })
    }

  /** Predicate DELETE with partition pruning FIRST: only partitions
    * the partition-column conjuncts can match are visited at all
    * (each through the child's own stats-pruned bucket rewrite), then
    * one parent swap re-pins the changed children. The 100 TB shape:
    * `DELETE WHERE month = X AND ...` touches exactly one child tree.
    * Returns rows deleted. */
  def deleteWhere(spark: SparkSession, tablePath: String,
                  predicate: Column): Long = {
    requireTable(tablePath)
    withPLock(tablePath) {
      // manifest read INSIDE the lock: a partition committed by a
      // concurrent writer before we acquired it must survive the swap
      val m = readPManifest(tablePath).get
      val keep = matchingPartitions(spark, tablePath, m, predicate).toSet
      lastPartitionPrune = (keep.size, m.parts.size)
      var n = 0L
      val newPins = m.parts.map { case (v, (rel, pin)) =>
        if (!keep(v)) v -> (rel, pin)
        else {
          val childPath = Paths.get(tablePath, rel).toString
          val expect =
            reconcileResidue(childPath, pin, "deleteWhere(partitioned)")
          Scd1Merge.withCommitFence(childPath, expect) {
            n += Scd1Merge.delete(spark, childPath, m.keys, predicate)
          }
          v -> (rel, Scd1Merge.tableCommit(childPath).get)
        }
      }
      commitPManifest(tablePath, m.copy(parts = newPins))
      n
    }
  }

  /** Predicate UPDATE with partition pruning first — the
    * [[deleteWhere]] shape over [[Scd1Merge.update]]. The partition
    * column itself cannot be SET (it is a merge key; a partition move
    * is a delete + insert). Returns rows updated. */
  def updateWhere(spark: SparkSession, tablePath: String,
                  predicate: Column,
                  set: Map[String, Column]): Long = {
    val m = requireTable(tablePath)
    if (m.constraints.nonEmpty) {
      // parent-level post-image pre-check (pruned, matched rows only)
      val matched = readTableWhere(spark, tablePath, predicate)
        .filter(coalesce(predicate, lit(false)))
      val post = set.foldLeft(matched) { case (df, (c, v)) =>
        df.withColumn(c, v) }
      Scd1Merge.enforceCheck(spark, tablePath, m.constraints, post,
        "updateWhere(partitioned)")
    }
    withPLock(tablePath) {
      // re-read inside the lock (deleteWhere posture): stale pins must
      // never replace a concurrently committed partition
      val lm = readPManifest(tablePath).get
      val keep = matchingPartitions(spark, tablePath, lm, predicate).toSet
      lastPartitionPrune = (keep.size, lm.parts.size)
      var n = 0L
      val newPins = lm.parts.map { case (v, (rel, pin)) =>
        if (!keep(v)) v -> (rel, pin)
        else {
          val childPath = Paths.get(tablePath, rel).toString
          val expect =
            reconcileResidue(childPath, pin, "updateWhere(partitioned)")
          Scd1Merge.withCommitFence(childPath, expect) {
            n += Scd1Merge.update(spark, childPath, lm.keys, predicate, set)
          }
          v -> (rel, Scd1Merge.tableCommit(childPath).get)
        }
      }
      commitPManifest(tablePath, lm.copy(parts = newPins))
      n
    }
  }

  /** Parent-level CHECK constraint (the partitioned twin of
    * [[Scd1Merge.addConstraint]]): validated once per incoming batch
    * before ANY child write, so new partitions inherit enforcement
    * automatically — the check never lives in the children. ADD
    * validates all existing rows first (one partitioned scan). */
  def addConstraint(spark: SparkSession, tablePath: String,
                    name: String, exprSql: String): Unit = {
    require(name.nonEmpty && !name.exists(c => c == ',' || c == ':'),
      s"addConstraint: name '$name' must be non-empty, without ',' or ':'")
    requireTable(tablePath)
    withPLock(tablePath) {
      val live = readPManifest(tablePath).get
      require(!live.constraints.keys.exists(_.equalsIgnoreCase(name)),
        s"addConstraint: constraint '$name' already exists on $tablePath")
      Scd1Merge.enforceCheck(spark, tablePath, Map(name -> exprSql),
        readAt(spark, tablePath, live), "addConstraint(existing rows)")
      commitPManifest(tablePath,
        live.copy(constraints = live.constraints + (name -> exprSql)))
    }
  }

  /** Drop a parent-level constraint — loud on an unknown name. */
  def dropConstraint(spark: SparkSession, tablePath: String,
                     name: String): Unit = {
    requireTable(tablePath)
    withPLock(tablePath) {
      val live = readPManifest(tablePath).get
      val key = live.constraints.keys.find(_.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(
          s"dropConstraint: no constraint '$name' on $tablePath " +
          s"(have: ${live.constraints.keys.toSeq.sorted.mkString(",")})"))
      commitPManifest(tablePath,
        live.copy(constraints = live.constraints - key))
    }
  }

  def tableConstraints(tablePath: String): Map[String, String] =
    readPManifest(tablePath).map(_.constraints).getOrElse(Map.empty)
  def lastCommitTs(tablePath: String): Option[Long] =
    readPManifest(tablePath).map(_.ts).filter(_ > 0)

  /** CDC batch over the partitioned layout ([[Scd1Merge.applyCdc]]
    * semantics: `opCol` = upsert/delete, one crash-safe commit): ops
    * ROUTE to their partitions — every CDC row, deletes included,
    * carries its partition identity because the partition source
    * columns are merge keys — so each touched partition applies its
    * slice through the child's own applyCdc and ONE atomic parent
    * swap makes the whole batch visible. All-delete slices aimed at a
    * partition that does not exist are dropped (nothing to delete —
    * the flat engine's no-target MERGE posture), never creating an
    * empty partition. The SQL MERGE surface (all clause forms) lowers
    * onto this for partitioned targets. */
  def applyCdc(spark: SparkSession, tablePath: String, source: DataFrame,
               keys: Seq[String], opCol: String = "_op",
               retainVersions: Int = Scd1Merge.DefaultRetainVersions): Unit = {
    require(source.columns.contains(opCol),
      s"applyCdc: source must carry the operation column '$opCol'")
    withPLock(tablePath) {
      val live = requireTable(tablePath)
      require(live.keys.map(_.toLowerCase).toSet == keys.map(_.toLowerCase).toSet,
        s"table keys are ${live.keys.mkString(",")}, got ${keys.mkString(",")}")
      Scd1Merge.enforceCheck(spark, tablePath, live.constraints,
        source.filter(col(opCol) =!= "delete").drop(opCol),
        "applyCdc(partitioned)")
      val newPins = touchedKeys(source, live).flatMap { vals =>
        val key = keyOf(vals)
        val sub = source.filter(partEq(live, vals))
        val existing = live.parts.contains(key)
        if (!existing &&
            sub.filter(col(opCol) =!= "delete").limit(1).isEmpty)
          None // deletes into a partition that never existed: no-op
        else {
          val rel = live.parts.get(key).map(_._1)
            .getOrElse(freshChildRel(tablePath, live, vals))
          val childPath = Paths.get(tablePath, rel).toString
          val expect = live.parts.get(key) match {
            case Some((_, pin)) =>
              reconcileResidue(childPath, pin, "applyCdc(partitioned)")
            case None => 0 // freshChildRel: the dir is unoccupied
          }
          Scd1Merge.withCommitFence(childPath, expect) {
            Scd1Merge.applyCdc(spark, childPath, sub, keys, opCol,
              live.numBuckets, retainVersions)
          }
          Some(key -> (rel, Scd1Merge.tableCommit(childPath).get))
        }
      }.toMap
      if (newPins.nonEmpty)
        commitPManifest(tablePath, live.copy(parts = live.parts ++ newPins))
      ()
    }
  }

  /** RESTORE — roll the live table back to the parent snapshot
    * `commitsBack` parent commits ago AS A NEW PARENT COMMIT (the
    * flat-table [[Scd1Merge.restore]] contract: the table stays
    * live, history after the restore point stays readable, and the
    * change feed across the restore is the reverse diff). A restore
    * is O(partitions) driver METADATA — the old pin set re-commits
    * forward; no child table is touched and no data moves, which is
    * exactly what makes it a sane operation on a 100 TB fact. Every
    * pinned child snapshot is validated STILL READABLE before the
    * swap ([[Scd1Merge.snapshotReadable]] — manifest retained, dirs
    * unswept); a child vacuumed past its pin fails loudly with the
    * partition named and the live table untouched (all-or-nothing).
    * Partitions created AFTER the restore point simply drop out of
    * the pin set (their child dirs stay on disk, unreferenced — the
    * same posture as [[dropPartitionsWhere]]'s metadata-only drop). */
  def restore(tablePath: String, commitsBack: Int): Int = {
    require(commitsBack >= 1, s"restore needs commitsBack >= 1, got $commitsBack")
    withPLock(tablePath) {
      val live = requireTable(tablePath)
      val target = parentAt(tablePath, live, commitsBack)
      target.parts.toSeq.sortBy(_._1).foreach { case (k, (rel, pin)) =>
        val childPath = Paths.get(tablePath, rel).toString
        val problem = Scd1Merge.tableCommit(childPath) match {
          case None => Some("child table has no manifest")
          case Some(liveC) => Scd1Merge.snapshotReadable(childPath, liveC - pin)
        }
        problem.foreach(r => throw new IllegalStateException(
          s"restore: partition ${valsOf(k).mkString("/")} cannot serve " +
          s"pinned child commit $pin — $r (raise child retention to keep " +
          "a deeper restore horizon)"))
      }
      commitPManifest(tablePath, target).commit
    }
  }

  /** SHALLOW CLONE of the whole partitioned table — each child cloned
    * AT ITS PINNED COMMIT ([[Scd1Merge.cloneShallow]]'s symlinked
    * zero-copy fork; the pin, not child-live, so a crash residue
    * where a child ran ahead of the parent swap can never leak into
    * the clone), then one parent manifest pinning every clone at its
    * first commit. O(partitions × buckets) metadata, zero data
    * copied. Same retention caveat as the flat clone: the source's
    * GC cannot see the clone's references. */
  def cloneShallow(srcPath: String, dstPath: String): Int =
    cloneWith(srcPath, dstPath, deep = false)

  /** DEEP CLONE — the independent physical backup: every child's
    * pinned snapshot byte-copied ([[Scd1Merge.cloneDeep]]), immune to
    * source vacuum, sharing no storage. O(live table bytes). */
  def cloneDeep(srcPath: String, dstPath: String): Int =
    cloneWith(srcPath, dstPath, deep = true)

  private def cloneWith(srcPath: String, dstPath: String,
                        deep: Boolean): Int = {
    val src = requireTable(srcPath)
    if (tableExists(dstPath)) throw new IllegalStateException(
      s"clone: $dstPath is already a partitioned table")
    withPLock(dstPath) {
      val parts = src.parts.toSeq.sortBy(_._1).map { case (k, (rel, pin)) =>
        val childSrc = Paths.get(srcPath, rel).toString
        val childDst = Paths.get(dstPath, rel).toString
        val liveC = Scd1Merge.tableCommit(childSrc).getOrElse(
          throw new IllegalStateException(
            s"clone: partition ${valsOf(k).mkString("/")} has no child manifest"))
        val c =
          if (deep) Scd1Merge.cloneDeep(childSrc, childDst,
            commitsBack = liveC - pin)
          else Scd1Merge.cloneShallow(childSrc, childDst,
            commitsBack = liveC - pin)
        k -> (rel, c)
      }.toMap
      commitPManifest(dstPath, src.copy(parts = parts)).commit
    }
  }

  /** PARTITION EVOLUTION — re-lay the table out under a NEW partition
    * spec in ONE atomic parent swap (Iceberg's flagship; Delta makes
    * you rebuild the table by hand). The layout is physical, so this
    * is a FULL REWRITE — O(live table bytes), the same price every
    * engine pays; schedule it like the rare deliberate migration it
    * is. What the parent-manifest design buys: the rewrite lands into
    * a fresh GENERATION directory (`gen<N>/p=<val>/…` — never
    * colliding with the old children even when rendered values
    * overlap), readers keep serving the OLD layout until the single
    * parent swap, retained parent history still resolves the old pin
    * set (time travel ACROSS the evolution works), and the old
    * children become unreferenced garbage swept by [[vacuum]]. New
    * spec columns must be merge keys, the identity-spec argument
    * verbatim. Returns the number of partitions in the new layout. */
  def repartition(spark: SparkSession, tablePath: String,
                  newPartCols: Seq[String]): Int =
    withPLock(tablePath) {
      val live = requireTable(tablePath)
      val specs = newPartCols.map(parseSpec)
      require(specs.nonEmpty, "repartition needs at least one partition column")
      specs.foreach { sp =>
        require(live.keys.exists(_.equalsIgnoreCase(sp.srcCol)),
          s"partition column '${sp.spelled}': source '${sp.srcCol}' must be " +
          s"one of the merge keys (${live.keys.mkString(",")})")
      }
      require(specs.map(_.spelled.toLowerCase) !=
          live.partCols.map(c => parseSpec(c).spelled.toLowerCase),
        s"table is already partitioned by (${live.partCols.mkString(",")})")
      val source = readAt(spark, tablePath, live)
      val target = live.copy(partCols = specs.map(_.spelled),
        partTypes = specTypes(specs, source.schema), parts = Map.empty)
      val gen = f"gen${live.commit + 1}%04d"
      val newPins = touchedKeys(source, target).map { vals =>
        val rel = gen + "/" + partitionDirName(target, vals)
        val childPath = Paths.get(tablePath, rel).toString
        Scd1Merge.upsert(spark, childPath, source.filter(partEq(target, vals)),
          live.keys, live.numBuckets)
        keyOf(vals) -> (rel, Scd1Merge.tableCommit(childPath).get)
      }.toMap
      commitPManifest(tablePath, target.copy(parts = newPins))
      newPins.size
    }

  /** Z-ORDER / sort-cluster the whole partitioned table: every child
    * reclustered through the flat engine ([[Scd1Merge.recluster]] —
    * per-bucket sorted rewrites, content identical, clustering state
    * recorded), then ONE parent swap pins the new child commits, so
    * readers cross the re-layout atomically. Partition path-pruning
    * composes with the children's tightened min/max stats — the
    * two-level skipping a 100 TB fact wants (`month=X AND
    * clustered_col BETWEEN a,b` prunes partitions by path, then
    * buckets by stats). `dirtyOnly` re-clusters only children whose
    * data moved since their last clustering (the cheap scheduled
    * maintenance face). Returns buckets rewritten across all
    * partitions. A child whose pin LAGS its live commit (crash
    * residue from an interrupted batch) fails loudly — pinning its
    * post-recluster commit would surface the residue without the
    * interrupted batch's other partitions. */
  def recluster(spark: SparkSession, tablePath: String,
                sortCols: Seq[String], zOrderBits: Int = 0,
                dirtyOnly: Boolean = false,
                retainVersions: Int = Scd1Merge.DefaultRetainVersions): Int =
    withPLock(tablePath) {
      val live = requireTable(tablePath)
      var total = 0
      val newPins = live.parts.toSeq.sortBy(_._1).map { case (k, (rel, pin)) =>
        val childPath = Paths.get(tablePath, rel).toString
        val liveC = Scd1Merge.tableCommit(childPath).getOrElse(
          throw new IllegalStateException(
            s"recluster: partition ${valsOf(k).mkString("/")} has no child manifest"))
        if (liveC != pin) throw new IllegalStateException(
          s"recluster: partition ${valsOf(k).mkString("/")} pin $pin lags its " +
          s"live child commit $liveC (interrupted batch residue) — re-run " +
          "the interrupted batch first")
        total += Scd1Merge.recluster(spark, childPath, sortCols, zOrderBits,
          dirtyOnly, retainVersions)
        k -> (rel, Scd1Merge.tableCommit(childPath).get)
      }.toMap
      commitPManifest(tablePath, live.copy(parts = newPins))
      total
    }

  /** Parent commit log: commit, ts, partition count — the partitioned
    * twin of [[Scd1Merge.history]]. */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    requireTable(tablePath)
    val hist = Paths.get(tablePath, PHistoryDir)
    val rows =
      if (!Files.exists(hist)) Nil
      else graft.merge.FsList.list(hist)
        .flatMap(p => p.getFileName.toString.toIntOption.map(_ => parse(p)))
        .map(m => (m.commit, m.ts, m.parts.size))
        .sortBy(_._1)
    rows.toDF("commit", "commit_ts", "n_partitions")
  }
}
