package graft.pipeline

import graft.pipeline.IncrementalAgg.AggSpec
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** PERSISTED materialized-view definition — the `_graft_mv` file next
  * to the MV table's manifests, recording WHAT the MV maintains
  * (base table, group columns, summed measures, count column). This
  * is what makes the SQL MV lifecycle durable: `REFRESH MATERIALIZED
  * VIEW` in a NEW session reads the definition back, folds the base
  * commits the MV has not seen, and re-registers the query-rewrite
  * rule — no Scala-side state survives the session, the definition
  * does. Written atomically (tmp + move) like every other graft
  * metadata file. */
object MvDef {

  /** One of a JOIN MV's dim inputs: the dim side + its equi-join key
    * pair (the fact side rides `basePath`/`baseKeys`). A STAR MV
    * carries several. */
  final case class JoinSrc(dimPath: String, dimKeys: Seq[String],
                           fk: String, dk: String)

  /** `retain`: child-version history depth every MV write keeps —
    * the CDC contract a DOWNSTREAM consumer (an MV over this MV, a
    * feed reader) needs to lag without losing its window. Plumbed
    * from `CREATE ... RETAIN n` into bootstrap, every refresh, and
    * the tombstone sweep. */
  /** `auto`: write-through maintenance opt-in — the post-commit hook
    * ([[MvMaintenance]]) refreshes this MV immediately after every
    * commit to its base / dims. Persisted, so any later session's
    * hook honors it. */
  final case class Def(basePath: String, baseKeys: Seq[String], spec: AggSpec,
                       joins: Seq[JoinSrc] = Nil,
                       retain: Int = graft.merge.Scd1Merge.DefaultRetainVersions,
                       auto: Boolean = false)

  private val FileName = "_graft_mv"

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  // Read-through cache keyed by (fileKey, mtime, size) of the
  // definition file: the post-commit maintenance hook reads EVERY
  // known MV's definition on EVERY base commit (O(#MVs) metadata
  // reads per commit without it). Validated by a stat per read —
  // correct under cross-process writers because every writer lands
  // via tmp + ATOMIC_MOVE, which replaces the file's fileKey (inode)
  // even when the rewrite fits the same millisecond tick and byte
  // length — and updated eagerly by this JVM's own write().
  private val readCache = new java.util.concurrent.ConcurrentHashMap[
    String, ((String, Long, Long), Option[Def])]()

  /** Definition-file PARSES (cache misses) since JVM start — the
    * maintenance specs' pin that N commits to a base re-read zero
    * definitions (the `listingCount` pattern). */
  @volatile var parseCount: Long = 0L

  private def statKey(p: Path): Option[(String, Long, Long)] =
    try {
      val a = Files.readAttributes(
        p, classOf[java.nio.file.attribute.BasicFileAttributes])
      // fileKey (inode identity) is what closes the same-millisecond
      // same-size rewrite hole; on filesystems that return null for it
      // fall back to a CONTENT hash — dearer (one extra read per stat,
      // on a tiny definition file) but never a silently weaker
      // validator
      val fk = a.fileKey
      val ident =
        if (fk != null) fk.toString
        else {
          val md = java.security.MessageDigest.getInstance("SHA-256")
          java.util.Base64.getEncoder.encodeToString(
            md.digest(Files.readAllBytes(p)))
        }
      Some((ident, a.lastModifiedTime.toMillis, a.size))
    } catch { case _: java.io.IOException => None }

  def write(mvPath: String, d: Def): Unit = {
    val body = (Seq(
      s"base=${enc(d.basePath)}",
      s"keys=${d.baseKeys.map(enc).mkString(",")}",
      s"groups=${d.spec.groupCols.map(enc).mkString(",")}",
      s"sums=${d.spec.sums.map { case (m, o) => s"${enc(m)}:${enc(o)}" }.mkString(",")}",
      s"count=${enc(d.spec.countName)}") ++
      (if (d.retain != graft.merge.Scd1Merge.DefaultRetainVersions)
        Seq(s"retain=${d.retain}") else Nil) ++
      (if (d.auto) Seq("auto=true") else Nil) ++
      (if (d.spec.mins.nonEmpty)
        Seq(s"mins=${d.spec.mins.map { case (m, o) => s"${enc(m)}:${enc(o)}" }.mkString(",")}")
       else Nil) ++
      (if (d.spec.maxs.nonEmpty)
        Seq(s"maxs=${d.spec.maxs.map { case (m, o) => s"${enc(m)}:${enc(o)}" }.mkString(",")}")
       else Nil) ++
      (if (d.spec.sketches.nonEmpty)
        Seq(s"sketches=${d.spec.sketches.map { case (m, o) => s"${enc(m)}:${enc(o)}" }.mkString(",")}")
       else Nil) ++
      (if (d.spec.quantiles.nonEmpty)
        Seq(s"quantiles=${d.spec.quantiles.map { case (m, o) => s"${enc(m)}:${enc(o)}" }.mkString(",")}",
          s"samplekeys=${d.spec.sampleKeys.map(enc).mkString(",")}") ++
        (if (d.spec.qskK != graft.functions.QuantileSketch.DefaultK)
          Seq(s"qskk=${d.spec.qskK}") else Nil)
       else Nil) ++
      d.spec.filterSql.toSeq.map(f => s"filter=${enc(f)}") ++
      (if (d.spec.groupExprs.nonEmpty)
        Seq(s"groupexprs=${d.spec.groupExprs.toSeq.sortBy(_._1)
          .map { case (o, e) => s"${enc(o)}:${enc(e)}" }.mkString(",")}")
       else Nil) ++
      (d.joins match {
        // single dim: the legacy (pre-star) key names, so older
        // sessions' readers keep parsing these files
        case Seq(j) => Seq(
          s"dim=${enc(j.dimPath)}",
          s"dimkeys=${j.dimKeys.map(enc).mkString(",")}",
          s"fk=${enc(j.fk)}", s"dk=${enc(j.dk)}")
        case js => js.zipWithIndex.flatMap { case (j, i) => Seq(
          s"dim.$i=${enc(j.dimPath)}",
          s"dimkeys.$i=${j.dimKeys.map(enc).mkString(",")}",
          s"fk.$i=${enc(j.fk)}", s"dk.$i=${enc(j.dk)}") }
      })).mkString("\n")
    val tmp = Paths.get(mvPath, FileName + ".tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, body.getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(mvPath, FileName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    statKey(Paths.get(mvPath, FileName))
      .foreach(k => readCache.put(mvPath, (k, Some(d))))
  }

  def read(mvPath: String): Option[Def] = {
    val p = Paths.get(mvPath, FileName)
    val key = statKey(p)
    if (key.isEmpty) { readCache.remove(mvPath); return None }
    val hit = readCache.get(mvPath)
    if (hit != null && hit._1 == key.get) return hit._2
    val parsed = parse(p)
    readCache.put(mvPath, (key.get, parsed))
    parsed
  }

  private def parse(p: Path): Option[Def] = {
    if (!Files.exists(p)) return None
    parseCount += 1
    val kv = Files.readString(p).split("\n").iterator
      .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
    def list(k: String): Seq[String] =
      kv.getOrElse(k, "").split(",").iterator.filter(_.nonEmpty).map(dec).toSeq
    def pairs(k: String): Seq[(String, String)] =
      kv.getOrElse(k, "").split(",").iterator.filter(_.nonEmpty).map { s =>
        val Array(m, o) = s.split(":", 2); (dec(m), dec(o))
      }.toSeq
    val sums = pairs("sums")
    val joins: Seq[JoinSrc] =
      if (kv.contains("dim"))
        Seq(JoinSrc(dec(kv("dim")), list("dimkeys"),
          dec(kv("fk")), dec(kv("dk"))))
      else Iterator.from(0)
        .map(i => kv.get(s"dim.$i").map(d =>
          JoinSrc(dec(d), list(s"dimkeys.$i"),
            dec(kv(s"fk.$i")), dec(kv(s"dk.$i")))))
        .takeWhile(_.isDefined).flatten.toSeq
    val groupExprs = kv.getOrElse("groupexprs", "").split(",").iterator
      .filter(_.nonEmpty).map { s =>
        val Array(o, e) = s.split(":", 2); (dec(o), dec(e))
      }.toMap
    Some(Def(dec(kv("base")), list("keys"),
      AggSpec(list("groups"), sums, dec(kv("count")),
        kv.get("filter").map(dec), groupExprs,
        pairs("mins"), pairs("maxs"), pairs("sketches"),
        pairs("quantiles"), list("samplekeys"),
        qskK = kv.get("qskk").map(_.toInt)
          .getOrElse(graft.functions.QuantileSketch.DefaultK)), joins,
      retain = kv.get("retain").map(_.toInt)
        .getOrElse(graft.merge.Scd1Merge.DefaultRetainVersions),
      auto = kv.get("auto").exists(_.toBoolean)))
  }
}
