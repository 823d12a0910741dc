package graft.sql

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** DISK-PERSISTED name catalog — what makes the SQL surface real
  * across JVM restarts. Without it, registered short names, `SHOW
  * TABLES` contents, and MV-rewrite arming all lived in session
  * memory: a fresh session could not resolve yesterday's names, and a
  * plain aggregate would silently skip the MV until someone ran
  * REFRESH. With a root configured, [[GraftTables]] reads THROUGH this
  * catalog on a memory miss and writes through it on register, and
  * [[graft.plans.GraftMvRewrite]] AUTO-ARMS from the catalog's MV
  * inventory on first touch of a base — no re-registration ritual,
  * no REFRESH-to-arm.
  *
  * Two small files under the root, each rewritten atomically
  * (tmp + ATOMIC_MOVE — the engine's standard metadata recipe):
  *  - `_graft_catalog`     — `name=path` lines (url-encoded)
  *  - `_graft_catalog_mv`  — `mv<TAB>base` lines (url-encoded), the
  *    reverse index arming needs (the authoritative definition stays
  *    the MV's own `_graft_mv` sidecar; the catalog only answers
  *    "which MVs read this base?" without scanning the filesystem)
  *
  * The root comes from (first hit wins): an explicit [[setRoot]], the
  * system property `graft.catalog.root`, or the active session's
  * `spark.graft.catalog.root` conf. Unset = catalog disabled and
  * every call is a cheap no-op — the session-memory behavior.
  *
  * Concurrency: writes take a coarse JVM lock and re-read before
  * rewriting (read-modify-write of a tiny file); cross-JVM racers are
  * last-writer-wins per file — acceptable for a name registry (names
  * are administrative, not transactional data; the tables themselves
  * carry the real commit protocol). Reads stat the file's mtime and
  * reuse the parsed map until it changes. */
object GraftCatalog {

  @volatile private var explicitRoot: Option[String] = None

  def setRoot(dir: String): Unit = { explicitRoot = Some(dir); invalidate() }
  def clearRoot(): Unit = { explicitRoot = None; invalidate() }

  def root: Option[String] = explicitRoot
    .orElse(Option(System.getProperty("graft.catalog.root")))
    .orElse(try {
      org.apache.spark.sql.SparkSession.getActiveSession
        .flatMap(s => s.conf.getOption("spark.graft.catalog.root"))
    } catch { case _: Throwable => None })

  private def enc(s: String): String = java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")

  // ---- cached file-backed maps (mtime-validated) ----
  private final class Cached(fileName: String) {
    private var mtime = -1L
    private var path0 = ""
    private var value: Map[String, String] = Map.empty
    def file(r: String): Path = Paths.get(r, fileName)
    def get(): Map[String, String] = synchronized {
      root match {
        case None => Map.empty
        case Some(r) =>
          val f = file(r)
          val mt = if (Files.exists(f))
            Files.getLastModifiedTime(f).toMillis else -2L
          if (r != path0 || mt != mtime) {
            value =
              if (mt == -2L) Map.empty
              else Files.readString(f).split("\n").iterator
                .map(_.split("\t", 2)).collect {
                  case Array(k, v) => dec(k) -> dec(v)
                }.toMap
            mtime = mt; path0 = r
          }
          value
      }
    }
    def put(k: String, v: String): Unit = update(_ + (k -> v))
    def remove(k: String): Unit = update(_ - k)
    def removeValue(v: String): Unit = update(_.filterNot(_._2 == v))
    private def update(f: Map[String, String] => Map[String, String]): Unit =
      synchronized {
        root.foreach { r =>
          val next = f(get())
          Files.createDirectories(Paths.get(r))
          val tmp = Paths.get(r, fileName + ".tmp")
          Files.write(tmp, next.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${enc(k)}\t${enc(v)}" }
            .mkString("\n").getBytes(UTF_8),
            StandardOpenOption.CREATE, StandardOpenOption.WRITE,
            StandardOpenOption.TRUNCATE_EXISTING)
          Files.move(tmp, file(r), StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          invalidateThis()
        }
      }
    def invalidateThis(): Unit = { mtime = -1L; path0 = "" }
  }

  private val names = new Cached("_graft_catalog")
  private val mvs = new Cached("_graft_catalog_mv")
  private val topns = new Cached("_graft_catalog_topn")
  private val anns = new Cached("_graft_catalog_ann")

  private def invalidate(): Unit = {
    names.invalidateThis(); mvs.invalidateThis()
    topns.invalidateThis(); anns.invalidateThis()
  }

  // ---- name registry (GraftTables' durable layer) ----
  def putName(name: String, path: String): Unit =
    names.put(name.toLowerCase, path)
  def removeName(name: String): Unit = names.remove(name.toLowerCase)
  def nameToPath(name: String): Option[String] =
    names.get().get(name.toLowerCase)
  def allNames: Seq[String] = names.get().keys.toSeq

  // ---- MV inventory (GraftMvRewrite's arming source) ----
  def putMv(mvPath: String, basePath: String): Unit = mvs.put(mvPath, basePath)
  def removeMv(mvPath: String): Unit = mvs.remove(mvPath)
  /** Drop every inventory row that READS or IS `path` (DROP TABLE). */
  def removeMvsTouching(path: String): Unit = {
    mvs.remove(path); mvs.removeValue(path)
  }
  def mvsOver(basePath: String): Seq[String] =
    mvs.get().collect { case (mv, b) if b == basePath => mv }.toSeq.sorted
  /** Distinct base paths with at least one cataloged MV — the arming
    * probe's candidate set (empty when no root / no MVs). */
  def basesWithMvs: Seq[String] = mvs.get().values.toSeq.distinct.sorted

  // ---- top-N MV inventory (`_graft_catalog_topn`, mv → base) ----
  // What closes REFRESH ALL's cross-session hole: the sweep used to
  // enumerate top-N MVs from the SESSION registry only, so a fresh
  // session never saw a `_graft_topn` definition nobody had queried
  // or refreshed by path yet. The catalog row makes the inventory
  // durable; the authoritative definition stays the MV's own sidecar.
  def putTopNMv(mvPath: String, basePath: String): Unit =
    topns.put(mvPath, basePath)
  def removeTopNMv(mvPath: String): Unit = topns.remove(mvPath)
  def removeTopNMvsTouching(path: String): Unit = {
    topns.remove(path); topns.removeValue(path)
  }
  def allTopNMvs: Seq[String] = topns.get().keys.toSeq.sorted

  // ---- ANN index inventory (`_graft_catalog_ann`, base → index) ----
  // Same durability posture for vector indexes: the `_graft_ann`
  // marker arms lazily on first QUERY, but a maintenance sweep in a
  // fresh session needs the inventory without waiting for a query.
  def putAnnBase(basePath: String, indexPath: String): Unit =
    anns.put(basePath, indexPath)
  def removeAnnBase(basePath: String): Unit = anns.remove(basePath)
  def allAnnBases: Seq[String] = anns.get().keys.toSeq.sorted
}
