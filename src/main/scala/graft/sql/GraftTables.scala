package graft.sql

import graft.merge.Scd1Merge

/** Name → path registry for graft tables addressed from SQL.
  *
  * Two addressing modes, resolved by [[pathOf]]:
  *  - `graft`.`<path>` — by path, no registration needed (the Delta
  *    ``delta.`/path``` convention; the backtick-quoted path is one
  *    identifier part).
  *  - a registered short name — `GraftTables.register("dim_branch",
  *    path)` then `MERGE INTO dim_branch ...`.
  *
  * JVM-global (a ConcurrentHashMap), mirroring how the engine itself
  * addresses tables by path rather than through a session catalog; a
  * name that collides with a catalog table would shadow it for DML
  * statements only, so pick distinct names. */
object GraftTables {
  private val reg = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Registers in session memory AND (when a [[GraftCatalog]] root is
    * configured) writes through to the disk catalog — the name then
    * survives a JVM restart with no re-registration ritual. */
  def register(name: String, path: String): Unit = {
    reg.put(name.toLowerCase, path)
    GraftCatalog.putName(name, path)
  }

  def unregister(name: String): Unit = {
    reg.remove(name.toLowerCase)
    GraftCatalog.removeName(name)
  }

  /** Test seam: wipe the SESSION-memory registry only (the disk
    * catalog keeps its entries) — simulates a JVM restart. */
  private[graft] def clearMemory(): Unit = reg.clear()

  /** Registered short names (the catalog listing surface) — the
    * session's own plus every disk-cataloged name. */
  def registered: Seq[String] = {
    import scala.jdk.CollectionConverters._
    (reg.keySet().asScala.toSeq ++ GraftCatalog.allNames).distinct
  }

  /** Resolve a (possibly multipart) SQL identifier to a graft table
    * path. None = not a graft table (the statement is Spark's).
    *
    * The `graft.` namespace is only claimed when the second part is
    * PATH-LIKE (contains a `/`) or an actual graft manifest exists at
    * it — mirroring Delta, whose convention claims ``delta.`/path```
    * not every table in a database that happens to be named `delta`. A
    * real catalog database called `graft` therefore stays reachable:
    * `graft.sometable` falls through to Spark's resolver instead of
    * being hijacked into a "no manifest" failure. */
  def pathOf(parts: Seq[String]): Option[String] = parts match {
    case Seq(ns, p) if ns.equalsIgnoreCase("graft") &&
        (p.contains("/") || Scd1Merge.tableExists(p) ||
         graft.merge.PartitionedTable.tableExists(p)) => Some(p)
    case Seq(one) =>
      // read-through: session memory first, then the disk catalog (a
      // name registered by an earlier session resolves here directly)
      Option(reg.get(one.toLowerCase))
        .orElse(GraftCatalog.nameToPath(one))
    case _ => None
  }

  /** The table's merge keys, required present: DML on a graft table
    * needs the manifest's key line (every table the engine created has
    * one; a legacy pre-keys manifest migrates on its next API upsert). */
  private[sql] def keysOf(path: String): Seq[String] =
    Scd1Merge.tableKeys(path).filter(_.nonEmpty).getOrElse(
      throw new IllegalStateException(
        s"graft DML: $path has no manifest merge keys — not a graft table, " +
        "or a legacy manifest (run one API upsert to migrate)"))
}
