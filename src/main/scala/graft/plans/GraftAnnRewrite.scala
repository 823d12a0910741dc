package graft.plans

import graft.merge.Scd1Merge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Descending, EqualTo, Expression, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Join, JoinHint, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{broadcast, col, round, sum}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Transparent ANN-INDEX REWRITE for vector top-k: `ORDER BY
  * vec_cosine(vecCol, <literal query>) DESC LIMIT k` over a
  * registered corpus table is answered by probing its PERSISTED
  * IVF-PQ index ([[graft.similarity.Similarity.ivfPqIndexBuild]])
  * instead of scanning every vector — the [[GraftMvRewrite]] posture
  * applied to similarity search. At 100 TB the exact plan reads the
  * whole embedding column (dim floats × corpus) per query; the
  * rewritten plan reads nprobe cells' CODE ROWS (m ints per
  * candidate) plus candFactor·k exact vectors.
  *
  * REGISTRATION IS THE OPT-IN: index-served top-k is approximate
  * (recall < 1 by design — the judged entry pins the measured
  * recall), so the rule only ever fires on a base the user explicitly
  * registered via [[register]], and every gate failure falls through
  * to the exact scan:
  *
  *  - SHAPE: `Limit(k, Sort([s DESC], Project(items, scan)))` where
  *    `s` is an output of the Project aliasing
  *    `vec_cosine(<vecCol attr>, <foldable array literal>)`, the scan
  *    is the registered base's BARE parquet relation (no Filter — a
  *    filtered top-k changes which vectors are admissible, out of
  *    scope), and the literal's length equals the registered `dim`.
  *  - SNAPSHOT: the scan's file set equals the base's CURRENT live
  *    set — a time-travel read never rewrites.
  *  - FRESHNESS: the registration's commit stamp equals the base's
  *    current commit. A base write after the index build disables the
  *    rewrite (the index does not cover the new rows) until
  *    [[refresh]] re-stamps it — the caller's contract is to refresh
  *    only after [[graft.similarity.Similarity.ivfPqIndexUpdate]]
  *    (or a rebuild) has folded the base's new state in.
  *
  * The rewrite splices a LEFT-SEMI join against the ADC candidate set
  * UNDER the original Project — the query's own Sort/Limit and every
  * output exprId survive untouched, and the final ordering is the
  * EXACT cosine over the candidates (the probe only narrows the
  * rows). The per-query distance table is computed DRIVER-SIDE from
  * the collected model (nprobe × m × ksub doubles, KBs — the
  * broadcast-literal shape [[graft.similarity.Similarity.ivfPqTopKFromCodes]]
  * computes distributedly for query SETS), so the candidate plan is
  * one broadcast equi-join on (cell, sub, code) ints plus a
  * map-side-combinable sum — no vector math on the corpus side.
  *
  * A rewritten plan's Project child is a Join, which the SHAPE gate
  * rejects — the rule never re-fires on its own output. */
object GraftAnnRewrite extends Rule[LogicalPlan] {

  /** A registered ANN-served base: the IVF-PQ index at `indexPath`
    * covers the graft table at `basePath` as of `baseCommit` (with
    * `baseFiles` its live file set at registration — the snapshot
    * gate's reference). */
  final case class AnnReg(basePath: String, indexPath: String,
                          idCol: String, vecCol: String, dim: Int,
                          nprobe: Int, candFactor: Int,
                          baseCommit: Int, baseFiles: Set[String])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, AnnReg]()

  // ---- persistence: a `_graft_ann` marker INSIDE the corpus table
  // directory (the MvDef posture) makes the registration survive a
  // JVM restart — a later session's first matching query lazily arms
  // from disk ([[armFromDisk]]), with the per-query snapshot/
  // freshness gates still deciding whether the rewrite fires.
  private val ArmFileName = "_graft_ann"
  private val armedDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def persist(basePath: String, indexPath: String, idCol: String,
                      vecCol: String, dim: Int, nprobe: Int,
                      candFactor: Int, commit: Int): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
    val body = Seq(
      s"index=${enc(indexPath)}", s"id=${enc(idCol)}",
      s"vec=${enc(vecCol)}", s"dim=$dim", s"nprobe=$nprobe",
      s"candfactor=$candFactor", s"commit=$commit").mkString("\n")
    val tmp = Paths.get(basePath, ArmFileName + ".tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, Paths.get(basePath, ArmFileName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** AUTO-ARM from disk: walk a scan file's ancestor directories for
    * the `_graft_ann` marker; on first touch, register with the
    * PERSISTED covered-commit stamp (and the base's current files —
    * when the live commit differs from the stamp, the freshness gate
    * falls back until an index update re-stamps). Memoized per dir. */
  // negative memo: parquet dirs already probed without a marker — a
  // miss never re-probes this session (clear() resets; a marker
  // persisted by ANOTHER session mid-flight arms after a clear() or
  // restart, which is the restart-recovery contract anyway)
  private val probedMisses =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def armFromDisk(spark: SparkSession, files: Set[String]): Unit = {
    if (files.isEmpty) return
    val f0 = files.head.stripPrefix("file:")
    if (!probedMisses.add(java.nio.file.Paths.get(f0).getParent.toString))
      return
    var dir = java.nio.file.Paths.get(f0).getParent
    var depth = 0
    while (dir != null && depth < 5) {
      val marker = dir.resolve(ArmFileName)
      if (java.nio.file.Files.exists(marker)) {
        val base = dir.toString
        if (armedDirs.add(base) && !registry.containsKey(base)) {
          val kv = java.nio.file.Files.readString(marker).split("\n")
            .iterator.map(_.split("=", 2)).collect {
              case Array(k, v) => k -> v }.toMap
          try registry.put(base, AnnReg(base, dec(kv("index")),
            dec(kv("id")), dec(kv("vec")), kv("dim").toInt,
            kv("nprobe").toInt, kv("candfactor").toInt,
            kv("commit").toInt,
            Scd1Merge.readTable(spark, base).inputFiles.toSet))
          catch { case _: Exception => () } // malformed marker: skip
        }
        return
      }
      dir = dir.getParent; depth += 1
    }
  }

  /** Opt `basePath` into index-served top-k from `indexPath`. Stamps
    * the base's CURRENT commit + file snapshot (and persists the
    * registration inside the table directory, so it survives a
    * restart): call (or [[refresh]]) only when the index covers
    * exactly that state. */
  def register(spark: SparkSession, basePath: String, indexPath: String,
               idCol: String, vecCol: String, dim: Int,
               nprobe: Int = 4, candFactor: Int = 16): Unit = {
    val commit = Scd1Merge.tableCommit(basePath).getOrElse(
      throw new IllegalArgumentException(
        s"GraftAnnRewrite.register: $basePath is not a graft table"))
    val files = Scd1Merge.readTable(spark, basePath).inputFiles.toSet
    registry.put(basePath, AnnReg(basePath, indexPath, idCol, vecCol,
      dim, nprobe, candFactor, commit, files))
    persist(basePath, indexPath, idCol, vecCol, dim, nprobe,
      candFactor, commit)
  }

  /** Re-stamp after an index update/rebuild has folded the base's
    * new commits — until then a written-to base falls back to exact. */
  def refresh(spark: SparkSession, basePath: String): Unit = {
    val reg = Option(registry.get(basePath)).getOrElse(
      throw new IllegalArgumentException(
        s"GraftAnnRewrite.refresh: $basePath is not registered"))
    register(spark, basePath, reg.indexPath, reg.idCol, reg.vecCol,
      reg.dim, reg.nprobe, reg.candFactor)
  }

  /** Remove the registration AND its persisted marker. */
  def unregister(basePath: String): Unit = {
    registry.remove(basePath); armedDirs.remove(basePath)
    try java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(basePath, ArmFileName))
    catch { case _: Exception => () }
    ()
  }

  /** Session-state reset (registrations persisted on disk re-arm on
    * first touch — the restart simulation specs use exactly this). */
  def clear(): Unit =
    { registry.clear(); armedDirs.clear(); probedMisses.clear() }

  /** Rewrites applied since session start — plan-pin observability. */
  @volatile var rewriteCount: Long = 0L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan transformUp {
      case gl @ GlobalLimit(Literal(k: Int, _),
          LocalLimit(_, srt @ Sort(
            Seq(SortOrder(sref: AttributeReference, Descending, _, _)),
            true, proj: Project, _))) if k > 0 =>
        tryRewrite(k, sref, proj).map { newProj =>
          gl.withNewChildren(Seq(gl.child.withNewChildren(
            Seq(srt.withNewChildren(Seq(newProj))))))
        }.getOrElse(gl)
    }
  }

  /** The Project-level rewrite: locate the sort column's
    * `vec_cosine(vecCol, literal)` alias, gate, and splice the
    * candidate semi-join under the (otherwise untouched) Project. */
  private def tryRewrite(k: Int, sref: AttributeReference,
                         proj: Project): Option[LogicalPlan] = {
    // the scan: the registered base's bare relation, current snapshot
    val scan = proj.child match {
      case lr: LogicalRelation => lr
      case _ => return None
    }
    val files = scan.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.inputFiles.toSet
      case _ => return None
    }
    var reg = registry.values().stream().filter(r => r.baseFiles == files)
      .findFirst().orElse(null)
    if (reg == null) {
      // a registration persisted by an earlier session arms lazily
      armFromDisk(SparkSession.active, files)
      reg = registry.values().stream().filter(r => r.baseFiles == files)
        .findFirst().orElse(null)
      if (reg == null) return None
    }
    // FRESHNESS: the stamp must name the base's live commit
    if (!Scd1Merge.tableCommit(reg.basePath).contains(reg.baseCommit))
      return None
    // the sort column: an alias IN THIS Project over vec_cosine of
    // the registered vector column and a dim-length array literal
    val qv: Array[Float] = proj.projectList.collectFirst {
      case al @ Alias(graft.functions.CosineSimilarity(
          v: AttributeReference, q), _)
          if al.exprId == sref.exprId &&
            v.name.equalsIgnoreCase(reg.vecCol) &&
            scan.outputSet.contains(v) && q.foldable =>
        q.dataType match {
          case ArrayType(FloatType, _) =>
            val arr = q.eval().asInstanceOf[ArrayData]
            if (arr == null) return None
            arr.toFloatArray()
          case _ => return None
        }
    } match {
      case Some(a) if a.length == reg.dim => a
      case _ => return None
    }
    val idAttr = scan.output.find(_.name.equalsIgnoreCase(reg.idCol))
      .getOrElse(return None)
    val spark = SparkSession.active
    // ---- the candidate plan: driver-side distance table (KBs),
    // broadcast onto the persisted code rows, top candFactor·k by ADC
    val (cents, books) = graft.similarity.Similarity
      .ivfPqIndexModel(spark, reg.indexPath)
    def cosine(a: Array[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val probed = cents.zipWithIndex
      .map { case (c, i) => (cosine(qv, c), i) }
      .sortBy { case (s, i) => (-s, i) }.take(reg.nprobe).map(_._2)
    val mSub = books.length
    val dsub = reg.dim / mSub
    val dtRows = for {
      cell <- probed
      rq = qv.indices.map(i => qv(i) - cents(cell)(i))
      sub <- 0 until mSub
      sv = rq.slice(sub * dsub, (sub + 1) * dsub)
      (cw, code) <- books(sub).zipWithIndex
    } yield {
      var d2 = 0.0; var i = 0
      while (i < dsub) {
        val d = sv(i) - cw(i).toDouble; d2 += d * d; i += 1
      }
      (cell, sub, code, d2)
    }
    import spark.implicits._
    val dt = dtRows.toSeq.toDF("__cluster", "sub", "code", "__d2")
    val cands = Scd1Merge.readTable(spark, s"${reg.indexPath}/codes")
      .join(broadcast(dt), Seq("__cluster", "sub", "code"))
      .groupBy(col("vec_id"))
      // 1e-9-quantized ADC sums: partial-agg-order independence (the
      // ivfPqTopKFromCodes argument)
      .agg(round(sum(col("__d2")) * 1e9).cast("long").as("__adq"))
      .orderBy(col("__adq").asc, col("vec_id").asc)
      .limit(k * reg.candFactor)
      .select(col("vec_id"))
    // the OPTIMIZED subtree (not analyzed): the outer optimizer has
    // already run EliminateResolvedHint, so a spliced analyzed tree
    // would reach the planner with a raw ResolvedHint — internal error
    val candsPlan = cands.queryExecution.optimizedPlan
    val candId = candsPlan.output.head
    rewriteCount += 1
    logInfo(s"graft ANN rewrite: top-$k over ${reg.basePath} served " +
      s"from ${reg.indexPath} (commit ${reg.baseCommit}, " +
      s"${reg.nprobe} cells probed)")
    Some(proj.withNewChildren(Seq(Join(scan, candsPlan, LeftSemi,
      Some(EqualTo(idAttr, candId)), JoinHint.NONE))))
  }
}
