package graft.merge

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
  * Scale notes: the anti-join shuffles both sides on the merge keys
  * (or broadcasts the source when it is a small batch — the common
  * incremental case, left to AQE/the broadcast threshold). Nothing here
  * is driver-bound; the dup check is an aggregate, not a collect.
  */
object Scd1Merge {

  /** Replicates Delta's multiple-match error: fails the job if any merge
    * key occurs more than once in the source batch (quirk Q8,
    * gold_fact.py:56-59 would throw inside Delta). */
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
      .unionByName(source.select(target.columns.map(col): _*))
  }

  /** Merge + durable commit to a parquet table directory with an atomic
    * tmp-write-then-swap (never an in-place overwrite: `merged` reads
    * the very files the commit replaces — self-read hazard, SURVEY.md
    * §7.5; the swap also stands in for the reference's SQL transaction,
    * stored_procedure.sql:6).
    */
  def upsert(spark: SparkSession, tablePath: String, source: DataFrame, keys: Seq[String]): Unit = {
    val dir = Paths.get(tablePath)
    if (!Files.exists(dir)) {
      source.write.mode(SaveMode.Overwrite).parquet(tablePath)
      return
    }
    val target = spark.read.parquet(tablePath)
    val merged = merge(target, source, keys)
    val tmp = tablePath + ".tmp"
    val old = tablePath + ".old"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    // swap: current -> .old, tmp -> current, drop .old
    atomicSwap(Paths.get(tmp), dir, Paths.get(old))
  }

  private[graft] def atomicSwap(tmp: Path, live: Path, graveyard: Path): Unit = {
    deleteRecursively(graveyard)
    Files.move(live, graveyard, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable => // roll back so the table never vanishes
        Files.move(graveyard, live, StandardCopyOption.ATOMIC_MOVE)
        throw e
    }
    deleteRecursively(graveyard)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
}
