package graft.merge

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
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
      .unionByName(source.select(target.columns.map(col): _*))
  }

  /** Bucket count used when the caller doesn't choose one. At scale,
    * pick ≈ table_bytes / 256 MB at create time — NOT from
    * `optimizedPlan.stats` of the source frame: above a scan (joins,
    * windows) those estimates explode by orders of magnitude, and an
    * oversized bucket count shatters a small table into one-row files
    * (measured 2-3× slower pipeline commits). */
  val DefaultNumBuckets = 32

  private val BucketCol = "__bucket"

  /** Bucket-count metadata rides inside the table dir; the leading
    * underscore keeps Spark's file index from treating it as data. */
  private def metaPath(tablePath: String): Path =
    Paths.get(tablePath, "_graft_buckets")

  private def readNumBuckets(tablePath: String): Int = {
    val p = metaPath(tablePath)
    if (Files.exists(p)) new String(Files.readAllBytes(p)).trim.toInt
    else DefaultNumBuckets
  }

  private def withBucket(df: DataFrame, keys: Seq[String], numBuckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(hash(keys.map(col): _*), lit(numBuckets)))

  /** Read a bucketed (or legacy flat) table, hiding the layout column. */
  def readTable(spark: SparkSession, tablePath: String): DataFrame = {
    val df = spark.read.parquet(tablePath)
    if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df
  }

  /** Merge + durable commit to a hash-bucketed parquet table directory
    * (`tablePath/__bucket=N/`) rewriting ONLY the buckets the source
    * batch touches — the replacement for Delta MERGE's matched-file
    * rewrite. A full-table rewrite per merge is the classic 100 TB
    * killer: a 1k-row batch into a 100 TB fact would rewrite 100 TB.
    *
    * Commit: merged buckets are written to a `.tmp` dir, then each
    * touched bucket dir is swapped atomically (tmp-move-then-rollback;
    * never an in-place overwrite — `merged` reads the very files the
    * commit replaces, the self-read hazard of SURVEY.md §7.5; the swap
    * also stands in for the reference's SQL transaction,
    * stored_procedure.sql:6). Per-bucket swap is atomic; cross-bucket
    * atomicity rests on the documented single-writer assumption.
    */
  def upsert(spark: SparkSession, tablePath: String, source: DataFrame, keys: Seq[String],
             numBuckets: Int = 0): Unit = {
    val dir = Paths.get(tablePath)
    if (!Files.exists(dir)) {
      val nb = if (numBuckets > 0) numBuckets else DefaultNumBuckets
      withBucket(source, keys, nb)
        .write.partitionBy(BucketCol).mode(SaveMode.Overwrite).parquet(tablePath)
      Files.write(metaPath(tablePath), nb.toString.getBytes)
      return
    }
    // Legacy flat layout (written before bucketing existed): migrate by
    // merging into a fresh bucketed layout via full rewrite-and-swap —
    // readTable supports flat tables, so upsert must too.
    val isBucketed = {
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala
        .exists(_.getFileName.toString.startsWith(s"$BucketCol="))
    }
    if (!isBucketed) {
      val nbNew = if (numBuckets > 0) numBuckets else DefaultNumBuckets
      val merged = merge(readTable(spark, tablePath), source, keys)
      val tmpFlat = tablePath + ".tmp"
      withBucket(merged, keys, nbNew)
        .repartition(col(BucketCol))
        .write.partitionBy(BucketCol).mode(SaveMode.Overwrite).parquet(tmpFlat)
      atomicSwap(Paths.get(tmpFlat), dir, Paths.get(tablePath + ".old"))
      Files.write(metaPath(tablePath), nbNew.toString.getBytes)
      return
    }
    val nb = readNumBuckets(tablePath)
    if (numBuckets > 0 && numBuckets != nb)
      throw new IllegalArgumentException(
        s"table $tablePath is laid out with $nb buckets; re-bucketing to $numBuckets is not supported in-place")
    val bucketed = withBucket(source, keys, nb)
    // ONE probe job covers both pre-checks: per-bucket (touched set for
    // partition pruning) and per-key max multiplicity (the Q8
    // multiple-match error, same semantics as requireUniqueSourceKeys).
    val probe = bucketed
      .groupBy(col(BucketCol) +: keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .groupBy(col(BucketCol)).agg(max(col("__c")).as("__maxc"))
      .collect()
    if (probe.exists(_.getLong(1) > 1))
      throw new IllegalArgumentException(
        s"SCD1 merge aborted: duplicate source rows for merge key ${keys.mkString(",")}")
    val touched: Seq[Int] = probe.map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return // empty batch: nothing to merge or rewrite
    val target = spark.read.parquet(tablePath)
      .filter(col(BucketCol).isin(touched: _*))
    // dup check already done by the probe — plain anti-join + union
    val merged = target.join(bucketed, keys, "left_anti")
      .unionByName(bucketed.select(target.columns.map(col): _*))
    val tmp = tablePath + ".tmp"
    val old = tablePath + ".old"
    // repartition on the bucket column before the partitioned write:
    // without it every shuffle partition spills a sliver into every
    // bucket dir (partitions × buckets small files); with it each
    // bucket's data is co-located and lands as ~one file.
    merged.repartition(col(BucketCol))
      .write.partitionBy(BucketCol).mode(SaveMode.Overwrite).parquet(tmp)
    Files.createDirectories(Paths.get(old))
    touched.foreach { b =>
      val name = s"$BucketCol=$b"
      val tmpB = Paths.get(tmp, name)
      val liveB = Paths.get(tablePath, name)
      if (!Files.exists(tmpB))
        // every touched bucket holds >=1 source row, so the merged write
        // must produce its dir; a miss means the write went wrong.
        throw new IllegalStateException(s"bucket dir missing from merge output: $tmpB")
      if (Files.exists(liveB)) atomicSwap(tmpB, liveB, Paths.get(old, name))
      else Files.move(tmpB, liveB, StandardCopyOption.ATOMIC_MOVE)
    }
    deleteRecursively(Paths.get(tmp))
    deleteRecursively(Paths.get(old))
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
