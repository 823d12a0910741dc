package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational operator vocabulary as small, individually
  * testable functions (SURVEY.md §2, §7.1 step 2).
  *
  * Each function cites the reference occurrence it reproduces. All of
  * these compile down to built-in Catalyst operators — filters and
  * projections push into the parquet scan, joins against small
  * dimensions broadcast, aggregations run partial→final.
  */
object RelOps {

  /** P3 — derived column via split + array index
    * (ref: databricks_notebooks/silver_notebook.py:26). */
  def deriveSplitHead(df: DataFrame, src: String, sep: String, out: String): DataFrame =
    df.withColumn(out, split(col(src), sep).getItem(0))

  /** P4 — derived ratio column; Spark `/` on integral types yields
    * DoubleType, null on divide-by-zero
    * (ref: databricks_notebooks/silver_notebook.py:34). */
  def deriveRatio(df: DataFrame, num: String, den: String, out: String): DataFrame =
    df.withColumn(out, col(num) / col(den))

  /** A1 + P8 + O1 — the silver ad-hoc aggregate: group, sum with alias,
    * multi-column mixed-direction sort
    * (ref: databricks_notebooks/silver_notebook.py:47-50). */
  def adhocAgg(df: DataFrame, keys: Seq[String], valueCol: String, outName: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol)).as(outName))
      .orderBy(col(keys.head).asc, col(outName).desc)

  /** F1 — empty-with-schema (the `WHERE 1=0` schema trick; Catalyst
    * folds it to an empty LocalRelation, no file IO)
    * (ref: databricks_notebooks/gold_dim_branch.py:52-58,
    *  gold_dim_model.py:53-57). */
  def emptyWithSchema(df: DataFrame): DataFrame =
    df.filter(lit(1) === lit(0))

  /** J1 + F2 + F3 — the new/old split: left-outer join source against the
    * current sink and split on sink-key null-ness
    * (ref: databricks_notebooks/gold_dim_branch.py:79,92,105).
    *
    * Returns (oldRows, newRows): oldRows carry the sink's surrogate key;
    * newRows are source rows with no sink match. No broadcast hint on
    * the sink: a dim grows monotonically under SCD1, so a forced hint
    * bypasses the size check and OOMs at scale — AQE broadcasts while
    * the sink is actually small.
    */
  def newOldSplit(src: DataFrame, sink: DataFrame, naturalKey: String, sinkKey: String)
      : (DataFrame, DataFrame) = {
    val joined = src.join(
      sink, src(naturalKey) === sink(naturalKey), "left")
    val old = joined.filter(sink(sinkKey).isNotNull)
      .select(src.columns.toIndexedSeq.map(src(_)) :+ sink(sinkKey): _*)
    val fresh = joined.filter(sink(sinkKey).isNull)
      .select(src.columns.toIndexedSeq.map(src(_)): _*)
    (old, fresh)
  }

  /** Same split expressed with Spark's native semi/anti joins — the
    * idiomatic form the reference hand-rolls via J1+F2+F3; RelOpsSpec
    * proves the equivalence. */
  def newOldSplitNative(src: DataFrame, sink: DataFrame, naturalKey: String)
      : (DataFrame, DataFrame) = (
    src.join(sink, Seq(naturalKey), "left_semi"),
    src.join(sink, Seq(naturalKey), "left_anti")
  )

  /** U1 — positional union; the reference arranges both sides to the same
    * column order first (ref: gold_dim_branch.py:105,145,159). Prefer
    * [[unionByName]] in new code. */
  def positionalUnion(a: DataFrame, b: DataFrame): DataFrame = a.union(b)

  /** A3/S12 — global max scalar collected to the driver. This is an
    * action and a deliberate 1-row barrier (never a full collect)
    * (ref: gold_dim_branch.py:127-128). Returns `default` on empty/null. */
  def maxKeyScalar(df: DataFrame, key: String, default: Long): Long = {
    val r = df.agg(max(col(key).cast("long"))).first()
    if (r.isNullAt(0)) default else r.getLong(0)
  }

  /** A2 + F4 — duplicate-key audit: groupBy(key).count.filter("count > 1")
    * (ref: gold_dim_branch.py:200). Keeps the SQL-string predicate form. */
  def dupAudit(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).count().filter("count > 1")

  /** P7 — column drop (ref: gold_dim_branch.py:146). */
  def dropCols(df: DataFrame, cols: String*): DataFrame = df.drop(cols: _*)

  /** Salted equi-join — the manual skew-breaker for a hot-keyed LEFT
    * side joining a right side too big to broadcast: the left salts by
    * a deterministic hash of `saltOn` (any unique-ish column), the
    * right replicates every row across all `salts`, and the join key
    * grows by the salt — so one hot key's rows spread over `salts`
    * shuffle partitions instead of one straggler task. Semantics are
    * exactly the unsalted join for `inner`/`left`/`left_semi` (each
    * left row carries ONE salt and meets the full right side there);
    * right/full-outer would multiply unmatched right rows and is
    * rejected. Cost: right side ×salts — the standard trade.
    *
    * At 100 TB prefer AQE's skew-join split when it applies (sort-merge
    * post-shuffle); this operator is the plan-stable fallback AND the
    * only option when the skewed agg/join shape AQE won't rewrite
    * (e.g. a broadcast-ineligible hot-key join feeding a window). */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     saltOn: Column, salts: Int = 16,
                     joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer", "left_semi").contains(joinType),
      s"salted join undefined for $joinType (right rows are replicated)")
    val l = left.withColumn("__salt", pmod(hash(saltOn), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** JOIN-KEY SKEW REPORT — the diagnostic behind every salting/AQE
    * decision this engine documents (saltedEquiJoin, the sessionize
    * time-chunking, degree-ordered triangles): per-key multiplicities
    * summarized as exact count quantiles + the top-N heavy hitters +
    * the max/avg skew ratio, in one keyed aggregation.
    *
    * Output: `topN` rows (key rendering, its count, its rank) each
    * carrying the table-level summary columns (n_keys, n_rows,
    * max_cnt, p50/p90/p99_cnt, skew_ratio) — one frame a pipeline
    * can assert on ("skew_ratio < 20 or salt").
    *
    * Scale: ONE shuffle on the key for the counts; the summary is a
    * single-row aggregate over |keys| rows; the heavy hitters are a
    * global TakeOrdered (no full sort — Spark plans orderBy+limit as
    * TakeOrderedAndProject); the exact percentiles run on the
    * counts frame (|keys| rows, orders of magnitude below the table).
    * Deterministic: ties rank by the key rendering ascending. */
  def skewReport(df: DataFrame, keyCols: Seq[String], topN: Int = 5): DataFrame = {
    require(keyCols.nonEmpty && topN >= 1, "skewReport needs keys and topN >= 1")
    val keyRender = concat_ws("|", keyCols.map(c => col(c).cast("string")): _*)
    val counts = df.select(keyRender.as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
    val summary = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"),
      expr("percentile(cnt, 0.5)").as("p50_cnt"),
      expr("percentile(cnt, 0.9)").as("p90_cnt"),
      expr("percentile(cnt, 0.99)").as("p99_cnt"))
    val top = counts.orderBy(col("cnt").desc, col("key").asc).limit(topN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("key").asc)))
    top.crossJoin(summary)
      .withColumn("skew_ratio",
        col("max_cnt") / (col("n_rows").cast("double") / col("n_keys")))
      .select(col("rank"), col("key"), col("cnt"), col("n_keys"), col("n_rows"),
        col("max_cnt"), col("p50_cnt"), col("p90_cnt"), col("p99_cnt"),
        col("skew_ratio"))
  }

  /** Generic per-column table profiler (rows / nulls / exact distinct /
    * min / max per column) in ONE scan: each `(name, rendering)` pair
    * becomes a `(column, value)` row via an explode over a literal map,
    * then one hash aggregation keyed by column name — |cols| groups
    * regardless of table size, every measure partial-aggregatable
    * (`count(distinct)` expands map-side; the shuffle carries group
    * states, never rows). The caller chooses the string rendering per
    * column (e.g. decimal-quantized doubles) so min/max/distinct are
    * engine- and partitioning-independent. Null values survive the map
    * (only map KEYS must be non-null), so `n_nulls` is exact.
    *
    * Columns named in `numericCols` get NUMERIC min/max: the extreme is
    * picked by the double value of the rendering, not by lexicographic
    * string order (which reports '10.00' < '2.00'); the reported value
    * stays the caller's string rendering. All other columns order
    * lexicographically — correct for ISO dates and the intended
    * behavior for free-form strings. */
  def profile(df: DataFrame, cols: Seq[(String, Column)],
              numericCols: Set[String] = Set.empty): DataFrame = {
    val mapArgs = cols.flatMap { case (n, c) => Seq(lit(n), c.cast("string")) }
    // two-level: dedup to (column, value, multiplicity) first, then
    // fold the per-value rows. A single mixed distinct/non-distinct
    // aggregate makes Catalyst Expand every row ×2 and shuffle the
    // doubled raw stream; here the first groupBy partial-aggregates
    // map-side, so the shuffle carries distinct pairs (bounded by
    // cardinality, not row count) — TaxProbe measured the rewrite
    // 14 s → ~4 s isolated on 600k×10 cells at sf0.1. Every measure
    // derives exactly from the pair multiplicities (count of non-null
    // `value` rows = distinct non-nulls, Spark countDistinct
    // semantics; the null group survives with its own multiplicity).
    // min/max ordering key: a (double, string) struct — numeric columns
    // compare by the parsed double (string field only tie-breaks equal
    // values), everything else by a constant double then the string.
    // Struct comparison is field-lexicographic, so ONE uniform agg
    // expression serves both families; null values are excluded the
    // SQL way (the whole struct is null, min/max skip it). Computed on
    // the DEDUPED pairs, so the extra struct costs O(cardinality).
    val isNum =
      if (numericCols.isEmpty) lit(false)
      else col("column").isin(numericCols.toSeq: _*)
    val ordKey = when(isNum, col("value").cast("double")).otherwise(lit(0.0))
    val sortable = when(col("value").isNotNull,
      struct(ordKey.as("o"), col("value").as("v")))
    df.select(explode(map(mapArgs: _*)).as(Seq("column", "value")))
      .groupBy(col("column"), col("value"))
      .agg(count(lit(1)).as("__mult"))
      .groupBy(col("column"))
      .agg(sum(col("__mult")).as("n_rows"),
        sum(when(col("value").isNull, col("__mult")).otherwise(0L)).as("n_nulls"),
        count(col("value")).as("n_distinct"),
        min(sortable).getField("v").as("min_val"),
        max(sortable).getField("v").as("max_val"))
  }
}
