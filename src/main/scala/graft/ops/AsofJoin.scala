package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — for each left row, the latest right row at or
  * before the left row's time, per key. Spark has no native as-of
  * operator; the usual workarounds (range join + per-key aggregation,
  * or a windowed full materialization of right rows per left row)
  * explode at scale.
  *
  * This formulation is one union + ONE window pass: tag both sides,
  * sort within each key by (time, tag) with right rows first on ties
  * (so a right row at the exact same instant is visible — `>=`
  * semantics, matching e.g. DuckDB's ASOF JOIN), and carry the last
  * non-null right-side (time, payload…) struct forward. Each side
  * shuffles once on the key; state per row is O(1). At 100 TB the
  * window partitions by key — a skewed hot key is handled by the
  * time-chunked twin [[asofLeftChunked]].
  */
object AsofJoin {

  /** The carried struct is `(__t, payload…)`: a payload column named
    * `__t`, duplicated, or shadowing a left column would make
    * `col("__m.<p>")` resolve ambiguously — silent corruption. Fail
    * loudly at entry instead. */
  private def validatePayload(left: DataFrame, payloadCols: Seq[String]): Unit = {
    require(payloadCols.distinct == payloadCols,
      s"asof payloadCols must be distinct: $payloadCols")
    require(!payloadCols.contains("__t"),
      "asof payloadCols may not use the reserved name __t")
    val clash = payloadCols.intersect(left.columns.toSeq)
    require(clash.isEmpty,
      s"asof payloadCols collide with left columns: $clash")
  }

  /** @param left        probe side; all its columns are kept
    * @param right       build side: (keyCols, rightTime, payloadCols…) rows
    * @param keyCols     equality keys
    * @param leftTime    left event-time column (must be ordering-compatible
    *                    with rightTime)
    * @param rightTime   right event-time column
    * @param outCol      name of the appended matched-time column (null
    *                    when no right row at or before the left time)
    * @param payloadCols right columns carried onto each matched left row
    *                    (null when unmatched). Names must not collide
    *                    with left columns. If two right rows share a
    *                    (key, time), which payload wins is partition-
    *                    order-dependent — pre-aggregate the right side
    *                    to one row per (key, time) for determinism.
    */
  def asofLeft(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String, outCol: String,
               payloadCols: Seq[String] = Nil): DataFrame = {
    validatePayload(left, payloadCols)
    val l = left
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__tag", lit(1))
    val r = right
      .select((keyCols.map(col) :+ col(rightTime).as("__asof_t")) ++
        payloadCols.map(col): _*)
      // equi-join semantics: a NULL key matches nothing (SQL/DuckDB
      // ASOF parity) — window partitioning would group NULLs together
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__tag", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__asof_t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the carried state is ONE struct column regardless of payload
    // width — (matched time, payload…) — so the window pass stays O(1)
    // per row and a single `last(ignoreNulls)` running value
    val carried = struct(col("__asof_t").as("__t") +: payloadCols.map(col): _*)
    val matched = unioned
      .withColumn("__m",
        last(when(col("__tag") === 0, carried), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    matched
      .withColumn(outCol, col("__m.__t"))
      .withColumns(payloadCols.map(p => p -> col(s"__m.$p")).toMap)
      .drop("__asof_t", "__tag", "__m")
  }

  /** [[asofLeft]] with TIME-CHUNKED two-stage windows — the salting
    * pattern for per-key ordered scans (a hot key's run otherwise lands
    * on ONE task). The salt must follow time: a random salt would hide
    * right rows from later left rows in other salts.
    *
    * Stage 1 runs the asofLeft window within (key, chunk = time div
    * chunkSpan) — every partition is bounded by one key's rows in one
    * chunk. Stage 2 fills the rows a chunk-local pass can't see (left
    * rows before their chunk's first right row): the latest right
    * (time, payload) struct per (key, chunk) — `max_by`, an agg not a
    * window — is carried forward over per-chunk SUMMARY rows (one per
    * (key, chunk), O(chunks) shuffle), and a left row with no local
    * match coalesces to the carry from preceding chunks. Any right row
    * in an earlier chunk is ≤ its chunk end ≤ the left row's time, so
    * the fill is exact; output ≡ asofLeft (AsofJoinSpec pins it,
    * hot-key case included).
    *
    * Time columns must be numeric (castable to long, e.g. epoch µs);
    * `chunkSpan` is in the same unit.
    */
  /** FORWARD as-of: each left row matched to the EARLIEST right row
    * with time AT OR AFTER its own ("next maintenance window",
    * "first response after the alert"). Implemented by time NEGATION
    * over [[asofLeft]] — latest(−t ≤ −t_e) ⇔ earliest(t ≥ t_e) — so
    * the forward form inherits the backward one's single window pass,
    * null-key semantics and payload carry verbatim. */
  def asofLeftForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTime: String, rightTime: String, outCol: String,
                      payloadCols: Seq[String] = Nil): DataFrame = {
    val l = left.withColumn("__fwd_neg", -col(leftTime))
    val r = right.withColumn("__fwd_neg", -col(rightTime))
      .drop(rightTime)
    asofLeft(l.drop(leftTime), r, keyCols, "__fwd_neg", "__fwd_neg", outCol,
        payloadCols)
      .withColumn(outCol, -col(outCol))
      .withColumn(leftTime, -col("__fwd_neg"))
      .drop("__fwd_neg")
  }

  def asofLeftChunked(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                     leftTime: String, rightTime: String, outCol: String,
                     chunkSpan: Long, payloadCols: Seq[String] = Nil): DataFrame = {
    validatePayload(left, payloadCols)
    val l = left
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__tag", lit(1))
      .withColumn("__chunk", (col("__asof_t").cast("long") / lit(chunkSpan)).cast("long"))
    val r = right
      .select((keyCols.map(col) :+ col(rightTime).as("__asof_t")) ++
        payloadCols.map(col): _*)
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__tag", lit(0))
      .withColumn("__chunk", (col("__asof_t").cast("long") / lit(chunkSpan)).cast("long"))
    val carried = struct(col("__asof_t").as("__t") +: payloadCols.map(col): _*)

    // stage 1: the asofLeft pass, bounded per (key, chunk)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val wLoc = Window.partitionBy(keyCols.map(col) :+ col("__chunk"): _*)
      .orderBy(col("__asof_t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localMatched = unioned
      .withColumn("__m_loc",
        last(when(col("__tag") === 0, carried), ignoreNulls = true).over(wLoc))
      .filter(col("__tag") === 1)

    // stage 2: carry the last right struct across chunks on summary rows
    val rightSummary = r.groupBy(keyCols.map(col) :+ col("__chunk"): _*)
      .agg(max_by(carried, col("__asof_t")).as("__last_carry"))
    val allChunks = l.select(keyCols.map(col) :+ col("__chunk"): _*).distinct()
      .unionByName(r.select(keyCols.map(col) :+ col("__chunk"): _*).distinct())
      .distinct()
    val wChunk = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = allChunks
      .join(rightSummary, keyCols :+ "__chunk", "left")
      .withColumn("__m_prev", last(col("__last_carry"), ignoreNulls = true).over(wChunk))
      .select(keyCols.map(col) :+ col("__chunk") :+ col("__m_prev"): _*)

    localMatched.join(carries, keyCols :+ "__chunk", "left")
      .withColumn("__m", coalesce(col("__m_loc"), col("__m_prev")))
      .withColumn(outCol, col("__m.__t"))
      .withColumns(payloadCols.map(p => p -> col(s"__m.$p")).toMap)
      .drop("__asof_t", "__tag", "__chunk", "__m", "__m_loc", "__m_prev")
  }
}
