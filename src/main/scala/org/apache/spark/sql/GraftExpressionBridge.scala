package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst-Expression bridge for graft's native expressions.
  *
  * Spark 4 moved Column onto ColumnNode and made the conversion
  * helpers (`classic.ExpressionUtils`) private[sql]; third-party
  * Catalyst extensions conventionally reach them through a shim in the
  * `org.apache.spark.sql` package (the same technique widely used by
  * open-source Spark extension libraries). This is the ONLY file that
  * package-jumps; everything else lives under `graft.*`.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a temp SQL function on a LIVE session — the
    * `SparkSessionExtensions` hook only fires at session build, so
    * already-running sessions (the Verify/Bench/test contract) inject
    * through the registry directly. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Parse SQL text with the session's OWN parser (which may itself be
    * a [[graft.sql.GraftSqlParser]] on an extension-built session) —
    * the live-session entry point for graft's SQL DML surface, where
    * `sessionState` is private[sql]. */
  def parsePlan(spark: SparkSession,
                sqlText: String): catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser
      .parsePlan(sqlText)

  /** LogicalPlan → DataFrame (`Dataset.ofRows` is private[sql]).
    * Commands execute EAGERLY here — the standard Spark contract for
    * DML statements. */
  def ofRows(spark: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** DataFrame → its logical plan (private[sql] on classic.Dataset);
    * how graft table reads splice into parsed SQL plans. */
  def planOf(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical

  /** Materialize a streaming micro-batch frame as a standalone BATCH
    * frame over the same physical rows (`internalCreateDataFrame` is
    * private[sql]). The V1 `Sink.addBatch` contract hands a frame
    * wired to the running incremental execution; joining it against
    * the sink's own target table needs a plain batch plan — the same
    * re-wrap Spark's built-in V1 sinks perform. */
  def materializedBatch(df: DataFrame): DataFrame = {
    val s = df.sparkSession.asInstanceOf[classic.SparkSession]
    s.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd, df.schema)
  }

  /** A batch DataFrame over an RDD of InternalRows
    * (`internalCreateDataFrame` is private[sql]) — how the native
    * DSv2 BatchWrite's driver commit re-reads its staged UnsafeRows
    * as a distributed frame. */
  def dataFrameFromInternalRows(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Wrap a batch frame as a STREAMING one — the V1 `Source.getBatch`
    * contract (the returned frame must report `isStreaming = true` or
    * MicroBatchExecution rejects it). The RDD is lazy: rows compute
    * when the micro-batch runs, not here. */
  def streamingBatch(df: DataFrame): DataFrame = {
    val s = df.sparkSession.asInstanceOf[classic.SparkSession]
    s.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
