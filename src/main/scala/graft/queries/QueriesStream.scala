package graft.queries

import graft.streaming.Streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Structured-Streaming surface as judged queries. The stream result
  * must equal the batch answer over the same files, so the DuckDB twin
  * is the plain batch SQL — the strongest check a bounded stream
  * admits.
  */
object QueriesStream {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "stream_window_agg" -> ((s, dir) => {
      // Trigger.AvailableNow file stream -> event-time watermark ->
      // 1h tumbling window agg -> foreachBatch SCD1-upsert, then read
      // the committed table. One source file = one micro-batch here;
      // StreamingSpec covers the multi-batch path (in-order chunks).
      val src = graft.Tmp.dir("graft_stream_src")
      Files.copy(Paths.get(s"$dir/events.parquet"),
        Paths.get(src, "events.parquet"))
      val out = graft.Tmp.dir("graft_stream_out") + "/win_agg"
      val ckpt = graft.Tmp.dir("graft_stream_ckpt")
      Streaming.runAvailableNow(s, src, out, ckpt)
        .orderBy(col("window_start"), col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "stream_window_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         |  count(*) AS n_events,
         |  SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
         |FROM events GROUP BY 1, 2
         |ORDER BY window_start, event_type""".stripMargin
  )
}
