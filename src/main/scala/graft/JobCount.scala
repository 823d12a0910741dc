package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round instrument: run declared queries through the
  * bench's noop sink while counting Spark jobs, stages and tasks —
  * STRUCTURAL cost metrics that, unlike wall-clock on a noisy box,
  * are deterministic run-to-run. A query whose fixed cost is action
  * count (lifecycle fixtures over tiny SFs) shows it here directly.
  *
  * Usage: runMain graft.JobCount <query>[,<query>...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.001), SPARK_GRAFT_CPUS.
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SessionConfs(spark)
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })
    println(f"${"query"}%-34s ${"sec"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%8s")
    names.foreach { name =>
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a beat to drain (counters are
      // for structural comparison; off-by-a-stage doesn't matter)
      Thread.sleep(400)
      println(f"$name%-34s $sec%8.1f ${jobs.get}%6d ${stages.get}%7d ${tasks.get}%8d")
    }
    spark.stop()
  }
}
