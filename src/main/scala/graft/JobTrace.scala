package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.ConcurrentHashMap

/** Optimization-round instrument (dev-only, like [[JobCount]]): run a
  * declared query and histogram its Spark JOBS by call site — the
  * fastest way to see which engine routine is paying per-commit /
  * per-round action overhead.
  *
  * Usage: runMain graft.JobTrace <query>[,<query>...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.001), SPARK_GRAFT_CPUS.
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: JobTrace <query>[,<query>...]"); sys.exit(2) }
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
    val counts = new ConcurrentHashMap[String, Integer]()
    val stageCounts = new ConcurrentHashMap[String, Integer]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // prefer the engine's phase label; fall back to the result
        // stage's call site
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(j.stageInfos.lastOption
            .map(_.name.takeWhile(_ != '+').trim).getOrElse("unknown"))
        counts.merge(site, 1, (a, b) => a + b)
        j.stageInfos.foreach { s =>
          stageCounts.merge(s.name.takeWhile(_ != '+').trim, 1, (a, b) => a + b)
        }
      }
    })
    names.foreach { name =>
      counts.clear(); stageCounts.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"== $name ($sec%.1f s) jobs-by-result-site:")
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq.sortBy(-_._2).foreach { case (k, v) =>
        println(f"  $v%5d  $k")
      }
      println("-- stages-by-site:")
      stageCounts.asScala.toSeq.sortBy(-_._2).take(20).foreach { case (k, v) =>
        println(f"  $v%5d  $k")
      }
    }
    spark.stop()
  }
}
