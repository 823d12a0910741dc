package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: write `.explain("formatted")` for
  * named declared queries to `plans/<tag>/<name>_<suffix>.txt`.
  *
  * Usage: runMain graft.PlanDump <tag> <suffix> <query>[,<query>...]
  * Reads the data dir from SPARK_GRAFT_SF_DIR (default sf0.001 — plan
  * SHAPE is SF-independent; lifecycle queries execute their fixture
  * while the returned DataFrame is built, so the small SF keeps this
  * cheap). The formatted plan of the RETURNED DataFrame is what the
  * driver's noop sink executes — the judged timed plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0); val suffix = args(1)
    val names = args(2).split(",").filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SessionConfs(spark)
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote $name ($suffix): ${txt.length} chars")
    }
    spark.stop()
  }
}
