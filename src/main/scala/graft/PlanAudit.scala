package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SessionConfs(spark)
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.treeString.linesIterator
        .map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
