ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "incrementaldatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the machine has 128 GiB and the sf0.1 bench GC-thrashes
  // in 8g once the pair-heavy dedup queries run.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

// ---- parallel forked test groups ------------------------------------
// The suite runs every ScalaTest suite in ONE forked JVM sequentially;
// measured 2004 s wall on this box (r16's driver run was terminated
// mid-suite, so the budget is tighter than that). Suites are
// independent: fixtures live in per-JVM unique temp dirs (graft.Tmp,
// Files.createTempDirectory), only PlanSpec touches spark-warehouse/
// and no suite shares table names with another. Partitioning them into
// fixed groups, each its own forked JVM run CONCURRENTLY, changes no
// suite's semantics (same isolation as today, more of it) and cuts
// wall time ~3-4x. Groups are balanced by measured suite duration
// (target/test-reports/*.xml from the -u option below).
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest,
  "-u", "target/test-reports")
// Measured per-suite seconds (target/test-reports, 2026-08-19 run);
// unlisted/new suites default to 15. Groups are packed greedily
// (longest-processing-time) so the heaviest suite is the wall floor.
val measuredSuiteSec: Map[String, Int] = Map(
  "graft.AnnRewriteSpec" -> 509, "graft.ApproxSpec" -> 438,
  "graft.MvMaintenanceSpec" -> 264, "graft.MvRewriteSpec" -> 200,
  "graft.StreamingSpec" -> 113, "graft.GraftSqlSpec" -> 98,
  "graft.TopNMvSpec" -> 74, "graft.IncrementalDistinctSpec" -> 72,
  "graft.PlanSpec" -> 68, "graft.OptimisticConcurrencySpec" -> 62,
  "graft.GoldenSalesSpec" -> 62, "graft.Scd1MergeSpec" -> 57,
  "graft.ConstraintsSpec" -> 55, "graft.DedupSpec" -> 53,
  "graft.PartitionedTableSpec" -> 43, "graft.GraftDsv2Spec" -> 40,
  "graft.QuantileMvSpec" -> 38, "graft.DeepCloneSpec" -> 38,
  "graft.PipelineSpec" -> 36, "graft.IncrementalAggSpec" -> 35,
  "graft.SimilaritySpec" -> 34, "graft.ReclusterSpec" -> 33,
  "graft.PartitionedRestoreSpec" -> 33, "graft.DvSpec" -> 33,
  "graft.BloomSkipSpec" -> 29, "graft.BloomJoinSpec" -> 23,
  "graft.GraftSourceSpec" -> 22, "graft.CloneSpec" -> 21,
  "graft.HiddenPartitionSpec" -> 18, "graft.IncrementalJoinSpec" -> 14,
  "graft.CdcSpec" -> 14, "graft.WideningSpec" -> 13,
  "graft.PartitionedCdfSpec" -> 12, "graft.TextOpsSpec" -> 11,
  "graft.RenameSpec" -> 11, "graft.GraftSinkSpec" -> 10,
  "graft.PageRankSpec" -> 9, "graft.Scd2MergeSpec" -> 8,
  "graft.StatsSkippingSpec" -> 7, "graft.VacuumSpec" -> 7,
  "graft.RelOpsSpec" -> 7, "graft.ZOrderSpec" -> 6,
  "graft.TrianglesSpec" -> 6, "graft.DropSpec" -> 5,
  "graft.Scd1ModelSpec" -> 5, "graft.MultimodalSpec" -> 4,
  "graft.ZoneCompactorSpec" -> 4, "graft.AsofJoinSpec" -> 3,
  "graft.SurrogateKeysSpec" -> 3, "graft.BpeSpec" -> 3,
  "graft.QuarantineSpec" -> 2,
)
val nTestGroups = 6
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = ForkOptions()
    .withJavaHome(javaHome.value)
    .withOutputStrategy(outputStrategy.value)
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars(envVars.value)
  // LPT bin packing: heaviest suite first into the lightest group
  val weights = Array.fill(nTestGroups)(0)
  val assigned = tests
    .sortBy(t => -measuredSuiteSec.getOrElse(t.name, 15))
    .map { t =>
      val g = weights.indices.minBy(weights)
      weights(g) += measuredSuiteSec.getOrElse(t.name, 15)
      g -> t
    }
  assigned.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, ts) =>
    Tests.Group(s"g$g", ts.map(_._2).sortBy(_.name), Tests.SubProcess(forkOpts))
  }
}
// default sbt caps concurrent forked test groups at 1; lift it (6
// groups x local[4] sessions fits the 32-core box comfortably)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, nTestGroups), Tags.limitAll(12))
