package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._
object Bench {

  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).filter(_ > 0).sum

  private def heapPools =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SessionConfs(spark)
    // Warm the session (codegen compiler, parquet reader, shuffle
    // machinery) so the first measured query isn't charged ~5s of
    // one-time JVM/session init. Guarded: a data dir without region
    // must not abort the whole bench.
    try spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // SORTED order: Scala's Map iteration order reshuffles whenever an
    // entry is added, which made round-over-round per-query comparison
    // noise (a query "regresses" because it now runs after a heavier
    // neighbor). Deterministic order keeps the suite-pressure profile
    // comparable across rounds.
    // SPARK_GRAFT_BENCH_ONLY=<name,name,...>: run just those queries —
    // the TaxProbe isolation harness (adjudicating an in-suite mover
    // against its suite-pressure-free cost). Unset = the full driver
    // contract, unchanged.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy(_._1).map { case (name, fn) =>
      // Isolate queries from each other's garbage: collect BETWEEN
      // queries (outside the timer) so a query's measured time and GC
      // stats reflect the query, not its predecessor's leftover heap.
      System.gc()
      heapPools.foreach(p => try p.resetPeakUsage() catch { case _: Throwable => () })
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      // noop sink materializes every row through the FULL plan —
      // .count() would let Catalyst drop final sorts (EliminateSorts)
      // and prune projections, timing a cheaper plan than Verify runs.
      // A failure is RECORDED, not swallowed: a throwing query would
      // otherwise bench as ~0 s and silently flatter the total.
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case t: Throwable =>
          Some(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(120)}") }
      val sec = (System.nanoTime() - t0) / 1e9
      val gcMs = gcMillis - gc0
      val peakMb = heapPools.map(p =>
        try p.getPeakUsage.getUsed catch { case _: Throwable => 0L }).sum / (1024 * 1024)
      (name, sec, gcMs, peakMb, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    def jmap(f: ((String, Double, Long, Long, Option[String])) => String): String =
      results.map(r => "\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val qs = jmap(_._2.toString)
    val gcs = jmap(_._3.toString)
    val peaks = jmap(_._4.toString)
    val errs = results.collect { case (n, _, _, _, Some(e)) => "\"" + n + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""gc_ms":$gcs,"peak_heap_mb":$peaks,"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    // Also land the JSON in a file: the stdout line rides in sbt log
    // noise, and a scrape miss turns the whole bench into "parsed: null".
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json)
    spark.stop()
  }
}
