package graft

import graft.store.ZoneCompactor
import org.apache.spark.sql.SaveMode
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Append-only-zone compaction: content identity, file-count drop,
  * partition preservation, and the crash-recovery rule for the one
  * non-atomic window in the dir-swap protocol. */
class ZoneCompactorSpec extends SparkSpecBase {
  import spark.implicits._

  private def files(dir: String): Long =
    graft.merge.FsList.walk(Paths.get(dir)).iterator
      .count(_.getFileName.toString.endsWith(".parquet"))

  test("flat zone: 3 appended batches collapse to one file, content identical") {
    val dir = Tmp.dir("zone_flat") + "/bronze"
    for (b <- 1 to 3)
      (1L to 50L).map(i => (b.toLong, i)).toDF("batch", "n")
        .repartition(4).write.mode(SaveMode.Append).parquet(dir)
    val before = canon(spark.read.parquet(dir))
    val nBefore = files(dir)
    assert(nBefore >= 3, s"appends must fragment (got $nBefore)")
    val (b, a) = ZoneCompactor.compactZone(spark, dir)
    assert(b == nBefore && a == 1L, s"expected ($nBefore -> 1), got ($b -> $a)")
    assert(files(dir) == 1)
    assert(canon(spark.read.parquet(dir)) == before)
    // idempotent: already compact → no-op
    assert(ZoneCompactor.compactZone(spark, dir) == ((1L, 1L)))
  }

  test("partitioned zone: partition layout survives, one file per partition") {
    val dir = Tmp.dir("zone_part") + "/silver"
    for (b <- Seq("B1", "B2"))
      (1L to 40L).map(i => (i, b)).toDF("n", "__batch")
        .repartition(4).write.mode(SaveMode.Append).partitionBy("__batch").parquet(dir)
    val before = canon(spark.read.parquet(dir))
    val (nb, na) = ZoneCompactor.compactZone(spark, dir, partitionCols = Seq("__batch"))
    assert(nb == 8 && na == 2, s"expected (8 -> 2), got ($nb -> $na)")
    assert(Files.exists(Paths.get(dir, "__batch=B1")) &&
      Files.exists(Paths.get(dir, "__batch=B2")))
    assert(canon(spark.read.parquet(dir)) == before)
  }

  test("crash between the two renames: recovery restores the zone") {
    val parent = Tmp.dir("zone_crash")
    val dir = parent + "/z"
    (1L to 10L).toDF("n").repartition(2).write.parquet(dir)
    val before = canon(spark.read.parquet(dir))
    // simulate the mid-swap crash state: dir renamed away, new copy
    // never moved in
    val old = Paths.get(parent, ".z.old")
    Files.move(Paths.get(dir), old, StandardCopyOption.ATOMIC_MOVE)
    assert(!Files.exists(Paths.get(dir)))
    ZoneCompactor.compactZone(spark, dir)
    assert(canon(spark.read.parquet(dir)) == before)
    assert(!Files.exists(old))
  }
}
