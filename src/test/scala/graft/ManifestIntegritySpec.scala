package graft

import graft.merge.Scd1Merge
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Manifest checksum: every committed manifest carries a sha-256 over
  * its own lines; a corrupted file fails LOUDLY at read time instead
  * of silently misreading bucket paths or stats, while pre-checksum
  * (legacy) manifests still parse. */
class ManifestIntegritySpec extends SparkSpecBase {

  import spark.implicits._

  private def build(): String = {
    val path = Tmp.dir("integrity_spec") + "/t"
    val dim = (0 until 20).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Scd1Merge.upsert(spark, path, dim, Seq("k"), numBuckets = 2)
    path
  }

  test("committed manifests carry a verifying sum; history files too") {
    val path = build()
    val m = Files.readString(Paths.get(path, "_graft_manifest"), UTF_8)
    assert(m.linesIterator.exists(_.startsWith("sum=")),
      "the live manifest must end with its checksum")
    assert(Scd1Merge.readTable(spark, path).count() == 20)
    val hist = Files.readString(Paths.get(path, "_graft_history", "1"), UTF_8)
    assert(hist.linesIterator.exists(_.startsWith("sum=")),
      "history snapshots carry the same protection")
  }

  test("a corrupted manifest fails loudly, never silently misreads") {
    val path = build()
    val p = Paths.get(path, "_graft_manifest")
    val body = Files.readString(p, UTF_8)
    // corrupt ONE byte inside a bucket dir name (not the sum line)
    val corrupted = body.replaceFirst("data/b0_v", "data/bX_v")
    Files.writeString(p, corrupted)
    val e = intercept[IllegalStateException] {
      Scd1Merge.readTable(spark, path).count()
    }
    assert(e.getMessage.contains("integrity"),
      s"corruption must be named, got: ${e.getMessage}")
  }

  test("pre-checksum (legacy) manifests still parse") {
    val path = build()
    val p = Paths.get(path, "_graft_manifest")
    val noSum = Files.readString(p, UTF_8).linesIterator
      .filterNot(_.startsWith("sum=")).mkString("\n")
    Files.writeString(p, noSum)
    assert(Scd1Merge.readTable(spark, path).count() == 20,
      "a manifest without a sum line is a legacy file, not corruption")
  }
}
