package graft.merge

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** CLOSED directory listings. `Files.list`/`Files.walk` return
  * streams backed by an OPEN directory fd that only `close()`
  * releases — the `Files.list(p).iterator().asScala.toSeq` idiom
  * (which this engine used at every listing site) leaks one fd per
  * call, and a commit-heavy test suite walked that straight into the
  * process fd limit (`Too many open files` at ~20k commits).
  * Every listing goes through here: materialize eagerly, close
  * always. */
private[graft] object FsList {
  def list(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }
  /** Depth-first walk (Files.walk contract), eagerly materialized. */
  def walk(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq finally s.close()
  }
}
