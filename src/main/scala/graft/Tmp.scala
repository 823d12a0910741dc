package graft

import java.nio.file.{Files, Path}

/** Session-scoped scratch directories. All tmp dirs live under ONE
  * per-JVM root that a shutdown hook deletes recursively, so repeated
  * Verify/Bench runs don't accumulate parquet/CSV copies in /tmp
  * (they did at sf0.1+ when every query minted its own orphan dir).
  */
object Tmp {
  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_session_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh scratch dir under the session root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      graft.merge.FsList.walk(p).reverse.foreach(Files.delete)
    }
}
