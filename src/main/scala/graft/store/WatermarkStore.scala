package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Single-row watermark state with atomic advance (SURVEY.md §2.1 S11).
  *
  * Stands in for the reference's SQL-Server watermark table + stored
  * procedure (watermark_table.sql:1-9 — seeded `'DT00000'`;
  * stored_procedure.sql:1-13 — transactional `UPDATE ... SET
  * last_load = @lastload`). State is one small file; the "transaction"
  * is a write-to-tmp + atomic rename, which is the strongest primitive a
  * filesystem offers and sufficient under the documented single-writer
  * assumption (SURVEY.md §7.5).
  *
  * Watermark values are opaque strings whose lexicographic order must
  * equal their logical order (true for the reference's zero-padded
  * `DTnnnnn` ids and for ISO dates).
  */
final class WatermarkStore(dir: String) {
  private val live: Path = Paths.get(dir, "watermark.txt")
  private val tmp: Path = Paths.get(dir, "watermark.txt.tmp")
  Files.createDirectories(Paths.get(dir))

  /** Seed the store if absent (watermark_table.sql:8-9 inserts the
    * pre-domain value 'DT00000'). */
  def init(seed: String): Unit =
    if (!Files.exists(live)) writeAtomic(seed)

  def read(): String =
    new String(Files.readAllBytes(live), StandardCharsets.UTF_8).trim

  /** Advance the watermark; refuses to move backwards (the reference's
    * proc would happily regress — we keep monotonicity as a documented
    * deviation that protects exactly-once ingest). */
  def advance(to: String): Unit = {
    val cur = read()
    require(to >= cur, s"watermark regression: $cur -> $to")
    writeAtomic(to)
  }

  private def writeAtomic(v: String): Unit = {
    Files.write(tmp, v.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
