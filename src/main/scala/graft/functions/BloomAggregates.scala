package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Shared bit math for the per-bucket BLOOM FILTER file-skipping
  * stats: the EXECUTOR side ([[BloomAgg]]) sets bits while a commit
  * stages buckets, and the DRIVER side (Scd1Merge's prune decision)
  * tests the same positions against an equality literal's hash. One
  * definition, both sides — a drifted reimplementation would produce
  * false negatives, which for pruning means silently WRONG results.
  *
  * Positions use Kirsch–Mitzenmacher double hashing over the single
  * 64-bit input (itself `xxhash64(column)`, computed by Spark's
  * codegen'd builtin): position_i = (h + i·h2) mod m with h2 an
  * avalanche-mixed, odd-forced derivative of h. `m` is a power of two
  * so the mod is a mask.
  */
object BloomUtil {

  /** Default sizing: 8192 bits (1 KiB) × 6 probes ≈ 2% false-positive
    * rate at 1000 distinct values per bucket — pruning keeps ~98% of
    * point lookups to the true bucket while one bucket's stats cost
    * ~1.4 KiB of manifest. */
  val DefaultBits = 8192
  val DefaultProbes = 6

  /** Final avalanche of MurmurHash3's 64-bit finisher. */
  private def mix(h: Long): Long = {
    var x = h
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def set(bits: Array[Long], m: Int, k: Int, h: Long): Unit = {
    val h2 = mix(h) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h + i * h2, m)
      bits((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  def test(bits: Array[Long], m: Int, k: Int, h: Long): Boolean = {
    val h2 = mix(h) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h + i * h2, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}

/** Per-group bloom filter over a LongType child (conventionally
  * `xxhash64(col)`) — executed by ObjectHashAggregate like the other
  * graft sketches ([[ApproxTopK]]). Partition partials are fixed
  * `m/8`-byte bitmaps merged by OR, so the shuffle carries
  * `partitions × m/8` bytes regardless of data volume. Nulls are
  * skipped (an equality literal is never null-matching in SQL), so an
  * all-null group yields the empty bitmap = nothing can match. */
case class BloomAgg(child: Expression,
                    numBits: Int = BloomUtil.DefaultBits,
                    numProbes: Int = BloomUtil.DefaultProbes,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(numBits > 0 && (numBits & (numBits - 1)) == 0,
    s"bloom_agg: numBits must be a positive power of two, got $numBits")
  require(numProbes > 0, s"bloom_agg: numProbes must be positive")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      BloomUtil.set(buffer, numBits, numProbes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomUtil.toBytes(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomUtil.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg needs a LongType child (xxhash64(col)), got $other")
  }
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}
