package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** Mergeable QUANTILE sketch: a bottom-k-by-row-hash uniform sample
  * (the KMV construction applied to rows instead of distinct values).
  * The sketch of a row set is its k rows with the SMALLEST
  * `xxhash64(row key)` values, each carrying the measure — a pure
  * FUNCTION of the row set, independent of partitioning, merge order,
  * and build path:
  *
  *    bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B))
  *
  * so partial sketches over DISJOINT row sets union LOSSLESSLY into
  * exactly the one-pass sketch, bit for bit. That property is what
  * the transparent MV rewrite's exact-answer contract requires, and
  * it is what randomized-compaction sketches (Datasketches KLL) give
  * up: a KLL union is build-path-dependent, so rewriting a query onto
  * stored KLL partials would CHANGE its bytes/estimates — the trade
  * here is sketch size (O(k) entries for ~1.65/√k rank error at 95%
  * confidence, vs KLL's tighter O(k·log) curve) for HLL-grade
  * determinism and losslessness (the pipe29 posture). When k ≥ the
  * group size the sample is the whole group and estimates are EXACT.
  *
  * Quantile estimate: the sample's values sorted ascending, indexed
  * at ⌊p·(size−1)⌋ — a uniform row sample's empirical quantile
  * (additive rank error O(1/√k) w.h.p.).
  *
  * Wire format (BinaryType): magic 'G','Q',1 · int k · long n ·
  * int size · size × (long hash, double value), entries sorted by
  * hash ascending — canonical, so equal sketches are byte-equal
  * (the driver's hash-compare sees deterministic bytes). k = 0 is
  * the empty union (zero contributors — constrains nothing when
  * merged onward). Mismatched-k unions keep bottom-MIN(k): that is
  * the largest prefix that is a valid uniform sample of the union
  * (see [[Buffer]]), and min keeps merged bytes build-path-free. */
object QuantileSketch {

  val DefaultK = 1024

  /** Decoded sketch: entries sorted by hash ascending. */
  final case class Sk(k: Int, n: Long, entries: Array[(Long, Double)])

  /** Aggregation buffer. `k <= 0` is the UNSET sentinel (a union
    * buffer that has merged nothing yet — it adopts the first
    * contributor's k). Unions of MISMATCHED k take min(k): only the
    * bottom-min(k) entries are a valid uniform sample (entries
    * ranked above a smaller contributor's k were already discarded
    * by that contributor, so a merged sketch claiming more sample
    * than min(k) would silently overstate its evidence). min is
    * commutative/associative and capacity only ever SHRINKS, so
    * intermediate compactions (always at capacity ≥ the final k)
    * never drop a final-bottom-k entry — merged bytes stay a pure
    * function of the contributor set, independent of merge order. */
  final class Buffer(initK: Int) {
    var k: Int = initK
    var n: Long = 0L
    val acc = mutable.ArrayBuffer.empty[(Long, Double)]
    /** Effective compaction/claim capacity (DefaultK while unset —
      * unreachable for entry-bearing buffers: mergeIn/add set k
      * before entries land). */
    def capacity: Int = if (k <= 0) DefaultK else k
    private def shrinkK(otherK: Int): Unit =
      if (otherK > 0) k = if (k <= 0) otherK else math.min(k, otherK)
    def add(h: Long, v: Double): Unit = {
      n += 1L; acc += ((h, v))
      if (acc.length > 4 * capacity) compact()
    }
    /** Sort by hash, dedup (defensive — row hashes are unique by
      * construction), keep the bottom `capacity`. */
    def compact(): Unit = {
      val sorted = acc.sortBy(_._1)
      acc.clear()
      var last = Long.MinValue; var first = true
      val it = sorted.iterator
      while (it.hasNext && acc.length < capacity) {
        val e = it.next()
        if (first || e._1 != last) { acc += e; last = e._1; first = false }
      }
    }
    def mergeIn(other: Sk): Unit = {
      shrinkK(other.k)
      n += other.n
      acc ++= other.entries
      if (acc.length > 4 * capacity) compact()
    }
    def mergeBuf(other: Buffer): Unit = {
      shrinkK(other.k)
      n += other.n
      acc ++= other.acc
      if (acc.length > 4 * capacity) compact()
    }
  }

  def encode(buf: Buffer): Array[Byte] = {
    buf.compact()
    val bb = ByteBuffer.allocate(3 + 4 + 8 + 4 + buf.acc.length * 16)
    bb.put('G'.toByte).put('Q'.toByte).put(1.toByte)
    bb.putInt(buf.k).putLong(buf.n).putInt(buf.acc.length)
    buf.acc.foreach { case (h, v) => bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  def decode(bytes: Array[Byte]): Sk = {
    val bb = ByteBuffer.wrap(bytes)
    require(bb.get() == 'G' && bb.get() == 'Q' && bb.get() == 1,
      "qsk: not a graft quantile sketch")
    val k = bb.getInt(); val n = bb.getLong(); val sz = bb.getInt()
    val es = new Array[(Long, Double)](sz)
    var i = 0
    while (i < sz) { es(i) = (bb.getLong(), bb.getDouble()); i += 1 }
    Sk(k, n, es)
  }

  /** Two-sketch union at min(valid k) — see [[Buffer]]. A wire k of
    * 0 (union of zero sketches) constrains nothing. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val sa = decode(a); val sb = decode(b)
    val buf = new Buffer(0)
    buf.mergeIn(sa); buf.mergeIn(sb)
    encode(buf)
  }

  /** Empirical quantile of the sample: sorted values at
    * ⌊p·(size−1)⌋. None for an empty sketch. */
  def estimate(bytes: Array[Byte], p: Double): Option[Double] = {
    val sk = decode(bytes)
    if (sk.entries.isEmpty) None
    else {
      val vs = sk.entries.map(_._2).sorted
      val pc = math.max(0.0, math.min(1.0, p))
      Some(vs(math.floor(pc * (vs.length - 1)).toInt))
    }
  }
}

/** `qsk_agg(hash, value[, k])` — build the bottom-k row-sample
  * quantile sketch: `hash` is the row-identity hash (xxhash64 over
  * the table's merge keys — what makes the sample a deterministic
  * function of the ROW SET), `value` the measure. Null values skip
  * (SQL aggregate posture); an all-null group yields an empty
  * sketch. Executed by ObjectHashAggregate; partials merge
  * losslessly (see [[QuantileSketch]]). */
case class QskAgg(hash: Expression, value: Expression,
                  k: Int = QuantileSketch.DefaultK,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketch.Buffer]
    with BinaryLike[Expression] {

  require(k > 0, s"qsk_agg: k must be positive, got $k")

  override def left: Expression = hash
  override def right: Expression = value

  override def createAggregationBuffer(): QuantileSketch.Buffer =
    new QuantileSketch.Buffer(k)

  override def update(buffer: QuantileSketch.Buffer,
                      input: InternalRow): QuantileSketch.Buffer = {
    val v = value.eval(input)
    if (v != null) {
      val h = hash.eval(input)
      if (h != null) {
        val d = value.dataType match {
          case DoubleType => v.asInstanceOf[Double]
          case FloatType => v.asInstanceOf[Float].toDouble
          case LongType => v.asInstanceOf[Long].toDouble
          case IntegerType => v.asInstanceOf[Int].toDouble
          case ShortType => v.asInstanceOf[Short].toDouble
          case ByteType => v.asInstanceOf[Byte].toDouble
          case _: DecimalType =>
            v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
          case other => throw new IllegalStateException(
            s"qsk_agg: unsupported value type $other")
        }
        buffer.add(h.asInstanceOf[Long], d)
      }
    }
    buffer
  }

  override def merge(buffer: QuantileSketch.Buffer,
                     other: QuantileSketch.Buffer): QuantileSketch.Buffer = {
    buffer.mergeBuf(other)
    buffer
  }

  override def eval(buffer: QuantileSketch.Buffer): Any =
    QuantileSketch.encode(buffer)

  override def serialize(buffer: QuantileSketch.Buffer): Array[Byte] =
    QuantileSketch.encode(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buffer = {
    val sk = QuantileSketch.decode(bytes)
    val buf = new QuantileSketch.Buffer(sk.k)
    buf.mergeIn(sk)
    buf.n = sk.n // mergeIn added it once; reset to the true count
    buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = {
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"qsk_agg: hash must be LongType (xxhash64), got ${hash.dataType}")
    else value.dataType match {
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"qsk_agg: value must be numeric, got $other")
    }
  }
  override def prettyName: String = "qsk_agg"

  override def withNewMutableAggBufferOffset(offset: Int): QskAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QskAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QskAgg =
    copy(hash = newLeft, value = newRight)
}

/** `qsk_union_agg(sketch)` — union stored sketch binaries (the MV
  * rewrite's serving aggregate: per-group sketches roll up to any
  * coarser grouping EXACTLY — see [[QuantileSketch]]'s losslessness).
  * Null sketches skip; an all-null group yields an empty sketch. */
case class QskUnionAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketch.Buffer]
    with UnaryLike[Expression] {

  // UNSET buffer: the union's k is min over the CONTRIBUTING
  // sketches' ks (adopted at first merge), never a hardcoded
  // DefaultK — a k=2048 MV's sketches union at 2048, and a stray
  // smaller-k contributor shrinks the claim to what is provably a
  // valid uniform sample (see [[QuantileSketch.Buffer]]).
  override def createAggregationBuffer(): QuantileSketch.Buffer =
    new QuantileSketch.Buffer(0)

  override def update(buffer: QuantileSketch.Buffer,
                      input: InternalRow): QuantileSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.mergeIn(QuantileSketch.decode(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: QuantileSketch.Buffer,
                     other: QuantileSketch.Buffer): QuantileSketch.Buffer = {
    buffer.mergeBuf(other)
    buffer
  }

  override def eval(buffer: QuantileSketch.Buffer): Any =
    QuantileSketch.encode(buffer)
  override def serialize(buffer: QuantileSketch.Buffer): Array[Byte] =
    QuantileSketch.encode(buffer)
  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buffer = {
    val sk = QuantileSketch.decode(bytes)
    val buf = new QuantileSketch.Buffer(sk.k)
    buf.mergeIn(sk)
    buf.n = sk.n
    buf
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qsk_union_agg: needs a BinaryType sketch, got $other")
  }
  override def prettyName: String = "qsk_union_agg"

  override def withNewMutableAggBufferOffset(offset: Int): QskUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QskUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): QskUnionAgg =
    copy(child = newChild)
}

/** `qsk_merge(a, b)` — scalar two-sketch union (the maintenance
  * fold's `stored ∪ insert-leg`). NULL is the identity. */
case class QskMerge(left: Expression, right: Expression)
    extends Expression with BinaryLike[Expression] with CodegenFallback {
  // interpreted eval only: runs over GROUP-sized rows (MV maintenance
  // folds), never the per-base-row hot path

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    if (a == null) b
    else if (b == null) a
    else QuantileSketch.merge(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qsk_merge: needs two BinaryType sketches, got " +
      s"(${left.dataType}, ${right.dataType})")
  override def prettyName: String = "qsk_merge"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QskMerge =
    copy(left = newLeft, right = newRight)
  override lazy val deterministic: Boolean = true
}

/** `qsk_quantile(sketch, p)` — the empirical p-quantile of the
  * sample (NULL for a NULL or empty sketch). */
case class QskQuantile(left: Expression, right: Expression)
    extends Expression with BinaryLike[Expression] with CodegenFallback {
  // interpreted eval only: runs over GROUP-sized result rows

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val sk = left.eval(input)
    val p = right.eval(input)
    if (sk == null || p == null) null
    else QuantileSketch.estimate(sk.asInstanceOf[Array[Byte]],
      p.asInstanceOf[Double]).map(Double.box).orNull
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qsk_quantile: needs (BinaryType, DoubleType), got " +
      s"(${left.dataType}, ${right.dataType})")
  override def prettyName: String = "qsk_quantile"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QskQuantile =
    copy(left = newLeft, right = newRight)
}
