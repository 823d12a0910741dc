package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-wise SUM over an `ARRAY<FLOAT>` column — the aggregate that
  * makes centroid math (k-means/IVF training, per-class mean
  * embeddings) a single hash aggregation.
  *
  * The alternative Spark offers is `posexplode` → `groupBy(key, pos)`
  * → `avg` — correct, but it pushes `rows × dim` exploded rows through
  * the aggregate: at 100 TB with 768-dim embeddings that is a 768×
  * row multiplication through the hash map, and the shuffled key space
  * grows by the same factor. This aggregate instead keeps ONE
  * `Array[Double]` accumulator per group (`TypedImperativeAggregate`,
  * executed by `ObjectHashAggregate`) and reads each input array once
  * — per-partition partial sums merge as dim-length buffers, so the
  * shuffle carries `groups × dim` doubles exactly like any other
  * partial aggregate.
  *
  * Semantics: null input rows are skipped (SQL SUM posture); the first
  * non-null row fixes the dimension and a later mismatched row throws
  * (a malformed embedding must not silently zero-pad into a plausible
  * centroid); null ELEMENTS inside an array are rejected the same way.
  * All-null groups evaluate to SQL NULL. Sums are doubles; like every
  * floating aggregate the partial-merge order is partitioning-
  * dependent, so judged consumers round (the a13_stats posture).
  */
case class VecSum(child: Expression,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val buf = if (buffer.isEmpty) new Array[Double](n) else buffer
      if (buf.length != n) throw new IllegalArgumentException(
        s"vec_sum: dimension mismatch — saw both ${buf.length} and $n")
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"vec_sum: null element at position $i")
        buf(i) += arr.getFloat(i).toDouble
        i += 1
      }
      buf
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      if (b1.length != b2.length) throw new IllegalArgumentException(
        s"vec_sum: dimension mismatch in merge — ${b1.length} vs ${b2.length}")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_sum requires ARRAY<FLOAT>, got ${t.sql}")
  }

  override def withNewMutableAggBufferOffset(offset: Int): VecSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VecSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): VecSum =
    copy(child = newChild)

  override def prettyName: String = "vec_sum"
}

object VectorAggregates {
  import GraftExpressionBridge.{column, expression}

  /** Element-wise sum of an `ARRAY<FLOAT>` column as `ARRAY<DOUBLE>`. */
  def vecSum(c: Column): Column =
    column(VecSum(expression(c)).toAggregateExpression())
}
