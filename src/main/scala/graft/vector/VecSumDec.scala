package graft.vector

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native mergeable aggregate: exact elementwise sum of decimal vectors —
  * `graft_vec_sum(array<decimal(p,s)>) → array<decimal(min(38,p+10),s)>`.
  *
  * Fixed-point addition is associative and commutative, so the partial
  * buffers merge in any order to bit-identical totals — the same
  * order-independence argument [[graft.Det]] makes for scalar sums,
  * lifted to whole vectors. The input cast `array<double> →
  * array<decimal>` stays a plain Catalyst cast at the call site, so the
  * per-element conversion is exactly the one the scalar `sum(cast(...))`
  * path performs and DuckDB's `CAST(x AS DECIMAL(p,s))` mirrors.
  *
  * Why it exists: the engine's vector-mean shapes (per-label centroids,
  * Lloyd-round centroid recompute, PCA matrix-vector products) previously
  * ran `posexplode` → `groupBy(key, dim)` → re-assemble, which carries
  * |rows|×|dims| exploded rows through TWO exchanges per use. This
  * aggregate keeps vectors whole: one partial-aggregating exchange whose
  * payload is |groups|×|partitions| buffers (k×dims decimals each), and
  * no per-dim row ever exists. At 100 TB that is the difference between
  * shuffling 64× the corpus and shuffling a few kilobytes per partition.
  *
  * Buffer = Array[java.math.BigDecimal] (exact, unbounded integer part
  * until the final overflow check); serialized as unscaled BigInteger
  * bytes. Null arrays are ignored; null elements add zero; ragged input
  * lengths are a hard error (vector algebra over ragged rows is a data
  * bug, not a sum).
  */
case class VecSumDec(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[JBigDecimal]]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_vec_sum"

  private lazy val (inPrecision, inScale): (Int, Int) = child.dataType match {
    case ArrayType(d: DecimalType, _) => (d.precision, d.scale)
    case _ => (38, 9) // unreachable post type-check; keeps lazy val total
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: DecimalType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<decimal(p,s)>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(DecimalType(math.min(38, inPrecision + 10), inScale),
      containsNull = false)

  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[JBigDecimal] = Array.empty

  private def add(buf: Array[JBigDecimal], i: Int, v: JBigDecimal): Unit =
    buf(i) = if (buf(i) == null) v else buf(i).add(v)

  override def update(buffer: Array[JBigDecimal], input: InternalRow): Array[JBigDecimal] = {
    val a = child.eval(input)
    if (a == null) return buffer
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val buf =
      if (buffer.isEmpty) new Array[JBigDecimal](n)
      else if (buffer.length == n) buffer
      else throw new IllegalStateException(
        s"$prettyName: ragged vector lengths (${buffer.length} vs $n)")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        add(buf, i, arr.getDecimal(i, inPrecision, inScale).toJavaBigDecimal)
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[JBigDecimal], other: Array[JBigDecimal]): Array[JBigDecimal] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other
    if (buffer.length != other.length) throw new IllegalStateException(
      s"$prettyName: ragged vector lengths (${buffer.length} vs ${other.length})")
    var i = 0
    while (i < buffer.length) {
      if (other(i) != null) add(buffer, i, other(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[JBigDecimal]): Any =
    if (buffer.isEmpty) null
    else {
      val outScale = inScale
      new GenericArrayData(buffer.map { bd =>
        val v = if (bd == null) JBigDecimal.ZERO.setScale(outScale)
                else bd.setScale(outScale)
        org.apache.spark.sql.types.Decimal(v)
      })
    }

  override def serialize(buffer: Array[JBigDecimal]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach { bd =>
      if (bd == null) out.writeInt(-1)
      else {
        val bytes = bd.setScale(inScale).unscaledValue().toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): Array[JBigDecimal] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = new Array[JBigDecimal](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      if (len >= 0) {
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        buf(i) = new JBigDecimal(new BigInteger(bytes), inScale)
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumDec =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecSumDec =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): VecSumDec =
    copy(child = newChild)
}
