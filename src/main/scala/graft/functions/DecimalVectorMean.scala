package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mutable buffer: row count + one exact decimal accumulator per
  * dimension (allocated lazily from the first vector seen).
  */
final class DecimalVectorSums(
    var count: Long,
    var sums: Array[java.math.BigDecimal])

/** Fused per-dimension decimal-exact vector mean: ONE aggregate
  * expression computing what `dim` separate
  * `sum(cast(v[i] AS DECIMAL(28,10))).cast(double) / count` columns
  * compute — bit-identically, because each element is converted with
  * Spark's own double→decimal rule (`BigDecimal.valueOf` = shortest
  * decimal string, then setScale(10, HALF_UP)), summed exactly, and
  * finished with the same two IEEE ops (decimal→double, then ÷ count).
  *
  * Why it exists: the composed form puts `dim` aggregate expressions in
  * the plan — at dim=64 that is most of a Lloyd round's cost on a small
  * corpus (measured ~0.3 s of Catalyst analysis/optimization per round,
  * e2 round-7 adjudication) and a wide codegen'd row otherwise. The
  * kernel is one expression, one buffer, and the per-row cost is a flat
  * `dim` BigDecimal adds.
  *
  * Contract: input vectors must share one dimension (enforced); null
  * vectors are ignored like null inputs to `sum`. Sums run at unlimited
  * precision, so the decimal(38,10) overflow the composed form can
  * theoretically hit (10^28 integer digits) does not occur here —
  * unreachable for any real embedding corpus, and the gates compare the
  * finished doubles, not the intermediate state.
  */
case class DecimalVectorMean(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DecimalVectorSums]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"decimal_vector_mean needs array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "decimal_vector_mean"

  override def createAggregationBuffer(): DecimalVectorSums =
    new DecimalVectorSums(0L, null)

  // Spark's Cast(double → decimal(28,10)): shortest-decimal-string
  // conversion (BigDecimal.valueOf) then setScale(10, HALF_UP)
  private def toDec(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v).setScale(10, java.math.RoundingMode.HALF_UP)

  override def update(b: DecimalVectorSums, input: InternalRow): DecimalVectorSums = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return b
    val n = arr.numElements()
    if (b.sums == null) b.sums = Array.fill(n)(java.math.BigDecimal.ZERO)
    require(b.sums.length == n,
      s"decimal_vector_mean: dimension mismatch (${b.sums.length} vs $n)")
    var i = 0
    while (i < n) {
      b.sums(i) = b.sums(i).add(toDec(arr.getDouble(i)))
      i += 1
    }
    b.count += 1
    b
  }

  override def merge(b: DecimalVectorSums, o: DecimalVectorSums): DecimalVectorSums = {
    if (o.sums == null) return b
    if (b.sums == null) { b.sums = o.sums; b.count = o.count; return b }
    require(b.sums.length == o.sums.length,
      s"decimal_vector_mean: dimension mismatch (${b.sums.length} vs ${o.sums.length})")
    var i = 0
    while (i < b.sums.length) { b.sums(i) = b.sums(i).add(o.sums(i)); i += 1 }
    b.count += o.count
    b
  }

  override def eval(b: DecimalVectorSums): Any =
    if (b.count == 0 || b.sums == null) null
    else new GenericArrayData(b.sums.map(s => s.doubleValue() / b.count))

  override def serialize(b: DecimalVectorSums): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.count)
    out.writeInt(if (b.sums == null) -1 else b.sums.length)
    if (b.sums != null) b.sums.foreach { s =>
      val unscaled = s.unscaledValue().toByteArray
      out.writeInt(s.scale())
      out.writeInt(unscaled.length)
      out.write(unscaled)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DecimalVectorSums = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val count = in.readLong()
    val n = in.readInt()
    val sums =
      if (n < 0) null
      else Array.fill(n) {
        val scale = in.readInt()
        val len = in.readInt()
        val buf = new Array[Byte](len)
        in.readFully(buf)
        new java.math.BigDecimal(new java.math.BigInteger(buf), scale)
      }
    new DecimalVectorSums(count, sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DecimalVectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecimalVectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DecimalVectorMean =
    copy(child = newChild)
}
