package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, DoubleType, Decimal}

/** Fused per-dimension decimal-exact vector SUM — the state-producing
  * sibling of [[DecimalVectorMean]]: same element conversion (Spark's
  * double→decimal(_,10) rule: `BigDecimal.valueOf` shortest string, then
  * setScale(10, HALF_UP)), same exact accumulation, but the EVAL returns
  * the per-dimension sums as `array<decimal(38,10)>` instead of dividing
  * by the count.
  *
  * Why it exists: a mergeable per-cluster centroid STATE (decimal sums +
  * row count) makes the daily semantic-dedup centroid derivation O(k)
  * zone reads instead of a full-corpus rescan — sums of sums are exact
  * and order-independent, so `Σ_day state` finished with one double
  * division reproduces [[DecimalVectorMean]] over the union bitwise
  * (decimal(38,10) holds 28 integer digits; overflow is unreachable for
  * any real embedding corpus, the same adjudication as the mean kernel).
  *
  * Contract: input vectors must share one dimension (enforced); null
  * vectors are ignored like null inputs to `sum`; all-null input groups
  * eval to null. Pair with `count(v)` for the state's row count.
  */
case class DecimalVectorSum(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DecimalVectorSums]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"decimal_vector_sum needs array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(DataTypes.createDecimalType(38, 10))
  override def nullable: Boolean = true
  override def prettyName: String = "decimal_vector_sum"

  override def createAggregationBuffer(): DecimalVectorSums =
    new DecimalVectorSums(0L, null)

  private def toDec(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v).setScale(10, java.math.RoundingMode.HALF_UP)

  override def update(b: DecimalVectorSums, input: InternalRow): DecimalVectorSums = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return b
    val n = arr.numElements()
    if (b.sums == null) b.sums = Array.fill(n)(java.math.BigDecimal.ZERO)
    require(b.sums.length == n,
      s"decimal_vector_sum: dimension mismatch (${b.sums.length} vs $n)")
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
      s"decimal_vector_sum: dimension mismatch (${b.sums.length} vs ${o.sums.length})")
    var i = 0
    while (i < b.sums.length) { b.sums(i) = b.sums(i).add(o.sums(i)); i += 1 }
    b.count += o.count
    b
  }

  override def eval(b: DecimalVectorSums): Any =
    if (b.count == 0 || b.sums == null) null
    // setScale(10) is exact here: every addend carries scale 10, so the
    // exact sum's scale is ≤ 10 and the Decimal wrap loses nothing
    else new GenericArrayData(
      b.sums.map(s => Decimal(s.setScale(10), 38, 10)))

  // state serialization is DecimalVectorMean's, verbatim (same buffer)
  override def serialize(b: DecimalVectorSums): Array[Byte] =
    DecimalVectorMean(child).serialize(b)
  override def deserialize(bytes: Array[Byte]): DecimalVectorSums =
    DecimalVectorMean(child).deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DecimalVectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecimalVectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DecimalVectorSum =
    copy(child = newChild)
}
