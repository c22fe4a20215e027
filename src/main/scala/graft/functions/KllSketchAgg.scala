package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Mergeable KLL quantile sketch over a double column — the quantile
  * analog of `hll_sketch_agg` (which Spark ships for COUNT DISTINCT but
  * has no counterpart for percentiles: `approx_percentile` exposes no
  * reusable serialized state to SQL users).
  *
  * Why it matters at scale: a 100 TB corpus computes per-partition
  * (per-day, per-month) sketch states ONCE; any later rollup — monthly,
  * yearly, ad-hoc date ranges — merges kilobyte states instead of
  * rescanning raw rows, exactly like the a19 HLL-merge shape for
  * distinct counts. KLL (Karnin–Lang–Liberty, FOCS'16) gives a proven
  * normalized-rank-error bound (~1.65% at k=200, 99% confidence) that
  * survives arbitrary merges.
  *
  * Determinism contract: KLL compaction flips random coins, so the
  * *sketch bytes* and point estimates vary run to run; only
  * rank-error-band properties are stable. Gates therefore compare exact
  * values and error-band flags (the d4/k2 planted-floor frame), never
  * raw estimates.
  *
  * Null inputs are ignored like `sum`. Output is the serialized compact
  * sketch (`binary`), decodable by [[KllMergeAgg]] and [[KllQuantiles]].
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg needs a double column, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }

  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Holder so the merge aggregate can adopt the FIRST input sketch's k
  * (merging into a pre-built default-k buffer would silently degrade
  * accuracy to min(k_default, k_input)).
  */
final class KllMergeBuf(var sk: KllDoublesSketch)

/** Merges serialized [[KllSketchAgg]] states without touching raw rows —
  * the incremental-rollup step: stored per-month states → any coarser
  * rollup. Result accuracy is governed by min(k) over the merged states
  * (the KLL merge rule).
  */
case class KllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllMergeBuf]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg needs a binary sketch column, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllMergeBuf = new KllMergeBuf(null)

  override def update(b: KllMergeBuf, input: InternalRow): KllMergeBuf = {
    val v = child.eval(input)
    if (v != null) {
      val in = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      if (b.sk == null) b.sk = in else b.sk.merge(in)
    }
    b
  }

  override def merge(b: KllMergeBuf, o: KllMergeBuf): KllMergeBuf = {
    if (o.sk != null) { if (b.sk == null) b.sk = o.sk else b.sk.merge(o.sk) }
    b
  }

  override def eval(b: KllMergeBuf): Any =
    if (b.sk == null) null else b.sk.toByteArray

  override def serialize(b: KllMergeBuf): Array[Byte] =
    if (b.sk == null) Array.emptyByteArray else b.sk.toByteArray
  override def deserialize(bytes: Array[Byte]): KllMergeBuf =
    if (bytes.isEmpty) new KllMergeBuf(null)
    else new KllMergeBuf(KllDoublesSketch.heapify(Memory.wrap(bytes)))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantiles(sketch, ranks)` → array<double>: quantile estimates at
  * the given normalized ranks (INCLUSIVE criteria, matching
  * `percentile_disc`'s ≤-rank convention). Cold-path scalar over
  * one-row sketch states — CodegenFallback, deliberately outside the
  * whole-stage-codegen hot path.
  */
case class KllQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantiles needs (binary, array<double>), got ${l.simpleString} / ${r.simpleString}")
    }
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

  override def nullSafeEval(bin: Any, ranks: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bin.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) return null
    val rs = ranks.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(sk.getQuantiles(rs, QuantileSearchCriteria.INCLUSIVE))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantiles =
    copy(left = newLeft, right = newRight)
}
