package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Banded sign-bit LSH keys in ONE fused pass: element b of the output is
  * band b's key — Σ_{i < bitsPerBand} (dot(v, plane_{b·r+i}) ≥ 0 ?
  * 1L<<i : 0).
  *
  * The composable form ([[graft.operators.SimilaritySearch.signature]]
  * under a `when(dot ≥ 0, …)` sum per bit) embeds EVERY hyperplane
  * coordinate as its own plan Literal — bands × bitsPerBand × dim nodes
  * (4,096 at the default 8×8×64 geometry), whose Catalyst analysis and
  * codegen cost ~a second of driver time per compiled query. Here the
  * plane matrix rides as ONE flat double[] reference object (the
  * [[NearestCells]] pattern) and the whole key array is produced by a
  * single fused loop.
  *
  * Bit-identical to the composed form, including its null semantics: a
  * dimension mismatch or any null element makes every composed dot NULL,
  * whose `when` takes the otherwise-0 branch for every bit — so every
  * band key is 0. Dot products accumulate left-to-right in dimension
  * order, exactly like `aggregate(zip_with(v, plane, _*_), 0.0, _+_)`.
  */
case class SignBitBands(
    child: Expression,
    planes: Array[Array[Double]],
    bands: Int,
    bitsPerBand: Int)
  extends UnaryExpression {
  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 63,
    "bands and bitsPerBand must be positive (bits ≤ 63)")
  require(planes.length == bands * bitsPerBand,
    s"need bands×bitsPerBand = ${bands * bitsPerBand} planes, got ${planes.length}")
  require(planes.forall(_.length == planes(0).length),
    "all hyperplanes must share one dimension")

  private val dim = planes(0).length

  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](planes.length * dim)
    var p = 0
    while (p < planes.length) {
      System.arraycopy(planes(p), 0, out, p * dim, dim); p += 1
    }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_bit_bands requires array<double> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sign_bit_bands"

  /** The fused kernel — public so codegen calls it through one
    * reference-object virtual call.
    */
  def keys(input: ArrayData): GenericArrayData = {
    val out = new Array[Long](bands)
    // composed-form null semantics: mismatched dimension or any null
    // element nulls every dot, so every bit falls to 0 — all keys 0
    var valid = input.numElements() == dim
    if (valid) {
      var i = 0
      while (valid && i < dim) { if (input.isNullAt(i)) valid = false; i += 1 }
    }
    if (valid) {
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) { x(i) = input.getDouble(i); i += 1 }
      val m = flat
      var b = 0
      while (b < bands) {
        var key = 0L
        var bit = 0
        while (bit < bitsPerBand) {
          val off = (b * bitsPerBand + bit) * dim
          var d = 0.0
          i = 0
          while (i < dim) { d += x(i) * m(off + i); i += 1 }
          // Spark comparison semantics order NaN above every number, so
          // the composed `when(dot >= 0, …)` SETS the bit on a NaN dot —
          // Java's `>=` alone would clear it
          if (d >= 0 || java.lang.Double.isNaN(d)) key |= (1L << bit)
          bit += 1
        }
        out(b) = key
        b += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    keys(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("signBitBands", this, classOf[SignBitBands].getName)
      s"${ev.value} = $self.keys($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): SignBitBands =
    copy(child = newChild)
}
