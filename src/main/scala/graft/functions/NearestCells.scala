package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** IVF coarse-quantizer probe kernel: the `nProbe` nearest centroids of
  * the input vector (squared L2, ties to the lower index), as array<int>
  * ascending by distance.
  *
  * The composable form embedded every centroid coordinate as its own plan
  * Literal and `array_sort`ed ALL k cells per row — the expression tree
  * grows with k·dim (Janino falls over past a few thousand nodes) and
  * selection costs O(k log k) per row. Here the centroid matrix rides
  * along as ONE flat double[] inside the expression (serialized once per
  * task, referenced from codegen via addReferenceObj — broadcast-like,
  * not per-row), the distance scan is a fused k×dim loop over a
  * cache-contiguous row-major matrix, and selection is an nProbe-wide
  * insertion pass: flat plan size and O(k·(dim+nProbe)) per row at any
  * cell count.
  *
  * NULL contract: vector dimension must equal the centroid dimension and
  * all elements must be non-null, else NULL (a truncated or corrupt
  * vector must surface, not quantize on its prefix).
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty, "nearest_cells needs at least one centroid")
  require(nProbe >= 1 && nProbe <= centroids.length,
    s"nProbe must be in [1, ${centroids.length}], got $nProbe")
  require(centroids.forall(_.length == centroids(0).length),
    "all centroids must share one dimension")

  private val k = centroids.length
  private val dim = centroids(0).length

  // row-major flattening; @transient lazy so each deserialized task
  // rebuilds it once from the serialized nested form
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](k * dim)
    var c = 0
    while (c < k) { System.arraycopy(centroids(c), 0, out, c * dim, dim); c += 1 }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires array<double> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // NULL for dimension mismatch / null elements — must be a real codegen
  // variable even when the child is non-nullable
  override def nullable: Boolean = true

  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      x(i) = v.getDouble(i)
      i += 1
    }
    val bestD = Array.fill(nProbe)(Double.PositiveInfinity)
    val bestI = new Array[Int](nProbe)
    val m = flat
    var c = 0
    while (c < k) {
      var d = 0.0
      val off = c * dim
      i = 0
      while (i < dim) { val t = x(i) - m(off + i); d += t * t; i += 1 }
      // strict < on both tests keeps the lower index on ties, matching
      // array_sort over struct<dist,idx>
      if (d < bestD(nProbe - 1)) {
        var j = nProbe - 1
        while (j > 0 && bestD(j - 1) > d) {
          bestD(j) = bestD(j - 1); bestI(j) = bestI(j - 1); j -= 1
        }
        bestD(j) = d
        bestI(j) = c
      }
      c += 1
    }
    new GenericArrayData(bestI)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("centroidMatrix", flat, "double[]")
      val x = ctx.freshName("x")
      val bestD = ctx.freshName("bestD")
      val bestI = ctx.freshName("bestI")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val t = ctx.freshName("t")
      s"""
         |if ($v.numElements() != $dim) { ${ev.isNull} = true; }
         |double[] $x = new double[$dim];
         |for (int $i = 0; !${ev.isNull} && $i < $dim; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $x[$i] = $v.getDouble($i);
         |}
         |if (!${ev.isNull}) {
         |  double[] $bestD = new double[$nProbe];
         |  java.util.Arrays.fill($bestD, Double.POSITIVE_INFINITY);
         |  int[] $bestI = new int[$nProbe];
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    final int $off = $c * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      final double $t = $x[$i] - $mat[$off + $i];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD[$nProbe - 1]) {
         |      int $j = $nProbe - 1;
         |      while ($j > 0 && $bestD[$j - 1] > $d) {
         |        $bestD[$j] = $bestD[$j - 1]; $bestI[$j] = $bestI[$j - 1]; $j--;
         |      }
         |      $bestD[$j] = $d;
         |      $bestI[$j] = $c;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bestI);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}
