package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** The argmin leg of [[NearestCells]] WITH its winning distance:
  * struct(dist, idx) of the single nearest centroid (squared L2, ties to
  * the lower index, identical arithmetic — a sequential dimension-order
  * `d += t*t` fold).
  *
  * This is the combiner unit of the SHARDED fused-assignment kernel
  * ([[graft.operators.Clustering.assignFused]] past `maxKernelK`): at
  * k ≈ 10⁵ (SemDeDup at corpus scale) one flat k×dim matrix is a
  * 0.5–1 GB plan reference — a broadcast bomb — so the centroid matrix
  * is cut into ≤maxKernelK chunks, each chunk evaluates this expression
  * independently, and the global winner is `least()` over the per-chunk
  * (dist, cid) structs: struct ordering compares dist first, then cid,
  * which reproduces the unsharded kernel's ties-to-lower-index rule
  * exactly (cids enter sorted ascending).
  *
  * NULL contract mirrors [[NearestCells]]: dimension mismatch or null
  * element → NULL.
  */
case class NearestCellDist(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "nearest_cell_dist needs at least one centroid")
  require(centroids.forall(_.length == centroids(0).length),
    "all centroids must share one dimension")

  private val k = centroids.length
  private val dim = centroids(0).length

  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](k * dim)
    var c = 0
    while (c < k) { System.arraycopy(centroids(c), 0, out, c * dim, dim); c += 1 }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell_dist requires array<double> input, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("idx", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "nearest_cell_dist"

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
    var bestD = Double.PositiveInfinity
    var bestI = 0
    val m = flat
    var c = 0
    while (c < k) {
      var d = 0.0
      val off = c * dim
      i = 0
      while (i < dim) { val t = x(i) - m(off + i); d += t * t; i += 1 }
      // strict <: the lower index wins ties, as in NearestCells
      if (d < bestD) { bestD = d; bestI = c }
      c += 1
    }
    InternalRow(bestD, bestI)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val mat = ctx.addReferenceObj("centroidMatrix", flat, "double[]")
      val x = ctx.freshName("x")
      val bestD = ctx.freshName("bestD")
      val bestI = ctx.freshName("bestI")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
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
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  int $bestI = 0;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    final int $off = $c * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      final double $t = $x[$i] - $mat[$off + $i];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $bestI = $c; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $bestD, $bestI });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCellDist =
    copy(child = newChild)
}
