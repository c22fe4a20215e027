package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused cosine-similarity kernel as a native Catalyst expression.
  *
  * The composable form — `aggregate(zip_with(a,b,*), ...) / sqrt(...) /
  * sqrt(...)` — evaluates higher-order functions interpreted
  * per-element and walks both arrays three times. This expression
  * generates a single fused loop inside whole-stage codegen (one pass,
  * no lambda dispatch, no intermediate arrays), which is the hot kernel
  * of the ANN / embedding-near-dup paths where it runs millions of times
  * per task.
  *
  * Numerical contract: accumulates dot/na/nb in index order and evaluates
  * `dot / sqrt(na) / sqrt(nb)` — bit-identical to the composable form and
  * to the DuckDB oracle's `list_sum(...)/sqrt(...)/sqrt(...)`, so results
  * stay exactly comparable across engines. Any NULL element → NULL.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<double> inputs, got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  // can return NULL for non-null inputs (dimension mismatch, null
  // elements); without this override nullSafeCodeGen would resolve
  // ev.isNull to the literal `false` for non-nullable children and the
  // generated `false = true;` assignment would fail Janino compilation
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // mismatched dimensions → NULL, matching the composable fallback
    // (zip_with null-pads and the sum poisons) — a truncated/corrupt
    // vector must surface, not score on its prefix
    if (y.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $dot / java.lang.Math.sqrt($na) / java.lang.Math.sqrt($nb);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
