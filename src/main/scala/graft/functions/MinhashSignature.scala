package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `numHashes` MinHash minima over a hashed shingle set in ONE pass:
  * element i = min over shingles g of xxhash64(i, g). Bit-identical to the
  * composed `transform(sequence(...), i -> array_min(transform(hgrams,
  * g -> xxhash64(i, g))))` (XXH64 chains the seed: hash(g, hash(i, 42))),
  * but without materializing `numHashes` intermediate arrays per row —
  * the row's shingles stream through a k-wide running-minimum register
  * bank, cache-resident and allocation-free until the final signature.
  *
  * Empty or NULL input → NULL (mirrors array_min's empty semantics).
  */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // NULL also for non-null empty input — must be a real variable in
  // codegen even when the child is non-nullable
  override def nullable: Boolean = true

  override def prettyName: String = "minhash_signature"

  /** seed_i = xxhash64 state after hashing the literal hash index i —
    * hashInt, because the composed form's `sequence()` yields IntegerType
    * indices and Spark hashes ints with the int primitive.
    */
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val g = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashLong(g, seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val g = ctx.freshName("g")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xxh = classOf[XXH64].getName
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    final long $g = $arr.getLong($j);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      final long $h = $xxh.hashLong($g, $seedsRef[$i]);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}
