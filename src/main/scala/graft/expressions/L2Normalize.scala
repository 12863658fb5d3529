package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native L2 normalization of a float/double array column: cast to
  * double (null element → 0.0), divide by the L2 norm when it is
  * positive, return the cast array unchanged otherwise (zero vectors
  * stay zeros — no NaN/±Inf). Null row → null.
  *
  * Replaces the HOF composition `when(norm > 0, transform(dv, x => x /
  * norm))` where `norm = sqrt(dot(dv, dv))` and `dv = transform(v, cast
  * + coalesce)`. Catalyst evaluates HOF lambda BODIES interpreted, per
  * element, and the division lambda's body embeds the whole `norm`
  * subtree — so the norm (two 64-element transforms plus a dot) was
  * re-computed PER ELEMENT: ~645 µs/row measured on the sf0.1
  * embeddings, the single largest cost in the similarity family. This
  * expression is one generated pass (measured ~100× less executor time
  * on the same scan): read + square-sum, then an in-place divide.
  *
  * Bit-compatibility with the HOF form (which the oracle hashes were
  * verified against): left-to-right square sum, per-element DIVISION by
  * `sqrt(ss)` (not multiplication by a reciprocal — differs in the last
  * ulp), and the same `norm > 0` guard, which is false for NaN sums so
  * NaN-poisoned vectors pass through cast-but-unnormalized exactly as
  * before.
  *
  * Output type is `array<double> containsNull=false`, preserving the
  * invariant every downstream kernel (DotProduct, PqEncode/PqLut/PqAdc)
  * relies on for its unchecked tight loop. Registered SQL name:
  * `graft_l2norm`.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_l2norm expects array<float> or array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Same type-driven null-element discipline as [[DotProduct]]: only a
    * child TYPE that admits null elements pays the per-read check. */
  @transient private lazy val elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val v =
        if (elemsNullable && a.isNullAt(i)) 0.0
        else if (fromFloat) a.getFloat(i).toDouble
        else a.getDouble(i)
      out(i) = v
      ss += v * v
      i += 1
    }
    val norm = java.lang.Math.sqrt(ss)
    if (norm > 0) {
      var j = 0
      while (j < n) { out(j) = out(j) / norm; j += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val v = ctx.freshName("v")
      val read =
        if (fromFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val term = if (elemsNullable) s"($a.isNullAt($i) ? 0.0 : $read)" else read
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $term;
         |  $out[$i] = $v;
         |  $ss += $v * $v;
         |}
         |double $norm = java.lang.Math.sqrt($ss);
         |if ($norm > 0) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $out[$j] = $out[$j] / $norm;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object L2Normalize {
  /** Register `graft_l2norm` in the session's function registry
    * (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2norm", exprs => L2Normalize(exprs(0)), "built-in")
}
