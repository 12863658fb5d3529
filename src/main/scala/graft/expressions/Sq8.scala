package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Int8 scalar quantization (SQ8) kernels — the third compression tier
  * of the similarity family (FAISS's ScalarQuantizer QT_8bit, public):
  * per-vector affine quantization `code_j = ⌊(x_j − min)·255/(max−min)
  * + 0.5⌋`, reconstruction `x̂_j = min + code_j·Δ` with
  * `Δ = (max−min)/255`. Unlike PQ there is NO training — encoding is a
  * pure per-row function of the vector — which makes it the zero-
  * maintenance compressed scan (no codebooks to drift, nothing to
  * rebuild) at 4× the footprint of PQ's m-byte codes.
  *
  * Serving uses the affine identity
  * `⟨q, x̂⟩ = min·Σq_j + Δ·Σ q_j·code_j`: queries precompute `Σq_j`
  * once, the corpus scan is one int-weighted dot per pair
  * ([[Sq8Dot]]). The half-up rounding is spelled `floor(t + 0.5)` in
  * both the interpreted eval and the generated code so DuckDB's SQL
  * replays it exactly (its `round()` half-away ≡ half-up for the
  * non-negative `t` here, but the oracle uses the same floor form
  * anyway). Constant vectors (max = min) encode to all-zero codes with
  * Δ = 0 — exactly reconstructed as the constant. */
case class Sq8Encode(child: Expression) extends UnaryExpression {

  @transient private lazy val elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_encode expects array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("vmin", DoubleType, nullable = false),
    StructField("delta", DoubleType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mn = Double.MaxValue
    var mx = -Double.MaxValue
    var i = 0
    while (i < n) {
      val x = if (elemsNullable && v.isNullAt(i)) 0.0 else v.getDouble(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    if (n == 0) { mn = 0.0; mx = 0.0 }
    val delta = (mx - mn) / 255.0
    val codes = new Array[Int](n)
    if (delta > 0) {
      var j = 0
      while (j < n) {
        val x =
          if (elemsNullable && v.isNullAt(j)) 0.0 else v.getDouble(j)
        codes(j) = math.floor((x - mn) * 255.0 / (mx - mn) + 0.5).toInt
        j += 1
      }
    }
    new GenericInternalRow(
      Array[Any](mn, delta, new GenericArrayData(codes)))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = nullSafeCodeGen(ctx, ev, v => {
    val (n, mn, mx, delta, codes, i, j, x) = (ctx.freshName("n"),
      ctx.freshName("mn"), ctx.freshName("mx"), ctx.freshName("delta"),
      ctx.freshName("codes"), ctx.freshName("i"), ctx.freshName("j"),
      ctx.freshName("x"))
    def read(idx: String): String =
      if (elemsNullable) s"($v.isNullAt($idx) ? 0.0 : $v.getDouble($idx))"
      else s"$v.getDouble($idx)"
    s"""
       |int $n = $v.numElements();
       |double $mn = Double.MAX_VALUE; double $mx = -Double.MAX_VALUE;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = ${read(i)};
       |  if ($x < $mn) $mn = $x;
       |  if ($x > $mx) $mx = $x;
       |}
       |if ($n == 0) { $mn = 0.0; $mx = 0.0; }
       |double $delta = ($mx - $mn) / 255.0;
       |int[] $codes = new int[$n];
       |if ($delta > 0) {
       |  for (int $j = 0; $j < $n; $j++) {
       |    $codes[$j] = (int) java.lang.Math.floor(
       |      (${read(j)} - $mn) * 255.0 / ($mx - $mn) + 0.5);
       |  }
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.expressions
       |  .GenericInternalRow(new Object[] {
       |    java.lang.Double.valueOf($mn),
       |    java.lang.Double.valueOf($delta),
       |    new org.apache.spark.sql.catalyst.util
       |      .GenericArrayData($codes) });
     """.stripMargin
  })

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** `Σ q_j · code_j` — the int-weighted dot behind the SQ8 affine serve
  * identity; left-to-right over `min(len)` elements like
  * [[DotProduct]]. */
case class Sq8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  @transient private lazy val elemsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sq8_dot expects (array<double>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val n = math.min(q.numElements(), c.numElements())
    var s = 0.0
    var i = 0
    if (elemsNullable) {
      while (i < n) {
        val qv = if (q.isNullAt(i)) 0.0 else q.getDouble(i)
        val cv = if (c.isNullAt(i)) 0 else c.getInt(i)
        s += qv * cv
        i += 1
      }
    } else {
      while (i < n) { s += q.getDouble(i) * c.getInt(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = nullSafeCodeGen(ctx, ev, (a, b) => {
    val (i, n, s) = (ctx.freshName("i"), ctx.freshName("n"),
      ctx.freshName("s"))
    val term =
      if (elemsNullable)
        s"($a.isNullAt($i) ? 0.0 : $a.getDouble($i)) * " +
          s"($b.isNullAt($i) ? 0 : $b.getInt($i))"
      else s"$a.getDouble($i) * $b.getInt($i)"
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $s = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $s += $term;
       |}
       |${ev.value} = $s;
     """.stripMargin
  })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
