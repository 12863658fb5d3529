package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (encode / query LUT / asymmetric distance)
  * as codegen'd Catalyst expressions.
  *
  * PQ splits a `dim`-vector into `m` subspaces of `dsub = dim/m` dims and
  * stores, per subspace, the id of the nearest of `k` trained centroids —
  * `m` small ints instead of `dim` floats (PQ, Jégou et al., TPAMI 2011).
  * Query scoring is asymmetric: the query precomputes a LUT of its
  * sub-vector dot products against every centroid, and each corpus code
  * word scores with `m` table lookups — no vector arithmetic per pair.
  *
  * The codebook travels inside the expression and reaches generated code
  * via `addReferenceObj` (same mechanism Spark uses for its own literal
  * arrays) — flat layout `flat[((mi*k)+ki)*dsub + j]`. All three kernels
  * whole-stage-codegen to allocation-free loops; like [[DotProduct]], the
  * interpreted `nullSafeEval` mirrors the generated code exactly.
  */
case class PqEncode(child: Expression, flat: Array[Double], m: Int, k: Int)
    extends UnaryExpression {
  private val dsub = flat.length / (m * k)
  // null elements read as 0.0, only checked when the input TYPE admits
  // them — see DotProduct.elemsNullable for the shared discipline
  @transient private lazy val elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  // ||c||² per centroid: argmin_c ||x−c||² = argmin_c (||c||² − 2·x·c)
  private lazy val cn2: Array[Double] = Array.tabulate(m * k) { c =>
    var s = 0.0; var j = 0
    while (j < dsub) { val v = flat(c * dsub + j); s += v * v; j += 1 }
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0; var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val c = mi * k + ki
        var d = cn2(c)
        var j = 0
        while (j < dsub) {
          val idx = mi * dsub + j
          val xv =
            if (elemsNullable && v.isNullAt(idx)) 0.0 else v.getDouble(idx)
          d -= 2.0 * xv * flat(c * dsub + j)
          j += 1
        }
        if (d < bestD) { bestD = d; best = ki }
        ki += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = nullSafeCodeGen(ctx, ev, v => {
    val fl = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val cns = ctx.addReferenceObj("pqCn2", cn2, "double[]")
    val codes = ctx.freshName("codes")
    val (mi, ki, j, c, d, best, bestD) = (ctx.freshName("mi"),
      ctx.freshName("ki"), ctx.freshName("j"), ctx.freshName("c"),
      ctx.freshName("d"), ctx.freshName("best"), ctx.freshName("bestD"))
    val xv =
      if (elemsNullable)
        s"($v.isNullAt($mi * $dsub + $j) ? 0.0 : $v.getDouble($mi * $dsub + $j))"
      else s"$v.getDouble($mi * $dsub + $j)"
    s"""
       |int[] $codes = new int[$m];
       |for (int $mi = 0; $mi < $m; $mi++) {
       |  int $best = 0; double $bestD = Double.MAX_VALUE;
       |  for (int $ki = 0; $ki < $k; $ki++) {
       |    int $c = $mi * $k + $ki;
       |    double $d = $cns[$c];
       |    for (int $j = 0; $j < $dsub; $j++) {
       |      $d -= 2.0 * $xv
       |        * $fl[$c * $dsub + $j];
       |    }
       |    if ($d < $bestD) { $bestD = $d; $best = $ki; }
       |  }
       |  $codes[$mi] = $best;
       |}
       |${ev.value} =
       |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
     """.stripMargin
  })

  // value equality over the codebook (case-class equality compares Array
  // by reference, defeating canonicalization/CSE/exchange reuse — same
  // fix as BloomCountContained)
  override def equals(other: Any): Boolean = other match {
    case o: PqEncode => child == o.child && m == o.m && k == o.k &&
      java.util.Arrays.equals(flat, o.flat)
    case _ => false
  }
  override def hashCode(): Int = ((31 * child.hashCode() + m) * 31 + k) *
    31 + java.util.Arrays.hashCode(flat)

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Per-query lookup table: `lut[mi*k + ki] = q_mi · c_(mi,ki)` — computed
  * once per (broadcast) query row, reused for every corpus code word. */
case class PqLut(child: Expression, flat: Array[Double], m: Int, k: Int)
    extends UnaryExpression {
  private val dsub = flat.length / (m * k)
  @transient private lazy val elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_lut expects array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val lut = new Array[Double](m * k)
    var c = 0
    while (c < m * k) {
      val mi = c / k
      var s = 0.0; var j = 0
      while (j < dsub) {
        val idx = mi * dsub + j
        val xv =
          if (elemsNullable && v.isNullAt(idx)) 0.0 else v.getDouble(idx)
        s += xv * flat(c * dsub + j)
        j += 1
      }
      lut(c) = s
      c += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = nullSafeCodeGen(ctx, ev, v => {
    val fl = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val lut = ctx.freshName("lut")
    val (c, mi, j, s) = (ctx.freshName("c"), ctx.freshName("mi"),
      ctx.freshName("j"), ctx.freshName("s"))
    val xv =
      if (elemsNullable)
        s"($v.isNullAt($mi * $dsub + $j) ? 0.0 : $v.getDouble($mi * $dsub + $j))"
      else s"$v.getDouble($mi * $dsub + $j)"
    s"""
       |double[] $lut = new double[$m * $k];
       |for (int $c = 0; $c < $m * $k; $c++) {
       |  int $mi = $c / $k;
       |  double $s = 0.0;
       |  for (int $j = 0; $j < $dsub; $j++) {
       |    $s += $xv * $fl[$c * $dsub + $j];
       |  }
       |  $lut[$c] = $s;
       |}
       |${ev.value} =
       |  new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
     """.stripMargin
  })

  // value equality over the codebook — see PqEncode
  override def equals(other: Any): Boolean = other match {
    case o: PqLut => child == o.child && m == o.m && k == o.k &&
      java.util.Arrays.equals(flat, o.flat)
    case _ => false
  }
  override def hashCode(): Int = ((31 * child.hashCode() + m) * 31 + k) *
    31 + java.util.Arrays.hashCode(flat)

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Asymmetric distance: `Σ_mi lut[mi*k + codes[mi]]` ≈ q · reconstruct(c)
  * — the approximate cosine for normalized inputs, `m` array reads per
  * scored pair. A null code-word element contributes 0 to the sum (only
  * checked when the codes TYPE admits nulls; [[PqEncode]] emits
  * `containsNull=false`, so the engine's own serve path pays no check). */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  @transient private lazy val elemsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<int>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    var s = 0.0; var mi = 0
    val m = codes.numElements()
    if (elemsNullable) {
      while (mi < m) {
        if (!codes.isNullAt(mi)) {
          val idx = mi * k + codes.getInt(mi)
          if (!lut.isNullAt(idx)) s += lut.getDouble(idx)
        }
        mi += 1
      }
    } else {
      while (mi < m) { s += lut.getDouble(mi * k + codes.getInt(mi)); mi += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = nullSafeCodeGen(ctx, ev, (a, b) => {
    val (mi, n, s) = (ctx.freshName("mi"), ctx.freshName("n"),
      ctx.freshName("s"))
    val body =
      if (elemsNullable)
        s"""if (!$a.isNullAt($mi)) {
           |    int _idx = $mi * $k + $a.getInt($mi);
           |    if (!$b.isNullAt(_idx)) $s += $b.getDouble(_idx);
           |  }""".stripMargin
      else s"$s += $b.getDouble($mi * $k + $a.getInt($mi));"
    s"""
       |int $n = $a.numElements();
       |double $s = 0.0;
       |for (int $mi = 0; $mi < $n; $mi++) {
       |  $body
       |}
       |${ev.value} = $s;
     """.stripMargin
  })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
