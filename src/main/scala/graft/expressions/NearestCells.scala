package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`keep` nearest centroids of a vector by dot product — the IVF
  * cell-assignment kernel as ONE compact codegen'd expression.
  *
  * Returns `array<struct<s: double, neg_id: bigint>>` of the `keep` best
  * (similarity desc, centroid id asc) cells, sorted — `neg_id = −id` so
  * the struct tuple itself sorts in rank order, the same encoding the
  * literal-argmax form used. Semantics are BIT-IDENTICAL to scoring one
  * `graft_dot` per centroid and ranking (sim desc, id asc): dots sum
  * left-to-right over `min(len(v), dim)` elements (the [[DotProduct]]
  * truncation contract), ties compare with `java.lang.Double.compare`
  * (Catalyst's double ordering: −0.0 < 0.0, NaN greatest), and the
  * ascending-id scan makes the first-seen winner the lowest id.
  *
  * Why an expression and not `array_max(array(struct(dot, …)×k))`: that
  * spelling plants k literal vectors and ~6k expression nodes in the
  * PLAN — and Catalyst's constraint propagation (the
  * InferFiltersFromGenerate pathology documented on the dedup smoke)
  * happily REPLICATES the whole forest into inferred join-side filters,
  * where it re-evaluates per candidate pair and blows generated methods
  * past JIT limits (measured: the t50 serve's executor CPU tripled).
  * Here the centroid matrix is ONE `addReferenceObj` reference and the
  * plan node is a few dozen bytes, so fusion, constraint propagation
  * and codegen all stay cheap no matter where the optimizer copies it.
  * Like the Pq kernels, the interpreted eval mirrors the generated code
  * exactly, and equality is value-based over the matrix so
  * canonicalization/exchange reuse keep working.
  */
case class NearestCells(child: Expression, flat: Array[Double],
    ids: Array[Long], keep: Int) extends UnaryExpression {
  private val k = ids.length
  private val dim = if (k == 0) 0 else flat.length / k
  private val kept = math.min(math.max(keep, 1), math.max(k, 1))

  @transient private lazy val elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      "graft_nearest_cells needs at least one centroid")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cells expects array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", DoubleType, nullable = false),
    StructField("neg_id", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val n = math.min(v.numElements(), dim)
      var s = 0.0
      var j = 0
      while (j < n) {
        val xv = if (elemsNullable && v.isNullAt(j)) 0.0 else v.getDouble(j)
        s += xv * flat(c * dim + j)
        j += 1
      }
      sims(c) = s
      c += 1
    }
    val used = new Array[Boolean](k)
    val rows = new Array[InternalRow](kept)
    var r = 0
    while (r < kept) {
      var best = -1
      var bestS = 0.0
      var i = 0
      while (i < k) {
        // ascending-id scan: a strict > keeps the FIRST (lowest-id) tie
        if (!used(i) &&
            (best < 0 || java.lang.Double.compare(sims(i), bestS) > 0)) {
          best = i; bestS = sims(i)
        }
        i += 1
      }
      used(best) = true
      rows(r) = new GenericInternalRow(
        Array[Any](sims(best), -ids(best)))
      r += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = nullSafeCodeGen(ctx, ev, v => {
    val fl = ctx.addReferenceObj("cellFlat", flat, "double[]")
    val idsRef = ctx.addReferenceObj("cellIds", ids, "long[]")
    val (sims, used, rows) = (ctx.freshName("sims"),
      ctx.freshName("used"), ctx.freshName("rows"))
    val (c, j, n, s, r, i, best, bestS) = (ctx.freshName("c"),
      ctx.freshName("j"), ctx.freshName("n"), ctx.freshName("s"),
      ctx.freshName("r"), ctx.freshName("i"), ctx.freshName("best"),
      ctx.freshName("bestS"))
    val xv =
      if (elemsNullable) s"($v.isNullAt($j) ? 0.0 : $v.getDouble($j))"
      else s"$v.getDouble($j)"
    s"""
       |double[] $sims = new double[$k];
       |int $n = java.lang.Math.min($v.numElements(), $dim);
       |for (int $c = 0; $c < $k; $c++) {
       |  double $s = 0.0;
       |  for (int $j = 0; $j < $n; $j++) {
       |    $s += $xv * $fl[$c * $dim + $j];
       |  }
       |  $sims[$c] = $s;
       |}
       |boolean[] $used = new boolean[$k];
       |org.apache.spark.sql.catalyst.InternalRow[] $rows =
       |  new org.apache.spark.sql.catalyst.InternalRow[$kept];
       |for (int $r = 0; $r < $kept; $r++) {
       |  int $best = -1; double $bestS = 0.0;
       |  for (int $i = 0; $i < $k; $i++) {
       |    if (!$used[$i] && ($best < 0 ||
       |        java.lang.Double.compare($sims[$i], $bestS) > 0)) {
       |      $best = $i; $bestS = $sims[$i];
       |    }
       |  }
       |  $used[$best] = true;
       |  $rows[$r] = new org.apache.spark.sql.catalyst.expressions
       |    .GenericInternalRow(new Object[] {
       |      java.lang.Double.valueOf($sims[$best]),
       |      java.lang.Long.valueOf(-$idsRef[$best]) });
       |}
       |${ev.value} =
       |  new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
     """.stripMargin
  })

  // value equality over the centroid matrix — see PqEncode
  override def equals(other: Any): Boolean = other match {
    case o: NearestCells => child == o.child && keep == o.keep &&
      java.util.Arrays.equals(flat, o.flat) &&
      java.util.Arrays.equals(ids, o.ids)
    case _ => false
  }
  override def hashCode(): Int =
    ((31 * child.hashCode() + keep) * 31 +
      java.util.Arrays.hashCode(flat)) * 31 +
      java.util.Arrays.hashCode(ids)

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
