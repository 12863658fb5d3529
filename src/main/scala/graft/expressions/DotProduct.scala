package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates an intermediate array per row and walks three lambda
  * indirections; for n² similarity joins that dominates the profile
  * (observed 36 s → 6 s on the sf0.1 near-dup query). This expression
  * whole-stage-codegens to a tight primitive loop with zero allocation,
  * summing left-to-right so results are bit-identical to the HOF form and
  * the DuckDB oracle's `list_dot_product`.
  *
  * Mirrors the reference's only numeric kernel style (SURVEY.md §2.6
  * similarity extension); registered SQL name: `graft_dot`.
  *
  * Typing: `checkInputDataTypes` makes `graft_dot('a', 1)` fail analysis
  * with a proper AnalysisException instead of a runtime ClassCastException
  * or codegen compile error. Length mismatch is DEFINED as truncation to
  * the shorter array (all engine call sites produce equal-length vectors;
  * DuckDB's `list_dot_product` errors instead, so don't lean on the
  * oracle for ragged inputs).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq(left, right).map(_.dataType).exists {
      case ArrayType(DoubleType, _) => false
      case _ => true
    }
    if (bad) TypeCheckResult.TypeCheckFailure(
      "graft_dot expects (array<double>, array<double>), got (" +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString})")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = DoubleType

  /** Null-element discipline (shared by the Pq kernels): when either
    * input TYPE admits null elements, each read is null-checked and a
    * null element contributes 0.0 — the value `UnsafeArrayData` stores
    * in a null slot anyway, so interpreted and generated evaluation
    * agree for EVERY ArrayData implementation (a `GenericArrayData`
    * null would otherwise NPE on unboxing — ADVICE r4). When both types
    * say `containsNull=false` the tight unchecked loop is kept — the
    * check is type-driven, so hot paths that declare non-null arrays
    * pay nothing. */
  @transient private lazy val elemsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    if (elemsNullable) {
      while (i < n) {
        val xv = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
        val yv = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
        sum += xv * yv
        i += 1
      }
    } else {
      while (i < n) {
        sum += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val term =
        if (elemsNullable)
          s"($a.isNullAt($i) ? 0.0 : $a.getDouble($i))" +
            s" * ($b.isNullAt($i) ? 0.0 : $b.getDouble($i))"
        else s"$a.getDouble($i) * $b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $term;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Register `graft_dot` in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
}
