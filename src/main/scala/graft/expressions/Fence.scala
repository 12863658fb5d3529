package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** `no_pushdown(e)`: identity on `e`, declared NON-deterministic so the
  * optimizer treats the enclosing predicate as immovable.
  *
  * Why it exists: Catalyst assumes predicates are cheap and pushes them as
  * deep as possible — `PushDownPredicates` substitutes a filter on a
  * computed column through the projection that computes it and on through
  * a user `repartition`, down to the scan. For a CPU-heavy, byte-light
  * predicate (the contamination gate: tokenize → shingle → hash → bloom
  * per row) over a few-split input, that collapses the entire computation
  * into the scan stage's parallelism — measured on the round-4 t13 bench
  * entry: wall 4.61 s ≈ executor run 4.68 s, i.e. ONE task doing all the
  * work on a 32-core host, because the 600 KB documents file is a single
  * parquet split. The explicit `repartition(defaultParallelism)` that
  * exists precisely to spread that CPU work was defeated by the pushdown.
  *
  * Wrapping the predicate in `no_pushdown` keeps it exactly where it was
  * written: Spark never moves non-deterministic predicates (the same rule
  * that pins `rand() < 0.5`), and never duplicates them into both a
  * pushed filter and the original projection. Evaluation semantics are
  * untouched — the expression forwards value, nullability, and type, and
  * codegen is a pass-through.
  *
  * Use it ONLY on predicates whose evaluation cost dwarfs a shuffled
  * row's width, sitting above an explicit redistribution. For cheap
  * predicates the pushdown Catalyst does by default is the right thing —
  * at 100 TB a pushed filter drops rows before they ever reach a
  * shuffle, and scans there have thousands of splits, so compute
  * parallelism is not scan-starved the way a tiny local file is. */
case class NoPushdown(child: Expression) extends UnaryExpression {

  /** The whole point: non-deterministic expressions are never pushed,
    * reordered, or duplicated by the optimizer. */
  override lazy val deterministic: Boolean = false

  override def prettyName: String = "no_pushdown"

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object NoPushdown {
  /** Column-level wrapper: `filter(noPushdown(expensive > 0))`. */
  def noPushdown(c: Column): Column = column(NoPushdown(expression(c)))
}
