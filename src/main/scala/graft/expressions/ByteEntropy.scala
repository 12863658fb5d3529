package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Shannon entropy (nats) of a binary payload's BYTE distribution — the
  * codec-free multimodal diagnostic: already-compressed media sits near
  * ln(256) ≈ 5.545, text near 4.2, zero-padded/truncated blobs collapse
  * toward 0, so one number separates "real payload", "double-compressed",
  * and "corrupt/padded" at ingest without decoding anything.
  *
  * Formulation is the engine-wide entropy identity (q58):
  * H = ln t − (Σ c·ln c)/t over the 256-bin byte histogram — one pass,
  * no allocation beyond the histogram, accumulated in ascending byte
  * order (deterministic). Empty input is DEFINED as 0.0 (a zero-length
  * blob carries no information; avoids ln(0)). Null → null.
  *
  * Codegen calls the static kernel like [[HashedEmbedding]] — the win
  * is the single fused histogram pass, not inlined Java. SQL name
  * `graft_byte_entropy`: per-session via [[ByteEntropy.register]], or
  * cluster-wide at session build via [[graft.GraftExtensions]].
  */
case class ByteEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_byte_entropy expects binary, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_byte_entropy"

  override def nullSafeEval(input: Any): Any =
    ByteEntropy.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ByteEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteEntropy {

  /** The kernel (codegen target — stays public static). */
  def compute(bytes: Array[Byte]): Double = {
    val n = bytes.length
    if (n == 0) return 0.0
    val hist = new Array[Int](256)
    var i = 0
    while (i < n) { hist(bytes(i) & 0xff) += 1; i += 1 }
    var s = 0.0
    var v = 0
    while (v < 256) {
      val c = hist(v)
      if (c > 0) s += c * math.log(c.toDouble)
      v += 1
    }
    math.log(n.toDouble) - s / n
  }

  /** Register `graft_byte_entropy` in the session's function registry
    * (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_byte_entropy", exprs => ByteEntropy(exprs(0)), "built-in")
}
