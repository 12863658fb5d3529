package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native feature-hashed bag-of-words embedding over a PRE-TOKENIZED
  * `array<string>` column (the "hashing trick", Weinberger et al. 2009):
  * each token lands in dimension `hash60 & (d−1)` with sign from hash
  * bit `log2(d)`; per-occurrence ±1 contributions sum per dimension.
  *
  * Replaces the HOF composition `aggregate(tokens, zeros(d), (a,t) =>
  * transform(a, ...))`: Catalyst evaluates HOF lambda bodies
  * interpreted, and the `transform` rebuilds the ENTIRE d-element
  * accumulator array per token — O(tokens × d) allocations per row,
  * measured at 14.0 s of the sf0.1 bench (q113, 14% of the whole suite)
  * and the dominant cost of the text-ANN pipeline (t32). This kernel is
  * one pass over the token array with a single mutable `double[d]`
  * accumulator — O(tokens + d) — and stays map-only, so a 100-TB corpus
  * embeds with zero shuffle.
  *
  * Bit-compatibility with the HOF form (whose q113 oracle hashes are
  * pinned): the per-token hash is the portable 60-bit
  * [[graft.functions.TextFunctions.hash60]] — the first 15 hex chars of
  * `md5(token)` as a positive long — re-derived here directly from the
  * MD5 digest bytes (15 hex chars = bytes 0–6 plus the high nibble of
  * byte 7). Contributions are exact ±1.0 sums, so accumulation order
  * cannot change the result. A null token element contributes nothing —
  * exactly the HOF form, where `hash60(null)` nulled the dim and the
  * `when(i === null)` fell through to `+0.0`.
  *
  * Codegen: whole-stage-friendly — the generated code is one static
  * call into [[HashedEmbedding.compute]] (the MD5 loop is not worth
  * inlining as Java source; the win is killing the per-token array
  * rebuild, not the call). Output `array<double> containsNull=false`,
  * preserving the downstream-kernel invariant (DotProduct, L2Normalize).
  * Registered SQL name: `graft_hashed_embedding`.
  */
case class HashedEmbedding(child: Expression, d: Int)
    extends UnaryExpression {
  require(d > 0 && (d & (d - 1)) == 0, s"d must be a power of two: $d")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_embedding expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_hashed_embedding"

  override def nullSafeEval(input: Any): Any =
    HashedEmbedding.compute(input.asInstanceOf[ArrayData], d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.HashedEmbedding.compute($c, $d)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedEmbedding {

  /** One MessageDigest per executor thread: `MessageDigest.getInstance`
    * allocates and does a provider lookup — per-token would dominate. */
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The kernel (also the codegen target — must stay public static).
    * For each non-null token: h = first 60 bits of md5 (== hash60),
    * dim = h & (d−1), sign = bit `log2(d)` of h; acc[dim] += ±1. */
  def compute(tokens: ArrayData, d: Int): ArrayData = {
    val bits = Integer.numberOfTrailingZeros(d)
    val mask = d.toLong - 1L
    val acc = new Array[Double](d)
    val md = md5.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val dig = md.digest(tokens.getUTF8String(i).getBytes)
        // first 15 hex chars of the digest = bytes 0..6 + high nibble of
        // byte 7 — identical to conv(substring(md5(x),1,15),16,10)
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (dig(j) & 0xffL); j += 1 }
        h = (h << 4) | ((dig(7) >> 4) & 0xfL)
        val dim = (h & mask).toInt
        acc(dim) += (if (((h >>> bits) & 1L) == 0L) 1.0 else -1.0)
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** The ONE validated SQL builder — shared by [[register]] and
    * [[graft.GraftExtensions]] so both registration paths reject a bad
    * `d` identically: it must be a FOLDABLE INTEGRAL literal that fits
    * an Int (a fractional 64.9 must not silently truncate to 64; a
    * long past Int.MaxValue must not wrap into a nonsense dimension). */
  def fromSql(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : HashedEmbedding = {
    def bad(what: String): Nothing = throw new IllegalArgumentException(
      "graft_hashed_embedding: d (argument 2) must be an integer " +
        s"literal that fits Int, got $what")
    val dims = exprs(1) match {
      case e if e.foldable => e.eval(null) match {
        case null => bad("NULL")
        case n: java.lang.Integer => n.intValue
        case n: java.lang.Long =>
          if (n.longValue == n.intValue.toLong) n.intValue
          else bad(s"out-of-range $n")
        case n: java.lang.Short => n.intValue
        case n: java.lang.Byte => n.intValue
        case other => bad(s"${other.getClass.getSimpleName} $other")
      }
      case e => bad(s"non-foldable expression ${e.sql}")
    }
    HashedEmbedding(exprs(0), dims)
  }

  /** Register `graft_hashed_embedding(toks, d)` in the session's function
    * registry (idempotent). `d` must be a foldable integral literal
    * (int or bigint both accepted) — validated by [[fromSql]]. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hashed_embedding", fromSql, "built-in")
}
