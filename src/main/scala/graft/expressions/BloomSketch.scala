package graft.expressions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, ScalarSubquery, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Column-level access to Spark's Bloom-filter Catalyst expressions.
  *
  * Spark ships `bloom_filter_agg` / `might_contain` for its own runtime
  * row-level filtering (InjectRuntimeFilter) but registers neither as a
  * public function; these wrappers surface them for graft operators that
  * want an explicit, plannable Bloom stage (decontamination, anti-join
  * pre-filters). The aggregate builds the filter distributedly (partial
  * blooms merged OR-wise map-side), and `might_contain` evaluates against
  * a scalar-subquery result — the bloom bytes never land on the driver
  * and broadcast to executors with the subquery result, exactly like
  * Spark's own injected bloom joins.
  */
object BloomSketch {

  /** Aggregate a LongType column into a serialized Bloom filter.
    * `expectedItems` sizes the filter (Spark derives optimal bit count
    * unless `numBits` caps it). */
  def bloomAgg(h: Column, expectedItems: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(expression(h),
      Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** The single-row `df` as a scalar subquery expression — the only
    * non-foldable bloom input `might_contain` accepts. */
  def scalar(df: DataFrame): Column =
    column(ScalarSubquery(df.queryExecution.analyzed))

  /** `might_contain(bloom, h)`: true when `h` may be in the set (no false
    * negatives; false-positive rate set by the aggregate's sizing). */
  def mightContain(bloom: Column, h: Column): Column =
    column(BloomFilterMightContain(expression(bloom), expression(h)))

  /** Codegen'd membership-count kernel: how many elements of a string
    * array the bloom MAY contain (see [[BloomCountContained]]). */
  def countContained(arr: Column, bloomBytes: Array[Byte]): Column =
    column(BloomCountContained(expression(arr), bloomBytes))

  /** Fused shingle-construction + membership-count kernel over a token
    * array (see [[ShingleBloomCount]]) — the contamination-gate hot
    * path. */
  def shingleCount(toks: Column, n: Int, bloomBytes: Array[Byte]): Column =
    column(ShingleBloomCount(expression(toks), n, bloomBytes))
}

/** `bloom_count_contained(arr, bloomBytes)`: the number of elements of a
  * string array whose `xxhash64` the Bloom filter may contain — the
  * whole gate of [[graft.operators.Dedup.contaminationScore]] collapsed
  * into ONE whole-stage-codegen'd loop.
  *
  * The HOF formulation (`size(filter(sh, x => might_contain(bloom,
  * xxhash64(x))))`) evaluates the lambda INTERPRETED per element — an
  * `InterpretedSafeProjection` round-trip per shingle that benched at
  * ~1 ms/doc and zero parallel speedup (round-4 driver detail: t13 wall
  * 4.61 s ≈ run 4.68 s on 32 cores). This expression does the identical
  * arithmetic — `XXH64.hashUTF8String(elem, 42L)` is the exact static
  * Spark's own `xxhash64` codegen emits (seed 42), and
  * `mightContainLong` is what `BloomFilterMightContain` calls — inside
  * generated code, with the filter deserialized ONCE and shipped via
  * `addReferenceObj` (the same mechanism `BloomFilterMightContain` uses
  * for its scalar-subquery bloom).
  *
  * Null elements never count (the bloom never holds a null hash); null
  * input yields null, like the HOF form. Stateless and array-local, so
  * it is streaming-safe — the ingest gate applies UNCHANGED to a
  * streaming DataFrame. Like [[DotProduct]]/[[PqAdc]], the interpreted
  * `nullSafeEval` mirrors the generated code exactly (pinned by spec). */
case class BloomCountContained(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(bloomBytes)

  override def prettyName: String = "bloom_count_contained"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_count_contained expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && bloom.mightContainLong(
          XXH64.hashUTF8String(a.getUTF8String(i), 42L))) cnt += 1L
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = nullSafeCodeGen(ctx, ev, v => {
    val bf = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    val (n, i, cnt) =
      (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("cnt"))
    s"""
       |int $n = $v.numElements();
       |long $cnt = 0L;
       |for (int $i = 0; $i < $n; $i++) {
       |  if (!$v.isNullAt($i) && $bf.mightContainLong(
       |      org.apache.spark.sql.catalyst.expressions.XXH64
       |        .hashUTF8String($v.getUTF8String($i), 42L))) $cnt++;
       |}
       |${ev.value} = $cnt;
     """.stripMargin
  })

  // VALUE equality over the byte payload (case-class equality compares
  // Array by reference — two semantically identical gates would never
  // compare equal, defeating canonicalization, subexpression elimination
  // and exchange reuse; Spark's own Literal overrides the same way)
  override def equals(other: Any): Boolean = other match {
    case o: BloomCountContained =>
      child == o.child && java.util.Arrays.equals(bloomBytes, o.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** `shingle_bloom_count(toks, n, bloomBytes)`: the number of DISTINCT
  * word `n`-grams of a token array whose `xxhash64` the Bloom filter may
  * contain — [[BloomCountContained]] with the shingle CONSTRUCTION fused
  * into the same generated loop.
  *
  * Why fuse: the shingle-string stage
  * (`transform(sequence(...), i => array_join(slice(toks, i, n), " "))`)
  * is a higher-order function, and Spark evaluates HOF lambdas
  * INTERPRETED per element — measured at ~4 s single-task for the sf0.1
  * gate corpus, 8× the cost of the hash+probe itself. Here each shingle
  * is assembled with `UTF8String.concatWs` (identical bytes to
  * `array_join(..., " ")`, which also skips null elements), hashed with
  * `XXH64.hashUTF8String(_, 42L)` (identical to `xxhash64`), sort-
  * deduplicated as longs, and probed against the once-deserialized
  * filter. Distinctness is by HASH rather than by string — divergent
  * only on a 64-bit collision between two distinct shingles of one
  * document (~2⁻⁶⁴·s² per doc), and the no-false-negative gate contract
  * is preserved (pinned by spec against the string-built formulation).
  *
  * Fewer than `n` tokens → 0, like the guarded HOF form; null input →
  * null. Stateless and array-local: streaming-safe. */
case class ShingleBloomCount(child: Expression, n: Int,
    bloomBytes: Array[Byte]) extends UnaryExpression {

  require(n >= 1, s"shingle width n=$n must be >= 1")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(bloomBytes)

  @transient private lazy val sep: UTF8String = UTF8String.fromString(" ")

  override def prettyName: String = "shingle_bloom_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_bloom_count expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val nsh = toks.numElements() - n + 1
    if (nsh <= 0) return 0L
    val hs = new Array[Long](nsh)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < nsh) {
      var j = 0
      while (j < n) {
        parts(j) =
          if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      hs(i) = XXH64.hashUTF8String(UTF8String.concatWs(sep, parts: _*), 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var cnt = 0L
    var k = 0
    while (k < nsh) {
      if ((k == 0 || hs(k) != hs(k - 1)) && bloom.mightContainLong(hs(k)))
        cnt += 1L
      k += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = nullSafeCodeGen(ctx, ev, v => {
    val bf = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    val utf8 = "org.apache.spark.unsafe.types.UTF8String"
    val sepRef = ctx.addReferenceObj("sep", sep, utf8)
    val (nsh, hs, parts, i, j, k, cnt) = (ctx.freshName("nsh"),
      ctx.freshName("hs"), ctx.freshName("parts"), ctx.freshName("i"),
      ctx.freshName("j"), ctx.freshName("k"), ctx.freshName("cnt"))
    s"""
       |int $nsh = $v.numElements() - $n + 1;
       |long $cnt = 0L;
       |if ($nsh > 0) {
       |  long[] $hs = new long[$nsh];
       |  $utf8[] $parts = new $utf8[$n];
       |  for (int $i = 0; $i < $nsh; $i++) {
       |    for (int $j = 0; $j < $n; $j++) {
       |      $parts[$j] = $v.isNullAt($i + $j)
       |        ? null : $v.getUTF8String($i + $j);
       |    }
       |    $hs[$i] = org.apache.spark.sql.catalyst.expressions.XXH64
       |      .hashUTF8String($utf8.concatWs($sepRef, $parts), 42L);
       |  }
       |  java.util.Arrays.sort($hs);
       |  for (int $k = 0; $k < $nsh; $k++) {
       |    if (($k == 0 || $hs[$k] != $hs[$k - 1])
       |        && $bf.mightContainLong($hs[$k])) $cnt++;
       |  }
       |}
       |${ev.value} = $cnt;
     """.stripMargin
  })

  // value equality over the byte payload — see BloomCountContained
  override def equals(other: Any): Boolean = other match {
    case o: ShingleBloomCount => child == o.child && n == o.n &&
      java.util.Arrays.equals(bloomBytes, o.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int = (31 * child.hashCode() + n) * 31 +
    java.util.Arrays.hashCode(bloomBytes)

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
