package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-memory EXACT percentiles — the 100-TB twin of Spark's
  * `percentile()` aggregate.
  *
  * Spark's exact `Percentile` is a TypedImperativeAggregate whose buffer
  * is an in-heap value→count map that grows with the group's distinct
  * values (for µs-resolution durations, effectively with group size) and
  * CANNOT spill — at 100 TB a hot group's buffer is an executor OOM, not
  * a slowdown. The two forms here compute the *same interpolated
  * statistic bit-for-bit* (they replicate `Percentile.getPercentile`'s
  * arithmetic: `pos = (n-1)·p`, and for fractional positions
  * `(ceil(pos) − pos)·v_lo + (pos − floor(pos))·v_hi`, with the
  * equal-endpoint shortcuts) from operators whose working state is
  * spill-safe or driver-bounded:
  *
  *   - [[groupedExact]] — per-group percentiles via ONE group-keyed
  *     window pass: long-safe running-count ranks run in `WindowExec`, which
  *     sorts through `UnsafeExternalSorter` (disk-spilling — task memory
  *     stays bounded however large the group), then a partial-aggregable
  *     `groupBy` on the SAME key (no second exchange) picks the two
  *     boundary rows per percentile. A pathologically hot single group
  *     still serializes through one (spilling) task — the same property
  *     as any exact per-group order statistic; when that matters, use
  *     [[groupedRangeExact]], which spreads every group across range
  *     partitions and has no serial point at all.
  *   - [[globalExact]] — whole-frame percentiles via the classic
  *     distributed selection: one range-partitioned sort (every task
  *     sorts ~1/P of the data, spill-safe), a P-row partition census to
  *     the driver, then one pick pass that extracts only the boundary
  *     ranks. Driver state is P counts + 2·|ps| doubles; no task ever
  *     holds the distribution.
  *   - [[groupedRangeExact]] — [[globalExact]] generalized to groups:
  *     range-partitions on (group, value) so even a pathologically hot
  *     group spans partitions instead of funneling one task — the
  *     grouped family's last serial point removed (r11 verdict ask 6).
  *
  * Equivalence to `percentile()` (and to DuckDB `quantile_cont`, via the
  * repo's pinned t36 identity) is asserted bit-exactly by
  * PercentilesSpec; the driver-facing bounded twins (t46–t49) hash
  * against the SAME DuckDB oracles as their exact-aggregate baselines
  * (t33/q119/t36/q127).
  */
object Percentiles {

  /** HALF_UP decimal rounding of a driver-side double — the exact
    * arithmetic of plan-side `round(col, n)`, for callers that fold a
    * collected statistic back into a frame (t49, `Similarity.mmrSelect`).
    * NaN passes through (BigDecimal would throw). */
  def roundHalfUp(x: Double, scale: Int): Double =
    if (x.isNaN) x
    else BigDecimal(x).setScale(scale,
      BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Exact interpolated percentiles per group, bounded-memory form.
    *
    * @param df      input; `valCol` must be non-null on every row (filter
    *                nulls first — `percentile()` skips them, a window
    *                rank cannot)
    * @param grpCols group-by keys
    * @param valCol  numeric column the percentiles are taken over
    * @param ps      (fraction, output-column-name) pairs
    * @param extras  additional aggregates evaluated in the same
    *                `groupBy` over the same rows (e.g.
    *                `count(lit(1)).as("n")`) — they keep the whole
    *                statistic to ONE scan of `df`
    * @param roundTo HALF_UP decimals applied to each percentile
    *                (negative = unrounded, for callers that feed the
    *                value into further arithmetic like t36's MAD)
    * @param tieCols extra window-order keys after `valCol`; ties carry
    *                equal values so they never change the statistic —
    *                pass ids only if a fully deterministic physical row
    *                order matters for debugging
    */
  def groupedExact(df: DataFrame, grpCols: Seq[String], valCol: String,
      ps: Seq[(Double, String)], extras: Seq[Column] = Nil,
      roundTo: Int = 4, tieCols: Seq[Column] = Nil): DataFrame = {
    require(ps.forall { case (p, _) => p >= 0.0 && p <= 1.0 },
      s"percentile fractions must be in [0, 1], got ${ps.map(_._1)}")
    val grp = grpCols.map(col)
    // Rank is a running count over the ordered ROWS frame, not
    // row_number(): the positional rank is identical, but count() is
    // LongType end to end — row_number() is IntegerType and silently
    // wraps past 2^31 rows in one group, the exact hot-group regime
    // this operator exists for.
    val wOrd = Window.partitionBy(grp: _*)
      .orderBy(col(valCol) +: tieCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(grp: _*)
    val ranked = df
      .withColumn("__rk", count(lit(1)).over(wOrd) - 1L)
      .withColumn("__n", count(lit(1)).over(wAll))
    def pos(n: Column, p: Double): Column =
      (n - 1L).cast("double") * lit(p)
    val slots = ps.zipWithIndex.flatMap { case ((p, _), i) =>
      val q = pos(col("__n"), p)
      Seq(
        max(when(col("__rk") === floor(q), col(valCol).cast("double")))
          .as(s"__lo$i"),
        max(when(col("__rk") === ceil(q), col(valCol).cast("double")))
          .as(s"__hi$i"))
    } :+ max(col("__n")).as("__nn")
    val aggs = extras ++ slots
    val agged = ranked.groupBy(grp: _*).agg(aggs.head, aggs.tail: _*)
    interpolateSelect(agged, ps, roundTo)
  }

  /** Shared final step of the grouped forms: turn the per-group
    * (__lo$i, __hi$i, __nn) slots into named percentile columns with
    * Percentile.getPercentile's exact arithmetic, shortcuts included:
    * integral position → v_lo; equal endpoints → v_lo (skipping the
    * re-weighted sum keeps the double BIT-identical); else linear
    * interpolation in the reference's operand order. One helper, not
    * two copies, so [[groupedExact]] and [[groupedRangeExact]] stay
    * bit-equal by construction. */
  private def interpolateSelect(agged: DataFrame,
      ps: Seq[(Double, String)], roundTo: Int): DataFrame = {
    val out = ps.zipWithIndex.map { case ((p, name), i) =>
      val q = (col("__nn") - 1L).cast("double") * lit(p)
      val lo = floor(q)
      val hi = ceil(q)
      val v = when(lo === hi, col(s"__lo$i"))
        .when(col(s"__lo$i") === col(s"__hi$i"), col(s"__lo$i"))
        .otherwise(
          (hi.cast("double") - q) * col(s"__lo$i") +
            (q - lo.cast("double")) * col(s"__hi$i"))
      (if (roundTo >= 0) round(v, roundTo) else v).as(name)
    }
    agged.select(
      agged.columns.filterNot(_.startsWith("__")).map(col) ++ out: _*)
  }

  /** Exact interpolated percentiles of one column over the WHOLE frame,
    * distributed-selection form. Returns the values to the driver
    * (|ps| doubles — they are broadcast-scale by definition: cut points,
    * one-row summaries). NaN per entry when the frame is empty.
    *
    * Cost: one range-partition sort of the (single-column) projection,
    * one census job, one pick job over the materialized sort — three
    * narrow passes, every task spill-safe, driver state P counts. */
  def globalExact(df: DataFrame, valCol: String, ps: Seq[Double],
      nParts: Int = 0): Seq[Double] = {
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile fractions must be in [0, 1], got $ps")
    // nParts ≤ 0 → cluster width: a fixed constant would leave a
    // 1000-executor cluster sorting 100 TB through 32 range partitions
    // (spill-safe but serial); deriving from defaultParallelism keeps
    // each sort slice ∝ data/cores at any deployment size
    val parts = math.max(1, if (nParts > 0) nParts
      else df.sparkSession.sparkContext.defaultParallelism)
    // persist(), NOT localCheckpoint(): the census and pick passes must
    // read ONE materialization (the offsets assume it), but
    // Dataset.unpersist is a CacheManager call that cannot release
    // RDD-level localCheckpoint blocks — a checkpointed copy would pin
    // dataset-sized storage until driver GC. persist() registers with
    // the CacheManager, so the finally below genuinely frees it, and it
    // keeps lineage intact: an executor lost between the passes
    // recomputes (deterministically — range split points and counts
    // depend only on the input) instead of failing the job.
    val sorted = df
      .select(col(valCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .repartitionByRange(parts, col("__v"))
      .sortWithinPartitions(col("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val census = sorted
        .groupBy(spark_partition_id().as("__pid"))
        .agg(count(lit(1)).as("__c"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val n = census.map(_._2).sum
      if (n == 0L) ps.map(_ => Double.NaN)
      else {
        val offByPid: Map[Int, Long] = {
          var acc = 0L
          census.map { case (pid, c) =>
            val o = pid -> acc; acc += c; o }.toMap
        }
        val wantRanks: Set[Long] = ps.flatMap { p =>
          val q = (n - 1).toDouble * p
          Seq(math.floor(q).toLong, math.ceil(q).toLong)
        }.toSet
        val bcWant = sorted.sparkSession.sparkContext.broadcast(wantRanks)
        val bcOff = sorted.sparkSession.sparkContext.broadcast(offByPid)
        val picked: Map[Long, Double] = sorted.rdd
          .mapPartitionsWithIndex { (pid, it) =>
            val off = bcOff.value.getOrElse(pid, 0L)
            val want = bcWant.value
            // Long row counter, not zipWithIndex: the iterator index is
            // Int and a >2^31-row partition would wrap it negative,
            // silently corrupting every rank comparison
            var idx = off
            it.flatMap { row =>
              val r = idx; idx += 1L
              if (want.contains(r)) Iterator.single(r -> row.getDouble(0))
              else Iterator.empty
            }
          }.collect().toMap
        ps.map { p =>
          val q = (n - 1).toDouble * p
          val lo = math.floor(q)
          val hi = math.ceil(q)
          val vLo = picked(lo.toLong)
          val vHi = picked(hi.toLong)
          if (lo == hi || vLo == vHi) vLo
          else (hi - q) * vLo + (q - lo) * vHi
        }
      }
    } finally sorted.unpersist(blocking = false)
  }

  /** Exact per-group percentiles with NO single-task hot group —
    * [[globalExact]]'s distributed selection generalized to groups: the
    * escape hatch [[groupedExact]]'s scaladoc routes a pathological
    * group to.
    *
    * Where [[groupedExact]] funnels each group through one (spilling)
    * window task, this form range-partitions on (group, value) so a hot
    * group SPANS partitions — every task sorts ~1/P of the data
    * whatever the skew — then reconstructs global per-group ranks from
    * a (partition, group) census and picks only the boundary rows:
    *
    *   1. one range-partition sort on (grp…, v) (spill-safe; groups are
    *      contiguous runs across consecutive partitions);
    *   2. census job: per-(partition, group) counts to the driver —
    *      at most P + G − 1 rows (each partition holds a contiguous run
    *      of groups), so driver state is O(G + P), same order as the
    *      G-row result itself;
    *   3. pick pass: a broadcast (group, pid) → rank-offset map turns
    *      the per-partition row counter into the group-global rank
    *      (Long end to end — the 2^31 wrap regime is exactly the hot
    *      group this exists for); wanted floor/ceil ranks emit,
    *      carrying their group's total count (no join — NULL group
    *      keys survive, as they do in groupedExact's plain groupBy);
    *   4. the picked ≤ 2·|ps|·G rows finish through
    *      [[interpolateSelect]] — the SAME slot aggregation and
    *      interpolation arithmetic as [[groupedExact]], so bit-equality
    *      with `percentile()` holds by construction (asserted with
    *      forced spills in PercentilesSpec).
    *
    * `valCol` must be non-null on every row (filter first), as in
    * [[groupedExact]]. */
  def groupedRangeExact(df: DataFrame, grpCols: Seq[String],
      valCol: String, ps: Seq[(Double, String)], roundTo: Int = 4,
      nParts: Int = 0): DataFrame = {
    require(grpCols.nonEmpty, "groupedRangeExact needs group keys — " +
      "use globalExact for whole-frame percentiles")
    require(ps.forall { case (p, _) => p >= 0.0 && p <= 1.0 },
      s"percentile fractions must be in [0, 1], got ${ps.map(_._1)}")
    val spark = df.sparkSession
    val parts = math.max(1, if (nParts > 0) nParts
      else spark.sparkContext.defaultParallelism)
    val grp = grpCols.map(col)
    val g = grpCols.length
    val ordCols = grp :+ col("__v")
    // same persist-not-localCheckpoint reasoning as globalExact: the
    // census offsets assume the pick pass reads the SAME materialized
    // layout, and persist() is actually releasable in the finally
    val sorted = df
      .select((grp :+ col(valCol).cast("double").as("__v")): _*)
      .filter(col("__v").isNotNull)
      .repartitionByRange(parts, ordCols: _*)
      .sortWithinPartitions(ordCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val census = sorted
        .groupBy((spark_partition_id().as("__pid") +: grp): _*)
        .agg(count(lit(1)).as("__c"))
        .collect()
        .map(r => (r.getInt(0), List.range(1, g + 1).map(r.get),
          r.getLong(g + 1)))
      val nByGrp: Map[List[Any], Long] = census
        .groupBy(_._2).map { case (k, rows) => k -> rows.map(_._3).sum }
      // group-global rank offset of each (group, partition) slice:
      // cumulative counts in ascending-pid order within the group
      val offByGrpPid: Map[(List[Any], Int), Long] = census
        .groupBy(_._2).flatMap { case (k, rows) =>
          var acc = 0L
          rows.sortBy(_._1).map { case (pid, _, c) =>
            val o = (k, pid) -> acc; acc += c; o }
        }
      // one broadcast structure: group → (n, wanted floor/ceil ranks).
      // Each picked row carries its group's n, so the final aggregation
      // needs NO join — an inner equi-join on the group keys would also
      // silently drop a NULL-keyed group, which groupedExact (a plain
      // groupBy) and percentile() both keep
      val wantByGrp: Map[List[Any], (Long, Set[Long])] = nByGrp.map {
        case (k, n) => k -> (n, ps.flatMap { case (p, _) =>
          val q = (n - 1).toDouble * p
          Seq(math.floor(q).toLong, math.ceil(q).toLong)
        }.toSet)
      }
      val bcOff = spark.sparkContext.broadcast(offByGrpPid)
      val bcWant = spark.sparkContext.broadcast(wantByGrp)
      val pickedRdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        val offs = bcOff.value
        val wants = bcWant.value
        var curKey: List[Any] = null
        var idx = 0L
        var n = 0L
        var want: Set[Long] = Set.empty
        it.flatMap { row =>
          val key = List.range(0, g).map(row.get)
          if (key != curKey) {
            curKey = key
            idx = offs.getOrElse((key, pid), 0L)
            val (nn, w) = wants.getOrElse(key, (0L, Set.empty[Long]))
            n = nn; want = w
          }
          val r = idx; idx += 1L
          if (want.contains(r))
            Iterator.single(
              org.apache.spark.sql.Row.fromSeq(key :+ r :+
                row.getDouble(g) :+ n))
          else Iterator.empty
        }
      }
      import org.apache.spark.sql.types.{DoubleType, LongType,
        StructField, StructType}
      val picked = spark.createDataFrame(pickedRdd,
        StructType(sorted.schema.fields.take(g) ++ Seq(
          StructField("__rk", LongType),
          StructField("__v2", DoubleType),
          StructField("__gn", LongType))))
      val slots = ps.zipWithIndex.flatMap { case ((p, _), i) =>
        val q = (col("__gn") - 1L).cast("double") * lit(p)
        Seq(
          max(when(col("__rk") === floor(q), col("__v2")))
            .as(s"__lo$i"),
          max(when(col("__rk") === ceil(q), col("__v2")))
            .as(s"__hi$i"))
      } :+ max(col("__gn")).as("__nn")
      val agged = picked.groupBy(grp: _*).agg(slots.head, slots.tail: _*)
      // the picked frame is ≤ 2·|ps|·G rows; materialize the result off
      // the persisted sort so the finally can release it eagerly
      interpolateSelect(agged, ps, roundTo).localCheckpoint()
    } finally sorted.unpersist(blocking = false)
  }
}
