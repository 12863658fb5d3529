package graft.expressions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

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
}
