package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Long-safe positional rank — a running count over the ordered ROWS
  * frame. Positions are identical to `row_number()` under the repo's
  * deterministic total orders, but the type is LongType end to end:
  * `row_number()` is IntegerType and wraps negative past 2^31 rows in
  * one partition, after which a wrapped rank slips through `rank <= k`
  * cuts (negative passes) and — after 2^32 rows — re-reaches 1,
  * admitting a second "first" row in keep-first dedup.
  *
  * Use for any window whose partition grows with the corpus: per-source
  * / per-shard / per-text-digest (dup floods are exactly the exceeding
  * case) / per-cluster / per-query ANN candidate sets. Windows bounded
  * by construction (per-trace spans, per-user events, nCentroids,
  * k+margin re-packs, top-V vocabularies) may keep `row_number()`.
  * (The `Percentiles.groupedExact` lesson, applied repo-wide after the
  * q122 recurrence.) */
object Ranks {
  def rowNumberL(w: WindowSpec): Column =
    count(lit(1)).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
}
