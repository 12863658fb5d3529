package graft.analysis

import org.apache.spark.sql.{DataFrame, Dataset}

/** Per-trace call-depth census kernel — the t38 walk, extracted so the
  * malformed-input contract is testable on planted traces (cycle spec)
  * independent of the Jaeger fixture.
  *
  * Depth semantics: a root (empty parent) and an ORPHAN (parent id
  * absent from the trace) both anchor at depth 1; every resolvable
  * parent hop adds 1. Malformed parent CYCLES cannot anchor, so the
  * walk carries a step cap (≤ n hops): a capped walk anchors its
  * landing span at 1 and back-fills the visited chain from there —
  * depth stays DEFINED, DETERMINISTIC (spans are sorted by id before
  * memo anchoring, because shuffle iterator order is not stable), and
  * bounded by ~2n even on corrupt traces. Memoized: each span's depth
  * resolves once, so a pathological 50k-deep chain costs O(n), not
  * O(n²) — the same bookkeeping discipline as the critical-path
  * automaton. */
object TraceDepth {

  /** (traceID, max_depth, n_spans) per trace from (traceID, spanID,
    * parent) rows; runs behind the same narrow per-trace groupByKey
    * shuffle as A2 — per-task state is one trace's spans. */
  def maxDepths(sp: Dataset[(String, String, String)]): DataFrame = {
    val spark = sp.sparkSession
    import spark.implicits._
    sp.groupByKey(_._1).mapGroups { (tid, it) =>
      // sorted so memo anchoring is deterministic even for malformed
      // cyclic traces (shuffle iterator order is not)
      val spans = it.toSeq.sortBy(_._2)
      val parent = spans.iterator.map(t => t._2 -> t._3).toMap
      val memo = scala.collection.mutable.HashMap.empty[String, Int]
      def depth(id0: String): Int = memo.getOrElse(id0, {
        val chain = scala.collection.mutable.ArrayBuffer.empty[String]
        var id = id0; var steps = 0
        while (!memo.contains(id) && steps <= spans.size && {
          val p = parent.getOrElse(id, "")
          p.nonEmpty && parent.contains(p)
        }) { chain += id; id = parent(id); steps += 1 }
        var d = memo.getOrElse(id, 1) // root/orphan/cycle-cap anchor
        memo(id) = d
        var i = chain.size - 1
        while (i >= 0) { d += 1; memo(chain(i)) = d; i -= 1 }
        memo(id0)
      })
      (tid, spans.iterator.map(t => depth(t._2)).max.toLong,
        spans.size.toLong)
    }.toDF("traceID", "max_depth", "n_spans")
  }
}
