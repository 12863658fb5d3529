package graft

import graft.analysis.TraceDepth

/** Planted-trace contract for the t38 depth kernel: well-formed chains
  * count exactly, orphans anchor at 1, and malformed parent CYCLES
  * terminate deterministically under the step cap instead of hanging
  * the walk (the r9 verdict's untested robustness path). */
class TraceDepthSpec extends SparkTestBase {
  import SparkTestBase.session.implicits._

  private def depths(rows: (String, String, String)*)
      : Map[String, (Long, Long)] =
    TraceDepth.maxDepths(rows.toDS()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("well-formed chain and star count exact depths") {
    val got = depths(
      // 3-deep chain
      ("t1", "a", ""), ("t1", "b", "a"), ("t1", "c", "b"),
      // root with two direct children — depth 2
      ("t2", "r", ""), ("t2", "x", "r"), ("t2", "y", "r"))
    assert(got("t1") === (3L, 3L))
    assert(got("t2") === (2L, 3L))
  }

  test("orphan parents anchor at depth 1 (chain hanging off an orphan)") {
    // c's parent is absent from the trace: c anchors at 1, d chains to 2
    val got = depths(("t3", "c", "missing"), ("t3", "d", "c"))
    assert(got("t3") === (2L, 2L))
  }

  test("a 2-cycle terminates, caps deterministically, and stays bounded") {
    // a→b→a can never anchor; the step cap (≤ n hops) lands the walk,
    // anchors the landing span at 1, and back-fills the visited chain:
    // hand-trace of the capped walk from 'a' gives memo(a)=4, memo(b)=3
    val got = depths(("t4", "a", "b"), ("t4", "b", "a"))
    assert(got("t4") === (4L, 2L))
  }

  test("cycle with an attached child: defined, deterministic, bounded") {
    val rows = Seq(
      ("t5", "a", "b"), ("t5", "b", "a"), ("t5", "c", "a"),
      // a healthy trace alongside, unaffected by t5's corruption
      ("t6", "r", ""), ("t6", "s", "r"))
    val one = TraceDepth.maxDepths(rows.toDS()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val two = TraceDepth.maxDepths(rows.toDS()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(one === two) // capped walk is deterministic across runs
    assert(one("t6") === (2L, 2L)) // healthy trace exact
    val (d5, n5) = one("t5")
    assert(n5 === 3L)
    // bounded: the cap admits ≤ n+1 hops from any start plus one
    // back-fill level per visited span — never a runaway depth
    assert(d5 >= 1L && d5 <= 2L * n5)
  }

  test("deep chain resolves in one pass (memoized, not quadratic)") {
    val n = 20000
    val rows = (1 until n).map(i => ("t7", s"s$i", s"s${i - 1}")) :+
      (("t7", "s0", ""))
    val t0 = System.nanoTime()
    val got = depths(rows: _*)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got("t7") === (n.toLong, n.toLong))
    assert(secs < 30.0, s"depth walk took $secs s — quadratic regression?")
  }
}
