package graft

import graft.analysis.CriticalPath
import graft.model.{CritSeg, SpanLite}
import graft.operators.SpanOps
import graft.sources.JaegerJsonSource

/** Semantic anchor for the critical-path operator: the reference's golden
  * test (/root/reference/test/test_traceframe.py:8-109) re-expressed over
  * `Dataset[CritSeg]`, plus generalized invariants over random span trees. */
class CriticalPathSpec extends SparkTestBase {

  private val tid = "b6b80525a332cb6b"
  private def span(id: String, op: String, start: Long, dur: Long, pid: String,
      parent: String, svc: String) =
    SpanLite(tid, id, op, start, dur, pid, parent, svc)

  // the reference golden fixture: frontend -> {cart, recommendation -> product}
  private val goldenSpans = Seq(
    span("b6b80525a332cb6b", "/cart", 1639415450569000L, 291000L, "p1", "", "frontend"),
    span("69dc17050f4c2221", "/GetCart", 1639415450627000L, 162000L, "p2", "b6b80525a332cb6b", "cartservice"),
    span("23890e1f876db993", "/GetRecommendations", 1639415450631000L, 169000L, "p3", "b6b80525a332cb6b", "recommendationservice"),
    span("ee567b37267317a7", "/GetProducts", 1639415450752000L, 6000L, "p4", "23890e1f876db993", "productcatalogservice"))

  test("golden: reference critical path for trace b6b80525a332cb6b") {
    val segs = CriticalPath.compute(goldenSpans)
    assert(segs.size === 5)
    val expected = Seq(
      (1639415450569000L, 58000L, "b6b80525a332cb6b"),
      (1639415450627000L, 131000L, "69dc17050f4c2221"),
      (1639415450758000L, 31000L, "69dc17050f4c2221"),
      (1639415450789000L, 11000L, "23890e1f876db993"),
      (1639415450800000L, 60000L, "b6b80525a332cb6b"))
    assert(segs.map(s => (s.startTime, s.duration, s.span.spanID)) === expected)
    // segments tile the root interval exactly: Σ durations = root duration
    assert(segs.map(_.duration).sum === 291000L)
    // full span payload of the first segment matches the golden JSON fields
    assert(segs.head.span === goldenSpans.head)
  }

  test("golden via the distributed operator (groupByKey + flatMapGroups)") {
    import spark.implicits._
    val ds = spark.createDataset(scala.util.Random.shuffle(goldenSpans))
      .repartition(4)
    val segs = CriticalPath.segments(ds).collect().sortBy(_.startTime)
    assert(segs.map(s => (s.startTime, s.duration, s.span.spanID)).toSeq ===
      Seq(
        (1639415450569000L, 58000L, "b6b80525a332cb6b"),
        (1639415450627000L, 131000L, "69dc17050f4c2221"),
        (1639415450758000L, 31000L, "69dc17050f4c2221"),
        (1639415450789000L, 11000L, "23890e1f876db993"),
        (1639415450800000L, 60000L, "b6b80525a332cb6b")))
  }

  test("empty input raises like the reference") {
    intercept[IllegalArgumentException](CriticalPath.compute(Nil))
  }

  test("50k-child flat trace stays near-linear (outstanding-children " +
      "bookkeeping is O(1) per event, not O(children))") {
    // Pathological fan-out: 50k DIRECT children of one root, all alive
    // at once (child i = [i+1, end 2N-i], so returns drain in reverse
    // call order — the worst case for the r8 ArrayBuffer indexOf+remove,
    // which scanned ~n/2 ids per return: ~1.25e9 string compares. The
    // LinkedHashSet bookkeeping keeps the whole trace O(n log n).
    val n = 50000
    val root = SpanLite("t", "root", "op", 0L, 2L * n + 10L, "p", "", "svc")
    val kids = (0 until n).map { i =>
      SpanLite("t", s"c$i", "op", i + 1L, (2L * n - i) - (i + 1L), "p",
        "root", "svc")
    }
    val t0 = System.nanoTime()
    val segs = CriticalPath.compute(root +: kids)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(segs.nonEmpty)
    // segments still tile the root interval exactly
    assert(segs.map(_.duration).sum === root.duration)
    // generous wall bound: the quadratic form took minutes here
    assert(secs < 10.0, s"took $secs s — bookkeeping regressed?")
  }

  test("every fixture trace yields a non-empty, contiguous critical path") {
    val flat = SpanOps.flatten(JaegerJsonSource.traces(spark, fixturePath))
    val byTrace = CriticalPath.segmentsFromFlat(flat).collect()
      .groupBy(_.span.traceID)
    assert(byTrace.size === 39) // 40 fixture traces, 1 has no spans
    byTrace.foreach { case (t, segs) =>
      assert(segs.nonEmpty, s"trace $t has no critical segments")
      checkInvariants(t, segs.sortBy(_.startTime).toSeq)
    }
  }

  private def checkInvariants(t: String, segs: Seq[CritSeg]): Unit = {
    segs.foreach(s => assert(s.duration >= 0, s"negative segment in $t"))
    segs.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.startTime + a.duration === b.startTime,
          s"gap/overlap in critical path of $t")
      case _ =>
    }
  }

  // --- property: random well-nested trees ---------------------------------

  private case class TreeCfg(seed: Long, width: Int, depth: Int)

  private def genTree(cfg: TreeCfg): Seq[SpanLite] = {
    val rnd = new scala.util.Random(cfg.seed)
    val buf = scala.collection.mutable.ArrayBuffer.empty[SpanLite]
    def grow(parent: String, t0: Long, budget: Long, depth: Int): Unit = {
      val id = f"s${buf.size}%04d"
      buf += SpanLite("t", id, s"op$depth", t0, budget, s"p$depth", parent, "svc")
      if (depth < cfg.depth && budget > 10) {
        var cursor = t0 + 1
        (0 until rnd.nextInt(cfg.width + 1)).foreach { _ =>
          val remain = t0 + budget - cursor - 1
          if (remain > 4) {
            val d = 2 + rnd.nextLong(remain - 2)
            grow(id, cursor, d, depth + 1)
            cursor += (if (rnd.nextBoolean()) d + 1 else rnd.nextLong(d) + 1)
          }
        }
      }
    }
    grow("", 1700000000000000L, 1 + rnd.nextLong(1000000), 0)
    buf.toSeq
  }

  test("property: tied timestamps — deterministic under input permutation") {
    // The reference's tie behavior is an artifact of Python's stable sort
    // over insertion order (traceframe.py:571); distributed inputs have no
    // insertion order, so the ENGINE'S DEFINED SEMANTICS are the canonical
    // order in CriticalPath.compute: spans by (startTime, spanID), then
    // per-span (call, return) events stably by timestamp. This pins it:
    // trees with deliberately tied start/end times must produce byte-equal
    // output for EVERY input permutation, and still tile the root.
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { i =>
      val base = 1700000000000000L
      // children tie with parent start, with each other, and end exactly
      // at sibling starts / parent end
      val nKids = 1 + rnd.nextInt(4)
      val rootDur = 1000L
      val root = SpanLite("t", "root", "op", base, rootDur, "p", "", "svc")
      val kids = (0 until nKids).map { k =>
        val tieStart = rnd.nextBoolean()
        val start = if (tieStart) base else base + k * (rootDur / (nKids + 1))
        val end0 = base + (k + 1) * (rootDur / (nKids + 1))
        SpanLite("t", s"k$k", "op", start, math.max(1, end0 - start), "p",
          "root", "svc")
      }
      // grandchildren tying exactly with their parent's full interval
      val gks = kids.zipWithIndex.collect {
        case (kid, j) if j % 2 == 0 =>
          SpanLite("t", s"g$j", "op", kid.startTime, kid.duration, "p",
            kid.spanID, "svc")
      }
      val spans = root +: (kids ++ gks)
      val ref = CriticalPath.compute(spans)
      checkInvariants(s"tied-$i", ref)
      assert(ref.map(_.duration).sum === rootDur, s"tied-$i: sum")
      (1 to 5).foreach { p =>
        val perm = rnd.shuffle(spans)
        assert(CriticalPath.compute(perm) === ref,
          s"tied-$i perm $p: output depends on input order")
      }
    }
  }

  test("property: tiling invariants on 300 random well-nested span trees") {
    val seeds = new scala.util.Random(42)
    (1 to 300).foreach { i =>
      val cfg = TreeCfg(seeds.nextLong(), width = 1 + i % 3, depth = 1 + i % 5)
      val spans = genTree(cfg)
      val root = spans.head
      val segs = CriticalPath.compute(spans)
      assert(segs.nonEmpty, s"cfg $cfg: empty")
      segs.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.startTime + a.duration === b.startTime, s"cfg $cfg: gap")
        case _ =>
      }
      assert(segs.forall(s => spans.exists(_.spanID == s.span.spanID)),
        s"cfg $cfg: foreign span")
      assert(segs.head.startTime === root.startTime, s"cfg $cfg: start")
      assert(segs.map(_.duration).sum === root.duration, s"cfg $cfg: sum")
    }
  }
}
