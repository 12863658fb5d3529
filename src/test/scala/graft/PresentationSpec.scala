package graft

import org.apache.spark.sql.functions._
import graft.analysis.CriticalPath
import graft.operators.{Presentation, SpanOps, TraceOps}
import graft.sources.JaegerJsonSource

/** assembleTraces (flatten⁻¹, the ES-ingestion shape) and the
  * presentation-prep tables (F4-F8). */
class PresentationSpec extends SparkTestBase {

  private lazy val raw = JaegerJsonSource.traces(spark, fixturePath).cache()
  private lazy val flat = SpanOps.flatten(raw).cache()

  test("assembleTraces round-trips: summarize(assemble(flatten(x))) == summarize(x)") {
    // two known, reference-parity lossy cases: the empty trace (no span rows
    // to reassemble) and the duplicate-tag-key span (flatten's tag MAP
    // collapses dup keys exactly like the reference's dict splat,
    // traceframe.py:493 — its span with two `error` tags counts 1 after a
    // flatten->assemble cycle)
    val dupTagTrace = "4f31115257dcdd56"
    val reassembled = SpanOps.assembleTraces(flat)
    val a = TraceOps.summarize(reassembled).drop("processes")
      .filter(col("traceID") =!= dupTagTrace)
      .collect().map(_.toString).sorted
    val b = TraceOps.summarize(raw.filter(size(col("spans")) > 0))
      .filter(col("traceID") =!= dupTagTrace)
      .drop("processes").collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
    val dupErr = TraceOps.summarize(reassembled)
      .filter(col("traceID") === dupTagTrace).head().getAs[Int]("errspans")
    assert(dupErr === 1) // was 2 pre-flatten; map collapse is by design
  }

  test("assembleTraces rebuilds the processes map from span services") {
    val one = SpanOps.assembleTraces(
      flat.filter(col("traceID") === "073a675ee5118cde")).head()
    val procs = one.getAs[Map[String, Any]]("processes")
    assert(procs.keySet === Set("p1"))
  }

  test("prettyDuration renders whole-second durations correctly (fixed quirk)") {
    val r = spark.range(1)
      .select(Presentation.prettyDuration(lit(1234567L))).head.getString(0)
    // reference's `dur.microseconds/1000` would show "234ms"; we fix to total
    assert(r === "1234ms")
  }

  test("timeline tables: spans, critical overlay, call/return edges") {
    val one = flat.filter(col("traceID") === "01a66754057d3e44").cache()
    val segs = Presentation.spanSegments(one)
    assert(segs.columns.toSeq ===
      Seq("start", "end", "service", "start_event", "end_event"))
    assert(segs.count() === one.count())

    val crit = Presentation.critSegments(CriticalPath.segmentsFromFlat(one))
    assert(crit.count() > 0)
    // overlay segments lie within the span timeline envelope
    val env = segs.agg(min("start"), max("end")).head()
    val cEnv = crit.agg(min("start"), max("end")).head()
    assert(cEnv.getLong(0) >= env.getLong(0) && cEnv.getLong(1) <= env.getLong(1))

    val edges = Presentation.callReturnEdges(one)
    val n = one.filter(col("parent") =!= "").count()
    assert(edges.count() === 2 * n) // one call + one return edge per child
    assert(edges.where(col("start_event").isNull).count() === 0)
  }

  test("traceTable renders links and error flags") {
    val t = Presentation.traceTable(TraceOps.summarize(raw), "http://j:16686")
    val err = t.filter(col("errflag").contains("span color")).count()
    assert(err === 4) // the 4 error traces get red flags
    assert(t.filter(col("traceID").startsWith("<a href=\"http://j:16686/trace/"))
      .count() === 40)
  }
}
