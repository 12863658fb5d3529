package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.SpanLite
import graft.operators.SpanOps
import graft.sources.JaegerJsonSource
import graft.streaming.TraceStreams

/** Streaming smoke tests: batch parquet/JSONL drives each streaming query
  * synchronously through the memory sink (spark_guide.md pattern). */
class StreamingSpec extends SparkTestBase {

  private def writeSpanJsonl(): String = {
    val flat = SpanOps.flatten(JaegerJsonSource.traces(spark, fixturePath))
      .select("traceID", "spanID", "operationName", "startTime", "duration",
        "processID", "parent", "service")
    val dir = Files.createTempDirectory("graft_stream").toString
    flat.coalesce(1).write.mode("overwrite").json(dir)
    dir
  }

  test("windowed span metrics stream produces the batch-equivalent counts") {
    val dir = writeSpanJsonl()
    val stream = TraceStreams.serviceWindowStats(
      TraceStreams.spanFileStream(spark, dir))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("svc_stats")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("svc_stats")
      .agg(sum("n_spans")).head().getLong(0)
    assert(got === 331) // every fixture span lands in some window
  }

  test("session windows merge nearby spans per service") {
    val dir = writeSpanJsonl()
    val stream = TraceStreams.serviceSessions(
      TraceStreams.spanFileStream(spark, dir))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("svc_sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("svc_sessions")
    assert(rows.agg(sum("n_spans")).head().getLong(0) === 331)
    // session merge actually happened: fewer sessions than spans
    assert(rows.count() < 331)
    assert(rows.select("session_window.start").head() != null)
  }

  test("stateful critical-path stream emits segments after trace quiescence") {
    import SparkTestBase.session.implicits._
    val flat = SpanOps.flatten(JaegerJsonSource.traces(spark, fixturePath))
      .select(col("traceID"), col("spanID"), col("operationName"),
        col("startTime"), col("duration"), col("processID"), col("parent"),
        col("service")).as[SpanLite]
    val dir = Files.createTempDirectory("graft_stream_cp").toString
    flat.toDF().coalesce(1).write.mode("overwrite").json(dir)

    val streamSpans = TraceStreams.spanFileStream(spark, dir)
      .drop("eventTime").as[SpanLite]
    val segs = TraceStreams.criticalPathStream(streamSpans, quietMs = 1)
    val q = segs.toDF().writeStream.outputMode("append")
      .format("memory").queryName("crit_stream")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    // first batch buffers state; the processing-time trigger then fires
    // timeout batches that flush quiesced traces — poll, don't
    // processAllAvailable (it never settles while timeout batches recur)
    val deadline = System.currentTimeMillis() + 60000
    var n = 0L
    while (n < 546 && System.currentTimeMillis() < deadline) {
      Thread.sleep(500)
      n = spark.table("crit_stream").count()
    }
    q.stop()
    assert(n === 546) // same segment count as the batch operator
    // value equality, not just count: identical segments to the batch path
    val streamed = spark.table("crit_stream")
      .selectExpr("startTime", "duration", "span.spanID")
      .collect().map(_.toString).sorted
    val batch = graft.analysis.CriticalPath.segmentsFromFlat(flat.toDF())
      .toDF().selectExpr("startTime", "duration", "span.spanID")
      .collect().map(_.toString).sorted
    assert(streamed.toSeq === batch.toSeq)
  }

  test("driver smoke parity: SparkEntry.entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
