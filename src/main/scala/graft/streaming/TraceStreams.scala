package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{CritSeg, JaegerModel, SpanLite}
import graft.analysis.CriticalPath

/** Structured Streaming extension (SURVEY.md §7.1.9 — not a port
  * requirement: the reference is batch-pull only, but trace data is
  * naturally append-only with late-arriving spans, which maps directly onto
  * watermarks + stateful grouping).
  *
  * Input model: a stream of RAW SPAN records (JSONL files in a directory —
  * swap for Kafka by changing `readStream.format`), each span carrying its
  * traceID, the shape produced by [[graft.operators.SpanOps.flatten]] minus
  * the map/array columns: `traceID, spanID, operationName, startTime (µs),
  * duration, processID, parent, service`.
  */
object TraceStreams {

  val spanStreamSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("traceID",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("spanID",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("operationName",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("startTime",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("duration",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("processID",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("parent",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("service",
      org.apache.spark.sql.types.StringType)))

  /** JSONL span file stream. */
  def spanFileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(spanStreamSchema).json(dir)
      .withColumn("eventTime", timestamp_micros(col("startTime")))

  /** Per-service tumbling-window span metrics with a watermark for state
    * eviction: counts + duration stats per (window, service). */
  def serviceWindowStats(spans: DataFrame,
      window_ : String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    spans
      .withWatermark("eventTime", watermark)
      .groupBy(window(col("eventTime"), window_), col("service"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("duration")).as("sum_dur_us"),
        max(col("duration")).as("max_dur_us"))

  /** Per-service windowed latency percentiles — the streaming twin of
    * the batch SLO table (t33): exact interpolated p50/p95 over each
    * (window, service) group's span durations, plus the error-tagged
    * count when an `is_err` column is present. Exact `percentile` is a
    * buffering aggregate, so state per group is that window's durations
    * — bounded by (watermark horizon × per-service span rate), evicted
    * when the watermark passes the window; production dashboards that
    * cannot hold a window's durations switch the same query to
    * `percentile_approx`. */
  def serviceLatencyStream(spans: DataFrame,
      window_ : String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    spans
      .withWatermark("eventTime", watermark)
      .groupBy(window(col("eventTime"), window_), col("service"))
      .agg(count(lit(1)).as("n_spans"),
        round(expr("percentile(duration, 0.5)"), 4).as("p50_us"),
        round(expr("percentile(duration, 0.95)"), 4).as("p95_us"))

  /** Session-windowed span activity per service: spans separated by less
    * than `gap` merge into one session (the streaming analog of the batch
    * sessionize query). */
  def serviceSessions(spans: DataFrame, gap: String = "30 seconds",
      watermark: String = "2 minutes"): DataFrame =
    spans
      .withWatermark("eventTime", watermark)
      .groupBy(session_window(col("eventTime"), gap), col("service"))
      .agg(count(lit(1)).as("n_spans"))

  /** Streaming exact-dedup on arbitrary key columns (the ingestion-time
    * twin of `Dedup.exactDedup` — e.g. dedup a document firehose on its
    * content digest before it ever lands). State holds only the key
    * columns and is evicted at the watermark, so memory is bounded by
    * (distinct keys per watermark window), not stream length. Duplicates
    * that arrive later than the watermark re-emit — the batch dedup is the
    * at-rest backstop, same contract as the critical-path pair. */
  def dedupStream(records: DataFrame, keyCols: Seq[String],
      eventTimeCol: String = "eventTime",
      watermark: String = "2 minutes"): DataFrame =
    records
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-stream inner join: enrich every span with its trace's ROOT
    * span (parent = "") arriving on the same stream possibly out of order.
    * Both sides carry watermarks and the join is time-bounded (children
    * start within `horizon` after their root), so Spark can evict
    * matched/expired state instead of buffering both streams forever. */
  def enrichWithRoot(spans: DataFrame, watermark: String = "2 minutes",
      horizon: String = "1 minute"): DataFrame = {
    val children = spans.withWatermark("eventTime", watermark)
    val roots = spans.filter(col("parent") === "")
      .select(col("traceID").as("rootTraceID"),
        col("service").as("rootService"),
        col("operationName").as("rootOperation"),
        col("eventTime").as("rootTime"))
      .withWatermark("rootTime", watermark)
    children.join(roots,
      col("traceID") === col("rootTraceID") &&
        col("eventTime") >= col("rootTime") &&
        col("eventTime") <= col("rootTime") + expr(s"INTERVAL $horizon"))
      .drop("rootTraceID")
  }

  /** A trace still being assembled in state; `maxEndMs` is the latest span
    * end (event time, ms) seen so far. After emission the buffer lives on
    * briefly as an empty TOMBSTONE (`emitted = true`) so stragglers that
    * beat the watermark but lose the race with the trace's timeout are
    * DROPPED rather than re-opening the trace and emitting a second,
    * overlapping partial critical path. */
  case class TraceBuffer(spans: List[SpanLite], maxEndMs: Long,
      emitted: Boolean = false)

  /** [[SpanLite]] plus the event-time column the watermark tracks. */
  case class TimedSpan(traceID: String, spanID: String, operationName: String,
      startTime: Long, duration: Long, processID: String, parent: String,
      service: String, eventTime: java.sql.Timestamp)

  /** Incremental trace assembly + critical-path emission on EVENT TIME:
    * spans of one trace arrive out of order across batches; state buffers
    * them per traceID, and the trace is emitted once the stream's
    * watermark passes (latest span end + `gapMs`) — completeness is
    * defined by the data's own clock, so a replay/backfill emits exactly
    * what a live run would (a processing-time quiet period would flush on
    * wall-clock pauses instead, emitting partial traces mid-backfill).
    * Spans arriving later than `watermarkDelay` after the observed max
    * event time are dropped by the watermark, never merged into an
    * already-emitted trace. `flatMapGroupsWithState` is the streaming twin
    * of the batch `groupByKey.flatMapGroups` operator (identical kernel,
    * SURVEY.md A1/A2). */
  def criticalPathStream(spans: Dataset[SpanLite], gapMs: Long = 5000,
      watermarkDelay: String = "10 minutes",
      tombstoneMs: Long = 600000L): Dataset[CritSeg] = {
    import spans.sparkSession.implicits._
    val timed = spans
      .withColumn("eventTime",
        timestamp_micros(col("startTime") + col("duration")))
      .withWatermark("eventTime", watermarkDelay)
      .as[TimedSpan]
    timed.groupByKey(_.traceID)
      .flatMapGroupsWithState[TraceBuffer, CritSeg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (traceID: String, newSpans: Iterator[TimedSpan],
            state: GroupState[TraceBuffer]) =>
          if (state.hasTimedOut) {
            val buf = state.get
            if (buf.emitted) { // tombstone expired: final cleanup
              state.remove()
              Iterator.empty
            } else {
              // emit, then tombstone for `tombstoneMs` of watermark time:
              // a straggler that is inside the watermark delay but behind
              // the trace's timeout must not re-open the trace
              state.update(TraceBuffer(Nil, buf.maxEndMs, emitted = true))
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + math.max(1L, tombstoneMs))
              if (buf.spans.nonEmpty) CriticalPath.compute(buf.spans).iterator
              else Iterator.empty
            }
          } else {
            val buf = state.getOption.getOrElse(TraceBuffer(Nil, 0L))
            if (buf.emitted) {
              // post-emission stragglers: dropped, never merged into (or
              // re-emitted after) an already-emitted trace
              Iterator.empty
            } else {
              val incoming = newSpans.map(t => SpanLite(t.traceID, t.spanID,
                t.operationName, t.startTime, t.duration, t.processID,
                t.parent, t.service)).toList
              val merged = buf.spans ++ incoming
              val maxEndMs = math.max(buf.maxEndMs,
                incoming.map(s => (s.startTime + s.duration) / 1000L).max)
              state.update(TraceBuffer(merged, maxEndMs))
              // fire when the watermark (data clock) passes last-end + gap;
              // never set a timeout at-or-before the current watermark
              state.setTimeoutTimestamp(math.max(maxEndMs + gapMs,
                state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          }
      }
  }
}
