package graft.model

import org.apache.spark.sql.types._

/** Schemas and row types for the Jaeger trace domain.
  *
  * Shapes derived from the reference fixture (`/root/reference/test/jaeger.json:2-390`)
  * and the reference flattening code (`/root/reference/traceframe/traceframe.py:455-495`).
  *
  * Design notes (SURVEY.md §1):
  *   - All timestamps/durations are **microseconds since epoch** as `LongType`
  *     end-to-end; conversion to `TimestampType` happens only at presentation
  *     edges (`timestamp_micros`). This keeps golden comparisons integer-exact.
  *   - `processes` is a `MapType` with dynamic keys (p1..pN) — schema inference
  *     would wrongly make it a struct, so reads always pass these schemas
  *     explicitly.
  *   - Tag values are heterogeneous (string/bool/int64 discriminated by the tag
  *     `type` field). We store `value` as `StringType` plus the `type`
  *     discriminator; typed access is a cast at use-site. Pandas' untyped
  *     `object` column has no honest Spark analog (SURVEY.md §1.2).
  */
object JaegerModel {

  /** `{key, type, value}` — span tags, process tags, log fields. */
  val tagSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("type", StringType),
    StructField("value", StringType)))

  /** Span-to-span reference; only `CHILD_OF` is meaningful to the engine. */
  val referenceSchema: StructType = StructType(Seq(
    StructField("refType", StringType),
    StructField("traceID", StringType),
    StructField("spanID", StringType)))

  val logSchema: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("fields", ArrayType(tagSchema))))

  /** Raw Jaeger span (reference field list: `traceframe.py:459-467`). */
  val spanSchema: StructType = StructType(Seq(
    StructField("traceID", StringType),
    StructField("spanID", StringType),
    StructField("flags", LongType),
    StructField("operationName", StringType),
    StructField("references", ArrayType(referenceSchema)),
    StructField("startTime", LongType),
    StructField("duration", LongType),
    StructField("tags", ArrayType(tagSchema)),
    StructField("logs", ArrayType(logSchema)),
    StructField("processID", StringType),
    StructField("warnings", ArrayType(StringType))))

  val processSchema: StructType = StructType(Seq(
    StructField("serviceName", StringType),
    StructField("tags", ArrayType(tagSchema))))

  /** Raw Jaeger trace: `{traceID, spans, processes, warnings}`. */
  val traceSchema: StructType = StructType(Seq(
    StructField("traceID", StringType),
    StructField("spans", ArrayType(spanSchema)),
    StructField("processes", MapType(StringType, processSchema)),
    StructField("warnings", ArrayType(StringType))))

  /** Jaeger HTTP API response wrapper: `{"data": [trace...]}`. */
  val apiResponseSchema: StructType = StructType(Seq(
    StructField("data", ArrayType(traceSchema))))
}

/** Narrow span record consumed by the critical-path operator — exactly the
  * fields the reference golden output serializes
  * (`/root/reference/test/test_traceframe.py:8-81`). */
case class SpanLite(
    traceID: String,
    spanID: String,
    operationName: String,
    startTime: Long,
    duration: Long,
    processID: String,
    parent: String,
    service: String)

/** One critical-path segment (reference `CritSeg`, `traceframe.py:533-553`):
  * `[startTime, startTime+duration)` is attributed to `span`. */
case class CritSeg(startTime: Long, duration: Long, span: SpanLite)

/** Trace summary row (reference traces frame, `traceframe.py:209-230`;
  * schema documented `README.md:15-27`). `duration` is µs; `startTimeMicros`
  * is µs-since-epoch (presentation layer renders `timestamp_micros`). */
case class TraceSummary(
    traceID: String,
    traceName: String,
    nspans: Int,
    errspans: Int,
    duration: Long,
    startTimeMicros: Long,
    iserror: Boolean)
