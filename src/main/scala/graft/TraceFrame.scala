package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.analysis.CriticalPath
import graft.model.CritSeg
import graft.operators.{SpanOps, TraceOps}
import graft.sources.JaegerJsonSource

/** Public facade mirroring the reference's API surface
  * (`/root/reference/traceframe/__init__.py:4-15`) in Spark-native form:
  * every function returns a lazy `DataFrame`/`Dataset` plan instead of a
  * materialized pandas frame.
  *
  * Reference → graft mapping:
  *   - `traces_from_jaeger_file`  → [[tracesFromJaegerFile]]
  *   - `spans_from_jaeger_file`   → [[spansFromJaegerFile]]
  *   - `process_traces`           → [[operators.TraceOps.summarize]]
  *   - `traceWithSpans`           → [[traceWithSpans]]
  *   - `get_critical_segments`    → [[criticalSegments]] (distributed A2 form)
  *   - HTTP/ES sources            → planned DSv2 connector (SURVEY.md §7.1.7)
  */
object TraceFrame {

  /** Traces summary frame from a Jaeger-UI-export JSON file. */
  def tracesFromJaegerFile(spark: SparkSession, path: String): DataFrame =
    TraceOps.summarize(JaegerJsonSource.traces(spark, path))

  /** Flat spans frame (map-typed tags) from a Jaeger JSON file. */
  def spansFromJaegerFile(spark: SparkSession, path: String): DataFrame =
    SpanOps.flatten(JaegerJsonSource.traces(spark, path))

  /** Wide (tag-pivoted) spans frame — the reference's exact spans shape. */
  def spansFromJaegerFileWide(spark: SparkSession, path: String): DataFrame =
    SpanOps.pivotTags(spansFromJaegerFile(spark, path))

  /** Single nested trace: summary row + deduplicated spans array; raises
    * on an unknown traceID like the reference (`strict = false` opts out). */
  def traceWithSpans(traces: DataFrame, flatSpans: DataFrame,
      traceID: String, strict: Boolean = true): DataFrame =
    SpanOps.traceWithSpans(traces, flatSpans, traceID, strict)

  /** Critical-path segments for every trace in the spans frame. */
  def criticalSegments(flatSpans: DataFrame): Dataset[CritSeg] =
    CriticalPath.segmentsFromFlat(flatSpans)
}
