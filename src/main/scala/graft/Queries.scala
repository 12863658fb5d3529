package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.JaegerJsonSource

/** The driver-contract query surface: every implemented operator from
  * SURVEY.md §2 (plus the 100-TB pipeline extensions) demonstrated as a named
  * query over the driver's parquet tables, with a DuckDB-equivalent oracle in
  * [[oracle]] where the semantics are ANSI-expressible.
  *
  * Conventions for oracle hash-parity:
  *   - every computed column is aliased identically in Spark and SQL;
  *   - float aggregates are `round(..., n)`-ed on both sides;
  *   - every query has a total ORDER BY so row order is deterministic.
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- trace engine (non-ANSI surface: rows-only driver check) ----------
    "t01_trace_summary" -> ((s, _) => {
      val fx = JaegerJsonSource.resourceToTempFile("/jaeger_fixture.json")
      TraceFrame.tracesFromJaegerFile(s, fx).drop("processes")
    }),
    "t02_span_flatten" -> ((s, _) => {
      val fx = JaegerJsonSource.resourceToTempFile("/jaeger_fixture.json")
      TraceFrame.spansFromJaegerFile(s, fx)
        .select(col("traceID"), col("spanID"), col("operationName"),
          col("startTime"), col("duration"), col("processID"),
          col("service"), col("parent"),
          map_entries(col("tags")).as("tags"))
        .orderBy("traceID", "spanID")
    }),
    "t03_critical_path" -> ((s, _) => SparkEntry.entry(s)
      .orderBy("traceID", "startTime")),
  )

  val oracle: Map[String, String] = Map()
}
