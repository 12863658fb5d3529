package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.JaegerJsonSource

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query: the full trace pipeline — bundled Jaeger fixture →
    * span flatten → distributed critical-path extraction.
    * Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val fixture = JaegerJsonSource.resourceToTempFile("/jaeger_fixture.json")
    val flat = TraceFrame.spansFromJaegerFile(spark, fixture)
    TraceFrame.criticalSegments(flat).toDF()
      .select(col("span.traceID").as("traceID"), col("span.spanID").as("spanID"),
        col("span.service").as("service"), col("startTime"), col("duration"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracle
}
