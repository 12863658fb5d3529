package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.JaegerJsonSource

/** Exports the bundled Jaeger fixture's RAW structure to parquet at a fixed
  * path so the driver's DuckDB oracle can independently re-derive the trace
  * pipeline — `process_traces` (reference
  * `/root/reference/traceframe/traceframe.py:209-230`) and the span flatten
  * (`traceframe.py:455-495`) — in plain SQL and hash-compare it against the
  * Spark operators (t01/t02 in [[Queries]]).
  *
  * The export is deliberately free of engine semantics: it is nothing but
  * `posexplode` of the nested arrays/maps into scalar rows (span order,
  * reference order and tag order preserved as `*_idx`). Root-span
  * resolution, service lookup, parent extraction, error counting and
  * last-win tag dedup all happen twice — once in the Spark operators, once
  * in the DuckDB SQL — so the oracle is a genuine independent check of the
  * engine's core domain, not a round-trip of its output.
  */
object FixtureOracle {

  /** Fixed path referenced by the oracle SQL (`read_parquet`). */
  val dir = "/tmp/graft_fixture_oracle"

  @volatile private var done = false

  def ensure(spark: SparkSession): Unit = synchronized {
    if (done) return
    val raw = JaegerJsonSource.traces(spark,
      JaegerJsonSource.resourceToTempFile("/jaeger_fixture.json"))

    // one row per trace (anchors traces whose spans array is empty/null)
    raw.select(col("traceID"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/raw_traces.parquet")

    val sp = raw.select(col("traceID"),
      posexplode(col("spans")).as(Seq("span_idx", "s")))
    sp.select(col("traceID"), col("span_idx"),
        col("s.spanID").as("spanID"), col("s.flags").as("flags"),
        col("s.operationName").as("operationName"),
        col("s.startTime").as("startTime"),
        col("s.duration").as("duration"),
        col("s.processID").as("processID"),
        // size(null) = null under Spark 4 defaults; export -1 so the SQL's
        // `n_refs = 0` root test matches the engine's null semantics
        coalesce(size(col("s.references")), lit(-1)).as("n_refs"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/raw_spans.parquet")

    sp.select(col("traceID"), col("span_idx"),
        posexplode(col("s.references")).as(Seq("ref_idx", "r")))
      .select(col("traceID"), col("span_idx"), col("ref_idx"),
        col("r.refType").as("refType"), col("r.spanID").as("refSpanID"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/raw_refs.parquet")

    sp.select(col("traceID"), col("span_idx"),
        posexplode(col("s.tags")).as(Seq("tag_idx", "t")))
      .select(col("traceID"), col("span_idx"), col("tag_idx"),
        col("t.key").as("tag_key"), col("t.type").as("tag_type"),
        col("t.value").as("tag_value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/raw_tags.parquet")

    raw.select(col("traceID"),
        explode(col("processes")).as(Seq("processID", "p")))
      .select(col("traceID"), col("processID"),
        col("p.serviceName").as("serviceName"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/raw_processes.parquet")

    done = true
  }
}
