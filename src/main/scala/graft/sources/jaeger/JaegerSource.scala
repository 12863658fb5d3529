package graft.sources.jaeger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.JaegerModel
import graft.operators.{SpanOps, TraceOps}

/** Typed façade over the "jaeger" DSv2 format — the Spark-native form of the
  * reference's HTTP entry points (`traces_from_jaeger` / `spans_from_jaeger` /
  * `known_services`, `/root/reference/traceframe/traceframe.py:26-50,233-252,436-471`). */
object JaegerSource {

  /** Raw API response bodies (one row per fetch) — the DSv2 scan itself. */
  def rawResponses(spark: SparkSession, endpoint: String,
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
      spark.read.format("jaeger").option("endpoint", endpoint)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  /** Raw nested trace rows (traceSchema), parsed executor-side. */
  def rawTraces(spark: SparkSession, endpoint: String,
      options: Map[String, String] = Map.empty): DataFrame =
    rawResponses(spark, endpoint, options)
      .select(explode(
        from_json(col("json"), JaegerModel.apiResponseSchema)
          .getField("data")).as("t"))
      .select("t.*")

  /** S3 `traces_from_jaeger`: summary frame straight off the API. */
  def traces(spark: SparkSession, endpoint: String,
      options: Map[String, String] = Map.empty): DataFrame =
    TraceOps.summarize(rawTraces(spark, endpoint, options))

  /** S5 `spans_from_jaeger`: flat spans for N services, unioned.
    * Quirk preserved: spans of traces returned for several of the queried
    * services appear once per service (the reference does not dedupe —
    * `traceframe.py:446-468`; `traceWithSpans` compensates downstream). */
  def spansForServices(spark: SparkSession, endpoint: String,
      services: Seq[String],
      options: Map[String, String] = Map.empty): DataFrame = {
    require(services.nonEmpty, "at least one service name required")
    services.map(svc =>
      SpanOps.flatten(rawTraces(spark, endpoint, options + ("service" -> svc))))
      .reduce(_ unionByName _)
  }

  /** S1 `known_services`: driver-side catalog listing (not a distributed
    * op — one metadata call). */
  def knownServices(endpoint: String,
      clientClass: String = classOf[HttpJaegerClient].getName): Seq[String] = {
    val client = JaegerClient.forName(clientClass, endpoint)
    val body = client.get("/api/services", Map.empty)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val data = mapper.readTree(body).get("data")
    if (data == null || data.isNull) Seq.empty
    else (0 until data.size()).map(i => data.get(i).asText())
  }
}
