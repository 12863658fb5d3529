package graft.sources

import java.io.{File, FileOutputStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.JaegerModel

/** File-based Jaeger ingestion (reference `traces_from_jaeger_file` /
  * `spans_from_jaeger_file`, `/root/reference/traceframe/traceframe.py:255-258,474-482`).
  *
  * The reference `json.load`s the whole file in driver memory; here the read is
  * a distributed `FileSourceScanExec` with an **explicit schema** (never
  * inferred — `processes` must be a `MapType`, inference would type it as a
  * struct of p1..pN and the schema would drift per file). At scale, many JSON
  * files (or JSONL of one trace per line) parallelize across executors for
  * free; nested-column pruning keeps untouched span fields out of the scan.
  */
object JaegerJsonSource {

  /** Read a file whose top level is a JSON array of traces (Jaeger UI export,
    * same shape as the reference fixture). */
  def traces(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(JaegerModel.traceSchema)
      .option("multiLine", true)
      .json(path)

  /** Read a raw Jaeger HTTP API response file: `{"data": [trace...]}`. */
  def tracesFromApiResponse(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(JaegerModel.apiResponseSchema)
      .option("multiLine", true)
      .json(path)
      .select(explode(col("data")).as("t"))
      .select("t.*")

  /** Read JSON-lines (one trace object per line) — the scalable layout: line
    * splitting makes a single huge file splittable across executors. */
  def tracesJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(JaegerModel.traceSchema).json(path)

  /** Materialize a classpath resource to a temp file so Spark's file readers
    * can scan it (used by tests and the bundled-fixture flagship query). */
  def resourceToTempFile(resource: String): String = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"resource not found: $resource")
    val suffix = resource.substring(resource.lastIndexOf('.'))
    val f = File.createTempFile("graft_fixture", suffix)
    f.deleteOnExit()
    val out = new FileOutputStream(f)
    try in.transferTo(out) finally { out.close(); in.close() }
    f.getAbsolutePath
  }
}
