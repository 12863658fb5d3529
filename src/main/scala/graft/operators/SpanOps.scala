package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Span-shaping operators: raw traces → flat spans frame
  * (reference `spans_from_jaeger_file` / `append_spans`,
  * `/root/reference/traceframe/traceframe.py:436-495`).
  *
  * Core schema decision (SURVEY.md §1.3): the reference pivots every distinct
  * tag key into its own column (71 columns on its fixture; unbounded at
  * scale). Our core model keeps `tags` as a stable `MapType(String,String)`
  * column — schema-stable at 100 TB — and offers [[pivotTags]] as an explicit
  * two-job wide pivot for interactive use.
  */
object SpanOps {

  /** T3 `parent_span` (`traceframe.py:429-433`): first CHILD_OF reference's
    * spanID, else "". */
  def parentExpr(span: Column): Column =
    coalesce(
      get(filter(span.getField("references"),
        r => r.getField("refType") === "CHILD_OF"), lit(0))
        .getField("spanID"),
      lit(""))

  /** T2 span flatten (`traceframe.py:455-471,485-495`): explode `spans`, add
    * `service` (processes-map lookup — a co-located map access, not a join)
    * and `parent`, fold the tag list into a map (T4 `taglist_to_tags`,
    * last-key-wins like the reference's dict overwrite).
    *
    * Output: traceID, spanID, flags, operationName, startTime, duration,
    * logs, processID, warnings, service, parent, tags(map).
    * Narrow transformation — zero shuffles; nested-column pruning drops
    * untouched span fields at the parquet/JSON scan.
    */
  def flatten(rawTraces: DataFrame): DataFrame = {
    // reference semantics: duplicate tag keys silently overwrite (last wins)
    rawTraces.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    rawTraces
      .select(col("processes"), explode(col("spans")).as("s"))
      .select(
        col("s.traceID"),
        col("s.spanID"),
        col("s.flags"),
        col("s.operationName"),
        col("s.startTime"),
        col("s.duration"),
        col("s.logs"),
        col("s.processID"),
        col("s.warnings"),
        try_element_at(col("processes"), col("s.processID"))
          .getField("serviceName").as("service"),
        parentExpr(col("s")).as("parent"),
        map_from_entries(
          transform(coalesce(col("s.tags"), array().cast("array<struct<key:string,type:string,value:string>>")),
            t => struct(t.getField("key").as("key"), t.getField("value").as("value"))))
          .as("tags"))
  }

  /** Wide tag pivot: one column per tag key (the reference's spans-frame
    * shape). Two jobs, same shape as Spark's own `Pivot`: job 1 collects the
    * distinct key set to the driver (skipped when `keys` is given), job 2 is a
    * pure projection. `maxKeys` guards against hostile key cardinality at
    * scale (analogous to `spark.sql.pivotMaxValues`). */
  def pivotTags(flatSpans: DataFrame, keys: Option[Seq[String]] = None,
      maxKeys: Int = 10000): DataFrame = {
    val tagKeys: Seq[String] = keys.getOrElse {
      flatSpans.select(explode(map_keys(col("tags"))).as("k"))
        .distinct().orderBy("k").limit(maxKeys + 1)
        .collect().map(_.getString(0)).toSeq
    }
    require(tagKeys.size <= maxKeys,
      s"tag pivot would create ${tagKeys.size} columns (> $maxKeys); " +
        "pass an explicit key list or use the map-typed core schema")
    val fixed = flatSpans.columns.filterNot(_ == "tags").map(col).toSeq
    val pivoted = tagKeys.map(k => try_element_at(col("tags"), lit(k)).as(k))
    flatSpans.select(fixed ++ pivoted: _*)
  }

  /** Inverse of [[flatten]]: reassemble nested trace rows from a flat spans
    * frame — the shape of the reference's ES ingestion (`traces_from_es`,
    * `traceframe.py:268-317`), which groups raw span documents into traces
    * before summarizing. The reference hand-rolls a sort-based group-by
    * (sort by traceID + adjacency scan); the Spark shape is a plain hash
    * aggregation — one shuffle on traceID, no global sort (SURVEY.md §2.1 S9).
    *
    * Reconstructs the raw trace schema (references from `parent`, tag list
    * from the tag map with string types, processes map from per-span
    * service) so [[TraceOps.summarize]] runs on the result unchanged. */
  def assembleTraces(flatSpans: DataFrame): DataFrame = {
    val spanStruct = struct(
      col("traceID"), col("spanID"), col("flags"), col("operationName"),
      when(col("parent") === "",
        array().cast("array<struct<refType:string,traceID:string,spanID:string>>"))
        .otherwise(array(struct(
          lit("CHILD_OF").as("refType"),
          col("traceID").as("traceID"),
          col("parent").as("spanID")))).as("references"),
      col("startTime"), col("duration"),
      transform(map_entries(col("tags")),
        e => struct(e.getField("key").as("key"),
          lit("string").as("type"),
          e.getField("value").as("value"))).as("tags"),
      col("logs"), col("processID"), col("warnings"))
    flatSpans
      .groupBy(col("traceID"))
      .agg(
        collect_list(spanStruct).as("spans"),
        map_from_entries(array_distinct(collect_list(
          struct(col("processID"),
            struct(col("service").as("serviceName"),
              array().cast("array<struct<key:string,type:string,value:string>>")
                .as("tags")))))).as("processes"))
      .withColumn("warnings", lit(null).cast("array<string>"))
  }

  /** T13 `traceWithSpans` (`traceframe.py:620-632`): point-lookup join of the
    * traces frame with its (deduplicated) spans, as a single nested row.
    * Dedup keeps the first span per spanID **deterministically** (window rank
    * by startTime, spanID-hash) — pandas' `drop_duplicates` keep-first is
    * row-order-dependent, which has no stable distributed analog. */
  def traceWithSpans(traces: DataFrame, flatSpans: DataFrame,
      traceID: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("spanID"))
      .orderBy(col("startTime"), col("duration"))
    val spansAgg = flatSpans
      .filter(col("traceID") === traceID)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .groupBy(col("traceID"))
      .agg(collect_list(struct(
        col("spanID"), col("operationName"), col("startTime"),
        col("duration"), col("processID"), col("parent"), col("service")))
        .as("spans"))
    traces.filter(col("traceID") === traceID).join(spansAgg, Seq("traceID"))
  }
}
