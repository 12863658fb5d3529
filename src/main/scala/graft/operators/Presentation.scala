package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.CritSeg

/** Presentation-prep operators (SURVEY.md §2.5 F1-F8): every DataFrame the
  * reference feeds its HTML styler and holoviews timeline
  * (`/root/reference/traceframe/traceframe.py:405-426, 637-721`). The visual
  * rendering itself is out of engine scope; these produce its input tables.
  */
object Presentation {

  /** F1: span display label `"{service}: {operationName}"`. */
  def labelExpr: Column =
    concat_ws(": ", col("service"), col("operationName"))

  /** F4 `pretty_duration` — fixed, not bug-compatible: the reference formats
    * `dur.microseconds/1000` which drops whole seconds (documented quirk,
    * `traceframe.py:405-406`); we render from total µs. */
  def prettyDuration(micros: Column): Column =
    concat((micros / 1000).cast("long").cast("string"), lit("ms"))

  /** F6 `pretty_trace_table`: display projection of the traces frame —
    * linked traceID, formatted duration, error flag (F5). */
  def traceTable(traces: DataFrame, jaegerEndpoint: String): DataFrame =
    traces.select(
      format_string(s"<a href=\"$jaegerEndpoint/trace/%s\">%s</a>",
        col("traceID"), col("traceID")).as("traceID"),
      col("traceName"),
      col("nspans"),
      col("errspans"),
      prettyDuration(col("duration")).as("duration"),
      col("startTime"),
      when(col("errspans") > 0,
        format_string("<span color='red'>%s</span>", col("errspans")))
        .otherwise(col("errspans").cast("string")).as("errflag"))

  /** F8 timeline layer 1: one segment per span
    * (`start,end,service,start_event,end_event` — `traceframe.py:646-674`). */
  def spanSegments(flatSpans: DataFrame): DataFrame =
    flatSpans.select(
      col("startTime").as("start"),
      (col("startTime") + col("duration")).as("end"),
      col("service"),
      labelExpr.as("start_event"),
      labelExpr.as("end_event"))

  /** F8 timeline layer 2: the critical-path overlay segments
    * (`traceframe.py:686-698`). */
  def critSegments(crits: Dataset[CritSeg]): DataFrame =
    crits.toDF().select(
      col("startTime").as("start"),
      (col("startTime") + col("duration")).as("end"),
      col("span.service").as("service"),
      concat_ws(": ", col("span.service"), col("span.operationName"))
        .as("start_event"),
      concat_ws(": ", col("span.service"), col("span.operationName"))
        .as("end_event"))

  /** F8 timeline layers 3+4: call and return edges parent↔child
    * (`traceframe.py:702-716`). The reference's `id_to_span` dict lookup
    * becomes a broadcast self-join on spanID. */
  def callReturnEdges(flatSpans: DataFrame): DataFrame = {
    val labeled = flatSpans.select(col("spanID"), col("parent"),
      col("startTime"), (col("startTime") + col("duration")).as("endTime"),
      labelExpr.as("label"))
    val parents = broadcast(labeled.select(col("spanID").as("parent"),
      col("label").as("parentLabel")))
    val withParent = labeled
      .filter(col("parent") =!= "")
      .join(parents, Seq("parent"), "left")
    withParent.select(
      lit("call").as("kind"),
      col("startTime").as("start"), col("startTime").as("end"),
      col("parentLabel").as("start_event"), col("label").as("end_event"))
      .unionByName(withParent.select(
        lit("return").as("kind"),
        col("endTime").as("start"), col("endTime").as("end"),
        col("label").as("start_event"), col("parentLabel").as("end_event")))
  }
}
