package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed accessors over the map-typed `tags` column (SURVEY.md §1.2: tag
  * values are stored as strings with a `type` discriminator; pandas' untyped
  * object column has no honest Spark analog, so typing happens at use-site).
  * All accessors are ANSI-safe: a missing key or unparseable value yields
  * null, never a runtime error. */
object TagFunctions {

  /** String tag value; null when absent. */
  def tagStr(tags: Column, key: String): Column =
    try_element_at(tags, lit(key))

  /** Integer tag (`int64`-typed tags in Jaeger); null when absent or
    * non-numeric — guarded so ANSI cast cannot throw. */
  def tagInt(tags: Column, key: String): Column = {
    val v = tagStr(tags, key)
    when(v.rlike("^-?[0-9]+$"), v.cast("long"))
  }

  /** Boolean tag; accepts the JSON spellings true/false (any case). */
  def tagBool(tags: Column, key: String): Column = {
    val v = lower(tagStr(tags, key))
    when(v === "true", lit(true)).when(v === "false", lit(false))
  }

  /** Double tag; null when absent or non-numeric. */
  def tagDouble(tags: Column, key: String): Column = {
    val v = tagStr(tags, key)
    when(v.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"),
      v.cast("double"))
  }
}
