package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** KQL scalar-function surface re-expressed as Spark `Column` combinators.
  *
  * Mirrors the semantics of the reference interpreter
  * (`miso-workflow/src/interpreter/mod.rs`, `string_ops.rs`) but compiles to
  * codegen'd Catalyst expressions instead of row-at-a-time evaluation.
  */
object KqlFunctions {

  /** `has` — case-insensitive whole-phrase match with alphanumeric word
    * boundaries (reference: `miso-workflow/src/interpreter/string_ops.rs:43-112`),
    * compiled to the native codegen'd [[HasPhrase]] expression (scan-based,
    * no regex). Semantically equivalent regex:
    * `(?i)(^|[^A-Za-z0-9])phrase([^A-Za-z0-9]|$)`.
    */
  def has(col: Column, phrase: String): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(HasPhrase(expression(col), expression(lit(phrase)), caseSensitive = false))
  }

  /** `has_cs` — case-sensitive variant of [[has]]. */
  def hasCs(col: Column, phrase: String): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(HasPhrase(expression(col), expression(lit(phrase)), caseSensitive = true))
  }

  /** KQL `extract(regex, group, source)` — null (not "") when the regex does
    * not match (reference: `miso-workflow/src/interpreter/mod.rs:406-432`).
    * Spark's regexp_extract returns "" on no-match, so wrap with nullif.
    */
  def extractOrNull(source: Column, regex: String, group: Int): Column =
    nullif(regexp_extract(source, regex, group), lit(""))

  /** KQL `bin(x, width)` for numerics — floor to multiple of width
    * (reference: `miso-workflow/src/interpreter/mod.rs:434-478`).
    */
  def binNum(col: Column, width: Double): Column =
    floor(col / lit(width)) * lit(width)

  /** KQL `bin(ts, timespan)` — epoch-based floor of a timestamp to a
    * duration multiple. Width in microseconds (Spark timestamp precision).
    */
  def binTime(ts: Column, widthMicros: Long): Column =
    timestamp_micros(floor(unix_micros(ts) / lit(widthMicros)) * lit(widthMicros))
}
