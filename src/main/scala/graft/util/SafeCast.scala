package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Null-on-error parsing for dirty web-table data. Spark 4 runs ANSI mode
 * by default (casts/parses THROW); a KG-construction engine over web data
 * must instead treat unparseable cells as nulls — the reference's WInte.r
 * parsers do exactly that. Pattern guards keep evaluation inside codegen
 * and independent of the session's ANSI setting.
 */
object SafeCast {
  val isoDatePat = "^\\d{4}-\\d{2}-\\d{2}([ T].*)?$"
  /** Year-only values (1800-2199) count as dates — mirrors WInte.r's web
    * type detection where year columns are dates, which also keeps them
    * out of the numeric kurtosis gate (ClassAndTypeBasedSchemaBlocker). */
  val yearPat = "^(18|19|20|21)\\d{2}$"
  /** US-style dates ("11/13/05", "07/16/2007") — WInte.r's DataTypeDetector
    * tries slash formats; T2D release-date columns use them. */
  val usDate4Pat = "^\\d{1,2}/\\d{1,2}/\\d{4}$"
  val usDate2Pat = "^\\d{1,2}/\\d{1,2}/\\d{2}$"
  val datePat = s"$isoDatePat|$yearPat|$usDate4Pat|$usDate2Pat"
  val numPat = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"
  /** Web-cell numerics: plain numbers, comma-grouped thousands
    * ("31,056,997") and measurement-unit suffixes ("435.16 m", "654m") —
    * WInte.r's unit parser strips units before numeric detection
    * (T2D elevation/population columns fail the plain pattern otherwise). */
  val unitPat = "(m|km|mi|ft|yd|in|cm|mm|kg|g|lb|t|mhz|khz|ghz|hz|kw|mw|gw|ha|%)"
  val webNumPat =
    s"(?i)^[+-]?(\\d{1,3}(,\\d{3})+|\\d+\\.?\\d*|\\.\\d+)\\s*$unitPat?$$"

  /** The numeric part of a web cell: commas stripped, unit suffix dropped.
    * Values that don't look numeric pass through unchanged (callers guard
    * with a pattern). */
  def cleanNum(c: Column): Column =
    regexp_replace(
      regexp_extract(c, "(?i)^\\s*([+-]?[\\d,.eE+-]*?)\\s*" + unitPat + "?\\s*$", 1),
      ",", "")

  def toDouble(c: Column): Column =
    when(c.rlike(numPat), c.cast("double"))
      .when(c.rlike(webNumPat), cleanNum(c).cast("double"))
      .otherwise(lit(null).cast("double"))

  def toDateSafe(c: Column): Column =
    when(c.rlike(isoDatePat), to_date(substring(c, 1, 10), "yyyy-MM-dd"))
      .when(c.rlike(yearPat), to_date(concat(c, lit("-01-01")), "yyyy-MM-dd"))
      .when(c.rlike(usDate4Pat), to_date(c, "M/d/yyyy"))
      .when(c.rlike(usDate2Pat), to_date(c, "M/d/yy"))
      .otherwise(lit(null).cast("date"))
}
