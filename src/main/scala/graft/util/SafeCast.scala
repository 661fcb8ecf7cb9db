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
  val datePat = s"$isoDatePat|$yearPat"
  val numPat = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"

  def toDouble(c: Column): Column =
    when(c.rlike(numPat), c.cast("double")).otherwise(lit(null).cast("double"))

  def toDateSafe(c: Column): Column =
    when(c.rlike(isoDatePat), to_date(substring(c, 1, 10), "yyyy-MM-dd"))
      .when(c.rlike(yearPat), to_date(concat(c, lit("-01-01")), "yyyy-MM-dd"))
      .otherwise(lit(null).cast("date"))
}
