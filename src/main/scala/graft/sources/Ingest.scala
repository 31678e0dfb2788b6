package graft.sources

import java.sql.Date
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion-boundary helpers (SURVEY.md §2.1 S5, S6, S8): the engine's
  * contract starts at DataFrames, but the reference's fetch patterns —
  * year-batched range requests, empty-result schema fallbacks, and a
  * generated market-calendar dimension — are engine concerns and live here.
  */
object Ingest {

  /** S5: empty-result fallback — a fetch that returned nothing still needs
    * the declared schema so downstream plans resolve
    * (stock_prices_flow.py:42-55). */
  def emptyWithSchema(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** S6: year-batched range fetch — split [start, end] into per-year
    * sub-ranges, fetch each, union by name (stock_prices_flow.py:72-90).
    * `fetch` receives (batchStart, batchEnd) inclusive. */
  def yearBatched(
      spark: SparkSession,
      start: Date,
      end: Date,
      schema: StructType)(fetch: (Date, Date) => DataFrame): DataFrame = {
    val s = start.toLocalDate
    val e = end.toLocalDate
    val batches = (s.getYear to e.getYear).map { y =>
      val b0 = if (y == s.getYear) s else java.time.LocalDate.of(y, 1, 1)
      val b1 = if (y == e.getYear) e else java.time.LocalDate.of(y, 12, 31)
      fetch(Date.valueOf(b0), Date.valueOf(b1))
    }
    if (batches.isEmpty) emptyWithSchema(spark, schema)
    else batches.reduce(_ unionByName _)
  }

  /** S8: generated weekday-calendar dimension table — `spark.range` over
    * the day span, weekend-filtered, minus an exclusion list (holidays).
    * The reference sources NYSE sessions from a market-calendar library;
    * holidays arrive here as a plain list/table. */
  def weekdayCalendar(
      spark: SparkSession,
      start: Date,
      end: Date,
      holidays: Seq[Date] = Nil): DataFrame = {
    import spark.implicits._
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      start.toLocalDate, end.toLocalDate)
    val cal = spark.range(days + 1)
      .select(date_add(lit(start), $"id".cast("int")).as("date"))
      .filter(!dayofweek($"date").isin(1, 7)) // Sunday=1, Saturday=7
    if (holidays.isEmpty) cal
    else cal.join(broadcast(holidays.toDF("h")), $"date" === $"h", "left_anti")
  }
}
