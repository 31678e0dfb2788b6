package graft

import java.sql.Date
import org.apache.spark.sql.types._
import graft.sources.Ingest

/** Ingestion-boundary helpers: year batching, empty fallback, generated
  * weekday calendar. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("d0", DateType), StructField("d1", DateType)))

  test("yearBatched splits a multi-year range at year boundaries") {
    var calls = Vector.empty[(Date, Date)]
    val out = Ingest.yearBatched(spark,
      Date.valueOf("2022-11-15"), Date.valueOf("2024-02-10"), schema) { (a, b) =>
      calls :+= ((a, b))
      Seq((a, b)).toDF("d0", "d1")
    }
    assert(out.count() == 3)
    assert(calls == Vector(
      (Date.valueOf("2022-11-15"), Date.valueOf("2022-12-31")),
      (Date.valueOf("2023-01-01"), Date.valueOf("2023-12-31")),
      (Date.valueOf("2024-01-01"), Date.valueOf("2024-02-10"))))
  }

  test("empty fallback keeps the declared schema") {
    val e = Ingest.emptyWithSchema(spark, schema)
    assert(e.count() == 0 && e.schema == schema)
  }

  test("weekday calendar excludes weekends and holidays") {
    // 2024-01-01 (Mon, holiday) .. 2024-01-14 (Sun)
    val cal = Ingest.weekdayCalendar(spark,
      Date.valueOf("2024-01-01"), Date.valueOf("2024-01-14"),
      holidays = Seq(Date.valueOf("2024-01-01")))
    val days = cal.orderBy($"date").collect().map(_.getDate(0).toString)
    assert(days.toSeq == Seq(
      "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05",
      "2024-01-08", "2024-01-09", "2024-01-10", "2024-01-11", "2024-01-12"))
  }
}
