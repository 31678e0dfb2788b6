package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.lake.{Lake, TableDef}
import org.apache.spark.sql.types._

/** Lake layer: create modes, append, PK-dedup optimize (global and
  * partition-scoped), version-wins upsert semantics. */
class LakeSpec extends SparkSpec {
  import spark.implicits._

  private def freshLake = new Lake(spark,
    Files.createTempDirectory("lake_test").toString)

  private val prices = TableDef("prices",
    StructType(Seq(
      StructField("ticker", StringType), StructField("date", StringType),
      StructField("year", IntegerType), StructField("close", DoubleType))),
    partitionKeys = Seq("year"), primaryKeys = Seq("date", "ticker"))

  test("create replace/skip modes") {
    val lake = freshLake
    assert(lake.create(prices))
    assert(!lake.create(prices)) // skip: already exists
    lake.append(prices, Seq(("A", "2024-01-02", 2024, 10.0))
      .toDF("ticker", "date", "year", "close"), version = 1L)
    assert(lake.table(prices).count() == 1)
    assert(lake.create(prices, replace = true)) // drops data
    assert(lake.table(prices).count() == 0)
  }

  test("empty created table reads with declared schema") {
    val lake = freshLake
    lake.create(prices)
    val df = lake.table(prices)
    assert(df.count() == 0)
    assert(df.columns.toSet == Set("ticker", "date", "year", "close"))
  }

  test("optimize dedups on PK, newest version wins") {
    val lake = freshLake
    lake.create(prices)
    lake.append(prices, Seq(
      ("A", "2024-01-02", 2024, 10.0), ("B", "2024-01-02", 2024, 20.0))
      .toDF("ticker", "date", "year", "close"), version = 1L)
    // second append revises A's close — upsert
    lake.append(prices, Seq(("A", "2024-01-02", 2024, 11.5))
      .toDF("ticker", "date", "year", "close"), version = 2L)
    assert(lake.table(prices).count() == 3)
    lake.optimize(prices)
    val rows = lake.table(prices).orderBy($"ticker").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("close") == 11.5) // newest version won
    assert(rows(1).getAs[Double]("close") == 20.0)
    // idempotent
    lake.optimize(prices)
    assert(lake.table(prices).count() == 2)
  }

  test("latest() is the merge-on-read optimize view; missing table is empty") {
    val lake = freshLake
    // pre-create read resolves empty with the declared schema (table() rule)
    assert(lake.latest(prices).isEmpty)
    lake.create(prices)
    lake.append(prices, Seq(
      ("A", "2024-01-02", 2024, 10.0), ("B", "2024-01-02", 2024, 20.0))
      .toDF("ticker", "date", "year", "close"), version = 1L)
    lake.append(prices, Seq(("A", "2024-01-02", 2024, 11.5))
      .toDF("ticker", "date", "year", "close"), version = 2L)
    // read-time supersede: same survivors optimize() would keep, with the
    // superseded row still on disk
    val live = lake.latest(prices).orderBy($"ticker").collect()
    assert(live.map(r => (r.getAs[String]("ticker"), r.getAs[Double]("close")))
      .toSeq == Seq(("A", 11.5), ("B", 20.0)))
    assert(lake.table(prices).count() == 3)
    // optimize then agrees with the view it was serving
    lake.optimize(prices)
    assert(lake.latest(prices).orderBy($"ticker").collect()
      .map(_.getAs[Double]("close")).toSeq == Seq(11.5, 20.0))
  }

  test("partition-scoped optimize rewrites only the named partition") {
    val lake = freshLake
    lake.create(prices)
    lake.append(prices, Seq(
      ("A", "2023-06-01", 2023, 1.0), ("A", "2024-01-02", 2024, 10.0))
      .toDF("ticker", "date", "year", "close"), version = 1L)
    lake.append(prices, Seq(("A", "2024-01-02", 2024, 12.0))
      .toDF("ticker", "date", "year", "close"), version = 2L)
    lake.optimize(prices, partitions = Seq("year=2024"))
    val rows = lake.table(prices).orderBy($"date").collect()
    assert(rows.length == 2)
    assert(rows(1).getAs[Double]("close") == 12.0)
    assert(rows(0).getAs[Double]("close") == 1.0) // untouched partition intact
  }

  test("upsert = create-if-absent + append + optimize") {
    val lake = freshLake
    lake.upsert(prices, Seq(("A", "2024-01-02", 2024, 10.0))
      .toDF("ticker", "date", "year", "close"), version = 1L)
    lake.upsert(prices, Seq(("A", "2024-01-02", 2024, 99.0))
      .toDF("ticker", "date", "year", "close"), version = 2L)
    val rows = lake.table(prices).collect()
    assert(rows.length == 1 && rows(0).getAs[Double]("close") == 99.0)
  }
}
