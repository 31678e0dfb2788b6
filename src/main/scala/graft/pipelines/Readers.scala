package graft.pipelines

import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.lake.{Catalog, Lake, TableDef}

/** The reference's reader API (utils/data.py:10-142), Spark-first: date-
  * range-filtered, universe-gated table accessors — the entry points a
  * reference user calls to pull panels. Filters and projections are
  * declared up front so Catalyst pushes them into the parquet scan and the
  * year-partition pruning fires (the range predicate on `date` implies the
  * partition's year range).
  *
  * Universe gating (J1): `universe LEFT JOIN t ON (date, ticker)` keeps
  * exactly the point-in-time index members — the join side is the
  * universe (≈500 rows/date), the gated fact streams.
  */
class Readers(lake: Lake) {

  private def between(df: DataFrame, start: Date, end: Date): DataFrame =
    df.filter(col("date").between(lit(start), lit(end)))

  private def gated(t: TableDef, start: Date, end: Date,
      cols: Seq[String], dropNullCol: Option[String] = None): DataFrame = {
    val uni = between(lake.table(Catalog.universe), start, end)
      .select(col("date"), col("ticker"))
    val joined = uni.join(between(lake.table(t), start, end),
      Seq("date", "ticker"), "left")
    val filtered = dropNullCol.fold(joined)(c => joined.filter(col(c).isNotNull))
    filtered.select(cols.map(col): _*).orderBy(col("ticker"), col("date"))
  }

  def getUniverse(start: Date, end: Date): DataFrame =
    between(lake.table(Catalog.universe), start, end)
      .select(col("date"), col("ticker")).orderBy(col("ticker"), col("date"))

  def getUniverseReturns(start: Date, end: Date): DataFrame =
    gated(Catalog.stockReturns, start, end, Seq("date", "ticker", "return"))

  def getStockReturns(start: Date, end: Date): DataFrame =
    between(lake.table(Catalog.stockReturns), start, end)
      .select(col("date"), col("ticker"), col("return"))
      .orderBy(col("ticker"), col("date"))

  def getEtfReturns(start: Date, end: Date): DataFrame =
    between(lake.table(Catalog.etfReturns), start, end)
      .select(col("date"), col("ticker"), col("return"))
      .orderBy(col("ticker"), col("date"))

  def getAlphas(start: Date, end: Date): DataFrame =
    gated(Catalog.alphas, start, end, Seq("date", "ticker", "alpha"), Some("alpha"))

  def getBenchmarkWeights(start: Date, end: Date): DataFrame =
    gated(Catalog.benchmarkWeights, start, end, Seq("date", "ticker", "weight"))

  def getBenchmarkReturns(start: Date, end: Date): DataFrame =
    between(lake.table(Catalog.benchmarkReturns), start, end)

  def getFactorLoadings(start: Date, end: Date): DataFrame =
    gated(Catalog.factorLoadings, start, end,
      Seq("date", "ticker", "factor", "loading"), Some("loading"))

  def getFactorCovariances(start: Date, end: Date): DataFrame =
    between(lake.table(Catalog.factorCovariances), start, end)
      .select(col("date"), col("factor_1"), col("factor_2"), col("covariance"))
      .orderBy(col("date"))

  def getIdioVol(start: Date, end: Date): DataFrame =
    gated(Catalog.idioVol, start, end,
      Seq("date", "ticker", "idio_vol"), Some("idio_vol"))

  def getPortfolioWeights(start: Date, end: Date): DataFrame =
    between(lake.table(Catalog.portfolioWeights), start, end)
      .select(col("date"), col("ticker"), col("weight"))
      .orderBy(col("ticker"), col("date"))

  def getPrices(start: Date, end: Date): DataFrame =
    gated(Catalog.stockPrices, start, end, Seq("date", "ticker", "close"))
}
