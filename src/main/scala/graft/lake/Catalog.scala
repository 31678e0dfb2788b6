package graft.lake

import org.apache.spark.sql.types._

/** The engine's canonical table catalog — the reference lakehouse schemas
  * from SURVEY.md §1.2 (all declared at the cited create() sites). Measures
  * are Float64 throughout (no decimals in the reference), `year` is the
  * partition key on every fact table. */
object Catalog {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  private val priceSchema = st(
    "ticker" -> StringType, "date" -> DateType, "year" -> IntegerType,
    "open" -> DoubleType, "high" -> DoubleType, "low" -> DoubleType,
    "close" -> DoubleType, "volume" -> DoubleType,
    "trade_count" -> DoubleType, "vwap" -> DoubleType)

  private val returnSchema = st(
    "ticker" -> StringType, "date" -> DateType, "year" -> IntegerType,
    "return" -> DoubleType)

  private def signalSchema(valueCol: String) = st(
    "ticker" -> StringType, "date" -> DateType, "year" -> IntegerType,
    "signal" -> StringType, valueCol -> DoubleType)

  val calendar = TableDef("calendar", st("date" -> DateType), Nil, Seq("date"))

  val universe = TableDef("universe",
    st("date" -> DateType, "year" -> IntegerType, "ticker" -> StringType),
    Seq("year"), Seq("date", "ticker"))

  val stockPrices = TableDef("stock_prices", priceSchema, Seq("year"), Seq("date", "ticker"))
  val etfPrices = TableDef("etf_prices", priceSchema, Seq("year"), Seq("date", "ticker"))

  val stockReturns = TableDef("stock_returns", returnSchema, Seq("year"), Seq("ticker", "date"))
  val etfReturns = TableDef("etf_returns", returnSchema, Seq("year"), Seq("ticker", "date"))

  val factorLoadings = TableDef("factor_loadings",
    st("ticker" -> StringType, "date" -> DateType, "year" -> IntegerType,
      "factor" -> StringType, "loading" -> DoubleType),
    Seq("year"), Seq("date", "ticker", "factor"))

  val idioVol = TableDef("idio_vol",
    st("ticker" -> StringType, "date" -> DateType, "year" -> IntegerType,
      "idio_vol" -> DoubleType),
    Seq("year"), Seq("date", "ticker"))

  val factorCovariances = TableDef("factor_covariances",
    st("date" -> DateType, "year" -> IntegerType, "factor_1" -> StringType,
      "factor_2" -> StringType, "covariance" -> DoubleType),
    Seq("year"), Seq("date", "factor_1", "factor_2"))

  val signals = TableDef("signals", signalSchema("value"), Seq("year"), Seq("ticker", "date", "signal"))
  val scores = TableDef("scores", signalSchema("score"), Seq("year"), Seq("ticker", "date", "signal"))
  val alphas = TableDef("alphas", signalSchema("alpha"), Seq("year"), Seq("ticker", "date", "signal"))

  val benchmarkWeights = TableDef("benchmark_weights",
    st("ticker" -> StringType, "date" -> DateType, "year" -> IntegerType,
      "weight" -> DoubleType),
    Seq("year"), Seq("date", "ticker"))

  val benchmarkReturns = TableDef("benchmark_returns",
    st("date" -> DateType, "return" -> DoubleType), Nil, Seq("date"))

  val betas = TableDef("betas",
    st("ticker" -> StringType, "date" -> DateType, "year" -> IntegerType,
      "historical_beta" -> DoubleType, "predicted_beta" -> DoubleType),
    Seq("year"), Seq("ticker", "date"))

  val portfolioWeights = TableDef("portfolio_weights",
    st("ticker" -> StringType, "date" -> DateType, "year" -> IntegerType,
      "weight" -> DoubleType),
    Seq("year"), Seq("date", "ticker"))

  val portfolioMetrics = TableDef("portfolio_metrics",
    st("date" -> DateType, "lambda" -> DoubleType, "active_risk" -> DoubleType,
      "qp_converged" -> BooleanType),
    Nil, Seq("date"))

  val portfolioHistory = TableDef("portfolio_history",
    st("timestamp" -> TimestampType, "equity" -> DoubleType),
    Nil, Seq("timestamp"))

  val all: Seq[TableDef] = Seq(calendar, universe, stockPrices, etfPrices,
    stockReturns, etfReturns, factorLoadings, idioVol, factorCovariances,
    signals, scores, alphas, benchmarkWeights, benchmarkReturns, betas,
    portfolioWeights, portfolioMetrics, portfolioHistory)
}
