package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.lake.{Catalog, Lake}
import graft.opt.PortfolioOptimizer

/** The full daily DAG as plain Scala orchestration — the Spark-first
  * replacement for the reference's Prefect flow chain
  * (/root/reference/pipelines/__main__.py:22-35): each stage is a pure
  * function over catalog tables, chained in dependency order, with
  * idempotent upsert writes (create-if-absent + append + PK-dedup
  * compaction).
  *
  * External ingestion (brokerage bars, Wikipedia constituents, NYSE
  * calendar) arrives as staged DataFrames — the engine's contract starts at
  * parquet (SURVEY §7.0).
  */
class Orchestrator(
    spark: SparkSession,
    lake: Lake,
    factors: Seq[String],
    window: Int = 252,
    halfLife: Double = 60.0,
    ic: Double = 0.05,
    targetActiveRisk: Double = 0.05) {

  import spark.implicits._

  /** calendar_flow: replace-mode calendar table. */
  def runCalendar(calendarDates: DataFrame): Unit = {
    lake.create(Catalog.calendar, replace = true)
    lake.append(Catalog.calendar, calendarDates.select($"date"))
  }

  /** universe_flow: membership reconstruction from the change log. */
  def runUniverse(currentConstituents: DataFrame, changes: DataFrame): Unit = {
    val uni = Universe.reconstruct(currentConstituents, changes,
      lake.table(Catalog.calendar))
    lake.create(Catalog.universe, replace = true)
    lake.append(Catalog.universe, uni)
  }

  /** stock/etf price ingestion: upsert staged bars. */
  def runPrices(stockBars: DataFrame, etfBars: DataFrame): Unit = {
    def withYear(df: DataFrame) = df.withColumn("year", year($"date"))
    lake.upsert(Catalog.stockPrices, withYear(stockBars))
    lake.upsert(Catalog.etfPrices, withYear(etfBars))
  }

  /** returns_flow: replace-mode simple returns. */
  def runReturns(): Unit = {
    val sr = Quant.materializeReturns(lake.table(Catalog.stockPrices))
    val er = Quant.materializeReturns(lake.table(Catalog.etfPrices))
    lake.create(Catalog.stockReturns, replace = true)
    lake.append(Catalog.stockReturns, sr)
    lake.create(Catalog.etfReturns, replace = true)
    lake.append(Catalog.etfReturns, er)
  }

  /** factor_model_flow: loadings + idio vol. */
  def runFactorModel(): Unit = {
    val (loadings, idio) = Quant.factorModel(
      lake.table(Catalog.stockReturns), lake.table(Catalog.etfReturns),
      factors, window, halfLife)
    lake.upsert(Catalog.factorLoadings, loadings)
    lake.upsert(Catalog.idioVol, idio)
  }

  /** factor_covariances_flow. */
  def runFactorCovariances(): Unit =
    lake.upsert(Catalog.factorCovariances,
      Quant.factorCovariances(lake.table(Catalog.etfReturns), window, halfLife))

  /** reversal_flow: signal → score → alpha chain. Scoring filters to the
    * reversal signal rows — the signals table's PK includes the signal name
    * so other signals can coexist without contaminating this z-score. */
  def runReversal(): Unit = {
    val signals = Quant.reversalSignals(lake.table(Catalog.stockReturns))
    lake.upsert(Catalog.signals, signals)
    val scores = Quant.reversalScores(
      lake.table(Catalog.signals).filter($"signal" === "reversal"))
    lake.upsert(Catalog.scores, scores)
    val alphas = Quant.reversalAlphas(
      lake.table(Catalog.scores), lake.table(Catalog.idioVol), ic)
    lake.upsert(Catalog.alphas, alphas)
  }

  /** benchmark_flow: universe-gated equal-weight benchmark. The left join
    * KEEPS members with a missing return (reference get_universe_returns) —
    * they count in the 1/N denominator; the Σ w·r sum skips their null
    * contribution, exactly like Polars' null-skipping sum. */
  def runBenchmark(): Unit = {
    val universeReturns = lake.table(Catalog.universe)
      .select($"date", $"ticker")
      .join(lake.table(Catalog.stockReturns).select($"date", $"ticker", $"return"),
        Seq("date", "ticker"), "left")
    val w = Quant.benchmarkWeights(universeReturns)
    lake.upsert(Catalog.benchmarkWeights, w)
    lake.upsert(Catalog.benchmarkReturns,
      Quant.benchmarkReturns(universeReturns, w))
  }

  /** betas_flow. */
  def runBetas(): Unit =
    lake.upsert(Catalog.betas, Quant.betas(
      lake.table(Catalog.stockReturns), lake.table(Catalog.benchmarkReturns),
      window, halfLife))

  /** portfolio_weights_flow: per-date mean-variance fan-out. */
  def runPortfolioWeights(): Unit = {
    val alphas = lake.table(Catalog.alphas).na.drop(Seq("alpha"))
    val combined = PortfolioOptimizer.optimizeAllDates(
      alphas,
      lake.table(Catalog.benchmarkWeights),
      lake.table(Catalog.factorLoadings).na.drop(Seq("loading")),
      lake.table(Catalog.factorCovariances).na.drop(Seq("covariance")),
      lake.table(Catalog.idioVol).na.drop(Seq("idio_vol")),
      targetActiveRisk).cache()
    lake.upsert(Catalog.portfolioWeights, PortfolioOptimizer.weights(combined))
    lake.upsert(Catalog.portfolioMetrics, PortfolioOptimizer.metrics(combined))
    combined.unpersist()
  }

  /** portfolio_history_flow.py:24-83: staged 1-minute equity snapshots
    * (epoch seconds) → UTC timestamps, upserted on the timestamp PK. */
  def runPortfolioHistory(equitySnapshots: DataFrame): Unit = {
    val decoded = equitySnapshots
      .select(timestamp_seconds($"epoch_s").as("timestamp"), $"equity")
    lake.upsert(Catalog.portfolioHistory, decoded)
  }

  /** The reference's daily incremental pattern (SURVEY §2.11 / §4
    * "key-range incremental recomputation"): recompute only the trailing
    * `lookback` trading days, slice to the target date, upsert — compaction
    * scoped to the touched year partition. This is what makes the daily
    * DAG O(window), not O(history), at any table size.
    *
    * Example — the factor-model daily flow
    * (factor_model_flow.py:177-202). */
  def runFactorModelDaily(endDate: java.sql.Date): Unit = {
    val lookback = window * 2
    val dates = Quant.trailingDates(
      lake.table(Catalog.calendar).filter($"date" <= lit(endDate)), lookback)
      .agg(min($"date").as("start")).collect().head.getDate(0)
    val sr = lake.table(Catalog.stockReturns).filter($"date".between(lit(dates), lit(endDate)))
    val er = lake.table(Catalog.etfReturns).filter($"date".between(lit(dates), lit(endDate)))
    val (loadings, idio) = Quant.factorModel(sr, er, factors, window, halfLife)
    val yearPart = Seq(s"year=${endDate.toLocalDate.getYear}")
    lake.create(Catalog.factorLoadings)
    lake.append(Catalog.factorLoadings, loadings.filter($"date" === lit(endDate)))
    lake.optimize(Catalog.factorLoadings, yearPart)
    lake.create(Catalog.idioVol)
    lake.append(Catalog.idioVol, idio.filter($"date" === lit(endDate)))
    lake.optimize(Catalog.idioVol, yearPart)
  }

  /** reversal_flow.py:163-194 — the daily reversal chain. Note the
    * reference's scoping subtlety (SURVEY §7.4.4): the daily flow reads
    * only the trailing 21 trading days, so the rolling sum completes only
    * on the final date and the z-score is effectively CROSS-SECTIONAL over
    * that date — a different (deliberate) semantics from the backfill's
    * whole-panel z-score. Replicated exactly, including the non-empty
    * guard. */
  def runReversalDaily(endDate: java.sql.Date, signalWindow: Int = 21): Unit = {
    val startDate = Quant.trailingDates(
      lake.table(Catalog.calendar).filter($"date" <= lit(endDate)), signalWindow)
      .agg(min($"date")).collect().head.getDate(0)
    val sr = lake.table(Catalog.stockReturns)
      .filter($"date".between(lit(startDate), lit(endDate)))
    val iv = lake.table(Catalog.idioVol)
      .filter($"date".between(lit(startDate), lit(endDate)))
    import org.apache.spark.storage.StorageLevel
    val signals = Quant.reversalSignals(sr, signalWindow)
      .filter($"date" === lit(endDate)).persist(StorageLevel.MEMORY_AND_DISK)
    val scores = Quant.reversalScores(signals).filter($"date" === lit(endDate))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val alphas = Quant.reversalAlphas(scores, iv, ic)
      .filter($"date" === lit(endDate)).persist(StorageLevel.MEMORY_AND_DISK)
    // reference's guard (reversal_flow.py:189-190); alphas is non-empty iff
    // the whole chain is (each stage preserves rows), and the persists keep
    // the guard counts + the writes from recomputing the chain
    require(alphas.count() > 0, "No values found!")
    val yearPart = Seq(s"year=${endDate.toLocalDate.getYear}")
    Seq((Catalog.signals, signals), (Catalog.scores, scores),
      (Catalog.alphas, alphas)).foreach { case (t, df) =>
      lake.create(t)
      lake.append(t, df)
      lake.optimize(t, yearPart)
      df.unpersist()
    }
  }

  /** The whole daily chain in dependency order. */
  def runAll(
      calendarDates: DataFrame,
      currentConstituents: DataFrame,
      changes: DataFrame,
      stockBars: DataFrame,
      etfBars: DataFrame): Unit = {
    runCalendar(calendarDates)
    runUniverse(currentConstituents, changes)
    runPrices(stockBars, etfBars)
    runReturns()
    runFactorModel()
    runFactorCovariances()
    runReversal()
    runBenchmark()
    runBetas()
    runPortfolioWeights()
  }
}
