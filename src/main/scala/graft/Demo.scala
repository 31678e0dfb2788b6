package graft

import java.sql.Date
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lake.{Catalog, Lake}
import graft.pipelines.Orchestrator
import graft.trade.TradingDiff

/** End-to-end drive of the full daily DAG on a synthetic market: calendar →
  * universe → prices → returns → factor model → covariances → reversal →
  * benchmark → betas → per-date QP → trading diff. Prints per-table row
  * counts and sample outputs; exits non-zero if any stage produced an
  * empty table. Usage: runMain graft.Demo [lakeDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val lakeDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo_lake").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val factors = Seq("SPY", "MTUM", "QUAL")
    val window = 30
    val nDays = 120
    val dates = (0 until nDays).map(i =>
      Date.valueOf(java.time.LocalDate.of(2023, 6, 1).plusDays(i)))
    val tickers = (1 to 12).map(i => f"TK$i%02d")

    def price(t: String, i: Int): Double = {
      val seed = math.abs(t.hashCode) % 89
      80.0 + seed + 12.0 * math.sin(0.07 * (i + seed)) + 0.3 * i +
        3.0 * math.sin(0.31 * i + seed)
    }
    val stockBars = (for (t <- tickers; i <- dates.indices) yield {
      val c = price(t, i)
      (t, dates(i), c * 0.995, c * 1.01, c * 0.99, c, 1e6, 1e3, c)
    }).toDF("ticker", "date", "open", "high", "low", "close", "volume", "trade_count", "vwap")
    val etfBars = (for (t <- factors; i <- dates.indices) yield {
      val c = price(t, i)
      (t, dates(i), c * 0.995, c * 1.01, c * 0.99, c, 1e6, 1e3, c)
    }).toDF("ticker", "date", "open", "high", "low", "close", "volume", "trade_count", "vwap")

    // change log: TK01 removed mid-period, TK12 added mid-period
    val changes = Seq(
      (dates(60), "TK01", "Added"),   // joined on day 60 → not member before
      (dates(80), "TK11", "Removed")) // left on day 80 → member before
      .toDF("effective_date", "ticker", "action")
    val current = tickers.filter(_ != "TK11").toDF("ticker")

    val lake = new Lake(spark, lakeDir)
    val orch = new Orchestrator(spark, lake, factors,
      window = window, halfLife = 15.0)
    orch.runAll(dates.toDF("date"), current, changes, stockBars, etfBars)

    // portfolio history: staged epoch-second equity snapshots
    orch.runPortfolioHistory((0 until 120).map(i =>
      (1704103200L + 60L * i, 100000.0 + 17.0 * i)).toDF("epoch_s", "equity"))

    // daily incremental recompute must be idempotent: re-running the
    // factor-model daily flow for the last date upserts rows that already
    // exist — PK compaction absorbs them, counts unchanged
    val beforeDaily = lake.table(Catalog.factorLoadings).count()
    orch.runFactorModelDaily(dates.last)
    val afterDaily = lake.table(Catalog.factorLoadings).count()
    println(s"[demo] daily upsert idempotent: $beforeDaily -> $afterDaily")

    // daily reversal: cross-sectional scoring of the final date; the upsert
    // REPLACES that date's backfill rows (same PK), so counts hold
    val beforeRev = lake.table(Catalog.scores).count()
    orch.runReversalDaily(dates.last)
    val afterRev = lake.table(Catalog.scores).count()
    println(s"[demo] daily reversal upsert: $beforeRev -> $afterRev")
    val revCountsHold = beforeRev == afterRev

    // the full end-of-day daily chain (reference __main__.py daily_flow
    // order): calendar/universe rebuild, gated prices upsert, returns
    // rebuild, then every gated incremental flow through the QP solve.
    // Running it over the backfilled lake must be a consistent no-op-ish
    // upsert (PK compaction absorbs the overlap) — and a closed-market
    // date must gate out without touching fact tables.
    val pricesBefore = lake.table(Catalog.stockPrices).count()
    val gated = orch.runAllDaily(
      Date.valueOf(dates.last.toLocalDate.plusDays(1)), // not a trading day
      dates.toDF("date"), current, changes, stockBars, etfBars)
    val ranDaily = orch.runAllDaily(dates.last,
      dates.toDF("date"), current, changes, stockBars, etfBars)
    val pricesAfter = lake.table(Catalog.stockPrices).count()
    println(s"[demo] daily chain: closed-market gate=${!gated}, open-market ran=$ranDaily, " +
      s"prices ${pricesBefore} -> ${pricesAfter} (idempotent upsert)")
    val dailyChainOk = !gated && ranDaily && pricesBefore == pricesAfter

    // trading diff on the last date's weights
    val lastDate = dates.last
    val weights = lake.table(Catalog.portfolioWeights)
      .filter($"date" === lastDate).select($"ticker", $"weight")
    val targets = TradingDiff.targetNotionals(weights, accountValue = 100000.0)
    val currentNotionals = Seq(("TK01", 5000.0), ("TK02", 20000.0), ("ZZZ", 300.0))
      .toDF("ticker", "current_notional")
    val toClose = TradingDiff.positionsToClose(targets, currentNotionals)
    val deltas = TradingDiff.notionalDeltas(targets, currentNotionals, toClose)

    var failed = false
    Catalog.all.foreach { t =>
      val n = lake.table(t).count()
      val ok = n > 0
      if (!ok) failed = true
      println(f"[demo] ${t.name}%-22s rows=$n%-8d ${if (ok) "OK" else "EMPTY!"}")
    }
    println("[demo] portfolio_weights sample:")
    lake.table(Catalog.portfolioWeights).filter($"date" === lastDate)
      .orderBy($"weight".desc).show(5, truncate = false)
    println("[demo] portfolio_metrics sample:")
    lake.table(Catalog.portfolioMetrics).orderBy($"date".desc).show(3, truncate = false)
    println("[demo] notional deltas:")
    deltas.show(20, truncate = false)
    val wSum = lake.table(Catalog.portfolioWeights).filter($"date" === lastDate)
      .agg(sum($"weight")).collect().head.getDouble(0)
    println(f"[demo] last-date weight sum = $wSum%.6f (want 1.0)")
    if (math.abs(wSum - 1.0) > 1e-6) failed = true
    if (beforeDaily != afterDaily) failed = true
    if (!revCountsHold) failed = true
    if (!dailyChainOk) failed = true
    println(s"[demo] ${if (failed) "FAIL" else "PASS"}")
    spark.stop()
    if (failed) sys.exit(1)
  }
}
