package graft

import graft.trade.TradingDiff

/** Trading diff pipeline golden cases (FIXTURES.md B10): clip, full-join
  * coalesce, dust filter, close-list exclusion. */
class TradingDiffSpec extends SparkSpec {
  import spark.implicits._

  private val weights = Seq(
    ("AAPL", 0.5), ("MSFT", 0.3), ("GOOG", 0.2),
    ("TSLA", -0.1) // negative → clipped to 0 → close candidate
  ).toDF("ticker", "weight")

  private val currents = Seq(
    ("AAPL", 400.0), ("TSLA", 150.0), ("NVDA", 50.0) // NVDA absent from targets
  ).toDF("ticker", "current_notional")

  test("target notionals clip negatives and scale by account value") {
    val t = TradingDiff.targetNotionals(weights, accountValue = 1000.0)
    val m = t.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m == Map("AAPL" -> 500.0, "MSFT" -> 300.0, "GOOG" -> 200.0, "TSLA" -> 0.0))
  }

  test("positions to close: held and target ≤ 0") {
    val targets = TradingDiff.targetNotionals(weights, 1000.0)
    val toClose = TradingDiff.positionsToClose(targets, currents)
    assert(toClose.collect().map(_.getString(0)).toSeq == Seq("TSLA"))
  }

  test("notional deltas: coalesced keys, zero-fill, dust filter, close exclusion") {
    val targets = TradingDiff.targetNotionals(weights, 1000.0)
    val toClose = TradingDiff.positionsToClose(targets, currents)
    val deltas = TradingDiff.notionalDeltas(targets, currents, toClose)
    val m = deltas.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // AAPL: 500-400=100; MSFT: 300-0; GOOG: 200-0; NVDA: 0-50=-50;
    // TSLA excluded (close list)
    assert(m == Map("AAPL" -> 100.0, "MSFT" -> 300.0, "GOOG" -> 200.0, "NVDA" -> -50.0))
  }

  test("dust filter drops |delta| < $1") {
    val t = Seq(("AAPL", 100.5)).toDF("ticker", "target_notional")
    val c = Seq(("AAPL", 100.0)).toDF("ticker", "current_notional")
    val d = TradingDiff.notionalDeltas(t, c, Seq.empty[String].toDF("ticker"))
    assert(d.count() == 0) // 0.50 delta is dust
  }

  // (order_id, ticker, side, filled_qty, filled_avg_price, filled_at) —
  // the staged raw-orders shape of trading_flow.py:184-221
  private val rawOrders = Seq(
    ("o1", "AAPL", "buy", Some(10.0), Some(150.0), Some("2024-03-01 10:00:00")),
    ("o2", "MSFT", "sell", Some(5.0), Some(400.0), Some("2024-03-01 10:05:00")),
    ("o3", "GOOG", "buy", Some(2.0), None, Some("2024-03-01 10:10:00")), // no price → 0/0
    ("o4", "TSLA", "buy", Some(0.0), Some(180.0), Some("2024-03-01 10:15:00")), // qty 0 → dropped
    ("o5", "NVDA", "sell", Some(3.0), Some(900.0), None),                // never filled → dropped
    ("o6", "AMZN", "buy", None, Some(170.0), Some("2024-03-01 10:20:00")), // null qty → dropped
    ("o7", "META", "buy", Some(4.0), Some(500.0), Some("2024-03-01 10:25:00")),
    ("o8", "AMD", "buy", Some(20.0), Some(160.0), Some("2024-03-01 10:30:00")))
    .toDF("order_id", "ticker", "side", "filled_qty", "filled_avg_price", "filled_at")
    .selectExpr("order_id", "ticker", "side", "filled_qty", "filled_avg_price",
      "cast(filled_at as timestamp) as filled_at")

  test("extractFills keeps only true fills and zero-fills missing prices") {
    val fills = TradingDiff.extractFills(rawOrders)
    val rows = fills.collect().map(r => r.getAs[String]("order_id") ->
      (r.getAs[String]("ticker"), r.getAs[Double]("filled_qty"),
        r.getAs[Double]("filled_avg_price"), r.getAs[Double]("notional"))).toMap
    assert(rows.keySet == Set("o1", "o2", "o3", "o7", "o8"))
    assert(rows("o1") == (("AAPL", 10.0, 150.0, 1500.0)))
    assert(rows("o2") == (("MSFT", 5.0, 400.0, 2000.0)))
    // reference: missing fill price → price 0 AND notional 0
    assert(rows("o3") == (("GOOG", 2.0, 0.0, 0.0)))
  }

  test("topTrades ranks per side by notional (top 3)") {
    val top = TradingDiff.topTrades(TradingDiff.extractFills(rawOrders), n = 3)
    val buys = top.collect().filter(_.getAs[String]("side") == "buy")
      .sortBy(_.getAs[Int]("rank")).map(r => r.getAs[String]("ticker"))
    // buy notionals: AMD 3200, META 2000, AAPL 1500, GOOG 0 → top3 drops GOOG
    assert(buys.toSeq == Seq("AMD", "META", "AAPL"))
    val sells = top.collect().filter(_.getAs[String]("side") == "sell")
      .map(r => r.getAs[String]("ticker"))
    assert(sells.toSeq == Seq("MSFT"))
  }

  test("notionalTotals: buy/sell/total sums; zero row on empty fills") {
    val t = TradingDiff.notionalTotals(TradingDiff.extractFills(rawOrders))
      .collect().head
    assert(t.getAs[Double]("total_buys_notional") == 1500.0 + 0.0 + 2000.0 + 3200.0)
    assert(t.getAs[Double]("total_sells_notional") == 2000.0)
    assert(t.getAs[Double]("total_notional") == 8700.0)
    val empty = TradingDiff.notionalTotals(
      TradingDiff.extractFills(rawOrders.limit(0))).collect().head
    assert(empty.getAs[Double]("total_buys_notional") == 0.0)
    assert(empty.getAs[Double]("total_sells_notional") == 0.0)
    assert(empty.getAs[Double]("total_notional") == 0.0)
  }

  test("currentPositions: null market value → 0, value-descending") {
    val pos = Seq(("AAPL", Some(5000.0)), ("XYZ", None), ("MSFT", Some(9000.0)))
      .toDF("ticker", "value")
    val got = TradingDiff.currentPositions(pos).collect()
      .map(r => (r.getAs[String]("ticker"), r.getAs[Double]("value")))
    assert(got.toSeq == Seq(("MSFT", 9000.0), ("AAPL", 5000.0), ("XYZ", 0.0)))
  }

  test("dailySummaryStats: composed one-row summary; null P&L without previous") {
    val pos = Seq(("AAPL", Some(5000.0)), ("XYZ", None)).toDF("ticker", "value")
    val fills = TradingDiff.extractFills(rawOrders)
    val row = TradingDiff.dailySummaryStats(fills, pos, 100000.0, Some(98000.0))
      .collect().head
    assert(row.getAs[Long]("n_trades") == 5L)
    assert(row.getAs[Long]("n_buys") == 4L)
    assert(row.getAs[Long]("n_sells") == 1L)
    assert(row.getAs[Double]("total_notional") == 8700.0)
    assert(row.getAs[Long]("n_positions") == 2L)
    assert(row.getAs[Double]("day_pnl") == 2000.0)
    assert(approxEqual(row.getAs[Double]("day_pnl_pct"), 2000.0 / 98000.0 * 100))
    // reference branch: no previous account value → P&L fields are null;
    // a ZERO previous is the same branch (Python truthiness), never a
    // division by zero
    for (prev <- Seq(None, Some(0.0))) {
      val noPrev = TradingDiff.dailySummaryStats(fills, pos, 100000.0, prev)
        .collect().head
      assert(noPrev.isNullAt(noPrev.fieldIndex("day_pnl")), s"prev=$prev")
      assert(noPrev.isNullAt(noPrev.fieldIndex("day_pnl_pct")), s"prev=$prev")
    }
    // empty fills: zero counts and totals, like the reference's sum([])
    val z = TradingDiff.dailySummaryStats(
      TradingDiff.extractFills(rawOrders.limit(0)), pos, 100000.0, None)
      .collect().head
    assert(z.getAs[Long]("n_trades") == 0L && z.getAs[Double]("total_notional") == 0.0)
  }

  test("SlackSummary golden: full blocks payload from the relational outputs") {
    val pos = Seq(("AAPL", Some(5000.0)), ("XYZ", None)).toDF("ticker", "value")
    val fills = TradingDiff.extractFills(rawOrders)
    val got = graft.trade.SlackSummary.formatFromFrames(
      fills, pos, accountValue = 100000.0,
      previousAccountValue = Some(98000.0), channel = "trading")
    // hand-derived from slack_daily_summary.py:92-199 f-string semantics:
    // buys 4 = $6,700.00 (AMD 3200 > META 2000 > AAPL 1500 > GOOG 0, top 3
    // keeps the first three), sells 1 = $2,000.00; P&L 2000/98000 = +2.04%
    val expected =
      """{"channel": "trading", "text": "📊 Daily Trading Summary", "blocks": [""" +
        """{"type": "header", "text": {"type": "plain_text", "text": "📊 Daily Trading Summary"}}, """ +
        """{"type": "section", "fields": [""" +
        """{"type": "mrkdwn", "text": "*Portfolio Value*\n$100,000.00"}, """ +
        """{"type": "mrkdwn", "text": "*Day P&L*\n$2,000.00 (+2.04%)"}, """ +
        """{"type": "mrkdwn", "text": "*Total Volume*\n$8,700.00"}, """ +
        """{"type": "mrkdwn", "text": "*Positions*\n2 open"}]}, """ +
        """{"type": "divider"}, """ +
        """{"type": "section", "text": {"type": "mrkdwn", "text": "*Buys:* 4 · $6,700.00\n*Sells:* 1 · $2,000.00"}}, """ +
        """{"type": "divider"}, """ +
        """{"type": "section", "text": {"type": "mrkdwn", "text": "*Top 3 Buys*\n""" +
        """1. 20.00 `AMD` @ $160.00 = $3,200.00\n""" +
        """2. 4.00 `META` @ $500.00 = $2,000.00\n""" +
        """3. 10.00 `AAPL` @ $150.00 = $1,500.00"}}, """ +
        """{"type": "section", "text": {"type": "mrkdwn", "text": "*Top 3 Sells*\n""" +
        """1. 5.00 `MSFT` @ $400.00 = $2,000.00"}}, """ +
        """{"type": "divider"}, """ +
        """{"type": "section", "text": {"type": "mrkdwn", "text": "*Top 2 Positions*\n""" +
        """1. `AAPL`: $5,000.00\n2. `XYZ`: $0.00"}}]}"""
    assert(got == expected)
    // well-formed JSON (json4s ships with Spark)
    org.json4s.jackson.JsonMethods.parse(got)
  }

  test("SlackSummary golden: fill price >= $1,000 stays ungrouped (python {:.2f})") {
    import graft.trade.SlackSummary
    import graft.trade.SlackSummary.{SummaryStats, TradeLine}
    // slack_daily_summary.py:148 groups ONLY notional — a $1,234.50 price
    // renders "@ $1234.50", not "@ $1,234.50" (the r5 golden never crossed
    // $1,000 so money() vs qty() on the price was unobservable)
    val stats = SummaryStats(nTrades = 1, nBuys = 1, nSells = 0,
      totalBuysNotional = 6172.5, totalSellsNotional = 0.0,
      totalNotional = 6172.5, nPositions = 0, accountValue = 50000.0,
      dayPnl = None, dayPnlPct = None)
    val got = SlackSummary.formatDailySummary(stats,
      Seq(TradeLine("BKNG", 5.0, 1234.5, 6172.5)), Nil, Nil, "trading")
    assert(got.contains("""1. 5.00 `BKNG` @ $1234.50 = $6,172.50"""))
    org.json4s.jackson.JsonMethods.parse(got)
  }

  test("SlackSummary golden: no-trades branch") {
    val pos = Seq(("AAPL", Some(5000.0))).toDF("ticker", "value")
    val got = graft.trade.SlackSummary.formatFromFrames(
      TradingDiff.extractFills(rawOrders.limit(0)), pos,
      accountValue = 100000.0, channel = "trading")
    val expected =
      """{"channel": "trading", "text": "✅ No trades executed today", "blocks": [""" +
        """{"type": "section", "text": {"type": "mrkdwn", """ +
        """"text": "✅ *No trades executed today*\n\nPortfolio value: $100,000.00"}}]}"""
    assert(got == expected)
    org.json4s.jackson.JsonMethods.parse(got)
  }

  test("SlackSummary: no-previous branch shows trade count; sections drop when empty") {
    import graft.trade.SlackSummary
    import graft.trade.SlackSummary.{Position, SummaryStats, TradeLine}
    // sells only, no positions, no previous account value
    val stats = SummaryStats(nTrades = 1, nBuys = 0, nSells = 1,
      totalBuysNotional = 0.0, totalSellsNotional = 2000.0,
      totalNotional = 2000.0, nPositions = 0, accountValue = 50000.0,
      dayPnl = None, dayPnlPct = None)
    val got = SlackSummary.formatDailySummary(stats, Nil,
      Seq(TradeLine("MSFT", 5.0, 400.0, 2000.0)), Nil, "trading")
    assert(got.contains(""""*Trades Executed*\n1""""))
    assert(!got.contains("*Buys:*"))
    assert(got.contains("""*Sells:* 1 · $2,000.00"""))
    assert(!got.contains("Top 3 Buys"))
    assert(got.contains("Top 3 Sells"))
    assert(!got.contains("Positions*\\n1.")) // no positions section
    org.json4s.jackson.JsonMethods.parse(got)
    // negative P&L formats like python's f"{v:,.2f}"/{v:+.2f}
    val neg = SlackSummary.formatDailySummary(
      stats.copy(dayPnl = Some(-1234.5), dayPnlPct = Some(-2.4134)),
      Nil, Seq(TradeLine("MSFT", 5.0, 400.0, 2000.0)),
      Seq(Position("AAPL", 5000.0)), "trading")
    assert(neg.contains("""*Day P&L*\n$-1,234.50 (-2.41%)"""))
  }

  test("SlackSummary: exact 2dp ties round half-even like python :,.2f") {
    import graft.trade.SlackSummary
    import graft.trade.SlackSummary.{Position, SummaryStats, TradeLine}
    // 4412.625 = 4412 + 5/8 exact in binary: python f"{v:,.2f}" gives
    // 4,412.62 (cent digit 2 even); java HALF_UP would give 4,412.63.
    // 630.375 / 11556.875 tie the other way (odd cent digit → up).
    val stats = SummaryStats(nTrades = 2, nBuys = 2, nSells = 0,
      totalBuysNotional = 26265.625, totalSellsNotional = 0.0,
      totalNotional = 26265.625, nPositions = 1, accountValue = 4412.625,
      dayPnl = Some(630.375), dayPnlPct = Some(0.125))
    val got = SlackSummary.formatDailySummary(stats,
      Seq(TradeLine("T", 2.125, 1234.625, 4412.625)), Nil,
      Seq(Position("P", 11556.875)), "trading")
    assert(got.contains("""*Portfolio Value*\n$4,412.62"""))
    assert(got.contains("""*Day P&L*\n$630.38 (+0.12%)"""))
    assert(got.contains("""*Total Volume*\n$26,265.62"""))
    assert(got.contains("""1. 2.12 `T` @ $1234.62 = $4,412.62"""))
    assert(got.contains("""1. `P`: $11,556.88"""))
    // sign handling survives the BigDecimal path: -0.0 keeps its sign
    val negz = SlackSummary.formatDailySummary(
      stats.copy(dayPnl = Some(-0.0), dayPnlPct = Some(-0.0)),
      Nil, Nil, Nil, "trading")
    assert(negz.contains("""*Day P&L*\n$-0.00 (-0.00%)"""))
  }
}
