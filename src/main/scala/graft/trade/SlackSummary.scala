package graft.trade

import org.apache.spark.sql.{DataFrame, Row}

/** The daily-summary Slack payload as a PURE function of the relational
  * outputs — the formatting half of
  * /root/reference/pipelines/utils/slack_daily_summary.py:47-202, whose
  * relational spine is already engine-side (TradingDiff.dailySummaryStats,
  * x30; topTrades, x20; notionalTotals, x21; currentPositions).
  *
  * The webhook I/O boundary (`chat_postMessage`) stays out-of-engine per
  * SURVEY §2.1 — this closes the last formatting surface with a
  * deterministic, golden-testable blocks-JSON string. Number formatting
  * mirrors the reference's f-strings exactly (`{v:,.2f}` money grouping,
  * `{pct:+.2f}` signed percent, `{qty:.2f}` plain quantity), pinned to
  * Locale.US so output is machine-independent.
  */
object SlackSummary {

  final case class TradeLine(
      ticker: String, filledQty: Double, filledAvgPrice: Double, notional: Double)
  final case class Position(ticker: String, value: Double)

  /** The x30 stats row (TradingDiff.dailySummaryStats) as a typed view. */
  final case class SummaryStats(
      nTrades: Long, nBuys: Long, nSells: Long,
      totalBuysNotional: Double, totalSellsNotional: Double,
      totalNotional: Double, nPositions: Long, accountValue: Double,
      dayPnl: Option[Double], dayPnlPct: Option[Double])

  object SummaryStats {
    def fromRow(r: Row): SummaryStats = SummaryStats(
      nTrades = r.getAs[Long]("n_trades"),
      nBuys = r.getAs[Long]("n_buys"),
      nSells = r.getAs[Long]("n_sells"),
      totalBuysNotional = r.getAs[Double]("total_buys_notional"),
      totalSellsNotional = r.getAs[Double]("total_sells_notional"),
      totalNotional = r.getAs[Double]("total_notional"),
      nPositions = r.getAs[Long]("n_positions"),
      accountValue = r.getAs[Double]("account_value"),
      dayPnl = Option(r.getAs[java.lang.Double]("day_pnl")).map(_.doubleValue()),
      dayPnlPct = Option(r.getAs[java.lang.Double]("day_pnl_pct")).map(_.doubleValue()))
  }

  import Blocks.{J, JS, JO, JA, mrkdwn, section, divider}

  private val US = java.util.Locale.US

  /** Round-half-even at 2dp on the EXACT binary value, like Python's
    * `f"{v:,.2f}"`. Java's `%.2f` on a double is HALF_UP, which diverges
    * from the reference on exact 2dp ties: 4412.625 (= 4412 + 5/8, exact
    * in binary) renders 4,412.63 under HALF_UP but 4,412.62 in Python
    * (cent digit 2 is even). `new BigDecimal(double)` preserves the exact
    * binary value; rounding |v| keeps the sign (incl. -0.0 → "-0.00",
    * which BigDecimal cannot represent) and HALF_EVEN is symmetric. */
  private def fmt2(v: Double, pattern: String, forceSign: Boolean): String = {
    if (v.isNaN || v.isInfinite)
      return String.format(US, pattern, Double.box(v)) // never in payloads; don't throw
    val mag = String.format(US, pattern,
      new java.math.BigDecimal(math.abs(v))
        .setScale(2, java.math.RoundingMode.HALF_EVEN))
    if (java.lang.Double.doubleToRawLongBits(v) < 0L) "-" + mag
    else if (forceSign) "+" + mag
    else mag
  }
  private def money(v: Double): String = fmt2(v, "%,.2f", forceSign = false)
  private def signedPct(v: Double): String = fmt2(v, "%.2f", forceSign = true)
  private def qty(v: Double): String = fmt2(v, "%.2f", forceSign = false)

  private def tradeLines(header: String, trades: Seq[TradeLine]): J =
    // slack_daily_summary.py:148 — price is PLAIN {:.2f} (no thousands
    // grouping), only notional is {:,.2f}; a $1,234.50 fill renders as
    // "@ $1234.50 = $..." in the reference payload
    section(header + "\n" + trades.zipWithIndex.map { case (t, i) =>
      s"${i + 1}. ${qty(t.filledQty)} `${t.ticker}` @ $$${qty(t.filledAvgPrice)}" +
        s" = $$${money(t.notional)}"
    }.mkString("\n"))

  /** slack_daily_summary.py:47-202: the full message payload. `positions`
    * is the top-5 slice (stats.nPositions carries the full count for the
    * "Top N Positions" title, exactly like the reference's
    * `min(5, len(positions))`). */
  def formatDailySummary(
      stats: SummaryStats,
      topBuys: Seq[TradeLine],
      topSells: Seq[TradeLine],
      positions: Seq[Position],
      channel: String): String = {
    if (stats.nTrades == 0L) {
      // slack_daily_summary.py:60-76: the no-trades branch
      return JO(
        "channel" -> JS(channel),
        "text" -> JS("✅ No trades executed today"),
        "blocks" -> JA(Seq(section(
          "✅ *No trades executed today*\n\nPortfolio value: $" +
            money(stats.accountValue))))).render
    }
    val headerBlock = JO(
      "type" -> JS("header"),
      "text" -> JO("type" -> JS("plain_text"),
        "text" -> JS("📊 Daily Trading Summary")))
    val pnlField = (stats.dayPnl, stats.dayPnlPct) match {
      case (Some(pnl), Some(pct)) =>
        s"*Day P&L*\n$$${money(pnl)} (${signedPct(pct)}%)"
      case _ => s"*Trades Executed*\n${stats.nTrades}"
    }
    val fieldsBlock = JO(
      "type" -> JS("section"),
      "fields" -> JA(Seq(
        mrkdwn(s"*Portfolio Value*\n$$${money(stats.accountValue)}"),
        mrkdwn(pnlField),
        mrkdwn(s"*Total Volume*\n$$${money(stats.totalNotional)}"),
        mrkdwn(s"*Positions*\n${stats.nPositions} open"))))

    val blocks = scala.collection.mutable.ArrayBuffer[J](
      headerBlock, fieldsBlock, divider)

    val totalsLines = Seq(
      if (stats.nBuys > 0)
        Some(s"*Buys:* ${stats.nBuys} · $$${money(stats.totalBuysNotional)}")
      else None,
      if (stats.nSells > 0)
        Some(s"*Sells:* ${stats.nSells} · $$${money(stats.totalSellsNotional)}")
      else None).flatten
    if (totalsLines.nonEmpty) {
      blocks += section(totalsLines.mkString("\n"))
      blocks += divider
    }
    if (topBuys.nonEmpty) blocks += tradeLines("*Top 3 Buys*", topBuys)
    if (topSells.nonEmpty) blocks += tradeLines("*Top 3 Sells*", topSells)
    if (positions.nonEmpty) {
      val title = s"*Top ${math.min(5L, stats.nPositions)} Positions*"
      val lines = positions.zipWithIndex.map { case (p, i) =>
        s"${i + 1}. `${p.ticker}`: $$${money(p.value)}"
      }
      blocks += divider
      blocks += section((title +: lines).mkString("\n"))
    }
    JO(
      "channel" -> JS(channel),
      "text" -> JS("📊 Daily Trading Summary"),
      "blocks" -> JA(blocks.toSeq)).render
  }

  /** Frame-driven convenience: collects the (tiny) relational outputs —
    * 1-row stats, ≤2n top trades, top-5 positions — and formats. This is
    * the driver-side assembly step; everything upstream is distributed. */
  def formatFromFrames(
      fills: DataFrame,
      positions: DataFrame,
      accountValue: Double,
      previousAccountValue: Option[Double] = None,
      channel: String = "trading"): String = {
    val stats = SummaryStats.fromRow(
      TradingDiff.dailySummaryStats(
        fills, positions, accountValue, previousAccountValue).head())
    val top = TradingDiff.topTradeDetails(fills).collect().map { r =>
      (r.getAs[String]("side"), TradeLine(
        r.getAs[String]("ticker"), r.getAs[Double]("filled_qty"),
        r.getAs[Double]("filled_avg_price"), r.getAs[Double]("notional")))
    }
    val top5 = TradingDiff.currentPositions(positions).limit(5).collect()
      .map(r => Position(r.getAs[String]("ticker"), r.getAs[Double]("value")))
    formatDailySummary(stats,
      top.collect { case ("buy", t) => t }.toSeq,
      top.collect { case ("sell", t) => t }.toSeq,
      top5.toSeq, channel)
  }
}
