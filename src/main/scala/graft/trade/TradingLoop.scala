package graft.trade

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Everything one trading run produced: counts for the imperative steps,
  * the x19-shaped fills frame, and the Slack summary payload. */
final case class TradingExecution(
    canceledStale: Int,
    closed: Seq[String],
    placed: Seq[(String, Double)], // ticker -> signed notional delta submitted
    allFilled: Boolean,
    fills: DataFrame,
    payload: String)

/** The imperative execution core of the reference's daily trading flow —
  * /root/reference/pipelines/trading_flow.py:100-170 and the flow body at
  * 267-299: cancel stale open orders, liquidate positions-to-close, place
  * a market order per notional delta, poll until every order reaches a
  * terminal state (or the wait budget runs out), then extract today's
  * fills and format the Slack summary.
  *
  * The relational 95% (targets/close-list/deltas/fills/summary) stays in
  * [[TradingDiff]]/[[SlackSummary]] — distributed and oracled. This class
  * owns only the genuinely imperative 5%: the per-order submits (the
  * reference's iter_rows loop over the ≤-universe-sized delta frame) and
  * the fill-poll cycle. Clock and sleeper are injected so the whole loop
  * replays deterministically against [[StagedBroker]] — fill stamps
  * included — with zero real waiting. */
final class TradingLoop(
    spark: SparkSession,
    broker: BrokerClient,
    clock: () => Timestamp,
    sleep: Int => Unit,
    maxWaitMinutes: Int = 10,
    checkIntervalSeconds: Int = 60,
    log: String => Unit = println) {

  import spark.implicits._

  /** trading_flow.py:138-170 `wait_for_orders_to_fill`: poll the open
    * orders every `checkIntervalSeconds` until none remain; true iff all
    * reached a terminal state inside the `maxWaitMinutes` budget. */
  def waitForOrdersToFill(): Boolean = {
    log("Waiting for orders to fill...")
    var elapsed = 0
    while (elapsed < maxWaitMinutes * 60) {
      val open = broker.openOrders()
      if (open.isEmpty) {
        log(s"All orders filled after $elapsed seconds")
        return true
      }
      log(s"Still have ${open.length} open orders, waiting ${checkIntervalSeconds}s...")
      sleep(checkIntervalSeconds)
      elapsed += checkIntervalSeconds
    }
    log(s"Reached max wait time of $maxWaitMinutes minutes, some orders may still be open")
    false
  }

  /** trading_flow.py:173-221 `get_todays_filled_orders`: closed orders
    * since today's 9:30 America/New_York market open (computed off the
    * injected clock), normalized through the oracled fills extraction —
    * canceled orders carry no fill time and drop out exactly like the
    * reference's filled_at/filled_qty guard. */
  def todaysFilledOrders(): DataFrame = {
    val now = clock()
    val et = java.time.ZoneId.of("America/New_York")
    val today = now.toInstant.atZone(et).toLocalDate
    val marketOpen = Timestamp.from(today.atTime(9, 30).atZone(et).toInstant)
    val closed = broker.closedOrders(marketOpen, now)
    TradingDiff.extractFills(closed.toDF().select(
      $"orderId".as("order_id"), $"ticker", $"side",
      $"filledQty".as("filled_qty"),
      $"filledAvgPrice".as("filled_avg_price"),
      $"filledAt".as("filled_at")))
  }

  /** The flow body (trading_flow.py:267-299 minus the market-open gate,
    * which lives in Orchestrator.runTradingDaily): cancel stale orders,
    * diff targets vs current, close, place, wait, extract, summarize.
    * Rerunning after a completed run is a no-op on the order book — the
    * deltas frame is empty once positions match targets — while the
    * fills/summary still report today's earlier executions, exactly like
    * rerunning the reference flow intraday. */
  def execute(
      weights: DataFrame,
      previousAccountValue: Option[Double] = None,
      channel: String = "trading"): TradingExecution = {
    // trading_flow.py:282-286: stale open orders are canceled up front
    val stale = broker.openOrders()
    if (stale.nonEmpty) broker.cancelAllOrders()
    val accountValue = broker.accountEquity()
    val current = broker.positions()
      .map(p => (p.ticker, p.marketValue)).toDF("ticker", "current_notional")
    val targets = TradingDiff.targetNotionals(weights, accountValue)
    val toClose = TradingDiff.positionsToClose(targets, current)
    val deltas = TradingDiff.notionalDeltas(targets, current, toClose)
    // close_positions + place_all_orders iterate the decision frames
    // row-by-row — the reference's iter_rows driver-side pattern over
    // ≤-universe-sized frames; everything upstream stays distributed.
    // Both frames are sorted, so submit order is deterministic.
    val closeList = toClose.collect().map(_.getString(0)).toSeq
    closeList.foreach(broker.closePosition)
    val orderRows = deltas.collect()
      .map(r => (r.getAs[String]("ticker"), r.getAs[Double]("notional_delta")))
      .toSeq
    orderRows.foreach { case (ticker, d) =>
      val side = if (d < 0) "sell" else "buy"
      log(s"Executing $side @ MKT ${math.abs(d)} of $ticker")
      broker.submitMarketOrder(ticker, math.abs(d), side)
    }
    val allFilled = waitForOrdersToFill()
    val fills = todaysFilledOrders()
    val positionsNow = broker.positions()
      .map(p => (p.ticker, p.marketValue)).toDF("ticker", "value")
    val payload = SlackSummary.formatFromFrames(fills, positionsNow,
      broker.accountEquity(), previousAccountValue, channel)
    TradingExecution(stale.size, closeList, orderRows, allFilled, fills, payload)
  }
}
