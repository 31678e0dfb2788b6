package graft.trade

import java.sql.Timestamp

/** One brokerage order as the trading loop sees it (the alpaca order
  * surface of /root/reference/pipelines/trading_flow.py:92-131,173-221).
  * Terminal states are "filled" and "canceled"; "open" is what the
  * fill-poll loop waits on. */
final case class BrokerOrder(
    orderId: Long,
    ticker: String,
    side: String, // "buy" | "sell"
    notional: Double, // submitted market-order notional (absolute)
    filledQty: Option[Double],
    filledAvgPrice: Option[Double],
    filledAt: Option[Timestamp],
    status: String) // "open" | "filled" | "canceled"

final case class BrokerPosition(ticker: String, marketValue: Double)

/** The brokerage-client surface the reference's trading flow drives
  * (trading_flow.py: get_account_value:17-20, get_open_orders:89-96,
  * cancel_all_orders:99-103, get_current_notionals:33-43,
  * close_positions:124-131, place_order:106-121,
  * get_todays_filled_orders:173-221). Live REST transport is
  * out-of-engine per SURVEY §7.6 — the engine codes against this
  * interface and the contract stages [[StagedBroker]]. */
trait BrokerClient {
  def accountEquity(): Double
  def openOrders(): Seq[BrokerOrder]
  def cancelAllOrders(): Unit
  def positions(): Seq[BrokerPosition]
  def closePosition(ticker: String): Unit
  def submitMarketOrder(ticker: String, notional: Double, side: String): Unit

  /** Closed (filled or canceled) orders, window-filtered on last-fill
    * time: an order WITH a fill stamp (fully filled, or canceled after a
    * partial execution — partials carry filled_at too) is reported only
    * when that stamp falls in [after, until]; a canceled order with NO
    * fill activity has no stamp and is always reported (the downstream
    * fills extraction drops it on the filled_at/filled_qty guard, exactly
    * like the reference). Consequence, pinned by TradingLoopSpec: a
    * canceled-partial whose execution stamp lies outside the window is
    * absent from the report — its fill belongs to the window it executed
    * in, not to the cancel's. */
  def closedOrders(after: Timestamp, until: Timestamp): Seq[BrokerOrder]
}

/** Deterministic in-memory brokerage — the staged fixture for the alpaca
  * boundary (SURVEY §7.6), playable under an injectable clock so every
  * fill stamp is reproducible bit-for-bit (the x40 oracle depends on it).
  *
  * Fill model: each submitted order fills `fillAfterPolls` openOrders()
  * polls after submission, all-or-nothing, at `priceOf(ticker)`; the
  * position then moves by exactly the submitted notional (buy +, sell −;
  * a position landing on 0 drops out, like a brokerage position list).
  * cancelAllOrders() is terminal — a canceled order never fills FURTHER.
  *
  * Partial fills: an order staged with `partialFraction` in (0,1)
  * executes that fraction when its countdown elapses and then STAYS
  * OPEN — the brokerage partial-execution state the fill-poll loop keeps
  * waiting on. The partial execution records filled_qty/filled_avg_price
  * and stamps filled_at at execution time (the broker's last-fill time),
  * and the position moves by the executed fraction. A later cancel
  * preserves those quantities on the now-terminal order, so the fills
  * extraction reports the order filled_qty-WEIGHTED — the reference's
  * filled_at/filled_qty>0 guard (trading_flow.py:197-221) keeps exactly
  * the executed part, never the submitted notional. */
final class StagedBroker(
    equity: Double,
    initialPositions: Seq[(String, Double)],
    priceOf: String => Double,
    clock: () => Timestamp,
    fillAfterPolls: Int = 1) extends BrokerClient {

  private final class Slot(var order: BrokerOrder, var countdown: Int,
      var partialFraction: Double = 0.0)
  private val book = scala.collection.mutable.ArrayBuffer[Slot]()
  private val pos = scala.collection.mutable.LinkedHashMap[String, Double](
    initialPositions: _*)
  private var nextId = 1L

  private def enqueue(ticker: String, notional: Double, side: String,
      countdown: Int, partialFraction: Double = 0.0): Unit = {
    require(partialFraction >= 0 && partialFraction < 1,
      s"partialFraction must be in [0,1): $partialFraction")
    book += new Slot(
      BrokerOrder(nextId, ticker, side, notional, None, None, None, "open"),
      countdown, partialFraction)
    nextId += 1
  }

  /** Pre-stage an already-open order from "yesterday" — the stale-order
    * branch (trading_flow.py:282-286) cancels these before rebalancing.
    * `partialFraction` in (0,1) makes the countdown execute only that
    * fraction (order stays open — the partial-fill state). */
  def stageOpenOrder(ticker: String, notional: Double, side: String,
      countdown: Int = Int.MaxValue, partialFraction: Double = 0.0): Unit =
    enqueue(ticker, notional, side, countdown, partialFraction)

  override def accountEquity(): Double = equity

  /** Polling advances the staged fill schedule: every open order's
    * countdown decrements, and at zero the order fills with the injected
    * clock's CURRENT stamp — so a loop that polls, sleeps (advancing a
    * virtual clock), and polls again produces deterministic fill times. */
  override def openOrders(): Seq[BrokerOrder] = {
    book.foreach { s =>
      if (s.order.status == "open") {
        s.countdown -= 1
        if (s.countdown <= 0) {
          if (s.partialFraction > 0) partialFill(s) else fill(s)
        }
      }
    }
    book.iterator.map(_.order).filter(_.status == "open").toSeq
  }

  private def fill(s: Slot): Unit = {
    val o = s.order
    val price = priceOf(o.ticker)
    s.order = o.copy(
      filledQty = Some(o.notional / price),
      filledAvgPrice = Some(price),
      filledAt = Some(clock()),
      status = "filled")
    move(o.ticker, o.side, o.notional)
  }

  /** Execute `partialFraction` of the order and leave it OPEN: quantities
    * and the last-fill stamp are recorded, the position moves by the
    * executed part, and the fraction is consumed so the order never
    * fills further on its own — it sits open until canceled (the
    * poll-timeout shape the spec pins). */
  private def partialFill(s: Slot): Unit = {
    val o = s.order
    val price = priceOf(o.ticker)
    val executed = o.notional * s.partialFraction
    s.order = o.copy(
      filledQty = Some(executed / price),
      filledAvgPrice = Some(price),
      filledAt = Some(clock()))
    s.partialFraction = 0.0
    s.countdown = Int.MaxValue
    move(o.ticker, o.side, executed)
  }

  private def move(ticker: String, side: String, notional: Double): Unit = {
    val delta = if (side == "buy") notional else -notional
    val nv = pos.getOrElse(ticker, 0.0) + delta
    if (nv == 0.0) { pos.remove(ticker); () } else pos(ticker) = nv
  }

  override def cancelAllOrders(): Unit = book.foreach { s =>
    if (s.order.status == "open") s.order = s.order.copy(status = "canceled")
  }

  override def positions(): Seq[BrokerPosition] =
    pos.iterator.map { case (t, v) => BrokerPosition(t, v) }.toSeq

  /** close_position liquidates the whole position as a market order —
    * modeled as a full-notional order through the same fill schedule. */
  override def closePosition(ticker: String): Unit = {
    val v = pos.getOrElse(ticker, 0.0)
    if (v != 0.0)
      enqueue(ticker, math.abs(v), if (v > 0) "sell" else "buy", fillAfterPolls)
  }

  override def submitMarketOrder(ticker: String, notional: Double,
      side: String): Unit =
    enqueue(ticker, notional, side, fillAfterPolls)

  override def closedOrders(after: Timestamp, until: Timestamp): Seq[BrokerOrder] =
    book.iterator.map(_.order)
      .filter(_.status != "open")
      .filter(_.filledAt.forall(t => !t.before(after) && !t.after(until)))
      .toSeq
}
