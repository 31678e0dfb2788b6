package graft

import java.sql.Timestamp

import graft.trade.{StagedBroker, TradingLoop, SlackFailure}

/** The imperative trading loop (trading_flow.py:100-170,267-299) replayed
  * end-to-end against the staged broker with a virtual clock: stale-order
  * cancel, close-list liquidation, per-delta market orders, the fill-poll
  * cycle with terminal states (filled / canceled / open-at-timeout), the
  * x19-shaped fills extraction, and idempotent rerun. Plus the flow
  * failure handler goldens (slack_failure_handler.py:11-103). */
class TradingLoopSpec extends SparkSpec {
  import spark.implicits._

  private def virtualClock(startIso: String): (() => Timestamp, Int => Unit) = {
    var nowMs = java.time.Instant.parse(startIso).toEpochMilli
    (() => new Timestamp(nowMs), (sec: Int) => { nowMs += sec * 1000L })
  }

  private def mkBroker(clock: () => Timestamp, fillAfterPolls: Int) =
    new StagedBroker(
      equity = 100000.0,
      initialPositions = Seq("R0" -> 6400.0, "R2" -> 14500.0, "R4" -> 27500.0),
      priceOf = Map("R0" -> 32.0, "R2" -> 100.0, "R3" -> 125.0, "R4" -> 400.0),
      clock = clock,
      fillAfterPolls = fillAfterPolls)

  private def weightsDf = Seq(
    ("R0", -0.125), ("R1", 0.0), ("R2", 0.125), ("R3", 0.25), ("R4", 0.375))
    .toDF("ticker", "weight")

  test("staged replay: cancel stale, close, place, poll to fill, x19 fills") {
    val (clock, sleep) = virtualClock("2024-03-04T15:00:00Z")
    val broker = mkBroker(clock, fillAfterPolls = 3)
    broker.stageOpenOrder("R9", 123.0, "buy")
    val loop = new TradingLoop(spark, broker, clock, sleep, log = _ => ())
    val ex = loop.execute(weightsDf, previousAccountValue = Some(98000.0))

    assert(ex.canceledStale == 1)
    assert(ex.closed == Seq("R0"))
    // deltas frame order: desc by delta — R3 +25000, R4 +10000, R2 -2000
    assert(ex.placed == Seq(("R3", 25000.0), ("R4", 10000.0), ("R2", -2000.0)))
    assert(ex.allFilled)
    val fills = ex.fills.orderBy($"order_id").collect().map(r =>
      (r.getAs[String]("ticker"), r.getAs[String]("side"),
        r.getAs[Double]("filled_qty"), r.getAs[Double]("filled_avg_price"),
        r.getAs[Double]("notional"), r.getAs[Timestamp]("filled_at").toInstant.toString,
        r.getAs[Long]("order_id")))
    // two 60 s poll sleeps before the third poll fills ⇒ 15:02:00Z stamps
    val at = "2024-03-04T15:02:00Z"
    assert(fills.toSeq == Seq(
      ("R0", "sell", 200.0, 32.0, 6400.0, at, 2L),
      ("R3", "buy", 200.0, 125.0, 25000.0, at, 3L),
      ("R4", "buy", 25.0, 400.0, 10000.0, at, 4L),
      ("R2", "sell", 20.0, 100.0, 2000.0, at, 5L)))
    // the canceled stale order reached its terminal state and is NOT a fill
    assert(broker.closedOrders(new Timestamp(0), clock())
      .count(_.status == "canceled") == 1)
    // positions moved by exactly the submitted notionals
    assert(broker.positions().map(p => p.ticker -> p.marketValue).toMap ==
      Map("R2" -> 12500.0, "R3" -> 25000.0, "R4" -> 37500.0))
    org.json4s.jackson.JsonMethods.parse(ex.payload)
  }

  test("idempotent rerun: positions already at target place nothing new") {
    val (clock, sleep) = virtualClock("2024-03-04T15:00:00Z")
    val broker = mkBroker(clock, fillAfterPolls = 1)
    val loop = new TradingLoop(spark, broker, clock, sleep, log = _ => ())
    val first = loop.execute(weightsDf)
    assert(first.placed.nonEmpty && first.allFilled)
    val rerun = loop.execute(weightsDf)
    // no closes, no orders — deltas all under the $1 dust filter
    assert(rerun.canceledStale == 0)
    assert(rerun.closed.isEmpty && rerun.placed.isEmpty)
    // intraday rerun still REPORTS today's earlier executions (the
    // reference's get_todays_filled_orders is a day-window query)
    assert(rerun.fills.count() == first.fills.count())
    assert(rerun.allFilled) // empty book: true at elapsed 0
  }

  test("timeout path: orders stuck open return allFilled=false, no fills") {
    val (clock, sleep) = virtualClock("2024-03-04T15:00:00Z")
    val broker = mkBroker(clock, fillAfterPolls = Int.MaxValue)
    var sleeps = 0
    val loop = new TradingLoop(spark, broker, clock,
      sec => { sleeps += 1; sleep(sec) }, log = _ => ())
    val ex = loop.execute(weightsDf)
    assert(!ex.allFilled)
    assert(sleeps == 10) // max_wait 10 min / 60 s interval
    assert(ex.fills.count() == 0)
    assert(broker.openOrders().nonEmpty) // still open after timeout
    // no-trades summary branch
    assert(ex.payload.contains("No trades executed today"))
  }

  test("partial fill: open at timeout, canceled next run, fills keep executed part") {
    val (clock, sleep) = virtualClock("2024-03-04T15:00:00Z")
    val broker = mkBroker(clock, fillAfterPolls = Int.MaxValue)
    // yesterday's buy of $1000 of R2 @ 100: 40% executed on the first
    // poll, then the order sits open — the poll-timeout partial shape
    broker.stageOpenOrder("R2", 1000.0, "buy", countdown = 1,
      partialFraction = 0.4)
    // first poll executes the partial part and the order STAYS open
    assert(broker.openOrders().map(_.orderId).toSeq == Seq(1L))
    val partialAt = clock()
    assert(broker.positions().map(p => p.ticker -> p.marketValue)
      .toMap.apply("R2") == 14500.0 + 400.0)
    sleep(60)
    // while open it is not a closed order: no fill reported yet
    assert(broker.closedOrders(new Timestamp(0), clock()).isEmpty)
    // the next run's stale-order branch cancels it; the executed part and
    // its stamp survive on the terminal order
    broker.cancelAllOrders()
    val closed = broker.closedOrders(new Timestamp(0), clock())
    assert(closed.map(_.status) == Seq("canceled"))
    assert(closed.head.filledQty.contains(4.0)) // 400 / 100
    assert(closed.head.filledAt.contains(partialAt))
    // the fills extraction keeps it, filled_qty-WEIGHTED (the reference's
    // filled_at/filled_qty>0 guard, trading_flow.py:197-221): notional is
    // the $400 executed, never the $1000 submitted
    val fills = graft.trade.TradingDiff.extractFills(
      closed.toDF().select($"orderId".as("order_id"), $"ticker", $"side",
        $"filledQty".as("filled_qty"),
        $"filledAvgPrice".as("filled_avg_price"),
        $"filledAt".as("filled_at"))).collect()
    assert(fills.length == 1)
    assert(fills.head.getAs[Double]("filled_qty") == 4.0)
    assert(fills.head.getAs[Double]("notional") == 400.0)
    // a canceled NEVER-executed order still drops out entirely
    broker.stageOpenOrder("R9", 500.0, "buy")
    broker.cancelAllOrders()
    val closed2 = broker.closedOrders(new Timestamp(0), clock())
    assert(closed2.length == 2)
    val fills2 = graft.trade.TradingDiff.extractFills(
      closed2.toDF().select($"orderId".as("order_id"), $"ticker", $"side",
        $"filledQty".as("filled_qty"),
        $"filledAvgPrice".as("filled_avg_price"),
        $"filledAt".as("filled_at"))).collect()
    assert(fills2.length == 1)
  }

  test("canceled-partial outside the window is absent; never-executed canceled stays") {
    val (clock, sleep) = virtualClock("2024-03-04T15:00:00Z")
    val broker = mkBroker(clock, fillAfterPolls = Int.MaxValue)
    broker.stageOpenOrder("R2", 1000.0, "buy", countdown = 1,
      partialFraction = 0.4)
    broker.openOrders() // partial executes now, stamped at 15:00:00Z
    val partialAt = clock()
    broker.stageOpenOrder("R9", 500.0, "buy") // never executes
    broker.cancelAllOrders()
    sleep(3600)
    // window [partial stamp, now]: both canceled orders report — the
    // partial via its in-window stamp, the never-executed unconditionally
    assert(broker.closedOrders(partialAt, clock()).map(_.orderId).toSet ==
      Set(1L, 2L))
    // window opening AFTER the partial's stamp: the canceled-partial is
    // window-filtered out (its fill belongs to the window it executed
    // in); the stampless canceled order is still always reported
    val late = new Timestamp(partialAt.getTime + 1000L)
    assert(broker.closedOrders(late, clock()).map(_.orderId).toSeq ==
      Seq(2L))
  }

  test("failure payload golden: full context, reference f-string parity") {
    val got = SlackFailure.formatFlowFailure(
      flowName = "daily_flow",
      errorType = "RuntimeError",
      errorMessage = "No values found!",
      traceback = "Traceback (most recent call last):\n  boom",
      channel = "alerts",
      runId = Some("run-42"),
      parameters = Some("{'yesterday': '2024-03-04'}"))
    val expected =
      """{"channel": "alerts", "text": "🚨 Flow Failed: daily_flow", "blocks": [""" +
        """{"type": "header", "text": {"type": "plain_text", "text": "🚨 Flow Failed: daily_flow"}}, """ +
        """{"type": "section", "text": {"type": "mrkdwn", "text": "*Error Type:* `RuntimeError`\n*Error Message:* No values found!"}}, """ +
        """{"type": "section", "text": {"type": "mrkdwn", "text": "*Run ID:* `run-42`\n*Parameters:* `{'yesterday': '2024-03-04'}`"}}, """ +
        """{"type": "divider"}, """ +
        """{"type": "section", "text": {"type": "mrkdwn", "text": "*Traceback:*\n```Traceback (most recent call last):\n  boom```"}}]}"""
    assert(got == expected)
    org.json4s.jackson.JsonMethods.parse(got)
  }

  test("failure payload: truncation arithmetic and no-context shape") {
    val longTb = ("x" * 3000) + "END"
    val got = SlackFailure.formatFlowFailure("f", "E", "m", longTb, "c")
    // last 1950 chars + marker (slack_failure_handler.py:36-38)
    assert(got.contains(("x" * 1947) + "END\\n... (truncated)"))
    assert(!got.contains("x" * 1951))
    assert(!got.contains("Run ID")) // no context block without context
    val longParams = "p" * 300
    val withParams = SlackFailure.formatFlowFailure("f", "E", "m", "tb", "c",
      parameters = Some(longParams))
    assert(withParams.contains(("p" * 197) + "..."))
    assert(!withParams.contains("p" * 198))
    intercept[IllegalArgumentException] {
      SlackFailure.formatFlowFailure("f", "E", "m", "tb", "")
    }
  }

  test("fromThrowable carries JVM class name, message, stack trace") {
    val got = SlackFailure.fromThrowable("trading_daily_flow",
      new RuntimeException("Portfolio weights appear to not be empty!"),
      channel = "alerts")
    assert(got.contains("*Error Type:* `RuntimeException`"))
    assert(got.contains("Portfolio weights appear to not be empty!"))
    assert(got.contains("TradingLoopSpec")) // the raise site is in the trace
    org.json4s.jackson.JsonMethods.parse(got)
  }
}
