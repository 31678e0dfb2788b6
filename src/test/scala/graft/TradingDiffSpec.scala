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
}
