package graft.trade

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.CoreOps

/** The relational half of the trading flow (SURVEY.md §2.9,
  * /root/reference/pipelines/trading_flow.py:23-86): target notionals from
  * weights, positions-to-close, and the full-outer notional diff with the
  * $1 dust filter. Brokerage I/O stays outside the engine (fixtures).
  */
object TradingDiff {

  /** trading_flow.py:23-30: clip negative weights, scale by account value,
    * round to cents. */
  def targetNotionals(weights: DataFrame, accountValue: Double): DataFrame = {
    val s = weights.sparkSession
    import s.implicits._
    weights
      .withColumn("weight", CoreOps.clipLower($"weight", 0.0))
      .select($"ticker",
        round($"weight" * lit(accountValue), 2).as("target_notional"))
      .orderBy($"target_notional".desc, $"ticker")
  }

  /** trading_flow.py:75-86: held positions whose target is ≤ 0. */
  def positionsToClose(
      targetNotionals: DataFrame, currentNotionals: DataFrame): DataFrame = {
    val s = targetNotionals.sparkSession
    import s.implicits._
    targetNotionals.filter($"target_notional" <= 0)
      .join(currentNotionals.select($"ticker"), Seq("ticker"), "left_semi")
      .select($"ticker").distinct().orderBy($"ticker")
  }

  /** trading_flow.py:173-221 (and utils/alpaca.py:8-45): normalize a staged
    * raw brokerage-orders frame into the fills frame. Keeps only orders
    * that actually filled — `filled_at` present and `filled_qty > 0` — and
    * replicates the reference's null handling exactly: a missing fill
    * price yields price 0 AND notional 0 (not qty·null).
    *
    * Input columns: (order_id, ticker, side, filled_qty, filled_avg_price,
    * filled_at). Extra columns pass through the filter but are dropped by
    * the projection, mirroring the reference's dict construction. */
  def extractFills(orders: DataFrame): DataFrame = {
    val s = orders.sparkSession
    import s.implicits._
    orders
      .filter($"filled_at".isNotNull && $"filled_qty".isNotNull && $"filled_qty" > 0)
      .select($"ticker", $"side", $"filled_qty".cast("double").as("filled_qty"),
        coalesce($"filled_avg_price".cast("double"), lit(0.0)).as("filled_avg_price"),
        when($"filled_avg_price".isNull, lit(0.0))
          .otherwise($"filled_qty" * $"filled_avg_price").as("notional"),
        $"filled_at", $"order_id")
  }

  /** slack_daily_summary.py:27-43 `categorize_trades`: top-n trades per
    * side by notional (reference takes 3). Ties broken by order_id so the
    * ranking is deterministic under any partitioning. */
  def topTrades(fills: DataFrame, n: Int = 3): DataFrame =
    rankedBySide(fills, n)
      .select(col("side"), col("rank"), col("ticker"), col("notional"))
      .orderBy(col("side"), col("rank"))

  /** [[topTrades]] with the qty/price detail the Slack trade lines render
    * (slack_daily_summary.py:146-177) — same ranking, wider projection. */
  def topTradeDetails(fills: DataFrame, n: Int = 3): DataFrame =
    rankedBySide(fills, n)
      .select(col("side"), col("rank"), col("ticker"), col("filled_qty"),
        col("filled_avg_price"), col("notional"))
      .orderBy(col("side"), col("rank"))

  private def rankedBySide(fills: DataFrame, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("side")).orderBy(col("notional").desc, col("order_id"))
    fills.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
  }

  /** slack_daily_summary.py:38-43: buy/sell/total notional sums. Python's
    * `sum([])` is 0, so an empty fills frame yields a single all-zero row. */
  def notionalTotals(fills: DataFrame): DataFrame = {
    val s = fills.sparkSession
    import s.implicits._
    fills.agg(
      coalesce(sum(when($"side" === "buy", $"notional").otherwise(lit(0.0))), lit(0.0))
        .as("total_buys_notional"),
      coalesce(sum(when($"side" === "sell", $"notional").otherwise(lit(0.0))), lit(0.0))
        .as("total_sells_notional"),
      coalesce(sum($"notional"), lit(0.0)).as("total_notional"))
  }

  /** slack_daily_summary.py:86-120 relational spine, composed: the one-row
    * stats frame the Slack message renders — trade counts per side, the
    * notional totals, open-position count, and day P&L vs the previous
    * account value (null fields when no previous value exists, mirroring
    * the reference's branch). Message formatting itself stays
    * out-of-engine (SURVEY §2.1); this is everything relational behind it.
    * All inputs are single-row aggregates — the cross joins are trivial. */
  def dailySummaryStats(
      fills: DataFrame, positions: DataFrame,
      accountValue: Double,
      previousAccountValue: Option[Double] = None): DataFrame = {
    val s = fills.sparkSession
    import s.implicits._
    val counts = fills.agg(
      count(lit(1)).as("n_trades"),
      coalesce(sum(when($"side" === "buy", 1L).otherwise(0L)), lit(0L)).as("n_buys"),
      coalesce(sum(when($"side" === "sell", 1L).otherwise(0L)), lit(0L)).as("n_sells"))
    val nPos = currentPositions(positions).agg(count(lit(1)).as("n_positions"))
    // a zero previous value is "no previous" (the reference's Python
    // truthiness does the same) — never a division by zero
    val prev = previousAccountValue.filter(_ != 0.0)
    val dayPnl = prev
      .map(p => lit(accountValue - p)).getOrElse(lit(null).cast("double"))
    val dayPnlPct = prev
      .map(p => lit((accountValue - p) / p * 100)).getOrElse(lit(null).cast("double"))
    counts.crossJoin(notionalTotals(fills)).crossJoin(nPos)
      .withColumn("account_value", lit(accountValue))
      .withColumn("day_pnl", dayPnl)
      .withColumn("day_pnl_pct", dayPnlPct)
  }

  /** slack_daily_summary.py:10-25 `get_current_positions`: null market
    * values → 0, sorted by value descending. */
  def currentPositions(positions: DataFrame): DataFrame = {
    val s = positions.sparkSession
    import s.implicits._
    positions.select($"ticker", coalesce($"value".cast("double"), lit(0.0)).as("value"))
      .orderBy($"value".desc, $"ticker")
  }

  /** trading_flow.py:47-72: full outer join on ticker (key coalesced),
    * null→0, delta rounded to cents, |delta| ≥ $1 dust filter, close-list
    * exclusion (anti join). */
  def notionalDeltas(
      targetNotionals: DataFrame,
      currentNotionals: DataFrame,
      positionsToClose: DataFrame): DataFrame = {
    val s = targetNotionals.sparkSession
    import s.implicits._
    CoreOps.fullOuterDiff(targetNotionals, currentNotionals, Seq("ticker"),
        Seq("target_notional", "current_notional"))
      .select($"ticker",
        round($"target_notional" - $"current_notional", 2).as("notional_delta"))
      .filter(abs($"notional_delta") >= 1.0)
      .join(positionsToClose, Seq("ticker"), "left_anti")
      .orderBy($"notional_delta".desc, $"ticker")
  }
}
