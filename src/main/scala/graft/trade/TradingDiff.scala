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
