package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Panel time-series operators (SURVEY.md §2.5 W1-W3, W6-W8, A4).
  *
  * Semantics replicate the reference exactly:
  *  - pct_change       pipelines/returns_flow.py:15-24
  *  - rolling_sum(n)   pipelines/reversal_flow.py:12-29
  *  - rolling_std(n)   pipelines/factor_model_flow.py:94-104
  *  - rolling beta     pipelines/betas_flow.py:14-56 (K=1 OLS closed form)
  *  - rolling covar    pipelines/factor_covariances_flow.py:10-29
  *  - panel z-score    pipelines/reversal_flow.py:33-43 (GLOBAL, not per-date)
  *  - equal weight 1/N pipelines/benchmark_flow.py:11-17
  *
  * Polars `rolling_*` emit null until the window holds `n` rows; Spark
  * `rowsBetween` emits partial aggregates — every rolling op here carries a
  * `count >= n` guard to match (SURVEY §7.4.3).
  *
  * Scale note: all of these are single-window-function passes — one shuffle
  * on the partition key, then a sorted streaming scan per partition. No
  * self-joins, no collects; safe at 100 TB provided the per-key series fits
  * a task (panel keys are entities — bounded).
  */
object TimeSeries {

  /** Ordered per-entity window; callers pass extra order columns for a
    * deterministic total order when timestamps can tie. */
  def entityWindow(entity: Seq[String], order: Seq[String]): WindowSpec =
    Window.partitionBy(entity.map(col): _*).orderBy(order.map(col): _*)

  private def trailing(w: WindowSpec, n: Int): WindowSpec =
    w.rowsBetween(-(n - 1), 0)

  /** W1: simple return vs the most-recent NON-NULL prior value — polars
    * pct_change semantics (returns_flow.py): an interior null price yields a
    * null return on the null row, and the next non-null row computes its
    * return against the last non-null price (not null). Null on the first
    * row per key. With a null-free series this is exactly x_t/x_{t-1} − 1. */
  def pctChange(x: Column, w: WindowSpec): Column =
    x / last(x, ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1)) - lit(1.0)

  /** Guard: expr only once the trailing window is full (Polars semantics). */
  private def whenFull(x: Column, w: WindowSpec, n: Int, expr: Column): Column =
    when(count(x).over(trailing(w, n)) >= n, expr)

  /** W2: trailing n-row sum, null until full. */
  def rollingSum(x: Column, w: WindowSpec, n: Int): Column =
    whenFull(x, w, n, sum(x).over(trailing(w, n)))

  /** Trailing n-row mean, null until full. */
  def rollingMean(x: Column, w: WindowSpec, n: Int): Column =
    whenFull(x, w, n, avg(x).over(trailing(w, n)))

  /** W3: trailing n-row sample std, null until full. */
  def rollingStd(x: Column, w: WindowSpec, n: Int): Column =
    whenFull(x, w, n, stddev_samp(x).over(trailing(w, n)))

  /** W7: trailing n-row sample covariance, null until full (pandas
    * rolling(n, min_periods=n).cov semantics). */
  def rollingCovar(x: Column, y: Column, w: WindowSpec, n: Int): Column =
    when(count(when(x.isNotNull && y.isNotNull, lit(1))).over(trailing(w, n)) >= n,
      covar_samp(x, y).over(trailing(w, n)))

  /** W6: trailing single-factor OLS beta = cov(x,b)/var(b) — the closed form
    * of RollingOLS with K=1 (betas_flow). */
  def rollingBeta(r: Column, b: Column, w: WindowSpec, n: Int): Column =
    when(count(when(r.isNotNull && b.isNotNull, lit(1))).over(trailing(w, n)) >= n,
      covar_samp(r, b).over(trailing(w, n)) / var_samp(b).over(trailing(w, n)))

  /** A4: GLOBAL panel z-score — one mean/std across the whole frame
    * (reference has no `.over`, deliberately). Empty-partition window keeps
    * it one pass without a collect. At scale this is a single all-reduce of
    * (sum, sum2, n) — cheap; the broadcast-back is handled by Spark's
    * window-without-partition fallback to a single partition, so for 100 TB
    * panels prefer [[zscoreGlobalAgg]]. */
  def zscoreGlobal(x: Column): Column = {
    val w = Window.partitionBy()
    (x - avg(x).over(w)) / stddev_samp(x).over(w)
  }

  /** Scale-safe global z-score: aggregate mean/std (2 numbers) then
    * cross-join them back — no single-partition window. */
  def zscoreGlobalAgg(df: DataFrame, xCol: String, outCol: String): DataFrame = {
    val stats = df.agg(
      avg(col(xCol)).as("__mu"), stddev_samp(col(xCol)).as("__sigma"))
    df.crossJoin(broadcast(stats))
      .withColumn(outCol, (col(xCol) - col("__mu")) / col("__sigma"))
      .drop("__mu", "__sigma")
  }

  /** W8/A6: cross-sectional equal weight 1/N per group. */
  def equalWeight(group: Seq[String]): Column =
    lit(1.0) / count(lit(1)).over(Window.partitionBy(group.map(col): _*))
}
