package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational helpers (SURVEY.md §2.2 P1-P21, §2.3 J1-J8, §2.7 R1-R6).
  *
  * All operators are pure `DataFrame => DataFrame` / `Column`-builder
  * functions so Catalyst sees one declarative plan: filters and projections
  * push to the parquet scan, small join sides broadcast, and everything
  * stays inside whole-stage codegen.
  *
  * Reference behaviors re-expressed (citations are to /root/reference):
  *  - clip(lower=0)                pipelines/trading_flow.py:26
  *  - horizontal sum of products   pipelines/factor_model_flow.py:62-66
  *  - value remap (dict replace)   pipelines/factor_model_flow.py:83-85
  *  - full-join key coalesce       pipelines/trading_flow.py:53-59
  */
object CoreOps {

  /** clip(lower_bound) — reference `pl.col(...).clip(lower_bound=0)`. */
  def clipLower(c: Column, lower: Double): Column = greatest(c, lit(lower))

  /** Residual-style horizontal sum: value - sum(pairs of products).
    * Reference: r - alpha - sum_k beta_k * f_k. */
  def horizontalDot(pairs: Seq[(Column, Column)]): Column =
    pairs.map { case (a, b) => a * b }.reduce(_ + _)

  /** Dict-style value remap with passthrough for unmapped keys
    * (reference `pl.col("factor").replace(mapping)`). */
  def remap(c: Column, mapping: Map[String, String]): Column =
    mapping.foldLeft(c) { case (acc, (from, to)) =>
      when(c === lit(from), lit(to)).otherwise(acc)
    }

  /** Polars-style pct_change over an ordered per-key window is in
    * TimeSeries; here the generic lag ratio. */

  /** Full outer join on keys with Spark-native key coalescing (J4).
    * Spark's `Seq(keys)` join already coalesces the key columns, matching
    * the reference's max_horizontal coalesce. Null measures -> 0.0. */
  def fullOuterDiff(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      fillZero: Seq[String]): DataFrame =
    left.join(right, keys, "full").na.fill(0.0, fillZero)

  /** Pivot long->wide with an explicit, deterministic value list (R3).
    * Explicit values keep the plan single-pass (no distinct-collect job). */
  def pivotWide(
      df: DataFrame,
      index: String,
      on: String,
      values: Seq[String],
      measure: Column): DataFrame =
    df.groupBy(col(index)).pivot(on, values).agg(measure)

  /** Unpivot wide->long (R4) via the built-in melt/unpivot. */
  def unpivotLong(
      df: DataFrame,
      ids: Seq[String],
      valueCols: Seq[String],
      varName: String,
      valName: String): DataFrame =
    df.unpivot(ids.map(col).toArray, valueCols.map(col).toArray, varName, valName)

  /** Union-all of same-schema frames by column name (R1). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  /** Exact decimal sum of a fixed-point-grid double column, returned as
    * double. Summing doubles is order-dependent across partitions; routing
    * through DecimalType makes the aggregate exact and therefore
    * deterministic for any partitioning — the bit pattern matches any other
    * engine doing exact decimal arithmetic. Use for money-grid measures. */
  def decimalSum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)
}
