package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Exponentially-weighted mean with Polars `ewm_mean(half_life=h)` semantics
  * (adjust=True, ignore_nulls=False, min_periods=1) — the reference smooths
  * factor loadings, covariances, idio vol and betas with this
  * (pipelines/factor_model_flow.py:86-88, factor_covariances_flow.py:42-44,
  * betas_flow.py:68-72).
  *
  * Definition (adjusted): y_t = Σ_{i=0..t} (1-α)^i x_{t-i} / Σ (1-α)^i with
  * α = 1 − 2^(−1/h).
  *
  * Two implementations:
  *
  *  1. [[ewmMean]] — closed-form via plain window functions. With
  *     w = 1−α and rn the 0-based row number per key:
  *       y_t = cumsum(x·w^(−rn)) / cumsum(w^(−rn))
  *     (the w^(rn_t) factor cancels between numerator and denominator).
  *     Pure built-ins → whole-stage codegen, composes with any WindowSpec.
  *     Bound: w^(−rn) overflows double at rn ≳ 1023·h rows per key
  *     (h=60 → ~61k rows/key — plenty for daily panels, not for ticks).
  *
  *  2. [[ewmMeanStable]] — O(1)-state streaming recurrence
  *     (num_t = x_t + w·num_{t-1}; den_t = 1 + w·den_{t-1}) over
  *     repartition+sortWithinPartitions+mapPartitions. No length bound, no
  *     per-group materialization — the scale path for unbounded series.
  *
  * Nulls (ignore_nulls=False): a null x contributes nothing but its slot
  * still decays the older weights; the emitted value at a null row repeats
  * the running mean — both forms implement this identically.
  */
object Ewm {

  def alpha(halfLife: Double): Double = 1.0 - math.pow(2.0, -1.0 / halfLife)

  /** Closed-form EWM over a window spec. `w` must be partitioned by the
    * series key and ordered by event time (deterministic total order). */
  def ewmMean(x: Column, w: WindowSpec, halfLife: Double): Column = {
    val decay = 1.0 - alpha(halfLife) // = 2^(-1/h)
    val cum = w.rowsBetween(Long.MinValue, 0)
    // 0-based row index per key — row_number is over the same spec.
    val rn = row_number().over(w) - lit(1)
    val invW = pow(lit(decay), -rn.cast(DoubleType))
    val num = sum(when(x.isNotNull, x * invW).otherwise(lit(0.0))).over(cum)
    val den = sum(when(x.isNotNull, invW).otherwise(lit(0.0))).over(cum)
    when(den > 0.0, num / den)
  }

  /** Stable streaming EWM: appends `outCol` to `df`. One shuffle on `keys`,
    * then a sorted streaming pass per partition — constant memory per task
    * regardless of series length. */
  def ewmMeanStable(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[String],
      valueCol: String,
      halfLife: Double,
      outCol: String): DataFrame = {
    val decay = 1.0 - alpha(halfLife)
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, DoubleType, nullable = true))
    val keyIdx = keys.map(df.schema.fieldIndex)
    val valIdx = df.schema.fieldIndex(valueCol)
    val sorted = df
      .repartition(keys.map(col): _*)
      .sortWithinPartitions((keys ++ order).map(col): _*)
    sorted.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var num = 0.0
      var den = 0.0
      rows.map { r =>
        val k = keyIdx.map(r.get)
        if (k != curKey) { curKey = k; num = 0.0; den = 0.0 }
        num *= decay
        den *= decay
        if (!r.isNullAt(valIdx)) {
          num += r.getDouble(valIdx)
          den += 1.0
        }
        val out: Any = if (den > 0.0) num / den else null
        Row.fromSeq(r.toSeq :+ out)
      }
    }(Encoders.row(outSchema))
  }
}
