package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Rolling multi-factor OLS (SURVEY.md §2.5 W5): per entity, an exact
  * ordinary-least-squares fit over a trailing `window`-row buffer of
  * (y, factors), emitting intercept, one loading per factor, and the
  * residual y − ŷ for each row once the window is full.
  *
  * Replicates statsmodels `RollingOLS(y, add_constant(X), window).fit()`
  * as used at /root/reference/pipelines/factor_model_flow.py:42-56: exact
  * per-window normal equations (recomputed per row from a circular buffer —
  * no incremental rank-update drift, SURVEY §7.4.2), null params until the
  * window holds `window` valid rows. Rows with a null y or factor are
  * excluded from the buffer and get null outputs (reference drops nulls
  * before fitting).
  *
  * Execution: one shuffle (repartition by key) + sorted streaming pass —
  * memory per task is O(window·K), independent of series length. This is
  * the idiomatic Spark shape for a per-key ordered state machine; it
  * parallelizes across entities, which is the natural axis (500-500k keys).
  */
object RollingOls {

  /** Solve A x = b for symmetric positive-definite A (normal equations)
    * via Gaussian elimination with partial pivoting. Deterministic, exact
    * ordering — K+1 ≤ ~10 so cost is negligible. */
  private[graft] def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i) :+ b(i)) // augmented
    var i = 0
    while (i < n) {
      var p = i
      var j = i + 1
      while (j < n) { if (math.abs(m(j)(i)) > math.abs(m(p)(i))) p = j; j += 1 }
      val t = m(i); m(i) = m(p); m(p) = t
      val piv = m(i)(i)
      j = i + 1
      while (j < n) {
        val f = m(j)(i) / piv
        var k = i
        while (k <= n) { m(j)(k) -= f * m(i)(k); k += 1 }
        j += 1
      }
      i += 1
    }
    val x = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = m(i)(n)
      var k = i + 1
      while (k < n) { s -= m(i)(k) * x(k); k += 1 }
      x(i) = s / m(i)(i)
      i -= 1
    }
    x
  }

  /** Appends `const`, `b_<factor>`* and `residual` columns.
    *
    * SKEW BOUNDARY: parallelism is ACROSS keys — one pathological entity
    * (say 10M rows when peers hold 10k) serializes its whole timeline onto
    * one task, and [[graft.ops.Skew]]-style salting cannot apply because an
    * ordered per-key state machine is not associative across random salt
    * buckets (ScaleBench arg-12 records the balanced-vs-one-key cost;
    * BASELINE.md r6). Mitigations when a real panel has such an entity:
    * (a) interval re-keying — split the key's timeline into chunks of
    * C ≥ window rows keyed (key, chunk), overlap each chunk with the last
    * window−1 rows of its predecessor, and drop each chunk's first
    * window−1 outputs: identical results, C-bounded tasks, at the cost of
    * re-reading the overlap; or (b) a rank-update kernel (O(p²) sliding
    * XtX update instead of the O(window·p²) rebuild) to cut the constant —
    * (a) changes the partitioning contract, (b) the kernel, so neither is
    * default here.
    *
    * @param keys    entity key columns (series identity)
    * @param order   time ordering columns (must be a total order per key)
    * @param yCol    dependent variable
    * @param factorCols independent variables (intercept added internally)
    * @param window  exact window length (rows)
    */
  def rollingOls(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[String],
      yCol: String,
      factorCols: Seq[String],
      window: Int): DataFrame = {
    val k = factorCols.length
    val p = k + 1 // + intercept
    val outSchema = StructType(df.schema.fields ++
      (StructField("const", DoubleType, nullable = true) +:
        factorCols.map(f => StructField(s"b_$f", DoubleType, nullable = true)) :+
        StructField("residual", DoubleType, nullable = true)))
    val keyIdx = keys.map(df.schema.fieldIndex)
    val yIdx = df.schema.fieldIndex(yCol)
    val fIdx = factorCols.map(df.schema.fieldIndex).toArray
    val sorted = df
      .repartition(keys.map(col): _*)
      .sortWithinPartitions((keys ++ order).map(col): _*)
    sorted.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      // circular buffer of valid (y, x[p]) rows
      var buf: Array[Array[Double]] = null
      var n = 0 // valid rows seen for current key
      rows.map { r =>
        val key = keyIdx.map(r.get)
        if (key != curKey) { curKey = key; buf = Array.ofDim[Double](window, p + 1); n = 0 }
        val valid = !r.isNullAt(yIdx) && fIdx.forall(!r.isNullAt(_))
        var coefs: Array[Double] = null
        var residual: Any = null
        if (valid) {
          val slot = buf(n % window)
          slot(0) = r.getDouble(yIdx)
          slot(1) = 1.0
          var j = 0
          while (j < k) { slot(2 + j) = r.getDouble(fIdx(j)); j += 1 }
          n += 1
          if (n >= window) {
            // normal equations over the buffer: XtX (p x p), Xty (p)
            val xtx = Array.ofDim[Double](p, p)
            val xty = new Array[Double](p)
            var b = 0
            while (b < window) {
              val row = buf(b)
              var i = 0
              while (i < p) {
                val xi = row(1 + i)
                xty(i) += xi * row(0)
                var jj = i
                while (jj < p) { xtx(i)(jj) += xi * row(1 + jj); jj += 1 }
                i += 1
              }
              b += 1
            }
            var i = 0
            while (i < p) { var jj = 0; while (jj < i) { xtx(i)(jj) = xtx(jj)(i); jj += 1 }; i += 1 }
            coefs = solve(xtx, xty)
            var yhat = coefs(0)
            j = 0
            while (j < k) { yhat += coefs(1 + j) * slot(2 + j); j += 1 }
            residual = slot(0) - yhat
          }
        }
        val extra: Seq[Any] =
          if (coefs == null) Seq.fill[Any](p + 1)(null)
          else coefs.toIndexedSeq :+ residual
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(Encoders.row(outSchema))
  }
}
