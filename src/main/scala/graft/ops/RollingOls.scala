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

  /** Normal equations over the window buffer in LOGICAL (oldest→newest)
    * order — `n` is the valid-row count AFTER the newest insertion, so the
    * oldest row sits at slot n % window. Logical order makes the float
    * summation independent of the circular offset, which is what lets the
    * chunked and unchunked paths below produce bitwise-identical fits. */
  private def fit(buf: Array[Array[Double]], n: Int, window: Int,
      p: Int): Array[Double] = {
    val xtx = Array.ofDim[Double](p, p)
    val xty = new Array[Double](p)
    var b = 0
    while (b < window) {
      val row = buf((n + b) % window)
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
    solve(xtx, xty)
  }

  /** Appends `const`, `b_<factor>`* and `residual` columns.
    *
    * SKEW BOUNDARY: with `chunkRows = 0` (default) parallelism is ACROSS
    * keys — one pathological entity (say 10M rows when peers hold 10k)
    * serializes its whole timeline onto one task, and [[graft.ops.Skew]]-
    * style salting cannot apply because an ordered per-key state machine
    * is not associative across random salt buckets (ScaleBench arg-12
    * records the balanced-vs-one-key cost; BASELINE.md r6).
    *
    * `chunkRows = C > 0` (opt-in) re-keys each entity's VALID timeline
    * into chunks of C rows keyed (key, chunk): each chunk is seeded with
    * the last window−1 valid rows of its predecessor (re-read overlap),
    * seeds prime the buffer but emit nothing, and the kernel then runs
    * per (key, chunk) — task size is C-bounded no matter how skewed the
    * panel, at the price of one per-key row_number window pass (cheap
    * relative to the O(window·p²)-per-row kernel it parallelizes) and
    * (window−1)/C overlap re-compute. Chunking is by VALID-row index, so
    * null-y/null-factor rows — which never enter the buffer — cannot
    * starve a chunk's seed span; they bypass the kernel with null outputs
    * exactly like the unchunked path. Output is BITWISE identical to
    * `chunkRows = 0` (RollingOlsSpec pins this; logical-order [[fit]] is
    * the enabling detail), only row order and partitioning differ.
    *
    * @param keys    entity key columns (series identity)
    * @param order   time ordering columns (must be a total order per key)
    * @param yCol    dependent variable
    * @param factorCols independent variables (intercept added internally)
    * @param window  exact window length (rows)
    * @param chunkRows 0 = one task per key; C ≥ window = C-bounded tasks.
    *   Chunking is for the LOW-key-count / skewed regime (few giant
    *   entities): its index pass collects + broadcasts a per-(partition,
    *   key) offset map (~#keys + #partitions entries), so a 10M-key panel
    *   with chunking on would build a 10M-entry driver map — there,
    *   per-key tasks (chunkRows = 0) are already balanced; keep the
    *   default.
    */
  def rollingOls(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[String],
      yCol: String,
      factorCols: Seq[String],
      window: Int,
      chunkRows: Int = 0): DataFrame = {
    if (chunkRows > 0) {
      require(chunkRows >= window,
        s"chunkRows ($chunkRows) must be ≥ window ($window)")
      return rollingOlsChunked(df, keys, order, yCol, factorCols, window, chunkRows)
    }
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
            coefs = fit(buf, n, window, p)
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

  /** Scalable per-key 0-based row index — `__vrn` — WITHOUT a
    * partitionBy(key) window (which would serialize a pathological key
    * onto one task, the exact failure the chunked path exists to avoid):
    * range-partition on (keys, order) — a PARALLEL sort that splits even
    * a single giant key across partitions — then assign indices in one
    * streaming pass primed with per-partition start offsets.
    *
    * The offsets need only O(#partitions) driver state, NEVER O(#keys):
    * the data is globally sorted by key, so the ONLY key that can
    * continue from partition p into p+1 is p's LAST key — every other
    * key in a partition starts fresh at index 0. Each partition
    * therefore reports just its first run's (key, count) and its last
    * run's (key, count) (one entry when the whole partition is a single
    * key), the driver threads a single (key, cumulative) accumulator
    * through them in partition order, and the broadcast is a
    * partition-id → first-key-offset map of at most #partitions longs.
    * Round 12 flagged the previous per-(partition, key) collect as a
    * driver bottleneck at 10M+-key panels; this form is byte-identical
    * (RollingOlsSpec pins chunked ≡ default bitwise) with driver state
    * independent of key cardinality. Both passes share one RDD lineage,
    * so the range shuffle + sort run once and the second job reuses the
    * shuffle files. */
  private def withValidRowIndex(
      df: DataFrame, keys: Seq[String], order: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val sortCols = (keys ++ order).map(col)
    val keyIdx = keys.map(df.schema.fieldIndex)
    val base = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*).rdd
    // boundary runs only: (first run key+count, last run key+count) per
    // non-empty partition — O(1) rows per partition regardless of how
    // many keys the partition holds
    val boundaries = base.mapPartitionsWithIndex { (pi, it) =>
      var firstKey: Seq[Any] = null
      var firstCnt = 0L
      var firstClosed = false
      var curKey: Seq[Any] = null
      var curCnt = 0L
      it.foreach { r =>
        val kk = keyIdx.map(r.get)
        if (curKey == null) { firstKey = kk; curKey = kk; curCnt = 1L }
        else if (kk == curKey) curCnt += 1L
        else {
          if (!firstClosed) { firstCnt = curCnt; firstClosed = true }
          curKey = kk; curCnt = 1L
        }
      }
      if (curKey == null) Iterator.empty
      else {
        if (!firstClosed) firstCnt = curCnt // single-run partition
        Iterator.single((pi, firstKey, firstCnt, curKey, curCnt))
      }
    }.collect()
    // thread ONE (last key, cumulative count) accumulator through the
    // partitions in order; emit a start offset only where a partition's
    // first key continues its predecessor's last
    val offsets = scala.collection.mutable.HashMap[Int, Long]()
    var prevLast: Seq[Any] = null
    var prevAccum = 0L
    boundaries.sortBy(_._1).foreach {
      case (pi, firstKey, firstCnt, lastKey, lastCnt) =>
        val start = if (firstKey == prevLast) prevAccum else 0L
        if (start != 0L) offsets.update(pi, start)
        prevAccum =
          if (firstKey == lastKey) start + firstCnt
          else lastCnt
        prevLast = lastKey
    }
    val bc = df.sparkSession.sparkContext.broadcast(offsets.toMap)
    val withIdx = base.mapPartitionsWithIndex { (pi, it) =>
      var cur: Seq[Any] = null
      var i = 0L
      var firstRun = true
      it.map { r =>
        val kk = keyIdx.map(r.get)
        if (kk != cur) {
          cur = kk
          i = if (firstRun) bc.value.getOrElse(pi, 0L) else 0L
          firstRun = false
        }
        val out = Row.fromSeq(r.toSeq :+ i)
        i += 1
        out
      }
    }
    df.sparkSession.createDataFrame(withIdx,
      StructType(df.schema.fields :+ StructField("__vrn", LongType, nullable = false)))
  }

  /** The chunked path (see [[rollingOls]] scaladoc). Valid rows get a
    * per-key row index via [[withValidRowIndex]], own-chunk assignment,
    * and a duplicated SEED copy into the next chunk for the last window−1
    * rows of each chunk; the kernel runs per (key, chunk) with seeds
    * priming the buffer silently. Invalid rows bypass the kernel with
    * null outputs. */
  private def rollingOlsChunked(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[String],
      yCol: String,
      factorCols: Seq[String],
      window: Int,
      chunkRows: Int): DataFrame = {
    import org.apache.spark.sql.functions.{array, explode, lit, pmod, struct, when}
    val k = factorCols.length
    val p = k + 1
    val extraFields =
      StructField("const", DoubleType, nullable = true) +:
        factorCols.map(f => StructField(s"b_$f", DoubleType, nullable = true)) :+
        StructField("residual", DoubleType, nullable = true)
    val outSchema = StructType(df.schema.fields ++ extraFields)
    val validPred = (col(yCol) +: factorCols.map(col))
      .map(_.isNotNull).reduce(_ && _)
    val cLong = chunkRows.toLong
    // single-pass routing via explode over the two-phase rank: a
    // partitionBy(key) row_number window would re-serialize the
    // pathological key (the exact task this path exists to break up), and
    // a union of own+seed branches would run the rank twice (measured
    // 2.3× vs balanced before this form; 1.6× after)
    val chunkOf = org.apache.spark.sql.functions.floor(col("__vrn") / lit(cLong))
    val isOverlap = pmod(col("__vrn"), lit(cLong)) >= lit(cLong - (window - 1))
    val routed = withValidRowIndex(df.filter(validPred), keys, order)
      .withColumn("__route", explode(when(isOverlap,
        array(struct(chunkOf.as("c"), lit(false).as("s")),
          struct((chunkOf + 1L).as("c"), lit(true).as("s"))))
        .otherwise(array(struct(chunkOf.as("c"), lit(false).as("s"))))))
      .withColumn("__chunk", col("__route.c"))
      .withColumn("__seed", col("__route.s"))
      .drop("__route", "__vrn")
    val nBase = df.schema.fields.length
    val chunkIdx = nBase
    val seedIdx = nBase + 1
    val keyIdx = keys.map(df.schema.fieldIndex)
    val yIdx = df.schema.fieldIndex(yCol)
    val fIdx = factorCols.map(df.schema.fieldIndex).toArray
    val sorted = routed
      .repartition((keys.map(col) :+ col("__chunk")): _*)
      .sortWithinPartitions((keys ++ Seq("__chunk") ++ order).map(col): _*)
    val kernelOut = sorted.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var buf: Array[Array[Double]] = null
      var n = 0
      rows.flatMap { r =>
        val key = keyIdx.map(r.get) :+ r.get(chunkIdx)
        if (key != curKey) { curKey = key; buf = Array.ofDim[Double](window, p + 1); n = 0 }
        // only valid rows are routed here — fill unconditionally
        val slot = buf(n % window)
        slot(0) = r.getDouble(yIdx)
        slot(1) = 1.0
        var j = 0
        while (j < k) { slot(2 + j) = r.getDouble(fIdx(j)); j += 1 }
        n += 1
        if (r.getBoolean(seedIdx)) None // seeds prime the buffer, emit nothing
        else {
          var coefs: Array[Double] = null
          var residual: Any = null
          if (n >= window) {
            coefs = fit(buf, n, window, p)
            var yhat = coefs(0)
            j = 0
            while (j < k) { yhat += coefs(1 + j) * slot(2 + j); j += 1 }
            residual = slot(0) - yhat
          }
          val extra: Seq[Any] =
            if (coefs == null) Seq.fill[Any](p + 1)(null)
            else coefs.toIndexedSeq :+ residual
          Some(Row.fromSeq(r.toSeq.dropRight(2) ++ extra))
        }
      }
    }(Encoders.row(outSchema))
    val invalidOut = df.filter(!validPred).select(
      (df.columns.map(col) ++
        extraFields.map(f => lit(null).cast(DoubleType).as(f.name))): _*)
    kernelOut.unionAll(invalidOut)
  }
}
