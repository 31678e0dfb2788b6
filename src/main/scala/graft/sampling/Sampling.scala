package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shaping for training-data pipelines: stratified
  * downsampling and fixed-token-budget sequence packing. Both are pure
  * row-local / single-window constructions — no shuffle beyond what the
  * semantics require, and every decision is a function of content ids, so
  * reruns, engine swaps, and repartitions all reproduce the same dataset.
  */
object Sampling {

  /** 4-hex-digit keep-threshold for a fraction (resolution 1/65536). A
    * fraction ≥ 1 maps past every hex bucket ('z' > 'f' lexicographically)
    * so the stratum passes whole. */
  private def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0, s"negative sampling fraction: $fraction")
    val bucket = math.round(fraction * 65536).toInt
    // fractions within 1/131072 of 1.0 round to 65536, which %04x would
    // format as the FIVE-char "10000" — lexicographically BELOW most
    // 4-char buckets, collapsing a keep-nearly-all stratum to ~6%. Treat
    // them as pass-whole alongside fraction >= 1.
    if (bucket >= 65536) "zzzz" else f"$bucket%04x"
  }

  /** Deterministic stratified sample: keep a row iff the first 4 hex chars
    * of md5(id) fall under its stratum's threshold — the same
    * content-hash-bucket device as [[graft.functions.TextFunctions
    * .deterministicSplit]], so the sample is independent of engine,
    * partitioning, and run order (and value-oracle-able). Typical use:
    * rebalance a web corpus by language/source before training.
    *
    * @param fractions keep-fraction per stratum value; strata absent from
    *                  the map use `defaultFraction`
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double): DataFrame = {
    val bucket = substring(md5(col(idCol).cast("string")), 1, 4)
    val threshold = fractions.foldLeft(lit(hexThreshold(defaultFraction)): Column) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Concatenate-and-slice sequence packing: documents are laid end-to-end
    * in a deterministic order (idCol asc within each partition group) and
    * the token stream is sliced into fixed `budgetTokens` windows; `bin` is
    * the window a document STARTS in (floor of its exclusive running token
    * count / budget). This is the standard GPT-style packing layout —
    * contiguous, reproducible, no bin-packing search — and the assignment
    * is one window pass.
    *
    * Scale: the window sorts within `partitionCols` groups only. At corpus
    * scale pass a shard column (e.g. `pmod(xxhash64(id), nShards)`) as an
    * extra partition col — packing is embarrassingly shardable and no
    * global sort ever happens.
    */
  def packSequences(
      df: DataFrame, idCol: String, tokensCol: Column,
      budgetTokens: Int, partitionCols: Seq[String]): DataFrame = {
    require(budgetTokens > 0, "token budget must be positive")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(idCol).asc)
    val cumBefore = coalesce(
      sum(tokensCol).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    df.withColumn("n_tokens", tokensCol)
      .withColumn("bin", floor(cumBefore / lit(budgetTokens.toDouble)))
  }

  /** Materialize the [[packSequences]] assignment into the dataloader-
    * facing artifact: one row per (partition group, bin) holding the
    * member documents CONCATENATED in id order with `sep` between them
    * (the end-of-document marker a GPT-style loader splits on), plus the
    * doc/token accounting. One window pass (the assignment) + one hash
    * aggregate per bin; the collect_list sorts row-locally by the struct's
    * leading id field, so the sequence bytes are deterministic under any
    * partitioning.
    *
    * Separator contract: `sep` must not occur inside document text — a
    * loader splitting on it would fracture such a doc. Normalize or
    * strip the marker upstream (normalizeText + a replace) where the
    * corpus can't be trusted; this op concatenates verbatim.
    *
    * @return partitionCols + (bin, n_docs, total_tokens, sequence)
    */
  def materializePacked(
      df: DataFrame, idCol: String, textCol: String, tokensCol: Column,
      budgetTokens: Int, partitionCols: Seq[String],
      sep: String = "<|eod|>"): DataFrame = {
    val packed = packSequences(df, idCol, tokensCol, budgetTokens, partitionCols)
    packed.groupBy((partitionCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(textCol)), sep).as("sequence"))
  }

  /** Temperature-scaled domain mixture weights — the multilingual/multi-
    * source sampling recipe (w_i ∝ p_i^α, α < 1 upweights small domains)
    * used to set per-domain sampling rates before training. Emits each
    * domain's token share p, its normalized mixture weight w, and the
    * boost w/p (the up/down-sampling factor a sampler must apply).
    *
    * Scale shape: one hash aggregate collapses the corpus to a
    * domain-sized relation; the two normalizing totals (token sum, Σp^α)
    * are 1-row broadcasts over that relation — the corpus is read once,
    * everything after is O(domains).
    *
    * @return (domain, n_tokens, p, weight, boost), 6dp, one row per
    *         domain. A domain whose token sum is 0 (or all-null) has
    *         p = 0 and no meaningful boost (nothing to upsample); its
    *         boost is NULL by an explicit guard rather than whatever a
    *         0/0 evaluates to in a given engine — the one edge where
    *         Spark and the SQL oracle could otherwise diverge.
    */
  /** Deterministic EXACT-k sample per stratum: the first k rows of each
    * stratum in md5(id) order — the fixed-SIZE companion to
    * [[stratifiedSample]]'s fixed-FRACTION keep (eval sets, calibration
    * subsets, and human-review queues want exactly k per language/source,
    * not a fraction). Same hash-order device, so the chosen set is
    * engine-, partition-, and run-independent, and stable under corpus
    * APPENDS ONLY to the extent the md5 prefix is: a new doc hashing
    * into the top-k evicts the old rank-k doc (document and re-freeze
    * eval sets by content, not by re-sampling, where that matters).
    * One window pass per stratum; no global sort.
    *
    * @return input columns + `sample_rank` (1..k within the stratum)
    */
  def topKSample(df: DataFrame, idCol: String, stratumCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Materialize a domain mixture under a TOTAL token budget — the final
    * step after [[domainMixtureWeights]]: each domain gets
    * floor(weight × budget) tokens and fills the allocation with its
    * documents in deterministic md5(id) order (the [[stratifiedSample]]
    * hash device — engine-, partition-, and run-independent). A doc is
    * kept iff its EXCLUSIVE running token sum within the domain is still
    * below the allocation, so the doc crossing the boundary is the last
    * kept (greedy fill; overshoot bounded by one document — the standard
    * corpus-mixture materialization).
    *
    * Determinism across engines: the weight is the 6dp-rounded mixture
    * weight, the allocation one double multiply + floor, the fill
    * decision an integer-vs-double compare on an md5-ordered cumulative
    * sum — every piece replays bit-exactly in SQL.
    *
    * Scale shape: one corpus pass collapses to the O(domains) weight
    * relation ([[domainMixtureWeights]]); the fill's running sum is
    * two-level — within-(domain, md5-prefix-shard) windows at 256×
    * domain parallelism plus broadcast per-shard offsets — because the
    * md5 hex order makes its 2-char prefix an order-preserving shard
    * (a plain per-domain window would serialize each domain into one
    * task). No global sort anywhere.
    *
    * @return (domain, doc id, n_tokens, cum_tokens) for kept docs —
    *         cum_tokens is the domain's running total INCLUDING the doc
    */
  def budgetSample(
      df: DataFrame, idCol: String, domainCol: String, tokensCol: Column,
      totalBudget: Long, alpha: Double = 0.5): DataFrame = {
    require(totalBudget > 0, s"token budget must be positive: $totalBudget")
    val alloc = domainMixtureWeights(df, domainCol, tokensCol, alpha)
      .select(col("domain").as(domainCol),
        floor(col("weight") * lit(totalBudget.toDouble)).as("__alloc"))
    // TWO-LEVEL cumsum: a plain per-domain window serializes each domain
    // into one task (parallelism = #domains — a handful, at 100 TB the
    // bottleneck). The md5 order is lexicographic on hex, so its first
    // two chars are an ORDER-PRESERVING 256-way shard: within-shard
    // windows run 256× wider, per-(domain, shard) token totals prefix-sum
    // over a domains×256 relation, and the broadcast offset restores the
    // exact global running sum (integer arithmetic — bit-identical to
    // the single-window form; the spec pins equality).
    val md5c = md5(col(idCol).cast("string"))
    val staged = df.withColumn("n_tokens", tokensCol)
      .withColumn("__md5", md5c)
      .withColumn("__shard", substring(col("__md5"), 1, 2))
    val shardTotals = staged.groupBy(col(domainCol), col("__shard"))
      .agg(sum(col("n_tokens")).as("__stot"))
    val wOff = Window.partitionBy(col(domainCol)).orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = shardTotals
      .withColumn("__off", coalesce(sum(col("__stot")).over(wOff), lit(0L)))
      .select(col(domainCol), col("__shard"), col("__off"))
    val wIn = Window.partitionBy(col(domainCol), col("__shard"))
      .orderBy(col("__md5"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    staged
      .withColumn("__cum_in", coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .join(broadcast(offsets), Seq(domainCol, "__shard"))
      .withColumn("__cum_before", col("__off") + col("__cum_in"))
      .join(broadcast(alloc), Seq(domainCol))
      .filter(col("__cum_before") < col("__alloc"))
      .select(col(domainCol).as("domain"), col(idCol), col("n_tokens"),
        (col("__cum_before") + col("n_tokens")).as("cum_tokens"))
  }

  def domainMixtureWeights(
      df: DataFrame, domainCol: String, tokensCol: Column,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val dom = df.groupBy(col(domainCol).as("domain"))
      .agg(sum(tokensCol).as("n_tokens"))
    val withP = dom
      .crossJoin(broadcast(dom.agg(sum(col("n_tokens")).as("tot"))))
      .withColumn("p", col("n_tokens").cast("double") / col("tot").cast("double"))
      .withColumn("pa", pow(col("p"), lit(alpha)))
    withP.crossJoin(broadcast(withP.agg(sum(col("pa")).as("z"))))
      .select(col("domain"), col("n_tokens"),
        round(col("p"), 6).as("p"),
        round(col("pa") / col("z"), 6).as("weight"),
        when(col("p") > 0,
          round(col("pa") / col("z") / col("p"), 6)).as("boost"))
  }
}
