package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Data Selection via Importance Resampling (DSIR) — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"
  * (NeurIPS 2023): select pretraining documents from a large raw pool
  * by how much more likely their hashed n-gram features are under a
  * small TARGET (in-domain) sample than under the raw pool itself.
  *
  * The published construction, re-expressed relationally:
  *
  *   1. '''features''': word unigrams + bigrams, hashed into a fixed
  *      bucket space (the paper's 10k hashed buckets; here `16^hexChars`
  *      md5-prefix buckets — the md5 device every engine replays
  *      bit-identically, proven by the budget-sample oracle family).
  *   2. '''bag-of-buckets model''': bucket occurrence distributions
  *      under raw and target, add-one smoothed over the FULL bucket
  *      space B: p(b) = (c_b + 1) / (N + B).
  *   3. '''importance weight''': per raw doc,
  *      log w = Σ_features [ln p_target(b) − ln p_raw(b)].
  *   4. '''resample''': keep the top-k raw docs by weight (the
  *      deterministic variant; the paper's Gumbel-top-k equals it as
  *      temperature → 0 and adds seeded noise otherwise — see
  *      [[resampleGumbel]]).
  *
  * Scale shape (the 100 TB story): the model is TWO corpus passes that
  * each collapse to a ≤ 16^hexChars-row bucket relation (hash aggregate
  * with map-side combine — never a shuffle of the corpus), the weight
  * pass is one explode + ONE BROADCAST JOIN against that tiny model +
  * a per-doc hash aggregate, and top-k selection is
  * TakeOrderedAndProject (per-partition heaps + driver merge of k rows
  * — no global sort, no window). Nothing materializes the corpus twice;
  * nothing is quadratic.
  *
  * Determinism across engines: buckets are md5-prefix STRINGS (no
  * hex→int conversion to disagree on), counts are exact integers, the
  * only float is the final Σ of log-ratios, rounded 6dp on both sides
  * (the x51 discipline — each term is O(1), a ~10³-term sum carries
  * ~1e−13 cross-engine noise against a 1e−6 grid). Ranking ties break
  * on doc id.
  *
  * Reference has no corpus-selection surface (pandas/Polars price
  * pipelines); this is beyond-parity LLM-pipeline infrastructure, the
  * [[Sampling]] family's in-domain counterpart to
  * [[Sampling.domainMixtureWeights]]'s cross-domain mixing.
  */
object Dsir {

  /** (id, bucket) feature rows: one row per unigram and bigram
    * occurrence, bucketed by the first `hexChars` chars of the feature's
    * md5 (16^hexChars buckets). Zero-token docs contribute no rows —
    * [[importanceWeights]] restores them at weight 0 (an empty feature
    * product). Word boundary is the engine-wide \S+ pre-tokenization
    * ([[TextFunctions.tokens]]). */
  /** Unigrams ++ bigrams from an already-materialized token-array
    * column — the ONE feature construction every DSIR surface shares
    * (batch fit, batch scoring, and the row-local streaming scorer
    * agree by construction, not by parallel maintenance). */
  private def featureArray(tk: Column): Column = {
    val bigrams = zip_with(
      slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
      slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    concat(tk, bigrams)
  }

  def featureBuckets(df: DataFrame, idCol: String, textCol: String,
      hexChars: Int = 3): DataFrame = {
    // 6 is the honest ceiling the implementation can serve, not a style
    // choice: the count relations materialize and broadcast at
    // 16^hexChars rows (16.7M at 6 — the last size that is still a
    // sane localCheckpoint + broadcast), and the old 1..8 guard
    // advertised 4.3B-row "bounded" relations fitModel would have tried
    // to collect (round-12 review, What's-wrong #1)
    require(hexChars >= 1 && hexChars <= 6,
      s"hexChars must be in 1..6 (16^h buckets; 16^6 = 16.7M is the " +
        s"largest the bounded count relations honor): $hexChars")
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), explode(featureArray(col("__tk"))).as("__f"))
      .select(col(idCol),
        substring(md5(col("__f")), 1, hexChars).as("bucket"))
  }

  /** The smoothed bucket log-ratio model over raw-corpus buckets:
    * (bucket, raw_count, target_count, log_ratio) with
    * log_ratio = ln((c_t + 1)/(N_t + B)) − ln((c_r + 1)/(N_r + B)).
    * Only buckets OBSERVED IN RAW are emitted — raw docs' features are a
    * subset by construction, and that is the only place the model is
    * applied. ≤ B rows: broadcast-sized at any corpus scale. */
  def importanceModel(rawFeats: DataFrame, targetFeats: DataFrame,
      hexChars: Int = 3): DataFrame =
    // the count relations are materialized ONCE (≤ 16^hexChars rows —
    // bounded regardless of corpus size): each feeds both the bucket
    // join and its own total, and without the checkpoint the total's
    // crossJoin re-evaluates the whole corpus explode+aggregate subtree
    // (plan audit showed 4 Generate nodes; subtree reuse does not fire
    // across DeduplicateRelations — the round-10 exchange-reuse lesson)
    modelFromCounts(
      rawFeats.groupBy(col("bucket"))
        .agg(count(lit(1)).as("raw_count")).localCheckpoint(),
      targetFeats.groupBy(col("bucket"))
        .agg(count(lit(1)).as("target_count")).localCheckpoint(),
      hexChars)

  /** [[importanceModel]] from ALREADY-AGGREGATED (and bounded,
    * caller-materialized) count relations — the entry the incremental
    * [[DsirStore]] uses, where counts come from lake-backed delta sums
    * rather than a corpus pass. Columns: (bucket, raw_count) and
    * (bucket, target_count). The smoothing arithmetic lives only here. */
  private[graft] def modelFromCounts(rawC: DataFrame, tgtC: DataFrame,
      hexChars: Int): DataFrame = {
    val b = math.pow(16.0, hexChars)
    // N_raw / N_target fold out of the ≤ B-row count relations (Σ of the
    // bucket counts IS the total) — never a second pass over the feature
    // relation, which would re-run the explode over the corpus
    rawC.join(tgtC, Seq("bucket"), "left")
      .na.fill(0L, Seq("target_count"))
      .crossJoin(broadcast(rawC.agg(
        coalesce(sum(col("raw_count")), lit(0L)).as("__nr"))))
      .crossJoin(broadcast(tgtC.agg(
        coalesce(sum(col("target_count")), lit(0L)).as("__nt"))))
      .select(col("bucket"), col("raw_count"), col("target_count"),
        (log((col("target_count") + 1).cast("double") /
            (col("__nt") + lit(b))) -
          log((col("raw_count") + 1).cast("double") /
            (col("__nr") + lit(b)))).as("log_ratio"))
  }

  /** Per-document importance weights of the RAW pool against a TARGET
    * sample: (id, n_features, weight) — weight is the 6dp-rounded
    * Σ log-ratio over the doc's features (one model-broadcast join, one
    * per-doc aggregate); zero-token docs carry weight 0.0 (empty
    * product). Higher = more target-like. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, hexChars: Int = 3): DataFrame =
    weightsAgainstModel(raw,
      importanceModel(
        featureBuckets(raw, idCol, textCol, hexChars),
        featureBuckets(target, idCol, textCol, hexChars), hexChars),
      idCol, textCol, hexChars)

  /** The scoring half of [[importanceWeights]] against an explicit
    * model relation (bucket, log_ratio, …): one broadcast join + one
    * per-doc aggregate; docs with no model-matched features (zero
    * tokens, or every feature outside the model's bucket set) come back
    * at weight 0.0 through the left join. Shared by the one-shot
    * operator and [[DsirStore.weights]]. */
  private[graft] def weightsAgainstModel(docs: DataFrame, modelDf: DataFrame,
      idCol: String, textCol: String, hexChars: Int): DataFrame = {
    val feats = featureBuckets(docs, idCol, textCol, hexChars)
    val model = modelDf.select(col("bucket"), col("log_ratio"))
    val w = feats
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        round(sum(col("log_ratio")), 6).as("weight"))
    docs.select(col(idCol)).join(w, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
  }

  /** A frozen, driver-resident DSIR model: the ≤ 16^hexChars
    * (bucket, log-ratio) pairs of [[importanceModel]], collected for
    * row-local scoring. This is the serving/streaming form — the model
    * rides in the plan as one map literal, so scoring is STATELESS
    * (no shuffle, no aggregation state), which makes
    * [[scoreWithModel]] legal on a Structured Streaming frame as-is. */
  final case class DsirModel(hexChars: Int,
      buckets: Array[String], logRatios: Array[Double])

  /** Fit a frozen [[DsirModel]] on a raw-pool snapshot + target sample —
    * two corpus-count passes collapsing to the bounded bucket relation,
    * then one ≤ 16^hexChars-row collect. */
  def fitModel(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, hexChars: Int = 3): DsirModel = {
    // tighter than featureBuckets' 6: the frozen model rides in every
    // scoring plan as a map LITERAL ([[scoreWithModel]]), so its size is
    // plan-tree size, not a distributed relation — 16^4 = 65,536 entries
    // (~3 MB of literals) is the ceiling that keeps analysis/codegen
    // sane; distributed [[importanceWeights]] serves larger bucket
    // spaces without a driver-resident model
    require(hexChars >= 1 && hexChars <= 4,
      s"fitModel serves hexChars 1..4 (the frozen model is a plan " +
        s"map-literal of 16^h entries); use the distributed " +
        s"importanceWeights path for larger bucket spaces: $hexChars")
    val rows = importanceModel(
        featureBuckets(raw, idCol, textCol, hexChars),
        featureBuckets(target, idCol, textCol, hexChars), hexChars)
      .select(col("bucket"), col("log_ratio")).collect()
    DsirModel(hexChars, rows.map(_.getString(0)), rows.map(_.getDouble(1)))
  }

  /** Score documents against a FROZEN model, row-locally: per doc,
    * n_features = its features found in the model and weight = the
    * 6dp-rounded Σ of their log-ratios — the [[importanceWeights]]
    * semantics exactly (that path's inner join likewise drops features
    * outside the model's bucket set), so scoring the fit corpus through
    * either path agrees value-for-value (DocStreamSpec pins the
    * streaming run against the batch operator). Features first seen
    * after the fit carry no evidence under a frozen model and are
    * dropped the same way; refresh by re-running [[fitModel]] — the
    * [[graft.similarity.IvfIndex]] frozen-quantizer drift contract.
    *
    * Stateless by construction (one map-literal lookup chain per row),
    * so it serves batch frames and streaming micro-batches identically
    * — no watermark, no state store, no shuffle. */
  def scoreWithModel(docs: DataFrame, idCol: String, textCol: String,
      model: DsirModel): DataFrame = {
    val mapLit = map_from_arrays(
      typedlit(model.buckets.toSeq), typedlit(model.logRatios.toSeq))
    val bucketed = transform(featureArray(col("__tk")),
      f => substring(md5(f), 1, model.hexChars))
    // one lookup per feature: transform to ratios, drop misses, fold
    val ratios = filter(
      transform(bucketed, b => element_at(mapLit, b)),
      r => r.isNotNull)
    docs.withColumn("__tk", TextFunctions.tokens(col(textCol)))
      .withColumn("__r", ratios)
      .select(col(idCol),
        size(col("__r")).cast("long").as("n_features"),
        round(aggregate(col("__r"), lit(0.0), (acc, r) => acc + r), 6)
          .as("weight"))
  }

  /** Deterministic DSIR selection: the k most target-like raw docs by
    * [[importanceWeights]] (rounded-weight DESC, id ASC — the rounded
    * key is what both engines agree on; the id tiebreak makes the cut
    * deterministic). TakeOrderedAndProject does the k-selection without
    * a global sort; the rank window then orders K ROWS, not the corpus.
    * @return (id, n_features, weight, sample_rank 1..k) */
  def resampleTopK(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, hexChars: Int = 3): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    val top = importanceWeights(raw, target, idCol, textCol, hexChars)
      .orderBy(col("weight").desc, col(idCol)).limit(k)
    top.withColumn("sample_rank",
      row_number().over(
        Window.orderBy(col("weight").desc, col(idCol))))
  }

  /** The paper's actual sampler: Gumbel-top-k over the log-weights —
    * equivalent to sampling k docs WITHOUT replacement with probability
    * ∝ exp(weight / temperature), made run-, partition- and
    * engine-deterministic by deriving each doc's uniform from
    * md5(seed ‖ id) (the [[Sampling.stratifiedSample]] hash device, so
    * the same seed reproduces the same sample anywhere). gumbel =
    * −ln(−ln u) with u ∈ (0, 1) strictly — the +0.5 offset keeps u off
    * both endpoints. temperature → 0 recovers [[resampleTopK]].
    * @return (id, n_features, weight, gumbel_key, sample_rank 1..k) */
  def resampleGumbel(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, seed: Long, temperature: Double = 1.0,
      hexChars: Int = 3): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    require(temperature > 0.0, s"temperature must be positive: $temperature")
    val u = (conv(substring(md5(concat(lit(seed.toString), lit(":"),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") + 0.5) /
      lit(4294967296.0)
    val keyed = importanceWeights(raw, target, idCol, textCol, hexChars)
      .withColumn("gumbel_key",
        col("weight") / lit(temperature) - log(-log(u)))
    val top = keyed.orderBy(col("gumbel_key").desc, col(idCol)).limit(k)
    top.withColumn("sample_rank",
      row_number().over(
        Window.orderBy(col("gumbel_key").desc, col(idCol))))
  }
}
