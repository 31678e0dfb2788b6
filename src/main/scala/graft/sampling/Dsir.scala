package graft.sampling

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * each collapse to a ≤ 16^hexChars-row bucket relation — for bounded
  * bucket spaces (hexChars ≤ 4, every production config) a DENSE
  * per-partition combine that never materializes a per-feature row
  * ([[bucketCounts]]); the weight pass is ROW-LOCAL against the
  * collected model (one broadcast-map fold per doc — no explode, no
  * join, no aggregation state), and top-k selection is
  * TakeOrderedAndProject (per-partition heaps + driver merge of k rows
  * — no global sort, no window). Larger bucket spaces keep the
  * explode + broadcast-join forms. Nothing materializes the corpus
  * twice; nothing is quadratic.
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

  /** Corpus bucket counts (bucket, cnt), map-side combined into a DENSE
    * 16^hexChars array per partition when the bucket space is bounded
    * (hexChars ≤ 4 — a 32 KB..512 KB long array): one pass over the
    * token arrays, no per-feature row ever materialized, each partition
    * emitting at most 16^h rows regardless of corpus size. Counts are
    * exact integers, byte-identical to the explode + hash-aggregate
    * form (which remains the path for larger bucket spaces) — the
    * round-14 profile measured the explode form's count pass at
    * ~105 cpu-s per 2M docs against ~35 for the dense combine. */
  private[graft] def bucketCounts(df: DataFrame, textCol: String,
      hexChars: Int, outCol: String): DataFrame = {
    if (hexChars > 4)
      featureBuckets(df.select(lit(0L).as("__id"), col(textCol)),
        "__id", textCol, hexChars)
        .groupBy(col("bucket")).agg(count(lit(1)).as(outCol))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      val hc = hexChars
      val b = 1 << (4 * hexChars)
      df.select(TextFunctions.tokens(col(textCol)).as("tk"))
        .as[Seq[String]]
        .mapPartitions { it =>
          val counts = new Array[Long](b)
          val md = java.security.MessageDigest.getInstance("MD5")
          def add(f: String): Unit = {
            val d = md.digest(
              f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var idx = 0
            var n = 0
            while (n < hc) {
              val nib =
                if (n % 2 == 0) (d(n / 2) & 0xff) >> 4
                else d(n / 2) & 0xf
              idx = (idx << 4) | nib
              n += 1
            }
            counts(idx) += 1
          }
          it.foreach { tk =>
            if (tk != null) {
              var i = 0
              while (i < tk.length) { add(tk(i)); i += 1 }
              i = 0
              while (i < tk.length - 1) { add(tk(i) + " " + tk(i + 1)); i += 1 }
            }
          }
          val fmt = "%0" + hc + "x"
          counts.iterator.zipWithIndex
            .filter(_._1 > 0L)
            .map { case (c, i) => (fmt.format(i), c) }
        }
        .toDF("bucket", outCol)
        .groupBy(col("bucket")).agg(sum(col(outCol)).as(outCol))
    }
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
      importanceModelFromDocs(raw, target, textCol, hexChars),
      idCol, textCol, hexChars)

  /** [[importanceModel]] straight from document frames: the count
    * passes ride the dense per-partition combine ([[bucketCounts]])
    * when the bucket space is bounded — never a per-feature row — and
    * for hexChars ≤ 4 the model itself assembles DRIVER-LOCALLY from
    * the two collected count relations: the whole build is exactly two
    * count-collect jobs instead of the checkpoint + guard + crossJoin
    * chain (~11 driver jobs under AQE — round-14 job profile), which is
    * the serving-path cost when a store rebuilds its model per epoch. */
  private[graft] def importanceModelFromDocs(raw: DataFrame,
      target: DataFrame, textCol: String, hexChars: Int): DataFrame =
    if (hexChars <= 4)
      modelFromCountsLocal(raw.sparkSession,
        collectCounts(bucketCounts(raw, textCol, hexChars, "c")),
        collectCounts(bucketCounts(target, textCol, hexChars, "c")),
        hexChars)
    else modelFromCounts(
      bucketCounts(raw, textCol, hexChars, "raw_count")
        .localCheckpoint(),
      bucketCounts(target, textCol, hexChars, "target_count")
        .localCheckpoint(),
      hexChars)

  private[graft] def collectCounts(df: DataFrame): Array[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1)))

  /** Driver-local [[modelFromCounts]] for bounded bucket spaces: the
    * count relations are ≤ 16^4 rows, so the raw-bucket left join, the
    * two totals, and the smoothing arithmetic run on collected arrays
    * and the model comes back as ONE LocalRelation (its downstream
    * collect in [[weightsAgainstModel]] is a LocalTableScan — zero
    * further jobs). Byte parity with the Spark-side form is by
    * construction: identical integer count operands through the same
    * (c + 1).toDouble division and the same `java.lang.Math.log` that
    * the Log expression's codegen calls. */
  private[graft] def modelFromCountsLocal(spark: SparkSession,
      rawC: Array[(String, Long)], tgtC: Array[(String, Long)],
      hexChars: Int): DataFrame = {
    import spark.implicits._
    val b = math.pow(16.0, hexChars)
    var nr = 0L; var nt = 0L
    rawC.foreach(nr += _._2)
    tgtC.foreach(nt += _._2)
    val tgtMap = tgtC.toMap
    rawC.toSeq.map { case (bucket, rc) =>
      val tc = tgtMap.getOrElse(bucket, 0L)
      val lr = java.lang.Math.log((tc + 1L).toDouble / (nt + b)) -
        java.lang.Math.log((rc + 1L).toDouble / (nr + b))
      (bucket, rc, tc, lr)
    }.toDF("bucket", "raw_count", "target_count", "log_ratio")
  }

  /** The scoring half of [[importanceWeights]] against an explicit
    * model relation (bucket, log_ratio, …). Two physical forms with one
    * semantics:
    *
    *   - '''hexChars ≤ 4''' (every production configuration): the model
    *     is collected (≤ 16^4 rows — it was broadcast-sized anyway) and
    *     scoring is ROW-LOCAL through the [[scoreWithModel]] kernel —
    *     no explode, no join, no aggregation state. The round-14
    *     profile measured the explode+join+agg form at 4× the count
    *     pass's cpu on a 2M-doc pool (432 vs 114 cpu-s): materializing
    *     one row per feature and paying a join probe + hash-agg update
    *     each is the dominant corpus-proportional cost, not the md5.
    *   - '''hexChars 5..6''': bucket spaces too large for an in-plan
    *     map ride the original explode + broadcast join + per-doc
    *     aggregate; docs with no model-matched features come back at
    *     weight 0.0 through the left join.
    *
    * Shared by the one-shot operator and [[DsirStore.weights]]. */
  private[graft] def weightsAgainstModel(docs: DataFrame, modelDf: DataFrame,
      idCol: String, textCol: String, hexChars: Int): DataFrame =
    if (hexChars <= 4) {
      val rows = modelDf.select(col("bucket"), col("log_ratio")).collect()
      rowLocalWeights(docs, idCol, textCol, hexChars,
        rows.map(_.getString(0)), rows.map(_.getDouble(1)))
    } else {
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

  /** The row-local scoring kernel — one UDF call PER DOCUMENT (never
    * per feature): hash each unigram/bigram (java MessageDigest MD5,
    * byte-identical to Spark's `md5` on UTF-8 bytes), O(1)-look it up
    * in a broadcast hash map, fold hits in feature order. Null/missing
    * text scores (0, 0.0) like the join form's left-join branch.
    *
    * A UDF over the engine's preferred native expressions is a MEASURED
    * choice, not a style lapse: there is no codegen'd O(1) map-lookup
    * builtin — `element_at` over an in-plan map literal is a LINEAR
    * scan (4096-entry model × 113M features cost 1465 cpu-s at 2M docs
    * — 3.4× the explode+broadcast-join form's 432; this kernel measures
    * ~150), and the relational join form materializes one row per
    * feature plus a hash-agg update each. Shared by [[scoreWithModel]]
    * and the bounded arm of [[weightsAgainstModel]], so the streaming
    * scorer and the batch operator agree by construction. */
  private def rowLocalWeights(docs: DataFrame, idCol: String,
      textCol: String, hexChars: Int,
      buckets: Array[String], logRatios: Array[Double]): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast {
      val m = new java.util.HashMap[String, java.lang.Double](
        buckets.length * 2)
      var i = 0
      while (i < buckets.length) { m.put(buckets(i), logRatios(i)); i += 1 }
      m
    }
    val hc = hexChars
    val scoreUdf = udf { (tk: Seq[String]) =>
      if (tk == null) (0L, 0.0)
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        var n = 0L
        var s = 0.0
        def add(f: String): Unit = {
          val d = md.digest(
            f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val sb = new java.lang.StringBuilder(hc)
          var bi = 0
          while (sb.length < hc) {
            val b = d(bi) & 0xff
            sb.append(Character.forDigit(b >> 4, 16))
            if (sb.length < hc) sb.append(Character.forDigit(b & 0xf, 16))
            bi += 1
          }
          val r = bc.value.get(sb.toString)
          if (r != null) { n += 1; s += r.doubleValue() }
        }
        // featureArray's order exactly: unigrams, then bigrams
        var i = 0
        while (i < tk.length) { add(tk(i)); i += 1 }
        i = 0
        while (i < tk.length - 1) { add(tk(i) + " " + tk(i + 1)); i += 1 }
        (n, s)
      }
    }
    docs.withColumn("__w", scoreUdf(TextFunctions.tokens(col(textCol))))
      .select(col(idCol),
        col("__w._1").as("n_features"),
        round(col("__w._2"), 6).as("weight"))
  }

  /** A frozen, driver-resident DSIR model: the ≤ 16^hexChars
    * (bucket, log-ratio) pairs of [[importanceModel]], collected for
    * row-local scoring. This is the serving/streaming form — the model
    * broadcasts as one hash map and scoring is STATELESS (no shuffle,
    * no aggregation state), which makes [[scoreWithModel]] legal on a
    * Structured Streaming frame as-is. */
  final case class DsirModel(hexChars: Int,
      buckets: Array[String], logRatios: Array[Double])

  /** Fit a frozen [[DsirModel]] on a raw-pool snapshot + target sample —
    * two corpus-count passes collapsing to the bounded bucket relation,
    * then one ≤ 16^hexChars-row collect. */
  def fitModel(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, hexChars: Int = 3): DsirModel = {
    // tighter than featureBuckets' 6: the frozen model is collected and
    // broadcast as a 16^h-entry hash map ([[scoreWithModel]]) — 16^4 =
    // 65,536 entries is the driver/broadcast ceiling the row-local
    // kernel honors; distributed [[importanceWeights]] serves larger
    // bucket spaces through the join form without a collected model
    require(hexChars >= 1 && hexChars <= 4,
      s"fitModel serves hexChars 1..4 (the frozen model is a collected " +
        s"16^h-entry broadcast map); use the distributed " +
        s"importanceWeights path for larger bucket spaces: $hexChars")
    val rows = importanceModelFromDocs(raw, target, textCol, hexChars)
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
    * Stateless by construction (one broadcast-map fold per row), so it
    * serves batch frames and streaming micro-batches identically — no
    * watermark, no state store, no shuffle. */
  def scoreWithModel(docs: DataFrame, idCol: String, textCol: String,
      model: DsirModel): DataFrame =
    rowLocalWeights(docs, idCol, textCol, model.hexChars,
      model.buckets, model.logRatios)

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
