package graft.sampling

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.{Lake, TableDef}

/** Incremental DSIR: lake-backed hashed-ngram bucket counts, so a daily
  * ingest updates the importance model with O(batch) work instead of
  * re-scanning the whole raw pool — completing DSIR's engine matrix
  * (batch = [[Dsir.importanceWeights]], streaming scoring =
  * [[Dsir.scoreWithModel]], incremental = this).
  *
  * Why counts make this exact where the vector indexes can only be
  * drift-bounded: the model is a pure function of two INTEGER count
  * relations, and counts are ADDITIVE. Each append writes the batch's
  * ≤ 16^hexChars-row count delta; the served model sums deltas
  * per bucket (merge-on-read over a relation bounded by
  * appends × 16^hexChars, collapsed by [[compact]]). Two-batch
  * composition therefore equals the one-shot model BYTE-FOR-BYTE — no
  * frozen-trainer drift contract needed, unlike the IVF/SemDeDup family.
  *
  * The same additivity gives an EXACT takedown: [[deleteRaw]] appends
  * the victims' counts NEGATED, so the model afterwards equals a pool
  * that never contained them (again byte-exact, no re-election or
  * re-pairing machinery — the x88/x34 parity discipline for free).
  * Deleting docs that were never ingested corrupts the counts; [[model]]
  * fails LOUDLY if any merged count is negative.
  *
  * Scale shape: append/delete are one corpus-pass-over-the-BATCH hash
  * aggregate (map-side combine) + a tiny delta write; [[model]] and
  * [[weights]] never touch documents again — they read only the bounded
  * count relations; [[weights]] scores any frame through the shared
  * [[Dsir.weightsAgainstModel]] broadcast join.
  */
class DsirStore(lake: Lake, prefix: String = "dsir", hexChars: Int = 3) {
  // the store materializes and sums 16^hexChars-row count relations per
  // model build — same honest ceiling as Dsir.featureBuckets (r12 review)
  require(hexChars >= 1 && hexChars <= 6,
    s"hexChars must be in 1..6 (16^h buckets): $hexChars")

  val rawTable: TableDef = TableDef(s"${prefix}_raw_counts",
    StructType(Seq(StructField("bucket", StringType),
      StructField("cnt", LongType))))
  val targetTable: TableDef = TableDef(s"${prefix}_target_counts",
    StructType(Seq(StructField("bucket", StringType),
      StructField("cnt", LongType))))

  private def delta(docs: DataFrame, idCol: String, textCol: String,
      sign: Int): DataFrame =
    Dsir.bucketCounts(docs, textCol, hexChars, "cnt")
      .select(col("bucket"), (col("cnt") * sign).as("cnt"))

  /** Fold a raw-pool batch into the model: O(batch) — one hash
    * aggregate over the batch's features, one ≤ 16^hexChars-row append. */
  def appendRaw(docs: DataFrame, idCol: String, textCol: String,
      version: Long): Unit = {
    invalidate()
    lake.append(rawTable, delta(docs, idCol, textCol, 1), version)
  }

  /** Fold a target-sample batch in — same shape as [[appendRaw]]. */
  def appendTarget(docs: DataFrame, idCol: String, textCol: String,
      version: Long): Unit = {
    invalidate()
    lake.append(targetTable, delta(docs, idCol, textCol, 1), version)
  }

  /** EXACT takedown from the raw pool: append the victims' counts
    * negated. The caller passes the victims' DOCUMENTS (texts), not ids
    * — the store keeps no per-doc state to look them up in, which is
    * precisely why its deletes are O(victims). After this, [[model]]
    * equals a pool that never ingested the victims, byte-for-byte. */
  def deleteRaw(docs: DataFrame, idCol: String, textCol: String,
      version: Long): Unit = {
    invalidate()
    lake.append(rawTable, delta(docs, idCol, textCol, -1), version)
  }

  /** Same exact-negation takedown for the target sample. */
  def deleteTarget(docs: DataFrame, idCol: String, textCol: String,
      version: Long): Unit = {
    invalidate()
    lake.append(targetTable, delta(docs, idCol, textCol, -1), version)
  }

  private def merged(t: TableDef, outCol: String,
      spark: SparkSession): DataFrame = {
    // materialized once (bounded by live buckets × pending deltas);
    // the guard and the served filter read the checkpointed rows
    val m = (if (lake.exists(t.name)) lake.table(t)
      else spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        t.schema))
      .groupBy(col("bucket"))
      .agg(sum(col("cnt")).as(outCol))
      .localCheckpoint()
    // a negative merged count means a delete of never-ingested docs —
    // silent model corruption; zero-count buckets (fully deleted) carry
    // no information and fold out like never-seen buckets
    m.filter(col(outCol) < 0).limit(1).collect().headOption.foreach(r =>
      throw new IllegalStateException(s"${t.name}: bucket " +
        s"'${r.getString(0)}' has negative merged count ${r.getLong(1)} " +
        "— a delete removed documents that were never ingested"))
    m.filter(col(outCol) > 0)
  }

  /** [[merged]] collected: ONE count-collect job (the relation is
    * bounded by 16^hexChars rows), with the negative-count guard and
    * the >0 live filter on the driver. The hexChars ≤ 4 model path
    * reads counts only through this, so a model rebuild costs exactly
    * two jobs — the serving cost at mutation cadence. */
  private def mergedLocal(t: TableDef,
      spark: SparkSession): Array[(String, Long)] = {
    val all =
      if (!lake.exists(t.name)) Array.empty[(String, Long)]
      else Dsir.collectCounts(lake.table(t).groupBy(col("bucket"))
        .agg(sum(col("cnt")).as("cnt")))
    all.find(_._2 < 0).foreach { case (b, c) =>
      throw new IllegalStateException(s"${t.name}: bucket '$b' has " +
        s"negative merged count $c — a delete removed documents that " +
        "were never ingested")
    }
    all.filter(_._2 > 0)
  }

  // the validated model is memoized across calls: merged() pays one
  // checkpoint + one eager negative-count guard job per table, and a
  // serving process calling weights() repeatedly must not re-pay them
  // per call (r12 ADVICE). Every mutation on this instance invalidates;
  // out-of-band writes to the same lake path are outside the store's
  // contract (the other persisted indexes' standing rule).
  private var cachedModel: Option[DataFrame] = None
  private def invalidate(): Unit = synchronized { cachedModel = None }

  /** The served model over the counts-so-far — byte-identical to
    * [[Dsir.importanceModel]] on the concatenated (minus deleted)
    * corpora. Bounded work: merge-on-read over the delta relations,
    * validated + checkpointed ONCE per mutation epoch. The FINAL model
    * relation is checkpointed too, not just memoized as a plan: its
    * subtree (count join + two broadcast total aggregates) costs ~6 AQE
    * stage jobs per evaluation, and a serving process calls weights()
    * many times per epoch — the round-14 job-count profile measured 20
    * jobs per weights() call, 6 of them this subtree (≤ 16^hexChars
    * rows, a bounded checkpoint). */
  def model(spark: SparkSession): DataFrame = synchronized {
    cachedModel.getOrElse {
      // hexChars ≤ 4 (every production configuration): two collect
      // jobs total — counts merge on the executors, the join/totals/
      // smoothing assemble driver-locally into a LocalRelation
      // (Dsir.modelFromCountsLocal's byte-parity note). The round-14
      // job profile measured the checkpoint+guard+crossJoin chain at
      // ~12 jobs per rebuild; a store mutating daily and serving
      // weights() at request cadence pays this on every epoch.
      val m =
        if (hexChars <= 4) Dsir.modelFromCountsLocal(spark,
          mergedLocal(rawTable, spark), mergedLocal(targetTable, spark),
          hexChars)
        else Dsir.modelFromCounts(
          merged(rawTable, "raw_count", spark),
          merged(targetTable, "target_count", spark), hexChars)
          .localCheckpoint()
      cachedModel = Some(m)
      m
    }
  }

  /** Score any document frame against the store's current model — the
    * [[Dsir.importanceWeights]] contract (docs scored against counts
    * that INCLUDE whatever of them was appended). */
  def weights(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Dsir.weightsAgainstModel(docs, model(docs.sparkSession),
      idCol, textCol, hexChars)

  /** Collapse the delta relations (one summed row per bucket, dropping
    * zeroed-out buckets) — the maintenance-cadence compaction bounding
    * merge-on-read input by live buckets instead of append count. The
    * served model is unchanged. */
  def compact(version: Long = System.currentTimeMillis()): Unit = {
    invalidate()
    Seq(rawTable, targetTable).foreach { t =>
      if (lake.exists(t.name)) {
        if (hexChars <= 4) {
          // bounded counts: one collect job; the negative-count guard
          // (compacting corruption would destroy the delta history that
          // could explain it) and the zero-bucket drop run driver-side,
          // and the rewrite is a LocalRelation write
          val rel = lake.table(t)
          val summed = Dsir.collectCounts(rel
            .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt")))
          summed.find(_._2 < 0).foreach { case (b, c) =>
            throw new IllegalStateException(s"${t.name}: bucket '$b' " +
              s"has negative merged count $c — refusing to compact a " +
              "corrupted store")
          }
          val spark = rel.sparkSession
          import spark.implicits._
          lake.replace(t,
            summed.filter(_._2 != 0L).toSeq.toDF("bucket", "cnt"), version)
        } else {
          val summed = lake.table(t).groupBy(col("bucket"))
            .agg(sum(col("cnt")).as("cnt")).localCheckpoint()
          summed.filter(col("cnt") < 0).limit(1).collect().headOption
            .foreach(r => throw new IllegalStateException(s"${t.name}: " +
              s"bucket '${r.getString(0)}' has negative merged count " +
              s"${r.getLong(1)} — refusing to compact a corrupted store"))
          lake.replace(t, summed.filter(col("cnt") =!= 0L), version)
        }
      }
    }
  }
}
