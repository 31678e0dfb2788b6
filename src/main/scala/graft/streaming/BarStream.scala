package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType
import graft.lake.{Lake, TableDef}

/** Structured Streaming extension (SURVEY.md §2.11 / §7.6): the reference
  * is pure daily batch — its "streaming" is micro-batch incremental
  * recomputation with idempotent upserts. This module expresses that same
  * contract Spark-natively:
  *
  *  - [[ingestBars]]: a file-source stream over staged bar drops →
  *    `Trigger.AvailableNow` micro-batches → `foreachBatch` upsert into the
  *    lake (create-if-absent + append + PK-dedup compaction). Re-running is
  *    idempotent — the PK dedup makes replays safe, exactly like the
  *    reference's append+optimize.
  *  - [[minuteBarAggregate]]: event-time windowed OHLCV roll-up with a
  *    watermark for late data — the 1-minute portfolio-history feed
  *    (portfolio_history_flow.py:24-41) generalized to proper event-time
  *    semantics.
  *
  * Scale: file-source streams list incrementally (maxFilesPerTrigger),
  * state for windowed aggs is bounded by the watermark, and the sink work
  * is the same partition-scoped upsert the batch path uses.
  */
object BarStream {

  /** Stream staged bar files into a lake table with idempotent upserts.
    * Blocks until all available input is processed (AvailableNow). */
  def ingestBars(
      spark: SparkSession,
      lake: Lake,
      table: TableDef,
      stagingDir: String,
      schema: StructType,
      checkpointDir: String): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 16)
      .parquet(stagingDir)
      .withColumn("year", year(col("date")))
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // wall-clock version, NOT batchId: versions must be comparable with
        // the batch-path appends (epoch millis), or a corrected streamed row
        // would lose PK-dedup to an older batch write; batchId also resets
        // on checkpoint replacement. Replays re-win with a newer version,
        // writing identical content — still idempotent.
        val _ = batchId
        lake.upsert(table, batch)
      }
      .start()
    q.awaitTermination()
  }

  /** Event-time OHLCV roll-up: tick/minute rows → watermarked window aggs.
    * Returns a streaming DataFrame; attach any sink. */
  def minuteBarAggregate(
      ticks: DataFrame,
      windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    ticks
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("ticker"))
      .agg(
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        sum(col("size")).as("volume"))
      .select(col("window.start").as("bar_start"), col("ticker"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))

  /** Streaming backward as-of enrich: the stateful twin of
    * [[graft.ops.AsofJoin]].backward. Probe and quote streams UNION with a
    * side tag (the same device the batch operator uses), group by key, and
    * keyed state carries the latest quote (epoch micros, optional value —
    * null quote values survive, matching batch) forward; each probe
    * emits with the most recent quote at-or-before it. State is O(1) per
    * key for arbitrarily long streams and key counts.
    *
    * Within a micro-batch, events apply in event-time order (quotes before
    * probes on ties — the batch operator's inclusive-tie rule). Across
    * batches the state is the running last quote, so correctness assumes
    * per-key event-time monotonicity across batches (true for replayed
    * drops and ordered feeds; same caveat class as [[streamingEwm]]).
    *
    * CHECKPOINT COMPATIBILITY: the round-5 sub-ms fix changed the state
    * encoding from (Long epoch-MILLIS, Double) to (Long epoch-MICROS,
    * Option[Double]). A stream restarted from a checkpoint written by the
    * pre-r5 operator will either fail state deserialization or, worse,
    * silently reinterpret stored millis as micros (a ~50-year shift) —
    * restart such streams with a FRESH checkpointLocation. */
  def streamingAsof(
      probes: DataFrame, quotes: DataFrame,
      keyCol: String = "ticker", tsCol: String = "ts",
      valueCol: String = "quote"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = probes.sparkSession
    import spark.implicits._
    val tagged = probes
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("t"),
        lit(null).cast("double").as("v"), lit(1).as("side"))
      .unionByName(quotes
        .select(col(keyCol).cast("string").as("k"), col(tsCol).as("t"),
          col(valueCol).cast("double").as("v"), lit(0).as("side")))
    // Order and store state on epoch MICROS, not Timestamp.getTime (millis):
    // the batch AsofJoin.backward this spec-matches orders on the full
    // microsecond timestamp, so ms-truncated keys would mis-order sub-ms
    // data (a quote up to 999µs after a probe would win the "at-or-before"
    // test) and emit asof_ts truncated to the millisecond.
    def toMicros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000
    def fromMicros(us: Long): java.sql.Timestamp = {
      val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      ts.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
      ts
    }
    tagged
      .as[(String, java.sql.Timestamp, Option[Double], Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[(String, java.sql.Timestamp, Option[Double], Int)],
            state: GroupState[(Long, Option[Double])]) => {
          var last = state.getOption // (epoch micros, value — null survives)
          val out = scala.collection.mutable.ArrayBuffer[
            (String, java.sql.Timestamp, Option[java.sql.Timestamp], Option[Double])]()
          // event-time order; side 0 (quote) first on ties → inclusive
          rows.toSeq.sortBy(r => (toMicros(r._2), r._4)).foreach {
            // a null-valued quote still matches (batch: the __rv struct is
            // non-null, so last(ignoreNulls) picks it and emits null value)
            // — defaulting it to 0.0 would fabricate a price
            case (_, t, v, 0) => last = Some((toMicros(t), v))
            case (_, t, _, _) =>
              out += ((key, t, last.map(l => fromMicros(l._1)), last.flatMap(_._2)))
          }
          last.foreach(state.update)
          out.iterator
        })
      .toDF(keyCol, tsCol, s"asof_$tsCol", s"asof_$valueCol")
  }

  /** Event-time session windows: the streaming twin of
    * [[graft.ops.Sessions]] (batch gap sessionization). `session_window`
    * merges events closer than `gap` into one state-store window per key;
    * the watermark closes and emits sessions, so state stays bounded by
    * in-flight sessions only. Boundary nuance vs the batch operator: a
    * step of EXACTLY `gap` stays in-session in batch (strict `>` test)
    * but opens a new session here (half-open event windows) — same
    * sessions everywhere else. */
  def sessionWindowAggregate(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select(col(keyCol),
        col("session_window.start").as("window_start"),
        col("session_window.end").as("window_end"),
        col("n_events"), col("session_start"), col("session_end"))

  /** Streaming exactly-once-per-key dedup: drop replayed/duplicate events
    * by key while the event is inside the watermark — the streaming form of
    * the lake's PK-dedup upsert (S4), for feeds that redeliver (at-least-
    * once brokers, replayed drops). State is bounded BY THE WATERMARK: a
    * key's fingerprint is dropped from the state store once its event time
    * expires, so unbounded key cardinality cannot accumulate unbounded
    * state — the property a plain dropDuplicates stream lacks. */
  def dedupWithinWatermark(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Online per-ticker EWM over a price stream — custom keyed state via
    * `flatMapGroupsWithState` (the Structured Streaming analogue of the
    * batch EWM kernel). State is the O(1) (num, den, lastTs) recurrence;
    * events inside a micro-batch are applied in event-time order. Emits one
    * (ticker, ts, price, ewm) row per input event.
    *
    * State is bounded: one tiny struct per ticker, no timeline buffering —
    * safe for arbitrarily long streams and arbitrary key cardinality
    * (state store scales with #tickers only). */
  def streamingEwm(
      ticks: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      halfLife: Double): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = ticks.sparkSession
    import spark.implicits._
    val decay = math.pow(2.0, -1.0 / halfLife)
    // state per ticker: (weighted numerator, weighted denominator)
    ticks
      .selectExpr("ticker", "ts", "price")
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (ticker: String, rows: Iterator[(String, java.sql.Timestamp, Double)],
            state: GroupState[(Double, Double)]) => {
          var (num, den) = state.getOption.getOrElse((0.0, 0.0))
          val out = rows.toSeq.sortBy(_._2.getTime).map { case (_, ts, price) =>
            num = num * decay + price
            den = den * decay + 1.0
            (ticker, ts, price, num / den)
          }
          state.update((num, den))
          out.iterator
        })
      .toDF("ticker", "ts", "price", "ewm")
  }

  /** Convenience: run a streaming aggregate over already-staged files to
    * completion into an in-memory table (smoke/test path). */
  def runAvailableNowToMemory(
      agg: DataFrame, queryName: String, checkpointDir: String): Unit = {
    val q: DataStreamWriter[org.apache.spark.sql.Row] = agg.writeStream
      .outputMode("append")
      .queryName(queryName)
      .format("memory")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
    val started = q.start()
    started.awaitTermination()
  }
}
