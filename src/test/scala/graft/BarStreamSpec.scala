package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.{Lake, TableDef}
import graft.streaming.BarStream

/** Streaming extension: AvailableNow file ingestion with idempotent lake
  * upserts, and watermarked event-time OHLCV aggregation. */
class BarStreamSpec extends SparkSpec {
  import spark.implicits._

  private val barSchema = StructType(Seq(
    StructField("ticker", StringType), StructField("date", DateType),
    StructField("close", DoubleType)))

  private val barTable = TableDef("bars",
    barSchema.add("year", IntegerType),
    partitionKeys = Seq("year"), primaryKeys = Seq("date", "ticker"))

  test("AvailableNow ingestion upserts staged files idempotently") {
    val staging = Files.createTempDirectory("staging").toString
    val ckpt1 = Files.createTempDirectory("ckpt1").toString
    val lake = new Lake(spark, Files.createTempDirectory("slake").toString)
    Seq(("A", java.sql.Date.valueOf("2024-01-02"), 10.0),
        ("B", java.sql.Date.valueOf("2024-01-02"), 20.0))
      .toDF("ticker", "date", "close")
      .write.mode("append").parquet(staging)
    BarStream.ingestBars(spark, lake, barTable, staging, barSchema, ckpt1)
    assert(lake.table(barTable).count() == 2)
    // a revised drop for A and a fresh checkpoint (replay) stays consistent
    Seq(("A", java.sql.Date.valueOf("2024-01-02"), 11.0))
      .toDF("ticker", "date", "close")
      .write.mode("append").parquet(staging)
    val ckpt2 = Files.createTempDirectory("ckpt2").toString
    BarStream.ingestBars(spark, lake, barTable, staging, barSchema, ckpt2)
    val rows = lake.table(barTable).orderBy($"ticker").collect()
    assert(rows.length == 2) // PK dedup absorbed the replay
    assert(rows.head.getAs[Double]("close") == 11.0) // newest version won
  }

  test("streaming stateful EWM matches the batch kernel over one replay") {
    val staging = Files.createTempDirectory("ewmticks").toString
    val ckpt = Files.createTempDirectory("ckpt4").toString
    val prices = Seq(1.0, 2.0, -0.5, 3.0, 0.0, 1.5, -2.0, 4.0, 0.5, 1.0)
    prices.zipWithIndex.map { case (p, i) =>
      ("A", Timestamp.valueOf(f"2024-01-02 09:30:${i}%02d"), p)
    }.toDF("ticker", "ts", "price").write.mode("append").parquet(staging)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("ticker", StringType), StructField("ts", TimestampType),
        StructField("price", DoubleType))))
      .parquet(staging)
    val ewm = BarStream.streamingEwm(stream, halfLife = 60.0)
    BarStream.runAvailableNowToMemory(ewm, "ewm_out", ckpt)
    val got = spark.sql("SELECT ewm FROM ewm_out ORDER BY ts")
      .collect().map(_.getDouble(0))
    // same pandas golden as EwmSpec (hl=60, adjust=True)
    val golden = Seq(1.0, 1.502888081132, 0.827531285778, 1.380095893831,
      1.097662767307, 1.16667043798, 0.698460731496, 1.128031210124,
      1.054982222879, 1.049193796912)
    got.zip(golden).foreach { case (g, e) => assert(approxEqual(g, e, 1e-9)) }
  }

  test("watermarked OHLCV window aggregation over a bounded stream") {
    val staging = Files.createTempDirectory("ticks").toString
    val ckpt = Files.createTempDirectory("ckpt3").toString
    val ticks = (0 until 30).map { i =>
      ("A", Timestamp.valueOf(f"2024-01-02 09:${30 + i / 10}%02d:${(i % 10) * 6}%02d"),
        100.0 + i, 10L)
    }
    ticks.toDF("ticker", "ts", "price", "size")
      .write.mode("append").parquet(staging)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("ticker", StringType), StructField("ts", TimestampType),
        StructField("price", DoubleType), StructField("size", LongType))))
      .parquet(staging)
    val agg = BarStream.minuteBarAggregate(stream, "5 minutes", "10 minutes")
    BarStream.runAvailableNowToMemory(agg, "bars_out", ckpt)
    val out = spark.sql("SELECT * FROM bars_out").collect()
    // 30 ticks over 3 minutes → at most one closed 5-min window... with
    // AvailableNow + watermark the final window may be withheld; assert the
    // aggregation executed and schema is right
    assert(spark.table("bars_out").columns.toSeq ==
      Seq("bar_start", "ticker", "open", "high", "low", "close", "volume"))
    out.foreach { r =>
      assert(r.getAs[Double]("high") >= r.getAs[Double]("low"))
    }
  }

  test("streaming as-of enrich matches the batch operator; state carries across runs") {
    val probeDir = Files.createTempDirectory("asof_p").toString
    val quoteDir = Files.createTempDirectory("asof_q").toString
    val ckpt = Files.createTempDirectory("ckpt_asof").toString
    def t(s: String) = Timestamp.valueOf(s)
    val quotes1 = Seq(
      ("A", t("2024-01-02 10:00:00"), 100.0),
      ("A", t("2024-01-02 12:00:00"), 110.0),
      ("B", t("2024-01-02 11:00:00"), 50.0))
    val probes1 = Seq(
      ("A", t("2024-01-02 09:00:00")),  // pre-history → null
      ("A", t("2024-01-02 12:00:00")),  // tie → 110 (inclusive)
      ("B", t("2024-01-02 23:00:00")))  // → 50
    quotes1.toDF("ticker", "ts", "quote").write.mode("append").parquet(quoteDir)
    probes1.toDF("ticker", "ts").write.mode("append").parquet(probeDir)
    def streams() = (
      spark.readStream.schema(StructType(Seq(
          StructField("ticker", StringType), StructField("ts", TimestampType))))
        .parquet(probeDir),
      spark.readStream.schema(StructType(Seq(
          StructField("ticker", StringType), StructField("ts", TimestampType),
          StructField("quote", DoubleType))))
        .parquet(quoteDir))
    // foreachBatch sink: unlike the memory sink it supports resuming from
    // the checkpoint, which the cross-run state-carry assertion needs
    val collected = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, Timestamp, Option[Timestamp], Option[Double])]())
    def runOnce(): Unit = {
      val (p, q) = streams()
      val query = BarStream.streamingAsof(p, q).writeStream
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => collected.add((r.getString(0), r.getTimestamp(1),
            Option(r.getTimestamp(2)),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    runOnce()
    def got() = {
      import scala.jdk.CollectionConverters._
      collected.asScala.toSeq.sortBy(x => (x._1, x._2.getTime))
    }
    // replay ≡ the batch operator on the same frames
    val batch = graft.ops.AsofJoin.backward(
        probes1.toDF("ticker", "ts"),
        quotes1.toDF("ticker", "ts", "quote"),
        Seq("ticker"), "ts", Seq("quote"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        Option(r.getTimestamp(r.fieldIndex("asof_ts"))),
        if (r.isNullAt(r.fieldIndex("asof_quote"))) None
        else Some(r.getDouble(r.fieldIndex("asof_quote")))))
      .sortBy(x => (x._1, x._2.getTime)).toSeq
    assert(got() == batch)
    // a later probe file + the SAME checkpoint: keyed state must still
    // hold A's last quote from the first run
    Seq(("A", t("2024-01-03 09:00:00"))).toDF("ticker", "ts")
      .write.mode("append").parquet(probeDir)
    runOnce()
    val late = got().filter(_._2 == t("2024-01-03 09:00:00"))
    assert(late == Seq(("A", t("2024-01-03 09:00:00"),
      Some(t("2024-01-02 12:00:00")), Some(110.0))))
  }

  test("streaming as-of: sub-ms ordering and null-valued quotes match batch") {
    // ms-truncated keys would (a) let a quote up to 999µs after a probe win
    // the at-or-before test, (b) emit asof_ts truncated to the millisecond;
    // and a null quote value must pass through (batch matches the row and
    // carries null), not become a fabricated 0.0
    val probeDir = Files.createTempDirectory("asofus_p").toString
    val quoteDir = Files.createTempDirectory("asofus_q").toString
    val ckpt = Files.createTempDirectory("ckpt_asofus").toString
    def t(s: String) = Timestamp.valueOf(s)
    val quoteSchema = StructType(Seq(
      StructField("ticker", StringType), StructField("ts", TimestampType),
      StructField("quote", DoubleType)))
    val quotes = Seq(
      org.apache.spark.sql.Row("A", t("2024-01-02 10:00:00.000500"), 100.0),
      org.apache.spark.sql.Row("A", t("2024-01-02 10:00:00.000800"), null))
    val quotesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(quotes), quoteSchema)
    val probes = Seq(
      ("A", t("2024-01-02 10:00:00.000400")),  // 100µs BEFORE 1st quote → null
      ("A", t("2024-01-02 10:00:00.000500")),  // exact µs tie → 100.0
      ("A", t("2024-01-02 10:00:00.000700")),  // → 100.0, asof_ts keeps .0005
      ("A", t("2024-01-02 10:00:00.000900")))  // → null VALUE, asof_ts .0008
    quotesDf.write.mode("append").parquet(quoteDir)
    probes.toDF("ticker", "ts").write.mode("append").parquet(probeDir)
    val pStream = spark.readStream.schema(StructType(Seq(
        StructField("ticker", StringType), StructField("ts", TimestampType))))
      .parquet(probeDir)
    val qStream = spark.readStream.schema(quoteSchema).parquet(quoteDir)
    val collected = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, Timestamp, Option[Timestamp], Option[Double])]())
    val query = BarStream.streamingAsof(pStream, qStream).writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => collected.add((r.getString(0), r.getTimestamp(1),
          Option(r.getTimestamp(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    import scala.jdk.CollectionConverters._
    val got = collected.asScala.toSeq
      .sortBy(x => (x._1, x._2.getTime, x._2.getNanos))
    val batch = graft.ops.AsofJoin.backward(
        probes.toDF("ticker", "ts"), quotesDf,
        Seq("ticker"), "ts", Seq("quote"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        Option(r.getTimestamp(r.fieldIndex("asof_ts"))),
        if (r.isNullAt(r.fieldIndex("asof_quote"))) None
        else Some(r.getDouble(r.fieldIndex("asof_quote")))))
      .sortBy(x => (x._1, x._2.getTime, x._2.getNanos)).toSeq
    assert(got == batch)
    assert(got.map(_._4) == Seq(None, Some(100.0), Some(100.0), None))
    assert(got(2)._3 == Some(t("2024-01-02 10:00:00.000500"))) // µs preserved
    assert(got(3)._3 == Some(t("2024-01-02 10:00:00.000800"))) // null-quote match
  }

  test("streaming session windows match the batch sessionizer on closed sessions") {
    val staging = Files.createTempDirectory("sess").toString
    val ckpt = Files.createTempDirectory("ckpt_sess").toString
    // user 1: two sessions 2 h apart; user 2: one session. A far-future
    // flush event advances the watermark past them so they all CLOSE and
    // emit under append mode.
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-02 09:00:00")),
      (1L, Timestamp.valueOf("2024-01-02 09:10:00")),
      (1L, Timestamp.valueOf("2024-01-02 11:30:00")),
      (2L, Timestamp.valueOf("2024-01-02 09:05:00")),
      (99L, Timestamp.valueOf("2024-01-03 12:00:00"))) // watermark flush
    events.toDF("user_id", "ts").write.mode("append").parquet(staging)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType))))
      .parquet(staging)
    val agg = BarStream.sessionWindowAggregate(stream, "user_id", "ts",
      gap = "30 minutes", watermark = "10 minutes")
    BarStream.runAvailableNowToMemory(agg, "sessions_out", ckpt)
    val got = spark.sql(
        "SELECT user_id, n_events, session_start, session_end FROM sessions_out " +
        "WHERE user_id IN (1, 2) ORDER BY user_id, session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSeq
    // batch twin over the same closed events
    val batch = graft.ops.Sessions.sessionStats(
        events.filter(_._1 != 99L).toDF("user_id", "ts"), "user_id", "ts",
        gapSeconds = 30 * 60)
      .orderBy($"user_id", $"session_start")
      .select($"user_id", $"n_events", $"session_start", $"session_end")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSeq
    assert(got == batch)
    assert(got.size == 3) // (1: 2 sessions) + (2: 1 session)
  }

  test("streaming dedup within watermark drops redelivered events") {
    val staging = Files.createTempDirectory("dups").toString
    val ckpt = Files.createTempDirectory("ckpt4").toString
    val events = Seq(
      ("A", Timestamp.valueOf("2024-01-02 09:30:00"), 100.0),
      ("A", Timestamp.valueOf("2024-01-02 09:30:00"), 100.0), // duplicate
      ("A", Timestamp.valueOf("2024-01-02 09:31:00"), 101.0),
      ("B", Timestamp.valueOf("2024-01-02 09:30:00"), 50.0),
      ("B", Timestamp.valueOf("2024-01-02 09:30:00"), 50.0), // duplicate
      ("B", Timestamp.valueOf("2024-01-02 09:30:00"), 50.0)) // duplicate
    events.toDF("ticker", "ts", "price").write.mode("append").parquet(staging)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("ticker", StringType), StructField("ts", TimestampType),
        StructField("price", DoubleType))))
      .parquet(staging)
    val deduped = BarStream.dedupWithinWatermark(
      stream, Seq("ticker", "ts"), "ts", "10 minutes")
    BarStream.runAvailableNowToMemory(deduped, "dedup_out", ckpt)
    val got = spark.sql("SELECT ticker, ts, price FROM dedup_out")
      .as[(String, Timestamp, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2.getTime))
    assert(got == Seq(
      ("A", Timestamp.valueOf("2024-01-02 09:30:00"), 100.0),
      ("A", Timestamp.valueOf("2024-01-02 09:31:00"), 101.0),
      ("B", Timestamp.valueOf("2024-01-02 09:30:00"), 50.0)))
  }
}
