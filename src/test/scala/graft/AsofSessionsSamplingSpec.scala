package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{AsofJoin, Sessions}
import graft.sampling.Sampling

/** Edge cases for the round-4 operators: backward as-of join, gap
  * sessionization, deterministic stratified sampling, and sequence
  * packing (their end-to-end values are DuckDB-oracled as x26-x29). */
class AsofSessionsSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof backward: ties inclusive, pre-history null, keys independent") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 110.0),
      (2L, ts("2024-01-01 11:00:00"), 50.0))
      .toDF("k", "t", "px")
    val probes = Seq(
      (1L, ts("2024-01-01 09:00:00"), "before-any"),   // → null
      (1L, ts("2024-01-01 12:00:00"), "tie"),          // tie → 110 (inclusive)
      (1L, ts("2024-01-01 11:59:59"), "between"),      // → 100
      (1L, ts("2024-01-01 23:00:00"), "after-all"),    // → 110
      (2L, ts("2024-01-01 23:00:00"), "other-key"))    // → 50, not key 1's
      .toDF("k", "t", "tag")
    val got = AsofJoin.backward(probes, quotes, Seq("k"), "t", Seq("px"))
      .select($"tag", $"asof_px", $"asof_t")
      .as[(String, Option[Double], Option[Timestamp])].collect()
      .map { case (k, v, at) => k -> ((v, at)) }.toMap
    assert(got("before-any") == (None, None))
    assert(got("tie") == (Some(110.0), Some(ts("2024-01-01 12:00:00"))))
    assert(got("between") == (Some(100.0), Some(ts("2024-01-01 10:00:00"))))
    assert(got("after-all") == (Some(110.0), Some(ts("2024-01-01 12:00:00"))))
    assert(got("other-key") == (Some(50.0), Some(ts("2024-01-01 11:00:00"))))
  }

  test("asof backward: left with no payload columns still works") {
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 7.0)).toDF("k", "t", "v")
    val probes = Seq((1L, ts("2024-01-01 11:00:00"))).toDF("k", "t")
    val row = AsofJoin.backward(probes, quotes, Seq("k"), "t", Seq("v")).collect().head
    assert(row.getAs[Double]("asof_v") == 7.0)
  }

  test("sessionize: strict-gap boundary, tie-break order, per-key restart") {
    // gap 600 s: an exactly-600 s step stays in-session; 601 s starts a new one
    val e = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 10:10:00")),  // +600 s → same session
      (1L, 12L, ts("2024-01-01 10:20:01")),  // +601 s → new session
      (1L, 13L, ts("2024-01-01 10:20:01")),  // same ts, higher id → same session
      (2L, 20L, ts("2024-01-01 00:00:00")))  // other key starts at 1
      .toDF("user_id", "event_id", "ts")
    val got = Sessions.sessionize(e, "user_id", "ts", 600, Seq("event_id"))
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 13L -> 2L, 20L -> 1L))
    val stats = Sessions.sessionStats(e, "user_id", "ts", 600, Seq("event_id"))
      .filter($"user_id" === 1 && $"session_idx" === 2).collect().head
    assert(stats.getAs[Long]("n_events") == 2L)
    assert(stats.getAs[Timestamp]("session_start") == ts("2024-01-01 10:20:01"))
  }

  test("sessionize: TIMESTAMP_NTZ input (parquet timestamp[us] without tz)") {
    // The driver's testdata parquet carries timestamp[us] with no
    // timezone, which Spark 4 reads as TIMESTAMP_NTZ — r7's driver run
    // lost x27 to exactly this (unix_micros rejects NTZ). Pin both the
    // type acceptance and the gap math on the NTZ path.
    val e = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (1L, 11L, "2024-01-01 10:10:00"),   // +600 s → same session
      (1L, 12L, "2024-01-01 10:20:01"))   // +601 s → new session
      .toDF("user_id", "event_id", "s")
      .withColumn("ts", to_timestamp_ntz($"s")).drop("s")
    assert(e.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val got = Sessions.sessionize(e, "user_id", "ts", 600, Seq("event_id"))
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L, 11L -> 1L, 12L -> 2L))
    // stats keep the input's NTZ type for start/end (min/max pass-through)
    val stats = Sessions.sessionStats(e, "user_id", "ts", 600, Seq("event_id"))
    assert(stats.schema("session_start").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // DST regression: under a non-UTC session timezone, NTZ gap math must
    // not shift across spring-forward (2024-03-10 02:00 America/New_York
    // doesn't exist — a session-tz cast would turn this 420 s gap into
    // 4020 s and split the session)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val dst = Seq((1L, 10L, "2024-03-10 01:58:00"),
          (1L, 11L, "2024-03-10 02:05:00"))
        .toDF("user_id", "event_id", "s")
        .withColumn("ts", to_timestamp_ntz($"s")).drop("s")
      val idx = Sessions.sessionize(dst, "user_id", "ts", 600, Seq("event_id"))
        .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
      assert(idx == Map(10L -> 1L, 11L -> 1L),
        s"DST must not split the session: $idx")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("stratified sample: deterministic, nested thresholds, 0/1 edges") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    def ids(fr: Map[String, Double], d: Double) =
      Sampling.stratifiedSample(df, "doc_id", "lang", fr, d)
        .select($"doc_id").as[Long].collect().toSet
    val quarter = ids(Map("en" -> 0.25), 0.5)
    assert(quarter == ids(Map("en" -> 0.25), 0.5), "rerun must be identical")
    // same id hash ⇒ a lower threshold selects a subset of a higher one
    val half = ids(Map("en" -> 0.5), 0.5)
    assert(quarter.subsetOf(half))
    // fractions land near their targets (md5 uniformity, ±5 pp at n=1000)
    val enKept = quarter.count(_ % 2 == 0) / 1000.0
    assert(enKept > 0.20 && enKept < 0.30, s"en keep rate $enKept")
    assert(ids(Map("en" -> 0.0), 0.0).isEmpty)
    assert(ids(Map("en" -> 1.0), 1.0).size == 2000)
    // fractions rounding to 65536/65536 must pass whole, not format as the
    // 5-char "10000" and collapse to ~6%
    assert(ids(Map("en" -> 0.999999), 0.999999).size == 2000)
  }

  test("pack sequences: bin = exclusive-cumsum window; oversize doc handled") {
    // budget 100; tokens 60,60,150,10 in id order within one group:
    // cum-before 0,60,120,270 → bins 0,0,1,2 (oversize doc starts bin 1,
    // pushes the next doc past bin 2's start)
    val df = Seq((1L, "a", 60), (2L, "a", 60), (3L, "a", 150), (4L, "a", 10),
        (5L, "b", 10)) // other group restarts at bin 0
      .toDF("doc_id", "grp", "n")
    val got = Sampling.packSequences(df, "doc_id", col("n"), 100, Seq("grp"))
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 0L))
  }

  test("domain mixture: α=0.5 upweights the small domain, weights sum to 1") {
    // domain A: 9 tokens, B: 1 token -> p = .9/.1
    val df = Seq((1L, "t t t t t", "A"), (2L, "t t t t", "A"), (3L, "t", "B"))
      .toDF("doc_id", "text", "source")
    val got = Sampling.domainMixtureWeights(df, "source",
        graft.functions.TextFunctions.tokenCount($"text").cast("long"), 0.5)
      .orderBy($"domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (pa, pb) = (math.pow(0.9, 0.5), math.pow(0.1, 0.5))
    val z = pa + pb
    assert(got.toSeq == Seq(
      ("A", 9L, 0.9, r6(pa / z), r6(pa / z / 0.9)),
      ("B", 1L, 0.1, r6(pb / z), r6(pb / z / 0.1))))
    // α < 1 boosts the minority domain above its token share
    assert(got(1)._4 > 0.1 && got(0)._4 < 0.9)
  }

  test("budget sample: greedy fill, boundary doc kept, repartition-stable") {
    // one domain, equal 10-token docs -> weight 1.0, alloc = budget; the
    // md5 order decides WHICH docs fill it. budget 35 keeps docs while
    // exclusive cumsum < 35: three full docs then the boundary doc
    // (cum_before 30 < 35) -> 4 kept, overshoot bounded by one doc.
    val df = (1L to 8L).map(i => (i, ("t " * 10).trim, "A"))
      .toDF("doc_id", "text", "source")
    val toks = graft.functions.TextFunctions.tokenCount($"text").cast("long")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.budgetSample(d, "doc_id", "source", toks, 35L)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val got = run(df)
    assert(got.length == 4 && got.map(_._2).forall(_ == 10L))
    assert(got.map(_._3).sorted == Seq(10L, 20L, 30L, 40L)) // greedy cumsum
    // deterministic under any partitioning
    assert(run(df.repartition(7)) == got)
    // the kept set is the md5-order prefix, not the id-order prefix
    val md5Order = (1L to 8L).sortBy(i =>
      java.security.MessageDigest.getInstance("MD5").digest(i.toString.getBytes)
        .map("%02x".format(_)).mkString)
    assert(got.map(_._1).toSet == md5Order.take(4).toSet)
    // budget >= corpus keeps everything
    assert(run(df.limit(2)).length == 2)
  }

  test("domain mixture: zero-token domain gets NULL boost, not 0/0") {
    val df = Seq((1L, "t t t t", "A"), (2L, "", "B"))
      .toDF("doc_id", "text", "source")
    val got = Sampling.domainMixtureWeights(df, "source",
        graft.functions.TextFunctions.tokenCount($"text").cast("long"), 0.5)
      .orderBy($"domain").collect()
    val b = got(1)
    assert(b.getLong(1) == 0L && b.getDouble(2) == 0.0)
    assert(b.isNullAt(4), "boost for an empty domain must be NULL")
    // the non-degenerate domain is untouched by the guard
    assert(got(0).getDouble(4) > 0.0)
  }
}
