package graft

import java.sql.Date
import graft.pipelines.Universe

/** Relational universe reconstruction vs a direct port of the reference's
  * imperative backward walk (universe_flow.py:81-134) — the property test
  * SURVEY §7.4.5 calls for, covering re-adds, removals restoring old
  * members, same-date add+remove, and change-log/current-set conflicts. */
class UniverseSpec extends SparkSpec {
  import spark.implicits._

  /** Direct port of the reference loop (test oracle). */
  private def referenceWalk(
      current: Set[String],
      changes: Seq[(Date, String, String)], // (effective_date, ticker, action)
      calendar: Seq[Date]): Seq[(Date, String)] = {
    val byDate = changes.groupBy(_._1)
    var constituents = current
    val out = scala.collection.mutable.ArrayBuffer.empty[(Date, String)]
    calendar.sortBy(_.getTime).reverse.foreach { date =>
      constituents.toSeq.sorted.foreach(t => out += ((date, t)))
      byDate.get(date).foreach { evs =>
        // stacked order: Added block first, then Removed (reference stacking)
        evs.sortBy(e => if (e._3 == "Added") 0 else 1).foreach {
          case (_, t, "Added") => constituents -= t
          case (_, t, "Removed") => constituents += t
          case _ =>
        }
      }
    }
    out.toSeq.sortBy(r => (r._1.getTime, r._2))
  }

  private def d(s: String) = Date.valueOf(s)

  test("matches reference walk on crafted edge cases") {
    // calendar has weekend-like gaps (6th/7th, 13th/14th missing) so
    // non-trading-day changes are exercised
    val calendar = (1 to 20).filterNot(Seq(6, 7, 13, 14).contains)
      .map(i => d(f"2024-01-$i%02d"))
    val current = Set("AAA", "BBB", "EEE")
    val changes = Seq(
      (d("2024-01-05"), "CCC", "Removed"), // CCC was member before the 5th
      (d("2024-01-05"), "BBB", "Added"),   // BBB joined on the 5th
      (d("2024-01-10"), "DDD", "Added"),   // added then removed
      (d("2024-01-15"), "DDD", "Removed"),
      (d("2024-01-12"), "CCC", "Added"),   // re-add of a removed ticker
      (d("2024-01-12"), "CCC", "Removed"), // ...same-date add+remove
      (d("2024-01-13"), "AAA", "Added"),   // non-trading day: walk never
      (d("2024-01-14"), "BBB", "Removed"), // applies these — must be ignored
      (d("2024-01-18"), "EEE", "Added"))   // current member added recently
    val expected = referenceWalk(current, changes, calendar)

    val got = Universe.reconstruct(
        current.toSeq.toDF("ticker"),
        changes.toDF("effective_date", "ticker", "action"),
        calendar.toDF("date"))
      .select($"date", $"ticker").as[(Date, String)].collect().toSeq
      .sortBy(r => (r._1.getTime, r._2))
    assert(got == expected)
  }

  test("matches reference walk on randomized change logs") {
    val rnd = new scala.util.Random(3)
    val tickers = (1 to 12).map(i => s"T$i")
    // changes draw from ALL days; the calendar skips "weekends" (every 6th
    // and 7th day) so ~2/7 of changes land on non-trading days
    val allDays = (1 to 28).map(i => d(f"2023-06-$i%02d"))
    val calendar = (1 to 28).filter(i => i % 7 != 6 && i % 7 != 0)
      .map(i => d(f"2023-06-$i%02d"))
    (1 to 5).foreach { trial =>
      val current = tickers.filter(_ => rnd.nextBoolean()).toSet
      val changes = (1 to 15).map { _ =>
        (allDays(rnd.nextInt(allDays.length)),
          tickers(rnd.nextInt(tickers.length)),
          if (rnd.nextBoolean()) "Added" else "Removed")
      }.distinct
      val expected = referenceWalk(current, changes, calendar)
      val got = Universe.reconstruct(
          current.toSeq.toDF("ticker"),
          changes.toDF("effective_date", "ticker", "action"),
          calendar.toDF("date"))
        .select($"date", $"ticker").as[(Date, String)].collect().toSeq
        .sortBy(r => (r._1.getTime, r._2))
      assert(got == expected, s"trial $trial mismatch")
    }
  }

  test("shuffle range-join strategy (interval limit 0) equals the broadcast strategy") {
    // same crafted case as above, forced down the month-bucketed equi-join
    // path — output must be identical row-for-row
    val calendar = (1 to 20).filterNot(Seq(6, 7, 13, 14).contains)
      .map(i => d(f"2024-01-$i%02d"))
    val current = Set("AAA", "BBB", "EEE")
    val changes = Seq(
      (d("2024-01-05"), "CCC", "Removed"),
      (d("2024-01-05"), "BBB", "Added"),
      (d("2024-01-10"), "DDD", "Added"),
      (d("2024-01-15"), "DDD", "Removed"),
      (d("2024-01-12"), "CCC", "Added"),
      (d("2024-01-12"), "CCC", "Removed"),
      (d("2024-01-18"), "EEE", "Added"))
    def run(limit: Long) = Universe.reconstruct(
        current.toSeq.toDF("ticker"),
        changes.toDF("effective_date", "ticker", "action"),
        calendar.toDF("date"), broadcastIntervalLimit = limit)
      .select($"date", $"ticker").as[(Date, String)].collect().toSeq
      .sortBy(r => (r._1.getTime, r._2))
    val viaBroadcast = run(1000000L)
    val viaShuffle = run(0L)
    assert(viaShuffle == viaBroadcast)
    assert(viaShuffle.nonEmpty)
  }

  test("shuffle strategy clamps out-of-span interval ends to the calendar") {
    // OLD joined the index years before the calendar starts and QQQ leaves
    // years after it ends: without clamping non-null ends the month-bucket
    // path would explode one row per month across those gaps (hundreds of
    // unjoinable rows); with the clamp both strategies stay byte-equal
    val calendar = (0 until 30).map(i =>
      Date.valueOf(java.time.LocalDate.of(2024, 1, 2).plusDays(i.toLong)))
    val current = Set("KEEP", "QQQ")
    val changes = Seq(
      (d("2005-06-15"), "OLD", "Added"),
      (d("2024-01-10"), "OLD", "Removed"),
      (d("2024-01-20"), "QQQ", "Added"))
    def run(limit: Long) = Universe.reconstruct(
        current.toSeq.toDF("ticker"),
        changes.toDF("effective_date", "ticker", "action"),
        calendar.toDF("date"), broadcastIntervalLimit = limit)
      .select($"date", $"ticker").as[(Date, String)].collect().toSeq
      .sortBy(r => (r._1.getTime, r._2))
    val got = run(0L)
    assert(got == run(1000000L))
    // OLD is present from the calendar start until its removal
    val old = got.filter(_._2 == "OLD").map(_._1)
    assert(old.nonEmpty && old.min == calendar.head && old.max.before(d("2024-01-10")))
  }

  test("shuffle strategy spans month boundaries and open-ended intervals") {
    // calendar across 3 months; one never-changed member (open interval on
    // both ends) and one member with a mid-span removal
    val calendar = (0 until 90).map(i =>
      Date.valueOf(java.time.LocalDate.of(2024, 1, 2).plusDays(i.toLong)))
    val current = Set("KEEP")
    val changes = Seq((calendar(40), "GONE", "Removed"))
    def run(limit: Long) = Universe.reconstruct(
        current.toSeq.toDF("ticker"),
        changes.toDF("effective_date", "ticker", "action"),
        calendar.toDF("date"), broadcastIntervalLimit = limit)
      .select($"date", $"ticker").as[(Date, String)].collect().toSeq
      .sortBy(r => (r._1.getTime, r._2))
    assert(run(0L) == run(1000000L))
    // GONE is a member strictly before its removal date
    val gone = run(0L).filter(_._2 == "GONE").map(_._1)
    assert(gone.nonEmpty && gone.max.before(calendar(40)) &&
      gone.size == 40)
  }
}
