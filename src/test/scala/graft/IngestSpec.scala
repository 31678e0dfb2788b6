package graft

import java.sql.Date
import org.apache.spark.sql.types._
import graft.sources.Ingest

/** Ingestion-boundary helpers: year batching, empty fallback, generated
  * weekday calendar. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("d0", DateType), StructField("d1", DateType)))

  test("yearBatched splits a multi-year range at year boundaries") {
    var calls = Vector.empty[(Date, Date)]
    val out = Ingest.yearBatched(spark,
      Date.valueOf("2022-11-15"), Date.valueOf("2024-02-10"), schema) { (a, b) =>
      calls :+= ((a, b))
      Seq((a, b)).toDF("d0", "d1")
    }
    assert(out.count() == 3)
    assert(calls == Vector(
      (Date.valueOf("2022-11-15"), Date.valueOf("2022-12-31")),
      (Date.valueOf("2023-01-01"), Date.valueOf("2023-12-31")),
      (Date.valueOf("2024-01-01"), Date.valueOf("2024-02-10"))))
  }

  test("empty fallback keeps the declared schema") {
    val e = Ingest.emptyWithSchema(spark, schema)
    assert(e.count() == 0 && e.schema == schema)
  }

  test("weekday calendar excludes weekends and holidays") {
    // 2024-01-01 (Mon, holiday) .. 2024-01-14 (Sun)
    val cal = Ingest.weekdayCalendar(spark,
      Date.valueOf("2024-01-01"), Date.valueOf("2024-01-14"),
      holidays = Seq(Date.valueOf("2024-01-01")))
    val days = cal.orderBy($"date").collect().map(_.getDate(0).toString)
    assert(days.toSeq == Seq(
      "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05",
      "2024-01-08", "2024-01-09", "2024-01-10", "2024-01-11", "2024-01-12"))
  }

  private val wikiHtml =
    """<html><body>
      |<table class="wikitable"><tbody>
      |<tr><th>Symbol</th><th>Security</th><th>GICS Sector</th></tr>
      |<tr><td><a href="/wiki/Apple">AAPL</a></td><td>Apple Inc.</td><td>Information Technology</td></tr>
      |<tr><td>BRK.B</td><td>Berkshire Hathaway</td><td>Financials</td></tr>
      |<tr><td>MMM</td><td>3M &amp; Co</td><td>Industrials</td></tr>
      |</tbody></table>
      |<table class="wikitable"><tbody>
      |<tr><th rowspan="2">Effective Date</th><th colspan="2">Added</th><th colspan="2">Removed</th><th rowspan="2">Reason</th></tr>
      |<tr><th>Ticker</th><th>Security</th><th>Ticker</th><th>Security</th></tr>
      |<tr><td>June 22, 2025</td><td>NEWCO</td><td>New Co</td><td>OLDCO</td><td>Old Co</td><td>Market cap change</td></tr>
      |<tr><td>March 3, 2025</td><td>ONLYADD</td><td>Only Add</td><td></td><td></td><td>Acquisition</td></tr>
      |</tbody></table>
      |</body></html>""".stripMargin

  test("S7: nested entity escapes decode once, not twice") {
    // "&amp;lt;" is the literal text "&lt;" — unescaping &amp; first would
    // double-decode it to "<"
    val t = Ingest.htmlTables(
      "<table><tr><td>&amp;lt;tag&amp;gt;</td><td>A &amp; B</td></tr></table>")
    assert(t.head.head == Seq("&lt;tag&gt;", "A & B"))
    // numeric-amp nestings decode once too: the single combined pass never
    // rescans replacement output, so "&#38;lt;" → "&lt;" (not "<") and
    // "&#38;amp;" → "&amp;" (not "&") — html.unescape parity
    val n = Ingest.htmlTables(
      "<table><tr><td>&#38;lt;</td><td>&#38;amp;</td><td>&#38;#60;</td></tr></table>")
    assert(n.head.head == Seq("&lt;", "&amp;", "&#60;"))
  }

  test("S7: numeric and named entities fully unescape (pd.read_html parity)") {
    val t = Ingest.htmlTables(
      "<table><tr>" +
        "<td>A&#160;B&#8211;C</td>" +                       // &#160; → space, &#8211; → en dash
        "<td>Moody&#39;s &ndash; Caf&eacute; &amp;#163;</td>" + // named + nested-escape guard
        "<td>&#x2019;ok&#X2019;</td>" +                     // hex, both x cases
        "<td>&#99999999;&bogus;&#55296;</td>" +             // out-of-range + unknown + surrogate: literal
        "</tr></table>")
    assert(t.head.head == Seq(
      "A B–C", "Moody's – Café &#163;", "’ok’", "&#99999999;&bogus;&#55296;"))
  }

  test("S7: html table extraction parses the wikitable shape") {
    val tables = Ingest.htmlTables(wikiHtml)
    assert(tables.length == 2)
    assert(tables(0).head == Seq("Symbol", "Security", "GICS Sector"))
    // inner <a> stripped, entities unescaped
    assert(tables(0)(1) == Seq("AAPL", "Apple Inc.", "Information Technology"))
    assert(tables(0)(3) == Seq("MMM", "3M & Co", "Industrials"))
    assert(tables(1)(2).head == "June 22, 2025")
  }

  test("S7: constituent cleaners mirror universe_flow's pandas cleaning") {
    val cur = Ingest.cleanCurrentConstituents(
      Ingest.htmlTableDf(spark, wikiHtml, 0))
    assert(cur.collect().map(_.getString(0)).toSeq == Seq("AAPL", "BRK.B", "MMM"))

    val changes = Ingest.cleanConstituentChanges(
      Ingest.htmlTableDf(spark, wikiHtml, 1,
        columns = Some(Seq("effective_date", "added_ticker", "added_security",
          "removed_ticker", "removed_security", "reason")),
        skipRows = 2)) // two-level header
    val rows = changes.collect().map(r => (r.getDate(0).toString,
      r.getString(1), r.getString(4))).toSet
    // the empty Removed cell on March 3 drops (no ticker), the rest stack
    assert(rows == Set(
      ("2025-06-22", "NEWCO", "Added"),
      ("2025-03-03", "ONLYADD", "Added"),
      ("2025-06-22", "OLDCO", "Removed")))
    // and the cleaned output feeds universe reconstruction directly
    val cal = Seq(Date.valueOf("2025-06-20"), Date.valueOf("2025-06-23"))
    val uni = graft.pipelines.Universe.reconstruct(
      cur, changes.select($"effective_date", $"ticker", $"action"),
      cal.toDF("date"))
    val members = uni.collect().map(r => (r.getDate(0).toString, r.getString(2))).toSet
    // OLDCO removed effective 6/22 (not a date in this calendar — snap drops
    // it, reference walk parity); AAPL/BRK.B/MMM present both days
    assert(members.contains(("2025-06-20", "AAPL")))
    assert(members.contains(("2025-06-23", "MMM")))
  }

  test("NYSE holidays match the published 2024-2026 closure schedule") {
    // 2024: NY Mon, MLK, Washington, Good Friday 3/29, Memorial, Juneteenth
    // Wed, July 4 Thu, Labor, Thanksgiving 11/28, Christmas Wed
    assert(Ingest.nyseHolidays(2024).map(_.toString) == Seq(
      "2024-01-01", "2024-01-15", "2024-02-19", "2024-03-29", "2024-05-27",
      "2024-06-19", "2024-07-04", "2024-09-02", "2024-11-28", "2024-12-25"))
    // 2025: Good Friday 4/18, Thanksgiving 11/27. (The 1/9 Carter mourning
    // closure is ad-hoc, not rule-derivable — arrives via extraClosures.)
    assert(Ingest.nyseHolidays(2025).map(_.toString) == Seq(
      "2025-01-01", "2025-01-20", "2025-02-17", "2025-04-18", "2025-05-26",
      "2025-06-19", "2025-07-04", "2025-09-01", "2025-11-27", "2025-12-25"))
    // 2026: Good Friday 4/3; July 4 is a Saturday → observed Friday 7/3
    assert(Ingest.nyseHolidays(2026).map(_.toString) == Seq(
      "2026-01-01", "2026-01-19", "2026-02-16", "2026-04-03", "2026-05-25",
      "2026-06-19", "2026-07-03", "2026-09-07", "2026-11-26", "2026-12-25"))
  }

  test("New Year's on Saturday is not observed (market open the prior Friday)") {
    // 2022-01-01 was a Saturday: NYSE stayed open 2021-12-31 and had no
    // New Year's closure in 2022
    val h2022 = Ingest.nyseHolidays(2022).map(_.toString)
    assert(!h2022.contains("2021-12-31") && !h2022.contains("2022-01-03"))
    assert(h2022.head == "2022-01-17") // first 2022 closure is MLK day
  }

  test("nyseCalendar: sessions around closures and ad-hoc exclusions") {
    // Thanksgiving week 2024: closed Thu 11/28, open Mon-Wed + Fri
    val cal = Ingest.nyseCalendar(spark,
      Date.valueOf("2024-11-25"), Date.valueOf("2024-11-29"))
    assert(cal.orderBy($"date").collect().map(_.getDate(0).toString).toSeq ==
      Seq("2024-11-25", "2024-11-26", "2024-11-27", "2024-11-29"))
    // ad-hoc closure (2025-01-09, Carter mourning) via extraClosures
    val jan25 = Ingest.nyseCalendar(spark,
      Date.valueOf("2025-01-06"), Date.valueOf("2025-01-10"),
      extraClosures = Seq(Date.valueOf("2025-01-09")))
    assert(jan25.orderBy($"date").collect().map(_.getDate(0).toString).toSeq ==
      Seq("2025-01-06", "2025-01-07", "2025-01-08", "2025-01-10"))
  }
}
