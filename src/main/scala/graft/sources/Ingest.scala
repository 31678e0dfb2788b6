package graft.sources

import java.sql.Date
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion-boundary helpers (SURVEY.md §2.1 S5, S6, S8): the engine's
  * contract starts at DataFrames, but the reference's fetch patterns —
  * year-batched range requests, empty-result schema fallbacks, and a
  * generated market-calendar dimension — are engine concerns and live here.
  */
object Ingest {

  /** S5: empty-result fallback — a fetch that returned nothing still needs
    * the declared schema so downstream plans resolve
    * (stock_prices_flow.py:42-55). */
  def emptyWithSchema(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** S6: year-batched range fetch — split [start, end] into per-year
    * sub-ranges, fetch each, union by name (stock_prices_flow.py:72-90).
    * `fetch` receives (batchStart, batchEnd) inclusive. */
  def yearBatched(
      spark: SparkSession,
      start: Date,
      end: Date,
      schema: StructType)(fetch: (Date, Date) => DataFrame): DataFrame = {
    val s = start.toLocalDate
    val e = end.toLocalDate
    val batches = (s.getYear to e.getYear).map { y =>
      val b0 = if (y == s.getYear) s else java.time.LocalDate.of(y, 1, 1)
      val b1 = if (y == e.getYear) e else java.time.LocalDate.of(y, 12, 31)
      fetch(Date.valueOf(b0), Date.valueOf(b1))
    }
    if (batches.isEmpty) emptyWithSchema(spark, schema)
    else batches.reduce(_ unionByName _)
  }

  /** S8: generated weekday-calendar dimension table — `spark.range` over
    * the day span, weekend-filtered, minus an exclusion list (holidays).
    * The reference sources NYSE sessions from a market-calendar library;
    * holidays arrive here as a plain list/table. */
  def weekdayCalendar(
      spark: SparkSession,
      start: Date,
      end: Date,
      holidays: Seq[Date] = Nil): DataFrame = {
    import spark.implicits._
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      start.toLocalDate, end.toLocalDate)
    val cal = spark.range(days + 1)
      .select(date_add(lit(start), $"id".cast("int")).as("date"))
      .filter(!dayofweek($"date").isin(1, 7)) // Sunday=1, Saturday=7
    if (holidays.isEmpty) cal
    else cal.join(broadcast(holidays.toDF("h")), $"date" === $"h", "left_anti")
  }

  /** S7: minimal HTML-table extraction — the engine analogue of the
    * reference's `pd.read_html` on the constituents page
    * (universe_flow.py:16-35; a single staged document, parsed in-process
    * exactly like pandas does). Returns every `<table>` as a cell grid of
    * plain strings: inner tags stripped, standard entities unescaped,
    * whitespace trimmed. Regex-based for the wikitable shape — not a
    * general HTML parser (no nested tables). */
  /** ONE combined alternation — numeric and named forms decode in a single
    * left-to-right pass, so replacement output is never rescanned. Separate
    * sequential passes double-decode nestings whatever the order: e.g.
    * numeric-then-named turns "&#38;lt;" into "<" (numeric yields "&lt;",
    * the named pass then eats it), where html.unescape / pandas read_html
    * yield the literal "&lt;". */
  private val entityRe =
    "&(#(?:[xX][0-9a-fA-F]+|[0-9]+)|[a-zA-Z][a-zA-Z0-9]*);".r
  /** Named entities common on Wikipedia constituent pages (beyond the XML
    * five). `amp` decodes to "&" in the same single pass — safe because the
    * scan continues after the replacement, never over it. */
  private val namedEntities: Map[String, String] = Map(
    "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "ndash" -> "–", "mdash" -> "—",
    "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”",
    "hellip" -> "…", "minus" -> "−", "deg" -> "°",
    "plusmn" -> "±", "times" -> "×", "middot" -> "·",
    "sect" -> "§", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "euro" -> "€", "pound" -> "£",
    "eacute" -> "é", "egrave" -> "è", "aacute" -> "á",
    "agrave" -> "à", "iacute" -> "í", "oacute" -> "ó",
    "uacute" -> "ú", "auml" -> "ä", "ouml" -> "ö",
    "uuml" -> "ü", "ntilde" -> "ñ", "ccedil" -> "ç",
    "aring" -> "å", "oslash" -> "ø", "szlig" -> "ß")

  def htmlTables(html: String): Seq[Seq[Seq[String]]] = {
    val tableRe = "(?si)<table[^>]*>(.*?)</table>".r
    val rowRe = "(?si)<tr[^>]*>(.*?)</tr>".r
    val cellRe = "(?si)<t[hd][^>]*>(.*?)</t[hd]>".r
    // Single combined decode pass (see entityRe note): nested escapes like
    // "&amp;lt;" or "&#38;lt;" decode exactly once — to the literal "&lt;"
    // — matching html.unescape / pandas read_html.
    def clean(s: String): String = {
      val noTags = s.replaceAll("(?s)<[^>]*>", "")
      entityRe.replaceAllIn(noTags, m => {
        val g = m.group(1)
        val out =
          if (g.charAt(0) == '#') {
            // numeric entities (&#160; &#8211; &#x2013; ...) — pandas'
            // read_html fully unescapes these; &#160; (non-breaking space)
            // normalizes to a plain space like &nbsp;
            val digits = g.substring(1)
            val cp =
              try {
                if (digits.charAt(0) == 'x' || digits.charAt(0) == 'X')
                  Integer.parseInt(digits.substring(1), 16)
                else Integer.parseInt(digits)
              } catch { case _: NumberFormatException => -1 }
            if (cp == 160) " "
            // surrogate code points (U+D800–U+DFFF) pass isValidCodePoint
            // but would inject an unpaired surrogate — not valid text;
            // leave the reference literal like other malformed escapes
            else if (cp >= 0 && Character.isValidCodePoint(cp) &&
              !(cp >= 0xD800 && cp <= 0xDFFF)) new String(Character.toChars(cp))
            else m.matched // out-of-range reference: leave literal
          } else if (g == "amp") "&"
          else namedEntities.getOrElse(g, m.matched) // unknown: literal
        java.util.regex.Matcher.quoteReplacement(out)
      }).trim
    }
    tableRe.findAllMatchIn(html).map { tm =>
      rowRe.findAllMatchIn(tm.group(1)).map { rm =>
        cellRe.findAllMatchIn(rm.group(1)).map(cm => clean(cm.group(1))).toSeq
      }.toSeq.filter(_.nonEmpty)
    }.toSeq
  }

  /** One extracted HTML table as a string-typed DataFrame. Column names
    * come from the table's first row unless `columns` overrides them (the
    * Wikipedia changes table has a two-level header — pass explicit names
    * and skip both header rows, mirroring pandas' droplevel). Short rows
    * pad with null; long rows truncate; empty cells become null. */
  def htmlTableDf(
      spark: SparkSession,
      html: String,
      tableIndex: Int,
      columns: Option[Seq[String]] = None,
      skipRows: Int = 1): DataFrame = {
    val grid = htmlTables(html)(tableIndex)
    val names = columns.getOrElse(grid.head)
    val data = grid.drop(skipRows).map { r =>
      org.apache.spark.sql.Row.fromSeq(
        r.map(c => if (c.isEmpty) null else c)
          .padTo(names.length, null).take(names.length))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data),
      StructType(names.map(n =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType))))
  }

  /** universe_flow.py:46-54 `clean_current_constituents_df`: Symbol →
    * ticker, drop nulls, sort. */
  def cleanCurrentConstituents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    raw.select(col("Symbol").as("ticker"))
      .na.drop(Seq("ticker"))
      .orderBy(col("ticker"))
  }

  /** universe_flow.py:57-80 `clean_constituent_changes_df`: stack the
    * Added and Removed halves of the changes table into long form with an
    * `action` column, parse "June 22, 2025"-style dates, drop rows with no
    * ticker. Input columns: (effective_date, added_ticker, added_security,
    * removed_ticker, removed_security, reason) — the flattened two-level
    * header of the Wikipedia changes table. */
  def cleanConstituentChanges(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    def half(tickerCol: String, securityCol: String, action: String) =
      raw.select(col("effective_date"), col(tickerCol).as("ticker"),
        col(securityCol).as("security"), col("reason"),
        lit(action).as("action"))
    half("added_ticker", "added_security", "Added")
      .unionByName(half("removed_ticker", "removed_security", "Removed"))
      .withColumn("effective_date", to_date(col("effective_date"), "MMMM d, yyyy"))
      .na.drop(Seq("ticker"))
      .select(col("effective_date"), col("ticker"), col("security"),
        col("reason"), col("action"))
  }

  import java.time.{DayOfWeek, LocalDate}

  /** Easter Sunday for a Gregorian year (anonymous computus, the standard
    * published algorithm — same one every market-calendar library uses). */
  private[sources] def easterSunday(year: Int): LocalDate = {
    val a = year % 19
    val b = year / 100
    val c = year % 100
    val d = b / 4
    val e = b % 4
    val f = (b + 8) / 25
    val g = (b - f + 1) / 3
    val h = (19 * a + b - d - g + 15) % 30
    val i = c / 4
    val k = c % 4
    val l = (32 + 2 * e + 2 * i - h - k) % 7
    val m = (a + 11 * h + 22 * l) / 451
    val month = (h + l - 7 * m + 114) / 31
    val day = (h + l - 7 * m + 114) % 31 + 1
    LocalDate.of(year, month, day)
  }

  private def nthWeekday(year: Int, month: Int, dow: DayOfWeek, n: Int): LocalDate = {
    val first = LocalDate.of(year, month, 1)
    val offset = (dow.getValue - first.getDayOfWeek.getValue + 7) % 7
    first.plusDays(offset + 7L * (n - 1))
  }

  private def lastWeekday(year: Int, month: Int, dow: DayOfWeek): LocalDate = {
    val last = LocalDate.of(year, month, 1).plusMonths(1).minusDays(1)
    val offset = (last.getDayOfWeek.getValue - dow.getValue + 7) % 7
    last.minusDays(offset)
  }

  /** NYSE observance shift for fixed-date holidays: Saturday → preceding
    * Friday, Sunday → following Monday. */
  private def observed(d: LocalDate): LocalDate = d.getDayOfWeek match {
    case DayOfWeek.SATURDAY => d.minusDays(1)
    case DayOfWeek.SUNDAY   => d.plusDays(1)
    case _                  => d
  }

  /** S8 at reference fidelity: the rule-based NYSE full-day closures for a
    * year (calendar_flow.py:10-28 sources these from the NYSE schedule of
    * pandas_market_calendars; the rules themselves are public exchange
    * policy). Current-era rules — Juneteenth appears from 2022; New Year's
    * falling on Saturday is NOT shifted to Dec 31 (the exchange stays open,
    * e.g. 2021-12-31). Ad-hoc closures (mourning days, disasters) are not
    * rule-derivable and arrive via the `holidays` exclusion list of
    * [[weekdayCalendar]] / [[nyseCalendar]]. */
  def nyseHolidays(year: Int): Seq[Date] = {
    val newYears = {
      val ny = LocalDate.of(year, 1, 1)
      if (ny.getDayOfWeek == DayOfWeek.SATURDAY) None else Some(observed(ny))
    }
    val rules: Seq[LocalDate] = newYears.toSeq ++ Seq(
      nthWeekday(year, 1, DayOfWeek.MONDAY, 3),            // MLK Day
      nthWeekday(year, 2, DayOfWeek.MONDAY, 3),            // Washington's Birthday
      easterSunday(year).minusDays(2),                     // Good Friday
      lastWeekday(year, 5, DayOfWeek.MONDAY)) ++           // Memorial Day
      (if (year >= 2022) Seq(observed(LocalDate.of(year, 6, 19))) else Nil) ++ // Juneteenth
      Seq(
        observed(LocalDate.of(year, 7, 4)),                // Independence Day
        nthWeekday(year, 9, DayOfWeek.MONDAY, 1),          // Labor Day
        nthWeekday(year, 11, DayOfWeek.THURSDAY, 4),       // Thanksgiving
        observed(LocalDate.of(year, 12, 25)))              // Christmas
    rules.sorted.map(Date.valueOf)
  }

  /** The NYSE trading-session calendar for [start, end]: weekdays minus the
    * rule-based closures, minus any `extraClosures` (ad-hoc, e.g. days of
    * mourning). Drop-in source for the catalog `calendar` table. */
  def nyseCalendar(
      spark: SparkSession,
      start: Date,
      end: Date,
      extraClosures: Seq[Date] = Nil): DataFrame = {
    val years = start.toLocalDate.getYear to end.toLocalDate.getYear
    val holidays = years.flatMap(nyseHolidays) ++ extraClosures
    weekdayCalendar(spark, start, end, holidays)
  }
}
