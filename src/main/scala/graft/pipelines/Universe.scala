package graft.pipelines

import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Historical index-membership ("universe") reconstruction — the relational
  * re-expression of the reference's imperative backward walk
  * (/root/reference/pipelines/universe_flow.py:81-134, SURVEY.md §2.5 W9).
  *
  * Reference semantics replicated exactly:
  *  - walk the calendar backwards from today's constituent set, inverting
  *    each change at its effective date; the snapshot at the effective date
  *    itself is taken BEFORE inverting, so a change is in force from its
  *    effective date (inclusive) onward;
  *  - multiple changes for one (ticker, date) are applied in stacked order
  *    (Added block first, then Removed) — walking backward the LAST applied
  *    inverse wins, so Removed dominates: the ticker was a member before
  *    that date;
  *  - the state on [last_change, today] is the current constituent set,
  *    regardless of what the last change says (the walk starts from it).
  *
  * Relational form: collapse changes per (ticker, date), derive validity
  * intervals per ticker with lead(), keep member intervals, range-join the
  * trading calendar. Scale: intervals ≈ #changes (thousands) — broadcast
  * side of the range join; the calendar × membership product streams.
  */
object Universe {

  /** @param currentConstituents (ticker)
    * @param changes (effective_date: Date, ticker, action ∈ {Added,Removed})
    * @param calendar (date: Date)
    * @param broadcastIntervalLimit crossover between the two range-join
    *        strategies (see below); default comfortably above any real
    *        index's change count, so reference workloads always broadcast
    * @return (date, year, ticker) sorted, one row per member per date
    */
  def reconstruct(
      currentConstituents: DataFrame,
      changes: DataFrame,
      calendar: DataFrame,
      broadcastIntervalLimit: Long = 1000000L): DataFrame = {
    val s = changes.sparkSession
    import s.implicits._

    // The reference's backward walk (universe_flow.py:81-134) only inverts a
    // change when the walk's calendar date EQUALS its effective_date — a
    // change effective on a non-trading day is never applied and therefore
    // never influences membership. Replicate by dropping such changes before
    // interval construction (calendar is small → broadcast semi-join).
    val onCalendar = changes.join(
      broadcast(calendar.select($"date".as("effective_date")).distinct()),
      Seq("effective_date"), "left_semi")

    // Collapse per (ticker, date): Removed dominates (last-applied inverse).
    val collapsed = onCalendar
      .groupBy($"ticker", $"effective_date")
      .agg(max(when($"action" === "Removed", lit(1)).otherwise(lit(0))).as("has_removed"))
      .select($"ticker", $"effective_date",
        when($"has_removed" === 1, lit("Removed")).otherwise(lit("Added")).as("action"))

    val w = Window.partitionBy($"ticker").orderBy($"effective_date")
    val withNext = collapsed
      .withColumn("next_date", lead($"effective_date", 1).over(w))
      .withColumn("next_action", lead($"action", 1).over(w))
      .withColumn("rn", row_number().over(w))

    val current = currentConstituents.select($"ticker").distinct()

    // Interval pieces, member==true only:
    //  (-inf, first_change):       member iff first action == Removed
    //  [change_i, change_{i+1}):   member iff next action == Removed
    //  [last_change, +inf):        member iff ticker in current set
    val before = withNext.filter($"rn" === 1 && $"action" === "Removed")
      .select($"ticker", lit(null).cast("date").as("lo"), $"effective_date".as("hi"))
    val mid = withNext.filter($"next_action" === "Removed")
      .select($"ticker", $"effective_date".as("lo"), $"next_date".as("hi"))
    val tail = withNext.filter($"next_date".isNull)
      .join(current, Seq("ticker"), "left_semi")
      .select($"ticker", $"effective_date".as("lo"), lit(null).cast("date").as("hi"))
    // current members with no change history: members on (-inf, +inf)
    val always = current.join(collapsed.select($"ticker").distinct(),
        Seq("ticker"), "left_anti")
      .select($"ticker", lit(null).cast("date").as("lo"), lit(null).cast("date").as("hi"))

    val intervals = before.unionByName(mid).unionByName(tail).unionByName(always)

    // Strategy decision from a cheap UPPER BOUND on the interval count —
    // |before|+|mid|+|tail| ≤ |collapsed changes| and |always| ≤ |current|,
    // so two base-table counts suffice. This avoids both evaluating the
    // change-collapse DAG twice (a count on `intervals` would) and a
    // persist whose lifecycle no caller could own (a leaked cache block per
    // reconstruct call in a long-lived daily driver). The bound only ever
    // switches to the shuffle strategy EARLY, which is the safe direction.
    val intervalBound = changes.count() + currentConstituents.count()

    // Range-join strategy switch. Intervals ≈ #changes: for any real index
    // (thousands) the broadcast nested-loop is optimal — one pass over the
    // calendar, no shuffle. Past the crossover (universes of millions of
    // entities) a broadcast NLJ is a scale-killer, so switch to an
    // equi-join: clamp open interval ends to the calendar span, explode
    // each interval into the MONTHS it covers, hash-join calendar rows to
    // interval-months, then apply the exact range predicate. Cost is one
    // shuffle on the month key with ~interval-length/30 fan-out — bounded,
    // partitionable, and skew-free (months distribute evenly).
    val joined =
      if (intervalBound <= broadcastIntervalLimit)
        calendar.select($"date")
          .join(broadcast(intervals),
            ($"lo".isNull || $"date" >= $"lo") && ($"hi".isNull || $"date" < $"hi"))
      else {
        val span = calendar.agg(min($"date").as("mn"), max($"date").as("mx"))
          .collect().head
        val mn = span.getDate(0)
        val mxNext = Date.valueOf(span.getDate(1).toLocalDate.plusDays(1))
        // clamp BOTH ends into the calendar span — not just null ones: a
        // non-null lo years before the span (or hi after it) would explode
        // one row per month across a gap that can never join a calendar
        // date. Calendar dates all lie in [mn, mxNext), so the clamp cannot
        // change which (date, interval) pairs survive the range predicate.
        val clamped = intervals.select($"ticker",
            greatest(coalesce($"lo", lit(mn)), lit(mn)).as("lo"),
            least(coalesce($"hi", lit(mxNext)), lit(mxNext)).as("hi")) // hi stays exclusive
          .filter($"lo" < $"hi")
        val bucketed = clamped.select($"ticker", $"lo", $"hi",
          explode(sequence(trunc($"lo", "month"),
            trunc(date_sub($"hi", 1), "month"),
            expr("interval 1 month"))).as("__mon"))
        calendar.select($"date", trunc($"date", "month").as("__mon"))
          .join(bucketed, Seq("__mon"))
          .filter($"date" >= $"lo" && $"date" < $"hi")
      }
    joined
      .select($"date", year($"date").as("year"), $"ticker")
      .orderBy($"date", $"ticker")
  }
}
