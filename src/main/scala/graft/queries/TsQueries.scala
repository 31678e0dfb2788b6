package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType
import graft.functions.GraftFunctions
import graft.ops.{Ewm, RollingOls, TimeSeries}
import Tables.t

/** SURVEY.md §2.5 window / time-series operators (W1-W10, A4 panel
  * z-score, W4 EWM, W5 rolling OLS) on the lineitem "panel":
  * entity = l_partkey (≙ ticker), time = l_shipdate (≙ date),
  * measure = l_extendedprice (≙ close). Shipdate ties are broken by
  * (l_orderkey, l_linenumber, l_suppkey) — together with the partkey this
  * is a verified-unique total order, the same the oracle SQL uses.
  *
  * All rolling ops carry the Polars null-until-window-full guard
  * (SURVEY §7.4.3). Each is one window pass: shuffle on the entity key,
  * sorted scan per partition — no self-joins, scales linearly in rows.
  */
object TsQueries {

  private val orderCols = Seq("l_shipdate", "l_orderkey", "l_linenumber", "l_suppkey")

  /** W1 returns panel: per-part price series → simple returns. Factor-like
    * columns (quantity, discount) ride along so downstream regressions need
    * no self-join. */
  private def returnsPanel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = TimeSeries.entityWindow(Seq("l_partkey"), orderCols)
    t(s, dir, "lineitem")
      .select($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
        $"l_suppkey", $"l_extendedprice", $"l_quantity", $"l_discount")
      .withColumn("ret", TimeSeries.pctChange($"l_extendedprice", w))
  }

  /** Matching oracle CTE: identical window, identical arithmetic. Plain LAG
    * is exact here because l_extendedprice is never null; pctChange's
    * most-recent-non-null denominator only diverges on interior nulls. */
  private val retCte =
    """WITH panel AS (
      |  SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey,
      |         l_extendedprice, l_quantity, l_discount,
      |         l_extendedprice / LAG(l_extendedprice) OVER (
      |           PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_suppkey) - 1.0 AS ret
      |  FROM lineitem)""".stripMargin

  private val keyOrder = "l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey"
  private val winOrder = "PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_suppkey"

  private def keyed(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.orderBy((Seq($"l_partkey") ++ orderCols.map(col)): _*)
  }

  val defs: Seq[QueryDef] = Seq(

    // W1: pct_change per entity (returns_flow.py:15-24). Row-local ratio of
    // identical doubles → bitwise deterministic, no rounding.
    QueryDef("w1_pct_change",
      (s, dir) => {
        import s.implicits._
        keyed(returnsPanel(s, dir))
          .select($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
            $"l_suppkey", $"ret")
      },
      Some(s"""$retCte
              |SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey, ret
              |FROM panel ORDER BY $keyOrder""".stripMargin)),

    // W2: 21-row trailing sum of -log1p(ret), null until full
    // (reversal signal, reversal_flow.py:12-29).
    QueryDef("w2_rolling_sum",
      (s, dir) => {
        import s.implicits._
        val w = TimeSeries.entityWindow(Seq("l_partkey"), orderCols)
        keyed(returnsPanel(s, dir)
          .withColumn("mom", -log1p($"ret"))
          .withColumn("signal",
            round(TimeSeries.rollingSum($"mom", w, 21), 6) + lit(0.0)))
          .select($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
            $"l_suppkey", $"signal")
      },
      Some(s"""$retCte
              |SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey,
              |       ROUND(CASE WHEN COUNT(-LN(1.0 + ret)) OVER w21 >= 21
              |                  THEN SUM(-LN(1.0 + ret)) OVER w21 END, 6) + 0.0 AS signal
              |FROM panel
              |WINDOW w21 AS ($winOrder ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
              |ORDER BY $keyOrder""".stripMargin)),

    // W3: trailing sample std of returns, null until full (idio vol shape,
    // factor_model_flow.py:94-104).
    QueryDef("w3_rolling_std",
      (s, dir) => {
        import s.implicits._
        val w = TimeSeries.entityWindow(Seq("l_partkey"), orderCols)
        keyed(returnsPanel(s, dir)
          .withColumn("vol", round(TimeSeries.rollingStd($"ret", w, 10), 6)))
          .select($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
            $"l_suppkey", $"vol")
      },
      Some(s"""$retCte
              |SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey,
              |       ROUND(CASE WHEN COUNT(ret) OVER w10 >= 10
              |                  THEN STDDEV_SAMP(ret) OVER w10 END, 6) AS vol
              |FROM panel
              |WINDOW w10 AS ($winOrder ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
              |ORDER BY $keyOrder""".stripMargin)),

    // W4: EWM mean, Polars adjust=True semantics (factor_model_flow.py:87).
    // Native O(1)-state window aggregate (EwmMeanExpr); the numerically-
    // stable streaming variant is Ewm.ewmMeanStable (ScalaTest-verified
    // equal). The oracle replays the SAME recurrence (num' = num·decay + x,
    // den' = den·decay + 1, nulls decay without adding) as a recursive CTE
    // stepping rn → rn+1 per key — bitwise-identical op sequence, so it
    // has NO key-length bound (the previous closed-form cum(x·2^(rn/5))
    // oracle overflowed past ~5115 rows/key; this one is O(rows) at any
    // series length — sf1-scale keys included). The decay constant is
    // embedded as Scala's shortest-roundtrip double string so both engines
    // multiply by the identical double. `+ 0.0` after the round on both
    // sides per the sign-zero discipline (QueryDef scaladoc).
    QueryDef("w4_ewm_mean",
      (s, dir) => {
        import s.implicits._
        GraftFunctions.register(s)
        val w = TimeSeries.entityWindow(Seq("l_partkey"), orderCols)
        keyed(returnsPanel(s, dir)
          .withColumn("ewm",
            round(GraftFunctions.ewm_mean($"ret", 5.0).over(w), 6) + lit(0.0)))
          .select($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
            $"l_suppkey", $"ewm")
      },
      Some {
        val decay = math.pow(2.0, -1.0 / 5.0).toString
        s"""WITH RECURSIVE panel AS (
           |  SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey,
           |         l_extendedprice / LAG(l_extendedprice) OVER (
           |           $winOrder) - 1.0 AS ret
           |  FROM lineitem),
           |idx AS (
           |  SELECT *, ROW_NUMBER() OVER ($winOrder) AS rn FROM panel),
           |rec AS (
           |  SELECT l_partkey, rn, l_shipdate, l_orderkey, l_linenumber, l_suppkey,
           |         COALESCE(ret, CAST(0.0 AS DOUBLE)) AS num,
           |         CASE WHEN ret IS NULL THEN CAST(0.0 AS DOUBLE)
           |              ELSE CAST(1.0 AS DOUBLE) END AS den
           |  FROM idx WHERE rn = 1
           |  UNION ALL
           |  SELECT i.l_partkey, i.rn, i.l_shipdate, i.l_orderkey, i.l_linenumber,
           |         i.l_suppkey,
           |         r.num * CAST('$decay' AS DOUBLE)
           |           + COALESCE(i.ret, CAST(0.0 AS DOUBLE)),
           |         r.den * CAST('$decay' AS DOUBLE)
           |           + CASE WHEN i.ret IS NULL THEN CAST(0.0 AS DOUBLE)
           |                  ELSE CAST(1.0 AS DOUBLE) END
           |  FROM rec r JOIN idx i
           |    ON i.l_partkey = r.l_partkey AND i.rn = r.rn + 1)
           |SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey,
           |       ROUND(CASE WHEN den > 0.0 THEN num / den END, 6) + 0.0 AS ewm
           |FROM rec ORDER BY $keyOrder""".stripMargin
      }),

    // W5: rolling multi-factor OLS (factor_model_flow.py:13-73) — custom
    // streaming kernel; not SQL-expressible at K>1, driver does a
    // rows-only check; ScalaTest holds the golden/property coverage.
    QueryDef("w5_rolling_ols",
      (s, dir) => {
        import s.implicits._
        val withF = returnsPanel(s, dir)
          .withColumn("f_disc", log1p($"l_discount" * lit(10.0)))
          .withColumn("f_qty", $"l_quantity" / lit(25.0) - lit(1.0))
        keyed(RollingOls.rollingOls(withF, Seq("l_partkey"), orderCols,
            "ret", Seq("f_disc", "f_qty"), 15)
          .filter($"const".isNotNull))
          .select($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
            $"l_suppkey",
            (round($"const", 6) + lit(0.0)).as("alpha"),
            (round($"b_f_disc", 6) + lit(0.0)).as("b_disc"),
            (round($"b_f_qty", 6) + lit(0.0)).as("b_qty"),
            (round($"residual", 6) + lit(0.0)).as("residual"))
      },
      // K=2 OLS has a covariance closed form (Cramer on the 2x2 normal
      // equations), so even the multi-factor kernel is oracle-checked:
      // b = inv([[V1,C12],[C12,V2]])·[C1y,C2y], a = my - b1 m1 - b2 m2.
      // Frames overlapping the per-key leading null row are excluded by the
      // valid-count guard on both sides, so every compared frame is
      // all-valid and the sample-covariance statistics align exactly.
      Some(s"""$retCte, withf AS (
              |  SELECT *, LN(1.0 + l_discount * 10.0) AS f_disc, l_quantity / 25.0 - 1.0 AS f_qty FROM panel),
              |stats AS (
              |  SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey,
              |         ret, f_disc, f_qty,
              |         COUNT(ret) OVER w15 AS nv,
              |         AVG(ret) OVER w15 AS my, AVG(f_disc) OVER w15 AS m1, AVG(f_qty) OVER w15 AS m2,
              |         COVAR_SAMP(f_disc, ret) OVER w15 AS c1y, COVAR_SAMP(f_qty, ret) OVER w15 AS c2y,
              |         VAR_SAMP(f_disc) OVER w15 AS v1, VAR_SAMP(f_qty) OVER w15 AS v2,
              |         COVAR_SAMP(f_disc, f_qty) OVER w15 AS c12
              |  FROM withf
              |  WINDOW w15 AS ($winOrder ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)),
              |solved AS (
              |  SELECT *,
              |         (c1y * v2 - c2y * c12) / NULLIF(v1 * v2 - c12 * c12, 0.0) AS b1,
              |         (c2y * v1 - c1y * c12) / NULLIF(v1 * v2 - c12 * c12, 0.0) AS b2
              |  FROM stats WHERE nv >= 15)
              |SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey,
              |       ROUND(my - b1 * m1 - b2 * m2, 6) + 0.0 AS alpha,
              |       ROUND(b1, 6) + 0.0 AS b_disc,
              |       ROUND(b2, 6) + 0.0 AS b_qty,
              |       ROUND(ret - (my - b1 * m1 - b2 * m2) - b1 * f_disc - b2 * f_qty, 6) + 0.0 AS residual
              |FROM solved
              |ORDER BY $keyOrder""".stripMargin)),

    // W6: rolling single-factor beta = cov/var closed form
    // (betas_flow.py:14-56).
    QueryDef("w6_rolling_beta",
      (s, dir) => {
        import s.implicits._
        val w = TimeSeries.entityWindow(Seq("l_partkey"), orderCols)
        keyed(returnsPanel(s, dir)
          .withColumn("bench", $"l_quantity" / lit(25.0) - lit(1.0))
          .withColumn("beta",
            round(TimeSeries.rollingBeta($"ret", $"bench", w, 15), 6) + lit(0.0)))
          .select($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
            $"l_suppkey", $"beta")
      },
      Some(s"""$retCte, withb AS (
              |  SELECT *, l_quantity / 25.0 - 1.0 AS bench FROM panel)
              |SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey,
              |       ROUND(CASE WHEN COUNT(CASE WHEN ret IS NOT NULL AND bench IS NOT NULL THEN 1 END) OVER w15 >= 15
              |                  THEN COVAR_SAMP(ret, bench) OVER w15 / NULLIF(VAR_SAMP(bench) OVER w15, 0.0) END, 6) + 0.0 AS beta
              |FROM withb
              |WINDOW w15 AS ($winOrder ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
              |ORDER BY $keyOrder""".stripMargin)),

    // W7: rolling pairwise covariance matrix over daily factor series
    // (factor_covariances_flow.py:10-29): pivot-free — self-join the pairs,
    // one window pass per pair partition.
    QueryDef("w7_rolling_covar",
      (s, dir) => {
        import s.implicits._
        val daily = t(s, dir, "lineitem")
          .groupBy($"l_returnflag".as("f"), $"l_shipdate".cast(DateType).as("d"))
          .agg(avg($"l_quantity").as("q"))
        val a = daily.select($"f".as("f1"), $"d", $"q".as("q1"))
        val b = daily.select($"f".as("f2"), $"d", $"q".as("q2"))
        val pairs = a.join(b, Seq("d")).filter($"f1" <= $"f2")
        val w = TimeSeries.entityWindow(Seq("f1", "f2"), Seq("d"))
        pairs
          .withColumn("cov",
            round(TimeSeries.rollingCovar($"q1", $"q2", w, 30), 6) + lit(0.0))
          .select($"f1", $"f2", $"d", $"cov")
          .orderBy($"f1", $"f2", $"d")
      },
      Some("""WITH daily AS (
             |  SELECT l_returnflag AS f, CAST(l_shipdate AS DATE) AS d, AVG(l_quantity) AS q
             |  FROM lineitem GROUP BY 1, 2),
             |pairs AS (
             |  SELECT a.f AS f1, b.f AS f2, a.d AS d, a.q AS q1, b.q AS q2
             |  FROM daily a JOIN daily b ON a.d = b.d WHERE a.f <= b.f)
             |SELECT f1, f2, d,
             |       ROUND(CASE WHEN COUNT(CASE WHEN q1 IS NOT NULL AND q2 IS NOT NULL THEN 1 END) OVER w30 >= 30
             |                  THEN COVAR_SAMP(q1, q2) OVER w30 END, 6) + 0.0 AS cov
             |FROM pairs
             |WINDOW w30 AS (PARTITION BY f1, f2 ORDER BY d ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
             |ORDER BY f1, f2, d""".stripMargin)),

    // A4: GLOBAL panel z-score (reversal_flow.py:33-43 — deliberately not
    // per-date). Aggregate-then-broadcast form, no single-partition window.
    QueryDef("a4_panel_zscore",
      (s, dir) => {
        import s.implicits._
        val panel = returnsPanel(s, dir).filter($"ret".isNotNull)
        keyed(TimeSeries.zscoreGlobalAgg(panel, "ret", "score"))
          .select($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
            $"l_suppkey", (round($"score", 6) + lit(0.0)).as("score"))
      },
      Some(s"""$retCte
              |SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey,
              |       ROUND((ret - AVG(ret) OVER ()) / NULLIF(STDDEV_SAMP(ret) OVER (), 0.0), 6) + 0.0 AS score
              |FROM panel WHERE ret IS NOT NULL
              |ORDER BY $keyOrder""".stripMargin)),

    // W9: effective-dated interval membership reconstruction (universe
    // shape, universe_flow.py:81-134): per-entity validity interval,
    // range-joined to the date dimension, membership count per date.
    QueryDef("w9_interval_membership",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val intervals = o.groupBy($"o_custkey")
          .agg(min($"o_orderdate".cast(DateType)).as("lo"),
            max($"o_orderdate".cast(DateType)).as("hi"))
        val dates = o.select($"o_orderdate".cast(DateType).as("d")).distinct()
        dates.join(intervals, $"d" >= $"lo" && $"d" <= $"hi")
          .groupBy($"d").agg(count(lit(1)).as("n_members"))
          .orderBy($"d")
      },
      Some("""WITH intervals AS (
             |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS lo, MAX(CAST(o_orderdate AS DATE)) AS hi
             |  FROM orders GROUP BY 1),
             |dates AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
             |SELECT d, COUNT(*) AS n_members
             |FROM dates JOIN intervals ON d >= lo AND d <= hi
             |GROUP BY d ORDER BY d""".stripMargin)),

    // W10: trailing-n trading dates (utils/calendar.py:15-19).
    QueryDef("w10_trailing_dates",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").select($"l_shipdate".cast(DateType).as("d"))
          .distinct().orderBy($"d".desc).limit(30)
      },
      Some("SELECT DISTINCT CAST(l_shipdate AS DATE) AS d FROM lineitem ORDER BY d DESC LIMIT 30"))
  )
}
