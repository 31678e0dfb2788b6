package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TimeSeries
import graft.queries.{CoreQueries, ExtraQueries, QueryDef, TsQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one named entry per implemented operator from
  * SURVEY.md §2 (and the training-data extras), each with a DuckDB oracle
  * in `oracleSql` when SQL-expressible. `entry` is the flagship
  * reference-shaped pipeline slice (SURVEY §7.2): returns → 21-day
  * reversal momentum → panel z-score → vol join → expected alpha.
  */
object SparkEntry {

  private val all: Seq[QueryDef] =
    CoreQueries.defs ++ TsQueries.defs ++ ExtraQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 21-day reversal alpha panel (reversal_flow.py:12-57 shape) on the
    * lineitem panel analog: scan → pct_change (W1) → -Σ₂₁log1p (W2) →
    * global z-score (A4) → rolling-vol join (J3/W3) → α = IC·score·vol. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ic = 0.05
    val w = TimeSeries.entityWindow(Seq("l_partkey"),
      Seq("l_shipdate", "l_orderkey", "l_linenumber"))
    val panel = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .withColumn("ret", TimeSeries.pctChange($"l_extendedprice", w))
      .withColumn("signal", TimeSeries.rollingSum(-log1p($"ret"), w, 21))
      .withColumn("vol", TimeSeries.rollingStd($"ret", w, 10))
      .filter($"signal".isNotNull && $"vol".isNotNull)
    TimeSeries.zscoreGlobalAgg(panel, "signal", "score")
      .withColumn("alpha", lit(ic) * $"score" * $"vol")
      .orderBy($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber")
      .select($"l_partkey", $"l_shipdate", $"score", $"vol", $"alpha")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
