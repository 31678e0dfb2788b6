package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

/** Window/TS builders: Polars null-until-full semantics, pct_change edges,
  * global z-score forms agreeing. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def w = Window.partitionBy($"k").orderBy($"t")

  test("pctChange: first row per key null, single-row group null") {
    val df = Seq(("a", 1, 100.0), ("a", 2, 110.0), ("a", 3, 99.0), ("b", 1, 50.0))
      .toDF("k", "t", "x")
    val out = df.withColumn("r", TimeSeries.pctChange($"x", w))
      .orderBy($"k", $"t").select($"r").collect()
    assert(out(0).isNullAt(0))
    assert(approxEqual(out(1).getDouble(0), 0.10, 1e-12))
    assert(approxEqual(out(2).getDouble(0), 99.0 / 110.0 - 1, 1e-12))
    assert(out(3).isNullAt(0)) // single-row group
  }

  test("pctChange: interior null → null on the null row, next row vs last non-null (polars)") {
    val df = Seq[(String, Int, java.lang.Double)](
      ("a", 1, 100.0), ("a", 2, null), ("a", 3, 120.0), ("a", 4, 132.0))
      .toDF("k", "t", "x")
    val out = df.withColumn("r", TimeSeries.pctChange($"x", w))
      .orderBy($"t").select($"r").collect()
    assert(out(0).isNullAt(0))
    assert(out(1).isNullAt(0)) // null price → null return
    // polars pct_change: denominator is the most-recent NON-NULL prior
    assert(approxEqual(out(2).getDouble(0), 0.20, 1e-12)) // 120/100 − 1
    assert(approxEqual(out(3).getDouble(0), 0.10, 1e-12)) // 132/120 − 1
  }

  test("rollingSum/Std/Mean: null until the window holds n rows") {
    val df = (1 to 6).map(i => ("a", i, i.toDouble)).toDF("k", "t", "x")
    val out = df.withColumn("s", TimeSeries.rollingSum($"x", w, 3))
      .withColumn("m", TimeSeries.rollingMean($"x", w, 3))
      .withColumn("sd", TimeSeries.rollingStd($"x", w, 3))
      .orderBy($"t").collect()
    assert(out(0).isNullAt(3) && out(1).isNullAt(3))
    assert(out(2).getAs[Double]("s") == 6.0) // 1+2+3
    assert(out(5).getAs[Double]("s") == 15.0) // 4+5+6
    assert(approxEqual(out(2).getAs[Double]("m"), 2.0, 1e-12))
    assert(approxEqual(out(2).getAs[Double]("sd"), 1.0, 1e-12))
  }

  test("rolling guards count only non-null observations") {
    val df = Seq[(String, Int, java.lang.Double)](
      ("a", 1, 1.0), ("a", 2, null), ("a", 3, 2.0), ("a", 4, 3.0))
      .toDF("k", "t", "x")
    val out = df.withColumn("s", TimeSeries.rollingSum($"x", w, 3))
      .orderBy($"t").collect()
    // window at t=3 holds rows {1,null,2} → 2 valid < 3 → null
    assert(out(2).isNullAt(3))
    // window at t=4 holds {null,2,3} → 2 valid < 3 → null (Polars counts
    // rows incl. nulls for window_size but min_periods defaults to size —
    // valid-count guard reproduces the null)
    assert(out(3).isNullAt(3))
  }

  test("zscoreGlobal window form equals aggregate-broadcast form") {
    val rnd = new scala.util.Random(1)
    val df = (1 to 500).map(i => ("k", i, rnd.nextGaussian() * 3 + 1))
      .toDF("k", "t", "x")
    val winForm = df.withColumn("z", TimeSeries.zscoreGlobal($"x"))
      .orderBy($"t").select($"z").as[Double].collect()
    val aggForm = TimeSeries.zscoreGlobalAgg(df, "x", "z")
      .orderBy($"t").select($"z").as[Double].collect()
    winForm.zip(aggForm).foreach { case (a, b) => assert(approxEqual(a, b, 1e-9)) }
  }

  test("equalWeight: 1/N per group") {
    val df = Seq(("d1", "x"), ("d1", "y"), ("d1", "z"), ("d2", "x"))
      .toDF("d", "t")
    val out = df.select($"d", TimeSeries.equalWeight(Seq("d")).as("w")).collect()
    out.foreach { r =>
      val expect = if (r.getString(0) == "d1") 1.0 / 3 else 1.0
      assert(approxEqual(r.getDouble(1), expect, 1e-12))
    }
  }
}
