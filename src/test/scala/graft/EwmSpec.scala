package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.Ewm

/** EWM kernel vs pandas/Polars golden values (adjust=True, half-life form,
  * ignore_nulls=False) and window-form ≡ streaming-form equivalence. */
class EwmSpec extends SparkSpec {
  import spark.implicits._

  // pandas: Series.ewm(halflife=60, adjust=True).mean() of the series below
  private val xs = Seq(1.0, 2.0, -0.5, 3.0, 0.0, 1.5, -2.0, 4.0, 0.5, 1.0)
  private val golden60 = Seq(1.0, 1.502888081132, 0.827531285778, 1.380095893831,
    1.097662767307, 1.16667043798, 0.698460731496, 1.128031210124,
    1.054982222879, 1.049193796912)

  private def df = xs.zipWithIndex
    .map { case (v, i) => ("k", i, v) }.toDF("key", "t", "x")

  test("window closed form matches pandas golden (hl=60)") {
    val w = Window.partitionBy($"key").orderBy($"t")
    val got = df.withColumn("ewm", Ewm.ewmMean($"x", w, 60.0))
      .orderBy($"t").select($"ewm").as[Double].collect()
    got.zip(golden60).foreach { case (g, e) =>
      assert(approxEqual(g, e, 1e-9), s"$g vs $e") }
  }

  test("streaming form matches pandas golden (hl=60)") {
    val got = Ewm.ewmMeanStable(df, Seq("key"), Seq("t"), "x", 60.0, "ewm")
      .orderBy($"t").select($"ewm").as[Double].collect()
    got.zip(golden60).foreach { case (g, e) =>
      assert(approxEqual(g, e, 1e-9), s"$g vs $e") }
  }

  test("null handling matches pandas ignore_na=False (hl=5)") {
    // pandas golden: [1.0, 1.0, 1.568874072231, 1.568874072231, 2.182509845142]
    val rows = Seq[(String, Int, java.lang.Double)](
      ("k", 0, 1.0), ("k", 1, null), ("k", 2, 2.0), ("k", 3, null), ("k", 4, 3.0))
    val d = rows.toDF("key", "t", "x")
    val expected = Seq(1.0, 1.0, 1.568874072231, 1.568874072231, 2.182509845142)
    val w = Window.partitionBy($"key").orderBy($"t")
    val winForm = d.withColumn("e", Ewm.ewmMean($"x", w, 5.0))
      .orderBy($"t").select($"e").as[Double].collect()
    val strForm = Ewm.ewmMeanStable(d, Seq("key"), Seq("t"), "x", 5.0, "e")
      .orderBy($"t").select($"e").as[Double].collect()
    winForm.zip(expected).foreach { case (g, e) => assert(approxEqual(g, e, 1e-9)) }
    strForm.zip(expected).foreach { case (g, e) => assert(approxEqual(g, e, 1e-9)) }
  }

  test("native AggregateWindowFunction form matches pandas golden (hl=60)") {
    GraftFunctions.register(spark)
    val w = Window.partitionBy($"key").orderBy($"t")
    val got = df.withColumn("ewm", GraftFunctions.ewm_mean($"x", 60.0).over(w))
      .orderBy($"t").select($"ewm").as[Double].collect()
    got.zip(golden60).foreach { case (g, e) =>
      assert(approxEqual(g, e, 1e-9), s"$g vs $e") }
  }

  test("native form via SQL registration (spark.sql window clause)") {
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("ewm_in")
    val got = spark.sql(
      """SELECT t, ewm_mean(x, 60.0) OVER (PARTITION BY key ORDER BY t) AS e
        |FROM ewm_in ORDER BY t""".stripMargin)
      .select($"e").as[Double].collect()
    got.zip(golden60).foreach { case (g, e) =>
      assert(approxEqual(g, e, 1e-9), s"$g vs $e") }
  }

  test("native form handles nulls like the other forms (hl=5)") {
    GraftFunctions.register(spark)
    val rows = Seq[(String, Int, java.lang.Double)](
      ("k", 0, 1.0), ("k", 1, null), ("k", 2, 2.0), ("k", 3, null), ("k", 4, 3.0))
    val d = rows.toDF("key", "t", "x")
    val w = Window.partitionBy($"key").orderBy($"t")
    val expected = Seq(1.0, 1.0, 1.568874072231, 1.568874072231, 2.182509845142)
    val got = d.withColumn("e", GraftFunctions.ewm_mean($"x", 5.0).over(w))
      .orderBy($"t").select($"e").as[Double].collect()
    got.zip(expected).foreach { case (g, e) => assert(approxEqual(g, e, 1e-9)) }
  }

  test("EWM of a constant series is the constant; forms agree on random data") {
    val rnd = new scala.util.Random(42)
    val data = (0 until 200).flatMap(i => Seq(
      ("a", i, 7.5), ("b", i, rnd.nextGaussian())))
    val d = data.toDF("key", "t", "x")
    val w = Window.partitionBy($"key").orderBy($"t")
    val both = Ewm.ewmMeanStable(
        d.withColumn("e_win", Ewm.ewmMean($"x", w, 13.0)),
        Seq("key"), Seq("t"), "x", 13.0, "e_str")
      .select($"key", $"x", $"e_win", $"e_str").collect()
    both.foreach { r =>
      assert(approxEqual(r.getDouble(2), r.getDouble(3), 1e-9))
      if (r.getString(0) == "a") assert(approxEqual(r.getDouble(2), 7.5, 1e-12))
    }
  }
}
