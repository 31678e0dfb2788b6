package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{RollingOls, TimeSeries}

/** Rolling multi-factor OLS vs numpy lstsq golden values, plus the K=1 ≡
  * closed-form covar/var property (W6 ≡ W5|K=1, SURVEY §5.3). */
class RollingOlsSpec extends SparkSpec {
  import spark.implicits._

  test("K=2 window=5 matches numpy lstsq golden") {
    val f1 = Seq(0.1, -0.2, 0.3, 0.05, -0.1, 0.2, -0.3, 0.15)
    val f2 = Seq(1.0, 0.5, -0.5, 0.2, 0.8, -0.2, 0.4, -0.6)
    val y = Seq(0.5, 0.1, 0.9, 0.2, 0.3, 0.6, -0.4, 0.7)
    val df = (0 until 8).map(i => ("k", i, y(i), f1(i), f2(i)))
      .toDF("key", "t", "y", "f1", "f2")
    val out = RollingOls.rollingOls(df, Seq("key"), Seq("t"), "y", Seq("f1", "f2"), 5)
      .orderBy($"t")
      .select($"const", $"b_f1", $"b_f2", $"residual").collect()
    // numpy: t -> (const, b1, b2, resid)
    val golden = Map(
      4 -> (0.357438016529, 1.478067387158, -0.004450095359, 0.093928798474),
      5 -> (0.347074882995, 1.448517940718, 0.003120124805, -0.036154446178),
      6 -> (0.200852406202, 2.495066783006, 0.316397073629, 0.021108799248),
      7 -> (0.270726306466, 2.119574844996, 0.077280779451, 0.157705934455))
    (0 until 4).foreach(i => assert(out(i).isNullAt(0), s"row $i should be null"))
    golden.foreach { case (t, (c, b1, b2, r)) =>
      assert(approxEqual(out(t).getDouble(0), c, 1e-8))
      assert(approxEqual(out(t).getDouble(1), b1, 1e-8))
      assert(approxEqual(out(t).getDouble(2), b2, 1e-8))
      assert(approxEqual(out(t).getDouble(3), r, 1e-8))
    }
  }

  test("K=1 equals the closed-form rolling beta (cov/var)") {
    val rnd = new scala.util.Random(11)
    val data = for (k <- Seq("a", "b"); i <- 0 until 60)
      yield (k, i, rnd.nextGaussian() * 0.02, rnd.nextGaussian() * 0.01)
    val df = data.toDF("key", "t", "y", "f")
    val w = Window.partitionBy($"key").orderBy($"t")
    val kernel = RollingOls.rollingOls(df, Seq("key"), Seq("t"), "y", Seq("f"), 20)
    val both = kernel
      .withColumn("beta_closed", TimeSeries.rollingBeta($"y", $"f", w, 20))
      .filter($"b_f".isNotNull)
      .select($"b_f", $"beta_closed").collect()
    assert(both.length == 2 * 41)
    both.foreach(r => assert(approxEqual(r.getDouble(0), r.getDouble(1), 1e-9)))
  }

  test("rows with null inputs are excluded and get null params") {
    val df = Seq[(String, Int, java.lang.Double, java.lang.Double)](
      ("k", 0, 1.0, 1.0), ("k", 1, null, 2.0), ("k", 2, 2.0, 1.5),
      ("k", 3, 3.0, 0.5), ("k", 4, 2.5, 1.2), ("k", 5, 1.5, 0.8))
      .toDF("key", "t", "y", "f")
    val out = RollingOls.rollingOls(df, Seq("key"), Seq("t"), "y", Seq("f"), 3)
      .orderBy($"t").select($"const").collect()
    // valid rows: t=0,2,3,4,5 — the 3rd valid row is t=3
    assert(out(1).isNullAt(0)) // null input row
    assert(out(0).isNullAt(0) && out(2).isNullAt(0))
    assert(!out(3).isNullAt(0) && !out(4).isNullAt(0) && !out(5).isNullAt(0))
  }

  test("chunked path is BITWISE identical to unchunked, nulls included") {
    // skewed panel: one hot key with 900 rows (+ nulls sprinkled), two
    // small peers — chunkRows=64 re-keys the hot timeline into C-bounded
    // tasks; outputs must match the unchunked kernel bit for bit
    val rnd = new scala.util.Random(23)
    val rows = (for (i <- 0 until 900) yield {
      val y: java.lang.Double = if (i % 37 == 13) null else rnd.nextGaussian() * 0.02
      val f: java.lang.Double = if (i % 53 == 29) null else rnd.nextGaussian() * 0.01
      ("hot", i, y, f)
    }) ++ (for (k <- Seq("a", "b"); i <- 0 until 40)
      yield (k, i, java.lang.Double.valueOf(rnd.nextGaussian()),
        java.lang.Double.valueOf(rnd.nextGaussian())))
    val df = rows.toDF("key", "t", "y", "f").repartition(7)
    def run(chunk: Int) =
      RollingOls.rollingOls(df, Seq("key"), Seq("t"), "y", Seq("f"),
          window = 21, chunkRows = chunk)
        .select($"key", $"t", $"const", $"b_f", $"residual")
        .collect()
        .map(r => (r.getString(0), r.getInt(1),
          java.lang.Double.doubleToRawLongBits(if (r.isNullAt(2)) Double.NaN else r.getDouble(2)),
          java.lang.Double.doubleToRawLongBits(if (r.isNullAt(3)) Double.NaN else r.getDouble(3)),
          java.lang.Double.doubleToRawLongBits(if (r.isNullAt(4)) Double.NaN else r.getDouble(4)),
          r.isNullAt(2)))
        .sortBy(t => (t._1, t._2))
    val unchunked = run(0)
    val chunked = run(64)
    assert(unchunked.length == chunked.length)
    unchunked.zip(chunked).foreach { case (u, c) => assert(u == c, s"$u vs $c") }
    // chunk boundary stress: C == window exactly
    assert(run(21).toSeq == unchunked.toSeq)
  }
}
