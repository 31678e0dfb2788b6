package graft

import breeze.linalg.{DenseMatrix, DenseVector}
import java.sql.Date
import graft.opt.PortfolioOptimizer
import graft.opt.PortfolioOptimizer._

/** QP + λ calibration + fan-out: analytic 2-asset solution, constraint
  * properties, λ-monotone risk, and the per-date distributed fan-out. */
class PortfolioOptimizerSpec extends SparkSpec {
  import spark.implicits._

  test("simplex projection: sums to 1, non-negative, idempotent on simplex") {
    val rnd = new scala.util.Random(5)
    (1 to 20).foreach { _ =>
      val v = DenseVector.fill(10)(rnd.nextGaussian() * 3)
      val p = projectSimplex(v)
      assert(approxEqual(breeze.linalg.sum(p), 1.0, 1e-9))
      assert(p.toArray.forall(_ >= -1e-12))
      val p2 = projectSimplex(p)
      assert(breeze.linalg.norm(p2 - p) < 1e-9)
    }
  }

  test("2-asset QP matches the analytic interior solution") {
    // analytic: w1 = ((a1-a2)/λ + s22 - s12) / (s11 + s22 - 2 s12)
    val a = DenseVector(0.03, 0.01)
    val sigma = DenseMatrix((0.04, 0.01), (0.01, 0.09))
    val res = solveQp(a, sigma, lambda = 2.0, maxIter = 20000, tol = 1e-12)
    assert(res.converged, s"QP did not converge (residual ${res.residual})")
    assert(approxEqual(res.w(0), 0.818181818182, 1e-6))
    assert(approxEqual(res.w(1), 0.181818181818, 1e-6))
  }

  test("QP respects constraints and risk decreases with λ") {
    val rnd = new scala.util.Random(9)
    val n = 25
    val m = DenseMatrix.fill(n, n)(rnd.nextGaussian() * 0.01)
    val sigma = m * m.t + DenseMatrix.eye[Double](n) * 0.001
    val a = DenseVector.fill(n)(rnd.nextGaussian() * 0.02)
    val bench = DenseVector.fill(n)(1.0 / n)
    var lastRisk = Double.PositiveInfinity
    Seq(1.0, 10.0, 100.0, 1000.0).foreach { lam =>
      val qp = solveQp(a, sigma, lam)
      assert(qp.converged, s"λ=$lam unconverged, residual ${qp.residual}")
      val w = qp.w
      assert(approxEqual(breeze.linalg.sum(w), 1.0, 1e-8))
      assert(w.toArray.forall(_ >= -1e-10))
      val risk = activeRisk(w - bench, sigma)
      assert(risk <= lastRisk + 1e-9, s"risk not decreasing at λ=$lam")
      lastRisk = risk
    }
  }

  test("λ calibration approaches the target active risk") {
    val rnd = new scala.util.Random(4)
    val n = 20
    val m = DenseMatrix.fill(n, n)(rnd.nextGaussian() * 0.01)
    val sigma = m * m.t + DenseMatrix.eye[Double](n) * 0.0005
    val a = DenseVector.fill(n)(rnd.nextGaussian() * 0.02)
    val bench = DenseVector.fill(n)(1.0 / n)
    val (w, lambda, risk, conv) = solveDynamic(a, sigma, bench, targetActiveRisk = 0.05)
    assert(approxEqual(breeze.linalg.sum(w), 1.0, 1e-8))
    assert(conv, "inner QP solves should converge on a well-conditioned Σ")
    assert(lambda > 0)
    // ≤5 iterations: either converged within tolerance or hit the cap —
    // risk must at least be finite and positive
    assert(risk > 0 && risk.isFinite)
  }

  test("per-date fan-out produces weights + metrics per date") {
    val dates = Seq(Date.valueOf("2024-01-02"), Date.valueOf("2024-01-03"))
    val tickers = Seq("AAA", "BBB", "CCC")
    val factors = Seq("F1", "F2")
    val rnd = new scala.util.Random(8)
    val alphas = for (d <- dates; t <- tickers)
      yield (t, d, rnd.nextGaussian() * 0.01)
    val bench = for (d <- dates; t <- tickers) yield (t, d, 1.0 / 3)
    val loadings = for (d <- dates; t <- tickers; f <- factors)
      yield (t, d, f, rnd.nextGaussian())
    val covs = for (d <- dates; f1 <- factors; f2 <- factors)
      yield (d, f1, f2, if (f1 == f2) 0.0004 else 0.0001)
    val idio = for (d <- dates; t <- tickers) yield (t, d, 0.02)

    val combined = PortfolioOptimizer.optimizeAllDates(
      alphas.toDF("ticker", "date", "alpha"),
      bench.toDF("ticker", "date", "weight"),
      loadings.toDF("ticker", "date", "factor", "loading"),
      covs.toDF("date", "factor_1", "factor_2", "covariance"),
      idio.toDF("ticker", "date", "idio_vol")).cache()

    val w = PortfolioOptimizer.weights(combined).collect()
    val m = PortfolioOptimizer.metrics(combined).collect()
    assert(w.length == dates.length * tickers.length)
    assert(m.length == dates.length)
    assert(m.forall(_.getAs[Boolean]("qp_converged")),
      "fan-out metrics should report QP convergence per date")
    dates.foreach { d =>
      val sum = w.filter(_.getAs[Date]("date") == d).map(_.getAs[Double]("weight")).sum
      assert(approxEqual(sum, 1.0, 1e-6), s"weights at $d sum to $sum")
    }
    assert(w.forall(_.getAs[Double]("weight") >= -1e-9))
  }

  test("distributed factorRiskMatrix matches the Breeze covariance assembly") {
    import spark.implicits._
    import breeze.linalg.{DenseMatrix, DenseVector}
    val rnd = new scala.util.Random(7)
    val n = 12; val k = 4
    val tickers = (0 until n).map(i => f"T$i%02d")
    val factors = (0 until k).map(i => s"F$i")
    val bArr = Array.fill(n, k)(rnd.nextDouble() * 2 - 1)
    // symmetric PSD-ish F = G·Gᵀ scaled
    val g = DenseMatrix.fill(k, k)(rnd.nextDouble() - 0.5)
    val fMat = (g * g.t) * 1e-3
    val dArr = Array.fill(n)(rnd.nextDouble() * 0.05)

    val loadings = (for (i <- 0 until n; j <- 0 until k)
      yield (tickers(i), factors(j), bArr(i)(j))).toDF("ticker", "factor", "loading")
    val covs = (for (a <- 0 until k; c <- 0 until k)
      yield (factors(a), factors(c), fMat(a, c))).toDF("factor_1", "factor_2", "covariance")
    val idio = tickers.zip(dArr).toDF("ticker", "idio_vol")

    val expected = PortfolioOptimizer.covarianceMatrix(
      new DenseMatrix(n, k, bArr.flatten, 0, k, isTranspose = true),
      fMat, DenseVector(dArr))

    // the salted and unsalted join paths must both reproduce it exactly
    Seq(0, 8).foreach { buckets =>
      val got = PortfolioOptimizer.factorRiskMatrix(loadings, covs, idio, buckets)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(got.size == n * n)
      for (i <- 0 until n; j <- 0 until n)
        assert(approxEqual(got((tickers(i), tickers(j))), expected(i, j), 1e-12),
          s"sigma($i,$j) buckets=$buckets")
    }
  }
}
