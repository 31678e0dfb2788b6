package graft.opt

import breeze.linalg.{DenseMatrix, DenseVector}

/** Staging/provenance tool for `x36_qp_iterative`'s oracle literals (no
  * Spark). The x34 gate runs the QP plumbing on a closed-form instance
  * where FISTA converges at iteration 1 and the λ loop exits at λ₀ — the
  * ITERATIVE dynamics (portfolio.py:90-121's 1/(2λ)-model refit, multi-step
  * FISTA) were spec-only. x36 gates them against precomputed literals: this
  * main replays [[PortfolioOptimizer.solveDynamic]]'s exact loop on the
  * staged instance, printing every (λ, σ) history step, per-solve FISTA
  * iteration counts, and the final outputs at full precision + 6dp, with
  * each rounded value's distance from its 6dp grid midpoint.
  *
  * The solver is pure deterministic double arithmetic (no parallel
  * reductions), so the printed values are bitwise-reproducible inside the
  * per-date fan-out task — the oracle can carry round(v, 6) as literals.
  * Run: `sbt "runMain graft.opt.StageQp"`; paste the LITERAL block into the
  * x36 oracle (queries/ExtraQueries.scala) when changing the instance.
  */
object StageQp {

  /** `sweep` mode: replay the λ loop over a grid of alpha scales to find an
    * instance with ≥2 refits AND an in-band exit (the two dynamics x36 must
    * gate). The x²-weighted refit anchors λ near its first sample, so the
    * usable region is narrow — search it, don't hand-derive it. */
  private def sweep(): Unit = {
    for (s <- BigDecimal(0.002) to BigDecimal(0.012) by BigDecimal(0.0005);
         dir <- Seq(Seq(1.2, 0.2, -1.0), Seq(1.0, 0.4, -0.8), Seq(0.3, 1.1, -0.2))) {
      val alphas = DenseVector(dir.map(_ * s.toDouble): _*)
      val sigma = X36.sigmaMatrix()
      val bench = DenseVector.fill(3)(1.0 / 3.0)
      var lambda = Double.NaN
      var risk = Double.PositiveInfinity
      var iterations = 1
      val hist = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      var stop = false
      while (!stop && math.abs(risk - X36.target) > 0.005) {
        lambda =
          if (lambda.isNaN) 100.0
          else {
            val xs = hist.map { case (l, _) => 1.0 / (2.0 * l) }
            val ss = hist.map(_._2)
            val m = xs.zip(ss).map { case (x, v) => x * v }.sum /
              xs.map(x => x * x).sum
            m / (2.0 * X36.target)
          }
        val qp = PortfolioOptimizer.solveQp(alphas, sigma, lambda)
        risk = PortfolioOptimizer.activeRisk(qp.w - bench, sigma)
        hist += ((lambda, risk))
        if (iterations >= X36.maxIterations) stop = true else iterations += 1
      }
      val inBand = math.abs(risk - X36.target) <= 0.005
      if (hist.size >= 3 && inBand)
        println(f"HIT  s=$s dir=$dir refits=${hist.size - 1} " +
          hist.map { case (l, r) => f"($l%.2f,$r%.4f)" }.mkString(" "))
      else
        println(f"miss s=$s dir=$dir refits=${hist.size - 1} inBand=$inBand " +
          hist.map { case (l, r) => f"($l%.2f,$r%.4f)" }.mkString(" "))
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("sweep")) { sweep(); return }
    for (d <- 0 until X36.nDates) {
      val alphas = DenseVector(X36.alphas(d): _*)
      val sigma = X36.sigmaMatrix()
      val bench = DenseVector.fill(X36.tickers.length)(1.0 / X36.tickers.length)
      println(s"=== date index $d  alphas=${alphas}")
      // replay the solveDynamic schedule with visibility
      val error = 0.005
      var lambda = Double.NaN
      var risk = Double.PositiveInfinity
      var w: DenseVector[Double] = null
      var iterations = 1
      val hist = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      var stop = false
      while (!stop && math.abs(risk - X36.target) > error) {
        lambda =
          if (lambda.isNaN) 100.0
          else {
            val xs = hist.map { case (l, _) => 1.0 / (2.0 * l) }
            val ss = hist.map(_._2)
            val m = xs.zip(ss).map { case (x, s) => x * s }.sum /
              xs.map(x => x * x).sum
            m / (2.0 * X36.target)
          }
        val qp = PortfolioOptimizer.solveQp(alphas, sigma, lambda)
        w = qp.w
        risk = PortfolioOptimizer.activeRisk(w - bench, sigma)
        hist += ((lambda, risk))
        println(f"  solve $iterations%d: lambda=$lambda%.10f risk=$risk%.10f " +
          f"fistaIters=${qp.iterations}%d converged=${qp.converged} residual=${qp.residual}%.2e")
        if (iterations >= X36.maxIterations) stop = true else iterations += 1
      }
      val (wD, lD, rD, convD) = PortfolioOptimizer.solveDynamic(
        alphas, sigma, bench, X36.target)
      require((wD - w).toArray.forall(_ == 0.0) && lD == lambda && rD == risk,
        "replay diverged from solveDynamic — schedules out of sync")
      println(s"  refits=${hist.size - 1} inBandExit=${math.abs(risk - X36.target) <= error} allConverged=$convD")
      def grid(v: Double): String = {
        val r = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        val mid = ((v * 1e6 - math.floor(v * 1e6)) - 0.5).abs
        f"${r.toDouble}%.6f (midpoint dist ${mid * 1e-6}%.2e)"
      }
      X36.tickers.zipWithIndex.foreach { case (t, i) =>
        println(f"  w[$t] = ${w(i)}%.17g -> ${grid(w(i))}")
      }
      println(f"  lambda = $lambda%.17g -> ${grid(lambda)}")
      println(f"  risk   = $risk%.17g -> ${grid(risk)}")
    }
  }
}

/** The staged x36 instance — shared between [[StageQp]] (literal
  * provenance) and the x36 query (ExtraQueries), so the gate and its
  * staging can never drift apart. */
private[graft] object X36 {
  val tickers: Seq[String] = Seq("R0", "R1", "R2")
  val factors: Seq[String] = Seq("F0", "F1")
  val nDates = 2
  val target = 0.05
  val maxIterations = 5

  /** per-date alpha vectors, ticker order R0,R1,R2 */
  /** Chosen by `StageQp sweep`: date 0 exits the λ loop in band at solve 3
    * (2 refits), date 1 at solve 4 (3 refits) — both with every FISTA solve
    * taking tens of iterations, so the gate exercises the multi-step
    * accelerated path AND the 1/(2λ)-model refit arithmetic, unlike x34's
    * deliberately closed-form exit-at-λ₀ instance. */
  def alphas(d: Int): Seq[Double] =
    if (d == 0) Seq(0.006, 0.001, -0.005) else Seq(0.00165, 0.00605, -0.0011)

  /** loadings, ticker-major (R0..R2) x factor (F0,F1) — same every date.
    * Near-symmetric so the min-variance portfolio (the w(λ→∞) limit of the
    * TOTAL-variance-penalized QP) sits near the uniform benchmark: the
    * active-risk floor must lie BELOW the 0.05 target or the λ loop can
    * never enter the band. */
  val loadings: Seq[Seq[Double]] =
    Seq(Seq(1.0, 0.2), Seq(1.0, -0.2), Seq(1.0, 0.0))

  /** factor covariance (F0,F1) x (F0,F1) */
  val fcov: Seq[Seq[Double]] =
    Seq(Seq(0.00036, 0.00006), Seq(0.00006, 0.00016))

  /** idio vols per ticker */
  val idio: Seq[Double] = Seq(0.012, 0.012, 0.012)

  def sigmaMatrix(): DenseMatrix[Double] = {
    val b = DenseMatrix.tabulate(3, 2)((i, j) => loadings(i)(j))
    val f = DenseMatrix.tabulate(2, 2)((i, j) => fcov(i)(j))
    PortfolioOptimizer.covarianceMatrix(b, f, DenseVector(idio: _*))
  }
}
