package graft

import org.apache.spark.sql.functions._
import graft.similarity.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // Axis-aligned corpus with exactly known population moments: component
  // values are exact binary fractions so mean/covariance arithmetic is
  // bit-exact and the spectrum is known in closed form.
  private def axisCorpus() = Seq(
    (1L, Seq(4.0, 0.5, 0.0)),
    (2L, Seq(-4.0, -0.25, 0.0)),
    (3L, Seq(2.0, 0.25, 0.0)),
    (4L, Seq(-2.0, -0.5, 0.0))
  ).toDF("id", "v")

  test("fit recovers exact moments and spectrum on an axis-aligned corpus") {
    val m = Pca.fit(axisCorpus(), "v")
    assert(m.n == 4 && m.dim == 3)
    assert(m.mean.toSeq == Seq(0.0, 0.0, 0.0))
    // var(x1) = (16+16+4+4)/4 = 10, var(x2) = 10/64,
    // cov(x1,x2) = (2+1+0.5+1)/4 = 9/8 (NOT collinear — det > 0, so the
    // second eigenvalue is genuinely informative)
    assert(m.covariance(0)(0) == 10.0)
    assert(m.covariance(1)(1) == 0.15625)
    assert(m.covariance(0)(1) == 1.125)
    assert(m.covariance(2).forall(_ == 0.0))
    // exact 2x2 spectrum: λ = (a+b ± sqrt((a-b)² + 4c²)) / 2
    val (a, b, c) = (10.0, 0.15625, 1.125)
    val disc = math.sqrt((a - b) * (a - b) + 4 * c * c)
    assert(approxEqual(m.eigenvalues(0), (a + b + disc) / 2, 1e-12))
    assert(approxEqual(m.eigenvalues(1), (a + b - disc) / 2, 1e-12))
    assert(math.abs(m.eigenvalues(2)) <= 1e-15)
    // descending order + varianceExplained identities
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1)))
    assert(approxEqual(m.varianceExplained(3), 1.0, 1e-12))
    assert(m.varianceExplained(0) == 0.0)
  }

  test("components are orthonormal with the pinned sign convention") {
    val m = Pca.fit(axisCorpus(), "v")
    for (i <- 0 until m.dim; j <- 0 until m.dim) {
      val d = m.components(i).zip(m.components(j)).map { case (x, y) => x * y }.sum
      assert(approxEqual(d, if (i == j) 1.0 else 0.0, 1e-12),
        s"<v$i, v$j> = $d")
    }
    // largest-|coefficient| entry is positive on every component
    m.components.foreach { v =>
      val best = v.indices.maxBy(i => (math.abs(v(i)), -i))
      assert(v(best) > 0, s"sign convention violated: ${v.toSeq}")
    }
  }

  test("transform projects onto the axes; whitening yields unit variance") {
    val df = axisCorpus()
    val m = Pca.fit(df, "v")
    val t = Pca.transform(df, m, "v", "pc", k = 2)
      .select($"id", $"pc").orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    // projection of row i onto component j = Σ (x - mean) · v_j; verify
    // against a driver-side reference computation
    val rows = Map(1L -> Array(4.0, 0.5, 0.0), 2L -> Array(-4.0, -0.25, 0.0),
      3L -> Array(2.0, 0.25, 0.0), 4L -> Array(-2.0, -0.5, 0.0))
    t.foreach { case (id, pc) =>
      for (j <- 0 until 2) {
        val ref = rows(id).zip(m.components(j)).map { case (x, v) => x * v }.sum
        assert(approxEqual(pc(j), ref, 1e-12), s"id=$id pc$j")
      }
    }
    // whitened variance is 1 on informative axes, 0.0 on the null axis
    val w = Pca.transform(df, m, "v", "pc", k = 3, whiten = true)
    val vars = w.agg(
      var_pop(element_at($"pc", 1)), var_pop(element_at($"pc", 2)),
      var_pop(element_at($"pc", 3))).head
    assert(approxEqual(vars.getDouble(0), 1.0, 1e-9))
    assert(approxEqual(vars.getDouble(1), 1.0, 1e-9))
    assert(vars.getDouble(2) == 0.0) // λ ≤ WhitenEps → hard zero, not inf
  }

  test("per-component variance of the projection equals the eigenvalue") {
    // vᵀCv = λ is exact math — check it empirically on the testdata
    // embeddings (float inputs, 64 dims)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Pca.fit(e, "embedding")
    assert(m.dim == 64 && m.n == 500)
    val t = Pca.transform(e, m, "embedding", "pc", k = 4)
    val vars = t.agg(
      var_pop(element_at($"pc", 1)), var_pop(element_at($"pc", 2)),
      var_pop(element_at($"pc", 3)), var_pop(element_at($"pc", 4))).head
    for (j <- 0 until 4)
      assert(approxEqual(vars.getDouble(j), m.eigenvalues(j), 1e-9),
        s"var(pc$j)=${vars.getDouble(j)} != λ=${m.eigenvalues(j)}")
    // trace identity: Σλ = Σ per-dimension variance
    val trace = m.covariance.indices.map(i => m.covariance(i)(i)).sum
    assert(approxEqual(m.eigenvalues.sum, trace, 1e-9))
  }

  test("fit is partitioning-tolerant and loud on malformed input") {
    val df = axisCorpus()
    val m1 = Pca.fit(df.repartition(7), "v")
    val m4 = Pca.fit(df.coalesce(1), "v")
    for (i <- 0 until 3; j <- 0 until 3)
      assert(approxEqual(m1.covariance(i)(j), m4.covariance(i)(j), 1e-12))
    // null and empty vectors are excluded, not counted
    val withNulls = df.unionByName(Seq(
      (9L, null.asInstanceOf[Seq[Double]]), (10L, Seq.empty[Double])
    ).toDF("id", "v"))
    assert(Pca.fit(withNulls, "v").n == 4)
    // ragged dimensions fail loudly (silent truncation would bias moments)
    val ragged = df.unionByName(Seq((11L, Seq(1.0, 2.0))).toDF("id", "v"))
    val e = intercept[org.apache.spark.SparkException] {
      Pca.fit(ragged, "v")
    }
    assert(e.getMessage.contains("dim-3 corpus") ||
      e.getCause != null && e.getCause.getMessage.contains("dim-3 corpus"))
  }

  test("transform is loud on wrong-dimension vectors, null on null/empty") {
    val df = axisCorpus()
    val m = Pca.fit(df, "v")
    // null and empty vectors emit NULL projections — the fit-side
    // exclusion mirrored (a zero projection would conflate "no vector"
    // with "exactly mean-valued vector")
    val withNulls = Seq(
      (9L, null.asInstanceOf[Seq[Double]]), (10L, Seq.empty[Double])
    ).toDF("id", "v")
    val nullsOut = Pca.transform(withNulls, m, "v", "pc", k = 2)
      .select($"id", $"pc").orderBy($"id").collect()
    assert(nullsOut.length == 2 && nullsOut.forall(_.isNullAt(1)))
    // any OTHER length fails loudly — zip_with would null-pad a short
    // vector (silent null) and the fixed-length dot would silently
    // truncate a long one
    for (bad <- Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0, 4.0))) {
      // raise_error surfaces as SparkRuntimeException (USER_RAISED)
      val e = intercept[Exception] {
        Pca.transform(Seq((11L, bad)).toDF("id", "v"), m, "v", "pc", k = 2)
          .collect()
      }
      val msg = e.getMessage +
        (if (e.getCause != null) e.getCause.getMessage else "")
      assert(msg.contains("dim-3 transform"), s"len=${bad.length}: $msg")
    }
  }
}
