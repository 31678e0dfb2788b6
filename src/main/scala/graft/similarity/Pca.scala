package graft.similarity

import breeze.linalg.{eigSym, DenseMatrix}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Distributed PCA / whitening over an embedding column — the standard
  * pre-processing stage in front of the ANN / SemDeDup stack (variance
  * concentration before product quantization, decorrelation before
  * cosine thresholds, dimensionality reduction before index build).
  *
  * Scale shape (the only one that survives 100 TB):
  *
  *   - '''fit''' is ONE pass over the corpus: a codegen'd hash aggregate
  *     accumulates the packed moment buffer (n, Σx, upper-triangular
  *     Σxxᵀ) per map task with map-side combine, pre-merged across a
  *     fixed 256-way shard key so the final merge never funnels one
  *     buffer per input partition through a single task (at 100 TB /
  *     128 MB splits that would be ~10⁶ buffers into one reducer).
  *     Driver work is O(d²) memory and one `eigSym` of the d×d
  *     covariance — independent of corpus size. `d` is capped at
  *     [[Pca.MaxDim]] (the d² buffer is per-task state).
  *   - '''transform''' is pure column-level vector math: one centering
  *     `zip_with` plus k native codegen'd [[graft.functions.ArrayDot]]
  *     projections per row — no UDF, no shuffle, no model table join
  *     (the model rides along as literals).
  *
  * Float determinism: moment accumulation is a float sum, so the last
  * bits depend on partitioning/merge order exactly like every other
  * aggregate in the engine; contract outputs round 6dp (the grid is
  * ≥ 10⁶× the reduction-order noise, QueryDef.scala discipline).
  * Eigenvector SIGN is pinned deterministically: each component's
  * largest-|coefficient| entry (lowest index on ties) is made
  * positive — eigSym's sign choice is otherwise arbitrary and would
  * flip projection outputs run to run.
  *
  * Degenerate directions: covariance is computed as M/n − μμᵀ, so
  * near-null eigenvalues can come out as tiny negatives (−1e−17);
  * [[varianceExplained]] clamps at zero and [[transform]]'s whitening
  * emits 0.0 for components with λ ≤ [[Pca.WhitenEps]] instead of
  * dividing by a denormal (sklearn emits ±inf there — useless rows at
  * corpus scale).
  *
  * Null / empty vectors are excluded from fit (they carry no moment
  * information); transform emits null for them (zip_with propagates).
  * Rows whose vector length differs from the first-seen dimension fail
  * the fit LOUDLY (a silent truncation would bias every moment).
  *
  * Reference has no embedding surface at all (pandas/Polars price
  * pipelines); this is beyond-parity LLM-pipeline infrastructure, same
  * family as `similarity/Ann.scala`.
  */
object Pca {

  /** d² buffer state per task — 1024² doubles = 8 MB is the sane cap. */
  val MaxDim = 1024

  /** Below this eigenvalue a direction is numerically null: whitening
    * emits 0.0 rather than exploding a noise direction by 1/√λ. */
  val WhitenEps = 1e-12

  /** Fitted model. `eigenvalues` are DESCENDING (population covariance
    * spectrum, tiny negatives possible on null directions);
    * `components(j)` is the j-th unit-norm principal axis under the
    * largest-|coefficient|-positive sign convention; `covariance` is the
    * full symmetric d×d population covariance (kept for diagnostics —
    * transform only ships mean + components). */
  final case class PcaModel(
      n: Long,
      dim: Int,
      mean: Array[Double],
      covariance: Array[Array[Double]],
      eigenvalues: Array[Double],
      components: Array[Array[Double]]) {

    /** Fraction of total variance captured by the top-k components
      * (negative eigenvalues clamp to zero on both sides). */
    def varianceExplained(k: Int): Double = {
      require(k >= 0 && k <= dim, s"k=$k out of range 0..$dim")
      val pos = eigenvalues.map(math.max(_, 0.0))
      val tot = pos.sum
      if (tot == 0.0) 0.0 else pos.take(k).sum / tot
    }
  }

  /** Packed moment aggregator: buffer = [n, Σx(d), upper-tri Σxxᵀ
    * (d(d+1)/2)]. reduce is the O(d²) rank-1 update; merge is
    * elementwise add (every slot is additive). Vectors of the wrong
    * length throw — see object scaladoc. */
  private final class MomentAgg(d: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Double], Array[Double], Seq[Double]] {
    private val width = 1 + d + d * (d + 1) / 2
    override def zero: Array[Double] = new Array[Double](width)
    override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = {
      if (a != null && a.nonEmpty) {
        require(a.length == d,
          s"pca: vector of length ${a.length} in a dim-$d corpus")
        val x = a.toArray
        b(0) += 1.0
        var i = 0
        var t = 1 + d
        while (i < d) {
          b(1 + i) += x(i)
          var j = i
          while (j < d) { b(t) += x(i) * x(j); j += 1; t += 1 }
          i += 1
        }
      }
      b
    }
    override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i < width) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(r: Array[Double]): Seq[Double] = r.toSeq
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Fit the full d-component model in one corpus pass (see object
    * scaladoc for the aggregation shape). Fit on a uniform sample when
    * the corpus is 100 TB and the spectrum is all you need — the
    * O(d²)-per-row update is the cost center, and a 10⁷-row sample
    * estimates a 64-dim covariance to far below the 6dp grid. */
  def fit(df: DataFrame, vecCol: String): PcaModel = {
    val v = df.select(VectorFunctions.asDouble(col(vecCol)).as("v"))
      .where(col("v").isNotNull && size(col("v")) > 0)
    val d = v.select(size(col("v"))).head.getInt(0)
    require(d <= MaxDim, s"pca: dim $d exceeds MaxDim $MaxDim")
    val width = 1 + d + d * (d + 1) / 2
    val moments = udaf(new MomentAgg(d))
    // 256-way pre-merge so the global merge fans in from a bounded row
    // count regardless of input partition count (object scaladoc)
    val sharded = v.groupBy(pmod(spark_partition_id(), lit(256)).as("__s"))
      .agg(moments(col("v")).as("m"))
    val total = sharded
      .agg(VectorFunctions.vecSum(col("m"), width).as("m"))
      .head.getSeq[Double](0).toArray

    val n = total(0).toLong
    require(n > 0, "pca: no non-null vectors to fit")
    val mean = Array.tabulate(d)(i => total(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var t = 1 + d
    while (i < d) {
      var j = i
      while (j < d) {
        val c = total(t) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        t += 1
      }
      i += 1
    }

    val es = eigSym(new DenseMatrix(d, d, cov.transpose.flatten))
    // eigSym: ascending eigenvalues, eigenvectors in columns → descending
    val order = (0 until d).sortBy(j => -es.eigenvalues(j))
    val eigenvalues = order.map(es.eigenvalues(_)).toArray
    val components = order.map { c =>
      val vArr = Array.tabulate(d)(r => es.eigenvectors(r, c))
      // sign convention: largest-|coefficient| entry positive (first on ties)
      var best = 0
      var bi = 1
      while (bi < d) {
        if (math.abs(vArr(bi)) > math.abs(vArr(best))) best = bi
        bi += 1
      }
      if (vArr(best) < 0) vArr.map(-_) else vArr
    }.toArray
    PcaModel(n, d, mean, cov, eigenvalues, components)
  }

  /** Project onto the top-k principal axes (optionally whitened to unit
    * variance): adds `outCol` = array<double> of length k. Row-local
    * codegen'd arithmetic only — see object scaladoc.
    *
    * Dimension discipline mirrors fit's: null and EMPTY vectors emit a
    * null projection (fit excluded them as carrying no moment
    * information — a zero projection would silently conflate "no
    * vector" with "exactly mean-valued vector"); any OTHER length than
    * `model.dim` fails LOUDLY — zip_with would otherwise null-pad short
    * vectors and the fixed-length component dot would silently truncate
    * long ones, both corrupting projections without a trace. */
  def transform(df: DataFrame, model: PcaModel, vecCol: String,
      outCol: String, k: Int, whiten: Boolean = false): DataFrame = {
    require(k >= 1 && k <= model.dim,
      s"pca: k=$k out of range 1..${model.dim}")
    val raw = VectorFunctions.asDouble(col(vecCol))
    val cen = zip_with(
      raw,
      typedLit(model.mean.toSeq),
      (x, m) => x - m)
    val tmp = "__pca_cen"
    val comps: Seq[Column] = (0 until k).map { j =>
      val proj = VectorFunctions.dot(col(tmp),
        typedLit(model.components(j).toSeq))
      if (!whiten) proj
      else if (model.eigenvalues(j) > WhitenEps)
        proj / math.sqrt(model.eigenvalues(j))
      else lit(0.0)
    }
    // CaseWhen evaluates branch values lazily, so the projection array
    // is only computed on well-formed rows and raise_error only fires
    // on genuinely wrong-dimension ones
    val rawIn = VectorFunctions.asDouble(col(vecCol))
    df.withColumn(tmp, cen)
      .withColumn(outCol,
        when(rawIn.isNull || size(rawIn) === 0,
          lit(null).cast("array<double>"))
          .when(size(rawIn) === model.dim, array(comps: _*))
          .otherwise(raise_error(concat(
            lit("pca: vector of length "), size(rawIn).cast("string"),
            lit(s" in a dim-${model.dim} transform")))))
      .drop(tmp)
  }
}
