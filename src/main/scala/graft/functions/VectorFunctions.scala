package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over ArrayType columns. The dot product — the hot
  * inner loop of every similarity scan — is a native codegen'd Catalyst
  * expression ([[ArrayDot]]): higher-order-function lambdas
  * (`aggregate`/`zip_with`) are interpreted per element, an order of
  * magnitude slower at corpus scale.
  *
  * Inputs are `array<float>` (the embeddings table layout) or
  * `array<double>`; math is done in double. Accumulation is sequential in
  * array order — deterministic for a given row.
  */
object VectorFunctions {

  /** Cast to array<double> for stable math. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Σ aᵢbᵢ — native codegen'd expression, see [[ArrayDot]]. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ArrayDot(
        org.apache.spark.sql.GraftColumnBridge.expression(asDouble(a)),
        org.apache.spark.sql.GraftColumnBridge.expression(asDouble(b))))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Null (not NaN/Inf) for zero-norm inputs — version-proof against IEEE
    * division differences across engines. Fused single-pass native
    * expression, see [[ArrayCosine]] (bitwise-identical to the
    * dot/norm composition). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ArrayCosine(
        org.apache.spark.sql.GraftColumnBridge.expression(asDouble(a)),
        org.apache.spark.sql.GraftColumnBridge.expression(asDouble(b))))

  /** Deterministic pseudo-random hyperplane projection sign for LSH:
    * plane `p` component for dimension `i` is derived from xxhash64(p, i)
    * mapped to {-1, +1}. sign_p(v) = I[ Σ_i s(p,i)·v_i > 0 ].
    * Needs no stored model — any executor recomputes the same planes. */
  def hyperplaneSignBit(v: Column, plane: Int): Column = {
    val proj = aggregate(
      zip_with(v, transform(sequence(lit(0), size(v) - 1),
        i => when(pmod(xxhash64(lit(plane), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
        (x, s) => x * s),
      lit(0.0), (acc, x) => acc + x)
    when(proj > 0, lit(1)).otherwise(lit(0))
  }

  /** LSH bucket id from `nPlanes` hyperplane sign bits (cosine LSH). */
  def lshBucket(v: Column, nPlanes: Int): Column =
    (0 until nPlanes).map(p => hyperplaneSignBit(v, p) * lit(1 << p))
      .reduce(_ + _)

  /** DataFrame-level LSH bucketing — the scale path: explode dimensions to
    * rows, compute all plane projections in one codegen'd hash aggregate
    * (HOF lambdas are interpreted; row aggregates are not), and return
    * (id, bucket). Identical buckets to [[lshBucket]]. */
  def lshBuckets(df: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, nPlanes: Int): org.apache.spark.sql.DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
      posexplode(asDouble(col(vecCol))).as(Seq("i", "x")))
    val projAggs = (0 until nPlanes).map { p =>
      sum(col("x") * when(pmod(xxhash64(lit(p), col("i")), lit(2)) === 0,
        lit(1.0)).otherwise(lit(-1.0))).as(s"proj$p")
    }
    exploded.groupBy(col("id")).agg(projAggs.head, projAggs.tail: _*)
      .select(col("id"), (0 until nPlanes).map { p =>
        when(col(s"proj$p") > 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _).as("bucket"))
  }

  /** Typed elementwise vector-sum [[org.apache.spark.sql.expressions.Aggregator]]:
    * the map-side-combinable kernel behind [[groupCentroids]]. The buffer
    * is ONE fixed-width Array[Double] per group per partition, so a
    * corpus-scale centroid shuffles a handful of 64-double buffers per
    * partition instead of dim× posexploded rows (the naive plan's 64×
    * row blow-up before its shuffle). Vectors shorter than `dim`
    * contribute their prefix; longer ones are truncated. */
  private final class VecSumAgg(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Double], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = Array.fill(dim)(0.0)
    override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = {
      if (a != null) {
        val n = math.min(dim, a.length); var i = 0
        while (i < n) { b(i) += a(i); i += 1 }
      }
      b
    }
    override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i < dim) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(r: Array[Double]): Seq[Double] = r.toSeq
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Elementwise sum of `array<double>` vectors as an aggregate column. */
  def vecSum(v: Column, dim: Int): Column = udaf(new VecSumAgg(dim)).apply(v)

  /** Per-group centroid of an embedding column — the group-profile /
    * cluster-seed primitive (mean vector per language, per source, per
    * near-dup cluster). Relational output, one row per (group, dim):
    * (group, dim, centroid 6dp, n_vecs) — array outputs don't hash
    * cleanly across engines, and downstream joins want rows anyway.
    *
    * Scale: ONE hash aggregate over the vectors with the fixed-width
    * [[VecSumAgg]] buffer; the posexplode runs AFTER aggregation, on
    * groups × dim rows (thousands), never on the corpus. Null vectors
    * count toward n_vecs but contribute zero (document or pre-filter as
    * the pipeline requires). */
  def groupCentroids(df: org.apache.spark.sql.DataFrame, groupCol: String,
      vecCol: String, dim: Int): org.apache.spark.sql.DataFrame =
    df.groupBy(col(groupCol))
      .agg(vecSum(asDouble(col(vecCol)), dim).as("vsum"),
        count(lit(1)).as("n_vecs"))
      .select(col(groupCol), posexplode(col("vsum")).as(Seq("dim", "s")),
        col("n_vecs"))
      // sign-zero discipline: a tiny negative mean rounds to -0.0 here
      // but +0.0 under DuckDB's grid walk — normalize both sides
      .select(col(groupCol), col("dim"),
        (round(col("s") / col("n_vecs"), 6) + lit(0.0)).as("centroid"),
        col("n_vecs"))

  /** Unrounded per-group centroid as an array column (group, centroid) —
    * the joinable form of [[groupCentroids]] for downstream vector math. */
  def centroidVectors(df: org.apache.spark.sql.DataFrame, groupCol: String,
      vecCol: String, dim: Int): org.apache.spark.sql.DataFrame =
    df.groupBy(col(groupCol))
      .agg(vecSum(asDouble(col(vecCol)), dim).as("vsum"),
        count(lit(1)).as("n_vecs"))
      .select(col(groupCol),
        transform(col("vsum"), x => x / col("n_vecs")).as("centroid"))

  /** Cosine of every vector to its own group's centroid — the semantic
    * outlier score (mislabeled or noisy embeddings sit far from their
    * group profile; near-1 rows are typical members). Group count is
    * bounded (languages, sources, clusters), so the centroid side
    * BROADCASTS and the corpus is read once; the dot product is the
    * codegen'd [[ArrayDot]] via [[cosine]]. cos 6dp, sign-zero
    * normalized. */
  def centroidCosine(df: org.apache.spark.sql.DataFrame, idCol: String,
      groupCol: String, vecCol: String, dim: Int): org.apache.spark.sql.DataFrame =
    df.join(broadcast(centroidVectors(df, groupCol, vecCol, dim)),
        Seq(groupCol))
      .select(col(idCol), col(groupCol),
        (round(cosine(asDouble(col(vecCol)), col("centroid")), 6) + lit(0.0))
          .as("cos_centroid"))
}
