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
}
