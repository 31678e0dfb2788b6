package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the builder brief's "salting for
  * skew"). AQE's skew-join handling covers sort-merge joins; these cover
  * the two cases it doesn't:
  *
  *  - [[saltedAggregate]]: a groupBy whose key distribution is so skewed
  *    that one reducer drowns — two-phase aggregation over a salted key.
  *    Works for any algebraic aggregate (partial → merge).
  *  - [[saltedJoin]]: a hot-key equi-join where the small side fits k-fold
  *    replication — the big side salts randomly-but-deterministically
  *    (hash of all columns), the small side explodes over all salt values.
  *
  * Both are pure plan rewrites; results are identical to the unsalted
  * forms.
  */
object Skew {

  /** Per-row salt in [0, buckets). Derived from the row's physical position
    * (monotonically_increasing_id), NOT its content: a hot key's rows are
    * often byte-identical, and a content hash would send them all to ONE
    * bucket — defeating the mitigation exactly in the worst case. Position
    * salting spreads them uniformly; the two-phase rewrite makes the final
    * result invariant to which bucket a row landed in, so the
    * non-determinism of the id across reruns is harmless. */
  def salt(buckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(buckets)).cast("int")

  /** Two-phase skew-safe aggregation: sum-like measures only (extend with
    * (partial, merge) pairs as needed).
    *
    * @param measures (outputName, inputColumn) summed exactly
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      measures: Seq[(String, Column)],
      buckets: Int = 32): DataFrame = {
    val saltCol = salt(buckets)
    val partial = df
      .withColumn("__salt", saltCol)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(measures.head._2).as(measures.head._1),
        measures.tail.map { case (n, c) => sum(c).as(n) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head._1)).as(measures.head._1),
        measures.tail.map { case (n, _) => sum(col(n)).as(n) }: _*)
  }

  /** Skew-safe inner equi-join: salt the (big, skewed) left side, replicate
    * the (small) right side across all salt buckets. Result equals
    * `left.join(right, keys)`. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      buckets: Int = 16): DataFrame = {
    val salted = left.withColumn("__salt", salt(buckets))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
