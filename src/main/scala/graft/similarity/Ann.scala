package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set broadcasts;
  *    each candidate partition streams once — cost O(|Q|·|C|) flops but
  *    only one pass over the big side, no shuffle of candidates. The
  *    correct baseline whenever |Q| is small (the common "probe" shape).
  *  - [[lshTopK]]: hyperplane-LSH bucketed search — candidates and queries
  *    shuffle on the bucket key only; each query scores just its bucket
  *    (+ optional multi-probe neighbors). The 100 TB path: shuffle volume
  *    drops by ~2^planes and per-query work by the same factor; recall
  *    traded via nPlanes/nProbes.
  *
  * Ranking is tie-stable: ORDER BY rounded cosine DESC, candidate id — so
  * output is deterministic under any partitioning.
  */
object Ann {

  private def ranked(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cosine"))
  }

  /** Exact cosine top-k of `candidates` for each row of `queries`. */
  def bruteForceTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = candidates.select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("cv")), 6))
    ranked(scored, k)
  }

  /** LSH-bucketed approximate top-k: queries only score candidates whose
    * hyperplane signature matches (single-probe). */
  def lshTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, nPlanes: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .join(lshBuckets(queries, idCol, vecCol, nPlanes)
        .withColumnRenamed("id", "query_id"), Seq("query_id"))
    val c = candidates.select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("cv"))
      .join(lshBuckets(candidates, idCol, vecCol, nPlanes)
        .withColumnRenamed("id", "cand_id"), Seq("cand_id"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("cv")), 6))
    ranked(scored, k)
  }
}
