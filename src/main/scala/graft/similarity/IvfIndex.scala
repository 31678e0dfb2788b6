package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions.asDouble
import graft.lake.{Lake, TableDef}

/** Persisted IVF index: train the coarse quantizer ONCE, keep the
  * cell-assigned corpus in a lake table PARTITIONED BY CELL, and serve
  * every later search from the index — the production shape of
  * [[Ann.ivfTopK]], which re-trains and re-assigns per call.
  *
  * Why this matters at 100 TB:
  *   - the corpus-assignment pass (the only full scan in the IVF path)
  *     runs once at [[build]] and O(batch) at [[append]] — new embeddings
  *     are assigned to the FROZEN centroids with one broadcast argmin
  *     pass, no retraining, no touching stored vectors;
  *   - [[search]] collects each query batch's probed cell ids (≤ nLists
  *     ints) and filters the vector table with them as LITERALS, so
  *     Catalyst prunes cell partitions STATICALLY — a search reads
  *     ~nProbe/nLists of the index from disk, no dynamic-pruning
  *     machinery required.
  *
  * Centroids are deterministic ([[Ann.trainCentroids]]: hash-sampled,
  * seeded farthest-point Lloyd), so IvfIndexSpec can pin search-after-
  * build byte-equal to the one-shot [[Ann.ivfTopK]] on the same corpus.
  * Re-ingested ids supersede their stored rows (same corrective pattern
  * as the dedup stores: anti-join + [[Lake.replace]]); fresh ids append.
  * Drift note: appended batches shift the data distribution the frozen
  * centroids were trained on — recall decays gradually, and the recovery
  * is a [[build]] re-run (cheap relative to the daily path; the x39-style
  * recall gate is the drift detector).
  */
class IvfIndex(lake: Lake, prefix: String = "ivf", nLists: Int = 16) {

  val centroidTable: TableDef = TableDef(s"${prefix}_centroids",
    StructType(Seq(StructField("cell", IntegerType),
      StructField("centroid", ArrayType(DoubleType)))))
  val vectorTable: TableDef = TableDef(s"${prefix}_vectors",
    StructType(Seq(StructField("cand_id", LongType),
      StructField("cv", ArrayType(DoubleType)),
      StructField("cell", IntegerType))),
    partitionKeys = Seq("cell"))

  private def vecs(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("cand_id"),
      asDouble(col(vecCol)).as("cv"))

  /** Train the quantizer on `corpus` and write both tables (replacing any
    * previous index under this prefix). One full pass over the corpus. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      version: Long): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = vecs(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = Ann.trainCentroids(c, nLists)
    lake.create(centroidTable, replace = true)
    lake.append(centroidTable,
      centroids.toIndexedSeq.zipWithIndex
        .map { case (cen, i) => (i, cen.toSeq) }
        .toDF("cell", "centroid"), version)
    lake.create(vectorTable, replace = true)
    lake.append(vectorTable, Ann.assignCells(c, centroids), version)
    c.unpersist()
  }

  private def loadCentroids(): Array[Array[Double]] =
    lake.table(centroidTable).orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)

  /** Assign a new batch to the FROZEN centroids and add it to the index —
    * O(batch) work. Re-ingested ids replace their stored rows. */
  def append(newVecs: DataFrame, idCol: String, vecCol: String,
      version: Long): Unit = {
    val centroids = loadCentroids()
    val batch = vecs(newVecs, idCol, vecCol)
    val assigned = Ann.assignCells(batch, centroids)
    val stored = lake.table(vectorTable)
    val batchIds = batch.select(col("cand_id")).distinct()
    val reingests = stored
      .join(broadcast(batchIds), Seq("cand_id"), "left_semi")
      .limit(1).count() > 0
    if (reingests)
      lake.replace(vectorTable,
        stored.join(broadcast(batchIds), Seq("cand_id"), "left_anti")
          .unionByName(assigned), version)
    else lake.append(vectorTable, assigned, version)
  }

  /** Approximate top-k for a query batch, reading only the probed cells'
    * partitions. Identical semantics (and, right after [[build]],
    * identical bytes) to [[Ann.ivfTopK]] at the same nLists/nProbe. */
  def search(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 2): DataFrame = {
    val centroids = loadCentroids()
    val q = Ann.probeQueries(queries, idCol, vecCol, centroids, nProbe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // literal cell list → static partition pruning on the vector table.
    // The probe relation is tiny (|Q| rows pre-explode), so this collect
    // is a driver round-trip over ≤ nLists ints, not a corpus job.
    val cells = q.select(col("cell")).distinct().collect().map(_.getInt(0))
    val cAssigned = lake.table(vectorTable)
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
    Ann.scoreCells(cAssigned, q, k)
  }
}
