package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions.asDouble
import graft.lake.{Lake, TableDef}

/** Persisted IVF+SQ8 index: [[IvfIndex]]'s cell-partitioned lake layout
  * plus STORED byte codes — the serving shape where the scored scan
  * reads one byte per dimension of only the probed cells' partitions
  * ([[IvfPqIndex]]'s layout with [[Ann.sqTopK]]'s near-exact codes:
  * ~4× fewer scan bytes than floats at recall PQ cannot reach on
  * stretched spectra — the arg-38 receipt).
  *
  * The coarse quantizer AND the per-dimension (min, step) bounds train
  * on the same deterministic hash sample as the one-shot path, frozen
  * at [[build]]; right after build, a [[search]] probing EVERY cell is
  * byte-equal to [[Ann.sqTopK]] at the same parameters (the x96 gate —
  * full-probe removes the cell pruning, and both sides score through
  * the shared [[Ann.indexedSqWeights]]/[[Ann.sqDotUdf]] kernel).
  * Append drift, delete/compact, and rebuild recovery inherit
  * [[IvfIndex]]'s contracts verbatim (deletes through the version-aware
  * [[TombstoneStore]]).
  */
class IvfSqIndex(lake: Lake, prefix: String = "ivfsq", nLists: Int = 16) {

  val centroidTable: TableDef = TableDef(s"${prefix}_centroids",
    StructType(Seq(StructField("cell", IntegerType),
      StructField("centroid", ArrayType(DoubleType)))))
  /** Top-router table, non-empty ONLY for large-k builds (the
    * [[IvfPqIndex.topTable]] contract). */
  val topTable: TableDef = QuantizerStore.topTableDef(prefix)
  /** The per-dimension scalar quantizer: (dim, minv, step). */
  val sqTable: TableDef = TableDef(s"${prefix}_sq",
    StructType(Seq(StructField("dim", IntegerType),
      StructField("minv", DoubleType),
      StructField("step", DoubleType))))
  /** `codes` is BINARY (one byte per dimension); `dnorm` the decoded
    * vector's norm — both computed once at build/append so the scored
    * scan never touches `cv` (parquet column pruning drops it). */
  val vectorTable: TableDef = TableDef(s"${prefix}_vectors",
    StructType(Seq(StructField("cand_id", LongType),
      StructField("cv", ArrayType(DoubleType)),
      StructField("cell", IntegerType),
      StructField("codes", BinaryType),
      StructField("dnorm", DoubleType))),
    partitionKeys = Seq("cell"),
    primaryKeys = Seq("cand_id"),
    clusterWrites = true)
  val tombTable: TableDef = TombstoneStore.tableDef(prefix)
  /** Per-cell angular radii over the DECODED vectors — what keeps the
    * adaptive bound sound for a scan that ranks decoded cosines
    * ([[Ann.sqCellRadii]]). */
  val radiiTable: TableDef = QuantizerStore.radiiTableDef(prefix)

  private def vecs(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val t = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
      s"$prefix: id column '$idCol' must be integral (stored as long), got $t")
    df.select(col(idCol).cast(LongType).as("cand_id"),
      asDouble(col(vecCol)).as("cv"))
  }

  /** Train the coarse quantizer and the SQ bounds on `corpus` (one
    * sampling job feeds both — the [[IvfPqIndex.build]] discipline, and
    * the same sample bytes the x96 parity contract depends on), then
    * assign + encode in one corpus sweep. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      version: Long): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = vecs(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sample = Ann.hashSample(c)
    val (flat, router) =
      if (nLists <= Ann.FlatQuantizerMax)
        (Ann.trainQuantizer(c, sample, nLists), None)
      else {
        val q2 = Ann.trainTwoLevel(c, nLists, sample)
        (q2.flat, Some(q2))
      }
    val quant = Ann.trainSq(sample)
    val bc = spark.sparkContext.broadcast(quant)
    val encoded = QuantizerStore.assigner(flat, router)(c)
      .withColumn("__sq", Ann.sqEncodeUdf(bc)(col("cv")))
      .select(col("cand_id"), col("cv"), col("cell"),
        col("__sq._1").as("codes"), col("__sq._2").as("dnorm"))
    lake.replace(vectorTable, encoded, version)
    // decoded-space radii re-derive assign+encode from the cached corpus
    // (broadcast argmin + byte encode — no disk read-back); ≤ nLists rows
    QuantizerStore.writeRadii(lake, radiiTable,
      Ann.sqCellRadii(encoded, flat, quant), version, spark)
    lake.replace(centroidTable,
      flat.toIndexedSeq.zipWithIndex
        .map { case (cen, i) => (i, cen.toSeq) }
        .toDF("cell", "centroid"), version)
    QuantizerStore.writeTop(lake, topTable, router, version, spark)
    lake.replace(sqTable,
      quant._1.toIndexedSeq.zipWithIndex.map { case (mn, i) =>
        (i, mn, quant._2(i)) }.toDF("dim", "minv", "step"), version)
    c.unpersist()
  }

  private def loadQuantizer(): (Array[Array[Double]], Option[Ann.TwoLevelQuantizer]) =
    QuantizerStore.load(lake, prefix, centroidTable, topTable,
      expectRouted = nLists > Ann.FlatQuantizerMax)

  private def loadSq(): (Array[Double], Array[Double]) = {
    val rows = lake.table(sqTable).orderBy(col("dim")).collect()
    require(rows.nonEmpty,
      s"$prefix: no SQ bounds found — build() the index before search/append")
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Assign + encode a new batch against the FROZEN quantizers and
    * append — O(batch), stored rows untouched ([[IvfPqIndex.append]]'s
    * contract incl. the within-batch survivor rule). */
  def append(newVecs: DataFrame, idCol: String, vecCol: String,
      version: Long): Unit = {
    val (flat, router) = loadQuantizer()
    val quant = loadSq()
    val bc = newVecs.sparkSession.sparkContext.broadcast(quant)
    val assigned = QuantizerStore.assigner(flat, router)(
        vecs(newVecs, idCol, vecCol))
      .withColumn("__sq", Ann.sqEncodeUdf(bc)(col("cv")))
      .select(col("cand_id"), col("cv"), col("cell"),
        col("__sq._1").as("codes"), col("__sq._2").as("dnorm"))
    val w = Window.partitionBy(col("cand_id"))
      .orderBy(col("cell").desc, col("cv").desc)
    val deduped = assigned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lake.append(vectorTable, deduped, version)
    // widen touched cells' decoded-space radii — O(batch), tiny rewrite
    QuantizerStore.mergeRadii(lake, radiiTable,
      Ann.sqCellRadii(deduped, flat, quant), version,
      newVecs.sparkSession)
    deduped.unpersist()
  }

  /** Primary-key compaction + tombstone drain ([[IvfPqIndex.compact]]). */
  def compact(version: Long = System.currentTimeMillis()): Unit =
    TombstoneStore.applyTo(lake, tombTable, vectorTable, version)

  /** O(batch) delete — the [[IvfIndex.delete]] contract verbatim. */
  def delete(ids: DataFrame, idCol: String, version: Long): Unit =
    TombstoneStore.delete(lake, tombTable, ids, idCol, version)

  /** Drift recovery: compact, snapshot the stored floats, retrain and
    * rebuild in place ([[IvfIndex.rebuild]]'s contract). */
  def rebuild(version: Long): Unit = {
    compact()
    val snap = lake.table(vectorTable)
      .select(col("cand_id"), col("cv").as("embedding"))
      .localCheckpoint()
    require(!snap.isEmpty, s"$prefix: nothing stored — build() the index first")
    build(snap, "cand_id", "embedding", version)
  }

  /** SQ8 top-k reading codes of probed cells only: literal cell-id
    * partition pruning, codes+dnorm-only scored projection (no `cv`
    * until refine), pending deletes filtered version-aware before
    * scoring AND before the refine float re-read. Probing every cell
    * (`nProbe` ≥ nLists) right after [[build]] is byte-equal to
    * [[Ann.sqTopK]]. */
  def search(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 2, rerank: Int = 0): DataFrame = {
    val (flat, router) = loadQuantizer()
    val (qIdx, bcW) = Ann.indexedSqWeights(queries, idCol, vecCol, loadSq())
    val qd = QuantizerStore.prober(flat, router, nProbe)(queries, idCol, vecCol)
      .select(col("query_id"), col("cell"))
      .join(broadcast(qIdx), Seq("query_id"))
    val cells = qd.select(col("cell")).distinct().collect().map(_.getInt(0))
    val pruned = liveSlice(cells)
    Ann.refine(sqScore(pruned, qd, bcW),
      pruned.select(col("cand_id"), col("cv")),
      queries, idCol, vecCol, k, rerank)
  }

  /** Probed cells' partitions, tombstones filtered version-aware — the
    * [[IvfIndex]] liveSlice contract (no join node on the no-delete
    * path). */
  private def liveSlice(cells: Array[Int]): DataFrame = {
    val tombs = TombstoneStore.pending(lake, tombTable)
    val slice = lake.tableSlice(vectorTable,
        cells.toIndexedSeq.map(c => s"cell=$c"), keepVersion = tombs)
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
    if (tombs) TombstoneStore.filterLive(lake, tombTable, slice)
      .drop(graft.lake.Lake.Version)
    else slice
  }

  /** Codes-only SQ scoring of a probed slice against (query_id, cell,
    * qi) probe rows — shared by [[search]] and [[searchAdaptive]] so
    * their byte-parity cannot drift. */
  private def sqScore(pruned: DataFrame, qd: DataFrame,
      bcW: org.apache.spark.broadcast.Broadcast[Array[(Array[Double], Double)]])
      : DataFrame =
    pruned.select(col("cand_id"), col("cell"), col("codes"), col("dnorm"))
      .join(broadcast(qd), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine",
        round(Ann.sqDotUdf(bcW)(col("codes"), col("dnorm"), col("qi")), 6))
      .drop("codes", "dnorm", "qi")

  /** Query-adaptive SQ8 search ([[IvfIndex.searchAdaptive]]'s rule over
    * byte codes): phase A scans the nProbeMin nearest cells' codes;
    * phase B scans only cells whose DECODED-space radius bound can beat
    * the query's current k-th quantized hit, capped at nProbeMax. The
    * bound is sound for the quantized ranking (radii live in the same
    * decoded space the scan scores — [[Ann.sqCellRadii]]), so
    * nProbeMax = nLists is byte-equal to a full-probe [[search]];
    * IvfSqIndexSpec pins it. `rerank` re-reads floats of the probed
    * cells only ([[Ann.refine]]). Past [[Ann.FlatQuantizerMax]] phase A
    * probes through the persisted router and phase B prunes at the
    * BRANCH level ([[Ann.extraProbeFrameRouted]]) — the
    * [[IvfIndex.searchAdaptive]] routed shape over byte codes. */
  def searchAdaptive(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbeMin: Int = 2, nProbeMax: Int = 8,
      rerank: Int = 0): DataFrame = {
    require(nProbeMin >= 1 && nProbeMin <= nProbeMax,
      s"need 1 <= nProbeMin <= nProbeMax, got ($nProbeMin, $nProbeMax)")
    val (flat, router) = loadQuantizer()
    val radii = QuantizerStore.loadRadii(lake, radiiTable, flat.length)
    val (qIdx, bcW) = Ann.indexedSqWeights(queries, idCol, vecCol, loadSq())
    val qA = QuantizerStore.prober(flat, router,
        math.min(nProbeMin, flat.length))(queries, idCol, vecCol)
      .select(col("query_id"), col("cell"))
      .join(broadcast(qIdx), Seq("query_id"))
    val cellsA = qA.select(col("cell")).distinct().collect().map(_.getInt(0))
    // phase A reduced to its per-query top-max(k, rerank) and
    // localCheckpointed before reuse (the IvfIndex.searchAdaptive
    // evaluate-once discipline): the shortlist depth is max(k, rerank),
    // so keeping that many quantized hits per query preserves both the
    // phase-B threshold and the refine shortlist byte-exactly, while
    // the code scan over the probed partitions runs once per serving
    // call instead of three times. |Q|·max(k, rerank) narrow rows —
    // ContextCleaner-freed, not a pinned cache entry.
    val depth = math.max(k, rerank)
    val topA = Ann.ranked(sqScore(liveSlice(cellsA), qA, bcW)
        .select(col("query_id"), col("cand_id"), col("cosine")), depth)
      .localCheckpoint()
    val scoredA = topA.select(col("query_id"), col("cand_id"), col("cosine"))
    val (merged, allCells) =
      if (nProbeMax <= nProbeMin) (scoredA, cellsA)
      else {
        // prune against the SHORTLIST depth, not k: with rerank > k a
        // full-probe search() refines the top `rerank` quantized hits
        // to exact cosines, so a pruned cell's member with quantized
        // rank in (k, rerank] could still refine into the exact top-k.
        // Thresholding at max(k, rerank) keeps pruning sound for the
        // whole quantized shortlist (a member below phase A's
        // rerank-th quantized hit is below the full probe's too) —
        // IvfSqIndexSpec pins full-cap parity at rerank > k.
        // ranked's rank-depth row IS kthCosine(·, depth)'s output
        // (nulls sort last; fewer than depth non-null hits → no
        // threshold → probe to cap, unchanged).
        val kth = topA.filter(col("rank") === depth &&
            col("cosine").isNotNull)
          .select(col("query_id"), col("cosine").as("kth"))
        val qB = (router match {
            case Some(q2) => Ann.extraProbeFrameRouted(queries, idCol,
              vecCol, q2, radii, kth, nProbeMin, nProbeMax)
            case None => Ann.extraProbeFrame(queries, idCol, vecCol,
              flat, radii, kth, nProbeMin, nProbeMax)
          })
          .select(col("query_id"), col("cell"))
          .join(broadcast(qIdx), Seq("query_id"))
        val cellsB = qB.select(col("cell")).distinct().collect()
          .map(_.getInt(0))
        if (cellsB.isEmpty) (scoredA, cellsA)
        else (scoredA.unionAll(sqScore(liveSlice(cellsB), qB, bcW)
            .select(col("query_id"), col("cand_id"), col("cosine"))),
          (cellsA ++ cellsB).distinct)
      }
    Ann.refine(merged, liveSlice(allCells).select(col("cand_id"), col("cv")),
      queries, idCol, vecCol, k, rerank)
  }
}
