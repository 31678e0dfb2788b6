package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions.{asDouble, cosine}
import graft.lake.{Lake, TableDef}

/** Persisted IVFADC index: [[IvfIndex]]'s cell-partitioned lake layout
  * plus STORED PQ codes — the serving shape where an ADC search reads
  * only the `codes` column of only the probed cells' partitions, and the
  * refine stage re-reads floats for just the shortlisted rows.
  *
  * Why this matters at 100 TB: [[IvfIndex.search]] prunes to
  * ~nProbe/nLists of the corpus but still reads full float vectors
  * inside those partitions. Here the scored scan is (cand_id, codes) —
  * parquet column pruning drops `cv`, so the bytes read fall by ~the PQ
  * compression ratio (~64× at dim 64 / m 8) ON TOP of the partition
  * pruning. Codes are computed ONCE, at [[build]]/[[append]] time, with
  * codebooks frozen at build — the encode cost rides the existing
  * one-pass assignment, and serving never touches a float until refine.
  *
  * Both quantizers train on the same deterministic hash-sample as the
  * one-shot path, so right after [[build]] a [[search]] is byte-equal to
  * [[Ann.ivfPqTopK]] at the same parameters (the x59 gate). The
  * byte-parity contract covers EVERY integral id width ([[vecs]] rejects
  * non-integral ids): [[Ann.hashSample]] widens the id to long before
  * hashing, so narrow-id corpora draw the identical training sample as
  * the stored LongType `cand_id` here (IvfPqIndexSpec pins int and short
  * parity). Append drift, staleness between append and [[compact]], and
  * the rebuild recovery all inherit [[IvfIndex]]'s contracts verbatim.
  */
class IvfPqIndex(lake: Lake, prefix: String = "ivfpq", nLists: Int = 16,
    m: Int = 8, ksub: Int = 16) {

  val centroidTable: TableDef = TableDef(s"${prefix}_centroids",
    StructType(Seq(StructField("cell", IntegerType),
      StructField("centroid", ArrayType(DoubleType)))))
  /** Top-router table, non-empty ONLY for large-k builds (nLists past
    * [[Ann.FlatQuantizerMax]]): its presence switches append/search to
    * the routed O(√k) assignment and routed probes — matching the
    * one-shot [[Ann.ivfPqTopK]]'s large-k arm, so the x59 byte-parity
    * contract holds in BOTH regimes. The ADC stage is identical either
    * way (codebooks are cell-independent). */
  val topTable: TableDef = QuantizerStore.topTableDef(prefix)
  /** (subspace, centroid-index, centroid) rows — m·ksub of them. */
  val codebookTable: TableDef = TableDef(s"${prefix}_codebooks",
    StructType(Seq(StructField("subspace", IntegerType),
      StructField("ci", IntegerType),
      StructField("centroid", ArrayType(DoubleType)))))
  val vectorTable: TableDef = TableDef(s"${prefix}_vectors",
    StructType(Seq(StructField("cand_id", LongType),
      StructField("cv", ArrayType(DoubleType)),
      StructField("cell", IntegerType),
      StructField("codes", ArrayType(IntegerType)))),
    partitionKeys = Seq("cell"),
    primaryKeys = Seq("cand_id"),
    clusterWrites = true)
  /** Pending deletes ([[delete]]) awaiting the next [[compact]] —
    * version-aware semantics in [[TombstoneStore]]. */
  val tombTable: TableDef = TombstoneStore.tableDef(prefix)
  /** Per-cell angular radii over the RAW vectors: [[searchAdaptive]]
    * prunes against the REFINED (exact-cosine) k-th hit, so the sound
    * bound lives in true-cosine space — [[Ann.cellRadii]]'s layout. */
  val radiiTable: TableDef = QuantizerStore.radiiTableDef(prefix)

  private def vecs(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val t = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
      s"$prefix: id column '$idCol' must be integral (stored as long), got $t")
    df.select(col(idCol).cast(LongType).as("cand_id"),
      asDouble(col(vecCol)).as("cv"))
  }

  /** Train both quantizers on `corpus` and write all three tables via the
    * lake's temp-write + swap — same crash contract as [[IvfIndex.build]]
    * (swaps not jointly atomic; a re-run converges). The corpus pass
    * assigns cells AND encodes codes in one sweep. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      version: Long): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = vecs(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE sampling job feeds both quantizer trainers (the Ann.ivfPqTopK
    // discipline — and the same sample bytes, which the x59 parity
    // contract depends on)
    val sample = Ann.hashSample(c)
    val (flat, router) =
      if (nLists <= Ann.FlatQuantizerMax)
        (Ann.trainQuantizer(c, sample, nLists), None)
      else {
        val q2 = Ann.trainTwoLevel(c, nLists, sample)
        (q2.flat, Some(q2))
      }
    val books = Ann.trainPqCodebooksFrom(sample, m, ksub)
    val bc = spark.sparkContext.broadcast(books)
    val assigned = QuantizerStore.assigner(flat, router)(c)
    lake.replace(vectorTable,
      assigned.withColumn("codes", Ann.pqEncodeUdf(bc)(col("cv"))), version)
    // raw-space radii for the adaptive bound — re-derived from the cached
    // corpus (broadcast argmin, no disk read-back); ≤ nLists rows
    QuantizerStore.writeRadii(lake, radiiTable,
      Ann.cellRadii(assigned, flat), version, spark)
    lake.replace(centroidTable,
      flat.toIndexedSeq.zipWithIndex
        .map { case (cen, i) => (i, cen.toSeq) }
        .toDF("cell", "centroid"), version)
    QuantizerStore.writeTop(lake, topTable, router, version, spark)
    lake.replace(codebookTable,
      books.toIndexedSeq.zipWithIndex.flatMap { case (book, j) =>
        book.toIndexedSeq.zipWithIndex.map { case (cen, ci) =>
          (j, ci, cen.toSeq) }
      }.toDF("subspace", "ci", "centroid"), version)
    c.unpersist()
  }

  private def loadQuantizer(): (Array[Array[Double]], Option[Ann.TwoLevelQuantizer]) =
    QuantizerStore.load(lake, prefix, centroidTable, topTable,
      expectRouted = nLists > Ann.FlatQuantizerMax)

  private def loadCodebooks(): Array[Array[Array[Double]]] = {
    val rows = lake.table(codebookTable)
      .orderBy(col("subspace"), col("ci")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty,
      s"$prefix: no codebooks found — build() the index before search/append")
    rows.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2)).toArray
  }

  /** Assign + encode a new batch against the FROZEN quantizers and append
    * — O(batch), stored rows untouched. Same within-batch survivor rule
    * as [[IvfIndex.append]] so append-then-compact and a direct compact
    * agree. */
  def append(newVecs: DataFrame, idCol: String, vecCol: String,
      version: Long): Unit = {
    val (flat, router) = loadQuantizer()
    val bc = newVecs.sparkSession.sparkContext.broadcast(loadCodebooks())
    val assigned = QuantizerStore.assigner(flat, router)(
        vecs(newVecs, idCol, vecCol))
      .withColumn("codes", Ann.pqEncodeUdf(bc)(col("cv")))
    val w = Window.partitionBy(col("cand_id"))
      .orderBy(col("cell").desc, col("cv").desc)
    val deduped = assigned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lake.append(vectorTable, deduped, version)
    // widen touched cells' raw-space radii — O(batch), tiny rewrite
    QuantizerStore.mergeRadii(lake, radiiTable,
      Ann.cellRadii(deduped, flat), version, newVecs.sparkSession)
    deduped.unpersist()
  }

  /** Primary-key compaction — global, not cell-scoped (a re-ingested
    * vector can move cells); maintenance cadence, not per append. Applies
    * and drains pending [[delete]] tombstones ([[TombstoneStore.applyTo]];
    * `version` stamps the delete-bearing rewrite). */
  def compact(version: Long = System.currentTimeMillis()): Unit =
    TombstoneStore.applyTo(lake, tombTable, vectorTable, version)

  /** O(batch) delete — [[IvfIndex.delete]]'s contract verbatim: tombstoned
    * ids stop being served immediately, are physically removed at the next
    * [[compact]], and revive on a higher-version re-[[append]]. */
  def delete(ids: DataFrame, idCol: String, version: Long): Unit =
    TombstoneStore.delete(lake, tombTable, ids, idCol, version)

  /** Drift recovery: compact, snapshot the stored floats, retrain BOTH
    * quantizers and rebuild in place — [[IvfIndex.rebuild]]'s contract
    * through the IVFADC composition (codes re-encode against the fresh
    * codebooks during the build pass). */
  def rebuild(version: Long): Unit = {
    compact()
    val snap = lake.table(vectorTable)
      .select(col("cand_id"), col("cv").as("embedding"))
      .localCheckpoint()
    require(!snap.isEmpty, s"$prefix: nothing stored — build() the index first")
    build(snap, "cand_id", "embedding", version)
  }

  /** ADC top-k reading codes of probed cells only. The probed-cell ids
    * filter the vector table as LITERALS (static partition pruning, the
    * [[IvfIndex.search]] discipline) and the scored projection omits
    * `cv`, so the scan is codes-only. With `rerank` > k the refine stage
    * re-reads floats for the |Q|·rerank shortlist through broadcast
    * joins against the same pruned partitions. Byte-equal to
    * [[Ann.ivfPqTopK]] right after [[build]]. */
  def search(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 2, rerank: Int = 0): DataFrame = {
    val (flat, router) = loadQuantizer()
    val bc = queries.sparkSession.sparkContext.broadcast(loadCodebooks())
    val (qIdx, bcD) = Ann.indexedDtabs(queries, idCol, vecCol, bc)
    val qd = QuantizerStore.prober(flat, router, nProbe)(queries, idCol, vecCol)
      .select(col("query_id"), col("cell"))
      .join(broadcast(qIdx), Seq("query_id"))
    // probed-cell-scoped listing (the IvfIndex.search tableSlice
    // discipline) + literal isin for plan-visible partition pruning
    val cells = qd.select(col("cell")).distinct().collect().map(_.getInt(0))
    val pruned = liveSlice(cells)
    Ann.refine(adcScore(pruned, qd, bcD),
      pruned.select(col("cand_id"), col("cv")),
      queries, idCol, vecCol, k, rerank)
  }

  /** Probed cells' partitions with pending deletes anti-joined before
    * ADC scoring (and before the refine float re-read — a deleted row
    * must not resurface via the shortlist); the no-tombstone path adds
    * no join node (IvfIndex.search discipline). */
  private def liveSlice(cells: Array[Int]): DataFrame = {
    val tombs = TombstoneStore.pending(lake, tombTable)
    val slice = lake.tableSlice(vectorTable,
        cells.toIndexedSeq.map(c => s"cell=$c"), keepVersion = tombs)
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
    if (tombs) TombstoneStore.filterLive(lake, tombTable, slice)
      .drop(graft.lake.Lake.Version)
    else slice
  }

  /** Codes-only ADC scoring of a probed slice — shared by [[search]]
    * and [[searchAdaptive]] so their scoring cannot drift. */
  private def adcScore(pruned: DataFrame, qd: DataFrame,
      bcD: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])
      : DataFrame =
    pruned.select(col("cand_id"), col("cell"), col("codes"))
      .join(broadcast(qd), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine",
        round(lit(1.0) - Ann.adcAtUdf(bcD)(col("codes"), col("qi")) / lit(2.0), 6))
      .drop("codes", "qi")

  /** Query-adaptive IVFADC search: phase A ADC-scans the nProbeMin
    * nearest cells and REFINES its shortlist to exact cosines; the
    * per-query k-th REFINED hit is the pruning threshold, so the
    * raw-space radius bound ([[radiiTable]]) is sound — a pruned cell
    * provably contains no vector whose TRUE cosine beats the current
    * k-th. Phase B ADC-scans only the surviving cells (cap nProbeMax),
    * refines, and the two refined lists merge to the final top-k.
    * Within a PROBED cell recall is still bounded by the ADC shortlist
    * (`rerank` — the pre-existing PQ trade, orthogonal to probing), so
    * run with rerank > k; with rerank = 0 the threshold is an ADC
    * score and the bound is only a heuristic. nProbeMin = nProbeMax
    * degenerates to [[search]] exactly (IvfPqIndexSpec pins it). Past
    * [[Ann.FlatQuantizerMax]] phase A probes through the persisted
    * router and phase B prunes at the BRANCH level
    * ([[Ann.extraProbeFrameRouted]]) — raw-space radii stay sound
    * because the threshold is the refined exact-cosine k-th.
    *
    * Parity scope (both regimes): full-cap adaptive is byte-equal to a
    * full probe when `rerank` EXHAUSTS the scanned candidates (both
    * sides then refine everything and the pruning-soundness argument
    * closes the set). At partial rerank the shortlists differ by
    * construction — adaptive refines a per-phase top-`rerank`, the
    * full probe one global top-`rerank` — so adaptive can only refine
    * MORE candidates: recall is ≥ the full probe's, not byte-equal
    * (spec-pinned both ways). */
  def searchAdaptive(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbeMin: Int = 2, nProbeMax: Int = 8,
      rerank: Int = 0): DataFrame = {
    require(nProbeMin >= 1 && nProbeMin <= nProbeMax,
      s"need 1 <= nProbeMin <= nProbeMax, got ($nProbeMin, $nProbeMax)")
    val (flat, router) = loadQuantizer()
    val radii = QuantizerStore.loadRadii(lake, radiiTable, flat.length)
    val bc = queries.sparkSession.sparkContext.broadcast(loadCodebooks())
    val (qIdx, bcD) = Ann.indexedDtabs(queries, idCol, vecCol, bc)
    // callers guarantee a non-empty probe frame (phase A probes ≥ 1 cell
    // per query; phase B only runs when cellsB is non-empty)
    def phase(qCells: DataFrame): DataFrame = {
      val qd = qCells.join(broadcast(qIdx), Seq("query_id"))
      val cells = qd.select(col("cell")).distinct().collect().map(_.getInt(0))
      val pruned = liveSlice(cells)
      Ann.refine(adcScore(pruned, qd, bcD),
        pruned.select(col("cand_id"), col("cv")),
        queries, idCol, vecCol, k, rerank)
    }
    // phase A's refined frame is |Q|·k rows — localCheckpointed so the
    // ADC scan + refine over the probed partitions runs once per
    // serving call, not re-evaluated by the kth filter, the phase-B
    // cell collect, and the final union (the IvfIndex.searchAdaptive
    // evaluate-once discipline; blocks are ContextCleaner-freed).
    val resA = phase(QuantizerStore.prober(flat, router,
        math.min(nProbeMin, flat.length))(queries, idCol, vecCol)
      .select(col("query_id"), col("cell")))
      .localCheckpoint()
    if (nProbeMax <= nProbeMin) resA
    else {
      val kth = resA.filter(col("rank") === k && col("cosine").isNotNull)
        .select(col("query_id"), col("cosine").as("kth"))
      val qB = (router match {
          case Some(q2) => Ann.extraProbeFrameRouted(queries, idCol,
            vecCol, q2, radii, kth, nProbeMin, nProbeMax)
          case None => Ann.extraProbeFrame(queries, idCol, vecCol, flat,
            radii, kth, nProbeMin, nProbeMax)
        })
        .select(col("query_id"), col("cell"))
      val cellsB = qB.select(col("cell")).distinct().collect()
      if (cellsB.isEmpty) resA
      else Ann.ranked(
        resA.select(col("query_id"), col("cand_id"), col("cosine"))
          .unionAll(phase(qB)
            .select(col("query_id"), col("cand_id"), col("cosine"))), k)
    }
  }
}
