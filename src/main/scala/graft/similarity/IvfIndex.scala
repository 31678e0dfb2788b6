package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  *     pass and plainly appended; stored vectors are never read or
  *     rewritten on the daily path;
  *   - re-ingested ids are superseded by VERSION at the next [[compact]]
  *     (the lake's primary-key compaction — the same machinery the price
  *     tables use), not by rewriting the store inside append. Between a
  *     re-ingest and the next compact a search may return the superseded
  *     row — the standard staleness window of every delta-architecture
  *     vector store; [[compact]] closes it.
  *   - [[search]] collects each query batch's probed cell ids (≤ nLists
  *     ints) and filters the vector table with them as LITERALS, so
  *     Catalyst prunes cell partitions STATICALLY — a search reads
  *     ~nProbe/nLists of the index from disk, no dynamic-pruning
  *     machinery required.
  *
  * Centroids are deterministic ([[Ann.trainCentroids]]: hash-sampled,
  * seeded farthest-point Lloyd), so IvfIndexSpec can pin search-after-
  * build byte-equal to the one-shot [[Ann.ivfTopK]] on the same corpus.
  * The byte-parity contract covers every integral id width ([[vecs]]
  * rejects non-integral ids): [[Ann.hashSample]] widens the id to long
  * before hashing, so a narrow id column draws the identical training
  * sample as the stored LongType `cand_id` (IvfPqIndexSpec pins int and
  * short parity through the richer IVFADC composition).
  * Drift note: appended batches shift the data distribution the frozen
  * centroids were trained on — recall decays gradually, and the recovery
  * is a [[build]] re-run (cheap relative to the daily path; the x39-style
  * recall gate is the drift detector).
  */
class IvfIndex(lake: Lake, prefix: String = "ivf", nLists: Int = 16) {

  val centroidTable: TableDef = TableDef(s"${prefix}_centroids",
    StructType(Seq(StructField("cell", IntegerType),
      StructField("centroid", ArrayType(DoubleType)))))
  /** Top-router table, non-empty ONLY for large-k builds (nLists past
    * [[Ann.FlatQuantizerMax]]): its presence switches append/search to
    * the routed O(√k) assignment and routed probes — matching the
    * one-shot [[Ann.ivfTopK]]'s large-k arm, so the x45 byte-parity
    * contract holds in BOTH regimes. */
  val topTable: TableDef = QuantizerStore.topTableDef(prefix)
  val vectorTable: TableDef = TableDef(s"${prefix}_vectors",
    StructType(Seq(StructField("cand_id", LongType),
      StructField("cv", ArrayType(DoubleType)),
      StructField("cell", IntegerType))),
    partitionKeys = Seq("cell"),
    primaryKeys = Seq("cand_id"),
    clusterWrites = true)
  /** Pending deletes ([[delete]]) awaiting the next [[compact]] —
    * version-aware semantics in [[TombstoneStore]]. */
  val tombTable: TableDef = TombstoneStore.tableDef(prefix)
  /** Per-cell angular radii for [[searchAdaptive]]'s sound cell bound
    * ([[QuantizerStore.radiiTableDef]] contract). */
  val radiiTable: TableDef = QuantizerStore.radiiTableDef(prefix)

  private def vecs(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val t = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
      s"$prefix: id column '$idCol' must be integral (stored as long), got $t")
    df.select(col(idCol).cast(LongType).as("cand_id"),
      asDouble(col(vecCol)).as("cv"))
  }

  /** Train the quantizer on `corpus` and write the tables, each via the
    * lake's temp-write + swap ([[Lake.replace]]): a mid-build failure
    * leaves the previous index intact and serving — old data is never
    * deleted before its replacement is fully materialized. The swaps
    * are not jointly atomic: a crash BETWEEN them leaves new vectors with
    * old centroids (searches are wrong, not lost) and a build re-run
    * converges it. One full pass over the corpus.
    *
    * nLists ≤ [[Ann.FlatQuantizerMax]] trains the flat driver quantizer
    * (bytes unchanged from every prior round; the router table is written
    * EMPTY to mark "flat on purpose"). Larger nLists trains the two-level
    * quantizer and persists its router rows, so every later [[append]]/
    * [[search]] serves the routed large-k shape from disk. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      version: Long): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = vecs(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (flat, router) =
      if (nLists <= Ann.FlatQuantizerMax)
        (Ann.trainCentroids(c, nLists), None)
      else {
        val q2 = Ann.trainTwoLevel(c, nLists, Ann.hashSample(c))
        (q2.flat, Some(q2))
      }
    val assigned = QuantizerStore.assigner(flat, router)(c)
    lake.replace(vectorTable, assigned, version)
    lake.replace(centroidTable,
      flat.toIndexedSeq.zipWithIndex
        .map { case (cen, i) => (i, cen.toSeq) }
        .toDF("cell", "centroid"), version)
    QuantizerStore.writeTop(lake, topTable, router, version, spark)
    // radii re-derive the assignment from the cached corpus (a broadcast
    // argmin pass, no disk read-back) — one aggregate, ≤ nLists rows
    QuantizerStore.writeRadii(lake, radiiTable,
      Ann.cellRadii(assigned, flat), version, spark)
    c.unpersist()
  }

  // Lake.table resolves a missing table to an empty frame; QuantizerStore
  // .load's requires turn that into loud pre-build / regime-mismatch /
  // partial-build failures instead of silently-empty searches or
  // everything-in-cell-0 appends.
  private def loadQuantizer(): (Array[Array[Double]], Option[Ann.TwoLevelQuantizer]) =
    QuantizerStore.load(lake, prefix, centroidTable, topTable,
      expectRouted = nLists > Ann.FlatQuantizerMax)

  /** Assign a new batch to the FROZEN centroids and append it — O(batch)
    * work, touching no stored data. Duplicate ids WITHIN the batch are
    * collapsed here (same survivor rule as [[Lake.optimize]]'s tie-break:
    * remaining columns descending) so append-then-compact and a direct
    * compact agree on the surviving row. A re-ingested id's OLD stored row
    * remains until [[compact]] supersedes it by version. */
  def append(newVecs: DataFrame, idCol: String, vecCol: String,
      version: Long): Unit = {
    val (flat, router) = loadQuantizer()
    val assigned = QuantizerStore.assigner(flat, router)(
      vecs(newVecs, idCol, vecCol))
    val w = Window.partitionBy(col("cand_id"))
      .orderBy(col("cell").desc, col("cv").desc)
    val deduped = assigned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lake.append(vectorTable, deduped, version)
    // widen touched cells' radii so the adaptive bound stays sound for
    // appended members — O(batch) aggregate, tiny table rewrite
    QuantizerStore.mergeRadii(lake, radiiTable,
      Ann.cellRadii(deduped, flat), version, newVecs.sparkSession)
    deduped.unpersist()
  }

  /** Drift recovery in one call: retrain the quantizer on the STORED
    * corpus and rebuild the index in place — the documented recovery
    * for append drift (frozen centroids decaying as batches shift the
    * distribution). Compacts FIRST so superseded re-ingested rows do
    * not re-enter, then materializes the snapshot (localCheckpoint)
    * because [[build]] swaps the very table it reads. Inherently
    * O(corpus) — the cost of a fresh build, by design. */
  def rebuild(version: Long): Unit = {
    compact()
    val snap = lake.table(vectorTable)
      .select(col("cand_id"), col("cv").as("embedding"))
      .localCheckpoint()
    require(!snap.isEmpty, s"$prefix: nothing stored — build() the index first")
    build(snap, "cand_id", "embedding", version)
  }

  /** O(batch) delete: append the ids as tombstones — stored rows at
    * version ≤ `version` stop being served from the next [[search]] on,
    * and are physically removed at the next [[compact]]. A later
    * [[append]] of the same id at a HIGHER version revives it (the
    * lake's supersede rule). No stored data is read or rewritten here. */
  def delete(ids: DataFrame, idCol: String, version: Long): Unit =
    TombstoneStore.delete(lake, tombTable, ids, idCol, version)

  /** Primary-key compaction of the vector table: one row per cand_id,
    * newest version wins ([[Lake.optimize]]), then pending [[delete]]
    * tombstones are applied and drained ([[TombstoneStore.applyTo]] —
    * `version` stamps the delete-bearing rewrite). Global, not
    * cell-scoped — a re-ingested vector can MOVE cells, so its stale row
    * may sit in a partition the fresh batch never touched. Run on the
    * maintenance cadence (the reference's daily `optimize()` idiom), not
    * per append. */
  def compact(version: Long = System.currentTimeMillis()): Unit =
    TombstoneStore.applyTo(lake, tombTable, vectorTable, version)

  /** Approximate top-k for a query batch, reading only the probed cells'
    * partitions. Identical semantics (and, right after [[build]],
    * identical bytes) to [[Ann.ivfTopK]] at the same nLists/nProbe. */
  def search(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 2): DataFrame = {
    val (flat, router) = loadQuantizer()
    // q is NOT cached: it is evaluated twice (the cell collect below and
    // the score join), but it is a |Q|-row frame against broadcast
    // centroids — recomputing it is cheaper than leaking one pinned cache
    // entry per search call from a long-lived serving process.
    val q = QuantizerStore.prober(flat, router, nProbe)(queries, idCol, vecCol)
    // literal cell list → the read RESOLVES only the probed cells'
    // partition directories (tableSlice — the listing itself is
    // O(probed), which planner-side pruning alone can't deliver at
    // 2^16 cells), and the isin filter keeps the literal partition
    // pruning visible in the plan. The probe relation is tiny (|Q| rows
    // pre-explode), so this collect is a driver round-trip over
    // ≤ nLists ints, not a corpus job.
    val cells = q.select(col("cell")).distinct().collect().map(_.getInt(0))
    Ann.scoreCells(liveSlice(cells), q, k)
  }

  /** Probed cells' partitions, pending deletes filtered version-aware
    * before scoring; the no-tombstone path (the normal case) reads
    * version-less and adds no join node — plan-identical to the
    * pre-delete serving shape. */
  private def liveSlice(cells: Array[Int]): DataFrame = {
    val tombs = TombstoneStore.pending(lake, tombTable)
    val slice = lake.tableSlice(vectorTable,
        cells.toIndexedSeq.map(c => s"cell=$c"), keepVersion = tombs)
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
    if (tombs) TombstoneStore.filterLive(lake, tombTable, slice)
      .drop(graft.lake.Lake.Version)
    else slice
  }

  /** Query-adaptive search (the [[Ann.ivfTopKAdaptive]] rule served
    * from disk): phase A reads the nProbeMin nearest cells' partitions;
    * phase B reads ONLY the extra cells whose stored-radius bound
    * ([[radiiTable]]) can still beat the query's current k-th hit,
    * capped at nProbeMax. Clustered corpora stop at nProbeMin
    * partitions; adversarial ones cap at nProbeMax — IO is bounded
    * either way, and with nProbeMax = nLists the result is byte-equal
    * to a full-probe [[search]] (the bound only prunes cells provably
    * below the k-th hit — IvfIndexSpec pins it). Phase A is reduced to
    * its per-query top-k and localCheckpointed (|Q|·k rows) before
    * reuse — evaluate-once without the pinned-cache-entry-per-call
    * leak a persist would be; top-k distributes over the phase union
    * because the ranking order is total, so the parity certificate is
    * untouched.
    * In the routed large-k regime phase A probes through the persisted
    * two-level quantizer and phase B prunes whole BRANCHES first
    * ([[Ann.branchAngles]] / [[Ann.extraProbeFrameRouted]]) — probe
    * selection is O(√k · surviving branches) per query, so adaptive
    * serving stays viable at 2^14+ cells where ranking every cell
    * bound would itself cost O(k). Both regimes keep the full-cap
    * byte-parity certificate. */
  def searchAdaptive(queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nProbeMin: Int = 2, nProbeMax: Int = 8): DataFrame = {
    require(nProbeMin >= 1 && nProbeMin <= nProbeMax,
      s"need 1 <= nProbeMin <= nProbeMax, got ($nProbeMin, $nProbeMax)")
    val (flat, router) = loadQuantizer()
    val radii = QuantizerStore.loadRadii(lake, radiiTable, flat.length)
    val qA = QuantizerStore.prober(flat, router,
      math.min(nProbeMin, flat.length))(queries, idCol, vecCol)
    val cellsA = qA.select(col("cell")).distinct().collect().map(_.getInt(0))
    // phase A is REDUCED to its per-query top-k before anything reuses
    // it: the ranked ordering (cosine desc nulls last, cand_id) is total
    // per query, so top-k(top-k(A) ∪ B) ≡ top-k(A ∪ B) byte-exactly —
    // the |Q|·k frame is what the k-th-hit threshold, the empty-phase-B
    // return, AND the merge all need, and localCheckpointing it
    // evaluates the phase-A partition scan ONCE instead of the three
    // times the lazy form paid per serving call (cellsB collect, the
    // kth subplan, the final ranked plan — ~10 jobs of re-read at
    // cadence). The checkpointed blocks are |Q|·k narrow rows, freed by
    // the ContextCleaner when the returned frame is dropped — not the
    // pinned-cache-entry-per-call leak the scoredA persist would be.
    val topA = Ann.ranked(Ann.scoredCells(liveSlice(cellsA), qA)
        .select(col("query_id"), col("cand_id"), col("cosine")), k)
      .localCheckpoint()
    if (nProbeMax <= nProbeMin) topA
    else {
      // ranked's rank-k row IS kthCosine's k-th hit: nulls sort last,
      // so whenever a query has k non-null hits the two agree, and
      // when it has fewer this filter emits nothing — the no-threshold
      // probe-to-cap contract, unchanged
      val kth = topA.filter(col("rank") === k && col("cosine").isNotNull)
        .select(col("query_id"), col("cosine").as("kth"))
      val qB = router match {
        case Some(q2) => Ann.extraProbeFrameRouted(queries, idCol,
          vecCol, q2, radii, kth, nProbeMin, nProbeMax)
        case None => Ann.extraProbeFrame(queries, idCol, vecCol, flat,
          radii, kth, nProbeMin, nProbeMax)
      }
      val cellsB = qB.select(col("cell")).distinct().collect()
        .map(_.getInt(0))
      if (cellsB.isEmpty) topA
      else Ann.ranked(
        topA.select(col("query_id"), col("cand_id"), col("cosine"))
          .unionAll(Ann.scoredCells(liveSlice(cellsB), qB)
            .select(col("query_id"), col("cand_id"), col("cosine"))), k)
    }
  }
}
