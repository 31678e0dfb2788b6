package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.lake.{Lake, TableDef}

/** Lake persistence for coarse quantizers, shared by the persisted ANN
  * indexes and [[graft.dedup.SemDeDupIndex]]: the flat cell table is
  * always written (cell, centroid — the serving layout every search
  * path reads), and large-k builds additionally persist the TOP-ROUTER
  * table (branch, offset into the flat table, router centroid). A
  * loaded index routes when the router is present and stays flat
  * otherwise, so one serving code path covers both regimes and the
  * flat regime's bytes never change. */
private[graft] object QuantizerStore {

  def topTableDef(prefix: String): TableDef = TableDef(s"${prefix}_top",
    StructType(Seq(StructField("branch", IntegerType),
      StructField("offset", IntegerType),
      StructField("centroid", ArrayType(DoubleType)))))

  /** Write the router rows (empty frame for a flat build, so the table
    * always exists after a build — [[load]] judges the REGIME from the
    * caller's configured k, not from table presence). */
  def writeTop(lake: Lake, t: TableDef, q: Option[Ann.TwoLevelQuantizer],
      version: Long, spark: SparkSession): Unit = {
    import spark.implicits._
    q match {
      case Some(q2) =>
        lake.replace(t,
          q2.top.toIndexedSeq.zipWithIndex
            .map { case (cen, b) => (b, q2.offsets(b), cen.toSeq) }
            .toDF("branch", "offset", "centroid"), version)
      case None =>
        lake.replace(t, spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          t.schema), version)
    }
  }

  /** Rebuild the quantizer from the flat cell table plus (optionally)
    * the router table: (flat centroid array, router if persisted).
    *
    * `expectRouted` is the index's OWN configured regime (nLists/
    * nClusters past [[Ann.FlatQuantizerMax]]) and must match the store:
    * a large-k config over a router-less store would probe FLAT while
    * the stored rows were ROUTE-assigned (a row's routed cell need not
    * be its flat-argmin cell — probes silently miss), and a flat config
    * over a routed store is the same corruption mirrored. Both fail
    * loudly here instead. The router rows are also structurally
    * validated against the flat table (offsets start at 0, strictly
    * increase, stay in bounds): a crash BETWEEN the two table swaps of
    * a re-build at a different k would otherwise reconstruct a
    * misaligned quantizer that probes the wrong cells without error. */
  def load(lake: Lake, prefix: String, centroidTable: TableDef,
      topTable: TableDef, expectRouted: Boolean)
      : (Array[Array[Double]], Option[Ann.TwoLevelQuantizer]) = {
    val flat = lake.table(centroidTable).orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    require(flat.nonEmpty,
      s"$prefix: no centroids found — build() the index first")
    val tops = lake.table(topTable).orderBy(col("branch")).collect()
      .map(r => (r.getInt(1), r.getSeq[Double](2).toArray))
    require(tops.nonEmpty == expectRouted,
      s"$prefix: quantizer regime mismatch — the index is configured " +
        s"${if (expectRouted) "large-k (routed)" else "flat"} but the store " +
        s"holds ${if (tops.isEmpty) "no" else tops.length.toString} router " +
        "rows; re-run build() at this configuration")
    if (tops.isEmpty) (flat, None)
    else {
      val offsets = tops.map(_._1)
      require(offsets.head == 0 &&
          offsets.zip(offsets.tail).forall { case (a, b) => a < b } &&
          offsets.last < flat.length,
        s"$prefix: router offsets inconsistent with the flat cell table " +
          s"(${offsets.length} branches over ${flat.length} cells) — " +
          "partial build detected, re-run build()")
      val bounds = offsets :+ flat.length
      (flat, Some(Ann.TwoLevelQuantizer(
        tops.map(_._2),
        Array.tabulate(tops.length)(b =>
          flat.slice(bounds(b), bounds(b + 1))))))
    }
  }

  /** The frozen assignment function for a loaded quantizer: routed
    * O(√k) when the router is present, flat argmin otherwise — ONE
    * dispatch shared by every index's build/append path. */
  def assigner(flat: Array[Array[Double]],
      router: Option[Ann.TwoLevelQuantizer]): DataFrame => DataFrame =
    router match {
      case Some(q) => d => Ann.assignCellsTwoLevel(d, q)
      case None => d => Ann.assignCells(d, flat)
    }

  /** [[assigner]] with the squared-distance score kept beside the cell
    * (both variants share the plain assigners' argmin arithmetic, so
    * CELLS are bit-identical — only the extra column differs). The
    * score is what the 'farthest' survivor policy ranks on. */
  def scoredAssigner(flat: Array[Array[Double]],
      router: Option[Ann.TwoLevelQuantizer]): DataFrame => DataFrame =
    router match {
      case Some(q) => d => Ann.assignCellsTwoLevelScored(d, q)
      case None => d => Ann.assignCellsScored(d, flat)
    }

  /** Per-cell angular-radius table (cell, rcos = min member-to-centroid
    * cosine — [[Ann.cellRadii]]'s layout): what the adaptive search's
    * cell bound reads. Written at build, MIN-MERGED at append (a new
    * member can only widen its cell), untouched by delete/compact
    * (shrinking a cell keeps the stored radius a sound, conservative
    * over-estimate — the bound errs toward probing). */
  def radiiTableDef(prefix: String): TableDef = TableDef(s"${prefix}_radii",
    StructType(Seq(StructField("cell", IntegerType),
      StructField("rcos", DoubleType))))

  def writeRadii(lake: Lake, t: TableDef, radii: Array[Double],
      version: Long, spark: SparkSession): Unit = {
    import spark.implicits._
    lake.replace(t,
      radii.toIndexedSeq.zipWithIndex.map { case (r, i) => (i, r) }
        .toDF("cell", "rcos"), version)
  }

  /** Widen stored radii by a batch's own (element-wise min of the two
    * cos arrays) — the O(1)-sized append-path update. A store built
    * before the radii table existed is seeded VACUOUS here (rcos = −1,
    * the full sphere): sound — the adaptive bound can only err toward
    * probing — merely unprunable for the pre-existing cells, so appends
    * to legacy stores keep working without a rebuild (adaptive search
    * regains pruning power on a build() at this version). */
  def mergeRadii(lake: Lake, t: TableDef, batch: Array[Double],
      version: Long, spark: SparkSession): Unit = {
    val stored =
      if (lake.exists(t.name)) loadRadii(lake, t, batch.length)
      else Array.fill(batch.length)(-1.0)
    writeRadii(lake, t,
      Array.tabulate(batch.length)(i => math.min(stored(i), batch(i))),
      version, spark)
  }

  /** Radii indexed by cell; loud on a store built before the radii
    * table existed (adaptive search needs a build() at this version). */
  def loadRadii(lake: Lake, t: TableDef, nCells: Int): Array[Double] = {
    val rows = lake.table(t).collect()
    require(rows.nonEmpty,
      s"${t.name}: no cell radii found — re-run build() (adaptive " +
        "search needs the radii table this build version writes)")
    val out = Array.fill(nCells)(1.0)
    rows.foreach { r =>
      val c = r.getInt(0)
      require(c >= 0 && c < nCells,
        s"${t.name}: radius row for cell $c outside [0, $nCells) — " +
          "the radii table does not match this quantizer; re-run build()")
      out(c) = r.getDouble(1)
    }
    out
  }

  /** The matching probe-expansion function for search paths: one row
    * per (query, probed cell), routed or flat to MATCH [[assigner]] —
    * probes must look where assignment put the candidates. */
  def prober(flat: Array[Array[Double]],
      router: Option[Ann.TwoLevelQuantizer], nProbe: Int)
      : (DataFrame, String, String) => DataFrame =
    router match {
      case Some(q) =>
        (qs, id, vc) => Ann.probeQueriesTwoLevel(qs, id, vc, q, nProbe)
      case None => (qs, id, vc) => Ann.probeQueries(qs, id, vc, flat, nProbe)
    }
}
