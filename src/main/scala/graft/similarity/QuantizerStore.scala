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

  /** Write the router rows (empty frame for a flat build — presence of
    * an empty table marks "flat on purpose" vs "pre-upgrade layout"). */
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
    * the router table: (flat centroid array, router if persisted). */
  def load(lake: Lake, prefix: String, centroidTable: TableDef,
      topTable: TableDef): (Array[Array[Double]], Option[Ann.TwoLevelQuantizer]) = {
    val flat = lake.table(centroidTable).orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    require(flat.nonEmpty,
      s"$prefix: no centroids found — build() the index first")
    val tops = lake.table(topTable).orderBy(col("branch")).collect()
      .map(r => (r.getInt(1), r.getSeq[Double](2).toArray))
    if (tops.isEmpty) (flat, None)
    else {
      val offsets = tops.map(_._1) :+ flat.length
      (flat, Some(Ann.TwoLevelQuantizer(
        tops.map(_._2),
        Array.tabulate(tops.length)(b =>
          flat.slice(offsets(b), offsets(b + 1))))))
    }
  }
}
