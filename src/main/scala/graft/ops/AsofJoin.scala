package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks the right row with the
  * greatest time at-or-before its own, per key — trades-vs-quotes,
  * order-vs-last-price, event-vs-last-state. The reference's panel joins
  * are all exact-date equi-joins (stock_prices are daily bars), but any
  * intraday consumer of the same tables needs this operator, and Spark has
  * no built-in for it.
  *
  * Spark-first plan: instead of a per-key range join (quadratic in rows
  * per key, and Spark plans theta-joins as BroadcastNestedLoop), the two
  * sides UNION on (keys, t) with a side marker and one ordered window pass
  * carries the last-seen right payload forward:
  *
  *   union → single hash exchange on keys → per-partition sort → filter
  *
  * Cost at any scale is one shuffle of |L|+|R| rows and a per-key sort —
  * the same exchange a plain equi-join would pay, with no pair blow-up.
  * Ties (left.t == right.t) take the right row (inclusive backward join,
  * matching DuckDB's `ASOF JOIN ... ON l.t >= r.t`).
  *
  * Contract: `right` must be unique per (keys, tCol) — pre-aggregate if
  * not (which right row "the" match means is otherwise undefined). Left
  * rows earlier than every right row get null as-of columns (left join).
  */
object AsofJoin {

  /** @param valueCols right-side payload columns to carry; each appears in
    *                  the output as `asof_<name>`, plus `asof_<tCol>` for
    *                  the matched time itself */
  def backward(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], tCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == tCol).toSeq
    val rv = struct(col(tCol).as(s"asof_$tCol") +:
      valueCols.map(c => col(c).as(s"asof_$c")): _*)
    val base = keys.map(col) :+ col(tCol)
    val l2 = left.select(base ++ Seq(lit(1).as("__side")) ++
      (if (leftPayload.nonEmpty) Seq(struct(leftPayload.map(col): _*).as("__lv")) else Nil): _*)
    val r2 = right.select(base ++ Seq(lit(0).as("__side"), rv.as("__rv")): _*)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    // side asc puts the right row FIRST at equal t, so last() sees it —
    // that single sort key is what makes the join inclusive
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(base ++
        leftPayload.map(c => col("__lv").getField(c).as(c)) ++
        (tCol +: valueCols).map(c => col("__asof").getField(s"asof_$c").as(s"asof_$c")): _*)
  }
}
