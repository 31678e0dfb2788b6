package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.CoreOps
import Tables.t

/** SURVEY.md §2.1 scans/sinks (S1, S4, S11), §2.2 projections/filters
  * (P1-P21), §2.3 joins (J1-J8), §2.4 aggregations (A1-A8), §2.6 sorts
  * (O1-O5), §2.7 set ops / reshape (R1-R6).
  *
  * Each query is the Spark-idiomatic form of the reference operator cited
  * in SURVEY.md, exercised on the driver's TPC-H-ish testdata. Plans are
  * deliberately declarative: filters/projections reach the parquet scan,
  * dimension joins broadcast, aggregations keep map-side partials.
  *
  * Row-ordering note: (l_orderkey, l_linenumber) is NOT unique in this
  * synthetic lineitem; the unique total order is (l_orderkey,
  * l_linenumber, l_partkey, l_suppkey). Per-row queries sort on that full
  * key (before projecting) so Spark and the DuckDB oracle agree row-wise.
  */
object CoreQueries {

  /** Unique lineitem total order — Spark side. */
  private def liOrder: Seq[Column] =
    Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey").map(col)

  /** Unique lineitem total order — oracle side. */
  private val liOrderSql = "l_orderkey, l_linenumber, l_partkey, l_suppkey"

  val defs: Seq[QueryDef] = Seq(

    // S1: pruned scan — projection + predicate pushdown to parquet.
    QueryDef("s1_scan_pruned",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1996-01-01").cast(TimestampType) &&
            $"l_shipdate" < lit("1997-01-01").cast(TimestampType))
          .orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
      },
      Some(s"""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              |ORDER BY $liOrderSql""".stripMargin)),

    // S4: upsert-by-compaction — append then PK dedup via row_number=1
    // (reference bear_lake.optimize()). The PK here is (l_orderkey,
    // l_linenumber); the deterministic survivor is fixed by the ORDER BY.
    QueryDef("s4_dedup_upsert",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        val appended = li.unionByName(li)
        appended
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"l_orderkey", $"l_linenumber")
              .orderBy($"l_quantity", $"l_extendedprice")))
          .filter($"rn" === 1).drop("rn")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber ORDER BY l_quantity, l_extendedprice) AS rn
             |  FROM (
             |    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
             |    UNION ALL
             |    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
             |  )
             |) WHERE rn = 1
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // S11: epoch seconds → timestamp decode (portfolio_history_flow).
    QueryDef("s11_epoch_decode",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id", unix_timestamp($"ts").as("epoch_s"))
          .withColumn("decoded", timestamp_seconds($"epoch_s"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
             |       TIMESTAMP '1970-01-01' + CAST(FLOOR(epoch(ts)) AS BIGINT) * INTERVAL 1 SECOND AS decoded
             |FROM events ORDER BY event_id""".stripMargin)),

    // P1: column select / reorder.
    QueryDef("p1_select",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      },
      Some(s"SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY $liOrderSql")),

    // P2: alias / rename.
    QueryDef("p2_alias",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey".as("order_id"), $"l_linenumber".as("line_no"),
            $"l_extendedprice".as("price"))
      },
      Some(s"SELECT l_orderkey AS order_id, l_linenumber AS line_no, l_extendedprice AS price FROM lineitem ORDER BY $liOrderSql")),

    // P3: cast (timestamp→date, int→bigint).
    QueryDef("p3_cast",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber",
            $"l_shipdate".cast(DateType).as("ship_date"),
            $"l_linenumber".cast(LongType).as("line_no_l"))
      },
      Some(s"SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date, CAST(l_linenumber AS BIGINT) AS line_no_l FROM lineitem ORDER BY $liOrderSql")),

    // P4: drop_nulls (subset).
    QueryDef("p4_drop_nulls",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events").na.drop(Seq("value", "props"))
          .select($"event_id", $"value", $"props").orderBy($"event_id")
      },
      Some("SELECT event_id, value, props FROM events WHERE value IS NOT NULL AND props IS NOT NULL ORDER BY event_id")),

    // P5: fill_null(0).
    QueryDef("p5_fill_null",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id", coalesce($"value", lit(0.0)).as("value_filled"))
          .orderBy($"event_id")
      },
      Some("SELECT event_id, COALESCE(value, 0.0) AS value_filled FROM events ORDER BY event_id")),

    // P6: range predicate is_between.
    QueryDef("p6_between",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").filter($"l_quantity".between(10, 20))
          .orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      },
      Some(s"SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 ORDER BY $liOrderSql")),

    // P7: equality / ordering predicates.
    QueryDef("p7_compare",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_returnflag" === "R" && $"l_quantity" >= 30 && $"l_discount" <= 0.05)
          .orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
      },
      Some(s"SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 30 AND l_discount <= 0.05 ORDER BY $liOrderSql")),

    // P8: membership is_in + negation.
    QueryDef("p8_isin",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_returnflag".isin("A", "N") && !$"l_linestatus".isin("O"))
          .orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_linestatus")
      },
      Some(s"SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus FROM lineitem WHERE l_returnflag IN ('A','N') AND l_linestatus NOT IN ('O') ORDER BY $liOrderSql")),

    // P9: null test.
    QueryDef("p9_not_null",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events").filter($"props".isNotNull)
          .select($"event_id", $"props").orderBy($"event_id")
      },
      Some("SELECT event_id, props FROM events WHERE props IS NOT NULL ORDER BY event_id")),

    // P10: conjunctive multi-predicate filter.
    QueryDef("p10_multi_pred",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .filter($"o_orderstatus" === "F" && $"o_totalprice" > 100000.0 &&
            $"o_orderpriority".isin("1-URGENT", "2-HIGH"))
          .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
          .orderBy($"o_orderkey")
      },
      Some("SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0 AND o_orderpriority IN ('1-URGENT','2-HIGH') ORDER BY o_orderkey")),

    // P11: arithmetic expression calculus (row-local → bitwise deterministic).
    QueryDef("p11_arith",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("charge"))
      },
      Some(s"SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge FROM lineitem ORDER BY $liOrderSql")),

    // P12: clip(lower_bound=0) — reference trading_flow.py:26.
    QueryDef("p12_clip",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id", CoreOps.clipLower($"value" - lit(100.0), 0.0).as("clipped"))
          .orderBy($"event_id")
      },
      Some("SELECT event_id, GREATEST(value - 100.0, 0.0) AS clipped FROM events ORDER BY event_id")),

    // P13: abs.
    QueryDef("p13_abs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id", abs($"value" - lit(100.0)).as("abs_dev"))
          .orderBy($"event_id")
      },
      Some("SELECT event_id, ABS(value - 100.0) AS abs_dev FROM events ORDER BY event_id")),

    // P14: round(2) on a dyadic-exact value (qty/4) — grid-safe both engines.
    QueryDef("p14_round",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", round($"l_quantity" / 4.0, 2).as("qty_q"))
      },
      Some(s"SELECT l_orderkey, l_linenumber, ROUND(l_quantity / 4.0, 2) AS qty_q FROM lineitem ORDER BY $liOrderSql")),

    // P15: log1p.
    QueryDef("p15_log1p",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", round(log1p($"l_discount"), 6).as("log1p_disc"))
      },
      Some(s"SELECT l_orderkey, l_linenumber, ROUND(LN(1.0 + l_discount), 6) AS log1p_disc FROM lineitem ORDER BY $liOrderSql")),

    // P16: literal injection.
    QueryDef("p16_lit",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", lit("signal").as("tag"),
            lit(2.5).as("factor"), ($"l_quantity" * lit(2.5)).as("scaled"))
      },
      Some(s"SELECT l_orderkey, l_linenumber, 'signal' AS tag, 2.5 AS factor, l_quantity * 2.5 AS scaled FROM lineitem ORDER BY $liOrderSql")),

    // P17: horizontal max across columns.
    QueryDef("p17_greatest",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", greatest($"l_discount", $"l_tax").as("max_rate"))
      },
      Some(s"SELECT l_orderkey, l_linenumber, GREATEST(l_discount, l_tax) AS max_rate FROM lineitem ORDER BY $liOrderSql")),

    // P18: horizontal sum of products (residual calculus shape).
    QueryDef("p18_horizontal_dot",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber",
            ($"l_quantity" - CoreOps.horizontalDot(Seq(
              $"l_extendedprice" -> $"l_discount",
              $"l_extendedprice" -> $"l_tax")) / lit(1000.0)).as("resid_like"))
      },
      Some(s"SELECT l_orderkey, l_linenumber, l_quantity - (l_extendedprice * l_discount + l_extendedprice * l_tax) / 1000.0 AS resid_like FROM lineitem ORDER BY $liOrderSql")),

    // P19: negation via mul(-1).
    QueryDef("p19_negate",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", (-$"l_quantity").as("neg_qty"))
      },
      Some(s"SELECT l_orderkey, l_linenumber, -l_quantity AS neg_qty FROM lineitem ORDER BY $liOrderSql")),

    // P20: dict value remap with passthrough (factor rename shape).
    QueryDef("p20_remap",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber",
            CoreOps.remap($"l_returnflag", Map("R" -> "RETURNED", "A" -> "ACCEPTED")).as("flag_name"))
      },
      Some(s"SELECT l_orderkey, l_linenumber, CASE WHEN l_returnflag = 'R' THEN 'RETURNED' WHEN l_returnflag = 'A' THEN 'ACCEPTED' ELSE l_returnflag END AS flag_name FROM lineitem ORDER BY $liOrderSql")),

    // P21: string date parse with explicit format.
    QueryDef("p21_date_parse",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber",
            to_date(date_format($"l_shipdate", "yyyy/MM/dd"), "yyyy/MM/dd").as("reparsed"))
      },
      Some(s"SELECT l_orderkey, l_linenumber, CAST(strptime(strftime(l_shipdate, '%Y/%m/%d'), '%Y/%m/%d') AS DATE) AS reparsed FROM lineitem ORDER BY $liOrderSql")),

    // J1: left equi-join gating (universe-gate shape).
    QueryDef("j1_left_join",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey", "left")
          .select($"o_orderkey", $"o_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"o_orderkey")
      },
      Some("SELECT o_orderkey, o_custkey, c_name, c_mktsegment FROM orders LEFT JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey")),

    // J2: fact × broadcast dimension (panel × wide-factors shape).
    QueryDef("j2_broadcast_dim",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey", "left")
          .orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"p_brand", $"l_extendedprice")
      },
      Some(s"SELECT l_orderkey, l_linenumber, l_partkey, p_brand, l_extendedprice FROM lineitem LEFT JOIN part ON l_partkey = p_partkey ORDER BY $liOrderSql")),

    // J3: left enrich join.
    QueryDef("j3_left_enrich",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey", "left")
          .orderBy(liOrder: _*)
          .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"s_name", $"l_quantity")
      },
      Some(s"SELECT l_orderkey, l_linenumber, l_suppkey, s_name, l_quantity FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey ORDER BY $liOrderSql")),

    // J4: full outer join + key coalesce + zero-fill (target-vs-current
    // notional diff, trading_flow.py:53-59). Spark's Seq-key join coalesces
    // the key natively.
    QueryDef("j4_full_outer_diff",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val f = o.filter($"o_orderstatus" === "F").groupBy($"o_custkey")
          .agg(count(lit(1)).as("cnt_f"))
        val g = o.filter($"o_orderstatus" === "O").groupBy($"o_custkey")
          .agg(count(lit(1)).as("cnt_o"))
        CoreOps.fullOuterDiff(f, g, Seq("o_custkey"), Seq.empty)
          .na.fill(0L, Seq("cnt_f", "cnt_o"))
          .withColumn("delta", $"cnt_f" - $"cnt_o")
          .orderBy($"o_custkey")
      },
      Some("""SELECT COALESCE(f.o_custkey, g.o_custkey) AS o_custkey,
             |       COALESCE(cnt_f, 0) AS cnt_f, COALESCE(cnt_o, 0) AS cnt_o,
             |       COALESCE(cnt_f, 0) - COALESCE(cnt_o, 0) AS delta
             |FROM (SELECT o_custkey, COUNT(*) AS cnt_f FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) f
             |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS cnt_o FROM orders WHERE o_orderstatus = 'O' GROUP BY 1) g
             |  ON f.o_custkey = g.o_custkey
             |ORDER BY o_custkey""".stripMargin)),

    // J5: join after dropping a column (active-vs-benchmark weights shape).
    QueryDef("j5_join_drop",
      (s, dir) => {
        import s.implicits._
        val best = t(s, dir, "orders").drop("o_orderdate")
          .groupBy($"o_custkey").agg(max($"o_totalprice").as("best_price"))
        t(s, dir, "customer")
          .join(best, $"c_custkey" === $"o_custkey", "left").drop("o_custkey")
          .select($"c_custkey", $"c_acctbal", $"best_price")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal, best_price
             |FROM customer LEFT JOIN (SELECT o_custkey, MAX(o_totalprice) AS best_price FROM orders GROUP BY 1) o
             |  ON c_custkey = o_custkey
             |ORDER BY c_custkey""".stripMargin)),

    // J6: semi-join membership filter.
    QueryDef("j6_semi_join",
      (s, dir) => {
        import s.implicits._
        val big = t(s, dir, "lineitem").filter($"l_quantity" > 45)
          .select($"l_orderkey")
        t(s, dir, "orders").join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
          .select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_orderkey")
      },
      Some("SELECT o_orderkey, o_totalprice FROM orders WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45) ORDER BY o_orderkey")),

    // J7: anti-join exclusion.
    QueryDef("j7_anti_join",
      (s, dir) => {
        import s.implicits._
        val big = t(s, dir, "lineitem").filter($"l_quantity" > 45)
          .select($"l_orderkey")
        t(s, dir, "orders").join(big, $"o_orderkey" === $"l_orderkey", "left_anti")
          .select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_orderkey")
      },
      Some("SELECT o_orderkey, o_totalprice FROM orders WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45) ORDER BY o_orderkey")),

    // J8: non-equi range join (interval membership shape, universe W9 kin).
    QueryDef("j8_range_join",
      (s, dir) => {
        import s.implicits._
        val iv = t(s, dir, "lineitem").groupBy($"l_returnflag".as("flag"))
          .agg(min($"l_shipdate").as("lo"), max($"l_shipdate").as("hi"))
        t(s, dir, "orders")
          .join(broadcast(iv), $"o_orderdate" >= $"lo" && $"o_orderdate" <= $"hi")
          .groupBy($"flag").agg(count(lit(1)).as("n_orders"))
          .orderBy($"flag")
      },
      Some("""SELECT flag, COUNT(*) AS n_orders
             |FROM (SELECT l_returnflag AS flag, MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi FROM lineitem GROUP BY 1) iv
             |JOIN orders ON o_orderdate >= lo AND o_orderdate <= hi
             |GROUP BY flag ORDER BY flag""".stripMargin)),

    // A1: group-by agg to list (universe change-log shape). Sorted for
    // determinism across partitions, then serialized to a csv string: the
    // driver's compare sorts a pandas frame over every column, and an
    // array-typed column is unhashable there (r01 a1 failure) — a string
    // column carries the identical information and hash-compares cleanly.
    QueryDef("a1_collect_list",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_orderkey")
          .agg(concat_ws(",", sort_array(collect_list($"l_linenumber")))
            .as("line_nos"))
          .orderBy($"l_orderkey")
      },
      Some("SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS line_nos FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey")),

    // A2: group-by weighted sum (benchmark return Σ w·r) — exact via decimal.
    QueryDef("a2_weighted_sum",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(CoreOps.decimalSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
          .orderBy($"l_returnflag")
      },
      Some("SELECT l_returnflag, CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // A3: global max (last market date shape).
    QueryDef("a3_global_max",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").agg(max($"l_shipdate").as("last_ship"))
      },
      Some("SELECT MAX(l_shipdate) AS last_ship FROM lineitem")),

    // A5: distinct.
    QueryDef("a5_distinct",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem").select($"l_returnflag", $"l_linestatus").distinct()
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus")),

    // A6/W8: cross-sectional equal weight 1/N per group.
    QueryDef("a6_equal_weight",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id", $"event_type",
            graft.ops.TimeSeries.equalWeight(Seq("event_type")).as("weight"))
          .orderBy($"event_id")
      },
      Some("SELECT event_id, event_type, 1.0 / COUNT(*) OVER (PARTITION BY event_type) AS weight FROM events ORDER BY event_id")),

    // A7: global sum (notional totals) — exact via decimal.
    QueryDef("a7_total_sum",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").agg(CoreOps.decimalSum($"o_totalprice", 2).as("total_notional"))
      },
      Some("SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_notional FROM orders")),

    // A8: min/max of series.
    QueryDef("a8_minmax",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").agg(
          min($"o_orderdate").as("d_min"), max($"o_orderdate").as("d_max"),
          min($"o_totalprice").as("p_min"), max($"o_totalprice").as("p_max"))
      },
      Some("SELECT MIN(o_orderdate) AS d_min, MAX(o_orderdate) AS d_max, MIN(o_totalprice) AS p_min, MAX(o_totalprice) AS p_max FROM orders")),

    // O1: multi-column canonical sort.
    QueryDef("o1_sort_multi",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .orderBy($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_suppkey")
          .select($"l_partkey", $"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
      },
      Some("SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber, l_extendedprice FROM lineitem ORDER BY l_partkey, l_shipdate, l_orderkey, l_linenumber, l_suppkey")),

    // O2: descending sort (tie-broken for total order).
    QueryDef("o2_sort_desc",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
      },
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey")),

    // O3: limit under a total order.
    QueryDef("o3_limit",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey").limit(100)
      },
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100")),

    // O4: global top-3 by value.
    QueryDef("o4_top3",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey").limit(3)
      },
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 3")),

    // O5: unique + sort (collect stays on the driver in the reference;
    // relational part is distinct+sort).
    QueryDef("o5_distinct_sorted",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").select($"o_orderpriority").distinct().orderBy($"o_orderpriority")
      },
      Some("SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority")),

    // R1: vertical concat (union-all by name).
    QueryDef("r1_union_all",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val hi = li.filter($"l_quantity" >= 40)
          .select(lit("hi").as("bucket"), $"l_orderkey", $"l_linenumber",
            $"l_partkey", $"l_suppkey", $"l_quantity")
        val lo = li.filter($"l_quantity" <= 10)
          .select(lit("lo").as("bucket"), $"l_orderkey", $"l_linenumber",
            $"l_partkey", $"l_suppkey", $"l_quantity")
        CoreOps.unionAll(Seq(hi, lo))
          .orderBy(col("bucket") +: liOrder: _*)
          .drop("l_partkey", "l_suppkey")
      },
      Some(s"""SELECT bucket, l_orderkey, l_linenumber, l_quantity FROM (
              |  SELECT 'hi' AS bucket, l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity FROM lineitem WHERE l_quantity >= 40
              |  UNION ALL
              |  SELECT 'lo' AS bucket, l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity FROM lineitem WHERE l_quantity <= 10)
              |ORDER BY bucket, $liOrderSql""".stripMargin)),

    // R2: re-labeled column-block stack (added/removed shape).
    QueryDef("r2_stack_relabel",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val added = o.filter($"o_orderstatus" === "O")
          .select($"o_orderdate".cast(DateType).as("effective_date"),
            $"o_orderkey".as("entity"), lit("Added").as("action"))
        val removed = o.filter($"o_orderstatus" === "F")
          .select($"o_orderdate".cast(DateType).as("effective_date"),
            $"o_orderkey".as("entity"), lit("Removed").as("action"))
        added.unionByName(removed).orderBy($"effective_date", $"entity", $"action")
      },
      Some("""SELECT CAST(o_orderdate AS DATE) AS effective_date, o_orderkey AS entity, 'Added' AS action FROM orders WHERE o_orderstatus = 'O'
             |UNION ALL
             |SELECT CAST(o_orderdate AS DATE) AS effective_date, o_orderkey AS entity, 'Removed' AS action FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY effective_date, entity, action""".stripMargin)),

    // R3: pivot long→wide with explicit values (single-pass plan).
    QueryDef("r3_pivot",
      (s, dir) => {
        import s.implicits._
        CoreOps.pivotWide(t(s, dir, "lineitem"), "l_linestatus", "l_returnflag",
            Seq("A", "N", "R"), sum($"l_quantity"))
          .orderBy($"l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |       SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS "A",
             |       SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS "N",
             |       SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS "R"
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // R4: unpivot wide→long (melt), on top of the R3 pivot.
    QueryDef("r4_unpivot",
      (s, dir) => {
        import s.implicits._
        val wide = CoreOps.pivotWide(t(s, dir, "lineitem"), "l_linestatus",
          "l_returnflag", Seq("A", "N", "R"), sum($"l_quantity"))
        CoreOps.unpivotLong(wide, Seq("l_linestatus"), Seq("A", "N", "R"),
            "l_returnflag", "sum_qty")
          .orderBy($"l_linestatus", $"l_returnflag")
      },
      Some("""WITH wide AS (
             |  SELECT l_linestatus,
             |         SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS a,
             |         SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS n,
             |         SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS r
             |  FROM lineitem GROUP BY l_linestatus)
             |SELECT l_linestatus, l_returnflag, sum_qty FROM (
             |  SELECT l_linestatus, 'A' AS l_returnflag, a AS sum_qty FROM wide
             |  UNION ALL SELECT l_linestatus, 'N', n FROM wide
             |  UNION ALL SELECT l_linestatus, 'R', r FROM wide)
             |ORDER BY l_linestatus, l_returnflag""".stripMargin)),

    // R5: explode list column.
    QueryDef("r5_explode",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .select(explode(split($"p_name", " ")).as("word"))
          .groupBy($"word").agg(count(lit(1)).as("n"))
          .orderBy($"word")
      },
      Some("SELECT word, COUNT(*) AS n FROM (SELECT UNNEST(string_split(p_name, ' ')) AS word FROM part) GROUP BY word ORDER BY word")),

    // R6: set intersection on key membership.
    QueryDef("r6_intersect",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        o.filter($"o_orderstatus" === "F").select($"o_custkey")
          .intersect(o.filter($"o_orderstatus" === "O").select($"o_custkey"))
          .orderBy($"o_custkey")
      },
      Some("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' ORDER BY o_custkey")),

    // R6b: set difference on key membership.
    QueryDef("r6_except",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        o.filter($"o_orderstatus" === "F").select($"o_custkey")
          .except(o.filter($"o_orderstatus" === "O").select($"o_custkey"))
          .orderBy($"o_custkey")
      },
      Some("SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' ORDER BY o_custkey"))
  )
}
