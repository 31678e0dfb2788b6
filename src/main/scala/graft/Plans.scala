package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan inspector: prints `explain("formatted")` for selected
  * contract queries so scan pushdown (PushedFilters/ReadSchema), broadcast
  * joins, and WholeStageCodegen spans can be audited per round.
  * Usage: runMain graft.Plans [queryName ...] (default: a representative set)
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("s1_scan_pruned", "j2_broadcast_dim", "w1_pct_change",
        "a2_weighted_sum", "j8_range_join", "x6_ann_brute_force")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
