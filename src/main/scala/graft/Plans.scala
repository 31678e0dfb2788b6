package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan auditor. Prints a markdown section per contract query with
  * the load-bearing lines of `explain("formatted")` — operator tree entries
  * that move data or state (exchanges, sorts, joins, aggregates, windows,
  * generators, stateful maps) with their codegen ids, plus every scan's
  * PushedFilters/ReadSchema and every join's type — so scan pruning, join
  * strategy, shuffle count, and codegen spans are auditable per round
  * without wading through full plans.
  *
  * Regenerate the whole audit (PLANS.md) with:
  *   sbt "runMain graft.Plans" > PLANS.md   (all queries, sorted)
  * or pass query names for a subset to stdout.
  */
object Plans {
  private val keepTree =
    ("Exchange|Sort|.*Join|.*Aggregate|Window|Generate|Expand|Limit|" +
      "FlatMapGroupsWithState|MapPartitions|MapElements|Union|Sample|" +
      "CollectMetrics|Subquery").r
  private val keepDetail =
    "^(PushedFilters|ReadSchema|Join type):".r

  /** The trimmed audit block for one formatted-explain string. */
  private[graft] def trim(formatted: String): String = {
    val lines = formatted.linesIterator.toSeq
    val (tree, details) = lines.span(l => !l.startsWith("(")) // tree, then (n) blocks
    val keptTree = tree.filter { l =>
      val t = l.dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':' || c == '*')
      keepTree.pattern.matcher(t.trim).lookingAt()
    }
    val keptDetails = details.filter(l => keepDetail.findFirstIn(l).isDefined)
    (keptTree ++ keptDetails).mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    if (args.isEmpty) {
      println("# PLANS — physical-plan audit (generated)")
      println()
      println("Auto-trimmed `explain(\"formatted\")` for EVERY contract query:")
      println("data-moving/stateful operators with codegen ids, scan pushdown")
      println("(PushedFilters/ReadSchema), and join strategies. Regenerate with")
      println("`sbt \"runMain graft.Plans\" > PLANS.md` after any plan-shape change.")
    }
    names.foreach { n =>
      println(s"\n## $n\n")
      println("```")
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        println(trim(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))))
      } catch {
        case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}")
      }
      println("```")
    }
    spark.stop()
  }
}
