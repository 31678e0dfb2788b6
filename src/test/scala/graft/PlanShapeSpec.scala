package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.TextFunctions

/** Physical-plan-shape tripwires for the round-9 single-evaluation
  * formulations: the measured wins (BASELINE round-9 addenda 4/5/7) exist
  * BECAUSE these operators evaluate their expensive subtree once — a
  * refactor that silently reintroduces an aggregate + join-back (second
  * Generate / extra Window) would keep every value-oracle green while
  * doubling the corpus work, so the shape itself is pinned here. */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def counts(plan: SparkPlan): (Int, Int, Int) = {
    def walk(p: SparkPlan): (Int, Int, Int) = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec =>
        val inner = walk(s.plan)
        if (s.plan.isInstanceOf[ShuffleExchangeLike])
          (inner._1, inner._2, inner._3) // exchange counted inside s.plan
        else inner
      case other =>
        val self = other.getClass.getSimpleName match {
          case "GenerateExec" => (1, 0, 0)
          case "WindowExec" | "WindowGroupLimitExec" => (0, 1, 0)
          case _ if other.isInstanceOf[ShuffleExchangeLike] => (0, 0, 1)
          case _ => (0, 0, 0)
        }
        other.children.map(walk).foldLeft(self) {
          case ((g, w, s0), (g2, w2, s2)) => (g + g2, w + w2, s0 + s2)
        }
    }
    walk(plan)
  }

  private def shapeOf(df: DataFrame): (Int, Int, Int) = {
    df.collect() // finalize AQE
    counts(df.queryExecution.executedPlan)
  }

  private val docs = Seq(
    (1L, "a b c d e f a b c"), (2L, "a b c x y z"), (3L, "p q r s t u"),
    (4L, "x y z p q r"), (5L, "m n"))
    .toDF("doc_id", "text")

  test("lineDedup: one chunker evaluation, one keeper window, two shuffles") {
    val (g, w, s) = shapeOf(Dedup.lineDedup(docs, "doc_id", "text"))
    assert(g == 1, s"chunker explode evaluated $g times (join-back crept back?)")
    assert(w == 1, s"expected one keeper window, got $w")
    assert(s == 2, s"expected line_h + doc exchanges only, got $s")
  }

  test("exactSubstringDedup: one token explode, two windows, three shuffles") {
    val (g, w, s) = shapeOf(
      Dedup.exactSubstringDedup(docs, "doc_id", "text", n = 3))
    // generates: posexplode (tokens) + covered-position sequence explode
    assert(g == 2, s"expected 2 generates (one token explode), got $g")
    assert(w == 2, s"expected doc-leads + gram-keeper windows, got $w")
    assert(s == 3, s"expected doc/h/removed exchanges only, got $s")
  }

  test("charEntropy: char explode stays below the partial aggregate") {
    val (g, w, s) = shapeOf(
      TextFunctions.charEntropy(docs, "doc_id", "text"))
    assert(g == 1 && w == 1, s"shape drifted: generates=$g windows=$w")
    assert(s == 2, s"both exchanges must carry (doc,char,count) rows, got $s")
  }

  test("budgetSample: no window partitioned by domain alone over the corpus") {
    val out = graft.sampling.Sampling.budgetSample(docs, "doc_id", "doc_id",
      lit(2L), totalBudget = 6L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the corpus-side running sum must carry the md5-prefix shard in its
    // window partition spec (the arg-25 3.4x skew receipt)
    assert(plan.contains("__shard"),
      "sharded running sum missing — per-domain window serializes mega-domains")
  }
}
