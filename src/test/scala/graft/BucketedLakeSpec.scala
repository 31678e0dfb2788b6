package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import graft.lake.{BucketedLake, TableDef}
import org.apache.spark.sql.types._

/** Bucketed lakehouse: co-located PK operations must be EXCHANGE-FREE —
  * the spec asserts the physical plans, not just the results. */
class BucketedLakeSpec extends SparkSpec {
  import spark.implicits._

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  private lazy val lake = new BucketedLake(spark, "graft_test")

  private val prices = TableDef("b_prices",
    st("ticker" -> StringType, "date" -> StringType, "close" -> DoubleType),
    Nil, Seq("ticker"))
  private val betas = TableDef("b_betas",
    st("ticker" -> StringType, "beta" -> DoubleType),
    Nil, Seq("ticker"))

  /** Count shuffle exchanges, descending through AQE wrappers:
    * AdaptiveSparkPlanExec is a LeafExecNode, so a naive plan.collect never
    * sees the executed plan, and materialized stages hide their plans
    * inside QueryStageExec — both must be unwrapped explicitly or the
    * assertion is vacuous. */
  private def shuffles(plan: SparkPlan): Int = plan match {
    case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
    case s: QueryStageExec =>
      (if (s.plan.isInstanceOf[ShuffleExchangeLike]) 1 else 0) + shuffles(s.plan)
    case e: ShuffleExchangeLike => 1 + e.children.map(shuffles).sum
    case other => other.children.map(shuffles).sum
  }

  private def executedPlan(df: DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize the plan
    df.queryExecution.executedPlan
  }

  test("shuffle counter sees through AQE (sanity: a groupBy DOES shuffle)") {
    val df = spark.range(1000).toDF("id")
      .groupBy(($"id" % 7).as("k")).count()
    assert(shuffles(executedPlan(df)) > 0,
      "counter must detect the aggregate exchange under AQE")
  }

  test("bucketed write + compaction window runs without any exchange") {
    lake.drop(prices)
    val v1 = Seq(("A", "2024-01-02", 10.0), ("B", "2024-01-02", 20.0))
      .toDF("ticker", "date", "close")
    val v2 = Seq(("A", "2024-01-02", 11.0)) // newer version of A's row
      .toDF("ticker", "date", "close")
    lake.write(prices, v1, nBuckets = 4, version = 1L)
    lake.write(prices, v2, nBuckets = 4, version = 2L)

    val compacted = lake.compacted(prices)
    val rows = compacted.orderBy($"ticker", $"date")
      .as[(String, String, Double)].collect().toSeq
    assert(rows == Seq(("A", "2024-01-02", 11.0), ("B", "2024-01-02", 20.0)))
    assert(shuffles(executedPlan(compacted)) == 0,
      "PK window over a PK-bucketed table must not shuffle")
  }

  test("join of two tables co-bucketed on the key is exchange-free") {
    // self-sufficient: (re)write both tables — no dependence on test order
    lake.drop(prices)
    lake.write(prices, Seq(("A", "2024-01-02", 10.0), ("B", "2024-01-02", 20.0))
      .toDF("ticker", "date", "close"), nBuckets = 4, version = 1L)
    lake.write(prices, Seq(("A", "2024-01-02", 11.0))
      .toDF("ticker", "date", "close"), nBuckets = 4, version = 2L)
    lake.drop(betas)
    lake.write(betas, Seq(("A", 1.1), ("B", 0.9)).toDF("ticker", "beta"),
      nBuckets = 4, version = 1L)
    val joined = lake.table(prices).join(lake.table(betas), Seq("ticker"))
    val got = joined.select($"ticker", $"close", $"beta")
      .orderBy($"ticker", $"close")
      .as[(String, Double, Double)].collect().toSeq
    // both versions of A's row are present pre-compaction
    assert(got == Seq(("A", 10.0, 1.1), ("A", 11.0, 1.1), ("B", 20.0, 0.9)))
    val plan = executedPlan(joined)
    assert(shuffles(plan) == 0,
      s"co-bucketed join must not shuffle either side:\n$plan")
  }

  test("bucketed compaction equals the unbucketed optimize result") {
    val rnd = new scala.util.Random(11)
    val hist = (1 to 500).map { i =>
      (s"T${i % 50}", f"2024-01-${i % 28 + 1}%02d", rnd.nextDouble()) }
      .toDF("ticker", "date", "close")
    val t = TableDef("b_equiv",
      st("ticker" -> StringType, "date" -> StringType, "close" -> DoubleType),
      Nil, Seq("ticker", "date"))
    lake.drop(t)
    lake.write(t, hist, nBuckets = 4, version = 1L)
    lake.write(t, hist.limit(100).withColumn("close", $"close" + 1.0),
      nBuckets = 4, version = 2L)
    val got = lake.compacted(t)
    // oracle: plain dropDuplicates-style newest-version rule on the raw rows
    val all = spark.table(lake.qualified(t.name))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"ticker", $"date")
      .orderBy(col("__version").desc, $"close".desc)
    val expect = all.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).drop("rn", "__version")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }
}
