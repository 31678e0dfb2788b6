package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftExtensions, GraftFunctions}

/** The [[GraftExtensions]] injection route — the way a pure-SQL client or
  * a cluster config (`spark.sql.extensions=graft.functions.GraftExtensions`)
  * gets the native functions — must register `ewm_mean` at session build
  * with NO explicit [[GraftFunctions.register]] call. EwmSpec pins the
  * function's values; this suite pins the session-wiring path itself.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private val xs = Seq(1.0, 2.0, -0.5, 3.0, 0.0, 1.5, -2.0, 4.0, 0.5, 1.0)
  // pandas Series.ewm(halflife=60, adjust=True).mean() (EwmSpec golden)
  private val golden60 = Seq(1.0, 1.502888081132, 0.827531285778, 1.380095893831,
    1.097662767307, 1.16667043798, 0.698460731496, 1.128031210124,
    1.054982222879, 1.049193796912)

  private def approx(a: Double, b: Double): Boolean =
    math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  /** Build a FRESH session (shared SparkContext, new sessionState) so the
    * extension hook actually runs — getOrCreate returns the suite-shared
    * default session (ignoring new extensions) unless both the active and
    * default handles are cleared first. The prior session is restored in
    * the finally so other suites see an unchanged world. */
  private def withFreshSession(build: SparkSession.Builder => SparkSession.Builder)
      (body: SparkSession => Unit): Unit = {
    // ensure a context exists (and capture the session to restore)
    val prior = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val fresh = build(SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")).getOrCreate()
      try body(fresh)
      finally {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  private def checkEwm(s: SparkSession): Unit = {
    import s.implicits._
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("key", "t", "x")
    // DataFrame route: the Column wrapper under ordinary window syntax
    val w = Window.partitionBy($"key").orderBy($"t")
    val got = df.withColumn("e", GraftFunctions.ewm_mean($"x", 60.0).over(w))
      .orderBy($"t").select($"e").as[Double].collect()
    got.zip(golden60).foreach { case (g, e) => assert(approx(g, e), s"$g vs $e") }
    // pure-SQL route: the whole point of session-level injection
    df.createOrReplaceTempView("ext_ewm_in")
    val sqlGot = s.sql(
      """SELECT ewm_mean(x, 60.0) OVER (PARTITION BY key ORDER BY t) AS e
        |FROM ext_ewm_in ORDER BY t""".stripMargin)
      .as[Double].collect()
    sqlGot.zip(golden60).foreach { case (g, e) => assert(approx(g, e), s"$g vs $e") }
  }

  test("withExtensions(new GraftExtensions) registers ewm_mean at build") {
    withFreshSession(_.withExtensions(new GraftExtensions))(checkEwm)
  }

  test("config route: class loads reflectively and injects at session build") {
    // `spark.sql.extensions` is a STATIC conf — Spark reads it when the
    // SparkContext is created, so it cannot be exercised against this
    // JVM's shared context. What the config route requires of OUR class is
    // (a) zero-arg reflective construction by name (Spark's loadExtensions
    // contract) and (b) that the constructed instance injects the
    // functions — both checked here; the build-time injection itself is
    // the withExtensions test above.
    val cls = Class.forName("graft.functions.GraftExtensions")
    val inst = cls.getConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    withFreshSession(_.withExtensions(inst))(checkEwm)
  }
}
