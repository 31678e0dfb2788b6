package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev utility: write `.explain("formatted")` for a set of contract queries
  * to files — used to stage the per-round `plans/rNN/<query>_{before,after}.txt`
  * deliverables in ONE Spark session instead of one JVM per query.
  *
  * args: <outDir> <suffix> <sfDir> <name>[,<name>...]
  * Writes <outDir>/<name>_<suffix>.txt per query. Queries whose gate logic
  * runs eagerly at construction (lifecycle replays) still work — the explain
  * is taken on the returned DataFrame after construction completes.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = ExplainMode.fromString("formatted")
    // Gate-style queries (the Plans.scala pattern) collect-and-recreate:
    // the returned frame is a LocalTableScan / ExistingRDD and the REAL
    // plans run as inner jobs during construction. Capture them so the
    // before/after files carry the actual work, not the wrapper.
    val innerBuf = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        innerBuf.synchronized { innerBuf += qe.explainString(mode); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val trivial = "(Scan ExistingRDD|LocalTableScan)".r
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explaindump] unknown query: $name")
        case Some(fn) =>
          try {
            innerBuf.synchronized(innerBuf.clear())
            val df = fn(spark, sfDir)
            val main = df.queryExecution.explainString(mode)
            val isTrivial = main.linesIterator
              .find(_.startsWith("== Physical Plan =="))
              .isDefined && trivial.findFirstIn(main).isDefined &&
              main.linesIterator.count(l => l.contains("(") && l.contains(")")) < 12
            val txt = if (!isTrivial) main else {
              Plans.drainBus(spark, innerBuf, identity[String])
              val distinct = scala.collection.mutable.LinkedHashSet[String]()
              innerBuf.synchronized(innerBuf.toList).foreach { ex =>
                // keep only inner plans with data-moving work (skip 1-row
                // driver collects) — dedup on the trimmed shape
                val tr = Plans.trim(ex)
                if (!tr.startsWith("(no data-moving")) { distinct += ex; () }
              }
              val cap = 10
              val kept = distinct.toSeq.take(cap)
              val note = s"(gate-style query: the returned frame is a " +
                s"driver-assembled result; the ${distinct.size} distinct " +
                s"inner-job plans executed at construction are the real " +
                s"work — first ${kept.size} below)\n\n== Returned frame ==\n" +
                main
              (note +: kept.zipWithIndex.map { case (p, i) =>
                s"\n\n===== inner job ${i + 1} =====\n$p"
              }).mkString
            }
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
            println(s"[explaindump] wrote ${name}_$suffix.txt (${txt.length} chars)")
            spark.catalog.clearCache()
          } catch {
            case e: Throwable =>
              System.err.println(s"[explaindump] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
