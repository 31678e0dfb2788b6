package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one `SparkEntry.queries` entry and print its full
  * result (`args: <name> [sfDir]`) — used to read off literal-oracle values
  * when staging gates like x36/x37, and for quick plan-shape checks
  * (`args: <name> <sfDir> explain`). */
object PrintQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    if (args.contains("dump")) {
      // exact-bytes staging (the forked JVM's stdout charset mangles
      // multibyte chars like the Slack payload's emoji)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/printquery_dump.txt"),
        df.collect().map(_.toSeq.mkString("\t")).mkString("\n"))
      println("[printquery] dumped to /tmp/printquery_dump.txt")
    }
    df.show(200, truncate = false)
    spark.stop()
  }
}
