package graft

import org.apache.spark.sql.SparkSession
import graft.functions.GraftExtensions

/** Opinionated session factory encoding the engine's scale posture. The
  * driver owns the sessions it runs Verify/Bench with; this is the entry
  * point for library users and for cluster deployment.
  *
  * Conf rationale (tuned for the 1000-executor / 100 TB target, degrades
  * gracefully to local mode):
  *  - AQE on with skew-join splitting and partition coalescing: runtime
  *    stats beat any static shuffle.partitions guess at scale;
  *  - shuffle.partitions sized to cores locally (cluster: leave to AQE
  *    coalescing from a high initial value);
  *  - 128 MB file split targets: large enough to amortize task overhead on
  *    wide scans, small enough that a task's working set (incl. binary
  *    media columns) stays in memory;
  *  - UTC session timezone: oracle parity and cross-cluster determinism;
  *  - Graft extensions injected so `ewm_mean` works from any SQL client.
  */
object GraftSession {
  def builder(
      master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")

  def local(): SparkSession = {
    val s = builder().config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
