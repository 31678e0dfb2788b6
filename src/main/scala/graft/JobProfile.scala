package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Driver-job accounting for serving-path operations — the round-13
  * profiling lesson made reusable: when a store operation (index append,
  * incremental dedup batch, takedown) feels expensive, the cost is
  * usually its DRIVER JOB COUNT (each job ≈ one driver round-trip plus
  * AQE stage materializations), not executor arithmetic — and the fix is
  * usually ONE multiply-referenced plan being re-evaluated per
  * occurrence. Count jobs FIRST; believe theories second.
  *
  * Counts jobs/stages/tasks/executor-cpu between the body's start and a
  * sentinel-drained end, so asynchronous listener delivery cannot
  * truncate the receipt (the Plans.drainBus discipline). The sentinel
  * job runs in a dedicated job group and is excluded from the counts.
  * Serial bodies only — concurrent job groups would blend into one
  * count, which is exactly the ambiguity a receipt must not have.
  */
object JobProfile {

  final case class Stats(jobs: Int, stages: Int, tasks: Long,
      cpuSec: Double, spillMb: Long = 0L, gcSec: Double = 0.0) {
    override def toString: String =
      f"jobs=$jobs stages=$stages tasks=$tasks cpu=$cpuSec%.2fs " +
        f"spill=${spillMb}MB gc=$gcSec%.1fs"
  }

  private val SentinelGroup = "__jobprofile_sentinel"

  def profile[T](spark: SparkSession)(body: => T): (T, Stats) =
    profile(spark, verbose = false)(body)

  def profile[T](spark: SparkSession, verbose: Boolean)(body: => T)
      : (T, Stats) = {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    val cpuNs = new AtomicLong(0L)
    val spillBytes = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    @volatile var sentinelSeen = false
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val grp = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        if (grp.contains(SentinelGroup)) sentinelSeen = true
        else {
          jobs.incrementAndGet()
          if (verbose) {
            val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
            println(s"[job] ${j.jobId} $site " +
              s"(${j.stageInfos.map(_.numTasks).sum} tasks)")
          }
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
        Option(s.stageInfo.taskMetrics).foreach { m =>
          cpuNs.addAndGet(m.executorCpuTime)
          spillBytes.addAndGet(m.memoryBytesSpilled)
          gcMs.addAndGet(m.jvmGCTime)
        }
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(l)
    try {
      val r = body
      // drain: a sentinel job in its own group; the listener flags it
      // instead of counting it, proving every prior event was delivered
      sc.setJobGroup(SentinelGroup, "job-profile drain", false)
      try spark.range(1).count()
      finally sc.clearJobGroup()
      val deadline = System.nanoTime() + 30000000000L
      while (!sentinelSeen && System.nanoTime() < deadline) Thread.sleep(10)
      if (!sentinelSeen) throw new IllegalStateException(
        "listener bus did not deliver the profile sentinel within 30 s — " +
          "refusing to emit a possibly-truncated job-count receipt")
      (r, Stats(jobs.get(), stages.get(), tasks.get(), cpuNs.get() / 1e9,
        spillBytes.get() / (1024L * 1024L), gcMs.get() / 1e3))
    } finally sc.removeSparkListener(l)
  }
}
