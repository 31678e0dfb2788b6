package graft
import org.apache.spark.sql.SparkSession

/** Benchmark surface the driver runs per round.
  *
  * Prints exactly ONE JSON line on stdout:
  *   {"metric":"total","value":T,"unit":"sec","qn":N,"qdrop":D,
  *    "cal":[st_pre,st_post,mt,io_pre,io_post,mem],
  *    "cput":C,"cputn":CN,"cpudrop":CD,"cpuq":{...},"queries":{...},"sf":"..."}
  * where "cput" is total best-pass process-cpu seconds over all queries
  * and "cputn" = cput / mean(cal[0], cal[1]) — cpu-s per cal-spin-s,
  * the frequency-drift-corrected cross-run reference
  * and "cpuq" carries best-pass cpu (1dp) for every query with wall
  * ≥ 0.5 s — the round-6 adjudication currency, persisted in the record
  * itself because the full stderr pass map falls outside the driver's
  * 2000-char tail (round-6 verdict finding #3).
  *
  * Record-robustness protocol (BASELINE.md "bench protocol"):
  *  - The driver captures only the LAST 2000 chars of stdout and parses the
  *    JSON from that tail. Round 3's line (85 queries at 3dp, ~2.2 KB) got
  *    its opening brace truncated and the round recorded parsed:null. The
  *    queries map is therefore emitted slowest-first at 2dp under a hard
  *    byte budget; entries beyond the budget are dropped ("qdrop" counts
  *    them — all sub-second by construction) and the full map goes to
  *    stderr instead. build.sbt sets showSuccess := false so nothing
  *    prints after this line.
  *  - Timed passes are PASS-MAJOR (pass 1 over every query, then pass 2),
  *    so the two samples of one query sit minutes apart and a transient
  *    contention window on the driver box can't inflate both. Driver
  *    records r02 (x3=45 s vs 3.5 s local) and r03 (j3=11 s vs 0.3 s
  *    local) were query-adjacent stall artifacts of exactly that kind.
  *  - After the passes, queries whose min is still above OUTLIER_SEC get up
  *    to 2 extra re-runs inside a bounded extra-time budget.
  *  - "cal" embeds a deterministic CPU calibration (single-thread spin
  *    before and after the run, and one all-threads spin): on an idle box
  *    st ≈ mt ≈ the BASELINE.md reference; under container contention they
  *    stretch proportionally, so the record carries its own evidence for
  *    adjudicating inflated totals.
  *  - cal[3]/cal[4] (round 6) are 256 MiB sequential-read I/O probes before
  *    and after the run: the CPU spins are blind to I/O and memory-bandwidth
  *    contention — the r5 driver record inflated 1.6× broad at IDLE cpu cal
  *    and could not be adjudicated. Warm-cache idle ≈ 0.05-0.15 s; a
  *    stretched value convicts the box's storage/memory path, not the plans.
  *  - cal[5] (round 6) is a multi-threaded STREAM-style memory-bandwidth
  *    probe (8×64 MiB sequential long-sums): register spins and buffered
  *    file reads both stay idle under memory-bus contention, which is the
  *    one resource that inflates Spark scan/shuffle/sort broadly while
  *    cal[0..4] read clean. Idle ≈ 0.1-0.3 s.
  *  - stderr additionally carries EVERY per-query pass time ("[bench]
  *    passes {...}") and a 64 MiB write+fsync probe, so a per-query
  *    contention window is visible in the full record.
  */
object Bench {
  /** Deterministic single-thread spin, ~0.2-0.4 s on one idle core. */
  private def spinOnce(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 150000000) {
      x = x * 6364136223846793005L + 1442695040888963407L
      x ^= x >>> 33
      i += 1
    }
    if (x == 42L) System.err.println("") // keep the loop observable
    (System.nanoTime() - t0) / 1e9
  }

  /** Wall time of `threads` concurrent spins — stretches under CPU
    * oversubscription even when a single spare core keeps st honest. */
  private def spinAll(threads: Int): Double = {
    val t0 = System.nanoTime()
    val ts = (1 to threads).map(_ => new Thread(() => { spinOnce(); () }))
    ts.foreach(_.start()); ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Timed sequential read of a fixed byte budget (default 256 MiB) from the
    * sf dir's parquet files via raw buffered streams — no Spark, no parsing.
    * The CPU spins are blind to I/O and memory-bandwidth contention (the r5
    * driver record showed broad scan/shuffle-heavy inflation at IDLE cpu
    * cal); this probe stretches under exactly those: on a warm page cache it
    * measures memory bandwidth (~0.05-0.15 s idle), on a cold or contended
    * box it measures storage, so the record carries per-resource evidence. */
  private def ioReadProbe(sfDir: String, budgetBytes: Long = 256L << 20): Double = try {
    val files = Option(new java.io.File(sfDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    if (files.isEmpty) return -1.0
    val buf = new Array[Byte](1 << 20)
    val t0 = System.nanoTime()
    var remaining = budgetBytes
    var fi = 0
    var sink = 0L // fold bytes so the read can't be dead-code-eliminated
    while (remaining > 0) {
      val in = new java.io.FileInputStream(files(fi % files.length))
      try {
        var n = in.read(buf)
        while (n > 0 && remaining > 0) {
          sink += buf(0) + buf(n - 1); remaining -= n
          n = if (remaining > 0) in.read(buf) else -1
        }
      } finally in.close()
      fi += 1
    }
    if (sink == Long.MinValue) System.err.println("")
    (System.nanoTime() - t0) / 1e9
  } catch {
    // a probe must never cost the record: the post-run probes fire after
    // every query already ran, and an uncaught IOException here would kill
    // the JVM before the one stdout line prints (round-6 advisory)
    case _: Throwable => -1.0
  }

  /** STREAM-style memory-bandwidth probe: `threads` workers each sum a
    * private 64 MiB long array (sequential 8-byte strides, no reuse —
    * defeats cache, measures the memory bus). The CPU spins are pure
    * register arithmetic and the io probe's 1 MiB-buffered page-cache read
    * doesn't saturate the bus either — a co-tenant hammering memory
    * inflates Spark's scan/shuffle/sort tasks broadly while BOTH of those
    * stay idle (the r5/r6-run4 signature: broad 1.5× at idle cal). Idle
    * local[32]-class box ≈ 0.1-0.3 s; stretches under bus contention. */
  private def memBandwidthProbe(threads: Int): Double = try {
    val words = ((64L << 20) / 8).toInt
    // each worker allocates its own 64 MiB INSIDE the thread (not all up
    // front on the caller): an allocation failure kills one daemon worker
    // and the barrier timeout below degrades to the -1.0 sentinel instead
    // of an OOM on the driver after every query already ran (round-6
    // advisory). Timing starts only after all workers have faulted their
    // pages (the barrier), so the measured phase is still pure summing.
    val ready = new java.util.concurrent.CyclicBarrier(threads + 1)
    val done = new java.util.concurrent.CountDownLatch(threads)
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => {
        val a = new Array[Long](words)
        java.util.Arrays.fill(a, 0x5A5A5A5AL) // fault pages before timing
        ready.await()
        var s = 0L; var i = 0
        while (i < a.length) { s += a(i); i += 1 }
        sink.addAndGet(s)
        done.countDown()
      })
      t.setDaemon(true); t
    }
    ts.foreach(_.start())
    ready.await(30, java.util.concurrent.TimeUnit.SECONDS)
    val t0 = System.nanoTime()
    if (!done.await(60, java.util.concurrent.TimeUnit.SECONDS)) return -1.0
    if (sink.get() == Long.MinValue) System.err.println("")
    (System.nanoTime() - t0) / 1e9
  } catch { case _: Throwable => -1.0 }

  /** Timed 64 MiB write + fsync to java.io.tmpdir (where Spark's shuffle
    * spills land in local mode) — the write-side complement to ioReadProbe.
    * Emitted on stderr only; the stdout cal stays read-side. */
  private def ioWriteProbe(budgetBytes: Long = 64L << 20): Double = {
    val f = java.io.File.createTempFile("graft-bench-io", ".probe")
    try {
      val buf = new Array[Byte](1 << 20)
      java.util.Arrays.fill(buf, 0x5A.toByte)
      val t0 = System.nanoTime()
      val out = new java.io.FileOutputStream(f)
      try {
        var written = 0L
        while (written < budgetBytes) { out.write(buf); written += buf.length }
        out.getFD.sync()
      } finally out.close()
      (System.nanoTime() - t0) / 1e9
    } catch { case _: Throwable => -1.0 } finally { f.delete(); () }
  }

  /** Cumulative system-level stall accounting — unlike the spot probes,
    * these counters cover the WHOLE run window with no sampling gap:
    * /proc/pressure/{cpu,io,memory} PSI total stall micros, /proc/stat
    * steal+iowait jiffies, and cgroup cpu.stat throttled_usec. Deltas over
    * the run go to stderr; an inflated total with idle spot probes but a
    * large PSI-cpu/steal/throttle delta is environmental by the record
    * alone. Absent files (non-PSI kernel, cgroup v1) read as -1. */
  private def sysStallSnapshot(): Map[String, Long] = {
    def readFile(p: String): Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)))) catch { case _: Throwable => None }
    def psiTotal(p: String): Long = readFile(p).flatMap { s =>
      // "some avg10=... avg60=... avg300=... total=<micros>"
      s.linesIterator.find(_.startsWith("some"))
        .flatMap(_.split("total=").lift(1)).map(_.trim.toLong)
    }.getOrElse(-1L)
    val stat = readFile("/proc/stat").flatMap(_.linesIterator.find(_.startsWith("cpu ")))
    def statCol(i: Int): Long =
      stat.map(_.trim.split("\\s+")).filter(_.length > i).map(_(i).toLong).getOrElse(-1L)
    val throttled = readFile("/sys/fs/cgroup/cpu.stat").flatMap { s =>
      s.linesIterator.find(_.startsWith("throttled_usec"))
        .map(_.split("\\s+")(1).toLong)
    }.getOrElse(-1L)
    Map(
      "psi_cpu_us" -> psiTotal("/proc/pressure/cpu"),
      "psi_io_us" -> psiTotal("/proc/pressure/io"),
      "psi_mem_us" -> psiTotal("/proc/pressure/memory"),
      "steal_jiffies" -> statCol(8),
      "iowait_jiffies" -> statCol(5),
      "throttled_usec" -> throttled)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated subset for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach(_.diff(SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[bench] WARNING: unknown query in SPARK_GRAFT_ONLY: $n")))
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) => names(n) })

    val stall0 = sysStallSnapshot()
    val wall0 = System.nanoTime()
    val calStPre = spinOnce()
    val calIoPre = ioReadProbe(sfDir)
    // absorb JVM/codegen warmup so the first timed query isn't penalized
    spark.range(100000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .groupBy("l_returnflag").count().collect()
    // JIT the window/join/hash-aggregate machinery the dedup/ANN tail
    // leans on — first-compile costs otherwise land on whichever heavy
    // query happens to run first and dominate its measured time. Skipped
    // when a SPARK_GRAFT_ONLY subset contains no such query.
    if (selected.keys.exists(n => n.startsWith("x1") || n.startsWith("x2") ||
        n.startsWith("x3") || n.startsWith("x4") || n.startsWith("x5") ||
        n.startsWith("x6") || n.startsWith("x7"))) {
      try {
        val d = graft.queries.Tables.t(spark, sfDir, "documents")
          .limit(300).select("doc_id", "text")
        graft.dedup.Dedup.minhashNearDuplicates(d, "doc_id", "text",
          shingleSize = 3, bands = 4, rowsPerBand = 4, threshold = 0.5).count()
        // the simhash 64-conditional-sum aggregate + banded hamming path is
        // distinct codegen from the minhash pipeline — JIT it here so its
        // first-compile cost doesn't land inside the timed x3 run
        graft.dedup.Dedup.simhashNearDuplicates(d, "doc_id", "text",
          maxHamming = 3).count()
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] WARNING: dedup warmup failed (${e.getMessage}); " +
            "dedup-tail timings will include first-compile costs")
      }
      spark.catalog.clearCache()
    }

    // JVM-wide process CPU time: per-query (wall, cpu) pairs separate "the
    // query did more work" (cpu up with wall) from "the box delivered fewer
    // cycles per second" (cpu flat, wall up — external contention). The
    // endpoint probes can't see contention that starts after the run begins
    // and ends before it does; cpu-per-query is load-bearing for exactly
    // that window (the r5 + r6-run4 signature: broad wall inflation with
    // every endpoint probe idle).
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double) = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      val cdt = (osBean.getProcessCpuTime - c0) / 1e9
      // drop frames persisted inside query pipelines so cached blocks from
      // one query can't pressure the next one's memory (also keeps later
      // passes honest: nothing is served from an earlier pass's cache)
      spark.catalog.clearCache()
      (dt, cdt)
    }

    // min-of-N timed passes per query (default 2), PASS-MAJOR: all queries
    // once, then all again — see protocol note above. EVERY sample (not just
    // the min) is kept and emitted to stderr, so a contention window on the
    // driver box is visible per-query in the record: a query whose two
    // passes read 0.5/0.5 is genuinely that fast, one reading 0.5/4.0 sat in
    // a stall window — the r5 adjudication had no way to see the difference.
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES").map(_.toInt).getOrElse(2).max(1)
    val names = selected.keys.toSeq.sorted
    val samples = collection.mutable.Map[String, List[(Double, Double)]]().withDefaultValue(Nil)
    def sample(name: String): Double = {
      val dt = timeOne(selected(name))
      samples(name) = samples(name) :+ dt
      dt._1
    }
    def best(name: String): Double = samples(name).map(_._1).min
    for (p <- 1 to passes; name <- names) sample(name)
    // adaptive retries: a query still above OUTLIER_SEC after the passes is
    // either genuinely heavy or got stalled twice; buy up to 2 more samples
    // each inside a bounded extra-time budget (locally the whole tail sits
    // under ~3 s — see BASELINE.md — so this only fires under contention).
    val outlierSec = sys.env.get("SPARK_GRAFT_BENCH_OUTLIER").map(_.toDouble).getOrElse(4.0)
    var extraBudget = sys.env.get("SPARK_GRAFT_BENCH_EXTRA").map(_.toDouble).getOrElse(90.0)
    for (round <- 1 to 2; name <- names.sortBy(best)) {
      if (best(name) > outlierSec && extraBudget > 0) {
        extraBudget -= sample(name)
      }
    }
    val calStPost = spinOnce()
    val calMt = spinAll(cpus.toInt)
    val calIoPost = ioReadProbe(sfDir)
    val calMem = memBandwidthProbe(math.min(8, cpus.toInt))
    val calIoWrite = ioWriteProbe()
    spark.stop()

    val results = names.map(n => n -> best(n))
    // per-query cpu of the best (min-wall) pass — the durable cross-run
    // reference (BASELINE.md round-6 addendum). The full pass map on
    // stderr gets truncated out of the driver's 2000-char tail; this
    // digest rides INSIDE the one stdout record line so a future record
    // self-adjudicates wall inflation (cpu flat + wall up = the box).
    val cpuBest = names.map(n => n -> samples(n).minBy(_._1)._2)
    // full-precision per-query map to stderr for local records
    System.err.println(results.map { case (k, v) => s""""$k":${f(v, 3)}""" }
      .mkString("[bench] detail {", ",", "}"))
    // ALL samples per query (pass-major order + retries) as [wall, cpu]
    // pairs, so the record shows spread AND work-vs-wait — a per-query
    // contention window, and whether the query burned more CPU or just
    // waited, are both visible
    System.err.println(names.map(n =>
      s""""$n":[${samples(n).map { case (w, c) => s"[${f(w, 3)},${f(c, 3)}]" }.mkString(",")}]""")
      .mkString("[bench] passes {", ",", "}"))
    System.err.println(s"[bench] io write64m=${f(calIoWrite, 3)}s")
    val stall1 = sysStallSnapshot()
    val wallS = (System.nanoTime() - wall0) / 1e9
    System.err.println(stall0.keys.toSeq.sorted.map { k =>
      val d = if (stall0(k) < 0 || stall1(k) < 0) -1L else stall1(k) - stall0(k)
      s""""$k":$d"""
    }.mkString(s"""[bench] sysstall {"wall_s":${f(wallS, 1)},""", ",", "}"))
    // 1150 (was 1400) leaves room for the cpu digest: the whole line must
    // keep its opening brace inside the driver's 2000-char tail. The env
    // override is the JOINT queries+cpuq budget (pre-digest scripts set
    // 1400 and expect the line to stay tail-safe), so the digest's share
    // comes out of it rather than on top.
    val budget = sys.env.get("SPARK_GRAFT_BENCH_BYTES")
      .map(b => math.max(0, b.toInt - CpuDigestBudget)).getOrElse(1150)
    println(formatLine(results, cpuBest,
      Seq(calStPre, calStPost, calMt, calIoPre, calIoPost, calMem), sfDir, budget))
  }

  private def f(v: Double, dp: Int): String =
    s"%.${dp}f".formatLocal(java.util.Locale.ROOT, v)

  /** The ONE stdout line the driver parses from its 2000-char stdout tail.
    * Queries are emitted slowest-first at 2dp under `budget` bytes, and the
    * cut STOPS at the first entry that doesn't fit (not a filter): admitting
    * later shorter entries after skipping a long slow one would break the
    * slowest-first contract and hide a slow query from the record. Factored
    * out + spec-pinned (BenchLineSpec) because a silent overgrowth of this
    * line cost round 3 its bench record. */
  /** Byte budget for the cpuq digest inside the record line — shared with
    * main's SPARK_GRAFT_BENCH_BYTES arithmetic so the joint budget can't
    * silently desync from the digest's share. */
  private[graft] val CpuDigestBudget = 480

  private[graft] def formatLine(
      results: Seq[(String, Double)],
      cpu: Seq[(String, Double)],
      cal: Seq[Double],
      sfDir: String,
      budget: Int,
      cpuBudget: Int = CpuDigestBudget): String = {
    val total = results.map(_._2).sum
    val entries = results.sortBy(-_._2).map { case (k, v) => s""""$k":${f(v, 2)}""" }
    val sizes = entries.scanLeft(0)((acc, e) => acc + e.length + 1).tail
    val kept = entries.zip(sizes).takeWhile(_._2 <= budget).map(_._1)
    val dropped = entries.size - kept.size
    val calStr = cal.map(f(_, 3)).mkString("[", ",", "]")
    // cpu digest: "cput" = total best-pass cpu-seconds over ALL queries;
    // "cpuq" = best-pass cpu at 1dp for every query whose best wall is
    // ≥ 0.5 s, slowest-wall-first under its own byte budget with the same
    // stop-at-first-cut discipline; "cpudrop" counts the cut entries
    val wallOf = results.toMap
    val cpuTotal = cpu.map(_._2).sum
    val cpuEntries = cpu.filter { case (k, _) => wallOf.getOrElse(k, 0.0) >= 0.5 }
      .sortBy { case (k, _) => -wallOf(k) }
      .map { case (k, v) => s""""$k":${f(v, 1)}""" }
    val cpuSizes = cpuEntries.scanLeft(0)((acc, e) => acc + e.length + 1).tail
    val cpuKept = cpuEntries.zip(cpuSizes).takeWhile(_._2 <= cpuBudget).map(_._1)
    val cpuDrop = cpuEntries.size - cpuKept.size
    // "cputn" (round 11): cput normalized by the in-record single-thread
    // cal spin (mean of pre/post), units cpu-s per cal-s. The box's
    // sustained speed states inflate cpu-SECONDS (frequency drift), not
    // just wall — the cross-round cput reference drifted 252→312 within
    // one r10 session. The spin inflates by the same frequency factor,
    // so the quotient is the drift-self-correcting cross-run reference.
    val calSt = (cal.lift(0).getOrElse(0.0) + cal.lift(1).getOrElse(0.0)) / 2.0
    val cputn = if (calSt > 0.0) cpuTotal / calSt else -1.0
    s"""{"metric":"total","value":${f(total, 3)},"unit":"sec","qn":${results.size},"qdrop":$dropped,"cal":$calStr,"cput":${f(cpuTotal, 1)},"cputn":${f(cputn, 0)},"cpudrop":$cpuDrop,"cpuq":${cpuKept.mkString("{", ",", "}")},"queries":${kept.mkString("{", ",", "}")},"sf":"$sfDir"}"""
  }
}
