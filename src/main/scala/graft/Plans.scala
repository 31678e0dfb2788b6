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

  /** The trimmed audit block for one formatted-explain string. An executed
    * AQE plan prints BOTH "== Final Plan ==" and "== Initial Plan ==" trees
    * (with disjoint node ids) — only the final tree and ITS detail blocks
    * are kept, or every scan/join line would appear twice. A plan with
    * scalar/IN subqueries appends "===== Subqueries =====" after the main
    * detail blocks, each subquery a full tree+details section with its own
    * node-id space — those are re-walked one by one (round-6 advisory:
    * the single-pass walk silently dropped them, losing their
    * PushedFilters/ReadSchema from the audit). */
  private[graft] def trim(formatted: String): String = {
    val marker = "===== Subqueries ====="
    val idx = formatted.indexOf(marker)
    if (idx < 0) return trimOne(formatted)
    val lines = formatted.substring(idx + marker.length).linesIterator.toSeq
    val starts = lines.zipWithIndex
      .filter(_._1.trim.startsWith("Subquery:")).map(_._2)
    val subBlocks = starts.indices.map { i =>
      val s = starts(i)
      val e = if (i + 1 < starts.length) starts(i + 1) else lines.length
      s"${lines(s).trim}\n${trimOne(lines.slice(s + 1, e).mkString("\n"))}"
    }
    (trimOne(formatted.substring(0, idx)) +: subBlocks).mkString("\n")
  }

  private def trimOne(formatted: String): String = {
    val lines = formatted.linesIterator.toSeq
    val (treeSec, details) = lines.span(l => !l.startsWith("(")) // tree, then (n) blocks
    val initialAt = treeSec.indexWhere(_.contains("== Initial Plan =="))
    val tree = if (initialAt >= 0) treeSec.take(initialAt) else treeSec
    val nodeId = """\((\d+)\)""".r
    val finalIds = tree.flatMap(l => nodeId.findAllMatchIn(l).map(_.group(1))).toSet
    val keptTree = tree.filter { l =>
      val t = l.dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':' || c == '*')
      keepTree.pattern.matcher(t.trim).lookingAt()
    }
    // walk the "(n) Op" detail blocks, keeping lines only for final-plan ids
    val header = """^\((\d+)\) (\S+)(.*)""".r
    val span = """.* \[codegen id : (\d+)\]""".r
    var inFinal = false
    var curOp = ""
    val keptDetails = Seq.newBuilder[String]
    val spanOps = Seq.newBuilder[(Int, String)]
    details.foreach {
      case h @ header(id, op, rest) =>
        inFinal = finalIds.contains(id)
        curOp = op
        if (inFinal) rest match {
          case span(k) => spanOps += ((k.toInt, op))
          case _ =>
        }
        val _ = h
      case l if inFinal && keepDetail.findFirstIn(l).isDefined =>
        keptDetails += l
      case _ =>
    }
    val spans = spanOps.result().groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (k, ops) => s"$k:[${ops.map(_._2).mkString(",")}]" }
    val spanLine =
      if (spans.isEmpty) Nil else Seq(s"codegen spans ${spans.mkString(" ")}")
    val out = keptTree ++ keptDetails.result() ++ spanLine
    if (out.isEmpty) Placeholder
    else out.mkString("\n")
  }

  private val Placeholder =
    "(no data-moving operators - local/driver-assembled result)"

  /** HotSpot refuses to JIT methods over 8000 bytecodes
    * (DontCompileHugeMethods, default ON) — a fused whole-stage unit
    * crossing it runs INTERPRETED at ~15x (BASELINE round-15 addendum 5,
    * convicted with receipts on a 48x10M brute pass). Spark's own
    * fallback (spark.sql.codegen.hugeMethodLimit) only trips at 65535,
    * so nothing in the engine warns inside the 8000..65535 dead zone.
    * Flag any generated method within ~20% of the cliff. */
  private[graft] val HotspotHugeMethodBytecodes = 8000
  private[graft] val CliffWarnFraction = 0.8

  /** One audit line per whole-stage codegen unit: max generated-method
    * bytecode size, flagged when it approaches the JIT cliff. Pure
    * formatter — PlansTrimSpec pins the flag boundary. */
  private[graft] def codegenSizeLines(maxMethodSizes: Seq[Int]): Seq[String] = {
    val warnAt = (HotspotHugeMethodBytecodes * CliffWarnFraction).toInt
    maxMethodSizes.zipWithIndex.map { case (sz, i) =>
      val flag =
        if (sz >= HotspotHugeMethodBytecodes)
          " ** OVER JIT CLIFF (runs interpreted) **"
        else if (sz >= warnAt)
          s" ** within 20% of the $HotspotHugeMethodBytecodes-bytecode JIT cliff **"
        else ""
      s"codegen unit ${i + 1}: max method $sz bytecodes$flag"
    }
  }

  /** Collect every plan tree reachable from `p`, including the ones
    * `debug.codegenStringSeq`'s own walk cannot see: InMemoryRelation
    * cached plans (a persisted subtree's codegen units run during cache
    * build — round-18 lesson: x89's over-cliff unit lived inside one
    * and the audit printed NO size lines, silently), adaptive executed
    * plans and materialized query stages (none of which are `children`
    * of their wrapper nodes). */
  private def collectRoots(p: org.apache.spark.sql.execution.SparkPlan,
      acc: scala.collection.mutable.LinkedHashSet[
        org.apache.spark.sql.execution.SparkPlan]): Unit = {
    if (!acc.add(p)) return
    p.foreach {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        collectRoots(s.relation.cachedPlan, acc)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectRoots(a.executedPlan, acc)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectRoots(q.plan, acc)
      case _ =>
    }
  }

  /** Compile each whole-stage unit of an EXECUTED plan and report max
    * generated-method bytecode sizes (debug.codegenStringSeq re-runs the
    * Janino compile with stats). Walks into cached/adaptive subtrees via
    * [[collectRoots]]; units are deduped on generated source so a stage
    * reachable twice is reported once. Codegen failures degrade to a
    * note, not a crashed audit — and an EMPTY result prints a note too
    * (a silent no-lines audit is how the r17 x89 cliff unit hid). */
  private def codegenSizes(plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    try {
      val roots = scala.collection.mutable.LinkedHashSet[
        org.apache.spark.sql.execution.SparkPlan]()
      collectRoots(plan, roots)
      val stats = roots.toSeq.flatMap { r =>
        try org.apache.spark.sql.execution.debug.codegenStringSeq(r)
        catch { case _: Throwable =>
          Seq.empty[(String, String,
            org.apache.spark.sql.catalyst.expressions.codegen.ByteCodeStats)] }
      }
      val sizes = stats.map(s => (s._2, s._3.maxMethodCodeSize))
        .distinctBy(_._1).map(_._2)
        .filter(_ >= 0) // ByteCodeStats.UNAVAILABLE is negative
      if (sizes.isEmpty) Seq("(no codegen units with compile stats)")
      else codegenSizeLines(sizes)
    } catch {
      case e: Throwable => Seq(s"(codegen size audit failed: ${e.getMessage})")
    }

  /** Deterministic listener drain (round-10; replaces a quiet-period
    * poll that a LOADED box could defeat — a listener still sleeping in
    * its dispatch queue kept the buffer "stable" long enough for the
    * poll to conclude the bus was empty, silently dropping an inner-job
    * plan from the audit). The listener bus delivers events FIFO within
    * its queue, so a SENTINEL action run after the audited query is
    * delivered after every one of its inner-job events: once the
    * sentinel's plan (tagged by a recognizable column alias) appears in
    * the buffer, everything before it has been processed. Sentinel rows
    * are then scrubbed from the buffer. THROWS after 30 s rather than
    * returning a silently-truncated audit. */
  private[graft] def drainBus[T](spark: SparkSession,
      buf: scala.collection.mutable.ArrayBuffer[T],
      explainOf: T => String): Unit = {
    import org.apache.spark.sql.functions.lit
    val tag = "__drain_sentinel"
    spark.range(1).select(lit(1).as(tag)).collect()
    val deadline = System.nanoTime() + 30000000000L
    var seen = false
    while (!seen && System.nanoTime() < deadline) {
      seen = buf.synchronized(buf.exists(e => explainOf(e).contains(tag)))
      if (!seen) Thread.sleep(20)
    }
    if (!seen) throw new IllegalStateException(
      "listener bus did not deliver the drain sentinel within 30 s — " +
        "refusing to emit a possibly-truncated plan audit")
    buf.synchronized {
      val keep = buf.filterNot(e => explainOf(e).contains(tag))
      buf.clear(); buf ++= keep
    }
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
      // ASCII only: the forked JVM's stdout charset mangles multibyte chars
      println("# PLANS - physical-plan audit (generated)")
      println()
      println("Auto-trimmed `explain(\"formatted\")` for EVERY contract query:")
      println("data-moving/stateful operators with codegen ids, scan pushdown")
      println("(PushedFilters/ReadSchema), join strategies, and per-unit")
      println("generated-method bytecode sizes (flagged within 20% of HotSpot's")
      println("8000-bytecode DontCompileHugeMethods cliff - a fused unit over it")
      println("runs INTERPRETED at ~15x; BASELINE round-15 addendum 5). Regenerate")
      println("with `sbt \"runMain graft.Plans\" > PLANS.md` after any plan-shape change.")
    }
    // Gate-style queries (x45/x59/x64 pattern) collect-and-recreate: the
    // returned frame is a LocalTableScan and the REAL plans — index
    // build/append/search, incremental batch passes — run as inner jobs
    // during query construction. A QueryExecutionListener captures every
    // inner execution so those trees are audited too (r8 judge #2: the 3
    // most expensive bench queries were invisible to this audit).
    val innerBuf = scala.collection.mutable.ArrayBuffer[(String, String,
      org.apache.spark.sql.execution.QueryExecution)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        innerBuf.synchronized {
          innerBuf += ((funcName, qe.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
            qe))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    names.foreach { n =>
      println(s"\n## $n\n")
      println("```")
      try {
        innerBuf.synchronized(innerBuf.clear())
        val df = SparkEntry.queries(n)(spark, dir)
        // execute the plan first: AQE only finalizes (join strategy picks,
        // codegen ids) at runtime — the FINAL plan is the one to audit
        df.queryExecution.executedPlan.execute().foreachPartition(_ => ())
        drainBus(spark, innerBuf, (e: (String, String,
          org.apache.spark.sql.execution.QueryExecution)) => e._2)
        val main = trim(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        if (main != Placeholder) {
          println(main)
          codegenSizes(df.queryExecution.executedPlan).foreach(println)
        } else {
          // the work happened in inner jobs — print their distinct trimmed
          // trees (placeholder-only inner jobs, e.g. local collects, add
          // nothing and are skipped)
          val seen = scala.collection.mutable.LinkedHashMap[String,
            (String, org.apache.spark.sql.execution.QueryExecution)]()
          innerBuf.synchronized(innerBuf.toList).foreach { case (fn, ex, qe) =>
            val tr = trim(ex)
            if (tr != Placeholder && !seen.contains(tr)) seen(tr) = ((fn, qe))
          }
          if (seen.isEmpty) println(Placeholder)
          else println(s"(gate-style query: driver-assembled result; " +
            s"the ${seen.size} distinct inner-job plans below are the real work)")
          val cap = 14
          seen.toSeq.zipWithIndex.foreach { case ((tr, (fn, qe)), i) =>
            if (i < cap) {
              println(s"\n--- inner job ${i + 1} ($fn) ---\n$tr")
              codegenSizes(qe.executedPlan).foreach(println)
            }
          }
          if (seen.size > cap)
            println(s"\n(${seen.size - cap} more distinct inner plans elided)")
        }
        spark.catalog.clearCache()
      } catch {
        case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}")
      }
      println("```")
    }
    spark.stop()
  }
}
