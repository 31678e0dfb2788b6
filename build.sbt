ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ntdatapipelinesspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// forked runMain output goes straight to stdout, NOT through sbt's logger:
// the driver parses Bench's single JSON line from stdout, and the logger's
// "[info] " prefix breaks that parse
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// and nothing may print AFTER it: the driver captures only the last 2000
// chars of stdout, and sbt's "[success] Total time ..." epilogue eats tail
// budget the bench JSON line needs (round 3's record lost its opening brace
// to exactly this truncation and parsed as null)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32-thread local runs (driver bench sets SPARK_GRAFT_CPUS=32) need real
  // heap headroom for concurrent window sorts or GC starts dominating
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ (
  // OPT-IN (GRAFT_JIT_HUGE=1): HotSpot refuses to JIT methods over 8000
  // bytecodes by default (DontCompileHugeMethods) — a wide fused
  // whole-stage-codegen unit (e.g. a 64-col synthetic projection feeding
  // a BNLJ + cosine + sort pipeline) crosses that silently and runs
  // INTERPRETED forever: measured 509 s -> 25-53 s (~15x) on a 48×1M
  // brute-force pass. NOT default because the short-query contract bench
  // measures ~20% SLOWER with it (C2 churn on hundreds of huge generated
  // methods that each run once) — 231.7/cputn 1563 vs 192.9/1264 same
  // session. Enable for long scan-heavy jobs; the structural fix for the
  // known case is Ann.bruteForceTopKHeap. BASELINE round-15 addendum 5.
  if (sys.env.contains("GRAFT_JIT_HUGE"))
    Seq("-XX:-DontCompileHugeMethods", "-XX:ReservedCodeCacheSize=512m")
  else Seq()
)
