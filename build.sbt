ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nlrailtrafficetlpipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Keep main sources free of dead imports/privates (round-8 hygiene):
// warnings only, so an offending line is visible without breaking CI.
Compile / scalacOptions ++= Seq("-Wunused:imports", "-Wunused:privates")
Test / fork := true
run / fork := true
// Bench/Verify print machine-read JSON lines; route forked-run output
// straight to stdout so sbt's logger doesn't prefix them with "[info] "
// (which breaks the driver's json parse of the bench line).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Default heap sized to the measurement box (guide §5): local[32]
  // runs 32 concurrent tasks in ONE JVM, so 8g gave each task ~150 MB
  // of execution memory and the heavy gates (q288's wedge hash builds,
  // the curation joins) measured 1.5-2x slower INSIDE a 535-gate bench
  // session than standalone — block-manager history plus per-task
  // execution memory starved them into spill. 32g on a 128 GiB box is
  // a quarter of RAM for the one measurement JVM; SPARK_DRIVER_MEM
  // still overrides for smaller machines.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Bench's spark.cleaner.periodicGC (1 min) calls System.gc() so the
  // ContextCleaner can reap persisted/checkpoint blocks; on a 32 g
  // heap a default explicit GC is a multi-second stop-the-world full
  // collection that lands on whatever gate is running (r11 mid-bench
  // showed scattered +0.5-1 s regressions on untouched gates after the
  // heap bump). Concurrent cycle keeps the reaping without the pause.
  "-XX:+ExplicitGCInvokesConcurrent",
)

// Pre-commit audit gate (round-11, verdict #2): the source-scanning
// suites catch CROSS-FILE violations (an inline rewrite bypassing a
// pinned operator, a gate-token drift between SparkEntry and the docs,
// an unannotated collect(), a forbidden broadcast in a guarded plan) —
// which feature-spec-only runs never execute. This alias is the
// minimum bar for ANY commit; full `sbt test` remains the round bar.
addCommandAlias("auditOnly", "testOnly " + Seq(
  "graft.queries.CollectAuditSpec",     // collect() annotation audit
  "graft.queries.CoverageDriftSpec",    // gate-token drift (README/SCALING)
  "graft.queries.PlanGuardSpec",        // pinned plan shapes (q141/q22/...)
  "graft.operators.DegreeOrientationSpec", // wedge-orientation source pin
  "graft.pipelines.CurationHotBucketSpec", // BucketedPairs source pin
  "graft.BenchCanarySpec",              // bench artifact contract
).mkString(" "))
