ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "traceframespark"
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
// Forked run output goes straight to this process's stdout/stderr — no sbt
// `[info]`/`[error]` log prefixes. The round driver parses the bench metric
// line from stdout; with the logger strategy it read `[info] {...}` and
// failed (BENCH_r01 "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The round driver parses the LAST stdout line as the bench metric. sbt's
// `[success] Total time: ...` trailer prints after the forked main exits,
// displacing the metric line (BENCH_r02/r03 "parsed": null). Suppress it.
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
  // 16g default: at local[32] the driver JVM is also all 32 executors; an
  // 8g heap showed GC-pause outliers (4-8x) on the round-1 driver bench.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.get("SPARK_GRAFT_GC_LOG")
  .map(f => s"-Xlog:gc*:file=$f:time,uptime").toSeq
