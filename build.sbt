ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "opentickspark"
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
// Driver-parse contract (round-10 verdict item 2): the per-round driver
// keeps a 2000-char stdout tail of `sbt runMain graft.Bench` and tries
// to parse the LAST line as JSON. Two sbt cosmetics broke that in
// r9/r10: the logger's "[info] " prefix on run output, and the trailing
// "[success] Total time" line. StdoutOutput passes the forked JVM's
// stdout through raw (no prefix), and showSuccess drops the trailer —
// so Bench's compact summary line is the literal last stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not the task graph —
// exclude it from the unused-key lint that would otherwise warn per run
Global / excludeLintKeys += showSuccess
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
  // 24g default (machine has 128 GiB): the 10x/30x scale smoke persists
  // multi-GB shingle/posting tables, and at 8g MEMORY_AND_DISK spill +
  // GC made late-suite heavy-query timings swing ~40% run-to-run —
  // enough to destabilize the growth-exponent gate.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
