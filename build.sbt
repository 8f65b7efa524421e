ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kitkatspark"
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
// The bench/verify driver parses the LAST stdout line of
// `sbt "runMain graft.Bench"` as JSON. Four rounds running that parse
// failed (`parsed: null` in BENCH_r11..r14) because (a) sbt's logger
// prefixed the metric line with "[info] " and (b) sbt appended
// "[success] Total time: ..." after it. StdoutOutput passes the forked
// JVM's stdout through verbatim (no [info] prefix, no log-line buffering),
// and showSuccess drops the trailing [success] line — the metric line the
// program prints last IS the last line the driver sees.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not another setting —
// exclude it from the unused-key lint so every sbt invocation stays quiet
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // every query generates fresh whole-stage-codegen classes; a full-suite
  // run fills the default 240 MB code cache mid-suite, the JIT disables
  // itself, and CPU-bound kernels (the rankSelect bucket aggregates) run
  // interpreted 3-4x slower — the r13/r14 committed-vs-targeted gap
  "-XX:ReservedCodeCacheSize=1g",
)
