ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "polarsnumbaspark"
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
// Forked-run stdout passes straight through, unprefixed — the bench's
// one-line JSON must be machine-parseable, and sbt's default logger
// wraps child output in "[info] " lines.
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
  // Single-JVM local[32] = driver AND all executors in one heap: 8g
  // starved the 100-query bench suite late in the run (GC thrash read
  // as 29 s min-of-2 for a 2 s scan). The machine has 128 GiB; size
  // the default to it.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// The bench driver keeps only the last 2000 chars of stdout; sbt's
// "[success] Total time ..." trailer would eat 73 of them right after
// the bench's one-line JSON, so suppress it.
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — exclude
// it from the unused-key lint.
Global / excludeLintKeys += showSuccess
