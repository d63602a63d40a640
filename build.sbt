ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tfmsemisupspark"
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
// The bench/verify drivers tail-parse the LAST stdout line as JSON; sbt's
// "[success] Total time: …" epilogue would otherwise trail the summary line.
Global / showSuccess := false
// ... and sbt's logger prefixes every forked-process line with "[info] ",
// which still breaks the tail-parse. StdoutOutput passes the forked run's
// stdout through RAW (no logger, no prefix), so the summary JSON is the
// literal last stdout line.
run / outputStrategy := Some(StdoutOutput)
// lintUnused can't see command-level usage of showSuccess
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
  // 140 queries × several whole-stage-codegen stages each generate far
  // more JIT'd code than the JVM's 240 MB default code cache holds; once
  // it fills (late in a bench run) the sweeper evicts hot methods and
  // re-timed queries run 1.5-6× slower than their first samples (the r13
  // retime anomaly). Reserved ≠ committed: the space is charged lazily.
  "-XX:ReservedCodeCacheSize=1g",
)
