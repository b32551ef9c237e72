ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rentalsdatapipelinespark"
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
// Forked run output goes straight to this process's stdout/stderr instead of
// sbt's logger — keeps the one-line Bench JSON free of the "[info] " prefix
// so the invoking harness can parse it.
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
  // 8g forced heavy old-gen GC late in the 86-query bench (40s spikes on
  // the alphabetically-last queries); the box has 128 GiB — size the
  // local[32] driver+executor JVM like a real worker
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// test JVMs get their OWN durable-table warehouse: DROP TABLE of a
// file-backed table is shared-catalog semantics (dropping deletes the
// files for every process on the same root — the Iceberg contract), so
// interleaved `sbt test` + bench runs must not share gate-table names
// on one root
Test / javaOptions += "-Dgraft.tables.root=target/graft-tables-test"
