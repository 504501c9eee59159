ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkaelasticsearchinjectorspark"
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
// Forked run output must pass through UNPREFIXED: the round driver parses
// Bench's one-line JSON from stdout, and sbt's default logger decorates
// every forked line with "[info] ", which breaks json parsing (rounds 1-2
// recorded parsed:null for exactly this reason).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] shuffles JSON-heavy frames; 8g thrashes GC and makes bench
  // numbers noisy — the box has 128g
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // pre-size the heap: a fresh JVM growing from the default -Xms pays
  // GC-adaptation tax exactly on shuffle-heavy queries (measured on the
  // 100x replica: dedup_minhash_lsh steady state 101.7 s default vs
  // 26.8 s pre-sized, back-to-back same host window) — the long-lived
  // probe JVM had expanded long ago, so clean-JVM rechecks read 2-4x
  // slow on shuffle-heavy operators and mis-adjudicated throttle
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
