ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "adventureworkspysparkjobsspark"
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
// The driver parses Bench's single JSON stdout line; sbt's default logger
// prefixes forked output with "[info] " which breaks that parse (round-1
// BENCH_r01.json recorded parsed:null). StdoutOutput passes the forked
// process's stdout through verbatim.
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
  // 24g default: the bench runs 32 executor threads in one JVM and the
  // HOF-heavy operators (shingling, minhash folds) allocate hard; on the
  // previous 8g default GC inflated the measured sf0.1 bench total ~1.7×
  // (153 s → 87 s replica measurement). Override via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // GC log per forked JVM (%p = pid): when a bench run misreports — the
  // round-5 recording was 7× the idle-machine cost of the same binary —
  // this is the evidence distinguishing GC pathology from host contention.
  "-Xlog:gc:file=target/gc-%p.log",
)
