ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kompactorspark"
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
// The bench/verify drivers tail-scrape stdout for a one-line JSON contract;
// sbt's "[success] Total time…" epilogue after the forked main's output was
// what the parser saw as the last line in rounds 1-2.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // used by the command engine, not a task
// …and the forked main's stdout must pass through VERBATIM: the default
// LoggedOutput strategy prefixes every line with "[info] ", which breaks a
// strict json-parse of the final line. StdoutOutput also keeps the forked
// process's stderr (Spark WARN chatter) on stderr instead of echoing it
// into stdout as "[error] " lines.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // ImageIO/Graphics2D (multimodal decode) must never probe for a display
  "-Djava.awt.headless=true",
  "-Dspark.sql.session.timeZone=UTC",
  // derby (managed-table catalog) scratch state stays out of the repo
  "-Dderby.system.home=/tmp/graft-derby",
  // local[32] shares ONE heap between driver and all 32 executor threads:
  // 8g starves execution memory to ~150 MB/task, which OOMs legitimate
  // 2.5 GB sketch-join hash builds at the 1000x octave (and forces
  // disk spill far too early everywhere else). The host has 128 GiB;
  // 32g is the working default, SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
