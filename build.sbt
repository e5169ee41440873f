ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dockfinancialdatapipelinesspark"
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
// Bench/Verify stdout must reach the driver's tail capture verbatim:
// no "[info] " line prefixes (StdoutOutput) and no "[success] Total
// time …" trailer after the final JSON line (showSuccess := false).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += run / outputStrategy
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
  // 8g GC-thrashed once the query count passed ~110 (late-run queries
  // measured 3-10x their standalone time from full-GC pressure; 48g
  // restores standalone-equal timings). The host has 125 GB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
) ++
  // GC diagnostics for bench-variance hunts: GRAFT_GC_LOG=/path enables
  // unified GC logging in the forked JVM (off by default — zero overhead)
  sys.env.get("GRAFT_GC_LOG").map(p => s"-Xlog:gc*:file=$p:time,uptime").toSeq ++
  // A/B aid for the graph loops' size-gated broadcasts: GRAFT_BCAST_MAX=0
  // forces every superstep onto the shuffled path (SparkSession picks the
  // spark.* system property up into the session conf). Off by default.
  sys.env.get("GRAFT_BCAST_MAX")
    .map(v => s"-Dspark.graft.graph.broadcastMaxRows=$v").toSeq
