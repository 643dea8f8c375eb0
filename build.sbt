ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "puregraphdbspark"
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
// Forked-run output normally goes through sbt's logger, which prefixes
// every line with "[info] " — that prefix is why the driver's
// JSON-line scrape of the Bench output recorded parsed:null in rounds
// 1-4 (no line in the tail ever STARTS with '{'). StdoutOutput pipes
// the child's stdout through untouched.
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
  // 8g starved the full ~117-query sf0.1 bench: unified memory fills
  // with persisted edge/shingle/graph frames by mid-run and the late
  // queries hit GC/eviction stalls (measured 5-9x their isolated time;
  // e.g. graph_lpa_exact 67 s in-bench vs 7 s isolated). The box has
  // 128 GiB; 32g keeps the whole working set + 32 executor threads
  // comfortable at sf0.1 while staying far below the host limit.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Pre-size the heap: with the default 1/64-phys -Xms the first
  // minutes of a bench run interleave heap-growth GCs with the
  // 32-thread allocation burst (measured ~15% of task time in GC on
  // the concurrent warm-cache chains at sf0.1); -Xms=-Xmx removes the
  // growth cycles. ParallelGC was tried and REVERTED: throughput
  // collector full-GC pauses under the same burst were far worse
  // (ktruss 13 s → 42 s).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
