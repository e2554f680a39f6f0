ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "logshipspark"
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
  // Default sized for this 125 GiB box: the round driver runs Bench/Verify
  // without SPARK_DRIVER_MEM, and an 8g heap GC-binds 32-thread runs (the
  // round-2 artifact under-reported throughput ~1.6x because of it).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // batch-throughput GC: the parse stage allocates heavily (maps/strings);
  // ParallelGC beats G1 for short-lived garbage at local[32]
  "-XX:+UseParallelGC",
  // Preallocate the heap (-Xms = -Xmx): this VM's host serves fresh pages
  // SLOWLY (measured: young-GC copies into a newly-GROWN heap at
  // ~100-250 MB/s — single pauses up to 18 s, ~95 s total STW in one
  // bench run). A fixed-size heap keeps region boundaries stable so the
  // page-fault cost lands once, during the bench warmup trials, instead
  // of inside measured young collections as the heap expands.
  // -XX:+AlwaysPreTouch would remove even the warmup faults but costs
  // ~3 min of page-zeroing per JVM launch on this host (measured) — set
  // SPARK_GRAFT_PRETOUCH=1 to add it for GC investigations.
  // Plain javaOptions level because `runMain` — what the round driver
  // invokes — does NOT delegate to `run / javaOptions`; Test strips the
  // preallocation below (test JVMs don't need a 32 g commit per launch).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++ (if (sys.env.contains("SPARK_GRAFT_PRETOUCH")) Seq("-XX:+AlwaysPreTouch")
      else Seq.empty)
Test / javaOptions ~= (_.filterNot(o =>
  o.startsWith("-Xms") || o == "-XX:+AlwaysPreTouch"))
// Standalone (local-cluster) Workers — which run inside the forked run JVM
// during the scaling benches — resolve executor scratch dirs from the
// PROCESS env var SPARK_LOCAL_DIRS, not from session conf
// (spark.local.dir is "overridden by the cluster manager"). Without this,
// executor shuffle scratch lands on /tmp: the sandbox's throttled virtio
// disk (a measured 27 s disk-bound shuffle at 8c). Plain level on purpose:
// the round driver invokes bare `sbt "runMain graft.Bench"` with no env.
envVars += ("SPARK_LOCAL_DIRS" ->
  sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
// The standalone launcher needs the scala suffix to locate the jars dir
// when SPARK_HOME points at a binary dist (executor fork fails without it).
envVars += ("SPARK_SCALA_VERSION" ->
  sys.env.getOrElse("SPARK_SCALA_VERSION", "2.13"))
