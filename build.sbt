ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "glamiraendtoenddatapipelinespark"
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
// The driver parses Bench's stdout JSON line; sbt's default LoggedOutput
// prefixes forked output with "[info] " which breaks that parse — pass
// the child's stdout through verbatim instead.
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
  // 8g portable default (ADVICE r12): the r12 24g bump sized the heap
  // to the query count and still didn't hold on the driver host. The
  // round-13 fix is structural instead — SharedFrames releases each
  // session-shared frame after its last planned consumer, so the full
  // 300-query bench's storage working set stays one-family-sized and
  // fits 8g. SPARK_DRIVER_MEM overrides for bigger local experiments.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JIT code cache sized for a 400+-distinct-query session (round 16,
  // VERDICT r15 #1): each query compiles ~10 whole-stage-codegen
  // classes per pass and Spark's 100-entry codegen cache evicts across
  // a full registry run, so a bench/verify sweep loads thousands of
  // generated classes. The JDK default reserve (240m, segmented) was
  // measured 153m-used at sf0.001 already; once a segment fills,
  // HotSpot stops compiling NEW generated classes — everything loaded
  // after the fill point runs interpreted (~10-15× CPU) while earlier
  // queries keep their compiled code, which is exactly the r15
  // driver-bench signature (a 13.6×/5.7×/5.4×/4.7× CPU-ratio tail
  // confined to one alphabetical band of the sorted run, on identical
  // work at idle load). A long-lived production executor serving many
  // distinct queries needs the same sizing.
  // 768m (round 17): the r16 512m reserve closed the saturation
  // channel (peak 180m with the 100-entry codegen cache churning
  // classes); round 17 retains ALL generated classes for the session
  // (spark.sql.codegen.cache.maxEntries=4096 in Bench) so nothing is
  // ever re-Janino'd — full retention compiles more total code, and
  // the default UseCodeCacheFlushing stays on as the backstop.
  "-XX:ReservedCodeCacheSize=768m",
  // Pin the JIT compiler thread count (round 17, VERDICT r16 #1): the
  // residual driver-bench band (10-23x task CPU in the first ~130
  // queries, near-zero per-query jit_ms, decaying over minutes) is
  // the signature of a backlogged compile queue — generated classes
  // running interpreted while C1/C2 catch up. CICompilerCount derives
  // from availableProcessors at JVM start, so a host that exposes
  // fewer CPUs to this fork (cgroup quota, concurrent driver work)
  // silently gets a fraction of the compile bandwidth and a
  // minutes-long interpreted window. Pinning makes compile bandwidth
  // part of the benchmark contract instead of an env accident;
  // Bench's run JSON emits available_processors to adjudicate.
  "-XX:CICompilerCount=12",
)
