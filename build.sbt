ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "end_to_end_azure_data_engineeringspark"
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
// Raw pass-through for the forked mains' stdout: Bench's machine-read JSON
// line must not carry sbt's "[info] " logger prefix (the driver parses the
// captured tail of the run log — a prefixed line isn't valid JSON).
run / outputStrategy := Some(StdoutOutput)
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
  // local mode = driver-only JVM. 16g fits the full catalog's caches at
  // sf0.1 with room to spare — and measurably BEATS a big heap: with
  // -Xmx64g on this host the full-catalog bench degraded 10-17×
  // (356-605s vs 36s), stalling for minutes at a time on young
  // GCs/safepoints (0.7s avg young GC, jcmd attach timeouts, executors
  // parked while `main` crawled) as G1 repeatedly grew eden into
  // never-touched pages. Fixed Xms=Xmx keeps the committed heap stable.
  // NO -XX:+AlwaysPreTouch: on this host its startup pre-touch of 16 GiB
  // serializes GC threads on the contended process mmap_lock — measured
  // 3m32s wall / 70m system CPU for a bare `java -version` vs 0.5s
  // without — which dwarfs the mid-query fault cost it was meant to
  // avoid. Opt back in via SPARK_GRAFT_JVM_EXTRA="-XX:+AlwaysPreTouch".
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 63 queries × several whole-stage-codegen units × janino classes blow
  // through the JVM's default 240 MB code cache; once it fills, the JIT
  // stops compiling and everything from that point runs interpreted —
  // which is a mid-bench cliff, not a graceful slowdown.
  "-XX:ReservedCodeCacheSize=1g",
) ++
  // Diagnostics hook: extra JVM flags for the forked run/test JVMs without
  // editing the build (e.g. SPARK_GRAFT_JVM_EXTRA="-Xlog:gc*,safepoint:file=/tmp/jvm.log").
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))

// glibc malloc tuning for the forked JVMs. Profiled on the full-catalog
// bench: executor threads spent whole 5s windows ~3:1 system:user, kernel
// stacks parked in mmap/munmap — glibc serves each large malloc/free
// (compression + serialization buffers) with a fresh mmap once the dynamic
// threshold is crossed, and the process-wide mmap_lock those calls hold
// also serializes EVERY page fault, so 32 task threads + a growing heap
// collapse to single-digit effective parallelism in bursts. Raising the
// mmap threshold keeps big buffers in reusable arenas (one-time RSS cost,
// bounded by the matching trim threshold); 8 arenas bound fragmentation.
// Callers can still override any knob via their own environment.
ThisBuild / envVars ++= Seq(
  "MALLOC_MMAP_THRESHOLD_" -> "134217728",
  "MALLOC_TRIM_THRESHOLD_" -> "134217728",
  "MALLOC_ARENA_MAX" -> "8",
).filterNot { case (k, _) => sys.env.contains(k) }.toMap
