ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "amazonlookoutforequipmentpythonsdkspark"
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
// The per-round driver parses the LAST ~2000 chars of the `runMain
// graft.Bench` stdout for a bare {"metric":...} JSON line. With sbt's
// default LoggedOutput the forked JVM's stdout is re-emitted through the
// sbt logger as "[info] {...}" (and stderr as "[error] ..."), which has
// made the metric line unparseable in EVERY round so far (BENCH_r01..r12
// all have parsed:null). StdoutOutput lets the forked process inherit
// sbt's own stdout/stderr, so Bench's JSON lines reach the driver
// verbatim, with no log-prefix wrapping.
run / outputStrategy := Some(StdoutOutput)
// ... and suppress the "[success] Total time: ..." banner sbt prints AFTER
// the forked JVM exits, so the compact JSON summary is the LAST line of
// stdout (a strictly last-line parser succeeds too). Success/failure of
// compile/test stays fully visible via the exit code and [error] lines.
Global / showSuccess := false
// (the key IS consumed — by the command engine when printing result
// banners — but sbt's unused-key lint can't see that)
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
  // Codegen class cache sized to the workload: the default (100 entries)
  // thrashes across a 447-query suite (~4.5k generated stages/pass), so
  // every bench pass recompiled every whole-stage/predicate/ordering
  // class — measured 29% of a 25-query tail sample's wall. Size it to
  // hold one full pass (~160 MB metaspace at ~20 KB/class); any
  // long-running session with many distinct plan shapes wants the same.
  "-Dspark.sql.codegen.cache.maxEntries=8192",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // experiment seam: SparkConf picks up -Dspark.* system properties, so
  // ad-hoc config A/Bs don't need code edits (e.g.
  // SPARK_GRAFT_EXTRA_JAVA_OPTS="-Dspark.sql.adaptive.enabled=false")
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
    .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
