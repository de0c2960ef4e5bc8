ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lambdasamplespark"
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
// Forked run output goes straight to this process's stdout/stderr
// instead of through sbt's logger: the logger prefixes every stdout
// line with "[info] ", and the bench driver json-parses raw stdout
// lines — a prefixed JSON line never parses (rounds 1-8 all graded
// from the tail text because of this).
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
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the 162-query bench session at local[32] holds ~10
  // persisted shared intermediates plus codegen caches; at 8g the old
  // heap ceiling showed up as GC drag on the slowest timed queries
  // (q96 7.7 s benched vs 0.9 s in an isolated session). The box has
  // 128 GiB; override with SPARK_DRIVER_MEM for constrained runs.
  // 28g default: the catalog's shared persisted memos (edges, signatures,
  // baskets, norms) grew with the 180+-query catalog; at 16g the bench's
  // warm pass showed the same GC-drag inflation the round-3 8g ceiling
  // did (slowest rows ~2x their isolated cost). Overridable per run.
  // 48g (round 4): 191 queries' shared caches (the q167 shingle table
  // is the big new row) pushed 28g back into the GC-drag regime — tail
  // queries benched 10-20x their isolated cost (q184 74 s benched vs
  // 4.3 s isolated) and build_sec doubled. At 48g build halves and the
  // pathological tail disappears. Round 5 went to 64g on a run-to-run
  // tail-swing hypothesis; round 6 MEASURED it (Bench now prints the
  // per-memo-entry byte report): the whole memo set is ~180 MB at
  // sf0.1 and the storage layer holds ~0.1 GB — the swing was
  // cross-run machine contention, not cache growth. A clean 48g run
  // benches 148.2 s for 220 queries (vs 150.3 s at 64g), so 48g is
  // the default again; SCALE.md §heap has the numbers.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
