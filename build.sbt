ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gomailiodiskusagehandlerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Inner-loop hygiene: specs tagged graft.SlowTest (the multi-restart
// streaming simulations — minutes of micro-batches, zero operator logic)
// are EXCLUDED from a plain `sbt test` so the default suite stays fast.
// The round-close gate runs EVERYTHING: GRAFT_FULL_SUITE=1 sbt test.
Test / testOptions ++= (
  if (sys.env.contains("GRAFT_FULL_SUITE")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.SlowTest")))
// The three suites share one SparkSession (getOrCreate) in the forked JVM;
// running them concurrently races the block-manager cache (persist/unpersist
// of dedup shingle indexes from different suites) — observed as rare
// spurious set-mismatch failures. Suites are independent, sessions aren't.
Test / parallelExecution := false
run / fork := true
// The bench driver keeps only a stdout tail and parses the last JSON line;
// sbt's default LoggedOutput prefixes forked stdout with "[info] ", which
// breaks that parse. StdoutOutput passes the child's stdout through raw.
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
  // 16g default (restored r16): the r15 GC storms at 16g were the BOXED
  // damped-edge collects (hundreds of MB of tuples per graph call), not
  // cache residency — with those primitive-array'd and the artifact
  // cache budgeted, back-to-back full benches measured 16g ≥ 32g
  // (0.924 vs 1.110 s/q, GC 13.4 vs 18.4 s; per-row median ratio 1.18 =
  // ambient noise, artifact residency 67.8 MB). A tight-but-sufficient
  // heap is the honest default; SPARK_DRIVER_MEM overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
