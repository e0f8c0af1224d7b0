ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ibdendtoenddatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// CapSeamSpec toggles the JVM-global `graft.maxCandDf` property that the
// registered x62/x63 queries read at plan-construction time; suites in
// the forked test JVM must run sequentially (sbt's default, pinned here)
// or the lossless-oracle suites sharing that property would go flaky.
Test / testForkedParallel := false
run / fork := true
// pass the forked program's stdout straight through instead of routing it
// via sbt's logger: the driver parses graft.Bench's single JSON line, and
// the logger's "[info] " prefix broke that parse (BENCH_r03 parsed:null)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// …and keep sbt's own "[success] Total time: …" epilogue off stdout: the
// driver's 2000-char tail window must end with the JSON line itself
// (every char after it crowds out the head of the line)
ThisBuild / showSuccess := false
// showSuccess is read by sbt's command engine, not a task — exclude it
// from the unused-key lint
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
  // static conf — must be set at JVM level; keeps saveAsTable (bucketing
  // specs) out of the repo working tree
  "-Dspark.sql.warehouse.dir=/tmp/graft-warehouse",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
