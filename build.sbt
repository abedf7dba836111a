ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "net7etlbusspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Second JDBC dialect for the sink spec matrix: the DuckDB JDBC driver
// is already present in the image's pre-warmed artifact cache (it is
// the same engine the correctness oracle runs on). Picked up as an
// unmanaged TEST jar by filename glob — nothing is resolved, and the
// matrix spec self-cancels if the jar is absent.
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  (cache ** "duckdb_jdbc-*.jar").classpath
}
run / fork := true
// The correctness/bench driver parses the forked main's FINAL stdout
// line as JSON out of a fixed-size tail. sbt's default LoggedOutput
// wraps every forked-output line in "[info] " and appends a
// "[success] Total time" line, which defeated that parse in rounds
// 1-13 (BENCH_r*.json "parsed: null"). Forward the forked JVM's
// streams verbatim and drop the success banner; exit codes are
// unaffected.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command loop, not by a task — silence
// the unused-key lint (the smoke test proves the banner is gone)
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
scalacOptions += "-deprecation"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
