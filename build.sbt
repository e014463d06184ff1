ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datafusiondistspark"
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
// The driver parses graft.Bench's single JSON stdout line. With the default
// LoggedOutput strategy sbt prefixes every forked-stdout line with "[info] "
// and appends its own "[success] Total time" line, so the JSON is never a
// clean final line (BENCH_r{1..3}.json all show "parsed": null). Inherit the
// child's stdout/stderr unmodified and drop the success banner.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// local-cluster[N,cores,mem] (LocalClusterSpec): the in-process standalone
// Worker launches REAL executor JVMs and resolves the Spark distribution
// via SPARK_HOME (launcher AbstractCommandBuilder adds $SPARK_HOME/jars to
// the executor classpath). The graft classes ride in on
// spark.executor.extraClassPath = java.class.path (set by the suite).
// SPARK_SCALA_VERSION is normally exported by bin/load-spark-env.sh; the
// in-JVM Worker's launcher asks for it before it can locate $SPARK_HOME/jars.
Test / envVars ++= Map("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13")
run / envVars ++= Map("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13")
