ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mongo2mysqlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Live MongoDB support (graft.porter.MongoSource) is config-only: the
// source talks to `format("mongodb")` and reflects into
// com.mongodb.client.MongoClients, so a real deployment adds the public
// connector to the classpath — no code change. Opt in with
//   sbt -DgraftMongo=true compile
// which adds the connector dependency (brings mongodb-driver-sync
// transitively). The flag defaults to OFF because this zero-egress
// sandbox cannot resolve it (COURSIER_MODE=offline): CI without the jar
// stays green, a networked deployment flips the flag and compiles the
// live path. The dispatch seam itself is unit-tested either way.
libraryDependencies ++= (
  if (sys.props.get("graftMongo").exists(_.equalsIgnoreCase("true")))
    Seq("org.mongodb.spark" %% "mongo-spark-connector" % "10.5.0")
  else Seq.empty
)
Test / fork := true
run / fork := true
// Forked run/runMain output goes RAW to this process's stdout/stderr
// instead of through the sbt logger: the driver's bench parser reads
// stdout's LAST line as JSON, and the logger's "[info] " prefix (plus
// the "[success] Total time" epilogue, suppressed below) broke that
// parse in r9/r10 ("parsed": null). Raw pass-through also keeps
// stdout/stderr separation, so Spark's stderr logging cannot interleave
// into the JSON lines.
outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is consumed by the command engine, not a task — silence
// the unused-key lint
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
