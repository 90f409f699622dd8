ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pysparkunloadtogcsspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // A/B hook (r15): extra whitespace-separated JVM flags / -Dspark.*
  // confs for forked runs, e.g.
  //   SPARK_GRAFT_EXTRA_JAVA_OPTS="-Dspark.sql.codegen.methodSplitThreshold=512"
  // Empty (a no-op) unless explicitly set — the bench protocol itself
  // never sets it; it exists so perf hypotheses are testable without
  // build edits.
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
    .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)

// Explicit root so the delta module below is NOT aggregated: the
// driver's `sbt compile` / `sbt test` / `runMain` contract touches only
// this project. (Bare settings above attach to root as usual.)
lazy val root = (project in file("."))

// ------------------------------------------------------------- delta
// Compile-gated real-Delta ChangeSource (VERDICT r12 #8): the drop-in
// implementation of graft.sources.ChangeSource against public Delta
// Lake APIs. No delta jar ships in this zero-egress sandbox, so by
// default the module's source set is EMPTY and `sbt delta/compile` is
// a clean no-op; the day a delta-spark jar lands in /opt/spark/jars
// (or a dir named by DELTA_JARS), the same command compiles the
// drop-in with no code or build changes. Deliberately not aggregated
// into root and carrying no tests here — its behavioral contract is
// pinned by the ChangeSource trait docs and the ParquetChangeLog
// emulation specs.
lazy val hasDeltaJar: Boolean = {
  val dirs = sys.env.get("DELTA_JARS").toSeq :+ "/opt/spark/jars"
  dirs.map(file).exists(d => d.exists &&
    Option(d.listFiles).exists(_.exists(_.getName.matches("delta-(spark|core).*\\.jar"))))
}
lazy val delta = (project in file("delta"))
  .dependsOn(root)
  .settings(
    name := "graft-delta",
    unmanagedBase := file(sys.env.getOrElse("DELTA_JARS", "/opt/spark/jars")),
    Compile / unmanagedSourceDirectories := {
      if (hasDeltaJar) Seq((Compile / scalaSource).value) else Seq.empty
    },
    // r15 (VERDICT r14 #6): the one-command e2e. Without a delta jar,
    // `sbt delta/test` is a clean no-op (empty test source set — same
    // gate as Compile); with one, `DELTA_JARS=<dir> sbt delta/test`
    // runs DeltaChangeSourceIntegrationSpec end-to-end (real commits,
    // CDF reads, idle-window guard) so a signature bit-rot in the
    // drop-in cannot hide behind the compile gate. scalatest resolves
    // from the same pre-warmed offline cache as root's test deps.
    Test / unmanagedSourceDirectories := {
      if (hasDeltaJar) Seq((Test / scalaSource).value) else Seq.empty
    },
    libraryDependencies += "org.scalatest" %% "scalatest" % "3.2.19" % Test,
    Test / fork := true,
    Test / javaOptions ++= jdk17AddOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-Xmx4g",
    ),
  )
