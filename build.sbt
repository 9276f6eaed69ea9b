ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// macro annotations (the @graft.api.lib cross-file helper-def registry)
ThisBuild / scalacOptions += "-Ymacro-annotations"

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

// Macro module: compiled BEFORE the root project so its blackbox macros
// (the comprehension front-end) are usable from root main sources.
// scala-reflect comes from the same unmanaged Spark jar directory —
// no managed dependencies added.
lazy val macros = (project in file("macros"))
  .settings(
    name := "emmaspark-macros",
    // Spark jars ship with the image at /opt/spark/jars (zero-egress):
    unmanagedBase := file("/opt/spark/jars"),
  )

lazy val root = (project in file("."))
  .dependsOn(macros)
  .aggregate(macros)
  .settings(
    name := "emmaspark",
    // Spark jars ship with the image at /opt/spark/jars (zero-egress):
    unmanagedBase := file("/opt/spark/jars"),
    // Test-only deps resolve from the pre-warmed coursier cache; anything
    // else is intentionally not resolvable (COURSIER_MODE=offline).
    libraryDependencies ++= Seq(
      "org.scalatest" %% "scalatest" % "3.2.19" % Test,
      "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
    ),
    Test / fork := true,
    run / fork := true,
    // Bench/Verify print machine-read JSON lines on stdout; the default
    // LoggedOutput strategy prefixes every forked line with "[info] ",
    // which breaks the driver's line-wise JSON parse (BENCH parsed=null
    // in rounds 1-9). StdoutOutput passes the forked JVM's stdout through
    // verbatim.
    run / outputStrategy := Some(OutputStrategy.StdoutOutput),
    javaOptions ++= jdk17AddOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
    ) ++
      // test-only: forward the bench default-budget override into the
      // forked run JVM (tools/bench_timeout_check.sh part B shrinks the
      // built-in budget to exercise the env-free self-degrade path)
      sys.props.get("graft.bench.defaultBudgetS")
        .map(v => s"-Dgraft.bench.defaultBudgetS=$v").toSeq,
  )
