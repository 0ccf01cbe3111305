ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jobxspark"
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
// Pass the forked run's stdout through raw instead of re-tagging each
// line as "[info] ": Bench/Verify print one machine-parsed JSON line,
// and the logger prefix is what broke the driver's parse of it
// (BENCH_r04/r05 "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// One shared local SparkSession across suites — run them sequentially.
Test / parallelExecution := false
// r16 (VERDICT r15 item 1): the driver box killed a late-suite process
// fork mid-`sbt test` (jspawnhelper "signal: 15" during StreamsSpec) —
// one JVM carrying every suite's accumulated footprint (518+ tests
// incl. ~40 streaming fixtures) left no fork/memory headroom by the
// time the streaming suites ran. Split the suites into four forked
// JVMs (streaming+sources / operators / unit-level / core), run ONE at
// a time, each with a bounded 4g heap: the streaming suites start in a
// fresh process and each JVM's RSS stays well inside the box.
Test / javaOptions :=
  javaOptions.value.filterNot(_.startsWith("-Xmx")) :+ "-Xmx4g"
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  def groupOf(name: String): String =
    if (name.startsWith("graft.streaming.") ||
        name.startsWith("graft.sources.")) "streaming"
    else if (name.startsWith("graft.operators.")) "operators"
    else if (name.startsWith("graft.functions.") ||
             name.startsWith("graft.mr.") ||
             name.startsWith("graft.multimodal.") ||
             name.startsWith("graft.plans.")) "units"
    else "core"
  (Test / definedTests).value.groupBy(t => groupOf(t.name)).toSeq
    .sortBy(_._1).map { case (g, ts) =>
      Tests.Group(g, ts, Tests.SubProcess(
        ForkOptions().withRunJVMOptions(opts)))
    }
}
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 1)
