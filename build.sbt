ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bio2belspark"
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
// The suite is ~620 specs over dozens of independent Spark suites, each
// mostly idle on a 32-core box when run sequentially in one JVM (the
// r14 driver's test phase overran its budget). Run suites in N forked
// groups, each its own JVM with its own SharedSpark local[4] session —
// process isolation (no shared catalog/temp views/conf), 8 groups x
// local[4] = the 32 cores. Suites hash to groups by name (stable).
val testGroups = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "8").toInt
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val env = (Test / envVars).value
  tests.groupBy(t => math.abs(t.name.hashCode) % testGroups).toSeq
    .sortBy(_._1)
    .map { case (i, group) =>
      Tests.Group(s"g$i", group, Tests.SubProcess(
        ForkOptions().withRunJVMOptions(opts).withEnvVars(env)))
    }
}
// allow the groups to actually run concurrently (default forked-test
// tag limit is 1)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroups),
  Tags.limitAll(math.max(testGroups, 4)),
)
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
  // The full query suite JIT-compiles thousands of generated classes
  // (one whole-stage-codegen class per stage per query); the JVM default
  // 240m code cache fills near the end of the run, the JIT shuts off,
  // and later CPU-bound work runs interpreted ~10x slower. 512m (sized
  // in an earlier round) saturated again once the suite grew past ~280
  // queries: r14 measured the alphabetical-tail streaming family at
  // 42.9 s run alone vs 127.3 s at the end of a full bench — the same
  // JIT-off signature, gone at 1g.
  "-XX:ReservedCodeCacheSize=1g",
)
