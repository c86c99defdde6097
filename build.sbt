ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kupospark"
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
// Wall-budget gate: `sbt test` must fit the external verify budget, and the
// r14 run (305 tests, 44 min) blew it. Tests tagged graft.HeavyTest are
// AMPLIFICATIONS of properties a default-run sibling already asserts (extra
// random seeds / stress iterations, never a unique assertion); they run only
// when explicitly opted in with GRAFT_HEAVY_TESTS=1.
Test / testOptions ++= (
  if (sys.env.contains("GRAFT_HEAVY_TESTS")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.HeavyTest")))
// The bench/verify contract lines must reach the caller as machine-parseable
// JSON on their own stdout lines; sbt's default LoggedOutput strategy
// prefixes every forked-run line with "[info] " (which is exactly what kept
// BENCH_r9..r12 `parsed: null`). StdoutOutput passes the child's stdout and
// stderr through verbatim.
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
// A/B seam for bench attribution runs: extra -D flags (e.g.
// -Dspark.graft.bloom.bitsPerKey=10) reach the forked run JVM via env —
// SparkConf adopts any spark.*-prefixed system property.
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
  .flatMap(_.split(" ").filter(_.nonEmpty))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // ~70 codegen-heavy queries + their warm passes generate enough JIT'd
  // classes to fill the default 240 MB code cache; a full cache silently
  // flushes/deoptimizes hot methods mid-bench — one suspect class of
  // nondeterministic per-query slowdowns. Headroom removes it.
  "-XX:ReservedCodeCacheSize=512m",
)
