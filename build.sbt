ThisBuild / scalaVersion := "2.13.17"
ThisBuild / scalacOptions ++= Seq("-deprecation")
ThisBuild / version := "0.1.0"
name := "flinkwikipediaspark"
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
// SPARK_DRIVER_MEM is clamped to 24g: with a huge -Xmx (e.g. 90g) G1
// lets the young gen balloon into tens of GB of never-touched pages
// and first-touch page zeroing inflates query times 3-20x (measured:
// 2.0s vs 6-46s on identical data). 24g comfortably covers the 30x
// scale corpus; raise the clamp only with a measured reason.
def clampHeap(s: String): String = {
  val m = "(?i)^(\\d+)([gm])$".r
  s match {
    case m(n, u) if u.toLowerCase == "g" && n.toInt > 24 => "24g"
    case m(n, u) if u.toLowerCase == "m" && n.toInt > 24576 => "24g"
    case _ => s
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${clampHeap(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))}",
)
