package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.streaming.WikiEditPipeline

/** Dev/demo driver: runs the full reference-equivalent streaming job
  * (JSON-lines dir → windowed edit sizes → JSON doc sink) against a
  * generated input dir and prints the emitted documents. Usage:
  *   runMain graft.tools.RunPipelineDemo [workDir]
  */
object RunPipelineDemo {
  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0)
      else Files.createTempDirectory("graft_demo").toString
    val in = s"$work/in"; val out = s"$work/out"; val ck = s"$work/ck"
    Files.createDirectories(Paths.get(in))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def edit(id: Int, dom: String, ut: String, ns: String, t: String,
        o: Long, n: Long) =
      s"""{"id":"$id","domain":"$dom","namespace":"$ns","title":"T$id",""" +
        s""""timestamp":"$t","user_name":"u","user_type":"$ut",""" +
        s""""old_length":$o,"new_length":$n}"""
    Files.write(Paths.get(in, "b1.json"), String.join("\n",
      edit(1, "en.wikipedia.org", "human", "main namespace",
        "2023-11-27T19:01:00Z", 100, 160),
      edit(2, "en.wikipedia.org", "human", "main namespace",
        "2023-11-27T19:04:00Z", 160, 150),
      edit(3, "en.wikipedia.org", "bot", "main namespace",
        "2023-11-27T19:02:00Z", 0, 9999),
      edit(4, "de.wikipedia.org", "human", "main namespace",
        "2023-11-27T19:02:00Z", 200, 450)).getBytes)
    val q = WikiEditPipeline.run(spark, in, out, ck)
    q.processAllAvailable()
    // windows close on watermark: feed a later batch, then drain
    Files.write(Paths.get(in, "b2.json"), edit(9, "en.wikipedia.org",
      "human", "main namespace", "2023-11-27T19:30:00Z", 1, 2).getBytes)
    q.processAllAvailable()
    q.stop()
    println("=== emitted documents ===")
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(out)).iterator().asScala
      .filter(_.toString.endsWith(".txt"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .foreach(println)
    spark.stop()
  }
}
