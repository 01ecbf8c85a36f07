package graft

import java.nio.file.{Files, Paths}


/** Dev tool: write `.explain("formatted")` of named SparkEntry queries to
  * `<outDir>/<name>_<tag>.txt` — the before/after plan evidence for
  * optimization rounds. Runs under the Bench session settings so the plans
  * are the ones the bench actually executes (AQE initial plans).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <tag> <q1,q2,...>")
    val (d, outDir, tag, names) =
      (args(0), args(1), args(2), args(3).split(",").toSeq)
    val spark = BenchSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), plan)
        println(s"[plandump] wrote $n ($tag)")
      } catch { case e: Throwable =>
        println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
