package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for representative queries and
  * flag plan smells (missing pushdown, cartesian products, missing
  * broadcast). Run: sbt "runMain graft.PlanAudit [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // AQE off here: the initial adaptive plan hides WholeStageCodegen
      // `*(n)` annotations, which this audit wants to see
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "s01_scan_project", "j01_join_agg_revenue", "j11_asof_interval",
      "a05_mode_dominance", "a06_percentile_clamp", "d03_lsh_neardup",
      "v01_cosine_topk", "v02_ann_clustered", "u03_densify_missing")
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString
      val smells = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "no-codegen" -> !(plan.contains("WholeStageCodegen") || plan.contains("*(")),
        "sort-merge-join" -> plan.contains("SortMergeJoin")).collect { case (s, true) => s }
      println(s"==== $n ${if (smells.isEmpty) "[clean]" else smells.mkString("[", ",", "]")}")
      println(plan.linesIterator
        .filter(l => l.contains("Scan parquet") || l.contains("PushedFilters") ||
          l.contains("Join") || l.contains("Exchange") || l.contains("ReadSchema"))
        .take(20).mkString("\n"))
    }
    spark.stop()
  }
}
