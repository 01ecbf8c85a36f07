package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: run ONE SparkEntry query repeatedly across scale
  * factors and AQE on/off, printing a content hash per run — the
  * determinism probe for rank/range-bucket-shaped operators (the class of
  * bug `aurocRankSum` shipped: right at one scale on one run, wrong and
  * run-to-run unstable at another).
  *
  * Usage: runMain graft.QueryProbe <queryName> [runs] [sfDir,sfDir,...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDirs =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- sfDirs; aqe <- Seq("true", "false"); r <- 1 to runs) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, d)
      // multiplicity-safe order-insensitive hash (same algebra as
      // DeterminismSpec): hash (distinct row, count) pairs so a row with
      // even multiplicity can't xor-cancel to a colliding hash
      val h = df.select(to_json(struct(df.columns.map(col): _*)).as("__j"))
        .groupBy(col("__j")).agg(count(lit(1)).as("__c"))
        .agg(coalesce(bit_xor(xxhash64(col("__j"), col("__c"))), lit(0L)))
        .collect()(0).getLong(0)
      val ms = (System.nanoTime() - t0) / 1000000
      val head = df.orderBy(df.columns.map(col): _*).limit(1).collect()
        .headOption.map(_.toString).getOrElse("<empty>")
      println(s"PROBE $name sf=$d aqe=$aqe run=$r hash=$h ms=$ms first=$head")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
