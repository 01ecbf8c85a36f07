package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** Dev-only micro-bench: time named SparkEntry queries (all when no args)
  * with the same materializing action Bench uses, two timed reps each after
  * a warmup rep, so single-query optimizations can be iterated without a
  * full bench run.
  */
object Profile {
  private def force(df: DataFrame): Unit = {
    df.agg(bit_xor(xxhash64(df.columns.map(col): _*))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the whole-suite working set is hundreds of codegen units; the
      // default 100-entry cache thrashes between warmup and the timed pass,
      // re-paying janino compilation (seconds for wide expression trees)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // InferFiltersFromGenerate clones the whole generator expression into
      // a scan-side size()>0 filter, so shingle towers (zip_with chains)
      // evaluate twice per row; nothing here prunes on it (no partitioned
      // sources), so the inference is pure double-compute — excluded
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // shuffle/spill blocks on tmpfs: the harness box shows multi-second
      // disk stalls on /tmp that randomize per-query timings
      .config("spark.local.dir", "/dev/shm/graft-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try force(fn(spark, d)) catch { case e: Throwable =>
          println(f"[prof] $n%-28s FAILED ${e.getMessage.take(120)}") }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $n%-28s ${ts.map(t => f"$t%7.3f").mkString(" ")} s (cold+2)")
    }
    spark.stop()
  }
}
