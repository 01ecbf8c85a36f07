package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** Dev-only single-query timer: `runMain graft.QueryProfile <sfDir> <reps>
  * <q1,q2,...>` times each named SparkEntry query in isolation under the
  * Bench session settings (warmup at sf0.001 first, per-query block
  * cleanup with the shared-frame exemption) — the tool for attributing a
  * slow suite row without paying a full bench pass.
  */
object QueryProfile {
  private def force(df: DataFrame): Unit = {
    df.agg(bit_xor(xxhash64(df.columns.toSeq.map(col): _*))).collect(); ()
  }
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: QueryProfile <sfDir> <reps> <q1,q2,...>")
    val (d, reps, names) = (args(0), args(1).toInt, args(2).split(",").toSeq)
    val spark = BenchSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach(n =>
      try force(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () })
    SparkEntry.resetShared(spark)
    (1 to reps).foreach { i =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        try force(SparkEntry.queries(n)(spark, d))
        catch { case e: Throwable => println(s"[qp] $n FAILED: ${e.getMessage}") }
        println(f"[qp] rep$i $n%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => SparkEntry.isSharedRdd(id) }
          .values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
