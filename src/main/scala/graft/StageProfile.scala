package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}

/** Dev-only stage-level attribution: for each named SparkEntry query, the
  * wall time of the Bench action alongside the number of Spark jobs,
  * stages, tasks and the summed executor task time — separating "the plan
  * does too many exchanges/jobs" (stage-count floor) from "the tasks are
  * slow" (per-task work) and "neither" (driver-side planning time).
  *
  * Usage: runMain graft.StageProfile <sfDir> <q1,q2,...>
  */
object StageProfile {
  private def force(df: DataFrame): Unit = {
    df.agg(bit_xor(xxhash64(df.columns.map(col): _*))).collect(); ()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StageProfile <sfDir> <q1,q2,...>")
    val d = args(0)
    val names = args(1).split(",").toSeq
    val spark = BenchSession.build()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0)
    val shufWrite = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shufWrite.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
      }
    })

    // warmup at sf0.001 (JIT + codegen + footer cache)
    names.foreach { n =>
      try force(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    SparkEntry.resetShared(spark)
    println(f"${"query"}%-34s ${"wall"}%7s ${"jobs"}%5s ${"stage"}%5s " +
      f"${"tasks"}%6s ${"taskS"}%7s ${"shufKB"}%8s")
    (1 to 2).foreach { rep =>
      names.foreach { n =>
        Thread.sleep(150) // let listener drain
        val (j0, s0, t0, m0, w0) =
          (jobs.get, stages.get, tasks.get, taskMs.get, shufWrite.get)
        val w = System.nanoTime()
        try force(SparkEntry.queries(n)(spark, d))
        catch { case e: Throwable => println(s"[sp] $n FAILED: ${e.getMessage}") }
        val wall = (System.nanoTime() - w) / 1e9
        Thread.sleep(150)
        println(f"$n%-34s $wall%7.3f ${jobs.get - j0}%5d ${stages.get - s0}%5d " +
          f"${tasks.get - t0}%6d ${(taskMs.get - m0) / 1e3}%7.2f " +
          f"${(shufWrite.get - w0) / 1024}%8d")
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => SparkEntry.isSharedRdd(id) }
          .values.foreach(_.unpersist(false))
      }
      println(s"--- end rep $rep")
    }
    spark.stop()
  }
}
