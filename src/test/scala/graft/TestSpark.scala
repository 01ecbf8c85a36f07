package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test / fork := true → one JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Total shuffle records written by every task while `f` runs — the
    * LOAD-INSENSITIVE work proxy the scale probes (DocScaleSpec,
    * GraphScaleSpec) assert on: record counts are a function of the data
    * and the plan, not of this host's CPU-steal waves, so a quadratic
    * candidate-pair tail still trips the ratio deterministically while a
    * slow window can't flake it. Listener events arrive asynchronously
    * after the action returns, so the reader polls until the counter is
    * stable.
    */
  def shuffleRecords(f: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) acc.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      var prev = -1L
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 5000) {
        Thread.sleep(100)
        waited += 100
        val cur = acc.get
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      acc.get
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
