package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Run-to-run determinism gate: EVERY SparkEntry query executes twice and
  * must produce bit-identical results.
  *
  * Why this exists: `repartitionByRange` samples fresh range boundaries on
  * every execution, so an operator whose bucketed frame is consumed twice
  * can silently combine two different bucketings — `aurocRankSum` shipped
  * exactly that bug, green at one scale on one run, wrong and
  * nondeterministic at the next scale. One green run is not correctness;
  * two identical runs at least rule out the whole class of
  * sampling/ordering instabilities this suite can observe.
  *
  * The two executions run with AQE ON and AQE OFF respectively. This is
  * load-bearing, not a variation for its own sake: with AQE on, Spark's
  * ReusedExchange collapses a doubly-consumed range exchange into one
  * execution and MASKS the instability (empirically verified — the
  * unpinned `aurocRankSum` is bit-stable here with AQE on, and varies
  * run-to-run with AQE off). Comparing across the two modes both defeats
  * that masking and asserts results don't depend on the optimizer mode a
  * cluster happens to run.
  *
  * The comparison is an order-insensitive content hash:
  * `bit_xor(xxhash64(to_json(struct(*))))` + the row count. `to_json`
  * normalizes every column type (arrays, structs, binary) into a
  * deterministic string, so one formula covers all ~150 queries.
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def contentHash(df: DataFrame): (Long, Long) = {
    val row = df
      .select(xxhash64(to_json(struct(df.columns.map(col): _*))).as("__h"))
      .agg(coalesce(bit_xor(col("__h")), lit(0L)).as("__hx"),
        count(lit(1)).as("__n"))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  test("every query: AQE-on and AQE-off executions, identical content hash") {
    val key = "spark.sql.adaptive.enabled"
    val saved = spark.conf.getOption(key)
    val failures = scala.collection.mutable.ListBuffer[String]()
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        spark.conf.set(key, "true")
        val first = contentHash(fn(spark, d))
        spark.conf.set(key, "false")
        val second = contentHash(fn(spark, d))
        if (first != second)
          failures += s"$name: aqeOn=(hash=${first._1}, n=${first._2}) " +
            s"aqeOff=(hash=${second._1}, n=${second._2})"
      }
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    assert(failures.isEmpty,
      s"nondeterministic queries:\n${failures.mkString("\n")}")
  }

  test("every query: results invariant under a different shuffle-partition count") {
    // the cluster-size portability claim, asserted: a result that changes
    // when spark.sql.shuffle.partitions changes would give different
    // answers on a 10-executor vs 1000-executor cluster. Every operator is
    // designed so partition ids are internal coordinates (range buckets,
    // salt) that cancel out of the final result.
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val failures = scala.collection.mutable.ListBuffer[String]()
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        spark.conf.set(key, saved)
        val first = contentHash(fn(spark, d))
        spark.conf.set(key, "7")
        val second = contentHash(fn(spark, d))
        if (first != second)
          failures += s"$name: P=$saved=(hash=${first._1}, n=${first._2}) " +
            s"P=7=(hash=${second._1}, n=${second._2})"
      }
    } finally spark.conf.set(key, saved)
    assert(failures.isEmpty,
      s"partition-count-dependent queries:\n${failures.mkString("\n")}")
  }
}
