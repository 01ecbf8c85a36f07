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

  test("every query: two executions, identical content hash") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val first = contentHash(fn(spark, d))
      val second = contentHash(fn(spark, d))
      if (first != second)
        failures += s"$name: run1=(hash=${first._1}, n=${first._2}) " +
          s"run2=(hash=${second._1}, n=${second._2})"
    }
    assert(failures.isEmpty,
      s"nondeterministic queries:\n${failures.mkString("\n")}")
  }
}
