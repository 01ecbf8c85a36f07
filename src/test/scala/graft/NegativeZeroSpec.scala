package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Signed-zero gate: no query may emit -0.0 in any floating-point cell.
  *
  * Why this exists: the driver's correctness gate hashes raw bit patterns,
  * and IEEE 754 has two zeros that compare equal but hash differently.
  * Round 8's single red row (`v09_embed_cov`) was exactly this — DuckDB's
  * `ROUND(double, 6)` goes through `std::round` and preserves the sign of a
  * negative underflow (-0.0) while Spark's `Round` goes through BigDecimal
  * (signless) and emits +0.0. The repo-wide convention after round 9 is:
  * both engine and oracle normalize zeros to +0.0 (`ROUND(...) + 0.0` on
  * the oracle side; Spark's `round` already does it). This spec pins the
  * engine half of that convention for every query, so a future operator
  * that skips the closing `round` (or emits a raw negative product that
  * lands on -0.0) fails HERE instead of as a driver hash mismatch.
  *
  * Detection must dodge two Spark traps: ANSI mode makes 1.0/x THROW on a
  * zero divisor (so the classic 1/x == -Inf probe is out), and Spark's
  * `Atan2` normalizes both inputs with `+ 0.0` (so atan2(0, -0.0) = 0, not
  * π). The string cast is the reliable observer: CAST(-0.0 AS STRING) =
  * "-0.0", and the == 0.0 guard screens NaN/null — codegen-friendly, no
  * UDF, never throws.
  * Top-level float/double columns and arrays of them are swept; nested
  * structs don't occur as query outputs (PlanSweepSpec would be the place
  * to extend if one ever does).
  */
class NegativeZeroSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def isNegZero(c: org.apache.spark.sql.Column) =
    c === lit(0.0) && c.cast("string").startsWith("-")

  /** count of -0.0 cells across all float/double (and array-of) columns */
  private def negZeroCells(df: DataFrame): Long = {
    val preds = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          Some(sum(when(isNegZero(col(f.name).cast("double")), 1L)
            .otherwise(0L)))
        case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
          Some(sum(coalesce(aggregate(col(f.name).cast("array<double>"),
            lit(0L),
            (acc, x) => acc + when(isNegZero(x), 1L).otherwise(0L)),
            lit(0L))))
        case _ => None
      }
    }
    if (preds.isEmpty) 0L
    else {
      val row = df.agg(preds.head, preds.tail: _*).head()
      (0 until preds.size).map(i => if (row.isNullAt(i)) 0L
      else row.getLong(i)).sum
    }
  }

  test("no query emits -0.0 in any float/double cell") {
    val bad = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = negZeroCells(fn(spark, d))
      if (n > 0) bad += s"$name: $n -0.0 cells"
      // shared profiles go through their cache: raw unpersist would
      // orphan the memoized entries onto dead checkpoint blocks
      SparkEntry.resetShared(spark)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    assert(bad.isEmpty, s"queries emitting -0.0:\n${bad.mkString("\n")}")
  }

  test("the detector itself distinguishes -0.0 from +0.0 and ignores null/NaN") {
    import spark.implicits._
    val df = Seq(Some(-0.0), Some(0.0), Some(Double.NaN), None, Some(-1e-9))
      .toDF("x")
    assert(negZeroCells(df) === 1L)
    val arr = Seq(Seq(-0.0, 0.0, -0.0), Seq(1.0), Seq.empty[Double])
      .toDF("xs")
    assert(negZeroCells(arr) === 2L)
  }
}
