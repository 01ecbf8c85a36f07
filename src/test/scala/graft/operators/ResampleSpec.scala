package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resampleInterpolate: dense grid, exact means, interpolated gaps") {
    // user 1: buckets 0 (mean of 100, 200 cents = 1.5), 3 (600 cents = 6.0)
    // → grid 0..3 with 1,2 interpolated at 3.0 and 4.5
    val df = Seq(
      (1, 0L, Some(100L)), (1, 0L, Some(200L)), (1, 3L, Some(600L)),
      (2, 5L, Some(1000L)) // single bucket → 1-row grid, no interp needed
    ).toDF("user_id", "day", "cents")
    val out = TimeSeriesOps.resampleInterpolate(df, "user_id",
        $"day", $"cents")
      .orderBy("user_id", "bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq === Seq(
      (1, 0L, Some(1.5), Some(1.5)),
      (1, 1L, None, Some(3.0)),
      (1, 2L, None, Some(4.5)),
      (1, 3L, Some(6.0), Some(6.0)),
      (2, 5L, Some(10.0), Some(10.0))))
  }

  test("resampleInterpolate: all-null-value bucket stays a grid hole that interpolates") {
    // bucket 1 exists (a row) but carries no value → mean null, interp fills
    val df = Seq(
      (1, 0L, Some(200L)), (1, 1L, Option.empty[Long]), (1, 2L, Some(400L))
    ).toDF("user_id", "day", "cents")
    val out = TimeSeriesOps.resampleInterpolate(df, "user_id", $"day", $"cents")
      .orderBy("bucket")
      .select("value_mean", "value_interp")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(out.toSeq === Seq(
      (Some(2.0), Some(2.0)), (None, Some(3.0)), (Some(4.0), Some(4.0))))
  }
}
