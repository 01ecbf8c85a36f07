package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SeasonalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 1970-01-01 is a Thursday → dow 4 under the 0=Sunday convention.
  // Session tz is UTC, so epoch-second hours land on exact hod values.
  private def ts(daysAfterEpoch: Int, hour: Int) =
    new Timestamp((daysAfterEpoch * 24L + hour) * 3600L * 1000L)

  test("seasonalProfile: exact per-cell count, mean, population std") {
    // same calendar cell (Thu 10:00) across two weeks: values 1, 3
    // → n=2, mean=2, std = 1 (population)
    val df = Seq((1L, ts(0, 10), "k", 1.0), (2L, ts(7, 10), "k", 3.0),
      (3L, ts(0, 11), "k", 5.0)) // different cell
      .toDF("id", "t", "key", "v")
    val prof = TimeSeriesOps.seasonalProfile(df, "key", "t", col("v"))
      .collect().map(r => (r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(prof((4, 10)) === ((2L, 2.0, 1.0)))
    assert(prof((4, 11)) === ((1L, 5.0, 0.0)))
  }

  test("seasonalAnomalies flags only far-from-baseline rows in eligible cells") {
    // cell Thu 10: values 1,1,1,1,9 → mean 2.6, std 3.2; z(9) = 2.0,
    // z(1) = −0.5 → only the 9 flags at zThresh 1.5 (minN 5 satisfied)
    val base = (1 to 4).map(w => (w.toLong, ts(7 * w, 10), "k", 1.0))
    val df = (base :+ (9L, ts(0, 10), "k", 9.0)).toDF("id", "t", "key", "v")
    val hits = TimeSeriesOps.seasonalAnomalies(df, "key", "t", "id",
      col("v"), zThresh = 1.5, minN = 5).collect()
    assert(hits.length === 1)
    assert(hits(0).getLong(0) === 9L)
    assert(hits(0).getDouble(5) === 2.0)
  }

  test("seasonalAnomalies: cells under minN never flag (no baseline, no verdict)") {
    val df = Seq((1L, ts(0, 10), "k", 1.0), (2L, ts(7, 10), "k", 100.0))
      .toDF("id", "t", "key", "v")
    assert(TimeSeriesOps.seasonalAnomalies(df, "key", "t", "id", col("v"),
      zThresh = 1.0, minN = 3).count() === 0L)
  }
}
