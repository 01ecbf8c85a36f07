package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RegressionOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("groupOls recovers an exact line, drops unfittable groups") {
    // g1: y = 3 + 2x exactly → slope 2, intercept 3, r2 = 1
    // g2: single point → dropped; g3: zero x-variance → dropped
    val df = Seq(
      ("g1", 0L, 3L), ("g1", 1L, 5L), ("g1", 2L, 7L), ("g1", 3L, 9L),
      ("g2", 5L, 1L),
      ("g3", 4L, 1L), ("g3", 4L, 9L))
      .toDF("g", "x", "y")
    val rows = RegressionOps.groupOls(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("g1"))
    val g1 = rows("g1")
    assert(g1.getLong(1) === 4L)
    assert(g1.getDouble(2) === 2.0)
    assert(g1.getDouble(3) === 3.0)
    assert(g1.getDouble(4) === 1.0)
  }

  test("groupOls R² is null for constant y (undefined), slope 0") {
    val df = Seq(("g", 0L, 5L), ("g", 1L, 5L), ("g", 2L, 5L)).toDF("g", "x", "y")
    val r = RegressionOps.groupOls(df, "g", col("x"), col("y")).collect()(0)
    assert(r.getDouble(2) === 0.0)     // slope
    assert(r.getDouble(3) === 5.0)     // intercept = mean
    assert(r.isNullAt(4))              // r2 undefined
  }

  test("groupOls slope sign and magnitude on a noisy descending series") {
    // y = 10 - x with one outlier; slope stays negative
    val df = Seq(("g", 0L, 10L), ("g", 1L, 9L), ("g", 2L, 8L), ("g", 3L, 30L))
      .toDF("g", "x", "y")
    val r = RegressionOps.groupOls(df, "g", col("x"), col("y")).collect()(0)
    assert(r.getDouble(2) > 0.0)       // outlier flips the trend upward
    assert(r.getDouble(4) < 1.0)
  }

  test("quantileNormalize maps within-group strata to cross-group means") {
    // two sources of 4 rows, q=2: low half vs high half.
    // a-low {10, 20}, b-low {1, 2} → ref(bucket 0) = 33/4 = 8.25
    // a-high {30, 40}, b-high {3, 4} → ref(bucket 1) = 77/4 = 19.25
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L), ("a", 4L, 40L),
      ("b", 5L, 1L), ("b", 6L, 2L), ("b", 7L, 3L), ("b", 8L, 4L))
      .toDF("src", "id", "v")
    val out = RegressionOps.quantileNormalize(df, "src", col("v"), col("id"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getInt(3), r.getDouble(4))).toMap
    assert(out(("a", 1L)) === ((0, 8.25)))
    assert(out(("b", 6L)) === ((0, 8.25)))
    assert(out(("a", 4L)) === ((1, 19.25)))
    assert(out(("b", 7L)) === ((1, 19.25)))
    // same stratum ⇒ same normalized value regardless of source scale
    assert(out(("a", 2L))._2 === out(("b", 5L))._2)
  }

  test("quantileNormalize handles group sizes that don't divide q evenly") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L)).toDF("src", "id", "v")
    val buckets = RegressionOps.quantileNormalize(df, "src", col("v"), col("id"), 2)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    // (rn-1)*2 DIV 3 → 0, 0, 1
    assert(buckets === Map(1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("zipfFit recovers the exponent of an exact power law") {
    // counts = 1000 / rank for ranks 1..50 → ln-ln slope −1
    val counts = (1 to 50).map(r => (s"t$r", math.round(100000.0 / r)))
      .toDF("term", "cnt")
    val fit = RegressionOps.zipfFit(counts, "term", "cnt").collect()(0)
    assert(fit.getLong(0) === 50L)
    assert(math.abs(fit.getDouble(1) - (-1.0)) < 0.001)
    assert(fit.getDouble(3) > 0.999)
  }

  test("zipfFit on a flat (templated) distribution reports slope ≈ 0") {
    val counts = (1 to 30).map(r => (s"t$r", 500L)).toDF("term", "cnt")
    val fit = RegressionOps.zipfFit(counts, "term", "cnt").collect()(0)
    assert(math.abs(fit.getDouble(1)) < 1e-6)
  }
}
