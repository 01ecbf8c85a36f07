package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-checkable cases for the round-9 statistics operators. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kruskalWallis: textbook two-group separation, no ties") {
    // A = {1, 2}, B = {4, 5}: ranks 1,2 / 3,4 → R_A = 3, R_B = 7, n = 4
    // H = 12/(4·5) · (9/2 + 49/2) − 3·5 = 17.4 − 15 = 2.4 (tie term 0)
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 4.0), ("B", 5.0))
      .toDF("g", "v")
    val r = RegressionOps.kruskalWallis(df, col("v"), col("g")).head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - 2.4) < 1e-9)
  }

  test("kruskalWallis: identical distributions give H near zero") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 2.0))
      .toDF("g", "v")
    val r = RegressionOps.kruskalWallis(df, col("v"), col("g")).head()
    assert(math.abs(r.getDouble(2)) < 1e-9)
  }

  test("mannKendallTrend: strictly increasing series, exact S and z sign") {
    // n = 5 increasing: S = C(5,2) = 10; no value ties →
    // Var = 5·4·15/18 = 50/3; z = 9/sqrt(50/3)
    val df = (1L to 5L).map(d => ("u", d, d * 10)).toDF("k", "o", "v")
    val r = TimeSeriesOps.mannKendallTrend(df, "k", col("o"), col("v"))
      .head()
    assert(r.getLong(1) === 5L && r.getLong(2) === 10L)
    val want = BigDecimal(9.0 / math.sqrt(50.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === want)
  }

  test("mannKendallTrend: constant series guards variance zero to null") {
    val df = (1L to 4L).map(d => ("u", d, 7L)).toDF("k", "o", "v")
    val r = TimeSeriesOps.mannKendallTrend(df, "k", col("o"), col("v"))
      .head()
    assert(r.getLong(2) === 0L && r.isNullAt(3))
  }

  test("theilSenSlope: median pairwise slope, robust to one outlier") {
    // series (1,10) (2,20) (3,30) (4,1000): slopes 10, 10, 10 and
    // 990/3=330, 980/2=490, 970/1 — sorted [10,10,10,330,490,970],
    // type-7 median interpolates h=2.5: 10 + 0.5·(330−10) = 170 —
    // while the CLEAN 3-point series is exactly 10
    val clean = Seq(("u", 1L, 10L), ("u", 2L, 20L), ("u", 3L, 30L))
      .toDF("k", "o", "v")
    val r0 = TimeSeriesOps.theilSenSlope(clean, "k", col("o"), col("v"))
      .head()
    assert(r0.getDouble(1) === 10.0)
    val dirty = clean.union(Seq(("u", 4L, 1000L)).toDF("k", "o", "v"))
    val r1 = TimeSeriesOps.theilSenSlope(dirty, "k", col("o"), col("v"))
      .head()
    assert(r1.getDouble(1) === 170.0)
  }

  test("mannKendallTrend: maxSeries cap drops oversized entities loudly") {
    val big = (1L to 30L).map(d => ("big", d, d))
    val small = (1L to 5L).map(d => ("small", d, d))
    val out = TimeSeriesOps.mannKendallTrend(
        (big ++ small).toDF("k", "o", "v"), "k", col("o"), col("v"),
        maxSeries = 10)
      .select("k").as[String].collect()
    assert(out.toSeq === Seq("small"))
  }
}
