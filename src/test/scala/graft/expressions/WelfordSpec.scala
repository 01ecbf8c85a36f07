package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WelfordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches var_samp/stddev_samp on well-conditioned data, any partitioning") {
    val xs = (1 to 1000).map(i => math.sin(i) * 100 + i * 0.01)
    val ds = xs.toDS()
    val r = ds.select(WelfordVariance.typed).head()
    val ref = ds.toDF("x")
      .agg(avg("x"), var_samp("x"), stddev_samp("x"))
      .head()
    assert(r.n === 1000L)
    assert(math.abs(r.mean - ref.getDouble(0)) < 1e-9)
    assert(math.abs(r.variance - ref.getDouble(1)) < 1e-6)
    assert(math.abs(r.stddev - ref.getDouble(2)) < 1e-9)
    val rp = ds.repartition(17).select(WelfordVariance.typed).head()
    assert(rp.n === r.n && math.abs(rp.variance - r.variance) < 1e-9)
  }

  test("stays accurate where the naive sum-of-squares cancels catastrophically") {
    // mean 1e9, spread 1: E[x²] ≈ 1e18 eats the ±1 signal in double precision
    val xs = Seq(1e9, 1e9 + 1, 1e9 - 1, 1e9 + 2, 1e9 - 2)
    val r = xs.toDS().select(WelfordVariance.typed).head()
    // exact sample variance of {0,±1,±2} offsets = (0+1+1+4+4)/4 = 2.5
    assert(math.abs(r.variance - 2.5) < 1e-6)
    assert(math.abs(r.mean - 1e9) < 1e-6)
  }

  test("degenerate inputs: empty is NaN/0, single value has no variance") {
    val e = Seq.empty[Double].toDS().select(WelfordVariance.typed).head()
    assert(e.n === 0L && e.mean.isNaN && e.variance.isNaN)
    val one = Seq(42.0).toDS().select(WelfordVariance.typed).head()
    assert(one.n === 1L && one.mean === 42.0 && one.variance.isNaN)
  }

  test("typed groupByKey aggregation: per-key results match per-key batch") {
    val data = (1 to 400).map(i => (s"k${i % 4}", i.toDouble))
    val byKey = data.toDS()
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(WelfordVariance.typed)
      .collect().toMap
    data.groupBy(_._1).foreach { case (k, rows) =>
      val vs = rows.map(_._2)
      val m = vs.sum / vs.size
      val v = vs.map(x => (x - m) * (x - m)).sum / (vs.size - 1)
      assert(math.abs(byKey(k).variance - v) < 1e-9, k)
    }
  }
}
