package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def z(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y")).as("z"))
      .collect()(0).getLong(0)

  test("zValue2 interleaves bits: x even, y odd") {
    // x=5 (101) → bits 0,4 = 17; y=3 (011) → bits 1,3 = 10 → 27
    assert(z(5, 3) === 27L)
    assert(z(0, 0) === 0L)
    assert(z(1, 0) === 1L)
    assert(z(0, 1) === 2L)
    // 31-bit max on both axes stays non-negative
    assert(z(2147483647L, 2147483647L) > 0L)
  }

  test("zValue2 is a bijection on a small grid") {
    val grid = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val zs = grid.toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length === 64)
    assert(zs.min === 0L && zs.max === 63L) // exactly fills [0, 64)
  }

  test("zValue2 locality: low quadrant sorts entirely before high quadrant") {
    // every point of [0,4)² has z < 16; every point of [4,8)² has z ≥ 48 —
    // the block property row-group pruning relies on
    val lo = for (x <- 0L until 4L; y <- 0L until 4L) yield z(x, y)
    val hi = for (x <- 4L until 8L; y <- 4L until 8L) yield z(x, y)
    assert(lo.max < hi.min)
  }
}
