package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IsotonicOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference PAV: sequential stack merge over (score-sorted) distinct
    * points — the textbook algorithm the distributed form must equal.
    */
  private def bruteBlocks(pts: Seq[(Double, Int)]): Seq[(Double, Double, Long, Long)] = {
    val agg = pts.groupBy(_._1).map { case (s, g) =>
      (s, s, g.size.toLong, g.map(_._2.toLong).sum) }.toSeq.sortBy(_._1)
    val stack = scala.collection.mutable.ArrayBuffer[(Double, Double, Long, Long)]()
    for (b0 <- agg) {
      var cur = b0
      while (stack.nonEmpty && stack.last._4 * cur._3 >= cur._4 * stack.last._3) {
        val p = stack.remove(stack.length - 1)
        cur = (p._1, cur._2, p._3 + cur._3, p._4 + cur._4)
      }
      stack += cur
    }
    stack.toSeq
  }

  private def distributed(pts: Seq[(Double, Int)]): Seq[(Double, Double, Long, Long)] =
    IsotonicOps.isotonicFit(pts.toDF("s", "y"), $"s", $"y")
      .orderBy("score_lo")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("distributed PAV equals the sequential reference on randomized inputs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 200 + trial * 130
      val pts = Seq.fill(n)((rnd.nextInt(40).toDouble,
        if (rnd.nextDouble() < 0.5) 1 else 0))
      assert(distributed(pts) === bruteBlocks(pts), s"trial $trial")
    }
  }

  test("already-monotone input: every distinct score is its own block") {
    val pts = Seq((1.0, 0), (2.0, 0), (2.0, 1), (3.0, 1))
    // means 0, 0.5, 1 strictly increasing → no pooling
    assert(distributed(pts) === Seq(
      (1.0, 1.0, 1L, 0L), (2.0, 2.0, 2L, 1L), (3.0, 3.0, 1L, 1L)))
  }

  test("anti-monotone input pools to a single block") {
    val pts = Seq((1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0))
    assert(distributed(pts) === Seq((1.0, 4.0, 4L, 2L)))
  }

  test("fitted values are strictly increasing across blocks and conserve mass") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(25).toDouble,
      if (rnd.nextDouble() < 0.3) 1 else 0))
    val blocks = distributed(pts)
    val means = blocks.map(b => b._4.toDouble / b._3)
    assert(means.sliding(2).forall { case Seq(a, b) => a < b; case _ => true })
    assert(blocks.map(_._3).sum === 500L)
    assert(blocks.map(_._4).sum === pts.count(_._2 == 1).toLong)
  }
}
