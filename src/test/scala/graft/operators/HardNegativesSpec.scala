package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HardNegativesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hardNegatives: same-block non-positives only, k per user, deterministic") {
    val inter = Seq((1, 10, "A"), (1, 11, "A"), (2, 20, "B"))
      .toDF("user", "item", "blk")
    val catalog = Seq((10, "A"), (11, "A"), (12, "A"), (13, "A"),
      (20, "B"), (21, "B"), (30, "C")).toDF("item", "blk")
    val out = FoldOps.hardNegatives(inter, "user", "item", "blk", catalog, k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    // user 1 (block A): candidates {12, 13}; user 2 (block B): {21}
    assert(out.map(t => (t._1, t._2)).toSet === Set((1, 12), (1, 13), (2, 21)))
    // never a positive, never cross-block
    assert(!out.exists(t => Set(10, 11, 20, 30).contains(t._2)))
    // rank is 1..k and the whole result is a pure function of content
    val again = FoldOps.hardNegatives(inter, "user", "item", "blk", catalog, k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(out.sortBy(t => (t._1, t._3)).toSeq === again.sortBy(t => (t._1, t._3)).toSeq)
    assert(out.forall(t => t._3 >= 1 && t._3 <= 2))
  }
}
