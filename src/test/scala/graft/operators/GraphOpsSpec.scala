package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(String, String, Long)], iters: Int = 20): Map[String, Double] =
    GraphOps.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
      iters, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("symmetric cycle converges to uniform ranks that sum to 1") {
    val r = ranks(Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)))
    assert(r.size === 3)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-6))
    // each reported rank is 6dp-rounded → the sum drifts ≤ n·5e-7
    assert(math.abs(r.values.sum - 1.0) < 1e-5)
  }

  test("an authority pointed at by everyone outranks its spokes") {
    val r = ranks(Seq(("a", "hub", 1L), ("b", "hub", 1L), ("c", "hub", 1L),
      ("hub", "a", 1L), ("hub", "b", 1L), ("hub", "c", 1L)))
    assert(r("hub") > r("a"))
    assert(math.abs(r("a") - r("b")) < 1e-9)
    // each reported rank is 6dp-rounded → the sum drifts ≤ n·5e-7
    assert(math.abs(r.values.sum - 1.0) < 1e-5)
  }

  test("dangling node's mass is redistributed — total rank stays 1") {
    // 'sink' has no out-edges; without dangling handling the total leaks
    val r = ranks(Seq(("a", "sink", 1L), ("b", "sink", 1L), ("a", "b", 1L)))
    // each reported rank is 6dp-rounded → the sum drifts ≤ n·5e-7
    assert(math.abs(r.values.sum - 1.0) < 1e-5)
    assert(r("sink") > r("b"))
  }

  test("edge weights bias the scatter: heavier edge, higher target rank") {
    val r = ranks(Seq(("a", "x", 9L), ("a", "y", 1L),
      ("x", "a", 1L), ("y", "a", 1L)))
    assert(r("x") > r("y"))
  }

  test("ranks are identical across partition counts (fixed-point + pinning)") {
    val edges = (0 until 40).map(i => (s"n${i % 7}", s"n${(i * 3 + 1) % 7}", (i % 5 + 1).toLong))
    val df = edges.toDF("src", "dst", "w")
    val r1 = GraphOps.pageRank(df.repartition(1), "src", "dst", "w", 5, 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r8 = GraphOps.pageRank(df.repartition(8), "src", "dst", "w", 5, 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r1 === r8)
  }
}
