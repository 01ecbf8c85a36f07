package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-7 graph additions (co-occurrence, triangles, degrees);
  * `GraphOpsSpec` covers PageRank.
  */
class GraphOpsSpec2 extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("coOccurrenceEdges counts shared baskets per canonical pair") {
    val baskets = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "y"), (2L, "x"),
      (2L, "x")) // duplicate (2, x) must not double-count
      .toDF("b", "i")
    val edges = GraphOps.coOccurrenceEdges(baskets, "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(edges === Map(("x", "y") -> 2L, ("x", "z") -> 1L,
      ("y", "z") -> 1L))
  }

  test("coOccurrenceEdges drops baskets above the quadratic cap entirely") {
    val baskets = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "x"), (2L, "y"))
      .toDF("b", "i")
    val edges = GraphOps.coOccurrenceEdges(baskets, "b", "i", maxBasket = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(edges === Map(("x", "y") -> 1L)) // basket 1 (size 3) excluded
  }

  test("triangleCount: one triangle plus a pendant edge") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(GraphOps.triangleCount(e, "src", "dst")
      .as[Long].collect()(0) === 1L)
  }

  test("triangleCount: K4 has exactly 4 triangles, K5 has 10") {
    def clique(n: Int) = (1 to n).combinations(2)
      .map { case Seq(a, b) => (a.toLong, b.toLong) }.toSeq
      .toDF("src", "dst")
    assert(GraphOps.triangleCount(clique(4), "src", "dst")
      .as[Long].collect()(0) === 4L)
    assert(GraphOps.triangleCount(clique(5), "src", "dst")
      .as[Long].collect()(0) === 10L)
  }

  test("triangleCount is hub-safe: a star has zero triangles") {
    val star = (2L to 30L).map(v => (1L, v)).toDF("src", "dst")
    assert(GraphOps.triangleCount(star, "src", "dst")
      .as[Long].collect()(0) === 0L)
  }

  test("degreeHistogram on K4: every node has degree 3") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val h = GraphOps.degreeHistogram(e, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h === Map(3L -> 4L))
  }

  test("kCore: cascading peel strips the tail, keeps the triangle") {
    // triangle {1,2,3} + path 3-4-5: peeling at k=2 drops 5 (deg 1),
    // which EXPOSES 4 (deg drops 2 → 1) — the second round matters
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val rows = GraphOps.kCore(e, "src", "dst", k = 2, rounds = 5).collect()
    val core = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // 5 rounds is past this graph's 2-round peel depth → converged
    assert(rows.forall(_.getAs[Boolean]("converged")))
  }

  test("kCore: converged=false when the peel is cut off mid-cascade") {
    // 6-path at k=2 peels one endpoint pair per round; 1 round is NOT
    // enough, and the flag must say so on the (superset) survivors
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val rows = GraphOps.kCore(e, "src", "dst", k = 2, rounds = 1).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(!_.getAs[Boolean]("converged")))
  }

  test("kCore: k above the graph's max core empties it") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    assert(GraphOps.kCore(e, "src", "dst", k = 3, rounds = 3)
      .collect().isEmpty)
  }
}
