package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-7 RegressionOps additions (Spearman, Heaps); RegressionOpsSpec
  * covers groupOls / quantileNormalize / zipfFit.
  */
class RegressionOpsSpec2 extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spearman: monotone relation gives exactly 1, reversed gives -1") {
    val up = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 40.0))
      .toDF("x", "y")
    assert(RegressionOps.spearman(up, col("x"), col("y"))
      .collect()(0).getDouble(1) === 1.0)
    val down = Seq((1.0, 40.0), (2.0, 25.0), (3.0, 20.0), (4.0, 10.0))
      .toDF("x", "y")
    assert(RegressionOps.spearman(down, col("x"), col("y"))
      .collect()(0).getDouble(1) === -1.0)
  }

  test("spearman matches the hand-computed tie-averaged value") {
    // x: 1,1,2,3 → avg ranks 1.5,1.5,3,4 ; y: 5,6,6,8 → 1,2.5,2.5,4
    // doubled: rx 3,3,6,8 ; ry 2,5,5,8
    // Pearson(rx, ry): n=4, sx=20, sy=20, sxx=118, syy=118, sxy=115
    // num = 4·115 − 400 = 60; den = 4·118 − 400 = 72 → ρ = 60/72
    val df = Seq((1.0, 5.0), (1.0, 6.0), (2.0, 6.0), (3.0, 8.0))
      .toDF("x", "y")
    val r = RegressionOps.spearman(df, col("x"), col("y")).collect()(0)
    assert(r.getLong(0) === 4L)
    assert(math.abs(r.getDouble(1) - 60.0 / 72.0) < 1e-6)
  }

  test("spearman is invariant under any monotone transform of either column") {
    val df = Seq((1.0, 3.0), (2.0, 1.0), (3.0, 9.0), (4.0, 4.0), (5.0, 7.0))
      .toDF("x", "y")
    val base = RegressionOps.spearman(df, col("x"), col("y"))
      .collect()(0).getDouble(1)
    val warped = RegressionOps.spearman(
      df.select(exp(col("x")).as("x"), pow(col("y"), 3).as("y")),
      col("x"), col("y")).collect()(0).getDouble(1)
    assert(base === warped)
  }

  test("heapsFit recovers beta=1 on an all-new-tokens corpus") {
    // every token unique → V(n) = n exactly → slope 1, intercept 0, r2 1
    val docs = (1 to 20).map(i =>
      (i.toLong, (1 to 10).map(j => s"tok_${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val r = RegressionOps.heapsFit(docs, "doc_id", "text").collect()(0)
    assert(r.getLong(0) === 20L)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-4)  // beta
    assert(math.abs(r.getDouble(2)) < 1e-4)        // ln K
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-6)  // r2
  }

  test("heapsFit flattens on a closed-vocabulary corpus") {
    // same 5 tokens forever → V saturates at 5 → slope near 0
    val docs = (1 to 30).map(i => (i.toLong, "a b c d e")).toDF("doc_id", "text")
    val r = RegressionOps.heapsFit(docs, "doc_id", "text").collect()(0)
    assert(math.abs(r.getDouble(1)) < 1e-6)
  }

  test("heapsFit attributes a token's first occurrence to the earliest doc") {
    // 'shared' first appears in doc 1; docs 2-3 add one new token each
    val docs = Seq((1L, "shared alpha"), (2L, "shared beta"),
      (3L, "beta gamma shared")).toDF("doc_id", "text")
    // curve: (2, 2), (4, 3), (7, 4) — all three docs contribute >= 1 new
    val r = RegressionOps.heapsFit(docs, "doc_id", "text").collect()(0)
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0)
  }
}
