package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SurvivalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kaplanMeier reproduces the textbook product-limit curve") {
    // group A, 4 subjects: event@1, censor@2, event@3, censor@5
    // t=1: n=4, d=1 → S = 3/4 = 0.75
    // t=2: n=3, c=1 → S unchanged
    // t=3: n=2, d=1 → S = 0.75 · 1/2 = 0.375
    // t=5: n=1, c=1 → S unchanged
    val subj = Seq(("A", 1L, 1), ("A", 2L, 0), ("A", 3L, 1), ("A", 5L, 0))
      .toDF("g", "dur", "ev")
    val rows = SurvivalOps.kaplanMeier(subj, "g", "dur", "ev")
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(rows === Array(
      (1L, 4L, 1L, 0L, 0.75),
      (2L, 3L, 0L, 1L, 0.75),
      (3L, 2L, 1L, 0L, 0.375),
      (5L, 1L, 0L, 1L, 0.375)))
  }

  test("kaplanMeier pins survival to exactly 0 when a time point exhausts the risk set") {
    val subj = Seq(("A", 1L, 1), ("A", 2L, 1), ("A", 2L, 1))
      .toDF("g", "dur", "ev")
    val rows = SurvivalOps.kaplanMeier(subj, "g", "dur", "ev")
      .orderBy("t").collect()
    assert(rows(0).getDouble(5) === math.rint((2.0 / 3) * 1e6) / 1e6)
    assert(rows(1).getDouble(5) === 0.0) // d = n_risk = 2: no ln(0), exact 0
  }

  test("kaplanMeier keeps groups independent") {
    val subj = Seq(("A", 1L, 1), ("A", 2L, 0), ("B", 1L, 0), ("B", 3L, 1))
      .toDF("g", "dur", "ev")
    val byG = SurvivalOps.kaplanMeier(subj, "g", "dur", "ev")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5))
      .toMap
    assert(byG(("A", 1L)) === 0.5)  // 1 of 2 at risk dies
    assert(byG(("B", 1L)) === 1.0)  // censor only
    assert(byG(("B", 3L)) === 0.0)  // last subject dies
  }

  test("logRank is ~0 for identically-distributed arms and flags separated ones") {
    // identical arms → O1 = E1 exactly, chi2 = 0
    val same = Seq((1, 1L, 1), (1, 2L, 1), (0, 1L, 1), (0, 2L, 1))
      .toDF("g1", "dur", "ev")
    val r0 = SurvivalOps.logRank(same, "g1", "dur", "ev").collect()(0)
    assert(r0.getLong(0) === 2L)
    assert(r0.getDouble(1) === 2.0)
    assert(r0.getDouble(2) === 0.0)

    // arm 1 dies strictly earlier, arm 0 all censored late → O1 >> E1
    val sep = Seq((1, 1L, 1), (1, 2L, 1), (1, 3L, 1),
      (0, 10L, 0), (0, 11L, 0), (0, 12L, 0)).toDF("g1", "dur", "ev")
    val r1 = SurvivalOps.logRank(sep, "g1", "dur", "ev").collect()(0)
    assert(r1.getLong(0) === 3L)
    assert(r1.getDouble(1) < 2.0)   // expected under null is well below 3
    assert(r1.getDouble(2) > 2.0)   // clearly non-zero statistic
  }

  test("logRank matches the hand-computed two-sample statistic") {
    // arm1: event@1, event@3; arm0: event@2, censor@4
    // t=1: n=4, n1=2, d=1 → e1 = 1/2,  v = 1·(1/2)(1/2)(3/3) = 1/4
    // t=2: n=3, n1=1, d=1 → e1 = 1/3,  v = 1·(1/3)(2/3)(2/2) = 2/9
    // t=3: n=2, n1=1, d=1 → e1 = 1/2,  v = 1·(1/2)(1/2)(1/1) = 1/4
    // O1=2, E1=4/3, V=13/18 → chi2 = (2/3)²/(13/18) = 8/13
    val subj = Seq((1, 1L, 1), (1, 3L, 1), (0, 2L, 1), (0, 4L, 0))
      .toDF("g1", "dur", "ev")
    val r = SurvivalOps.logRank(subj, "g1", "dur", "ev").collect()(0)
    assert(r.getLong(0) === 2L)
    assert(math.abs(r.getDouble(1) - 4.0 / 3) < 1e-6)
    assert(math.abs(r.getDouble(2) - 8.0 / 13) < 1e-6)
  }
}
