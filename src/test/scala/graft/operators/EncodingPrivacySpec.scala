package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EncodingPrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("targetEncodeLoo: hand-checked leave-one-out means, singleton → null") {
    val df = Seq(
      ("a", 1), ("a", 0), ("a", 1), // loo for y=1: (2-1)/2 = 0.5; y=0: 2/2 = 1.0
      ("b", 1) // singleton → null
    ).toDF("cat", "y")
    val out = EncodingOps.targetEncodeLoo(df, "cat", $"y", "enc")
      .select($"cat", $"y", $"enc").collect()
    val byRow = out.map(r =>
      (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(byRow === Set(
      ("a", 1, Some(0.5)), ("a", 0, Some(1.0)), ("b", 1, None)))
  }

  test("weightOfEvidence: uniform target → woe 0 for balanced categories") {
    val df = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 0)).toDF("cat", "y")
    val woe = EncodingOps.weightOfEvidence(df, "cat", $"y")
      .select($"cat", $"woe").as[(String, Double)].collect().toMap
    // pos=neg in every cell and in the totals → log(1) = 0
    assert(woe("a") === 0.0 && woe("b") === 0.0)
  }

  test("weightOfEvidence: all-positive category stays finite via smoothing") {
    val df = Seq(("a", 1), ("a", 1), ("b", 0), ("b", 1)).toDF("cat", "y")
    val woe = EncodingOps.weightOfEvidence(df, "cat", $"y")
      .select($"cat", $"woe").as[(String, Double)].collect().toMap
    assert(!woe("a").isInfinite && woe("a") > 0 && woe("b") < 0)
  }

  test("kAnonymityProfile: counts, distinct-sensitive and suppression flag") {
    val df = Seq(
      (1, "x", 10.0), (1, "x", 20.0), (1, "x", 20.0),
      (2, "y", 5.0)
    ).toDF("qi1", "qi2", "sens")
    val prof = PrivacyOps.kAnonymityProfile(df, Seq("qi1", "qi2"),
        $"sens", minK = 2L)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    assert(prof === Set((1, "x", 3L, 2L, 0), (2, "y", 1L, 1L, 1)))
  }

  test("rrfFuse: shared top item wins; list-exclusive items still score") {
    val l1 = Seq((1, 10.0), (2, 9.0), (3, 8.0)).toDF("id", "score")
    val l2 = Seq((1, 0.5), (4, 0.9)).toDF("id", "score")
    val fused = RetrievalOps.rrfFuse(Seq(l1, l2), "id", k = 4)
      .as[(Int, Double)].collect()
    // id 1: 1/61 + 1/62 ≈ 0.032525 — ranked first; the rest single-list
    assert(fused.head._1 === 1)
    assert(math.abs(fused.head._2 - (1.0 / 61 + 1.0 / 62)) < 1e-6)
    assert(fused.map(_._1).toSet === Set(1, 2, 3, 4))
  }
}
