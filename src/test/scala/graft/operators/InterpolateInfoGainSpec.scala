package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class InterpolateInfoGainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("linearInterpolate: interior nulls on the time axis, boundaries stay null") {
    val df = Seq(
      (1, ts("2024-01-01 00:00:00"), Option.empty[Double]), // leading → null
      (1, ts("2024-01-01 00:00:10"), Some(10.0)),
      (1, ts("2024-01-01 00:00:20"), None), // 1/3 of the way 10→40
      (1, ts("2024-01-01 00:00:40"), Some(40.0)),
      (1, ts("2024-01-01 00:00:50"), None) // trailing → null
    ).toDF("k", "t", "v")
    val out = WindowOps.linearInterpolate(df, Seq("k"), Seq("t"),
        $"t", $"v", "interp")
      .orderBy("t").select("interp").as[Option[Double]].collect().toSeq
    assert(out === Seq(None, Some(10.0), Some(20.0), Some(40.0), None))
  }

  test("linearInterpolate: equal timestamps degenerate to the midpoint") {
    val t0 = ts("2024-01-01 00:00:00")
    val df = Seq((1, t0, 1, Some(2.0)), (1, t0, 2, None), (1, t0, 3, Some(6.0)))
      .toDF("k", "t", "seq", "v")
    val out = WindowOps.linearInterpolate(df, Seq("k"), Seq("t", "seq"),
        $"t", $"v", "interp")
      .orderBy("seq").select("interp").as[Double].collect().toSeq
    assert(out === Seq(2.0, 4.0, 6.0))
  }

  test("infoGainScreen: perfect predictor gains H(y); useless one gains 0") {
    val df = Seq(
      ("a", "x", 1), ("a", "y", 1), ("b", "x", 0), ("b", "y", 0)
    ).toDF("perfect", "useless", "y")
    val out = AssociationOps.infoGainScreen(df,
        Seq("perfect" -> $"perfect", "useless" -> $"useless"), $"y")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ln2 = math.log(2)
    val (hy, hcP, igP) = out("perfect")
    assert(math.abs(hy - ln2) < 1e-6)
    assert(hcP === 0.0 && math.abs(igP - ln2) < 1e-6)
    val (_, hcU, igU) = out("useless")
    assert(math.abs(hcU - ln2) < 1e-6 && igU === 0.0)
  }

  test("infoGainScreen: gain_ratio null for a constant feature") {
    val df = Seq(("c", 1), ("c", 0)).toDF("const", "y")
    val r = AssociationOps.infoGainScreen(df, Seq("const" -> $"const"), $"y")
      .collect()(0)
    assert(r.getDouble(3) === 0.0) // info gain 0
    assert(r.isNullAt(4)) // gain_ratio undefined
  }
}
