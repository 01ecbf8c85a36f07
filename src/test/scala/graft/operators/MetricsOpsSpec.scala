package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MetricsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("confusionMetrics cells and derived rates") {
    // 2 TP, 1 FP, 3 TN, 2 FN
    val df = Seq((1, 1), (1, 1), (0, 1), (0, 0), (0, 0), (0, 0), (1, 0), (1, 0))
      .toDF("truth", "pred")
    val r = MetricsOps.confusionMetrics(df, col("truth"), col("pred")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 1L, 3L, 2L)))
    assert(r.getDouble(4) === 0.625)      // accuracy
    assert(r.getDouble(5) === 0.666667)   // precision
    assert(r.getDouble(6) === 0.5)        // recall
  }

  test("aurocRankSum matches the hand-computed Mann-Whitney value") {
    // scores: positives {3, 4}, negatives {1, 2, 3.5} → pairs won: (3>1,3>2) +
    // (4>1,4>2,4>3.5) = 5 of 6 → AUC = 5/6
    val df = Seq((3.0, 1, 1L), (4.0, 1, 2L), (1.0, 0, 3L), (2.0, 0, 4L), (3.5, 0, 5L))
      .toDF("score", "label", "id")
    val auc = MetricsOps.aurocRankSum(df, col("score"), col("label"), col("id"))
      .as[Double].collect()(0)
    assert(math.abs(auc - 5.0 / 6.0) < 1e-6)
  }

  test("groupedConfusion derives the reference's per-group rates, null on zero denominators") {
    // g1: tp=1, fp=0, tn=0, fn=1 — no actual negatives → tnr/fpr null
    // g2: tp=0, fp=1, tn=1, fn=0 — no actual positives → tpr/fnr null
    val df = Seq(("g1", 1, 1), ("g1", 1, 0), ("g2", 0, 0), ("g2", 0, 1))
      .toDF("g", "truth", "pred")
    val rows = MetricsOps.groupedConfusion(df, "g", col("truth"), col("pred"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = rows("g1")
    assert(g1.getDouble(g1.fieldIndex("tpr")) === 0.5)
    assert(g1.isNullAt(g1.fieldIndex("tnr")) && g1.isNullAt(g1.fieldIndex("fpr")))
    assert(g1.getDouble(g1.fieldIndex("fnr")) === 0.5)
    assert(g1.getDouble(g1.fieldIndex("pr")) === 0.5)
    assert(g1.getDouble(g1.fieldIndex("nr")) === 0.5)
    assert(g1.getDouble(g1.fieldIndex("accuracy")) === 0.5)
    val g2 = rows("g2")
    assert(g2.isNullAt(g2.fieldIndex("tpr")) && g2.isNullAt(g2.fieldIndex("fnr")))
    assert(g2.getDouble(g2.fieldIndex("tnr")) === 0.5)
    assert(g2.getDouble(g2.fieldIndex("fpr")) === 0.5)
    assert(g2.getDouble(g2.fieldIndex("accuracy")) === 0.5)
  }

  test("temperatureScale picks the grid argmin of the stable BCE") {
    val data = Seq((2.0, 1.0), (-1.0, 0.0), (0.5, 1.0), (-2.0, 0.0), (3.0, 0.0))
    val grid = Seq(0.5, 1.0, 2.0, 4.0)
    def bce(t: Double): Double = data.map { case (z0, y) =>
      val z = z0 / t
      math.max(z, 0.0) - z * y + math.log1p(math.exp(-math.abs(z)))
    }.sum / data.size
    val (expLoss, expT) = grid.map(t => (bce(t), t)).min
    val r = MetricsOps.temperatureScale(data.toDF("z", "y"), col("z"), col("y"), grid)
      .collect()(0)
    assert(r.getDouble(0) === expT)
    assert(math.abs(r.getDouble(1) - expLoss) < 1e-6)
  }

  test("calibrationBins clips prob=1.0 into the last bin") {
    val df = Seq((0.05, 0), (0.95, 1), (1.0, 1)).toDF("p", "y")
    val bins = MetricsOps.calibrationBins(df, col("p"), col("y"), 10)
      .select("bin", "n").as[(Long, Long)].collect().toMap
    assert(bins === Map(0L -> 1L, 9L -> 2L))
  }

  test("meltedConfusion: one pass over stacked attributes matches per-attribute calls") {
    val df = Seq(
      ("m", "a", 1, 1), ("m", "b", 1, 0), ("f", "a", 0, 1), ("f", "b", 0, 0))
      .toDF("sex", "grp", "truth", "pred")
    val melted = MetricsOps.meltedConfusion(df, Seq("sex", "grp"), col("truth"), col("pred"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    Seq("sex", "grp").foreach { attr =>
      val single = MetricsOps.groupedConfusion(df, attr, col("truth"), col("pred"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      single.foreach { case (g, cells) =>
        assert(melted((attr, g)) === cells, s"$attr/$g")
      }
    }
  }

  test("psi is zero when baseline and current distributions are identical") {
    // every value appears once per segment → every bin has p == q
    val df = (1 to 100).flatMap(v => Seq((v.toDouble, 0L), (v.toDouble, 1L)))
      .toDF("score", "seg")
    val bins = MetricsOps.psi(df, col("score"), col("seg") === 0L, bins = 10)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(bins.length === 10)
    assert(bins.map(_._1).sorted.toSeq === (0 until 10))
    bins.foreach { case (_, p, q, c) => assert(p === q); assert(c === 0.0) }
    // smoothed shares sum to ~1 per segment
    assert(math.abs(bins.map(_._2).sum - 1.0) < 1e-9)
  }

  test("psi detects a shifted current distribution, empty bins stay finite") {
    val df = ((1 to 100).map(v => (v.toDouble, 0L)) ++
      (81 to 180).map(v => (v.toDouble, 1L))).toDF("score", "seg")
    val rows = MetricsOps.psi(df, col("score"), col("seg") === 1L, bins = 10)
      .collect().map(r => (r.getInt(0), r.getDouble(3)))
    assert(rows.length === 10)
    assert(rows.forall { case (_, c) => !c.isNaN && !c.isInfinite })
    assert(rows.map(_._2).sum > 0.5) // a 45%-range shift is a large drift
  }

  test("averagePrecision matches the hand-computed sklearn step value, ties grouped") {
    // descending thresholds: 0.9 (1 pos of 1) → P=1/1; 0.8 (1 pos of 2,
    // cum 2 pos of 3) → P=2/3; 0.7 (0 pos) contributes nothing; 0.6
    // (1 pos, cum 3 of 5) → P=3/5. AP = (1 + 2/3 + 3/5) / 3
    val df = Seq((0.9, 1), (0.8, 0), (0.8, 1), (0.7, 0), (0.6, 1))
      .toDF("score", "label")
    val ap = MetricsOps.averagePrecision(df, col("score"), col("label"))
      .as[Double].collect()(0)
    assert(math.abs(ap - (1.0 + 2.0 / 3.0 + 3.0 / 5.0) / 3.0) < 1e-6)
  }

  test("averagePrecision is 1.0 when every positive outranks every negative") {
    val df = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("score", "label")
    val ap = MetricsOps.averagePrecision(df, col("score"), col("label"))
      .as[Double].collect()(0)
    assert(ap === 1.0)
  }

  test("ksStatistic: identical samples → 0, disjoint supports → 1, nulls ignored") {
    val same = Seq((1.0, 0L), (1.0, 1L), (2.0, 0L), (2.0, 1L))
      .toDF("value", "user_id")
    val ks0 = MetricsOps.ksStatistic(same, col("value"), col("user_id") % 2 === 0)
      .as[Double].collect()(0)
    assert(ks0 === 0.0)

    val disjoint = Seq((1.0, 0L), (2.0, 0L), (3.0, 1L), (4.0, 1L))
      .toDF("value", "user_id")
    val ks1 = MetricsOps.ksStatistic(disjoint, col("value"), col("user_id") % 2 === 0)
      .as[Double].collect()(0)
    assert(ks1 === 1.0)

    val withNull = Seq((Some(1.0), 0L), (Some(1.0), 1L), (None, 0L))
      .toDF("value", "user_id")
    val ksN = MetricsOps.ksStatistic(withNull, col("value"), col("user_id") % 2 === 0)
      .as[Double].collect()(0)
    assert(ksN === 0.0)
  }

  test("gainsTable: exact halves, rates and lift hand-checked") {
    // 4 rows, 2 buckets: top half by score = {0.9 (pos), 0.8 (neg)} →
    // rate 0.5; bottom half = {0.7 (pos), 0.6 (neg)} → rate 0.5;
    // base rate 0.5 → lift 1.0 in both buckets
    val df = Seq((0.9, 1, 1L), (0.8, 0, 2L), (0.7, 1, 3L), (0.6, 0, 4L))
      .toDF("score", "label", "id")
    val got = MetricsOps.gainsTable(df, col("score"), col("label"), col("id"), buckets = 2)
      .select("decile", "n", "n_pos", "pos_rate", "lift")
      .as[(Int, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((0, 2L, 1L, 0.5, 1.0), (1, 2L, 1L, 0.5, 1.0)))

    // concentrated positives: both in the top bucket → lift 2, bottom 0
    val skew = Seq((0.9, 1, 1L), (0.8, 1, 2L), (0.2, 0, 3L), (0.1, 0, 4L))
      .toDF("score", "label", "id")
    val g2 = MetricsOps.gainsTable(skew, col("score"), col("label"), col("id"), buckets = 2)
      .select("decile", "pos_rate", "lift").as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(g2.toSeq === Seq((0, 1.0, 2.0), (1, 0.0, 0.0)))
  }

  test("ksStatistic matches the hand-computed max CDF gap") {
    // A = {1, 1, 2}, B = {3, 4}: at v=2 F_A=1, F_B=0 → D = 1 is reached;
    // at v=1 the gap is 2/3 — max wins
    val df = Seq((1.0, 0L), (1.0, 2L), (2.0, 4L), (3.0, 1L), (4.0, 3L))
      .toDF("value", "user_id")
    val ks = MetricsOps.ksStatistic(df, col("value"), col("user_id") % 2 === 0)
      .as[Double].collect()(0)
    assert(ks === 1.0)
  }

  test("rocPoints: curve endpoints and a hand-checked interior point") {
    // scores desc: 4(+), 3.5(−), 3(+), 2(−), 1(−); P=2, N=3
    val df = Seq((4.0, 1), (3.5, 0), (3.0, 1), (2.0, 0), (1.0, 0))
      .toDF("score", "y")
    val pts = MetricsOps.rocPoints(df, col("score"), col("y"))
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(pts(4.0) === ((0.5, 0.0)))       // top threshold: 1 TP, 0 FP
    assert(pts(3.0) === ((1.0, 0.333333)))  // 2 TP, 1 FP
    assert(pts(1.0) === ((1.0, 1.0)))       // lowest threshold admits all
    // tpr and fpr are monotonically non-decreasing as the threshold drops
    val ordered = pts.toSeq.sortBy(-_._1).map(_._2)
    assert(ordered.sliding(2).forall { case Seq((t1, f1), (t2, f2)) =>
      t2 >= t1 && f2 >= f1 })
  }

  test("giniIndex: 0 for perfect equality, → 1 as one holder takes all") {
    val equal = (1L to 10L).map(i => (5L, i)).toDF("x", "id")
    val gEq = MetricsOps.giniIndex(equal, col("x"), col("id")).collect()(0)
    assert(gEq.getLong(0) === 10L)
    assert(gEq.getLong(1) === 50L)
    assert(gEq.getDouble(2) === 0.0)

    // 9 holders of 0 and one of 100 → G = (n-1)/n = 0.9
    val skew = ((1L to 9L).map(i => (0L, i)) :+ (100L, 10L)).toDF("x", "id")
    val gSk = MetricsOps.giniIndex(skew, col("x"), col("id")).collect()(0)
    assert(gSk.getDouble(2) === 0.9)
  }

  test("giniIndex matches the hand-computed value and ignores input order") {
    // sorted x = [1,2,3,4]: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    val df = Seq((3L, 1L), (1L, 2L), (4L, 3L), (2L, 4L)).toDF("x", "id")
    val g1 = MetricsOps.giniIndex(df, col("x"), col("id")).collect()(0).getDouble(2)
    val g2 = MetricsOps.giniIndex(df.repartition(5), col("x"), col("id"))
      .collect()(0).getDouble(2)
    assert(g1 === 0.25)
    assert(g2 === 0.25)
  }

  test("benfordDigits: leading digit from any magnitude, sign/zero/null ignored") {
    val df = Seq(Some(123.4), Some(0.0042), Some(-950.0), Some(1.0e7),
      Some(0.0), None).toDF("v")
    val got = MetricsOps.benfordDigits(df, col("v"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // digits: 1 (123.4), 4 (0.0042), 9 (-950), 1 (1e7 → '1.0E7'); 0/null dropped
    assert(got === Map(1 -> 2L, 4 -> 1L, 9 -> 1L))
  }

  test("benfordDigits shares and chi2 on a perfectly conforming single digit") {
    // all values lead with 1 → obs_share 1, exp log10(2), chi2 > 0
    val df = Seq(1.0, 10.0, 19.9, 100.0).toDF("v")
    val r = MetricsOps.benfordDigits(df, col("v")).collect()(0)
    assert(r.getInt(0) === 1)
    assert(r.getDouble(2) === 1.0)
    assert(math.abs(r.getDouble(3) - 0.30103) < 1e-6)
    assert(r.getDouble(4) > 0.0)
  }
}
