package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Error-envelope gates for the approximate scale paths. These have no
  * cross-engine oracle by nature (sketch internals differ per engine), so
  * the contract asserted here is the one a 100 TB user relies on: the
  * sketch answer lands within its advertised error of the exact answer
  * computed on the same data.
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (1 to 20000)
    .map(i => (s"g${i % 4}", (i * 2654435761L % 997).toDouble, i % 1500))
    .toDF("g", "v", "k")

  test("approxDistinctCount lands within 3·rsd of the exact count per group") {
    val exact = df.groupBy("g").agg(countDistinct(col("k")).as("e"))
      .as[(String, Long)].collect().toMap
    val approx = SummaryOps.approxDistinctCount(df, "g", "k", rsd = 0.05)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (g, a) =>
      val e = exact(g)
      assert(math.abs(a - e) <= 3 * 0.05 * e + 1,
        s"group $g: approx $a vs exact $e out of envelope")
    }
  }

  test("approxPercentiles brackets the exact percentiles at high accuracy") {
    val probs = Seq(0.1, 0.5, 0.9)
    val approx = SummaryOps.approxPercentiles(df, "g", col("v"), probs)
      .as[(String, Seq[Double])].collect().toMap
    val exactRows = df.groupBy("g")
      .agg(expr("percentile(v, array(0.1, 0.5, 0.9))").as("p"))
      .as[(String, Seq[Double])].collect().toMap
    approx.foreach { case (g, ap) =>
      ap.zip(exactRows(g)).foreach { case (a, e) =>
        // rank error ≤ n/accuracy; with accuracy 10k over 5k rows the
        // returned value is an actual data point within a whisker of exact
        assert(math.abs(a - e) <= 25.0, s"group $g: approx $a vs exact $e")
      }
    }
  }

  test("approxHeavyHitters: guaranteed recall of items above the support threshold") {
    import spark.implicits._
    // skewed stream: "hot" is 40% of rows, "warm" 20%, the rest unique
    val rows = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 400).map(i => s"cold$i")
    val df = rows.toDF("tok").repartition(8)
    val found = SummaryOps.approxHeavyHitters(df, "tok", support = 0.1)
      .head().getSeq[String](0).toSet
    // no false negatives above support: both true heavy hitters present
    assert(found.contains("hot") && found.contains("warm"))
    // exact verification pass over just the candidates stays tiny
    val exact = df.filter(col("tok").isin(found.toSeq: _*))
      .groupBy("tok").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact("hot") === 400L && exact("warm") === 200L)
  }

  test("groupQuantilesApprox lands within rank error of the exact type-7 pair") {
    // drop-in schema: (key, q_lo, q_hi) both forms
    val exact = CleaningOps.groupQuantiles(df, "g", "v", 0.05, 0.95)
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val approx = CleaningOps.groupQuantilesApprox(df, "g", "v", 0.05, 0.95,
        accuracy = 10000)
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(approx.keySet === exact.keySet)
    // values are 0..996; rank error n/accuracy = 0.5 ranks at n = 5000 →
    // the sketch returns a data point within a whisker of the exact
    // interpolated bound (data-point vs interpolation gap ≤ 1 value step)
    approx.foreach { case (g, (alo, ahi)) =>
      val (elo, ehi) = exact(g)
      assert(math.abs(alo - elo) <= 5.0, s"$g q_lo: $alo vs $elo")
      assert(math.abs(ahi - ehi) <= 5.0, s"$g q_hi: $alo vs $ehi")
    }
  }

  test("approxProfile: exact fields match dq01's aggregates, sketch fields in envelope") {
    val lin = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val prof = SummaryOps.approxProfile(lin, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof.keySet === cols.toSet)
    cols.foreach { c =>
      val exact = lin.agg(
        count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("nn"),
        countDistinct(col(c)).as("d"),
        round(min(col(c)), 6).as("mn"),
        round(max(col(c)), 6).as("mx"),
        expr(s"percentile($c, 0.5)").as("p50")).head()
      val r = prof(c)
      assert(r.getLong(1) === exact.getLong(0)) // n exact
      assert(r.getLong(2) === exact.getLong(1)) // nulls exact
      val (ad, ed) = (r.getLong(3), exact.getLong(2))
      assert(math.abs(ad - ed) <= 3 * 0.05 * ed + 1, s"$c distinct: $ad vs $ed")
      assert(r.getDouble(4) === exact.getDouble(3)) // min exact
      assert(r.getDouble(5) === exact.getDouble(4)) // max exact
      val (ap, ep) = (r.getDouble(6), exact.getDouble(5))
      // p50 within a generous data whisker (sketch returns a data point)
      assert(math.abs(ap - ep) <= 0.05 * math.max(1.0, math.abs(ep)) +
        (if (c == "l_discount") 0.01 else 1.0), s"$c p50: $ap vs $ep")
    }
  }

  test("Count-Min estimates are one-sided and inside the epsilon envelope") {
    // zipf-ish key stream: key j appears ~20000/j times for j in 1..60
    val rows = (1 to 60).flatMap(j => Seq.fill(20000 / j)(s"k$j"))
    val keyed = rows.toDF("k")
    val n = rows.size.toLong
    val width = 1024
    val sketch = SummaryOps.countMinBuild(keyed, col("k"), depth = 4,
      width = width)
    // sketch size is bounded by depth*width no matter the key cardinality
    assert(sketch.count() <= 4L * width)
    val exact = keyed.groupBy("k").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val est = SummaryOps.countMinEstimate(sketch, keyed, col("k"),
      depth = 4, width = width)
      .as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (k, a) =>
      val e = exact(k)
      assert(a >= e, s"$k: CMS must never undercount ($a < $e)")
      assert(a - e <= 4.0 * n / width,
        s"$k: overcount ${a - e} beyond the 4N/width envelope")
    }
    // a key never inserted estimates within the same envelope of zero
    val ghost = SummaryOps.countMinEstimate(sketch,
      Seq("ghost").toDF("k"), col("k"), depth = 4, width = width)
      .as[(String, Long)].collect().head._2
    assert(ghost <= 4.0 * n / width)
  }
}
