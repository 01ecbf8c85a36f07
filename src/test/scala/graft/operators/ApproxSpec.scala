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
}
