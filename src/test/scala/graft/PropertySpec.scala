package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Property-based invariants (SURVEY.md §5) — guarantees the reference
  * states implicitly, checked over scalacheck-generated inputs. Generators
  * are sampled with fixed seeds (each case is a Spark job; a handful of
  * deterministic cases beats hundreds of flaky ones).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val visitsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 12)
    rows <- Gen.listOfN(n, for {
      subj <- Gen.choose(1L, 3L)
      day <- Gen.choose(0L, 120L)
    } yield (subj, day))
  } yield rows.zipWithIndex.map { case ((s, d), i) => (s, i.toLong, d) }

  test("readmission labels are a function of the visit set, not row order") {
    val epoch = Timestamp.valueOf("2020-01-01 00:00:00").getTime
    samples(visitsGen, 8).foreach { rows =>
      def labels(rs: List[(Long, Long, Long)]): Map[Long, Int] =
        CohortOps.nextWithinGapLabel(
            rs.map { case (s, v, d) => (s, v, new Timestamp(epoch + d * 86400000L)) }
              .toDF("subj", "visit", "admit"),
            "subj", "admit", "visit", expr("INTERVAL 30 DAYS"), "label")
          .select("visit", "label").as[(Long, Int)].collect().toMap
      val base = labels(rows)
      assert(labels(rows.reverse) === base)
      // the last visit per subject (ties broken like the operator: by visit
      // id) is always a control
      rows.groupBy(_._1).values.map(_.maxBy(r => (r._3, r._2))).foreach { r =>
        assert(base(r._2) === 0, s"last visit ${r._2} of ${rows} labeled 1")
      }
    }
  }

  private val seriesGen: Gen[List[(Long, Option[Double])]] = for {
    n <- Gen.choose(1, 15)
    vs <- Gen.listOfN(n, Gen.option(Gen.choose(-100.0, 100.0)))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  test("forwardFill matches a sequential reference scan") {
    samples(seriesGen, 8).foreach { rows =>
      val df = rows.map { case (b, v) => ("k", b, v) }.toDF("k", "b", "v")
      val got = WindowOps.forwardFill(df, Seq("k"), Seq("b"), col("v"), "ff")
        .select("b", "ff").as[(Long, Option[Double])].collect().toMap
      var last: Option[Double] = None
      rows.foreach { case (b, v) =>
        if (v.isDefined) last = v
        assert(got(b) === last)
      }
    }
  }

  private val valuesGen: Gen[List[Double]] =
    Gen.choose(2, 40).flatMap(n => Gen.listOfN(n, Gen.choose(-1000.0, 1000.0)))

  test("percentileClamp preserves row count and bounds to exact percentiles") {
    samples(valuesGen, 8).foreach { vs =>
      val got = CleaningOps.percentileClamp(vs.map(("g", _)).toDF("g", "v"),
          "g", "v", 0.1, 0.9)
        .select("v").as[Double].collect()
      assert(got.length === vs.length)
      val sorted = vs.sorted
      def pct(p: Double): Double = { // type-7 linear interpolation, as numpy
        val h = (sorted.size - 1) * p
        val lo = math.floor(h).toInt
        sorted(lo) + (h - lo) * (sorted(math.ceil(h).toInt) - sorted(lo))
      }
      got.foreach { v =>
        assert(v >= pct(0.1) - 1e-9 && v <= pct(0.9) + 1e-9)
      }
    }
  }

  test("bucketize: every offset lands in its half-open bucket") {
    val gen = for {
      offs <- Gen.nonEmptyListOf(Gen.choose(0.0, 500.0))
      w <- Gen.choose(1, 24)
    } yield (offs, w)
    samples(gen, 8).foreach { case (offs, w) =>
      TimeSeriesOps.bucketize(offs.map(Tuple1(_)).toDF("off"),
          col("off"), lit(w.toDouble), "b")
        .select("off", "b").as[(Double, Long)].collect()
        .foreach { case (off, b) =>
          assert(b * w <= off && off < (b + 1) * w)
        }
    }
  }

  test("fold assignment is total, stable, and within [0, k)") {
    val gen = for {
      ids <- Gen.nonEmptyListOf(Gen.choose(0L, 1000000L))
      k <- Gen.choose(2, 10)
    } yield (ids, k)
    samples(gen, 8).foreach { case (ids, k) =>
      val df = ids.map(Tuple1(_)).toDF("id")
      val got = FoldOps.assignFolds(df, "id", k).select("id", "fold")
        .as[(Long, Int)].collect()
      assert(got.length === ids.length)
      got.foreach { case (_, f) => assert(f >= 0 && f < k) }
      val again = FoldOps.assignFolds(df, "id", k).select("id", "fold")
        .as[(Long, Int)].collect().toMap
      got.foreach { case (id, f) => assert(again(id) === f) }
    }
  }
}
