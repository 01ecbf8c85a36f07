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

  test("strict range-join readmission equals the lead(1) form on non-overlapping visits") {
    val epoch = Timestamp.valueOf("2020-01-01 00:00:00").getTime
    samples(visitsGen, 8).foreach { rows =>
      // dedupe (subject, day) then give every visit a 1-hour stay: distinct
      // days ⇒ disch_i < admit_{i+1}, the non-overlap precondition
      val vs = rows.groupBy(r => (r._1, r._3)).map(_._2.head).toList
      val df = vs.map { case (s, v, d) =>
        (s, v, new Timestamp(epoch + d * 86400000L),
          new Timestamp(epoch + d * 86400000L + 3600000L))
      }.toDF("subj", "visit", "admit", "disch")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("subj").orderBy(col("admit").asc, col("visit").asc)
      val leadForm = df
        .withColumn("__n", lead(col("admit"), 1).over(w))
        .withColumn("label",
          when(col("__n").isNotNull &&
            col("__n") <= col("disch") + expr("INTERVAL 30 DAYS"), 1).otherwise(0))
        .select("visit", "label").as[(Long, Int)].collect().toMap
      val rangeForm = CohortOps.nextWithinGapLabelRange(df,
          "subj", "admit", "disch", "visit", expr("INTERVAL 30 DAYS"), "label")
        .select("visit", "label").as[(Long, Int)].collect().toMap
      assert(rangeForm === leadForm, s"forms diverge on $vs")
    }
  }

  test("asOfPointInInterval is invariant under input repartitioning") {
    val epoch = Timestamp.valueOf("2020-01-01 00:00:00").getTime
    val pointsGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 20)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 4L)
        h <- Gen.choose(0L, 200L)
      } yield (u, h))
    } yield rows // duplicates allowed on purpose
    samples(pointsGen, 6).foreach { rows =>
      val points = rows.map { case (u, h) =>
        (u, new Timestamp(epoch + h * 3600000L))
      }.toDF("user", "t")
      val intervals = (1L to 4L).flatMap(u => Seq(0L, 48L, 96L).map(s =>
        (u, new Timestamp(epoch + s * 3600000L),
          new Timestamp(epoch + (s + 72L) * 3600000L)))) // overlapping windows
        .toDF("user", "lo", "hi")
      def run(p: org.apache.spark.sql.DataFrame, iv: org.apache.spark.sql.DataFrame) =
        JoinOps.asOfPointInInterval(p, iv, "user", "t", "lo", "hi", "asof")
          .select("user", "t", "asof").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2))))
          .sortBy(x => (x._1, x._2.getTime, x._3.map(_.getTime).getOrElse(-1L)))
          .toSeq
      val base = run(points, intervals)
      assert(base.length === rows.length, "one output row per input point row")
      assert(run(points.repartition(7), intervals.repartition(3)) === base)
      assert(run(points.coalesce(1), intervals.repartition(5, col("user"))) === base)
    }
  }

  test("RankOps.globalRowNumber equals a single-partition row_number") {
    val gen: Gen[List[(Double, Long)]] = for {
      n <- Gen.choose(1, 60)
      scores <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
    } yield scores.zipWithIndex.map { case (s, i) => (s, i.toLong) } // tie col unique
    samples(gen, 6).foreach { rows =>
      val df = rows.toDF("s", "t")
      val got = RankOps.globalRowNumber(df, Seq(col("s").asc, col("t").asc), "rn")
        .select("s", "t", "rn").as[(Double, Long, Long)].collect()
        .map { case (s, t, r) => (s, t) -> r }.toMap
      val expected = rows.sortBy(identity).zipWithIndex
        .map { case (k, i) => k -> (i + 1L) }.toMap
      assert(got === expected, s"ranks diverge on $rows")
      // repartitioning must not change the assignment
      val again = RankOps.globalRowNumber(df.repartition(5),
          Seq(col("s").asc, col("t").asc), "rn")
        .select("s", "t", "rn").as[(Double, Long, Long)].collect()
        .map { case (s, t, r) => (s, t) -> r }.toMap
      assert(again === expected)
    }
  }

  test("RankOps.globalPercentRank equals the builtin percent_rank, with ties") {
    val gen: Gen[List[Int]] = Gen.nonEmptyListOf(Gen.choose(0, 15)) // dense → many ties
    samples(gen, 6).foreach { vals =>
      val rows = vals.zipWithIndex.map { case (v, i) => (v.toDouble, i.toLong) }
      val df = rows.toDF("v", "id")
      val got = RankOps.globalPercentRank(df, "v", "pr")
        .select("id", "pr").as[(Long, Double)].collect().toMap
      val expected = df
        .withColumn("pr", org.apache.spark.sql.functions.percent_rank()
          .over(org.apache.spark.sql.expressions.Window.orderBy(col("v"))))
        .select("id", "pr").as[(Long, Double)].collect().toMap
      assert(got.keySet === expected.keySet)
      got.foreach { case (id, pr) =>
        assert(math.abs(pr - expected(id)) < 1e-12, s"id=$id on $vals")
      }
      // stable under repartitioning
      val again = RankOps.globalPercentRank(df.repartition(5), "v", "pr")
        .select("id", "pr").as[(Long, Double)].collect().toMap
      assert(again === got)
    }
  }

  test("RankOps.globalCumsums: two columns in one pass equal two globalCumsum calls") {
    val gen: Gen[List[(Int, Int)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 50), Gen.choose(0, 9)))
    samples(gen, 6).foreach { rows =>
      val keyed = rows.zipWithIndex.map { case ((a, b), i) => (i.toLong, a.toLong, b.toLong) }
      val df = keyed.toDF("k", "a", "b")
      val fused = RankOps.globalCumsums(df.repartition(5), Seq(col("k").asc),
          Seq(col("a") -> "ca", col("b") -> "cb"))
        .select("k", "ca", "cb").as[(Long, Long, Long)].collect().toList.sorted
      // sequential reference scan
      val (expected, _, _) = keyed.sortBy(_._1)
        .foldLeft((List.empty[(Long, Long, Long)], 0L, 0L)) {
          case ((acc, sa, sb), (k, a, b)) => ((k, sa + a, sb + b) :: acc, sa + a, sb + b)
        }
      assert(fused === expected.reverse, s"fused cumsums diverge on $rows")
    }
  }

  test("mergeIntervals equals a sequential sweep reference on random interval sets") {
    val gen: Gen[List[(String, Long, Long)]] = for {
      n <- Gen.choose(1, 40)
      xs <- Gen.listOfN(n,
        Gen.zip(Gen.choose(0L, 60L), Gen.choose(1L, 25L), Gen.choose(0, 2)))
    } yield xs.map { case (s, len, k) => (s"k$k", s, s + len) }
    samples(gen, 6).foreach { triples =>
      val rows = triples.zipWithIndex.map { case ((k, s, e), i) => (k, s, e, i.toLong) }
      val df = rows.toDF("k", "s", "e", "id")
      val got = TimeSeriesOps.mergeIntervals(df.repartition(5), Seq("k"),
          col("s"), col("e"), col("id"))
        .select("k", "span_start", "span_end", "n_merged")
        .as[(String, Long, Long, Long)].collect().toSet
      val expected = rows.groupBy(_._1).flatMap { case (k, ivs) =>
        val sorted = ivs.map(t => (t._2, t._3)).sorted
        val islands = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
        for ((s, e) <- sorted) islands.lastOption match {
          case Some((is, ie, n)) if s <= ie =>
            islands.update(islands.size - 1, (is, math.max(ie, e), n + 1))
          case _ => islands += ((s, e, 1L))
        }
        islands.map { case (is, ie, n) => (k, is, ie, n) }
      }.toSet
      assert(got === expected, s"islands diverge on $triples")
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

  test("groupOls matches a direct per-group computation on random integer data") {
    val gen: Gen[List[(String, Long, Long)]] = for {
      n <- Gen.choose(4, 24)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        x <- Gen.choose(0L, 500L)
        y <- Gen.choose(-1000L, 1000L)
      } yield (g, x, y))
    } yield rows
    samples(gen, 6).foreach { rows =>
      val got = RegressionOps.groupOls(rows.toDF("g", "x", "y"), "g", col("x"), col("y"))
        .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val n = rs.size.toDouble
        val (sx, sy) = (rs.map(_._2).sum.toDouble, rs.map(_._3).sum.toDouble)
        val sxx = rs.map(r => r._2 * r._2).sum.toDouble
        val sxy = rs.map(r => r._2 * r._3).sum.toDouble
        val den = n * sxx - sx * sx
        if (rs.size >= 2 && den != 0.0) {
          val slope = (n * sxy - sx * sy) / den
          assert(math.abs(got(g)._1 - slope) < 1e-6, s"slope group $g of $rows")
          assert(math.abs(got(g)._2 - (sy - slope * sx) / n) < 1e-6)
        } else assert(!got.contains(g))
      }
    }
  }

  test("quantileNormalize is total and closed over the bucket profile") {
    val gen: Gen[List[(String, Long)]] = for {
      n <- Gen.choose(3, 30)
      rows <- Gen.listOfN(n, for {
        s <- Gen.oneOf("s1", "s2", "s3")
        v <- Gen.choose(0L, 100L)
      } yield (s, v))
    } yield rows
    samples(gen, 6).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((s, v), i) => (s, i.toLong, v) }
        .toDF("src", "id", "v")
      val out = RegressionOps.quantileNormalize(df, "src", col("v"), col("id"), 4)
        .collect()
      assert(out.length === rows.length)                    // no row lost or duplicated
      val profile = out.map(r => r.getInt(3) -> r.getDouble(4)).toMap
      out.foreach { r =>
        assert(r.getInt(3) >= 0 && r.getInt(3) < 4)
        assert(r.getDouble(4) === profile(r.getInt(3)))     // one value per stratum
      }
    }
  }

  test("pageRank mass conservation and teleport floor on random graphs") {
    val gen: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(3, 25)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0L, 6L)
        t <- Gen.choose(0L, 6L)
        w <- Gen.choose(1L, 5L)
      } yield (s, t, w))
    } yield rows
    samples(gen, 5).foreach { rows =>
      val r = GraphOps.pageRank(rows.toDF("s", "t", "w"), "s", "t", "w", 6, 0.85)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      val nodes = (rows.map(_._1) ++ rows.map(_._2)).distinct.size
      assert(r.size === nodes)
      assert(math.abs(r.values.sum - 1.0) < nodes * 5e-7 + 1e-6, s"mass on $rows")
      // every node keeps at least the teleport share
      r.values.foreach(v => assert(v >= (1.0 - 0.85) / nodes - 1e-6))
    }
  }

  test("timeWeightedAvg stays inside the observed value envelope") {
    val gen: Gen[List[(Long, Long, Double)]] = for {
      n <- Gen.choose(2, 20)
      rows <- Gen.listOfN(n, for {
        t <- Gen.choose(0L, 10000L)
        v <- Gen.choose(-100.0, 100.0)
      } yield (t, v))
    } yield rows.zipWithIndex.map { case ((t, v), i) => (t, i.toLong, v) }
    samples(gen, 6).foreach { rows =>
      val df = rows.map { case (t, i, v) =>
        ("u", new Timestamp(t * 1000L), i, v) }.toDF("k", "t", "id", "v")
      TimeSeriesOps.timeWeightedAvg(df, "k", "t", "id", col("v")).collect()
        .foreach { r =>
          val (lo, hi) = (rows.map(_._3).min, rows.map(_._3).max)
          // quantization moves the mean by < 1e-6 per observation
          assert(r.getDouble(2) >= lo - 1e-5 && r.getDouble(2) <= hi + 1e-5,
            s"twa outside envelope for $rows")
        }
    }
  }

  test("mannWhitney antisymmetry: swapping the groups negates z, mirrors U") {
    val gen: Gen[List[(Double, String)]] = for {
      na <- Gen.choose(3, 15); nb <- Gen.choose(3, 15)
      a <- Gen.listOfN(na, Gen.choose(0, 20))
      b <- Gen.listOfN(nb, Gen.choose(0, 20))
    } yield a.map(v => (v.toDouble, "A")) ++ b.map(v => (v.toDouble, "B"))
    samples(gen, 6).foreach { rows =>
      val df = rows.toDF("v", "g")
      val f = RegressionOps.mannWhitney(df, col("v"), col("g"), "A", "B").collect()(0)
      val r = RegressionOps.mannWhitney(df, col("v"), col("g"), "B", "A").collect()(0)
      val (na, nb) = (f.getLong(0), f.getLong(1))
      // U_A + U_B = nA·nB, and z flips sign exactly
      assert(f.getDouble(2) + r.getDouble(2) === na.toDouble * nb,
        s"U antisymmetry broke for $rows")
      assert(math.abs(f.getDouble(3) + r.getDouble(3)) < 2e-6,
        s"z antisymmetry broke for $rows")
    }
  }

  test("wilcoxonSignedRank sign flip negates z, W+ + W- = n(n+1)/2") {
    val gen: Gen[List[Long]] = for {
      n <- Gen.choose(4, 20)
      ds <- Gen.listOfN(n, Gen.choose(-9L, 9L))
    } yield ds
    samples(gen, 6).foreach { ds =>
      val df = ds.toDF("d")
      val f = RegressionOps.wilcoxonSignedRank(df, col("d")).collect()(0)
      val r = RegressionOps.wilcoxonSignedRank(df, -col("d")).collect()(0)
      val n = f.getLong(0)
      assert(f.getDouble(1) + r.getDouble(1) === n.toDouble * (n + 1) / 2,
        s"rank-sum partition broke for $ds")
      if (!f.isNullAt(2) && !r.isNullAt(2))
        assert(math.abs(f.getDouble(2) + r.getDouble(2)) < 2e-6,
          s"z antisymmetry broke for $ds")
    }
  }

  test("rollingMedian stays inside the trailing-window envelope") {
    val gen: Gen[List[Double]] = for {
      n <- Gen.choose(1, 25)
      vs <- Gen.listOfN(n, Gen.choose(-50.0, 50.0))
    } yield vs
    samples(gen, 6).foreach { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (1, i, v) }
      val out = WindowOps.rollingMedian(rows.toDF("u", "t", "v"),
          Seq("u"), Seq("t"), col("v"), k = 4, "m")
        .orderBy("t").collect().map(_.getDouble(3))
      out.zipWithIndex.foreach { case (m, i) =>
        val win = vs.slice(math.max(0, i - 3), i + 1)
        assert(m >= win.min - 1e-9 && m <= win.max + 1e-9,
          s"median escaped its window at $i for $vs")
      }
    }
  }

  test("zValue2 round-trips: de-interleaving recovers both coordinates") {
    val gen: Gen[(Long, Long)] = for {
      x <- Gen.choose(0L, 2147483647L); y <- Gen.choose(0L, 2147483647L)
    } yield (x, y)
    val pts = samples(gen, 24)
    val zs = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.ZOrder.zValue2(col("x"), col("y")).as("z"))
      .collect()
    zs.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var (rx, ry) = (0L, 0L)
      var i = 0
      while (i < 31) {
        rx |= ((z >> (2 * i)) & 1L) << i
        ry |= ((z >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      assert(rx === x && ry === y, s"z round-trip broke for ($x, $y)")
    }
  }

  test("temporalSplit: train prefix is closed under time order, sizes add up") {
    val gen: Gen[List[(Int, Int)]] = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1, 4); t <- Gen.choose(0, 1000)
      } yield (u, t))
    } yield rows.distinct
    samples(gen, 6).foreach { rows =>
      val out = FoldOps.temporalSplit(rows.toDF("u", "t"), Seq("u"),
          Seq(col("t")), 0.25)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
      out.groupBy(_._1).foreach { case (_, grp) =>
        val sorted = grp.sortBy(_._2)
        val nTrain = sorted.count(_._3 == "train")
        assert(nTrain === math.ceil(sorted.length * 0.75).toLong,
          s"split size broke for $rows")
        // no test row may precede a train row
        assert(sorted.map(_._3).dropWhile(_ == "train").forall(_ == "test"),
          s"split order broke for $rows")
      }
    }
  }

  test("bestChangepoint equals the brute-force argmax on random series") {
    val gen: Gen[List[Long]] = for {
      n <- Gen.choose(2, 15)
      vs <- Gen.listOfN(n, Gen.choose(0L, 9L))
    } yield vs
    samples(gen, 30).foreach { vs =>
      val rows = vs.zipWithIndex.map { case (v, t) => (1, t + 1, v) }
      val got = graft.operators.TimeSeriesOps
        .bestChangepoint(rows.toDF("u", "t", "v"), "u", col("t"), col("v"))
        .collect()(0)
      // brute: for each k compute the exact rational gain, compare by
      // cross-multiplication (no float), ties to the smaller k
      val n = vs.length.toLong
      val s = vs.sum
      var bestK = -1; var bestNum = BigInt(-1); var bestDen = BigInt(1)
      var s1 = 0L
      for (k <- 1 until vs.length) {
        s1 += vs(k - 1)
        val num = BigInt(s1) * (n - k) - BigInt(s - s1) * k
        val nn = num * num
        val dd = BigInt(k) * (n - k) * n
        if (bestK < 0 || nn * bestDen > bestNum * dd) {
          bestK = k; bestNum = nn; bestDen = dd
        }
      }
      assert(got.getInt(1) === bestK, s"series $vs")
      assert(got.getLong(2) === n)
    }
  }

  test("slidingDistinctCount equals brute-force w-day distinct on random activity") {
    val gen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 5L)
        d <- Gen.choose(0L, 30L)
      } yield (u, d))
    } yield rows
    samples(gen, 25).foreach { rows =>
      val got = graft.operators.TimeSeriesOps
        .slidingDistinctCount(rows.toDF("u", "d"), "u", col("d"), window = 7)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val days = rows.map(_._2)
      val brute = (days.min to days.max + 6).map { x =>
        x -> rows.filter { case (_, d) => d <= x && d >= x - 6 }
          .map(_._1).distinct.size.toLong
      }.filter(_._2 > 0).toMap
      assert(got === brute, s"rows $rows")
    }
  }

  test("scd2 intervals: consecutive states differ and intervals chain per key") {
    // mirror of the u12 construction on a tiny changelog
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "b"),
      (1L, 5L, "a"), (2L, 1L, "x")).map { case (u, t, st) => (u, t, st) }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("t"))
    val out = rows.toDF("u", "t", "state")
      .withColumn("__prev", lag(col("state"), 1).over(w))
      .filter(col("__prev").isNull || col("state") =!= col("__prev"))
      .withColumn("valid_from", col("t"))
      .withColumn("valid_to", lead(col("t"), 1).over(w))
      .select("u", "state", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .sortBy(r => (r._1, r._3))
    assert(out.toSeq === Seq(
      (1L, "a", 1L, Some(3L)), (1L, "b", 3L, Some(5L)),
      (1L, "a", 5L, None), (2L, "x", 1L, None)))
    // chaining: each interval's end equals the next interval's start
    out.groupBy(_._1).foreach { case (_, ivs) =>
      ivs.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3))
        case _ =>
      }
    }
  }
}
