package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WindowTimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val series = Seq(
    // (key, bucket, value) — leading null, gap, trailing null
    ("a", 0, None), ("a", 1, Some(10.0)), ("a", 2, None), ("a", 3, Some(30.0)), ("a", 4, None),
    ("b", 0, Some(1.0)), ("b", 1, None)
  ).toDF("k", "b", "v")

  test("forwardFill carries last observation, never before the first") {
    val got = WindowOps.forwardFill(series, Seq("k"), Seq("b"), col("v"), "ff")
      .select("k", "b", "ff").as[(String, Int, Option[Double])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", 0)).isEmpty) // reference ffill leaves leading nulls (data_generation_icu.py:484)
    assert(got(("a", 2)).contains(10.0))
    assert(got(("a", 4)).contains(30.0))
    assert(got(("b", 1)).contains(1.0))
  }

  test("backwardFill mirrors forwardFill") {
    val got = WindowOps.backwardFill(series, Seq("k"), Seq("b"), col("v"), "bf")
      .select("k", "b", "bf").as[(String, Int, Option[Double])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", 0)).contains(10.0))
    assert(got(("a", 4)).isEmpty) // trailing nulls stay (bfill then mean in the reference)
    assert(got(("b", 1)).isEmpty)
  }

  test("bucketize is floor of offset/width (half-open buckets)") {
    val df = Seq(0.0, 0.5, 0.99, 1.0, 1.99, 5.0).map(Tuple1(_)).toDF("off")
    val got = TimeSeriesOps.bucketize(df, col("off"), lit(1.0), "bucket")
      .select("bucket").as[Long].collect().toSeq
    assert(got === Seq(0L, 0L, 0L, 1L, 1L, 5L))
  }

  test("missingBuckets emits exactly the absent (entity, bucket) pairs") {
    val entities = Seq(Tuple1("s1"), Tuple1("s2")).toDF("id")
    val observed = Seq(("s1", 0L), ("s1", 2L)).toDF("id", "b")
    val got = TimeSeriesOps.missingBuckets(entities, "id", lit(3), observed, "b")
      .as[(String, Long)].collect().toSet
    assert(got === Set(("s1", 1L), ("s2", 0L), ("s2", 1L), ("s2", 2L)))
  }

  test("activeSignal: active strictly while ffilled stop > bucket") {
    // stop=2 observed at bucket 0 → active at buckets 0,1; NOT at 2 (half-open,
    // reference data_generation_icu.py:497-501 sign test)
    val df = Seq(("s", 0L, Some(2L)), ("s", 1L, None), ("s", 2L, None), ("s", 3L, None))
      .toDF("id", "b", "stop")
    val got = TimeSeriesOps.activeSignal(df, Seq("id"), "b", col("stop"), "act")
      .select("b", "act").as[(Long, Int)].collect().toMap
    assert(got === Map(0L -> 1, 1L -> 1, 2L -> 0, 3L -> 0))
  }

  test("quantileBin splits a group into balanced ntiles") {
    val df = (1 to 8).map(i => ("g", i)).toDF("g", "v")
    val got = WindowOps.quantileBin(df, Seq("g"), Seq("v"), 4, "q")
      .select("v", "q").as[(Int, Int)].collect().toMap
    assert(got === Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 2, 5 -> 3, 6 -> 3, 7 -> 4, 8 -> 4))
  }

  test("runLengthIntervals collapses runs into chained [from, to) intervals") {
    // user u: A(t1) A(t2) B(t3) A(t4) → runs (A,t1→t3,2) (B,t3→t4,1) (A,t4→∅,1)
    val df = Seq(("u", 1L, "A"), ("u", 2L, "A"), ("u", 3L, "B"), ("u", 4L, "A"),
      ("v", 9L, "Z")).toDF("user", "t", "typ")
    val got = WindowOps.runLengthIntervals(df, Seq("user"), Seq("t"),
        col("typ"), col("t"))
      .select("user", "value", "valid_from", "valid_to", "n_events")
      .as[(String, String, Long, Option[Long], Long)].collect().toSet
    assert(got === Set(
      ("u", "A", 1L, Some(3L), 2L),
      ("u", "B", 3L, Some(4L), 1L),
      ("u", "A", 4L, None, 1L),
      ("v", "Z", 9L, None, 1L)))
  }

  test("mergeIntervals: overlap, touch, nesting merge; gaps split; keys isolate") {
    // u: [1,5] ∪ [3,8] (overlap) ∪ [8,10] (touching) → island [1,10];
    //    [2,9] nested inside; [12,13] after a gap is its own island.
    // v: [1,2] alone — keys never mix.
    val rows = Seq(
      ("u", 1L, 5L, 1L), ("u", 3L, 8L, 2L), ("u", 8L, 10L, 3L),
      ("u", 2L, 9L, 4L), ("u", 12L, 13L, 5L),
      ("v", 1L, 2L, 6L))
      .toDF("k", "s", "e", "id")
    val got = TimeSeriesOps.mergeIntervals(rows, Seq("k"), col("s"), col("e"), col("id"))
      .select("k", "span_start", "span_end", "n_merged")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("u", 1L, 10L, 4L),
      ("u", 12L, 13L, 1L),
      ("v", 1L, 2L, 1L)))
    // island structure is a function of the interval set, not input order
    val shuffled = TimeSeriesOps.mergeIntervals(
        rows.orderBy(col("id").desc).repartition(5), Seq("k"),
        col("s"), col("e"), col("id"))
      .select("k", "span_start", "span_end", "n_merged")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(shuffled === got)
  }

  test("transitionCounts: successor pairs per key, last event dropped") {
    // u: a→b→a→c ; v: b→b — final events have no successor
    val df = Seq(
      ("u", 1L, 1L, "a"), ("u", 2L, 2L, "b"), ("u", 3L, 3L, "a"), ("u", 4L, 4L, "c"),
      ("v", 1L, 5L, "b"), ("v", 2L, 6L, "b"))
      .toDF("k", "t", "id", "st")
    val got = TimeSeriesOps.transitionCounts(df, "k", "t", "id", "st")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("a", "b", 1L), ("b", "a", 1L), ("a", "c", 1L), ("b", "b", 1L)))
  }

  test("transitionCounts: tie column orders simultaneous events deterministically") {
    val df = Seq(("u", 1L, 2L, "b"), ("u", 1L, 1L, "a"), ("u", 2L, 3L, "c"))
      .toDF("k", "t", "id", "st")
    val got = TimeSeriesOps.transitionCounts(df, "k", "t", "id", "st")
      .as[(String, String, Long)].collect().toSet
    // same-t rows break by id: a(id1) → b(id2) → c
    assert(got === Set(("a", "b", 1L), ("b", "c", 1L)))
  }

  test("timeWeightedAvg weights each value by its holding interval") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // u: 10 held 2s, 20 held 8s → twa = (20 + 160) / 10 = 18; last obs free
    val df = Seq(
      ("u", ts(0), 1L, Some(10.0)), ("u", ts(2), 2L, Some(20.0)),
      ("u", ts(10), 3L, Some(99.0)))
      .toDF("k", "t", "id", "v")
    val r = TimeSeriesOps.timeWeightedAvg(df, "k", "t", "id", col("v")).collect()(0)
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 18.0)
  }

  test("timeWeightedAvg: null observations are invisible — interval bridges over them") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // the null at t=1 must not split 10's holding interval
    val df = Seq(
      ("u", ts(0), 1L, Some(10.0)), ("u", ts(1), 2L, None),
      ("u", ts(4), 3L, Some(30.0)), ("u", ts(8), 4L, Some(0.0)))
      .toDF("k", "t", "id", "v")
    val r = TimeSeriesOps.timeWeightedAvg(df, "k", "t", "id", col("v")).collect()(0)
    // 10 held 4s, 30 held 4s → (40 + 120) / 8 = 20
    assert(r.getLong(1) === 8L)
    assert(r.getDouble(2) === 20.0)
  }

  test("cusumPeaks finds the level-shift point of a step signal") {
    // u: 5,5,5 then 15,15,15 — deviations ±5; |cusum| peaks at the last
    // low observation (t=3): |S| = n·15 = 90 in v-units → score 90/36... in
    // exact integer micro units; score = |Σdev|/n = 15/6 = 2.5... /n → 0.416667
    val df = Seq(
      ("u", 1L, 1L, Some(5.0)), ("u", 2L, 2L, Some(5.0)), ("u", 3L, 3L, Some(5.0)),
      ("u", 4L, 4L, Some(15.0)), ("u", 5L, 5L, Some(15.0)), ("u", 6L, 6L, Some(15.0)))
      .toDF("k", "t", "id", "v")
    val r = TimeSeriesOps.cusumPeaks(df, "k", "t", "id", col("v")).collect()(0)
    assert(r.getLong(1) === 6L)
    assert(r.getLong(2) === 3L)          // peak at the boundary before the jump
    // peak |Σ(v-mean)| = 15 (three deviations of −5), score = 15/6²·6/6... :
    // |S|/(1e6·n·n) with S = 1e6·n·15 → 15/n = 2.5
    assert(r.getDouble(3) === 2.5)
  }

  test("cusumPeaks: constant signal scores zero at the first row") {
    val df = Seq(("u", 1L, 1L, Some(7.0)), ("u", 2L, 2L, Some(7.0)))
      .toDF("k", "t", "id", "v")
    val r = TimeSeriesOps.cusumPeaks(df, "k", "t", "id", col("v")).collect()(0)
    assert(r.getDouble(3) === 0.0)
    assert(r.getLong(2) === 1L)          // all-zero cusum ties break earliest
  }

  test("timeWeightedAvg drops keys with a single (or zero-span) observation") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val df = Seq(
      ("solo", ts(0), 1L, Some(5.0)),
      ("dup", ts(3), 2L, Some(1.0)), ("dup", ts(3), 3L, Some(2.0)))
      .toDF("k", "t", "id", "v")
    val keys = TimeSeriesOps.timeWeightedAvg(df, "k", "t", "id", col("v"))
      .select("k").as[String].collect().toSet
    assert(keys === Set.empty[String])
  }
}
