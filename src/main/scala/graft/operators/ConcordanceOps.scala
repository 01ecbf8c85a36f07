package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact Harrell's concordance index (C-index) with right-censoring — the
  * survival-analysis companion to `a15_auroc` (the reference evaluates
  * AUROC/AUPRC in `evaluation.py`; the C-index is the same rank statistic
  * generalized to censored time-to-event labels, the standard headline
  * metric for clinical risk models).
  *
  * Definition (the classic permissible-pair form): over pairs (i, j) with
  * `t_i < t_j` and `event_i = 1`,
  * `C = (#[r_i > r_j] + 0.5·#[r_i = r_j]) / #pairs`.
  *
  * Exactness at scale without the O(n²) pair join:
  *   - pairs are partitioned by RISK-bucket relation under a range
  *     partitioning on the risk value (ties co-located, so bucket order
  *     implies strict risk order across buckets);
  *   - same-bucket concordant pairs: an in-memory sweep per bucket
  *     (descending time groups over a Fenwick tree of local risk ranks —
  *     O(m log m), state bounded by the bucket, i.e. ~n/P rows);
  *   - cross-bucket concordant pairs: for an event in bucket b at time t,
  *     every j in a lower bucket with `t_j > t` counts — evaluated from
  *     per-bucket cumulative time counts (ONE multi-column
  *     [[RankOps.globalCumsums]] pass over the distinct-time frame) and
  *     the ≤P-row bucket totals (the only driver-side collect);
  *   - permissible and risk-tied pair totals are window/aggregate
  *     arithmetic over distinct-time and (risk, time) frames.
  * Every count is an exact integer; the final division is the only float.
  */
object ConcordanceOps {

  /** Fenwick (binary-indexed) tree over 1..size: point add, prefix query. */
  private final class Bit(size: Int) {
    private val a = new Array[Long](size + 1)
    def add(i: Int): Unit = { var x = i; while (x <= size) { a(x) += 1; x += x & -x } }
    def query(i: Int): Long = { var x = i; var s = 0L; while (x > 0) { s += a(x); x -= x & -x }; s }
  }

  /** One output row: `(n, permissible, concordant, tied_risk, c_index)`. */
  def cIndex(df: DataFrame, time: Column, event: Column, risk: Column,
      parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (parts > 0) parts else spark.sessionState.conf.numShufflePartitions
    val rows = df.select(time.cast("long").as("__t"),
        event.cast("int").as("__e"), risk.cast("double").as("__r"))
      .filter(col("__t").isNotNull && col("__e").isNotNull && col("__r").isNotNull)
    // risk ties must share a bucket (cross-bucket order must imply STRICT
    // risk order), so the range key is the risk alone; pinned because the
    // local sweep, the per-bucket counts and the totals must see ONE
    // bucketing
    val ranged = rows.repartitionByRange(p, col("__r"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val nBuckets = ranged.rdd.getNumPartitions

    // ---- same-bucket concordant pairs: Fenwick sweep per bucket --------
    val localD = ranged.select("__t", "__e", "__r").mapPartitions { it =>
      val arr = it.toArray
      if (arr.length < 2) Iterator.single(0L)
      else {
        val byT = arr.sortBy(r => r.getLong(0))
        val risks = arr.map(_.getDouble(2)).distinct.sorted
        def rank(r: Double) = java.util.Arrays.binarySearch(risks, r) + 1
        val bit = new Bit(risks.length)
        var d = 0L
        var hi = byT.length - 1
        while (hi >= 0) {
          var lo = hi
          while (lo > 0 && byT(lo - 1).getLong(0) == byT(hi).getLong(0)) lo -= 1
          var k = lo
          while (k <= hi) { // query each event before inserting its t-group
            if (byT(k).getInt(1) == 1) d += bit.query(rank(byT(k).getDouble(2)) - 1)
            k += 1
          }
          k = lo
          while (k <= hi) { bit.add(rank(byT(k).getDouble(2))); k += 1 }
          hi = lo - 1
        }
        Iterator.single(d)
      }
    }(org.apache.spark.sql.Encoders.scalaLong).toDF("__d")
      .agg(sum("__d").as("__dlocal"))

    // ---- distinct-time frame with per-bucket cumulative (≤ t) counts ---
    val bucketCols = (0 until nBuckets).map(a =>
      sum(when(col("__pid") === a, 1L).otherwise(0L)).as(s"__c$a"))
    val tcounts = ranged.groupBy(col("__t"))
      .agg(count(lit(1)).as("__n"),
        (sum(col("__e").cast("long")).as("__nev") +: bucketCols): _*)
    val cums = RankOps.globalCumsums(tcounts, Seq(col("__t")),
      (col("__n") -> "__cumN") +:
        (0 until nBuckets).map(a => (col(s"__c$a"): Column) -> s"__F$a"))

    // ---- bucket totals (≤ P rows — the only driver-side collect) -------
    val totals = ranged.groupBy("__pid").agg(count(lit(1)).as("__bn"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefTot = (0 until nBuckets).scanLeft(0L)((acc, a) =>
      acc + totals.getOrElse(a, 0L)).init // prefTot(b) = Σ_{a<b} n_a
    val n = (0 until nBuckets).map(a => totals.getOrElse(a, 0L)).sum

    // ---- cross-bucket concordant + permissible from the cum frame ------
    val fArr = array((0 until nBuckets).map(a => col(s"__F$a")): _*)
    val prefArr = array(prefTot.map(lit(_)): _*)
    val evTimes = ranged.filter(col("__e") === 1)
      .groupBy(col("__t"), col("__pid")).agg(count(lit(1)).as("__ne"))
      .join(cums.select((col("__t") +: col("__cumN") +:
        (0 until nBuckets).map(a => col(s"__F$a"))): _*), Seq("__t"))
    val crossAndPerm = evTimes.select(
        (col("__ne") * (element_at(prefArr, col("__pid") + 1) -
          aggregate(slice(fArr, lit(1), col("__pid")), lit(0L), _ + _)))
          .as("__cross"),
        (col("__ne") * (lit(n) - col("__cumN"))).as("__perm"))
      .agg(sum("__cross").as("__dcross"), sum("__perm").as("__perm"))

    // ---- risk-tied permissible pairs: per-risk-group later-time counts -
    val rt = rows.groupBy(col("__r"), col("__t"))
      .agg(count(lit(1)).as("__n"), sum(col("__e").cast("long")).as("__nev"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__r")).orderBy(col("__t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("__r"))
    val tied = rt
      .withColumn("__cumLe", sum(col("__n")).over(wCum))
      .withColumn("__tot", sum(col("__n")).over(wAll))
      .select((col("__nev") * (col("__tot") - col("__cumLe"))).as("__tp"))
      .agg(sum("__tp").as("__tied"))

    localD.crossJoin(crossAndPerm).crossJoin(tied)
      .select(lit(n).as("n"),
        coalesce(col("__perm"), lit(0L)).as("permissible"),
        coalesce(col("__dlocal") + col("__dcross"), lit(0L)).as("concordant"),
        coalesce(col("__tied"), lit(0L)).as("tied_risk"),
        // null when no pair is permissible (C undefined, not 0)
        when(coalesce(col("__perm"), lit(0L)) > 0,
          round((col("__dlocal") + col("__dcross") +
            lit(0.5) * coalesce(col("__tied"), lit(0L))) /
            col("__perm"), 6)).as("c_index"))
  }
}
