package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact ranking — global `row_number`-style ids without ever
  * funneling the frame through one task.
  *
  * The classic `Window.orderBy(...)` (no partition) plan inserts an
  * `Exchange SinglePartition`, which is a non-starter for unbounded frames
  * (a billion-row prediction table, a corpus-scale vocabulary). The
  * two-phase form here is the standard alternative:
  *
  *   1. `repartitionByRange` on the sort key — range buckets are globally
  *      ordered by construction, each ~n/P rows;
  *   2. a per-bucket `row_number` window (keyed on the bucket id, so the
  *      window shuffle is P-way, never 1-way);
  *   3. per-bucket row counts (≤ P rows, P = shuffle partitions) turned
  *      into prefix offsets with a tiny triangular self-join — NOT a
  *      single-partition window, so the whole plan stays exchange-parallel;
  *   4. global rank = bucket offset + local rank.
  *
  * The range-bucketed frame is pinned with a lazy localCheckpoint (see
  * [[RankOps.pinnedRangeBuckets]]) so the count branch and the window
  * branch provably see the SAME bucketing and the input is shuffled once.
  */
object RankOps {

  /** Exact global 1-based row_number over `sortCols` (must be a total order
    * for deterministic output), assigned without a single-partition
    * exchange. Adds `outName` (long) to the frame.
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column], outName: String): DataFrame = {
    val ranged = pinnedRangeBuckets(df, sortCols)
    val w = Window.partitionBy(col("__gr_pid")).orderBy(sortCols: _*)
    val local = ranged.withColumn("__gr_lrn", row_number().over(w).cast("long"))
    local.join(bucketOffsets(ranged), Seq("__gr_pid"))
      .withColumn(outName, col("__gr_lrn") + col("__gr_off"))
      .drop("__gr_pid", "__gr_lrn", "__gr_off")
  }

  /** Range-bucket the frame on `sortCols` and PIN the bucketing with a lazy
    * localCheckpoint. `repartitionByRange` samples fresh range boundaries on
    * every execution, and the bucketed frame always has two consumers here
    * (the window branch and the offsets branch); if each triggered its own
    * execution, local ranks from one sampling would combine with offsets
    * from another — wrong, nondeterministic output. ReusedExchange usually
    * collapses the two executions into one, but it is an optimization, not
    * a contract (exactly this broke `aurocRankSum` before it pinned);
    * the checkpoint makes single-execution semantics explicit.
    */
  private[operators] def pinnedRangeBuckets(df: DataFrame, sortCols: Seq[Column]): DataFrame =
    df.repartitionByRange(sortCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .localCheckpoint(false)

  /** (__gr_pid, __gr_off): rows preceding each range bucket. The counts
    * frame is bounded by the shuffle-partition count, so the triangular
    * join is O(P²) tiny and fully distributed.
    */
  private[operators] def bucketOffsets(ranged: DataFrame): DataFrame =
    bucketOffsetsOf(ranged, count(lit(1)).as("__gr_n"))

  /** Generalization: prefix offsets of an arbitrary per-bucket aggregate
    * (row counts for ranking, value sums for prefix sums). Same bounded
    * triangular join, same exchange-parallel plan.
    */
  private[operators] def bucketOffsetsOf(ranged: DataFrame, perBucket: Column): DataFrame = {
    val counts = ranged.groupBy(col("__gr_pid")).agg(perBucket.as("__gr_n"))
    counts.alias("a")
      .join(counts.alias("b"), col("b.__gr_pid") < col("a.__gr_pid"), "left")
      .groupBy(col("a.__gr_pid").as("__gr_pid"))
      .agg(coalesce(sum(col("b.__gr_n")), lit(0L)).as("__gr_off"))
  }

  /** Exact global running sum of `value` in `sortCols` order (a total order
    * for deterministic output), without a single-partition exchange — the
    * same two-phase scheme as [[globalRowNumber]] with sums in place of
    * counts. Adds `outName` = sum of `value` over all rows at-or-before the
    * current row. The bucketing is checkpoint-pinned so the window branch
    * and the per-bucket totals see one execution.
    */
  def globalCumsum(df: DataFrame, sortCols: Seq[Column], value: Column,
      outName: String): DataFrame =
    globalCumsums(df, sortCols, Seq(value -> outName))

  /** Multi-value variant of [[globalCumsum]]: N running sums over the SAME
    * sort order share one range shuffle, one pinned bucketing, and one
    * per-bucket window pass — a caller needing cumulative TP and cumulative
    * N (PR curves, CDF pairs) pays exactly the single-cumsum plan cost.
    */
  def globalCumsums(df: DataFrame, sortCols: Seq[Column],
      values: Seq[(Column, String)]): DataFrame = {
    val ranged = pinnedRangeBuckets(df, sortCols)
    val w = Window.partitionBy(col("__gr_pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = values.foldLeft(ranged) { case (acc, (v, name)) =>
      acc.withColumn(s"__gr_lcs_$name", sum(v).over(w))
    }
    // one triangular pass produces every column's prefix offset
    val perBucket = ranged.groupBy(col("__gr_pid")).agg(
      sum(values.head._1).as(s"__gr_n_${values.head._2}"),
      values.tail.map { case (v, name) => sum(v).as(s"__gr_n_$name") }: _*)
    val offs = perBucket.alias("a")
      .join(perBucket.alias("b"), col("b.__gr_pid") < col("a.__gr_pid"), "left")
      .groupBy(col("a.__gr_pid").as("__gr_pid"))
      .agg(
        coalesce(sum(col(s"b.__gr_n_${values.head._2}")), lit(0L))
          .as(s"__gr_off_${values.head._2}"),
        values.tail.map { case (_, name) =>
          coalesce(sum(col(s"b.__gr_n_$name")), lit(0L)).as(s"__gr_off_$name")
        }: _*)
    values.foldLeft(local.join(offs, Seq("__gr_pid"))) { case (acc, (_, name)) =>
      acc.withColumn(name, col(s"__gr_lcs_$name") + col(s"__gr_off_$name"))
        .drop(s"__gr_lcs_$name", s"__gr_off_$name")
    }.drop("__gr_pid")
  }

  /** Dense vocabulary encoding (SURVEY F23): 1-based contiguous ids over the
    * distinct values of `valueCol` in ascending order — `dense_rank` over
    * the vocabulary, computed distributively (the distinct-value frame at
    * corpus scale does not fit one task).
    */
  def vocabIds(df: DataFrame, valueCol: String, idName: String): DataFrame =
    globalRowNumber(df.select(valueCol).distinct(), Seq(col(valueCol).asc), idName)

  /** Exact global percent_rank of `valueCol` — RANK-tie semantics,
    * (rank − 1)/(N − 1), matching SQL `PERCENT_RANK() OVER (ORDER BY v)` —
    * without a single-partition exchange. rank(v) = (# rows < v) + 1 falls
    * out of the two-phase cumsum over the DISTINCT-value counts frame (|v|
    * rows, unbounded at corpus scale, hence ranked distributively); rows
    * then re-join their value's rank — the fact table is never sorted
    * globally. Single-row frames get percent_rank 0 (the SQL convention).
    */
  def globalPercentRank(df: DataFrame, valueCol: String, outName: String): DataFrame = {
    // cached: two consumers (the cumsum machinery and the N scalar) — one
    // distinct-value aggregation, not two. N summed off `counts`, NOT off
    // `cum`: the latter re-executes the whole window+offsets branch a
    // second time just to add up a column the counts aggregate already
    // carries
    val counts = df.groupBy(col(valueCol)).agg(count(lit(1)).as("__pr_c"))
      .localCheckpoint(false)
    val cum = globalCumsum(counts, Seq(col(valueCol).asc), col("__pr_c"), "__pr_cum")
    val tot = counts.agg(sum(col("__pr_c")).as("__pr_n"))
    val ranked = cum.crossJoin(broadcast(tot))
      .select(col(valueCol).as("__pr_v"),
        when(col("__pr_n") > 1,
          (col("__pr_cum") - col("__pr_c")).cast("double") / (col("__pr_n") - 1))
          .otherwise(0.0).as(outName))
    // null-safe join: a null value is a legitimate rank group (sorted
    // first, the SQL NULLS FIRST convention `globalCumsum`'s asc order
    // already applies) — a plain equality join would silently drop null
    // rows from the output while still counting them in N.
    // shuffle_hash (§3.1): PINS the strategy the planner already picks
    // here (plans/r14/f24_*: ShuffledHashJoin either way) so a stats
    // estimate drift can never flip this into sorting the fact frame
    // (SMJ) or broadcasting a data-sized rank map. Build side = the
    // distinct-value map; a hot value splits under AQE skew join.
    df.join(ranked.hint("shuffle_hash"), col(valueCol) <=> col("__pr_v"))
      .drop("__pr_v")
  }

  /** Balanced range-partition split points — the boundary computation
    * behind range-partitioned writes and sort-merge bucketing at scale:
    * the (nBuckets − 1) exact type-7 quantiles of `value`, WITHOUT a
    * global sort. The rank frame comes from [[globalRowNumber]] (range
    * shuffle + per-bucket windows + bounded offset triangle); the
    * (2·(nBuckets−1))-row needed-rank frame broadcasts into one hash
    * equi-join, so the data-sized frame is touched exactly twice (rank,
    * probe) at any input size.
    *
    * Exactness: with h = (n−1)·i/B + 1 (type-7, 1-indexed), the rank
    * and remainder come from exact integer arithmetic; the close is
    * v_lo + (rem/B)·(v_hi − v_lo) — three IEEE ops on exact operands,
    * mirrored op-for-op by the oracle.
    */
  def rangeSplitPoints(df: DataFrame, value: Column,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "rangeSplitPoints: need at least 2 buckets")
    val b = nBuckets.toLong
    val rows = df.select(value.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val ranked = globalRowNumber(rows, Seq(col("__v").asc), "__rn")
    val n = rows.agg(count(lit(1)).as("__n"))
    val splits = n
      .select(explode(sequence(lit(1), lit(nBuckets - 1))).as("split_no"),
        col("__n"))
      .withColumn("__num", (col("__n") - 1) * col("split_no"))
      .withColumn("__rem", pmod(col("__num"), lit(b)))
      .withColumn("__lo", ((col("__num") - col("__rem")) / b).cast("long") + 1)
    val needed = splits
      .select(col("split_no"), col("__rem"), col("__lo").as("__rank"),
        lit(0).as("__hi"))
      .unionByName(splits.select(col("split_no"), col("__rem"),
        (col("__lo") + 1).as("__rank"), lit(1).as("__hi")))
    ranked.join(broadcast(needed), col("__rn") === col("__rank"))
      .groupBy(col("split_no"), col("__rem"))
      .agg(max(when(col("__hi") === 0, col("__v"))).as("__vlo"),
        max(when(col("__hi") === 1, col("__v"))).as("__vhi"))
      .select(col("split_no"),
        round(col("__vlo") + (col("__rem").cast("double") / lit(b.toDouble)) *
          (coalesce(col("__vhi"), col("__vlo")) - col("__vlo")), 6)
          .as("split"))
  }
}
