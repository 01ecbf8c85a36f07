package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series representation operators (SURVEY.md §3.3, §7.3) — the batch
  * analogue of the reference's `Generator` (`data_generation_icu.py`).
  *
  * The reference loops over stays in Python and pivots each one; here the
  * canonical form is ONE tall frame (entity, bucket, code, value) and every
  * step — bucketing, densification, imputation, pivot — is a distributed
  * transform. Per-entity output becomes `partitionBy(entity)` at write time,
  * never a driver loop.
  */
object TimeSeriesOps {

  /** Half-open fixed-width bucketing `[i·width, (i+1)·width)` of an offset
    * column (reference `data_generation_icu.py:302-305`, `floor` semantics
    * per SURVEY §2.10).
    */
  def bucketize(df: DataFrame, offset: Column, width: Column, name: String): DataFrame =
    df.withColumn(name, floor(offset / width).cast("long"))

  /** Tumbling-window aggregate on an event-time column — the batch twin of
    * `window(ts, "1 hour")`; used for the events-stream rollup.
    */
  def tumblingAgg(df: DataFrame, ts: Column, slide: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy((date_trunc(slide, ts) +: keys): _*).agg(aggs.head, aggs.tail: _*)

  /** U3 — densify: the (entity, bucket) pairs MISSING from `df` given each
    * entity should cover buckets `[0, nBuckets)` (reference index-difference
    * reindex, `data_generation_icu.py:480-482`). `entities` is one row per
    * entity. `sequence`+`explode` generates on the executors — no driver
    * range materialization.
    */
  def missingBuckets(entities: DataFrame, entity: String, nBuckets: Column,
      observed: DataFrame, bucket: String): DataFrame = {
    val full = entities.select(col(entity),
      explode(sequence(lit(0L), nBuckets.cast("long") - 1)).as(bucket))
    full.join(observed.select(col(entity), col(bucket).cast("long").as(bucket)).distinct(),
      Seq(entity, bucket), "left_anti")
  }

  /** Resample-then-interpolate — the reference Generator's time-series
    * tensor shape (`data_generation_icu.py`: fixed-width bucketing, then
    * imputation across empty buckets) as one composed pipeline: per
    * entity, an exact mean per bucket (integer-cent sums, so the mean is
    * engine-order-independent), a DENSE bucket grid spanning the entity's
    * first..last observation (`sequence` + `explode`), and linear
    * interpolation across the gaps on the bucket ordinal axis.
    *
    * Output: (`key`, `bucket`, `value_mean` — null for empty buckets,
    * `value_interp` — interpolated, still null outside the entity's
    * observed value envelope).
    *
    * Scale shape: one map-side-combined aggregate to buckets, a bounded
    * grid explode (|span| rows per entity — the clinical-stay contract:
    * spans are days-to-weeks, not unbounded), one equi-join on
    * (key, bucket), one per-entity sort window. No driver loops; skew
    * bounded by the longest single stay, same as the reference.
    */
  def resampleInterpolate(df: DataFrame, key: String, bucket: Column,
      valueCents: Column): DataFrame = {
    val obs = df.groupBy(col(key), bucket.cast("long").as("bucket"))
      .agg(sum(valueCents).as("__s"), count(valueCents).as("__c"))
      .select(col(key), col("bucket"),
        when(col("__c") > 0,
          col("__s").cast("double") / 100.0 / col("__c")).as("__v"))
    val grid = obs.groupBy(col(key))
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(col(key), explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    val dense = grid.join(obs, Seq(key, "bucket"), "left")
    WindowOps.linearInterpolateAxis(dense, Seq(key), Seq("bucket"),
        col("bucket"), col("__v"), "value_interp")
      .select(col(key), col("bucket"),
        round(col("__v"), 6).as("value_mean"),
        round(col("value_interp"), 6).as("value_interp"))
  }

  /** W5 — "active signal": given per-(entity,code) sparse stop-offsets on a
    * bucket grid, forward-fill the stop and emit 1 while `stop > bucket`
    * (reference med-active mask, `data_generation_icu.py:497-501`).
    */
  def activeSignal(df: DataFrame, partKeys: Seq[String], bucket: String,
      stop: Column, name: String): DataFrame = {
    val w = Window.partitionBy(partKeys.map(col): _*).orderBy(col(bucket).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__ffstop", last(stop, ignoreNulls = true).over(w))
      .withColumn(name,
        when(col("__ffstop").isNotNull && col("__ffstop") > col(bucket), 1).otherwise(0))
      .drop("__ffstop")
  }

  /** Gap-based sessionization: a new session starts when the time since the
    * previous event exceeds `gap`. Two stacked windows over one sort: the
    * boundary flag, then its running sum as the session number (1-based).
    * The streaming twin with explicit state is
    * `streaming.EventStreams.sessionizeStream`.
    */
  def sessionize(df: DataFrame, partKey: String, ts: String, tie: String,
      gap: Column, name: String): DataFrame = {
    val w = Window.partitionBy(partKey).orderBy(col(ts).asc, col(tie).asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__new",
        when(lag(col(ts), 1).over(w).isNull ||
          col(ts) > lag(col(ts), 1).over(w) + gap, 1).otherwise(0))
      .withColumn(name, sum(col("__new")).over(wRun).cast("int"))
      .drop("__new")
  }

  /** Dense pivot to the wide (bucket × code) matrix with an explicit value
    * list — guarantees every vocabulary column exists (reference zero-fill of
    * absent features, `data_generation_icu.py:508-516`). Vocab must be
    * modest (it becomes columns); the tall form remains the scale path.
    */
  def pivotMatrix(tall: DataFrame, entity: String, bucket: String, code: String,
      vocab: Seq[String], value: Column): DataFrame =
    tall.groupBy(col(entity), col(bucket))
      .pivot(code, vocab)
      .agg(value)

  /** Per-key interval union: merge overlapping-or-touching `[start, end]`
    * spans into maximal islands (the utilization/coverage primitive behind
    * "total monitored hours per stay" questions the reference answers by
    * resampling to a dense hourly grid, `day_intervals_cohort.py` interval
    * arithmetic — this form never densifies).
    *
    * One sort per key: a span opens a new island iff its start clears the
    * running max end of every earlier span (two stacked windows, same
    * sort), then islands collapse via groupBy. `tie` must make the sort a
    * total order or the cumulative frames are nondeterministic.
    *
    * Scale shape: windows are keyed (`GlobalWindowGuard`-clean); a single
    * key's spans sort in one task — the same per-entity contract as
    * [[sessionize]] and `WindowOps.runLengthIntervals`. Output is one row
    * per island, ≤ input rows.
    */
  def mergeIntervals(df: DataFrame, keys: Seq[String], start: Column,
      end: Column, tie: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(start.asc, end.asc, tie.asc)
    val prevMax = max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__iv_new",
        when(prevMax.isNull || start > prevMax, 1L).otherwise(0L))
      .withColumn("__iv_id", sum(col("__iv_new")).over(wRun))
      .groupBy(keys.map(col) :+ col("__iv_id"): _*)
      .agg(min(start).as("span_start"), max(end).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__iv_id")
  }

  /** First-order transition counts: how often does `state` A immediately
    * precede state B within a key's timeline — the Markov-chain / user-flow
    * matrix behind "what happens after an error?" questions, and the edge
    * list [[graft.operators.GraphOps.pageRank]] consumes.
    *
    * One keyed window (total order via `tie`) for the successor, then a
    * hash aggregate over (from, to). A key's final event has no successor
    * and is dropped. Output ≤ |states|² rows.
    */
  def transitionCounts(df: DataFrame, key: String, ts: String, tie: String,
      state: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col(tie).asc)
    df.withColumn("__next", lead(col(state), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(state).as("from_state"), col("__next").as("to_state"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Time-weighted average of a sampled signal per key: each observation
    * holds until the next one (LOCF weighting), so
    * twa = Σ valueᵢ·Δtᵢ / Σ Δtᵢ over consecutive pairs — the correct mean
    * for irregularly-sampled vitals/prices, where the arithmetic mean
    * over-weights densely-sampled episodes. The key's last observation has
    * no holding interval and contributes nothing.
    *
    * Determinism: Δt is exact integer seconds (epoch microsecond DIV),
    * the value is quantized to integer micros once per row, and the
    * products are summed as BIGINT — the `MetricsOps.averagePrecision`
    * fixed-point argument — so summation order can't move the 6-decimal
    * result. Overflow headroom: |value|≤10³ over ~10⁵ s holds ~10¹⁴ per
    * row, 2^63 ≈ 9·10¹⁸ — fine to ~10⁴ rows/key; widen to DECIMAL
    * beyond.
    *
    * Scale: one keyed window + one hash aggregate; output one row/key.
    */
  /** CUSUM change-point score per key: the running sum of deviations from
    * the key's own mean peaks where the signal's level shifts — the classic
    * "did this metric change regime, and when?" monitor. Emits the peak
    * |Sᵢ|, its timestamp, and the normalized score max|Sᵢ|/n.
    *
    * Exactness: the value is quantized to integer micros once, and the
    * deviation is formed WITHOUT a float mean — dᵢ = vᵢ·n − Σv (all BIGINT,
    * n·vᵢ exact) — so the running sum, its |argmax| and the tie-break
    * ((|S| desc, ts asc, tie asc)) compare exact integers; only the final
    * normalization divides. Engine- and partition-count-exact.
    *
    * Scale: three stacked keyed windows over ONE sort (whole-partition
    * stats frame + running sum + peak rank); output one row per key.
    * Overflow: |v|·n ≤ 2^63 caps n near 10⁹ rows/key for 10³-sized values.
    */
  def cusumPeaks(df: DataFrame, key: String, ts: String, tie: String,
      value: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col(tie).asc)
    val wAll = Window.partitionBy(key)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = df.filter(value.isNotNull)
      .withColumn("__vfp", round(value * 1e6, 0).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__tot", sum(col("__vfp")).over(wAll))
      .withColumn("__cusum",
        sum(col("__vfp") * col("__n") - col("__tot")).over(wRun))
    val wPeak = Window.partitionBy(key)
      .orderBy(abs(col("__cusum")).desc, col(ts).asc, col(tie).asc)
    scored.withColumn("__pr", row_number().over(wPeak))
      .filter(col("__pr") === 1)
      .select(col(key), col("__n").as("n"), col(ts).as("peak_ts"),
        round(abs(col("__cusum")) / 1e6 / col("__n") / col("__n"), 6)
          .as("cusum_score"))
  }

  def timeWeightedAvg(df: DataFrame, key: String, ts: String, tie: String,
      value: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col(tie).asc)
    // floor-of-double is exact here: the µs diff is an exact-integer double
    // (< 2^53) whose quotient by 1e6 is ≥1e-6 away from any non-multiple
    // integer, so the correctly-rounded division can't cross a floor edge
    val dtS = floor(
      (unix_micros(lead(col(ts), 1).over(w)) - unix_micros(col(ts))) /
        lit(1e6)).cast("long")
    df.filter(value.isNotNull)
      .withColumn("__dt_s", dtS)
      .filter(col("__dt_s").isNotNull)
      .withColumn("__vfp", round(value * 1e6, 0).cast("long"))
      .groupBy(key)
      .agg(sum(col("__dt_s")).as("held_s"),
        round(sum(col("__vfp") * col("__dt_s")) / 1e6 /
          sum(col("__dt_s")), 6).as("twa"))
      .filter(col("held_s") > 0)
  }

  /** Seasonal baseline per (key, day-of-week, hour-of-day): count, mean and
    * population std of `value` in each calendar cell — the profile that
    * turns "is this reading weird?" into a join instead of a model.
    *
    * Day-of-week is 0=Sunday..6 (Spark's `dayofweek` minus 1, matching
    * DuckDB's `dayofweek` for a portable oracle).
    *
    * Determinism: mean and variance are assembled from EXACT sums — value
    * micros as BIGINT, squared micros as DECIMAL(38,0) (squares overflow a
    * 64-bit long at ~10⁴ rows of 10²-sized values; 38 digits carries 10¹⁶
    * rows) — so no float sum ordering is observable; the only doubles are
    * the final correctly-rounded divisions. Variance uses the exact
    * integer identity n·Σv² − (Σv)² before any division.
    *
    * Scale: one hash aggregation; output cardinality = |keys| × 168
    * calendar cells, bounded regardless of row count.
    */
  def seasonalProfile(df: DataFrame, key: String, ts: String,
      value: Column): DataFrame =
    df.filter(value.isNotNull)
      .withColumn("__vfp", round(value * 1e6, 0).cast("long"))
      .groupBy(col(key), (dayofweek(col(ts)) - 1).as("dow"),
        hour(col(ts)).as("hod"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__vfp")).as("__sv"),
        sum(col("__vfp").cast("decimal(38,0)") * col("__vfp")).as("__sv2"))
      .select(col(key), col("dow"), col("hod"), col("n"),
        round(col("__sv") / col("n") / 1e6, 6).as("mean_v"),
        round(
          sqrt((col("__sv2").cast("double") * col("n") -
            col("__sv").cast("double") * col("__sv")) /
            (col("n").cast("double") * col("n")) / 1e12), 6).as("std_v"))

  /** Seasonal anomalies: rows whose `value` sits more than `zThresh`
    * baseline standard deviations from their calendar cell's mean, scored
    * with the z-value. The profile side is [[seasonalProfile]]'s rounded
    * (mean, std) — z is then one subtraction and one division on values
    * both engines hold bit-identically, so the threshold cut and the 3-dp
    * rounding agree everywhere. Cells with zero variance or fewer than
    * `minN` observations never flag (no baseline, no verdict).
    *
    * Scale: the profile frame is calendar-bounded (|keys| × 168), so the
    * join back to the full stream is a broadcast — the anomaly scan costs
    * one pass over the data with no shuffle of the big side.
    */
  def seasonalAnomalies(df: DataFrame, key: String, ts: String, id: String,
      value: Column, zThresh: Double, minN: Long = 24): DataFrame =
    scoreAgainstProfile(df, seasonalProfile(df, key, ts, value),
      key, ts, id, value, zThresh, minN)

  /** The stateless scoring half of [[seasonalAnomalies]], shared with its
    * streaming twin (`EventStreams.seasonalAnomalyStream`): join readings
    * to a prebuilt [[seasonalProfile]] frame and keep the far-from-baseline
    * ones. Works unchanged on a streaming `df` — every op here is
    * per-row or a broadcast join, no state.
    */
  def scoreAgainstProfile(df: DataFrame, profile: DataFrame, key: String,
      ts: String, id: String, value: Column, zThresh: Double,
      minN: Long): DataFrame = {
    val prof = profile.filter(col("std_v") > 0 && col("n") >= minN)
    df.filter(value.isNotNull)
      .withColumn("dow", dayofweek(col(ts)) - 1)
      .withColumn("hod", hour(col(ts)))
      .join(broadcast(prof), Seq(key, "dow", "hod"))
      .withColumn("__z", (value - col("mean_v")) / col("std_v"))
      .filter(abs(col("__z")) > zThresh)
      .select(col(id), col(key), col("dow"), col("hod"),
        value.as("v"), round(col("__z"), 3).as("z"))
  }

  /** Classical seasonal decomposition — value = seasonal + trend +
    * residual per reading, the STL-shaped view every capacity/forecast
    * pipeline starts from. Seasonal = the reading's hour-of-week baseline
    * ([[seasonalProfile]]'s rounded exact-integer mean, so the component
    * is engine-identical); trend = trailing-`trendK`-row EXACT median of
    * the deseasonalized series (median, not mean — one outage spike must
    * not bend the trend); residual = the rest.
    *
    * Scale: the profile is calendar-bounded (|keys|×168 → broadcast
    * join), the trend is one partition-keyed sort window — the whole
    * decomposition costs one broadcast probe plus one keyed sort,
    * never a shuffle of the stream by anything but its own key.
    */
  def seasonalDecompose(df: DataFrame, key: String, ts: String, id: String,
      value: Column, trendK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prof = seasonalProfile(df, key, ts, value)
      .select(col(key), col("dow"), col("hod"), col("mean_v"))
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(id))
      .rowsBetween(-(trendK - 1), Window.currentRow)
    df.filter(value.isNotNull)
      .withColumn("dow", dayofweek(col(ts)) - 1)
      .withColumn("hod", hour(col(ts)))
      .join(broadcast(prof), Seq(key, "dow", "hod"))
      .withColumn("__de", value - col("mean_v"))
      // trailing exact median as sort_array over the collected frame, NOT
      // `percentile(...).over(w)`: the Percentile ImperativeAggregate
      // rebuilds an OpenHashMap per sliding-frame shift (boxing + hashing
      // every row k times), while collect_list is a flat buffer append and
      // the 25-element sort + pick runs codegen'd in the projection. The
      // interpolation below is Percentile's own formula verbatim
      // (lo + (hi − lo)·frac, p = 0.5 ⇒ frac ∈ {0, 0.5}) on the same
      // doubles, so the result is bit-identical.
      .withColumn("__ma", sort_array(collect_list(col("__de")).over(w)))
      .withColumn("__tr", {
        val s = size(col("__ma"))
        val lo = element_at(col("__ma"), (s / 2).cast("int"))
        val hi = element_at(col("__ma"), (s / 2).cast("int") + 1)
        when(s % 2 === 1, element_at(col("__ma"), ((s + 1) / 2).cast("int")))
          .otherwise(lo + (hi - lo) * lit(0.5))
      })
      // 7-decimal rounds: the deseasonalized series lives on a 1e-6 grid
      // (value minus a 6dp mean), so even-count medians sit EXACTLY on
      // 5e-7 — a 6dp round would put every such median on the rounding
      // boundary, where the two engines' interpolation formulas
      // ((a+b)/2 vs a+(b−a)/2, an ulp apart) flip the last digit. At 7dp
      // the grid is 10× coarser than the boundary spacing — ulp-safe.
      .select(col(id), col(key),
        col("mean_v").as("seasonal"),
        round(col("__tr"), 7).as("trend"),
        round(col("__de") - col("__tr"), 7).as("residual"))
  }

  /** Per-entity lag-k autocorrelation screen, lags 1..maxLag in ONE
    * window pass — the seasonality/persistence detector that decides
    * whether a series is worth a sequence model at all (ρ₁ ≈ 0 →
    * white noise, don't bother).
    *
    * The values are quantized to integer `scale`-ths by the caller
    * contract (`value` must already be integer-valued — e.g. cents), so
    * every Pearson sufficient statistic (n, Σx, Σy, Σxy, Σx², Σy²) is an
    * exact integer summed as DECIMAL(38,0): group-aggregate merge order
    * cannot move the result (the `groupOls` argument — per-group hash
    * aggregation has NO deterministic row order, so float sums there are
    * not engine-stable the way window-frame sums are). Lag columns stack
    * into (lag, prev) rows so all lags share the single sorted window.
    */
  def autocorr(df: DataFrame, key: String, ts: String, tie: String,
      value: Column, maxLag: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val base = df.select(col(key), col(ts), col(tie), value.as("__v"))
    val lagged = (1 to maxLag).foldLeft(base)((acc, l) =>
      acc.withColumn(s"__l$l", lag(col("__v"), l).over(w)))
    val stacked = lagged.select(col(key), col("__v"),
      expr(s"stack($maxLag, " +
        (1 to maxLag).map(l => s"$l, __l$l").mkString(", ") +
        ") as (lag, __p)"))
      .filter(col("__p").isNotNull)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    stacked.groupBy(col(key), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("__v"))).as("__sx"), sum(dec(col("__p"))).as("__sy"),
        sum(dec(col("__v")) * col("__p")).as("__sxy"),
        sum(dec(col("__v")) * col("__v")).as("__sxx"),
        sum(dec(col("__p")) * col("__p")).as("__syy"))
      .select(col(key), col("lag"), col("n"),
        when((col("n") * col("__sxx") - col("__sx") * col("__sx")) *
          (col("n") * col("__syy") - col("__sy") * col("__sy")) > 0,
          round((col("n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
            sqrt((col("n") * col("__sxx") - col("__sx") * col("__sx")).cast("double") *
              (col("n") * col("__syy") - col("__sy") * col("__sy")).cast("double")),
            6)).as("acf"))
  }

  /** Per-entity calendar-coverage profile — the data-quality "is this
    * source still reporting" monitor: span (first→last active day), count
    * of ACTIVE days, completeness ratio, and the largest gap between
    * consecutive active days (1 = no gap). A feed whose completeness
    * decays or whose max_gap spikes is dying quietly; at 100 TB this is
    * the per-source freshness scorecard.
    *
    * Shape: distinct (entity, day) — a hash aggregate that collapses the
    * event stream BEFORE any window — then one partition-keyed lag window
    * and a final per-entity aggregate on the same key: two shuffles on
    * the entity key, state bounded by active days per entity, all counts
    * exact integers.
    */
  def activityCompleteness(df: DataFrame, key: String, ts: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = df.select(col(key),
        datediff(to_date(col(ts)), lit("1970-01-01")).cast("long").as("__day"))
      .distinct()
    val w = Window.partitionBy(col(key)).orderBy(col("__day"))
    days
      .withColumn("__gap", col("__day") - lag(col("__day"), 1).over(w))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("active_days"),
        (max("__day") - min("__day") + 1).as("span_days"),
        round(count(lit(1)).cast("double") /
          (max("__day") - min("__day") + 1), 6).as("completeness"),
        coalesce(max("__gap"), lit(1L)).as("max_gap"))
  }

  /** Exact sliding-window distinct-entity count (rolling active users)
    * WITHOUT a distinct-over-window: each entity's activity days merge
    * into [d, d+w−1] islands (a gap > w−1 starts a new one), islands
    * explode to the days they cover, one plain count per day. Work is
    * O(activity × w) rows — linear, entity-partitioned, no sliding
    * distinct state — where the naive form needs a per-day distinct over
    * a w-day self-join. `dayCol` must be integer-valued days.
    */
  def slidingDistinctCount(df: DataFrame, entity: String, dayCol: Column,
      window: Int): DataFrame = {
    val ud = df.select(col(entity), dayCol.cast("long").as("__day")).distinct()
    val w = Window.partitionBy(entity).orderBy(col("__day"))
    ud.withColumn("__gap", col("__day") - lag(col("__day"), 1).over(w))
      .withColumn("__new",
        when(col("__gap").isNull || col("__gap") > window - 1, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(entity), col("__isl"))
      .agg(min("__day").as("__s"),
        (max(col("__day")) + (window - 1)).as("__e"))
      .select(explode(sequence(col("__s"), col("__e"))).as("day_num"))
      .groupBy("day_num").agg(count(lit(1)).as("n_active"))
  }

  /** Best single mean-shift changepoint per entity — the first split of
    * binary segmentation (CUSUM's localization sibling; `ts07` flags THAT
    * a drift happened, this answers WHERE). For every split k of the
    * ordered series the between-segment SSE reduction is
    *   gain_k = (S₁·n₂ − S₂·n₁)² / (n₁·n₂·n)
    * — numerator an EXACT DECIMAL(38,0) integer from one prefix-sum
    * window (value must be integer; callers quantize), denominator a
    * double product of three exact counts, so every engine computes the
    * identical gain doubles and the (gain DESC, order ASC) pick is
    * deterministic. One shuffle on the entity key: two frames over the
    * same window partition, a rank, a filter — per-entity state never
    * leaves its partition.
    */
  def bestChangepoint(df: DataFrame, key: String, ord: Column,
      value: Column): DataFrame = {
    val wOrd = Window.partitionBy(key).orderBy(col("__o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(key)
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(col(key), ord.as("__o"), value.cast("long").as("__v"))
      .withColumn("__n1", count(lit(1)).over(wOrd))
      .withColumn("__s1", sum(col("__v")).over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col("__v")).over(wAll))
    val cand = base.filter(col("__n1") < col("__n"))
      .withColumn("__num",
        d38(col("__s1")) * (col("__n") - col("__n1")) -
          d38(col("__s") - col("__s1")) * col("__n1"))
      // num² is formed as a DOUBLE product of two exact conversions, NOT
      // an exact decimal square: decimal(38,0)² has no precision to shed,
      // so |num| ≥ ~10¹⁹ (reachable at the 100 TB design point, num ~ S·n)
      // would overflow to null and silently drop the candidate — while
      // the gain is consumed as a double anyway, and double(num)·double(num)
      // is identically rounded on every engine
      .withColumn("__gain",
        (col("__num").cast("double") * col("__num").cast("double")) /
          (col("__n1").cast("double") * (col("__n") - col("__n1")) *
            col("__n")))
    val wBest = Window.partitionBy(key)
      .orderBy(col("__gain").desc, col("__o").asc)
    cand.withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col(key), col("__o").as("cp_at"), col("__n").as("n_points"),
        round(col("__gain"), 6).as("gain"))
  }

  /** Mann-Kendall trend test per entity (the monitor's "is this metric
    * drifting monotonically" sibling of [[bestChangepoint]]'s "where did
    * it jump"): S = Σ_{i<j} sign(x_j − x_i) over the time-ordered series,
    * tie-corrected variance, continuity-corrected z.
    *
    * The pair enumeration is a WITHIN-ENTITY self-join on the entity key —
    * quadratic in the SERIES length, not the data: a daily series is
    * bounded by the calendar span (≤ ~10³ points for years of data), so
    * pairs per entity stay ≤ ~10⁶ no matter how many rows the corpus has,
    * and the join is hash-partitioned by entity (the `coOccurrenceEdges`
    * bounded-quadratic argument). Entities longer than `maxSeries` are
    * dropped up front — loudly bounding the worst case, as the LSH bucket
    * caps do.
    *
    * Exactness: S, n, and the tie term Σt(t−1)(2t+5) are exact integers;
    * Var(S) = (n(n−1)(2n+5) − tieterm)/18, z = (S − sign S)/√Var — three
    * mirrored IEEE ops. Var = 0 (all tied / n < 2) guards to null.
    */
  def mannKendallTrend(df: DataFrame, key: String, ord: Column,
      value: Column, maxSeries: Int = 5000): DataFrame = {
    val base = df.select(col(key), ord.as("__o"),
        value.cast("long").as("__v"))
      .withColumn("__len", count(lit(1)).over(Window.partitionBy(key)))
      .filter(col("__len") <= maxSeries).drop("__len")
    val s = base.alias("a").join(base.alias("b"),
        col(s"a.$key") === col(s"b.$key") && col("a.__o") < col("b.__o"))
      .groupBy(col(s"a.$key").as(key))
      .agg(sum(signum(col("b.__v") - col("a.__v")).cast("long")).as("s"))
    val ties = base.groupBy(col(key), col("__v"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("__nv"),
        sum(col("__t") * (col("__t") - 1) * (lit(2) * col("__t") + 5))
          .as("__tt"),
        sum(col("__t")).as("n"))
    val varS = (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) -
      col("__tt")).cast("double") / 18
    s.join(ties, Seq(key))
      .select(col(key), col("n"), col("s"),
        when(varS === 0.0, lit(null).cast("double"))
          .otherwise(round(
            (col("s") - signum(col("s"))).cast("double") / sqrt(varS), 6))
          .as("z"))
  }

  /** Kendall's τ-b per entity — [[mannKendallTrend]]'s EFFECT-SIZE
    * companion (the z answers "is there a trend", τ-b answers "how
    * concordant is it", in [-1, 1]):
    *   τ_b = S / √( (n₀ − n₁) · n₀ ),  n₀ = n(n−1)/2, n₁ = Σ t(t−1)/2
    * with S the concordant-minus-discordant pair sum and n₁ the
    * value-tie pair count (`ord` is unique per entity, so there are no
    * ties on the other axis). Same bounded within-entity pair join and
    * maxSeries cap as the z test; every sufficient statistic is an exact
    * integer and the close is one √ and one division. All-tied or
    * single-point series (zero radicand) yield null.
    */
  def kendallTau(df: DataFrame, key: String, ord: Column, value: Column,
      maxSeries: Int = 5000): DataFrame = {
    val base = df.select(col(key), ord.as("__o"),
        value.cast("long").as("__v"))
      .withColumn("__len", count(lit(1)).over(Window.partitionBy(key)))
      .filter(col("__len") <= maxSeries).drop("__len")
    val s = base.alias("a").join(base.alias("b"),
        col(s"a.$key") === col(s"b.$key") && col("a.__o") < col("b.__o"))
      .groupBy(col(s"a.$key").as(key))
      .agg(sum(signum(col("b.__v") - col("a.__v")).cast("long")).as("s"))
    val ties = base.groupBy(col(key), col("__v"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col(key))
      .agg(sum(col("__t") * (col("__t") - 1)).as("__2t1"),
        sum(col("__t")).as("n"))
    val n0x2 = col("n") * (col("n") - 1) // 2·n₀ — keep doubled, exact
    val rad = ((n0x2 - col("__2t1")) * n0x2).cast("double") / 4.0
    s.join(ties, Seq(key))
      .select(col(key), col("n"), col("s"),
        when(n0x2 - col("__2t1") > 0,
          round(col("s").cast("double") / sqrt(rad), 6)).as("tau"))
  }

  /** Wald–Wolfowitz runs test per entity — the randomness check the
    * trend family can't give ("values drift" vs "values CLUMP"): count
    * maximal runs of above-median/below-median signs (exact type-7
    * median per entity; ties AT the median drop, the standard
    * convention), then
    *   z = (R − (2n₁n₂/n + 1)) / √( 2n₁n₂(2n₁n₂ − n) / (n²(n−1)) ).
    * R, n₁, n₂ and both radicand operands are exact integers (longs —
    * bounded by maxSeries²·2, far under 2⁶³ at the 5000 cap); the close
    * is one division + √ + division, mirrored op-for-op. Degenerate
    * entities (one sign class, or 2n₁n₂ = n) yield null z; all-tied
    * series vanish entirely (no signs survive).
    */
  def runsTest(df: DataFrame, key: String, ord: Column, value: Column,
      maxSeries: Int = 5000): DataFrame = {
    val base = df.select(col(key), ord.as("__o"),
        value.cast("long").as("__v"))
      .withColumn("__len", count(lit(1)).over(Window.partitionBy(key)))
      .filter(col("__len") <= maxSeries).drop("__len")
    val med = CleaningOps.groupQuantiles(
      base.select(col(key), col("__v").cast("double").as("__vd")),
      key, "__vd", 0.5, 0.5)
    val signs = base.join(med, Seq(key))
      .filter(col("__v").cast("double") =!= col("q_lo"))
      .select(col(key), col("__o"),
        when(col("__v").cast("double") > col("q_lo"), 1L).otherwise(0L)
          .as("__s"))
    val w = Window.partitionBy(col(key)).orderBy(col("__o"))
    val ag = signs
      .withColumn("__nw",
        when(lag(col("__s"), 1).over(w).isNull ||
          col("__s") =!= lag(col("__s"), 1).over(w), 1L).otherwise(0L))
      .groupBy(col(key))
      .agg(sum(col("__nw")).as("runs"), sum(col("__s")).as("n1"),
        (count(lit(1)) - sum(col("__s"))).as("n2"))
    val n = col("n1") + col("n2")
    val p = lit(2L) * col("n1") * col("n2")
    val mu = p.cast("double") / n.cast("double") + lit(1.0)
    val rad = (p * (p - n)).cast("double") /
      (n * n * (n - 1)).cast("double")
    ag.select(col(key), col("n1"), col("n2"), col("runs"),
      when(col("n1") > 0 && col("n2") > 0 && p * (p - n) > 0,
        round((col("runs").cast("double") - mu) / sqrt(rad), 6)).as("z"))
  }

  /** Theil-Sen robust slope per entity — [[mannKendallTrend]]'s "how fast
    * is it drifting" companion: the median of all pairwise slopes
    * (Δvalue/Δorder). Same bounded within-entity pair join (series length
    * is calendar-bounded, `maxSeries` caps pathological entities); each
    * slope is one IEEE division of two exact integers, and the median is
    * the exact type-7 pair machinery ([[CleaningOps.groupQuantiles]] at
    * 0.5/0.5) — no per-group value buffer, mirrored by QUANTILE_CONT.
    */
  def theilSenSlope(df: DataFrame, key: String, ord: Column, value: Column,
      maxSeries: Int = 5000): DataFrame = {
    val base = df.select(col(key), ord.as("__o"),
        value.cast("long").as("__v"))
      .withColumn("__len", count(lit(1)).over(Window.partitionBy(key)))
      .filter(col("__len") <= maxSeries).drop("__len")
    // try_divide, not /: codegen evaluates this projection inside the
    // join's consume path, where equal-__o pairs exist BEFORE the strict
    // `<` condition prunes them — ANSI `/` throws on those phantom rows.
    // Surviving rows always have Δo ≥ 1, so the value is identical.
    val slopes = base.alias("a").join(base.alias("b"),
        col(s"a.$key") === col(s"b.$key") && col("a.__o") < col("b.__o"))
      .select(col(s"a.$key").as(key),
        try_divide((col("b.__v") - col("a.__v")).cast("double"),
          (col("b.__o") - col("a.__o")).cast("double")).as("__slope"))
    CleaningOps.groupQuantiles(slopes, key, "__slope", 0.5, 0.5)
      .select(col(key), round(col("q_lo"), 6).as("slope"))
  }

  /** Holt linear-trend (double exponential) smoothing per entity — the
    * classic short-horizon forecaster:
    *   l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1}),
    *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1},
    * initialized l₀ = y₀, b₀ = y₁ − y₀; returns the final (level, trend)
    * and the one-step forecast level + trend. Entities need ≥ 2 points;
    * `ord` must be unique per entity and `value` integer-valued
    * (aggregate/quantize first).
    *
    * The recursion is inherently sequential per entity, so it runs as a
    * higher-order `aggregate` fold over the entity's collected series —
    * state is TWO longs and the array is bounded by `maxSeries` (the
    * mannKendallTrend cap), so per-row memory stays constant at any
    * corpus size.
    *
    * Engine portability is by EXACT INTEGER construction, not rounding:
    * α = aN/aD and β = bN/bD are rationals, state lives in integer
    * micros, and each step rounds v/q with the pure-integer half-up rule
    * ⌊(2v + q)/(2q)⌋ — a first draft pinned each step with ROUND(·, 6)
    * and α = ½ over integer counts lands EXACTLY on ·5e-7 boundaries,
    * where Spark's BigDecimal HALF_UP (sees the full binary expansion,
    * e.g. -0.0975875 → -0.09758749…) and DuckDB's std::round(x·1e6)
    * (sees -97587.5 → away from zero) disagree. Integer state has no
    * such boundary: both engines do exact long arithmetic and one FLOOR
    * of an exact-in-double quotient per step; the only float op in the
    * whole operator is the closing /1e6 per output column.
    */
  def holtSmooth(df: DataFrame, key: String, ord: Column, value: Column,
      alphaNum: Int = 1, alphaDen: Int = 2, betaNum: Int = 1,
      betaDen: Int = 2, maxSeries: Int = 5000): DataFrame = {
    require(alphaNum >= 0 && alphaNum <= alphaDen && alphaDen > 0 &&
      betaNum >= 0 && betaNum <= betaDen && betaDen > 0,
      "holtSmooth: smoothing rationals must satisfy 0 <= num <= den")
    // ⌊(2v + q)/(2q)⌋ = round-half-up(v/q); 2v+q stays exact in the
    // double division for |v| < 2^51 (micros of bounded daily counts)
    def rnd(v: Column, q: Int): Column =
      floor((lit(2) * v + lit(q)).cast("double") / lit(2.0 * q))
        .cast("long")
    val base = df.select(col(key), ord.as("__o"),
        (value.cast("long") * 1000000L).as("__v"))
      .withColumn("__len", count(lit(1)).over(Window.partitionBy(key)))
      .filter(col("__len") <= maxSeries && col("__len") >= 2).drop("__len")
    val arr = base.groupBy(col(key))
      .agg(array_sort(collect_list(struct(col("__o"), col("__v"))))
        .as("__sv"))
      .select(col(key),
        transform(col("__sv"), s => s.getField("__v")).as("__ys"))
    val init = array(element_at(col("__ys"), 1),
      element_at(col("__ys"), 2) - element_at(col("__ys"), 1))
    val folded = aggregate(
      slice(col("__ys"), lit(3), greatest(size(col("__ys")) - 2, lit(0))),
      init,
      (acc: Column, y: Column) => {
        val lNew = rnd(lit(alphaNum) * y + lit(alphaDen - alphaNum) *
          (element_at(acc, 1) + element_at(acc, 2)), alphaDen)
        val bNew = rnd(lit(betaNum) * (lNew - element_at(acc, 1)) +
          lit(betaDen - betaNum) * element_at(acc, 2), betaDen)
        array(lNew, bNew)
      })
    arr.select(col(key), size(col("__ys")).cast("long").as("n"),
        folded.as("__lb"))
      .select(col(key), col("n"),
        (element_at(col("__lb"), 1).cast("double") / lit(1e6)).as("level"),
        (element_at(col("__lb"), 2).cast("double") / lit(1e6)).as("trend"),
        ((element_at(col("__lb"), 1) + element_at(col("__lb"), 2))
          .cast("double") / lit(1e6)).as("forecast_1"))
  }

  /** MASE-style one-step forecast backtest per entity (Hyndman–Koehler
    * 2006 scaling): the seasonal-naive forecast (value `season` steps
    * back on the OBSERVED sequence — row steps, documented divergence
    * from calendar lags for gappy series) scored against the persistence
    * naive (previous observation), as the MAE ratio
    * MASE = MAE_seasonal / MAE_naive. < 1 means the seasonal pattern
    * genuinely beats "tomorrow = today" — the go/no-go gate before any
    * fancier per-entity forecaster.
    *
    * Both MAEs are exact-integer sums of |Δ| over integer-quantized
    * values with exact integer counts; the close is two divisions and a
    * ratio. Two lag columns off ONE window sort, one hash aggregate.
    *
    * Ordering contract: callers should pass a `(key, ord)`-unique
    * ordinal (ts19 aggregates to one row per (user, day) first). If ties
    * do occur, the window breaks them by the quantized value itself, so
    * the lagged VALUE SEQUENCE — the only thing the MAEs read — is still
    * deterministic across runs and engines.
    */
  def maseBacktest(df: DataFrame, key: String, ord: Column, value: Column,
      season: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("__o"), col("__v"))
    val v = value.cast("long")
    val withLags = df
      .select(col(key), ord.as("__o"), v.as("__v"))
      .withColumn("__l1", lag(col("__v"), 1).over(w))
      .withColumn("__ls", lag(col("__v"), season).over(w))
    val agg = withLags.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l1").isNotNull, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__l1").isNotNull, abs(col("__v") - col("__l1")))).as("__s1"),
        sum(when(col("__ls").isNotNull, 1L).otherwise(0L)).as("__ns"),
        sum(when(col("__ls").isNotNull, abs(col("__v") - col("__ls")))).as("__ss"))
    val maeN = col("__s1").cast("double") / col("__n1").cast("double")
    val maeS = col("__ss").cast("double") / col("__ns").cast("double")
    agg.filter(col("__ns") > 0 && col("__n1") > 0)
      .select(col(key), col("n"),
        round(maeN, 6).as("mae_naive"),
        round(maeS, 6).as("mae_seasonal"),
        when(col("__s1") > 0, round(maeS / maeN, 6)).as("mase"))
  }
}
