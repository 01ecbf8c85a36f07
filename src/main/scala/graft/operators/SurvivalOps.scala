package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over cohort frames — the time-to-event layer the
  * reference's cohort extraction feeds (mortality / readmission labels are
  * exactly the `(duration, event)` pairs these estimators consume; see
  * reference `day_intervals_cohort.py:111-180` for the label construction
  * this composes with).
  *
  * Both estimators are pure relational plans: one hash aggregation to the
  * per-(group, time) death/censor table — the cardinality collapse from
  * N subjects to (#groups × #distinct times) happens FIRST, so everything
  * downstream is small — then ordered prefix sums for the at-risk counts.
  * No iteration, no driver-side math, no UDFs.
  *
  * Determinism: at-risk counts are exact integers by construction; the
  * KM product and the logrank expectation/variance sums run in fixed
  * point (correctly-rounded integer picos summed as BIGINT — the
  * `GraphOps.pageRank` accumulation argument), so no float sum's
  * ordering is observable and results are engine- and partition-exact.
  */
object SurvivalOps {

  /** Kaplan–Meier survival curve per `group`.
    *
    * Input: ONE ROW PER SUBJECT with an integer `duration` (e.g. days to
    * event or to censoring) and `event` ∈ {0 = censored, 1 = event}.
    * Output: one row per (group, distinct duration) with the at-risk
    * count, events `d`, censored `c`, and the KM estimate
    * `surv = Π_{t' ≤ t} (1 − d_{t'} / n_{t'})`, rounded to 6 decimals.
    *
    * Shape: the per-(group, t) aggregation is the only full-data shuffle;
    * the survival recursion runs on the collapsed frame with windows
    * PARTITIONED BY GROUP (never a global window), ordered by t. The
    * product is evaluated as exp of an ordered prefix sum of
    * ln(1 − d/n) pinned to integer picos; a time point that exhausts the
    * risk set (d = n, where the log diverges) forces `surv = 0` from that
    * point on via a windowed flag instead of touching ln(0).
    *
    * 100 TB: #distinct durations is calendar-bounded (days, hours), so the
    * post-aggregation frame is tiny regardless of subject count; skew is
    * bounded by that same calendar cap per group.
    */
  def kaplanMeier(subjects: DataFrame, group: String, durationName: String,
      eventName: String): DataFrame = {
    val perT = subjects
      .groupBy(col(group), col(durationName).cast("long").as("t"))
      .agg(
        sum(col(eventName).cast("long")).as("d"),
        sum(lit(1L) - col(eventName).cast("long")).as("c"),
        count(lit(1)).as("__m"))

    val cum = Window.partitionBy(col(group)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col(group))

    perT
      // n at risk just BEFORE t = group total − subjects leaving before t
      .withColumn("n_risk",
        sum(col("__m")).over(all) - (sum(col("__m")).over(cum) - col("__m")))
      // ln(1 − d/n) in integer picos; d=0 rows contribute an exact 0
      .withColumn("__lfp",
        when(col("d") === 0, lit(0L))
          .when(col("d") < col("n_risk"),
            round(log(lit(1.0) - col("d") / col("n_risk")) * 1e12, 0)
              .cast("long")))
      // once any time point kills the whole risk set, survival is exactly 0
      .withColumn("__dead", max(when(col("d") === col("n_risk"), 1)
        .otherwise(0)).over(cum))
      .withColumn("surv",
        when(col("__dead") === 1, lit(0.0))
          .otherwise(round(exp(sum(col("__lfp")).over(cum) / 1e12), 6)))
      .select(col(group), col("t"), col("n_risk"), col("d"), col("c"),
        col("surv"))
  }

  /** Two-sample logrank test: observed vs expected events in the
    * `groupFlag = 1` arm under the null of identical hazards.
    *
    * Input: one row per subject with integer `duration`, `event` ∈ {0,1},
    * and `groupFlag` ∈ {0,1} (the arm indicator). Output: ONE ROW —
    * `o1` (observed arm-1 events), `e1` (expected), `chi2`
    * (logrank statistic `(o1−e1)² / Var`), all engine-exact via
    * fixed-point accumulation.
    *
    * At each pooled event time t: n/n1 = at-risk overall / in arm 1,
    * d/d1 = events overall / in arm 1, then
    * `e1_t = d·n1/n`, `v_t = d·(n1/n)·(1−n1/n)·(n−d)/(n−1)` (the
    * hypergeometric variance; times with n ≤ 1 contribute nothing).
    *
    * Shape: per-time aggregation first (full-data shuffle #1), then the
    * at-risk prefix counts via [[RankOps.globalCumsums]] — the two-phase
    * range-bucketed cumsum, NOT a single-partition global window — then
    * one bounded final aggregate of the fixed-point terms.
    */
  def logRank(subjects: DataFrame, groupFlagName: String,
      durationName: String, eventName: String): DataFrame = {
    val perT = subjects
      .groupBy(col(durationName).cast("long").as("t"))
      .agg(
        sum(col(eventName).cast("long")).as("__d"),
        sum((col(eventName) * col(groupFlagName)).cast("long")).as("__d1"),
        count(lit(1)).as("__m"),
        sum(col(groupFlagName).cast("long")).as("__m1"))

    // inclusive prefix sums in time order → at-risk counts just before t
    val cum = RankOps.globalCumsums(perT, Seq(col("t")),
      Seq(col("__m") -> "__cm", col("__m1") -> "__cm1"))
    val tot = perT.agg(sum("__m").as("__N"), sum("__m1").as("__N1"))

    cum.crossJoin(broadcast(tot))
      .withColumn("n", col("__N") - (col("__cm") - col("__m")))
      .withColumn("n1", col("__N1") - (col("__cm1") - col("__m1")))
      .filter(col("__d") > 0 && col("n") > 1)
      .withColumn("__e1fp",
        round(col("__d") * col("n1") / col("n") * 1e12, 0).cast("long"))
      .withColumn("__vfp",
        round(col("__d") * (col("n1") / col("n")) *
          (lit(1.0) - col("n1") / col("n")) *
          (col("n") - col("__d")) / (col("n") - 1) * 1e12, 0).cast("long"))
      .agg(
        sum(col("__d1")).as("o1"),
        round(sum(col("__e1fp")) / 1e12, 6).as("e1"),
        round(
          pow(sum(col("__d1") * lit(1000000000000L) - col("__e1fp")) / 1e12, 2)
            / (sum(col("__vfp")) / 1e12), 6).as("chi2"))
  }
}
