package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form per-group statistics fitted entirely inside one hash
  * aggregate — the "trend per entity" questions (is this lab value rising?
  * is this customer's spend accelerating?) the reference answers by looping
  * sklearn over pandas groups (`ml_models.py` per-cohort fits). Here each
  * group's model is five integer sums, so a million groups fit in one
  * map-side-combined pass with no per-group Python round trip.
  */
object RegressionOps {

  /** Per-group simple OLS `y = a + b·x`: slope, intercept and R² from the
    * classic sufficient statistics
    *
    *   b = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * computed over INTEGER-valued `x` and `y` (callers quantize first —
    * e.g. days since epoch and price cents). With integer operands every
    * sum is exact (no float summation-order drift across engines or
    * partitionings), the final divisions are single correctly-rounded
    * double ops, and the 6-decimal round is therefore engine- and
    * partition-count-exact — the same determinism argument as
    * `MetricsOps.averagePrecision`'s fixed-point accumulation.
    *
    * Scale: one hash aggregate, map-side partials, output = one row per
    * group. Exactness holds while `n·Σxy` stays below 2^53; at larger
    * magnitudes pre-center `x` per group (two-pass) or widen to DECIMAL.
    * Groups with fewer than 2 points or zero x-variance are dropped (no
    * fittable line).
    */
  def groupOls(df: DataFrame, group: String, x: Column, y: Column): DataFrame = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    val fit = df.groupBy(group).agg(
      count(lit(1)).as("n"),
      sum(xl).as("__sx"), sum(yl).as("__sy"),
      sum(xl * xl).as("__sxx"), sum(xl * yl).as("__sxy"),
      sum(yl * yl).as("__syy"))
    val n = col("n").cast("double")
    val num = n * col("__sxy") - col("__sx") * col("__sy")
    val den = n * col("__sxx") - col("__sx") * col("__sx")
    val deny = n * col("__syy") - col("__sy") * col("__sy")
    val slope = num / den
    fit.filter(col("n") >= 2 && den =!= 0.0)
      .select(col(group), col("n"),
        round(slope, 6).as("slope"),
        round((col("__sy") - slope * col("__sx")) / n, 6).as("intercept"),
        // guard deny=0 (constant y): R² undefined → null, matching SQL
        round(when(deny =!= 0.0, num * num / (den * deny)), 6).as("r2"))
  }

  /** Quantile normalization across groups: replace each value by the
    * cross-group mean of its within-group quantile bucket — the batch-effect
    * remover of expression pipelines, and the "make every source's length
    * distribution comparable" step of corpus curation.
    *
    * Distributed form: within-group rank (keyed window, total order via
    * `tie`), exact integer bucket `(rn−1)·q DIV n` (same arithmetic as
    * `MetricsOps.gainsTable` — no double rounding at stratum edges), then
    * the reference profile is a q-row aggregate broadcast back onto the
    * rows. Means over integer-valued `value` are exact-sum divisions, so
    * the 6-decimal round is engine-exact.
    *
    * Scale: ONE keyed sort serves both the rank and the group count
    * (whole-partition frame — no separate count-join), plus one q-row
    * broadcast join; no global sort anywhere.
    */
  def quantileNormalize(df: DataFrame, group: String, value: Column,
      tie: Column, q: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(value.asc, tie.asc)
    val wAll = Window.partitionBy(group)
    val ranked = df
      .withColumn("__gn", count(lit(1)).over(wAll))
      .withColumn("__rn", row_number().over(w))
      // integer DIV — no double rounding at stratum edges
      .withColumn("bucket", expr(s"CAST(((__rn - 1) * $q) DIV __gn AS INT)"))
    val profile = ranked.groupBy("bucket")
      .agg(avg(value.cast("long")).as("__ref"))
    ranked.join(broadcast(profile), "bucket")
      .select(col(group), tie, value.as("orig"), col("bucket"),
        round(col("__ref"), 6).as("normalized"))
  }

  /** Zipf rank-frequency fit: OLS of ln(count) on ln(rank) over a term
    * frequency table — slope ≈ −1 flags a natural-language token
    * distribution, flatter slopes flag templated/synthetic corpora (a
    * corpus-forensics one-liner on top of [[groupOls]]).
    *
    * Rank is the two-phase global row number (count desc, term asc — no
    * single-partition sort of the vocabulary), and both logs are QUANTIZED
    * to fixed point (×`quant`, default 10⁵, rounded to integer) before the
    * sums — so [[groupOls]]'s exact-integer determinism argument carries
    * through verbatim; the ~10⁻⁵ stat perturbation is far below the
    * 6-decimal reporting precision. Output: one row (n, slope, intercept,
    * r2).
    */
  def zipfFit(counts: DataFrame, term: String, cnt: String,
      quant: Double = 1e5): DataFrame = {
    val ranked = RankOps.globalRowNumber(counts,
      Seq(col(cnt).desc, col(term).asc), "__zr")
    groupOls(ranked.withColumn("__corpus", lit("all")), "__corpus",
        round(log(col("__zr")) * quant, 0),
        round(log(col(cnt)) * quant, 0))
      .drop("__corpus")
  }
}
