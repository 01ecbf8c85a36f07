package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised categorical encodings for model-input generation — the
  * feature-engineering step between cohort extraction and training
  * (the reference one-hot-encodes everything; these are the
  * leakage-aware alternatives a large-scale pipeline adds when the
  * category domain is too wide to one-hot).
  *
  * Scale shape for both: a per-category aggregate (map-side combined,
  * output |categories| rows) joined back to the frame — AQE promotes the
  * stats side to broadcast when it fits, which it does by construction
  * for any encodable category domain. No windows: a
  * `Window.partitionBy(category)` form would funnel every row of a hot
  * category through one task, precisely the skew a popular category
  * guarantees at corpus scale.
  */
object EncodingOps {

  /** Leave-one-out target encoding: each row's category is replaced by the
    * mean of `target` over the OTHER rows of the same category —
    * `(Σ_grp target − target_row) / (n_grp − 1)`, null for singleton
    * groups (no other rows to average). The leave-one-out form is the
    * standard guard against target leakage in stacked models.
    */
  def targetEncodeLoo(df: DataFrame, category: String, target: Column,
      outName: String): DataFrame = {
    val stats = df.groupBy(col(category))
      .agg(sum(target).as("__te_sum"), count(lit(1)).as("__te_cnt"))
    df.withColumn("__te_y", target)
      .join(stats, Seq(category))
      .withColumn(outName,
        when(col("__te_cnt") > 1,
          round((col("__te_sum") - col("__te_y")) /
            (col("__te_cnt") - 1), 6)))
      .drop("__te_sum", "__te_cnt", "__te_y")
  }

  /** Weight of evidence per category for a 0/1 `target`:
    * `ln(((pos_c + s)/pos_tot) / ((neg_c + s)/neg_tot))` with additive
    * smoothing `s` so empty cells stay finite — the credit-scoring /
    * risk-modeling encoding, one row per category.
    */
  def weightOfEvidence(df: DataFrame, category: String, target: Column,
      smoothing: Double = 0.5): DataFrame = {
    val stats = df.groupBy(col(category))
      .agg(sum(target.cast("double")).as("pos"),
        sum(lit(1.0) - target.cast("double")).as("neg"))
    val totals = stats.agg(sum(col("pos")).as("__tp"), sum(col("neg")).as("__tn"))
    stats.crossJoin(broadcast(totals))
      .select(col(category), col("pos"), col("neg"),
        round(log(((col("pos") + smoothing) / col("__tp")) /
          ((col("neg") + smoothing) / col("__tn"))), 6).as("woe"))
  }
}
