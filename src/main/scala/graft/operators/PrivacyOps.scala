package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for release pipelines — the k-anonymity / l-diversity
  * profile a de-identification stage computes before any cohort export
  * (the reference pipeline's domain, MIMIC-IV, ships under exactly this
  * kind of re-identification review; cf. reference `README.md` data-use
  * notes).
  *
  * Scale shape: ONE hash aggregate over the quasi-identifier tuple —
  * partial counts combine map-side, the shuffle carries |distinct QI
  * groups| rows, and the distinct-sensitive count rides the same
  * aggregate. No window, no join, no driver collection; at 100 TB the
  * output is bounded by the QI-domain product, not the row count.
  */
object PrivacyOps {

  /** Per-QI-group privacy profile: `k_count` (group size — the "k" in
    * k-anonymity), `l_distinct` (distinct sensitive values — the "l" in
    * l-diversity), and a 0/1 `suppress` flag for groups smaller than
    * `minK` (the rows a suppression pass would withhold).
    */
  def kAnonymityProfile(df: DataFrame, qiCols: Seq[String],
      sensitive: Column, minK: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("k_count"),
        countDistinct(sensitive).as("l_distinct"))
      .withColumn("suppress",
        when(col("k_count") < minK, 1).otherwise(0))

  /** Entropy ℓ-diversity profile (Machanavajjhala et al. 2007): per
    * quasi-identifier group, the distinct-sensitive-value count
    * (distinct ℓ), the entropy of the sensitive distribution (the group
    * satisfies entropy ℓ-diversity iff entropy ≥ ln ℓ), and the dominant
    * value's share (the recursive-(c,ℓ) screen) — the re-identification
    * audit one notch past [[kAnonymityProfile]]'s k.
    *
    * Two hash aggregates ((QI, sensitive) cells, then QI), the
    * [[SummaryOps.groupEntropy]] closed form (ln Σc − Σ c·ln c / Σc over
    * exact integer counts), dominance as one max over the cell frame.
    */
  def lDiversityProfile(df: DataFrame, qiCols: Seq[String],
      sensitive: Column): DataFrame =
    df.groupBy((qiCols.map(col) :+ sensitive.as("__sv")): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(qiCols.map(col): _*)
      .agg(
        sum("__c").cast("long").as("k_count"),
        count(lit(1)).cast("long").as("l_distinct"),
        // the groupEntropy pico-pinned form: exact DECIMAL sum of
        // per-cell c·ln c quantized from exact integer counts
        round(
          log(sum("__c")) -
            sum(col("__c").cast("decimal(18,0)") *
              round(log(col("__c")) * 1e12, 0).cast("decimal(18,0)"))
              .cast("double") / lit(1e12) / sum("__c"), 6)
          .as("entropy"),
        round(max(col("__c")).cast("double") / sum("__c"), 6)
          .as("max_share"))
}
