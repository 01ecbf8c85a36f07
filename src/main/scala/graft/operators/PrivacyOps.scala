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
}
