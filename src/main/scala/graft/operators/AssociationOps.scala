package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical association measures — the feature-selection screen for a
  * training-data pipeline: "does this categorical column carry signal
  * about that one, and how much?" (χ² independence, Cramér's V effect
  * size, mutual information in nats).
  *
  * One hash aggregation collapses N rows to the contingency cells; every
  * measure is then arithmetic over that bounded frame. The marginals and
  * the grand total ride as broadcast sides (cells × categories, both
  * bounded by category cardinality — the bounded-scalar-side pattern of
  * `t20_pmi_bigrams`), so the full-data cost is exactly one shuffle on
  * the (a, b) cell key regardless of scale.
  */
object AssociationOps {

  /** χ², Cramér's V and mutual information between two categorical
    * columns, as ONE output row
    * `(n, r, c, chi2, cramers_v, mutual_info)`.
    *
    * Determinism: cell/marginal counts are exact integers; each cell's χ²
    * and MI contribution is correctly rounded to integer nanos/picos and
    * summed as BIGINT (the `GraphOps.pageRank` fixed-point argument), so
    * the per-cell float work is order-independent and engine-exact. MI is
    * natural-log, `Σ (n_ab/N)·ln(n_ab·N / (n_a·n_b))`; χ² is
    * `Σ (n_ab − e_ab)²/e_ab` with `e_ab = n_a·n_b/N`;
    * `V = √(χ² / (N·(min(r,c)−1)))`, 0 when either column is constant.
    */
  def categoricalAssociation(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.select(a.as("__a"), b.as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__nab"))
    val rowTot = cells.groupBy("__a").agg(sum("__nab").as("__na"))
    val colTot = cells.groupBy("__b").agg(sum("__nab").as("__nb"))
    val grand = cells.agg(sum("__nab").as("__N"),
      count_distinct(col("__a")).as("r"), count_distinct(col("__b")).as("c"))

    // χ² sums over ALL r×c cells — an (a, b) combination that never
    // co-occurs still contributes (0 − e)²/e — so the contingency table
    // is densified from the marginals' cross product (bounded by category
    // cardinalities, the whole premise of a categorical screen) before
    // the observed counts are attached. MI's empty cells contribute the
    // exact limit 0·ln 0 = 0 and are pinned there explicitly.
    rowTot.crossJoin(broadcast(colTot))
      .join(broadcast(cells), Seq("__a", "__b"), "left")
      .withColumn("__nab", coalesce(col("__nab"), lit(0L)))
      .crossJoin(broadcast(grand))
      .withColumn("__e", col("__na") * col("__nb") / col("__N"))
      // χ² cell term in integer nanos, MI cell term in integer picos
      .withColumn("__chifp",
        round((col("__nab") - col("__e")) * (col("__nab") - col("__e")) /
          col("__e") * 1e9, 0).cast("long"))
      .withColumn("__mifp",
        when(col("__nab") === 0, lit(0L)).otherwise(
          round(col("__nab") / col("__N") *
            log(col("__nab") * col("__N") / (col("__na") * col("__nb"))) *
            1e12, 0).cast("long")))
      .groupBy(col("__N").as("n"), col("r"), col("c"))
      .agg(
        round(sum(col("__chifp")) / 1e9, 6).as("chi2"),
        round(when(least(col("r"), col("c")) > 1,
          sqrt(sum(col("__chifp")) / 1e9 /
            (col("__N") * (least(col("r"), col("c")) - 1))))
          .otherwise(0.0), 6).as("cramers_v"),
        round(sum(col("__mifp")) / 1e12, 6).as("mutual_info"))
  }
}
