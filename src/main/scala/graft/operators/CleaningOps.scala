package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-cleaning operators (SURVEY.md §2.4 A5/A6, §2.2 P9-P12).
  *
  * Both heavyweight cleaners are two-pass over the same grouping key: a
  * per-group statistics aggregate (mode share / percentiles) joined back
  * onto the fact table. The stats side is |distinct keys| rows — usually
  * small, but NOT provably bounded (a per-item-id stats frame at 100 TB is
  * itself huge), so there is no forced broadcast hint: AQE broadcasts at
  * runtime when the stats side is actually under the threshold, and falls
  * back to a shuffle join keyed on the same column otherwise.
  */
object CleaningOps {

  /** A5 — majority-category dominance filter (reference UoM cleaning,
    * `uom_conversion.py:11-28`): per `key`, find the modal `category`; if the
    * group has more than one distinct category AND the modal share exceeds
    * `cutoff`, drop the non-modal rows; otherwise keep the group untouched.
    * Mode tie-break: higher count, then lexicographically smaller category
    * (the reference inherits pandas' value_counts order; we pin it).
    */
  def dominantCategoryFilter(df: DataFrame, key: String, category: String, cutoff: Double): DataFrame = {
    val counts = df.groupBy(key, category).agg(count(lit(1)).as("__cnt"))
    val wRank = Window.partitionBy(key).orderBy(col("__cnt").desc, col(category).asc)
    val wKey = Window.partitionBy(key)
    val stats = counts
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__tot", sum(col("__cnt")).over(wKey))
      .withColumn("__ndist", count(lit(1)).over(wKey))
      .filter(col("__rn") === 1)
      .select(
        col(key),
        col(category).as("__mode"),
        (col("__cnt").cast("double") / col("__tot")).as("__share"),
        col("__ndist"))
    df.join(stats, Seq(key), "left")
      .filter(!(col("__ndist") > 1 && col("__share") > cutoff && col(category) =!= col("__mode")))
      .drop("__mode", "__share", "__ndist")
  }

  /** A6 — per-group percentile clamp (reference outlier removal,
    * `outlier_removal.py:11-37`, impute branch): clamp `value` into
    * `[pct(lo), pct(hi)]` computed per `key` with exact type-7 linear
    * interpolation (`percentile`, matching `numpy.percentile`).
    */
  def percentileClamp(df: DataFrame, key: String, value: String, lo: Double, hi: Double): DataFrame = {
    val bounds = df.groupBy(key).agg(
      percentile(col(value), lit(lo)).as("__lo"),
      percentile(col(value), lit(hi)).as("__hi"))
    df.join(bounds, Seq(key), "left")
      .withColumn(value, least(greatest(col(value), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** A6 (drop branch) — null-out values outside the per-group percentile
    * band and drop those rows (`outlier_removal.py:20-21`).
    */
  def percentileDrop(df: DataFrame, key: String, value: String, lo: Double, hi: Double): DataFrame = {
    val bounds = df.groupBy(key).agg(
      percentile(col(value), lit(lo)).as("__lo"),
      percentile(col(value), lit(hi)).as("__hi"))
    df.join(bounds, Seq(key), "left")
      .filter(col(value) >= col("__lo") && col(value) <= col("__hi"))
      .drop("__lo", "__hi")
  }
}
