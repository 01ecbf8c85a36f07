package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage over string vocabularies — the fuzzy-reconciliation
  * sibling of `CleaningOps.fuzzyNormalize` (which scores against a FIXED
  * dictionary with `levenshtein`): here the dictionary is the data's own
  * distinct-value vocabulary and the scorer is the native Jaro-Winkler
  * expression (`graft.expressions.JaroWinklerSimilarity`), the standard
  * name-matching metric (prefix-weighted, transposition-tolerant).
  *
  * Scale shape: the vocabulary is `distinct()` FIRST — |vocab| is
  * sublinear in corpus rows for any real categorical column (units of
  * measure, drug names, site names), so the pair space is |vocab|², not
  * |rows|². That square is then cut by standard linkage BLOCKING: pairs
  * are generated per equal `blockExpr` value via an equi-join (never a
  * Cartesian), trading recall for tractability exactly the way
  * `d15_sorted_neighborhood` does — with the Winkler prefix boost making
  * a leading-prefix block the natural choice (high-JW pairs that differ
  * in their first character score no boost and are rare).
  */
object LinkageOps {

  /** All within-block vocabulary pairs with Jaro-Winkler ≥ `threshold`.
    * `blockExpr` maps a name to its blocking key (default: first
    * character). Output: `name_a < name_b`, similarity rounded to 6.
    */
  def jaroWinklerPairs(df: DataFrame, nameCol: String, threshold: Double,
      blockExpr: Column => Column = substring(_, 1, 1)): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val v = df.select(col(nameCol).as("name")).filter(col("name").isNotNull)
      .distinct()
      .withColumn("__blk", blockExpr(col("name")))
    v.as("a").join(v.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.name") < col("b.name"))
      .withColumn("__jw",
        call_function("jaro_winkler", col("a.name"), col("b.name")))
      .filter(col("__jw") >= threshold)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        round(col("__jw"), 6).as("jw"))
  }
}
