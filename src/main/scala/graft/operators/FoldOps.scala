package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML-prep relational operators (reference stage 5: k-fold carving and
  * class oversampling, `ml_models.py:66-76`, `dl_train.py:117-127`).
  *
  * Fold assignment is a pure deterministic function of the row key — a
  * Knuth multiplicative hash in exact 64-bit arithmetic — so it is stable
  * across runs, engines, partitionings, and cluster sizes (the reference's
  * `random.sample` folds are none of these). No shuffle: assignment is a
  * projection; a fold filter is a pushdown predicate.
  */
object FoldOps {

  private val KnuthPrime = 2654435761L
  private val Mod = 1000000007L

  /** Deterministic fold in [0, k) from an integer key column. */
  def foldOf(key: Column, k: Int): Column =
    pmod(pmod(key * lit(KnuthPrime), lit(Mod)), lit(k.toLong))

  def assignFolds(df: DataFrame, key: String, k: Int, name: String = "fold"): DataFrame =
    df.withColumn(name, foldOf(col(key), k).cast("int"))

  /** Train/test split for fold `i`: (train, test). */
  def split(df: DataFrame, key: String, k: Int, i: Int): (DataFrame, DataFrame) = {
    val f = foldOf(col(key), k)
    (df.filter(f =!= i), df.filter(f === i))
  }

  /** Minority-class oversampling by integer replication: rows where
    * `isMinority` holds are emitted `factor` times (copy_id 1..factor),
    * others once. Distributed: explode of a per-row sequence, no driver
    * sampling loop.
    */
  def oversample(df: DataFrame, isMinority: Column, factor: Int,
      copyCol: String = "copy_id"): DataFrame =
    df.withColumn(copyCol,
      explode(sequence(lit(1), when(isMinority, factor).otherwise(1))))
}
