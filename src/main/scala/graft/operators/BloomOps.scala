package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi joins — the standard 100 TB pattern for
  * "filter a huge fact table by a large-but-not-broadcastable key set":
  * instead of shuffling the whole fact table into the semi join, ship a
  * fixed-size bloom filter of the key set and drop non-members at the scan,
  * so only (matches + false positives) ever reach the exact join's shuffle.
  *
  * Built on Spark's own sketch machinery (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, the expressions behind Spark's runtime
  * row-level filtering): the aggregate's state is the bit array — sized by
  * `numBits` AT CONSTRUCTION, independent of input cardinality — and merges
  * bitwise, so the build is one narrow aggregate, never a driver collect of
  * keys. The serialized filter rides to executors as a literal (same
  * bounded-by-construction contract as the k-means centroid matrix).
  * Membership is deterministic: bits depend only on the key SET, not on
  * partitioning or merge order.
  *
  * No DuckDB oracle by nature (sketch bits are engine-specific), so the op
  * is spec-gated: BloomOpsSpec proves zero false negatives, the
  * false-positive envelope, and result-identity of the end-to-end
  * pre-filtered semi join against the plain one.
  */
object BloomOps {

  /** Serialized bloom filter of `key` over `filterSide`. `numBits` bounds
    * the state (and the literal shipped to every task) — pick
    * ~10·expectedItems bits for ~1% false positives.
    */
  def buildBloom(filterSide: DataFrame, key: String,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    graft.expressions.GraftFunctions.register(filterSide.sparkSession)
    filterSide
      .select(call_function("bloom_agg", xxhash64(col(key)),
        lit(expectedItems), lit(numBits)).as("__bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Membership test column: true if `key` might be in the filter (exact
    * members always pass; non-members pass with the false-positive rate).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    call_function("bloom_might_contain", lit(bloom), xxhash64(key))

  /** Exact semi join with a bloom pre-filter: the approximate membership
    * predicate runs at the fact scan (no shuffle), the exact semi join then
    * touches only survivors. Result-identical to the plain semi join — the
    * bloom can only let extra rows THROUGH to the exact stage, never drop a
    * member.
    */
  def bloomSemiFilter(df: DataFrame, key: String, filterSide: DataFrame,
      expectedItems: Long, numBits: Long): DataFrame = {
    val bloom = buildBloom(filterSide, key, expectedItems, numBits)
    JoinOps.semiFilter(df.filter(mightContain(bloom, col(key))),
      Seq(key), filterSide)
  }
}
