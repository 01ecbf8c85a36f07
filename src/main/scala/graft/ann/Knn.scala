package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - `bruteForceTopK`: exact top-k for a (small, broadcast) query set
  *    against the full corpus — the correctness baseline. Cost O(|Q|·N·d),
  *    distributed over the corpus side; the query side is broadcast so the
  *    corpus is scanned exactly once with no shuffle.
  *  - `clusteredTopK`: IVF-style — restrict each probe to its coarse
  *    cluster (equi-join on the cluster id), turning the N×N cross product
  *    into per-bucket blocks. With balanced clusters this is N²/C work and
  *    one shuffle on the cluster key; at 100 TB the cluster id comes from a
  *    trained coarse quantizer, here any categorical bucket column works.
  *
  * Similarity ties are broken on rounded cosine then neighbor id, so
  * results are deterministic and engine-portable.
  */
object Knn {

  /** Pluggable similarity kernel; default is the composable expression tree,
    * `graft.expressions.CosineSimilarity` (via `call_function("cosine_sim")`)
    * is the fused native path — bit-identical results.
    */
  type Sim = (Column, Column) => Column

  private def simRank(joined: DataFrame, k: Int, simFn: Sim): DataFrame = {
    val sim = round(simFn(col("__qe"), col("__ne")), 6)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    joined
      .withColumn("sim", sim)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("__rn").as("rank"))
  }

  /** Exact cosine top-k of `queries` against `corpus` (both: id + embedding
    * array<float>). Queries are broadcast; corpus is never shuffled.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
      emb: String, k: Int, simFn: Sim = VectorFns.cosine): DataFrame = {
    val q = queries.select(col(id).as("query_id"),
      VectorFns.toDoubleArr(col(emb)).as("__qe"))
    val c = corpus.select(col(id).as("neighbor_id"),
      VectorFns.toDoubleArr(col(emb)).as("__ne"))
    val joined = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
    simRank(joined, k, simFn)
  }

  /** IVF-style top-k: every vector probes only its own `bucket` cluster.
    * One equi-join on the bucket id — block-local similarity, cluster-key
    * shuffle, AQE-skew-safe.
    */
  def clusteredTopK(corpus: DataFrame, id: String, emb: String, bucket: String,
      k: Int, simFn: Sim = VectorFns.cosine): DataFrame = {
    val q = corpus.select(col(bucket).as("__b"), col(id).as("query_id"),
      VectorFns.toDoubleArr(col(emb)).as("__qe"))
    val c = corpus.select(col(bucket).as("__b"), col(id).as("neighbor_id"),
      VectorFns.toDoubleArr(col(emb)).as("__ne"))
    val joined = q.join(c, Seq("__b")).filter(col("query_id") =!= col("neighbor_id"))
    simRank(joined, k, simFn)
  }
}
