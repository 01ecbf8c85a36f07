package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph measures expressed as unrolled relational passes — the
  * companion of `dedup.DedupOps` connected components (min-label
  * propagation). PageRank here is the generic "importance over a
  * transition graph" scorer: event-type flow graphs, citation-ish doc
  * link graphs, code co-occurrence graphs.
  */
object GraphOps {

  /** Weighted PageRank, `iters` unrolled relational iterations.
    *
    * Each iteration is: contribution = rank/out-weight scattered along
    * edges (one equi-join on src, one hash agg on dst), plus the teleport
    * term and the dangling-node mass folded in via two one-row frames
    * (node count, dangling rank sum) — the bounded scalar-side pattern
    * `t20_pmi_bigrams` and `t21_kl_divergence` established (a 1-row
    * cross join is a broadcast of 8 bytes, not a data-sized cartesian).
    *
    * Determinism: per-edge contributions are accumulated in FIXED POINT
    * (each term correctly rounded to integer picos, summed as BIGINT — the
    * `MetricsOps.averagePrecision` argument), so no float sum's ordering is
    * ever observable; ranks are then pinned to 9 decimals after every
    * iteration — the `Knn.kmeansIterate` trajectory-pinning argument — and
    * the final output rounds to 6. Engine- and partition-count-exact.
    *
    * Scale: per iteration one shuffle on src + one on dst, both key-hashed;
    * node/edge frames never visit the driver. The rank frame is referenced
    * THREE times per iteration (scatter, dangling scan, rejoin), so an
    * unrolled lineage grows as 3^iters — `localCheckpoint` therefore
    * truncates it every `checkpointEvery` supersteps (default: every one,
    * the standard iterative-graph materialization; raise only for tiny
    * iteration counts where one fused plan wins).
    */
  def pageRank(edges: DataFrame, src: String, dst: String, weight: String,
      iters: Int, damping: Double, checkpointEvery: Int = 1): DataFrame = {
    // the edge list and its out-weights feed EVERY superstep — materialize
    // them once instead of replaying the upstream lineage per iteration
    val e = edges.select(col(src).as("__src"), col(dst).as("__dst"),
      col(weight).cast("double").as("__w")).localCheckpoint()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
    val nCount = nodes.agg(count(lit(1)).cast("double").as("__n"))
    val outW = e.groupBy("__src").agg(sum("__w").as("__outw")).localCheckpoint()

    // rank₀ = 1/N, exact same correctly-rounded double in both engines
    var ranks = nodes.crossJoin(broadcast(nCount))
      .select(col("node"), round(lit(1.0) / col("__n"), 9).as("rank"), col("__n"))

    for (i <- 0 until iters) {
      if (i > 0 && i % checkpointEvery == 0)
        ranks = ranks.localCheckpoint()
      val withOut = ranks.join(outW, ranks("node") === outW("__src"), "left")
        .drop("__src")
      val contrib = withOut.filter(col("__outw").isNotNull)
        .join(e, col("node") === col("__src"))
        .groupBy(col("__dst").as("cnode"))
        .agg(sum(round(col("rank") / col("__outw") * col("__w") * 1e12, 0)
          .cast("long")).as("__cfp"))
      val dangling = withOut
        .agg(coalesce(sum(when(col("__outw").isNull,
          round(col("rank") * 1e12, 0).cast("long"))), lit(0L)).as("__dfp"))
      ranks = ranks
        .join(contrib, col("node") === col("cnode"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          round(
            (lit(1.0) - damping) / col("__n") +
              lit(damping) * (coalesce(col("__cfp"), lit(0L)) / 1e12 +
                col("__dfp") / 1e12 / col("__n")), 9).as("rank"),
          col("__n"))
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
