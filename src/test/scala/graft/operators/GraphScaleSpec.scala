package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scale probe for the fixed-round iterative graph family (k-core,
  * label propagation, HITS, PageRank): the 100 TB claims made observable.
  *
  * Two failure modes this guards, both invisible to correctness specs:
  *  1. Superstep-over-superstep lineage growth — without the per-round
  *     `localCheckpoint` discipline each round re-executes every prior
  *     round, so cost is QUADRATIC in rounds (round 12 pays rounds 1–11
  *     again). Probe: total runtime at 4× the rounds must stay well under
  *     the quadratic blow-up.
  *  2. Super-linear cost in |E| — a wedge join or an unbounded self-join
  *     sneaking into a superstep turns 10× edges into ~100× work. Probe:
  *     10× the synthetic edge list must cost an order of magnitude less
  *     than quadratic.
  *
  * Thresholds sit ~2× above the expected linear ratios (absorbing
  * scheduler noise and CPU-steal waves on a shared host — medians of
  * repeated runs) and ~2× below the quadratic ones, so a regression of
  * either kind still trips the assert deterministically.
  */
class GraphScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic synthetic multigraph: ~m edges over m/8 nodes with a
    * hash-scattered degree profile; pinned so probe timings never include
    * generation or lineage above the edge list.
    */
  private def edges(m: Int): DataFrame = {
    val n = math.max(m / 8, 16)
    spark.range(m.toLong)
      .select(
        pmod(hash(col("id") * 2 + 1), lit(n)).cast("long").as("src"),
        pmod(hash(col("id") * 2 + 2), lit(n)).cast("long").as("dst"),
        lit(1.0).as("w"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint()
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def med3(f: => Unit): Double =
    Seq(time(f), time(f), time(f)).sorted.apply(1)

  test("k-core: 4x the rounds costs ~4x, not 16x (lineage stays flat)") {
    val e = edges(20000)
    GraphOps.kCore(e, "src", "dst", k = 3, rounds = 2).count() // warm-up
    val t3 = med3(GraphOps.kCore(e, "src", "dst", k = 3, rounds = 3).count())
    val t12 = med3(GraphOps.kCore(e, "src", "dst", k = 3, rounds = 12).count())
    info(f"k-core rounds=3: $t3%.2fs  rounds=12: $t12%.2fs  ratio ${t12 / t3}%.1f")
    assert(t12 / t3 < 8.0,
      f"k-core rounds scaling ${t12 / t3}%.1fx for 4x rounds — lineage " +
        "is growing superstep-over-superstep (checkpoint discipline lost?)")
  }

  test("label propagation: 4x the rounds costs ~4x, not 16x") {
    val e = edges(20000)
    GraphOps.labelPropagation(e, "src", "dst", rounds = 1).count() // warm-up
    val t2 = med3(GraphOps.labelPropagation(e, "src", "dst", rounds = 2).count())
    val t8 = med3(GraphOps.labelPropagation(e, "src", "dst", rounds = 8).count())
    info(f"label-prop rounds=2: $t2%.2fs  rounds=8: $t8%.2fs  ratio ${t8 / t2}%.1f")
    assert(t8 / t2 < 8.0,
      f"label-prop rounds scaling ${t8 / t2}%.1fx for 4x rounds")
  }

  test("k-core and HITS: 10x the edges costs ~10x, not 100x") {
    val e1 = edges(5000)
    val e10 = edges(50000)
    GraphOps.kCore(e1, "src", "dst", k = 3, rounds = 4).count() // warm-up
    val k1 = med3(GraphOps.kCore(e1, "src", "dst", k = 3, rounds = 4).count())
    val k10 = med3(GraphOps.kCore(e10, "src", "dst", k = 3, rounds = 4).count())
    info(f"k-core |E|x10 ratio: ${k10 / k1}%.1f ($k1%.2fs -> $k10%.2fs)")
    assert(k10 / k1 < 30.0, f"k-core |E| scaling ${k10 / k1}%.1fx for 10x edges")
    val h1 = med3(GraphOps.hits(e1, "src", "dst", "w", iters = 3).count())
    val h10 = med3(GraphOps.hits(e10, "src", "dst", "w", iters = 3).count())
    info(f"HITS |E|x10 ratio: ${h10 / h1}%.1f ($h1%.2fs -> $h10%.2fs)")
    assert(h10 / h1 < 30.0, f"HITS |E| scaling ${h10 / h1}%.1fx for 10x edges")
  }

  test("PageRank: 4x the iterations costs ~4x, not 16x") {
    val e = edges(20000)
    GraphOps.pageRank(e, "src", "dst", "w", iters = 1, damping = 0.85).count()
    val t2 = med3(
      GraphOps.pageRank(e, "src", "dst", "w", iters = 2, damping = 0.85).count())
    val t8 = med3(
      GraphOps.pageRank(e, "src", "dst", "w", iters = 8, damping = 0.85).count())
    info(f"pagerank iters=2: $t2%.2fs  iters=8: $t8%.2fs  ratio ${t8 / t2}%.1f")
    assert(t8 / t2 < 8.0,
      f"pagerank iteration scaling ${t8 / t2}%.1fx for 4x iters")
  }
}
