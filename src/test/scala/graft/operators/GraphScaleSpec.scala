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
  * The probes assert on TOTAL SHUFFLE RECORDS
  * ([[graft.TestSpark.shuffleRecords]]) — a function of data and plan
  * only, immune to this host's CPU-steal waves (each un-checkpointed
  * replayed round re-executes its exchanges, so lineage growth shows up
  * in record counts exactly as it would in time, minus the noise).
  * Thresholds sit ~2× above the expected linear ratios (absorbing fixed
  * per-plan shuffle constants) and ~2× below the quadratic ones, so a
  * regression of either kind still trips the assert deterministically.
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

  private def work(f: => Unit): Double =
    TestSpark.shuffleRecords(f).toDouble.max(1.0)

  test("k-core: 4x the rounds shuffles ~4x, not 16x (lineage stays flat)") {
    val e = edges(20000)
    val t3 = work(GraphOps.kCore(e, "src", "dst", k = 3, rounds = 3).count())
    val t12 = work(GraphOps.kCore(e, "src", "dst", k = 3, rounds = 12).count())
    info(f"k-core rounds=3: ${t3.toLong}  rounds=12: ${t12.toLong}  " +
      f"ratio ${t12 / t3}%.1f")
    assert(t12 / t3 < 8.0,
      f"k-core rounds shuffle scaling ${t12 / t3}%.1fx for 4x rounds — " +
        "lineage is growing superstep-over-superstep (checkpoint " +
        "discipline lost?)")
  }

  test("label propagation: 4x the rounds shuffles ~4x, not 16x") {
    val e = edges(20000)
    val t2 = work(GraphOps.labelPropagation(e, "src", "dst", rounds = 2).count())
    val t8 = work(GraphOps.labelPropagation(e, "src", "dst", rounds = 8).count())
    info(f"label-prop rounds=2: ${t2.toLong}  rounds=8: ${t8.toLong}  " +
      f"ratio ${t8 / t2}%.1f")
    assert(t8 / t2 < 8.0,
      f"label-prop rounds shuffle scaling ${t8 / t2}%.1fx for 4x rounds")
  }

  test("k-core and HITS: 10x the edges shuffles ~10x, not 100x") {
    val e1 = edges(5000)
    val e10 = edges(50000)
    val k1 = work(GraphOps.kCore(e1, "src", "dst", k = 3, rounds = 4).count())
    val k10 = work(GraphOps.kCore(e10, "src", "dst", k = 3, rounds = 4).count())
    info(f"k-core |E|x10 shuffle ratio: ${k10 / k1}%.1f " +
      f"(${k1.toLong} -> ${k10.toLong})")
    assert(k10 / k1 < 30.0, f"k-core |E| shuffle scaling ${k10 / k1}%.1fx")
    val h1 = work(GraphOps.hits(e1, "src", "dst", "w", iters = 3).count())
    val h10 = work(GraphOps.hits(e10, "src", "dst", "w", iters = 3).count())
    info(f"HITS |E|x10 shuffle ratio: ${h10 / h1}%.1f " +
      f"(${h1.toLong} -> ${h10.toLong})")
    assert(h10 / h1 < 30.0, f"HITS |E| shuffle scaling ${h10 / h1}%.1fx")
  }

  test("label propagation and PageRank: 10x the edges shuffles ~10x, not 100x") {
    // the second scale point for the iterative trio (k-core's 10x-edges
    // frame is above): rounds held fixed, edges 10x — a wedge join or
    // unbounded self-join inside a superstep trips this even when the
    // rounds-scaling probes stay flat
    val e1 = edges(5000)
    val e10 = edges(50000)
    val l1 = work(GraphOps.labelPropagation(e1, "src", "dst", rounds = 4).count())
    val l10 = work(GraphOps.labelPropagation(e10, "src", "dst", rounds = 4).count())
    info(f"label-prop |E|x10 shuffle ratio: ${l10 / l1}%.1f " +
      f"(${l1.toLong} -> ${l10.toLong})")
    assert(l10 / l1 < 30.0, f"label-prop |E| shuffle scaling ${l10 / l1}%.1fx")
    val p1 = work(
      GraphOps.pageRank(e1, "src", "dst", "w", iters = 4, damping = 0.85).count())
    val p10 = work(
      GraphOps.pageRank(e10, "src", "dst", "w", iters = 4, damping = 0.85).count())
    info(f"pagerank |E|x10 shuffle ratio: ${p10 / p1}%.1f " +
      f"(${p1.toLong} -> ${p10.toLong})")
    assert(p10 / p1 < 30.0, f"pagerank |E| shuffle scaling ${p10 / p1}%.1fx")
  }

  test("iterative trio: 10x edges AND 4x rounds shuffles ~40x, not 160x") {
    // the joint frame: a checkpoint-placement regression that stays
    // sub-quadratic along each axis alone can still compound across
    // both — pin the joint slope at <2x the 40x linear product (and >2x
    // under the 160x one-axis-quadratic floor), so records must grow
    // ~linearly in edges x rounds
    val kS = work(GraphOps.kCore(edges(5000), "src", "dst",
      k = 3, rounds = 3).count())
    val kB = work(GraphOps.kCore(edges(50000), "src", "dst",
      k = 3, rounds = 12).count())
    info(f"k-core |E|x10 rounds x4 joint ratio: ${kB / kS}%.1f " +
      f"(${kS.toLong} -> ${kB.toLong})")
    assert(kB / kS < 80.0, f"k-core joint shuffle scaling ${kB / kS}%.1fx")
    val lS = work(GraphOps.labelPropagation(edges(5000), "src", "dst",
      rounds = 2).count())
    val lB = work(GraphOps.labelPropagation(edges(50000), "src", "dst",
      rounds = 8).count())
    info(f"label-prop |E|x10 rounds x4 joint ratio: ${lB / lS}%.1f " +
      f"(${lS.toLong} -> ${lB.toLong})")
    assert(lB / lS < 80.0, f"label-prop joint shuffle scaling ${lB / lS}%.1fx")
    val pS = work(GraphOps.pageRank(edges(5000), "src", "dst", "w",
      iters = 2, damping = 0.85).count())
    val pB = work(GraphOps.pageRank(edges(50000), "src", "dst", "w",
      iters = 8, damping = 0.85).count())
    info(f"pagerank |E|x10 iters x4 joint ratio: ${pB / pS}%.1f " +
      f"(${pS.toLong} -> ${pB.toLong})")
    assert(pB / pS < 80.0, f"pagerank joint shuffle scaling ${pB / pS}%.1fx")
  }

  test("PageRank: 4x the iterations shuffles ~4x, not 16x") {
    val e = edges(20000)
    val t2 = work(
      GraphOps.pageRank(e, "src", "dst", "w", iters = 2, damping = 0.85).count())
    val t8 = work(
      GraphOps.pageRank(e, "src", "dst", "w", iters = 8, damping = 0.85).count())
    info(f"pagerank iters=2: ${t2.toLong}  iters=8: ${t8.toLong}  " +
      f"ratio ${t8 / t2}%.1f")
    assert(t8 / t2 < 8.0,
      f"pagerank iteration shuffle scaling ${t8 / t2}%.1fx for 4x iters")
  }
}
