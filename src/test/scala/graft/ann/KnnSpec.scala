package graft.ann

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // hand-checkable unit vectors: 0∥2, 0⊥1, 3 at 45° to 0
  private val vecs = Seq(
    (0L, Array(1f, 0f), 0),
    (1L, Array(0f, 1f), 0),
    (2L, Array(2f, 0f), 0),
    (3L, Array(1f, 1f), 1),
    (4L, Array(-1f, 0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("bruteForceTopK ranks by cosine with deterministic ties") {
    val got = Knn.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 4)
      .select("neighbor_id", "sim", "rank").as[(Long, Double, Int)].collect()
      .sortBy(_._3)
    assert(got.map(_._1).toSeq === Seq(2L, 3L, 1L, 4L))
    assert(got(0)._2 === 1.0)                       // parallel
    assert(math.abs(got(1)._2 - 0.707107) < 1e-6)   // 45°
    assert(got(2)._2 === 0.0)                       // orthogonal
    assert(got(3)._2 === -1.0)                      // opposite
  }

  test("clusteredTopK never crosses cluster boundaries and excludes self") {
    val got = Knn.clusteredTopK(vecs, "vec_id", "embedding", "label", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val cluster = Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1)
    assert(got.forall { case (q, n) => cluster(q) == cluster(n) && q != n })
    assert(got.count(_._1 == 0L) === 2) // only its own cluster's other members
  }

  test("multiProbeTopK with nProbe = C equals exact brute force; nProbe=1 stays in-cluster") {
    val centroids = Seq(Seq(1.0, 0.0), Seq(-1.0, 0.5)) // arbitrary quantizer
    val full = Knn.multiProbeTopK(vecs, "vec_id", "embedding", centroids,
        nProbe = 2, k = 4)
      .select("query_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = Knn.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 4)
      .select("query_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full === brute)

    val one = Knn.multiProbeTopK(vecs, "vec_id", "embedding", centroids,
        nProbe = 1, k = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // single probe ⊆ full probe's pair set, and strictly smaller here
    assert(one.toSet.subsetOf(brute.map(t => (t._1, t._2))))
    assert(one.length < brute.size)
  }

  test("probeSelection: rank 1 equals assignClusters; nProbe=C ranks every cluster") {
    val centroids = Seq(Seq(1.0, 0.0), Seq(-1.0, 0.5))
    val probes = Knn.probeSelection(vecs, "vec_id", "embedding", centroids, nProbe = 2)
      .select("vec_id", "probe_rank", "cluster").as[(Long, Int, Int)].collect()
    // every vector ranks all C clusters exactly once each
    assert(probes.length === vecs.count() * centroids.size)
    assert(probes.groupBy(_._1).values.forall(_.map(_._3).toSet === Set(0, 1)))
    // the first probe IS the squared-L2 argmin assignment
    val first = probes.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    val assigned = Knn.assignClusters(vecs, "vec_id", "embedding", centroids)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(first === assigned)
  }

  test("kmeans quantizer: separable clusters split correctly, assignment deterministic") {
    import spark.implicits._
    // two well-separated blobs in 4-d
    val pts = ((1L to 10L).map(i => (i, Array(10f + i * 0.01f, 0f, 0f, 0f))) ++
      (11L to 20L).map(i => (i, Array(0f, 10f + i * 0.01f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val a1 = graft.ann.Knn.kmeansAssign(pts, "vec_id", "embedding", k = 2, iters = 5)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    // every assignment in range, both blobs pure
    assert(a1.values.forall(c => c >= 0 && c < 2))
    assert((1L to 10L).map(a1).toSet.size === 1)
    assert((11L to 20L).map(a1).toSet.size === 1)
    assert(a1(1L) !== a1(11L), "blobs land in different clusters")
    // deterministic across invocations
    val a2 = graft.ann.Knn.kmeansAssign(pts, "vec_id", "embedding", k = 2, iters = 5)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(a2 === a1)
  }

  test("recallAtK: perfect overlap is 1, partial overlap counts hits, misses are 0") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L)).toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 99L), // 2 of 3 hit
      (2L, 98L), (2L, 97L), (2L, 96L))                // 0 of 3 hit
      .toDF("query_id", "neighbor_id")
    val got = graft.ann.Knn.recallAtK(exact, approx)
      .select("query_id", "n_hits", "k", "recall")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got(1L) === ((2L, 3L, 0.666667)))
    assert(got(2L) === ((0L, 3L, 0.0)))
    val perfect = graft.ann.Knn.recallAtK(exact, exact)
      .select("recall").as[Double].collect()
    assert(perfect.forall(_ === 1.0))
  }
}
