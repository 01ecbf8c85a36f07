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

  // 4-dim vectors, 2 subspaces × 2 dims, 2 codewords per subspace
  private val pqBooks: Pq.Codebooks = Seq(
    Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)),   // subspace 0
    Seq(Seq(0.0, 1.0), Seq(1.0, 0.0)))   // subspace 1

  test("pqEncode picks the nearest codeword per subspace, ties to the smaller index") {
    val df = Seq(
      (0L, Array(0.1f, 0f, 0f, 0.9f)),     // sub0 → cw0, sub1 → cw0
      (1L, Array(0.9f, 1f, 1f, 0.1f)),     // sub0 → cw1, sub1 → cw1
      (2L, Array(0.5f, 0.5f, 0.5f, 0.5f))  // equidistant both → ties to 0
    ).toDF("vec_id", "embedding")
    val got = Pq.pqEncode(df, "vec_id", "embedding", pqBooks)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(got === Map(0L -> Seq(0, 0), 1L -> Seq(1, 1), 2L -> Seq(0, 0)))
  }

  test("pqTopK ADC equals the exact distance to the reconstructed neighbor") {
    // corpus vectors assembled FROM codewords, so quantization is lossless
    // and ADC(query, doc) must equal the true squared-L2 distance
    val corpus = Seq(
      (10L, Array(0f, 0f, 0f, 1f)),   // codes (0,0) — reconstructs itself
      (11L, Array(1f, 1f, 1f, 0f)),   // codes (1,1)
      (12L, Array(0f, 0f, 1f, 0f))    // codes (0,1)
    ).toDF("vec_id", "embedding")
    val query = Seq((0L, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val got = Pq.pqTopK(corpus, query, "vec_id", "embedding", pqBooks, k = 3)
      .select("neighbor_id", "adc", "rank").as[(Long, Double, Int)].collect()
      .sortBy(_._3)
    // exact squared-L2 from (0,0,0,1): to 10 → 0; to 12 → 1+1=2; to 11 → 1+1+1+1=4
    assert(got.map(r => (r._1, r._2)).toSeq === Seq((10L, 0.0), (12L, 2.0), (11L, 4.0)))
    assert(got.map(_._3).toSeq === Seq(1, 2, 3))
  }

  test("pqTopK self-pairs are excluded and ranks are per-query dense") {
    val corpus = Seq(
      (0L, Array(0f, 0f, 0f, 1f)), (1L, Array(1f, 1f, 1f, 0f)),
      (2L, Array(0f, 1f, 1f, 0f)), (3L, Array(1f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val got = Pq.pqTopK(corpus, corpus.filter($"vec_id" < 2), "vec_id",
        "embedding", pqBooks, k = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(got.forall { case (q, n, _) => q != n })
    assert(got.groupBy(_._1).forall { case (_, rs) => rs.map(_._3).sorted.toSeq === Seq(1, 2) })
  }

  test("ivfPqTopK with nProbe = C equals the flat ADC scan; nProbe=1 stays in-cell") {
    val corpus = Seq(
      (0L, Array(0f, 0f, 0f, 1f)), (1L, Array(1f, 1f, 1f, 0f)),
      (2L, Array(0f, 1f, 1f, 0f)), (3L, Array(1f, 0f, 0f, 1f)),
      (4L, Array(0.9f, 0.9f, 0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 2)
    val cents = Seq(Seq(0.0, 0.0, 0.0, 1.0), Seq(1.0, 1.0, 1.0, 0.0))
    // all cells probed → candidate set = whole corpus → flat pqTopK
    val full = Pq.ivfPqTopK(corpus, queries, "vec_id", "embedding", cents,
        pqBooks, nProbe = 2, k = 3)
      .select("query_id", "neighbor_id", "adc", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val flat = Pq.pqTopK(corpus, queries, "vec_id", "embedding", pqBooks,
        k = 3)
      .select("query_id", "neighbor_id", "adc", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full === flat)
    // one probe → neighbors never leave the query's own cell
    val one = Pq.ivfPqTopK(corpus, queries, "vec_id", "embedding", cents,
        pqBooks, nProbe = 1, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val cell = Knn.assignClusters(corpus, "vec_id", "embedding", cents)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(one.nonEmpty)
    assert(one.forall { case (q, n) => cell(q) === cell(n) })
  }

  test("mmrRerank trades relevance for diversity and tie-breaks by id") {
    import org.apache.spark.sql.functions._
    // a is best; b is nearly a duplicate of a (sim .95); c is distinct.
    // With lambda = 0.7: step 2 scores b at .7*.85-.3*.95 = .31 and c at
    // .7*.80-.3*.10 = .53 -> c outranks the higher-relevance b
    val cands = Seq(("a", 0.9), ("b", 0.85), ("c", 0.8)).toDF("id", "rel")
    val sims = Seq(
      ("a", "b", 0.95), ("b", "a", 0.95),
      ("a", "c", 0.10), ("c", "a", 0.10),
      ("b", "c", 0.10), ("c", "b", 0.10)).toDF("a", "b", "sim")
    val got = Knn.mmrRerank(cands, "id", "rel", sims, "a", "b", "sim",
        k = 3, lam = 0.7)
      .orderBy("rank").as[(String, Int, Double)].collect()
    assert(got.map(_._1).toSeq === Seq("a", "c", "b"))
    assert(got(0)._3 === 0.63) // lambda * rel, empty diversity term
    assert(got(1)._3 === 0.53)
    // b's final score: .7*.85 - .3*max(.95, .10)
    assert(math.abs(got(2)._3 - 0.31) < 1e-9)
  }
}
