package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The v23 recall-vs-nProbe tuning curve: per-query recall must be
  * monotone non-decreasing in the probe budget (more probes only ADD
  * candidate clusters), and at nProbe = |clusters| the probe list covers
  * everything so recall is exactly 1.
  */
class NprobeSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // probe assignment is EUCLIDEAN (distance to centroid) while ranking is
  // COSINE — so a small vector angled toward the far blob lands in the
  // near cluster by distance, yet its true cosine neighbors live in the
  // other one: nProbe=1 must miss them, nProbe=2 must recover them
  private val vecs = Seq(
    (0L, Array(100f, 0f), 0),
    (1L, Array(100f, 5f), 0),
    (2L, Array(0f, 1f), 1),
    (3L, Array(1f, 10f), 1),
    (4L, Array(2f, 1f), 1) // euclid-near cluster 1, cosine-near cluster 0
  ).toDF("vec_id", "embedding", "label")

  test("recall is monotone in nProbe and total at full probe budget") {
    val cents = Knn.centroids(vecs, "label", "embedding").collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    val exact = Knn.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 2)
    val byProbe = Seq(1, 2).map { np =>
      val approx = Knn.multiProbeTopK(vecs, "vec_id", "embedding", cents,
        nProbe = np, k = 2)
      np -> Knn.recallAtK(exact, approx)
        .select("query_id", "recall").as[(Long, Double)].collect().toMap
    }.toMap
    val r1 = byProbe(1)
    val r2 = byProbe(2)
    r1.keySet.foreach { q =>
      assert(r2(q) >= r1(q), s"recall dropped for query $q: ${r1(q)} -> ${r2(q)}")
    }
    // full budget = brute force: every query at recall 1
    assert(r2.values.forall(_ === 1.0), r2.toString)
    // the mis-angled vector's single-probe recall is 0 — both its true
    // cosine top-2 live in the unprobed cluster; the sweep measures
    // something real, not a vacuously flat curve
    assert(r1(4L) === 0.0, s"query 4 not stressed: ${r1(4L)}")
  }
}
