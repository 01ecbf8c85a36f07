package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BM25 retrieval: hand-computed scores on a three-doc corpus. */
class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25TopK matches the Okapi formula computed by hand") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "cherry cherry cherry")).toDF("doc_id", "text")
    val got = RetrievalOps.bm25TopK(docs, "doc_id", "text",
        terms = Seq("apple", "banana"), k = 10)
      .as[(Long, Double)].collect().toMap

    val n = 3.0; val avgdl = 8.0 / 3.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def norm(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val d1 = r6(idf(2) * norm(2, 3) + idf(1) * norm(1, 3))
    val d2 = r6(idf(2) * norm(1, 2))

    assert(got.keySet === Set(1L, 2L)) // doc 3 matches no term
    assert(math.abs(got(1L) - d1) < 1e-9)
    assert(math.abs(got(2L) - d2) < 1e-9)
    assert(got(1L) > got(2L)) // two matching terms, higher tf => higher rank
  }

  test("bm25TopK limit keeps the k best and breaks ties on doc_id") {
    val docs = (1L to 20L).map(i => (i, "apple")).toDF("doc_id", "text")
    val got = RetrievalOps.bm25TopK(docs, "doc_id", "text",
      terms = Seq("apple"), k = 5).as[(Long, Double)].collect()
    // identical docs => identical scores; tie-break selects smallest ids
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.map(_._2).distinct.length === 1)
  }
}
