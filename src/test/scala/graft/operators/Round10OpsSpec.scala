package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-checkable cases for the round-10 additions: duplicated-span pair
  * attribution, lexical richness, and the Gopher repetition rules.
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  // --- dupSpanPairs -------------------------------------------------------

  test("dupSpanPairs attributes a planted shared span to the right pair") {
    val span = toks("s", 50)
    val a = (toks("u", 20) ++ span ++ toks("v", 20)).mkString(" ")
    val b = (toks("w", 20) ++ span ++ toks("x", 20)).mkString(" ")
    val c = toks("y", 60).mkString(" ") // shares nothing
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val r = QualityOps.dupSpanPairs(df, "doc_id", "text").collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("doc_a") === 1L)
    assert(r(0).getAs[Long]("doc_b") === 2L)
    assert(r(0).getAs[Long]("max_shared_span") === 50L)
  }

  test("dupSpanPairs: within-doc repetition alone yields no cross-doc pair") {
    val rep = toks("x", 10)
    val df = Seq((1L, (rep ++ rep).mkString(" ")),
      (2L, toks("z", 30).mkString(" "))).toDF("doc_id", "text")
    assert(QualityOps.dupSpanPairs(df, "doc_id", "text").count() === 0L)
  }

  // --- lexicalRichness ----------------------------------------------------

  test("lexicalRichness: hand-checked spectrum (a a b c)") {
    val df = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val r = QualityOps.lexicalRichness(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("n_types") === 3L)
    assert(r.getAs[Long]("hapax") === 2L)
    assert(r.getAs[Double]("ttr") === 0.75)
    assert(r.getAs[Double]("hapax_ratio") === 0.666667)
    // K = 1e4 * (Σ m²V − N) / N² = 1e4 * ((4·1 + 1·2) − 4) / 16 = 1250
    assert(r.getAs[Double]("yules_k") === 1250.0)
  }

  test("lexicalRichness: all-distinct doc has K = 0 and TTR = 1") {
    val df = Seq((1L, toks("w", 20).mkString(" "))).toDF("doc_id", "text")
    val r = QualityOps.lexicalRichness(df, "doc_id", "text").head()
    assert(r.getAs[Double]("yules_k") === 0.0)
    assert(r.getAs[Double]("ttr") === 1.0)
    assert(r.getAs[Double]("hapax_ratio") === 1.0)
  }

  // --- gopherRepetition ---------------------------------------------------

  test("gopherRepetition flags a looping doc and passes a diverse one") {
    val spam = Seq.fill(30)("spam ham").mkString(" ") // 60 tokens, 2 types
    val clean = toks("word", 60).mkString(" ")
    val df = Seq((1L, spam), (2L, clean)).toDF("doc_id", "text")
    val r = QualityOps.gopherRepetition(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // spam: top bigram "spam ham" occurs 30x, chars = 30·(4+3) = 210,
    // frac = 30·7/210 = 1.0; every 5-gram repeats → full coverage
    assert(r(0).getAs[String]("top_bigram") === "spam ham")
    assert(r(0).getAs[Double]("top_bigram_frac") === 1.0)
    assert(r(0).getAs[Double]("dup5_coverage") === 1.0)
    assert(r(0).getAs[Int]("keep") === 0)
    // clean: every bigram unique → tiny top fraction, zero dup coverage
    assert(r(1).getAs[Double]("dup5_coverage") === 0.0)
    assert(r(1).getAs[Double]("top_bigram_frac") < 0.05)
    assert(r(1).getAs[Int]("keep") === 1)
  }

  // --- knBigramLogProb ----------------------------------------------------

  test("knBigramLogProb: hand-checked interpolated KN on a tiny corpus") {
    // bigrams of "a b a b a c": ab x2, ba x2, ac x1
    // ctx a: cv=3 n1v=2; ctx b: cv=2 n1v=1; cont b/a/c: n1w=1 each; nbb=3
    val df = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val r = SummaryOps.knBigramLogProb(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_bigrams") === 5L)
    val pAB = (2 - 0.75 + 0.75 * 2 * (1.0 / 3)) / 3
    val pBA = (2 - 0.75 + 0.75 * 1 * (1.0 / 3)) / 2
    val pAC = (math.max(1 - 0.75, 0.0) + 0.75 * 2 * (1.0 / 3)) / 3
    val expected =
      (2 * math.log(pAB) + 2 * math.log(pBA) + math.log(pAC)) / 5
    assert(math.abs(r.getAs[Double]("avg_logprob_kn") - expected) < 1e-5)
  }

  test("knBigramLogProb: a deterministic single-continuation corpus scores 0") {
    // one bigram "x y": P(y|x) = (1−D)/1 + (D·1/1)·(1/1) = 1 → ln = 0
    val df = Seq((1L, "x y")).toDF("doc_id", "text")
    val r = SummaryOps.knBigramLogProb(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_bigrams") === 1L)
    assert(r.getAs[Double]("avg_logprob_kn") === 0.0)
  }

  // --- pqTrain ------------------------------------------------------------

  test("pqTrain: trained codebooks beat the seed codebooks on distortion") {
    import graft.ann.Pq
    // 40 vectors in 16 dims, two well-separated blobs per half-space
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 1.0 else 9.0
      (i.toLong, Array.tabulate(16)(d => (base + (i * 7 + d) % 3 * 0.1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Pq.pqTrain(df, "vec_id", "embedding",
      m = 2, subDim = 8, k = 2, iters = 3)
    val rows = cb.collect()
    assert(rows.length === 2 * 2 * 8) // m * k * subDim tall rows
    // every vector lands on some codeword and both codewords are used
    val byCw = rows.map(r => (r.getAs[Int]("subspace"),
      r.getAs[Int]("codeword")) -> r.getAs[Long]("n_assigned")).toMap
    assert(byCw.values.sum === 2L * 40) // m assignments per vector
    assert(byCw.values.forall(_ > 0L))
    // trained centroids sit near the blob centers (1.x and 9.x), not the
    // two seed vectors' raw values only
    val cvs = rows.map(_.getAs[Double]("c_v"))
    assert(cvs.exists(v => v > 0.5 && v < 2.0))
    assert(cvs.exists(v => v > 8.5 && v < 10.0))
  }

  test("gopherRepetition: single-token doc has no bigram, zero fractions") {
    val df = Seq((1L, "lonely")).toDF("doc_id", "text")
    val r = QualityOps.gopherRepetition(df, "doc_id", "text").head()
    assert(r.isNullAt(r.fieldIndex("top_bigram")))
    assert(r.getAs[Double]("top_bigram_frac") === 0.0)
    assert(r.getAs[Double]("dup5_coverage") === 0.0)
    assert(r.getAs[Int]("keep") === 1)
  }
}
