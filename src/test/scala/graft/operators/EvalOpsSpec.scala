package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed BLEU / ROUGE cases (Papineni et al. 2002's shapes). */
class EvalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat is on the mat"),
    (3L, "completely different words here"),
    (4L, "the cat"),
    (5L, "the cat is here")).toDF("doc_id", "text")

  test("bleu: classic cat-on-the-mat pair") {
    val pairs = Seq((1L, 2L)).toDF("cand_id", "ref_id")
    val r = EvalOps.bleu(docs, "doc_id", "text", pairs, maxN = 2).head()
    // clipped: the×2, cat, on, mat → m1=5; "the cat","on the","the mat" → m2=3
    assert(r.getAs[Long]("m1") === 5L)
    assert(r.getAs[Long]("m2") === 3L)
    assert(r.getAs[Double]("bp") === 1.0)
    // sqrt((5/6)*(3/5)) = sqrt(0.5)
    assert(r.getAs[Double]("bleu") === 0.707107)
  }

  test("bleu: zero bigram overlap scores 0, unmatched pair scores 0") {
    val pairs = Seq((1L, 3L)).toDF("cand_id", "ref_id")
    val r = EvalOps.bleu(docs, "doc_id", "text", pairs, maxN = 2).head()
    assert(r.getAs[Long]("m1") === 0L)
    assert(r.getAs[Double]("bleu") === 0.0)
  }

  test("bleu: brevity penalty on a short candidate") {
    val pairs = Seq((4L, 5L)).toDF("cand_id", "ref_id")
    val r = EvalOps.bleu(docs, "doc_id", "text", pairs, maxN = 2).head()
    // p1 = 2/2, p2 = 1/1, bp = exp(1 - 4/2) = e^-1
    assert(r.getAs[Long]("m1") === 2L)
    assert(r.getAs[Long]("m2") === 1L)
    assert(r.getAs[Double]("bp") === 0.367879)
    assert(r.getAs[Double]("bleu") === 0.367879)
  }

  test("rougeN: recall, precision, F1 on the classic pair") {
    val pairs = Seq((1L, 2L)).toDF("cand_id", "ref_id")
    val r = EvalOps.rougeN(docs, "doc_id", "text", pairs, n = 2).head()
    assert(r.getAs[Long]("matches") === 3L)
    assert(r.getAs[Double]("rouge_r") === 0.6)
    assert(r.getAs[Double]("rouge_p") === 0.6)
    assert(r.getAs[Double]("rouge_f1") === 0.6)
  }

  test("rougeN: one-token reference has no bigrams, scores 0") {
    val tiny = Seq((1L, "hello"), (2L, "hello world")).toDF("doc_id", "text")
    val pairs = Seq((2L, 1L)).toDF("cand_id", "ref_id")
    val r = EvalOps.rougeN(tiny, "doc_id", "text", pairs, n = 2).head()
    assert(r.getAs[Double]("rouge_r") === 0.0)
    assert(r.getAs[Double]("rouge_f1") === 0.0)
  }

  test("chrF: hand-computed clipped char-gram averages") {
    val d = Seq((1L, "ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("cand_id", "ref_id")
    val r = EvalOps.chrF(d, "doc_id", "text", pairs, maxN = 3).head()
    // chars: "abab" vs "ab"; m1=2, m2=1, m3=0
    // P = (2/4 + 1/3 + 0/2)/3 = 5/18; R = (2/2 + 1/1 + 0)/3 = 2/3
    assert(r.getAs[Long]("len_c") === 4L)
    assert(r.getAs[Long]("len_r") === 2L)
    assert(r.getAs[Double]("chrf_p") === 0.277778)
    assert(r.getAs[Double]("chrf_r") === 0.666667)
    // F2 = 5PR/(4P+R) = (25/27)/(16/9) = 225/432
    assert(r.getAs[Double]("chrf") === 0.520833)
  }

  test("chrF: identical pair scores 1; whitespace never matters") {
    val d = Seq((1L, "a b  c"), (2L, "abc")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("cand_id", "ref_id")
    val r = EvalOps.chrF(d, "doc_id", "text", pairs, maxN = 3).head()
    assert(r.getAs[Double]("chrf_p") === 1.0)
    assert(r.getAs[Double]("chrf_r") === 1.0)
    assert(r.getAs[Double]("chrf") === 1.0)
  }

  test("chrF: zero overlap scores 0 without dividing by zero") {
    val d = Seq((1L, "xyz"), (2L, "abc")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("cand_id", "ref_id")
    val r = EvalOps.chrF(d, "doc_id", "text", pairs, maxN = 3).head()
    assert(r.getAs[Double]("chrf") === 0.0)
  }
}
