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
}
