package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE training/counting against hand-derived merge sequences. */
class BpeOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trainBpe learns the hand-derived merge sequence and counts collapse") {
    // pre-tokens: "abab"×2 (docs 1, 2), " ab"×1 (doc 1)
    // pair counts r1: (a,b)=5 [2+2 inside abab×2, 1 in " ab"], (b,a)=2,
    // (" ",a)=1 → merge (a,b)
    // r2: (ab,ab)=2, (" ",ab)=1 → merge (ab,ab)
    // r3: only (" ",ab)=1 left → merge (" ",ab); then no pairs remain
    val docs = Seq((1L, "abab ab"), (2L, "abab")).toDF("doc_id", "text")
    val (_, merges) = BpeOps.trainBpe(docs, "text", k = 5)
    assert(merges === Seq(("a", "b"), ("ab", "ab"), (" ", "ab")))

    val counts = BpeOps.bpeTokenCounts(docs, "doc_id", "text", k = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // every pre-token collapsed to a single symbol
    assert(counts === Seq((1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("merge scan is greedy left-to-right: aaa + (a,a) → [aa][a]") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val (_, merges) = BpeOps.trainBpe(docs, "text", k = 1)
    assert(merges === Seq(("a", "a")))
    val counts = BpeOps.bpeTokenCounts(docs, "doc_id", "text", k = 1)
      .as[(Long, Long, Long)].collect()
    assert(counts === Seq((1L, 1L, 2L))) // one pre-token, two subwords
  }

  test("adjacent matches merge in ONE round (sentinels share no chars)") {
    // "abababab": merging (a,b) must produce 4 [ab] symbols, not
    // alternate hits — the wrapped representation makes the replace
    // matches disjoint
    val docs = Seq((1L, "cabababab")).toDF("doc_id", "text")
    val (vocab, merges) = BpeOps.trainBpe(docs, "text", k = 1)
    assert(merges === Seq(("a", "b")))
    val ws = vocab.select("ws").as[String].collect().head
    val syms = ws.stripPrefix(BpeOps.S1).stripSuffix(BpeOps.S2)
      .split(BpeOps.S2 + BpeOps.S1).toSeq
    assert(syms === Seq("c", "ab", "ab", "ab", "ab"))
  }

  test("subword counts exceed pre-token counts and respect merges (corpus)") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val out = BpeOps.bpeTokenCounts(docs, "doc_id", "text", k = 5)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // merged subwords: strictly more subwords than pre-tokens is not
    // guaranteed per doc, but n_bpe >= n_pretoks always (a pre-token is
    // >= 1 subword) and globally chars >= bpe
    assert(out.forall { case (_, pre, bpe) => bpe >= pre && pre > 0 })
  }
}
