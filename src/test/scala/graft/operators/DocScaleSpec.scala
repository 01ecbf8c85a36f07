package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scale probe for the document-corpus families with nontrivial join
  * machinery — ExactSubstr (d22-d24: inverted-index candidates → ONE
  * global suffix rank → adjacent LCP) and the eval metrics (t47-t49:
  * struct-ride gram explode → clipped-overlap join) — the GraphScaleSpec
  * discipline applied to text.
  *
  * The failure mode this guards: a quadratic tail sneaking into the
  * suffix-rank join (e.g. an accidental block × block candidate pairing)
  * or the gram joins (e.g. per-n corpus rescans multiplying out), which
  * correctness specs at fixture size can never see. 10× the docs must
  * cost well under the ~100× a quadratic term would show; thresholds sit
  * ~3× above the expected linear ratio (absorbing the per-stage scheduler
  * floor that dominates the small run) and ~3× below quadratic.
  *
  * Duplication volume scales WITH the corpus (every 4th doc carries one
  * of 8 boilerplate spans), so the candidate frames grow linearly too —
  * the regime the Lee et al. structure promises linear work in.
  */
class DocScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** ~40-token docs: 28 unique tokens + a 12-token boilerplate span on
    * every 4th doc (8 rotating variants) — deterministic, checkpointed so
    * probe timings exclude generation lineage.
    */
  private def docsDf(n: Int): DataFrame = {
    val boiler = (0 until 8).map(v =>
      (0 until 12).map(i => s"bp${v}_$i").mkString(" "))
    val body = concat_ws(" ",
      (0 until 28).map(i => concat(lit("d"), col("id"), lit(s"_t$i"))): _*)
    spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        when(col("id") % 4 === 0,
          concat_ws(" ", body,
            element_at(typedLit(boiler), (pmod(col("id") / 4, lit(8)) + 1).cast("int"))))
          .otherwise(body).as("text"))
      .localCheckpoint()
  }

  /** Adjacent-id eval pairing: even doc is the candidate of its successor. */
  private def pairsDf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("cand_id"),
        (col("doc_id") + 1).as("ref_id"))
      .filter(col("cand_id") % 2 === 0)

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def med3(f: => Unit): Double =
    Seq(time(f), time(f), time(f)).sorted.apply(1)

  test("ExactSubstr spans/pairs/scrub: 10x the docs costs ~10x, not 100x") {
    val d1 = docsDf(400)
    val d10 = docsDf(4000)
    QualityOps.exactSubstrSpans(d1, "doc_id", "text").count() // warm-up
    val s1 = med3(QualityOps.exactSubstrSpans(d1, "doc_id", "text").count())
    val s10 = med3(QualityOps.exactSubstrSpans(d10, "doc_id", "text").count())
    info(f"d22 spans |D|x10 ratio: ${s10 / s1}%.1f ($s1%.2fs -> $s10%.2fs)")
    assert(s10 / s1 < 30.0,
      f"exactSubstrSpans scaling ${s10 / s1}%.1fx for 10x docs — quadratic " +
        "tail in the suffix-rank machinery?")
    val p1 = med3(QualityOps.dupSpanPairs(d1, "doc_id", "text").count())
    val p10 = med3(QualityOps.dupSpanPairs(d10, "doc_id", "text").count())
    info(f"d23 pairs |D|x10 ratio: ${p10 / p1}%.1f ($p1%.2fs -> $p10%.2fs)")
    assert(p10 / p1 < 30.0, f"dupSpanPairs scaling ${p10 / p1}%.1fx")
    val c1 = med3(QualityOps.exactSubstrScrub(d1, "doc_id", "text").count())
    val c10 = med3(QualityOps.exactSubstrScrub(d10, "doc_id", "text").count())
    info(f"d24 scrub |D|x10 ratio: ${c10 / c1}%.1f ($c1%.2fs -> $c10%.2fs)")
    assert(c10 / c1 < 30.0, f"exactSubstrScrub scaling ${c10 / c1}%.1fx")
  }

  test("eval metrics BLEU/ROUGE-2/chrF: 10x the pairs costs ~10x, not 100x") {
    val d1 = docsDf(500)
    val d10 = docsDf(5000)
    val (p1, p10) = (pairsDf(d1).localCheckpoint(), pairsDf(d10).localCheckpoint())
    EvalOps.bleu(d1, "doc_id", "text", p1).count() // warm-up
    val b1 = med3(EvalOps.bleu(d1, "doc_id", "text", p1).count())
    val b10 = med3(EvalOps.bleu(d10, "doc_id", "text", p10).count())
    info(f"t47 bleu x10 ratio: ${b10 / b1}%.1f ($b1%.2fs -> $b10%.2fs)")
    assert(b10 / b1 < 30.0, f"bleu scaling ${b10 / b1}%.1fx for 10x pairs")
    val r1 = med3(EvalOps.rougeN(d1, "doc_id", "text", p1, n = 2).count())
    val r10 = med3(EvalOps.rougeN(d10, "doc_id", "text", p10, n = 2).count())
    info(f"t48 rouge2 x10 ratio: ${r10 / r1}%.1f ($r1%.2fs -> $r10%.2fs)")
    assert(r10 / r1 < 30.0, f"rougeN scaling ${r10 / r1}%.1fx")
    val f1 = med3(EvalOps.chrF(d1, "doc_id", "text", p1).count())
    val f10 = med3(EvalOps.chrF(d10, "doc_id", "text", p10).count())
    info(f"t49 chrf x10 ratio: ${f10 / f1}%.1f ($f1%.2fs -> $f10%.2fs)")
    assert(f10 / f1 < 30.0, f"chrF scaling ${f10 / f1}%.1fx")
    // the COMPOSED report (the e2e_eval_report shape): bleu ⋈ rouge ⋈ chrf
    def report(d: org.apache.spark.sql.DataFrame,
        p: org.apache.spark.sql.DataFrame): Long =
      EvalOps.bleu(d, "doc_id", "text", p, maxN = 2)
        .select("cand_id", "ref_id", "bleu")
        .join(EvalOps.rougeN(d, "doc_id", "text", p, n = 2)
          .select("cand_id", "ref_id", "rouge_f1"), Seq("cand_id", "ref_id"))
        .join(EvalOps.chrF(d, "doc_id", "text", p, maxN = 3)
          .select("cand_id", "ref_id", "chrf"), Seq("cand_id", "ref_id"))
        .count()
    report(d1, p1) // warm-up
    val e1 = med3(report(d1, p1))
    val e10 = med3(report(d10, p10))
    info(f"e2e report x10 ratio: ${e10 / e1}%.1f ($e1%.2fs -> $e10%.2fs)")
    assert(e10 / e1 < 30.0, f"composed eval report scaling ${e10 / e1}%.1fx")
  }
}
