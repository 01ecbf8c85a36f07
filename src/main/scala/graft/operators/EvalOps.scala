package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Reference-based text-generation eval metrics (BLEU, ROUGE-N) computed
  * corpus-wide — the scoring half of an LLM eval-data pipeline, where every
  * (candidate, reference) pair in a generated eval set gets its n-gram
  * overlap metrics in one distributed pass (Papineni et al. 2002, BLEU; Lin
  * 2004, ROUGE).
  *
  * Scale shape: the pair list is an input (each candidate names its
  * reference — an equi-keyed frame, never generated all-pairs here), and
  * every join is an equi-join on `doc_id` or `(doc_id, n, gram)`. A
  * document's gram frame is linear in its token count and each document
  * participates in O(1) pairs, so the whole computation is one explode +
  * two hash joins + one hash aggregate — no window over the corpus, no
  * Cartesian, broadcast-free (both sides are corpus-sized). Clipped match
  * counts stay integers end-to-end; the only floating point is the final
  * per-pair scalar (log/exp of integer ratios), rounded to 6dp on both
  * engines.
  */
object EvalOps {

  /** Per-pair clipped n-gram overlap counts for n = 1..maxN.
    *
    * Input `pairs`: columns `cand_id`, `ref_id` (both keying `docs(idCol)`).
    * Output: one row per pair with `len_c`, `len_r` (token counts) and
    * `m1..m<maxN>` — the clipped matches sum(min(count_cand(g),
    * count_ref(g))) over distinct grams g, the shared numerator of BLEU
    * precision and ROUGE recall.
    *
    * min(c, 0) contributes nothing, so grams absent from either side drop
    * out via the inner join — the join output is bounded by the smaller
    * gram frame, never materializing the union vocabulary.
    */
  def ngramOverlap(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, maxN: Int): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val toks = restrictToPaired(docs, idCol, pairs)
      .select(col(idCol).as("__id"), TextFns.tokens(col(textCol)).as("__toks"))

    // ONE corpus pass for all n: every n's grams ride out of the same
    // explode as (n, gram) structs — a per-n union of explode+agg branches
    // would rescan the paired docs maxN times
    val gramArrays = (1 to maxN).map { n =>
      val g = if (n == 1) col("__toks") else TextFns.rawShingles(col("__toks"), n)
      transform(g, x => struct(lit(n).as("n"), x.as("g")))
    }
    val grams = toks
      .select(col("__id"), explode(concat(gramArrays: _*)).as("__t"))
      .select(col("__id"), col("__t.n").as("__n"), col("__t.g").as("__gram"))
      .groupBy("__id", "__n", "__gram").agg(count(lit(1)).as("__cnt"))

    val lens = toks.select(col("__id"), size(col("__toks")).cast("long").as("__len"))
    clippedOverlap(grams, lens, pairs, maxN)
  }

  /** [[ngramOverlap]] over CHARACTER n-grams of the whitespace-stripped
    * text (the chrF convention — Popović 2015 strips spaces so the metric
    * is tokenization-free). `len_c`/`len_r` are character counts.
    */
  def charNgramOverlap(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, maxN: Int): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val base = restrictToPaired(docs, idCol, pairs)
      .select(col(idCol).as("__id"),
        regexp_replace(col(textCol), "\\s+", "").as("__chars"))

    // ONE corpus pass for all n (see ngramOverlap). sequence(1, stop)
    // DESCENDS when stop < 1 in Spark, so each n's positional expansion is
    // guarded by a CASE to an empty array instead of a per-n doc filter
    val gramArrays = (1 to maxN).map { n =>
      val g = expr(s"CASE WHEN length(__chars) >= $n THEN " +
        s"transform(sequence(1, length(__chars) - ${n - 1}), " +
        s"i -> substring(__chars, i, $n)) ELSE array() END")
      transform(g, x => struct(lit(n).as("n"), x.as("g")))
    }
    val grams = base
      .select(col("__id"), explode(concat(gramArrays: _*)).as("__t"))
      .select(col("__id"), col("__t.n").as("__n"), col("__t.g").as("__gram"))
      .groupBy("__id", "__n", "__gram").agg(count(lit(1)).as("__cnt"))

    val lens = base.select(col("__id"),
      length(col("__chars")).cast("long").as("__len"))
    clippedOverlap(grams, lens, pairs, maxN)
  }

  /** [[ngramOverlap]] and [[charNgramOverlap]] fused into ONE machine:
    * a shared front end building both at once pays one paired-doc scan,
    * one explode→count aggregate, one pair-match join and one pivot
    * where two separate machines pay each twice — the per-pair frames are
    * floor-bound (a handful of task-seconds over ~15 exchanges), so
    * halving the exchange count halves the build.
    *
    * Word grams ride tag `n`, char grams tag `100 + n` (disjoint, so the
    * `(id, n, gram)` match join can never cross kinds), and the pivot
    * emits both metric families side by side. Output per pair:
    * `m1..m<wordMaxN>, len_c, len_r` (token counts — exactly
    * [[ngramOverlap]]'s columns) plus `cm1..cm<charMaxN>, clen_c, clen_r`
    * (char counts — [[charNgramOverlap]]'s columns under a `c` prefix).
    * Each family's values are bit-identical to its standalone machine:
    * the per-(id, tag, gram) counts, the clipped min-sum and the
    * left-join pivot all partition cleanly by tag.
    */
  def wordCharOverlap(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, wordMaxN: Int, charMaxN: Int): DataFrame = {
    require(wordMaxN >= 1 && wordMaxN < 100,
      s"wordMaxN must be in [1, 99], got $wordMaxN")
    require(charMaxN >= 1, s"charMaxN must be >= 1, got $charMaxN")
    val base = restrictToPaired(docs, idCol, pairs)
      .select(col(idCol).as("__id"),
        TextFns.tokens(col(textCol)).as("__toks"),
        regexp_replace(col(textCol), "\\s+", "").as("__chars"))
    val wordArrays = (1 to wordMaxN).map { n =>
      val g = if (n == 1) col("__toks") else TextFns.rawShingles(col("__toks"), n)
      transform(g, x => struct(lit(n).as("n"), x.as("g")))
    }
    val charArrays = (1 to charMaxN).map { n =>
      val g = expr(s"CASE WHEN length(__chars) >= $n THEN " +
        s"transform(sequence(1, length(__chars) - ${n - 1}), " +
        s"i -> substring(__chars, i, $n)) ELSE array() END")
      transform(g, x => struct(lit(100 + n).as("n"), x.as("g")))
    }
    val grams = base
      .select(col("__id"),
        explode(concat(wordArrays ++ charArrays: _*)).as("__t"))
      .select(col("__id"), col("__t.n").as("__n"), col("__t.g").as("__gram"))
      .groupBy("__id", "__n", "__gram").agg(count(lit(1)).as("__cnt"))
    val lens = base.select(col("__id"),
      size(col("__toks")).cast("long").as("__wlen"),
      length(col("__chars")).cast("long").as("__clen"))
    val p = pairs.select(col("cand_id"), col("ref_id"))
    val matched = p
      .join(grams.as("gc"), col("cand_id") === col("gc.__id"))
      .join(grams.as("gr"),
        col("ref_id") === col("gr.__id") &&
          col("gc.__n") === col("gr.__n") && col("gc.__gram") === col("gr.__gram"))
      .groupBy(col("cand_id"), col("ref_id"), col("gc.__n").as("__n"))
      .agg(sum(least(col("gc.__cnt"), col("gr.__cnt"))).as("__m"))
    val mCols = (1 to wordMaxN).map(n =>
      coalesce(max(when(col("__n") === n, col("__m"))), lit(0L)).as(s"m$n")) ++
      (1 to charMaxN).map(n =>
        coalesce(max(when(col("__n") === (100 + n), col("__m"))), lit(0L))
          .as(s"cm$n"))
    p.join(matched, Seq("cand_id", "ref_id"), "left")
      .groupBy("cand_id", "ref_id")
      .agg(mCols.head, mCols.tail: _*)
      .join(lens.select(col("__id").as("cand_id"), col("__wlen").as("len_c"),
        col("__clen").as("clen_c")), Seq("cand_id"))
      .join(lens.select(col("__id").as("ref_id"), col("__wlen").as("len_r"),
        col("__clen").as("clen_r")), Seq("ref_id"))
  }

  /** Gram frames are only needed for documents that appear in some pair —
    * an eval set is typically a sliver of the corpus, so the explode runs
    * behind a left-semi join on the pair ids (skinny, deduped by the
    * semi-join itself) instead of over everything.
    */
  private def restrictToPaired(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val ids = pairs.select(col("cand_id").as("__pid"))
      .unionByName(pairs.select(col("ref_id").as("__pid")))
    docs.join(ids, col(idCol) === col("__pid"), "left_semi")
  }

  /** The shared clipped-match core: joins per-id gram-count frames to the
    * pair list and closes m1..mN as exact integers (see [[ngramOverlap]]
    * for the scale argument).
    */
  private def clippedOverlap(grams: DataFrame, lens: DataFrame,
      pairs: DataFrame, maxN: Int): DataFrame = {
    val p = pairs.select(col("cand_id"), col("ref_id"))
    val matched = p
      .join(grams.as("gc"), col("cand_id") === col("gc.__id"))
      .join(grams.as("gr"),
        col("ref_id") === col("gr.__id") &&
          col("gc.__n") === col("gr.__n") && col("gc.__gram") === col("gr.__gram"))
      .groupBy(col("cand_id"), col("ref_id"), col("gc.__n").as("__n"))
      .agg(sum(least(col("gc.__cnt"), col("gr.__cnt"))).as("__m"))

    val mCols = (1 to maxN).map(n =>
      coalesce(max(when(col("__n") === n, col("__m"))), lit(0L)).as(s"m$n"))

    p.join(matched, Seq("cand_id", "ref_id"), "left")
      .groupBy("cand_id", "ref_id")
      .agg(mCols.head, mCols.tail: _*)
      .join(lens.withColumnRenamed("__id", "cand_id")
        .withColumnRenamed("__len", "len_c"), Seq("cand_id"))
      .join(lens.withColumnRenamed("__id", "ref_id")
        .withColumnRenamed("__len", "len_r"), Seq("ref_id"))
  }

  /** Per-pair BLEU-maxN with the standard brevity penalty and NO smoothing:
    * any zero modified precision zeroes the score (the corpus-filtering
    * convention — a pair with no shared bigram is simply not a match).
    * Output: `cand_id, ref_id, len_c, len_r, m1..mN, bp, bleu`.
    */
  def bleu(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, maxN: Int = 2): DataFrame =
    bleuFromOverlap(ngramOverlap(docs, idCol, textCol, pairs, maxN), maxN)

  /** [[bleu]] over a pre-built [[ngramOverlap]] frame (built with the
    * same `maxN`) — the shared-front-end form: BLEU and ROUGE close over
    * the IDENTICAL clipped-match frame, so a caller scoring both pays
    * the gram machinery once.
    */
  def bleuFromOverlap(ov: DataFrame, maxN: Int): DataFrame = {
    // total n-grams in the candidate: len_c - n + 1 (0 when len_c < n)
    def total(n: Int): Column = greatest(col("len_c") - (n - 1), lit(0L))
    val logSum = (1 to maxN).map(n =>
      log(col(s"m$n").cast("double") / total(n).cast("double"))).reduce(_ + _)
    val anyZero = (1 to maxN).map(n =>
      col(s"m$n") === 0 || total(n) === 0).reduce(_ || _)
    val bp = when(col("len_c") >= col("len_r"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("len_r").cast("double") / col("len_c").cast("double")))
    ov.withColumn("bp", round(bp, 6))
      .withColumn("bleu",
        when(anyZero, lit(0.0))
          .otherwise(round(bp * exp(logSum / maxN), 6)) + lit(0.0))
  }

  /** Per-pair ROUGE-N recall / precision / F1 for a single n. Pairs where
    * either side has fewer than n tokens score 0 (no grams to match).
    * Output: `cand_id, ref_id, len_c, len_r, matches, rouge_r, rouge_p,
    * rouge_f1`.
    */
  def rougeN(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, n: Int): DataFrame =
    rougeNFromOverlap(ngramOverlap(docs, idCol, textCol, pairs, n), n)

  /** [[rougeN]] over a pre-built [[ngramOverlap]] frame carrying `m$n`
    * (any maxN ≥ n works — the extra m-columns just pass through unused).
    */
  def rougeNFromOverlap(ov: DataFrame, n: Int): DataFrame = {
    val m = col(s"m$n").cast("double")
    val totC = greatest(col("len_c") - (n - 1), lit(0L)).cast("double")
    val totR = greatest(col("len_r") - (n - 1), lit(0L)).cast("double")
    val r = when(totR > 0, m / totR).otherwise(lit(0.0))
    val p = when(totC > 0, m / totC).otherwise(lit(0.0))
    val f1 = when(r + p > 0, lit(2.0) * r * p / (r + p)).otherwise(lit(0.0))
    ov.select(col("cand_id"), col("ref_id"), col("len_c"), col("len_r"),
      col(s"m$n").as("matches"),
      (round(r, 6) + lit(0.0)).as("rouge_r"),
      (round(p, 6) + lit(0.0)).as("rouge_p"),
      (round(f1, 6) + lit(0.0)).as("rouge_f1"))
  }

  /** Per-pair chrF (Popović 2015): character n-gram precision/recall
    * macro-averaged over n = 1..maxN, combined as F-β (β = 2 weights
    * recall 4×, the published default). An n with no grams on a side
    * contributes 0 to that side's average (documented divergence from
    * sacrebleu's skip-empty-n, which would make the divisor data-
    * dependent). All per-row scalar math — order-independent, identical
    * IEEE sequence on both engines — rounded 6dp at the close.
    * Output: `cand_id, ref_id, len_c, len_r, chrf_p, chrf_r, chrf`.
    */
  def chrF(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, maxN: Int = 3, beta: Double = 2.0): DataFrame =
    chrFFromOverlap(
      charNgramOverlap(docs, idCol, textCol, pairs, maxN), maxN, beta)

  /** [[chrF]] over a pre-built [[charNgramOverlap]] frame (same `maxN`). */
  def chrFFromOverlap(ov: DataFrame, maxN: Int,
      beta: Double = 2.0): DataFrame = {
    def totC(n: Int): Column = greatest(col("len_c") - (n - 1), lit(0L))
    def totR(n: Int): Column = greatest(col("len_r") - (n - 1), lit(0L))
    val p = (1 to maxN).map(n => when(totC(n) > 0,
      col(s"m$n").cast("double") / totC(n).cast("double"))
      .otherwise(lit(0.0))).reduce(_ + _) / maxN
    val r = (1 to maxN).map(n => when(totR(n) > 0,
      col(s"m$n").cast("double") / totR(n).cast("double"))
      .otherwise(lit(0.0))).reduce(_ + _) / maxN
    val b2 = beta * beta
    val f = when(p + r > lit(0.0),
      (lit(1.0 + b2) * p * r) / (lit(b2) * p + r)).otherwise(lit(0.0))
    ov.select(col("cand_id"), col("ref_id"), col("len_c"), col("len_r"),
      (round(p, 6) + lit(0.0)).as("chrf_p"),
      (round(r, 6) + lit(0.0)).as("chrf_r"),
      (round(f, 6) + lit(0.0)).as("chrf"))
  }
}
