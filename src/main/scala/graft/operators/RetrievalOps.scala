package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Keyword retrieval over a document corpus: BM25 scoring (Robertson &
  * Spärck Jones probabilistic relevance framework, the public Okapi BM25
  * formulation) as pure relational operators.
  *
  * Scale shape: the corpus is tokenized once; the term filter collapses the
  * exploded frame to |matching postings| rows before any shuffle; document
  * frequencies and the corpus stats are tiny aggregates (|terms| rows and 1
  * row) that ride as AQE-broadcast joins; the final top-k is
  * `orderBy().limit(k)` — TakeOrderedAndProject, no single-partition window.
  */
object RetrievalOps {

  /** Top-`k` documents by BM25 score for a bag of query `terms`.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    * with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) — the Lucene-style
    * floor-free variant, always positive. Docs matching no term are absent
    * (score 0). Ties break on rounded score then ascending id.
    * Determinism: each term's contribution is correctly rounded to integer
    * picos before the per-doc sum (the [[queryLikelihoodTopK]] pattern), so
    * the float total is summation-order-independent.
    */
  def bm25TopK(docs: DataFrame, id: String, text: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs
      .select(col(id), TextFns.tokens(col(text)).as("__toks"))
      .select(col(id), size(col("__toks")).cast("double").as("__dl"),
        explode(col("__toks")).as("__tok"))
    val lens = toks.groupBy(col(id)).agg(first(col("__dl")).as("__dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl"))
    val tf = toks.filter(col("__tok").isin(terms: _*))
      .groupBy(col(id), col("__tok"))
      .agg(count(lit(1)).cast("double").as("__tf"), first(col("__dl")).as("__dl"))
    val df_ = tf.groupBy(col("__tok"))
      .agg(countDistinct(col(id)).cast("double").as("__df"))
    val idf = log((col("__n") - col("__df") + lit(0.5)) /
      (col("__df") + lit(0.5)) + lit(1.0))
    val norm = col("__tf") * lit(k1 + 1.0) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    tf.join(df_, "__tok").crossJoin(stats)
      .select(col(id), round((idf * norm) * 1e12, 0).cast("long").as("__cfp"))
      .groupBy(col(id))
      .agg(round(sum(col("__cfp")) / 1e12, 6).as("score"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher's RRF) of several
    * ranked lists into one hybrid ranking:
    * `rrf(d) = Σ_lists 1/(c + rank_list(d))`, docs absent from a list
    * contribute nothing for it. The standard way to combine lexical
    * (BM25) and semantic (embedding) retrieval without score calibration
    * — only RANKS cross lists, so incomparable score scales fuse cleanly.
    *
    * Each input must carry (`id`, `score`); ranks are assigned by
    * (`score` desc, `id` asc) via [[RankOps.globalRowNumber]] — the
    * two-phase exchange-parallel form, no single-partition window even
    * when a caller fuses unbounded lists. Output: top-`k` by fused score
    * (rounded to 6), ties on ascending id.
    */
  def rrfFuse(lists: Seq[DataFrame], id: String, k: Int,
      c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: need at least one ranked list")
    val contribs = lists.map { l =>
      RankOps.globalRowNumber(l.select(col(id), col("score")),
          Seq(col("score").desc, col(id).asc), "__rank")
        .select(col(id), (lit(1.0) / (lit(c) + col("__rank"))).as("__rr"))
    }
    contribs.reduce(_ unionAll _)
      .groupBy(col(id))
      .agg(round(sum(col("__rr")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(id).asc)
      .limit(k)
  }

  /** RAKE keyword extraction (Rose et al.'s Rapid Automatic Keyword
    * Extraction) over the whole corpus: candidate phrases are maximal
    * runs of non-stopword tokens, each word scores
    * `degree/frequency` (degree = Σ length of the phrases it appears in,
    * frequency = its occurrence count across phrases), and a phrase
    * scores the sum of its member word scores. Returns the top-`k`
    * distinct phrases by score (ties on the phrase text).
    *
    * Scale shape: phrase segmentation is a per-doc cumsum window (state
    * bounded by one document); word and phrase scores are two hash
    * aggregates over the exploded (phrase, word) frame with an equi-join
    * between them — never phrase × phrase. Determinism: each word score
    * is correctly rounded to integer picos before the per-phrase sum, so
    * the float total is summation-order-independent (the
    * `categoricalAssociation` argument).
    */
  def rakeTopK(docs: DataFrame, id: String, text: String,
      stopWords: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(id),
        posexplode(TextFns.tokens(lower(col(text)))).as(Seq("__pos", "__w")))
      .withColumn("__stop", col("__w").isin(stopWords: _*))
    // phrase id = running stopword count: consecutive non-stop tokens
    // share one id, every stopword bumps it (and is then dropped)
    val w = Window.partitionBy(col(id)).orderBy(col("__pos"))
    val phrased = toks
      .withColumn("__pid", sum(col("__stop").cast("long")).over(w))
      .filter(!col("__stop"))
    // collect_list order is partition-arbitrary → sort the (pos, word)
    // structs before joining, so the phrase text is position-ordered
    val phrases = phrased.groupBy(col(id), col("__pid"))
      .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("__pos"), col("__w")))),
            s => s.getField("__w"))).as("phrase"),
        count(lit(1)).as("__len"))
    val members = phrased.select(col(id), col("__pid"), col("__w"))
      .join(phrases, Seq(id, "__pid"))
    val wordScores = members.groupBy(col("__w"))
      .agg((sum(col("__len")).cast("double") / count(lit(1))).as("__ws"))
      .select(col("__w"),
        round(col("__ws") * 1e12, 0).cast("long").as("__wsfp"))
    members.join(wordScores, Seq("__w"))
      .groupBy(col("phrase"))
      .agg(count_distinct(col(id), col("__pid")).as("n_occurrences"),
        round((sum(col("__wsfp")) /
          count_distinct(col(id), col("__pid"))) / 1e12, 6).as("score"))
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(k)
  }

  /** Query-likelihood language-model retrieval with Dirichlet smoothing
    * (Zhai & Lafferty 2001/2004 — the standard LM alternative to BM25):
    *
    * score(d) = Σ_{t∈q} ln( (tf(t,d) + µ·cf(t)/|C|) / (|d| + µ) )
    *
    * where cf(t) is t's corpus frequency and |C| the corpus token total.
    * Unlike BM25 the sum runs over ALL query terms — absent terms
    * contribute the smoothed background mass, not zero — so every doc
    * scores (and long docs aren't spuriously favored). Top-`k` by score,
    * ties on ascending id.
    *
    * Scale shape: the dense doc×term frame comes from exploding the
    * LITERAL term array over the per-doc length frame (a generator, not a
    * join — |terms| is a bounded constant); tf attaches with one hash
    * left-join on (id, term); cf is a |terms|-row aggregate and the
    * corpus total a 1-row broadcast (the t19 stats pattern). Terms absent
    * from the corpus entirely (cf = 0, smoothed mass 0, ln undefined) are
    * excluded by the inner cf join — the standard OOV convention.
    * Determinism:
    * each term's log-contribution is correctly rounded to integer picos
    * before the per-doc sum, so the float total is summation-order-
    * independent (the rakeTopK argument).
    */
  def queryLikelihoodTopK(docs: DataFrame, id: String, text: String,
      terms: Seq[String], k: Int, mu: Double = 200.0): DataFrame = {
    val toks = docs
      .select(col(id), TextFns.tokens(col(text)).as("__toks"))
      .select(col(id), size(col("__toks")).cast("double").as("__dl"),
        explode(col("__toks")).as("__tok"))
    val lens = toks.groupBy(col(id)).agg(first(col("__dl")).as("__dl"))
    val total = toks.agg(count(lit(1)).cast("double").as("__c"))
    val cf = toks.filter(col("__tok").isin(terms: _*))
      .groupBy(col("__tok"))
      .agg(count(lit(1)).cast("double").as("__cf"))
    val dense = lens
      .select(col(id), col("__dl"),
        explode(typedLit(terms)).as("__tok"))
    val tf = toks.filter(col("__tok").isin(terms: _*))
      .groupBy(col(id), col("__tok"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val contrib = log(
      (coalesce(col("__tf"), lit(0.0)) + lit(mu) * (col("__cf") / col("__c"))) /
        (col("__dl") + lit(mu)))
    dense
      .join(tf, Seq(id, "__tok"), "left")
      .join(cf, Seq("__tok"))
      .crossJoin(total)
      .select(col(id), round(contrib * 1e12, 0).cast("long").as("__cfp"))
      .groupBy(col(id))
      .agg(round(sum(col("__cfp")) / 1e12, 6).as("score"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
  }
}
