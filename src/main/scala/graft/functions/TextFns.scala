package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines
  * (builder-prompt "text analysis" surface: tokenization, quality scoring,
  * language-ID heuristics, fingerprinting).
  *
  * Everything here is a pure Catalyst expression tree — codegen'd, no UDFs —
  * so the hot path stays inside WholeStageCodegen at 100 TB.
  */
object TextFns {

  /** Whitespace tokenizer (the BPE-ish regex split baseline). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct n-token shingles, space-joined. Empty array (not null) when the
    * document has fewer than `n` tokens.
    *
    * Built by zipping the token array with its own shifted slices —
    * `zip_with` pads the shorter side with null and `concat` propagates it,
    * so the trailing partial grams filter out. Deliberately avoids
    * per-element `element_at(toks, i)` lambdas: Catalyst inlines the
    * tokenizer expression into each access, turning shingling O(tokens²)
    * per document; the zip form stays linear.
    */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(rawShingles(toks, n))

  /** n-token shingles WITH multiplicity (one per position) — the input to
    * repetition statistics, where duplicate grams are the signal.
    */
  def rawShingles(toks: Column, n: Int): Column = {
    val grams = (2 to n).foldLeft(toks)((acc, j) =>
      zip_with(acc, slice(toks, lit(j), size(toks)), (a, b) => concat(a, lit(" "), b)))
    filter(grams, _.isNotNull)
  }

  /** Count of tokens equal to any of `words` (marker/stopword counting). */
  def tokenCountIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === w).reduce(_ || _)))

  /** Mean token length, null-safe for empty docs. */
  def avgTokenLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t).cast("double")), lit(0.0), _ + _) /
      size(toks).cast("double")

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased text
    * (exact-dedup key; the rolling-hash analogue with a portable kernel).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Smoothed IDF: ln((N+1)/(df+1)) + 1 (sklearn's smooth_idf formula —
    * public scikit-learn documentation). `n` and `df` are Long columns.
    */
  def smoothIdf(n: Column, df: Column): Column =
    log((n + lit(1.0)) / (df + lit(1.0))) + lit(1.0)

  /** Seeded shingle hash for MinHash: md5("<seed>:<shingle>"). Lexicographic
    * min over uniformly-distributed hex digests is a valid min-hash.
    */
  def seededHash(s: Column, seed: Int): Column = md5(concat(lit(s"$seed:"), s))

  /** One MinHash component: the minimum seeded hash over a shingle array. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => seededHash(s, seed)))
}
