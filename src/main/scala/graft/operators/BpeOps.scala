package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenization (Sennrich et al. 2016, the
  * public BPE algorithm behind the GPT-2/RoBERTa tokenizers): train `k`
  * greedy merges on the corpus, then count REAL subword tokens per
  * document — the budget/packing primitives misestimate by 1.3-2× when
  * fed whitespace counts (the reference's own budget is tokenizer-based,
  * `model/tokenization.py:46-47`; `t32` only counts PRE-tokens).
  *
  * Scale shape: the corpus is scanned ONCE into a (pre-token, count)
  * vocabulary — bounded by Heaps' law, ~10⁵-10⁶ rows at 100 TB, NOT
  * corpus-sized — and the k training rounds iterate on that compact
  * frame alone (one pair-count aggregate + one 1-row collect each,
  * `localCheckpoint` per round to keep lineage flat, the GraphOps
  * fixed-point pattern). Scoring is a second single corpus pass joined
  * against the BROADCAST vocabulary. No UDFs anywhere: the symbol
  * sequence of a word lives as a SENTINEL-WRAPPED STRING —
  * "S1 l S2 S1 o S2 …" with S1=U+0001, S2=U+0002 — so one merge round is
  * one codegen'd `replace` of "S1 a S2 S1 b S2" with "S1 ab S2"
  * (left-to-right non-overlapping, and because every symbol carries its
  * own closing+opening sentinels, adjacent matches share no characters —
  * exactly BPE's greedy scan), and the per-word token count is
  * `length(ws) − length(replace(ws, S2, ""))`.
  *
  * Determinism: pair ranking uses exact integer counts with a total
  * (count DESC, left ASC, right ASC) tie-break, so the merge table — and
  * therefore every count — is identical across engines, partitionings
  * and AQE modes; the oracle unrolls the same k rounds as chained CTEs
  * (the v10 pattern).
  */
object BpeOps {

  /** Symbol sentinels: each symbol rides as S1+sym+S2. Control chars 1/2
    * never occur in text columns (and CHR(1)/CHR(2) mirror them in SQL).
    */
  val S1 = "\u0001"
  val S2 = "\u0002"

  /** GPT-2-style pre-tokenizer alternation (contractions, letter runs,
    * digit runs, punctuation runs, whitespace) — leftmost-first in both
    * Java regex and RE2, shared with `t32_subword_count`.
    */
  val Gpt2Pretokenizer: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+|\\s+"

  /** One row per pre-token occurrence: (id cols…, word). */
  def preTokens(docs: DataFrame, textCol: String, keep: Column*): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(keep :+ explode(regexp_extract_all(col(textCol),
        lit(Gpt2Pretokenizer), lit(0))).as("word"): _*)

  /** Train `k` greedy merges; returns the vocabulary frame
    * (word, cnt, ws) after all merges plus the merge table itself.
    * The only driver-side data are k single-row top-pair collects.
    */
  def trainBpe(docs: DataFrame, textCol: String,
      k: Int): (DataFrame, Seq[(String, String)]) = {
    var vocab = preTokens(docs, textCol)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("ws", regexp_replace(col("word"), "(.)", S1 + "$1" + S2))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ListBuffer[(String, String)]()
    var r = 0
    var dry = false
    while (r < k && !dry) {
      val syms = split(trim(col("ws"), S1 + S2), S2 + S1)
      val top = vocab
        .select(col("cnt"), syms.as("l"))
        .filter(size(col("l")) >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(col("l"), lit(1), size(col("l")) - 1),
          slice(col("l"), lit(2), size(col("l")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect() // bounded: exactly one row crosses the driver
      if (top.isEmpty) dry = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        merges += ((a, b))
        vocab = vocab.withColumn("ws",
          replace(col("ws"), lit(S1 + a + S2 + S1 + b + S2),
            lit(S1 + a + b + S2)))
          .localCheckpoint(false)
        r += 1
      }
    }
    (vocab, merges.toList)
  }

  /** Replay a trained merge table over a word column as ONE chained
    * expression — k nested `replace`s, no jobs, no state. Applying in
    * training order over each word from scratch reproduces the trained
    * `ws` exactly (each replace is the same greedy scan the trainer ran).
    */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(regexp_replace(word, "(.)", S1 + "$1" + S2)) {
      case (c, (a, b)) =>
        replace(c, lit(S1 + a + S2 + S1 + b + S2), lit(S1 + a + b + S2))
    }

  /** Trained-merge memo: a tokenizer is trained ONCE and reused, so the
    * k-round training (its 2k driver jobs) shouldn't re-run for every
    * consumer of the same corpus. Keyed by the canonicalized logical plan
    * of the input (semantic hash), the text column, k, AND the
    * partitioning/AQE mode — the mode is in the key deliberately so the
    * determinism suite still retrains per mode and keeps proving the
    * merge table is mode-invariant. Values are tiny (k string pairs).
    */
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Int, String),
      Seq[(String, String)]]()

  def cachedMerges(docs: DataFrame, textCol: String,
      k: Int): Seq[(String, String)] = {
    val conf = docs.sparkSession.conf
    val mode =
      conf.getOption("spark.sql.shuffle.partitions").getOrElse("") + "/" +
        conf.getOption("spark.sql.adaptive.enabled").getOrElse("")
    val key = (docs.queryExecution.analyzed.canonicalized.semanticHash(),
      textCol, k, mode)
    mergeCache.computeIfAbsent(key, _ => trainBpe(docs, textCol, k)._2)
  }

  /** Per-document REAL subword counts after `k` trained merges:
    * (idCol, n_pretoks, n_bpe). Merges come from the memo (trained on
    * first use); scoring is one corpus pass joined against the BROADCAST
    * distinct-word frame whose `ws` is rebuilt by [[applyMerges]] — no
    * dependency on training-time checkpoint blocks, which a host may have
    * evicted between queries.
    */
  def bpeTokenCounts(docs: DataFrame, id: String, textCol: String,
      k: Int): DataFrame = {
    val merges = cachedMerges(docs, textCol, k)
    val pts = preTokens(docs, textCol, col(id))
    val ws = applyMerges(col("word"), merges)
    val counts = pts.select("word").distinct()
      .select(col("word"),
        (length(ws) - length(replace(ws, lit(S2), lit(""))))
          .cast("long").as("n_sym"))
    pts.join(broadcast(counts), Seq("word"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_pretoks"), sum(col("n_sym")).as("n_bpe"))
  }

  /** Tokenizer fertility per document group (chars emitted per BPE
    * token) — the compression diagnostic multilingual-tokenizer audits
    * track: a language whose fertility is 2× the corpus mean pays 2× the
    * context budget for the same text. Composes [[bpeTokenCounts]] with
    * the grouping column; the ratio is ONE division over two exact
    * integer sums. Documents with no pre-tokens drop (they have no
    * tokenizer behavior to measure); a group whose BPE total is zero
    * yields null fertility.
    */
  def tokenizerFertility(docs: DataFrame, id: String, textCol: String,
      by: String, chars: Column, k: Int): DataFrame = {
    bpeTokenCounts(docs, id, textCol, k)
      .join(docs.select(col(id), col(by), chars.as("__nc")), Seq(id))
      .groupBy(col(by))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nc")).as("n_chars"),
        sum(col("n_bpe")).as("n_bpe"))
      .select(col(by), col("n_docs"), col("n_chars"), col("n_bpe"),
        when(col("n_bpe") > 0,
          round(col("n_chars").cast("double") / col("n_bpe").cast("double"),
            6)).as("fertility"))
  }
}
