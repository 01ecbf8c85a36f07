package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deduplication operators for large-scale corpus pipelines: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design: nothing here compares all pairs. Exact dedup is one hash
  * aggregate on a 16-byte key; LSH turns near-dup search into an equi-join
  * on band keys (shuffle on band_key, AQE handles hot buckets, and
  * degenerate buckets are capped before the self-join — see
  * `lshCandidatePairs`); Jaccard verification runs only on LSH candidates
  * via a shingle inverted index, never on the full cross product.
  */
object DedupOps {

  /** Exact dedup groups: one row per distinct fingerprint with the group
    * size and the smallest doc id as the canonical representative.
    */
  def exactGroups(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), TextFns.fingerprint(col(text)).as("fp"))
      .groupBy("fp")
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** (id, shingles) with distinct `n`-token shingles per document.
    *
    * The input is spread across the cluster first (`Tables.spread`,
    * tiny-frame guard off): shingling + the downstream MinHash tower are
    * hash-heavy per row, so a narrow scan (one row group ⇒ one task) would
    * serialize the whole kernel on one core. No-op when the corpus scan is
    * already wide.
    */
  def withShingles(docs: DataFrame, id: String, text: String, n: Int): DataFrame =
    graft.Tables.spread(docs.select(col(id), col(text)), tinyBytes = 0L)
      .select(col(id), TextFns.shingles(TextFns.tokens(col(text)), n).as("shingles"))

  /** MinHash signature: `k` lexicographic-min seeded md5s over the shingle
    * set, as columns `mh00..mh{k-1}`. Null components for docs with no
    * shingles.
    */
  def minhashSignatures(docs: DataFrame, id: String, text: String, n: Int, k: Int): DataFrame =
    signaturesFromShingles(withShingles(docs, id, text, n), id, k)

  /** Signatures from an existing (id, shingles) frame. */
  def signaturesFromShingles(shingled: DataFrame, id: String, k: Int): DataFrame = {
    val cols = (0 until k).map(i => TextFns.minhash(col("shingles"), i).as(f"mh$i%02d"))
    shingled.select((col(id) +: cols): _*)
  }

  /** LSH band keys: `bands` keys per doc, each the md5 of `rowsPerBand`
    * consecutive minhash components. Output: (id, band, band_key), one row
    * per band — the unit that gets bucket-joined.
    */
  def lshBandKeys(signatures: DataFrame, id: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val perBand = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(f"mh${b * rowsPerBand + r}%02d"))
      struct(lit(b).as("band"), md5(concat_ws("|", parts: _*)).as("band_key"))
    }
    signatures
      .select(col(id), explode(array(perBand: _*)).as("bk"))
      .select(col(id), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** Candidate pairs: distinct (a, b) with a < b sharing at least one LSH
    * bucket. The self-join is an equi-join on (band, band_key).
    *
    * Degenerate-bucket guard: a band bucket with B members contributes
    * B(B−1)/2 candidate pairs — an adversarial bucket (e.g. every
    * empty-shingle doc hashing to the same null-ish key, or boilerplate
    * that collapses a whole crawl segment) turns the equi-join quadratic.
    * Buckets larger than `maxBucket` are dropped BEFORE the self-join (a
    * count window keyed on the bucket, no extra shuffle beyond the join's
    * own key), and null band keys (docs with no shingles) are filtered
    * outright. Members of an over-cap bucket can still pair through their
    * other bands — recall degrades gracefully instead of the job dying.
    *
    * The default (2000 → ≤ ~2×10⁶ pairs per bucket) is sized for corpus
    * scale: a bucket that big is boilerplate collapse, not genuine
    * near-duplication, and admitting it would let ONE bucket dominate the
    * join (the previous 100k default allowed ~5×10⁹ pairs from a single
    * degenerate bucket). Raise it only for small corpora where exhaustive
    * recall inside mega-buckets matters more than the quadratic cost.
    */
  def lshCandidatePairs(bandKeys: DataFrame, id: String,
      maxBucket: Int = 2000): DataFrame = {
    val wB = org.apache.spark.sql.expressions.Window.partitionBy("band", "band_key")
    val capped = bandKeys
      .filter(col("band_key").isNotNull)
      .withColumn("__bsz", count(lit(1)).over(wB))
      .filter(col("__bsz") <= maxBucket)
      .drop("__bsz")
    val l = capped.select(col("band"), col("band_key"), col(id).as("id_a"))
    val r = capped.select(col("band"), col("band_key"), col(id).as("id_b"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact shingle-set Jaccard for the given pairs, via an inverted index:
    * |A∩B| from a shingle equi-join restricted to candidate docs, |A∪B| from
    * per-doc set sizes. Keeps pairs with jaccard >= `threshold`.
    *
    * `maxDf` (default off) applies the [[capPostings]] vocabulary cap to
    * the verification index: with the cap, similarities are exact over the
    * SURVIVING shingles (sizes shrink coherently with intersections via
    * [[cappedSetSizes]]), so a corpus-wide boilerplate shingle neither
    * inflates the per-pair intersection work nor biases scores low.
    */
  def jaccardVerify(pairs: DataFrame, shingled: DataFrame, id: String,
      threshold: Double, maxDf: Long = Long.MaxValue): DataFrame = {
    val ex = capPostings(
      shingled.select(col(id), explode(col("shingles")).as("s")), "s", maxDf)
    val sizes = cappedSetSizes(shingled, ex, id, maxDf)
    val inter = pairs
      .join(ex.select(col(id).as("id_a"), col("s")), Seq("id_a"))
      .join(ex.select(col(id).as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(id).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(id).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("__j", col("n_inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("n_inter")))
      .filter(col("__j") >= threshold) // threshold on the raw value, round only for output
      .select(col("id_a"), col("id_b"), round(col("__j"), 6).as("jaccard"))
  }

  /** Document-frequency cap for inverted-index postings: a posting whose
    * term appears in k documents contributes k² candidate rows to the
    * self-join, so ONE adversarial corpus-wide shingle (a boilerplate
    * header, a templated footer) turns the index quadratic. Postings with
    * df > `maxDf` are dropped BEFORE the join — exactly the terms that
    * carry near-zero discriminative signal (IDF ≈ 0). With the cap on,
    * pairs that share ONLY capped terms are missed, and both intersections
    * AND set sizes are computed over the SURVIVING vocabulary (see
    * [[cappedSetSizes]]) — so jaccard/containment are exact similarities
    * over the kept terms, the same coherent-shrinking semantics
    * `tfidfCosinePairs` applies to its weights and norms, rather than a
    * biased-low hybrid of capped intersections against uncapped sizes.
    * `Long.MaxValue` (the default) bypasses the df aggregate entirely, so
    * default plans and hashes are unchanged.
    *
    * Plan shape: one extra hash aggregate over |distinct terms| and one
    * equi-join back on the term — both linear in the index, the price that
    * removes the quadratic tail.
    */
  private def capPostings(postings: DataFrame, term: String, maxDf: Long): DataFrame =
    if (maxDf == Long.MaxValue) postings
    else {
      val dfreq = postings.groupBy(term)
        .agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf)
        .drop("__df")
      postings.join(dfreq, Seq(term), "left_semi")
    }

  /** Per-doc set size consistent with [[capPostings]]: with no cap, the
    * cheap `size(shingles)` projection; with a cap, the count of SURVIVING
    * postings per doc — one more hash aggregate over the already-capped
    * index, linear and map-side-combining. Keeping sizes and intersections
    * on the same vocabulary makes capped jaccard/containment exact over
    * the kept terms (a doc pair identical except for boilerplate scores
    * 1.0, not below-threshold).
    */
  private def cappedSetSizes(ck: DataFrame, capped: DataFrame, id: String,
      maxDf: Long): DataFrame =
    if (maxDf == Long.MaxValue)
      ck.select(col(id), size(col("shingles")).cast("long").as("sz"))
    else
      capped.groupBy(col(id)).agg(count(lit(1)).as("sz"))

  /** n-gram Jaccard near-dup WITHOUT LSH: all pairs sharing >=1 shingle via
    * the inverted index, thresholded. Exact but heavier than `nearDupPairs`
    * (pair candidates grow with shingle document frequency) — the
    * correctness baseline the LSH path is validated against. `maxDf` caps
    * the posting document frequency (see [[capPostings]]).
    */
  def jaccardAllPairs(shingled: DataFrame, id: String, threshold: Double,
      maxDf: Long = Long.MaxValue): DataFrame = {
    // three consumers of the shingle arrays (sizes + both join sides) —
    // truncate lineage so shingling runs once (see nearDupPairs)
    val ck = shingled.localCheckpoint(false)
    val ex = capPostings(
      ck.select(col(id), explode(col("shingles")).as("s")), "s", maxDf)
    val sizes = cappedSetSizes(ck, ex, id, maxDf)
    val inter = ex.select(col(id).as("id_a"), col("s"))
      .join(ex.select(col(id).as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(id).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(id).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("__j", col("n_inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("n_inter")))
      .filter(col("__j") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__j"), 6).as("jaccard"))
  }

  /** Asymmetric containment similarity: |A ∩ B| / |A| over distinct
    * shingle sets — the quote-inclusion detector. A short document fully
    * quoted inside a long one scores containment ≈ 1 while its Jaccard
    * stays low (the union is dominated by the long side), so Jaccard-gated
    * dedup misses it. Same inverted-index join shape as
    * [[jaccardAllPairs]] — docs only meet through a shared shingle, never
    * doc×doc — emitting BOTH directions of each pair (containment is not
    * symmetric). `threshold` gates on the containment of the smaller side.
    */
  def containmentPairs(shingled: DataFrame, id: String, threshold: Double,
      maxDf: Long = Long.MaxValue): DataFrame = {
    val ck = shingled.localCheckpoint(false)
    val ex = capPostings(
      ck.select(col(id), explode(col("shingles")).as("s")), "s", maxDf)
    val sizes = cappedSetSizes(ck, ex, id, maxDf)
    val inter = ex.select(col(id).as("id_a"), col("s"))
      .join(ex.select(col(id).as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(id).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(id).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("__c", col("n_inter").cast("double") / least(col("sz_a"), col("sz_b")))
      .filter(col("__c") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("n_inter").cast("double") / col("sz_a"), 6).as("containment_a"),
        round(col("n_inter").cast("double") / col("sz_b"), 6).as("containment_b"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → bucket-join
    * → exact-Jaccard verify.
    */
  def nearDupPairs(docs: DataFrame, id: String, text: String,
      shingleN: Int, k: Int, bands: Int, threshold: Double,
      maxBucket: Int = 2000, maxDf: Long = Long.MaxValue): DataFrame = {
    // The shingle set feeds three consumers (signatures, the verify join's
    // two sides); localCheckpoint truncates the lineage so the md5/shingle
    // work runs once instead of once per branch. Lazy: nothing computes
    // until the caller's action.
    val shingled = withShingles(docs, id, text, shingleN).localCheckpoint(false)
    val sigs = signaturesFromShingles(shingled, id, k)
    val cands = lshCandidatePairs(lshBandKeys(sigs, id, bands, k / bands), id, maxBucket)
    jaccardVerify(cands, shingled, id, threshold, maxDf)
  }

  /** MinHash estimator audit over the LSH candidate set: for every
    * candidate pair, the signature-agreement estimate ĵ = |matching
    * lanes|/k NEXT TO the exact Jaccard and their signed error — the
    * tuning report that tells you whether k is large enough BEFORE you
    * trust ĵ as a verify shortcut at scale (E[ĵ] = J, sd = √(J(1−J)/k);
    * at k = 12 that's ±0.14 at J = 0.5 — this report makes the spread
    * visible on real data instead of assumed).
    *
    * Same bounded machinery as [[nearDupPairs]]: one checkpointed
    * shingle frame, band equi-join candidates with the bucket cap, the
    * inverted-index intersect for truth — never all-pairs, and the k
    * lane equality checks are one codegen'd projection on the joined
    * signature rows.
    */
  def minhashEstimateAudit(docs: DataFrame, id: String, text: String,
      shingleN: Int, k: Int, bands: Int,
      maxBucket: Int = 2000): DataFrame = {
    val shingled = withShingles(docs, id, text, shingleN)
      .localCheckpoint(false)
    val cands = lshCandidatePairs(
      lshBandKeys(signaturesFromShingles(shingled, id, k), id, bands,
        k / bands), id, maxBucket)
    minhashEstimateFrom(shingled, cands, id, k)
  }

  /** [[minhashEstimateAudit]] over prebuilt (pinned) shingle and candidate
    * frames — the shared-front-end entry: the signature lanes are a
    * map-only projection off `shingled`, so no stage is repaid.
    */
  def minhashEstimateFrom(shingled: DataFrame, cands: DataFrame,
      id: String, k: Int): DataFrame = {
    val sigs = signaturesFromShingles(shingled, id, k)
    val lanes = (0 until k).map(i => f"mh$i%02d")
    val a = sigs.select(col(id).as("id_a") +:
      lanes.map(c => col(c).as(s"__a_$c")): _*)
    val b = sigs.select(col(id).as("id_b") +:
      lanes.map(c => col(c).as(s"__b_$c")): _*)
    val agree = lanes.map(c =>
        when(col(s"__a_$c") === col(s"__b_$c"), 1L).otherwise(0L))
      .reduce(_ + _)
    val ex = shingled.select(col(id), explode(col("shingles")).as("__s"))
    val sz = shingled.select(col(id), size(col("shingles")).cast("long").as("__sz"))
    val inter = cands
      .join(ex.select(col(id).as("id_a"), col("__s")), Seq("id_a"))
      .join(ex.select(col(id).as("id_b"), col("__s")), Seq("id_b", "__s"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__ni"))
    val est = col("lanes_agree").cast("double") / k
    val jac = coalesce(col("__ni"), lit(0L)).cast("double") /
      (col("__sa") + col("__sb") - coalesce(col("__ni"), lit(0L)))
        .cast("double")
    cands
      .join(a, Seq("id_a")).join(b, Seq("id_b"))
      .select(col("id_a"), col("id_b"), agree.as("lanes_agree"))
      .join(inter, Seq("id_a", "id_b"), "left")
      .join(sz.select(col(id).as("id_a"), col("__sz").as("__sa")), Seq("id_a"))
      .join(sz.select(col(id).as("id_b"), col("__sz").as("__sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("lanes_agree"),
        round(est, 6).as("est"), round(jac, 6).as("jaccard"),
        round(est - jac, 6).as("err"))
  }

  /** Incremental near-dup: a NEW ingest batch tested against an EXISTING
    * corpus index — candidates are (new × indexed) band-bucket matches,
    * never new×new or indexed×indexed. This is the growth path of a live
    * corpus: each batch pays LSH cost proportional to the batch, while the
    * index side is the historical band-key + shingle frames (persistable
    * as bucketed tables, so the join co-locates without a fresh shuffle of
    * the corpus). The bucket cap guards the unbounded index side.
    */
  def nearDupAgainstIndex(newDocs: DataFrame, indexDocs: DataFrame, id: String,
      text: String, shingleN: Int, k: Int, bands: Int, threshold: Double,
      maxBucket: Int = 2000): DataFrame = {
    val shNew = withShingles(newDocs, id, text, shingleN).localCheckpoint(false)
    val shIdx = withShingles(indexDocs, id, text, shingleN).localCheckpoint(false)
    val bkNew = lshBandKeys(signaturesFromShingles(shNew, id, k), id, bands, k / bands)
    val bkIdx = lshBandKeys(signaturesFromShingles(shIdx, id, k), id, bands, k / bands)
    val wB = org.apache.spark.sql.expressions.Window.partitionBy("band", "band_key")
    val cappedIdx = bkIdx.filter(col("band_key").isNotNull)
      .withColumn("__bsz", count(lit(1)).over(wB))
      .filter(col("__bsz") <= maxBucket).drop("__bsz")
    val cands = bkNew.filter(col("band_key").isNotNull)
      .select(col("band"), col("band_key"), col(id).as("id_new"))
      .join(cappedIdx.select(col("band"), col("band_key"), col(id).as("id_old")),
        Seq("band", "band_key"))
      .select("id_new", "id_old").distinct()
    val sizesNew = shNew.select(col(id).as("id_new"),
      size(col("shingles")).cast("long").as("sz_new"))
    val sizesIdx = shIdx.select(col(id).as("id_old"),
      size(col("shingles")).cast("long").as("sz_old"))
    val exNew = shNew.select(col(id).as("id_new"), explode(col("shingles")).as("s"))
    val exIdx = shIdx.select(col(id).as("id_old"), explode(col("shingles")).as("s"))
    val inter = cands.join(exNew, Seq("id_new")).join(exIdx, Seq("id_old", "s"))
      .groupBy("id_new", "id_old").agg(count(lit(1)).as("n_inter"))
    inter.join(sizesNew, Seq("id_new")).join(sizesIdx, Seq("id_old"))
      .withColumn("__j", col("n_inter").cast("double") /
        (col("sz_new") + col("sz_old") - col("n_inter")))
      .filter(col("__j") >= threshold)
      .select(col("id_new"), col("id_old"), round(col("__j"), 6).as("jaccard"))
  }

  /** SimHash near-duplicate pairs: band on the signature's first
    * `bandBits` bits (hamming-close signatures agree on short prefixes with
    * high probability), then verify exact hamming distance ≤ `maxHamming`
    * on candidates only. Same candidate-generation shape as MinHash-LSH —
    * an equi-join, never an all-pairs scan.
    */
  def simhashNearDups(docs: DataFrame, id: String, text: String,
      bandBits: Int, maxHamming: Int): DataFrame = {
    // the bit-string is packed to a long ONCE per doc, so the per-pair
    // hamming distance is a single bit_count(a XOR b) — not 64 substring
    // extractions; at B docs per bucket that is the difference between
    // O(B²) cheap integer ops and O(B²·bits) string ops
    val sim = simhash32(docs, id, text)
      .withColumn("__bits", conv(col("simhash"), 2, 10).cast("long"))
      .localCheckpoint(false)
    val a = sim.select(col(id).as("id_a"), col("__bits").as("__ba"),
      substring(col("simhash"), 1, bandBits).as("__band"))
    val b = sim.select(col(id).as("id_b"), col("__bits").as("__bb"),
      substring(col("simhash"), 1, bandBits).as("__band"))
    a.join(b, Seq("__band"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("__ba").bitwiseXOR(col("__bb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding-cosine near-duplicate pairs within a coarse bucket (the
    * ANN-style scale path: the bucket equi-join bounds the pair space the
    * same way LSH bands do for shingles). `simFn` defaults to the native
    * codegen kernel via the composable form; threshold applies to the raw
    * similarity, output is rounded.
    */
  def embeddingNearDups(corpus: DataFrame, id: String, emb: String, bucket: String,
      threshold: Double,
      simFn: (Column, Column) => Column = graft.functions.VectorFns.cosine): DataFrame = {
    val toD = graft.functions.VectorFns.toDoubleArr _
    val a = corpus.select(col(bucket).as("__b"), col(id).as("id_a"), toD(col(emb)).as("__ea"))
    val b = corpus.select(col(bucket).as("__b"), col(id).as("id_b"), toD(col(emb)).as("__eb"))
    a.join(b, Seq("__b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__sim", simFn(col("__ea"), col("__eb")))
      .filter(col("__sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__sim"), 6).as("sim"))
  }

  /** Collapse near-duplicate PAIRS into dedup groups: connected components
    * over the similarity graph, labeling every member doc with the
    * smallest doc id reachable from it — the "keep one canonical copy"
    * step that turns pairwise near-dup evidence into a drop list.
    *
    * Min-label propagation WITH pointer jumping: labels start at the
    * doc's own id; each round every doc takes the min of (its label, its
    * neighbors' labels, its LABEL's label — the hash-to-min shortcut);
    * stop when the label sum stops falling (labels only ever decrease, so
    * the sum is a strict convergence witness read as ONE driver-side
    * scalar per round — no data is collected). The label-of-label jump
    * halves the remaining distance to each component's min every round,
    * so rounds needed = O(log diameter), NOT diameter — a PATH of 10⁶
    * docs (the shape ExactSubstr boilerplate chains actually produce:
    * a span shared by k docs is a k−1-edge chain in rank-adjacency
    * order) converges in ~20 rounds where plain propagation needs 10⁶.
    * Each round is three equi-joins keyed on doc id over the
    * |nodes-in-any-pair|-sized label frame, and `localCheckpoint`
    * truncates the growing lineage so round k doesn't replay rounds
    * 1..k-1. The jump preserves the fixpoint exactly: a label is always
    * some same-component node's id, ≥ the component min, and
    * monotonically decreasing — so converged labels are identical to
    * plain propagation's (same hash), only reached in fewer rounds.
    *
    * A graph whose diameter exceeds `maxIter` FAILS FAST
    * (IllegalStateException) instead of silently returning
    * mid-propagation labels — wrong canonical ids would poison every
    * downstream keep-list/fold/quarantine decision, and the loop knows
    * exactly whether its convergence witness fired (the kCore
    * `converged`-flag argument, applied to a function whose caller
    * contract is the TRUE closure, not a fixed-round approximation).
    */
  def connectedComponents(pairs: DataFrame, idA: String, idB: String,
      maxIter: Int = 20): DataFrame = {
    // the symmetric edge list is the static big side of EVERY round's
    // neighbor-min join, always probed on __dst: partition AND sort it on
    // __dst once and CACHE it (the g06/g07 adjacency discipline —
    // serialized, so the footprint stays compact/spill-friendly at
    // scale), so each round exchanges only the per-node label frame.
    // Same caller contract as kCore: the returned frame references the
    // cache; harnesses sweep non-shared blocks between queries.
    val edges = pairs.select(col(idA).as("__src"), col(idB).as("__dst"))
      .unionByName(pairs.select(col(idB).as("__src"), col(idA).as("__dst")))
      .distinct()
      .repartition(col("__dst"))
      .sortWithinPartitions("__dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var labels = edges.select(col("__src").as("doc_id")).distinct()
      .withColumn("canonical_id", col("doc_id"))
      .localCheckpoint(false)
    var prevSum = BigDecimal(-1)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("__dst"), col("canonical_id").as("__nlab")),
          Seq("__dst"))
        .groupBy(col("__src").as("doc_id"))
        .agg(min(col("__nlab")).as("__nmin"))
      // lazily cached: the pointer-jump self-join below references this
      // frame on BOTH sides — uncached, the whole neighbor-min join would
      // execute twice per round
      val propagated = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("canonical_id"), coalesce(col("__nmin"), col("canonical_id")))
            .as("canonical_id"))
        .localCheckpoint(false)
      // pointer jump: follow the label one hop (label := min(label,
      // label(label))) — canonical_id is always a node id present in
      // `labels`, so the self-join always matches; the left+coalesce is
      // belt-and-braces for the empty-frame edge
      labels = propagated.alias("x")
        .join(propagated.select(col("doc_id").as("__lab"),
          col("canonical_id").as("__lablab")).alias("y"),
          col("x.canonical_id") === col("y.__lab"), "left")
        .select(col("x.doc_id").as("doc_id"),
          least(col("x.canonical_id"),
            coalesce(col("__lablab"), col("x.canonical_id")))
            .as("canonical_id"))
        .localCheckpoint(false)
      val row = labels.agg(sum(col("canonical_id").cast("decimal(38,0)"))).collect()(0)
      // null sum = empty graph (no near-dup pairs at all) → nothing to converge
      val s = if (row.isNullAt(0)) BigDecimal(0) else BigDecimal(row.getDecimal(0).toString)
      converged = row.isNullAt(0) || s == prevSum
      prevSum = s
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — with " +
          "pointer jumping that means a component of diameter greater " +
          s"than ~2^$maxIter, which should be unreachable for any real " +
          "pair graph. Raise maxIter; returning mid-propagation labels " +
          "would mis-canonicalize every downstream dedup decision.")
    labels
  }

  /** 32-bit set-based SimHash over the distinct-token set, emitted as a
    * 32-char '0'/'1' string (bit 0 first). Bit p of a token is nibble
    * arithmetic over its md5 hex digest — portable to any SQL oracle.
    * Per-bit vote: +1 if the token's bit is 1 else -1; simhash bit = vote>0.
    */
  def simhash32(docs: DataFrame, id: String, text: String): DataFrame = {
    // no spread here: the doc-side kernel is a cheap tokenize+explode (the
    // md5 tower runs on the distinct-token vocab, which is tiny relative),
    // so the distinct's own shuffle provides all the parallelism needed —
    // an upfront repartition measured strictly slower
    val toks = docs
      .select(col(id), explode(TextFns.tokens(col(text))).as("tok"))
      .distinct()
    // dictionary trick: the ±1 bit vector is a function of the token alone —
    // compute it once per DISTINCT token (vocabulary-sized), then sum
    // vectors element-wise per document. Avoids exploding every
    // (doc, token) pair 32× (the naive form shuffles |docs|·|tokens|·32 rows;
    // this shuffles |docs|·|tokens| with a 32-int payload). The vocab join
    // carries no broadcast hint: a web-corpus vocabulary is 10⁸+ tokens and
    // would OOM the driver — AQE broadcasts iff it is actually small,
    // otherwise both sides shuffle on the token key.
    val vocab = toks.select("tok").distinct()
      .withColumn("__h", md5(col("tok")))
      .withColumn("bits", transform(sequence(lit(0), lit(31)), p => {
        val nib = conv(col("__h").substr((p / 4).cast("int") + 1, lit(1)), 16, 10)
          .cast("long")
        val bit = floor(nib / pow(lit(2.0), lit(3) - p % 4)).cast("long") % 2
        when(bit === 1, 1).otherwise(-1)
      }))
      .select("tok", "bits")
    // per-bit SUM aggregates instead of collect_list+fold: sums combine
    // map-side (partial aggregation), so the shuffle carries one 32-int
    // partial row per (map task, doc) instead of every (doc, token) bit
    // vector; collect_list has no partial form and ships all rows
    val votes = (0 until 32).map(p =>
      sum(element_at(col("bits"), p + 1)).as(s"__v$p"))
    toks.join(vocab, Seq("tok"))
      .groupBy(col(id))
      .agg(votes.head, votes.tail: _*)
      .select(col(id),
        concat((0 until 32).map(p =>
          when(col(s"__v$p") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** Sparse TF-IDF cosine similarity over an inverted index of `shingleN`-
    * token shingles: weight each (doc, shingle) posting by `tf · smoothIdf`,
    * join postings on the shingle (never doc×doc — only docs sharing a
    * shingle ever meet), sum the weight products, and normalize by the
    * per-doc L2 norms. Exact cosine for every pair above `threshold`.
    *
    * The posting term is a SHINGLE, not a unigram, on purpose: a posting
    * with document frequency k contributes k² join rows, and unigram
    * vocabularies are tiny relative to any corpus (every doc shares every
    * term → the index degenerates toward all-pairs). Shingle cardinality
    * grows with the corpus, keeping the index sparse — the same property
    * that makes `jaccardAllPairs` viable. For adversarial high-df shingles
    * `maxDf` drops postings above a document-frequency ceiling (their IDF
    * weight is near zero anyway) — with the cap on, pairs connected ONLY
    * by capped terms are missed and surviving similarities exclude the
    * capped terms from weights and norms alike (the vocabulary simply
    * shrinks, so the result is still a true cosine over the kept terms).
    */
  def tfidfCosinePairs(docs: DataFrame, id: String, text: String,
      shingleN: Int, threshold: Double, maxDf: Long = Long.MaxValue): DataFrame = {
    val toks = graft.Tables.spread(docs.select(col(id), col(text)), tinyBytes = 0L)
      .select(col(id),
        explode(TextFns.rawShingles(TextFns.tokens(col(text)), shingleN)).as("term"))
    // df stays an AGGREGATE + join-back, NOT a `count().over(partitionBy
    // (term))` window: the window form measures faster at test sf (one
    // exchange instead of agg+join) but ships every posting of a hot term
    // into ONE window task — no map-side combine — which is precisely the
    // adversarial-shingle skew this operator must survive at corpus scale.
    // The aggregate combines partials before the shuffle and the join-back
    // is AQE-skew-splittable.
    val tf = toks.groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val n = docs.agg(count(lit(1)).as("__n"))
    // checkpointed: consumed three times (norms + both self-join sides);
    // without it each consumer replays the tf⋈df⋈n subtree. The residual
    // wall-clock here is stage-count floor, not data volume (PlanAudit:
    // every exchange is KB-scale at test sf)
    val wts = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
      .select(col(id), col("term"),
        (col("tf") * TextFns.smoothIdf(col("__n"), col("df"))).as("w"))
      .localCheckpoint(false)
    val norms = wts.groupBy(col(id)).agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    // shuffle_hash pinned (§3.1 pick-the-strategy-deliberately): without
    // the hint the planner BROADCASTS one side of this self-join — the
    // checkpointed wts frame carries no real stats, and a data-sized
    // posting list broadcast is fatal at corpus scale (the t43 doc-side
    // mis-broadcast lesson). Shuffled-hash keeps both sides partitioned
    // by term (AQE's skew-join split covers SHJ), builds per-partition
    // hash maps, and skips SMJ's two sorts — measured 1.35x on the
    // same-window pair here as well.
    val dots = wts.as("a")
      .join(wts.as("b").hint("shuffle_hash"),
        col("a.term") === col("b.term") && col(s"a.$id") < col(s"b.$id"))
      .groupBy(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dp"))
    dots
      .join(norms.select(col(id).as("id_a"), col("nrm").as("__na")), Seq("id_a"))
      .join(norms.select(col(id).as("id_b"), col("nrm").as("__nb")), Seq("id_b"))
      .filter(col("dp") / (col("__na") * col("__nb")) >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("dp") / (col("__na") * col("__nb")), 6).as("sim"))
  }

  /** End-to-end near-dup removal: LSH-verified pairs → connected
    * components → drop every non-canonical member. The survivor list is
    * the corpus anti-joined with the victim set, so untouched docs (the
    * overwhelming majority at any scale) stream through without entering
    * the component computation at all.
    */
  def dropNearDups(docs: DataFrame, id: String, text: String,
      shingleN: Int, k: Int, bands: Int, threshold: Double,
      maxBucket: Int = 2000, maxDf: Long = Long.MaxValue): DataFrame = {
    val pairs = nearDupPairs(docs, id, text, shingleN, k, bands, threshold,
      maxBucket, maxDf)
    val victims = connectedComponents(pairs, "id_a", "id_b")
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id").as(id))
    docs.join(victims, Seq(id), "left_anti")
  }

  /** Benchmark decontamination (training-data hygiene): for each corpus
    * document, the number of distinct `n`-token shingles it shares with a
    * benchmark/eval set, plus a 0/1 contamination flag.
    *
    * Both sides reduce to DISTINCT (id, shingle) / (shingle) frames and
    * meet in ONE equi-join on the shingle string — never doc×doc. The
    * benchmark shingle set is data-dependent (an eval suite can be millions
    * of shingles), so there is no broadcast hint: AQE promotes the join at
    * runtime iff the set actually fits.
    */
  /** Segment-level boilerplate removal (the RefinedWeb/CCNet "line dedup"
    * pass, adapted to whitespace corpora with no line structure): each doc
    * is cut into aligned `w`-token segments, segments whose corpus-wide
    * occurrence count reaches `minDup` are dropped everywhere, and every
    * doc is reassembled from its surviving segments in order.
    *
    * Scale shape: one hash aggregate over |distinct segments| for the
    * counts, one equi-join back on the segment text (AQE-sized — the count
    * side is NOT provably small), and one per-doc aggregate for the
    * reassembly. Never doc×doc; reassembly state is bounded by the longest
    * single document, the same bound the tokenizer already implies.
    */
  def dropDuplicateSegments(docs: DataFrame, id: String, text: String,
      w: Int, minDup: Long): DataFrame = {
    // zero-token docs carry no segments and produce NO output row (callers
    // that must keep them attach the result with a left join — see
    // CorpusCurator.scrubBoilerplate); unguarded, sequence(0, -1) would
    // walk backwards and fabricate two empty-string segments per empty doc
    val segs = graft.Tables.spread(docs.select(col(id), col(text)), tinyBytes = 0L)
      .select(col(id), TextFns.tokens(col(text)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("seg_idx",
        explode(sequence(lit(0), floor((col("__n") - 1) / w).cast("int"))))
      .select(col(id), col("seg_idx"),
        array_join(slice(col("__toks"), col("seg_idx") * w + 1, lit(w)), " ")
          .as("seg"))
    val counts = segs.groupBy("seg").agg(count(lit(1)).as("__c"))
    segs.join(counts, Seq("seg"))
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("__c") >= minDup, 1L).otherwise(0L)).as("n_dropped"),
        // collect_list skips the nulls `when` leaves for dropped segments;
        // array_sort on (seg_idx, seg) structs restores document order
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__c") < minDup, struct(col("seg_idx"), col("seg"))))),
            _.getField("seg")),
          " ").as("clean_text"))
  }

  def decontaminate(corpus: DataFrame, benchmark: DataFrame, id: String,
      text: String, n: Int): DataFrame = {
    // `withShingles` is per-doc distinct and `id` is unique, so the exploded
    // (id, sg) pairs are already globally distinct — no dedup shuffle. Only
    // the benchmark side needs a global DISTINCT (the same shingle can occur
    // in many benchmark docs and must count once).
    val corpusSh = withShingles(corpus, id, text, n)
      .select(col(id), explode(col("shingles")).as("sg"))
    val benchSh = withShingles(benchmark, id, text, n)
      .select(explode(col("shingles")).as("sg")).distinct()
    val shared = corpusSh.join(benchSh, "sg")
      .groupBy(col(id)).agg(count(lit(1)).as("__shared"))
    corpus.select(col(id)).join(shared, Seq(id), "left")
      .select(col(id),
        coalesce(col("__shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("__shared"), lit(0L)) > 0, 1).otherwise(0)
          .as("contaminated"))
  }

  /** Sorted-neighborhood near-duplicate pairs (Hernández–Stolfo SNM, the
    * classic record-linkage blocking): sort the corpus by a normalized
    * blocking key, then compare each record only against its `window`
    * successors in that order, keeping pairs within `maxDist` edits of
    * each other's keys.
    *
    * Complements the d-family's set-similarity methods: MinHash/SimHash
    * block on CONTENT OVERLAP; SNM blocks on SORT-ORDER LOCALITY, which
    * catches near-identical records whose small early edits leave them
    * adjacent (typos, truncations, boilerplate prefixes).
    *
    * Shape: the global sort rank comes from [[graft.operators.RankOps
    * .globalRowNumber]] (two-phase range bucketing — no single-partition
    * exchange), then each row is exploded to its `window` forward anchor
    * ranks and the candidate pairs form with ONE equi-join on the anchor
    * (fan-out = `window`, linear in corpus size — never the quadratic
    * blowup naive blocking risks when one key bucket is hot). The edit
    * distance runs only on the `keyLen`-bounded keys, not full documents.
    *
    * Determinism: the sort is total-ordered by (key, id); ranks, anchors
    * and edit distances are exact integers.
    */
  /** Candidate-generation quality audit: LSH band-bucket candidate pairs
    * measured against the exact-Jaccard ground truth at `threshold` —
    * recall ("what fraction of true near-dup pairs did banding surface")
    * and precision ("what fraction of surfaced candidates are true").
    * THE dial-tuning report for (k, bands) at scale: run it on a sample
    * tier, pick the cheapest banding whose recall clears the bar, then
    * run the tuned config on the full corpus.
    *
    * One shingle frame feeds both sides (signatures AND the inverted
    * index), the candidate/truth sets meet in a pair-key equi-join, and
    * the output is one row of counts — nothing quadratic beyond what the
    * two audited operators already do.
    */
  def lshRecallEval(docs: DataFrame, id: String, text: String,
      shingleN: Int, k: Int, bands: Int, threshold: Double): DataFrame = {
    val sh = withShingles(docs, id, text, shingleN)
    val truth = jaccardAllPairs(sh, id, threshold).select("id_a", "id_b")
    val cand = lshCandidatePairs(
      lshBandKeys(signaturesFromShingles(sh, id, k), id, bands, k / bands), id)
    lshRecallFrom(truth, cand)
  }

  /** [[lshRecallEval]]'s closing report over prebuilt (id_a, id_b) truth
    * and candidate frames — the shared-front-end entry.
    */
  def lshRecallFrom(truth: DataFrame, cand: DataFrame): DataFrame = {
    val hit = truth.join(cand, Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    val nt = truth.agg(count(lit(1)).as("n_truth"))
    val nc = cand.agg(count(lit(1)).as("n_cand"))
    nt.crossJoin(broadcast(nc)).crossJoin(broadcast(hit))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_truth"), 6).as("recall"),
        round(col("n_hit").cast("double") / col("n_cand"), 6).as("precision"))
  }

  def sortedNeighborhood(docs: DataFrame, id: String, text: String,
      window: Int, maxDist: Int, keyLen: Int = 64): DataFrame = {
    val keyed = docs.select(col(id),
      substring(regexp_replace(lower(col(text)), "\\s+", " "), 1, keyLen)
        .as("__key"))
    // the ranked frame feeds BOTH join sides (anchors and probe); the
    // rank assignment itself is window work on top of the checkpointed
    // range bucketing, so pin it once instead of paying the window +
    // offset triangle twice
    val ranked = graft.operators.RankOps.globalRowNumber(keyed,
      Seq(col("__key"), col(id)), "__rn").localCheckpoint(false)
    val anchors = ranked.withColumn("__anchor",
      explode(sequence(col("__rn") + 1, col("__rn") + window)))
    anchors.alias("a")
      .join(ranked.alias("b"), col("__anchor") === col("b.__rn"))
      .filter(levenshtein(col("a.__key"), col("b.__key")) <= maxDist)
      .select(col(s"a.$id").as("doc_a"), col(s"b.$id").as("doc_b"),
        levenshtein(col("a.__key"), col("b.__key")).as("dist"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS local fingerprinting algorithm): hash every token k-gram,
    * slide a w-wide window over the hash sequence, keep each full
    * window's minimum. The guarantee: any shared token run of length
    * ≥ k+w−1 contributes at least one shared fingerprint, while the
    * selected set is ~2/(w+1) of the k-grams — position-robust partial
    * overlap detection at a fraction of the posting volume.
    *
    * Returns the distinct (id, fp) fingerprint set. Hashes are MD5 hex
    * (engine-portable, lexicographic min) like the d-family MinHash.
    */
  def winnowedFingerprints(docs: DataFrame, id: String, text: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    // fully IN-ROW: gram hashes, the w-wide sliding minima, and the
    // per-doc dedup are all array expressions over one row — where the
    // old form exploded every gram and ran two per-doc windows, paying a
    // full hash exchange of the gram stream just to look at neighbors
    // that live in the same document. Same fingerprint set: the sliding
    // min over positions p ∈ [0, n_grams − w] with md5-hex strings under
    // lexicographic (= binary) order, deduped per doc, matches the old
    // window min + count-guard + distinct exactly; per-row state is
    // bounded by document length, the same guarantee every in-row text
    // kernel here already makes.
    val toks = split(regexp_replace(trim(col(text)), "\\s+", " "), " ")
    // spread: the md5-per-gram kernel is pure CPU over the handful of
    // parquet scan tasks a small docs table yields — widen it across the
    // cores (no-op ≥256 MB, the PNG-family discipline), or the whole
    // fingerprint pass runs 2-wide on 32 cores
    graft.Tables.spread(docs.select(col(id), col(text)), tinyBytes = 0L)
      .select(col(id), toks.as("__t"))
      .filter(size(col("__t")) >= k + w - 1)
      .select(col(id), transform(
        sequence(lit(0), size(col("__t")) - k),
        i => md5(concat_ws(" ", slice(col("__t"), i + 1, lit(k))))).as("__hs"))
      .select(col(id), explode(array_distinct(transform(
        sequence(lit(0), size(col("__hs")) - w),
        p => array_min(slice(col("__hs"), p + 1, lit(w)))))).as("fp"))
  }

  /** Shared-fingerprint pair report over [[winnowedFingerprints]] — the
    * MOSS "documents with overlapping passages" join. The fingerprint
    * equi-join is an inverted index; `maxDf` drops stop-fingerprints
    * (shared boilerplate) to cap the quadratic posting tail exactly like
    * the Jaccard index's `capPostings`.
    */
  def winnowSharedPairs(docs: DataFrame, id: String, text: String,
      k: Int = 3, w: Int = 4, minShared: Long = 2,
      maxDf: Long = 50): DataFrame = {
    val fp = winnowedFingerprints(docs, id, text, k, w)
      .localCheckpoint(false)
    val keep = fp.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("fp"))
    val capped = fp.join(keep, Seq("fp"))
    capped.select(col("fp"), col(id).as("id_a"))
      .join(capped.select(col("fp"), col(id).as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): coarse clustering bounds the pairwise cosine
    * search to WITHIN-cluster pairs — N²/C work instead of N², which is
    * the whole reason cluster-then-compare scales where brute pairwise
    * can't. A doc is dropped iff some lower-id doc in its cluster sits at
    * cosine ≥ `threshold`; the surviving lowest id is the cluster-local
    * canonical copy (deterministic, order-free).
    *
    * Scale shape: the only join is the cluster equi-join (hash-partitioned
    * on a C-valued key); centroid assignment is one broadcast-literal
    * codegen'd argmin per row ([[graft.ann.Knn.assignClusters]]). At 100 TB
    * the per-cluster pair space is governed by C — size C so N/C rows fit a
    * task (SemDeDup's own regime is C≈100k on billions of docs); the
    * centroid literal stays k·dim doubles, never data-sized.
    */
  def semanticDedup(corpus: DataFrame, id: String, emb: String,
      centroids: Seq[Seq[Double]], threshold: Double,
      simFn: (Column, Column) => Column = graft.functions.VectorFns.cosine)
      : DataFrame = {
    val toD = graft.functions.VectorFns.toDoubleArr _
    val assigned = graft.ann.Knn.assignClusters(corpus, id, emb, centroids)
      .select(col(id), col("cluster"), toD(col(emb)).as("__e"))
      .localCheckpoint(false)
    val lo = assigned.select(col("cluster"), col(id).as("__lo"),
      col("__e").as("__ea"))
    val hi = assigned.select(col("cluster"), col(id).as("__hi"),
      col("__e").as("__eb"))
    val dups = lo.join(hi, Seq("cluster"))
      .filter(col("__lo") < col("__hi"))
      .filter(simFn(col("__ea"), col("__eb")) >= threshold)
      .select(col("__hi").as(id)).distinct()
    assigned
      .join(dups.withColumn("__dup", lit(1)), Seq(id), "left")
      .select(col(id), col("cluster"),
        when(col("__dup").isNotNull, 0).otherwise(1).cast("int").as("kept"))
  }
}
