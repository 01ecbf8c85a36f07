package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-suite plan sweep: EVERY SparkEntry query's physical plan is held to
  * the 100 TB rules, so a new query can't quietly ship a scale-killer.
  *
  * Rules:
  *  1. No `CartesianProduct`, ever.
  *  2. `Exchange SinglePartition` may only feed a global aggregate (whose
  *     input is one partial row per partition — bounded by the cluster,
  *     not the data). Documented exemption: `w11_cum_uniques`, whose
  *     running total is over |calendar days| rows — bounded by time.
  *  3. `BroadcastNestedLoopJoin` (the plan for non-equi/scalar joins) is
  *     allowed only where the broadcast side is bounded BY CONSTRUCTION —
  *     the allowlist below names each query's bounded side. Everything
  *     else must join with a hash/sort-merge/broadcast-HASH join.
  *
  * Plans are inspected at compile time (no execution): the pre-AQE plan
  * already shows every exchange and join strategy choice the rules govern.
  */
class PlanSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  /** queries whose BroadcastNestedLoopJoin sides are bounded by construction */
  private val bnlBounded: Map[String, String] = Map(
    "a15_auroc" -> "bucket-offset triangle: <= shuffle-partition rows (aurocRankSum prefix offsets)",
    "dq03_psi" -> "1-row min/max extent + 1-row bin totals",
    "f23_vocab_encode" -> "bucket-offset triangle: <= shuffle-partition rows",
    "f24_percent_rank" -> "bucket-offset triangle + 1-row N",
    "ml06_token_budget" -> "bucket-offset triangle (globalCumsum)",
    "ml07_mix_weights" -> "1-row corpus token total",
    "ml09_curriculum_phase" -> "bucket-offset triangle + 1-row count",
    "ml11_interleave" -> "bucket-offset triangles + <=|sources| source-offset triangle",
    "q03_domain_quantile_gate" -> "per-group quantile bounds frame",
    "t06_tfidf_top_terms" -> "1-row doc count (idf denominator)",
    "t18_unigram_logprob" -> "1-row corpus n/vocab stats",
    "t19_bm25_topk" -> "1-row N/avgdl stats",
    "t20_pmi_bigrams" -> "1-row unigram/bigram totals",
    "t21_kl_divergence" -> "1-row corpus stats + 1-row sum-of-log-probs scalar",
    "v01_cosine_topk" -> "explicit bounded query set (vec_id < 8), brute-force contract",
    "v03_ann_kmeans" -> "k x dim centroid literal / bounded query frames",
    "v06_ann_multiprobe" -> "centroid literal, bounded by construction",
    "v07_ann_recall" -> "bounded query set (vec_id < 8) on both result lists",
    "v23_recall_nprobe_sweep" -> "the v06 centroid literals + v07 bounded query set, per probe budget",
    "v20_rank_eval" -> "bounded query set (vec_id < 8) on both ranked lists — the v07 exemption",
    "v08_pq_adc" -> "bounded query set (vec_id < 8) with literal codebook tables",
    "dq04_mad_outliers" -> "per-group median/MAD bounds frame",
    "a20_auprc" -> "bucket-offset triangle (globalCumsums) — <= shuffle-partition rows",
    "a22_gains_deciles" -> "bucket-offset triangle + 1-row (n, p) totals",
    "dq05_ks" -> "bucket-offset triangle (globalCumsums) + 1-row sample totals",
    "w11_cum_uniques" -> "bucket-offset triangle: <= shuffle-partition rows (globalCumsum)",
    "pr01_pagerank" -> "1-row node count + 1-row dangling-mass frame per superstep",
    "ml28_bradley_terry" -> "1-row micro-pinned normalizer total per MM iteration (4x) over the <=|sources|^2 pair frame",
    "a55_conformal" -> "bucket-offset triangle (globalRowNumber) + 1-row (n_cal, k) and 1-row tau frames",
    "dq06_benford" -> "1-row digit-count total",
    "g06_kcore" -> "1-row converged flag (survivor-count equality of the last two peels)",
    "g07_label_prop" -> "1-row converged flag (label-frame equality of the last two rounds)",
    "a24_gini" -> "bucket-offset triangle (globalRowNumber) — <= shuffle-partition rows",
    "t22_zipf_fit" -> "bucket-offset triangle (globalRowNumber) over the vocab frame",
    "ml10_class_weights" -> "1-row (total, class-count) stats",
    "a21_roc_points" -> "bucket-offset triangle (globalCumsums) + 1-row (P, N) totals",
    "a26_logrank" -> "bucket-offset triangle (globalCumsums) + 1-row (N, N1) totals",
    "a27_cat_assoc" -> "r x c marginal cross product + 1-row grand totals — bounded by category cardinalities",
    "d15_sorted_neighborhood" -> "bucket-offset triangle (globalRowNumber) — <= shuffle-partition rows",
    "a28_spearman" -> "bucket-offset triangles (two globalCumsums over distinct-value frames)",
    "t23_heaps_fit" -> "bucket-offset triangle (one two-value globalCumsums over the per-doc frame)",
    "ml13_woe" -> "1-row pos/neg grand totals (explicit broadcast)",
    "t24_rrf_fusion" -> "1-row N/avgdl stats (bm25) + bucket-offset triangles over 50-row lists",
    "ml14_info_gain" -> "1-row corpus count + 1-row H(target) scalar (explicit broadcasts)",
    "a29_brier" -> "1-row (N, base-rate) totals (explicit broadcast)",
    "t27_jsd_sources" -> "1-row corpus token total (explicit broadcast)",
    "a31_cindex" -> ("bucket-offset triangle (globalCumsum over the " +
      "distinct-time frame) + P-row slice-id × P-row bucket-id grid — both " +
      "sides bounded by the shuffle-partition config, not data"),
    "a32_mannwhitney" -> "bucket-offset triangle (globalCumsum over the distinct-value frame)",
    "t28_bigram_lm" -> "1-row vocabulary size V (explicit broadcast)",
    "t46_kneser_ney" -> ("1-row distinct-bigram total N1+(..) (explicit " +
      "broadcast) — the t28 exemption on the KN model frame"),
    "a33_auroc_delong" -> "bucket-offset triangle (globalCumsums) + 1-row (m, n) totals",
    "a34_cohens_kappa" -> "1-row Σ marginal-product scalar (explicit broadcast)",
    "d16_lsh_recall" -> "three 1-row count scalars (explicit broadcasts)",
    "dq09_control_chart" -> "1-row (k, Σn, Σn²) daily-count stats (explicit broadcast)",
    "v09_embed_cov" -> "d-row dim-frame triangle + 1-row d scalar — bounded by embedding dim",
    "a37_wilcoxon" -> "bucket-offset triangle (globalCumsum over the distinct-|d| frame)",
    "ml18_stratified_kfold" -> "bucket-offset triangle (globalRowNumber)",
    "q08_rfm" -> "bucket-offset triangles (three globalRowNumbers) + 1-row user count",
    "a38_fleiss_kappa" -> "1-row Σ marginal-square scalar (explicit broadcast)",
    "dq12_freshness_lag" -> "1-row max-ts high-water mark (explicit broadcast)",
    "q10_pareto_share" -> "bucket-offset triangle (globalRowNumber) + 1-row (n, total) scalars (explicit broadcast)",
    "a43_kruskal" -> ("bucket-offset triangle (globalCumsum over the " +
      "distinct-value frame) + 1-row (n, ties) totals (explicit broadcast)"),
    "ml06b_bpe_budget" -> "bucket-offset triangle (globalCumsum)",
    "dq15_schema_drift" -> "1-row time-extent midpoint (explicit broadcast)",
    "v12_mmr_rerank" -> ("top-20 candidate frame throughout (rerank " +
      "contract: inputs bounded by construction) — pair self-join and " +
      "greedy argmax steps all <= 20-row sides"),
    "a45_sign_bh" -> ("(maxM+1)(maxM+2)/2-row Pascal-triangle broadcast " +
      "(config-bounded, maxM <= 120) + bucket-offset triangle " +
      "(globalRowNumber) + 1-row family-size M and 1-row BH rank scalars " +
      "(explicit broadcasts)"),
    "e2e_rag_retrieve" -> ("1-row N/avgdl stats (bm25 stage) + " +
      "bucket-offset triangles over the two 50-row ranked lists (rrf) + " +
      "the <= 20-row fused-candidate frame through the MMR pair join and " +
      "greedy steps — every side bounded by the k/n contract, not data"),
    "t37_qlm_topk" -> ("1-row corpus token total (the t19 stats pattern); " +
      "the dense doc x term expansion is a generator over a literal " +
      "array, not a join"),
    "a46_friedman" -> ("1-row treatment-cardinality frame (completeness " +
      "gate) + k-row rank-sum x 1-row sufficient-stats frames (explicit " +
      "broadcasts) — k is the bounded treatment cardinality"),
    "v13_matryoshka_topk" -> ("explicit bounded query set (vec_id < 8), " +
      "brute-force contract — the v01 exemption over the 16-dim prefix"),
    "o07_range_splits" -> ("bucket-offset triangle (globalRowNumber) — " +
      "<= shuffle-partition rows; the needed-rank probe itself is a " +
      "2(B-1)-row broadcast HASH join, not a BNL"),
    "v16_filtered_ann" -> ("explicit bounded query set (vec_id < 8) with " +
      "the cross-source predicate in the join condition — the v01 " +
      "brute-force exemption"),
    "q13_time_to_convert" -> ("bucket-offset triangle (rangeSplitPoints' " +
      "globalRowNumber) + 1-row median x 1-row count frames (explicit " +
      "broadcasts)"),
    "g09_hits" -> ("1-row node count + per-superstep 1-row L1-total " +
      "frames (explicit broadcasts) — the pr01 exemption on the " +
      "two-score recurrence"),
    "t39_ppl_buckets" -> ("1-row vocabulary size V (t28 stage) + 1-row " +
      "scored-doc count + bucket-offset triangle (globalRowNumber) — " +
      "all explicit broadcasts"),
    "ml24_dsir_weights" -> ("1-row corpus/target bigram totals (explicit " +
      "broadcast); the dim-row ratio table itself joins by hash on the " +
      "bucket key"),
    "e2e_quality_gate" -> ("t39's 1-row V/count scalars + triangle, and " +
      "ml24's 1-row totals, composed — every BNL side a 1-row or " +
      "<= shuffle-partition frame"),
    "a51_brown_forsythe" -> ("1-row grand (k, N, Σ) frame against the " +
      "k-row per-group stats frame (explicit broadcast) — bounded by " +
      "group cardinality"),
    "v17_hamming_topk" -> ("explicit bounded query set (vec_id < 8), " +
      "the v01 brute-force exemption over packed sign bits"),
    "g11_reciprocity" -> "two 1-row count scalars (explicit broadcast)",
    "t41_textrank" -> ("pr01's exemption over the token graph: 1-row " +
      "node count + 1-row dangling-mass frame per superstep"),
    "v18_int8_recall" -> ("explicit bounded query set (vec_id < 8) on " +
      "both the exact and the dequantized brute-force lists — the v07 " +
      "recall exemption"),
    "t43_charngram_langid" -> ("1-row vocabulary scalar + <=|langs|-row " +
      "baseline frame (explicit broadcasts); the gram-keyed model join " +
      "itself is a hash join"),
    "ml26_epoch_shuffle" -> ("bucket-offset triangle (globalRowNumber) " +
      "+ <=|epochs|-row offset frame (explicit broadcast)"),
    "t42_domain_lm_delta" -> ("two 1-row vocabulary-size scalars " +
      "(explicit broadcasts) — the t28 exemption on both LM stacks"),
    "ml25_dsir_resample" -> ("ml24's 1-row corpus/target bigram totals " +
      "(explicit broadcast); the sample itself is TakeOrderedAndProject"))

  /** Queries whose single-partition stage provably does NOT carry the
    * data: document the bound. (Global windows stay banned everywhere —
    * Verify/Bench enforce that with spark.graft.failOnGlobalWindow=true.)
    */
  private val singlePartExempt: Map[String, String] = Map(
    "a30_isotonic" -> ("final hierarchical-PAV pass: sorts the (P/8)-times-" +
      "pooled block remainder, never the row frame (IsotonicOps scaladoc)"))

  /** Per-query session-conf overrides applied while the plan is built.
    * u07's full-outer join picks BroadcastNestedLoopJoin only because the
    * TEST frames sit under the broadcast threshold — a data-size accident,
    * not a bounded-by-construction property, so instead of allowlisting it
    * the sweep disables auto-broadcast for this query and asserts the join
    * compiles to the hash/sort-merge plan it would run at scale.
    */
  private val confOverride: Map[String, Seq[(String, String)]] = Map(
    "u07_snapshot_diff" -> Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1"))

  // same walk as PlanQualitySpec: every SinglePartition exchange must feed
  // an aggregate once AQE wrapper nodes are skipped
  private def singlePartViolations(p: String): Seq[String] = {
    val lines = p.linesIterator.toVector
    def depth(s: String): Int = s.segmentLength(c => !c.isLetter && c != '*' && c != '(', 0)
    val wrappers = Seq("ShuffleQueryStage", "AQEShuffleRead", "InputAdapter",
      "ResultQueryStage", "TableCacheQueryStage", "AdaptiveSparkPlan", "==")
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition")).flatMap {
      case (line, i) =>
        var dep = depth(line)
        var j = i - 1
        var parent = ""
        var found = false
        while (j >= 0 && !found) {
          val l = lines(j)
          if (l.trim.nonEmpty && depth(l) < dep) {
            if (wrappers.exists(l.contains)) dep = depth(l)
            else { parent = l; found = true }
          }
          j -= 1
        }
        if (parent.contains("HashAggregate") || parent.contains("SortAggregate") ||
          parent.contains("ObjectHashAggregate")) None
        else Some(parent.trim.take(100))
    }
  }

  test("every query plan: no cartesian, bounded BNL joins, no data-sized single partitions") {
    val failures = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val overrides = confOverride.getOrElse(name, Nil)
      val saved = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
      overrides.foreach { case (k, v) => spark.conf.set(k, v) }
      val p =
        try fn(spark, d).queryExecution.executedPlan.toString
        finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      if (p.contains("CartesianProduct"))
        failures += s"$name: CartesianProduct"
      if (p.contains("BroadcastNestedLoopJoin") && !bnlBounded.contains(name))
        failures += s"$name: BroadcastNestedLoopJoin with no documented bounded side"
      if (!singlePartExempt.contains(name)) {
        val v = singlePartViolations(p)
        if (v.nonEmpty)
          failures += s"$name: SinglePartition feeds non-aggregate: ${v.head}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
