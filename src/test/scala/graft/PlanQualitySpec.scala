package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the physical properties the 100 TB design
  * depends on, asserted so a refactor can't silently lose them.
  *
  * Broadcast decisions are AQE's now (no forced hints on unbounded sides),
  * so joins are asserted against the FINAL adaptive plan — the query runs,
  * then the re-optimized plan is inspected.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  /** Execute, then render the AQE-final plan. */
  private def finalPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, d)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  /** Assert every `Exchange SinglePartition` in the plan feeds a global
    * aggregate (whose input is one partial row per partition — bounded by
    * the cluster, not the data). A single-partition exchange consumed by a
    * Sort/Window/anything-else funnels the actual data through one task —
    * the scale-killer this suite exists to keep out.
    */
  private def assertSinglePartitionOnlyForGlobalAgg(name: String, p: String): Unit = {
    val lines = p.linesIterator.toVector
    def depth(s: String): Int = s.segmentLength(c => !c.isLetter && c != '*' && c != '(', 0)
    val wrappers = Seq("ShuffleQueryStage", "AQEShuffleRead", "InputAdapter",
      "ResultQueryStage", "TableCacheQueryStage", "AdaptiveSparkPlan", "==")
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition")).foreach {
      case (line, i) =>
        // walk up through AQE wrapper nodes to the real consumer
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
        assert(
          parent.contains("HashAggregate") || parent.contains("SortAggregate") ||
            parent.contains("ObjectHashAggregate"),
          s"$name: Exchange SinglePartition feeds a non-aggregate consumer:\n$parent\n$line")
    }
  }

  test("bucketed-table join runs with zero exchanges on either side") {
    // disable auto-broadcast so the tiny test tables take the same
    // sort-merge path the full-size tables would — the claim under test is
    // that bucketing removed BOTH shuffles, not that one side fit in memory
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val df = SparkEntry.queries("s13_bucketed_join")(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
    } finally spark.conf.set(key, saved)
  }

  test("filters and projections are pushed into the parquet scan") {
    val p = plan("s01_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"))
  }

  test("dimension joins broadcast; the fact table is never the build side") {
    val p = plan("j01_join_agg_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("as-of interval join is an equi-join with a range condition, not a cross product") {
    val p = finalPlan("j11_asof_interval")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("brute-force knn broadcasts only the query side") {
    val p = plan("v01_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"))
    // the broadcast side carries the vec_id < 8 pushdown
    assert(p.contains("LessThan(vec_id,8)"))
  }

  test("LSH candidate generation has no cartesian stage") {
    assert(!plan("d03_lsh_neardup").contains("CartesianProduct"))
  }

  test("dedup/clean stats joins: AQE broadcasts the (actually small) stats side") {
    // no forced hint anymore — at this scale AQE must still end up with a
    // broadcast-hash join, proving the size-guarded path converges to the
    // old plan when the stats side really is small
    assert(finalPlan("a05_mode_dominance").contains("BroadcastHashJoin"))
    assert(finalPlan("a06_percentile_clamp").contains("BroadcastHashJoin"))
  }

  test("top-k over unbounded counts compiles to TakeOrderedAndProject, not a global window") {
    val p04 = finalPlan("o04_topk")
    assert(p04.contains("TakeOrderedAndProject"))
    assertSinglePartitionOnlyForGlobalAgg("o04_topk", p04)
    val p14 = finalPlan("j14_topk_semi")
    assert(p14.contains("TakeOrderedAndProject"))
    assertSinglePartitionOnlyForGlobalAgg("j14_topk_semi", p14)
  }

  test("distributed rank paths never single-partition the data") {
    assertSinglePartitionOnlyForGlobalAgg("a15_auroc", finalPlan("a15_auroc"))
    assertSinglePartitionOnlyForGlobalAgg("f23_vocab_encode", finalPlan("f23_vocab_encode"))
  }

  test("decontamination is a shingle equi-join, never doc-by-doc") {
    val p = finalPlan("d09_decontaminate")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assertSinglePartitionOnlyForGlobalAgg("d09_decontaminate", p)
  }

  test("hash sampling is a pure scan-side predicate — no shuffle at all") {
    assert(!plan("ml03_hash_sample").contains("Exchange"))
  }

  test("rolling window and packing sort once per partition key, never globally") {
    assertSinglePartitionOnlyForGlobalAgg("w09_rolling_hour", finalPlan("w09_rolling_hour"))
    assertSinglePartitionOnlyForGlobalAgg("ml04_pack_bins", finalPlan("ml04_pack_bins"))
  }

  test("sparse cosine joins postings on the term, never doc-by-doc") {
    val p = finalPlan("d11_sparse_cosine")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("rollup computes all granularities in one aggregate with expand, no re-scan") {
    val p = plan("a18_rollup")
    assert(p.contains("Expand"))
    // one scan feeds the whole grouping-set tree
    assert("FileScan parquet".r.findAllIn(p).size === 1)
  }

  test("centroids aggregate with a map-side partial before the shuffle") {
    val p = plan("v04_centroid")
    // partial_avg present → per-(group,dim) rows combine before the exchange
    assert(p.contains("partial_avg") || p.contains("partial avg"))
    assertSinglePartitionOnlyForGlobalAgg("v04_centroid", p)
  }

  /** The two-phase rank/cumsum operators pin their range-bucketed frame
    * with a localCheckpoint (determinism — one bucketing for all
    * consumers), so the final plan shows the pinned scan carrying the
    * bucket-id column rather than the range exchange that produced it.
    */
  private def rangeBucketed(p: String): Boolean =
    p.contains("rangepartitioning") || p.contains("RangePartitioning") ||
      (p.contains("ExistingRDD") && p.contains("__gr_pid"))

  test("token-budget prefix sum is range-partitioned, never single-partition") {
    val p = finalPlan("ml06_token_budget")
    assertSinglePartitionOnlyForGlobalAgg("ml06_token_budget", p)
    assert(rangeBucketed(p), p)
  }

  test("dup-ngram fraction joins grams on the gram key, never doc-by-doc") {
    val p = finalPlan("t17_dup_ngrams")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assertSinglePartitionOnlyForGlobalAgg("t17_dup_ngrams", p)
  }

  test("quality gate reads the documents table once (pinned frame)") {
    val df = SparkEntry.queries("e2e_quality_gate")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // Gopher, perplexity, and DSIR all consume ONE lazily-checkpointed
    // frame: the composed gate's final plan has no file scans at all —
    // the single documents scan happened in the checkpoint job
    assert(!p.contains("FileScan"),
      s"quality gate must read documents via the pinned frame only:\n$p")
    assert(p.contains("Scan ExistingRDD"), p)
  }

  test("span decontamination reads the documents table once (marked form)") {
    val df = SparkEntry.queries("d27_span_decontaminate")(spark, d)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // every view (suffix rank, set markers, eval keep-list) projects off
    // the ONE checkpointed base frame — the two-frame union form would
    // re-scan the corpus four times
    assert(!p.contains("FileScan"),
      s"d27 must read documents via the pinned frame only:\n$p")
  }

  test("entropy and retention are pure hash-aggregate towers — no windows, no sorts") {
    Seq("t16_source_entropy", "a19_behavior_entropy", "q02_retention").foreach { q =>
      val p = finalPlan(q)
      assert(!p.contains("Window"), s"$q:\n$p")
      assertSinglePartitionOnlyForGlobalAgg(q, p)
    }
  }

  test("EWMA window is keyed per entity — no single-partition exchange") {
    assertSinglePartitionOnlyForGlobalAgg("w12_ewma", finalPlan("w12_ewma"))
  }

  test("BM25 and weighted sampling top-k are TakeOrderedAndProject, not global sorts") {
    val p19 = finalPlan("t19_bm25_topk")
    assert(p19.contains("TakeOrderedAndProject"))
    assertSinglePartitionOnlyForGlobalAgg("t19_bm25_topk", p19)
    val p08 = finalPlan("ml08_weighted_sample")
    assert(p08.contains("TakeOrderedAndProject"))
    assert(!p08.contains("Window"))
  }

  test("segment dedup joins on the segment key, never doc-by-doc; no windows") {
    val p = finalPlan("d13_segment_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"))
    assertSinglePartitionOnlyForGlobalAgg("d13_segment_dedup", p)
  }

  test("quantile gate / MAD / PSI never single-partition the fact side") {
    Seq("q03_domain_quantile_gate", "dq04_mad_outliers", "dq03_psi").foreach { q =>
      assertSinglePartitionOnlyForGlobalAgg(q, finalPlan(q))
    }
  }

  test("percent-rank and curriculum ranks are range-partitioned, never one task") {
    Seq("f24_percent_rank", "ml09_curriculum_phase").foreach { q =>
      val p = finalPlan(q)
      assert(rangeBucketed(p), q)
      assertSinglePartitionOnlyForGlobalAgg(q, p)
    }
  }

  test("PMI joins bigrams on the token keys, never doc-by-doc; no windows") {
    val p = finalPlan("t20_pmi_bigrams")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"))
    assertSinglePartitionOnlyForGlobalAgg("t20_pmi_bigrams", p)
  }
}
