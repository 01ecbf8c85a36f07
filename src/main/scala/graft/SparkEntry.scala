package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.Knn
import graft.dedup.DedupOps
import graft.functions.{TextFns, VectorFns}
import graft.multimodal.BinaryOps
import graft.operators._

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * each exercised on the harness test tables with a DuckDB-equivalent oracle.
  *
  * Key naming: `<§2 id>_<name>` (e.g. `j11_asof_interval` = SURVEY §2.3 J11).
  * Column names are aligned 1:1 between the Spark query and its oracle SQL
  * (the driver sorts columns by name before hashing). Floating-point outputs
  * are rounded on both sides so cross-engine summation order can't flip a
  * hash.
  */
object SparkEntry {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def nat(s: SparkSession, d: String) = Tables.nation(s, d)
  private def prt(s: SparkSession, d: String) = Tables.part(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  // ---- shared ExactSubstr span profile ------------------------------------
  // d22/d23/d24/d25/d26/d27 and e2e_span_family are all views over ONE
  // suffix-rank front end (QualityOps.SpanProfile). Queries are issued
  // separately by Verify/Bench, so the profile is memoized per
  // (session, sfDir) and its checkpointed frames PINNED: Bench's
  // per-query block cleanup skips pinned RDD ids (and resets the cache at
  // each pass boundary, so every timed pass pays the build exactly once —
  // the honest amortized cost, attributed to whichever family member runs
  // first).
  private val sharedCache =
    scala.collection.concurrent.TrieMap
      .empty[(SparkSession, String, String), AnyRef]
  private def cached[T <: AnyRef](s: SparkSession, d: String, tag: String)(
      build: => T): T =
    sharedCache.getOrElseUpdate((s, d, tag), build).asInstanceOf[T]
  private val sharedRddIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Is `rddId` one of the shared-profile checkpoint blocks? (Bench's
    * per-query cleanup must not unpersist these.)
    */
  def isSharedRdd(rddId: Int): Boolean = sharedRddIds.contains(rddId)

  /** Drop every memoized shared frame for `s` and unpersist its blocks —
    * called by Bench at pass boundaries so each timed pass rebuilds (and
    * is charged for) the shared front end exactly once.
    */
  def resetShared(s: SparkSession): Unit = synchronized {
    sharedCache.keys.filter(_._1 eq s).foreach(sharedCache.remove)
    val live = s.sparkContext.getPersistentRDDs
    val it = sharedRddIds.iterator()
    while (it.hasNext) {
      val id = it.next()
      live.get(id).foreach(_.unpersist(false))
      it.remove()
    }
  }

  /** Eager local checkpoint that records the persisted RDD id(s) it
    * creates, so [[isSharedRdd]] can exempt them from per-query cleanup.
    * Eager (not lazy) is load-bearing twice over: the before/after diff
    * is only attributable single-threaded at build time, and a pinned
    * frame must hold its own blocks — its UPSTREAM per-round checkpoints
    * (e.g. connectedComponents' label rounds) are not pinned and will be
    * swept, which is only safe once this frame is fully materialized.
    */
  private def pinCk(s: SparkSession)(df: DataFrame): DataFrame =
    synchronized {
      val before = s.sparkContext.getPersistentRDDs.keySet
      val ck = df.localCheckpoint(true)
      val after = s.sparkContext.getPersistentRDDs.keySet
      after.filterNot(before).foreach(sharedRddIds.add)
      ck
    }

  /** The ONE tokenized-corpus frame both shared profiles project off —
    * `(doc_id, __t, n_toks)`, pinned: the span family's suffix rank and
    * the LM family's gram collapses all start here, so the corpus is
    * tokenized once per pass, not once per family member.
    */
  private def sharedToks(s: SparkSession, d: String): DataFrame =
    cached(s, d, "toks") {
      pinCk(s)(Tables.spread(docs(s, d).select(col("doc_id"), col("text")),
          tinyBytes = 0L)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("__t"))
        .select(col("doc_id"), col("__t"), size(col("__t")).as("n_toks")))
    }

  private def spanProf(s: SparkSession, d: String): graft.operators.SpanProfile =
    cached(s, d, "span") {
      QualityOps.spanProfileFromToks(sharedToks(s, d), "doc_id",
        minLen = 5, cap = 64, checkpoint = pinCk(s))
    }

  private def gramProf(s: SparkSession, d: String): graft.operators.GramProfile =
    cached(s, d, "gram") {
      SummaryOps.gramProfile(sharedToks(s, d), "doc_id", pinCk(s))
    }

  /** t43's char-trigram counts frame, pinned beside the token profiles:
    * the in-row RLE collapse (QualityOps.charGramCounts) runs once per
    * pass and the model/scoring re-aggregates all read the pinned frame.
    */
  private def charGramProf(s: SparkSession, d: String): DataFrame =
    cached(s, d, "chargram") {
      pinCk(s)(QualityOps.charGramCounts(docs(s, d), "doc_id", "text",
        "lang", n = 3))
    }

  /** The embeddings covariance frame over a PINNED moments aggregate —
    * v09 reads it directly and v10's PCA collects it, so the corpus-wide
    * covariance scan runs once per pass, not once per consumer.
    */
  private def embCov(s: SparkSession, d: String): DataFrame =
    cached(s, d, "embcov") {
      RegressionOps.embeddingCovariance(emb(s, d), col("embedding"),
        checkpoint = pinCk(s))
    }

  /** The part co-occurrence edge list `(src, dst, cnt)` — the basket
    * self-join is the dominant term of SEVEN graph queries (g01, g03-g08
    * minus the transition-graph ones), each of which only filters or
    * traverses it; pinned unfiltered so every consumer applies its own
    * support threshold.
    */
  private def partEdges(s: SparkSession, d: String): DataFrame =
    cached(s, d, "partEdges") {
      pinCk(s)(GraphOps.coOccurrenceEdges(li(s, d),
        "l_orderkey", "l_partkey"))
    }

  /** The brand co-occurrence edge list (g02 triangles, g10 clustering). */
  private def brandEdges(s: SparkSession, d: String): DataFrame =
    cached(s, d, "brandEdges") {
      val baskets = li(s, d)
        .join(prt(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand"))
      pinCk(s)(GraphOps.coOccurrenceEdges(baskets, "l_orderkey", "p_brand"))
    }

  /** The eval pairing's clipped WORD-gram match frame (m1, m2, lens) —
    * BLEU (t47), ROUGE-2 (t48) and the composed report all close over
    * the IDENTICAL frame.
    */
  private def wordOverlap(s: SparkSession, d: String): DataFrame =
    cached(s, d, "wordOv") {
      pinCk(s)(EvalOps.ngramOverlap(docs(s, d), "doc_id", "text",
        evalPairs(s, d), maxN = 2))
    }

  /** The eval pairing's clipped CHAR-gram match frame (chrF + report). */
  private def charOverlap(s: SparkSession, d: String): DataFrame =
    cached(s, d, "charOv") {
      pinCk(s)(EvalOps.charNgramOverlap(docs(s, d), "doc_id", "text",
        evalPairs(s, d), maxN = 3))
    }
  // -------------------------------------------------------------------------

  /** 4 patterned 64-dim centroids for `v03b_assign_fixed` — one closed form
    * feeds BOTH the Spark literal and the generated oracle SQL, so the two
    * engines argmin against bit-identical values.
    */
  private val fixedCentroids: Seq[Seq[Double]] =
    (0 until 4).map(j => (0 until 64).map(i => ((i * (j + 3)) % 11) / 11.0 - 0.5).toSeq)

  private def fixedCentroidsSqlValues: String =
    fixedCentroids.zipWithIndex
      .map { case (c, j) => s"($j, [${c.mkString(", ")}])" }
      .mkString(", ")

  /** 16 patterned 64-dim centroids for `d19_semdedup` — same
    * rational-lattice family as [[fixedCentroids]] but mod 17 so all 16
    * row patterns are distinct (mod 11 would repeat after 11). One closed
    * form feeds BOTH the Spark literal and the oracle SQL.
    */
  private val semCentroids: Seq[Seq[Double]] =
    (0 until 16).map(j => (0 until 64).map(i => ((i * (j + 3)) % 17) / 17.0 - 0.5).toSeq)

  private def semCentroidsSqlValues: String =
    semCentroids.zipWithIndex
      .map { case (c, j) => s"($j, [${c.mkString(", ")}])" }
      .mkString(", ")

  /** Canonical product-noun dictionary for `f26_fuzzy_normalize` — one list
    * feeds both the Spark literal and the oracle's VALUES, deliberately
    * holding exact forms, off-by-one plurals, and terms nothing matches.
    */
  private val fuzzyDict: Seq[String] =
    Seq("anvils", "bolt", "gadget", "gears", "plate", "rings", "rod",
      "sprocket", "widgets")

  private def fuzzyDictSqlValues: String =
    fuzzyDict.map(t => s"('$t')").mkString(", ")

  /** `NotesNlp.lemmaDict` as a SQL VALUES list — one Scala list feeds both
    * the t09b broadcast join and its oracle.
    */
  private def lemmaDictSqlValues: String =
    graft.functions.NotesNlp.lemmaDict
      .map { case (f, l) => s"('$f', '$l')" }.mkString(", ")

  /** PQ codebooks for `v08_pq_adc`: 8 subspaces × 4 codewords × 8 dims,
    * the same rational-lattice family as [[fixedCentroids]] so both
    * engines parse the identical doubles.
    */
  private val pqCodebooks: graft.ann.Pq.Codebooks =
    (0 until 8).map(j => (0 until 4).map(c =>
      (0 until 8).map(t => (((j * 8 + t) * (c + 3)) % 11) / 11.0 - 0.5).toSeq).toSeq)

  private def pqCodebookSqlValues: String =
    pqCodebooks.zipWithIndex.flatMap { case (cws, j) =>
      cws.zipWithIndex.map { case (cw, c) => s"($j, $c, [${cw.mkString(", ")}])" }
    }.mkString(", ")

  /** One-time ingest for `s13_bucketed_join`: bucket both join sides on the
    * key at write time, once per (session, sf dir). Re-invocations with the
    * same inputs are no-ops, so a timed query run measures the
    * zero-exchange JOIN rather than re-paying the table build — mirroring
    * the production shape, where ingest bucketing is amortized over every
    * later run. A dir change (bench warms up at sf0.001, then times at the
    * target scale) rebuilds.
    */
  @volatile private var s13BuiltFor: Option[(Int, String)] = None
  private def ensureS13Tables(s: SparkSession, d: String): Unit = synchronized {
    val key = (System.identityHashCode(s), d)
    if (!s13BuiltFor.contains(key) ||
        !s.catalog.tableExists("graft_s13_orders") ||
        !s.catalog.tableExists("graft_s13_items")) {
      graft.sources.Sinks.bucketedTable(
        ord(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
        "graft_s13_orders", "o_orderkey", 8)
      graft.sources.Sinks.bucketedTable(
        li(s, d).groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(round(sum(col("l_quantity")), 6).as("qty")),
        "graft_s13_items", "o_orderkey", 8)
      s13BuiltFor = Some(key)
    }
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Revenue per
    * nation — scan → broadcast dims → shuffle agg, the engine's join/agg
    * spine (SURVEY §2.3 J1/J2).
    */
  def entry(spark: SparkSession): DataFrame =
    revenueByNation(spark, "/root/testdata/sf0.001")

  /** Revenue per nation. The fact table is pre-aggregated to one row per
    * order BEFORE the join (map-side combine shrinks the shuffle to
    * |orders| rows and the join probes 4× fewer rows); dimensions broadcast.
    * At 100 TB this partial-aggregate-below-join shape is the difference
    * between shuffling the lineitem table and shuffling the orders table.
    */
  private def revenueByNation(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("__rev"),
        count(lit(1)).as("__n"))
      .join(ord(s, d).select("o_orderkey", "o_custkey"), Seq("o_orderkey"))
      // customer is a DATA-sized dimension (not bounded by construction) —
      // no forced hint, AQE broadcasts iff it fits; nation is 25 rows
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("__rev")), 2).as("revenue"),
        sum(col("__n")).cast("long").as("n_items"))

  // ---- events-derived helpers (J11 as-of fixtures) ----

  /** Signup sessions: [signup_ts, signup_ts + 2h] intervals per user. */
  private def sessions(s: SparkSession, d: String): DataFrame =
    ev(s, d).filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("session_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("session_end"))

  private def clicksWithSession(s: SparkSession, d: String): DataFrame =
    JoinOps.asOfPointInInterval(
      points = ev(s, d).filter(col("event_type") === "click").select("event_id", "user_id", "ts"),
      intervals = sessions(s, d),
      partKey = "user_id", pointTs = "ts",
      startCol = "session_start", endCol = "session_end",
      asOfName = "session_start")

  // ---- MIMIC-shaped fabrications for the composed §3 e2e queries ----
  // The api.Pipeline facade is column-binding-agnostic; these map the
  // harness tables onto a visit/patient/measurement schema with pure
  // integer arithmetic so the oracle fabricates the identical frames.

  /** Patients: customer → (subject_id, age, dod); every 7th patient has a
    * death timestamp at a deterministic day offset.
    */
  private def patientsT(s: SparkSession, d: String): DataFrame =
    cust(s, d).select(
      col("c_custkey").as("subject_id"),
      (col("c_custkey") % 80 + 5).as("age"),
      when(col("c_custkey") % 7 === 0,
        to_timestamp(lit("1994-01-01 00:00:00")) +
          expr("make_dt_interval(cast(c_custkey % 2000 as int), 0, 0, 0)"))
        .as("dod"))

  /** Visits: orders → (subject_id, hadm_id, admittime, dischtime) with a
    * 1-21-day deterministic stay length.
    */
  private def visitsT(s: SparkSession, d: String): DataFrame =
    ord(s, d).select(
      col("o_custkey").as("subject_id"),
      col("o_orderkey").as("hadm_id"),
      col("o_orderdate").as("admittime"),
      (col("o_orderdate") +
        expr("make_dt_interval(cast(o_orderkey % 21 + 1 as int), 0, 0, 0)"))
        .as("dischtime"))

  /** Measurements: lineitem → (hadm_id, itemid, charttime, uom, cents). */
  private def measuresT(s: SparkSession, d: String): DataFrame =
    li(s, d).select(
      col("l_orderkey").as("hadm_id"),
      col("l_partkey").as("itemid"),
      col("l_shipdate").as("charttime"),
      col("l_linestatus").as("uom"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("val_cents"))

  private def e2eCohort(s: SparkSession, d: String): DataFrame =
    api.CohortExtractor.extract(visitsT(s, d), patientsT(s, d),
      api.CohortConfig(task = api.Mortality("dod")))

  private def e2eEvents(s: SparkSession, d: String): DataFrame =
    api.FeatureExtractor.eventsForCohort(measuresT(s, d), e2eCohort(s, d),
      "hadm_id", "charttime", "admittime")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // ---------------- scans / projections / filters ----------------
    "s01_scan_project" -> ((s, d) =>
      li(s, d).filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    "p02_null_filter" -> ((s, d) =>
      clicksWithSession(s, d).filter(col("session_start").isNull)
        .select("event_id", "user_id")),

    "p06_semi_filter" -> ((s, d) =>
      JoinOps.semiFilter(li(s, d), Seq("l_orderkey"),
          ord(s, d).filter(col("o_orderstatus") === "F").select(col("o_orderkey").as("l_orderkey")))
        .select("l_orderkey", "l_linenumber")),

    "p09_dedup" -> ((s, d) =>
      li(s, d).select("l_returnflag", "l_linestatus").dropDuplicates()),

    "p12_clip_overwrite" -> ((s, d) =>
      li(s, d).select(col("l_orderkey"), col("l_linenumber"),
        least(col("l_quantity"), lit(25.0)).as("qty_clip"))),

    "p13_threshold_label" -> ((s, d) =>
      CohortOps.thresholdLabel(ord(s, d), col("o_totalprice"), lit(250000.0), "label")
        .select("o_orderkey", "label")),

    // ---------------- joins ----------------
    "j01_join_agg_revenue" -> ((s, d) => revenueByNation(s, d)),

    "j09_anti_join" -> ((s, d) =>
      JoinOps.antiFilter(cust(s, d).withColumn("o_custkey", col("c_custkey")),
          Seq("o_custkey"), ord(s, d).filter(col("o_orderstatus") === "P"))
        .select("c_custkey")),

    "j10_first_match_lookup" -> ((s, d) => {
      val brandMap = JoinOps.firstMatchLookup(prt(s, d), "p_brand", "p_type", "p_partkey")
      prt(s, d).select("p_partkey", "p_brand")
        .join(broadcast(brandMap.withColumnRenamed("p_type", "brand_type")), Seq("p_brand"))
        .select("p_partkey", "brand_type")
    }),

    "j11_asof_interval" -> ((s, d) =>
      clicksWithSession(s, d).select("event_id", "session_start")),

    "j12_next_within_gap" -> ((s, d) =>
      CohortOps.nextWithinGapLabel(ord(s, d), "o_custkey", "o_orderdate", "o_orderkey",
          expr("INTERVAL 90 DAYS"), "label")
        .select("o_orderkey", "label")),

    "j13_interval_label" -> ((s, d) =>
      CohortOps.intervalLabel(
          li(s, d).join(ord(s, d), col("l_orderkey") === col("o_orderkey")),
          col("l_shipdate"), col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "label")
        .select("l_orderkey", "l_linenumber", "label")),

    "j14_topk_semi" -> ((s, d) =>
      JoinOps.semiTopK(li(s, d), "l_partkey", 25)
        .select("l_orderkey", "l_linenumber", "l_partkey")),

    // ---------------- aggregations ----------------
    "a01_group_count" -> ((s, d) =>
      li(s, d).groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))),

    "a02_mean_frequency" -> ((s, d) =>
      SummaryOps.meanFrequency(
        Tables.spread(li(s, d).select("l_orderkey", "l_partkey"), tinyBytes = 0L),
        "l_orderkey", "l_partkey")),

    "a03_missing_rate" -> ((s, d) =>
      SummaryOps.missingRate(li(s, d), "l_returnflag", col("l_discount") === 0.0)),

    "a04_multi_agg" -> ((s, d) =>
      li(s, d).groupBy("l_returnflag", "l_linestatus").agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        max("l_shipdate").as("max_ship"),
        count(lit(1)).as("count_order"))),

    "a05_mode_dominance" -> ((s, d) =>
      CleaningOps.dominantCategoryFilter(li(s, d), "l_partkey", "l_returnflag", 0.5)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag")),

    "a06_percentile_clamp" -> ((s, d) =>
      CleaningOps.percentileClamp(
          li(s, d).select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"),
          "l_returnflag", "l_extendedprice", 0.02, 0.98)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price_clamped"))),

    "a07_distinct_count" -> ((s, d) =>
      li(s, d).groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"))),

    "a08_max_group_size" -> ((s, d) =>
      SummaryOps.maxGroupSize(li(s, d), "l_orderkey")),

    "a09_value_counts" -> ((s, d) =>
      SummaryOps.valueCounts(ev(s, d), "event_type")),

    "a12_confusion_metrics" -> ((s, d) => {
      val nli = li(s, d).groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("n_items"))
      val scored = ord(s, d).join(nli, Seq("o_orderkey"), "left")
        .withColumn("truth", when(col("o_totalprice") >= 250000.0, 1).otherwise(0))
        .withColumn("pred", when(coalesce(col("n_items"), lit(0L)) >= 4, 1).otherwise(0))
      MetricsOps.confusionMetrics(scored, col("truth"), col("pred"))
    }),

    "a14_calibration_bins" -> ((s, d) =>
      MetricsOps.calibrationBins(li(s, d),
        col("l_discount") * 10.0, when(col("l_returnflag") === "R", 1).otherwise(0), 10)),

    "a15_auroc" -> ((s, d) =>
      MetricsOps.aurocRankSum(ord(s, d), col("o_totalprice"),
        when(col("o_orderstatus") === "F", 1).otherwise(0), col("o_orderkey"))),

    // exact average precision (PR-curve area, sklearn step form) — the
    // companion scalar to a15; fixed-point term accumulation keeps the
    // ~|distinct scores|-term sum order-insensitive (see MetricsOps scaladoc)
    "a20_auprc" -> ((s, d) =>
      MetricsOps.averagePrecision(ord(s, d), col("o_totalprice"),
        when(col("o_orderstatus") === "F", 1).otherwise(0))),

    // decile gains/lift table on the same (score, label) pair — exact
    // integer deciles via the distributed rank, single-division doubles
    "a22_gains_deciles" -> ((s, d) =>
      MetricsOps.gainsTable(ord(s, d), col("o_totalprice"),
        when(col("o_orderstatus") === "F", 1).otherwise(0), col("o_orderkey"))),

    // ---------------- windows ----------------
    "w02_group_max_year" -> ((s, d) =>
      CohortOps.groupMax(ord(s, d), "o_custkey", year(col("o_orderdate")), "max_year")
        .select(col("o_orderkey"), col("max_year").cast("int").as("max_year"))),

    "w03_ffill_bfill" -> ((s, d) => {
      val base = ev(s, d).withColumn("v",
        when(col("event_type") === "purchase", col("value")))
      val ff = WindowOps.forwardFill(base, Seq("user_id"), Seq("ts", "event_id"), col("v"), "ffill_value")
      WindowOps.backwardFill(ff, Seq("user_id"), Seq("ts", "event_id"), col("v"), "bfill_value")
        .select(col("event_id"),
          round(col("ffill_value"), 2).as("ffill_value"),
          round(col("bfill_value"), 2).as("bfill_value"))
    }),

    "w08_lag_gap" -> ((s, d) =>
      WindowOps.lagGap(ord(s, d), Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"),
          col("o_orderdate"), (prev, cur) => datediff(cur, prev), "gap_days")
        .select(col("o_orderkey"), col("gap_days").cast("int").as("gap_days"),
          coalesce(col("gap_days"), lit(-1)).cast("int").as("gap_days_filled"))),

    "f19_quantile_bin" -> ((s, d) =>
      WindowOps.quantileBin(ord(s, d), Seq("o_orderstatus"), Seq("o_totalprice", "o_orderkey"),
          4, "quartile")
        .select("o_orderkey", "quartile")),

    // ---------------- sorts / top-k / sets ----------------
    // orderBy().limit(k) → TakeOrderedAndProject: distributed per-partition
    // heaps, identical tie-break semantics to a rank-filter, no
    // single-partition exchange over the (unbounded) counts frame
    // balanced range-partition boundaries for a 32-bucket write of
    // lineitem by price — exact type-7 quantiles via two-phase rank, the
    // data frame touched exactly twice, no global sort ever
    "o07_range_splits" -> ((s, d) =>
      RankOps.rangeSplitPoints(li(s, d), col("l_extendedprice"),
        nBuckets = 32)),

    "o04_topk" -> ((s, d) =>
      li(s, d).groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_partkey").asc)
        .limit(10)),

    "u01_union_label" -> ((s, d) =>
      ord(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), lit("hi").as("seg"))
        .unionByName(
          ord(s, d).filter(col("o_totalprice") < 50000.0)
            .select(col("o_orderkey"), lit("lo").as("seg")))),

    "u03_densify_missing" -> ((s, d) => {
      val e = ev(s, d)
      val users = e.select("user_id").distinct()
      val observed = e.select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day"))
      TimeSeriesOps.missingBuckets(users, "user_id", lit(30), observed, "day")
        .withColumnRenamed("day", "missing_day")
    }),

    "u04_except_ids" -> ((s, d) =>
      ord(s, d).filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
        .except(ord(s, d).filter(col("o_orderstatus") === "P").select("o_custkey").distinct())),

    // ---------------- scalar functions ----------------
    "f02_floor_hours" -> ((s, d) =>
      li(s, d).join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          floor((unix_timestamp(col("l_shipdate")) - unix_timestamp(col("o_orderdate"))) / 3600L)
            .cast("long").as("ship_hours"))),

    "f09_string_norm" -> ((s, d) =>
      prt(s, d).select(col("p_partkey"),
        regexp_replace(lower(trim(col("p_name"))), " ", "_").as("norm_name"),
        substring(col("p_brand"), 7, 2).as("brand_suffix"))),

    "f14_hof_filter" -> ((s, d) =>
      prt(s, d).select(col("p_partkey"),
        array_join(filter(split(col("p_name"), " "), x => x.contains("e")), ",").as("e_tokens"))),

    "f20_decade_bin" -> ((s, d) =>
      ev(s, d).select(col("event_id"),
        concat((floor(col("value") / 10) * 10).cast("long").cast("string"), lit("-"),
          (floor(col("value") / 10) * 10 + 9).cast("long").cast("string")).as("value_decade"))),

    // ---------------- ML prep (stage-5 relational parts) ----------------
    "ml01_kfold_split" -> ((s, d) =>
      FoldOps.assignFolds(ord(s, d), "o_orderkey", 5)
        .select("o_orderkey", "fold")),

    "ml02_oversample" -> ((s, d) =>
      FoldOps.oversample(ord(s, d), col("o_totalprice") > 400000.0, 3)
        .select("o_orderkey", "copy_id")),

    // deterministic stratified downsampling by md5 nibble: the corpus-
    // rebalancing primitive (e.g. keep 25% of en, 50% of zh, 75% of the
    // rest) — a pure pushdown predicate, stable under repartitioning
    "ml03_hash_sample" -> ((s, d) =>
      FoldOps.stratifiedHashSample(docs(s, d), col("doc_id"), col("lang"),
          Map("en" -> 4, "zh" -> 8), default = 12)
        .select("doc_id", "lang", "h16")),

    // sequence packing: documents laid end-to-end per source in doc_id
    // order, cut into 256-token bins by a running prefix-sum window
    "ml04_pack_bins" -> ((s, d) => {
      val t = docs(s, d)
        .select(col("doc_id"), col("source"),
          size(TextFns.tokens(col("text"))).as("n_tokens"))
      FoldOps.packByCumsum(t, Seq("source"), Seq("doc_id"),
          col("n_tokens"), capacity = 256)
        .select("doc_id", "source", "n_tokens", "bin_id")
    }),

    // trailing 1-hour rolling mean/count per user — RANGE frame over epoch
    // seconds, one sort exchange, no self-join
    "w09_rolling_hour" -> ((s, d) =>
      WindowOps.rollingBySeconds(ev(s, d), Seq("user_id"), "ts",
          col("value"), seconds = 3600L)
        .select(col("event_id"), col("user_id"),
          round(col("roll_avg"), 6).as("roll_avg"),
          col("roll_n").cast("long").as("roll_n"))),

    // per-label embedding centroids, tall (label, pos, mean): the class-
    // prototype / diversity-sampling primitive
    "v04_centroid" -> ((s, d) => Knn.centroids(emb(s, d), "label", "embedding")),

    // fixed-size token chunking (context-window packing prep): each doc
    // split into 32-token windows via a generated chunk index + slice
    "t13_chunk" -> ((s, d) => {
      val W = 32
      val t = docs(s, d)
        .withColumn("toks", TextFns.tokens(col("text")))
        .withColumn("__n", size(col("toks")))
      // zero-token docs yield zero chunks: without the filter,
      // sequence(0, floor(-1/W)) = sequence(0, -1) walks BACKWARDS and
      // emits two garbage chunk rows (same hazard class as
      // intervalOverlapPairs' degenerate intervals)
      t.filter(col("__n") > 0)
        .withColumn("chunk_idx",
          explode(sequence(lit(0), floor((col("__n") - 1) / W).cast("int"))))
        .select(col("doc_id"), col("chunk_idx"),
          array_join(slice(col("toks"), col("chunk_idx") * W + 1, lit(W)), " ")
            .as("chunk_text"),
          least(col("__n") - col("chunk_idx") * W, lit(W)).cast("int")
            .as("chunk_tokens"))
    }),

    // quality-filter funnel: survivor count after each successive filter
    // stage (the standard corpus-curation report), one aggregate pass
    "q01_funnel" -> ((s, d) => {
      val stop = Seq("the", "a", "of", "and", "to")
      val t = docs(s, d)
        .withColumn("toks", TextFns.tokens(col("text")))
        .withColumn("__n", size(col("toks")))
        .withColumn("__stop", TextFns.tokenCountIn(col("toks"), stop))
      val cLang = col("lang") === "en"
      val cLen = col("n_chars").between(100, 400)
      val cQual = col("__n").between(20, 500) &&
        col("__stop").cast("double") / col("__n") < 0.4
      t.agg(
          count(lit(1)).as("s0"),
          sum(when(cLang, 1L).otherwise(0L)).as("s1"),
          sum(when(cLang && cLen, 1L).otherwise(0L)).as("s2"),
          sum(when(cLang && cLen && cQual, 1L).otherwise(0L)).as("s3"))
        .select(expr(
          "stack(4, '00_all', s0, '10_lang_en', s1, '20_len', s2, " +
            "'30_quality', s3) as (stage, survivors)"))
    }),

    // per-group z-score outlier flagging (data-quality pass): group stats
    // via one aggregate, re-attached with an AQE-sized join — no window
    // sort over the fact table
    "dq02_outliers" -> ((s, d) => {
      val stats = ev(s, d).groupBy("event_type")
        .agg(avg("value").as("__mu"), stddev_samp(col("value")).as("__sd"))
      ev(s, d).join(stats, Seq("event_type"))
        .withColumn("z", (col("value") - col("__mu")) / col("__sd"))
        .filter(abs(col("z")) > 2.5)
        .select(col("event_id"), col("event_type"), round(col("z"), 6).as("z"))
    }),

    // OLAP grouping sets: revenue at (flag, status), per-flag subtotal,
    // and grand total in ONE pass — rollup's partial aggregates combine
    // map-side; the reference computes each granularity as a separate scan
    "a18_rollup" -> ((s, d) =>
      li(s, d).rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"), col("revenue"), col("n"))),

    // ordered funnel conversion: users whose first signup precedes their
    // first click precedes their first purchase — one pivot of min-ts per
    // stage, no self-joins
    "u06_funnel_stages" -> ((s, d) => {
      val m = ev(s, d)
        .filter(col("event_type").isin("signup", "click", "purchase"))
        .groupBy("user_id")
        .pivot("event_type", Seq("signup", "click", "purchase"))
        .agg(min(col("ts")))
      m.agg(
          count(lit(1)).as("s0"),
          sum(when(col("signup").isNotNull, 1L).otherwise(0L)).as("s1"),
          sum(when(col("signup") < col("click"), 1L).otherwise(0L)).as("s2"),
          sum(when(col("signup") < col("click") && col("click") < col("purchase"),
            1L).otherwise(0L)).as("s3"))
        .select(expr(
          "stack(4, '00_any', s0, '10_signup', s1, '20_then_click', s2, " +
            "'30_then_purchase', s3) as (stage, users)"))
    }),

    // sparse TF-IDF cosine pairs over a trigram inverted index (the
    // sparse-vector sibling of d06's dense embedding near-dup)
    "d11_sparse_cosine" -> ((s, d) =>
      DedupOps.tfidfCosinePairs(docs(s, d), "doc_id", "text",
        shingleN = 3, threshold = 0.5)),

    // Pearson correlation of numeric column pairs, melted tall — the
    // feature-analysis staple; one aggregate pass for all pairs
    "a17_corr_pairs" -> ((s, d) =>
      li(s, d).agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("c_qp"),
          round(corr(col("l_quantity"), col("l_discount")), 6).as("c_qd"),
          round(corr(col("l_extendedprice"), col("l_tax")), 6).as("c_pt"))
        .select(expr(
          "stack(3, 'quantity~extendedprice', c_qp, 'quantity~discount', c_qd, " +
            "'extendedprice~tax', c_pt) as (pair, r)"))),

    // daily active / new / cumulative-unique users. Running distinct count
    // without a window-distinct (unsupported + unbounded state): first-seen
    // day per user, then a running total. The cumsum runs through RankOps'
    // two-phase distributed form — the days frame is calendar-bounded so a
    // single-partition window would also survive, but using the exchange-
    // parallel path keeps the suite at ZERO global windows, which lets
    // Verify/Bench run with spark.graft.failOnGlobalWindow=true and no
    // exemptions
    "w11_cum_uniques" -> ((s, d) => {
      val active = ev(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("active_users"))
      val firsts = ev(s, d)
        .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      val joined = active.join(firsts, Seq("day"), "left")
        .na.fill(0L, Seq("new_users"))
      RankOps.globalCumsum(joined, Seq(col("day").asc), col("new_users"), "cum_users")
        .withColumn("cum_users", col("cum_users").cast("long"))
    }),

    // incremental near-dup: the 20% "new batch" (doc_id % 5 = 0) against
    // the 80% "existing index" — candidates are new×index only
    "d12_incremental_neardup" -> ((s, d) => {
      val all = docs(s, d)
      DedupOps.nearDupAgainstIndex(
        all.filter(col("doc_id") % 5 === 0),
        all.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", shingleN = 3, k = 12, bands = 6, threshold = 0.5)
    }),

    // TPC-H Q5-shaped snowflake: local-supplier revenue per ASIA nation for
    // 1996 orders. Five joins, one aggregate; the fact table is filtered
    // through the orders semi-path BEFORE touching dimensions, region/
    // nation broadcast as literal-bounded dims, customer/supplier left to
    // AQE. The classic join-reorder + pushdown stress test
    "j16_snowflake_q5" -> ((s, d) => {
      val asiaNat = nat(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val o96 = ord(s, d)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
        .select("o_orderkey", "o_custkey")
      li(s, d).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o96, col("l_orderkey") === col("o_orderkey"))
        .join(cust(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNat), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
    }),

    // end-to-end dedup survivor list: LSH pairs → components → drop
    // non-canonical members; untouched docs bypass the component step
    "d10_dedup_keep" -> ((s, d) =>
      DedupOps.dropNearDups(docs(s, d), "doc_id", "text",
          shingleN = 3, k = 12, bands = 6, threshold = 0.5)
        .select("doc_id")),

    // sliding-window rollup (1h window, 15min slide): each event lands in
    // exactly 4 windows; Spark's native window() generator, epoch-aligned
    "w10_sliding_window" -> ((s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("w.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value"))),

    // exact-n deterministic sample per stratum (reservoir-sampling answer,
    // order-independent): rank by md5 within stratum, keep first 30
    "ml05_topn_sample" -> ((s, d) =>
      FoldOps.perStratumTopN(docs(s, d), col("lang"), col("doc_id"), 30)
        .select(col("doc_id"), col("lang"), col("rk").cast("int").as("rk"))),

    // int8 scalar quantization of embeddings (4x ANN memory cut), tall
    // (vec_id, pos, qv) with the per-vector dequant params
    "v05_quantize" -> ((s, d) => {
      val base = emb(s, d)
        .select(col("vec_id"), VectorFns.toDoubleArr(col("embedding")).as("__v"))
        .withColumn("__lo", array_min(col("__v")))
        .withColumn("__hi", array_max(col("__v")))
      base.select(col("vec_id"), col("__lo"), col("__hi"),
          posexplode(VectorFns.int8Quantize(col("__v"), col("__lo"), col("__hi")))
            .as(Seq("pos", "qv")))
        .select(col("vec_id"), col("pos"), col("qv"),
          round(col("__lo"), 6).as("qmin"),
          round((col("__hi") - col("__lo")) / 255.0, 9).as("qscale"))
    }),

    // corpus-level top-k n-grams (the Gopher-style repetition signal at
    // corpus granularity): hash-agg then TakeOrderedAndProject, never a
    // global window
    "t14_ngram_topk" -> ((s, d) =>
      Tables.spread(docs(s, d).select("doc_id", "text"), tinyBytes = 0L)
        .select(explode(TextFns.rawShingles(TextFns.tokens(col("text")), 3)).as("tri"))
        .groupBy("tri").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tri").asc)
        .limit(25)),

    // benchmark decontamination: corpus docs sharing any 5-gram shingle
    // with the held-out "benchmark" slice (doc_id % 37 = 0)
    "d09_decontaminate" -> ((s, d) => {
      val all = docs(s, d)
      DedupOps.decontaminate(
        all.filter(col("doc_id") % 37 =!= 0),
        all.filter(col("doc_id") % 37 === 0),
        "doc_id", "text", n = 5)
    }),

    // ---------------- time series / streaming analogue ----------------
    "ts02_sessionize" -> ((s, d) =>
      TimeSeriesOps.sessionize(ev(s, d), "user_id", "ts", "event_id",
          expr("INTERVAL 30 MINUTES"), "session_no")
        .select("event_id", "session_no")),

    // per-user interval union: each event opens a [ts, ts+|value| s] span;
    // overlapping/touching spans merge into islands, then per-user coverage
    // totals — all epoch-µs long arithmetic, hash-exact cross-engine
    "ts04_interval_union" -> ((s, d) => {
      val base = ev(s, d).filter(col("value").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("__s"),
          (unix_micros(col("ts")) +
            greatest(round(abs(col("value")) * 1e6, 0).cast("long"), lit(1L)))
            .as("__e"))
      TimeSeriesOps.mergeIntervals(base, Seq("user_id"), col("__s"), col("__e"),
          col("event_id"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("span_end") - col("span_start")).as("covered_us"),
          max(col("span_end") - col("span_start")).as("max_span_us"))
    }),

    // per-stay tensor export (reference's nested dataDic, §3.3): built as a
    // map of bucket-ordered series, then flattened back to scalars for the
    // oracle — ord_sum is position-weighted, so the series ORDER is checked
    "ts03_stay_tensors" -> ((s, d) => {
      val tall = ev(s, d)
        .select(col("user_id"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).cast("long").as("day"),
          col("event_type"), col("value"))
        .groupBy("user_id", "event_type", "day")
        .agg(round(sum("value"), 2).as("v"))
      val tensors = graft.api.TimeSeriesGenerator.stayTensors(
        tall, "user_id", "event_type", "day", "v")
      tensors.select(col("user_id"), explode(col("series")))
        .select(col("user_id"), col("key").as("event_type"),
          size(col("value")).as("n_buckets"),
          round(aggregate(col("value"), lit(0.0), (a, x) => a + x), 2).as("series_sum"),
          round(aggregate(
            zip_with(col("value"), sequence(lit(1), size(col("value"))),
              (v, i) => v * i),
            lit(0.0), (a, x) => a + x), 2).as("ord_sum"))
    }),

    "ts_tumbling_window" -> ((s, d) =>
      TimeSeriesOps.tumblingAgg(ev(s, d), col("ts"), "hour",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value")))
        .withColumnRenamed("date_trunc(hour, ts)", "hour_start")),

    // ---------------- text analysis ----------------
    "t01_token_stats" -> ((s, d) => {
      val t = docs(s, d).withColumn("toks", TextFns.tokens(col("text")))
      t.select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        round(TextFns.avgTokenLen(col("toks")), 6).as("avg_tok_len"))
    }),

    "t02_quality_score" -> ((s, d) => {
      val stop = Seq("the", "a", "of", "and", "to")
      val t = docs(s, d).withColumn("toks", TextFns.tokens(col("text")))
        .withColumn("n", size(col("toks")))
        .withColumn("n_stop", TextFns.tokenCountIn(col("toks"), stop))
      t.select(col("doc_id"),
        round(col("n_stop").cast("double") / col("n"), 6).as("stopword_ratio"),
        round(size(array_distinct(col("toks"))).cast("double") / col("n"), 6).as("ttr"),
        when(col("n").between(20, 500) &&
          col("n_stop").cast("double") / col("n") < 0.4, 1).otherwise(0).as("quality_ok"))
    }),

    "t03_lang_id" -> ((s, d) => {
      val t = docs(s, d).withColumn("toks", TextFns.tokens(col("text")))
        .withColumn("r_the",
          TextFns.tokenCountIn(col("toks"), Seq("the")).cast("double") / size(col("toks")))
      t.select(col("doc_id"), round(col("r_the"), 6).as("marker_score"),
        when(col("r_the") >= 0.05, "en_like")
          .when(col("r_the") >= 0.025, "mixed")
          .otherwise("other").as("pred_lang"))
    }),

    "t04_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), TextFns.fingerprint(col("text")).as("fp"))),

    // declared-vs-detected language agreement matrix: the t03 heuristic
    // cross-tabbed against the source's lang tag — the DQ check that
    // catches mislabeled-language feeds before they poison a lang filter
    "t33_langid_confusion" -> ((s, d) => {
      val t = docs(s, d).withColumn("toks", TextFns.tokens(col("text")))
        .withColumn("r_the",
          TextFns.tokenCountIn(col("toks"), Seq("the")).cast("double") /
            size(col("toks")))
        .withColumn("pred_lang",
          when(col("r_the") >= 0.05, "en_like")
            .when(col("r_the") >= 0.025, "mixed")
            .otherwise("other"))
      t.groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .join(t.groupBy(col("lang")).agg(count(lit(1)).as("__nl")),
          Seq("lang"))
        .select(col("lang"), col("pred_lang"), col("n"),
          round(col("n").cast("double") / col("__nl"), 6).as("row_share"))
    }),

    // ---------------- deduplication ----------------
    "d01_exact_dedup" -> ((s, d) =>
      DedupOps.exactGroups(docs(s, d), "doc_id", "text")),

    "d02_minhash_sig" -> ((s, d) =>
      DedupOps.minhashSignatures(docs(s, d), "doc_id", "text", n = 3, k = 6)),

    "d03_lsh_neardup" -> ((s, d) =>
      DedupOps.nearDupPairs(docs(s, d), "doc_id", "text",
        shingleN = 3, k = 12, bands = 6, threshold = 0.5)),

    // MinHash estimator audit: signature-agreement ĵ next to the exact
    // Jaccard with signed error per LSH candidate — the "is k big
    // enough" report before trusting ĵ as the verify shortcut at scale
    "d20_minhash_estimate" -> ((s, d) =>
      DedupOps.minhashEstimateAudit(docs(s, d), "doc_id", "text",
        shingleN = 3, k = 12, bands = 6)),

    "d04_simhash" -> ((s, d) =>
      DedupOps.simhash32(docs(s, d), "doc_id", "text")),

    "d05_jaccard_pairs" -> ((s, d) =>
      DedupOps.jaccardAllPairs(
        DedupOps.withShingles(docs(s, d), "doc_id", "text", 3), "doc_id", 0.5)),

    // asymmetric containment (quote-inclusion detector): |A∩B| / |smaller
    // side| gate, both directions reported — Jaccard misses short-in-long
    "d14_containment_pairs" -> ((s, d) =>
      DedupOps.containmentPairs(
        DedupOps.withShingles(docs(s, d), "doc_id", "text", 3), "doc_id", 0.6)),

    "d07_simhash_neardup" -> ((s, d) =>
      DedupOps.simhashNearDups(docs(s, d), "doc_id", "text", bandBits = 8, maxHamming = 6)),

    "a14b_ece_mce" -> ((s, d) =>
      MetricsOps.calibrationError(li(s, d),
        col("l_discount") * 10.0, when(col("l_returnflag") === "R", 1).otherwise(0), 10)),

    // grid-search temperature scaling over synthetic logits: centered
    // totalprice as the logit, F-status as the label
    "a14c_temp_scaling" -> ((s, d) =>
      MetricsOps.temperatureScale(ord(s, d),
        col("o_totalprice") / 100000.0 - 1.5,
        when(col("o_orderstatus") === "F", 1).otherwise(0),
        Seq(0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5, 2.75, 3.0))),

    "d06_embedding_neardup" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      DedupOps.embeddingNearDups(emb(s, d), "vec_id", "embedding", "label", 0.4,
        simFn = (a, b) => call_function("cosine_sim", a, b))
    }),

    // ---------------- similarity search ----------------
    "v01_cosine_topk" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      Knn.bruteForceTopK(emb(s, d), emb(s, d).filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5, simFn = (a, b) => call_function("cosine_sim", a, b))
    }),

    // FILTERED vector search: top-5 neighbors drawn only from OTHER
    // sources than the query's — the cross-source decontamination /
    // attribute-filtered ANN shape; the predicate rides the same
    // broadcast join (evaluated before the sim ranking, never after a
    // wasted top-k)
    "v16_filtered_ann" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val withSrc = emb(s, d).join(
        docs(s, d).select(col("doc_id").as("vec_id"), col("source")),
        Seq("vec_id"))
      val corpus = withSrc.select(col("vec_id").as("neighbor_id"),
        col("source").as("__ns"),
        graft.functions.VectorFns.toDoubleArr(col("embedding")).as("__ne"))
      val queries = withSrc.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("source").as("__qs"),
          graft.functions.VectorFns.toDoubleArr(col("embedding")).as("__qe"))
      val joined = corpus.join(broadcast(queries),
        col("query_id") =!= col("neighbor_id") &&
          col("__ns") =!= col("__qs"))
      import org.apache.spark.sql.expressions.Window
      val sim = round(call_function("cosine_sim",
        col("__qe"), col("__ne")), 6)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      joined.select(col("query_id"), col("neighbor_id"), sim.as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
    }),

    // matryoshka-prefix retrieval (Kusupati et al. 2022): the same brute
    // top-k over only the FIRST 16 of 64 dims — the truncated-embedding
    // eval an MRL-trained index runs before committing to a prefix
    // length; one slice projection, identical join shape to v01
    "v13_matryoshka_topk" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val pre = emb(s, d).select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      Knn.bruteForceTopK(pre, pre.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5,
        simFn = (a, b) => call_function("cosine_sim", a, b))
    }),

    // trained IVF: k-means coarse quantizer then cluster-local search.
    // Fully oracled (r6): kmeansAssign quantizes each round's means to 6dp
    // before the next assignment, so the Lloyd trajectory is
    // engine-portable and the oracle replays both unrolled iterations —
    // the former rows-only caveat (1-ulp centroid drift flipping
    // borderline vectors) is gone because no unrounded mean ever feeds an
    // argmin. KnnSpec still covers the quantizer's invariants.
    "v03_ann_kmeans" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val assigned = Knn.kmeansAssign(emb(s, d), "vec_id", "embedding", k = 32, iters = 2)
      Knn.clusteredTopK(assigned, "vec_id", "embedding", "cluster", k = 3,
        simFn = (a, b) => call_function("cosine_sim", a, b))
    }),

    // the deterministic half of v03, oracled: squared-L2 argmin assignment
    // against a FIXED centroid literal is engine-portable (no Lloyd's
    // iteration, no cross-engine float accumulation of centroids) — the
    // oracle recomputes the same patterned centroids from the same closed
    // form
    "v03b_assign_fixed" -> ((s, d) =>
      Knn.assignClusters(emb(s, d), "vec_id", "embedding", fixedCentroids)
        .select("vec_id", "cluster")),

    // multi-probe IVF: label-centroid quantizer, each query probes its 2
    // nearest clusters. Fully oracled (r6): the centroids are 6dp-rounded
    // means (Knn.centroids), probe selection over them is the portable
    // argmin v06b proved, and the final ranking orders on ROUNDED sims
    // (simRank) — every stage is ulp-insensitive. KnnSpec proves nProbe=C
    // degrades to exact brute force
    "v06_ann_multiprobe" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val e = emb(s, d)
      val cents = Knn.centroids(e, "label", "embedding").collect()
        .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map { case (_, rows) =>
          rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      Knn.multiProbeTopK(e, "vec_id", "embedding", cents, nProbe = 2, k = 3,
        simFn = (a, b) => call_function("cosine_sim", a, b))
    }),

    // probe selection in isolation (2 nearest of the FIXED patterned
    // centroids per query) — engine-portable the same way v03b's argmin
    // is; kept as the minimal reproduction of the portability argument
    // now that v06 itself is fully oracled
    "v06b_probe_fixed" -> ((s, d) =>
      Knn.probeSelection(emb(s, d), "vec_id", "embedding", fixedCentroids,
        nProbe = 2)),

    // product-quantization ADC: corpus compressed to 8 int codes/vector,
    // each query resolves distances through its precomputed m×k lookup
    // table — the memory-bound ANN path (64× smaller corpus residency)
    "v08_pq_adc" -> ((s, d) => {
      val e = emb(s, d)
      graft.ann.Pq.pqTopK(e, e.filter(col("vec_id") < 8),
        "vec_id", "embedding", pqCodebooks, k = 3)
    }),

    // IVF + PQ-ADC composed: coarse cells prune the corpus (cluster-equi
    // hash join — never the flat all-pairs scan), ADC ranks only the
    // probed candidates — the production ANN shape at corpus scale
    "v11_ivf_pq" -> ((s, d) => {
      val e = emb(s, d)
      graft.ann.Pq.ivfPqTopK(e, e.filter(col("vec_id") < 8),
        "vec_id", "embedding", fixedCentroids, pqCodebooks,
        nProbe = 2, k = 3)
    }),

    // MMR diversity rerank over a bounded top-20 candidate list (the RAG
    // retrieve→rerank pass): 5 unrolled greedy steps, each an anti-join +
    // bounded max-sim aggregate + TakeOrderedAndProject argmax; (1−λ) is
    // computed, not a literal, so both engines hold the same double
    "v12_mmr_rerank" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val e = emb(s, d)
      val cands = Knn.bruteForceTopK(e, e.filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 20,
          simFn = (a, b) => call_function("cosine_sim", a, b))
        .select(col("neighbor_id").as("id"), col("sim").as("rel"))
      val cv = e
        .join(cands.select(col("id").as("vec_id")), Seq("vec_id"))
        .select(col("vec_id"),
          graft.functions.VectorFns.toDoubleArr(col("embedding")).as("__v"))
      val ps = cv.alias("x").join(broadcast(cv.alias("y")),
          col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          round(call_function("cosine_sim", col("x.__v"), col("y.__v")), 6)
            .as("sim"))
      Knn.mmrRerank(cands, "id", "rel", ps, "a", "b", "sim",
          k = 5, lam = 0.7)
        .withColumnRenamed("id", "vec_id")
    }),

    "v02_ann_clustered" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      Knn.clusteredTopK(emb(s, d), "vec_id", "embedding", "label", k = 3,
        simFn = (a, b) => call_function("cosine_sim", a, b))
    }),

    // the RAG hybrid-retrieval chain END-TO-END: corpus = the embedded
    // subset of documents; lexical BM25 top-50 + vector cosine top-50 for
    // the vec_id=0 query → reciprocal-rank fusion top-20 → MMR diversity
    // rerank top-5. Every stage is the already-oracled t19/v01/t24/v12
    // construction — this row gates their INTERACTIONS (id-space handoff,
    // rounded-score handoffs, fused-rank ties) the way e2e_corpus_curate
    // gates the curation chain
    "e2e_rag_retrieve" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val e = emb(s, d)
      val corpus = docs(s, d)
        .join(e.select(col("vec_id").as("doc_id")), Seq("doc_id"))
      val lex = RetrievalOps.bm25TopK(corpus, "doc_id", "text",
        terms = Seq("spark", "window", "join"), k = 50)
      val vec = Knn.bruteForceTopK(e, e.filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 50,
          simFn = (a, b) => call_function("cosine_sim", a, b))
        .select(col("neighbor_id").as("doc_id"), col("sim").as("score"))
      // pin the 20-row fused list: cands feeds the rerank AND the pair
      // grid, and cv self-joins — unpinned, the BM25+ANN+RRF chain
      // re-ran once per downstream reference
      val fused = RetrievalOps.rrfFuse(Seq(lex, vec), "doc_id", k = 20)
      val cands = fused.select(col("doc_id").as("id"), col("rrf").as("rel"))
        .localCheckpoint(false)
      val cv = e
        .join(cands.select(col("id").as("vec_id")), Seq("vec_id"))
        .select(col("vec_id"),
          graft.functions.VectorFns.toDoubleArr(col("embedding")).as("__v"))
        .localCheckpoint(false)
      val ps = cv.alias("x").join(broadcast(cv.alias("y")),
          col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          round(call_function("cosine_sim", col("x.__v"), col("y.__v")), 6)
            .as("sim"))
      Knn.mmrRerank(cands, "id", "rel", ps, "a", "b", "sim",
          k = 5, lam = 0.7)
        .withColumnRenamed("id", "doc_id")
    }),

    // the entity-resolution chain END-TO-END: normalize part names →
    // first-char blocking + Jaro-Winkler match pairs (f30's portable
    // kernel) → min-label connected components (d08's machinery on the
    // min-partkey name ids) → every name with its cluster canonical.
    // Gates the normalize→block→match→cluster stage INTERACTIONS the way
    // e2e_corpus_curate gates the curation chain
    "e2e_entity_resolution" -> ((s, d) => {
      val ids = prt(s, d).filter(col("p_name").isNotNull)
        .select(lower(trim(col("p_name"))).as("name"), col("p_partkey"))
        .groupBy("name").agg(min("p_partkey").as("nid"))
      val pairs = LinkageOps.jaroWinklerPairs(ids, "name", threshold = 0.9)
      val pairIds = pairs
        .join(ids.select(col("name").as("name_a"), col("nid").as("__ia")),
          Seq("name_a"))
        .join(ids.select(col("name").as("name_b"), col("nid").as("__ib")),
          Seq("name_b"))
        .select(col("__ia").as("id_a"), col("__ib").as("id_b"))
      val comps = DedupOps.connectedComponents(pairIds, "id_a", "id_b")
      ids.join(comps.withColumnRenamed("doc_id", "nid"), Seq("nid"), "left")
        .select(col("name"), col("nid"),
          coalesce(col("canonical_id"), col("nid")).as("canonical_id"))
    }),

    // ---------------- multimodal plumbing ----------------
    "m01_binary_meta" -> ((s, d) =>
      BinaryOps.withPayload(docs(s, d), "text", "payload")
        .select(col("doc_id"),
          octet_length(col("text")).as("n_bytes"),
          md5(col("text")).as("sig"),
          hex(substring(col("text"), 1, 8)).as("head_hex"))),

    // ---------------- additional joins ----------------
    "s09_multipath_scan" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet", s"$d/lineitem.parquet")
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))),

    "j03_cohort_join" -> ((s, d) => {
      val cohort = cust(s, d)
        .join(broadcast(nat(s, d).filter(col("n_regionkey") === 0)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey").as("o_custkey"))
      JoinOps.semiFilter(ord(s, d), Seq("o_custkey"), cohort)
        .select("o_orderkey", "o_custkey")
    }),

    "j06_left_attach" -> ((s, d) =>
      li(s, d).join(ord(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
          Seq("l_orderkey"), "left")
        .select("l_orderkey", "l_linenumber", "o_totalprice")),

    "j07_right_join_summary" -> ((s, d) =>
      li(s, d).groupBy(col("l_partkey").as("p_partkey")).agg(count(lit(1)).as("cnt"))
        .join(prt(s, d).select("p_partkey"), Seq("p_partkey"), "right")
        .select(col("p_partkey"), coalesce(col("cnt"), lit(0L)).as("cnt"))),

    // ---------------- additional aggregations ----------------
    "a10_impute_stats" -> ((s, d) =>
      li(s, d).groupBy("l_returnflag").agg(
        round(avg("l_quantity"), 6).as("mean_qty"),
        round(percentile(col("l_quantity"), lit(0.5)), 6).as("median_qty"))),

    "a11_modality_collapse" -> ((s, d) =>
      li(s, d).groupBy("l_suppkey")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(avg("l_quantity"), 6))
        .withColumnRenamed("A", "avg_a")
        .withColumnRenamed("N", "avg_n")
        .withColumnRenamed("R", "avg_r")),

    "a13_grouped_confusion" -> ((s, d) => {
      val nli = li(s, d).groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("n_items"))
      val scored = ord(s, d).join(nli, Seq("o_orderkey"), "left")
        .withColumn("truth", when(col("o_totalprice") >= 250000.0, 1).otherwise(0))
        .withColumn("pred", when(coalesce(col("n_items"), lit(0L)) >= 4, 1).otherwise(0))
      MetricsOps.groupedConfusion(scored, "o_orderpriority", col("truth"), col("pred"))
    }),

    // ---------------- time-series active signal ----------------
    "w05_active_signal" -> ((s, d) => {
      val e = ev(s, d)
      val grid = e.select("user_id").distinct()
        .select(col("user_id"), explode(sequence(lit(0L), lit(29L))).as("day"))
      val stops = e.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).cast("long").as("day"))
        .groupBy("user_id", "day")
        .agg((max(col("day")) + 3L).as("stop"))
      val sparse = grid.join(stops, Seq("user_id", "day"), "left")
      TimeSeriesOps.activeSignal(sparse, Seq("user_id"), "day", col("stop"), "active")
        .select("user_id", "day", "active")
    }),

    // ---------------- additional scalar functions ----------------
    "f12_pad_split_key" -> ((s, d) =>
      Tables.supplier(s, d).select(col("s_suppkey"),
        lpad(col("s_suppkey").cast("string"), 9, "0").as("padded"),
        concat(substring(lpad(col("s_suppkey").cast("string"), 9, "0"), 1, 5), lit("-"),
          substring(lpad(col("s_suppkey").cast("string"), 9, "0"), 6, 4)).as("sectioned"))),

    "f13_regex_extract" -> ((s, d) =>
      ord(s, d).select(col("o_orderkey"),
        regexp_extract(col("o_orderpriority"), "^(\\d+)", 1).cast("int").as("priority_num"))),

    // spread: per-row regex extraction is CPU-bound — parallelize the
    // narrow scan before the kernel
    "f15_try_cast_json" -> ((s, d) =>
      Tables.spread(ev(s, d).select("event_id", "props"), tinyBytes = 0L)
        .select(col("event_id"),
          expr("try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS INT)").as("k_val"),
          expr("try_cast(substring(props, 1, 5) AS INT)").as("bad_cast"))),

    "f21_logit" -> ((s, d) =>
      li(s, d).select(col("l_orderkey"), col("l_linenumber"),
        round(log2(
          least(greatest(col("l_discount") * 10.0, lit(0.05)), lit(0.95)) /
            (lit(1.0) - least(greatest(col("l_discount") * 10.0, lit(0.05)), lit(0.95)))),
          6).as("logit"))),

    "f22_onehot" -> ((s, d) =>
      ord(s, d).select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", 1).otherwise(0).as("is_f"),
        when(col("o_orderstatus") === "O", 1).otherwise(0).as("is_o"),
        when(col("o_orderstatus") === "P", 1).otherwise(0).as("is_p"))),

    // two-phase distributed id assignment: a corpus-scale vocabulary does
    // not fit one task, so no dense_rank over an unpartitioned window; the
    // vocab side is not force-broadcast either — AQE picks broadcast when
    // it is actually small
    "f23_vocab_encode" -> ((s, d) => {
      val vocab = RankOps.vocabIds(prt(s, d), "p_type", "__vid")
        .select(col("p_type"), col("__vid").cast("int").as("type_id"))
      prt(s, d).join(vocab, Seq("p_type"))
        .select("p_partkey", "type_id")
    }),

    // ---------------- sorts / column-bind / pivot ----------------
    "o01_multisort_limit" -> ((s, d) =>
      li(s, d).orderBy(col("l_shipdate").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_shipdate")),

    "u02_column_bind" -> ((s, d) =>
      li(s, d).groupBy(col("l_suppkey").as("s_suppkey")).agg(count(lit(1)).as("cnt"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_acctbal"), Seq("s_suppkey"))
        .select("s_suppkey", "cnt", "s_acctbal")),

    "pv01_pivot_matrix" -> ((s, d) => {
      val e = ev(s, d)
        .select(col("user_id"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).cast("long").as("day"),
          col("event_type"), col("value"))
      TimeSeriesOps.pivotMatrix(e, "user_id", "day", "event_type",
          Seq("click", "error", "purchase", "signup", "view"), round(sum(col("value")), 2))
        .withColumnRenamed("click", "v_click")
        .withColumnRenamed("error", "v_error")
        .withColumnRenamed("purchase", "v_purchase")
        .withColumnRenamed("signup", "v_signup")
        .withColumnRenamed("view", "v_view")
    }),

    "f01_date_kitchen" -> ((s, d) =>
      ord(s, d).select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("yr"),
        date_trunc("month", col("o_orderdate")).as("mon_start"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("plus3"))),

    "f10_prefix_exclusion" -> ((s, d) => {
      val excluded = Seq("ECO", "SMA")
      prt(s, d)
        .filter(!excluded.map(p => col("p_type").startsWith(p)).reduce(_ || _))
        .select("p_partkey", "p_type")
    }),

    "f11_contains_match" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        when(col("text").contains("the spark"), 1).otherwise(0).as("has_marker"))),

    "u05_intersect_ids" -> ((s, d) =>
      ord(s, d).filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
        .intersect(ord(s, d).filter(col("o_orderstatus") === "O").select("o_custkey").distinct())),

    "j15_label_lookup" -> ((s, d) => {
      import s.implicits._
      val statusMap = Seq(("F", 1), ("O", 2), ("P", 3)).toDF("o_orderstatus", "status_id")
      ord(s, d).join(broadcast(statusMap), Seq("o_orderstatus"))
        .select("o_orderkey", "status_id")
    }),

    // TF-IDF top terms per document: explode → tf/df aggregates → df join →
    // windowed top-k with total-order tie-break. The corpus size N is a
    // 1-row aggregate cross-joined in (broadcast, lazily evaluated with the
    // rest of the plan) — not an eager driver-side count()
    "t06_tfidf_top_terms" -> ((s, d) => {
      val toks = docs(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      // df derives from tf (one row per (doc, term)) — no second explode
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(false)
      val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDf = docs(s, d).agg(count(lit(1)).as("__n"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)
      tf.join(df_, Seq("term"))
        .crossJoin(broadcast(nDf))
        .withColumn("score",
          round(col("tf") * TextFns.smoothIdf(col("__n"), col("df")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("doc_id", "term", "score", "rank")
    }),

    // Column profiling (data-quality scan): ONE aggregate pass computes all
    // stats for all profiled columns (3 scans → 1), then a stack() unpivot
    // emits the tall one-row-per-column layout
    // exact-vs-approx switch: this is the ORACLE-GATED exact profile; the
    // 100 TB daily-monitor path is SummaryOps.approxProfile (same stacked
    // shape, HLL distinct + sketch p50, one bounded-state aggregate),
    // spec-gated by error envelopes in ApproxSpec
    "dq01_profile" -> ((s, d) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      def stats(c: String) = Seq(
        count(lit(1)).as(s"n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c"),
        round(min(col(c)), 6).as(s"min_$c"),
        round(max(col(c)), 6).as(s"max_$c"),
        // round the sum before dividing: cross-engine summation-order noise
        // (~1e-10) is harmless at the sum's magnitude but can straddle a
        // rounding boundary after division
        round(round(sum(col(c)), 3) / count(lit(1)), 6).as(s"avg_$c"))
      val aggs = cols.flatMap(stats)
      // spread: the countDistinct trio expands each input row 4× before the
      // partial aggregate — serialized on a narrow scan, cheap in parallel
      val wide = Tables.spread(li(s, d).select(cols.map(col): _*), tinyBytes = 0L)
        .agg(aggs.head, aggs.tail: _*)
      val stacked = cols.map(c =>
        s"'$c', n_$c, null_$c, dist_$c, min_$c, max_$c, avg_$c").mkString(", ")
      wide.select(expr(
        s"stack(${cols.size}, $stacked) as (col_name, n, n_null, n_distinct, min_v, max_v, avg_v)"))
    }),

    // UDTF-equivalent: one-row-to-many section split via posexplode
    // (reference notes section splitter, notes_preproc.py:142-163)
    "t05_explode_sections" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " data ")))
        .select(col("doc_id"), col("pos").as("sec_no"), col("col").as("section"))),

    // ---------------- notes NLP (ConText-style rule tagging) ----------------
    // corpus-appropriate rule set: cue terms within 2 tokens before a
    // target term mark the section (the algorithm is the reference's
    // negation/severity tagger, notes_preproc.py:163-224; cue vocabulary is
    // configuration)
    "t07_context_negation" -> ((s, d) => {
      val secs = graft.functions.NotesNlp.splitSections(docs(s, d), "doc_id", "text", " data ")
      secs.select(col("doc_id"), col("sec_no"),
        graft.functions.NotesNlp.cueFlag(col("section"),
          Seq("slow", "small"), Seq("scan", "query"), 2).as("negated"))
    }),

    // backward window: post-position cues ("<target> ... <cue>") plus the
    // combined pre-or-post scope
    "t10_context_post" -> ((s, d) => {
      val secs = graft.functions.NotesNlp.splitSections(docs(s, d), "doc_id", "text", " data ")
      val cues = Seq("slow", "small")
      val targets = Seq("scan", "query")
      secs.select(col("doc_id"), col("sec_no"),
        graft.functions.NotesNlp.postCueFlag(col("section"), cues, targets, 2).as("post_flag"),
        graft.functions.NotesNlp.scopedFlag(col("section"), cues, targets, 2).as("scoped_flag"))
    }),

    "t08_severity" -> ((s, d) => {
      val secs = graft.functions.NotesNlp.splitSections(docs(s, d), "doc_id", "text", " data ")
      val cue = graft.functions.NotesNlp.nearestCue(col("section"),
        Seq("slow", "small"), Seq("scan", "query"), 2)
      secs.select(col("doc_id"), col("sec_no"), cue.as("modifier"),
        graft.functions.NotesNlp.severityScore(cue, Seq("slow" -> 2, "small" -> 1))
          .as("severity"))
    }),

    // repetition filter (the Gopher/C4-style quality rule): fraction of the
    // document's trigram positions occupied by its most frequent trigram —
    // high ratio = boilerplate/looped text
    "t12_repetition" -> ((s, d) => {
      val tri = Tables.spread(docs(s, d).select("doc_id", "text"), tinyBytes = 0L)
        .select(col("doc_id"),
          explode(TextFns.rawShingles(TextFns.tokens(col("text")), 3)).as("tri"))
      tri.groupBy("doc_id", "tri").agg(count(lit(1)).as("__c"))
        .groupBy("doc_id")
        .agg(sum("__c").cast("long").as("n_tri"),
          max("__c").cast("long").as("max_tri"),
          round(max("__c").cast("double") / sum("__c"), 6).as("rep_ratio"))
    }),

    // PII-style scrub: mask digit runs (the id/phone/ssn pattern class) in a
    // semi-structured column — the redaction pass of a training-data
    // pipeline, as a single codegen'd regexp_replace
    "t11_redact" -> ((s, d) =>
      ev(s, d).select(col("event_id"),
        regexp_replace(col("props"), "\\d+", "#").as("props_redacted"),
        (length(col("props")) - length(regexp_replace(col("props"), "\\d", "")))
          .cast("int").as("n_digits"))),

    "t09_stem" -> ((s, d) =>
      Tables.spread(docs(s, d).select("doc_id", "text"), tinyBytes = 0L)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
        .distinct()
        .select(col("doc_id"), col("tok"),
          graft.functions.NotesNlp.lightStem(col("tok")).as("stem"))),

    // dictionary-first lemmatization: broadcast irregular-form lookup,
    // rule-stem fallback — the medspaCy-closing pass (VERDICT r7 #6); one
    // Scala list feeds both the broadcast join and the oracle VALUES
    "t09b_lemmatize" -> ((s, d) =>
      graft.functions.NotesNlp.lemmatize(
        Tables.spread(docs(s, d).select("doc_id", "text"), tinyBytes = 0L)
          .select(col("doc_id"),
            explode(TextFns.tokens(col("text"))).as("tok"))
          .distinct(),
        "tok", "lemma")),

    // the notes-NLP chain END-TO-END (t05 sections → t10 scoped ConText
    // flag → t08 severity → t09b dictionary-first lemma types), per-doc
    // summary — stage INTERACTIONS hash-gated the way the cohort/ICD/drug
    // chains are, not just the stages
    "e2e_notes_nlp" -> ((s, d) => {
      val cues = Seq("slow", "small")
      val targets = Seq("scan", "query")
      val secs = graft.functions.NotesNlp.splitSections(docs(s, d),
        "doc_id", "text", " data ")
      val perSec = secs.select(col("doc_id"),
        graft.functions.NotesNlp.scopedFlag(col("section"), cues, targets, 2)
          .as("__flag"),
        graft.functions.NotesNlp.severityScore(
          graft.functions.NotesNlp.nearestCue(col("section"), cues, targets,
            2),
          Seq("slow" -> 2, "small" -> 1)).as("__sev"))
      val a1 = perSec.groupBy("doc_id").agg(
        count(lit(1)).as("n_sections"),
        sum(col("__flag").cast("long")).as("n_flagged"),
        max(col("__sev")).cast("int").as("max_severity"))
      val lem = graft.functions.NotesNlp.lemmatize(
        docs(s, d).filter(col("text").isNotNull)
          .select(col("doc_id"), explode(TextFns.tokens(col("text")))
            .as("tok")).distinct(),
        "tok", "lemma")
      val a2 = lem.groupBy("doc_id")
        .agg(countDistinct(col("lemma")).as("n_lemma_types"))
      a1.join(a2, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_sections"), col("n_flagged"),
          col("max_severity"),
          coalesce(col("n_lemma_types"), lit(0L)).as("n_lemma_types"))
    }),

    // dedup group collapse: pairwise near-dup evidence → connected
    // components → one canonical id per member doc
    "d08_dedup_components" -> ((s, d) => {
      val pairs = DedupOps.nearDupPairs(docs(s, d), "doc_id", "text",
        shingleN = 3, k = 12, bands = 6, threshold = 0.5)
      DedupOps.connectedComponents(pairs, "id_a", "id_b")
    }),

    // leakage-free dedup-aware k-fold: near-dup clusters (the d08
    // pipeline) are assigned WHOLE to folds by hashing the cluster
    // canonical — the split LLM eval prep needs, where a near-dup pair
    // straddling train/test silently inflates benchmarks
    "ml23_dedup_split" -> ((s, d) => {
      val t = docs(s, d)
      val pairs = DedupOps.nearDupPairs(t, "doc_id", "text",
        shingleN = 3, k = 12, bands = 6, threshold = 0.5)
      val comps = DedupOps.connectedComponents(pairs, "id_a", "id_b")
      t.select(col("doc_id"))
        .join(comps, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("canonical_id"), col("doc_id")).as("cluster_id"))
        .withColumn("fold", FoldOps.foldOf(col("cluster_id"), 5).cast("int"))
    }),

    // first-occurrence n-gram novelty by ingestion order: the share of a
    // doc's distinct 3-gram shingles whose FIRST corpus appearance is
    // this doc — the memorization/staleness signal of an incremental
    // crawl; one min-aggregate over the exploded shingle frame + a join
    // back, never shingle × shingle
    "t38_ngram_novelty" -> ((s, d) => {
      val sh = docs(s, d).select(col("doc_id"),
        explode(TextFns.shingles(TextFns.tokens(col("text")), 3)).as("sg"))
      val first = sh.groupBy("sg").agg(min("doc_id").as("__first"))
      sh.join(first, Seq("sg"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("__first") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          round(col("n_novel").cast("double") /
            col("n_shingles").cast("double"), 6).as("novelty"))
    }),

    // the A/B-test chain END-TO-END: first-signup cohort → 7-day
    // purchase-conversion window (the j13 interval-label shape) →
    // parity assignment → pooled two-proportion z (a47's kernel) —
    // gates the cohort→label→test stage interactions
    "e2e_ab_test" -> ((s, d) => {
      val e = ev(s, d)
      val firstSignup = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("s_ts"))
      val purch = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      val conv = firstSignup.join(purch, Seq("user_id"), "left")
        .groupBy(col("user_id"))
        .agg(max(when(col("p_ts") >= col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 7 DAYS"), 1)
          .otherwise(0)).as("converted"))
      AssociationOps.twoProportionZ(conv,
        col("user_id") % 2 === 0, col("converted") === 1)
    }),

    // ---------------- multi-attribute fairness melt ----------------
    "a13b_fairness_melt" -> ((s, d) => {
      val nli = li(s, d).groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("n_items"))
      val scored = ord(s, d).join(nli, Seq("o_orderkey"), "left")
        .withColumn("truth", when(col("o_totalprice") >= 250000.0, 1).otherwise(0))
        .withColumn("pred", when(coalesce(col("n_items"), lit(0L)) >= 4, 1).otherwise(0))
      MetricsOps.meltedConfusion(scored, Seq("o_orderpriority", "o_orderstatus"),
        col("truth"), col("pred"))
    }),

    // ---------------- readmission, strict range-join semantics ----------------
    "j12b_next_within_gap_range" -> ((s, d) =>
      CohortOps.nextWithinGapLabelRange(
          ord(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
          "o_custkey", "o_orderdate", "o_orderdate", "o_orderkey",
          expr("INTERVAL 90 DAYS"), "label")
        .select("o_orderkey", "label")),

    // ---------------- window-clip predicate (P8) ----------------
    "p08_window_clip" -> ((s, d) =>
      ev(s, d).select(col("event_id"),
          floor((unix_timestamp(col("ts")) - unix_timestamp(to_timestamp(lit("2024-01-01")))) / 3600L)
            .cast("long").as("offset_h"))
        .filter(col("offset_h") >= 0 && col("offset_h") < 72)),

    // ---------------- reader/sink round-trips (S3/S5/S10) ----------------
    // sink writes to a fresh temp dir, source reads it back with an
    // explicit schema; the oracle checks the round-trip is lossless
    // against the original table
    // full ConText tag set per section — all four modifier classes
    // (negation / historical / family / hypothetical analogues) in ONE
    // scan pass, each a codegen'd rlike; reference tags these classes per
    // entity (notes_preproc.py:163-224), here with corpus-vocabulary cue
    // sets standing in for the clinical rule lists
    "t15_context_classes" -> ((s, d) => {
      val nlp = graft.functions.NotesNlp
      val secs = nlp.splitSections(docs(s, d), "doc_id", "text", " data ")
      secs.select(col("doc_id"), col("sec_no"),
        nlp.cueFlag(col("section"), Seq("slow", "small"), Seq("scan", "query"), 2)
          .as("negated"),
        nlp.cueFlag(col("section"), Seq("old", "prior", "batch"), Seq("join", "merge"), 2)
          .as("historical"),
        nlp.cueFlag(col("section"), Seq("group", "cluster"), Seq("key", "row"), 2)
          .as("family"),
        nlp.cueFlag(col("section"), Seq("fast", "stream"), Seq("sort", "filter"), 2)
          .as("hypothetical"))
    }),

    // S8 — text-report sink round-trip: formatted summary lines written to
    // a single text file, read back verbatim (the reference's printed
    // cohort-count ritual as a durable artifact)
    "s08_report_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft_s08")
        .resolve("report.txt").toString
      val summary = ord(s, d).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
        .select(concat(lit("status "), col("o_orderstatus"),
          lit(": n="), col("n"), lit(" avg="), col("avg_price").cast("string"))
          .as("line"))
      graft.sources.Sinks.textReport(summary, r => r.getString(0), out)
      s.read.text(out).select(col("value").as("line"))
    }),

    // S4 — latin-1 TSV round-trip: non-ASCII labels survive the
    // ISO-8859-1 encode → decode cycle losslessly
    "s04_latin1_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft_s04").toString
      val src = nat(s, d).select(col("n_nationkey"),
        concat(col("n_name"), lit(" Müller-José")).as("n_label"))
      src.write.mode("overwrite").option("header", "true").option("sep", "\t")
        .option("encoding", "ISO-8859-1").csv(out)
      graft.sources.Readers.tsvLatin1(s, out, src.schema)
        .select("n_nationkey", "n_label")
    }),

    // S6 — partitioned-parquet sink round-trip: one dataset partitioned by
    // the entity key (not N per-entity files), read back under partition
    // pruning and aggregated
    "s06_partitioned_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft_s06").toString
      val src = li(s, d).select("l_orderkey", "l_quantity", "l_returnflag")
      graft.sources.Sinks.partitionedParquet(src, out, Seq("l_returnflag"))
      s.read.parquet(out).filter(col("l_returnflag") === "R")
        .groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
    }),

    "s03_tsv_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft_s03").toString
      val src = nat(s, d).select("n_nationkey", "n_name", "n_regionkey")
      src.write.mode("overwrite").option("header", "true").option("sep", "\t").csv(out)
      graft.sources.Readers.tsv(s, out, src.schema)
        .select("n_nationkey", "n_name", "n_regionkey")
    }),

    "s05_csvgz_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft_s05").toString
      val src = Tables.supplier(s, d).select("s_suppkey", "s_name", "s_acctbal")
      graft.sources.Sinks.csvGz(src, out)
      graft.sources.Readers.csv(s, out, src.schema)
        .select("s_suppkey", "s_name", "s_acctbal")
    }),

    // dirty-feed recovery: every p_partkey % 7 == 0 line ships a
    // non-numeric size field; the PERMISSIVE scan keeps those as
    // _corrupt_record rows (never a dropped line, never a failed job)
    // and the query reports the triage aggregate the quarantine monitor
    // reads. Counts + clean-sum are exact integers
    "s16_dirty_recovery" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft_s16").toString
      prt(s, d).select(
          when(col("p_partkey") % 7 === 0,
            concat_ws(",", col("p_partkey"), col("p_name"), lit("bad")))
            .otherwise(concat_ws(",", col("p_partkey"), col("p_name"),
              col("p_size"))).as("value"))
        .write.mode("overwrite").text(out)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("size",
          org.apache.spark.sql.types.IntegerType)))
      graft.sources.Readers.permissiveCsv(s, out, schema)
        .localCheckpoint(false) // corrupt-column filter restriction
        .agg(
          sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L))
            .as("n_clean"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
            .as("n_corrupt"),
          sum(when(col("_corrupt_record").isNull, col("size").cast("long")))
            .as("clean_size_sum"))
    }),

    "s10_multiline_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft_s10").toString
      val src = prt(s, d).select(col("p_partkey"),
        regexp_replace(col("p_name"), " ", "\n").as("multi_name"))
      src.write.mode("overwrite").option("header", "true").option("escape", "\"").csv(out)
      graft.sources.Readers.multiLineCsv(s, out, src.schema)
        .select("p_partkey", "multi_name")
    }),

    // frame sampling over an opaque payload: one row per kept frame with
    // offset + content (hex'd for the oracle compare)
    "m03_frame_sample" -> ((s, d) =>
      BinaryOps.sampleFrames(
          BinaryOps.withPayload(docs(s, d), "text", "payload"),
          "doc_id", "payload", frameLen = 16, every = 4)
        .select(col("doc_id"), col("frame_no"), col("byte_offset"),
          hex(col("frame_bytes")).as("frame_hex"))),

    // REAL image decode (javax.imageio): render each doc's bytes into a
    // deterministic grayscale image, PNG-compress it, then DECODE the PNG
    // stream back (inflate + defilter) and emit dims + raster checksums.
    // PNG is lossless, so the decoded checksums have a closed form over the
    // source text — the oracle verifies the actual codec round-trip
    "m02_decode_png" -> ((s, d) => {
      val src = docs(s, d).select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        (octet_length(col("text")) % 16 + 1).as("w"),
        (col("doc_id") % 8 + 1).as("h"))
      val png = BinaryOps.withPngPayload(s, src, "doc_id", "payload", "w", "h")
      BinaryOps.decodePngMeta(s, png, "doc_id", "png").toDF()
        .select("doc_id", "width", "height", "px_sum", "px_xor")
    }),

    // perceptual difference-hash on the decoded raster — the image
    // near-dup fingerprint; real encode→decode→hash, closed-form oracle
    // over the source bytes (lossless gray round-trip)
    "m05_phash" -> ((s, d) => {
      val src = docs(s, d).select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        (octet_length(col("text")) % 16 + 1).as("w"),
        (col("doc_id") % 8 + 1).as("h"))
      val png = BinaryOps.withPngPayload(s, src, "doc_id", "payload", "w", "h")
      BinaryOps.phash63(s, png, "doc_id", "png").toDF()
    }),

    // image near-dup pairs: m05's perceptual hashes → 4×16-bit band LSH
    // (pigeonhole-complete for Hamming ≤ 3) → exact bit_count verify —
    // the d03 dedup shape on the image modality, saturated bands capped
    "m10_phash_pairs" -> ((s, d) => {
      val src = docs(s, d).select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        (octet_length(col("text")) % 16 + 1).as("w"),
        (col("doc_id") % 8 + 1).as("h"))
      val png = BinaryOps.withPngPayload(s, src, "doc_id", "payload", "w", "h")
      BinaryOps.phashNearDupPairs(
        BinaryOps.phash63(s, png, "doc_id", "png").toDF(),
        "doc_id", "phash", maxHamming = 3, maxBucket = 1000L)
    }),

    // REAL decode → nearest-neighbor 4×4 thumbnail: the resize stage of
    // an image-preprocessing pipeline, one tall row per output pixel —
    // integer index arithmetic keeps the closed-form source-byte oracle
    "m07_resize" -> ((s, d) => {
      val src = docs(s, d).select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        (octet_length(col("text")) % 16 + 1).as("w"),
        (col("doc_id") % 8 + 1).as("h"))
      val png = BinaryOps.withPngPayload(s, src, "doc_id", "payload", "w", "h")
      BinaryOps.resizeNearest(s, png, "doc_id", "png", outW = 4, outH = 4)
        .toDF()
    }),

    // per-image 16-bin luminance histogram on the REAL decode path — the
    // exposure/contrast profile an image-curation filter reads; each
    // image folds to ≤16 rows inside the decode task (map-only)
    "m09_luma_hist" -> ((s, d) => {
      val src = docs(s, d).select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        (octet_length(col("text")) % 16 + 1).as("w"),
        (col("doc_id") % 8 + 1).as("h"))
      val png = BinaryOps.withPngPayload(s, src, "doc_id", "payload", "w", "h")
      BinaryOps.lumaHistogram(s, png, "doc_id", "png", bins = 16).toDF()
    }),

    // byte-sampling feature stand-in (the stub path kept for modalities
    // with no JVM codec — audio/video); same mapPartitions batch shape as
    // the real m02 decode
    "m04_byte_features" -> ((s, d) => {
      val withBin = BinaryOps.withPayload(docs(s, d), "text", "payload")
      BinaryOps.decodeFeatures(s, withBin, "doc_id", "payload", dims = 4, stride = 7)
        .toDF()
        .select(col("doc_id"),
          round(element_at(col("features"), 1), 6).as("f0"),
          round(element_at(col("features"), 2), 6).as("f1"),
          round(element_at(col("features"), 3), 6).as("f2"),
          round(element_at(col("features"), 4), 6).as("f3"))
    }),

    // JSONL round-trip (the LLM-corpus interchange format): docs → .jsonl
    // files → explicit-schema scan → aggregate; lossless vs the parquet
    // original
    "s11_jsonl_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft_s11").toString
      val src = docs(s, d).select("doc_id", "lang", "n_chars")
      graft.sources.Sinks.jsonl(src, out)
      graft.sources.Readers.jsonl(s, out, src.schema)
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
    }),

    // global token-budget sampling: best-first corpus prefix (longest docs
    // first here) kept while the running token total fits the budget —
    // two-phase prefix sum, no single-partition exchange
    "ml06_token_budget" -> ((s, d) => {
      val t = docs(s, d).select(col("doc_id"), col("n_chars"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_toks"))
      FoldOps.takeByBudget(t,
          Seq(col("n_chars").desc, col("doc_id").asc), col("n_toks"),
          budget = 8000L, cumName = "cum_toks")
        .select(col("doc_id"), col("n_toks"), col("cum_toks").cast("long").as("cum_toks"))
    }),

    // per-source unigram entropy + type/token counts (corpus diversity
    // report): explode → two stacked hash aggregates
    "t16_source_entropy" -> ((s, d) =>
      SummaryOps.groupEntropy(
        Tables.spread(docs(s, d).select("source", "text"), tinyBytes = 0L)
          .select(col("source"), explode(TextFns.tokens(col("text"))).as("tok")),
        "source", "tok")
        .withColumnRenamed("n_rows", "n_tokens")
        .withColumnRenamed("n_categories", "n_types")),

    // inter-document n-gram duplication (the CCNet/Gopher "dup 5-gram
    // fraction" quality signal): share of a doc's 5-gram positions whose
    // gram also occurs in some OTHER doc — explode, corpus-wide
    // distinct-doc counts per gram, join back, per-doc ratio
    "t17_dup_ngrams" -> ((s, d) => {
      val g = Tables.spread(docs(s, d).select("doc_id", "text"), tinyBytes = 0L)
        .select(col("doc_id"),
          explode(TextFns.rawShingles(TextFns.tokens(col("text")), 5)).as("g"))
      val docsPerGram = g.groupBy("g").agg(countDistinct(col("doc_id")).as("__nd"))
      g.join(docsPerGram, Seq("g"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_grams"),
          sum(when(col("__nd") >= 2, 1L).otherwise(0L)).cast("long").as("n_shared"),
          round(avg(when(col("__nd") >= 2, 1.0).otherwise(0.0)), 6).as("dup_fraction"))
    }),

    // bounded-window EWMA smoothing (8-tap, α=1/2, exact binary-fraction
    // weights): per-entity FIR filter as explicit lags — partition count
    // grows with the entity population, frame is O(1) rows
    "w12_ewma" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val taps = (0 to 7).map(j =>
        (if (j == 0) col("value") else lag(col("value"), j).over(w),
          math.pow(0.5, j)))
      val num = taps.map { case (c, wt) => coalesce(c * wt, lit(0.0)) }.reduce(_ + _)
      val den = taps.map { case (c, wt) =>
        when(c.isNotNull, lit(wt)).otherwise(lit(0.0)) }.reduce(_ + _)
      ev(s, d).select(col("event_id"), col("user_id"),
        round(num / den, 6).as("ewma8"))
    }),

    // weekly retention triangle: per-user cohort week (week of first
    // event) × activity-week offset → distinct active users
    "q02_retention" -> ((s, d) => {
      val weeks = ev(s, d).select(col("user_id"),
        floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7).cast("int").as("wk"))
        .distinct()
      val first = weeks.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      weeks.join(first, Seq("user_id"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(count(lit(1)).cast("long").as("n_users"))
    }),

    // behavioral diversity: Shannon entropy of each user's event-type mix
    "a19_behavior_entropy" -> ((s, d) =>
      SummaryOps.groupEntropy(ev(s, d), "user_id", "event_type")
        .withColumnRenamed("n_rows", "n_events")
        .withColumnRenamed("n_categories", "n_types"))
,
    // CCNet-style perplexity proxy: train an add-1-smoothed unigram model
    // on the corpus itself, score each doc by mean negative log-likelihood.
    // The 1-row (N, V) aggregate broadcasts (bounded by construction); the
    // token↔prob join shuffles on the token — vocab never sits on one task
    "t18_unigram_logprob" -> ((s, d) => {
      val tok = Tables.spread(docs(s, d).select("doc_id", "text"), tinyBytes = 0L)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      val counts = tok.groupBy("tok").agg(count(lit(1)).as("__c"))
      val stats = counts.agg(sum("__c").cast("double").as("__n"),
        count(lit(1)).cast("double").as("__v"))
      val probs = counts.crossJoin(broadcast(stats))
        .select(col("tok"),
          ((col("__c").cast("double") + 1.0) / (col("__n") + col("__v"))).as("__p"))
      tok.join(probs, Seq("tok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_toks"),
          round(avg(-log(col("__p"))), 6).as("avg_nll"))
    }),

    // value-ordered per-group top-k over few huge strata: two-phase form
    // (local top-k per salt slice, exact rank over the bounded survivors) —
    // the naive per-stratum window would sort a whole stratum in one task
    "o05_topk_per_group" -> ((s, d) =>
      FoldOps.perStratumTopNBy(
          li(s, d).select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
          col("l_returnflag"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc),
          tieBreak = col("l_orderkey") * 10 + col("l_linenumber"), n = 3)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("rk").cast("int").as("rk"))),

    // DoReMi-flavored domain mixing: per-source token share vs a uniform
    // target → resampling weight = target_share / observed_share
    "ml07_mix_weights" -> ((s, d) => {
      val perSource = docs(s, d)
        .select(col("source"), size(TextFns.tokens(col("text"))).cast("long").as("__t"))
        .groupBy("source").agg(sum("__t").as("__toks"))
      val tot = perSource.agg(sum("__toks").cast("double").as("__total"),
        count(lit(1)).cast("double").as("__k"))
      perSource.crossJoin(broadcast(tot))
        .select(col("source"), col("__toks").cast("long").as("n_toks"),
          round(col("__toks") / col("__total"), 6).as("share"),
          round(col("__total") / (col("__k") * col("__toks")), 6).as("weight"))
    }),

    // stride-scheduled source mixing: materialize lang weights into ONE
    // deterministic global training order (virtual-time merge; per-source
    // rank and final position both distributed two-phase ranks)
    "ml11_interleave" -> ((s, d) =>
      FoldOps.interleaveByWeight(
          docs(s, d).select("doc_id", "lang"), col("lang"), Seq(col("doc_id").asc),
          Map("en" -> 0.4, "zh" -> 0.15, "es" -> 0.15, "de" -> 0.15, "fr" -> 0.15))
        .select("doc_id", "lang", "src_rank", "pos")),

    // RefinedWeb/CCNet-style segment-level boilerplate removal: aligned
    // 4-token segments occurring ≥2 times corpus-wide are dropped from
    // every doc; docs are reassembled from the survivors in order
    "d13_segment_dedup" -> ((s, d) =>
      DedupOps.dropDuplicateSegments(docs(s, d), "doc_id", "text",
        w = 4, minDup = 2L)),

    // BM25 keyword retrieval: top-10 docs for a 3-term query; the final
    // top-k is TakeOrderedAndProject, never a global window
    "t19_bm25_topk" -> ((s, d) =>
      RetrievalOps.bm25TopK(docs(s, d), "doc_id", "text",
        terms = Seq("spark", "window", "join"), k = 10)),

    // group-relative quality gate: keep docs at/above their source's
    // median length — the per-domain curation threshold pattern
    "q03_domain_quantile_gate" -> ((s, d) =>
      CleaningOps.quantileGate(
          docs(s, d).select("doc_id", "source", "n_chars"),
          "source", "n_chars", 0.5)
        .select("doc_id", "source", "n_chars")),

    // PSI drift between even- and odd-user event values, 10 equal-width
    // bins over the combined range; total PSI = sum(psi_contrib)
    "dq03_psi" -> ((s, d) =>
      MetricsOps.psi(ev(s, d), col("value"), col("user_id") % 2 === 0,
        bins = 10)),

    // robust per-type outlier flags: median/MAD z-score > 3.5
    "dq04_mad_outliers" -> ((s, d) =>
      CleaningOps.madOutliers(
          ev(s, d).select("event_id", "event_type", "value"),
          "event_type", "value", cutoff = 3.5)
        .filter(col("is_outlier") === 1)
        .select("event_id", "event_type", "value", "robust_z")),

    // two-sample KS drift statistic on the same even/odd-user split as
    // dq03 — binning-free companion to PSI, bit-exact cross-engine
    "dq05_ks" -> ((s, d) =>
      MetricsOps.ksStatistic(ev(s, d), col("value"), col("user_id") % 2 === 0)),

    // Efraimidis-Spirakis weighted sampling: 50 docs, inclusion odds
    // proportional to n_chars, membership a pure function of the key
    "ml08_weighted_sample" -> ((s, d) =>
      FoldOps.weightedSample(docs(s, d).select("doc_id", "n_chars"),
        col("doc_id"), col("n_chars"), n = 50)),

    // ANN quality gauge: recall@3 of the label-bucketed IVF path against
    // exact brute force, per query (vec_id < 8)
    "v07_ann_recall" -> ((s, d) => {
      val e = emb(s, d)
      val exact = Knn.bruteForceTopK(e, e.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 3)
      val approx = Knn.clusteredTopK(e, "vec_id", "embedding", "label", k = 3)
        .filter(col("query_id") < 8)
      Knn.recallAtK(exact, approx)
    }),

    // the IVF TUNING CURVE: v07's recall gauge swept over nProbe 1/2/4 of
    // the v06 multi-probe index against one shared brute-force truth — the
    // recall-vs-probe-budget table an index operator actually reads before
    // picking nProbe; one exact list, three bounded probe evaluations
    "v23_recall_nprobe_sweep" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val e = emb(s, d)
      val cents = Knn.centroids(e, "label", "embedding").collect()
        .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map { case (_, rows) =>
          rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      val exact = Knn.bruteForceTopK(e, e.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 3)
      Seq(1, 2, 4).map { np =>
        val approx = Knn.multiProbeTopK(e, "vec_id", "embedding", cents,
            nProbe = np, k = 3,
            simFn = (a, b) => call_function("cosine_sim", a, b))
          .filter(col("query_id") < 8)
        Knn.recallAtK(exact, approx).withColumn("n_probe", lit(np))
      }.reduce(_ unionAll _)
    }),

    // per-source KL divergence from the corpus unigram distribution — the
    // domain-shift ranking behind mixture design; unseen-token mass in
    // closed form, so no source×vocab grid and no cross product
    "t21_kl_divergence" -> ((s, d) =>
      SummaryOps.klFromCorpus(docs(s, d), "source", "text")),

    // interval overlap as a bucket-banded equi-join (never a per-key cross
    // product): 30-day order-validity windows overlapping per customer
    "j18_interval_overlap" -> ((s, d) => {
      val iv = ord(s, d).select(
        col("o_custkey"),
        col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("s_day"))
        .withColumn("e_day", col("s_day") + 30)
      JoinOps.intervalOverlapPairs(iv, "o_custkey", "o_orderkey",
          "s_day", "e_day", bucketWidth = 32L)
        .select(col("o_custkey"),
          col("o_orderkey_a").as("id_a"), col("o_orderkey_b").as("id_b"),
          (least(col("e_day_a"), col("e_day_b")) -
            greatest(col("s_day_a"), col("s_day_b"))).cast("long")
            .as("overlap_days"))
    }),

    // hashing-trick featurizer: fixed 64-dim buckets from portable md5,
    // no vocabulary pass or id-assignment shuffle — tall sparse output
    "f25_feature_hash" -> ((s, d) =>
      FoldOps.featureHash(
        docs(s, d).select(col("doc_id"), col("text")),
        "doc_id", TextFns.tokens(col("text")), dim = 64)),

    // salted skew join under the oracle gate: the hot-key scatter machinery
    // (ScaleJoinSpec proves the plan) must be result-identical to a plain
    // equi-join — here a revenue rollup through the salted path
    "j17_salted_join" -> ((s, d) => {
      // partial-aggregate below the join (map-side combine): the salted
      // shuffle carries one row per order, not per line item — the same
      // shape entry() uses; salting then protects the join itself
      val partial = li(s, d)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("__rev"),
          count(lit(1)).as("__n"))
      JoinOps.saltedEquiJoin(partial,
          ord(s, d).select("o_orderkey", "o_orderstatus"),
          "o_orderkey", salt = 8)
        .groupBy("o_orderstatus")
        .agg(round(sum(col("__rev")), 2).as("revenue"),
          sum(col("__n")).as("n_items"))
    }),

    // CDC reconciliation of two snapshot generations: one full-outer
    // equi-join classifying insert/delete/update by null-safe comparison
    "u07_snapshot_diff" -> ((s, d) => {
      val o = ord(s, d)
      val old = o.filter(col("o_orderkey") % 5 =!= 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val nw = o.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 3 === 0, round(col("o_totalprice") * 1.1, 2))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      JoinOps.snapshotDiff(old, nw, "o_orderkey",
          Seq("o_orderstatus", "o_totalprice"))
        .filter(col("op") =!= "unchanged")
        .select("o_orderkey", "op")
    }),

    // MERGE-style changelog apply: deletes drop, upserts replace, inserts
    // append, untouched rows stream through one anti-join (AQE broadcasts
    // the change set) — the lakehouse upsert twin of u07's diff
    "u08_apply_changelog" -> ((s, d) => {
      val cur = cust(s, d).select("c_custkey", "c_nationkey", "c_acctbal")
      val changes = cur.filter(col("c_custkey") % 10 <= 3)
        .select(
          when(col("c_custkey") % 10 === 3, col("c_custkey") + 1000000)
            .otherwise(col("c_custkey")).as("c_custkey"),
          col("c_nationkey"),
          when(col("c_custkey") % 10 === 3, lit(0.0))
            .otherwise(col("c_acctbal") + 100.0).as("c_acctbal"),
          when(col("c_custkey") % 10 === 0, lit("delete"))
            .otherwise(lit("upsert")).as("op"))
      JoinOps.applyChangelog(cur, changes, "c_custkey", "op")
    }),

    // SCD-2 history from an event log: consecutive equal values collapse
    // into [valid_from, valid_to) intervals, all windows keyed per entity
    "w13_scd_intervals" -> ((s, d) =>
      WindowOps.runLengthIntervals(
          ev(s, d).select("user_id", "event_id", "ts", "event_type"),
          Seq("user_id"), Seq("ts", "event_id"), col("event_type"), col("ts"))
        .select(col("user_id"), col("value").as("event_type"),
          col("valid_from"), col("valid_to"),
          col("n_events").cast("long").as("n_events"))),

    // exact global percent-rank with RANK tie semantics, assigned via the
    // two-phase distinct-value cumsum — the fact table is never globally
    // sorted and nothing passes through one task
    "f24_percent_rank" -> ((s, d) =>
      RankOps.globalPercentRank(
          li(s, d).select("l_orderkey", "l_linenumber", "l_extendedprice"),
          "l_extendedprice", "pr")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          round(col("pr"), 6).as("pr"))),

    // PMI collocations over adjacent token pairs, low-frequency tail pruned
    "t20_pmi_bigrams" -> ((s, d) =>
      SummaryOps.pmiBigrams(docs(s, d), "text", minCount = 5L)),

    // curriculum phases: rank docs by a difficulty proxy (length) and cut
    // into 4 contiguous stages; the rank is the two-phase distributed form,
    // the phase an exact integer division (no double rounding at 10¹⁵ rows)
    "ml09_curriculum_phase" -> ((s, d) => {
      val scored = docs(s, d).select(col("doc_id"), col("n_chars"))
      RankOps.globalRowNumber(scored,
          Seq(col("n_chars").asc, col("doc_id").asc), "rn")
        .crossJoin(broadcast(scored.agg(count(lit(1)).as("__n"))))
        .select(col("doc_id"), col("n_chars"), col("rn"),
          expr("CAST(((rn - 1) * 4) DIV __n AS INT)").as("phase"))
    }),

    // S13 — bucketed-table co-located join: both sides bucketed on the join
    // key at write time, so the join itself runs with NO exchange (the
    // storage-level shuffle elimination for repeatedly-joined fact tables;
    // plan asserted shuffle-free in PlanQualitySpec). Build and probe are
    // SPLIT: ensureS13Tables ingests once per (session, sf dir) — exactly
    // the production contract ("pay the shuffle once at ingest, never
    // again") — so a timed re-run measures the join, not the DDL
    "s13_bucketed_join" -> ((s, d) => {
      ensureS13Tables(s, d)
      s.table("graft_s13_orders")
        .join(s.table("graft_s13_items"), Seq("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "qty")
    }),

    // S12 — additive schema evolution: two parquet writer generations
    // (second adds a column), one mergeSchema scan padding nulls
    "s12_mergeschema_roundtrip" -> ((s, d) => {
      val out = java.nio.file.Files.createTempDirectory("graft_s12").toString
      val n = nat(s, d)
      n.filter(col("n_nationkey") < 12).select("n_nationkey", "n_name")
        .write.mode("overwrite").parquet(s"$out/gen=1")
      n.filter(col("n_nationkey") >= 12)
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").parquet(s"$out/gen=2")
      graft.sources.Readers.mergedParquet(s, out)
        .select("n_nationkey", "n_name", "n_regionkey")
    }),

    // per-customer OLS spend trend: five exact integer sums per group (days
    // since epoch × price cents), slope/intercept/R² as single
    // correctly-rounded divisions — a million trend models in one hash agg
    "a23_group_ols" -> ((s, d) =>
      RegressionOps.groupOls(ord(s, d), "o_custkey",
        datediff(col("o_orderdate"), lit("1992-01-01")),
        round(col("o_totalprice") * 100, 0))),

    // event-type transition matrix (Markov first-order counts per user)
    "ts05_transitions" -> ((s, d) =>
      TimeSeriesOps.transitionCounts(ev(s, d), "user_id", "ts", "event_id",
        "event_type")),

    // LOCF time-weighted mean of the sampled signal per user — the correct
    // mean for irregular sampling; fixed-point accumulation (integer
    // micros × integer seconds) keeps it engine-exact
    "ts06_time_weighted_avg" -> ((s, d) =>
      TimeSeriesOps.timeWeightedAvg(ev(s, d), "user_id", "ts", "event_id",
        col("value"))),

    // dictionary fuzzy normalization of the product-noun vocabulary: best
    // canonical within 2 edits, (distance, lexicographic) tie-break;
    // unmatched terms surface as null for review
    "f26_fuzzy_normalize" -> ((s, d) =>
      CleaningOps.fuzzyNormalize(prt(s, d),
        element_at(split(col("p_name"), " "), 2), fuzzyDict, maxDist = 2)),

    // cross-source quantile normalization of document lengths: within-source
    // decile (exact integer strata) mapped to the corpus-wide decile mean
    "f28_quantile_normalize" -> ((s, d) =>
      RegressionOps.quantileNormalize(docs(s, d), "source", col("n_chars"),
        col("doc_id"), q = 10)),

    // weighted PageRank over the event-type flow graph, 3 unrolled
    // iterations — fixed-point contribution sums + 9dp trajectory pinning
    // make the whole trajectory engine- and partition-count-exact
    "pr01_pagerank" -> ((s, d) => {
      val edges = TimeSeriesOps.transitionCounts(ev(s, d), "user_id", "ts",
        "event_id", "event_type")
      GraphOps.pageRank(edges, "from_state", "to_state", "cnt",
        iters = 3, damping = 0.85)
    }),

    // Benford first-digit conformance of the money column — leading digit
    // from the shortest decimal representation (bit-exact across engines),
    // per-digit observed vs log10(1+1/d) share and χ² contribution
    "dq06_benford" -> ((s, d) =>
      MetricsOps.benfordDigits(ord(s, d), col("o_totalprice"))),

    // revenue concentration: exact Gini over price cents via the two-phase
    // global rank — one scalar answering "how unequal is customer spend?"
    "a24_gini" -> ((s, d) =>
      MetricsOps.giniIndex(ord(s, d),
        round(col("o_totalprice") * 100, 0), col("o_orderkey"))),

    // Zipf slope of the corpus token distribution — corpus forensics:
    // ≈ −1 for natural language, flatter for templated text; fixed-point
    // logs keep the OLS engine-exact
    "t22_zipf_fit" -> ((s, d) => {
      val toks = docs(s, d)
        .select(explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      RegressionOps.zipfFit(toks, "tok", "cnt")
    }),

    // inverse-frequency class weights over document languages — the
    // weighted-loss input: n_total / (k · n_class), 1.0 when balanced
    "ml10_class_weights" -> ((s, d) =>
      FoldOps.classWeights(docs(s, d), "lang")),

    // full ROC curve (fpr, tpr per distinct threshold) behind a15's AUC
    // scalar — same one-pinned-cumsum shape as a20/dq05
    "a21_roc_points" -> ((s, d) =>
      MetricsOps.rocPoints(ord(s, d), col("o_totalprice"),
        when(col("o_orderstatus") === "F", 1).otherwise(0))),

    // CUSUM regime-change peaks per user — where (and how strongly) each
    // signal's level shifted; deviations formed in exact integer arithmetic
    // (v·n − Σv), so peak choice and tie-breaks are engine-exact
    "ts07_cusum" -> ((s, d) =>
      TimeSeriesOps.cusumPeaks(ev(s, d), "user_id", "ts", "event_id",
        col("value")))
  ) ++ round7Queries

  /** Per-customer (duration, event) survival frame: days from first to
    * last order, event = any finalized order, segment from the customer
    * dim — the `(T, δ)` input both survival estimators consume.
    */
  private def survivalSubjects(s: SparkSession, d: String): DataFrame =
    ord(s, d).groupBy("o_custkey")
      .agg(
        datediff(max("o_orderdate"), min("o_orderdate")).cast("long")
          .as("dur"),
        max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("ev"))
      .join(cust(s, d).select(col("c_custkey"),
        col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))

  private def round7Queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Kaplan–Meier survival per market segment — the time-to-event curve
    // over the cohort labels the reference's extraction produces; exact
    // integer at-risk counts, fixed-point log-space product
    "a25_kaplan_meier" -> ((s, d) =>
      SurvivalOps.kaplanMeier(survivalSubjects(s, d), "segment", "dur",
        "ev")),

    // two-sample logrank: BUILDING+AUTOMOBILE vs rest — observed vs
    // expected events under the pooled-hazard null, hypergeometric
    // variance, all sums in fixed point
    "a26_logrank" -> ((s, d) =>
      SurvivalOps.logRank(
        survivalSubjects(s, d).withColumn("g1",
          when(col("segment").isin("BUILDING", "AUTOMOBILE"), 1)
            .otherwise(0)),
        "g1", "dur", "ev")),

    // χ² / Cramér's V / mutual information between order priority and
    // status — the categorical feature-selection screen as one cell-keyed
    // shuffle plus broadcast marginals
    "a27_cat_assoc" -> ((s, d) =>
      AssociationOps.categoricalAssociation(ord(s, d),
        col("o_orderpriority"), col("o_orderstatus"))),

    // top co-purchased part pairs: basket self-join with the quadratic
    // per-basket guard, deterministic (cnt desc, src, dst) top-100
    "g01_cooccur_topk" -> ((s, d) =>
      partEdges(s, d)
        .orderBy(col("cnt").desc, col("src"), col("dst")).limit(100)),

    // triangle census of the brand co-occurrence graph (support ≥ 20) —
    // degree-ordered forward counting, the O(√m) out-degree bound that
    // survives hub skew
    "g02_brand_triangles" -> ((s, d) =>
      GraphOps.triangleCount(
        brandEdges(s, d).filter(col("cnt") >= 20), "src", "dst")),

    // degree histogram of the part co-occurrence graph — the one-glance
    // hub/power-law shape check
    "g03_degree_hist" -> ((s, d) =>
      GraphOps.degreeHistogram(partEdges(s, d), "src", "dst")),

    // 3-core of the same graph: 12 monotone peel rounds (fixed count —
    // deterministic AND unrollable as oracle CTEs; no-ops once converged),
    // survivors with their in-core degree
    "g06_kcore" -> ((s, d) =>
      GraphOps.kCore(partEdges(s, d), "src", "dst", k = 3, rounds = 12)),

    // deterministic synchronous label propagation over the same graph:
    // 4 rounds of most-frequent-neighbor-label (ties to smallest), every
    // round one adjacency×labels equi-join + two hash aggregates —
    // unrollable as oracle CTEs like the kCore peel
    "g07_label_prop" -> ((s, d) =>
      GraphOps.labelPropagation(partEdges(s, d), "src", "dst", rounds = 4)),

    // snapshot-drift monitor: split the feed at the midpoint of its time
    // extent (1-row broadcast bound), profile each half per column in ONE
    // pass (conditional aggregates), report per-column count/null/distinct
    // drift — the "did the pipeline change under me" check dq01 can't
    // answer because it profiles a single snapshot
    "dq15_schema_drift" -> ((s, d) => {
      val e = ev(s, d)
      val mid = e.agg(((unix_micros(min(col("ts"))) +
        unix_micros(max(col("ts")))) / 2).as("__mid"))
      val tagged = e.crossJoin(broadcast(mid))
        .withColumn("__ha", unix_micros(col("ts")) < col("__mid"))
      val cols = Seq("value", "event_type", "user_id")
      def stats(c: String) = Seq(
        sum(when(col("__ha"), 1L).otherwise(0L)).as(s"na_$c"),
        sum(when(col("__ha") && col(c).isNull, 1L).otherwise(0L))
          .as(s"nulla_$c"),
        countDistinct(when(col("__ha"), col(c))).as(s"dista_$c"),
        sum(when(!col("__ha"), 1L).otherwise(0L)).as(s"nb_$c"),
        sum(when(!col("__ha") && col(c).isNull, 1L).otherwise(0L))
          .as(s"nullb_$c"),
        countDistinct(when(!col("__ha"), col(c))).as(s"distb_$c"))
      val aggs = cols.flatMap(stats)
      val wide = tagged.agg(aggs.head, aggs.tail: _*)
      val stacked = cols.map(c =>
        s"'$c', na_$c, nulla_$c, dista_$c, nb_$c, nullb_$c, distb_$c")
        .mkString(", ")
      wide.select(expr(s"stack(${cols.size}, $stacked) as " +
          "(col_name, n_a, null_a, dist_a, n_b, null_b, dist_b)"))
        .withColumn("null_rate_delta",
          round(col("null_b").cast("double") / col("n_b") -
            col("null_a").cast("double") / col("n_a"), 6))
    }),

    // hour-of-week seasonal baseline per event type: n / mean / std per
    // calendar cell from exact integer sums (squares in DECIMAL(38,0))
    "ts08_seasonal_profile" -> ((s, d) =>
      TimeSeriesOps.seasonalProfile(ev(s, d), "event_type", "ts",
        col("value"))),

    // readings far from their calendar cell's baseline — profile is
    // calendar-bounded so the rejoin broadcasts; z from the rounded
    // (mean, std) pair both engines hold bit-identically
    "ts09_seasonal_anomaly" -> ((s, d) =>
      TimeSeriesOps.seasonalAnomalies(ev(s, d), "event_type", "ts",
        "event_id", col("value"), zThresh = 1.6, minN = 5)),

    // exact tie-averaged Spearman ρ: quantity has 50-way ties, so the
    // doubled-average-rank construction is doing real work here
    "a28_spearman" -> ((s, d) =>
      RegressionOps.spearman(li(s, d), col("l_quantity"),
        col("l_extendedprice"))),

    // weekly cohort-retention matrix: first-activity week × offset →
    // distinct users — the product-analytics triangle view
    "q04_cohort_matrix" -> ((s, d) => {
      val wk = floor(datediff(to_date(col("ts")), lit("1970-01-01")) / 7)
        .cast("long")
      val uw = ev(s, d).select(col("user_id"), wk.as("week")).distinct()
      val coh = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
      uw.join(coh, "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
    }),

    // Heaps'-law vocabulary growth fit over the id-ordered corpus — the
    // sequential-looking statistic built from global stream indexes,
    // min_by first occurrences and two bounded cumsums
    "t23_heaps_fit" -> ((s, d) =>
      RegressionOps.heapsFit(docs(s, d), "doc_id", "text")),

    // sorted-neighborhood near-dup pairs (Hernández–Stolfo SNM): sort-order
    // locality blocking — catches the typo/truncation near-identicals the
    // shingle methods' content-overlap blocking is blind to
    "d15_sorted_neighborhood" -> ((s, d) =>
      DedupOps.sortedNeighborhood(docs(s, d), "doc_id", "text",
        window = 3, maxDist = 16)),

    // bloom-prefiltered semi join: approximate membership at the fact scan
    // drops non-members before the shuffle, exact semi join cleans up the
    // false positives — result-identical to the plain semi join, so fully
    // oracle-able
    "j20_bloom_prefilter" -> ((s, d) => {
      val vips = cust(s, d).filter(col("c_acctbal") > 9000)
        .select("c_custkey")
      BloomOps.bloomSemiFilter(
        ord(s, d).withColumnRenamed("o_custkey", "c_custkey"),
        "c_custkey", vips, expectedItems = 2000L, numBits = 1L << 17)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(round(col("o_totalprice") * 100, 0).cast("long")) /
            100.0, 2).as("revenue"))
    }),

    // k-anonymity / l-diversity release audit: one hash agg over the
    // quasi-identifier tuple; sensitive attribute coarsened to $1k
    // account-balance bands (raw balances are near-unique → l trivial)
    "dq07_k_anonymity" -> ((s, d) =>
      PrivacyOps.kAnonymityProfile(cust(s, d),
        Seq("c_nationkey", "c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long"), minK = 10L)),

    // leave-one-out target encoding of order priority against a
    // high-value flag — per-category agg + AQE-broadcast join back,
    // never a per-category window
    "ml12_target_encode" -> ((s, d) =>
      EncodingOps.targetEncodeLoo(
          ord(s, d).select(col("o_orderkey"), col("o_orderpriority"),
            (col("o_totalprice") > 150000).cast("int").as("y")),
          "o_orderpriority", col("y"), "loo_enc")
        .select("o_orderkey", "o_orderpriority", "y", "loo_enc")),

    // weight-of-evidence per order priority for the same flag — the
    // credit-risk encoding, one output row per category
    "ml13_woe" -> ((s, d) =>
      EncodingOps.weightOfEvidence(ord(s, d), "o_orderpriority",
        (col("o_totalprice") > 150000).cast("int"))),

    // Jaro-Winkler vocabulary reconciliation: distinct part names,
    // first-character blocking, native codegen'd scorer
    // (graft.expressions.JaroWinklerSimilarity — byte semantics matched
    // to the oracle engine's jaro_winkler_similarity)
    "f30_jw_pairs" -> ((s, d) =>
      LinkageOps.jaroWinklerPairs(prt(s, d), "p_name", threshold = 0.8)),

    // reciprocal-rank fusion of a lexical (BM25) and a length-prior
    // ranking — hybrid retrieval without score calibration; ranks via the
    // exchange-parallel two-phase row_number
    "t24_rrf_fusion" -> ((s, d) => {
      val lex = RetrievalOps.bm25TopK(docs(s, d), "doc_id", "text",
        terms = Seq("spark", "window", "join"), k = 50)
      val prior = docs(s, d)
        .select(col("doc_id"), col("n_chars").cast("double").as("score"))
        .orderBy(col("score").desc, col("doc_id").asc).limit(50)
      RetrievalOps.rrfFuse(Seq(lex, prior), "doc_id", k = 20)
    }),

    // linear time-interpolation of interior null values per user on the
    // epoch-µs axis (purchase-only signal, same sparsification as w03);
    // boundary nulls stay null — one sort exchange, two streaming frames
    "w14_interpolate" -> ((s, d) => {
      val base = ev(s, d).withColumn("v",
        when(col("event_type") === "purchase", col("value")))
      WindowOps.linearInterpolate(base, Seq("user_id"),
          Seq("ts", "event_id"), col("ts"), col("v"), "interp")
        .select(col("event_id"), round(col("interp"), 6).as("interp"))
    }),

    // information-gain feature screen: both order categoricals ranked
    // against the high-value flag in one melted aggregate pass
    "ml14_info_gain" -> ((s, d) =>
      AssociationOps.infoGainScreen(ord(s, d),
        Seq("priority" -> col("o_orderpriority"),
          "status" -> col("o_orderstatus")),
        (col("o_totalprice") > 150000).cast("int"))),

    // exact Harrell's C-index with censoring — risk-bucketed Fenwick
    // sweeps + one multi-column time cumsum, never the O(n²) pair join
    // (the subset keeps the oracle's brute-force theta join tractable;
    // the engine path is the scale algorithm regardless)
    "a31_cindex" -> ((s, d) =>
      ConcordanceOps.cIndex(
        ord(s, d).filter(col("o_custkey") < 100),
        datediff(col("o_orderdate"), to_date(lit("1992-01-01"))),
        when(col("o_orderstatus") === "F", 1).otherwise(0),
        col("o_totalprice"))),

    // per-source Jensen-Shannon divergence vs the REST of the corpus —
    // the bounded symmetric drift ranking (t21's KL companion); unseen
    // mass in closed form, group totals a tiny broadcast
    "t27_jsd_sources" -> ((s, d) =>
      SummaryOps.jsdFromRest(docs(s, d), "source", "text")),

    // RAKE keyword extraction: stopword-delimited candidate phrases,
    // degree/frequency word scores, top-25 phrases corpus-wide
    "t26_rake_keywords" -> ((s, d) =>
      RetrievalOps.rakeTopK(docs(s, d), "doc_id", "text",
        stopWords = Seq("the", "a", "of", "and", "to"), k = 25)),

    // deterministic hard-negative sampling: per user (custkey < 30), 3
    // same-brand parts never purchased, ranked by a content hash of the
    // (user, item) pair — block equi-join, never user × catalog
    "ml15_negative_sample" -> ((s, d) => {
      val inter = li(s, d)
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_custkey") < 30)
        .join(prt(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("o_custkey"), col("p_partkey"), col("p_brand"))
      FoldOps.hardNegatives(inter, "o_custkey", "p_partkey", "p_brand",
        prt(s, d).select(col("p_partkey"), col("p_brand")), k = 3)
    }),

    // Charlson-style weighted comorbidity score: distinct purchased part
    // categories per customer, fixed category weights summed — the
    // reference's ICD-grouping → severity-score pattern (icd_9to10 /
    // disease_cohort.py) over the synthetic star schema
    "q05_comorbidity" -> ((s, d) => {
      val weight = when(col("p_type").isin("ECONOMY", "STANDARD"), 1)
        .when(col("p_type").isin("SMALL", "MEDIUM"), 2)
        .when(col("p_type") === "LARGE", 3)
        .otherwise(6)
      li(s, d).join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(prt(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("o_custkey"), col("p_type")).distinct()
        .groupBy("o_custkey")
        .agg(sum(weight).as("comorbidity_index"),
          count(lit(1)).as("n_categories"))
    }),

    // exact isotonic calibration (hierarchical PAV over 50 distinct
    // quantity scores) — the oracle cross-checks via the minimax identity
    // fitted_i = max_{j<=i} min_{k>=i} mean(y[j..k]) run-grouped to blocks
    "a30_isotonic" -> ((s, d) =>
      IsotonicOps.isotonicFit(li(s, d), col("l_quantity"),
        when(col("l_returnflag") === "R", 1).otherwise(0))),

    // Murphy decomposition of the Brier score over the a14 probability
    // frame — reliability / resolution / uncertainty in one pass, every
    // float term fixed-point summed
    "a29_brier" -> ((s, d) =>
      MetricsOps.brierDecomposition(li(s, d),
        col("l_discount") * 10.0,
        when(col("l_returnflag") === "R", 1).otherwise(0), bins = 10)),

    // the reference Generator's tensor shape end-to-end: purchase values
    // bucketed per user-day (exact integer-cent means), densified to the
    // user's full day span, gaps linearly interpolated on the bucket axis
    "ts10_resample_interp" -> ((s, d) =>
      TimeSeriesOps.resampleInterpolate(
        ev(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"),
            datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
              .cast("long").as("day"),
            round(col("value") * 100, 0).cast("long").as("cents")),
        "user_id", col("day"), col("cents"))),

    // exact trailing-7-row median per user — the robust smoother (w12's
    // EWMA is mean-family; one artifact spike ruins it, the median
    // shrugs); one partition-keyed sort, bounded frame
    "w15_rolling_median" -> ((s, d) =>
      WindowOps.rollingMedian(ev(s, d), Seq("user_id"),
          Seq("ts", "event_id"), col("value"), k = 7, "roll_med")
        .select(col("event_id"), round(col("roll_med"), 6).as("roll_med"))),

    // exact tie-corrected Mann-Whitney U, purchase vs view values — the
    // nonparametric distribution-shift test; ranks via the
    // exchange-parallel prefix sum, all sufficient statistics integer
    "a32_mannwhitney" -> ((s, d) =>
      RegressionOps.mannWhitney(ev(s, d), col("value"), col("event_type"),
        groupA = "purchase", groupB = "view")),

    // k-group rank test over ALL segments (a32's generalization): exact
    // integer rank sums + tie term, bounded per-group array folded in
    // sorted order for a partitioning-independent double sum
    "a43_kruskal" -> ((s, d) =>
      RegressionOps.kruskalWallis(ev(s, d), col("value"),
        col("event_type"))),

    // per-user monotone-trend test over the daily count series: exact
    // integer S/n/tie-term, within-entity self-join bounded by the
    // calendar span (never the corpus), continuity-corrected z
    "a44_mann_kendall" -> ((s, d) =>
      TimeSeriesOps.mannKendallTrend(
        ev(s, d).groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "user_id", col("day"), col("cnt"))),

    // Wald–Wolfowitz runs test per user: do daily activity levels CLUMP
    // around the median (regime-y) or alternate randomly — the
    // randomness companion to the a44/a48 trend family; all sufficient
    // statistics exact integers
    "a52_runs_test" -> ((s, d) =>
      TimeSeriesOps.runsTest(
        ev(s, d).groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "user_id", col("day"), col("cnt"))),

    // a44's effect-size companion: Kendall τ-b off the same bounded pair
    // join — exact integer S and tie counts, one √ + one division
    "a48_kendall_tau" -> ((s, d) =>
      TimeSeriesOps.kendallTau(
        ev(s, d).groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "user_id", col("day"), col("cnt"))),

    // per-entity exact sign test + Benjamini–Hochberg step-up across the
    // family — the multiple-testing correction for a fleet of per-series
    // monitors. p-values are exact dyadic rationals (Pascal-triangle
    // binomial tails in DECIMAL(38,0), one IEEE division) — bit-portable
    // with no cross-engine transcendentals
    "a45_sign_bh" -> ((s, d) =>
      AssociationOps.signTestBH(
        ev(s, d).groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "user_id", col("day"), col("cnt"), q = 0.05)),

    // exact tie-corrected Friedman: blocks = users, treatments = the 7
    // weekdays, value = activity count — "does weekday rank consistently
    // differ per user". Complete blocks only; doubled within-block mean
    // ranks keep every sufficient statistic an exact integer
    "a46_friedman" -> ((s, d) =>
      RegressionOps.friedman(
        ev(s, d).groupBy(col("user_id"),
            dayofweek(col("ts")).cast("long").as("dow"))
          .agg(count(lit(1)).as("cnt")),
        col("user_id"), col("dow"), col("cnt"))),

    // Holt double-exponential smoothing (α = β = ½) over each user's
    // daily counts — final (level, trend) + one-step forecast; the fold
    // runs in exact integer micros with pure-integer half-up rounding,
    // so the sequential recursion is engine-portable by construction
    "ts18_holt" -> ((s, d) =>
      TimeSeriesOps.holtSmooth(
        ev(s, d).groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "user_id", col("day"), col("cnt"))),

    // pooled two-proportion z: did even-id users "purchase" at a
    // different rate than odd-id users — four exact integer counts, one
    // mirrored IEEE assembly
    "a47_prop_ztest" -> ((s, d) =>
      AssociationOps.twoProportionZ(ev(s, d),
        col("user_id") % 2 === 0, col("event_type") === "purchase")),

    // a47's magnitude companion: Cohen's d on per-user activity totals
    // between the parity cohorts — six exact DECIMAL(38,0) sufficient
    // statistics, one mirrored close
    "a50_cohens_d" -> ((s, d) =>
      RegressionOps.cohensD(
        ev(s, d).groupBy("user_id").agg(count(lit(1)).as("cnt")),
        col("user_id") % 2 === 0, col("cnt"))),

    // median signup→purchase latency in hours across converting users —
    // the time-to-convert product metric; exact type-7 median over µs
    // deltas (no per-group buffer), one closing unit division
    "q13_time_to_convert" -> ((s, d) => {
      val e = ev(s, d)
      val fs = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("s_ts"))
      val deltas = fs
        .join(e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts")), Seq("user_id"))
        .filter(col("p_ts") >= col("s_ts"))
        .groupBy("user_id")
        .agg(min(unix_micros(col("p_ts")) - unix_micros(col("s_ts")))
          .as("__dus"))
      // global exact median via the two-phase split-point machinery
      // (B = 2 → the single 0.5 boundary) — a constant-key window would
      // constant-fold to an Exchange SinglePartition and trip the guard
      val med = RankOps.rangeSplitPoints(deltas, col("__dus"), 2)
        .select(col("split").as("__med"))
      val n = deltas.agg(count(lit(1)).as("n_converters"))
      n.crossJoin(broadcast(med)) // 1-row × 1-row stats frames
        .select(col("n_converters"),
          round(col("__med") / lit(3.6e9), 6).as("median_hours"))
    }),

    // a44's "how fast" companion: per-user Theil-Sen robust slope —
    // median of pairwise Δcnt/Δday off the same bounded pair join,
    // exact type-7 median (no per-group buffer)
    "ts17_theil_sen" -> ((s, d) =>
      TimeSeriesOps.theilSenSlope(
        ev(s, d).groupBy(col("user_id"),
            datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
              .cast("long").as("day"))
          .agg(count(lit(1)).as("cnt")),
        "user_id", col("day"), col("cnt"))),

    // exact population covariance of the 64-dim embedding corpus (upper
    // triangle) — the PCA/whitening input; pair products generated
    // map-side by a nested transform, never a self-join
    "v09_embed_cov" -> ((s, d) => embCov(s, d)),

    // leakage-free chronological 80/20 split per user: first 80% of each
    // user's events (by time) train, tail test — one window pass
    "ml16_temporal_split" -> ((s, d) =>
      FoldOps.temporalSplit(ev(s, d), Seq("user_id"),
          Seq(col("ts"), col("event_id")), testFrac = 0.2)
        .select(col("event_id"), col("split"))),

    // Adamic-Adar link prediction over the STRONG part co-occurrence
    // graph (pairs seen together in ≥ 2 orders — single co-purchases are
    // noise and would densify the wedge join ~60×): common-neighbor
    // count + inverse-log-degree sum per candidate pair, hub-capped
    // neighborhood Jaccard over the same support-≥2 graph as g04 — the
    // unweighted structural-equivalence sibling; exact integer
    // overlap/union, full-degree denominators, maxDeg hub cap on the
    // wedge join
    "g08_neighbor_jaccard" -> ((s, d) =>
      GraphOps.neighborJaccard(partEdges(s, d).filter(col("cnt") >= 2),
        "src", "dst", maxDeg = 50, minCommon = 1L)),

    "g04_adamic_adar" -> ((s, d) =>
      GraphOps.adamicAdar(partEdges(s, d).filter(col("cnt") >= 2),
        "src", "dst", maxDeg = 50, minCommon = 1L)),

    // add-1-smoothed bigram LM trained on the corpus, scoring each doc's
    // average transition log-likelihood — the cheap perplexity-style
    // fluency gate of a quality-filter stack
    "t28_bigram_lm" -> ((s, d) =>
      SummaryOps.bigramLogProb(gramProf(s, d))),

    // dominant periodicity per user: the lag (1..3) with the highest
    // autocorrelation, ties to the smaller lag — ts11 collapsed to the
    // per-entity "does this series have a beat" verdict via max_by over
    // the rounded engine-exact acf
    "ts14_dominant_lag" -> ((s, d) =>
      TimeSeriesOps.autocorr(
          ev(s, d).select(col("user_id"), col("ts"), col("event_id"),
            round(col("value") * 100, 0).cast("long").as("__cents")),
          "user_id", "ts", "event_id", col("__cents"), maxLag = 3)
        .filter(col("acf").isNotNull)
        .groupBy("user_id")
        .agg(max_by(col("lag"), struct(col("acf"), -col("lag"))).as("best_lag"),
          max(col("acf")).as("best_acf"))),

    // primary-key violation audit: duplicate-key groups and surplus rows
    // per declared key — the first DQ gate of any ingest contract; one
    // hash aggregate per key
    "dq10_pk_violations" -> ((s, d) => {
      def audit(df: DataFrame, table: String, keys: Seq[String]) =
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(lit(table).as("table_name"),
            sum(when(col("__c") > 1, 1L).otherwise(0L)).as("dup_keys"),
            sum(when(col("__c") > 1, col("__c") - 1).otherwise(0L))
              .as("surplus_rows"))
      audit(ev(s, d), "events", Seq("event_id"))
        .unionByName(audit(ord(s, d), "orders", Seq("o_orderkey")))
        .unionByName(audit(li(s, d), "lineitem",
          Seq("l_orderkey", "l_linenumber")))
    }),

    // Welch's unequal-variance t-test, purchase vs view values — the
    // parametric companion of a32; every moment an exact integer-cent
    // sum, the t/df assembly double-only and oracle-mirrored
    "a40_welch_ttest" -> ((s, d) => {
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val cents = round(col("value") * 100, 0).cast("long")
      val agg = ev(s, d)
        .filter(col("value").isNotNull &&
          col("event_type").isin("purchase", "view"))
        .withColumn("__a", when(col("event_type") === "purchase", 1L).otherwise(0L))
        .agg(
          sum(col("__a")).as("n1"),
          sum(lit(1L) - col("__a")).as("n2"),
          sum(dec(cents) * col("__a")).as("__s1"),
          sum(dec(cents) * cents * col("__a")).as("__q1"),
          sum(dec(cents) * (lit(1L) - col("__a"))).as("__s2"),
          sum(dec(cents) * cents * (lit(1L) - col("__a"))).as("__q2"))
      val v1 = (col("n1") * col("__q1") - col("__s1") * col("__s1")).cast("double") /
        (col("n1").cast("double") * col("n1") * (col("n1") - 1))
      val v2 = (col("n2") * col("__q2") - col("__s2") * col("__s2")).cast("double") /
        (col("n2").cast("double") * col("n2") * (col("n2") - 1))
      val md = col("__s1").cast("double") / col("n1") -
        col("__s2").cast("double") / col("n2")
      val se2 = v1 + v2
      agg.select(col("n1"), col("n2"),
        round(col("__s1").cast("double") / col("n1") / 100.0, 6).as("mean1"),
        round(col("__s2").cast("double") / col("n2") / 100.0, 6).as("mean2"),
        round(md / sqrt(se2), 6).as("t"),
        round(se2 * se2 / (v1 * v1 / (col("n1") - 1) + v2 * v2 / (col("n2") - 1)),
          6).as("df"))
    }),

    // incremental view maintenance: yesterday's per-key aggregate STATE
    // merged with today's delta — two partial-aggregate frames unioned
    // and re-summed, never a full-history recompute. The oracle computes
    // the full aggregate directly, so the green row PROVES
    // incremental ≡ full (sums/counts are decomposable; the mean is
    // derived at read time, exactly like map-side partials)
    "u11_incremental_agg" -> ((s, d) => {
      val cut = lit("2024-01-15").cast("date")
      def part(f: DataFrame) = f.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))
      // null-ts rows route to the DELTA side (coalesce'd predicate) so the
      // union covers every row exactly once, like the oracle's full agg
      val state = part(ev(s, d).filter(to_date(col("ts")) < cut))
      val delta = part(ev(s, d).filter(
        coalesce(to_date(col("ts")) >= cut, lit(true))))
      state.unionByName(delta)
        .groupBy("user_id", "event_type")
        .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"))
        .withColumn("mean_value",
          round(col("sum_cents").cast("double") / col("n") / 100.0, 6))
    }),

    // as-of BACKWARD join via the union-LOCF trick: tag both streams,
    // union, ONE per-user sort, last-reference-carried-forward — the
    // trades×quotes as-of without any join node (j11 is the interval
    // variant; this is the unbounded-lookback one, windowed exactly like
    // ffill so the big side never shuffles twice)
    "j21_asof_backward" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("__side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val refs = ev(s, d).filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(0).as("__side"), col("ts").as("__ref_ts"))
      val pts = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(1).as("__side"), lit(null).cast("timestamp").as("__ref_ts"))
      refs.unionByName(pts)
        .withColumn("asof_signup_ts",
          last(col("__ref_ts"), ignoreNulls = true).over(w))
        .filter(col("__side") === 1)
        .select(col("event_id"), col("asof_signup_ts"))
    }),

    // Cronbach's alpha over the three binary order labelers — internal-
    // consistency reliability (the psychometrics face of the a34/a38
    // family); item and total variances from exact integer sums
    "a39_cronbach_alpha" -> ((s, d) => {
      val items = ord(s, d).select(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("__i1"),
        when(col("o_totalprice") > 150000, 1L).otherwise(0L).as("__i2"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("__i3"))
        .withColumn("__t", col("__i1") + col("__i2") + col("__i3"))
      val dec = (c: Column) => c.cast("decimal(38,0)")
      val agg = items.agg(
        count(lit(1)).as("n"),
        sum(dec(col("__i1"))).as("__s1"), sum(dec(col("__i1")) * col("__i1")).as("__q1"),
        sum(dec(col("__i2"))).as("__s2"), sum(dec(col("__i2")) * col("__i2")).as("__q2"),
        sum(dec(col("__i3"))).as("__s3"), sum(dec(col("__i3")) * col("__i3")).as("__q3"),
        sum(dec(col("__t"))).as("__st"), sum(dec(col("__t")) * col("__t")).as("__qt"))
      def v(q: Column, sc: Column) =
        (col("n") * q - sc * sc).cast("double")
      agg.select(col("n"),
        round(lit(1.5) * (lit(1.0) -
          (v(col("__q1"), col("__s1")) + v(col("__q2"), col("__s2")) +
            v(col("__q3"), col("__s3"))) / v(col("__qt"), col("__st"))), 6)
          .as("alpha"))
    }),

    // three-rater Fleiss kappa over the cheap order labelers (priority /
    // price / status votes melted to the long frame) — a34's multi-rater
    // generalization, exact integer algebra
    "a38_fleiss_kappa" -> ((s, d) =>
      AssociationOps.fleissKappa(
        ord(s, d).select(col("o_orderkey"),
          expr("stack(3, " +
            "case when o_orderpriority in ('1-URGENT','2-HIGH') " +
            "then 'high' else 'low' end, " +
            "case when o_totalprice > 150000 then 'high' else 'low' end, " +
            "case when o_orderstatus = 'F' then 'high' else 'low' end" +
            ") as vote")),
        col("o_orderkey"), col("vote"), raters = 3)),

    // degree assortativity of the strong part co-occurrence graph — do
    // hub parts co-purchase with hubs; exact integer Pearson over
    // symmetrized endpoint degrees
    "g05_assortativity" -> ((s, d) =>
      GraphOps.assortativity(partEdges(s, d).filter(col("cnt") >= 2),
        "src", "dst")),

    // stratified k-fold: ONE exchange-parallel global row_number over
    // (stratum, content-hash) — each stratum's ranks are contiguous, so
    // rank mod k round-robins WITHIN every stratum (balanced ±1) without
    // a per-stratum window (5 strata would mean 5 data-sized tasks)
    "ml18_stratified_kfold" -> ((s, d) =>
      RankOps.globalRowNumber(ord(s, d),
          Seq(col("o_orderpriority").asc,
            md5(col("o_orderkey").cast("string")).asc, col("o_orderkey").asc),
          "__rn")
        .withColumn("fold", (col("__rn") % 5).cast("int"))
        .select("o_orderkey", "o_orderpriority", "fold")),

    // running-peak drawdown per user purchase stream (worst dip from the
    // high-water mark — the stability metric for any cumulative signal);
    // integer cents, one keyed sort + one agg
    "w17_drawdown" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d).filter(col("event_type") === "purchase")
        .withColumn("__c", round(col("value") * 100, 0).cast("long"))
        .withColumn("__peak", max(col("__c")).over(w))
        .groupBy("user_id")
        .agg(max(col("__peak") - col("__c")).as("max_drawdown_cents"),
          max(col("__c")).as("peak_cents"))
    }),

    // RFM segmentation: recency/frequency/monetary quintiles per user —
    // the classic customer scoring. Quintiles come from three
    // exchange-parallel global row_numbers (never an NTILE's
    // single-partition window) with the closed-form bucket
    // floor((rank−1)·5/n)+1, identical in both engines
    "q08_rfm" -> ((s, d) => {
      val base = ev(s, d).filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(
          datediff(lit("2024-02-01").cast("date"), max(to_date(col("ts"))))
            .as("recency_days"),
          count(lit(1)).as("frequency"),
          sum(round(col("value") * 100, 0).cast("long")).as("monetary_cents"))
      val cnt = base.agg(count(lit(1)).as("__n"))
      val ranked = RankOps.globalRowNumber(
        RankOps.globalRowNumber(
          RankOps.globalRowNumber(base,
            Seq(col("recency_days").asc, col("user_id").asc), "__rr"),
          Seq(col("frequency").desc, col("user_id").asc), "__rf"),
        Seq(col("monetary_cents").desc, col("user_id").asc), "__rm")
      ranked.crossJoin(broadcast(cnt))
        .withColumn("r_score",
          (expr("((__rr - 1) * 5) div __n") + 1).cast("int"))
        .withColumn("f_score",
          (expr("((__rf - 1) * 5) div __n") + 1).cast("int"))
        .withColumn("m_score",
          (expr("((__rm - 1) * 5) div __n") + 1).cast("int"))
        .withColumn("segment",
          col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .select("user_id", "recency_days", "frequency", "monetary_cents",
          "r_score", "f_score", "m_score", "segment")
    }),

    // paired before/after shift test: Wilcoxon signed-rank over the
    // line-1 vs line-2 price difference within each order (cents-exact
    // ranks, zero diffs dropped per convention)
    "a37_wilcoxon" -> ((s, d) => {
      val pairs = li(s, d).groupBy(col("l_orderkey")).agg(
        max(when(col("l_linenumber") === 1,
          round(col("l_extendedprice") * 100, 0).cast("long"))).as("__p1"),
        max(when(col("l_linenumber") === 2,
          round(col("l_extendedprice") * 100, 0).cast("long"))).as("__p2"))
        .filter(col("__p1").isNotNull && col("__p2").isNotNull)
      RegressionOps.wilcoxonSignedRank(pairs, col("__p1") - col("__p2"))
    }),

    // top order-3 event paths per user stream (the product-analytics
    // "what do users do next" view): two leads off ONE keyed sort, a
    // bounded path aggregate, deterministic top-20
    "q07_top_paths" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .withColumn("__e2", lead(col("event_type"), 1).over(w))
        .withColumn("__e3", lead(col("event_type"), 2).over(w))
        .filter(col("__e3").isNotNull)
        .groupBy(concat_ws(">", col("event_type"), col("__e2"), col("__e3"))
          .as("path"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path").asc)
        .limit(20)
    }),

    // multiset difference (EXCEPT ALL): per-key surplus copies survive —
    // the bag semantics reconciliation ops need (u04's distinct EXCEPT
    // loses multiplicities); one hash-agg-shaped anti count per engine
    "u10_except_all" -> ((s, d) =>
      li(s, d).select(col("l_suppkey"))
        .exceptAll(li(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_suppkey")))),

    // keyset pagination: the at-depth page fetch that stays O(page) at
    // any offset — tuple-cursor predicate + TakeOrderedAndProject (an
    // OFFSET scan pays the whole prefix; the cursor predicate pushes
    // down to the parquet scan)
    "o06_keyset_page" -> ((s, d) =>
      ord(s, d)
        .filter(col("o_orderdate") > lit("1994-01-01").cast("date") ||
          (col("o_orderdate") === lit("1994-01-01").cast("date") &&
            col("o_orderkey") > 5000))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_orderdate", "o_totalprice")),

    // frequency-weighted exact median per group: Spark's percentile with
    // an integral frequency column — no row expansion; the oracle
    // expands copies and medians, proving the weighted form
    "a36_weighted_median" -> ((s, d) =>
      li(s, d).groupBy(col("l_returnflag"))
        .agg(round(percentile(col("l_extendedprice"), lit(0.5),
          col("l_linenumber")), 6).as("w_median"))),

    // classical decomposition per reading: hour-of-week seasonal
    // baseline + trailing-25-row exact-median trend + residual —
    // broadcast profile probe + one keyed sort, nothing else
    "ts12_decompose" -> ((s, d) =>
      TimeSeriesOps.seasonalDecompose(ev(s, d), "event_type", "ts",
        "event_id", col("value"), trendK = 25)),

    // first principal component: driver-side INTEGER power iteration over
    // the bounded covariance matrix (fixed start, fixed 30 matvecs, L∞
    // normalization, sign pin — every step exact or one correctly-rounded
    // double op), distributed exact-decimal projection. FULLY hash-oracled:
    // the DuckDB oracle unrolls the same 30 matvecs as chained CTEs over
    // the v09 covariance CTE (see v10OracleSql)
    "v10_pca_project" -> ((s, d) =>
      RegressionOps.pcaProjectFrom(emb(s, d), "vec_id", col("embedding"),
        iters = 30, covFrame = embCov(s, d))),

    // the oracled sibling: projection onto a FIXED rational axis
    // w_j = ((37j mod 19) − 9)/10 — same codegen'd fold, closed-form SQL
    "v10b_project_fixed" -> ((s, d) => {
      val axis = array((0 until 64).map(j =>
        lit(((j * 37) % 19 - 9) / 10.0)): _*)
      emb(s, d).select(col("vec_id"),
        round(graft.functions.VectorFns.dot(
          graft.functions.VectorFns.toDoubleArr(col("embedding")), axis), 6)
          .as("proj"))
    }),

    // dedupe-merge across replica feeds: per content fingerprint keep the
    // best replica by (en-language, length, id) priority — the cross-
    // source canonicalization staple; partition-keyed window, no global
    // sort
    "u09_best_replica" -> ((s, d) => {
      val w = Window.partitionBy(col("__fp")).orderBy(
        when(col("lang") === "en", 0).otherwise(1).asc,
        col("n_chars").desc, col("doc_id").asc)
      docs(s, d)
        .withColumn("__fp", TextFns.fingerprint(col("text")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("__fp").as("fp"), col("doc_id"), col("lang"),
          col("n_chars"))
    }),

    // z-order clustering key over (user, day) — the multi-dim
    // data-skipping layout; pure shift/mask arithmetic, engine-exact
    "s14_zorder" -> ((s, d) =>
      ev(s, d).select(col("event_id"),
        graft.functions.ZOrder.zValue2(col("user_id"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
            .cast("long")).as("zval"))),

    // daily-volume control chart: 3σ limits from exact integer sums —
    // the row-count anomaly monitor every ingest pipeline runs first
    "dq09_control_chart" -> ((s, d) => {
      val daily = ev(s, d).groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val stats = daily.agg(count(lit(1)).as("__k"),
        sum(col("n")).as("__s"), sum(col("n") * col("n")).as("__ss"))
      val mu = col("__s").cast("double") / col("__k")
      val sd = sqrt((col("__k") * col("__ss") - col("__s") * col("__s"))
        .cast("double") / (col("__k") * (col("__k") - 1)))
      daily.crossJoin(broadcast(stats))
        .select(col("day"), col("n"),
          round(mu, 6).as("mu"), round(sd, 6).as("sigma"),
          (abs(col("n") - mu) > lit(3.0) * sd).as("out_of_control"))
    }),

    // schema'd JSON ingestion (from_json, not regex): the typed parse of
    // a semi-structured column — f15's regex sibling done properly
    "f32_json_parse" -> ((s, d) =>
      Tables.spread(ev(s, d).select("event_id", "props"), tinyBytes = 0L)
        .select(col("event_id"),
          from_json(col("props"), "k INT", Map.empty[String, String])
            .getField("k").as("k_val"))),

    // the dataset card: corpus-level manifest (docs, tokens, language
    // mix, exact-dup rate) as one stacked metric/value frame — the
    // stats block every released training set ships with
    "ml17_dataset_card" -> ((s, d) =>
      docs(s, d).select(col("lang"), col("n_chars"),
          size(TextFns.tokens(col("text"))).cast("long").as("__tok"),
          TextFns.fingerprint(col("text")).as("__fp"))
        .agg(
          count(lit(1)).as("__nd"),
          sum(col("__tok")).as("__nt"),
          sum(col("n_chars")).as("__nc"),
          countDistinct(col("lang")).as("__nl"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("__ne"),
          countDistinct(col("__fp")).as("__nu"))
        .select(expr(
          "stack(7, " +
            "'10_n_docs', cast(__nd as double), " +
            "'20_n_tokens', cast(__nt as double), " +
            "'30_n_chars', cast(__nc as double), " +
            "'40_n_langs', cast(__nl as double), " +
            "'50_pct_en', round(__ne / cast(__nd as double), 6), " +
            "'60_dup_rate', round(1.0 - __nu / cast(__nd as double), 6), " +
            "'70_mean_tokens', round(__nt / cast(__nd as double), 6)" +
            ") as (metric, value)"))),

    // McNemar's paired χ²: do the two cheap labelers DIFFER on the same
    // orders (a35 is a34's hypothesis-test companion) — discordant
    // counts + continuity-corrected statistic, one aggregate
    "a35_mcnemar" -> ((s, d) =>
      MetricsOps.mcnemar(ord(s, d),
        col("o_orderstatus") === "F",
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        col("o_totalprice") > 150000)),

    // lag-1..3 autocorrelation of each user's value stream (integer
    // cents ⇒ exact Pearson stats; stacked lags share one sorted window)
    "ts11_autocorr" -> ((s, d) =>
      TimeSeriesOps.autocorr(
        ev(s, d).select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100, 0).cast("long").as("__cents")),
        "user_id", "ts", "event_id", col("__cents"), maxLag = 3)),

    // LSH banding quality audit: candidate pairs vs exact-Jaccard truth
    // at the d03 dials — the recall/precision report that tunes
    // (k, bands) before a full-corpus run
    "d16_lsh_recall" -> ((s, d) =>
      DedupOps.lshRecallEval(docs(s, d), "doc_id", "text",
        shingleN = 3, k = 12, bands = 6, threshold = 0.5)),

    // code-vs-prose gate: structural-symbol and digit densities per doc
    // (the code-filtering signal of a corpus curator) — single codegen'd
    // projection, no joins
    "t29_code_detect" -> ((s, d) =>
      docs(s, d).select(col("doc_id"), col("n_chars"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[{}()\\[\\];=<>]", "")))
          .cast("long").as("n_sym"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("n_digit"))
        .withColumn("sym_ratio",
          round(col("n_sym").cast("double") / col("n_chars"), 6))
        .withColumn("is_code", col("sym_ratio") > 0.02)
        .drop("n_chars")),

    // lexical diversity per doc: type-token ratio and its length-robust
    // root form — the vocabulary-richness quality signal
    "t30_lexical_diversity" -> ((s, d) =>
      Tables.spread(docs(s, d).select("doc_id", "text"), tinyBytes = 0L)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("__t"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("__t")).as("n_types"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
          round(col("n_types").cast("double") / sqrt(col("n_tokens")), 6)
            .as("rttr"))),

    // trailing-12-row correlation of each user's purchase values against
    // the clock — the rolling trend detector; six frame sums, one sort
    "w16_rolling_corr" -> ((s, d) =>
      WindowOps.rollingCorr(
        ev(s, d).filter(col("event_type") === "purchase")
          .withColumn("__sec",
            expr("unix_micros(ts) div 1000000") - 1704067200L),
        Seq("user_id"), Seq("ts", "event_id"),
        col("__sec"), col("value"), k = 12, "roll_corr")
        .select(col("event_id"), col("roll_corr"))),

    // a15's AUROC with its DeLong standard error and 95% CI — integer
    // placement-value moments from ONE pinned cumsum over the
    // distinct-score frame
    "a33_auroc_delong" -> ((s, d) =>
      MetricsOps.aurocDeLong(ord(s, d), col("o_totalprice"),
        when(col("o_orderstatus") === "F", 1).otherwise(0))),

    // chance-corrected agreement between two cheap labelers (priority-
    // derived vs price-derived "high/low") — exact integer kappa algebra
    "a34_cohens_kappa" -> ((s, d) =>
      AssociationOps.cohensKappa(ord(s, d),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
          .otherwise("low"),
        when(col("o_totalprice") > 150000, "high").otherwise("low"))),

    // per-user calendar coverage: active days / span, largest silence gap
    // — the "is this source still reporting" freshness scorecard
    "dq08_completeness" -> ((s, d) =>
      TimeSeriesOps.activityCompleteness(ev(s, d), "user_id", "ts")),

    // 24h view→purchase conversion funnel per day: for each view, is
    // there a purchase by the same user at-or-within 24h after — a
    // range-frame window (numeric µs axis), never a views×purchases join
    "q06_conversion_24h" -> ((s, d) => {
      val base = ev(s, d).select(col("user_id"), col("event_type"),
        col("ts"), unix_micros(col("ts")).as("__us"))
      val w = Window.partitionBy("user_id").orderBy(col("__us"))
        .rangeBetween(Window.currentRow, 24L * 3600 * 1000000)
      base
        .withColumn("__p",
          min(when(col("event_type") === "purchase", col("__us"))).over(w))
        .filter(col("event_type") === "view")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_views"),
          sum(when(col("__p").isNotNull, 1L).otherwise(0L)).as("n_converted"))
    }),

    // ---------------- composed §3 pipeline (end-to-end under the gate) ----
    // VERDICT r7 #3: the CohortExtractor → FeatureExtractor →
    // TimeSeriesGenerator chain hash-matched as ONE query each, so a wrong
    // interaction BETWEEN stages (not just within one) fails the gate.
    // Reference trace: day_intervals_cohort.py:252-370 →
    // feature_selection_icu.py:32-62 → data_generation_icu.py:441-729.

    // stage-1 composition: visits×patients join + adult filter + mortality
    // interval label (CohortConfig defaults — the mainPipeline cell-4 path)
    "e2e_cohort_mortality" -> ((s, d) =>
      e2eCohort(s, d).select("hadm_id", "subject_id", "label")),

    // the OVERLAPPING-visits readmission route through the facade: the
    // all-later-visits scan with the reference's admit_j > disch_i guard
    // (day_intervals_cohort.py:158-161) — strictOverlap=true branch
    "e2e_cohort_readmit30" -> ((s, d) =>
      api.CohortExtractor.extract(visitsT(s, d), patientsT(s, d),
          api.CohortConfig(task = api.Readmission(30, strictOverlap = true)))
        .select("hadm_id", "subject_id", "label")),

    // the length-of-stay label branch (day_intervals_cohort.py:114-133):
    // 1 iff the visit lasts ≥ 7 days — interval-typed threshold compare
    "e2e_cohort_los7" -> ((s, d) =>
      api.CohortExtractor.extract(visitsT(s, d), patientsT(s, d),
          api.CohortConfig(task = api.LengthOfStay(7)))
        .select("hadm_id", "subject_id", "label")),

    // the composed disease-phenotype branch (day_intervals_cohort.py:
    // 37-40,342-347 over disease_cohort.py:75-91): fabricated diagnoses
    // (lineitem) → ICD-9→10 root map (nation, the e2e_icd_map frames) →
    // root-contains("M1") keep-list → visit pool semi-filtered BEFORE the
    // readmission-30 labeling (so only disease readmissions count) and
    // re-filtered after — the full extract_data(disease_label=…) path
    // under one hash oracle
    "e2e_cohort_phenotype" -> ((s, d) => {
      val diag = li(s, d).select(
        col("l_orderkey").as("hadm_id"),
        concat(lit("C"), lpad((col("l_partkey") % 500).cast("string"), 3,
          "0")).as("icd_code"),
        (when(col("l_partkey") % 2 === 0, 9).otherwise(10))
          .as("icd_version"))
      val mapping = nat(s, d).select(
        concat(lit("C"), lpad(col("n_nationkey").cast("string"), 2, "0"),
          lit("X")).as("diagnosis_code"),
        concat(lit("M"), col("n_nationkey").cast("string")).as("icd10cm"),
        col("n_nationkey").as("map_order"))
      val ids = api.CohortExtractor.diseaseVisits(diag, "hadm_id",
        "icd_code", "icd_version", mapping, "diagnosis_code", "icd10cm",
        "map_order", "M1")
      api.CohortExtractor.extractPhenotype(visitsT(s, d), patientsT(s, d),
          api.CohortConfig(task = api.Readmission(30, strictOverlap = true)),
          ids)
        .select("hadm_id", "subject_id", "label")
    }),

    // FeatureExtractor.standardizeIcd through the facade: 3-char-root
    // first-match map for version-9 codes, version-10 passthrough
    // (hosp_preprocess_util.py:402-430) — fabricated codes/mapping from
    // harness tables, pure integer/string arithmetic both sides
    "e2e_icd_map" -> ((s, d) => {
      val diag = ord(s, d).select(
        col("o_orderkey").as("hadm_id"),
        concat(lit("C"), lpad((col("o_orderkey") % 500).cast("string"), 3,
          "0")).as("icd_code"),
        (when(col("o_orderkey") % 2 === 0, 9).otherwise(10))
          .as("icd_version"))
      val mapping = nat(s, d).select(
        concat(lit("C"), lpad(col("n_nationkey").cast("string"), 2, "0"),
          lit("X")).as("diagnosis_code"),
        concat(lit("M"), col("n_nationkey").cast("string")).as("icd10cm"),
        col("n_nationkey").as("map_order"))
      api.FeatureExtractor.standardizeIcd(diag, "icd_code", "icd_version",
          mapping, "diagnosis_code", "icd10cm", "map_order")
        .select("hadm_id", "icd_code", "icd_version", "root_icd10")
    }),

    // DrugMapper through the facade END-TO-END — the last lifecycle branch
    // (hosp_preprocess_util.py:195-273): name normalize → prescription NDC
    // 11-digit pad + 9-digit section keep → mapping-table 5-4 reformat →
    // keep-first dedup → inner brand→generic join (broadcast: the NDC
    // directory is a bounded dimension) → EPC class arrays. Fabricated
    // prescriptions carry nulls (dropped by the join, as the reference's
    // nan rows are) and the mapping carries REAL (new_ndc, name) dup rows
    // so the keep-first dedup is load-bearing, not decorative.
    "e2e_drug_map" -> ((s, d) => {
      val meds = ord(s, d).select(
        col("o_orderkey").as("hadm_id"),
        concat(lit("  "), col("o_orderpriority"), lit(" TAB ")).as("drug"),
        when(col("o_orderkey") % 7 === 0, lit(null).cast("long"))
          .otherwise((col("o_orderkey") % 999) * 1000000L +
            ((col("o_orderkey") * 7) % 9999) * 100L + col("o_orderkey") % 100)
          .as("ndc"))
      val map0 = prt(s, d).select(
        concat((col("p_partkey") % 999).cast("string"), lit("-"),
          ((col("p_partkey") * 7) % 9999).cast("string")).as("productndc"),
        when(col("p_partkey") % 11 === 0, lit(null).cast("string"))
          .otherwise(col("p_name")).as("nonproprietaryname"),
        concat(col("p_type"), lit(" [EPC],"), col("p_size").cast("string"),
          lit(" [PE],"), col("p_brand"), lit(" [EPC]")).as("pharm_classes"),
        col("p_partkey").as("map_order"))
      // duplicate every mapping row with a later order and a decoy class:
      // a correct keep-first dedup must pick the original
      val mapping = map0.unionAll(map0
        .withColumn("map_order", col("map_order") + 10000L)
        .withColumn("pharm_classes", lit("DECOY [EPC]")))
      api.DrugMapper.mapMeds(meds, "drug", "ndc", mapping, "productndc",
          "nonproprietaryname", "pharm_classes", "map_order")
        .select(col("hadm_id"), col("drug"), col("new_ndc"),
          col("nonproprietaryname"),
          array_join(col("epc"), "|").as("epc_list"))
    }),

    // stages 1+2: cohort semi-join + admit attach + floor-hour offsets +
    // pre-admit drop, then UOM dominance cleanup and per-code exact type-7
    // percentile clamp — the feature_icu cleaning chain end-to-end
    "e2e_features_clean" -> ((s, d) =>
      api.FeatureExtractor.cleanMeasurements(e2eEvents(s, d),
          "itemid", "uom", "val_cents", 0.5, 0.02, 0.98)
        // output stays in CENTS: the clamp bound is vl + f·(vh−vl) with f
        // on the 0.02 grid, so cent values have 2 decimals — rounding at 4
        // keeps every value ≫ the 1e-9 double error away from a half
        // boundary (a /100 + round-2 would land bounds exactly ON .xx5)
        .select(col("hadm_id"), col("itemid"), col("event_offset_h"),
          col("uom"), round(col("val_cents"), 4).as("val_clamped"))),

    // stages 1+2+3: the chain above + FeatureSelector top-25 code keep-list
    // + 24h bucketize over the first 30 days + densify to the full grid +
    // the reference's exact ffill→bfill→mean impute order — the final
    // dataDic tensor content as a tall hash-checkable frame
    "e2e_stay_tensors" -> ((s, d) => {
      val ev2 = e2eEvents(s, d)
      val keep = ev2.groupBy("itemid").agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("itemid").asc).limit(25)
        .select("itemid")
      val sel = api.FeatureSelector.select(ev2, "itemid", keep)
      val bucketed = api.TimeSeriesGenerator.bucketedFeatures(sel,
        "hadm_id", "event_offset_h", "itemid", "val_cents",
        includeH = 720, bucketH = 24)
      api.TimeSeriesGenerator.densifyAndImpute(bucketed, "hadm_id", "itemid",
          nBuckets = 30)
        .select(col("hadm_id"), col("itemid"), col("bucket"),
          round(col("value_imputed") / 100.0, 4).as("val_imputed"))
    }),

    // the Generator's mortality-branch ELIGIBILITY gate: los >= include +
    // predW reserves the 48 h label window after the 72 h input window
    // (reference mortality_length, data_generation_icu.py:172-206) — the
    // first-window clip plus the gate, through the densify+impute tail
    "e2e_stay_tensors_mortality" -> ((s, d) => {
      val ev2 = e2eEvents(s, d)
      val keep = ev2.groupBy("itemid").agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("itemid").asc).limit(25)
        .select("itemid")
      val sel = api.FeatureSelector.select(ev2, "itemid", keep)
      val los = e2eCohort(s, d).select(col("hadm_id"),
        floor((unix_timestamp(col("dischtime")) -
          unix_timestamp(col("admittime"))) / 3600L).as("los_h"))
      val bucketed = api.TimeSeriesGenerator.bucketedFeatures(sel,
        "hadm_id", "event_offset_h", "itemid", "val_cents",
        los, "los_h", includeH = 72, bucketH = 24,
        window = api.FirstWindow(predWindowH = 48))
      api.TimeSeriesGenerator.densifyAndImpute(bucketed, "hadm_id", "itemid",
          nBuckets = 3)
        .select(col("hadm_id"), col("itemid"), col("bucket"),
          round(col("value_imputed") / 100.0, 4).as("val_imputed"))
    }),

    // the Generator's LAST-window (readmission) branch: stays of >= 72 h
    // keep their final 72 hours — offsets shift by -(los - 72) onto the
    // same [0, 72) grid, events before the shifted zero drop, shorter
    // stays are ineligible (reference readmission_length,
    // data_generation_icu.py:243-283) — then the e2e densify+impute tail
    "e2e_stay_tensors_readmit" -> ((s, d) => {
      val ev2 = e2eEvents(s, d)
      val keep = ev2.groupBy("itemid").agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("itemid").asc).limit(25)
        .select("itemid")
      val sel = api.FeatureSelector.select(ev2, "itemid", keep)
      val los = e2eCohort(s, d).select(col("hadm_id"),
        floor((unix_timestamp(col("dischtime")) -
          unix_timestamp(col("admittime"))) / 3600L).as("los_h"))
      val bucketed = api.TimeSeriesGenerator.bucketedFeatures(sel,
        "hadm_id", "event_offset_h", "itemid", "val_cents",
        los, "los_h", includeH = 72, bucketH = 24, window = api.LastWindow)
      api.TimeSeriesGenerator.densifyAndImpute(bucketed, "hadm_id", "itemid",
          nBuckets = 3)
        .select(col("hadm_id"), col("itemid"), col("bucket"),
          round(col("value_imputed") / 100.0, 4).as("val_imputed"))
    }),

    // the Generator's readmission MED-INTERVAL branch (reference
    // readmission_length meds, data_generation_icu.py:256-262): intervals
    // shift by -select_time, stop >= 0 keeps the straddling interval
    // (truncated — start < 0 clamps to 0), earlier ones drop; then the
    // smooth_meds bucket grid + W5 active mask. Fabricated intervals:
    // start = event offset mod 497 (a prime, so starts land densely
    // on BOTH sides of every select_time), stop = start + (itemid % 96
    // + 1) hours — pure integer arithmetic the oracle replays exactly;
    // at sf0.01 this hits all three branches (straddle-clamped, dropped,
    // kept-intact)
    "e2e_stay_tensors_readmit_meds" -> ((s, d) => {
      val ev2 = e2eEvents(s, d)
      val keep = ev2.groupBy("itemid").agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("itemid").asc).limit(25)
        .select("itemid")
      val meds = api.FeatureSelector.select(ev2, "itemid", keep)
        .select(col("hadm_id"), col("itemid"),
          (col("event_offset_h") % 497).as("start_h"),
          (col("event_offset_h") % 497 + (col("itemid") % 96 + 1)).as("stop_h"))
      val los = e2eCohort(s, d).select(col("hadm_id"),
        floor((unix_timestamp(col("dischtime")) -
          unix_timestamp(col("admittime"))) / 3600L).as("los_h"))
      val clipped = api.TimeSeriesGenerator.shiftClipIntervals(meds,
        "hadm_id", "start_h", "stop_h", los, "los_h",
        includeH = 72, window = api.LastWindow)
      api.TimeSeriesGenerator.activeMedSignal(clipped, "hadm_id", "itemid",
        "start_h", "stop_h", includeH = 72, bucketH = 24)
    }),

    // the mortality sibling (reference mortality_length meds,
    // data_generation_icu.py:186-189): los >= include + predW gate, keep
    // start <= include, clamp stop to include (the P12 least-clip) —
    // composed through the same bucket-grid active-mask tail as readmit
    "e2e_stay_tensors_mortality_meds" -> ((s, d) => {
      val ev2 = e2eEvents(s, d)
      val keep = ev2.groupBy("itemid").agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("itemid").asc).limit(25)
        .select("itemid")
      val meds = api.FeatureSelector.select(ev2, "itemid", keep)
        .select(col("hadm_id"), col("itemid"),
          (col("event_offset_h") % 497).as("start_h"),
          (col("event_offset_h") % 497 + (col("itemid") % 96 + 1)).as("stop_h"))
      val los = e2eCohort(s, d).select(col("hadm_id"),
        floor((unix_timestamp(col("dischtime")) -
          unix_timestamp(col("admittime"))) / 3600L).as("los_h"))
      val clipped = api.TimeSeriesGenerator.shiftClipIntervals(meds,
        "hadm_id", "start_h", "stop_h", los, "los_h",
        includeH = 72, window = api.FirstWindow(predWindowH = 48))
      api.TimeSeriesGenerator.activeMedSignal(clipped, "hadm_id", "itemid",
        "start_h", "stop_h", includeH = 72, bucketH = 24)
    }),

    // SAX discretization (Lin/Keogh symbolic aggregate approximation):
    // per-user daily-count series → 8 PAA segments (idx·8 div n keeps
    // ragged lengths exact) → z-normalized segment means from exact
    // integer (n, Σx, Σx²) → 4-letter Gaussian-breakpoint alphabet.
    // Every float is derived from exact integers by mirrored IEEE ops, so
    // the symbols are bit-portable; a constant series z-scores to NaN,
    // which CASEs to 'd' identically on both engines
    "ts16_sax" -> ((s, d) => {
      val daily = ev(s, d).groupBy(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("user_id").orderBy(col("day"))
      val idx = daily.withColumn("__i", row_number().over(w).cast("long") - 1)
      val stats = daily.groupBy("user_id").agg(
        count(lit(1)).as("__n"), sum(col("cnt")).as("__sx"),
        sum(col("cnt") * col("cnt")).as("__sxx"))
      val segs = idx.join(stats, Seq("user_id"))
        .withColumn("seg_no", expr("__i * 8 div __n").cast("int"))
        .groupBy(col("user_id"), col("seg_no"), col("__n"), col("__sx"),
          col("__sxx"))
        .agg(sum(col("cnt")).as("__ss"), count(lit(1)).as("__sn"))
      val mu = col("__sx").cast("double") / col("__n")
      val sigma = sqrt((col("__n") * col("__sxx") -
        col("__sx") * col("__sx")).cast("double")) / col("__n")
      val z = (col("__ss").cast("double") / col("__sn") - mu) / sigma
      // σ = 0 (constant series) would z-score to NaN/±Inf whose bit
      // payloads aren't a cross-engine contract — NULL instead, guarded
      // on the exact integer variance numerator
      val degenerate = (col("__n") * col("__sxx") -
        col("__sx") * col("__sx")) === 0
      segs.select(col("user_id"), col("seg_no"),
        when(degenerate, lit(null).cast("double"))
          .otherwise(round(z, 6)).as("z_paa"),
        when(degenerate, lit(null).cast("string"))
          .when(z < -0.6745, "a").when(z < 0.0, "b").when(z < 0.6745, "c")
          .otherwise("d").as("symbol"))
    }),

    // best mean-shift changepoint per user over the daily event-count
    // series — CUSUM (ts07) flags THAT a drift happened; this localizes
    // WHERE: exact integer SSE-gain numerators, deterministic argmax
    "ts15_changepoint" -> ((s, d) =>
      TimeSeriesOps.bestChangepoint(
        ev(s, d).groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "user_id", col("day"), col("cnt"))),

    // per-source freshness lag: p50/p95 seconds behind the corpus
    // high-water mark — the DQ monitor for a multi-feed ingest; exact
    // type-7 quantiles via the sort-based groupQuantiles (no per-group
    // value buffer), reference ts = max(ts) so the query is deterministic.
    // Exact-vs-approx switch: swap groupQuantiles for the drop-in
    // groupQuantilesApprox (same schema, sketch partials, no per-group
    // sort) when this monitors 100 TB daily — ApproxSpec gates its bound
    "dq12_freshness_lag" -> ((s, d) => {
      val ref = ev(s, d).agg(max(col("ts")).as("__ref"))
      val lags = ev(s, d).crossJoin(broadcast(ref))
        .select(col("event_type"),
          (unix_micros(col("__ref")) - unix_micros(col("ts"))).as("__lag"))
      val n = lags.groupBy("event_type").agg(count(lit(1)).as("n"))
      CleaningOps.groupQuantiles(lags, "event_type", "__lag", 0.5, 0.95)
        .join(n, Seq("event_type"))
        .select(col("event_type"), col("n"),
          round(col("q_lo") / 1e6, 6).as("lag_p50_s"),
          round(col("q_hi") / 1e6, 6).as("lag_p95_s"))
    }),

    // length-bucketed batching: power-of-2 token buckets (CASE ladder —
    // no float log2 at a boundary), then capacity packing PER (source,
    // bucket) so batches hold similar-length sequences (padding-efficient
    // training batches; the ml04 cumsum pack, bucket-scoped)
    "ml19_length_buckets" -> ((s, d) => {
      val t = docs(s, d)
        .select(col("doc_id"), col("source"),
          size(TextFns.tokens(col("text"))).as("n_tokens"))
        .withColumn("len_bucket",
          when(col("n_tokens") <= 16, 16).when(col("n_tokens") <= 32, 32)
            .when(col("n_tokens") <= 64, 64)
            .when(col("n_tokens") <= 128, 128)
            .when(col("n_tokens") <= 256, 256).otherwise(512))
      FoldOps.packByCumsum(t, Seq("source", "len_bucket"), Seq("doc_id"),
          col("n_tokens"), capacity = 256)
        .select("doc_id", "source", "len_bucket", "n_tokens", "bin_id")
    }),

    // concentration/Pareto report: exact global deciles of per-user spend
    // (two-phase rank — no single-partition stage), per-decile share of
    // total cents — "do 10% of users drive 60% of revenue"
    "q10_pareto_share" -> ((s, d) => {
      val base = ev(s, d).filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("__cents"))
      val tot = base.agg(count(lit(1)).as("__n"),
        sum(col("__cents")).as("__tot"))
      RankOps.globalRowNumber(base,
          Seq(col("__cents").desc, col("user_id").asc), "__r")
        .crossJoin(broadcast(tot))
        .withColumn("decile", (expr("((__r - 1) * 10) div __n") + 1).cast("int"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_users"),
          sum(col("__cents")).as("cents"),
          round(sum(col("__cents")).cast("double") / max(col("__tot")), 6)
            .as("share"))
    }),

    // dedup report: near-dup cluster-size histogram (incl. the singleton
    // bucket via anti-join) — the "how much of the corpus is duplicated,
    // and in what clump sizes" summary every dedup run ships with
    "d18_cluster_sizes" -> ((s, d) => {
      val pairs = DedupOps.nearDupPairs(docs(s, d), "doc_id", "text",
        shingleN = 3, k = 12, bands = 6, threshold = 0.5)
      val comp = DedupOps.connectedComponents(pairs, "id_a", "id_b")
      val hist = comp.groupBy(col("canonical_id"))
        .agg(count(lit(1)).as("__sz"))
        .groupBy(col("__sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
      val singles = docs(s, d)
        .join(comp.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .agg(lit(1L).as("cluster_size"), count(lit(1)).as("n_clusters"))
      hist.unionByName(singles)
    }),

    // SemDeDup (Abbas et al. 2023): fixed-centroid coarse clustering
    // bounds the pairwise cosine search to within-cluster pairs; drop
    // every vector with a lower-id cluster-mate at sim ≥ 0.4. Assignment
    // reuses the v03b portable argmin; the threshold compare rides the
    // same raw-double cosine d06 proved engine-portable
    "d19_semdedup" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      DedupOps.semanticDedup(emb(s, d), "vec_id", "embedding",
        semCentroids, 0.4,
        simFn = (a, b) => call_function("cosine_sim", a, b))
    }),

    // as-of NEAREST (merge_asof direction='nearest'): union-LOCF gives the
    // last ref at-or-before, reverse-NOCB the first ref after, pick the
    // temporally closer (ties to the earlier) — still zero join nodes,
    // one keyed sort serving both directions
    "j22_asof_nearest" -> ((s, d) => {
      val wB = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("__side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("__side"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val refs = ev(s, d).filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(0).as("__side"), col("ts").as("__ref_ts"))
      val pts = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(1).as("__side"), lit(null).cast("timestamp").as("__ref_ts"))
      refs.unionByName(pts)
        .withColumn("__prev", last(col("__ref_ts"), ignoreNulls = true).over(wB))
        .withColumn("__next", first(col("__ref_ts"), ignoreNulls = true).over(wF))
        .filter(col("__side") === 1)
        .withColumn("asof_signup_ts",
          when(col("__next").isNull, col("__prev"))
            .when(col("__prev").isNull, col("__next"))
            .when(unix_micros(col("ts")) - unix_micros(col("__prev")) <=
              unix_micros(col("__next")) - unix_micros(col("ts")),
              col("__prev"))
            .otherwise(col("__next")))
        .select(col("event_id"), col("asof_signup_ts"))
    }),

    // cross-field invariant audit: the denormalized n_chars column vs the
    // recomputed LEN(text) — per-source mismatch counts and worst drift
    "dq14_field_consistency" -> ((s, d) =>
      docs(s, d).filter(col("text").isNotNull)
        .withColumn("__delta",
          abs(col("n_chars") - length(col("text"))).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(when(col("__delta") > 0, 1L).otherwise(0L)).as("n_mismatch"),
          max(col("__delta")).as("max_delta"),
          round(sum(when(col("__delta") > 0, 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("mismatch_rate"))),

    // template detection: share of docs whose first-20-token prefix is
    // shared with ≥1 other doc — boilerplate/template feeds jump out
    "t35_prefix_dup_rate" -> ((s, d) => {
      val pref = md5(array_join(slice(TextFns.tokens(col("text")), 1, 20),
        " "))
      val t = docs(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"), pref.as("__p"))
      val cnts = t.groupBy("__p").agg(count(lit(1)).as("__c"))
      t.join(cnts, Seq("__p"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__c") > 1, 1L).otherwise(0L)).as("n_templated"),
          round(sum(when(col("__c") > 1, 1L).otherwise(0L)).cast("double") /
            count(lit(1)), 6).as("templated_rate"))
    }),

    // winnowing fingerprint overlap (Schleimer et al. 2003, the MOSS
    // algorithm): 3-gram MD5s, 4-wide window minima, then the shared-
    // fingerprint pair report over the inverted index with the stop-
    // fingerprint df cap — position-robust partial-overlap detection at
    // ~2/(w+1) of the k-gram posting volume
    "t36_winnow_pairs" -> ((s, d) =>
      DedupOps.winnowSharedPairs(docs(s, d), "doc_id", "text",
        k = 3, w = 4, minShared = 2, maxDf = 50)),

    // Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty) —
    // the LM counterpart of t19's BM25; absent terms contribute the
    // smoothed background mass, per-term log contributions pinned to
    // integer picos before the per-doc sum (order-independent)
    "t37_qlm_topk" -> ((s, d) =>
      RetrievalOps.queryLikelihoodTopK(docs(s, d), "doc_id", "text",
        terms = Seq("spark", "window", "join"), k = 20, mu = 200.0)),

    // weekly null-rate trend per feed with a week-over-week jump flag —
    // the "did an upstream schema change silently null a column" monitor;
    // one aggregate + one lag window over the tiny weekly frame
    "dq13_null_trend" -> ((s, d) => {
      val wk = date_trunc("week", col("ts"))
      val base = ev(s, d).groupBy(col("event_type"), wk.as("week"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"))
        .withColumn("null_rate",
          round(col("n_null").cast("double") / col("n"), 6))
      val w = Window.partitionBy("event_type").orderBy(col("week"))
      base.withColumn("__prev", lag(col("null_rate"), 1).over(w))
        .withColumn("jumped",
          when(col("__prev").isNotNull && col("__prev") > 0 &&
            col("null_rate") > col("__prev") * 2, 1).otherwise(0))
        .select("event_type", "week", "n", "n_null", "null_rate", "jumped")
    }),

    // exact 7-day rolling active users WITHOUT a distinct-over-window:
    // each user's activity days become merged [d, d+6] islands (gap>6
    // starts a new one), islands explode to covered days, one count per
    // day — the scalable exact form of sliding-window COUNT(DISTINCT)
    "q09_wau" -> ((s, d) =>
      TimeSeriesOps.slidingDistinctCount(ev(s, d), "user_id",
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date")),
          window = 7)
        .withColumnRenamed("n_active", "wau")),

    // DAU/MAU stickiness per day — the canonical engagement ratio; MAU
    // rides the same exact gaps-and-islands sliding distinct as q09
    // (window 30), DAU is one distinct+count, ratio one division over
    // exact integers
    "q11_stickiness" -> ((s, d) => {
      val dayNum =
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
      val dau = ev(s, d)
        .select(col("user_id"), dayNum.cast("long").as("day_num"))
        .distinct()
        .groupBy("day_num").agg(count(lit(1)).as("dau"))
      val mau = TimeSeriesOps.slidingDistinctCount(ev(s, d), "user_id",
          dayNum, window = 30)
        .withColumnRenamed("n_active", "mau")
      dau.join(mau, Seq("day_num"))
        .select(col("day_num"), col("dau"), col("mau"),
          round(col("dau").cast("double") / col("mau").cast("double"), 6)
            .as("stickiness"))
    }),

    // audio-shaped multimodal path: payload bytes as little-endian PCM16,
    // 256-sample frames, per-frame RMS — exact integer Σs² per frame, one
    // sqrt; map-only, no shuffle (the VAD/loudness front end)
    "m06_pcm_energy" -> ((s, d) =>
      BinaryOps.pcmFrameEnergy(s,
        BinaryOps.withPayload(docs(s, d).filter(col("text").isNotNull),
          "text", "payload"),
        "doc_id", "payload", frameLen = 256).toDF()),

    // REAL WAV container on the audio path: payload bytes wrapped in a
    // RIFF/fmt/data PCM16 container, decoded back through
    // javax.sound.sampled (the m02 javax.imageio precedent), metadata
    // read off the container, m06's RMS front end over decoded samples
    "m12_wav_decode" -> ((s, d) =>
      BinaryOps.wavFrameEnergy(s,
        BinaryOps.withWavPayload(s,
          BinaryOps.withPayload(docs(s, d).filter(col("text").isNotNull),
            "text", "payload"),
          "doc_id", "payload", sampleRate = 16000),
        "doc_id", "wav", frameLen = 256).toDF()),

    // sample-rate conversion on the same real PCM path: linear resample
    // to 2/3 of the source rate (exact integer interpolation numerators),
    // then the m06 frame-RMS front end over the RESAMPLED stream — one
    // map-only pass, closed-form oracle over the source bytes
    "m08_resample_pcm" -> ((s, d) =>
      BinaryOps.pcmResampleEnergy(s,
        BinaryOps.withPayload(docs(s, d).filter(col("text").isNotNull),
          "text", "payload"),
        "doc_id", "payload", upP = 2, downQ = 3, frameLen = 256).toDF()),

    // GPT-2-style pre-tokenizer count: the contraction/letter-run/digit-run/
    // punct-run alternation (leftmost-first in BOTH Java regex and RE2) —
    // a far closer token-budget estimate than whitespace counting, still
    // one codegen'd map-only pass; ws count alongside for the ratio
    "t32_subword_count" -> ((s, d) => {
      val pat = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+" +
        "| ?[^\\sa-zA-Z0-9]+|\\s+"
      docs(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0)))
            .as("n_subtoks"),
          size(TextFns.tokens(col("text"))).as("n_ws_toks"))
    }),

    // REAL BPE subword counts: 10 greedy merges trained on the corpus
    // vocabulary (pair-count aggregate + 1-row top collect per round —
    // the GraphOps fixed-point pattern), then a broadcast-vocab second
    // pass; t32 stops at the pre-tokenizer, this applies the merges
    "t34_bpe_count" -> ((s, d) =>
      BpeOps.bpeTokenCounts(docs(s, d), "doc_id", "text", k = 10)),

    // tokenizer fertility per declared language: chars per real BPE
    // token off the t34 merge table — the multilingual context-budget
    // audit; one division over exact integer sums
    "ml22_tokenizer_fertility" -> ((s, d) =>
      BpeOps.tokenizerFertility(docs(s, d), "doc_id", "text",
        by = "lang", chars = col("n_chars"), k = 10)),

    // DPO-style preference-pair construction: per prompt group (source),
    // pair the best- and worst-scoring documents (integer lexical-
    // diversity score — exact, so the argmax/argmin need no float
    // tie-break) as (chosen, rejected); singleton groups drop out
    "ml20_preference_pairs" -> ((s, d) => {
      val t = docs(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          size(array_distinct(TextFns.tokens(col("text")))).cast("long")
            .as("score"))
      val wb = Window.partitionBy("source")
        .orderBy(col("score").desc, col("doc_id").desc)
      val ww = Window.partitionBy("source")
        .orderBy(col("score").asc, col("doc_id").asc)
      val r = t.withColumn("__rb", row_number().over(wb))
        .withColumn("__rw", row_number().over(ww))
      r.filter(col("__rb") === 1)
        .select(col("source"), col("doc_id").as("chosen_doc"),
          col("score").as("chosen_score"))
        .join(r.filter(col("__rw") === 1)
          .select(col("source"), col("doc_id").as("rejected_doc"),
            col("score").as("rejected_score")), Seq("source"))
        .filter(col("chosen_doc") =!= col("rejected_doc"))
        .withColumn("margin", col("chosen_score") - col("rejected_score"))
    }),

    // GRPO group-relative advantages: per-source groups, reward = token
    // count, advantage = reward − group mean, z = advantage/σ — exact
    // integer numerators/radicands in DECIMAL(38,0), one cast + √ +
    // division per engine (the Welch discipline)
    "ml21_group_advantage" -> ((s, d) =>
      FoldOps.groupAdvantage(
        docs(s, d).filter(col("text").isNotNull),
        "source", "doc_id",
        size(TextFns.tokens(col("text"))).cast("long"))),

    // the token-budget gate fed by REAL subword counts instead of
    // whitespace counts (ml06's 1.3-2× budget misestimate fixed): same
    // two-phase exact cumsum, cut at 12k BPE tokens
    "ml06b_bpe_budget" -> ((s, d) => {
      val t = BpeOps.bpeTokenCounts(docs(s, d), "doc_id", "text", k = 10)
        .join(docs(s, d).select("doc_id", "n_chars"), Seq("doc_id"))
      FoldOps.takeByBudget(t,
          Seq(col("n_chars").desc, col("doc_id").asc), col("n_bpe"),
          budget = 12000L, cumName = "cum_bpe")
        .select(col("doc_id"), col("n_bpe"),
          col("cum_bpe").cast("long").as("cum_bpe"))
    }),

    // SCD type-2 build from the event changelog: collapse no-change rows,
    // then [valid_from, valid_to) intervals via lead over the collapsed
    // set — the warehouse-dimension sibling of u08's changelog replay
    "u12_scd2_build" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      ev(s, d).select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("state"))
        .withColumn("__prev", lag(col("state"), 1).over(w))
        // null-safe collapse: a null state still opens/closes intervals
        // (<=> negation ≡ IS DISTINCT FROM, incl. the first row)
        .filter(!(col("state") <=> col("__prev")))
        .withColumn("valid_from", col("ts"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("is_current",
          when(col("valid_to").isNull, 1).otherwise(0))
        .select("user_id", "state", "valid_from", "valid_to", "is_current")
    }),

    // trailing-20 rolling z-score on integer cents: mean/variance from
    // EXACT window sums (nΣx² − S² integers), one double division — the
    // live anomaly score with no float-accumulation drift
    "w19_rolling_zscore" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-19, 0)
      val x = round(col("value") * 100, 0).cast("long")
      val base = ev(s, d).filter(col("value").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), x.as("__x"))
        .withColumn("__n", count(lit(1)).over(w))
        .withColumn("__s", sum(col("__x")).over(w))
        .withColumn("__ss", sum(col("__x") * col("__x")).over(w))
      base.select(col("event_id"),
        when(col("__n") >= 2 &&
          col("__n") * col("__ss") - col("__s") * col("__s") > 0,
          round((col("__n") * col("__x") - col("__s")).cast("double") /
            sqrt((col("__n") * col("__ss") - col("__s") * col("__s"))
              .cast("double") * col("__n") / (col("__n") - 1)), 6))
          .as("z"))
    }),

    // the LLM-side e2e sibling of e2e_stay_tensors: the FULL CorpusCurator
    // chain (quality gate → exact dedup → MinHash-LSH near dedup →
    // benchmark decontamination → pack) hash-checked as ONE query — wrong
    // stage interactions fail the gate. Benchmark = the %37 slice (the d09
    // convention); sample stage keeps 16/16 (no-op) by default config
    "e2e_corpus_curate" -> ((s, d) => {
      val bench = docs(s, d).filter(col("doc_id") % 37 === 0)
      api.CorpusCurator.curate(
          docs(s, d).filter(col("doc_id") % 37 =!= 0), bench)
        .select("doc_id", "source", "n_tokens", "bin_id")
    }),

    // Cochran-Armitage trend: does the F-status rate rise with the order
    // priority level? Five row-level integer sums, one aggregate, no
    // per-group frame — the order-aware sibling of the a27 chi-square
    "a42_trend_test" -> ((s, d) =>
      AssociationOps.cochranArmitage(ord(s, d),
        substring(col("o_orderpriority"), 1, 1).cast("long") - 1,
        when(col("o_orderstatus") === "F", 1L).otherwise(0L))),

    // deterministic Poisson-bootstrap 95% CI for the mean purchase value —
    // error bars for corpus-scale metrics without rand(): LCG weights on
    // (event_id, replica), exact integer replica sums, type-7 percentile
    "a41_bootstrap_ci" -> ((s, d) =>
      MetricsOps.bootstrapMeanCi(
        ev(s, d).filter(col("event_type") === "purchase" &&
          col("value").isNotNull),
        col("event_id"), round(col("value") * 100, 0).cast("long"))),

    // FK referential-integrity audit: orphan count + rate per declared
    // relationship in ONE left-join pass each (no crossJoin of counts);
    // the events→customer relation is genuinely violated in the harness
    // data, so the op proves it reports non-zero rates
    "dq11_referential_audit" -> ((s, d) => {
      def audit(nm: String, child: DataFrame, key: String,
          parent: DataFrame, pkey: String): DataFrame =
        child.select(col(key).as("__k"))
          .join(parent.select(col(pkey).as("__k")).distinct()
            .withColumn("__hit", lit(1)), Seq("__k"), "left")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
          .select(lit(nm).as("relation"), col("n_rows"), col("n_orphans"),
            round(col("n_orphans").cast("double") / col("n_rows"), 6)
              .as("orphan_rate"))
      audit("orders.custkey", ord(s, d), "o_custkey", cust(s, d), "c_custkey")
        .unionByName(audit("lineitem.partkey", li(s, d), "l_partkey",
          prt(s, d), "p_partkey"))
        .unionByName(audit("events.user_id", ev(s, d), "user_id",
          cust(s, d), "c_custkey"))
    }),

    // per-doc Unicode-class composition (letter/upper/digit/space/other
    // ratios) — the script-detection gate of a corpus curator; char-class
    // counts as length deltas of regexp strips, zero UDFs
    "t31_script_ratios" -> ((s, d) => {
      val t = col("text")
      val n = length(t)
      def cnt(cls: String) = n - length(regexp_replace(t, cls, ""))
      docs(s, d).filter(t.isNotNull && n > 0)
        .select(col("doc_id"),
          round(cnt("[a-zA-Z]").cast("double") / n, 6).as("letter_ratio"),
          round(cnt("[A-Z]").cast("double") / n, 6).as("upper_ratio"),
          round(cnt("[0-9]").cast("double") / n, 6).as("digit_ratio"),
          round(cnt("\\s").cast("double") / n, 6).as("space_ratio"),
          round(cnt("[^a-zA-Z0-9\\s]").cast("double") / n, 6)
            .as("other_ratio"))
    }),

    // HITS hubs/authorities over the directed event-type transition graph
    // (the pr01 edge list) — 3 unrolled supersteps, per-edge contributions
    // integer-pico quantized, L1 totals exact integer sums
    "g09_hits" -> ((s, d) => {
      val edges = TimeSeriesOps.transitionCounts(ev(s, d), "user_id", "ts",
        "event_id", "event_type")
      GraphOps.hits(edges, "from_state", "to_state", "cnt", iters = 3)
    }),

    // local clustering coefficient per brand node on the co-occurrence
    // graph — degree-ordered triangle enumeration scattered back to all
    // three corners; one exact-integer division per node
    "g10_clustering_coeff" -> ((s, d) =>
      GraphOps.localClusteringCoeff(
        brandEdges(s, d).filter(col("cnt") >= 20), "src", "dst")),

    // Gopher word-level quality rules (Rae et al. 2021 A1.1): five
    // per-doc heuristics + composite keep, one codegen'd map-only pass
    "t40_gopher_rules" -> ((s, d) =>
      QualityOps.gopherRules(docs(s, d), "doc_id", "text")),

    // CCNet perplexity gate (Wenzek et al. 2020): corpus-relative
    // head/middle/tail terciles of bigram-LM perplexity via the
    // two-phase exact global rank — no single-partition exchange
    "t39_ppl_buckets" -> ((s, d) =>
      QualityOps.perplexityBuckets(gramProf(s, d))),

    // DSIR hashed-bigram importance weights (Xie et al. 2023): target =
    // the English slice, raw = the whole corpus; per-bucket log ratios
    // nano-quantized so per-doc means are exact-integer closed
    "ml24_dsir_weights" -> ((s, d) =>
      QualityOps.dsirWeights(gramProf(s, d),
        docs(s, d).select(col("doc_id"),
          (col("lang") === "en").as("__tgt")), dim = 128)),

    // ExactSubstr duplication coverage (Lee et al. 2022): fraction of
    // each doc's tokens covered by a 5-gram occurring ≥2× corpus-wide;
    // equal-length spans make the interval union one lead() window
    "d21_dupspan_coverage" -> ((s, d) =>
      QualityOps.dupSpanCoverage(docs(s, d), "doc_id", "text", k = 5)),

    // TRUE ExactSubstr (Lee et al. 2022): arbitrary-length maximal
    // duplicated spans via the sorted-suffix neighborhood — candidate
    // positions from the d21 inverted index, 64-token suffix prefixes
    // globally ranked, adjacent-LCP = exact maximal duplicated length,
    // overlap-only island union per doc
    "d22_exactsubstr_spans" -> ((s, d) =>
      QualityOps.exactSubstrSpans(spanProf(s, d))),

    // cross-doc attribution of duplicated spans: rank-adjacent suffix
    // pairs with LCP >= 5 from different docs, normalized and grouped —
    // which pairs share verbatim material and their longest shared span
    "d23_dupspan_pairs" -> ((s, d) => spanProf(s, d).pairs),

    // cluster-level closure of d23: the adjacent-pair graph through d08's
    // connected components, so >=3-doc duplication clusters report every
    // member mutually attributed (rank adjacency alone only yields a
    // spanning set) — doc -> (cluster, size, longest shared span)
    "d25_dupspan_clusters" -> ((s, d) =>
      QualityOps.dupSpanClusters(spanProf(s, d))),

    // the keep-one scrub policy: the span-cluster representative (min
    // doc id) keeps its text, every other member is fully scrubbed —
    // one suffix rank feeds islands AND pairs, closure via d08
    "d26_span_scrub_keepone" -> ((s, d) =>
      QualityOps.exactSubstrScrubKeepOne(spanProf(s, d))),

    // span-level decontamination (the d09 split: every 37th doc is the
    // benchmark): eval docs sharing a verbatim >=5-token span with ANY
    // train doc, via the cluster closure so recall survives the
    // rank-adjacency spanning-set gap — per eval doc: train partners,
    // longest cluster span, contaminated flag
    "d27_span_decontaminate" -> ((s, d) => {
      // the eval marker is a pure function of doc_id, so it projects off
      // the profile's pinned token frame — the single-scan discipline
      // (PlanQualitySpec: no FileScan in the final plan) survives sharing
      val p = spanProf(s, d)
      QualityOps.spanDecontaminate(p,
        p.toks.select(col("doc_id"),
          (col("doc_id") % 37 === 0).as("__eval")))
    }),

    // the composed span-family report off the ONE shared profile: d22's
    // coverage numbers, d24's scrub count, d26's keep-one count + intact
    // verdict, and d25's cluster assignment joined per doc — hash-gating
    // the member INTERACTIONS (scrub keeps exactly n_toks − covered
    // positions; keep-one scrubs exactly the non-representatives of the
    // cluster closure; clusterless docs are their own singleton cluster)
    "e2e_span_family" -> ((s, d) => {
      val p = spanProf(s, d)
      val spans = QualityOps.exactSubstrSpans(p)
      val scrub = QualityOps.exactSubstrScrub(p)
        .select(col("doc_id"), col("n_kept").as("n_kept_scrub"))
      val keep1 = QualityOps.exactSubstrScrubKeepOne(p)
        .select(col("doc_id"), col("n_kept").as("n_kept_keepone"),
          col("kept_intact"))
      val clus = QualityOps.dupSpanClusters(p)
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      spans.join(scrub, Seq("doc_id"))
        .join(keep1, Seq("doc_id"))
        .join(clus, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks"), col("n_spans"),
          col("max_span"), col("covered_tokens"),
          col("n_kept_scrub"), col("n_kept_keepone"), col("kept_intact"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
          coalesce(col("cluster_size"), lit(1L)).as("cluster_size"))
    }),

    // binary-quantized two-stage ANN: sign-bit Hamming prune to 32
    // candidates (popcount over two packed words), exact cosine rerank
    // to top-5 — v01's contract at 1/32nd the scan bandwidth
    "v17_hamming_topk" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      Knn.hammingTopK(emb(s, d), emb(s, d).filter(col("vec_id") < 8),
        "vec_id", "embedding", cand = 32, k = 5,
        simFn = (a, b) => call_function("cosine_sim", a, b))
    }),

    // Jarque–Bera normality screen of account balances per nation —
    // exact DECIMAL(38,0) power sums, one closing double sequence
    "a49_jarque_bera" -> ((s, d) =>
      AssociationOps.jarqueBera(cust(s, d), col("c_nationkey"),
        round(col("c_acctbal") * 100, 0))
        .withColumnRenamed("grp", "c_nationkey")),

    // Brown–Forsythe variance-homogeneity test of balances across
    // nations — exact type-7 medians, integer |2x − 2·med| deviations,
    // fixed-point-pinned ANOVA sums
    "a51_brown_forsythe" -> ((s, d) =>
      AssociationOps.brownForsythe(cust(s, d), col("c_nationkey"),
        round(col("c_acctbal") * 100, 0))),

    // per-frame zero-crossing rate on the real PCM byte path — the
    // voiced/unvoiced twin of m06; mean-removed sign test kept exact by
    // multiplying through to (n·s−S) integers
    "m11_pcm_zcr" -> ((s, d) =>
      BinaryOps.pcmFrameZcr(s,
        BinaryOps.withPayload(docs(s, d).filter(col("text").isNotNull),
          "text", "payload"),
        "doc_id", "payload", frameLen = 256).toDF()),

    // composed FineWeb-style quality gate: Gopher rules ∧ CCNet
    // non-tail tercile → DSIR weights on the survivors → top-100 by
    // importance — the rule→LM→importance stack as ONE hash-gated chain
    "e2e_quality_gate" -> ((s, d) => {
      // ONE corpus scan for the whole composed gate: the Gopher rules
      // consume a pinned (doc_id, lang, text) frame, while the LM stages
      // (perplexity terciles, DSIR on survivors) are views over the
      // SHARED gram profile — the corpus is never re-exploded per stage,
      // asserted by PlanQualitySpec ("quality gate reads documents once")
      val base = docs(s, d).select("doc_id", "lang", "text")
        .localCheckpoint(false)
      val p = gramProf(s, d)
      val keepIds = QualityOps.gopherRules(base, "doc_id", "text")
        .filter(col("keep") === 1).select("doc_id")
        .join(QualityOps.perplexityBuckets(p)
          .filter(col("bucket") =!= "tail").select("doc_id"), Seq("doc_id"))
      val markers = base
        .select(col("doc_id"), (col("lang") === "en").as("__tgt"))
        .join(keepIds, Seq("doc_id"), "left_semi")
      QualityOps.dsirWeights(p, markers, dim = 128)
        .filter(col("dsir_w").isNotNull)
        .orderBy(col("dsir_w").desc, col("doc_id").asc)
        .limit(100)
        .select(col("doc_id"), col("n_bigrams"), col("dsir_w"))
    }),

    // Hosmer–Lemeshow calibration χ² over the a14 prob/label pair —
    // fixed-width bins, exact integer-micro expected counts, per-bin
    // terms nano-pinned before the ≤10-way sum
    "a53_hosmer_lemeshow" -> ((s, d) =>
      MetricsOps.hosmerLemeshow(li(s, d), col("l_discount") * 10.0,
        when(col("l_returnflag") === "R", 1).otherwise(0), bins = 10)),

    // entropy ℓ-diversity profile per (nation, segment) quasi-identifier
    // with the balance bracket as the sensitive attribute — distinct ℓ,
    // sensitive-distribution entropy, dominant-value share
    "dq16_l_diversity" -> ((s, d) =>
      PrivacyOps.lDiversityProfile(cust(s, d),
        Seq("c_nationkey", "c_mktsegment"),
        floor(col("c_acctbal") / 2000).cast("long"))),

    // directed-edge reciprocity of the event-type transition graph —
    // one semi-join of the distinct edge list against its transpose
    "g11_reciprocity" -> ((s, d) => {
      val edges = TimeSeriesOps.transitionCounts(ev(s, d), "user_id", "ts",
        "event_id", "event_type")
      GraphOps.reciprocity(edges, "from_state", "to_state")
    }),

    // per-lane embedding mean drift between the even and odd vec_id
    // halves — the embedding-space PSI; one posexplode scan, exact
    // DECIMAL sums per (lane, slice), d bounded rows out
    "dq17_embedding_drift" -> ((s, d) =>
      RegressionOps.embeddingMeanDrift(emb(s, d), "embedding",
        col("vec_id") % 2 === 1)),

    // DSIR's actual resampling step: importance weights → deterministic
    // Efraimidis–Spirakis weighted sample (w = e^dsir, priority ln(u)/w)
    // — TakeOrderedAndProject, no global sort
    "ml25_dsir_resample" -> ((s, d) => {
      val w = QualityOps.dsirWeights(gramProf(s, d),
          docs(s, d).select(col("doc_id"),
            (col("lang") === "en").as("__tgt")), dim = 128)
        .filter(col("dsir_w").isNotNull)
      FoldOps.weightedSample(w, col("doc_id"), exp(col("dsir_w")), n = 50)
        .withColumn("priority",
          round(FoldOps.weightedPriority(col("doc_id"), exp(col("dsir_w"))), 6))
        .select(col("doc_id"), col("dsir_w"), col("priority"))
    }),

    // MASE forecast backtest per user over daily activity counts: does
    // week-ago seasonality beat yesterday's-value persistence? Exact
    // integer MAE sums off one window sort, one ratio per entity
    "ts19_mase" -> ((s, d) => {
      val daily = ev(s, d).filter(col("ts").isNotNull)
        .groupBy(col("user_id"), to_date(col("ts")).as("__day"))
        .agg(count(lit(1)).as("__cnt"))
      TimeSeriesOps.maseBacktest(daily, "user_id", col("__day"),
        col("__cnt"), season = 7)
    }),

    // TextRank keywords (Mihalcea & Tarau 2004): PageRank over the
    // symmetrized adjacent-token co-occurrence graph, top-20 words —
    // the graph-centrality keyword extractor next to RAKE's (t26)
    // frequency heuristic; reuses the pr01 fixed-point machinery
    "t41_textrank" -> ((s, d) => {
      val pairs = docs(s, d)
        .select(explode(TextFns.rawShingles(
          TextFns.tokens(col("text")), 2)).as("__bg"))
        .select(substring_index(col("__bg"), " ", 1).as("a"),
          substring_index(col("__bg"), " ", -1).as("b"))
        .filter(col("a") =!= col("b"))
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
        .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      GraphOps.pageRank(edges, "src", "dst", "cnt",
          iters = 3, damping = 0.85)
        .orderBy(col("rank").desc, col("node").asc)
        .limit(20)
        .select(col("node").as("word"), col("rank"))
    }),

    // int8 scalar-quantization quality audit: top-5 over the
    // quantize→dequantize round trip vs exact brute top-5, recall per
    // query — "is 4× compression losing neighbors?" in one number
    "v18_int8_recall" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val e = emb(s, d)
      val deq = e
        .select(col("vec_id"), VectorFns.toDoubleArr(col("embedding")).as("__v"))
        .withColumn("__lo", array_min(col("__v")))
        .withColumn("__scale", (array_max(col("__v")) - col("__lo")) / 255.0)
        .select(col("vec_id"),
          transform(VectorFns.int8Quantize(col("__v"), col("__lo"),
              array_max(col("__v"))),
            q => col("__lo") + (q + 128).cast("double") * col("__scale"))
            .as("embedding"))
      val exact = Knn.bruteForceTopK(e, e.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5,
        simFn = (a, b) => call_function("cosine_sim", a, b))
      val approx = Knn.bruteForceTopK(deq, deq.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5,
        simFn = (a, b) => call_function("cosine_sim", a, b))
      Knn.recallAtK(exact, approx)
    }),

    // PQ codebook TRAINING (Jegou 2011 III.A): all 8 subspaces advance
    // jointly through 2 quantized Lloyd's supersteps (subspace as a
    // grouping column) — the trained counterpart of v08/v11's fixed
    // codebooks, fully oracled via the v03 trajectory-pinning contract
    "v19_pq_train" -> ((s, d) =>
      graft.ann.Pq.pqTrain(emb(s, d), "vec_id", "embedding",
        m = 8, subDim = 8, k = 16, iters = 2)),

    // char-trigram language ID (Cavnar–Trenkle family, add-1 multinomial
    // form): per-language models trained on the declared labels, every
    // doc scored under all languages with EXACT integer arithmetic,
    // declared-vs-predicted confusion out — the strong-audit sibling of
    // the t03/t33 stopword heuristic
    "t43_charngram_langid" -> ((s, d) =>
      QualityOps.charNgramLangIdFromCounts(charGramProf(s, d),
        "doc_id", "lang")),

    // per-doc lexical richness (Yule 1944): TTR, hapax ratio, Yule's K
    // from the frequency spectrum — two stacked hash aggregates, exact
    // integers into three closing divisions
    "t44_lexical_richness" -> ((s, d) =>
      QualityOps.lexicalRichness(docs(s, d), "doc_id", "text")),

    // Gopher repetition rules (Rae et al. 2021 Table A1, within-doc
    // half): top-bigram character fraction + duplicated-5-gram position
    // coverage + composite keep — per-doc hash aggregates only
    "t45_gopher_repetition" -> ((s, d) =>
      QualityOps.gopherRepetition(docs(s, d), "doc_id", "text")),

    // interpolated Kneser-Ney bigram LM (Kneser & Ney 1995, Chen &
    // Goodman 1998; fixed D = 0.75): continuation counts off the same
    // distinct-bigram frame, pico-pinned model logprobs, exact DECIMAL
    // per-doc sums — the modern-smoothing sibling of t28
    "t46_kneser_ney" -> ((s, d) =>
      SummaryOps.knBigramLogProb(gramProf(s, d), discount = 0.75)),

    // deterministic per-epoch global shuffle: position = exact two-phase
    // rank over (epoch, md5(epoch:id)) — reproducible training-data
    // order on any cluster size, no single-partition sort
    "ml26_epoch_shuffle" -> ((s, d) => {
      val base = docs(s, d)
        .select(col("doc_id"), explode(array(lit(0), lit(1))).as("epoch"))
        .withColumn("__key", md5(concat(col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string"))))
      val ranked = RankOps.globalRowNumber(base,
        Seq(col("epoch").asc, col("__key").asc, col("doc_id").asc), "__grn")
      val counts = base.groupBy("epoch").agg(count(lit(1)).as("__n"))
      val offs = counts.alias("a")
        .join(counts.alias("b"), col("b.epoch") < col("a.epoch"), "left")
        .groupBy(col("a.epoch").as("epoch"))
        .agg(coalesce(sum(col("b.__n")), lit(0L)).as("__off"))
      ranked.join(broadcast(offs), Seq("epoch"))
        .select(col("epoch"), col("doc_id"),
          (col("__grn") - col("__off")).as("position"))
    }),

    // the TRUE CCNet filter shape (Wenzek et al. 2020): a bigram LM
    // trained on the TARGET slice (English) scores the whole corpus,
    // side by side with the self-trained t28 score — delta > 0 reads
    // "more target-like than corpus-average"; unseen grams exercise the
    // add-1 floor via left joins
    "t42_domain_lm_delta" -> ((s, d) => {
      val p = gramProf(s, d)
      val target = SummaryOps.bigramLogProbAgainst(p,
          docs(s, d).filter(col("lang") === "en").select("doc_id"))
        .withColumnRenamed("avg_logprob", "lp_target")
        .select("doc_id", "n_bigrams", "lp_target")
      val self = SummaryOps.bigramLogProb(p)
        .withColumnRenamed("avg_logprob", "lp_corpus")
        .select("doc_id", "lp_corpus")
      target.join(self, Seq("doc_id"))
        .select(col("doc_id"), col("n_bigrams"), col("lp_target"),
          col("lp_corpus"),
          round(col("lp_target") - col("lp_corpus"), 6).as("delta"))
    }),

    // 2×2 effect sizes with Wald CIs: does a deep discount raise the
    // return rate? — odds/risk ratios from four exact integer cells
    "a54_odds_ratio" -> ((s, d) =>
      AssociationOps.twoByTwoEffects(li(s, d),
        (col("l_discount") > 0.05).cast("int"),
        (col("l_returnflag") === "R").cast("int"))),

    // corpus-wide BLEU-2 (Papineni et al. 2002) over a deterministic
    // eval pairing (each even doc scored against its same-language
    // successor): clipped integer n-gram matches via (doc, n, gram)
    // equi-joins — each doc is in O(1) pairs, so the whole scoring is
    // linear; no smoothing, standard brevity penalty
    "t47_bleu" -> ((s, d) =>
      EvalOps.bleuFromOverlap(wordOverlap(s, d), maxN = 2)),

    // ROUGE-2 recall/precision/F1 over the same eval pairing — the
    // reference-recall side of the t47 precision metric, off the same
    // clipped-match frame
    "t48_rouge2" -> ((s, d) =>
      EvalOps.rougeNFromOverlap(wordOverlap(s, d), n = 2)),

    // fill-in-middle training transform (Bavarian et al. 2022): each doc
    // split at two deterministic modular cuts and re-emitted in SPM
    // (suffix-prefix-middle) sentinel order — a pure projection, no
    // shuffle, cuts reproducible on any engine from the row id alone
    "ml27_fim_split" -> ((s, d) =>
      FoldOps.fimSplit(docs(s, d), "doc_id", "text")),

    // chrF (Popović 2015) over the t47 eval pairing — character n-gram
    // F-β, the tokenization-free member of the eval-metric triple; same
    // clipped-match equi-join core as BLEU/ROUGE, char grams instead
    "t49_chrf" -> ((s, d) =>
      EvalOps.chrFFromOverlap(charOverlap(s, d), maxN = 3)),

    // rank-aware quality of the IVF index against exact search on the v07
    // frames: MRR + graded nDCG — position-sensitive where v07's recall is
    // set-blind; per-position DCG terms pico-pinned before the sums
    "v20_rank_eval" -> ((s, d) => {
      val e = emb(s, d)
      val exact = Knn.bruteForceTopK(e, e.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 3)
      val approx = Knn.clusteredTopK(e, "vec_id", "embedding", "label", k = 3)
        .filter(col("query_id") < 8)
      Knn.rankEval(exact, approx)
    }),

    // Bradley–Terry strengths over arena-style matches: adjacent docs from
    // different sources "compete" on exact lexical score (tie → the earlier
    // doc), 4 unrolled MM iterations on the bounded source-pair frame
    "ml28_bradley_terry" -> ((s, d) => {
      val t = docs(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          size(array_distinct(TextFns.tokens(col("text")))).cast("long")
            .as("__score"))
      val mm = t.as("a").join(t.as("b"),
          col("a.doc_id") + 1 === col("b.doc_id") &&
            col("a.source") =!= col("b.source"))
        .select(
          when(col("b.__score") > col("a.__score"), col("b.source"))
            .otherwise(col("a.source")).as("winner"),
          when(col("b.__score") > col("a.__score"), col("a.source"))
            .otherwise(col("b.source")).as("loser"))
      FoldOps.bradleyTerry(mm, "winner", "loser", iters = 4)
    }),

    // simplified silhouette per label cluster — the linear clustering-
    // quality audit over the embedding space: integer-micro centroid
    // distances (exact DECIMAL folds), two √ + one division per row
    "v21_silhouette" -> ((s, d) =>
      Knn.simplifiedSilhouette(emb(s, d), "vec_id", "embedding", "label")),

    // split-conformal calibration on the event values: exact-order-
    // statistic threshold from the even-id calibration slice, empirical
    // coverage on the odd-id slice (α = 0.1)
    "a55_conformal" -> ((s, d) =>
      MetricsOps.splitConformal(ev(s, d), col("value"), col("event_id"),
        col("event_id") % 2 === 0, alpha = 0.1)),

    // Mondrian (per-event-type) conformal: group-local order statistics —
    // the slice-conditional coverage guarantee, no global sort anywhere
    "a56_group_conformal" -> ((s, d) =>
      MetricsOps.groupConformal(ev(s, d), "event_type", col("value"),
        col("event_id"), col("event_id") % 2 === 0, alpha = 0.1)),

    // per-cluster quantization distortion (mean/RMS/max own-centroid
    // distance) — the IVF index-health report off v21's exact-integer
    // centroid machinery
    "v22_quant_distortion" -> ((s, d) =>
      Knn.quantizationDistortion(emb(s, d), "vec_id", "embedding", "label")),

    // keyword-in-context concordance: ±3-token windows around every
    // occurrence of "spark" — linear posexplode, term-count output
    "t50_kwic" -> ((s, d) =>
      QualityOps.kwic(docs(s, d), "doc_id", "text", "spark", 3)),

    // ExactSubstr span REMOVAL (Lee et al. 2022's actual transform):
    // d22's duplicated islands dropped from every document, survivors
    // re-joined — one positional filter per doc, no token-level join
    "d24_span_scrub" -> ((s, d) =>
      QualityOps.exactSubstrScrub(spanProf(s, d))),

    // the composed per-pair eval report — BLEU-2 ⋈ ROUGE-2 ⋈ chrF on the
    // same pairing, the 14th hash-gated e2e chain (metric interactions,
    // not just stages); each side is the already-oracled operator
    "e2e_eval_report" -> ((s, d) =>
      EvalOps.bleuFromOverlap(wordOverlap(s, d), maxN = 2)
        .select("cand_id", "ref_id", "len_c", "len_r", "bp", "bleu")
        .join(EvalOps.rougeNFromOverlap(wordOverlap(s, d), n = 2)
          .select("cand_id", "ref_id", "rouge_r", "rouge_p", "rouge_f1"),
          Seq("cand_id", "ref_id"))
        .join(EvalOps.chrFFromOverlap(charOverlap(s, d), maxN = 3)
          .select("cand_id", "ref_id", "chrf_p", "chrf_r", "chrf"),
          Seq("cand_id", "ref_id")))
  )

  /** Deterministic eval pairing for `t47_bleu` / `t48_rouge2`: every even
    * doc_id is a candidate scored against its same-language successor —
    * the shape of a generated-vs-reference eval table, derivable on both
    * engines without data movement beyond one self equi-join.
    */
  private def evalPairs(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("lang"))
    base.as("a").join(base.as("b"),
        col("a.doc_id") + 1 === col("b.doc_id") &&
          col("a.doc_id") % 2 === 0 && col("a.lang") === col("b.lang"))
      .select(col("a.doc_id").as("cand_id"), col("b.doc_id").as("ref_id"))
  }

  /** DuckDB oracle for `v10_pca_project`: the SAME integer power
    * iteration as `RegressionOps.pcaProject`, with the fixed 30 matvecs
    * UNROLLED as chained CTEs over the v09 covariance construction.
    * Every intermediate is an exact integer (BIGINT/HUGEINT mirroring
    * the engine's Long/DECIMAL(38,0)); the only double ops are the same
    * single correctly-rounded ones the driver loop performs (u/max|u|
    * per step, the closing W·s/√ΣW² unit step, the final /10¹⁸
    * de-quantization) — so the projection hashes bit-identically and the
    * eigensolve needs no rows-only exemption.
    */
  /** The t34/ml06b oracle's shared CTE tower: k UNROLLED BPE merge rounds
    * (the v10 pattern — the oracle re-derives each round's top pair
    * itself). Symbols ride sentinel-wrapped (CHR(1) sym CHR(2), mirroring
    * BpeOps.S1/S2); each round = adjacent-pair counts off the split
    * symbol list → (count DESC, a, b) top-1 → one left-to-right
    * non-overlapping REPLACE. COALESCE guards an (impossible here)
    * pair-free corpus: CHR(3) never occurs, so the REPLACE is a no-op.
    * Ends with `bpec(word, n_sym)` — per-word REAL subword counts.
    */
  private def bpeVocabCtes(k: Int): String = {
    val rounds = (1 to k).map { r =>
      val prev = s"v${r - 1}"
      s"""p$r AS (SELECT l[i] AS a, l[i + 1] AS b, cnt
               FROM (SELECT STRING_SPLIT(TRIM(ws, CHR(1) || CHR(2)),
                              CHR(2) || CHR(1)) AS l, cnt FROM $prev),
                    UNNEST(GENERATE_SERIES(1, LEN(l) - 1)) AS s$r(i)),
         t$r AS MATERIALIZED (SELECT a, b
               FROM (SELECT a, b, SUM(cnt) AS c FROM p$r GROUP BY 1, 2)
               ORDER BY c DESC, a, b LIMIT 1),
         v$r AS MATERIALIZED (SELECT word, cnt,
                 REPLACE(ws,
                   COALESCE((SELECT CHR(1) || a || CHR(2) || CHR(1) || b
                               || CHR(2) FROM t$r), CHR(3)),
                   COALESCE((SELECT CHR(1) || a || b || CHR(2) FROM t$r),
                     '')) AS ws
               FROM $prev)"""
    }.mkString(",\n         ")
    s"""pt AS MATERIALIZED (SELECT doc_id, UNNEST(REGEXP_EXTRACT_ALL(text,
                '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+|\\s+'))
                AS word
              FROM documents WHERE text IS NOT NULL),
         vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM pt GROUP BY 1),
         v0 AS MATERIALIZED (SELECT word, cnt,
                 REGEXP_REPLACE(word, '(.)', CHR(1) || '\\1' || CHR(2), 'g')
                   AS ws
               FROM vocab),
         $rounds,
         bpec AS MATERIALIZED (SELECT word,
                 CAST(LEN(ws) - LEN(REPLACE(ws, CHR(2), '')) AS BIGINT)
                   AS n_sym
               FROM v$k)"""
  }

  private def t34OracleSql: String =
    s"""WITH ${bpeVocabCtes(10)}
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pretoks,
                CAST(SUM(n_sym) AS BIGINT) AS n_bpe
         FROM pt JOIN bpec USING (word) GROUP BY 1"""

  private def ml22OracleSql: String =
    s"""WITH ${bpeVocabCtes(10)},
         t AS (SELECT p.doc_id, CAST(SUM(n_sym) AS BIGINT) AS n_bpe
               FROM pt p JOIN bpec USING (word) GROUP BY 1)
         SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
                CAST(SUM(t.n_bpe) AS BIGINT) AS n_bpe,
                CASE WHEN SUM(t.n_bpe) > 0 THEN
                  ROUND(CAST(SUM(d.n_chars) AS DOUBLE)
                    / CAST(SUM(t.n_bpe) AS DOUBLE), 6) + 0.0
                END AS fertility
         FROM t JOIN documents d USING (doc_id) GROUP BY 1"""

  private def ml06bOracleSql: String =
    s"""WITH ${bpeVocabCtes(10)},
         t AS (SELECT p.doc_id, MAX(d.n_chars) AS n_chars,
                      CAST(SUM(n_sym) AS BIGINT) AS n_bpe
               FROM pt p JOIN bpec USING (word)
                    JOIN documents d ON p.doc_id = d.doc_id
               GROUP BY 1),
         c AS (SELECT doc_id, n_bpe,
                      CAST(SUM(n_bpe) OVER (ORDER BY n_chars DESC, doc_id)
                        AS BIGINT) AS cum_bpe
               FROM t)
         SELECT doc_id, n_bpe, cum_bpe FROM c WHERE cum_bpe <= 12000"""

  /** g06's oracle: the 3-core peel unrolled (same fixed 12 rounds as the
    * engine — monotone, so converged rounds are no-ops on both sides).
    */
  private def g06OracleSql: String = {
    val (k, rounds) = (3, 12)
    val steps = (1 to rounds).map { r =>
      s"""d$r AS MATERIALIZED (SELECT z, CAST(COUNT(*) AS BIGINT) AS deg
               FROM adj
               WHERE z IN (SELECT z FROM a${r - 1})
                 AND n IN (SELECT z FROM a${r - 1})
               GROUP BY 1),
         a$r AS MATERIALIZED (SELECT z FROM d$r WHERE deg >= $k)"""
    }.mkString(",\n         ")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                    FROM lineitem),
         e AS (SELECT a.i AS s, b.i AS t
               FROM li a JOIN li b ON a.b = b.b AND a.i < b.i
               GROUP BY 1, 2),
         adj AS MATERIALIZED (SELECT s AS z, t AS n FROM e
               UNION ALL SELECT t AS z, s AS n FROM e),
         a0 AS MATERIALIZED (SELECT DISTINCT z FROM adj),
         $steps
         SELECT z AS node, CAST(COUNT(*) AS BIGINT) AS core_deg, cv.converged
         FROM adj
         CROSS JOIN (SELECT (SELECT COUNT(*) FROM a${rounds - 1})
                          = (SELECT COUNT(*) FROM a$rounds) AS converged) cv
         WHERE z IN (SELECT z FROM a$rounds)
           AND n IN (SELECT z FROM a$rounds)
         GROUP BY 1, 3"""
  }

  /** g07's oracle: the 4 synchronous label-propagation rounds unrolled
    * (the g06 peel pattern); per-round argmax-with-min-label-tiebreak is
    * a ROW_NUMBER over (count DESC, label ASC) — same total order the
    * engine's struct-min encodes.
    */
  private def g07OracleSql: String = {
    val rounds = 4
    val steps = (1 to rounds).map { r =>
      s"""l$r AS MATERIALIZED (SELECT z, lbl FROM (
               SELECT a.z, l.lbl,
                      ROW_NUMBER() OVER (PARTITION BY a.z
                        ORDER BY COUNT(*) DESC, l.lbl ASC) AS rn
               FROM adj a JOIN l${r - 1} l ON a.n = l.z
               GROUP BY a.z, l.lbl) WHERE rn = 1)"""
    }.mkString(",\n         ")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                    FROM lineitem),
         e AS (SELECT a.i AS s, b.i AS t
               FROM li a JOIN li b ON a.b = b.b AND a.i < b.i
               GROUP BY 1, 2),
         adj AS MATERIALIZED (SELECT s AS z, t AS n FROM e
               UNION ALL SELECT t AS z, s AS n FROM e),
         l0 AS MATERIALIZED (SELECT DISTINCT z, z AS lbl FROM adj),
         $steps
         SELECT z AS node, lbl AS label, cv.converged
         FROM l$rounds
         CROSS JOIN (SELECT (SELECT COUNT(*)
                             FROM l$rounds a JOIN l${rounds - 1} b
                               ON a.z = b.z WHERE a.lbl <> b.lbl) = 0
                       AS converged) cv"""
  }

  /** v12's oracle: the 5 greedy MMR steps unrolled; (1 − 0.7) stays an
    * EXPRESSION so DuckDB computes the identical binary64 the engine's
    * `lit(1.0) - lit(lam)` holds (a 0.3 literal would be a different
    * double).
    */
  private def v12OracleSql: String = {
    val (n, k, lam) = (20, 5, "0.7")
    val steps = (2 to k).map { t =>
      s"""s$t AS MATERIALIZED (SELECT id, rel, $t AS rank, score FROM (
               SELECT c.id, c.rel,
                      $lam * c.rel - (1 - $lam) * MAX(p.sim) AS score
               FROM cand c
               JOIN ps p ON p.a = c.id
               JOIN sel${t - 1} s ON p.b = s.id
               WHERE c.id NOT IN (SELECT id FROM sel${t - 1})
               GROUP BY c.id, c.rel)
             ORDER BY score DESC, id ASC LIMIT 1),
         sel$t AS MATERIALIZED (SELECT * FROM sel${t - 1}
               UNION ALL SELECT * FROM s$t)"""
    }.mkString(",\n         ")
    s"""WITH e AS (SELECT vec_id,
                          LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))
                            AS v
                   FROM embeddings),
         q AS (SELECT v FROM e WHERE vec_id = 0),
         cand AS MATERIALIZED (
           SELECT c.vec_id AS id,
                  ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                    / (SQRT(LIST_DOT_PRODUCT(q.v, q.v))
                       * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6) + 0.0 AS rel
           FROM e c, q WHERE c.vec_id <> 0
           ORDER BY rel DESC, id ASC LIMIT $n),
         cv AS MATERIALIZED (SELECT e.vec_id AS id, e.v
               FROM e JOIN cand ON e.vec_id = cand.id),
         ps AS MATERIALIZED (
           SELECT x.id AS a, y.id AS b,
                  ROUND(LIST_DOT_PRODUCT(x.v, y.v)
                    / (SQRT(LIST_DOT_PRODUCT(x.v, x.v))
                       * SQRT(LIST_DOT_PRODUCT(y.v, y.v))), 6) + 0.0 AS sim
           FROM cv x JOIN cv y ON x.id <> y.id),
         sel1 AS MATERIALIZED (SELECT id, rel, 1 AS rank, $lam * rel AS score
               FROM cand ORDER BY rel DESC, id ASC LIMIT 1),
         $steps
         SELECT id AS vec_id, CAST(rank AS INTEGER) AS rank,
                ROUND(score, 6) + 0.0 AS mmr_score
         FROM sel$k"""
  }

  /** e2e_rag_retrieve's oracle: t24's BM25+RRF CTEs over the embedded
    * subset of documents, the v01 cosine list as the second ranked list,
    * then v12's 5 unrolled greedy MMR steps over the fused top-20 with
    * the fused rrf as relevance. Same (1−λ)-as-expression discipline.
    */
  private def e2eRagOracleSql: String = {
    val (n, k, lam) = (20, 5, "0.7")
    val steps = (2 to k).map { t =>
      s"""s$t AS MATERIALIZED (SELECT id, rel, $t AS rank, score FROM (
               SELECT c.id, c.rel,
                      $lam * c.rel - (1 - $lam) * MAX(p.sim) AS score
               FROM cand c
               JOIN ps p ON p.a = c.id
               JOIN sel${t - 1} s ON p.b = s.id
               WHERE c.id NOT IN (SELECT id FROM sel${t - 1})
               GROUP BY c.id, c.rel)
             ORDER BY score DESC, id ASC LIMIT 1),
         sel$t AS MATERIALIZED (SELECT * FROM sel${t - 1}
               UNION ALL SELECT * FROM s$t)"""
    }.mkString(",\n         ")
    s"""WITH em AS (SELECT vec_id,
                           LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))
                             AS v
                    FROM embeddings),
         corpus AS (SELECT d.doc_id, d.text
                    FROM documents d JOIN em ON d.doc_id = em.vec_id),
         tok AS (SELECT doc_id,
                        UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS tok
                 FROM corpus),
         dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl
                FROM tok GROUP BY 1),
         st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl
                FROM dl),
         tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
                FROM tok WHERE tok IN ('spark', 'window', 'join')
                GROUP BY 1, 2),
         dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df
                   FROM tf GROUP BY 1),
         lex AS (SELECT tf.doc_id,
                        ROUND(SUM(LN((st.n - dfreq.df + 0.5)
                            / (dfreq.df + 0.5) + 1.0)
                          * tf.tf * 2.2
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))),
                          6) + 0.0 AS score
                 FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id)
                 CROSS JOIN st
                 GROUP BY tf.doc_id
                 ORDER BY score DESC, tf.doc_id ASC LIMIT 50),
         q AS (SELECT v FROM em WHERE vec_id = 0),
         vecl AS (SELECT c.vec_id AS doc_id,
                         ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                           / (SQRT(LIST_DOT_PRODUCT(q.v, q.v))
                              * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6) + 0.0
                           AS score
                  FROM em c, q WHERE c.vec_id <> 0
                  ORDER BY score DESC, doc_id ASC LIMIT 50),
         rl AS (SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                         AS rnk
                FROM lex),
         rv AS (SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                         AS rnk
                FROM vecl),
         u AS (SELECT doc_id, 1.0 / (60 + rnk) AS rr FROM rl
               UNION ALL
               SELECT doc_id, 1.0 / (60 + rnk) AS rr FROM rv),
         cand AS MATERIALIZED (
           SELECT doc_id AS id, ROUND(SUM(rr), 6) + 0.0 AS rel
           FROM u GROUP BY 1
           ORDER BY rel DESC, id ASC LIMIT $n),
         cv AS MATERIALIZED (SELECT em.vec_id AS id, em.v
               FROM em JOIN cand ON em.vec_id = cand.id),
         ps AS MATERIALIZED (
           SELECT x.id AS a, y.id AS b,
                  ROUND(LIST_DOT_PRODUCT(x.v, y.v)
                    / (SQRT(LIST_DOT_PRODUCT(x.v, x.v))
                       * SQRT(LIST_DOT_PRODUCT(y.v, y.v))), 6) + 0.0 AS sim
           FROM cv x JOIN cv y ON x.id <> y.id),
         sel1 AS MATERIALIZED (SELECT id, rel, 1 AS rank, $lam * rel AS score
               FROM cand ORDER BY rel DESC, id ASC LIMIT 1),
         $steps
         SELECT id AS doc_id, CAST(rank AS INTEGER) AS rank,
                ROUND(score, 6) + 0.0 AS mmr_score
         FROM sel$k"""
  }

  private def v10OracleSql: String = {
    val iters = 30
    val steps = (1 to iters).map { k =>
      val prev = if (k == 1) "w0" else s"w${k - 1}"
      s"""u$k AS MATERIALIZED (SELECT m.i AS j, CAST(SUM(m.c * w.w) AS BIGINT) AS u
               FROM m JOIN $prev w ON m.j = w.j GROUP BY 1),
         x$k AS MATERIALIZED (SELECT MAX(ABS(u)) AS mu FROM u$k),
         w$k AS MATERIALIZED (SELECT j, CASE WHEN mu = 0 THEN u ELSE
                    CAST(ROUND(CAST(u AS DOUBLE) / mu * 1e8, 0) AS BIGINT)
                  END AS w
                 FROM u$k, x$k)"""
    }.mkString(",\n         ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
                        CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1e6,
                                   0) AS BIGINT) AS x,
                        CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1
                          AS i
                 FROM embeddings),
         p AS (SELECT a.i AS i, b.i AS j, a.x AS xa, b.x AS xb
               FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i),
         c AS MATERIALIZED (SELECT i, j,
                      CAST(ROUND(ROUND(CAST(
                             COUNT(*) * SUM(CAST(xa AS HUGEINT) * xb)
                             - SUM(CAST(xa AS HUGEINT))
                               * SUM(CAST(xb AS HUGEINT)) AS DOUBLE)
                           / (CAST(COUNT(*) AS DOUBLE) * COUNT(*) * 1e12), 6)
                         * 1e6, 0) AS BIGINT) AS c
               FROM p GROUP BY 1, 2),
         m AS MATERIALIZED (SELECT i, j, c FROM c
               UNION ALL SELECT j AS i, i AS j, c FROM c WHERE i <> j),
         w0 AS (SELECT DISTINCT i AS j, CAST(100000000 AS BIGINT) AS w
                FROM c),
         $steps,
         sg AS (SELECT COALESCE((SELECT CASE WHEN w < 0 THEN -1 ELSE 1 END
                                 FROM w$iters WHERE w <> 0
                                 ORDER BY j LIMIT 1), 1) AS s),
         nr AS (SELECT CAST(SUM(w * w) AS BIGINT) AS ss FROM w$iters),
         ax AS (SELECT j, CASE WHEN ss = 0 THEN CAST(0 AS BIGINT) ELSE
                    CAST(ROUND(CAST(w * s AS DOUBLE)
                               / SQRT(CAST(ss AS DOUBLE)) * 1e12, 0)
                      AS BIGINT) END AS a
                FROM w$iters, sg, nr)
       SELECT e.vec_id,
              ROUND(CAST(SUM(CAST(e.x * ax.a AS HUGEINT)) AS DOUBLE) / 1e18,
                6) + 0.0 AS pc1
       FROM e JOIN ax ON e.i = ax.j
       GROUP BY 1"""
  }

  /** Shared CTE base for the three e2e pipeline oracles: fabricates the
    * SAME visit/patient/measurement frames as [[patientsT]]/[[visitsT]]/
    * [[measuresT]] (pure integer arithmetic — bit-identical), then the
    * cohort join+filter+label and the cohort-scoped offset events.
    */
  private val e2eBaseCtes: String =
    """patients AS (SELECT c_custkey AS subject_id,
                           c_custkey % 80 + 5 AS age,
                           CASE WHEN c_custkey % 7 = 0 THEN
                             TIMESTAMP '1994-01-01'
                               + INTERVAL (c_custkey % 2000) DAY
                           END AS dod
                    FROM customer),
         visits AS (SELECT o_custkey AS subject_id, o_orderkey AS hadm_id,
                           o_orderdate AS admittime,
                           o_orderdate + INTERVAL (o_orderkey % 21 + 1) DAY
                             AS dischtime
                    FROM orders),
         cohort AS (SELECT v.hadm_id, v.subject_id, v.admittime, v.dischtime,
                           CASE WHEN p.dod IS NOT NULL
                                     AND p.dod BETWEEN v.admittime
                                                   AND v.dischtime
                                THEN 1 ELSE 0 END AS label
                    FROM visits v JOIN patients p USING (subject_id)
                    WHERE p.age >= 18),
         meas AS (SELECT l_orderkey AS hadm_id, l_partkey AS itemid,
                         l_shipdate AS charttime, l_linestatus AS uom,
                         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                           AS val_cents
                  FROM lineitem),
         ev AS (SELECT * FROM (
                  SELECT m.hadm_id, m.itemid, m.uom, m.val_cents,
                         CAST(FLOOR(EPOCH(m.charttime - c.admittime) / 3600)
                           AS BIGINT) AS event_offset_h
                  FROM meas m JOIN cohort c USING (hadm_id))
                WHERE event_offset_h >= 0)"""

  def oracleSql: Map[String, String] = Map(
    "v10_pca_project" -> v10OracleSql,
    "t34_bpe_count" -> t34OracleSql,
    "ml22_tokenizer_fertility" -> ml22OracleSql,
    "ml06b_bpe_budget" -> ml06bOracleSql,
    "g06_kcore" -> g06OracleSql,
    "g07_label_prop" -> g07OracleSql,

    // normalize → first-char block + raw-threshold JW (the f30 portable
    // compare) → recursive-CTE min-label closure (the d08 pattern) →
    // singletons via LEFT JOIN COALESCE
    "e2e_entity_resolution" ->
      """WITH RECURSIVE
         v AS (SELECT LOWER(TRIM(p_name)) AS name,
                      CAST(MIN(p_partkey) AS BIGINT) AS nid
               FROM part WHERE p_name IS NOT NULL GROUP BY 1),
         e0 AS (SELECT a.nid AS x, b.nid AS y
                FROM v a JOIN v b
                  ON SUBSTR(a.name, 1, 1) = SUBSTR(b.name, 1, 1)
                 AND a.name < b.name
                WHERE jaro_winkler_similarity(a.name, b.name) >= 0.9),
         und AS (SELECT x AS a, y AS b FROM e0
                 UNION SELECT y, x FROM e0),
         reach AS (SELECT a, b FROM und
                   UNION
                   SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         cc AS (SELECT a AS nid, LEAST(a, MIN(b)) AS canon
                FROM reach GROUP BY a)
         SELECT v.name, v.nid,
                CAST(COALESCE(cc.canon, v.nid) AS BIGINT) AS canonical_id
         FROM v LEFT JOIN cc USING (nid)""",
    "v12_mmr_rerank" -> v12OracleSql,
    "e2e_rag_retrieve" -> e2eRagOracleSql,

    "ml20_preference_pairs" ->
      """WITH t AS (SELECT doc_id, source,
                           CAST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(
                             TRIM(text), '\s+'))) AS BIGINT) AS score
                    FROM documents WHERE text IS NOT NULL),
         r AS (SELECT *,
                      ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY score DESC, doc_id DESC) AS rb,
                      ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY score ASC, doc_id ASC) AS rw
               FROM t)
         SELECT b.source, b.doc_id AS chosen_doc, b.score AS chosen_score,
                w.doc_id AS rejected_doc, w.score AS rejected_score,
                b.score - w.score AS margin
         FROM (SELECT * FROM r WHERE rb = 1) b
         JOIN (SELECT * FROM r WHERE rw = 1) w USING (source)
         WHERE b.doc_id <> w.doc_id""",

    // GRPO group advantages: HUGEINT group sums mirror the engine's
    // DECIMAL(38,0); advantage and z are one cast + division (+ √) over
    // exact integer numerators/radicands
    "ml21_group_advantage" ->
      """WITH t AS (SELECT doc_id, source,
                           CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+'))
                             AS BIGINT) AS reward
                    FROM documents WHERE text IS NOT NULL),
         st AS (SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
                       CAST(SUM(reward) AS HUGEINT) AS s,
                       SUM(CAST(reward AS HUGEINT) * reward) AS q
                FROM t GROUP BY 1)
         SELECT t.source, t.doc_id, t.reward,
                ROUND(CAST(n * reward - s AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  + 0.0 AS advantage,
                CASE WHEN n * q - s * s > 0 THEN
                  ROUND(CAST(n * reward - s AS DOUBLE)
                    / SQRT(CAST(n * q - s * s AS DOUBLE)), 6) + 0.0
                END AS z
         FROM t JOIN st USING (source)""",

    // one conditional-aggregate pass per half; midpoint sum ~3.4e15 µs is
    // exact in double, /2 exact, so the split lands identically
    "dq15_schema_drift" ->
      """WITH m AS (SELECT (EPOCH_US(MIN(ts)) + EPOCH_US(MAX(ts))) / 2
                      AS mid
                    FROM events),
         t AS (SELECT e.*, EPOCH_US(ts) < m.mid AS ha FROM events e, m),
         w AS (SELECT
                 SUM(CASE WHEN ha THEN 1 ELSE 0 END) AS na_value,
                 SUM(CASE WHEN ha AND value IS NULL THEN 1 ELSE 0 END)
                   AS nulla_value,
                 COUNT(DISTINCT CASE WHEN ha THEN value END) AS dista_value,
                 SUM(CASE WHEN NOT ha THEN 1 ELSE 0 END) AS nb_value,
                 SUM(CASE WHEN NOT ha AND value IS NULL THEN 1 ELSE 0 END)
                   AS nullb_value,
                 COUNT(DISTINCT CASE WHEN NOT ha THEN value END)
                   AS distb_value,
                 SUM(CASE WHEN ha THEN 1 ELSE 0 END) AS na_et,
                 SUM(CASE WHEN ha AND event_type IS NULL THEN 1 ELSE 0 END)
                   AS nulla_et,
                 COUNT(DISTINCT CASE WHEN ha THEN event_type END) AS dista_et,
                 SUM(CASE WHEN NOT ha THEN 1 ELSE 0 END) AS nb_et,
                 SUM(CASE WHEN NOT ha AND event_type IS NULL THEN 1
                     ELSE 0 END) AS nullb_et,
                 COUNT(DISTINCT CASE WHEN NOT ha THEN event_type END)
                   AS distb_et,
                 SUM(CASE WHEN ha THEN 1 ELSE 0 END) AS na_uid,
                 SUM(CASE WHEN ha AND user_id IS NULL THEN 1 ELSE 0 END)
                   AS nulla_uid,
                 COUNT(DISTINCT CASE WHEN ha THEN user_id END) AS dista_uid,
                 SUM(CASE WHEN NOT ha THEN 1 ELSE 0 END) AS nb_uid,
                 SUM(CASE WHEN NOT ha AND user_id IS NULL THEN 1
                     ELSE 0 END) AS nullb_uid,
                 COUNT(DISTINCT CASE WHEN NOT ha THEN user_id END)
                   AS distb_uid
               FROM t),
         s AS (SELECT 'value' AS col_name, na_value AS n_a,
                      nulla_value AS null_a, dista_value AS dist_a,
                      nb_value AS n_b, nullb_value AS null_b,
                      distb_value AS dist_b
               FROM w
               UNION ALL
               SELECT 'event_type', na_et, nulla_et, dista_et, nb_et,
                      nullb_et, distb_et FROM w
               UNION ALL
               SELECT 'user_id', na_uid, nulla_uid, dista_uid, nb_uid,
                      nullb_uid, distb_uid FROM w)
         SELECT col_name, CAST(n_a AS BIGINT) AS n_a,
                CAST(null_a AS BIGINT) AS null_a,
                CAST(dist_a AS BIGINT) AS dist_a,
                CAST(n_b AS BIGINT) AS n_b,
                CAST(null_b AS BIGINT) AS null_b,
                CAST(dist_b AS BIGINT) AS dist_b,
                ROUND(CAST(null_b AS DOUBLE) / n_b
                      - CAST(null_a AS DOUBLE) / n_a, 6) + 0.0
                  AS null_rate_delta
         FROM s""",

    "e2e_cohort_mortality" ->
      s"""WITH $e2eBaseCtes
         SELECT hadm_id, subject_id, label FROM cohort""",

    // all-later-visits readmission with the admit_j > disch_i guard —
    // mirrors nextWithinGapLabelRange's left join + max aggregation
    "e2e_cohort_readmit30" ->
      s"""WITH $e2eBaseCtes
         SELECT c.hadm_id, c.subject_id,
                MAX(CASE WHEN l.hadm_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS label
         FROM cohort c LEFT JOIN cohort l
           ON l.subject_id = c.subject_id AND l.hadm_id <> c.hadm_id
          AND l.admittime > c.dischtime
          AND l.admittime <= c.dischtime + INTERVAL 30 DAY
         GROUP BY 1, 2""",

    "e2e_cohort_los7" ->
      s"""WITH $e2eBaseCtes
         SELECT hadm_id, subject_id,
                CASE WHEN dischtime - admittime >= INTERVAL 7 DAY
                     THEN 1 ELSE 0 END AS label
         FROM cohort""",

    // disease-phenotype branch: diag fabrication (lineitem) + the
    // e2e_icd_map root map (nation), root-contains('M1') keep-list,
    // visit pool filtered BEFORE the all-later-visits readmission scan —
    // a later NON-disease admission must not count as a readmission
    "e2e_cohort_phenotype" ->
      s"""WITH $e2eBaseCtes,
         diag AS (SELECT l_orderkey AS hadm_id,
                         'C' || LPAD(CAST(l_partkey % 500 AS VARCHAR), 3,
                           '0') AS icd_code,
                         CASE WHEN l_partkey % 2 = 0 THEN 9 ELSE 10 END
                           AS icd_version
                  FROM lineitem),
         m AS (SELECT SUBSTR('C' || LPAD(CAST(n_nationkey AS VARCHAR), 2,
                        '0') || 'X', 1, 3) AS root,
                      ARG_MIN('M' || CAST(n_nationkey AS VARCHAR),
                        n_nationkey) AS mapped
               FROM nation GROUP BY 1),
         conv AS (SELECT d.hadm_id,
                         CASE WHEN d.icd_version = 9 THEN m.mapped
                              ELSE d.icd_code END AS root_icd10
                  FROM diag d LEFT JOIN m ON SUBSTR(d.icd_code, 1, 3) = m.root),
         pos AS (SELECT DISTINCT hadm_id FROM conv
                 WHERE root_icd10 IS NOT NULL
                   AND POSITION('M1' IN SUBSTR(root_icd10, 1, 3)) > 0),
         fc AS (SELECT c.hadm_id, c.subject_id, c.admittime, c.dischtime
                FROM cohort c JOIN pos USING (hadm_id))
         SELECT c.hadm_id, c.subject_id,
                MAX(CASE WHEN l.hadm_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS label
         FROM fc c LEFT JOIN fc l
           ON l.subject_id = c.subject_id AND l.hadm_id <> c.hadm_id
          AND l.admittime > c.dischtime
          AND l.admittime <= c.dischtime + INTERVAL 30 DAY
         GROUP BY 1, 2""",

    "e2e_icd_map" ->
      """WITH diag AS (SELECT o_orderkey AS hadm_id,
                              'C' || LPAD(CAST(o_orderkey % 500 AS VARCHAR),
                                3, '0') AS icd_code,
                              CASE WHEN o_orderkey % 2 = 0 THEN 9 ELSE 10 END
                                AS icd_version
                       FROM orders),
         m AS (SELECT SUBSTR('C' || LPAD(CAST(n_nationkey AS VARCHAR), 2,
                        '0') || 'X', 1, 3) AS root,
                      ARG_MIN('M' || CAST(n_nationkey AS VARCHAR),
                        n_nationkey) AS mapped
               FROM nation GROUP BY 1)
         SELECT d.hadm_id, d.icd_code, d.icd_version,
                CASE WHEN d.icd_version = 9 THEN m.mapped
                     ELSE d.icd_code END AS root_icd10
         FROM diag d LEFT JOIN m ON SUBSTR(d.icd_code, 1, 3) = m.root""",

    // the composed meds chain: pad/section on the prescription side,
    // 5-4 reformat + keep-first (ARG_MIN by order) on the mapping side,
    // inner join, EPC filter; ARRAY_TO_STRING(NULL-prone) coalesced
    "e2e_drug_map" ->
      """WITH meds AS (
           SELECT o_orderkey AS hadm_id,
                  REPLACE(LOWER(TRIM('  ' || o_orderpriority || ' TAB ')),
                    ' ', '_') AS drug,
                  CASE WHEN o_orderkey % 7 = 0 THEN NULL
                       ELSE (o_orderkey % 999) * 1000000
                            + ((o_orderkey * 7) % 9999) * 100
                            + o_orderkey % 100 END AS ndc
           FROM orders),
         m0 AS (
           SELECT LPAD(CAST(p_partkey % 999 AS VARCHAR), 5, '0')
                    || LPAD(CAST((p_partkey * 7) % 9999 AS VARCHAR), 4, '0')
                    AS new_ndc,
                  LOWER(COALESCE(CASE WHEN p_partkey % 11 = 0 THEN NULL
                                      ELSE p_name END, ''))
                    AS nonproprietaryname,
                  p_type || ' [EPC],' || CAST(p_size AS VARCHAR) || ' [PE],'
                    || p_brand || ' [EPC]' AS pharm_classes,
                  CAST(p_partkey AS BIGINT) AS map_order
           FROM part
           UNION ALL
           SELECT LPAD(CAST(p_partkey % 999 AS VARCHAR), 5, '0')
                    || LPAD(CAST((p_partkey * 7) % 9999 AS VARCHAR), 4, '0'),
                  LOWER(COALESCE(CASE WHEN p_partkey % 11 = 0 THEN NULL
                                      ELSE p_name END, '')),
                  'DECOY [EPC]',
                  CAST(p_partkey AS BIGINT) + 10000
           FROM part),
         m AS (SELECT new_ndc, nonproprietaryname,
                      ARG_MIN(pharm_classes, map_order) AS pharm_classes
               FROM m0 GROUP BY 1, 2),
         w AS (SELECT hadm_id, drug,
                      SUBSTRING(LPAD(CAST(ndc AS VARCHAR), 11, '0'), 1, 9)
                        AS new_ndc
               FROM meds WHERE ndc IS NOT NULL)
         SELECT w.hadm_id, w.drug, w.new_ndc, m.nonproprietaryname,
                COALESCE(ARRAY_TO_STRING(LIST_FILTER(
                  STRING_SPLIT(m.pharm_classes, ','),
                  x -> CONTAINS(x, '[EPC]')), '|'), '') AS epc_list
         FROM w JOIN m USING (new_ndc)""",

    "ml19_length_buckets" ->
      """WITH t AS (
           SELECT doc_id, source,
                  CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS INT)
                    AS n_tokens
           FROM documents),
         b AS (SELECT *,
                      CASE WHEN n_tokens <= 16 THEN 16
                           WHEN n_tokens <= 32 THEN 32
                           WHEN n_tokens <= 64 THEN 64
                           WHEN n_tokens <= 128 THEN 128
                           WHEN n_tokens <= 256 THEN 256
                           ELSE 512 END AS len_bucket
               FROM t)
         SELECT doc_id, source, len_bucket, n_tokens,
                CAST(FLOOR((SUM(n_tokens) OVER (
                       PARTITION BY source, len_bucket ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / 256.0) AS INTEGER) AS bin_id
         FROM b""",

    "q10_pareto_share" ->
      """WITH base AS (SELECT user_id,
                             SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                               AS cents
                      FROM events WHERE event_type = 'purchase'
                      GROUP BY 1),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                        SUM(cents) AS tot FROM base),
         r AS (SELECT user_id, cents,
                      ROW_NUMBER() OVER (ORDER BY cents DESC, user_id ASC)
                        AS rn
               FROM base)
         SELECT CAST((rn - 1) * 10 // n + 1 AS INT) AS decile,
                CAST(COUNT(*) AS BIGINT) AS n_users,
                CAST(SUM(cents) AS BIGINT) AS cents,
                ROUND(CAST(SUM(cents) AS DOUBLE) / MAX(tot), 6) + 0.0 AS share
         FROM r, tot
         GROUP BY 1""",

    // the d10 minhash/LSH/verify/components construction + a size
    // histogram and the singleton bucket
    "d18_cluster_sizes" ->
      """WITH RECURSIVE
         t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t),
         sig AS (SELECT doc_id, sh,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('0:' || x))) AS m00,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('1:' || x))) AS m01,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('2:' || x))) AS m02,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('3:' || x))) AS m03,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('4:' || x))) AS m04,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('5:' || x))) AS m05,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('6:' || x))) AS m06,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('7:' || x))) AS m07,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('8:' || x))) AS m08,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('9:' || x))) AS m09,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('10:' || x))) AS m10,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('11:' || x))) AS m11
           FROM s),
         bands AS (
           SELECT doc_id, 0 AS band, MD5(m00 || '|' || m01) AS band_key FROM sig
           UNION ALL SELECT doc_id, 1, MD5(m02 || '|' || m03) FROM sig
           UNION ALL SELECT doc_id, 2, MD5(m04 || '|' || m05) FROM sig
           UNION ALL SELECT doc_id, 3, MD5(m06 || '|' || m07) FROM sig
           UNION ALL SELECT doc_id, 4, MD5(m08 || '|' || m09) FROM sig
           UNION ALL SELECT doc_id, 5, MD5(m10 || '|' || m11) FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         sizes AS (SELECT doc_id, LEN(sh) AS n FROM s),
         inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS cnt
                   FROM cand c JOIN ex a ON a.doc_id = c.id_a
                     JOIN ex b ON b.doc_id = c.id_b AND b.sg = a.sg
                   GROUP BY 1, 2),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
           WHERE cnt * 1.0 / (sa.n + sb.n - cnt) >= 0.5),
         und AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT a, b FROM und
           UNION
           SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id
                  FROM reach GROUP BY a),
         h AS (SELECT s AS cluster_size,
                      CAST(COUNT(*) AS BIGINT) AS n_clusters
               FROM (SELECT canonical_id, COUNT(*) AS s FROM comp
                     GROUP BY 1)
               GROUP BY 1),
         si AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
                       CAST(COUNT(*) AS BIGINT) AS n_clusters
                FROM documents
                WHERE doc_id NOT IN (SELECT doc_id FROM comp))
         SELECT * FROM h UNION ALL SELECT * FROM si""",

    // v03b's portable argmin assignment against the 16 patterned
    // centroids, then within-cluster pairwise cosine at the raw-double
    // threshold d06 proved engine-portable
    "d19_semdedup" ->
      s"""WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                     FROM embeddings),
          c(cluster, cv) AS (VALUES $semCentroidsSqlValues),
          dd AS (SELECT vec_id, v, cluster,
                        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
                          LIST_SUM(LIST_TRANSFORM(range(1, 65),
                            i -> (v[i] - CAST(cv[i] AS DOUBLE)) * (v[i] - CAST(cv[i] AS DOUBLE)))) ASC,
                          cluster ASC) AS rn
                 FROM e CROSS JOIN c),
          asg AS (SELECT vec_id, v, cluster FROM dd WHERE rn = 1),
          dup AS (SELECT DISTINCT b.vec_id
                  FROM asg a JOIN asg b
                    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                  WHERE LIST_DOT_PRODUCT(a.v, b.v)
                        / (SQRT(LIST_DOT_PRODUCT(a.v, a.v))
                           * SQRT(LIST_DOT_PRODUCT(b.v, b.v))) >= 0.4)
          SELECT asg.vec_id, CAST(asg.cluster AS INTEGER) AS cluster,
                 CAST(CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
          FROM asg LEFT JOIN dup ON asg.vec_id = dup.vec_id""",

    "j22_asof_nearest" ->
      """WITH u AS (
           SELECT user_id, ts, event_id, 0 AS side, ts AS ref_ts
           FROM events WHERE event_type = 'signup'
           UNION ALL
           SELECT user_id, ts, event_id, 1 AS side, NULL AS ref_ts
           FROM events WHERE event_type = 'purchase'),
         f AS (SELECT *,
                      LAST_VALUE(ref_ts IGNORE NULLS) OVER (
                        PARTITION BY user_id ORDER BY ts, side, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS prev,
                      FIRST_VALUE(ref_ts IGNORE NULLS) OVER (
                        PARTITION BY user_id ORDER BY ts, side, event_id
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                        AS next
               FROM u)
         SELECT event_id,
                CASE WHEN next IS NULL THEN prev
                     WHEN prev IS NULL THEN next
                     WHEN EPOCH_US(ts) - EPOCH_US(prev)
                          <= EPOCH_US(next) - EPOCH_US(ts) THEN prev
                     ELSE next END AS asof_signup_ts
         FROM f WHERE side = 1""",

    "dq14_field_consistency" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN ABS(n_chars - LEN(text)) > 0 THEN 1
                         ELSE 0 END) AS BIGINT) AS n_mismatch,
                CAST(MAX(ABS(n_chars - LEN(text))) AS BIGINT) AS max_delta,
                ROUND(SUM(CASE WHEN ABS(n_chars - LEN(text)) > 0 THEN 1
                          ELSE 0 END) * 1.0 / COUNT(*), 6) + 0.0 AS mismatch_rate
         FROM documents WHERE text IS NOT NULL GROUP BY 1""",

    "t35_prefix_dup_rate" ->
      """WITH t AS (SELECT doc_id, source,
                           MD5(ARRAY_TO_STRING(
                             STRING_SPLIT_REGEX(TRIM(text), '\s+')[1:20],
                             ' ')) AS p
                    FROM documents WHERE text IS NOT NULL),
         c AS (SELECT p, COUNT(*) AS c FROM t GROUP BY 1)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_templated,
                ROUND(SUM(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) * 1.0
                      / COUNT(*), 6) + 0.0 AS templated_rate
         FROM t JOIN c USING (p) GROUP BY 1""",

    // 3-gram MD5s with ordinal positions, 4-wide window minima over full
    // windows only, distinct per-doc fingerprint set, df-capped
    // inverted-index pair join — mirrors DedupOps.winnowSharedPairs
    "t36_winnow_pairs" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         g AS (SELECT doc_id, UNNEST(GENERATE_SERIES(1, LEN(toks) - 2)) AS i,
                      toks
               FROM t WHERE LEN(toks) >= 6),
         gh AS (SELECT doc_id, i - 1 AS pos,
                       MD5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                         AS h
                FROM g),
         n AS (SELECT doc_id, COUNT(*) AS ng FROM gh GROUP BY 1),
         wm AS (SELECT doc_id, pos,
                       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmv
                FROM gh),
         fp AS (SELECT DISTINCT wm.doc_id, wmv AS fp
                FROM wm JOIN n USING (doc_id) WHERE pos <= ng - 4),
         df AS (SELECT fp, COUNT(*) AS df FROM fp GROUP BY 1),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      COUNT(*) AS n_shared
               FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
               JOIN df ON df.fp = a.fp AND df.df <= 50
               GROUP BY 1, 2)
         SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared FROM p
         WHERE n_shared >= 2""",

    "dq13_null_trend" ->
      """WITH b AS (SELECT event_type, DATE_TRUNC('week', ts) AS week,
                           CAST(COUNT(*) AS BIGINT) AS n,
                           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0
                             END) AS BIGINT) AS n_null
                    FROM events GROUP BY 1, 2),
         r AS (SELECT *, ROUND(n_null * 1.0 / n, 6) + 0.0 AS null_rate FROM b)
         SELECT event_type, week, n, n_null, null_rate,
                CASE WHEN LAG(null_rate) OVER w IS NOT NULL
                          AND LAG(null_rate) OVER w > 0
                          AND null_rate > LAG(null_rate) OVER w * 2
                     THEN 1 ELSE 0 END AS jumped
         FROM r WINDOW w AS (PARTITION BY event_type ORDER BY week)""",

    "q09_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
                            DATEDIFF('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS day
                     FROM events),
         g AS (SELECT user_id, day,
                      CASE WHEN LAG(day) OVER w IS NULL
                             OR day - LAG(day) OVER w > 6
                           THEN 1 ELSE 0 END AS newi
               FROM ud WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         i AS (SELECT user_id, day,
                      SUM(newi) OVER (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS isl
               FROM g),
         iv AS (SELECT user_id, isl, MIN(day) AS s, MAX(day) + 6 AS e
                FROM i GROUP BY 1, 2),
         days AS (SELECT UNNEST(GENERATE_SERIES(s, e)) AS day_num FROM iv)
         SELECT day_num, CAST(COUNT(*) AS BIGINT) AS wau
         FROM days GROUP BY 1""",

    // q09's islands at window 30 for MAU, one distinct+count for DAU,
    // a single exact-integer division for the ratio
    "q11_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id,
                            DATEDIFF('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) AS day
                     FROM events),
         dau AS (SELECT day AS day_num, CAST(COUNT(*) AS BIGINT) AS dau
                 FROM ud GROUP BY 1),
         g AS (SELECT user_id, day,
                      CASE WHEN LAG(day) OVER w IS NULL
                             OR day - LAG(day) OVER w > 29
                           THEN 1 ELSE 0 END AS newi
               FROM ud WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         i AS (SELECT user_id, day,
                      SUM(newi) OVER (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS isl
               FROM g),
         iv AS (SELECT user_id, isl, MIN(day) AS s, MAX(day) + 29 AS e
                FROM i GROUP BY 1, 2),
         days AS (SELECT UNNEST(GENERATE_SERIES(s, e)) AS day_num FROM iv),
         mau AS (SELECT day_num, CAST(COUNT(*) AS BIGINT) AS mau
                 FROM days GROUP BY 1)
         SELECT day_num, dau, mau,
                ROUND(CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE), 6) + 0.0
                  AS stickiness
         FROM dau JOIN mau USING (day_num)""",

    // byte-exact replay over the same UTF-8 source bytes (pure-ASCII
    // corpus ⇒ UNICODE(SUBSTR) IS the byte; POWER products are exact
    // integers in double, so LIST_SUM is order-free)
    "m06_pcm_energy" ->
      """WITH b AS (SELECT doc_id, text,
                           CAST(LEN(text) // 2 AS INT) AS ns
                    FROM documents WHERE text IS NOT NULL),
         f AS (SELECT doc_id, text, ns,
                      UNNEST(GENERATE_SERIES(0,
                        CAST(CEIL(ns / 256.0) AS INT) - 1)) AS frame
               FROM b WHERE ns >= 1)
         SELECT doc_id, CAST(frame AS INT) AS frame,
                CAST(LEAST(ns, (frame + 1) * 256) - frame * 256 AS INT)
                  AS n_samples,
                ROUND(SQRT(
                  LIST_SUM(LIST_TRANSFORM(
                    GENERATE_SERIES(frame * 256,
                      LEAST(ns, (frame + 1) * 256) - 1),
                    k -> POWER(UNICODE(SUBSTR(text, 2*k + 1, 1))
                               + 256 * UNICODE(SUBSTR(text, 2*k + 2, 1)),
                           2)))
                  / (LEAST(ns, (frame + 1) * 256) - frame * 256)), 6) + 0.0
                  AS rms
         FROM f""",

    // m06's source-byte oracle with the container metadata the engine
    // must read back off the decoded RIFF/fmt chunks — a PCM16 WAV
    // round-trips the samples bit-exactly
    "m12_wav_decode" ->
      """WITH b AS (SELECT doc_id, text,
                           CAST(LEN(text) // 2 AS INT) AS ns
                    FROM documents WHERE text IS NOT NULL),
         f AS (SELECT doc_id, text, ns,
                      UNNEST(GENERATE_SERIES(0,
                        CAST(CEIL(ns / 256.0) AS INT) - 1)) AS frame
               FROM b WHERE ns >= 1)
         SELECT doc_id, CAST(16000 AS INT) AS sample_rate,
                CAST(1 AS INT) AS channels, CAST(16 AS INT) AS bits,
                CAST(frame AS INT) AS frame,
                CAST(LEAST(ns, (frame + 1) * 256) - frame * 256 AS INT)
                  AS n_samples,
                ROUND(SQRT(
                  LIST_SUM(LIST_TRANSFORM(
                    GENERATE_SERIES(frame * 256,
                      LEAST(ns, (frame + 1) * 256) - 1),
                    k -> POWER(UNICODE(SUBSTR(text, 2*k + 1, 1))
                               + 256 * UNICODE(SUBSTR(text, 2*k + 2, 1)),
                           2)))
                  / (LEAST(ns, (frame + 1) * 256) - frame * 256)), 6) + 0.0
                  AS rms
         FROM f""",

    // m06's byte-level sample reconstruction + the linear-resample index
    // algebra: output k reads i = 3k//2, r = 3k mod 2; the exact integer
    // numerator s(i)·(2−r) + s(min(i+1, ns−1))·r de-normalizes by upP=2,
    // so the frame RMS divides by n·4; outN = (ns−1)·2//3 + 1
    "m08_resample_pcm" ->
      """WITH b AS (SELECT doc_id, text,
                           CAST(LEN(text) // 2 AS INT) AS ns
                    FROM documents WHERE text IS NOT NULL),
         o AS (SELECT doc_id, text, ns,
                      CAST((ns - 1) * 2 // 3 + 1 AS BIGINT) AS outn
               FROM b WHERE ns >= 1),
         f AS (SELECT doc_id, text, ns, outn,
                      UNNEST(GENERATE_SERIES(0,
                        CAST(CEIL(outn / 256.0) AS INT) - 1)) AS frame
               FROM o)
         SELECT doc_id, CAST(frame AS INT) AS frame,
                CAST(LEAST(outn, (frame + 1) * 256) - frame * 256 AS INT)
                  AS n_samples,
                ROUND(SQRT(
                  LIST_SUM(LIST_TRANSFORM(
                    GENERATE_SERIES(frame * 256,
                      LEAST(outn, (frame + 1) * 256) - 1),
                    k -> POWER(
                      (UNICODE(SUBSTR(text, 2 * (3 * k // 2) + 1, 1))
                       + 256 * UNICODE(SUBSTR(text, 2 * (3 * k // 2) + 2, 1)))
                        * (2 - (3 * k) % 2)
                      + (UNICODE(SUBSTR(text,
                           2 * LEAST(3 * k // 2 + 1, ns - 1) + 1, 1))
                         + 256 * UNICODE(SUBSTR(text,
                             2 * LEAST(3 * k // 2 + 1, ns - 1) + 2, 1)))
                        * ((3 * k) % 2), 2)))
                  / ((LEAST(outn, (frame + 1) * 256) - frame * 256) * 4.0)),
                  6) + 0.0 AS rms
         FROM f""",

    "t32_subword_count" ->
      """SELECT doc_id,
                CAST(LEN(REGEXP_EXTRACT_ALL(text,
                  '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+'))
                  AS INTEGER) AS n_subtoks,
                CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS INTEGER)
                  AS n_ws_toks
         FROM documents WHERE text IS NOT NULL""",

    "u12_scd2_build" ->
      """WITH c AS (SELECT user_id, ts, event_id, event_type AS state,
                           LAG(event_type) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev
                    FROM events),
         f AS (SELECT user_id, ts, event_id, state FROM c
               WHERE state IS DISTINCT FROM prev)
         SELECT user_id, state, ts AS valid_from,
                LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS valid_to,
                CASE WHEN LEAD(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) IS NULL
                     THEN 1 ELSE 0 END AS is_current
         FROM f""",

    "w19_rolling_zscore" ->
      """WITH b AS (SELECT event_id,
                           CAST(ROUND(value * 100, 0) AS BIGINT) AS x,
                           COUNT(*) OVER w AS n,
                           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w
                             AS s,
                           SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                               * CAST(ROUND(value * 100, 0) AS BIGINT))
                             OVER w AS ss
                    FROM events WHERE value IS NOT NULL
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         SELECT event_id,
                CASE WHEN n >= 2 AND n * ss - s * s > 0 THEN
                  ROUND(CAST(n * x - s AS DOUBLE)
                        / SQRT(CAST(n * ss - s * s AS DOUBLE) * n / (n - 1)),
                    6)
                END + 0.0 AS z
         FROM b""",

    // the q01 quality predicate + d01 fingerprint + d10 minhash/LSH/
    // components + d09 decontam shingles + ml04 pack cumsum, composed
    // over the SAME surviving set at each stage
    "e2e_corpus_curate" ->
      """WITH RECURSIVE
         base AS (SELECT doc_id, source, lang, text,
                         STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                  FROM documents WHERE doc_id % 37 <> 0),
         qual AS (SELECT doc_id, source, text, toks FROM (
                    SELECT *, LEN(toks) AS n,
                           LEN(LIST_FILTER(toks,
                             x -> x IN ('the','a','of','and','to')))
                             AS nstop
                    FROM base)
                  WHERE lang = 'en' AND n BETWEEN 20 AND 500
                    AND nstop * 1.0 / n < 0.4),
         exk AS (SELECT MIN(doc_id) AS doc_id FROM qual
                 GROUP BY MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ',
                   'g'))),
         exd AS (SELECT q.* FROM qual q JOIN exk USING (doc_id)),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM exd),
         sig AS (SELECT doc_id, sh,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('0:' || x))) AS m00,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('1:' || x))) AS m01,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('2:' || x))) AS m02,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('3:' || x))) AS m03,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('4:' || x))) AS m04,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('5:' || x))) AS m05,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('6:' || x))) AS m06,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('7:' || x))) AS m07,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('8:' || x))) AS m08,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('9:' || x))) AS m09,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('10:' || x))) AS m10,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('11:' || x))) AS m11
           FROM s),
         bands AS (
           SELECT doc_id, 0 AS band, MD5(m00 || '|' || m01) AS band_key FROM sig
           UNION ALL SELECT doc_id, 1, MD5(m02 || '|' || m03) FROM sig
           UNION ALL SELECT doc_id, 2, MD5(m04 || '|' || m05) FROM sig
           UNION ALL SELECT doc_id, 3, MD5(m06 || '|' || m07) FROM sig
           UNION ALL SELECT doc_id, 4, MD5(m08 || '|' || m09) FROM sig
           UNION ALL SELECT doc_id, 5, MD5(m10 || '|' || m11) FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key
                   AND a.doc_id < b.doc_id),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         sizes AS (SELECT doc_id, LEN(sh) AS n FROM s),
         inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS cnt
                   FROM cand c JOIN ex a ON a.doc_id = c.id_a
                     JOIN ex b ON b.doc_id = c.id_b AND b.sg = a.sg
                   GROUP BY 1, 2),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
           WHERE cnt * 1.0 / (sa.n + sb.n - cnt) >= 0.5),
         und AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT a, b FROM und
           UNION
           SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id
                  FROM reach GROUP BY a),
         nd AS (SELECT e.* FROM exd e
                WHERE e.doc_id NOT IN (SELECT doc_id FROM comp
                                       WHERE doc_id <> canonical_id)),
         s5 AS (SELECT doc_id, CASE WHEN LEN(toks) >= 5 THEN
                  LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 4),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         || ' ' || toks[i+3] || ' ' || toks[i+4]))
                  ELSE [] END AS sh
                FROM nd),
         bsh AS (SELECT DISTINCT UNNEST(CASE WHEN LEN(toks) >= 5 THEN
                   LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 4),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                          || ' ' || toks[i+3] || ' ' || toks[i+4]))
                   ELSE [] END) AS sg
                 FROM (SELECT STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                       FROM documents WHERE doc_id % 37 = 0)),
         contaminated AS (SELECT DISTINCT s5.doc_id
                          FROM (SELECT doc_id, UNNEST(sh) AS sg FROM s5) s5
                          JOIN bsh ON bsh.sg = s5.sg),
         clean AS (SELECT nd.* FROM nd
                   WHERE nd.doc_id NOT IN (SELECT doc_id FROM contaminated)),
         packed AS (SELECT doc_id, source, LEN(toks) AS n_tokens
                    FROM clean)
         SELECT doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens,
                CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / 256.0) AS INTEGER) AS bin_id
         FROM packed""",

    // v03b assignment + v06b probe selection + v08 ADC, composed: the
    // candidate set is (probe clusters ∋ neighbor's cell) — same rounded
    // ranks and tie pins as the three building-block oracles
    "v11_ivf_pq" ->
      s"""WITH e AS (SELECT vec_id,
                          LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))
                            AS v
                   FROM embeddings),
          cent(cluster, cv) AS (VALUES $fixedCentroidsSqlValues),
          cb(j, cc, cw) AS (VALUES $pqCodebookSqlValues),
          cd AS (SELECT vec_id, cluster,
                        LIST_SUM(LIST_TRANSFORM(range(1, 65), i ->
                          (v[i] - CAST(cv[i] AS DOUBLE))
                          * (v[i] - CAST(cv[i] AS DOUBLE)))) AS dist
                 FROM e CROSS JOIN cent),
          assign AS (SELECT vec_id, cluster FROM (
                       SELECT vec_id, cluster,
                              ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist ASC, cluster ASC) AS rn
                       FROM cd) WHERE rn = 1),
          probes AS (SELECT vec_id AS query_id, cluster FROM (
                       SELECT vec_id, cluster,
                              ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist ASC, cluster ASC) AS rn
                       FROM cd WHERE vec_id < 8) WHERE rn <= 2),
          pqd AS (SELECT e.vec_id, cb.j, cb.cc,
                         LIST_SUM(LIST_TRANSFORM(range(1, 9), t ->
                           (v[cb.j*8 + t] - CAST(cw[t] AS DOUBLE))
                           * (v[cb.j*8 + t] - CAST(cw[t] AS DOUBLE))))
                           AS dd
                  FROM e CROSS JOIN cb),
          enc AS (SELECT vec_id, j, cc AS code FROM (
                    SELECT vec_id, j, cc,
                           ROW_NUMBER() OVER (PARTITION BY vec_id, j
                             ORDER BY dd ASC, cc ASC) AS rn
                    FROM pqd) WHERE rn = 1),
          q AS (SELECT vec_id AS query_id, v AS qv FROM e
                WHERE vec_id < 8),
          cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
                   FROM probes p JOIN assign a ON a.cluster = p.cluster
                   WHERE a.vec_id <> p.query_id),
          term AS (SELECT q.query_id, cand.neighbor_id, en.j,
                          LIST_SUM(LIST_TRANSFORM(range(1, 9), t ->
                            (qv[en.j*8 + t] - CAST(cb.cw[t] AS DOUBLE))
                            * (qv[en.j*8 + t] - CAST(cb.cw[t] AS DOUBLE))))
                            AS dd
                   FROM cand
                   JOIN q ON q.query_id = cand.query_id
                   JOIN enc en ON en.vec_id = cand.neighbor_id
                   JOIN cb ON cb.j = en.j AND cb.cc = en.code),
          adc AS (SELECT query_id, neighbor_id,
                         ROUND(LIST_SUM(LIST(dd ORDER BY j)), 6) + 0.0 AS adc
                  FROM term GROUP BY 1, 2)
          SELECT query_id, neighbor_id, adc, CAST(rn AS INTEGER) AS rank
          FROM (SELECT query_id, neighbor_id, adc,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY adc ASC, neighbor_id ASC) AS rn
                FROM adc)
          WHERE rn <= 3""",

    "ts15_changepoint" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                               CAST(COUNT(*) AS BIGINT) AS v
                        FROM events GROUP BY 1, 2),
         b AS (SELECT user_id, day, v,
                      COUNT(*) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS n1,
                      SUM(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS s1,
                      COUNT(*) OVER (PARTITION BY user_id) AS n,
                      SUM(v) OVER (PARTITION BY user_id) AS s
               FROM daily
               WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         g AS (SELECT user_id, day, CAST(n AS BIGINT) AS n,
                      CAST(s1 * (n - n1) - (s - s1) * n1 AS DOUBLE)
                        * CAST(s1 * (n - n1) - (s - s1) * n1 AS DOUBLE)
                        / (CAST(n1 AS DOUBLE) * (n - n1) * n) AS gain
               FROM b WHERE n1 < n),
         r AS (SELECT user_id, day, n, gain,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY gain DESC, day ASC) AS rn
               FROM g)
         SELECT user_id, day AS cp_at, n AS n_points,
                ROUND(gain, 6) + 0.0 AS gain
         FROM r WHERE rn = 1""",

    // same exact-integer (n, Σx, Σx²) z assembly; NaN from a constant
    // series compares false against every breakpoint → 'd' on both
    // engines; seg = idx·8 // n mirrors the engine's div
    "ts16_sax" ->
      """WITH daily AS (SELECT user_id,
                               DATEDIFF('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) AS day,
                               CAST(COUNT(*) AS BIGINT) AS cnt
                        FROM events GROUP BY 1, 2),
         i AS (SELECT user_id, day, cnt,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY day) - 1 AS ix
               FROM daily),
         st AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(cnt) AS BIGINT) AS sx,
                       CAST(SUM(cnt * cnt) AS BIGINT) AS sxx
                FROM daily GROUP BY 1),
         sg AS (SELECT user_id, CAST(ix * 8 // n AS INTEGER) AS seg_no,
                       n, sx, sxx,
                       CAST(SUM(cnt) AS BIGINT) AS ss,
                       CAST(COUNT(*) AS BIGINT) AS sn
                FROM i JOIN st USING (user_id)
                GROUP BY 1, 2, 3, 4, 5),
         zz AS (SELECT user_id, seg_no,
                       n * sxx - sx * sx = 0 AS deg,
                       (CAST(ss AS DOUBLE) / sn - CAST(sx AS DOUBLE) / n)
                         / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) / n)
                         AS z
                FROM sg)
         SELECT user_id, seg_no,
                CASE WHEN deg THEN NULL ELSE ROUND(z, 6) + 0.0 END AS z_paa,
                CASE WHEN deg THEN NULL
                     WHEN z < -0.6745 THEN 'a'
                     WHEN z < 0.0 THEN 'b'
                     WHEN z < 0.6745 THEN 'c'
                     ELSE 'd' END AS symbol
         FROM zz""",

    "dq12_freshness_lag" ->
      """WITH ref AS (SELECT MAX(ts) AS r FROM events),
         l AS (SELECT event_type, EPOCH_US(r) - EPOCH_US(ts) AS lag
               FROM events, ref)
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                ROUND(QUANTILE_CONT(lag, 0.5) / 1e6, 6) + 0.0 AS lag_p50_s,
                ROUND(QUANTILE_CONT(lag, 0.95) / 1e6, 6) + 0.0 AS lag_p95_s
         FROM l GROUP BY 1""",

    "a42_trend_test" ->
      """WITH s AS (SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) - 1
                      AS w,
                           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                             AS y
                    FROM orders),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(y) AS BIGINT) AS r,
                      SUM(CAST(w * y AS HUGEINT)) AS a,
                      SUM(CAST(w AS HUGEINT)) AS b,
                      SUM(CAST(w * w AS HUGEINT)) AS c
               FROM s)
         SELECT n, r,
                CASE WHEN r > 0 AND r < n AND n * c - b * b > 0 THEN
                  ROUND(CAST(n * a - b * r AS DOUBLE)
                        * SQRT(CAST(n AS DOUBLE))
                        / SQRT(CAST(r * (n - r) * (n * c - b * b)
                                 AS DOUBLE)), 6)
                END + 0.0 AS z
         FROM t""",

    // same LCG / Poisson ladder / exact integer replica sums as
    // bootstrapMeanCi — u can never equal a threshold (k/(2³¹−1) is never
    // a terminating decimal), so the CASE ladder is engine-exact
    "a41_bootstrap_ci" ->
      """WITH r AS (SELECT ((event_id % 2147483647) + 2147483647)
                             % 2147483647 AS idm,
                           CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
                           t.range AS b
                    FROM events CROSS JOIN range(1, 201) t
                    WHERE event_type = 'purchase' AND value IS NOT NULL),
         w AS (SELECT b, cents,
                      CASE WHEN u < 0.367879441 THEN 0
                           WHEN u < 0.735758882 THEN 1
                           WHEN u < 0.919698603 THEN 2
                           WHEN u < 0.981011843 THEN 3
                           WHEN u < 0.996340153 THEN 4
                           ELSE 5 END AS w
               FROM (SELECT b, cents,
                            ((((idm * 1103515245 + 12345) % 2147483647 + b)
                              * 1103515245 + 12345)
                             % 2147483647) / 2147483647.0 AS u
                     FROM r)),
         m AS (SELECT b, SUM(CAST(w * cents AS HUGEINT)) AS s,
                      CAST(SUM(w) AS BIGINT) AS n
               FROM w GROUP BY b),
         mm AS (SELECT CAST(s AS DOUBLE) / n / 100.0 AS mean_b
                FROM m WHERE n > 0)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
                ROUND(QUANTILE_CONT(mean_b, 0.025), 6) + 0.0 AS ci_lo,
                ROUND(QUANTILE_CONT(mean_b, 0.975), 6) + 0.0 AS ci_hi
         FROM mm""",

    "dq11_referential_audit" ->
      """WITH a AS (SELECT 'orders.custkey' AS relation,
                           CAST(COUNT(*) AS BIGINT) AS n_rows,
                           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1
                                    ELSE 0 END) AS BIGINT) AS n_orphans
                    FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey
                                             FROM customer) c
                      ON o.o_custkey = c.c_custkey),
         b AS (SELECT 'lineitem.partkey' AS relation,
                      CAST(COUNT(*) AS BIGINT) AS n_rows,
                      CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1
                               ELSE 0 END) AS BIGINT) AS n_orphans
               FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey
                                          FROM part) p
                 ON l.l_partkey = p.p_partkey),
         c AS (SELECT 'events.user_id' AS relation,
                      CAST(COUNT(*) AS BIGINT) AS n_rows,
                      CAST(SUM(CASE WHEN cu.c_custkey IS NULL THEN 1
                               ELSE 0 END) AS BIGINT) AS n_orphans
               FROM events e LEFT JOIN (SELECT DISTINCT c_custkey
                                        FROM customer) cu
                 ON e.user_id = cu.c_custkey),
         u AS (SELECT * FROM a UNION ALL SELECT * FROM b
               UNION ALL SELECT * FROM c)
         SELECT relation, n_rows, n_orphans,
                ROUND(n_orphans * 1.0 / n_rows, 6) + 0.0 AS orphan_rate
         FROM u""",

    "t31_script_ratios" ->
      """SELECT doc_id,
                ROUND((LEN(text) - LEN(REGEXP_REPLACE(text, '[a-zA-Z]', '',
                  'g'))) * 1.0 / LEN(text), 6) + 0.0 AS letter_ratio,
                ROUND((LEN(text) - LEN(REGEXP_REPLACE(text, '[A-Z]', '',
                  'g'))) * 1.0 / LEN(text), 6) + 0.0 AS upper_ratio,
                ROUND((LEN(text) - LEN(REGEXP_REPLACE(text, '[0-9]', '',
                  'g'))) * 1.0 / LEN(text), 6) + 0.0 AS digit_ratio,
                ROUND((LEN(text) - LEN(REGEXP_REPLACE(text, '\s', '',
                  'g'))) * 1.0 / LEN(text), 6) + 0.0 AS space_ratio,
                ROUND((LEN(text) - LEN(REGEXP_REPLACE(text,
                  '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0 / LEN(text), 6) + 0.0
                  AS other_ratio
         FROM documents WHERE text IS NOT NULL AND LEN(text) > 0""",

    // dominance cleanup (a05 construction) + QUANTILE_CONT clamp (a06) on
    // the cohort-scoped events
    "e2e_features_clean" ->
      s"""WITH $e2eBaseCtes,
         cnts AS (SELECT itemid, uom, COUNT(*) AS c FROM ev GROUP BY 1, 2),
         stats AS (SELECT itemid, uom AS mode_uom,
                          c * 1.0 / SUM(c) OVER (PARTITION BY itemid)
                            AS share,
                          COUNT(*) OVER (PARTITION BY itemid) AS ndist,
                          ROW_NUMBER() OVER (PARTITION BY itemid
                            ORDER BY c DESC, uom ASC) AS rn
                   FROM cnts),
         uomclean AS (SELECT e.* FROM ev e
                      JOIN (SELECT * FROM stats WHERE rn = 1) s
                        USING (itemid)
                      WHERE NOT (s.ndist > 1 AND s.share > 0.5
                                 AND e.uom <> s.mode_uom)),
         bounds AS (SELECT itemid,
                           QUANTILE_CONT(val_cents, 0.02) AS lo,
                           QUANTILE_CONT(val_cents, 0.98) AS hi
                    FROM uomclean GROUP BY 1)
         SELECT hadm_id, itemid, event_offset_h, uom,
                ROUND(LEAST(GREATEST(val_cents, lo), hi), 4) + 0.0 AS val_clamped
         FROM uomclean JOIN bounds USING (itemid)""",

    // top-25 keep-list semi, 24h bucket means (integer cents — exact),
    // full-grid densify, LAST/FIRST_VALUE IGNORE NULLS ffill→bfill, mean
    // fallback (dead by construction: every pair has ≥1 observation)
    "e2e_stay_tensors" ->
      s"""WITH $e2eBaseCtes,
         keep AS (SELECT itemid FROM (
                    SELECT itemid, COUNT(*) AS c FROM ev GROUP BY 1)
                  ORDER BY c DESC, itemid ASC LIMIT 25),
         sel AS (SELECT e.* FROM ev e JOIN keep USING (itemid)),
         bucketed AS (SELECT hadm_id, itemid,
                             CAST(FLOOR(event_offset_h / 24) AS BIGINT)
                               AS bucket,
                             AVG(val_cents) AS value
                      FROM sel WHERE event_offset_h < 720
                      GROUP BY 1, 2, 3),
         pairs AS (SELECT DISTINCT hadm_id, itemid FROM bucketed),
         grid AS (SELECT p.hadm_id, p.itemid, r.range AS bucket
                  FROM pairs p CROSS JOIN range(0, 30) r),
         dense AS (SELECT g.hadm_id, g.itemid, g.bucket, b.value
                   FROM grid g
                   LEFT JOIN bucketed b USING (hadm_id, itemid, bucket)),
         ff AS (SELECT *, LAST_VALUE(value IGNORE NULLS) OVER (
                  PARTITION BY hadm_id, itemid ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
                FROM dense),
         fb AS (SELECT *, FIRST_VALUE(f IGNORE NULLS) OVER (
                  PARTITION BY hadm_id, itemid ORDER BY bucket
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fbv
                FROM ff)
         SELECT hadm_id, itemid, bucket,
                ROUND(COALESCE(fbv, AVG(value) OVER (
                  PARTITION BY hadm_id, itemid)) / 100.0, 4) + 0.0 AS val_imputed
         FROM fb""",

    // the mortality gate: los_h >= 72 + 48 eligibility, unshifted
    // first-window clip at offset < 72
    "e2e_stay_tensors_mortality" ->
      s"""WITH $e2eBaseCtes,
         keep AS (SELECT itemid FROM (
                    SELECT itemid, COUNT(*) AS c FROM ev GROUP BY 1)
                  ORDER BY c DESC, itemid ASC LIMIT 25),
         sel AS (SELECT e.* FROM ev e JOIN keep USING (itemid)),
         los AS (SELECT hadm_id,
                        CAST(FLOOR(EPOCH(dischtime - admittime) / 3600)
                          AS BIGINT) AS los_h
                 FROM cohort),
         gated AS (SELECT e.hadm_id, e.itemid, e.event_offset_h AS off,
                          e.val_cents
                   FROM sel e JOIN los l USING (hadm_id)
                   WHERE l.los_h >= 120),
         bucketed AS (SELECT hadm_id, itemid,
                             CAST(FLOOR(off / 24) AS BIGINT) AS bucket,
                             AVG(val_cents) AS value
                      FROM gated WHERE off < 72
                      GROUP BY 1, 2, 3),
         pairs AS (SELECT DISTINCT hadm_id, itemid FROM bucketed),
         grid AS (SELECT p.hadm_id, p.itemid, r.range AS bucket
                  FROM pairs p CROSS JOIN range(0, 3) r),
         dense AS (SELECT g.hadm_id, g.itemid, g.bucket, b.value
                   FROM grid g
                   LEFT JOIN bucketed b USING (hadm_id, itemid, bucket)),
         ff AS (SELECT *, LAST_VALUE(value IGNORE NULLS) OVER (
                  PARTITION BY hadm_id, itemid ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
                FROM dense),
         fb AS (SELECT *, FIRST_VALUE(f IGNORE NULLS) OVER (
                  PARTITION BY hadm_id, itemid ORDER BY bucket
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fbv
                FROM ff)
         SELECT hadm_id, itemid, bucket,
                ROUND(COALESCE(fbv, AVG(value) OVER (
                  PARTITION BY hadm_id, itemid)) / 100.0, 4) + 0.0 AS val_imputed
         FROM fb""",

    // the last-window variant: per-stay select_time = los_h - 72 shifts
    // offsets, pre-window events drop, los_h < 72 stays are ineligible
    "e2e_stay_tensors_readmit" ->
      s"""WITH $e2eBaseCtes,
         keep AS (SELECT itemid FROM (
                    SELECT itemid, COUNT(*) AS c FROM ev GROUP BY 1)
                  ORDER BY c DESC, itemid ASC LIMIT 25),
         sel AS (SELECT e.* FROM ev e JOIN keep USING (itemid)),
         los AS (SELECT hadm_id,
                        CAST(FLOOR(EPOCH(dischtime - admittime) / 3600)
                          AS BIGINT) AS los_h
                 FROM cohort),
         shifted AS (SELECT e.hadm_id, e.itemid,
                            e.event_offset_h - (l.los_h - 72) AS off,
                            e.val_cents
                     FROM sel e JOIN los l USING (hadm_id)
                     WHERE l.los_h >= 72),
         bucketed AS (SELECT hadm_id, itemid,
                             CAST(FLOOR(off / 24) AS BIGINT) AS bucket,
                             AVG(val_cents) AS value
                      FROM shifted WHERE off >= 0 AND off < 72
                      GROUP BY 1, 2, 3),
         pairs AS (SELECT DISTINCT hadm_id, itemid FROM bucketed),
         grid AS (SELECT p.hadm_id, p.itemid, r.range AS bucket
                  FROM pairs p CROSS JOIN range(0, 3) r),
         dense AS (SELECT g.hadm_id, g.itemid, g.bucket, b.value
                   FROM grid g
                   LEFT JOIN bucketed b USING (hadm_id, itemid, bucket)),
         ff AS (SELECT *, LAST_VALUE(value IGNORE NULLS) OVER (
                  PARTITION BY hadm_id, itemid ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
                FROM dense),
         fb AS (SELECT *, FIRST_VALUE(f IGNORE NULLS) OVER (
                  PARTITION BY hadm_id, itemid ORDER BY bucket
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fbv
                FROM ff)
         SELECT hadm_id, itemid, bucket,
                ROUND(COALESCE(fbv, AVG(value) OVER (
                  PARTITION BY hadm_id, itemid)) / 100.0, 4) + 0.0 AS val_imputed
         FROM fb""",

    // readmission meds: shift by select_time, stop >= 0 keeps the
    // straddler (start < 0 → 0), then bucket-grid active mask — integer
    // ceil as (stop + 23) // 24, mirroring the Spark `div`
    "e2e_stay_tensors_readmit_meds" ->
      s"""WITH $e2eBaseCtes,
         keep AS (SELECT itemid FROM (
                    SELECT itemid, COUNT(*) AS c FROM ev GROUP BY 1)
                  ORDER BY c DESC, itemid ASC LIMIT 25),
         meds AS (SELECT e.hadm_id, e.itemid,
                         e.event_offset_h % 497 AS start_h,
                         e.event_offset_h % 497 + (e.itemid % 96 + 1)
                           AS stop_h
                  FROM ev e JOIN keep USING (itemid)),
         los AS (SELECT hadm_id,
                        CAST(FLOOR(EPOCH(dischtime - admittime) / 3600)
                          AS BIGINT) AS los_h
                 FROM cohort),
         shifted AS (SELECT m.hadm_id, m.itemid,
                            m.start_h - (l.los_h - 72) AS s0,
                            m.stop_h - (l.los_h - 72) AS e0
                     FROM meds m JOIN los l USING (hadm_id)
                     WHERE l.los_h >= 72),
         clipped AS (SELECT hadm_id, itemid,
                            CASE WHEN s0 < 0 THEN 0 ELSE s0 END AS start_h,
                            e0 AS stop_h
                     FROM shifted WHERE e0 >= 0),
         sparse AS (SELECT hadm_id, itemid,
                           CAST(FLOOR(start_h / 24) AS BIGINT) AS bucket,
                           MAX((stop_h + 23) // 24) AS stop_b
                    FROM clipped WHERE start_h < 72
                    GROUP BY 1, 2, 3),
         pairs AS (SELECT DISTINCT hadm_id, itemid FROM sparse),
         grid AS (SELECT p.hadm_id, p.itemid, r.range AS bucket
                  FROM pairs p CROSS JOIN range(0, 3) r),
         dense AS (SELECT g.hadm_id, g.itemid, g.bucket, s.stop_b
                   FROM grid g
                   LEFT JOIN sparse s USING (hadm_id, itemid, bucket)),
         ff AS (SELECT *, LAST_VALUE(stop_b IGNORE NULLS) OVER (
                  PARTITION BY hadm_id, itemid ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs
                FROM dense)
         SELECT hadm_id, itemid, bucket,
                CASE WHEN fs IS NOT NULL AND fs > bucket THEN 1 ELSE 0 END
                  AS active
         FROM ff""",

    // mortality meds: los >= 72+48 gate, start <= 72 keeps, stop clamps
    // to 72 (the least-clip), same active-mask tail
    "e2e_stay_tensors_mortality_meds" ->
      s"""WITH $e2eBaseCtes,
         keep AS (SELECT itemid FROM (
                    SELECT itemid, COUNT(*) AS c FROM ev GROUP BY 1)
                  ORDER BY c DESC, itemid ASC LIMIT 25),
         meds AS (SELECT e.hadm_id, e.itemid,
                         e.event_offset_h % 497 AS start_h,
                         e.event_offset_h % 497 + (e.itemid % 96 + 1)
                           AS stop_h
                  FROM ev e JOIN keep USING (itemid)),
         los AS (SELECT hadm_id,
                        CAST(FLOOR(EPOCH(dischtime - admittime) / 3600)
                          AS BIGINT) AS los_h
                 FROM cohort),
         gated AS (SELECT m.* FROM meds m JOIN los l USING (hadm_id)
                   WHERE l.los_h >= 120),
         clipped AS (SELECT hadm_id, itemid, start_h,
                            CASE WHEN stop_h > 72 THEN 72 ELSE stop_h END
                              AS stop_h
                     FROM gated WHERE start_h <= 72),
         sparse AS (SELECT hadm_id, itemid,
                           CAST(FLOOR(start_h / 24) AS BIGINT) AS bucket,
                           MAX((stop_h + 23) // 24) AS stop_b
                    FROM clipped WHERE start_h < 72
                    GROUP BY 1, 2, 3),
         pairs AS (SELECT DISTINCT hadm_id, itemid FROM sparse),
         grid AS (SELECT p.hadm_id, p.itemid, r.range AS bucket
                  FROM pairs p CROSS JOIN range(0, 3) r),
         dense AS (SELECT g.hadm_id, g.itemid, g.bucket, s.stop_b
                   FROM grid g
                   LEFT JOIN sparse s USING (hadm_id, itemid, bucket)),
         ff AS (SELECT *, LAST_VALUE(stop_b IGNORE NULLS) OVER (
                  PARTITION BY hadm_id, itemid ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs
                FROM dense)
         SELECT hadm_id, itemid, bucket,
                CASE WHEN fs IS NOT NULL AND fs > bucket THEN 1 ELSE 0 END
                  AS active
         FROM ff""",

    "s11_jsonl_roundtrip" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY lang""",

    "ml06_token_budget" ->
      """WITH t AS (SELECT doc_id, n_chars,
                CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS BIGINT) AS n_toks
              FROM documents),
         c AS (SELECT doc_id, n_toks,
                CAST(SUM(n_toks) OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS cum_toks
               FROM t)
         SELECT doc_id, n_toks, cum_toks FROM c WHERE cum_toks <= 8000""",

    "t16_source_entropy" ->
      """WITH tok AS (SELECT source,
                UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
              FROM documents),
         c AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2)
         SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
                CAST(COUNT(*) AS BIGINT) AS n_types,
                ROUND(LN(SUM(c))
                      - CAST(SUM(CAST(c AS HUGEINT)
                                 * CAST(ROUND(LN(c) * 1e12, 0) AS BIGINT))
                          AS DOUBLE) / 1e12 / SUM(c), 6) + 0.0 AS entropy
         FROM c GROUP BY source""",

    "t17_dup_ngrams" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         g AS (SELECT doc_id,
                      UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 4),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                             toks[i+3] || ' ' || toks[i+4])) AS g
               FROM t WHERE LEN(toks) >= 5),
         nd AS (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
         SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                CAST(SUM(CASE WHEN nd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
                ROUND(AVG(CASE WHEN nd.nd >= 2 THEN 1.0 ELSE 0.0 END), 6) + 0.0 AS dup_fraction
         FROM g JOIN nd USING (g) GROUP BY g.doc_id""",

    "w12_ewma" ->
      """SELECT event_id, user_id,
           ROUND((COALESCE(value * 1.0, 0)
                + COALESCE(LAG(value, 1) OVER w * 0.5, 0)
                + COALESCE(LAG(value, 2) OVER w * 0.25, 0)
                + COALESCE(LAG(value, 3) OVER w * 0.125, 0)
                + COALESCE(LAG(value, 4) OVER w * 0.0625, 0)
                + COALESCE(LAG(value, 5) OVER w * 0.03125, 0)
                + COALESCE(LAG(value, 6) OVER w * 0.015625, 0)
                + COALESCE(LAG(value, 7) OVER w * 0.0078125, 0))
             / (CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END
                + CASE WHEN LAG(value, 1) OVER w IS NOT NULL THEN 0.5 ELSE 0.0 END
                + CASE WHEN LAG(value, 2) OVER w IS NOT NULL THEN 0.25 ELSE 0.0 END
                + CASE WHEN LAG(value, 3) OVER w IS NOT NULL THEN 0.125 ELSE 0.0 END
                + CASE WHEN LAG(value, 4) OVER w IS NOT NULL THEN 0.0625 ELSE 0.0 END
                + CASE WHEN LAG(value, 5) OVER w IS NOT NULL THEN 0.03125 ELSE 0.0 END
                + CASE WHEN LAG(value, 6) OVER w IS NOT NULL THEN 0.015625 ELSE 0.0 END
                + CASE WHEN LAG(value, 7) OVER w IS NOT NULL THEN 0.0078125 ELSE 0.0 END), 6) + 0.0
             AS ewma8
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",

    "q02_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
                CAST(FLOOR(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7)
                  AS INTEGER) AS wk
              FROM events),
         first AS (SELECT user_id, MIN(wk) AS cohort_wk FROM wk GROUP BY 1)
         SELECT f.cohort_wk, w.wk - f.cohort_wk AS week_offset,
                CAST(COUNT(*) AS BIGINT) AS n_users
         FROM wk w JOIN first f USING (user_id)
         GROUP BY 1, 2""",

    "a19_behavior_entropy" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS c
                    FROM events GROUP BY 1, 2)
         SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
                CAST(COUNT(*) AS BIGINT) AS n_types,
                ROUND(LN(SUM(c))
                      - CAST(SUM(CAST(c AS HUGEINT)
                                 * CAST(ROUND(LN(c) * 1e12, 0) AS BIGINT))
                          AS DOUBLE) / 1e12 / SUM(c), 6) + 0.0 AS entropy
         FROM c GROUP BY user_id""",

    "t18_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
                      FROM documents),
         c AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY 1),
         st AS (SELECT CAST(SUM(c) AS DOUBLE) AS n, CAST(COUNT(*) AS DOUBLE) AS v FROM c),
         p AS (SELECT tok, (CAST(c AS DOUBLE) + 1.0) / (n + v) AS p
               FROM c CROSS JOIN st)
         SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
                ROUND(AVG(-LN(p.p)), 6) + 0.0 AS avg_nll
         FROM tok t JOIN p USING (tok) GROUP BY t.doc_id""",

    "o05_topk_per_group" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
                  ORDER BY l_extendedprice DESC, l_orderkey,
                           l_orderkey * 10 + l_linenumber) AS INTEGER) AS rk
         FROM lineitem
         QUALIFY rk <= 3""",

    "ml07_mix_weights" ->
      """WITH s AS (SELECT source,
                CAST(SUM(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+'))) AS BIGINT) AS n_toks
              FROM documents GROUP BY 1),
         t AS (SELECT CAST(SUM(n_toks) AS DOUBLE) AS total,
                      CAST(COUNT(*) AS DOUBLE) AS k FROM s)
         SELECT source, n_toks, ROUND(n_toks / total, 6) + 0.0 AS share,
                ROUND(total / (k * n_toks), 6) + 0.0 AS weight
         FROM s CROSS JOIN t""",

    "ml11_interleave" ->
      """WITH r AS (
           SELECT doc_id, lang,
                  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS src_rank
           FROM documents),
         v AS (
           SELECT doc_id, lang, src_rank,
                  (src_rank - 0.5) / CASE lang
                    WHEN 'en' THEN 0.4 WHEN 'zh' THEN 0.15 WHEN 'es' THEN 0.15
                    WHEN 'de' THEN 0.15 WHEN 'fr' THEN 0.15 ELSE 1.0 END AS vt
           FROM r)
         SELECT doc_id, lang, CAST(src_rank AS BIGINT) AS src_rank,
                CAST(ROW_NUMBER() OVER (ORDER BY vt, lang, src_rank) AS BIGINT) AS pos
         FROM v""",

    "s01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45",

    "p02_null_filter" ->
      """SELECT e.event_id, e.user_id FROM events e
         WHERE e.event_type = 'click' AND NOT EXISTS (
           SELECT 1 FROM events s WHERE s.user_id = e.user_id AND s.event_type = 'signup'
             AND s.ts <= e.ts AND e.ts <= s.ts + INTERVAL 2 HOUR)""",

    "p06_semi_filter" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')""",

    "p09_dedup" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "p12_clip_overwrite" ->
      "SELECT l_orderkey, l_linenumber, LEAST(l_quantity, 25.0) AS qty_clip FROM lineitem",

    "p13_threshold_label" ->
      "SELECT o_orderkey, CASE WHEN o_totalprice >= 250000.0 THEN 1 ELSE 0 END AS label FROM orders",

    "j01_join_agg_revenue" ->
      """SELECT n_name, ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS revenue,
                CAST(COUNT(*) AS BIGINT) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",

    "j09_anti_join" ->
      """SELECT c_custkey FROM customer c WHERE NOT EXISTS (
           SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""",

    "j10_first_match_lookup" ->
      """WITH brand_map AS (
           SELECT p_brand, ARG_MIN(p_type, p_partkey) AS brand_type FROM part GROUP BY p_brand)
         SELECT p.p_partkey, m.brand_type FROM part p JOIN brand_map m ON p.p_brand = m.p_brand""",

    "j11_asof_interval" ->
      """SELECT e.event_id,
                (SELECT MAX(s.ts) FROM events s
                 WHERE s.user_id = e.user_id AND s.event_type = 'signup'
                   AND s.ts <= e.ts AND e.ts <= s.ts + INTERVAL 2 HOUR) AS session_start
         FROM events e WHERE e.event_type = 'click'""",

    "j12_next_within_gap" ->
      """SELECT o_orderkey,
                CASE WHEN nxt IS NOT NULL AND nxt <= o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END AS label
         FROM (SELECT o_orderkey, o_orderdate,
                      LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS nxt
               FROM orders)""",

    "j13_interval_label" ->
      """SELECT l_orderkey, l_linenumber,
                CASE WHEN l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END AS label
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",

    "j14_topk_semi" ->
      """WITH topk AS (
           SELECT l_partkey FROM (
             SELECT l_partkey, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, l_partkey ASC) AS rn
             FROM lineitem GROUP BY l_partkey) WHERE rn <= 25)
         SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
         WHERE l_partkey IN (SELECT l_partkey FROM topk)""",

    "a01_group_count" ->
      "SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_suppkey",

    "a02_mean_frequency" ->
      """SELECT l_partkey, ROUND(AVG(c), 6) + 0.0 AS mean_frequency FROM (
           SELECT l_orderkey, l_partkey, COUNT(*) AS c FROM lineitem GROUP BY 1, 2)
         GROUP BY l_partkey""",

    "a03_missing_rate" ->
      """SELECT l_returnflag,
                CAST(SUM(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS missing_count,
                CAST(COUNT(*) AS BIGINT) AS total_count,
                ROUND(SUM(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) + 0.0
                  AS missing_rate
         FROM lineitem GROUP BY l_returnflag""",

    "a04_multi_agg" ->
      """SELECT l_returnflag, l_linestatus,
                ROUND(SUM(l_quantity), 2) + 0.0 AS sum_qty,
                ROUND(SUM(l_extendedprice), 2) + 0.0 AS sum_base_price,
                ROUND(AVG(l_quantity), 6) + 0.0 AS avg_qty,
                MAX(l_shipdate) AS max_ship,
                CAST(COUNT(*) AS BIGINT) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "a05_mode_dominance" ->
      """WITH counts AS (
           SELECT l_partkey, l_returnflag, COUNT(*) AS c FROM lineitem GROUP BY 1, 2),
         stats AS (
           SELECT l_partkey, l_returnflag AS mode_flag,
                  c * 1.0 / SUM(c) OVER (PARTITION BY l_partkey) AS share,
                  COUNT(*) OVER (PARTITION BY l_partkey) AS ndist,
                  ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY c DESC, l_returnflag ASC) AS rn
           FROM counts)
         SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_returnflag
         FROM lineitem l JOIN (SELECT * FROM stats WHERE rn = 1) s ON l.l_partkey = s.l_partkey
         WHERE NOT (s.ndist > 1 AND s.share > 0.5 AND l.l_returnflag <> s.mode_flag)""",

    "a06_percentile_clamp" ->
      """WITH bounds AS (
           SELECT l_returnflag, QUANTILE_CONT(l_extendedprice, 0.02) AS lo,
                  QUANTILE_CONT(l_extendedprice, 0.98) AS hi
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_orderkey, l_linenumber,
                ROUND(LEAST(GREATEST(l_extendedprice, lo), hi), 2) + 0.0 AS price_clamped
         FROM lineitem JOIN bounds USING (l_returnflag)""",

    "a07_distinct_count" ->
      """SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
         FROM lineitem GROUP BY l_returnflag""",

    "a08_max_group_size" ->
      """SELECT CAST(MAX(c) AS BIGINT) AS max_group_size FROM (
           SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey)""",

    "a09_value_counts" ->
      "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY event_type",

    "a12_confusion_metrics" ->
      """WITH scored AS (
           SELECT CASE WHEN o_totalprice >= 250000.0 THEN 1 ELSE 0 END AS truth,
                  CASE WHEN COALESCE(n_items, 0) >= 4 THEN 1 ELSE 0 END AS pred
           FROM orders LEFT JOIN (
             SELECT l_orderkey AS o_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY 1)
           USING (o_orderkey))
         SELECT CAST(SUM(CASE WHEN truth = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(SUM(CASE WHEN truth = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(SUM(CASE WHEN truth = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
                CAST(SUM(CASE WHEN truth = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                ROUND((SUM(CASE WHEN truth = pred THEN 1 ELSE 0 END)) * 1.0 / COUNT(*), 6) + 0.0 AS accuracy,
                ROUND(SUM(CASE WHEN truth = 1 AND pred = 1 THEN 1 ELSE 0 END) * 1.0
                      / SUM(CASE WHEN pred = 1 THEN 1 ELSE 0 END), 6) + 0.0 AS precision_,
                ROUND(SUM(CASE WHEN truth = 1 AND pred = 1 THEN 1 ELSE 0 END) * 1.0
                      / SUM(CASE WHEN truth = 1 THEN 1 ELSE 0 END), 6) + 0.0 AS recall_
         FROM scored""",

    "a14_calibration_bins" ->
      """SELECT CAST(LEAST(FLOOR(l_discount * 10.0 * 10), 9) AS BIGINT) AS bin,
                ROUND(AVG(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END), 6) + 0.0 AS bin_accuracy,
                ROUND(AVG(l_discount * 10.0), 6) + 0.0 AS bin_confidence,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM lineitem GROUP BY 1""",

    "a15_auroc" ->
      """WITH r AS (
           SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS lab,
                  ROW_NUMBER() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn
           FROM orders)
         SELECT ROUND((SUM(CASE WHEN lab = 1 THEN rn ELSE 0 END) - SUM(lab) * (SUM(lab) + 1) / 2)
                * 1.0 / (SUM(lab) * (COUNT(*) - SUM(lab))), 6) + 0.0 AS auc
         FROM r""",

    // same fixed-point accumulation as the Spark side: each threshold term
    // is an exact correctly-rounded double, rounded to integer nanos and
    // summed as BIGINT, so engine/partition summation order cannot move the
    // 6-decimal result
    "a20_auprc" ->
      """WITH g AS (
           SELECT o_totalprice AS s,
                  SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS np,
                  COUNT(*) AS nt
           FROM orders GROUP BY 1),
         c AS (
           SELECT np,
                  SUM(np) OVER (ORDER BY s DESC) AS tp,
                  SUM(nt) OVER (ORDER BY s DESC) AS al
           FROM g)
         SELECT ROUND(SUM(CAST(ROUND(np * tp * 1.0 / al * 1e9, 0) AS BIGINT)) / 1e9
                      / (SELECT SUM(np) FROM g), 6) + 0.0 AS auprc
         FROM c""",

    "a22_gains_deciles" ->
      """WITH r AS (
           SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
                  ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders),
         t AS (SELECT COUNT(*) AS n, SUM(y) AS p FROM r),
         d AS (SELECT CAST(((rn - 1) * 10) // n AS INTEGER) AS decile, y
               FROM r CROSS JOIN t)
         SELECT decile, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
                ROUND(SUM(y) * 1.0 / COUNT(*), 6) + 0.0 AS pos_rate,
                ROUND((SUM(y) * 1.0 / COUNT(*))
                      / ((SELECT p FROM t) * 1.0 / (SELECT n FROM t)), 6) + 0.0 AS lift
         FROM d GROUP BY 1""",

    "w02_group_max_year" ->
      """SELECT o_orderkey,
                CAST(MAX(EXTRACT(year FROM o_orderdate)) OVER (PARTITION BY o_custkey) AS INTEGER)
                  AS max_year
         FROM orders""",

    "w03_ffill_bfill" ->
      """SELECT event_id,
                ROUND(LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) + 0.0 AS ffill_value,
                ROUND(FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 2) + 0.0 AS bfill_value
         FROM (SELECT event_id, user_id, ts,
                      CASE WHEN event_type = 'purchase' THEN value END AS v
               FROM events)""",

    "w08_lag_gap" ->
      """SELECT o_orderkey,
                CAST(DATE_DIFF('day', prev, o_orderdate) AS INTEGER) AS gap_days,
                CAST(COALESCE(DATE_DIFF('day', prev, o_orderdate), -1) AS INTEGER) AS gap_days_filled
         FROM (SELECT o_orderkey, o_orderdate,
                      LAG(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS prev
               FROM orders)""",

    "f19_quantile_bin" ->
      """SELECT o_orderkey,
                CAST(NTILE(4) OVER (PARTITION BY o_orderstatus
                  ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
         FROM orders""",

    // explicit rank-pick mirror of the type-7 interpolation (not
    // QUANTILE_CONT — the op-for-op expression is the contract):
    // h = (n−1)i/32 + 1, split = v_lo + (rem/32)·(v_hi − v_lo)
    "o07_range_splits" ->
      """WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
                    FROM lineitem WHERE l_extendedprice IS NOT NULL),
         r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn FROM v),
         n AS (SELECT COUNT(*) AS n FROM v),
         s AS (SELECT i AS split_no,
                      ((n - 1) * i) % 32 AS rem,
                      ((n - 1) * i - ((n - 1) * i) % 32) // 32 + 1 AS lo
               FROM (SELECT UNNEST(GENERATE_SERIES(1, 31)) AS i)
               CROSS JOIN n)
         SELECT CAST(split_no AS INTEGER) AS split_no,
                ROUND(vlo.x + (CAST(rem AS DOUBLE) / 32.0)
                  * (COALESCE(vhi.x, vlo.x) - vlo.x), 6) + 0.0 AS split
         FROM s JOIN r vlo ON vlo.rn = s.lo
                LEFT JOIN r vhi ON vhi.rn = s.lo + 1""",

    "o04_topk" ->
      """SELECT l_partkey, cnt FROM (
           SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt,
                  ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, l_partkey ASC) AS rn
           FROM lineitem GROUP BY l_partkey)
         WHERE rn <= 10""",

    "u01_union_label" ->
      """SELECT o_orderkey, 'hi' AS seg FROM orders WHERE o_totalprice > 400000.0
         UNION ALL
         SELECT o_orderkey, 'lo' AS seg FROM orders WHERE o_totalprice < 50000.0""",

    "u03_densify_missing" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         full_grid AS (SELECT user_id, d AS missing_day
                       FROM u CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 29)) AS d)),
         obs AS (SELECT DISTINCT user_id,
                        CAST(DATE_DIFF('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS d
                 FROM events)
         SELECT g.user_id, g.missing_day FROM full_grid g
         LEFT JOIN obs o ON g.user_id = o.user_id AND g.missing_day = o.d
         WHERE o.user_id IS NULL""",

    "u04_except_ids" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'""",

    "f02_floor_hours" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(FLOOR(EPOCH(l_shipdate - o_orderdate) / 3600) AS BIGINT) AS ship_hours
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",

    "f09_string_norm" ->
      """SELECT p_partkey, REPLACE(LOWER(TRIM(p_name)), ' ', '_') AS norm_name,
                SUBSTRING(p_brand, 7, 2) AS brand_suffix
         FROM part""",

    "f14_hof_filter" ->
      """SELECT p_partkey,
                COALESCE(ARRAY_TO_STRING(LIST_FILTER(STRING_SPLIT(p_name, ' '),
                  x -> CONTAINS(x, 'e')), ','), '') AS e_tokens
         FROM part""",

    "f20_decade_bin" ->
      """SELECT event_id,
                CONCAT(CAST(CAST(FLOOR(value / 10) * 10 AS BIGINT) AS VARCHAR), '-',
                       CAST(CAST(FLOOR(value / 10) * 10 + 9 AS BIGINT) AS VARCHAR)) AS value_decade
         FROM events""",

    "ml01_kfold_split" ->
      """SELECT o_orderkey,
                CAST(((o_orderkey * 2654435761) % 1000000007) % 5 AS INTEGER) AS fold
         FROM orders""",

    "ml02_oversample" ->
      """SELECT o_orderkey, CAST(i AS INTEGER) AS copy_id
         FROM orders CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 3)) AS i)
         WHERE i <= CASE WHEN o_totalprice > 400000.0 THEN 3 ELSE 1 END""",

    "ml03_hash_sample" ->
      """WITH h AS (
           SELECT doc_id, lang,
                  STRPOS('0123456789abcdef',
                    SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 AS h16
           FROM documents)
         SELECT doc_id, lang, CAST(h16 AS INTEGER) AS h16 FROM h
         WHERE h16 < CASE lang WHEN 'en' THEN 4 WHEN 'zh' THEN 8 ELSE 12 END""",

    "ml04_pack_bins" ->
      """WITH t AS (
           SELECT doc_id, source,
                  LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS n_tokens
           FROM documents)
         SELECT doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens,
                CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) / 256.0) AS INTEGER) AS bin_id
         FROM t""",

    "w09_rolling_hour" ->
      """SELECT event_id, user_id,
                ROUND(AVG(value) OVER w, 6) + 0.0 AS roll_avg,
                CAST(COUNT(value) OVER w AS BIGINT) AS roll_n
         FROM events
         WINDOW w AS (PARTITION BY user_id
           ORDER BY DATE_DIFF('second', TIMESTAMP '1970-01-01', ts)
           RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""",

    "v04_centroid" ->
      """WITH e AS (
           SELECT label,
                  UNNEST(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))) AS v,
                  UNNEST(GENERATE_SERIES(0, LEN(embedding) - 1)) AS pos
           FROM embeddings)
         SELECT label, CAST(pos AS INTEGER) AS pos,
                ROUND(AVG(v), 6) + 0.0 AS mean_v
         FROM e GROUP BY 1, 2""",

    "t13_chunk" ->
      """WITH t AS (
           SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, toks, LEN(toks) AS n,
                  UNNEST(GENERATE_SERIES(0,
                    CAST(FLOOR((LEN(toks) - 1) / 32.0) AS INTEGER))) AS chunk_idx
           FROM t)
         SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
                ARRAY_TO_STRING(
                  toks[chunk_idx * 32 + 1 : LEAST(chunk_idx * 32 + 32, n)], ' ')
                  AS chunk_text,
                CAST(LEAST(n - chunk_idx * 32, 32) AS INTEGER) AS chunk_tokens
         FROM c""",

    "q01_funnel" ->
      """WITH f AS (
           SELECT lang, n_chars,
                  LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS n,
                  LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\s+'),
                    x -> x IN ('the','a','of','and','to'))) AS n_stop
           FROM documents)
         SELECT '00_all' AS stage, COUNT(*) AS survivors FROM f
         UNION ALL
         SELECT '10_lang_en', COUNT(*) FROM f WHERE lang = 'en'
         UNION ALL
         SELECT '20_len', COUNT(*) FROM f
         WHERE lang = 'en' AND n_chars BETWEEN 100 AND 400
         UNION ALL
         SELECT '30_quality', COUNT(*) FROM f
         WHERE lang = 'en' AND n_chars BETWEEN 100 AND 400
           AND n BETWEEN 20 AND 500 AND n_stop * 1.0 / n < 0.4""",

    "dq02_outliers" ->
      """WITH s AS (SELECT event_type, AVG(value) AS mu,
                           STDDEV_SAMP(value) AS sd
                    FROM events GROUP BY 1)
         SELECT event_id, e.event_type, ROUND((value - mu) / sd, 6) + 0.0 AS z
         FROM events e JOIN s USING (event_type)
         WHERE ABS((value - mu) / sd) > 2.5""",

    "a18_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS revenue,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "u06_funnel_stages" ->
      """WITH m AS (
           SELECT user_id,
                  MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                  MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                  MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
           FROM events
           WHERE event_type IN ('signup', 'click', 'purchase')
           GROUP BY 1)
         SELECT '00_any' AS stage, COUNT(*) AS users FROM m
         UNION ALL
         SELECT '10_signup', COUNT(*) FROM m WHERE t_signup IS NOT NULL
         UNION ALL
         SELECT '20_then_click', COUNT(*) FROM m WHERE t_signup < t_click
         UNION ALL
         SELECT '30_then_purchase', COUNT(*) FROM m
         WHERE t_signup < t_click AND t_click < t_purchase""",

    "d11_sparse_cosine" ->
      """WITH t AS (
           SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         toks AS (
           SELECT doc_id, UNNEST(CASE WHEN LEN(toks) >= 3 THEN
             LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
             ELSE [] END) AS term
           FROM t),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT COUNT(*) AS n FROM documents),
         wts AS (SELECT doc_id, term,
                        tf * (LN((n + 1.0) / (df + 1.0)) + 1.0) AS w
                 FROM tf JOIN dfq USING (term) CROSS JOIN n),
         norms AS (SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM wts GROUP BY 1),
         dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS dp
                  FROM wts a JOIN wts b
                    ON a.term = b.term AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
         SELECT id_a, id_b, ROUND(dp / (na.nrm * nb.nrm), 6) + 0.0 AS sim
         FROM dots
         JOIN norms na ON na.doc_id = id_a
         JOIN norms nb ON nb.doc_id = id_b
         WHERE dp / (na.nrm * nb.nrm) >= 0.5""",

    "a17_corr_pairs" ->
      """WITH c AS (SELECT ROUND(CORR(l_quantity, l_extendedprice), 6) + 0.0 AS c_qp,
                           ROUND(CORR(l_quantity, l_discount), 6) + 0.0 AS c_qd,
                           ROUND(CORR(l_extendedprice, l_tax), 6) + 0.0 AS c_pt
                    FROM lineitem)
         SELECT 'quantity~extendedprice' AS pair, c_qp AS r FROM c
         UNION ALL SELECT 'quantity~discount', c_qd FROM c
         UNION ALL SELECT 'extendedprice~tax', c_pt FROM c""",

    "w11_cum_uniques" ->
      """WITH a AS (SELECT CAST(ts AS DATE) AS day,
                           COUNT(DISTINCT user_id) AS active_users
                    FROM events GROUP BY 1),
         f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS day
               FROM events GROUP BY 1),
         nu AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY 1)
         SELECT a.day, a.active_users,
                COALESCE(nu.new_users, 0) AS new_users,
                CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY a.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS cum_users
         FROM a LEFT JOIN nu ON nu.day = a.day""",

    "w10_sliding_window" ->
      """WITH g AS (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS k),
         e AS (SELECT event_type, value,
                      CAST(FLOOR(DATE_DIFF('second', TIMESTAMP '1970-01-01', ts) / 900)
                        AS BIGINT) AS slot
               FROM events)
         SELECT TIMESTAMP '1970-01-01'
                  + ((slot - k) * 900) * INTERVAL 1 SECOND AS win_start,
                event_type, CAST(COUNT(*) AS BIGINT) AS n,
                ROUND(SUM(value), 2) + 0.0 AS sum_value
         FROM e CROSS JOIN g
         GROUP BY 1, 2""",

    "j16_snowflake_q5" ->
      """SELECT n_name,
                ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY 1""",

    "d12_incremental_neardup" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t),
         sig AS (SELECT doc_id, sh,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('0:' || x))) AS m00,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('1:' || x))) AS m01,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('2:' || x))) AS m02,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('3:' || x))) AS m03,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('4:' || x))) AS m04,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('5:' || x))) AS m05,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('6:' || x))) AS m06,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('7:' || x))) AS m07,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('8:' || x))) AS m08,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('9:' || x))) AS m09,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('10:' || x))) AS m10,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('11:' || x))) AS m11
           FROM s),
         bands AS (
           SELECT doc_id, 0 AS band, MD5(m00 || '|' || m01) AS band_key FROM sig
           UNION ALL SELECT doc_id, 1, MD5(m02 || '|' || m03) FROM sig
           UNION ALL SELECT doc_id, 2, MD5(m04 || '|' || m05) FROM sig
           UNION ALL SELECT doc_id, 3, MD5(m06 || '|' || m07) FROM sig
           UNION ALL SELECT doc_id, 4, MD5(m08 || '|' || m09) FROM sig
           UNION ALL SELECT doc_id, 5, MD5(m10 || '|' || m11) FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key
                  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         sizes AS (SELECT doc_id, LEN(sh) AS n FROM s),
         inter AS (SELECT c.id_new, c.id_old, COUNT(*) AS cnt
                   FROM cand c JOIN ex a ON a.doc_id = c.id_new
                     JOIN ex b ON b.doc_id = c.id_old AND b.sg = a.sg
                   GROUP BY 1, 2)
         SELECT id_new, id_old,
                ROUND(cnt * 1.0 / (sa.n + sb.n - cnt), 6) + 0.0 AS jaccard
         FROM inter
         JOIN sizes sa ON sa.doc_id = id_new
         JOIN sizes sb ON sb.doc_id = id_old
         WHERE cnt * 1.0 / (sa.n + sb.n - cnt) >= 0.5""",

    "d10_dedup_keep" ->
      """WITH RECURSIVE
         t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t),
         sig AS (SELECT doc_id, sh,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('0:' || x))) AS m00,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('1:' || x))) AS m01,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('2:' || x))) AS m02,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('3:' || x))) AS m03,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('4:' || x))) AS m04,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('5:' || x))) AS m05,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('6:' || x))) AS m06,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('7:' || x))) AS m07,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('8:' || x))) AS m08,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('9:' || x))) AS m09,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('10:' || x))) AS m10,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('11:' || x))) AS m11
           FROM s),
         bands AS (
           SELECT doc_id, 0 AS band, MD5(m00 || '|' || m01) AS band_key FROM sig
           UNION ALL SELECT doc_id, 1, MD5(m02 || '|' || m03) FROM sig
           UNION ALL SELECT doc_id, 2, MD5(m04 || '|' || m05) FROM sig
           UNION ALL SELECT doc_id, 3, MD5(m06 || '|' || m07) FROM sig
           UNION ALL SELECT doc_id, 4, MD5(m08 || '|' || m09) FROM sig
           UNION ALL SELECT doc_id, 5, MD5(m10 || '|' || m11) FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         sizes AS (SELECT doc_id, LEN(sh) AS n FROM s),
         inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS cnt
                   FROM cand c JOIN ex a ON a.doc_id = c.id_a
                     JOIN ex b ON b.doc_id = c.id_b AND b.sg = a.sg
                   GROUP BY 1, 2),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
           WHERE cnt * 1.0 / (sa.n + sb.n - cnt) >= 0.5),
         und AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT a, b FROM und
           UNION
           SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id
                  FROM reach GROUP BY a)
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> canonical_id)""",

    "ml05_topn_sample" ->
      """SELECT doc_id, lang, CAST(rk AS INTEGER) AS rk FROM (
           SELECT doc_id, lang,
                  ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents) WHERE rk <= 30""",

    "v05_quantize" ->
      """WITH e AS (
           SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         m AS (SELECT vec_id, v, LIST_MIN(v) AS lo, LIST_MAX(v) AS hi FROM e),
         q AS (
           SELECT vec_id, lo, hi,
                  UNNEST(LIST_TRANSFORM(v, x ->
                    CASE WHEN hi = lo THEN -128
                         ELSE CAST(ROUND((x - lo) / ((hi - lo) / 255.0)) AS INTEGER) - 128
                    END)) AS qv,
                  UNNEST(GENERATE_SERIES(0, LEN(v) - 1)) AS pos
           FROM m)
         SELECT vec_id, CAST(pos AS INTEGER) AS pos, CAST(qv AS INTEGER) AS qv,
                ROUND(lo, 6) + 0.0 AS qmin, ROUND((hi - lo) / 255.0, 9) + 0.0 AS qscale
         FROM q""",

    "t14_ngram_topk" ->
      """WITH t AS (SELECT STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT UNNEST(CASE WHEN LEN(toks) >= 3 THEN
                 LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                 ELSE [] END) AS tri FROM t)
         SELECT tri, COUNT(*) AS cnt FROM s
         GROUP BY 1 ORDER BY cnt DESC, tri ASC LIMIT 25""",

    "d09_decontaminate" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 5 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 4),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                        toks[i+3] || ' ' || toks[i+4]))
                 ELSE [] END AS sh FROM t),
         corpus AS (SELECT DISTINCT doc_id, UNNEST(sh) AS sg FROM s
                    WHERE doc_id % 37 <> 0),
         bench AS (SELECT DISTINCT UNNEST(sh) AS sg FROM s WHERE doc_id % 37 = 0),
         shared AS (SELECT c.doc_id, COUNT(*) AS n_shared
                    FROM corpus c JOIN bench b ON b.sg = c.sg
                    GROUP BY 1)
         SELECT d.doc_id, COALESCE(n_shared, 0) AS n_shared,
                CASE WHEN COALESCE(n_shared, 0) > 0 THEN 1 ELSE 0 END AS contaminated
         FROM (SELECT doc_id FROM documents WHERE doc_id % 37 <> 0) d
         LEFT JOIN shared USING (doc_id)""",

    "ts02_sessionize" ->
      """SELECT event_id,
                CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER)
                  AS session_no
         FROM (SELECT event_id, user_id, ts,
                      CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             IS NULL
                           OR ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                              + INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS new_sess
               FROM events)""",

    "ts04_interval_union" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_us(ts) AS s,
                  epoch_us(ts)
                    + GREATEST(CAST(ROUND(ABS(value) * 1e6, 0) AS BIGINT), 1) AS e
           FROM events WHERE value IS NOT NULL),
         f AS (
           SELECT user_id, s, e, event_id,
                  CASE WHEN MAX(e) OVER w IS NULL OR s > MAX(e) OVER w
                       THEN 1 ELSE 0 END AS nf
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         i AS (
           SELECT user_id, s, e,
                  SUM(nf) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                    ROWS UNBOUNDED PRECEDING) AS iv
           FROM f),
         m AS (SELECT user_id, iv, MIN(s) AS ms, MAX(e) AS me
               FROM i GROUP BY 1, 2)
         SELECT user_id, COUNT(*) AS n_spans,
                CAST(SUM(me - ms) AS BIGINT) AS covered_us,
                CAST(MAX(me - ms) AS BIGINT) AS max_span_us
         FROM m GROUP BY 1""",

    "ts03_stay_tensors" ->
      """WITH tall AS (
           SELECT user_id, event_type,
                  CAST(DATE_DIFF('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS day,
                  ROUND(SUM(value), 2) + 0.0 AS v
           FROM events GROUP BY 1, 2, 3),
         r AS (SELECT user_id, event_type, v,
                      ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                        ORDER BY day) AS k
               FROM tall)
         SELECT user_id, event_type, CAST(COUNT(*) AS INTEGER) AS n_buckets,
                ROUND(SUM(v), 2) + 0.0 AS series_sum, ROUND(SUM(v * k), 2) + 0.0 AS ord_sum
         FROM r GROUP BY 1, 2""",

    "ts_tumbling_window" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
                CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) + 0.0 AS sum_value
         FROM events GROUP BY 1, 2""",

    "t01_token_stats" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents)
         SELECT doc_id, CAST(LEN(toks) AS INTEGER) AS n_tokens,
                CAST(LEN(LIST_DISTINCT(toks)) AS INTEGER) AS n_uniq,
                ROUND(LIST_SUM(LIST_TRANSFORM(toks, x -> CAST(LEN(x) AS DOUBLE)))
                      / LEN(toks), 6) + 0.0 AS avg_tok_len
         FROM t""",

    "t02_quality_score" ->
      """WITH t AS (
           SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         q AS (
           SELECT doc_id, LEN(toks) AS n, LEN(LIST_DISTINCT(toks)) AS nu,
                  LEN(LIST_FILTER(toks, x -> x IN ('the','a','of','and','to'))) AS n_stop
           FROM t)
         SELECT doc_id, ROUND(n_stop * 1.0 / n, 6) + 0.0 AS stopword_ratio,
                ROUND(nu * 1.0 / n, 6) + 0.0 AS ttr,
                CASE WHEN n BETWEEN 20 AND 500 AND n_stop * 1.0 / n < 0.4
                     THEN 1 ELSE 0 END AS quality_ok
         FROM q""",

    "t03_lang_id" ->
      """WITH t AS (
           SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         r AS (
           SELECT doc_id,
                  LEN(LIST_FILTER(toks, x -> x = 'the')) * 1.0 / LEN(toks) AS r_the
           FROM t)
         SELECT doc_id, ROUND(r_the, 6) + 0.0 AS marker_score,
                CASE WHEN r_the >= 0.05 THEN 'en_like'
                     WHEN r_the >= 0.025 THEN 'mixed'
                     ELSE 'other' END AS pred_lang
         FROM r""",

    "t04_fingerprint" ->
      """SELECT doc_id, MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fp
         FROM documents""",

    "t33_langid_confusion" ->
      """WITH t AS (
           SELECT doc_id, lang,
                  STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
           FROM documents),
         p AS (
           SELECT lang,
                  CASE WHEN r >= 0.05 THEN 'en_like'
                       WHEN r >= 0.025 THEN 'mixed'
                       ELSE 'other' END AS pred_lang
           FROM (SELECT lang,
                        LEN(LIST_FILTER(toks, x -> x = 'the')) * 1.0
                          / LEN(toks) AS r
                 FROM t)),
         c AS (SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
               FROM p GROUP BY 1, 2),
         l AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl
               FROM p GROUP BY 1)
         SELECT c.lang, c.pred_lang, c.n,
                ROUND(c.n * 1.0 / l.nl, 6) + 0.0 AS row_share
         FROM c JOIN l USING (lang)""",

    "d01_exact_dedup" ->
      """SELECT MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fp,
                CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
                CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1""",

    "d02_minhash_sig" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t)
         SELECT doc_id,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('0:' || x))) AS mh00,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('1:' || x))) AS mh01,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('2:' || x))) AS mh02,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('3:' || x))) AS mh03,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('4:' || x))) AS mh04,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('5:' || x))) AS mh05
         FROM s""",

    "d03_lsh_neardup" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t),
         sig AS (SELECT doc_id, sh,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('0:' || x))) AS m00,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('1:' || x))) AS m01,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('2:' || x))) AS m02,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('3:' || x))) AS m03,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('4:' || x))) AS m04,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('5:' || x))) AS m05,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('6:' || x))) AS m06,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('7:' || x))) AS m07,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('8:' || x))) AS m08,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('9:' || x))) AS m09,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('10:' || x))) AS m10,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('11:' || x))) AS m11
           FROM s),
         bands AS (
           SELECT doc_id, 0 AS band, MD5(m00 || '|' || m01) AS band_key FROM sig
           UNION ALL SELECT doc_id, 1, MD5(m02 || '|' || m03) FROM sig
           UNION ALL SELECT doc_id, 2, MD5(m04 || '|' || m05) FROM sig
           UNION ALL SELECT doc_id, 3, MD5(m06 || '|' || m07) FROM sig
           UNION ALL SELECT doc_id, 4, MD5(m08 || '|' || m09) FROM sig
           UNION ALL SELECT doc_id, 5, MD5(m10 || '|' || m11) FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         sizes AS (SELECT doc_id, LEN(sh) AS n FROM s),
         inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS cnt
                   FROM cand c JOIN ex a ON a.doc_id = c.id_a
                     JOIN ex b ON b.doc_id = c.id_b AND b.sg = a.sg
                   GROUP BY 1, 2)
         SELECT id_a, id_b, ROUND(cnt * 1.0 / (sa.n + sb.n - cnt), 6) + 0.0 AS jaccard
         FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
         WHERE cnt * 1.0 / (sa.n + sb.n - cnt) >= 0.5""",

    // d03's signature/cand CTEs + per-lane string-equality agreement;
    // est, jaccard, and err assembled with the engine's exact ops
    "d20_minhash_estimate" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t),
         sig AS (SELECT doc_id, sh,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('0:' || x))) AS m00,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('1:' || x))) AS m01,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('2:' || x))) AS m02,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('3:' || x))) AS m03,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('4:' || x))) AS m04,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('5:' || x))) AS m05,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('6:' || x))) AS m06,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('7:' || x))) AS m07,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('8:' || x))) AS m08,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('9:' || x))) AS m09,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('10:' || x))) AS m10,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('11:' || x))) AS m11
           FROM s),
         bands AS (
           SELECT doc_id, 0 AS band, MD5(m00 || '|' || m01) AS band_key FROM sig
           UNION ALL SELECT doc_id, 1, MD5(m02 || '|' || m03) FROM sig
           UNION ALL SELECT doc_id, 2, MD5(m04 || '|' || m05) FROM sig
           UNION ALL SELECT doc_id, 3, MD5(m06 || '|' || m07) FROM sig
           UNION ALL SELECT doc_id, 4, MD5(m08 || '|' || m09) FROM sig
           UNION ALL SELECT doc_id, 5, MD5(m10 || '|' || m11) FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         agr AS (SELECT c.id_a, c.id_b,
                        (CASE WHEN x.m00 = y.m00 THEN 1 ELSE 0 END
                       + CASE WHEN x.m01 = y.m01 THEN 1 ELSE 0 END
                       + CASE WHEN x.m02 = y.m02 THEN 1 ELSE 0 END
                       + CASE WHEN x.m03 = y.m03 THEN 1 ELSE 0 END
                       + CASE WHEN x.m04 = y.m04 THEN 1 ELSE 0 END
                       + CASE WHEN x.m05 = y.m05 THEN 1 ELSE 0 END
                       + CASE WHEN x.m06 = y.m06 THEN 1 ELSE 0 END
                       + CASE WHEN x.m07 = y.m07 THEN 1 ELSE 0 END
                       + CASE WHEN x.m08 = y.m08 THEN 1 ELSE 0 END
                       + CASE WHEN x.m09 = y.m09 THEN 1 ELSE 0 END
                       + CASE WHEN x.m10 = y.m10 THEN 1 ELSE 0 END
                       + CASE WHEN x.m11 = y.m11 THEN 1 ELSE 0 END)
                          AS lanes
                 FROM cand c JOIN sig x ON x.doc_id = c.id_a
                      JOIN sig y ON y.doc_id = c.id_b),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         sizes AS (SELECT doc_id, LEN(sh) AS n FROM s),
         inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS cnt
                   FROM cand c JOIN ex a ON a.doc_id = c.id_a
                     JOIN ex b ON b.doc_id = c.id_b AND b.sg = a.sg
                   GROUP BY 1, 2)
         SELECT agr.id_a, agr.id_b, CAST(lanes AS BIGINT) AS lanes_agree,
                ROUND(CAST(lanes AS DOUBLE) / 12, 6) + 0.0 AS est,
                ROUND(CAST(COALESCE(cnt, 0) AS DOUBLE)
                  / CAST(sa.n + sb.n - COALESCE(cnt, 0) AS DOUBLE), 6) + 0.0
                  AS jaccard,
                ROUND(CAST(lanes AS DOUBLE) / 12
                  - CAST(COALESCE(cnt, 0) AS DOUBLE)
                    / CAST(sa.n + sb.n - COALESCE(cnt, 0) AS DOUBLE), 6)
                  + 0.0 AS err
         FROM agr
         LEFT JOIN inter ON inter.id_a = agr.id_a AND inter.id_b = agr.id_b
         JOIN sizes sa ON sa.doc_id = agr.id_a
         JOIN sizes sb ON sb.doc_id = agr.id_b""",

    "d04_simhash" ->
      """WITH toks AS (
           SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
           FROM documents),
         votes AS (
           SELECT doc_id, p,
                  SUM(CASE WHEN CAST(FLOOR(
                        (STRPOS('0123456789abcdef',
                           SUBSTR(MD5(tok), 1 + CAST(FLOOR(p / 4) AS INTEGER), 1)) - 1)
                        / POWER(2, 3 - (p % 4))) AS BIGINT) % 2 = 1
                      THEN 1 ELSE -1 END) AS vote
           FROM toks CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 31)) AS p)
           GROUP BY 1, 2)
         SELECT doc_id,
                STRING_AGG(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS simhash
         FROM votes GROUP BY doc_id""",

    "d05_jaccard_pairs" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         sizes AS (SELECT doc_id, LEN(sh) AS n FROM s),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS cnt
                   FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b, ROUND(cnt * 1.0 / (sa.n + sb.n - cnt), 6) + 0.0 AS jaccard
         FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
         WHERE cnt * 1.0 / (sa.n + sb.n - cnt) >= 0.5""",

    "d14_containment_pairs" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         sizes AS (SELECT doc_id, LEN(sh) AS n FROM s),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS cnt
                   FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b,
                ROUND(cnt * 1.0 / sa.n, 6) + 0.0 AS containment_a,
                ROUND(cnt * 1.0 / sb.n, 6) + 0.0 AS containment_b
         FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
         WHERE cnt * 1.0 / LEAST(sa.n, sb.n) >= 0.6""",

    "d07_simhash_neardup" ->
      """WITH toks AS (
           SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
           FROM documents),
         votes AS (
           SELECT doc_id, p,
                  SUM(CASE WHEN CAST(FLOOR(
                        (STRPOS('0123456789abcdef',
                           SUBSTR(MD5(tok), 1 + CAST(FLOOR(p / 4) AS INTEGER), 1)) - 1)
                        / POWER(2, 3 - (p % 4))) AS BIGINT) % 2 = 1
                      THEN 1 ELSE -1 END) AS vote
           FROM toks CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 31)) AS p)
           GROUP BY 1, 2),
         sim AS (
           SELECT doc_id,
                  STRING_AGG(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY p)
                    AS simhash
           FROM votes GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash AS sa, b.simhash AS sb
           FROM sim a JOIN sim b
             ON SUBSTR(a.simhash, 1, 8) = SUBSTR(b.simhash, 1, 8) AND a.doc_id < b.doc_id),
         ham AS (
           SELECT id_a, id_b,
                  SUM(CASE WHEN SUBSTR(sa, i, 1) <> SUBSTR(sb, i, 1) THEN 1 ELSE 0 END) AS h
           FROM pairs CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 32)) AS i)
           GROUP BY 1, 2)
         SELECT id_a, id_b, CAST(h AS INTEGER) AS hamming FROM ham WHERE h <= 6""",

    "a14b_ece_mce" ->
      """WITH bins AS (
           SELECT CAST(LEAST(FLOOR(l_discount * 10.0 * 10), 9) AS BIGINT) AS bin,
                  ROUND(AVG(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END), 6) + 0.0
                    AS bin_accuracy,
                  ROUND(AVG(l_discount * 10.0), 6) + 0.0 AS bin_confidence,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1)
         SELECT ROUND(SUM(n * ABS(bin_accuracy - bin_confidence)) / SUM(n), 6) + 0.0 AS ece,
                ROUND(MAX(ABS(bin_accuracy - bin_confidence)), 6) + 0.0 AS mce
         FROM bins""",

    "a14c_temp_scaling" ->
      """WITH pts AS (
           SELECT o_totalprice / 100000.0 - 1.5 AS z,
                  CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
           FROM orders),
         grid AS (
           SELECT CAST(UNNEST([0.5, 0.75, 1.0, 1.25, 1.5, 1.75,
                               2.0, 2.25, 2.5, 2.75, 3.0]) AS DOUBLE) AS t),
         losses AS (
           SELECT t,
                  ROUND(AVG(GREATEST(z / t, 0) - (z / t) * y + LN(1 + EXP(-ABS(z / t)))), 6) + 0.0 AS bce
           FROM pts CROSS JOIN grid GROUP BY t)
         SELECT t AS best_t, bce
         FROM losses ORDER BY bce, t LIMIT 1""",

    "d06_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, label, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                ROUND(LIST_DOT_PRODUCT(a.v, b.v)
                  / (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * SQRT(LIST_DOT_PRODUCT(b.v, b.v))), 6) + 0.0
                  AS sim
         FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE LIST_DOT_PRODUCT(a.v, b.v)
               / (SQRT(LIST_DOT_PRODUCT(a.v, a.v)) * SQRT(LIST_DOT_PRODUCT(b.v, b.v))) >= 0.4""",

    // full Lloyd's-loop oracle (r6): possible because kmeansAssign
    // QUANTIZES each round's means to 6dp before they seed the next round
    // (Knn.scala) — every round's centroid set is exactly representable in
    // both engines, so the two unrolled iterations below replay the same
    // trajectory: init = first k vectors by vec_id, assignment = portable
    // argmin (dist asc, cluster asc), empty clusters keep their previous
    // centroid (the COALESCE), final in-cluster cosine top-3 on ROUNDED sims
    "v03_ann_kmeans" ->
      """WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         dims AS (SELECT UNNEST(GENERATE_SERIES(1, 64)) AS i),
         c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
                FROM e ORDER BY vec_id LIMIT 32),
         a1 AS (SELECT vec_id, v, cluster FROM (
                  SELECT e.vec_id, e.v, c.cluster,
                         ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                           LIST_SUM(LIST_TRANSFORM(range(1, 65),
                             i -> (v[i] - cv[i]) * (v[i] - cv[i]))) ASC,
                           c.cluster ASC) AS rn
                  FROM e CROSS JOIN c0 c) WHERE rn = 1),
         m1 AS (SELECT cluster, LIST(m ORDER BY i) AS mv FROM (
                  SELECT cluster, i, ROUND(AVG(v[i]), 6) + 0.0 AS m
                  FROM a1 CROSS JOIN dims GROUP BY cluster, i) GROUP BY cluster),
         c1 AS (SELECT c0.cluster, COALESCE(m1.mv, c0.cv) AS cv
                FROM c0 LEFT JOIN m1 USING (cluster)),
         a2 AS (SELECT vec_id, v, cluster FROM (
                  SELECT e.vec_id, e.v, c.cluster,
                         ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                           LIST_SUM(LIST_TRANSFORM(range(1, 65),
                             i -> (v[i] - cv[i]) * (v[i] - cv[i]))) ASC,
                           c.cluster ASC) AS rn
                  FROM e CROSS JOIN c1 c) WHERE rn = 1),
         m2 AS (SELECT cluster, LIST(m ORDER BY i) AS mv FROM (
                  SELECT cluster, i, ROUND(AVG(v[i]), 6) + 0.0 AS m
                  FROM a2 CROSS JOIN dims GROUP BY cluster, i) GROUP BY cluster),
         c2 AS (SELECT c1.cluster, COALESCE(m2.mv, c1.cv) AS cv
                FROM c1 LEFT JOIN m2 USING (cluster)),
         af AS (SELECT vec_id, v, cluster FROM (
                  SELECT e.vec_id, e.v, c.cluster,
                         ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                           LIST_SUM(LIST_TRANSFORM(range(1, 65),
                             i -> (v[i] - cv[i]) * (v[i] - cv[i]))) ASC,
                           c.cluster ASC) AS rn
                  FROM e CROSS JOIN c2 c) WHERE rn = 1),
         sims AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                         ROUND(LIST_DOT_PRODUCT(q.v, n.v)
                           / (SQRT(LIST_DOT_PRODUCT(q.v, q.v))
                              * SQRT(LIST_DOT_PRODUCT(n.v, n.v))), 6) + 0.0 AS sim
                  FROM af q JOIN af n
                    ON q.cluster = n.cluster AND n.vec_id <> q.vec_id)
         SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rn FROM sims)
         WHERE rn <= 3""",

    "v03b_assign_fixed" ->
      s"""WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                     FROM embeddings),
          c(cluster, cv) AS (VALUES $fixedCentroidsSqlValues),
          d AS (
            SELECT vec_id, cluster,
                   LIST_SUM(LIST_TRANSFORM(range(1, 65),
                     i -> (v[i] - CAST(cv[i] AS DOUBLE)) * (v[i] - CAST(cv[i] AS DOUBLE)))) AS dist
            FROM e CROSS JOIN c)
          SELECT vec_id, CAST(cluster AS INTEGER) AS cluster
          FROM (SELECT vec_id, cluster,
                       ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
                FROM d)
          WHERE rn = 1""",

    "v06b_probe_fixed" ->
      s"""WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                     FROM embeddings),
          c(cluster, cv) AS (VALUES $fixedCentroidsSqlValues),
          d AS (
            SELECT vec_id, cluster,
                   LIST_SUM(LIST_TRANSFORM(range(1, 65),
                     i -> (v[i] - CAST(cv[i] AS DOUBLE)) * (v[i] - CAST(cv[i] AS DOUBLE)))) AS dist
            FROM e CROSS JOIN c)
          SELECT vec_id, CAST(rn AS INTEGER) AS probe_rank,
                 CAST(cluster AS INTEGER) AS cluster
          FROM (SELECT vec_id, cluster,
                       ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
                FROM d)
          WHERE rn <= 2""",

    // encode argmin and every distance term are sequential folds over
    // literal-indexed elements (the v03b portability argument); the ADC sum
    // over subspaces is LIST_SUM of a j-ORDERED list, matching the Spark
    // side's sequential fold — bit-exact before the 6dp round
    "v08_pq_adc" ->
      s"""WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                     FROM embeddings),
          cb(j, c, cw) AS (VALUES $pqCodebookSqlValues),
          dist AS (
            SELECT e.vec_id, cb.j, cb.c,
                   LIST_SUM(LIST_TRANSFORM(range(1, 9), t ->
                     (v[cb.j*8 + t] - CAST(cw[t] AS DOUBLE))
                     * (v[cb.j*8 + t] - CAST(cw[t] AS DOUBLE)))) AS dd
            FROM e CROSS JOIN cb),
          enc AS (
            SELECT vec_id, j, c AS code
            FROM (SELECT vec_id, j, c,
                         ROW_NUMBER() OVER (PARTITION BY vec_id, j
                           ORDER BY dd ASC, c ASC) AS rn
                  FROM dist)
            WHERE rn = 1),
          q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
          term AS (
            SELECT q.query_id, en.vec_id AS neighbor_id, en.j,
                   LIST_SUM(LIST_TRANSFORM(range(1, 9), t ->
                     (qv[en.j*8 + t] - CAST(cb.cw[t] AS DOUBLE))
                     * (qv[en.j*8 + t] - CAST(cb.cw[t] AS DOUBLE)))) AS dd
            FROM q JOIN enc en ON en.vec_id <> q.query_id
            JOIN cb ON cb.j = en.j AND cb.c = en.code),
          adc AS (
            SELECT query_id, neighbor_id,
                   ROUND(LIST_SUM(LIST(dd ORDER BY j)), 6) + 0.0 AS adc
            FROM term GROUP BY 1, 2)
          SELECT query_id, neighbor_id, adc, CAST(rn AS INTEGER) AS rank
          FROM (SELECT query_id, neighbor_id, adc,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY adc ASC, neighbor_id ASC) AS rn
                FROM adc)
          WHERE rn <= 3""",

    // full multi-probe oracle (r6): every stage is ulp-insensitive — the
    // label centroids round to 6dp (Knn.centroids), probe selection over
    // them is the v06b-proven portable argmin, and the final ranking
    // orders on the ROUNDED sim (simRank) — so the whole pipeline, not
    // just the probe half, hash-matches cross-engine. Cluster ids follow
    // the Scala side's sorted-label indexing (DENSE_RANK - 1).
    "v06_ann_multiprobe" ->
      """WITH e AS (SELECT vec_id, label, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         cm AS (SELECT label, i, ROUND(AVG(v[i]), 6) + 0.0 AS m
                FROM e CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 64)) AS i)
                GROUP BY label, i),
         cl AS (SELECT label, LIST(m ORDER BY i) AS cv FROM cm GROUP BY label),
         cents AS (SELECT DENSE_RANK() OVER (ORDER BY label) - 1 AS cluster, cv FROM cl),
         d AS (SELECT e.vec_id, c.cluster,
                      LIST_SUM(LIST_TRANSFORM(range(1, 65),
                        i -> (v[i] - cv[i]) * (v[i] - cv[i]))) AS dist
               FROM e CROSS JOIN cents c),
         probes AS (SELECT vec_id, cluster, rn FROM (
                      SELECT vec_id, cluster,
                             ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY dist ASC, cluster ASC) AS rn
                      FROM d)
                    WHERE rn <= 2),
         own AS (SELECT vec_id, cluster FROM probes WHERE rn = 1),
         cand AS (SELECT p.vec_id AS query_id, o.vec_id AS neighbor_id
                  FROM probes p JOIN own o
                    ON p.cluster = o.cluster AND o.vec_id <> p.vec_id),
         sims AS (SELECT c.query_id, c.neighbor_id,
                         ROUND(LIST_DOT_PRODUCT(q.v, n.v)
                           / (SQRT(LIST_DOT_PRODUCT(q.v, q.v))
                              * SQRT(LIST_DOT_PRODUCT(n.v, n.v))), 6) + 0.0 AS sim
                  FROM cand c
                  JOIN e q ON q.vec_id = c.query_id
                  JOIN e n ON n.vec_id = c.neighbor_id)
         SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rn FROM sims)
         WHERE rn <= 3""",

    "v01_cosine_topk" ->
      """WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         sims AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                    / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6) + 0.0
                    AS sim
           FROM (SELECT * FROM e WHERE vec_id < 8) q
           CROSS JOIN e c WHERE c.vec_id <> q.vec_id)
         SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rn FROM sims)
         WHERE rn <= 5""",

    // v01 with the cross-source predicate inside the candidate join
    "v16_filtered_ann" ->
      """WITH e AS (SELECT em.vec_id,
                           LIST_TRANSFORM(em.embedding, x -> CAST(x AS DOUBLE)) AS v,
                           d.source
                    FROM embeddings em
                    JOIN documents d ON d.doc_id = em.vec_id),
         sims AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                    / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6) + 0.0
                    AS sim
           FROM (SELECT * FROM e WHERE vec_id < 8) q
           CROSS JOIN e c
           WHERE c.vec_id <> q.vec_id AND c.source <> q.source)
         SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rn FROM sims)
         WHERE rn <= 5""",

    // v01 over the first-16-dim slice — LIST slicing before the double
    // cast mirrors the engine's slice-then-toDoubleArr
    "v13_matryoshka_topk" ->
      """WITH e AS (SELECT vec_id,
                           LIST_TRANSFORM(embedding[1:16], x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         sims AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                    / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6) + 0.0
                    AS sim
           FROM (SELECT * FROM e WHERE vec_id < 8) q
           CROSS JOIN e c WHERE c.vec_id <> q.vec_id)
         SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rn FROM sims)
         WHERE rn <= 5""",

    "v02_ann_clustered" ->
      """WITH e AS (SELECT vec_id, label, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         sims AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                    / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6) + 0.0
                    AS sim
           FROM e q JOIN e c ON q.label = c.label AND c.vec_id <> q.vec_id)
         SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rn FROM sims)
         WHERE rn <= 3""",

    "m01_binary_meta" ->
      """SELECT doc_id, CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS INTEGER) AS n_bytes, MD5(text) AS sig,
                HEX(SUBSTR(text, 1, 8)) AS head_hex
         FROM documents""",

    "s09_multipath_scan" ->
      """SELECT l_returnflag, CAST(COUNT(*) * 2 AS BIGINT) AS cnt
         FROM lineitem GROUP BY l_returnflag""",

    "j03_cohort_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE EXISTS (
           SELECT 1 FROM customer JOIN nation ON c_nationkey = n_nationkey
           WHERE n_regionkey = 0 AND c_custkey = o_custkey)""",

    "j06_left_attach" ->
      """SELECT l_orderkey, l_linenumber, o_totalprice
         FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey""",

    "j07_right_join_summary" ->
      """SELECT p.p_partkey, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
         FROM (SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1) c
         RIGHT JOIN part p ON c.l_partkey = p.p_partkey""",

    "a10_impute_stats" ->
      """SELECT l_returnflag, ROUND(AVG(l_quantity), 6) + 0.0 AS mean_qty,
                ROUND(QUANTILE_CONT(l_quantity, 0.5), 6) + 0.0 AS median_qty
         FROM lineitem GROUP BY l_returnflag""",

    "a11_modality_collapse" ->
      """SELECT l_suppkey,
                ROUND(AVG(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 6) + 0.0 AS avg_a,
                ROUND(AVG(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 6) + 0.0 AS avg_n,
                ROUND(AVG(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 6) + 0.0 AS avg_r
         FROM lineitem GROUP BY l_suppkey""",

    "a13_grouped_confusion" ->
      """WITH scored AS (
           SELECT o_orderpriority,
                  CASE WHEN o_totalprice >= 250000.0 THEN 1 ELSE 0 END AS truth,
                  CASE WHEN COALESCE(n_items, 0) >= 4 THEN 1 ELSE 0 END AS pred
           FROM orders LEFT JOIN (
             SELECT l_orderkey AS o_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY 1)
           USING (o_orderkey)),
         cells AS (
           SELECT o_orderpriority,
                  CAST(SUM(CASE WHEN truth = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                  CAST(SUM(CASE WHEN truth = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                  CAST(SUM(CASE WHEN truth = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
                  CAST(SUM(CASE WHEN truth = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
           FROM scored GROUP BY o_orderpriority)
         SELECT o_orderpriority, tp, fp, tn, fn,
                ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) + 0.0 AS tpr,
                ROUND(CAST(tn AS DOUBLE) / NULLIF(tn + fp, 0), 6) + 0.0 AS tnr,
                ROUND(CAST(fp AS DOUBLE) / NULLIF(fp + tn, 0), 6) + 0.0 AS fpr,
                ROUND(CAST(fn AS DOUBLE) / NULLIF(fn + tp, 0), 6) + 0.0 AS fnr,
                ROUND(CAST(tp + fp AS DOUBLE) / NULLIF(tp + fp + tn + fn, 0), 6) + 0.0 AS pr,
                ROUND(CAST(tn + fn AS DOUBLE) / NULLIF(tp + fp + tn + fn, 0), 6) + 0.0 AS nr,
                ROUND(CAST(tp + tn AS DOUBLE) / NULLIF(tp + fp + tn + fn, 0), 6) + 0.0 AS accuracy
         FROM cells""",

    "w05_active_signal" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         grid AS (SELECT user_id, d AS day
                  FROM u CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 29)) AS d)),
         stops AS (SELECT user_id,
                          CAST(DATE_DIFF('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS day,
                          MAX(CAST(DATE_DIFF('day', TIMESTAMP '2024-01-01', ts) AS BIGINT)) + 3
                            AS stop
                   FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         sparse AS (SELECT g.user_id, g.day, s.stop
                    FROM grid g LEFT JOIN stops s ON s.user_id = g.user_id AND s.day = g.day),
         f AS (SELECT user_id, day,
                      LAST_VALUE(stop IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
               FROM sparse)
         SELECT user_id, day,
                CASE WHEN ff IS NOT NULL AND ff > day THEN 1 ELSE 0 END AS active
         FROM f""",

    "f12_pad_split_key" ->
      """SELECT s_suppkey, LPAD(CAST(s_suppkey AS VARCHAR), 9, '0') AS padded,
                SUBSTR(LPAD(CAST(s_suppkey AS VARCHAR), 9, '0'), 1, 5) || '-' ||
                SUBSTR(LPAD(CAST(s_suppkey AS VARCHAR), 9, '0'), 6, 4) AS sectioned
         FROM supplier""",

    "f13_regex_extract" ->
      """SELECT o_orderkey,
                CAST(REGEXP_EXTRACT(o_orderpriority, '^(\d+)', 1) AS INTEGER) AS priority_num
         FROM orders""",

    "f15_try_cast_json" ->
      """SELECT event_id,
                TRY_CAST(REGEXP_EXTRACT(props, '"k": (\d+)', 1) AS INTEGER) AS k_val,
                TRY_CAST(SUBSTR(props, 1, 5) AS INTEGER) AS bad_cast
         FROM events""",

    "f21_logit" ->
      """SELECT l_orderkey, l_linenumber,
                ROUND(LOG2(LEAST(GREATEST(l_discount * 10.0, 0.05), 0.95)
                  / (1.0 - LEAST(GREATEST(l_discount * 10.0, 0.05), 0.95))), 6) + 0.0 AS logit
         FROM lineitem""",

    "f22_onehot" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_f,
                CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_o,
                CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS is_p
         FROM orders""",

    "f23_vocab_encode" ->
      """WITH vocab AS (
           SELECT p_type, CAST(DENSE_RANK() OVER (ORDER BY p_type) AS INTEGER) AS type_id
           FROM (SELECT DISTINCT p_type FROM part))
         SELECT p.p_partkey, v.type_id FROM part p JOIN vocab v ON p.p_type = v.p_type""",

    "o01_multisort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
         ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC LIMIT 100""",

    "u02_column_bind" ->
      """SELECT s_suppkey, CAST(cnt AS BIGINT) AS cnt, s_acctbal
         FROM (SELECT l_suppkey AS s_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1)
         JOIN supplier USING (s_suppkey)""",

    "pv01_pivot_matrix" ->
      """SELECT user_id, CAST(DATE_DIFF('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS day,
                ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 2) + 0.0 AS v_click,
                ROUND(SUM(CASE WHEN event_type = 'error' THEN value END), 2) + 0.0 AS v_error,
                ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 2) + 0.0 AS v_purchase,
                ROUND(SUM(CASE WHEN event_type = 'signup' THEN value END), 2) + 0.0 AS v_signup,
                ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 2) + 0.0 AS v_view
         FROM events GROUP BY 1, 2""",

    "f01_date_kitchen" ->
      """SELECT o_orderkey, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
                DATE_TRUNC('month', o_orderdate) AS mon_start,
                STRFTIME(o_orderdate, '%Y-%m') AS ym,
                o_orderdate + INTERVAL 3 DAY AS plus3
         FROM orders""",

    "f10_prefix_exclusion" ->
      """SELECT p_partkey, p_type FROM part
         WHERE NOT (p_type LIKE 'ECO%' OR p_type LIKE 'SMA%')""",

    "f11_contains_match" ->
      """SELECT doc_id, CASE WHEN CONTAINS(text, 'the spark') THEN 1 ELSE 0 END AS has_marker
         FROM documents""",

    "u05_intersect_ids" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'""",

    "j15_label_lookup" ->
      """SELECT o_orderkey,
                CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 ELSE 3 END AS status_id
         FROM orders""",

    "t06_tfidf_top_terms" ->
      """WITH toks AS (
           SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks)
                GROUP BY 1),
         n AS (SELECT COUNT(*) AS n FROM documents),
         scored AS (
           SELECT doc_id, term,
                  ROUND(tf * (LN((n + 1.0) / (df + 1.0)) + 1.0), 6) + 0.0 AS score
           FROM tf JOIN df USING (term) CROSS JOIN n)
         SELECT doc_id, term, score, CAST(rn AS INTEGER) AS rank FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY score DESC, term ASC) AS rn FROM scored)
         WHERE rn <= 3""",

    "dq01_profile" ->
      """SELECT 'l_quantity' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
                ROUND(MIN(l_quantity), 6) + 0.0 AS min_v, ROUND(MAX(l_quantity), 6) + 0.0 AS max_v,
                ROUND(ROUND(SUM(l_quantity), 3) / COUNT(*), 6) + 0.0 AS avg_v
         FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
                CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
                ROUND(MIN(l_extendedprice), 6), ROUND(MAX(l_extendedprice), 6),
                ROUND(ROUND(SUM(l_extendedprice), 3) / COUNT(*), 6)
         FROM lineitem
         UNION ALL
         SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
                CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                CAST(COUNT(DISTINCT l_discount) AS BIGINT),
                ROUND(MIN(l_discount), 6), ROUND(MAX(l_discount), 6),
                ROUND(ROUND(SUM(l_discount), 3) / COUNT(*), 6)
         FROM lineitem""",

    "t05_explode_sections" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' data ') AS parts FROM documents)
         SELECT doc_id, CAST(i - 1 AS INTEGER) AS sec_no, parts[i] AS section
         FROM t CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 500)) AS i)
         WHERE i <= LEN(parts)""",

    "t12_repetition" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         tri AS (SELECT doc_id,
                        UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS tri
                 FROM t WHERE LEN(toks) >= 3),
         c AS (SELECT doc_id, tri, COUNT(*) AS c FROM tri GROUP BY 1, 2)
         SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tri, CAST(MAX(c) AS BIGINT) AS max_tri,
                ROUND(MAX(c) * 1.0 / SUM(c), 6) + 0.0 AS rep_ratio
         FROM c GROUP BY doc_id""",

    "t11_redact" ->
      """SELECT event_id,
                REGEXP_REPLACE(props, '\d+', '#', 'g') AS props_redacted,
                CAST(LEN(props) - LEN(REGEXP_REPLACE(props, '\d', '', 'g')) AS INTEGER)
                  AS n_digits
         FROM events""",

    "t09_stem" ->
      """SELECT DISTINCT doc_id, tok,
                REGEXP_REPLACE(tok, '(\w{3,}?)(ing|edly|ied|ies|ier|ed|er|es|s)$', '\1') AS stem
         FROM (SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
               FROM documents)""",

    "t09b_lemmatize" ->
      s"""WITH toks AS (SELECT DISTINCT doc_id, tok
                      FROM (SELECT doc_id,
                                   UNNEST(STRING_SPLIT_REGEX(TRIM(text),
                                     '\\s+')) AS tok
                            FROM documents)),
         dict(form, lemma) AS (VALUES $lemmaDictSqlValues)
         SELECT t.doc_id, t.tok,
                COALESCE(d.lemma, REGEXP_REPLACE(t.tok,
                  '(\\w{3,}?)(ing|edly|ied|ies|ier|ed|er|es|s)$$', '\\1'))
                  AS lemma
         FROM toks t LEFT JOIN dict d ON t.tok = d.form""",

    // t05 + t10 + t08 + t09b composed: section explode, scoped ConText
    // regexes, pre-cue severity extract, dictionary-first lemma types —
    // one per-doc summary row
    "e2e_notes_nlp" ->
      s"""WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' data ') AS parts
                     FROM documents),
         s AS (SELECT doc_id, parts[i] AS section
               FROM t CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 500))
                                  AS i)
               WHERE i <= LEN(parts)),
         f AS (SELECT doc_id,
                      CASE WHEN REGEXP_MATCHES(section,
                             '(^|\\s)(slow|small)(\\s+\\w+){0,2}\\s+(scan|query)(\\s|$$)')
                             OR REGEXP_MATCHES(section,
                             '(^|\\s)(scan|query)(\\s+\\w+){0,2}\\s+(slow|small)(\\s|$$)')
                           THEN 1 ELSE 0 END AS flag,
                      CASE REGEXP_EXTRACT(section,
                             '(^|\\s)(slow|small)(\\s+\\w+){0,2}\\s+(scan|query)(\\s|$$)',
                             2)
                           WHEN 'slow' THEN 2 WHEN 'small' THEN 1
                           ELSE 0 END AS sev
               FROM s),
         a1 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sections,
                       CAST(SUM(flag) AS BIGINT) AS n_flagged,
                       CAST(MAX(sev) AS INTEGER) AS max_severity
                FROM f GROUP BY 1),
         toks AS (SELECT DISTINCT doc_id, tok
                  FROM (SELECT doc_id,
                               UNNEST(STRING_SPLIT_REGEX(TRIM(text),
                                 '\\s+')) AS tok
                        FROM documents)),
         dict(form, lemma) AS (VALUES $lemmaDictSqlValues),
         lem AS (SELECT t.doc_id,
                        COALESCE(d.lemma, REGEXP_REPLACE(t.tok,
                          '(\\w{3,}?)(ing|edly|ied|ies|ier|ed|er|es|s)$$',
                          '\\1')) AS lemma
                 FROM toks t LEFT JOIN dict d ON t.tok = d.form),
         a2 AS (SELECT doc_id, CAST(COUNT(DISTINCT lemma) AS BIGINT)
                         AS n_lemma_types
                FROM lem GROUP BY 1)
         SELECT a1.doc_id, n_sections, n_flagged, max_severity,
                COALESCE(n_lemma_types, 0) AS n_lemma_types
         FROM a1 LEFT JOIN a2 ON a1.doc_id = a2.doc_id""",

    "d08_dedup_components" ->
      """WITH RECURSIVE
         t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t),
         sig AS (SELECT doc_id, sh,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('0:' || x))) AS m00,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('1:' || x))) AS m01,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('2:' || x))) AS m02,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('3:' || x))) AS m03,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('4:' || x))) AS m04,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('5:' || x))) AS m05,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('6:' || x))) AS m06,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('7:' || x))) AS m07,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('8:' || x))) AS m08,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('9:' || x))) AS m09,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('10:' || x))) AS m10,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('11:' || x))) AS m11
           FROM s),
         bands AS (
           SELECT doc_id, 0 AS band, MD5(m00 || '|' || m01) AS band_key FROM sig
           UNION ALL SELECT doc_id, 1, MD5(m02 || '|' || m03) FROM sig
           UNION ALL SELECT doc_id, 2, MD5(m04 || '|' || m05) FROM sig
           UNION ALL SELECT doc_id, 3, MD5(m06 || '|' || m07) FROM sig
           UNION ALL SELECT doc_id, 4, MD5(m08 || '|' || m09) FROM sig
           UNION ALL SELECT doc_id, 5, MD5(m10 || '|' || m11) FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         sizes AS (SELECT doc_id, LEN(sh) AS n FROM s),
         inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS cnt
                   FROM cand c JOIN ex a ON a.doc_id = c.id_a
                     JOIN ex b ON b.doc_id = c.id_b AND b.sg = a.sg
                   GROUP BY 1, 2),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
           WHERE cnt * 1.0 / (sa.n + sb.n - cnt) >= 0.5),
         und AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT a, b FROM und
           UNION
           SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
         SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS canonical_id
         FROM reach GROUP BY a""",

    // d08's minhash-LSH → verify → closure chain, then every doc (left
    // join, singletons = own cluster) folded by the ml01 Knuth hash of
    // its cluster canonical
    "ml23_dedup_split" ->
      """WITH RECURSIVE
         t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t),
         sig AS (SELECT doc_id, sh,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('0:' || x))) AS m00,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('1:' || x))) AS m01,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('2:' || x))) AS m02,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('3:' || x))) AS m03,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('4:' || x))) AS m04,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('5:' || x))) AS m05,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('6:' || x))) AS m06,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('7:' || x))) AS m07,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('8:' || x))) AS m08,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('9:' || x))) AS m09,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('10:' || x))) AS m10,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('11:' || x))) AS m11
           FROM s),
         bands AS (
           SELECT doc_id, 0 AS band, MD5(m00 || '|' || m01) AS band_key FROM sig
           UNION ALL SELECT doc_id, 1, MD5(m02 || '|' || m03) FROM sig
           UNION ALL SELECT doc_id, 2, MD5(m04 || '|' || m05) FROM sig
           UNION ALL SELECT doc_id, 3, MD5(m06 || '|' || m07) FROM sig
           UNION ALL SELECT doc_id, 4, MD5(m08 || '|' || m09) FROM sig
           UNION ALL SELECT doc_id, 5, MD5(m10 || '|' || m11) FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         sizes AS (SELECT doc_id, LEN(sh) AS n FROM s),
         inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS cnt
                   FROM cand c JOIN ex a ON a.doc_id = c.id_a
                     JOIN ex b ON b.doc_id = c.id_b AND b.sg = a.sg
                   GROUP BY 1, 2),
         pairs AS (
           SELECT id_a, id_b FROM inter
           JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
           WHERE cnt * 1.0 / (sa.n + sb.n - cnt) >= 0.5),
         und AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT a, b FROM und
           UNION
           SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         cc AS (SELECT a AS did, LEAST(a, MIN(b)) AS canon
                FROM reach GROUP BY a)
         SELECT d.doc_id,
                CAST(COALESCE(cc.canon, d.doc_id) AS BIGINT) AS cluster_id,
                CAST(((COALESCE(cc.canon, d.doc_id) * 2654435761)
                    % 1000000007) % 5 AS INTEGER) AS fold
         FROM documents d LEFT JOIN cc ON cc.did = d.doc_id""",

    // per-shingle first-appearance min + join back; docs under 3 tokens
    // have no shingles and drop on both sides
    "t38_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         f AS (SELECT sg, MIN(doc_id) AS fst FROM ex GROUP BY 1)
         SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                CAST(SUM(CASE WHEN f.fst = ex.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel,
                ROUND(CAST(SUM(CASE WHEN f.fst = ex.doc_id THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) + 0.0
                  AS novelty
         FROM ex JOIN f USING (sg) GROUP BY 1""",

    // first-signup cohort → 7-day purchase window → parity cohorts →
    // the a47 pooled-z closing, mirrored op-for-op
    "e2e_ab_test" ->
      """WITH fs AS (SELECT user_id, MIN(ts) AS s_ts FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
         conv AS (SELECT fs.user_id,
                         MAX(CASE WHEN e.event_type = 'purchase'
                                   AND e.ts >= fs.s_ts
                                   AND e.ts <= fs.s_ts + INTERVAL 7 DAY
                                  THEN 1 ELSE 0 END) AS converted
                  FROM fs LEFT JOIN events e ON e.user_id = fs.user_id
                  GROUP BY 1),
         c AS (SELECT
           CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN user_id % 2 = 0 AND converted = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS x1,
           CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN user_id % 2 <> 0 AND converted = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS x2
         FROM conv WHERE user_id IS NOT NULL),
         w AS (SELECT *,
                      CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
                        AS pp
               FROM c)
         SELECT n1, x1, n2, x2,
                CASE WHEN n1 > 0 THEN
                  ROUND(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) + 0.0
                END AS p1,
                CASE WHEN n2 > 0 THEN
                  ROUND(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) + 0.0
                END AS p2,
                CASE WHEN n1 > 0 AND n2 > 0 AND x1 + x2 > 0
                      AND x1 + x2 < n1 + n2 THEN
                  ROUND((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                    / SQRT((pp * (1.0 - pp))
                      * (1.0 / CAST(n1 AS DOUBLE)
                         + 1.0 / CAST(n2 AS DOUBLE))), 6) + 0.0
                END AS z
         FROM w""",

    "t07_context_negation" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' data ') AS parts FROM documents),
         s AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS sec_no, parts[i] AS section
               FROM t CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 500)) AS i)
               WHERE i <= LEN(parts))
         SELECT doc_id, sec_no,
                CASE WHEN REGEXP_MATCHES(section,
                       '(^|\s)(slow|small)(\s+\w+){0,2}\s+(scan|query)(\s|$)')
                     THEN 1 ELSE 0 END AS negated
         FROM s""",

    "t10_context_post" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' data ') AS parts FROM documents),
         s AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS sec_no, parts[i] AS section
               FROM t CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 500)) AS i)
               WHERE i <= LEN(parts))
         SELECT doc_id, sec_no,
                CASE WHEN REGEXP_MATCHES(section,
                       '(^|\s)(scan|query)(\s+\w+){0,2}\s+(slow|small)(\s|$)')
                     THEN 1 ELSE 0 END AS post_flag,
                CASE WHEN REGEXP_MATCHES(section,
                       '(^|\s)(slow|small)(\s+\w+){0,2}\s+(scan|query)(\s|$)')
                       OR REGEXP_MATCHES(section,
                       '(^|\s)(scan|query)(\s+\w+){0,2}\s+(slow|small)(\s|$)')
                     THEN 1 ELSE 0 END AS scoped_flag
         FROM s""",

    "t08_severity" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' data ') AS parts FROM documents),
         s AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS sec_no, parts[i] AS section
               FROM t CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 500)) AS i)
               WHERE i <= LEN(parts)),
         m AS (SELECT doc_id, sec_no,
                      REGEXP_EXTRACT(section,
                        '(^|\s)(slow|small)(\s+\w+){0,2}\s+(scan|query)(\s|$)', 2) AS modifier
               FROM s)
         SELECT doc_id, sec_no, modifier,
                CASE modifier WHEN 'slow' THEN 2 WHEN 'small' THEN 1 ELSE 0 END AS severity
         FROM m""",

    "a13b_fairness_melt" ->
      """WITH scored AS (
           SELECT o_orderpriority, o_orderstatus,
                  CASE WHEN o_totalprice >= 250000.0 THEN 1 ELSE 0 END AS truth,
                  CASE WHEN COALESCE(n_items, 0) >= 4 THEN 1 ELSE 0 END AS pred
           FROM orders LEFT JOIN (
             SELECT l_orderkey AS o_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY 1)
           USING (o_orderkey)),
         melted AS (
           SELECT 'o_orderpriority' AS attribute, o_orderpriority AS grp, truth, pred FROM scored
           UNION ALL
           SELECT 'o_orderstatus', o_orderstatus, truth, pred FROM scored),
         cells AS (
           SELECT attribute, grp,
                  CAST(SUM(CASE WHEN truth = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                  CAST(SUM(CASE WHEN truth = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                  CAST(SUM(CASE WHEN truth = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
                  CAST(SUM(CASE WHEN truth = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
           FROM melted GROUP BY attribute, grp)
         SELECT attribute, grp, tp, fp, tn, fn,
                ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) + 0.0 AS tpr,
                ROUND(CAST(tn AS DOUBLE) / NULLIF(tn + fp, 0), 6) + 0.0 AS tnr,
                ROUND(CAST(fp AS DOUBLE) / NULLIF(fp + tn, 0), 6) + 0.0 AS fpr,
                ROUND(CAST(fn AS DOUBLE) / NULLIF(fn + tp, 0), 6) + 0.0 AS fnr,
                ROUND(CAST(tp + fp AS DOUBLE) / NULLIF(tp + fp + tn + fn, 0), 6) + 0.0 AS pr,
                ROUND(CAST(tn + fn AS DOUBLE) / NULLIF(tp + fp + tn + fn, 0), 6) + 0.0 AS nr,
                ROUND(CAST(tp + tn AS DOUBLE) / NULLIF(tp + fp + tn + fn, 0), 6) + 0.0 AS accuracy
         FROM cells""",

    "j12b_next_within_gap_range" ->
      """SELECT v.o_orderkey,
                CAST(MAX(CASE WHEN w.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER)
                  AS label
         FROM orders v LEFT JOIN orders w
           ON v.o_custkey = w.o_custkey AND w.o_orderkey <> v.o_orderkey
          AND w.o_orderdate > v.o_orderdate
          AND w.o_orderdate <= v.o_orderdate + INTERVAL 90 DAY
         GROUP BY v.o_orderkey""",

    "p08_window_clip" ->
      """SELECT event_id,
                CAST(FLOOR(EPOCH(ts - TIMESTAMP '2024-01-01') / 3600) AS BIGINT) AS offset_h
         FROM events
         WHERE FLOOR(EPOCH(ts - TIMESTAMP '2024-01-01') / 3600) >= 0
           AND FLOOR(EPOCH(ts - TIMESTAMP '2024-01-01') / 3600) < 72""",

    "s03_tsv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",

    "s04_latin1_roundtrip" ->
      "SELECT n_nationkey, n_name || ' Müller-José' AS n_label FROM nation",

    "t15_context_classes" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' data ') AS parts FROM documents),
         s AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS sec_no, parts[i] AS section
               FROM t CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 500)) AS i)
               WHERE i <= LEN(parts))
         SELECT doc_id, sec_no,
                CASE WHEN REGEXP_MATCHES(section,
                       '(^|\s)(slow|small)(\s+\w+){0,2}\s+(scan|query)(\s|$)')
                     THEN 1 ELSE 0 END AS negated,
                CASE WHEN REGEXP_MATCHES(section,
                       '(^|\s)(old|prior|batch)(\s+\w+){0,2}\s+(join|merge)(\s|$)')
                     THEN 1 ELSE 0 END AS historical,
                CASE WHEN REGEXP_MATCHES(section,
                       '(^|\s)(group|cluster)(\s+\w+){0,2}\s+(key|row)(\s|$)')
                     THEN 1 ELSE 0 END AS family,
                CASE WHEN REGEXP_MATCHES(section,
                       '(^|\s)(fast|stream)(\s+\w+){0,2}\s+(sort|filter)(\s|$)')
                     THEN 1 ELSE 0 END AS hypothetical
         FROM s""",

    "s08_report_roundtrip" ->
      """SELECT 'status ' || o_orderstatus || ': n=' || COUNT(*)
                || ' avg=' || CAST(ROUND(AVG(o_totalprice), 2) AS VARCHAR)
                AS line
         FROM orders GROUP BY o_orderstatus""",

    "s06_partitioned_roundtrip" ->
      """SELECT l_returnflag, ROUND(SUM(l_quantity), 2) + 0.0 AS sum_qty,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1""",

    "s05_csvgz_roundtrip" ->
      "SELECT s_suppkey, s_name, s_acctbal FROM supplier",

    "s10_multiline_roundtrip" ->
      """SELECT p_partkey, REPLACE(p_name, ' ', CHR(10)) AS multi_name FROM part""",

    // the triage aggregate computed straight off part: %7 rows are the
    // planted corrupt lines
    "s16_dirty_recovery" ->
      """SELECT CAST(SUM(CASE WHEN p_partkey % 7 <> 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clean,
                CAST(SUM(CASE WHEN p_partkey % 7 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_corrupt,
                CAST(SUM(CASE WHEN p_partkey % 7 <> 0 THEN p_size END)
                  AS BIGINT) AS clean_size_sum
         FROM part""",

    "m03_frame_sample" ->
      """WITH n AS (SELECT doc_id, text,
                           CAST(FLOOR((OCTET_LENGTH(CAST(text AS BLOB)) - 1) / 64.0)
                             AS INTEGER) AS maxf
                    FROM documents)
         SELECT doc_id, CAST(i AS INTEGER) AS frame_no,
                CAST(i * 64 AS BIGINT) AS byte_offset,
                HEX(SUBSTR(text, i * 64 + 1, 16)) AS frame_hex
         FROM n CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 500)) AS i)
         WHERE i <= maxf""",

    // same px closed form as m02: bit i of the hash compares raster
    // pixels (i mod wh) and ((i+1) mod wh); 63 bits keep the BIGINT
    // non-negative
    "m05_phash" ->
      """WITH n AS (SELECT doc_id, text,
                           OCTET_LENGTH(CAST(text AS BLOB)) AS len,
                           CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 16 + 1 AS INTEGER) AS w,
                           CAST(doc_id % 8 + 1 AS INTEGER) AS h
                    FROM documents),
         px AS (SELECT doc_id, i, w * h AS wh,
                       ASCII(SUBSTR(text, CAST(i % len AS INTEGER) + 1, 1)) AS v
                FROM n CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 127)) AS i)
                WHERE i < w * h),
         g AS (SELECT DISTINCT doc_id, wh FROM px),
         bits AS (SELECT g.doc_id, b.i
                  FROM g CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 62)) AS i) b
                  JOIN px pa ON pa.doc_id = g.doc_id AND pa.i = b.i % g.wh
                  JOIN px pb ON pb.doc_id = g.doc_id AND pb.i = (b.i + 1) % g.wh
                  WHERE pa.v > pb.v)
         SELECT g.doc_id,
                CAST(COALESCE(SUM(CAST(1 AS BIGINT) << bits.i), 0) AS BIGINT)
                  AS phash
         FROM g LEFT JOIN bits USING (doc_id)
         GROUP BY 1""",

    // m05's phash closed form → 4×16-bit band join → exact XOR popcount
    // verify at Hamming ≤ 3; saturated bands dropped at the same cap
    "m10_phash_pairs" ->
      """WITH n AS (SELECT doc_id, text,
                           OCTET_LENGTH(CAST(text AS BLOB)) AS len,
                           CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 16 + 1 AS INTEGER) AS w,
                           CAST(doc_id % 8 + 1 AS INTEGER) AS h
                    FROM documents),
         px AS (SELECT doc_id, i, w * h AS wh,
                       ASCII(SUBSTR(text, CAST(i % len AS INTEGER) + 1, 1)) AS v
                FROM n CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 127)) AS i)
                WHERE i < w * h),
         g AS (SELECT DISTINCT doc_id, wh FROM px),
         bits AS (SELECT g.doc_id, b.i
                  FROM g CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 62)) AS i) b
                  JOIN px pa ON pa.doc_id = g.doc_id AND pa.i = b.i % g.wh
                  JOIN px pb ON pb.doc_id = g.doc_id AND pb.i = (b.i + 1) % g.wh
                  WHERE pa.v > pb.v),
         ph AS (SELECT g.doc_id,
                       CAST(COALESCE(SUM(CAST(1 AS BIGINT) << bits.i), 0)
                         AS BIGINT) AS phash
                FROM g LEFT JOIN bits USING (doc_id) GROUP BY 1),
         bands AS (SELECT doc_id, phash, b.i AS band,
                          (phash >> (b.i * 16)) & 65535 AS bkey
                   FROM ph CROSS JOIN
                     (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS i) b),
         keep AS (SELECT band, bkey FROM bands GROUP BY 1, 2
                  HAVING COUNT(*) <= 1000),
         capped AS (SELECT bands.* FROM bands JOIN keep USING (band, bkey)),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                         a.phash AS pa, b.phash AS pb
                  FROM capped a JOIN capped b
                    ON a.band = b.band AND a.bkey = b.bkey
                   AND a.doc_id < b.doc_id)
         SELECT id_a, id_b,
                CAST(BIT_COUNT(XOR(pa, pb)) AS INTEGER) AS hamming
         FROM cand WHERE BIT_COUNT(XOR(pa, pb)) <= 3""",

    // resize closed form: output (px, py) reads source raster index
    // (py·h//4)·w + (px·w//4), which is byte (idx mod len) of the text
    "m07_resize" ->
      """WITH n AS (SELECT doc_id, text,
                           OCTET_LENGTH(CAST(text AS BLOB)) AS len,
                           CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 16 + 1
                             AS INTEGER) AS w,
                           CAST(doc_id % 8 + 1 AS INTEGER) AS h
                    FROM documents),
         grid AS (SELECT doc_id, text, len, w, h, p.px, q.py
                  FROM n
                  CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS px) p
                  CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS py) q)
         SELECT doc_id, CAST(px AS INTEGER) AS px, CAST(py AS INTEGER) AS py,
                CAST(ASCII(SUBSTR(text,
                  CAST(((py * h // 4) * w + (px * w // 4)) % len
                    AS INTEGER) + 1, 1)) AS INTEGER) AS gray
         FROM grid""",

    // same px closed form as m02; bin = v // 16 (8-bit range, 16 equal
    // cells), empty bins absent on both sides
    "m09_luma_hist" ->
      """WITH n AS (SELECT doc_id, text,
                           OCTET_LENGTH(CAST(text AS BLOB)) AS len,
                           CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 16 + 1 AS INTEGER) AS w,
                           CAST(doc_id % 8 + 1 AS INTEGER) AS h
                    FROM documents),
         px AS (SELECT doc_id,
                       ASCII(SUBSTR(text, CAST(i % len AS INTEGER) + 1, 1)) AS v
                FROM n CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 127)) AS i)
                WHERE i < w * h)
         SELECT doc_id, CAST(v // 16 AS INTEGER) AS bin,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM px GROUP BY 1, 2""",

    // closed form of the PNG round-trip: pixel i of doc = byte (i mod len),
    // so the decoded raster checksums are computable straight off the text
    "m02_decode_png" ->
      """WITH n AS (SELECT doc_id, text,
                           OCTET_LENGTH(CAST(text AS BLOB)) AS len,
                           CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 16 + 1 AS INTEGER) AS w,
                           CAST(doc_id % 8 + 1 AS INTEGER) AS h
                    FROM documents),
         px AS (SELECT doc_id, w, h,
                       ASCII(SUBSTR(text, CAST(i % len AS INTEGER) + 1, 1)) AS v
                FROM n CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 127)) AS i)
                WHERE i < w * h)
         SELECT doc_id, w AS width, h AS height,
                CAST(SUM(v) AS BIGINT) AS px_sum,
                CAST(BIT_XOR(v) AS BIGINT) AS px_xor
         FROM px GROUP BY doc_id, w, h""",

    "m04_byte_features" ->
      """SELECT doc_id,
                ROUND(CASE WHEN OCTET_LENGTH(CAST(text AS BLOB)) >= 1 THEN ASCII(SUBSTR(text, 1, 1)) / 255.0 ELSE 0.0 END, 6) + 0.0 AS f0,
                ROUND(CASE WHEN OCTET_LENGTH(CAST(text AS BLOB)) >= 8 THEN ASCII(SUBSTR(text, 8, 1)) / 255.0 ELSE 0.0 END, 6) + 0.0 AS f1,
                ROUND(CASE WHEN OCTET_LENGTH(CAST(text AS BLOB)) >= 15 THEN ASCII(SUBSTR(text, 15, 1)) / 255.0 ELSE 0.0 END, 6) + 0.0 AS f2,
                ROUND(CASE WHEN OCTET_LENGTH(CAST(text AS BLOB)) >= 22 THEN ASCII(SUBSTR(text, 22, 1)) / 255.0 ELSE 0.0 END, 6) + 0.0 AS f3
         FROM documents""",

    "d13_segment_dedup" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         segs AS (SELECT doc_id,
                    UNNEST(GENERATE_SERIES(0, CAST(FLOOR((LEN(toks) - 1) / 4.0) AS INT))) AS seg_idx,
                    UNNEST(LIST_TRANSFORM(GENERATE_SERIES(0, CAST(FLOOR((LEN(toks) - 1) / 4.0) AS INT)),
                      i -> ARRAY_TO_STRING(toks[i*4+1 : i*4+4], ' '))) AS seg
                  FROM t),
         c AS (SELECT seg, COUNT(*) AS c FROM segs GROUP BY 1)
         SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
                CAST(SUM(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                COALESCE(STRING_AGG(CASE WHEN c.c < 2 THEN s.seg END, ' ' ORDER BY s.seg_idx), '')
                  AS clean_text
         FROM segs s JOIN c USING (seg) GROUP BY s.doc_id""",

    "t19_bm25_topk" ->
      """WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
                      FROM documents),
         dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tok GROUP BY 1),
         st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
         tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
                FROM tok WHERE tok IN ('spark', 'window', 'join') GROUP BY 1, 2),
         dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         contrib AS (SELECT tf.doc_id,
                            CAST(ROUND(LN((st.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                              * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)))
                              * 1e12, 0) AS BIGINT) AS cfp
                     FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) CROSS JOIN st)
         SELECT doc_id, ROUND(SUM(cfp) / 1e12, 6) + 0.0 AS score
         FROM contrib GROUP BY 1
         ORDER BY score DESC, doc_id ASC LIMIT 10""",

    // Dirichlet QLM: dense doc×term frame (absent terms score the
    // smoothed background), per-term LN contribution pinned to integer
    // picos before the per-doc sum — mirrors queryLikelihoodTopK
    // expression-for-expression (µ·(cf/C) grouping included)
    "t37_qlm_topk" ->
      """WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
                      FROM documents),
         dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tok GROUP BY 1),
         tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM tok),
         cf AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS cf
                FROM tok WHERE tok IN ('spark', 'window', 'join') GROUP BY 1),
         tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
                FROM tok WHERE tok IN ('spark', 'window', 'join') GROUP BY 1, 2),
         dense AS (SELECT dl.doc_id, dl.dl, t.tok
                   FROM dl CROSS JOIN (SELECT UNNEST(['spark', 'window', 'join']) AS tok) t),
         contrib AS (SELECT d.doc_id,
                            CAST(ROUND(LN((COALESCE(tf.tf, 0.0) + 200.0 * (cf.cf / tot.c))
                              / (d.dl + 200.0)) * 1e12, 0) AS BIGINT) AS cfp
                     FROM dense d
                     JOIN cf ON cf.tok = d.tok
                     LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.tok = d.tok
                     CROSS JOIN tot)
         SELECT doc_id, ROUND(SUM(cfp) / 1e12, 6) + 0.0 AS score
         FROM contrib GROUP BY 1
         ORDER BY score DESC, doc_id ASC LIMIT 20""",

    "q03_domain_quantile_gate" ->
      """WITH b AS (SELECT source, QUANTILE_CONT(n_chars, 0.5) AS thr
                    FROM documents GROUP BY 1)
         SELECT doc_id, source, n_chars
         FROM documents JOIN b USING (source) WHERE n_chars >= thr""",

    "dq03_psi" ->
      """WITH d AS (SELECT CAST(value AS DOUBLE) AS v,
                           CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS b
                    FROM events WHERE value IS NOT NULL),
         ext AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM d),
         counted AS (SELECT CASE WHEN hi = lo THEN 0
                            ELSE LEAST(CAST(FLOOR((v - lo) / ((hi - lo) / 10.0)) AS BIGINT), 9)
                            END AS bin,
                            SUM(b) AS nb, SUM(1 - b) AS nc
                     FROM d CROSS JOIN ext GROUP BY 1),
         tot AS (SELECT SUM(nb) AS tb, SUM(nc) AS tc FROM counted),
         dense AS (SELECT UNNEST(GENERATE_SERIES(0, 9)) AS bin),
         f AS (SELECT dense.bin,
                      (COALESCE(nb, 0) + 1.0) / (tb + 10.0) AS p,
                      (COALESCE(nc, 0) + 1.0) / (tc + 10.0) AS q
               FROM dense LEFT JOIN counted USING (bin) CROSS JOIN tot)
         SELECT CAST(bin AS INTEGER) AS bin, ROUND(p, 6) + 0.0 AS p_base,
                ROUND(q, 6) + 0.0 AS p_curr, ROUND((p - q) * LN(p / q), 6) + 0.0 AS psi_contrib
         FROM f""",

    "dq04_mad_outliers" ->
      """WITH med AS (SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
                      FROM events GROUP BY 1),
         dev AS (SELECT e.event_id, e.event_type, e.value,
                        ABS(e.value - m.med) AS absdev
                 FROM events e JOIN med m USING (event_type)
                 WHERE e.value IS NOT NULL),
         mad AS (SELECT event_type, QUANTILE_CONT(absdev, 0.5) AS mad
                 FROM dev GROUP BY 1)
         SELECT d.event_id, d.event_type, d.value,
                ROUND(d.absdev / (1.4826 * m.mad), 6) + 0.0 AS robust_z
         FROM dev d JOIN mad m USING (event_type)
         WHERE m.mad > 0 AND d.absdev / (1.4826 * m.mad) > 3.5""",

    "dq05_ks" ->
      """WITH g AS (
           SELECT value AS v,
                  SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS a,
                  SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS b
           FROM events WHERE value IS NOT NULL GROUP BY 1),
         c AS (
           SELECT SUM(a) OVER (ORDER BY v) AS ca,
                  SUM(b) OVER (ORDER BY v) AS cb
           FROM g)
         SELECT ROUND(MAX(ABS(ca * 1.0 / (SELECT SUM(a) FROM g)
                            - cb * 1.0 / (SELECT SUM(b) FROM g))), 6) + 0.0 AS ks
         FROM c""",

    "ml08_weighted_sample" ->
      """SELECT doc_id, n_chars FROM (
           SELECT doc_id, n_chars,
                  LN((CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                      + 0.5) / 4294967296.0) / n_chars AS pri
           FROM documents)
         ORDER BY pri DESC, doc_id ASC LIMIT 50""",

    "v07_ann_recall" ->
      """WITH e AS (SELECT vec_id, label,
                           LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         exact AS (
           SELECT query_id, neighbor_id FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                      ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                        / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6)
                        DESC, c.vec_id ASC) AS rn
             FROM (SELECT * FROM e WHERE vec_id < 8) q
             CROSS JOIN e c WHERE c.vec_id <> q.vec_id) WHERE rn <= 3),
         approx AS (
           SELECT query_id, neighbor_id FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                      ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                        / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6)
                        DESC, c.vec_id ASC) AS rn
             FROM (SELECT * FROM e WHERE vec_id < 8) q
             JOIN e c ON q.label = c.label AND c.vec_id <> q.vec_id) WHERE rn <= 3),
         hits AS (SELECT x.query_id, COUNT(*) AS n_hits
                  FROM exact x JOIN approx a
                    ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
                  GROUP BY 1)
         SELECT x.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                CAST(COUNT(*) AS BIGINT) AS k,
                ROUND(COALESCE(h.n_hits, 0) * 1.0 / COUNT(*), 6) + 0.0 AS recall
         FROM exact x LEFT JOIN hits h USING (query_id)
         GROUP BY x.query_id, h.n_hits""",

    // the v06 multi-probe candidate machinery parameterized by a probe
    // budget VALUES list, each evaluated against ONE shared v07 exact list
    "v23_recall_nprobe_sweep" ->
      """WITH e AS (SELECT vec_id, label,
                           LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         cm AS (SELECT label, i, ROUND(AVG(v[i]), 6) + 0.0 AS m
                FROM e CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 64)) AS i)
                GROUP BY label, i),
         cl AS (SELECT label, LIST(m ORDER BY i) AS cv FROM cm GROUP BY label),
         cents AS (SELECT DENSE_RANK() OVER (ORDER BY label) - 1 AS cluster, cv
                   FROM cl),
         dd AS (SELECT e.vec_id, c.cluster,
                       LIST_SUM(LIST_TRANSFORM(range(1, 65),
                         i -> (v[i] - cv[i]) * (v[i] - cv[i]))) AS dist
                FROM e CROSS JOIN cents c),
         pr AS (SELECT vec_id, cluster,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                         ORDER BY dist ASC, cluster ASC) AS rn
                FROM dd),
         own AS (SELECT vec_id, cluster FROM pr WHERE rn = 1),
         np(np) AS (VALUES (1), (2), (4)),
         cand AS (SELECT np.np, p.vec_id AS query_id, o.vec_id AS neighbor_id
                  FROM np CROSS JOIN pr p
                  JOIN own o ON p.cluster = o.cluster AND o.vec_id <> p.vec_id
                  WHERE p.rn <= np.np AND p.vec_id < 8),
         approx AS (SELECT np, query_id, neighbor_id FROM (
                      SELECT c.np, c.query_id, c.neighbor_id,
                             ROW_NUMBER() OVER (PARTITION BY c.np, c.query_id
                               ORDER BY ROUND(LIST_DOT_PRODUCT(q.v, n.v)
                                 / (SQRT(LIST_DOT_PRODUCT(q.v, q.v))
                                    * SQRT(LIST_DOT_PRODUCT(n.v, n.v))), 6)
                                 DESC, c.neighbor_id ASC) AS rn
                      FROM cand c
                      JOIN e q ON q.vec_id = c.query_id
                      JOIN e n ON n.vec_id = c.neighbor_id)
                    WHERE rn <= 3),
         exact AS (
           SELECT query_id, neighbor_id FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                      ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                        / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6)
                        DESC, c.vec_id ASC) AS rn
             FROM (SELECT * FROM e WHERE vec_id < 8) q
             CROSS JOIN e c WHERE c.vec_id <> q.vec_id) WHERE rn <= 3),
         hits AS (SELECT a.np, x.query_id, COUNT(*) AS n_hits
                  FROM exact x JOIN approx a
                    ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
                  GROUP BY 1, 2)
         SELECT x.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                CAST(COUNT(*) AS BIGINT) AS k,
                ROUND(COALESCE(h.n_hits, 0) * 1.0 / COUNT(*), 6) + 0.0 AS recall,
                CAST(np.np AS INTEGER) AS n_probe
         FROM np CROSS JOIN exact x
         LEFT JOIN hits h ON h.np = np.np AND h.query_id = x.query_id
         GROUP BY x.query_id, h.n_hits, np.np""",

    "s13_bucketed_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, qty
         FROM orders JOIN (
           SELECT l_orderkey AS o_orderkey, ROUND(SUM(l_quantity), 6) + 0.0 AS qty
           FROM lineitem GROUP BY 1)
         USING (o_orderkey)""",

    "s12_mergeschema_roundtrip" ->
      """SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey
         FROM nation WHERE n_nationkey < 12
         UNION ALL
         SELECT n_nationkey, n_name, n_regionkey
         FROM nation WHERE n_nationkey >= 12""",

    "f24_percent_rank" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
                ROUND(PERCENT_RANK() OVER (ORDER BY l_extendedprice), 6) + 0.0 AS pr
         FROM lineitem""",

    "t20_pmi_bigrams" ->
      """WITH t AS (SELECT STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         uc AS (SELECT tok, COUNT(*) AS c FROM
                  (SELECT UNNEST(toks) AS tok FROM t) GROUP BY 1),
         tu AS (SELECT CAST(SUM(c) AS DOUBLE) AS tu FROM uc),
         bc AS (SELECT gram, COUNT(*) AS n_pairs FROM
                  (SELECT UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                     i -> toks[i] || ' ' || toks[i+1])) AS gram
                   FROM t WHERE LEN(toks) >= 2) GROUP BY 1),
         tb AS (SELECT CAST(SUM(n_pairs) AS DOUBLE) AS tb FROM bc)
         SELECT STRING_SPLIT(gram, ' ')[1] AS tok_a,
                STRING_SPLIT(gram, ' ')[2] AS tok_b,
                CAST(n_pairs AS BIGINT) AS n_pairs,
                ROUND(LN((n_pairs / tb.tb) / ((a.c / tu.tu) * (b.c / tu.tu))), 6) + 0.0 AS pmi
         FROM bc CROSS JOIN tb CROSS JOIN tu
         JOIN uc a ON a.tok = STRING_SPLIT(gram, ' ')[1]
         JOIN uc b ON b.tok = STRING_SPLIT(gram, ' ')[2]
         WHERE n_pairs >= 5""",

    "ml09_curriculum_phase" ->
      """WITH r AS (SELECT doc_id, n_chars,
                ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn
              FROM documents),
         n AS (SELECT COUNT(*) AS n FROM documents)
         SELECT doc_id, n_chars, CAST(rn AS BIGINT) AS rn,
                CAST(((rn - 1) * 4) // n AS INTEGER) AS phase
         FROM r CROSS JOIN n""",

    "t21_kl_divergence" ->
      """WITH tok AS (SELECT source, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
                      FROM documents),
         c AS (SELECT tok, COUNT(*) AS cc FROM tok GROUP BY 1),
         st AS (SELECT CAST(SUM(cc) AS DOUBLE) AS n, CAST(COUNT(*) AS DOUBLE) AS v FROM c),
         cq AS (SELECT c.tok,
                       CAST(ROUND(LN((c.cc + 1.0) / (st.n + st.v)) * 1e12, 0)
                         AS BIGINT) AS lpcq,
                       st.v AS v
                FROM c CROSS JOIN st),
         lall AS (SELECT SUM(lpcq) AS lallq FROM cq),
         seen AS (SELECT source, tok, COUNT(*) AS sc FROM tok GROUP BY 1, 2),
         g AS (SELECT s.source,
                      CAST(SUM(s.sc) AS DOUBLE) AS ns,
                      CAST(COUNT(*) AS DOUBLE) AS vs,
                      SUM(CAST(s.sc + 1 AS HUGEINT)
                          * CAST(ROUND(LN(s.sc + 1.0) * 1e12, 0) AS BIGINT))
                        AS aq,
                      SUM(s.sc + 1.0) AS b,
                      SUM(CAST(s.sc + 1 AS HUGEINT) * cq.lpcq) AS dq,
                      SUM(cq.lpcq) AS lseenq,
                      ANY_VALUE(cq.v) AS v
               FROM seen s JOIN cq USING (tok)
               GROUP BY 1)
         SELECT source, CAST(ns AS BIGINT) AS n_tokens, CAST(vs AS BIGINT) AS n_types,
                ROUND((CAST(aq AS DOUBLE) / 1e12 - b * LN(ns + v)
                       - CAST(dq AS DOUBLE) / 1e12) / (ns + v)
                      + (1.0 / (ns + v)) * LN(1.0 / (ns + v)) * (v - vs)
                      - (1.0 / (ns + v))
                        * (CAST(lall.lallq - lseenq AS DOUBLE) / 1e12), 6)
                  + 0.0 AS kl
         FROM g CROSS JOIN lall""",

    "j18_interval_overlap" ->
      """WITH iv AS (SELECT o_custkey, o_orderkey,
                CAST(DATEDIFF('day', TIMESTAMP '1990-01-01', o_orderdate) AS BIGINT) AS s_day
              FROM orders)
         SELECT a.o_custkey, a.o_orderkey AS id_a, b.o_orderkey AS id_b,
                CAST(LEAST(a.s_day + 30, b.s_day + 30)
                   - GREATEST(a.s_day, b.s_day) AS BIGINT) AS overlap_days
         FROM iv a JOIN iv b
           ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
          AND a.s_day < b.s_day + 30 AND b.s_day < a.s_day + 30""",

    "f25_feature_hash" ->
      """WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
                      FROM documents)
         SELECT doc_id,
                CAST(CAST(('0x' || SUBSTRING(MD5(tok), 1, 4)) AS BIGINT) % 64 AS INTEGER)
                  AS bucket,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM tok GROUP BY 1, 2""",

    "j17_salted_join" ->
      """SELECT o_orderstatus,
                ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) + 0.0 AS revenue,
                CAST(COUNT(*) AS BIGINT) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus""",

    "u07_snapshot_diff" ->
      """WITH old AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                      FROM orders WHERE o_orderkey % 5 <> 0),
         neu AS (SELECT o_orderkey, o_orderstatus,
                        CASE WHEN o_orderkey % 3 = 0
                             THEN ROUND(o_totalprice * 1.1, 2)
                             ELSE o_totalprice END AS o_totalprice
                 FROM orders WHERE o_orderkey % 7 <> 0),
         d AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                      CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                           WHEN n.o_orderkey IS NULL THEN 'delete'
                           WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                             OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                             THEN 'update'
                           ELSE 'unchanged' END AS op
               FROM old o FULL OUTER JOIN neu n ON o.o_orderkey = n.o_orderkey)
         SELECT o_orderkey, op FROM d WHERE op <> 'unchanged'""",

    "u08_apply_changelog" ->
      """WITH cur AS (SELECT c_custkey, c_nationkey, c_acctbal FROM customer),
         changes AS (
           SELECT CASE WHEN c_custkey % 10 = 3 THEN c_custkey + 1000000
                       ELSE c_custkey END AS c_custkey,
                  c_nationkey,
                  CASE WHEN c_custkey % 10 = 3 THEN 0.0
                       ELSE c_acctbal + 100.0 END AS c_acctbal,
                  CASE WHEN c_custkey % 10 = 0 THEN 'delete'
                       ELSE 'upsert' END AS op
           FROM cur WHERE c_custkey % 10 <= 3)
         SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
         FROM cur c LEFT JOIN changes ch ON c.c_custkey = ch.c_custkey
         WHERE ch.c_custkey IS NULL
         UNION ALL
         SELECT c_custkey, c_nationkey, c_acctbal FROM changes
         WHERE op <> 'delete'""",

    "w13_scd_intervals" ->
      """WITH e AS (SELECT user_id, event_id, ts, event_type,
                CASE WHEN LAG(event_type) OVER w IS NOT DISTINCT FROM event_type
                     THEN 0 ELSE 1 END AS chg
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         r AS (SELECT user_id, ts, event_type,
                 SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
               FROM e),
         g AS (SELECT user_id, run, MIN(event_type) AS event_type,
                      MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
               FROM r GROUP BY 1, 2)
         SELECT user_id, event_type, valid_from,
                LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run) AS valid_to,
                n_events
         FROM g""",

    // mirrors RegressionOps.groupOls EXPRESSION SHAPE: integer sufficient
    // statistics (exact — x is day counts, y price cents), then the same
    // double-op sequence (n promoted once, num/den/deny formed identically)
    // so both engines execute bit-identical IEEE arithmetic
    "a23_group_ols" ->
      """WITH b AS (
           SELECT o_custkey,
                  CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS x,
                  CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS y
           FROM orders),
         g AS (
           SELECT o_custkey, COUNT(*) AS n,
                  SUM(x) AS sx, SUM(y) AS sy,
                  SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
           FROM b GROUP BY 1),
         g2 AS (
           SELECT o_custkey, n, sx, sy,
                  CAST(n AS DOUBLE) * sxy - sx * sy AS num,
                  CAST(n AS DOUBLE) * sxx - sx * sx AS den,
                  CAST(n AS DOUBLE) * syy - sy * sy AS deny
           FROM g)
         SELECT o_custkey, CAST(n AS BIGINT) AS n,
                ROUND(num / den, 6) + 0.0 AS slope,
                ROUND((sy - (num / den) * sx) / CAST(n AS DOUBLE), 6) + 0.0 AS intercept,
                ROUND(CASE WHEN deny <> 0 THEN num * num / (den * deny) END, 6) + 0.0 AS r2
         FROM g2 WHERE n >= 2 AND den <> 0""",

    "ts05_transitions" ->
      """SELECT event_type AS from_state, next_type AS to_state,
                COUNT(*) AS cnt
         FROM (SELECT event_type,
                      LEAD(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS next_type
               FROM events)
         WHERE next_type IS NOT NULL GROUP BY 1, 2""",

    // same fixed-point form as the Spark side: Δt exact integer seconds
    // (floor of a µs diff that can't straddle a floor edge), value
    // quantized to integer micros, BIGINT product sums
    "ts06_time_weighted_avg" ->
      """WITH p AS (
           SELECT user_id, value,
                  CAST(FLOOR((epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id)) - epoch_us(ts)) / 1000000.0)
                    AS BIGINT) AS dt_s
           FROM events WHERE value IS NOT NULL)
         SELECT user_id, CAST(SUM(dt_s) AS BIGINT) AS held_s,
                ROUND(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT) * dt_s) / 1e6
                      / SUM(dt_s), 6) + 0.0 AS twa
         FROM p WHERE dt_s IS NOT NULL
         GROUP BY 1 HAVING SUM(dt_s) > 0""",

    "f26_fuzzy_normalize" -> s"""
         WITH dd AS (SELECT DISTINCT split_part(p_name, ' ', 2) AS dirty
                     FROM part),
         c(canon) AS (VALUES $fuzzyDictSqlValues),
         best AS (
           SELECT dirty, canon, dist FROM (
             SELECT dd.dirty, c.canon,
                    levenshtein(dd.dirty, c.canon) AS dist,
                    ROW_NUMBER() OVER (PARTITION BY dd.dirty
                      ORDER BY levenshtein(dd.dirty, c.canon), c.canon) AS rn
             FROM dd CROSS JOIN c
             WHERE levenshtein(dd.dirty, c.canon) <= 2) q
           WHERE rn = 1)
         SELECT dd.dirty, best.canon, CAST(best.dist AS INTEGER) AS dist
         FROM dd LEFT JOIN best USING (dirty)""",

    "f28_quantile_normalize" ->
      """WITH r AS (
           SELECT source, doc_id, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY n_chars, doc_id) AS rn,
                  COUNT(*) OVER (PARTITION BY source) AS gn
           FROM documents),
         b AS (SELECT source, doc_id, n_chars,
                      CAST(((rn - 1) * 10) // gn AS INTEGER) AS bucket
               FROM r),
         p AS (SELECT bucket,
                      CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS ref
               FROM b GROUP BY 1)
         SELECT b.source, b.doc_id, b.n_chars AS orig, b.bucket,
                ROUND(p.ref, 6) + 0.0 AS normalized
         FROM b JOIN p USING (bucket)""",

    // 3 unrolled PageRank iterations replaying the exact Spark arithmetic:
    // fixed-point (pico) contribution sums, 9dp pinning per iteration —
    // the same trajectory both engines walk step for step
    "pr01_pagerank" ->
      """WITH base AS (
           SELECT event_type,
                  LEAD(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS next_type
           FROM events),
         e AS (SELECT event_type AS src, next_type AS dst,
                      CAST(COUNT(*) AS DOUBLE) AS w
               FROM base WHERE next_type IS NOT NULL GROUP BY 1, 2),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         ow AS (SELECT src, SUM(w) AS outw FROM e GROUP BY 1),
         r0 AS (SELECT node, ROUND(1.0 / n, 9) + 0.0 AS rank
                FROM nodes CROSS JOIN nn),
         c1 AS (SELECT e.dst AS node,
                       SUM(CAST(ROUND(r.rank / ow.outw * e.w * 1e12, 0) AS BIGINT)) AS cfp
                FROM r0 r JOIN ow ON r.node = ow.src JOIN e ON e.src = r.node
                GROUP BY 1),
         d1 AS (SELECT COALESCE(SUM(CAST(ROUND(r.rank * 1e12, 0) AS BIGINT)), 0) AS dfp
                FROM r0 r LEFT JOIN ow ON r.node = ow.src WHERE ow.src IS NULL),
         r1 AS (SELECT r.node,
                       ROUND((1.0 - 0.85) / n + 0.85 *
                         (COALESCE(c.cfp, 0) / 1e12 + d.dfp / 1e12 / n), 9) + 0.0 AS rank
                FROM r0 r LEFT JOIN c1 c ON r.node = c.node
                CROSS JOIN d1 d CROSS JOIN nn),
         c2 AS (SELECT e.dst AS node,
                       SUM(CAST(ROUND(r.rank / ow.outw * e.w * 1e12, 0) AS BIGINT)) AS cfp
                FROM r1 r JOIN ow ON r.node = ow.src JOIN e ON e.src = r.node
                GROUP BY 1),
         d2 AS (SELECT COALESCE(SUM(CAST(ROUND(r.rank * 1e12, 0) AS BIGINT)), 0) AS dfp
                FROM r1 r LEFT JOIN ow ON r.node = ow.src WHERE ow.src IS NULL),
         r2 AS (SELECT r.node,
                       ROUND((1.0 - 0.85) / n + 0.85 *
                         (COALESCE(c.cfp, 0) / 1e12 + d.dfp / 1e12 / n), 9) + 0.0 AS rank
                FROM r1 r LEFT JOIN c2 c ON r.node = c.node
                CROSS JOIN d2 d CROSS JOIN nn),
         c3 AS (SELECT e.dst AS node,
                       SUM(CAST(ROUND(r.rank / ow.outw * e.w * 1e12, 0) AS BIGINT)) AS cfp
                FROM r2 r JOIN ow ON r.node = ow.src JOIN e ON e.src = r.node
                GROUP BY 1),
         d3 AS (SELECT COALESCE(SUM(CAST(ROUND(r.rank * 1e12, 0) AS BIGINT)), 0) AS dfp
                FROM r2 r LEFT JOIN ow ON r.node = ow.src WHERE ow.src IS NULL),
         r3 AS (SELECT r.node,
                       ROUND((1.0 - 0.85) / n + 0.85 *
                         (COALESCE(c.cfp, 0) / 1e12 + d.dfp / 1e12 / n), 9) + 0.0 AS rank
                FROM r2 r LEFT JOIN c3 c ON r.node = c.node
                CROSS JOIN d3 d CROSS JOIN nn)
         SELECT node, ROUND(rank, 6) + 0.0 AS rank FROM r3""",

    // leading digit via the value's shortest decimal representation — a
    // pure function of the double's bits, identical across engines
    "dq06_benford" ->
      """WITH c AS (
           SELECT CAST(regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]', 0)
                    AS INTEGER) AS digit,
                  COUNT(*) AS n
           FROM orders
           WHERE o_totalprice IS NOT NULL
             AND regexp_extract(CAST(o_totalprice AS VARCHAR), '[1-9]', 0) <> ''
           GROUP BY 1),
         t AS (SELECT SUM(n) AS tot FROM c)
         SELECT digit, CAST(n AS BIGINT) AS n,
                ROUND(CAST(n AS DOUBLE) / tot, 6) + 0.0 AS obs_share,
                ROUND(LN(1.0 + 1.0 / digit) / LN(10.0), 6) + 0.0 AS exp_share,
                ROUND(tot * (CAST(n AS DOUBLE) / tot - LN(1.0 + 1.0 / digit) / LN(10.0))
                          * (CAST(n AS DOUBLE) / tot - LN(1.0 + 1.0 / digit) / LN(10.0))
                      / (LN(1.0 + 1.0 / digit) / LN(10.0)), 6) + 0.0 AS chi2_part
         FROM c CROSS JOIN t""",

    // exact rank-formula Gini over integer cents: both Σx and Σ r·x are
    // exact integer sums, the closing arithmetic replays Spark's double
    // sequence verbatim
    "a24_gini" ->
      """WITH v AS (SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS x,
                           o_orderkey
                    FROM orders),
         r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_orderkey) AS rn
               FROM v),
         g AS (SELECT COUNT(*) AS n, SUM(x) AS s, SUM(rn * x) AS si FROM r)
         SELECT CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS total,
                ROUND(2.0 * si / (CAST(n AS DOUBLE) * s)
                      - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) + 0.0 AS gini
         FROM g""",

    // same quantized-log OLS as RegressionOps.zipfFit: rank by (count
    // desc, token asc), ln values rounded to integer 1e5 units, then the
    // groupOls integer-sum formula
    "t22_zipf_fit" ->
      """WITH tok AS (
           SELECT UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
           FROM documents),
         c AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY 1),
         r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rn
               FROM c),
         b AS (SELECT CAST(ROUND(LN(CAST(rn AS DOUBLE)) * 100000.0, 0) AS BIGINT) AS x,
                      CAST(ROUND(LN(CAST(cnt AS DOUBLE)) * 100000.0, 0) AS BIGINT) AS y
               FROM r),
         g AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                      SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
               FROM b),
         g2 AS (SELECT n, sx, sy,
                       CAST(n AS DOUBLE) * sxy - sx * sy AS num,
                       CAST(n AS DOUBLE) * sxx - sx * sx AS den,
                       CAST(n AS DOUBLE) * syy - sy * sy AS deny
                FROM g)
         SELECT CAST(n AS BIGINT) AS n,
                ROUND(num / den, 6) + 0.0 AS slope,
                ROUND((sy - (num / den) * sx) / CAST(n AS DOUBLE), 6) + 0.0 AS intercept,
                ROUND(CASE WHEN deny <> 0 THEN num * num / (den * deny) END, 6) + 0.0 AS r2
         FROM g2 WHERE n >= 2 AND den <> 0""",

    "ml10_class_weights" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot,
                      CAST(COUNT(*) AS BIGINT) AS k FROM c)
         SELECT lang, CAST(n AS BIGINT) AS n,
                ROUND(CAST(tot AS DOUBLE) / (k * n), 6) + 0.0 AS weight
         FROM c CROSS JOIN t""",

    // cumulative TP / totals over distinct thresholds descending (no ties
    // inside the window — grouped support), then correctly-rounded
    // long/long divisions against the 1-row (P, N) totals
    "a21_roc_points" ->
      """WITH g AS (
           SELECT o_totalprice AS threshold,
                  SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS np,
                  COUNT(*) AS nt
           FROM orders GROUP BY 1),
         c AS (SELECT threshold, np, nt,
                      SUM(np) OVER (ORDER BY threshold DESC) AS tp,
                      SUM(nt) OVER (ORDER BY threshold DESC) AS al
               FROM g),
         t AS (SELECT CAST(SUM(np) AS BIGINT) AS p,
                      CAST(SUM(nt) AS BIGINT) AS n FROM g)
         SELECT threshold,
                ROUND(CAST(tp AS DOUBLE) / p, 6) + 0.0 AS tpr,
                ROUND(CAST(al - tp AS DOUBLE) / (n - p), 6) + 0.0 AS fpr
         FROM c CROSS JOIN t""",

    // same integer-deviation CUSUM as TimeSeriesOps.cusumPeaks: dᵢ =
    // vᵢ·n − Σv in BIGINT, running sum and |argmax| compare exact
    // integers; only the reported score divides
    "ts07_cusum" ->
      """WITH p AS (
           SELECT user_id, ts, event_id,
                  CAST(ROUND(value * 1e6, 0) AS BIGINT) AS vfp
           FROM events WHERE value IS NOT NULL),
         s AS (SELECT user_id, ts, event_id, vfp,
                      COUNT(*) OVER (PARTITION BY user_id) AS n,
                      SUM(vfp) OVER (PARTITION BY user_id) AS tot
               FROM p),
         c AS (SELECT user_id, ts, event_id, n,
                      SUM(vfp * n - tot) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
               FROM s),
         r AS (SELECT user_id, n, ts, cusum,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ABS(cusum) DESC, ts, event_id) AS pr
               FROM c)
         SELECT user_id, CAST(n AS BIGINT) AS n, ts AS peak_ts,
                ROUND(ABS(cusum) / 1e6 / n / n, 6) + 0.0 AS cusum_score
         FROM r WHERE pr = 1""",

    // same fixed-point log-space KM product: exact integer at-risk
    // counts, ln(1 − d/n) pinned to integer picos, risk-set-exhausting
    // time points forced to exactly 0 instead of touching ln(0)
    "a25_kaplan_meier" ->
      """WITH subj AS (
           SELECT c_mktsegment AS segment,
                  CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                    AS BIGINT) AS dur,
                  MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ev
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY o_custkey, c_mktsegment),
         p AS (SELECT segment, dur AS t,
                      CAST(SUM(ev) AS BIGINT) AS d,
                      CAST(SUM(1 - ev) AS BIGINT) AS c,
                      CAST(COUNT(*) AS BIGINT) AS m
               FROM subj GROUP BY 1, 2),
         r AS (SELECT segment, t, d, c,
                      SUM(m) OVER (PARTITION BY segment)
                        - (SUM(m) OVER (PARTITION BY segment ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - m) AS n_risk
               FROM p),
         l AS (SELECT *,
                      CASE WHEN d = 0 THEN 0
                           WHEN d < n_risk THEN CAST(ROUND(
                             LN(1 - CAST(d AS DOUBLE) / n_risk) * 1e12, 0)
                             AS BIGINT) END AS lfp,
                      MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                        OVER (PARTITION BY segment ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS dead
               FROM r)
         SELECT segment, t, CAST(n_risk AS BIGINT) AS n_risk, d, c,
                CASE WHEN dead = 1 THEN 0.0
                     ELSE ROUND(EXP(SUM(lfp) OVER (PARTITION BY segment
                            ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) / 1e12), 6) END AS surv
         FROM l""",

    // same hypergeometric logrank terms in integer picos; the o1−e1 sum
    // and the variance sum are exact BIGINT before the single division
    "a26_logrank" ->
      """WITH subj AS (
           SELECT CASE WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
                       THEN 1 ELSE 0 END AS g1,
                  CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                    AS BIGINT) AS dur,
                  MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ev
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY o_custkey, c_mktsegment),
         p AS (SELECT dur AS t,
                      CAST(SUM(ev) AS BIGINT) AS d,
                      CAST(SUM(ev * g1) AS BIGINT) AS d1,
                      CAST(COUNT(*) AS BIGINT) AS m,
                      CAST(SUM(g1) AS BIGINT) AS m1
               FROM subj GROUP BY 1),
         r AS (SELECT *,
                      (SELECT SUM(m) FROM p)
                        - (SUM(m) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) - m) AS n,
                      (SELECT SUM(m1) FROM p)
                        - (SUM(m1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) - m1) AS n1
               FROM p),
         f AS (SELECT d, d1, n, n1,
                      CAST(ROUND(d * n1 / CAST(n AS DOUBLE) * 1e12, 0)
                        AS BIGINT) AS e1fp,
                      CAST(ROUND(d * (n1 / CAST(n AS DOUBLE))
                             * (1 - n1 / CAST(n AS DOUBLE))
                             * (n - d) / (n - 1) * 1e12, 0)
                        AS BIGINT) AS vfp
               FROM r WHERE d > 0 AND n > 1)
         SELECT CAST(SUM(d1) AS BIGINT) AS o1,
                ROUND(SUM(e1fp) / 1e12, 6) + 0.0 AS e1,
                ROUND(POWER(SUM(d1 * 1000000000000 - e1fp) / 1e12, 2)
                      / (SUM(vfp) / 1e12), 6) + 0.0 AS chi2
         FROM f""",

    // same per-cell fixed-point χ²/MI terms over the DENSIFIED r×c grid
    // (never-co-occurring combos still contribute (0−e)²/e to χ²; their
    // MI limit 0·ln0 = 0 is pinned explicitly)
    "a27_cat_assoc" ->
      """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
                               CAST(COUNT(*) AS BIGINT) AS nab
                        FROM orders GROUP BY 1, 2),
         rt AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM cells GROUP BY 1),
         ct AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM cells GROUP BY 1),
         g AS (SELECT CAST(SUM(nab) AS BIGINT) AS N,
                      CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
                      CAST(COUNT(DISTINCT b) AS BIGINT) AS c
               FROM cells),
         f AS (SELECT COALESCE(nab, 0) AS nab, na, nb, N, r, c,
                      na * nb / CAST(N AS DOUBLE) AS e
               FROM rt CROSS JOIN ct
               LEFT JOIN cells USING (a, b) CROSS JOIN g),
         t AS (SELECT N, r, c,
                      CAST(ROUND((nab - e) * (nab - e) / e * 1e9, 0)
                        AS BIGINT) AS chifp,
                      CASE WHEN nab = 0 THEN 0
                           ELSE CAST(ROUND(nab / CAST(N AS DOUBLE)
                             * LN(nab * N / (CAST(na AS DOUBLE) * nb))
                             * 1e12, 0) AS BIGINT) END AS mifp
               FROM f)
         SELECT N AS n, r, c,
                ROUND(SUM(chifp) / 1e9, 6) + 0.0 AS chi2,
                ROUND(CASE WHEN LEAST(r, c) > 1
                           THEN SQRT(SUM(chifp) / 1e9 / (N * (LEAST(r, c) - 1)))
                           ELSE 0.0 END, 6) + 0.0 AS cramers_v,
                ROUND(SUM(mifp) / 1e12, 6) + 0.0 AS mutual_info
         FROM t GROUP BY 1, 2, 3""",

    // canonical a<b pair counts; the top-100 boundary is a total order
    "g01_cooccur_topk" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                     FROM lineitem)
         SELECT a.i AS src, b.i AS dst, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM li a JOIN li b ON a.b = b.b AND a.i < b.i
         GROUP BY 1, 2
         ORDER BY cnt DESC, src, dst LIMIT 100""",

    // orientation-free triangle count — for canonical src<dst edges the
    // (x<y<z) pattern joins each triangle exactly once, matching the
    // degree-ordered Spark plan's count
    "g02_brand_triangles" ->
      """WITH bsk AS (SELECT DISTINCT l_orderkey AS b, p_brand AS i
                      FROM lineitem JOIN part ON l_partkey = p_partkey),
         e AS (SELECT a.i AS s, b.i AS t
               FROM bsk a JOIN bsk b ON a.b = b.b AND a.i < b.i
               GROUP BY 1, 2 HAVING COUNT(*) >= 20)
         SELECT CAST(COUNT(*) AS BIGINT) AS triangles
         FROM e e1 JOIN e e2 ON e1.t = e2.s
                   JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t""",

    "g03_degree_hist" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                     FROM lineitem),
         e AS (SELECT a.i AS s, b.i AS t
               FROM li a JOIN li b ON a.b = b.b AND a.i < b.i
               GROUP BY 1, 2),
         d AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
               FROM (SELECT s AS n FROM e UNION ALL SELECT t AS n FROM e)
               GROUP BY 1)
         SELECT deg AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
         FROM d GROUP BY 1""",

    // same exact-integer mean/variance assembly (squares via HUGEINT on
    // this side, DECIMAL(38,0) on Spark's — same exact integer, same
    // nearest double); dayofweek is 0=Sunday..6 in both dialects after
    // Spark's −1 shift
    "ts08_seasonal_profile" ->
      """WITH e AS (SELECT event_type,
                           CAST(dayofweek(ts) AS INT) AS dow,
                           CAST(hour(ts) AS INT) AS hod,
                           CAST(ROUND(value * 1e6, 0) AS BIGINT) AS vfp
                    FROM events WHERE value IS NOT NULL)
         SELECT event_type, dow, hod,
                CAST(COUNT(*) AS BIGINT) AS n,
                ROUND(SUM(vfp) / COUNT(*) / 1e6, 6) + 0.0 AS mean_v,
                ROUND(SQRT((CAST(SUM(CAST(vfp AS HUGEINT) * vfp) AS DOUBLE)
                              * COUNT(*)
                            - CAST(SUM(vfp) AS DOUBLE) * SUM(vfp))
                           / (CAST(COUNT(*) AS DOUBLE) * COUNT(*)) / 1e12), 6) + 0.0
                  AS std_v
         FROM e GROUP BY 1, 2, 3""",

    // z from the profile's ROUNDED (mean, std) — one subtraction and one
    // division on identical doubles, so the cut agrees bit-for-bit
    "ts09_seasonal_anomaly" ->
      """WITH e AS (SELECT event_type,
                           CAST(dayofweek(ts) AS INT) AS dow,
                           CAST(hour(ts) AS INT) AS hod,
                           CAST(ROUND(value * 1e6, 0) AS BIGINT) AS vfp
                    FROM events WHERE value IS NOT NULL),
         prof AS (SELECT event_type, dow, hod,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         ROUND(SUM(vfp) / COUNT(*) / 1e6, 6) + 0.0 AS mean_v,
                         ROUND(SQRT((CAST(SUM(CAST(vfp AS HUGEINT) * vfp)
                                       AS DOUBLE) * COUNT(*)
                                     - CAST(SUM(vfp) AS DOUBLE) * SUM(vfp))
                                    / (CAST(COUNT(*) AS DOUBLE) * COUNT(*))
                                    / 1e12), 6) + 0.0 AS std_v
                  FROM e GROUP BY 1, 2, 3)
         SELECT event_id, events.event_type, CAST(dayofweek(ts) AS INT) AS dow,
                CAST(hour(ts) AS INT) AS hod, value AS v,
                ROUND((value - mean_v) / std_v, 3) + 0.0 AS z
         FROM events JOIN prof
           ON events.event_type = prof.event_type
          AND CAST(dayofweek(ts) AS INT) = prof.dow
          AND CAST(hour(ts) AS INT) = prof.hod
         WHERE value IS NOT NULL AND std_v > 0 AND n >= 5
           AND ABS((value - mean_v) / std_v) > 1.6""",

    // same doubled-average-rank Spearman: HUGEINT carries what Spark's
    // DECIMAL(38,0) does; the closing Pearson assembly casts each exact
    // integer to double in the same places
    "a28_spearman" ->
      """WITH r0 AS (SELECT l_quantity AS x, l_extendedprice AS y
                     FROM lineitem
                     WHERE l_quantity IS NOT NULL
                       AND l_extendedprice IS NOT NULL),
         rx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM r0 GROUP BY 1),
         rx2 AS (SELECT x,
                        2 * SUM(cnt) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW) - (cnt - 1) AS rxv
                 FROM rx),
         ry AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM r0 GROUP BY 1),
         ry2 AS (SELECT y,
                        2 * SUM(cnt) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW) - (cnt - 1) AS ryv
                 FROM ry),
         j AS (SELECT rxv, ryv FROM r0 JOIN rx2 USING (x) JOIN ry2 USING (y)),
         s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(CAST(rxv AS HUGEINT)) AS sx,
                      SUM(CAST(ryv AS HUGEINT)) AS sy,
                      SUM(CAST(rxv AS HUGEINT) * rxv) AS sxx,
                      SUM(CAST(ryv AS HUGEINT) * ryv) AS syy,
                      SUM(CAST(rxv AS HUGEINT) * ryv) AS sxy
               FROM j)
         SELECT n,
                ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                      / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                             * CAST(n * syy - sy * sy AS DOUBLE)), 6) + 0.0 AS rho
         FROM s""",

    "q04_cohort_matrix" ->
      """WITH uw AS (SELECT DISTINCT user_id,
                            CAST(FLOOR(date_diff('day', DATE '1970-01-01',
                              CAST(ts AS DATE)) / 7) AS BIGINT) AS week
                     FROM events),
         coh AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1)
         SELECT cohort_week, week - cohort_week AS week_offset,
                CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_users
         FROM uw JOIN coh USING (user_id)
         GROUP BY 1, 2""",

    // same global-stream-index Heaps construction: generate_subscripts
    // stands in for posexplode, min_by for the first-occurrence argmin,
    // window prefix sums for the two-phase cumsums; the closing OLS
    // replays groupOls's exact-integer sufficient statistics
    "t23_heaps_fit" ->
      """WITH tok AS (SELECT doc_id,
                             UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+'))
                               AS tok,
                             CAST(generate_subscripts(
                               STRING_SPLIT_REGEX(TRIM(text), '\s+'), 1)
                               AS BIGINT) AS pos
                      FROM documents),
         pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ntok
                FROM tok GROUP BY 1),
         offs AS (SELECT doc_id,
                         CAST(SUM(ntok) OVER (ORDER BY doc_id ROWS BETWEEN
                           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                           AS cumn,
                         CAST(SUM(ntok) OVER (ORDER BY doc_id ROWS BETWEEN
                           UNBOUNDED PRECEDING AND CURRENT ROW) - ntok
                           AS BIGINT) AS off
                  FROM pd),
         st AS (SELECT tok.doc_id, tok.tok, offs.off + tok.pos AS idx
                FROM tok JOIN offs ON tok.doc_id = offs.doc_id),
         fd AS (SELECT tok, MIN_BY(doc_id, idx) AS fdoc FROM st GROUP BY 1),
         np AS (SELECT fdoc AS doc_id, CAST(COUNT(*) AS BIGINT) AS newv
                FROM fd GROUP BY 1),
         curve AS (SELECT offs.doc_id, offs.cumn,
                          CAST(SUM(COALESCE(np.newv, 0)) OVER (ORDER BY
                            offs.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
                            CURRENT ROW) AS BIGINT) AS cumv
                   FROM offs LEFT JOIN np ON offs.doc_id = np.doc_id),
         q AS (SELECT CAST(ROUND(LN(cumn) * 1e4, 0) AS BIGINT) AS xq,
                      CAST(ROUND(LN(cumv) * 1e4, 0) AS BIGINT) AS yq
               FROM curve),
         s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(xq) AS sx, SUM(yq) AS sy,
                      SUM(xq * xq) AS sxx, SUM(xq * yq) AS sxy,
                      SUM(yq * yq) AS syy
               FROM q)
         SELECT n,
                ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                      / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) + 0.0 AS slope,
                ROUND((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
                      / CAST(n AS DOUBLE), 6) + 0.0 AS intercept,
                ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                      * (CAST(n AS DOUBLE) * sxy - sx * sy)
                      / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                         * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) + 0.0 AS r2
         FROM s""",

    // same (key, id)-total-ordered neighborhood: ROW_NUMBER stands in for
    // the two-phase global rank, BETWEEN for the anchor explode — both
    // enumerate exactly the `window` forward neighbors per row
    "d15_sorted_neighborhood" ->
      """WITH k AS (SELECT doc_id,
                           substr(regexp_replace(lower(text), '\s+', ' ', 'g'),
                             1, 64) AS key
                    FROM documents),
         r AS (SELECT doc_id, key,
                      ROW_NUMBER() OVER (ORDER BY key, doc_id) AS rn
               FROM k)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(levenshtein(a.key, b.key) AS INT) AS dist
         FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3
         WHERE levenshtein(a.key, b.key) <= 16""",

    // the bloom prefilter is result-identical to the plain semi join by
    // construction (false positives die at the exact stage), so the
    // oracle is simply the plain semi join
    "j20_bloom_prefilter" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
                ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                      / 100.0, 2) + 0.0 AS revenue
         FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_acctbal > 9000)
         GROUP BY 1""",

    "dq07_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
                CAST(COUNT(*) AS BIGINT) AS k_count,
                CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT))
                     AS BIGINT) AS l_distinct,
                CASE WHEN COUNT(*) < 10 THEN 1 ELSE 0 END AS suppress
         FROM customer GROUP BY 1, 2""",

    "ml12_target_encode" ->
      """WITH t AS (SELECT o_orderkey, o_orderpriority,
                           CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS y
                    FROM orders),
         g AS (SELECT o_orderpriority, SUM(y) AS s, COUNT(*) AS c
               FROM t GROUP BY 1)
         SELECT t.o_orderkey, t.o_orderpriority, t.y,
                CASE WHEN g.c > 1
                     THEN ROUND((g.s - t.y) / CAST(g.c - 1 AS DOUBLE), 6)
                     END AS loo_enc
         FROM t JOIN g USING (o_orderpriority)""",

    "ml13_woe" ->
      """WITH t AS (SELECT o_orderpriority,
                           CASE WHEN o_totalprice > 150000 THEN 1.0 ELSE 0.0 END AS y
                    FROM orders),
         g AS (SELECT o_orderpriority, SUM(y) AS pos, SUM(1.0 - y) AS neg
               FROM t GROUP BY 1),
         tot AS (SELECT SUM(pos) AS tp, SUM(neg) AS tn FROM g)
         SELECT o_orderpriority, pos, neg,
                ROUND(LN(((pos + 0.5) / tp) / ((neg + 0.5) / tn)), 6) + 0.0 AS woe
         FROM g CROSS JOIN tot""",

    "f30_jw_pairs" ->
      """WITH v AS (SELECT DISTINCT p_name AS name FROM part
                    WHERE p_name IS NOT NULL)
         SELECT a.name AS name_a, b.name AS name_b,
                ROUND(jaro_winkler_similarity(a.name, b.name), 6) + 0.0 AS jw
         FROM v a JOIN v b
           ON SUBSTR(a.name, 1, 1) = SUBSTR(b.name, 1, 1) AND a.name < b.name
         WHERE jaro_winkler_similarity(a.name, b.name) >= 0.8""",

    "t24_rrf_fusion" ->
      """WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
                      FROM documents),
         dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM tok GROUP BY 1),
         st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
         tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
                FROM tok WHERE tok IN ('spark', 'window', 'join') GROUP BY 1, 2),
         dfreq AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         lex AS (SELECT tf.doc_id,
                        ROUND(SUM(LN((st.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                          * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))), 6) + 0.0
                          AS score
                 FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) CROSS JOIN st
                 GROUP BY tf.doc_id
                 ORDER BY score DESC, tf.doc_id ASC LIMIT 50),
         pri AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS score FROM documents
                 ORDER BY score DESC, doc_id ASC LIMIT 50),
         rl AS (SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
                FROM lex),
         rp AS (SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
                FROM pri),
         u AS (SELECT doc_id, 1.0 / (60 + rnk) AS rr FROM rl
               UNION ALL
               SELECT doc_id, 1.0 / (60 + rnk) AS rr FROM rp)
         SELECT doc_id, ROUND(SUM(rr), 6) + 0.0 AS rrf
         FROM u GROUP BY 1
         ORDER BY rrf DESC, doc_id ASC LIMIT 20""",

    "w14_interpolate" ->
      """WITH b AS (SELECT event_id, user_id, ts, epoch_us(ts) AS t,
                           CASE WHEN event_type = 'purchase' THEN value END AS v
                    FROM events),
         n AS (SELECT event_id, t, v,
                      LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
                        OVER w_prev AS pt,
                      LAST_VALUE(v IGNORE NULLS) OVER w_prev AS pv,
                      FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
                        OVER w_next AS nt,
                      FIRST_VALUE(v IGNORE NULLS) OVER w_next AS nv
               FROM b
               WINDOW w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      w_next AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         SELECT event_id,
                ROUND(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                           WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                             CASE WHEN nt = pt THEN (pv + nv) / 2.0
                                  ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE)
                                       / CAST(nt - pt AS DOUBLE)) END
                           END, 6) + 0.0 AS interp
         FROM n""",

    "ml14_info_gain" ->
      """WITH base AS (SELECT o_orderpriority, o_orderstatus,
                              CAST(o_totalprice > 150000 AS INT) AS y
                       FROM orders),
         melted AS (SELECT 'priority' AS feature,
                           COALESCE(CAST(o_orderpriority AS VARCHAR), ' null') AS fval,
                           CAST(y AS VARCHAR) AS yy FROM base
                    UNION ALL
                    SELECT 'status', COALESCE(CAST(o_orderstatus AS VARCHAR), ' null'),
                           CAST(y AS VARCHAR) FROM base),
         cells AS (SELECT feature, fval, yy, COUNT(*) AS nfy
                   FROM melted GROUP BY 1, 2, 3),
         fv AS (SELECT feature, fval, SUM(nfy) AS nf FROM cells GROUP BY 1, 2),
         n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM base),
         hy AS (SELECT SUM(CAST(ROUND(-(ny / nn) * LN(ny / nn) * 1e12, 0) AS BIGINT))
                       / 1e12 AS hy
                FROM (SELECT CAST(COUNT(*) AS BIGINT) AS ny FROM base GROUP BY y)
                CROSS JOIN n),
         cond AS (SELECT feature,
                         SUM(CAST(ROUND(-(nfy / nn) * LN(CAST(nfy AS DOUBLE) / nf)
                           * 1e12, 0) AS BIGINT)) / 1e12 AS hcond
                  FROM cells JOIN fv USING (feature, fval) CROSS JOIN n
                  GROUP BY 1),
         si AS (SELECT feature,
                       SUM(CAST(ROUND(-(nf / nn) * LN(nf / nn) * 1e12, 0) AS BIGINT))
                       / 1e12 AS hf
                FROM fv CROSS JOIN n GROUP BY 1)
         SELECT feature, ROUND(hy, 6) + 0.0 AS h_target, ROUND(hcond, 6) + 0.0 AS h_cond,
                ROUND(hy - hcond, 6) + 0.0 AS info_gain,
                CASE WHEN hf > 0 THEN ROUND((hy - hcond) / hf, 6) END AS gain_ratio
         FROM cond JOIN si USING (feature) CROSS JOIN hy""",

    "a31_cindex" ->
      """WITH s AS (SELECT CAST(DATE_DIFF('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
                           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS e,
                           o_totalprice AS r
                    FROM orders WHERE o_custkey < 100),
         p AS (SELECT a.r AS ra, b.r AS rb
               FROM s a JOIN s b ON a.t < b.t AND a.e = 1)
         SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n,
                CAST(COUNT(*) AS BIGINT) AS permissible,
                CAST(SUM(CASE WHEN ra > rb THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
                CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT) AS tied_risk,
                ROUND((SUM(CASE WHEN ra > rb THEN 1 ELSE 0 END) +
                       0.5 * SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END))
                      / COUNT(*), 6) + 0.0 AS c_index
         FROM p""",

    "t27_jsd_sources" ->
      """WITH tok AS (SELECT source, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS t
                      FROM documents),
         corpus AS (SELECT t, COUNT(*) AS cc FROM tok GROUP BY 1),
         total AS (SELECT SUM(cc) AS N FROM corpus),
         gt AS (SELECT source, COUNT(*) AS Ns FROM tok GROUP BY 1),
         seen AS (SELECT source, t, COUNT(*) AS sc FROM tok GROUP BY 1, 2),
         terms AS (SELECT s.source, g.Ns, tt.N,
                          CAST(s.sc AS DOUBLE) / g.Ns AS p,
                          CAST(c.cc - s.sc AS DOUBLE) / (tt.N - g.Ns) AS q,
                          c.cc - s.sc AS rc
                   FROM seen s JOIN corpus c USING (t)
                   JOIN gt g USING (source) CROSS JOIN total tt),
         agg AS (SELECT source, MIN(Ns) AS n_tokens,
                        SUM(CAST(ROUND((0.5 * p * LN(p / ((p + q) / 2.0)) +
                          CASE WHEN q > 0 THEN 0.5 * q * LN(q / ((p + q) / 2.0))
                               ELSE 0 END) * 1e12, 0) AS BIGINT)) / 1e12 AS seenpart,
                        SUM(rc) / CAST(MIN(N - Ns) AS DOUBLE) AS qcov
                 FROM terms GROUP BY 1)
         SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
                ROUND(seenpart + 0.5 * LN(2) * (1 - qcov), 6) + 0.0 AS jsd
         FROM agg""",

    "t26_rake_keywords" ->
      """WITH tk AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\s+') AS t
                     FROM documents),
         toks AS (SELECT doc_id, i AS pos, t[i] AS w,
                         t[i] IN ('the', 'a', 'of', 'and', 'to') AS stop
                  FROM tk, UNNEST(GENERATE_SERIES(1, LEN(t))) AS g(i)),
         ph AS (SELECT doc_id, pos, w, stop,
                       SUM(CASE WHEN stop THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY pos) AS pid
                FROM toks),
         nph AS (SELECT doc_id, pid, w, pos FROM ph WHERE NOT stop),
         phrases AS (SELECT doc_id, pid,
                            STRING_AGG(w, ' ' ORDER BY pos) AS phrase,
                            COUNT(*) AS len
                     FROM nph GROUP BY 1, 2),
         members AS (SELECT n.doc_id, n.pid, n.w, p.phrase, p.len
                     FROM nph n JOIN phrases p USING (doc_id, pid)),
         ws AS (SELECT w,
                       CAST(ROUND(SUM(len) / CAST(COUNT(*) AS DOUBLE) * 1e12, 0)
                            AS BIGINT) AS wsfp
                FROM members GROUP BY 1)
         SELECT phrase,
                CAST(COUNT(DISTINCT (m.doc_id, m.pid)) AS BIGINT) AS n_occurrences,
                ROUND(SUM(wsfp) / COUNT(DISTINCT (m.doc_id, m.pid)) / 1e12, 6) + 0.0 AS score
         FROM members m JOIN ws USING (w)
         GROUP BY 1 ORDER BY score DESC, phrase ASC LIMIT 25""",

    "ml15_negative_sample" ->
      """WITH inter AS (SELECT o_custkey, p_partkey, p_brand
                        FROM lineitem
                        JOIN orders ON l_orderkey = o_orderkey
                        JOIN part ON l_partkey = p_partkey
                        WHERE o_custkey < 30),
         pos AS (SELECT DISTINCT o_custkey, p_partkey FROM inter),
         ub AS (SELECT DISTINCT o_custkey, p_brand FROM inter),
         cand AS (SELECT ub.o_custkey, p.p_partkey,
                         CAST(('0x' || SUBSTRING(
                           MD5(CONCAT(ub.o_custkey, '#', p.p_partkey)), 1, 15))
                           AS BIGINT) AS h
                  FROM ub JOIN part p USING (p_brand)
                  WHERE NOT EXISTS (SELECT 1 FROM pos
                                    WHERE pos.o_custkey = ub.o_custkey
                                      AND pos.p_partkey = p.p_partkey)),
         r AS (SELECT o_custkey, p_partkey,
                      ROW_NUMBER() OVER (PARTITION BY o_custkey
                                         ORDER BY h, p_partkey) AS neg_rank
               FROM cand)
         SELECT o_custkey, p_partkey, CAST(neg_rank AS INTEGER) AS neg_rank
         FROM r WHERE neg_rank <= 3""",

    "q05_comorbidity" ->
      """WITH cats AS (SELECT DISTINCT o_custkey, p_type
                       FROM lineitem
                       JOIN orders ON l_orderkey = o_orderkey
                       JOIN part ON l_partkey = p_partkey)
         SELECT o_custkey,
                CAST(SUM(CASE WHEN p_type IN ('ECONOMY', 'STANDARD') THEN 1
                              WHEN p_type IN ('SMALL', 'MEDIUM') THEN 2
                              WHEN p_type = 'LARGE' THEN 3
                              ELSE 6 END) AS BIGINT) AS comorbidity_index,
                CAST(COUNT(*) AS BIGINT) AS n_categories
         FROM cats GROUP BY 1""",

    "a30_isotonic" ->
      """WITH pts AS (SELECT CAST(l_quantity AS DOUBLE) AS s,
                             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
                      FROM lineitem),
         agg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(y) AS BIGINT) AS sy
                 FROM pts GROUP BY 1),
         ord AS (SELECT s, n, sy, ROW_NUMBER() OVER (ORDER BY s) AS rn,
                        SUM(n) OVER (ORDER BY s) AS cn,
                        SUM(sy) OVER (ORDER BY s) AS cy
                 FROM agg),
         pairavg AS (SELECT j.rn AS j, k.rn AS k,
                            CAST(k.cy - COALESCE(jm.cy, 0) AS DOUBLE)
                              / CAST(k.cn - COALESCE(jm.cn, 0) AS DOUBLE) AS m
                     FROM ord j
                     JOIN ord k ON k.rn >= j.rn
                     LEFT JOIN ord jm ON jm.rn = j.rn - 1),
         cand AS (SELECT jr.rn AS j, ir.rn AS i, MIN(p.m) AS minm
                  FROM ord ir
                  JOIN ord jr ON jr.rn <= ir.rn
                  JOIN pairavg p ON p.j = jr.rn AND p.k >= ir.rn
                  GROUP BY 1, 2),
         fit AS (SELECT i AS rn, MAX(minm) AS fitted FROM cand GROUP BY 1),
         runs AS (SELECT o.s, o.n, o.sy, f.fitted, o.rn,
                         CASE WHEN f.fitted IS DISTINCT FROM
                           LAG(f.fitted) OVER (ORDER BY o.rn) THEN 1 ELSE 0 END AS brk
                  FROM ord o JOIN fit f USING (rn)),
         grp AS (SELECT s, n, sy, fitted,
                        SUM(brk) OVER (ORDER BY rn) AS g
                 FROM runs)
         SELECT MIN(s) AS score_lo, MAX(s) AS score_hi,
                CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sy) AS BIGINT) AS sy,
                ROUND(CAST(SUM(sy) AS DOUBLE) / SUM(n), 6) + 0.0 AS fitted
         FROM grp GROUP BY g""",

    "a29_brier" ->
      """WITH base AS (SELECT CAST(ROUND(l_discount * 10.0 * 1e6, 0) AS BIGINT) AS pm,
                              CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
                              CAST(LEAST(FLOOR(l_discount * 10.0 * 10), 9) AS BIGINT) AS bin
                       FROM lineitem),
         cells AS (SELECT bin, COUNT(*) AS nk, SUM(pm) AS sp, SUM(y) AS sy,
                          SUM(CAST(ROUND(POW(pm / 1e6 - y, 2) * 1e12, 0) AS BIGINT)) AS sb
                   FROM base GROUP BY 1),
         tot AS (SELECT SUM(nk) AS N, SUM(sy) / CAST(SUM(nk) AS DOUBLE) AS pbar
                 FROM cells)
         SELECT CAST(MIN(t.N) AS BIGINT) AS n,
                ROUND(SUM(c.sb) / 1e12 / MIN(t.N), 6) + 0.0 AS brier,
                ROUND(SUM(CAST(ROUND((c.nk / t.N) *
                  POW(c.sp / 1e6 / c.nk - c.sy / CAST(c.nk AS DOUBLE), 2) * 1e12, 0)
                  AS BIGINT)) / 1e12, 6) + 0.0 AS reliability,
                ROUND(SUM(CAST(ROUND((c.nk / t.N) *
                  POW(c.sy / CAST(c.nk AS DOUBLE) - t.pbar, 2) * 1e12, 0)
                  AS BIGINT)) / 1e12, 6) + 0.0 AS resolution,
                ROUND(MIN(t.pbar) * (1 - MIN(t.pbar)), 6) + 0.0 AS uncertainty
         FROM cells c CROSS JOIN tot t""",

    "ts10_resample_interp" ->
      """WITH p AS (SELECT user_id,
                           CAST(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS bucket,
                           CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
                    FROM events WHERE event_type = 'purchase'),
         obs AS (SELECT user_id, bucket, SUM(cents) AS s, COUNT(cents) AS c
                 FROM p GROUP BY 1, 2),
         ov AS (SELECT user_id, bucket,
                       CASE WHEN c > 0 THEN CAST(s AS DOUBLE) / 100.0 / c END AS v
                FROM obs),
         grid AS (SELECT user_id, UNNEST(GENERATE_SERIES(lo, hi)) AS bucket
                  FROM (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
                        FROM ov GROUP BY 1)),
         dense AS (SELECT g.user_id, g.bucket, ov.v
                   FROM grid g LEFT JOIN ov USING (user_id, bucket)),
         n AS (SELECT user_id, bucket, v,
                      LAST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
                        OVER w_prev AS pt,
                      LAST_VALUE(v IGNORE NULLS) OVER w_prev AS pv,
                      FIRST_VALUE(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
                        OVER w_next AS nt,
                      FIRST_VALUE(v IGNORE NULLS) OVER w_next AS nv
               FROM dense
               WINDOW w_prev AS (PARTITION BY user_id ORDER BY bucket
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      w_next AS (PARTITION BY user_id ORDER BY bucket
                                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
         SELECT user_id, bucket, ROUND(v, 6) + 0.0 AS value_mean,
                ROUND(CASE WHEN v IS NOT NULL THEN v
                           WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                             CASE WHEN nt = pt THEN (pv + nv) / 2.0
                                  ELSE pv + (nv - pv) * (CAST(bucket - pt AS DOUBLE)
                                       / CAST(nt - pt AS DOUBLE)) END
                           END, 6) + 0.0 AS value_interp
         FROM n""",

    "w15_rolling_median" ->
      """SELECT event_id,
                ROUND(MEDIAN(value) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) + 0.0 AS roll_med
         FROM events""",

    // same doubled-average-rank construction as a28: per distinct value,
    // group-A count and total; prefix counts via a window cumsum; exact
    // integer 2·R_A and tie term, double-only closing z assembly
    "a32_mannwhitney" ->
      """WITH r0 AS (SELECT value AS v,
                            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
                     FROM events
                     WHERE value IS NOT NULL
                       AND event_type IN ('purchase', 'view')),
         c AS (SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
                      CAST(COUNT(*) AS BIGINT) AS cnt
               FROM r0 GROUP BY 1),
         r AS (SELECT ca, cnt,
                      CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
               FROM c),
         s AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                      CAST(SUM(cnt - ca) AS BIGINT) AS nb,
                      SUM(CAST(ca AS HUGEINT) * (2 * cum - (cnt - 1))) AS r2a,
                      SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS ties
               FROM r),
         u AS (SELECT na, nb,
                      CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE) / 2
                        AS ua,
                      ties
               FROM s)
         SELECT na AS n_a, nb AS n_b, ROUND(ua, 6) + 0.0 AS u_a,
                ROUND((ua - CAST(na AS DOUBLE) * nb / 2)
                      / SQRT(CAST(na AS DOUBLE) * nb / 12
                             * (CAST(na + nb + 1 AS DOUBLE)
                                - CAST(ties AS DOUBLE)
                                  / (CAST(na + nb AS DOUBLE) * (na + nb - 1)))),
                  6) + 0.0 AS z
         FROM u""",

    // a32's k-group sibling: same doubled-average-rank prefix machinery;
    // the per-group R²/n terms are doubles, so they're summed by a
    // LIST_SORT + LIST_REDUCE fold in group order — mirroring the
    // engine's sorted-array aggregate — to keep the last ulp independent
    // of aggregation merge order on BOTH engines
    "a43_kruskal" ->
      """WITH r0 AS (SELECT value AS v, event_type AS g FROM events
                     WHERE value IS NOT NULL AND event_type IS NOT NULL),
         gv AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cgv
                FROM r0 GROUP BY 1, 2),
         c AS (SELECT v, CAST(SUM(cgv) AS BIGINT) AS cnt FROM gv GROUP BY 1),
         r AS (SELECT v, cnt,
                      CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
               FROM c),
         pg AS (SELECT g, CAST(SUM(cgv) AS BIGINT) AS ng,
                       SUM(CAST(cgv AS HUGEINT) * (2 * cum - (cnt - 1)))
                         AS r2g
                FROM gv JOIN r USING (v) GROUP BY 1),
         tt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                       SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS ties
                FROM r),
         s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
                      LIST_REDUCE(LIST_TRANSFORM(LIST_SORT(
                        LIST({'g': g,
                              't': CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
                                     / (4.0 * ng)})),
                        x -> x.t), (a, b) -> a + b) AS s4
               FROM pg)
         SELECT k_groups, n,
                ROUND((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * s4
                       - 3 * (n + 1))
                      / (1 - CAST(ties AS DOUBLE)
                             / (CAST(n AS DOUBLE) * n * n - n)), 6) + 0.0
                  AS h
         FROM s, tt""",

    "a44_mann_kendall" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                               CAST(COUNT(*) AS BIGINT) AS cnt
                        FROM events GROUP BY 1, 2),
         p AS (SELECT a.user_id, SIGN(b.cnt - a.cnt) AS sg
               FROM daily a JOIN daily b
                 ON a.user_id = b.user_id AND a.day < b.day),
         sgg AS (SELECT user_id, CAST(SUM(sg) AS BIGINT) AS s
                 FROM p GROUP BY 1),
         t AS (SELECT user_id, cnt, CAST(COUNT(*) AS BIGINT) AS t
               FROM daily GROUP BY 1, 2),
         tt AS (SELECT user_id, CAST(SUM(t) AS BIGINT) AS n,
                       CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                         AS tiet
                FROM t GROUP BY 1)
         SELECT sgg.user_id, n, s,
                CASE WHEN CAST(n * (n - 1) * (2 * n + 5) - tiet
                            AS DOUBLE) / 18 = 0 THEN NULL
                     ELSE ROUND((s - SIGN(s))
                            / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tiet
                                     AS DOUBLE) / 18), 6) + 0.0 END AS z
         FROM sgg JOIN tt USING (user_id)""",

    // per-user exact median (QUANTILE_CONT mirrors groupQuantiles — the
    // ts17 precedent), median-ties dropped, runs via one lag window,
    // the z close mirrored op-for-op on exact integers
    "a52_runs_test" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                               CAST(COUNT(*) AS BIGINT) AS cnt
                        FROM events GROUP BY 1, 2),
         m AS (SELECT user_id, QUANTILE_CONT(CAST(cnt AS DOUBLE), 0.5)
                 AS med
               FROM daily GROUP BY 1),
         sgn AS (SELECT d.user_id, d.day,
                        CASE WHEN CAST(d.cnt AS DOUBLE) > m.med
                             THEN 1 ELSE 0 END AS s
                 FROM daily d JOIN m USING (user_id)
                 WHERE CAST(d.cnt AS DOUBLE) <> m.med),
         r AS (SELECT user_id, s,
                      CASE WHEN LAG(s) OVER w IS NULL
                             OR s <> LAG(s) OVER w THEN 1 ELSE 0 END AS nw
               FROM sgn WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         ag AS (SELECT user_id, CAST(SUM(nw) AS BIGINT) AS runs,
                       CAST(SUM(s) AS BIGINT) AS n1,
                       CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2
                FROM r GROUP BY 1)
         SELECT user_id, n1, n2, runs,
                CASE WHEN n1 > 0 AND n2 > 0
                      AND 2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2)) > 0 THEN
                  ROUND((CAST(runs AS DOUBLE)
                      - (CAST(2 * n1 * n2 AS DOUBLE)
                         / CAST(n1 + n2 AS DOUBLE) + 1.0))
                    / SQRT(CAST(2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2))
                        AS DOUBLE)
                      / CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)
                        AS DOUBLE)), 6) + 0.0
                END AS z
         FROM ag""",

    // τ-b over the same pair join: doubled n₀ kept integer, radicand an
    // exact long product /4.0 (a power of two — no rounding), one √ +
    // one division
    "a48_kendall_tau" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                               CAST(COUNT(*) AS BIGINT) AS cnt
                        FROM events GROUP BY 1, 2),
         p AS (SELECT a.user_id, SIGN(b.cnt - a.cnt) AS sg
               FROM daily a JOIN daily b
                 ON a.user_id = b.user_id AND a.day < b.day),
         sgg AS (SELECT user_id, CAST(SUM(sg) AS BIGINT) AS s
                 FROM p GROUP BY 1),
         t AS (SELECT user_id, cnt, CAST(COUNT(*) AS BIGINT) AS t
               FROM daily GROUP BY 1, 2),
         tt AS (SELECT user_id, CAST(SUM(t) AS BIGINT) AS n,
                       CAST(SUM(t * (t - 1)) AS BIGINT) AS t2
                FROM t GROUP BY 1)
         SELECT sgg.user_id, n, s,
                CASE WHEN n * (n - 1) - t2 > 0 THEN
                  ROUND(CAST(s AS DOUBLE)
                    / SQRT(CAST((n * (n - 1) - t2) * (n * (n - 1))
                        AS DOUBLE) / 4.0), 6) + 0.0
                END AS tau
         FROM sgg JOIN tt USING (user_id)""",

    // exact dyadic sign-test p (LIST_REDUCE binomial products in HUGEINT
    // mirror the engine's Pascal DECIMAL(38,0) rows), then the BH step-up:
    // rank ascending, largest rank with p ≤ rank·q/M, flag below it
    "a45_sign_bh" ->
      """WITH base AS (SELECT user_id, CAST(ts AS DATE) AS day,
                              CAST(COUNT(*) AS BIGINT) AS cnt
                       FROM events GROUP BY 1, 2),
         d AS (SELECT user_id,
                      cnt - LAG(cnt) OVER (PARTITION BY user_id
                        ORDER BY day) AS dd
               FROM base),
         c AS (SELECT user_id,
                      CAST(SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS pos,
                      CAST(SUM(CASE WHEN dd < 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS neg
               FROM d GROUP BY 1),
         c2 AS (SELECT *, pos + neg AS m, LEAST(pos, neg) AS kmin FROM c
                WHERE pos + neg <= 120),
         t AS (SELECT user_id, m, pos, neg,
                      LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(0, kmin),
                        k -> CASE WHEN k = 0 THEN CAST(1 AS HUGEINT)
                             ELSE LIST_REDUCE(
                               LIST_PREPEND(CAST(1 AS HUGEINT),
                                 LIST_TRANSFORM(GENERATE_SERIES(1, k),
                                   i -> CAST(i AS HUGEINT))),
                               (acc, i) -> acc * (m - i + 1) // i) END))
                        AS a,
                      LIST_REDUCE(LIST_PREPEND(CAST(1 AS HUGEINT),
                        LIST_TRANSFORM(GENERATE_SERIES(1, m),
                          x -> CAST(2 AS HUGEINT))), (x, y) -> x * y) AS p2
               FROM c2),
         p AS (SELECT user_id, m, pos, neg,
                      CAST(LEAST(2 * a, p2) AS DOUBLE)
                        / CAST(p2 AS DOUBLE) AS pd
               FROM t),
         r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pd, user_id) AS rnk,
                      COUNT(*) OVER () AS mm
               FROM p),
         x AS (SELECT *, MAX(CASE WHEN pd <= (rnk * 0.05) / mm
                                  THEN rnk ELSE 0 END) OVER () AS rmax
               FROM r)
         SELECT user_id, m, pos, neg, ROUND(pd, 6) + 0.0 AS p,
                CAST(rnk AS BIGINT) AS rank,
                CAST(CASE WHEN rnk <= rmax THEN 1 ELSE 0 END AS INTEGER)
                  AS flagged
         FROM x""",

    // tie-corrected Friedman over complete user×weekday blocks: doubled
    // within-block mean ranks (2r = 2·rank + #eq − 1), HUGEINT sufficient
    // statistics mirroring the engine's DECIMAL(38,0), one closing
    // cast+division. DAYOFWEEK is 0-based in DuckDB → +1 aligns with
    // Spark's 1-based dayofweek
    "a46_friedman" ->
      """WITH base AS (SELECT user_id, DAYOFWEEK(ts) + 1 AS dow,
                              CAST(COUNT(*) AS BIGINT) AS cnt
                       FROM events GROUP BY 1, 2),
         kk AS (SELECT COUNT(DISTINCT dow) AS k FROM base),
         comp AS (SELECT user_id FROM base GROUP BY 1
                  HAVING COUNT(DISTINCT dow) = (SELECT k FROM kk)),
         kept AS (SELECT b.* FROM base b JOIN comp USING (user_id)),
         r AS (SELECT user_id, dow,
                      2 * RANK() OVER (PARTITION BY user_id ORDER BY cnt)
                        + COUNT(*) OVER (PARTITION BY user_id, cnt) - 1
                        AS r2
               FROM kept),
         tj AS (SELECT dow, CAST(SUM(r2) AS HUGEINT) AS tj
                FROM r GROUP BY 1),
         tot AS (SELECT SUM(CAST(r2 AS HUGEINT) * r2) AS a,
                        CAST(COUNT(DISTINCT user_id) AS HUGEINT) AS b,
                        CAST(COUNT(DISTINCT dow) AS HUGEINT) AS k
                 FROM r),
         dev AS (SELECT SUM((tj - b * (k + 1)) * (tj - b * (k + 1)))
                   AS sd2
                 FROM tj CROSS JOIN tot)
         SELECT CAST(b AS BIGINT) AS b_blocks, CAST(k AS BIGINT) AS k_treat,
                CASE WHEN a <> b * k * (k + 1) * (k + 1) THEN
                  ROUND(CAST((k - 1) * sd2 AS DOUBLE)
                    / CAST(a - b * k * (k + 1) * (k + 1) AS DOUBLE), 6)
                    + 0.0
                END AS chi2
         FROM tot CROSS JOIN dev""",

    // Holt fold replayed with LIST_REDUCE over [l, b] BIGINT-micro pair
    // states: α = β = ½, step rounding is the pure-integer half-up
    // ⌊(2v + 2)/4⌋, the level re-derivation inside the trend update is
    // the SAME expression the engine's lNew binding evaluates twice, and
    // the only float op is the closing /1e6 per column
    "ts18_holt" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                               CAST(COUNT(*) AS BIGINT) * 1000000 AS v
                        FROM events GROUP BY 1, 2),
         g AS (SELECT user_id, LIST(v ORDER BY day) AS ys
               FROM daily GROUP BY 1
               HAVING COUNT(*) BETWEEN 2 AND 5000),
         f AS (SELECT user_id, CAST(LEN(ys) AS BIGINT) AS n,
                      LIST_REDUCE(
                        LIST_PREPEND([ys[1], ys[2] - ys[1]],
                          LIST_TRANSFORM(ys[3:], y -> [y, CAST(0 AS BIGINT)])),
                        (acc, x) ->
                          [CAST(FLOOR((2 * (x[1] + acc[1] + acc[2]) + 2)
                              / 4.0) AS BIGINT),
                           CAST(FLOOR((2 * (CAST(FLOOR(
                                 (2 * (x[1] + acc[1] + acc[2]) + 2) / 4.0)
                                 AS BIGINT) - acc[1] + acc[2]) + 2) / 4.0)
                             AS BIGINT)]) AS lb
               FROM g)
         SELECT user_id, n,
                CAST(lb[1] AS DOUBLE) / 1e6 AS level,
                CAST(lb[2] AS DOUBLE) / 1e6 AS trend,
                CAST(lb[1] + lb[2] AS DOUBLE) / 1e6 AS forecast_1
         FROM f""",

    // four exact integer counts from one conditional-aggregate scan, the
    // pooled-z assembly mirrored op-for-op; empty/degenerate pools null
    "a47_prop_ztest" ->
      """WITH c AS (SELECT
           CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN user_id % 2 = 0
                          AND event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS x1,
           CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN user_id % 2 <> 0
                          AND event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS x2
         FROM events WHERE user_id IS NOT NULL),
         w AS (SELECT *,
                      CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
                        AS pp
               FROM c)
         SELECT n1, x1, n2, x2,
                CASE WHEN n1 > 0 THEN
                  ROUND(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) + 0.0
                END AS p1,
                CASE WHEN n2 > 0 THEN
                  ROUND(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) + 0.0
                END AS p2,
                CASE WHEN n1 > 0 AND n2 > 0 AND x1 + x2 > 0
                      AND x1 + x2 < n1 + n2 THEN
                  ROUND((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                    / SQRT((pp * (1.0 - pp))
                      * (1.0 / CAST(n1 AS DOUBLE)
                         + 1.0 / CAST(n2 AS DOUBLE))), 6) + 0.0
                END AS z
         FROM w""",

    // six HUGEINT sufficient statistics mirroring the engine's
    // DECIMAL(38,0); pooled-variance close assembled op-for-op
    "a50_cohens_d" ->
      """WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM events GROUP BY 1),
         c AS (SELECT
           CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n1,
           SUM(CASE WHEN user_id % 2 = 0 THEN CAST(cnt AS HUGEINT) END)
             AS s1,
           SUM(CASE WHEN user_id % 2 = 0
               THEN CAST(cnt AS HUGEINT) * cnt END) AS q1,
           CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n2,
           SUM(CASE WHEN user_id % 2 <> 0 THEN CAST(cnt AS HUGEINT) END)
             AS s2,
           SUM(CASE WHEN user_id % 2 <> 0
               THEN CAST(cnt AS HUGEINT) * cnt END) AS q2
         FROM u WHERE user_id IS NOT NULL)
         SELECT n1, n2,
                CASE WHEN n1 > 0 THEN
                  ROUND(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) + 0.0
                END AS mean_a,
                CASE WHEN n2 > 0 THEN
                  ROUND(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) + 0.0
                END AS mean_b,
                CASE WHEN n1 > 1 AND n2 > 1
                      AND (n1 * q1 - s1 * s1) + (n2 * q2 - s2 * s2) > 0 THEN
                  ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
                    / SQRT((CAST(n1 * q1 - s1 * s1 AS DOUBLE)
                          / CAST(n1 AS DOUBLE)
                        + CAST(n2 * q2 - s2 * s2 AS DOUBLE)
                          / CAST(n2 AS DOUBLE))
                      / CAST(n1 + n2 - 2 AS DOUBLE)), 6) + 0.0
                END AS d
         FROM c""",

    // exact type-7 median over first-conversion µs deltas (QUANTILE_CONT
    // mirrors groupQuantiles — the ts17/dq12 precedent), one closing
    // unit division inside the round
    "q13_time_to_convert" ->
      """WITH fs AS (SELECT user_id, MIN(ts) AS s_ts FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
         d AS (SELECT fs.user_id,
                      MIN(EPOCH_US(e.ts) - EPOCH_US(fs.s_ts)) AS dus
               FROM fs JOIN events e ON e.user_id = fs.user_id
               WHERE e.event_type = 'purchase' AND e.ts >= fs.s_ts
               GROUP BY 1)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
                ROUND(QUANTILE_CONT(CAST(dus AS DOUBLE), 0.5) / 3.6e9, 6)
                  + 0.0 AS median_hours
         FROM d""",

    "ts17_theil_sen" ->
      """WITH daily AS (SELECT user_id,
                               DATEDIFF('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) AS day,
                               CAST(COUNT(*) AS BIGINT) AS cnt
                        FROM events GROUP BY 1, 2),
         p AS (SELECT a.user_id,
                      CAST(b.cnt - a.cnt AS DOUBLE) / (b.day - a.day) AS sl
               FROM daily a JOIN daily b
                 ON a.user_id = b.user_id AND a.day < b.day)
         SELECT user_id, ROUND(QUANTILE_CONT(sl, 0.5), 6) + 0.0 AS slope
         FROM p GROUP BY 1""",

    // pair products via the row-local unnest (generate_subscripts is
    // 1-based — shifted to the engine's 0-based lambda index); lanes
    // quantized onto the 10⁻⁶ grid so every sufficient statistic is an
    // exact integer (HUGEINT here, DECIMAL(38,0) engine-side) and the
    // closing (n·Σqq − Σq·Σq)/(n²·10¹²) is ONE double division —
    // summation-order-free on both engines (mirrors embeddingCovariance)
    "v09_embed_cov" ->
      """WITH e AS (SELECT vec_id,
                           CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1e6,
                                      0) AS BIGINT) AS x,
                           CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1
                             AS i
                    FROM embeddings),
         p AS (SELECT a.i AS i, b.i AS j, a.x AS xa, b.x AS xb
               FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i)
         SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
                ROUND(CAST(COUNT(*) * SUM(CAST(xa AS HUGEINT) * xb)
                           - SUM(CAST(xa AS HUGEINT)) * SUM(CAST(xb AS HUGEINT))
                        AS DOUBLE)
                      / (CAST(COUNT(*) AS DOUBLE) * COUNT(*) * 1e12), 6) + 0.0
                  AS cov
         FROM p GROUP BY 1, 2""",

    "ml16_temporal_split" ->
      """WITH r AS (SELECT event_id,
                           ROW_NUMBER() OVER w AS rn,
                           COUNT(*) OVER (PARTITION BY user_id) AS n
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT event_id,
                CASE WHEN rn <= CEIL(n * 0.8) THEN 'train' ELSE 'test' END
                  AS split
         FROM r""",

    // co-occurrence edges (same construction as g01-g03), adjacency both
    // directions, hub cap BEFORE the wedge join, shared neighbor has
    // degree ≥ 2 so 1/LN(deg) is finite
    "g04_adamic_adar" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                        FROM lineitem),
         e AS (SELECT a.i AS u, b.i AS v
               FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
               GROUP BY 1, 2
               HAVING COUNT(*) >= 2),
         adj AS (SELECT u AS z, v AS n FROM e
                 UNION ALL SELECT v AS z, u AS n FROM e),
         deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d,
                        CASE WHEN COUNT(*) >= 2
                          THEN CAST(ROUND(1.0 / LN(CAST(COUNT(*) AS BIGINT))
                                          * 1e12, 0) AS BIGINT)
                          ELSE 0 END AS rq
                 FROM adj GROUP BY 1),
         small AS (SELECT adj.z, adj.n, deg.d, deg.rq
                   FROM adj JOIN deg USING (z) WHERE deg.d <= 50)
         SELECT a.n AS node_a, b.n AS node_b,
                CAST(COUNT(*) AS BIGINT) AS common,
                ROUND(CAST(SUM(a.rq) AS DOUBLE) / 1e12, 6) + 0.0 AS adamic_adar
         FROM small a JOIN small b ON a.z = b.z AND a.n < b.n
         GROUP BY 1, 2
         HAVING COUNT(*) >= 1""",

    // g04's wedge enumeration, Jaccard closing: common / (full-degree
    // union), exact integers into one rounded division
    "g08_neighbor_jaccard" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                        FROM lineitem),
         e AS (SELECT a.i AS u, b.i AS v
               FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
               GROUP BY 1, 2
               HAVING COUNT(*) >= 2),
         adj AS (SELECT u AS z, v AS n FROM e
                 UNION ALL SELECT v AS z, u AS n FROM e),
         deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
         small AS (SELECT adj.z, adj.n
                   FROM adj JOIN deg USING (z) WHERE deg.d <= 50),
         p AS (SELECT a.n AS node_a, b.n AS node_b,
                      CAST(COUNT(*) AS BIGINT) AS common
               FROM small a JOIN small b ON a.z = b.z AND a.n < b.n
               GROUP BY 1, 2
               HAVING COUNT(*) >= 1)
         SELECT node_a, node_b, common,
                ROUND(CAST(common AS DOUBLE)
                  / CAST(da.d + db.d - common AS DOUBLE), 6) + 0.0
                  AS jaccard
         FROM p JOIN deg da ON da.z = node_a JOIN deg db ON db.z = node_b""",

    // add-1-smoothed bigram model: bigram + unigram count joins over the
    // per-doc distinct-bigram frame; V a one-row cross join; docs with
    // < 2 tokens surface with zero bigrams and a NULL score
    "t28_bigram_lm" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         bg AS (SELECT doc_id,
                       UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                         k -> toks[k] || ' ' || toks[k+1])) AS bg
                FROM t WHERE LEN(toks) >= 2),
         m AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS m
               FROM bg GROUP BY 1, 2),
         cb AS (SELECT bg, CAST(SUM(m) AS BIGINT) AS cbg FROM m GROUP BY 1),
         uni AS (SELECT UNNEST(toks) AS tok FROM t),
         cu AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM uni GROUP BY 1),
         v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM cu),
         mdl AS (SELECT cb.bg,
                        CAST(ROUND(LN((cb.cbg + 1.0) / (cu.cu + v.v)) * 1e12, 0)
                          AS BIGINT) AS lpq
                 FROM cb JOIN cu ON cu.tok = SPLIT_PART(cb.bg, ' ', 1)
                 CROSS JOIN v),
         sc AS (SELECT m.doc_id, CAST(SUM(m.m) AS BIGINT) AS nb,
                       SUM(CAST(m.m AS HUGEINT) * mdl.lpq) AS llq
                FROM m JOIN mdl USING (bg)
                GROUP BY 1)
         SELECT d.doc_id, CAST(COALESCE(sc.nb, 0) AS BIGINT) AS n_bigrams,
                ROUND(CAST(sc.llq AS DOUBLE) / 1e12 / sc.nb, 6) + 0.0
                  AS avg_logprob
         FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""",

    // ts11's stack, collapsed to the per-user argmax (acf desc, lag asc)
    "ts14_dominant_lag" ->
      """WITH b AS (SELECT user_id, ts, event_id,
                           CAST(ROUND(value * 100, 0) AS BIGINT) AS v
                    FROM events),
         l AS (SELECT user_id, v,
                      LAG(v, 1) OVER w AS l1,
                      LAG(v, 2) OVER w AS l2,
                      LAG(v, 3) OVER w AS l3
               FROM b
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         st AS (SELECT user_id, 1 AS lag, v, l1 AS p FROM l WHERE l1 IS NOT NULL
                UNION ALL
                SELECT user_id, 2, v, l2 FROM l WHERE l2 IS NOT NULL
                UNION ALL
                SELECT user_id, 3, v, l3 FROM l WHERE l3 IS NOT NULL),
         g AS (SELECT user_id, lag, CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(CAST(v AS HUGEINT)) AS sx,
                      SUM(CAST(p AS HUGEINT)) AS sy,
                      SUM(CAST(v AS HUGEINT) * p) AS sxy,
                      SUM(CAST(v AS HUGEINT) * v) AS sxx,
                      SUM(CAST(p AS HUGEINT) * p) AS syy
               FROM st GROUP BY 1, 2),
         acf AS (SELECT user_id, lag,
                        CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
                          THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                            / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                                   * CAST(n * syy - sy * sy AS DOUBLE)), 6)
                        END + 0.0 AS acf
                 FROM g),
         r AS (SELECT user_id, lag, acf,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY acf DESC, lag) AS rn
               FROM acf WHERE acf IS NOT NULL)
         SELECT user_id, CAST(lag AS INTEGER) AS best_lag, acf AS best_acf
         FROM r WHERE rn = 1""",

    "dq10_pk_violations" ->
      """SELECT 'events' AS table_name,
                CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS dup_keys,
                CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
                  AS surplus_rows
         FROM (SELECT COUNT(*) AS c FROM events GROUP BY event_id)
         UNION ALL
         SELECT 'orders',
                CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
                CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
         FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
         UNION ALL
         SELECT 'lineitem',
                CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
                CAST(SUM(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
         FROM (SELECT COUNT(*) AS c FROM lineitem
               GROUP BY l_orderkey, l_linenumber)""",

    "a40_welch_ttest" ->
      """WITH r AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c,
                           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                             AS a
                    FROM events
                    WHERE value IS NOT NULL
                      AND event_type IN ('purchase', 'view')),
         s AS (SELECT CAST(SUM(a) AS BIGINT) AS n1,
                      CAST(SUM(1 - a) AS BIGINT) AS n2,
                      SUM(CAST(c AS HUGEINT) * a) AS s1,
                      SUM(CAST(c AS HUGEINT) * c * a) AS q1,
                      SUM(CAST(c AS HUGEINT) * (1 - a)) AS s2,
                      SUM(CAST(c AS HUGEINT) * c * (1 - a)) AS q2
               FROM r),
         f AS (SELECT n1, n2, s1, s2,
                      CAST(n1 * q1 - s1 * s1 AS DOUBLE)
                        / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1)) AS v1,
                      CAST(n2 * q2 - s2 * s2 AS DOUBLE)
                        / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1)) AS v2,
                      CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md
               FROM s)
         SELECT n1, n2,
                ROUND(CAST(s1 AS DOUBLE) / n1 / 100.0, 6) + 0.0 AS mean1,
                ROUND(CAST(s2 AS DOUBLE) / n2 / 100.0, 6) + 0.0 AS mean2,
                ROUND(md / SQRT(v1 + v2), 6) + 0.0 AS t,
                ROUND((v1 + v2) * (v1 + v2)
                      / (v1 * v1 / (n1 - 1) + v2 * v2 / (n2 - 1)), 6) + 0.0 AS df
         FROM f""",

    // the ORACLE computes the full aggregate in one pass — hash equality
    // against the engine's state+delta merge proves incremental ≡ full
    "u11_incremental_agg" ->
      """SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                  AS sum_cents,
                ROUND(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                  AS DOUBLE) / COUNT(*) / 100.0, 6) + 0.0 AS mean_value
         FROM events GROUP BY 1, 2""",

    // identical union-LOCF construction: tag sides, one sort, carry the
    // last reference timestamp forward
    "j21_asof_backward" ->
      """WITH refs AS (SELECT user_id, ts, event_id, 0 AS side, ts AS ref_ts
                       FROM events WHERE event_type = 'signup'),
         pts AS (SELECT user_id, ts, event_id, 1 AS side,
                        CAST(NULL AS TIMESTAMP) AS ref_ts
                 FROM events WHERE event_type = 'purchase'),
         u AS (SELECT * FROM refs UNION ALL SELECT * FROM pts),
         l AS (SELECT event_id, side,
                      LAST_VALUE(ref_ts IGNORE NULLS) OVER (
                        PARTITION BY user_id ORDER BY ts, side, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS asof_signup_ts
               FROM u)
         SELECT event_id, asof_signup_ts FROM l WHERE side = 1""",

    "a39_cronbach_alpha" ->
      """WITH it AS (SELECT
                       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END AS i1,
                       CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS i2,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS i3
                     FROM orders),
         w AS (SELECT i1, i2, i3, i1 + i2 + i3 AS t FROM it),
         s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(CAST(i1 AS HUGEINT)) AS s1,
                      SUM(CAST(i1 AS HUGEINT) * i1) AS q1,
                      SUM(CAST(i2 AS HUGEINT)) AS s2,
                      SUM(CAST(i2 AS HUGEINT) * i2) AS q2,
                      SUM(CAST(i3 AS HUGEINT)) AS s3,
                      SUM(CAST(i3 AS HUGEINT) * i3) AS q3,
                      SUM(CAST(t AS HUGEINT)) AS st,
                      SUM(CAST(t AS HUGEINT) * t) AS qt
               FROM w)
         SELECT n,
                ROUND(1.5 * (1.0 -
                  (CAST(n * q1 - s1 * s1 AS DOUBLE)
                   + CAST(n * q2 - s2 * s2 AS DOUBLE)
                   + CAST(n * q3 - s3 * s3 AS DOUBLE))
                  / CAST(n * qt - st * st AS DOUBLE)), 6) + 0.0 AS alpha
         FROM s""",

    // κ from exact integer moments: P̄ cleared to (Σn²−Nr)/(Nr(r−1)),
    // P_e to Σn_j²/(Nr)²
    "a38_fleiss_kappa" ->
      """WITH v AS (SELECT o_orderkey AS i, vote AS c FROM orders,
                    LATERAL (VALUES
                      (CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 'high' ELSE 'low' END),
                      (CASE WHEN o_totalprice > 150000
                         THEN 'high' ELSE 'low' END),
                      (CASE WHEN o_orderstatus = 'F'
                         THEN 'high' ELSE 'low' END)) AS t(vote)),
         cells AS (SELECT i, c, CAST(COUNT(*) AS BIGINT) AS nij
                   FROM v GROUP BY 1, 2),
         ag AS (SELECT SUM(CAST(nij AS HUGEINT) * nij) AS ss,
                       CAST(COUNT(DISTINCT i) AS BIGINT) AS n
                FROM cells),
         mg AS (SELECT SUM(CAST(nj AS HUGEINT) * nj) AS sm
                FROM (SELECT c, CAST(SUM(nij) AS BIGINT) AS nj
                      FROM cells GROUP BY 1)),
         f AS (SELECT n,
                      CAST(ss - CAST(n AS HUGEINT) * 3 AS DOUBLE)
                        / CAST(CAST(n AS HUGEINT) * 3 * 2 AS DOUBLE) AS pbar,
                      CAST(sm AS DOUBLE)
                        / CAST(CAST(n AS HUGEINT) * 3 * n * 3 AS DOUBLE)
                        AS pexp,
                      CAST(n AS HUGEINT) * 3 * n * 3 = sm AS degen
               FROM ag CROSS JOIN mg)
         SELECT n AS n_items, ROUND(pbar, 6) + 0.0 AS p_bar, ROUND(pexp, 6) + 0.0 AS p_exp,
                CASE WHEN NOT degen THEN
                  ROUND((pbar - pexp) / (1.0 - pexp), 6) END + 0.0 AS kappa
         FROM f""",

    // co-occurrence edges as in g04, both orientations, integer Pearson
    "g05_assortativity" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                        FROM lineitem),
         e AS (SELECT a.i AS u, b.i AS v
               FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
               GROUP BY 1, 2
               HAVING COUNT(*) >= 2),
         adj AS (SELECT u AS z FROM e UNION ALL SELECT v FROM e),
         deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
         ends AS (SELECT du.d AS x, dv.d AS y
                  FROM (SELECT u, v FROM e
                        UNION ALL SELECT v AS u, u AS v FROM e) be
                  JOIN deg du ON du.z = be.u
                  JOIN deg dv ON dv.z = be.v),
         s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
                      SUM(CAST(x AS HUGEINT)) AS sx,
                      SUM(CAST(y AS HUGEINT)) AS sy,
                      SUM(CAST(x AS HUGEINT) * y) AS sxy,
                      SUM(CAST(x AS HUGEINT) * x) AS sxx,
                      SUM(CAST(y AS HUGEINT) * y) AS syy
               FROM ends)
         SELECT m2,
                CASE WHEN (m2 * sxx - sx * sx) * (m2 * syy - sy * sy) > 0 THEN
                  ROUND(CAST(m2 * sxy - sx * sy AS DOUBLE)
                        / SQRT(CAST(m2 * sxx - sx * sx AS DOUBLE)
                               * CAST(m2 * syy - sy * sy AS DOUBLE)), 6)
                END + 0.0 AS assortativity
         FROM s""",

    "ml18_stratified_kfold" ->
      """WITH r AS (SELECT o_orderkey, o_orderpriority,
                           ROW_NUMBER() OVER (ORDER BY o_orderpriority,
                             MD5(CAST(o_orderkey AS VARCHAR)), o_orderkey)
                             AS rn
                    FROM orders)
         SELECT o_orderkey, o_orderpriority,
                CAST(rn % 5 AS INTEGER) AS fold
         FROM r""",

    "w17_drawdown" ->
      """WITH p AS (SELECT user_id, ts, event_id,
                           CAST(ROUND(value * 100, 0) AS BIGINT) AS c
                    FROM events WHERE event_type = 'purchase'),
         k AS (SELECT user_id, c,
                      MAX(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS peak
               FROM p)
         SELECT user_id,
                CAST(MAX(peak - c) AS BIGINT) AS max_drawdown_cents,
                CAST(MAX(c) AS BIGINT) AS peak_cents
         FROM k GROUP BY 1""",

    // quintiles via the same closed-form floor((rank−1)·5/n)+1 over fully
    // tie-broken ranks — no NTILE, identical cuts in both engines
    "q08_rfm" ->
      """WITH b AS (SELECT user_id,
                           CAST(date_diff('day', MAX(CAST(ts AS DATE)),
                             DATE '2024-02-01') AS INTEGER) AS recency_days,
                           CAST(COUNT(*) AS BIGINT) AS frequency,
                           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                             AS BIGINT) AS monetary_cents
                    FROM events WHERE event_type = 'purchase' GROUP BY 1),
         r AS (SELECT *,
                      ROW_NUMBER() OVER (ORDER BY recency_days, user_id)
                        AS rr,
                      ROW_NUMBER() OVER (ORDER BY frequency DESC, user_id)
                        AS rf,
                      ROW_NUMBER() OVER (ORDER BY monetary_cents DESC, user_id)
                        AS rm,
                      COUNT(*) OVER () AS n
               FROM b)
         SELECT user_id, recency_days, frequency, monetary_cents,
                CAST(((rr - 1) * 5) // n + 1 AS INTEGER) AS r_score,
                CAST(((rf - 1) * 5) // n + 1 AS INTEGER) AS f_score,
                CAST(((rm - 1) * 5) // n + 1 AS INTEGER) AS m_score,
                CAST((((rr - 1) * 5) // n + 1) * 100
                     + (((rf - 1) * 5) // n + 1) * 10
                     + (((rm - 1) * 5) // n + 1) AS INTEGER) AS segment
         FROM r""",

    // same doubled-average-rank machinery as a28/a32 over |d|
    "a37_wilcoxon" ->
      """WITH p AS (SELECT l_orderkey,
                           MAX(CASE WHEN l_linenumber = 1 THEN
                             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                             END) AS p1,
                           MAX(CASE WHEN l_linenumber = 2 THEN
                             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                             END) AS p2
                    FROM lineitem GROUP BY 1),
         d AS (SELECT p1 - p2 AS d FROM p
               WHERE p1 IS NOT NULL AND p2 IS NOT NULL AND p1 <> p2),
         c AS (SELECT ABS(d) AS a,
                      CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                        AS cp,
                      CAST(COUNT(*) AS BIGINT) AS cnt
               FROM d GROUP BY 1),
         r AS (SELECT cp, cnt,
                      CAST(SUM(cnt) OVER (ORDER BY a ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
               FROM c),
         s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                      SUM(CAST(cp AS HUGEINT) * (2 * cum - (cnt - 1))) AS wp2,
                      SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS ties
               FROM r)
         SELECT n, ROUND(CAST(wp2 AS DOUBLE) / 2, 6) + 0.0 AS w_plus,
                ROUND((CAST(wp2 AS DOUBLE) / 2
                       - CAST(n AS DOUBLE) * (n + 1) / 4)
                      / SQRT(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
                             - CAST(ties AS DOUBLE) / 48), 6) + 0.0 AS z
         FROM s""",

    "q07_top_paths" ->
      """WITH l AS (SELECT event_type AS e1,
                           LEAD(event_type, 1) OVER w AS e2,
                           LEAD(event_type, 2) OVER w AS e3
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT e1 || '>' || e2 || '>' || e3 AS path,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM l WHERE e3 IS NOT NULL
         GROUP BY 1
         ORDER BY n DESC, path
         LIMIT 20""",

    "u10_except_all" ->
      """SELECT l_suppkey FROM lineitem
         EXCEPT ALL
         SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'""",

    "o06_keyset_page" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice
         FROM orders
         WHERE o_orderdate > DATE '1994-01-01'
            OR (o_orderdate = DATE '1994-01-01' AND o_orderkey > 5000)
         ORDER BY o_orderdate, o_orderkey
         LIMIT 100""",

    // the oracle expands each row into `l_linenumber` copies and takes
    // the plain exact median — proving the no-expansion weighted form
    "a36_weighted_median" ->
      """WITH e AS (SELECT l_returnflag, l_extendedprice
                    FROM lineitem
                    CROSS JOIN UNNEST(GENERATE_SERIES(1, l_linenumber)) AS t(i))
         SELECT l_returnflag, ROUND(MEDIAN(l_extendedprice), 6) + 0.0 AS w_median
         FROM e GROUP BY 1""",

    // profile CTE mirrors ts08's exact-integer means; the trend is a
    // windowed MEDIAN over identical deseasonalized doubles
    "ts12_decompose" ->
      """WITH e AS (SELECT event_type,
                           CAST(dayofweek(ts) AS INT) AS dow,
                           CAST(hour(ts) AS INT) AS hod,
                           CAST(ROUND(value * 1e6, 0) AS BIGINT) AS vfp
                    FROM events WHERE value IS NOT NULL),
         prof AS (SELECT event_type, dow, hod,
                         ROUND(SUM(vfp) / COUNT(*) / 1e6, 6) + 0.0 AS mean_v
                  FROM e GROUP BY 1, 2, 3),
         j AS (SELECT event_id, events.event_type, ts,
                      mean_v, value - mean_v AS de
               FROM events JOIN prof
                 ON events.event_type = prof.event_type
                AND CAST(dayofweek(ts) AS INT) = prof.dow
                AND CAST(hour(ts) AS INT) = prof.hod
               WHERE value IS NOT NULL),
         t AS (SELECT event_id, event_type, mean_v, de,
                      MEDIAN(de) OVER (PARTITION BY event_type
                        ORDER BY ts, event_id
                        ROWS BETWEEN 24 PRECEDING AND CURRENT ROW) AS tr
               FROM j)
         SELECT event_id, event_type, mean_v AS seasonal,
                ROUND(tr, 7) + 0.0 AS trend, ROUND(de - tr, 7) + 0.0 AS residual
         FROM t""",

    // same index-order fold as the engine's aggregate(zip_with(...))
    "v10b_project_fixed" ->
      """SELECT vec_id,
                ROUND(LIST_SUM(LIST_TRANSFORM(range(1, 65),
                  i -> CAST(embedding[i] AS DOUBLE)
                       * ((((i - 1) * 37) % 19) - 9) / 10.0)), 6) + 0.0 AS proj
         FROM embeddings""",

    "u09_best_replica" ->
      """WITH f AS (SELECT doc_id, lang, n_chars,
                           MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ',
                             'g')) AS fp,
                           ROW_NUMBER() OVER (
                             PARTITION BY MD5(REGEXP_REPLACE(LOWER(TRIM(text)),
                               '\s+', ' ', 'g'))
                             ORDER BY CASE WHEN lang = 'en' THEN 0 ELSE 1 END,
                                      n_chars DESC, doc_id) AS rn
                    FROM documents)
         SELECT fp, doc_id, lang, n_chars FROM f WHERE rn = 1""",

    // the same parallel-bit-spread chain, decimal mask constants
    "s14_zorder" ->
      """WITH b AS (SELECT event_id,
                           CAST(user_id AS BIGINT) & 2147483647 AS x,
                           CAST(date_diff('day', DATE '2024-01-01',
                             CAST(ts AS DATE)) AS BIGINT) & 2147483647 AS y
                    FROM events),
         s1 AS (SELECT event_id, (x | (x << 16)) & 281470681808895 AS x,
                       (y | (y << 16)) & 281470681808895 AS y FROM b),
         s2 AS (SELECT event_id, (x | (x << 8)) & 71777214294589695 AS x,
                       (y | (y << 8)) & 71777214294589695 AS y FROM s1),
         s3 AS (SELECT event_id, (x | (x << 4)) & 1085102592571150095 AS x,
                       (y | (y << 4)) & 1085102592571150095 AS y FROM s2),
         s4 AS (SELECT event_id, (x | (x << 2)) & 3689348814741910323 AS x,
                       (y | (y << 2)) & 3689348814741910323 AS y FROM s3),
         s5 AS (SELECT event_id, (x | (x << 1)) & 6148914691236517205 AS x,
                       (y | (y << 1)) & 6148914691236517205 AS y FROM s4)
         SELECT event_id, CAST(x | (y << 1) AS BIGINT) AS zval FROM s5""",

    "dq09_control_chart" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
                               CAST(COUNT(*) AS BIGINT) AS n
                        FROM events GROUP BY 1),
         st AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                       CAST(SUM(n) AS BIGINT) AS s,
                       CAST(SUM(n * n) AS BIGINT) AS ss
                FROM daily)
         SELECT day, n,
                ROUND(CAST(s AS DOUBLE) / k, 6) + 0.0 AS mu,
                ROUND(SQRT(CAST(k * ss - s * s AS DOUBLE) / (k * (k - 1))), 6) + 0.0
                  AS sigma,
                ABS(n - CAST(s AS DOUBLE) / k) >
                  3.0 * SQRT(CAST(k * ss - s * s AS DOUBLE) / (k * (k - 1)))
                  AS out_of_control
         FROM daily CROSS JOIN st""",

    "f32_json_parse" ->
      """SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k_val
         FROM events""",

    "ml17_dataset_card" ->
      """WITH t AS (SELECT lang, n_chars,
                           CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+'))
                             AS BIGINT) AS tok,
                           MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ',
                             'g')) AS fp
                    FROM documents),
         a AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                      CAST(SUM(tok) AS BIGINT) AS nt,
                      CAST(SUM(n_chars) AS BIGINT) AS nc,
                      CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
                      CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS ne,
                      CAST(COUNT(DISTINCT fp) AS BIGINT) AS nu
               FROM t)
         SELECT m.metric, m.value FROM a, LATERAL (VALUES
           ('10_n_docs', CAST(nd AS DOUBLE)),
           ('20_n_tokens', CAST(nt AS DOUBLE)),
           ('30_n_chars', CAST(nc AS DOUBLE)),
           ('40_n_langs', CAST(nl AS DOUBLE)),
           ('50_pct_en', ROUND(ne / CAST(nd AS DOUBLE), 6)),
           ('60_dup_rate', ROUND(1.0 - nu / CAST(nd AS DOUBLE), 6)),
           ('70_mean_tokens', ROUND(nt / CAST(nd AS DOUBLE), 6))
         ) AS m(metric, value)""",

    "a35_mcnemar" ->
      """WITH r AS (SELECT (o_orderstatus = 'F') AS t,
                           (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS pa,
                           (o_totalprice > 150000) AS pb
                    FROM orders),
         c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(CASE WHEN pa = t AND pb <> t THEN 1 ELSE 0 END)
                        AS BIGINT) AS b,
                      CAST(SUM(CASE WHEN pa <> t AND pb = t THEN 1 ELSE 0 END)
                        AS BIGINT) AS c
               FROM r)
         SELECT n, b, c,
                CASE WHEN b + c > 0 THEN
                  ROUND(POWER(ABS(b - c) - 1, 2) / (b + c), 6)
                END AS chi2
         FROM c""",

    "ts11_autocorr" ->
      """WITH b AS (SELECT user_id, ts, event_id,
                           CAST(ROUND(value * 100, 0) AS BIGINT) AS v
                    FROM events),
         l AS (SELECT user_id, v,
                      LAG(v, 1) OVER w AS l1,
                      LAG(v, 2) OVER w AS l2,
                      LAG(v, 3) OVER w AS l3
               FROM b
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         st AS (SELECT user_id, 1 AS lag, v, l1 AS p FROM l WHERE l1 IS NOT NULL
                UNION ALL
                SELECT user_id, 2, v, l2 FROM l WHERE l2 IS NOT NULL
                UNION ALL
                SELECT user_id, 3, v, l3 FROM l WHERE l3 IS NOT NULL),
         g AS (SELECT user_id, lag, CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(CAST(v AS HUGEINT)) AS sx,
                      SUM(CAST(p AS HUGEINT)) AS sy,
                      SUM(CAST(v AS HUGEINT) * p) AS sxy,
                      SUM(CAST(v AS HUGEINT) * v) AS sxx,
                      SUM(CAST(p AS HUGEINT) * p) AS syy
               FROM st GROUP BY 1, 2)
         SELECT user_id, lag, n,
                CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0 THEN
                  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                        / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)), 6)
                END + 0.0 AS acf
         FROM g""",

    // reuses the d03 minhash/banding stack for candidates and the d05
    // inverted index for truth — both sides share one shingle CTE
    "d16_lsh_recall" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM documents),
         s AS (SELECT doc_id, CASE WHEN LEN(toks) >= 3 THEN
                 LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                 ELSE [] END AS sh FROM t),
         sig AS (SELECT doc_id, sh,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('0:' || x))) AS m00,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('1:' || x))) AS m01,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('2:' || x))) AS m02,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('3:' || x))) AS m03,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('4:' || x))) AS m04,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('5:' || x))) AS m05,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('6:' || x))) AS m06,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('7:' || x))) AS m07,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('8:' || x))) AS m08,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('9:' || x))) AS m09,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('10:' || x))) AS m10,
                LIST_MIN(LIST_TRANSFORM(sh, x -> MD5('11:' || x))) AS m11
           FROM s),
         bands AS (
           SELECT doc_id, 0 AS band, MD5(m00 || '|' || m01) AS band_key FROM sig
           UNION ALL SELECT doc_id, 1, MD5(m02 || '|' || m03) FROM sig
           UNION ALL SELECT doc_id, 2, MD5(m04 || '|' || m05) FROM sig
           UNION ALL SELECT doc_id, 3, MD5(m06 || '|' || m07) FROM sig
           UNION ALL SELECT doc_id, 4, MD5(m08 || '|' || m09) FROM sig
           UNION ALL SELECT doc_id, 5, MD5(m10 || '|' || m11) FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.band_key = b.band_key
                       AND a.doc_id < b.doc_id
                  WHERE a.band_key IS NOT NULL),
         ex AS (SELECT doc_id, UNNEST(sh) AS sg FROM s),
         sizes AS (SELECT doc_id, LEN(sh) AS n FROM s),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS cnt
                   FROM ex a JOIN ex b
                     ON a.sg = b.sg AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         truth AS (SELECT id_a, id_b
                   FROM inter JOIN sizes sa ON sa.doc_id = id_a
                     JOIN sizes sb ON sb.doc_id = id_b
                   WHERE cnt * 1.0 / (sa.n + sb.n - cnt) >= 0.5),
         agg AS (SELECT
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
                   (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM truth JOIN cand USING (id_a, id_b)) AS n_hit)
         SELECT n_truth, n_cand, n_hit,
                ROUND(CAST(n_hit AS DOUBLE) / n_truth, 6) + 0.0 AS recall,
                ROUND(CAST(n_hit AS DOUBLE) / n_cand, 6) + 0.0 AS precision
         FROM agg""",

    "t29_code_detect" ->
      """SELECT doc_id,
                CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text,
                  '[{}()\[\];=<>]', '', 'g')) AS BIGINT) AS n_sym,
                CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text,
                  '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
                ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text,
                  '[{}()\[\];=<>]', '', 'g')) AS DOUBLE) / n_chars, 6) + 0.0
                  AS sym_ratio,
                ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text,
                  '[{}()\[\];=<>]', '', 'g')) AS DOUBLE) / n_chars, 6) > 0.02
                  AS is_code
         FROM documents""",

    "t30_lexical_diversity" ->
      """WITH tok AS (SELECT doc_id,
                             UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS t
                      FROM documents),
         c AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                      CAST(COUNT(DISTINCT t) AS BIGINT) AS n_types
               FROM tok GROUP BY 1)
         SELECT doc_id, n_tokens, n_types,
                ROUND(CAST(n_types AS DOUBLE) / n_tokens, 6) + 0.0 AS ttr,
                ROUND(CAST(n_types AS DOUBLE) / SQRT(n_tokens), 6) + 0.0 AS rttr
         FROM c""",

    // six frame sums in row order (both engines run ROWS frames
    // sequentially), textbook assembly, null when a side is constant
    "w16_rolling_corr" ->
      """WITH p AS (SELECT event_id, user_id, ts, event_id AS tie,
                           CAST(epoch_us(ts) // 1000000 - 1704067200 AS DOUBLE)
                             AS x,
                           value AS y
                    FROM events WHERE event_type = 'purchase'),
         f AS (SELECT event_id,
                      CAST(COUNT(*) OVER w AS DOUBLE) AS n,
                      SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
                      SUM(x * y) OVER w AS sxy,
                      SUM(x * x) OVER w AS sxx,
                      SUM(y * y) OVER w AS syy
               FROM p
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, tie
                            ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
         SELECT event_id,
                CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0 THEN
                  ROUND((n * sxy - sx * sy)
                        / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                END + 0.0 AS roll_corr
         FROM f""",

    // mirrors the engine op-for-op: integer placement moments over the
    // distinct-score frame, double-only closing SE/CI assembly
    "a33_auroc_delong" ->
      """WITH r0 AS (SELECT o_totalprice AS s,
                            CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
                     FROM orders),
         c AS (SELECT s, CAST(SUM(y) AS BIGINT) AS cp,
                      CAST(SUM(1 - y) AS BIGINT) AS cn
               FROM r0 GROUP BY 1),
         cum AS (SELECT cp, cn,
                        CAST(SUM(cp) OVER w AS BIGINT) AS cump,
                        CAST(SUM(cn) OVER w AS BIGINT) AS cumn
                 FROM c
                 WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)),
         tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS m,
                        CAST(SUM(cn) AS BIGINT) AS n
                 FROM c),
         st AS (SELECT m, n,
                       SUM(CAST(cp AS HUGEINT) * (2 * cumn - cn)) AS sa,
                       SUM(CAST(cp AS HUGEINT) * (2 * cumn - cn)
                           * (2 * cumn - cn)) AS saa,
                       SUM(CAST(cn AS HUGEINT) * (2 * (m - cump) + cp)
                           * (2 * (m - cump) + cp)) AS sbb
                FROM cum CROSS JOIN tot GROUP BY 1, 2),
         fin AS (SELECT m, n,
                        CAST(sa AS DOUBLE)
                          / (2.0 * CAST(n AS DOUBLE) * CAST(m AS DOUBLE)) AS th,
                        (CAST(saa AS DOUBLE)
                           / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                         - CAST(m AS DOUBLE) * (CAST(sa AS DOUBLE)
                             / (2.0 * CAST(n AS DOUBLE) * CAST(m AS DOUBLE)))
                           * (CAST(sa AS DOUBLE)
                             / (2.0 * CAST(n AS DOUBLE) * CAST(m AS DOUBLE))))
                          / (CAST(m AS DOUBLE) - 1.0) AS s10,
                        (CAST(sbb AS DOUBLE)
                           / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))
                         - CAST(n AS DOUBLE) * (CAST(sa AS DOUBLE)
                             / (2.0 * CAST(n AS DOUBLE) * CAST(m AS DOUBLE)))
                           * (CAST(sa AS DOUBLE)
                             / (2.0 * CAST(n AS DOUBLE) * CAST(m AS DOUBLE))))
                          / (CAST(n AS DOUBLE) - 1.0) AS s01
                 FROM st)
         SELECT m AS n_pos, n AS n_neg, ROUND(th, 6) + 0.0 AS auc,
                ROUND(SQRT(s10 / CAST(m AS DOUBLE) + s01 / CAST(n AS DOUBLE)),
                  6) + 0.0 AS se,
                ROUND(th - 1.959964 * SQRT(s10 / CAST(m AS DOUBLE)
                  + s01 / CAST(n AS DOUBLE)), 6) + 0.0 AS ci_lo,
                ROUND(th + 1.959964 * SQRT(s10 / CAST(m AS DOUBLE)
                  + s01 / CAST(n AS DOUBLE)), 6) + 0.0 AS ci_hi
         FROM fin""",

    // κ cleared of denominators: (N·Σ n_kk − Σ n_a·n_b)/(N² − Σ n_a·n_b),
    // all-integer operands, single rounded division
    "a34_cohens_kappa" ->
      """WITH r0 AS (SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 'high' ELSE 'low' END AS a,
                            CASE WHEN o_totalprice > 150000
                              THEN 'high' ELSE 'low' END AS b
                     FROM orders),
         cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nab
                   FROM r0 GROUP BY 1, 2),
         ag AS (SELECT CAST(SUM(CASE WHEN a = b THEN nab ELSE 0 END) AS BIGINT)
                         AS diag,
                       CAST(SUM(nab) AS BIGINT) AS n
                FROM cells),
         ma AS (SELECT a AS k, CAST(SUM(nab) AS BIGINT) AS na
                FROM cells GROUP BY 1),
         mb AS (SELECT b AS k, CAST(SUM(nab) AS BIGINT) AS nb
                FROM cells GROUP BY 1),
         pe AS (SELECT SUM(CAST(na AS HUGEINT) * nb) AS sab
                FROM ma JOIN mb USING (k))
         SELECT n, ROUND(CAST(diag AS DOUBLE) / n, 6) + 0.0 AS p_obs,
                ROUND(CAST(sab AS DOUBLE)
                      / CAST(CAST(n AS HUGEINT) * n AS DOUBLE), 6) + 0.0 AS p_exp,
                CASE WHEN CAST(n AS HUGEINT) * n <> sab THEN
                  ROUND(CAST(CAST(n AS HUGEINT) * diag - sab AS DOUBLE)
                        / CAST(CAST(n AS HUGEINT) * n - sab AS DOUBLE), 6)
                END + 0.0 AS kappa
         FROM ag CROSS JOIN pe""",

    "dq08_completeness" ->
      """WITH d AS (SELECT DISTINCT user_id,
                           CAST(date_diff('day', DATE '1970-01-01',
                             CAST(ts AS DATE)) AS BIGINT) AS day
                    FROM events),
         g AS (SELECT user_id, day,
                      day - LAG(day) OVER (PARTITION BY user_id ORDER BY day)
                        AS gap
               FROM d)
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS active_days,
                CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS span_days,
                ROUND(CAST(COUNT(*) AS DOUBLE) / (MAX(day) - MIN(day) + 1), 6) + 0.0
                  AS completeness,
                CAST(COALESCE(MAX(gap), 1) AS BIGINT) AS max_gap
         FROM g GROUP BY 1""",

    "q06_conversion_24h" ->
      """WITH b AS (SELECT user_id, event_type, ts, epoch_us(ts) AS us
                    FROM events),
         c AS (SELECT user_id, event_type, ts,
                      MIN(CASE WHEN event_type = 'purchase' THEN us END)
                        OVER (PARTITION BY user_id ORDER BY us
                              RANGE BETWEEN CURRENT ROW
                                AND 86400000000 FOLLOWING) AS p
               FROM b)
         SELECT CAST(ts AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS n_views,
                CAST(SUM(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_converted
         FROM c
         WHERE event_type = 'view'
         GROUP BY 1""",

    // weighted HITS, 3 supersteps unrolled — per-edge contributions pico-
    // quantized, L1 totals exact BIGINT sums (the pr01 fixed-point
    // contract applied to the two-score recurrence)
    "g09_hits" ->
      """WITH base AS (
           SELECT event_type,
                  LEAD(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS next_type
           FROM events),
         e0 AS (SELECT event_type AS src, next_type AS dst,
                       CAST(COUNT(*) AS DOUBLE) AS w
                FROM base WHERE next_type IS NOT NULL GROUP BY 1, 2),
         wm AS (SELECT MAX(w) AS wm FROM e0),
         e AS MATERIALIZED (SELECT src, dst, w / wm.wm AS w
                            FROM e0 CROSS JOIN wm),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         h0 AS (SELECT node, ROUND(1.0 / n, 9) + 0.0 AS hub
                FROM nodes CROSS JOIN nn),
         a1f AS (SELECT e.dst AS node,
                        SUM(CAST(ROUND(h.hub * e.w * 1e12, 0) AS BIGINT)) AS afp
                 FROM h0 h JOIN e ON e.src = h.node GROUP BY 1),
         a1t AS (SELECT CAST(SUM(afp) AS DOUBLE) AS t FROM a1f),
         a1 AS (SELECT n.node,
                       ROUND(CAST(COALESCE(f.afp, 0) AS DOUBLE) / t.t, 9) + 0.0
                         AS authority
                FROM nodes n LEFT JOIN a1f f ON f.node = n.node CROSS JOIN a1t t),
         h1f AS (SELECT e.src AS node,
                        SUM(CAST(ROUND(a.authority * e.w * 1e12, 0) AS BIGINT)) AS hfp
                 FROM a1 a JOIN e ON e.dst = a.node GROUP BY 1),
         h1t AS (SELECT CAST(SUM(hfp) AS DOUBLE) AS t FROM h1f),
         h1 AS (SELECT n.node,
                       ROUND(CAST(COALESCE(f.hfp, 0) AS DOUBLE) / t.t, 9) + 0.0 AS hub
                FROM nodes n LEFT JOIN h1f f ON f.node = n.node CROSS JOIN h1t t),
         a2f AS (SELECT e.dst AS node,
                        SUM(CAST(ROUND(h.hub * e.w * 1e12, 0) AS BIGINT)) AS afp
                 FROM h1 h JOIN e ON e.src = h.node GROUP BY 1),
         a2t AS (SELECT CAST(SUM(afp) AS DOUBLE) AS t FROM a2f),
         a2 AS (SELECT n.node,
                       ROUND(CAST(COALESCE(f.afp, 0) AS DOUBLE) / t.t, 9) + 0.0
                         AS authority
                FROM nodes n LEFT JOIN a2f f ON f.node = n.node CROSS JOIN a2t t),
         h2f AS (SELECT e.src AS node,
                        SUM(CAST(ROUND(a.authority * e.w * 1e12, 0) AS BIGINT)) AS hfp
                 FROM a2 a JOIN e ON e.dst = a.node GROUP BY 1),
         h2t AS (SELECT CAST(SUM(hfp) AS DOUBLE) AS t FROM h2f),
         h2 AS (SELECT n.node,
                       ROUND(CAST(COALESCE(f.hfp, 0) AS DOUBLE) / t.t, 9) + 0.0 AS hub
                FROM nodes n LEFT JOIN h2f f ON f.node = n.node CROSS JOIN h2t t),
         a3f AS (SELECT e.dst AS node,
                        SUM(CAST(ROUND(h.hub * e.w * 1e12, 0) AS BIGINT)) AS afp
                 FROM h2 h JOIN e ON e.src = h.node GROUP BY 1),
         a3t AS (SELECT CAST(SUM(afp) AS DOUBLE) AS t FROM a3f),
         a3 AS (SELECT n.node,
                       ROUND(CAST(COALESCE(f.afp, 0) AS DOUBLE) / t.t, 9) + 0.0
                         AS authority
                FROM nodes n LEFT JOIN a3f f ON f.node = n.node CROSS JOIN a3t t),
         h3f AS (SELECT e.src AS node,
                        SUM(CAST(ROUND(a.authority * e.w * 1e12, 0) AS BIGINT)) AS hfp
                 FROM a3 a JOIN e ON e.dst = a.node GROUP BY 1),
         h3t AS (SELECT CAST(SUM(hfp) AS DOUBLE) AS t FROM h3f),
         h3 AS (SELECT n.node,
                       ROUND(CAST(COALESCE(f.hfp, 0) AS DOUBLE) / t.t, 9) + 0.0 AS hub
                FROM nodes n LEFT JOIN h3f f ON f.node = n.node CROSS JOIN h3t t)
         SELECT h3.node, ROUND(a3.authority, 6) + 0.0 AS authority,
                ROUND(h3.hub, 6) + 0.0 AS hub
         FROM h3 JOIN a3 ON a3.node = h3.node""",

    // per-node triangles via the naive wedge join (fine at oracle scale;
    // the engine's degree-ordered orientation counts the same triangles)
    "g10_clustering_coeff" ->
      """WITH bsk AS (SELECT DISTINCT l_orderkey AS b, p_brand AS i
                      FROM lineitem JOIN part ON l_partkey = p_partkey),
         e AS (SELECT a.i AS s, b.i AS t
               FROM bsk a JOIN bsk b ON a.b = b.b AND a.i < b.i
               GROUP BY 1, 2 HAVING COUNT(*) >= 20),
         adj AS (SELECT s AS z, t AS nb FROM e UNION ALL SELECT t, s FROM e),
         deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS degree
                 FROM adj GROUP BY 1),
         tri AS (SELECT x.z, CAST(COUNT(*) AS BIGINT) AS t
                 FROM adj x JOIN adj y ON x.z = y.z AND x.nb < y.nb
                 JOIN e ON e.s = x.nb AND e.t = y.nb
                 GROUP BY 1)
         SELECT d.z AS node, d.degree,
                COALESCE(tri.t, 0) AS triangles,
                CASE WHEN d.degree < 2 THEN 0.0
                     ELSE ROUND(COALESCE(tri.t, 0) * 2.0
                                / (d.degree * (d.degree - 1)), 6) + 0.0
                END AS clustering_coeff
         FROM deg d LEFT JOIN tri ON tri.z = d.z""",

    // Gopher rule flags from exact integer token statistics; the keep
    // verdict compares the ROUNDED ratios exactly as the engine does
    "t40_gopher_rules" ->
      """WITH t AS (SELECT doc_id,
                           STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents WHERE text IS NOT NULL),
         q AS (SELECT doc_id, LEN(toks) AS n,
                      LIST_SUM(LIST_TRANSFORM(toks, x -> LEN(x))) AS totlen,
                      LEN(LIST_FILTER(toks,
                        x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha,
                      LEN(LIST_FILTER(toks,
                        x -> CONTAINS(x, '#') OR CONTAINS(x, '...'))) AS sym,
                      LEN(LIST_FILTER(toks,
                        x -> x IN ('the','be','to','of','and','that','have','with')))
                        AS stp
               FROM t)
         SELECT doc_id, CAST(n AS INT) AS n_words,
                ROUND(totlen * 1.0 / n, 6) + 0.0 AS mean_word_len,
                ROUND(alpha * 1.0 / n, 6) + 0.0 AS alpha_frac,
                ROUND(sym * 1.0 / n, 6) + 0.0 AS symbol_frac,
                CAST(stp AS INT) AS stop_hits,
                CASE WHEN n BETWEEN 50 AND 100000
                      AND ROUND(totlen * 1.0 / n, 6) BETWEEN 3.0 AND 10.0
                      AND ROUND(alpha * 1.0 / n, 6) >= 0.8
                      AND ROUND(sym * 1.0 / n, 6) <= 0.1
                      AND stp >= 2 THEN 1 ELSE 0 END AS keep
         FROM q""",

    // the t28 bigram-LM construction, closed by perplexity + the exact
    // global tercile rank (ppl is a rounded double, so both engines
    // order identical values; ties break on doc_id)
    "t39_ppl_buckets" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         bg AS (SELECT doc_id,
                       UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                         k -> toks[k] || ' ' || toks[k+1])) AS bg
                FROM t WHERE LEN(toks) >= 2),
         m AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS m
               FROM bg GROUP BY 1, 2),
         cb AS (SELECT bg, CAST(SUM(m) AS BIGINT) AS cbg FROM m GROUP BY 1),
         uni AS (SELECT UNNEST(toks) AS tok FROM t),
         cu AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM uni GROUP BY 1),
         v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM cu),
         mdl AS (SELECT cb.bg,
                        CAST(ROUND(LN((cb.cbg + 1.0) / (cu.cu + v.v)) * 1e12, 0)
                          AS BIGINT) AS lpq
                 FROM cb JOIN cu ON cu.tok = SPLIT_PART(cb.bg, ' ', 1)
                 CROSS JOIN v),
         sc AS (SELECT m.doc_id, CAST(SUM(m.m) AS BIGINT) AS nb,
                       SUM(CAST(m.m AS HUGEINT) * mdl.lpq) AS llq
                FROM m JOIN mdl USING (bg)
                GROUP BY 1),
         scored AS (SELECT doc_id,
                           ROUND(EXP(-(ROUND(CAST(llq AS DOUBLE) / 1e12 / nb,
                                             6))), 6) + 0.0 AS ppl
                    FROM sc WHERE nb > 0),
         nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scored),
         r AS (SELECT doc_id, ppl,
                      ROW_NUMBER() OVER (ORDER BY ppl ASC, doc_id ASC) AS rk
               FROM scored)
         SELECT doc_id, ppl,
                CASE WHEN FLOOR((rk - 1) * 3.0 / n) = 0 THEN 'head'
                     WHEN FLOOR((rk - 1) * 3.0 / n) = 1 THEN 'middle'
                     ELSE 'tail' END AS bucket
         FROM r CROSS JOIN nt""",

    // DSIR: exact integer bucket counts → one nano-quantized log ratio
    // per bucket → exact BIGINT per-doc sums, one closing division
    "ml24_dsir_weights" ->
      """WITH t AS (SELECT doc_id,
                           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
                           STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         bg AS (SELECT doc_id, tgt,
                       UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                         k -> toks[k] || ' ' || toks[k+1])) AS bg
                FROM t WHERE LEN(toks) >= 2),
         bb AS (SELECT doc_id,
                       CAST(CAST(('0x' || SUBSTRING(MD5(bg), 1, 4)) AS BIGINT)
                         % 128 AS INT) AS b,
                       tgt
                FROM bg),
         counts AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r,
                           CAST(SUM(tgt) AS BIGINT) AS tc
                    FROM bb GROUP BY 1),
         tot AS (SELECT CAST(SUM(r) AS BIGINT) AS rt,
                        CAST(SUM(tc) AS BIGINT) AS tt FROM counts),
         ratio AS (SELECT b,
                          CAST(ROUND(LN((tc + 1.0) / (tt + 128.0)
                                        * (rt + 128.0) / (r + 1.0)) * 1e9, 0)
                            AS BIGINT) AS lrq
                   FROM counts CROSS JOIN tot),
         per AS (SELECT bb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                        CAST(SUM(ratio.lrq) AS BIGINT) AS s
                 FROM bb JOIN ratio USING (b) GROUP BY 1)
         SELECT d.doc_id, COALESCE(per.n_bigrams, 0) AS n_bigrams,
                ROUND(per.s / per.n_bigrams / 1e9, 6) + 0.0 AS dsir_w
         FROM documents d LEFT JOIN per USING (doc_id)""",

    // ExactSubstr coverage: global 5-gram hash counts → duplicated start
    // positions → equal-length interval union via one LEAD window
    "d21_dupspan_coverage" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         tk AS (SELECT doc_id, toks, LEN(toks) AS n FROM t),
         gh AS (SELECT doc_id, n, pos,
                       MD5(ARRAY_TO_STRING(toks[pos + 1 : pos + 5], ' ')) AS h
                FROM (SELECT doc_id, toks, n,
                             UNNEST(GENERATE_SERIES(0, CAST(n - 5 AS INT))) AS pos
                      FROM tk WHERE n >= 5)),
         dup AS (SELECT h FROM gh GROUP BY h HAVING COUNT(*) >= 2),
         dp AS (SELECT gh.doc_id, gh.pos FROM gh JOIN dup USING (h)),
         cov AS (SELECT doc_id, pos,
                        LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
                 FROM dp),
         agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
                        CAST(SUM(CASE WHEN nxt IS NULL THEN 5
                                      ELSE LEAST(5, nxt - pos) END) AS BIGINT)
                          AS covered
                 FROM cov GROUP BY 1)
         SELECT tk.doc_id, CAST(tk.n AS INT) AS n_toks,
                COALESCE(agg.n_dup_spans, 0) AS n_dup_spans,
                COALESCE(agg.covered, 0) AS covered_tokens,
                ROUND(COALESCE(agg.covered, 0) * 1.0 / tk.n, 6) + 0.0 AS coverage
         FROM tk LEFT JOIN agg USING (doc_id)""",

    // sorted-suffix neighborhood ExactSubstr: global suffix rank, LCP
    // with the adjacent suffix (max-LCP partner is always adjacent in
    // sorted order), overlap-only interval union — all exact integers
    "d22_exactsubstr_spans" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         tk AS (SELECT doc_id, toks, LEN(toks) AS n FROM t),
         gh AS (SELECT doc_id, toks, pos,
                       MD5(ARRAY_TO_STRING(toks[pos + 1 : pos + 5], ' ')) AS h
                FROM (SELECT doc_id, toks, n,
                             UNNEST(GENERATE_SERIES(0, CAST(n - 5 AS INT))) AS pos
                      FROM tk WHERE n >= 5)),
         dup AS (SELECT h FROM gh GROUP BY h HAVING COUNT(*) >= 2),
         cand AS (SELECT gh.doc_id, gh.pos,
                         toks[gh.pos + 1 : gh.pos + 64] AS sfx
                  FROM gh JOIN dup USING (h)),
         rk AS (SELECT doc_id, pos, sfx,
                       ROW_NUMBER() OVER (ORDER BY ARRAY_TO_STRING(sfx, ' '),
                                          doc_id, pos) AS rn
                FROM cand),
         nx AS (SELECT a.rn,
                       CAST(COALESCE(
                         LIST_MIN(LIST_FILTER(
                           GENERATE_SERIES(1, GREATEST(LEN(a.sfx), LEN(b.sfx))),
                           i -> NOT COALESCE(a.sfx[i] = b.sfx[i], FALSE))) - 1,
                         LEAST(LEN(a.sfx), LEN(b.sfx))) AS BIGINT) AS lcpn
                FROM rk a JOIN rk b ON b.rn = a.rn + 1),
         sp AS (SELECT r.doc_id, r.pos,
                       GREATEST(COALESCE(n1.lcpn, 0), COALESCE(n0.lcpn, 0))
                         AS len
                FROM rk r
                LEFT JOIN nx n1 ON n1.rn = r.rn
                LEFT JOIN nx n0 ON n0.rn = r.rn - 1
                WHERE GREATEST(COALESCE(n1.lcpn, 0), COALESCE(n0.lcpn, 0)) >= 5),
         il AS (SELECT doc_id, pos, len,
                       MAX(pos + len) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         AS rmax
                FROM sp),
         ili AS (SELECT doc_id, pos, len,
                        SUM(CASE WHEN rmax IS NULL OR pos >= rmax
                                 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY doc_id ORDER BY pos) AS isl
                 FROM il),
         pis AS (SELECT doc_id, isl,
                        MAX(pos + len) - MIN(pos) AS slen
                 FROM ili GROUP BY 1, 2),
         pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
                       CAST(MAX(slen) AS BIGINT) AS max_span,
                       CAST(SUM(slen) AS BIGINT) AS covered
                FROM pis GROUP BY 1)
         SELECT tk.doc_id, CAST(tk.n AS INT) AS n_toks,
                COALESCE(pd.n_spans, 0) AS n_spans,
                COALESCE(pd.max_span, 0) AS max_span,
                COALESCE(pd.covered, 0) AS covered_tokens,
                ROUND(COALESCE(pd.covered, 0) * 1.0 / tk.n, 6) + 0.0 AS coverage
         FROM tk LEFT JOIN pd USING (doc_id)""",

    // d22's ranked-suffix adjacency with both doc ids kept: cross-doc
    // pairs with LCP >= 5, normalized, longest shared span per pair
    "d23_dupspan_pairs" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         tk AS (SELECT doc_id, toks, LEN(toks) AS n FROM t),
         gh AS (SELECT doc_id, toks, pos,
                       MD5(ARRAY_TO_STRING(toks[pos + 1 : pos + 5], ' ')) AS h
                FROM (SELECT doc_id, toks, n,
                             UNNEST(GENERATE_SERIES(0, CAST(n - 5 AS INT))) AS pos
                      FROM tk WHERE n >= 5)),
         dup AS (SELECT h FROM gh GROUP BY h HAVING COUNT(*) >= 2),
         cand AS (SELECT gh.doc_id, gh.pos,
                         toks[gh.pos + 1 : gh.pos + 64] AS sfx
                  FROM gh JOIN dup USING (h)),
         rk AS (SELECT doc_id, pos, sfx,
                       ROW_NUMBER() OVER (ORDER BY ARRAY_TO_STRING(sfx, ' '),
                                          doc_id, pos) AS rn
                FROM cand),
         nx AS (SELECT a.doc_id AS da, b.doc_id AS db,
                       CAST(COALESCE(
                         LIST_MIN(LIST_FILTER(
                           GENERATE_SERIES(1, GREATEST(LEN(a.sfx), LEN(b.sfx))),
                           i -> NOT COALESCE(a.sfx[i] = b.sfx[i], FALSE))) - 1,
                         LEAST(LEN(a.sfx), LEN(b.sfx))) AS BIGINT) AS lcpn
                FROM rk a JOIN rk b ON b.rn = a.rn + 1)
         SELECT LEAST(da, db) AS doc_a, GREATEST(da, db) AS doc_b,
                CAST(COUNT(*) AS BIGINT) AS n_adjacent,
                CAST(MAX(lcpn) AS BIGINT) AS max_shared_span
         FROM nx WHERE lcpn >= 5 AND da <> db
         GROUP BY 1, 2""",

    // d23's pair frame closed to clusters: recursive min-label closure
    // (the d08 pattern) over the undirected adjacent-pair graph, then
    // per-cluster size and max shared span re-attached per member
    "d25_dupspan_clusters" ->
      """WITH RECURSIVE
         t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
               FROM documents),
         tk AS (SELECT doc_id, toks, LEN(toks) AS n FROM t),
         gh AS MATERIALIZED (SELECT doc_id, toks, pos,
                       MD5(ARRAY_TO_STRING(toks[pos + 1 : pos + 5], ' ')) AS h
                FROM (SELECT doc_id, toks, n,
                             UNNEST(GENERATE_SERIES(0, CAST(n - 5 AS INT))) AS pos
                      FROM tk WHERE n >= 5)),
         dup AS (SELECT h FROM gh GROUP BY h HAVING COUNT(*) >= 2),
         cand AS MATERIALIZED (SELECT gh.doc_id, gh.pos,
                         toks[gh.pos + 1 : gh.pos + 64] AS sfx
                  FROM gh JOIN dup USING (h)),
         rk AS MATERIALIZED (SELECT doc_id, pos, sfx,
                       ROW_NUMBER() OVER (ORDER BY ARRAY_TO_STRING(sfx, ' '),
                                          doc_id, pos) AS rn
                FROM cand),
         nx AS MATERIALIZED (SELECT a.doc_id AS da, b.doc_id AS db,
                       CAST(COALESCE(
                         LIST_MIN(LIST_FILTER(
                           GENERATE_SERIES(1, GREATEST(LEN(a.sfx), LEN(b.sfx))),
                           i -> NOT COALESCE(a.sfx[i] = b.sfx[i], FALSE))) - 1,
                         LEAST(LEN(a.sfx), LEN(b.sfx))) AS BIGINT) AS lcpn
                FROM rk a JOIN rk b ON b.rn = a.rn + 1),
         pr AS MATERIALIZED (SELECT LEAST(da, db) AS doc_a, GREATEST(da, db) AS doc_b,
                       CAST(MAX(lcpn) AS BIGINT) AS mss
                FROM nx WHERE lcpn >= 5 AND da <> db
                GROUP BY 1, 2),
         und AS (SELECT doc_a AS a, doc_b AS b FROM pr
                 UNION SELECT doc_b, doc_a FROM pr),
         reach AS (SELECT a, b FROM und
                   UNION
                   SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         cc AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canon
                FROM reach GROUP BY a),
         cs AS (SELECT canon, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM cc GROUP BY 1),
         sp AS (SELECT c.canon, CAST(MAX(pr.mss) AS BIGINT) AS cluster_max_span
                FROM pr JOIN cc c ON c.doc_id = pr.doc_a GROUP BY 1)
         SELECT cc.doc_id, CAST(cc.canon AS BIGINT) AS cluster_id,
                cs.cluster_size, sp.cluster_max_span
         FROM cc JOIN cs ON cs.canon = cc.canon
         JOIN sp ON sp.canon = cc.canon""",

    // sign-bit packing into two 32-bit words (powers of two ≤ 2³¹ are
    // exact doubles), popcount-of-XOR shortlist, exact cosine rerank
    "v17_hamming_topk" ->
      """WITH e AS (SELECT vec_id,
                           LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         b AS (SELECT vec_id, v,
                      CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(0, 31),
                        i -> CASE WHEN v[i + 1] > 0
                               THEN CAST(POWER(2, i) AS BIGINT) ELSE 0 END))
                        AS BIGINT) AS w1,
                      CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(32, 63),
                        i -> CASE WHEN v[i + 1] > 0
                               THEN CAST(POWER(2, i - 32) AS BIGINT) ELSE 0 END))
                        AS BIGINT) AS w2
               FROM e),
         cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                         q.v AS qv, c.v AS cv,
                         CAST(BIT_COUNT(XOR(q.w1, c.w1))
                              + BIT_COUNT(XOR(q.w2, c.w2)) AS INT) AS hamming
                  FROM (SELECT * FROM b WHERE vec_id < 8) q
                  CROSS JOIN b c WHERE c.vec_id <> q.vec_id),
         short AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY hamming ASC, neighbor_id ASC) AS hr
                   FROM cand),
         sims AS (SELECT query_id, neighbor_id, hamming,
                         ROUND(LIST_DOT_PRODUCT(qv, cv)
                           / (SQRT(LIST_DOT_PRODUCT(qv, qv))
                              * SQRT(LIST_DOT_PRODUCT(cv, cv))), 6) + 0.0 AS sim
                  FROM short WHERE hr <= 32)
         SELECT query_id, neighbor_id, hamming, sim,
                CAST(rn AS INTEGER) AS rank FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC) AS rn FROM sims)
         WHERE rn <= 5""",

    // four exact HUGEINT power sums per group, one fixed closing double
    // sequence (the a40 discipline, two moments further)
    "a49_jarque_bera" ->
      """WITH r AS (SELECT c_nationkey,
                           CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS q
                    FROM customer),
         s AS (SELECT c_nationkey, CAST(COUNT(q) AS BIGINT) AS n,
                      SUM(CAST(q AS HUGEINT)) AS s1,
                      SUM(CAST(q AS HUGEINT) * q) AS s2,
                      SUM(CAST(q AS HUGEINT) * q * q) AS s3,
                      SUM(CAST(q AS HUGEINT) * q * q * q) AS s4
               FROM r GROUP BY 1),
         f AS (SELECT c_nationkey, n,
                      CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                      CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                      CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                      CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
               FROM s),
         m AS (SELECT c_nationkey, n,
                      r2 - mu * mu AS m2,
                      r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
                      r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                         - 3.0 * mu * mu * mu * mu AS m4
               FROM f)
         SELECT c_nationkey, n,
                CASE WHEN m2 > 0
                  THEN ROUND(m3 / SQRT(m2 * m2 * m2), 6) + 0.0 END AS skewness,
                CASE WHEN m2 > 0
                  THEN ROUND(m4 / (m2 * m2) - 3.0, 6) + 0.0 END AS ex_kurtosis,
                CASE WHEN m2 > 0
                  THEN ROUND(CAST(n AS DOUBLE) / 6.0 *
                         ((m3 / SQRT(m2 * m2 * m2)) * (m3 / SQRT(m2 * m2 * m2))
                          + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                            / 4.0), 6) + 0.0 END AS jb
         FROM m""",

    // type-7 medians (QUANTILE_CONT ≡ the engine's exact rank interp over
    // integers), exact |2x − 2·med| deviations, per-group double terms
    // pinned to integer units before the cross-group exact sum
    "a51_brown_forsythe" ->
      """WITH r AS (SELECT c_nationkey AS grp,
                           CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS q
                    FROM customer WHERE c_acctbal IS NOT NULL),
         med AS (SELECT grp,
                        CAST(ROUND(QUANTILE_CONT(q, 0.5) * 2, 0) AS BIGINT) AS m2
                 FROM r GROUP BY 1),
         z AS (SELECT r.grp, ABS(r.q * 2 - med.m2) AS z2
               FROM r JOIN med USING (grp)),
         pg AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
                       SUM(CAST(z2 AS HUGEINT)) AS sg,
                       SUM(CAST(z2 AS HUGEINT) * z2) AS qg
                FROM z GROUP BY 1),
         gr AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                       CAST(SUM(ng) AS BIGINT) AS n,
                       SUM(sg) AS s FROM pg),
         terms AS (SELECT pg.ng, pg.sg, pg.qg, gr.k, gr.n,
                          CAST(gr.s AS DOUBLE) / CAST(gr.n AS DOUBLE) AS mu,
                          CAST(pg.sg AS DOUBLE) / CAST(pg.ng AS DOUBLE) AS mug
                   FROM pg CROSS JOIN gr),
         agg AS (SELECT MAX(k) AS k, MAX(n) AS n,
                        SUM(CAST(ROUND(CAST(qg AS DOUBLE)
                          - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                            / CAST(ng AS DOUBLE), 0) AS HUGEINT)) AS ssw,
                        SUM(CAST(ROUND(CAST(ng AS DOUBLE) * (mug - mu)
                          * (mug - mu), 0) AS HUGEINT)) AS ssb
                 FROM terms)
         SELECT k, n,
                CASE WHEN k > 1 AND ssw > 0
                  THEN ROUND((CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE))
                    / (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE)), 6) + 0.0
                END AS f_stat
         FROM agg""",

    // m06's byte-level sample reconstruction; the mean-removed sign test
    // multiplied through to exact integers (n·s − S), one closing division
    "m11_pcm_zcr" ->
      """WITH b AS (SELECT doc_id, text,
                           CAST(LEN(text) // 2 AS INT) AS ns
                    FROM documents WHERE text IS NOT NULL),
         f AS (SELECT doc_id, text, ns,
                      UNNEST(GENERATE_SERIES(0,
                        CAST(CEIL(ns / 256.0) AS INT) - 1)) AS frame
               FROM b WHERE ns >= 1),
         g AS (SELECT doc_id, CAST(frame AS INT) AS frame, text,
                      frame * 256 AS st,
                      LEAST(ns, (frame + 1) * 256) AS en
               FROM f),
         h AS (SELECT doc_id, frame, text, st, en,
                      CAST(en - st AS INT) AS n,
                      LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(st, en - 1),
                        k -> CAST(UNICODE(SUBSTR(text, 2*k + 1, 1))
                             + 256 * UNICODE(SUBSTR(text, 2*k + 2, 1)) AS BIGINT)))
                        AS s
               FROM g),
         z AS (SELECT doc_id, frame, n,
                      CAST(LEN(LIST_FILTER(GENERATE_SERIES(st + 1, en - 1),
                        k -> (n * (UNICODE(SUBSTR(text, 2*k - 1, 1))
                                   + 256 * UNICODE(SUBSTR(text, 2*k, 1))) - s)
                             * (n * (UNICODE(SUBSTR(text, 2*k + 1, 1))
                                     + 256 * UNICODE(SUBSTR(text, 2*k + 2, 1))) - s)
                             < 0)) AS BIGINT) AS crossings
               FROM h)
         SELECT doc_id, frame, n AS n_samples, crossings,
                CASE WHEN n >= 2
                  THEN ROUND(crossings * 1.0 / (n - 1), 6) + 0.0 END AS zcr
         FROM z""",

    // the full composed gate: Gopher keep ∧ CCNet non-tail tercile →
    // DSIR weights trained on the SURVIVOR corpus → top-100 by weight
    "e2e_quality_gate" ->
      """WITH t0 AS (SELECT doc_id, lang,
                            STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                     FROM documents WHERE text IS NOT NULL),
         gq AS (SELECT doc_id, LEN(toks) AS n,
                       LIST_SUM(LIST_TRANSFORM(toks, x -> LEN(x))) AS totlen,
                       LEN(LIST_FILTER(toks,
                         x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha,
                       LEN(LIST_FILTER(toks,
                         x -> CONTAINS(x, '#') OR CONTAINS(x, '...'))) AS sym,
                       LEN(LIST_FILTER(toks,
                         x -> x IN ('the','be','to','of','and','that','have','with')))
                         AS stp
                FROM t0),
         keep_g AS (SELECT doc_id FROM gq
                    WHERE n BETWEEN 50 AND 100000
                      AND ROUND(totlen * 1.0 / n, 6) BETWEEN 3.0 AND 10.0
                      AND ROUND(alpha * 1.0 / n, 6) >= 0.8
                      AND ROUND(sym * 1.0 / n, 6) <= 0.1
                      AND stp >= 2),
         tAll AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                  FROM documents),
         bgp AS (SELECT doc_id,
                        UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                          k -> toks[k] || ' ' || toks[k+1])) AS bg
                 FROM tAll WHERE LEN(toks) >= 2),
         m AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS m
               FROM bgp GROUP BY 1, 2),
         cb AS (SELECT bg, CAST(SUM(m) AS BIGINT) AS cbg FROM m GROUP BY 1),
         uni AS (SELECT UNNEST(toks) AS tok FROM tAll),
         cu AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM uni GROUP BY 1),
         v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM cu),
         mdl AS (SELECT cb.bg,
                        CAST(ROUND(LN((cb.cbg + 1.0) / (cu.cu + v.v)) * 1e12, 0)
                          AS BIGINT) AS lpq
                 FROM cb JOIN cu ON cu.tok = SPLIT_PART(cb.bg, ' ', 1)
                 CROSS JOIN v),
         sc AS (SELECT m.doc_id, CAST(SUM(m.m) AS BIGINT) AS nb,
                       SUM(CAST(m.m AS HUGEINT) * mdl.lpq) AS llq
                FROM m JOIN mdl USING (bg)
                GROUP BY 1),
         scored AS (SELECT doc_id,
                           ROUND(EXP(-(ROUND(CAST(llq AS DOUBLE) / 1e12 / nb,
                                             6))), 6) + 0.0 AS ppl
                    FROM sc WHERE nb > 0),
         ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scored),
         rk AS (SELECT doc_id, ppl,
                       ROW_NUMBER() OVER (ORDER BY ppl ASC, doc_id ASC) AS rk
                FROM scored),
         keep_p AS (SELECT doc_id FROM rk CROSS JOIN ntot
                    WHERE FLOOR((rk - 1) * 3.0 / n) < 2),
         surv AS (SELECT doc_id FROM keep_g INTERSECT SELECT doc_id FROM keep_p),
         sdoc AS (SELECT d.doc_id, d.lang, d.text FROM documents d
                  JOIN surv USING (doc_id)),
         st AS (SELECT doc_id,
                       CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
                       STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                FROM sdoc),
         sbg AS (SELECT doc_id, tgt,
                        UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                          k -> toks[k] || ' ' || toks[k+1])) AS bg
                 FROM st WHERE LEN(toks) >= 2),
         sbb AS (SELECT doc_id,
                        CAST(CAST(('0x' || SUBSTRING(MD5(bg), 1, 4)) AS BIGINT)
                          % 128 AS INT) AS b,
                        tgt
                 FROM sbg),
         scounts AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r,
                            CAST(SUM(tgt) AS BIGINT) AS tc
                     FROM sbb GROUP BY 1),
         stot AS (SELECT CAST(SUM(r) AS BIGINT) AS rt,
                         CAST(SUM(tc) AS BIGINT) AS tt FROM scounts),
         sratio AS (SELECT b,
                           CAST(ROUND(LN((tc + 1.0) / (tt + 128.0)
                                         * (rt + 128.0) / (r + 1.0)) * 1e9, 0)
                             AS BIGINT) AS lrq
                    FROM scounts CROSS JOIN stot),
         sper AS (SELECT sbb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                         CAST(SUM(sratio.lrq) AS BIGINT) AS s
                  FROM sbb JOIN sratio USING (b) GROUP BY 1)
         SELECT doc_id, n_bigrams,
                ROUND(s / n_bigrams / 1e9, 6) + 0.0 AS dsir_w
         FROM sper
         ORDER BY dsir_w DESC, doc_id ASC
         LIMIT 100""",

    // fixed-width-bin HL χ²: exact integer-micro E sums, per-bin terms
    // nano-pinned, degenerate (E=0 or E=n) bins excluded from χ² and df
    "a53_hosmer_lemeshow" ->
      """WITH r AS (SELECT LEAST(FLOOR(l_discount * 10.0 * 10), 9) AS bin,
                           CAST(ROUND(l_discount * 10.0 * 1e6, 0) AS BIGINT) AS pq,
                           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
                    FROM lineitem),
         g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS ng,
                      CAST(SUM(y) AS BIGINT) AS og,
                      CAST(SUM(pq) AS BIGINT) AS eq
               FROM r GROUP BY 1),
         t AS (SELECT ng, og, eq,
                      eq > 0 AND eq < ng * 1000000 AS valid,
                      CAST(eq AS DOUBLE) / 1e6 AS e
               FROM g),
         agg AS (SELECT CAST(SUM(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_bins,
                        CAST(SUM(ng) AS BIGINT) AS n,
                        SUM(CASE WHEN valid THEN CAST(ROUND(
                          (CAST(og AS DOUBLE) - e) * (CAST(og AS DOUBLE) - e)
                            / (e * (1.0 - e / CAST(ng AS DOUBLE))) * 1e9, 0)
                          AS BIGINT) END) AS chifp
                 FROM t)
         SELECT n_bins, n, ROUND(chifp / 1e9, 6) + 0.0 AS hl_chi2,
                CAST(n_bins - 2 AS BIGINT) AS df
         FROM agg""",

    // the a19 entropy closed form per QI group + distinct-ℓ + dominance
    "dq16_l_diversity" ->
      """WITH c AS (SELECT c_nationkey, c_mktsegment,
                           CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS sv,
                           COUNT(*) AS c
                    FROM customer GROUP BY 1, 2, 3)
         SELECT c_nationkey, c_mktsegment,
                CAST(SUM(c) AS BIGINT) AS k_count,
                CAST(COUNT(*) AS BIGINT) AS l_distinct,
                ROUND(LN(SUM(c))
                      - CAST(SUM(CAST(c AS HUGEINT)
                                 * CAST(ROUND(LN(c) * 1e12, 0) AS BIGINT))
                          AS DOUBLE) / 1e12 / SUM(c), 6) + 0.0 AS entropy,
                ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) + 0.0 AS max_share
         FROM c GROUP BY 1, 2""",

    // distinct non-loop directed pairs, EXISTS against the transpose
    "g11_reciprocity" ->
      """WITH base AS (
           SELECT event_type,
                  LEAD(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS next_type
           FROM events),
         e AS (SELECT DISTINCT event_type AS u, next_type AS v
               FROM base
               WHERE next_type IS NOT NULL AND event_type <> next_type),
         m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
         r AS (SELECT CAST(COUNT(*) AS BIGINT) AS reciprocal
               FROM e a WHERE EXISTS (SELECT 1 FROM e b
                                      WHERE b.u = a.v AND b.v = a.u))
         SELECT m.m, r.reciprocal,
                ROUND(CAST(r.reciprocal AS DOUBLE) / CAST(m.m AS DOUBLE), 6)
                  + 0.0 AS reciprocity
         FROM m CROSS JOIN r""",

    // v09's lane quantization, folded to per-(lane, parity-slice) exact
    // sums; means and drift close as one double sequence per lane
    "dq17_embedding_drift" ->
      """WITH e AS (SELECT CAST(vec_id % 2 AS INT) AS b,
                           CAST(generate_subscripts(embedding, 1) AS INT) - 1
                             AS lane,
                           CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1e6,
                                      0) AS BIGINT) AS q
                    FROM embeddings)
         SELECT lane,
                CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                CAST(SUM(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                ROUND(CAST(SUM(CASE WHEN b = 0 THEN CAST(q AS HUGEINT)
                                    ELSE 0 END) AS DOUBLE)
                      / CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                      / 1e6, 6) + 0.0 AS mean_a,
                ROUND(CAST(SUM(CASE WHEN b = 1 THEN CAST(q AS HUGEINT)
                                    ELSE 0 END) AS DOUBLE)
                      / CAST(SUM(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                      / 1e6, 6) + 0.0 AS mean_b,
                ROUND(CAST(SUM(CASE WHEN b = 1 THEN CAST(q AS HUGEINT)
                                    ELSE 0 END) AS DOUBLE)
                      / CAST(SUM(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                      / 1e6
                      - CAST(SUM(CASE WHEN b = 0 THEN CAST(q AS HUGEINT)
                                      ELSE 0 END) AS DOUBLE)
                        / CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                        / 1e6, 6) + 0.0 AS drift
         FROM e GROUP BY 1""",

    // ml24's weight construction closed by the ml08 Efraimidis–Spirakis
    // priority with w = e^dsir — same md5-derived u, same top-50 contract
    "ml25_dsir_resample" ->
      """WITH t AS (SELECT doc_id,
                           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS tgt,
                           STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         bg AS (SELECT doc_id, tgt,
                       UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                         k -> toks[k] || ' ' || toks[k+1])) AS bg
                FROM t WHERE LEN(toks) >= 2),
         bb AS (SELECT doc_id,
                       CAST(CAST(('0x' || SUBSTRING(MD5(bg), 1, 4)) AS BIGINT)
                         % 128 AS INT) AS b,
                       tgt
                FROM bg),
         counts AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r,
                           CAST(SUM(tgt) AS BIGINT) AS tc
                    FROM bb GROUP BY 1),
         tot AS (SELECT CAST(SUM(r) AS BIGINT) AS rt,
                        CAST(SUM(tc) AS BIGINT) AS tt FROM counts),
         ratio AS (SELECT b,
                          CAST(ROUND(LN((tc + 1.0) / (tt + 128.0)
                                        * (rt + 128.0) / (r + 1.0)) * 1e9, 0)
                            AS BIGINT) AS lrq
                   FROM counts CROSS JOIN tot),
         per AS (SELECT bb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                        CAST(SUM(ratio.lrq) AS BIGINT) AS s
                 FROM bb JOIN ratio USING (b) GROUP BY 1),
         sel AS (SELECT doc_id,
                        ROUND(s / n_bigrams / 1e9, 6) + 0.0 AS dsir_w
                 FROM per),
         pri AS (SELECT doc_id, dsir_w,
                        LN((CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))
                              AS BIGINT) + 0.5) / 4294967296.0)
                          / EXP(dsir_w) AS pri
                 FROM sel)
         SELECT doc_id, dsir_w, ROUND(pri, 6) + 0.0 AS priority
         FROM pri ORDER BY pri DESC, doc_id ASC LIMIT 50""",

    // exact-integer MAE sums over the observed per-day sequence; the
    // close replays (ss/ns)/(s1/n1) verbatim
    "ts19_mase" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                               CAST(COUNT(*) AS BIGINT) AS cnt
                        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
         l AS (SELECT user_id, cnt,
                      LAG(cnt, 1) OVER w AS l1,
                      LAG(cnt, 7) OVER w AS ls
               FROM daily
               WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(CASE WHEN l1 IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                      CAST(SUM(CASE WHEN l1 IS NOT NULL
                                    THEN ABS(cnt - l1) END) AS BIGINT) AS s1,
                      CAST(SUM(CASE WHEN ls IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS ns,
                      CAST(SUM(CASE WHEN ls IS NOT NULL
                                    THEN ABS(cnt - ls) END) AS BIGINT) AS ss
               FROM l GROUP BY 1)
         SELECT user_id, n,
                ROUND(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) + 0.0
                  AS mae_naive,
                ROUND(CAST(ss AS DOUBLE) / CAST(ns AS DOUBLE), 6) + 0.0
                  AS mae_seasonal,
                CASE WHEN s1 > 0 THEN
                  ROUND((CAST(ss AS DOUBLE) / CAST(ns AS DOUBLE))
                        / (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 6) + 0.0
                END AS mase
         FROM a WHERE ns > 0 AND n1 > 0""",

    // pr01's unrolled fixed-point PageRank over the symmetrized
    // adjacent-token graph, closed by the top-20 keyword cut
    "t41_textrank" ->
      """WITH t AS (SELECT STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         bgl AS (SELECT UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                        k -> toks[k] || ' ' || toks[k+1])) AS bg
                 FROM t WHERE LEN(toks) >= 2),
         p0 AS (SELECT SPLIT_PART(bg, ' ', 1) AS a, SPLIT_PART(bg, ' ', 2) AS b
                FROM bgl WHERE SPLIT_PART(bg, ' ', 1) <> SPLIT_PART(bg, ' ', 2)),
         e AS (SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
               FROM (SELECT a AS src, b AS dst FROM p0
                     UNION ALL SELECT b, a FROM p0)
               GROUP BY 1, 2),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         ow AS (SELECT src, SUM(w) AS outw FROM e GROUP BY 1),
         r0 AS (SELECT node, ROUND(1.0 / n, 9) + 0.0 AS rank
                FROM nodes CROSS JOIN nn),
         c1 AS (SELECT e.dst AS node,
                       SUM(CAST(ROUND(r.rank / ow.outw * e.w * 1e12, 0) AS BIGINT)) AS cfp
                FROM r0 r JOIN ow ON r.node = ow.src JOIN e ON e.src = r.node
                GROUP BY 1),
         d1 AS (SELECT COALESCE(SUM(CAST(ROUND(r.rank * 1e12, 0) AS BIGINT)), 0) AS dfp
                FROM r0 r LEFT JOIN ow ON r.node = ow.src WHERE ow.src IS NULL),
         r1 AS (SELECT r.node,
                       ROUND((1.0 - 0.85) / n + 0.85 *
                         (COALESCE(c.cfp, 0) / 1e12 + d.dfp / 1e12 / n), 9) + 0.0 AS rank
                FROM r0 r LEFT JOIN c1 c ON r.node = c.node
                CROSS JOIN d1 d CROSS JOIN nn),
         c2 AS (SELECT e.dst AS node,
                       SUM(CAST(ROUND(r.rank / ow.outw * e.w * 1e12, 0) AS BIGINT)) AS cfp
                FROM r1 r JOIN ow ON r.node = ow.src JOIN e ON e.src = r.node
                GROUP BY 1),
         d2 AS (SELECT COALESCE(SUM(CAST(ROUND(r.rank * 1e12, 0) AS BIGINT)), 0) AS dfp
                FROM r1 r LEFT JOIN ow ON r.node = ow.src WHERE ow.src IS NULL),
         r2 AS (SELECT r.node,
                       ROUND((1.0 - 0.85) / n + 0.85 *
                         (COALESCE(c.cfp, 0) / 1e12 + d.dfp / 1e12 / n), 9) + 0.0 AS rank
                FROM r1 r LEFT JOIN c2 c ON r.node = c.node
                CROSS JOIN d2 d CROSS JOIN nn),
         c3 AS (SELECT e.dst AS node,
                       SUM(CAST(ROUND(r.rank / ow.outw * e.w * 1e12, 0) AS BIGINT)) AS cfp
                FROM r2 r JOIN ow ON r.node = ow.src JOIN e ON e.src = r.node
                GROUP BY 1),
         d3 AS (SELECT COALESCE(SUM(CAST(ROUND(r.rank * 1e12, 0) AS BIGINT)), 0) AS dfp
                FROM r2 r LEFT JOIN ow ON r.node = ow.src WHERE ow.src IS NULL),
         r3 AS (SELECT r.node,
                       ROUND((1.0 - 0.85) / n + 0.85 *
                         (COALESCE(c.cfp, 0) / 1e12 + d.dfp / 1e12 / n), 9) + 0.0 AS rank
                FROM r2 r LEFT JOIN c3 c ON r.node = c.node
                CROSS JOIN d3 d CROSS JOIN nn)
         SELECT node AS word, ROUND(rank, 6) + 0.0 AS rank FROM r3
         ORDER BY rank DESC, node ASC LIMIT 20""",

    // v05's quantizer round-tripped to doubles, scored with the v07
    // recall construction against the exact float top-5
    "v18_int8_recall" ->
      """WITH e AS (SELECT vec_id,
                           LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         m AS (SELECT vec_id, v, LIST_MIN(v) AS lo, LIST_MAX(v) AS hi FROM e),
         deq AS (SELECT vec_id,
                        LIST_TRANSFORM(v, x -> lo +
                          (CASE WHEN hi = lo THEN -128
                                ELSE CAST(ROUND((x - lo) / ((hi - lo) / 255.0))
                                       AS INTEGER) - 128 END + 128)
                          * ((hi - lo) / 255.0)) AS v
                 FROM m),
         exact AS (
           SELECT query_id, neighbor_id FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                      ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                        / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6)
                        DESC, c.vec_id ASC) AS rn
             FROM (SELECT * FROM e WHERE vec_id < 8) q
             CROSS JOIN e c WHERE c.vec_id <> q.vec_id) WHERE rn <= 5),
         approx AS (
           SELECT query_id, neighbor_id FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                      ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                        / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6)
                        DESC, c.vec_id ASC) AS rn
             FROM (SELECT * FROM deq WHERE vec_id < 8) q
             CROSS JOIN deq c WHERE c.vec_id <> q.vec_id) WHERE rn <= 5),
         hits AS (SELECT x.query_id, COUNT(*) AS n_hits
                  FROM exact x JOIN approx a
                    ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
                  GROUP BY 1)
         SELECT x.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                CAST(COUNT(*) AS BIGINT) AS k,
                ROUND(COALESCE(h.n_hits, 0) * 1.0 / COUNT(*), 6) + 0.0 AS recall
         FROM exact x LEFT JOIN hits h USING (query_id)
         GROUP BY x.query_id, h.n_hits""",

    // exact-integer Naive Bayes: pico-pinned per-(gram, lang) logprobs,
    // M·base + Σ m·(lp − base) decomposition, integer argmax
    // joint per-subspace Lloyd's, two unrolled rounds (the v03 oracle
    // with subspace as a column): seeds = k smallest ids' subvectors,
    // portable argmin (dist asc, codeword asc), 6dp-rounded means,
    // empty codewords keep their previous centroid
    "v19_pq_train" ->
      """WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         js AS (SELECT CAST(UNNEST(GENERATE_SERIES(0, 7)) AS INT) AS j),
         dims AS (SELECT CAST(UNNEST(GENERATE_SERIES(1, 8)) AS INT) AS i),
         sub AS (SELECT vec_id, j, v[j*8 + 1 : j*8 + 8] AS sv
                 FROM e CROSS JOIN js),
         seeds AS (SELECT vec_id,
                          CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                            AS cw
                   FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT 16)),
         c0 AS (SELECT s.j, seeds.cw, s.sv AS cv
                FROM sub s JOIN seeds USING (vec_id)),
         a1 AS (SELECT vec_id, j, sv, cw FROM (
                  SELECT s.vec_id, s.j, s.sv, c.cw,
                         ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j ORDER BY
                           LIST_SUM(LIST_TRANSFORM(range(1, 9),
                             i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) ASC,
                           c.cw ASC) AS rn
                  FROM sub s JOIN c0 c ON c.j = s.j) WHERE rn = 1),
         m1 AS (SELECT j, cw, LIST(mx ORDER BY i) AS mv FROM (
                  SELECT j, cw, i, ROUND(AVG(sv[i]), 6) + 0.0 AS mx
                  FROM a1 CROSS JOIN dims GROUP BY j, cw, i) GROUP BY j, cw),
         c1 AS (SELECT c0.j, c0.cw, COALESCE(m1.mv, c0.cv) AS cv
                FROM c0 LEFT JOIN m1 USING (j, cw)),
         a2 AS (SELECT vec_id, j, sv, cw FROM (
                  SELECT s.vec_id, s.j, s.sv, c.cw,
                         ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j ORDER BY
                           LIST_SUM(LIST_TRANSFORM(range(1, 9),
                             i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) ASC,
                           c.cw ASC) AS rn
                  FROM sub s JOIN c1 c ON c.j = s.j) WHERE rn = 1),
         m2 AS (SELECT j, cw, LIST(mx ORDER BY i) AS mv FROM (
                  SELECT j, cw, i, ROUND(AVG(sv[i]), 6) + 0.0 AS mx
                  FROM a2 CROSS JOIN dims GROUP BY j, cw, i) GROUP BY j, cw),
         c2 AS (SELECT c1.j, c1.cw, COALESCE(m2.mv, c1.cv) AS cv
                FROM c1 LEFT JOIN m2 USING (j, cw)),
         af AS (SELECT vec_id, j, cw FROM (
                  SELECT s.vec_id, s.j, c.cw,
                         ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j ORDER BY
                           LIST_SUM(LIST_TRANSFORM(range(1, 9),
                             i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))) ASC,
                           c.cw ASC) AS rn
                  FROM sub s JOIN c2 c ON c.j = s.j) WHERE rn = 1),
         n AS (SELECT j, cw, CAST(COUNT(*) AS BIGINT) AS n_assigned
               FROM af GROUP BY 1, 2)
         SELECT c2.j AS subspace, c2.cw AS codeword,
                COALESCE(n.n_assigned, 0) AS n_assigned,
                CAST(d.i - 1 AS INT) AS pos,
                c2.cv[d.i] AS c_v
         FROM c2 LEFT JOIN n USING (j, cw) CROSS JOIN dims d""",

    "t43_charngram_langid" ->
      """WITH base AS (SELECT doc_id, lang, text FROM documents
                       WHERE text IS NOT NULL AND LEN(text) >= 3),
         grams AS (SELECT doc_id, lang,
                          SUBSTR(text, CAST(p AS INT), 3) AS g
                   FROM (SELECT doc_id, lang, text,
                                UNNEST(GENERATE_SERIES(1, LEN(text) - 2)) AS p
                         FROM base)),
         dg AS (SELECT doc_id, lang, g, CAST(COUNT(*) AS BIGINT) AS m
                FROM grams GROUP BY 1, 2, 3),
         doctot AS (SELECT doc_id, lang, CAST(SUM(m) AS BIGINT) AS mm
                    FROM dg GROUP BY 1, 2),
         gl AS (SELECT g, lang AS l, CAST(COUNT(*) AS BIGINT) AS c
                FROM grams GROUP BY 1, 2),
         tl AS (SELECT l, CAST(SUM(c) AS BIGINT) AS t FROM gl GROUP BY 1),
         vocab AS (SELECT CAST(COUNT(DISTINCT g) AS DOUBLE) AS v FROM gl),
         lp AS (SELECT gl.g, gl.l,
                       CAST(ROUND(LN((gl.c + 1.0) / (tl.t + vocab.v)) * 1e12, 0)
                         AS BIGINT) AS lpq
                FROM gl JOIN tl USING (l) CROSS JOIN vocab),
         baselp AS (SELECT tl.l,
                           CAST(ROUND(LN(1.0 / (tl.t + vocab.v)) * 1e12, 0)
                             AS BIGINT) AS bq
                    FROM tl CROSS JOIN vocab),
         contrib AS (SELECT dg.doc_id, lp.l,
                            CAST(SUM(dg.m * (lp.lpq - baselp.bq)) AS BIGINT)
                              AS delta
                     FROM dg JOIN lp USING (g) JOIN baselp ON baselp.l = lp.l
                     GROUP BY 1, 2),
         scores AS (SELECT d.doc_id, d.lang, b.l,
                           d.mm * b.bq + COALESCE(c.delta, 0) AS score
                    FROM doctot d CROSS JOIN baselp b
                    LEFT JOIN contrib c ON c.doc_id = d.doc_id AND c.l = b.l),
         pred AS (SELECT doc_id, lang, l AS pred_lang FROM (
                    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, l ASC) AS rn FROM scores)
                  WHERE rn = 1)
         SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
         FROM pred GROUP BY 1, 2""",

    // frequency-spectrum collapse: exact integer Σ m·V, Σ V, V₁, Σ m²·V
    // per doc, three closing divisions
    "t44_lexical_richness" ->
      """WITH tok AS (SELECT doc_id,
                             UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS tok
                      FROM documents WHERE text IS NOT NULL),
         tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS m
                FROM tok GROUP BY 1, 2),
         sp AS (SELECT doc_id, m, CAST(COUNT(*) AS BIGINT) AS v
                FROM tf GROUP BY 1, 2)
         SELECT doc_id,
                CAST(SUM(m * v) AS BIGINT) AS n_tokens,
                CAST(SUM(v) AS BIGINT) AS n_types,
                CAST(SUM(CASE WHEN m = 1 THEN v ELSE 0 END) AS BIGINT) AS hapax,
                ROUND(CAST(SUM(v) AS DOUBLE) / SUM(m * v), 6) + 0.0 AS ttr,
                ROUND(CAST(SUM(CASE WHEN m = 1 THEN v ELSE 0 END) AS DOUBLE)
                      / SUM(v), 6) + 0.0 AS hapax_ratio,
                ROUND(1e4 * CAST(SUM(m * m * v) - SUM(m * v) AS DOUBLE)
                      / (CAST(SUM(m * v) AS DOUBLE) * SUM(m * v)), 6) + 0.0
                  AS yules_k
         FROM sp GROUP BY doc_id""",

    // within-doc repetition: per-doc top-bigram argmax (count desc, gram
    // asc) and the d21 interval union with PER-DOC 5-gram counts
    "t45_gopher_repetition" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents WHERE text IS NOT NULL),
         b AS (SELECT doc_id, toks, LEN(toks) AS n,
                      CAST(LIST_SUM(LIST_TRANSFORM(toks, x -> LEN(x)))
                        AS BIGINT) AS chars
               FROM t),
         bg AS (SELECT doc_id,
                       UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                         k -> toks[k] || ' ' || toks[k+1])) AS bg
                FROM b WHERE n >= 2),
         bc AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS c
                FROM bg GROUP BY 1, 2),
         top AS (SELECT doc_id, bg, c FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY c DESC, bg ASC) AS rn FROM bc) WHERE rn = 1),
         g5 AS (SELECT doc_id, pos,
                       MD5(ARRAY_TO_STRING(toks[pos + 1 : pos + 5], ' ')) AS h
                FROM (SELECT doc_id, toks,
                             UNNEST(GENERATE_SERIES(0, CAST(n - 5 AS INT)))
                               AS pos
                      FROM b WHERE n >= 5)),
         dup AS (SELECT doc_id, h FROM g5
                 GROUP BY doc_id, h HAVING COUNT(*) >= 2),
         dp AS (SELECT g5.doc_id, g5.pos FROM g5 JOIN dup USING (doc_id, h)),
         cov AS (SELECT doc_id, pos,
                        LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                          AS nxt
                 FROM dp),
         cv AS (SELECT doc_id,
                       CAST(SUM(CASE WHEN nxt IS NULL THEN 5
                                     ELSE LEAST(5, nxt - pos) END) AS BIGINT)
                         AS covered
                FROM cov GROUP BY 1)
         SELECT b.doc_id, CAST(b.n AS INT) AS n_toks,
                top.bg AS top_bigram,
                COALESCE(ROUND(top.c * (LEN(top.bg) - 1) / b.chars, 6) + 0.0,
                         0.0) AS top_bigram_frac,
                ROUND(COALESCE(cv.covered, 0) * 1.0 / b.n, 6) + 0.0
                  AS dup5_coverage,
                CASE WHEN COALESCE(ROUND(top.c * (LEN(top.bg) - 1) / b.chars,
                                         6) + 0.0, 0.0) <= 0.2
                      AND ROUND(COALESCE(cv.covered, 0) * 1.0 / b.n, 6) + 0.0
                          <= 0.3
                     THEN 1 ELSE 0 END AS keep
         FROM b LEFT JOIN top USING (doc_id) LEFT JOIN cv USING (doc_id)""",

    // interpolated KN: all model counts off the distinct-bigram frame
    // (context totals, distinct continuations, distinct contexts),
    // one pico-quantized log per model bigram, exact per-doc sums
    "t46_kneser_ney" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         bgp AS (SELECT doc_id,
                        UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                          k -> toks[k] || ' ' || toks[k+1])) AS bg
                 FROM t WHERE LEN(toks) >= 2),
         m AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS m
               FROM bgp GROUP BY 1, 2),
         cb AS (SELECT bg, CAST(SUM(m) AS BIGINT) AS cbg,
                       SPLIT_PART(bg, ' ', 1) AS v,
                       SPLIT_PART(bg, ' ', 2) AS w
                FROM m GROUP BY 1),
         ctx AS (SELECT v, CAST(SUM(cbg) AS BIGINT) AS cv,
                        CAST(COUNT(*) AS BIGINT) AS n1v
                 FROM cb GROUP BY 1),
         cont AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n1w FROM cb GROUP BY 1),
         nbb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nbb FROM cb),
         mdl AS (SELECT cb.bg,
                        CAST(ROUND(LN(
                          (GREATEST(cb.cbg - 0.75, 0.0) +
                            0.75 * ctx.n1v * (cont.n1w / nbb.nbb)) / ctx.cv)
                          * 1e12, 0) AS BIGINT) AS lpq
                 FROM cb JOIN ctx USING (v) JOIN cont USING (w)
                 CROSS JOIN nbb),
         sc AS (SELECT m.doc_id, CAST(SUM(m.m) AS BIGINT) AS nb,
                       SUM(CAST(m.m AS HUGEINT) * mdl.lpq) AS llq
                FROM m JOIN mdl USING (bg)
                GROUP BY 1)
         SELECT d.doc_id, CAST(COALESCE(sc.nb, 0) AS BIGINT) AS n_bigrams,
                ROUND(CAST(sc.llq AS DOUBLE) / 1e12 / sc.nb, 6) + 0.0
                  AS avg_logprob_kn
         FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""",

    // per-epoch md5-keyed permutation — binary hex ordering is identical
    // in both engines; position is the within-epoch rank
    "ml26_epoch_shuffle" ->
      """WITH b AS (SELECT doc_id, UNNEST([0, 1]) AS epoch FROM documents),
         k AS (SELECT doc_id, CAST(epoch AS INT) AS epoch,
                      MD5(CAST(epoch AS VARCHAR) || ':'
                          || CAST(doc_id AS VARCHAR)) AS key
               FROM b)
         SELECT epoch, doc_id,
                CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                  ORDER BY key ASC, doc_id ASC) AS BIGINT) AS position
         FROM k""",

    // target-trained LM (LEFT joins exercise the add-1 floor on unseen
    // grams) next to the self-trained t28 stack; delta of the two
    // rounded scores
    "t42_domain_lm_delta" ->
      """WITH tAll AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                       FROM documents),
         tTr AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                 FROM documents WHERE lang = 'en'),
         trbg AS (SELECT UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                         k -> toks[k] || ' ' || toks[k+1])) AS bg
                  FROM tTr WHERE LEN(toks) >= 2),
         cbt AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cbg FROM trbg GROUP BY 1),
         truni AS (SELECT UNNEST(toks) AS tok FROM tTr),
         cut AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM truni GROUP BY 1),
         vt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM cut),
         sbg AS (SELECT doc_id,
                        UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                          k -> toks[k] || ' ' || toks[k+1])) AS bg
                 FROM tAll WHERE LEN(toks) >= 2),
         sm AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS m
                FROM sbg GROUP BY 1, 2),
         mdlt AS (SELECT cbt.bg,
                         CAST(ROUND(LN((cbt.cbg + 1.0) / (cut.cu + vt.v))
                                    * 1e12, 0) AS BIGINT) AS lpq
                  FROM cbt JOIN cut ON cut.tok = SPLIT_PART(cbt.bg, ' ', 1)
                  CROSS JOIN vt),
         prevt AS (SELECT cut.tok,
                          CAST(ROUND(LN(1.0 / (cut.cu + vt.v)) * 1e12, 0)
                            AS BIGINT) AS ppq
                   FROM cut CROSS JOIN vt),
         baset AS (SELECT CAST(ROUND(LN(1.0 / vt.v) * 1e12, 0) AS BIGINT) AS bq
                   FROM vt),
         sct AS (SELECT sm.doc_id, CAST(SUM(sm.m) AS BIGINT) AS nb,
                        SUM(CAST(sm.m AS HUGEINT)
                            * COALESCE(mdlt.lpq, prevt.ppq, baset.bq)) AS llq
                 FROM sm
                 LEFT JOIN mdlt USING (bg)
                 LEFT JOIN prevt ON prevt.tok = SPLIT_PART(sm.bg, ' ', 1)
                 CROSS JOIN baset
                 GROUP BY 1),
         tgt AS (SELECT d.doc_id, CAST(COALESCE(sct.nb, 0) AS BIGINT)
                          AS n_bigrams,
                        ROUND(CAST(sct.llq AS DOUBLE) / 1e12 / sct.nb, 6) + 0.0
                          AS lp_target
                 FROM documents d LEFT JOIN sct ON d.doc_id = sct.doc_id),
         cb AS (SELECT bg, CAST(SUM(m) AS BIGINT) AS cbg FROM sm GROUP BY 1),
         uni AS (SELECT UNNEST(toks) AS tok FROM tAll),
         cu AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu FROM uni GROUP BY 1),
         v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM cu),
         mdlc AS (SELECT cb.bg,
                         CAST(ROUND(LN((cb.cbg + 1.0) / (cu.cu + v.v)) * 1e12,
                                    0) AS BIGINT) AS lpq
                  FROM cb JOIN cu ON cu.tok = SPLIT_PART(cb.bg, ' ', 1)
                  CROSS JOIN v),
         scf AS (SELECT sm.doc_id,
                        SUM(CAST(sm.m AS HUGEINT) * mdlc.lpq) AS llq,
                        CAST(SUM(sm.m) AS BIGINT) AS nb
                 FROM sm JOIN mdlc USING (bg)
                 GROUP BY 1),
         slf AS (SELECT d.doc_id,
                        ROUND(CAST(scf.llq AS DOUBLE) / 1e12 / scf.nb, 6) + 0.0
                          AS lp_corpus
                 FROM documents d LEFT JOIN scf ON d.doc_id = scf.doc_id)
         SELECT tgt.doc_id, tgt.n_bigrams, tgt.lp_target, slf.lp_corpus,
                ROUND(tgt.lp_target - slf.lp_corpus, 6) + 0.0 AS delta
         FROM tgt JOIN slf ON slf.doc_id = tgt.doc_id""",

    // four exact integer cells, one fixed closing double sequence per
    // effect; any zero cell nulls the effects
    "a54_odds_ratio" ->
      """WITH r AS (SELECT CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS e,
                           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
                    FROM lineitem),
         cells AS (SELECT
             CAST(SUM(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
           FROM r),
         f AS (SELECT a, b, c, d,
                      CAST(a AS DOUBLE) AS ad, CAST(b AS DOUBLE) AS bd,
                      CAST(c AS DOUBLE) AS cd, CAST(d AS DOUBLE) AS dd
               FROM cells),
         g AS (SELECT a, b, c, d,
                      a > 0 AND b > 0 AND c > 0 AND d > 0 AS ok,
                      LN(ad * dd / (bd * cd)) AS lnor,
                      SQRT(1.0 / ad + 1.0 / bd + 1.0 / cd + 1.0 / dd) AS seor,
                      LN((ad / (ad + bd)) / (cd / (cd + dd))) AS lnrr,
                      SQRT(bd / (ad * (ad + bd)) + dd / (cd * (cd + dd))) AS serr
               FROM f)
         SELECT a, b, c, d,
                CASE WHEN ok THEN ROUND(EXP(lnor), 6) + 0.0 END AS odds_ratio,
                CASE WHEN ok THEN ROUND(EXP(lnor - 1.96 * seor), 6) + 0.0 END AS or_lo,
                CASE WHEN ok THEN ROUND(EXP(lnor + 1.96 * seor), 6) + 0.0 END AS or_hi,
                CASE WHEN ok THEN ROUND(EXP(lnrr), 6) + 0.0 END AS risk_ratio,
                CASE WHEN ok THEN ROUND(EXP(lnrr - 1.96 * serr), 6) + 0.0 END AS rr_lo,
                CASE WHEN ok THEN ROUND(EXP(lnrr + 1.96 * serr), 6) + 0.0 END AS rr_hi
         FROM g""",

    // clipped n-gram matches per (cand, ref) via gram equi-joins; BLEU-2
    // with the standard brevity penalty, no smoothing — a zero modified
    // precision zeroes the score
    "t47_bleu" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         p AS (SELECT a.doc_id AS cand_id, b.doc_id AS ref_id
               FROM documents a JOIN documents b
                 ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0
                    AND a.lang = b.lang),
         g1 AS (SELECT doc_id, tok AS gram, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM (SELECT doc_id, UNNEST(toks) AS tok FROM t) GROUP BY 1, 2),
         g2 AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM (SELECT doc_id,
                             UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                               k -> toks[k] || ' ' || toks[k+1])) AS gram
                      FROM t WHERE LEN(toks) >= 2) GROUP BY 1, 2),
         l AS (SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS len FROM t),
         o1 AS (SELECT p.cand_id, p.ref_id,
                       CAST(SUM(LEAST(c.cnt, r.cnt)) AS BIGINT) AS m
                FROM p JOIN g1 c ON c.doc_id = p.cand_id
                       JOIN g1 r ON r.doc_id = p.ref_id AND r.gram = c.gram
                GROUP BY 1, 2),
         o2 AS (SELECT p.cand_id, p.ref_id,
                       CAST(SUM(LEAST(c.cnt, r.cnt)) AS BIGINT) AS m
                FROM p JOIN g2 c ON c.doc_id = p.cand_id
                       JOIN g2 r ON r.doc_id = p.ref_id AND r.gram = c.gram
                GROUP BY 1, 2),
         b AS (SELECT p.cand_id, p.ref_id,
                      CAST(COALESCE(o1.m, 0) AS BIGINT) AS m1,
                      CAST(COALESCE(o2.m, 0) AS BIGINT) AS m2,
                      lc.len AS len_c, lr.len AS len_r,
                      CASE WHEN lc.len >= lr.len THEN 1.0
                           ELSE EXP(1.0 - lr.len / CAST(lc.len AS DOUBLE))
                      END AS bpr
               FROM p JOIN l lc ON lc.doc_id = p.cand_id
                      JOIN l lr ON lr.doc_id = p.ref_id
                      LEFT JOIN o1 ON o1.cand_id = p.cand_id
                                  AND o1.ref_id = p.ref_id
                      LEFT JOIN o2 ON o2.cand_id = p.cand_id
                                  AND o2.ref_id = p.ref_id)
         SELECT cand_id, ref_id, m1, m2, len_c, len_r,
                ROUND(bpr, 6) + 0.0 AS bp,
                CASE WHEN m1 = 0 OR m2 = 0 OR len_c < 2 THEN 0.0
                     ELSE ROUND(bpr * EXP((LN(m1 / CAST(len_c AS DOUBLE))
                       + LN(m2 / CAST(len_c - 1 AS DOUBLE))) / 2), 6)
                END + 0.0 AS bleu
         FROM b""",

    // ROUGE-2 recall/precision/F1 off the same clipped bigram matches
    "t48_rouge2" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         p AS (SELECT a.doc_id AS cand_id, b.doc_id AS ref_id
               FROM documents a JOIN documents b
                 ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0
                    AND a.lang = b.lang),
         g2 AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM (SELECT doc_id,
                             UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                               k -> toks[k] || ' ' || toks[k+1])) AS gram
                      FROM t WHERE LEN(toks) >= 2) GROUP BY 1, 2),
         l AS (SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS len FROM t),
         o2 AS (SELECT p.cand_id, p.ref_id,
                       CAST(SUM(LEAST(c.cnt, r.cnt)) AS BIGINT) AS m
                FROM p JOIN g2 c ON c.doc_id = p.cand_id
                       JOIN g2 r ON r.doc_id = p.ref_id AND r.gram = c.gram
                GROUP BY 1, 2),
         x AS (SELECT p.cand_id, p.ref_id, lc.len AS len_c, lr.len AS len_r,
                      CAST(COALESCE(o2.m, 0) AS BIGINT) AS m,
                      CASE WHEN lr.len >= 2
                           THEN COALESCE(o2.m, 0) / CAST(lr.len - 1 AS DOUBLE)
                           ELSE 0.0 END AS r,
                      CASE WHEN lc.len >= 2
                           THEN COALESCE(o2.m, 0) / CAST(lc.len - 1 AS DOUBLE)
                           ELSE 0.0 END AS pr
               FROM p JOIN l lc ON lc.doc_id = p.cand_id
                      JOIN l lr ON lr.doc_id = p.ref_id
                      LEFT JOIN o2 ON o2.cand_id = p.cand_id
                                  AND o2.ref_id = p.ref_id)
         SELECT cand_id, ref_id, len_c, len_r, m AS matches,
                ROUND(r, 6) + 0.0 AS rouge_r,
                ROUND(pr, 6) + 0.0 AS rouge_p,
                ROUND(CASE WHEN r + pr > 0 THEN 2 * r * pr / (r + pr)
                           ELSE 0.0 END, 6) + 0.0 AS rouge_f1
         FROM x""",

    // the same two modular cuts over the same whitespace tokenization;
    // DuckDB's inclusive 1-based list slices mirror Spark's slice(), and
    // CONCAT_WS keeps empty segments (skipping only NULLs) on both engines
    "ml27_fim_split" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         b AS (SELECT doc_id, toks, CAST(LEN(toks) AS BIGINT) AS n FROM t),
         hx AS (SELECT doc_id,
                       (STRPOS('0123456789abcdef', SUBSTR(m, 1, 1)) - 1) * 4096
                       + (STRPOS('0123456789abcdef', SUBSTR(m, 2, 1)) - 1) * 256
                       + (STRPOS('0123456789abcdef', SUBSTR(m, 3, 1)) - 1) * 16
                       + (STRPOS('0123456789abcdef', SUBSTR(m, 4, 1)) - 1) AS h1,
                       (STRPOS('0123456789abcdef', SUBSTR(m, 5, 1)) - 1) * 4096
                       + (STRPOS('0123456789abcdef', SUBSTR(m, 6, 1)) - 1) * 256
                       + (STRPOS('0123456789abcdef', SUBSTR(m, 7, 1)) - 1) * 16
                       + (STRPOS('0123456789abcdef', SUBSTR(m, 8, 1)) - 1) AS h2
                FROM (SELECT doc_id, MD5(CAST(doc_id AS VARCHAR)) AS m FROM t)),
         c AS (SELECT b.doc_id, toks, n,
                      CASE WHEN n > 1 THEN hx.h1 % (n - 1) + 1
                           ELSE 0 END AS cut1, hx.h2
               FROM b JOIN hx ON hx.doc_id = b.doc_id),
         c2 AS (SELECT doc_id, toks, n, cut1,
                       cut1 + h2 % (n - cut1 + 1) AS cut2
                FROM c),
         seg AS (SELECT doc_id, n, cut1, cut2,
                        COALESCE(ARRAY_TO_STRING(toks[1:cut1], ' '), '') AS pfx,
                        COALESCE(ARRAY_TO_STRING(toks[cut1 + 1:cut2], ' '), '') AS mid,
                        COALESCE(ARRAY_TO_STRING(toks[cut2 + 1:n], ' '), '') AS sfx
                 FROM c2)
         SELECT doc_id, n AS n_tokens,
                CAST(cut1 AS BIGINT) AS cut1, CAST(cut2 AS BIGINT) AS cut2,
                pfx AS prefix, mid AS middle, sfx AS suffix,
                CONCAT_WS(' ', '<SUF>', sfx, '<PRE>', pfx, '<MID>', mid) AS fim
         FROM seg""",

    // char n-gram clipped matches over whitespace-stripped text; P/R are
    // macro-averages over n = 1..3 (empty-n contributes 0), F-β with β=2
    // — the same fixed IEEE sequence as the engine's per-row close
    "t49_chrf" ->
      """WITH ch AS (SELECT doc_id, REGEXP_REPLACE(text, '\s+', '', 'g') AS cs
                     FROM documents),
         p AS (SELECT a.doc_id AS cand_id, b.doc_id AS ref_id
               FROM documents a JOIN documents b
                 ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0
                    AND a.lang = b.lang),
         g AS (SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
                 SELECT doc_id, 1 AS n,
                        UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(cs)),
                          i -> cs[i:i])) AS gram
                 FROM ch WHERE LEN(cs) >= 1
                 UNION ALL
                 SELECT doc_id, 2,
                        UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(cs) - 1),
                          i -> cs[i:i+1]))
                 FROM ch WHERE LEN(cs) >= 2
                 UNION ALL
                 SELECT doc_id, 3,
                        UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(cs) - 2),
                          i -> cs[i:i+2]))
                 FROM ch WHERE LEN(cs) >= 3) GROUP BY 1, 2, 3),
         o AS (SELECT p.cand_id, p.ref_id, c.n,
                      CAST(SUM(LEAST(c.cnt, r.cnt)) AS BIGINT) AS m
               FROM p JOIN g c ON c.doc_id = p.cand_id
                      JOIN g r ON r.doc_id = p.ref_id AND r.n = c.n
                                  AND r.gram = c.gram
               GROUP BY 1, 2, 3),
         l AS (SELECT doc_id, CAST(LEN(cs) AS BIGINT) AS len FROM ch),
         m AS (SELECT p.cand_id, p.ref_id, lc.len AS len_c, lr.len AS len_r,
                      COALESCE(MAX(CASE WHEN o.n = 1 THEN o.m END), 0) AS m1,
                      COALESCE(MAX(CASE WHEN o.n = 2 THEN o.m END), 0) AS m2,
                      COALESCE(MAX(CASE WHEN o.n = 3 THEN o.m END), 0) AS m3
               FROM p JOIN l lc ON lc.doc_id = p.cand_id
                      JOIN l lr ON lr.doc_id = p.ref_id
                      LEFT JOIN o ON o.cand_id = p.cand_id
                                 AND o.ref_id = p.ref_id
               GROUP BY 1, 2, 3, 4),
         x AS (SELECT cand_id, ref_id, len_c, len_r,
                      (CASE WHEN len_c >= 1 THEN m1 / CAST(len_c AS DOUBLE) ELSE 0.0 END
                     + CASE WHEN len_c >= 2 THEN m2 / CAST(len_c - 1 AS DOUBLE) ELSE 0.0 END
                     + CASE WHEN len_c >= 3 THEN m3 / CAST(len_c - 2 AS DOUBLE) ELSE 0.0 END) / 3 AS pp,
                      (CASE WHEN len_r >= 1 THEN m1 / CAST(len_r AS DOUBLE) ELSE 0.0 END
                     + CASE WHEN len_r >= 2 THEN m2 / CAST(len_r - 1 AS DOUBLE) ELSE 0.0 END
                     + CASE WHEN len_r >= 3 THEN m3 / CAST(len_r - 2 AS DOUBLE) ELSE 0.0 END) / 3 AS rr
               FROM m)
         SELECT cand_id, ref_id, len_c, len_r,
                ROUND(pp, 6) + 0.0 AS chrf_p,
                ROUND(rr, 6) + 0.0 AS chrf_r,
                ROUND(CASE WHEN pp + rr > 0.0
                           THEN (5.0 * pp * rr) / (4.0 * pp + rr)
                           ELSE 0.0 END, 6) + 0.0 AS chrf
         FROM x""",

    // the v07 exact/approx ranked lists with rank kept; grades k-r+1 off
    // the exact list, per-position DCG terms ROUND(x*1e12) BIGINTs (the
    // engine's pico pinning), IDCG directly off the exact frame
    "v20_rank_eval" ->
      """WITH e AS (SELECT vec_id, label,
                           LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         exact AS (
           SELECT query_id, neighbor_id, rn FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                      ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                        / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6)
                        DESC, c.vec_id ASC) AS rn
             FROM (SELECT * FROM e WHERE vec_id < 8) q
             CROSS JOIN e c WHERE c.vec_id <> q.vec_id) WHERE rn <= 3),
         approx AS (
           SELECT query_id, neighbor_id, rn FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                      ROUND(LIST_DOT_PRODUCT(q.v, c.v)
                        / (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6)
                        DESC, c.vec_id ASC) AS rn
             FROM (SELECT * FROM e WHERE vec_id < 8) q
             JOIN e c ON q.label = c.label AND c.vec_id <> q.vec_id) WHERE rn <= 3),
         kq AS (SELECT query_id, CAST(MAX(rn) AS BIGINT) AS k
                FROM exact GROUP BY 1),
         idcg AS (SELECT x.query_id,
                         SUM(CAST(ROUND((kq.k - x.rn + 1)
                           / LOG2(CAST(x.rn AS DOUBLE) + 1.0) * 1e12, 0) AS BIGINT)) AS idcg
                  FROM exact x JOIN kq USING (query_id) GROUP BY 1),
         g AS (SELECT a.query_id, a.rn AS ar,
                      CASE WHEN x.rn IS NOT NULL THEN kq.k - x.rn + 1
                           ELSE 0 END AS rel
               FROM approx a JOIN kq USING (query_id)
                    LEFT JOIN exact x ON x.query_id = a.query_id
                                     AND x.neighbor_id = a.neighbor_id),
         pq AS (SELECT query_id,
                       SUM(CASE WHEN rel > 0
                                THEN CAST(ROUND(rel / LOG2(CAST(ar AS DOUBLE) + 1.0) * 1e12, 0) AS BIGINT)
                                ELSE 0 END) AS dcg,
                       MIN(CASE WHEN rel > 0 THEN ar END) AS fhr,
                       COUNT(CASE WHEN rel > 0 THEN 1 END) AS n_hits
                FROM g GROUP BY 1)
         SELECT kq.query_id, kq.k,
                CAST(COALESCE(pq.n_hits, 0) AS BIGINT) AS n_hits,
                CAST(pq.fhr AS BIGINT) AS first_hit_rank,
                ROUND(CASE WHEN pq.fhr IS NOT NULL
                           THEN CAST(1.0 AS DOUBLE) / pq.fhr
                           ELSE 0.0 END, 6) + 0.0 AS mrr,
                ROUND(COALESCE(pq.dcg, 0) / CAST(idcg.idcg AS DOUBLE), 6) + 0.0 AS ndcg
         FROM kq JOIN idcg USING (query_id) LEFT JOIN pq USING (query_id)""",

    // the same match construction, then Hunter's MM iteration UNROLLED 4×:
    // pico-pinned pair denominators, micro-pinned normalizer, 6dp + 1e-6
    // floor per round — each pN is a pure function of pN-1, as the engine
    "ml28_bradley_terry" ->
      """WITH t AS (SELECT doc_id, source,
                CAST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(text), '\s+'))) AS BIGINT) AS score
             FROM documents WHERE text IS NOT NULL),
         mm AS (SELECT CASE WHEN b.score > a.score THEN b.source ELSE a.source END AS w,
                       CASE WHEN b.score > a.score THEN a.source ELSE b.source END AS l
                FROM t a JOIN t b
                  ON b.doc_id = a.doc_id + 1 AND a.source <> b.source),
         wi AS (SELECT w AS item, CAST(COUNT(*) AS BIGINT) AS wins
                FROM mm GROUP BY 1),
         dirs AS (SELECT w AS i, l AS j FROM mm
                  UNION ALL SELECT l, w FROM mm),
         nij AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n
                 FROM dirs GROUP BY 1, 2),
         nm AS (SELECT i AS item, CAST(SUM(n) AS BIGINT) AS n_matches
                FROM nij GROUP BY 1),
         base AS (SELECT nm.item, CAST(COALESCE(wi.wins, 0) AS BIGINT) AS wins,
                         nm.n_matches
                  FROM nm LEFT JOIN wi USING (item)),
         p0 AS (SELECT item, CAST(1.0 AS DOUBLE) AS p FROM base),
         d1 AS (SELECT nij.i AS item,
                       SUM(CAST(nij.n AS HUGEINT)
                         * CAST(ROUND(1e12 / (pi.p + pj.p), 0) AS HUGEINT)) AS den
                FROM nij JOIN p0 pi ON pi.item = nij.i
                         JOIN p0 pj ON pj.item = nij.j GROUP BY 1),
         q1 AS (SELECT base.item,
                       CAST(ROUND(base.wins * 1e12 / CAST(d1.den AS DOUBLE) * 1e6, 0) AS BIGINT) AS q
                FROM base JOIN d1 USING (item)),
         s1 AS (SELECT CAST(SUM(q) AS BIGINT) AS tot FROM q1),
         p1 AS (SELECT item, GREATEST(ROUND(q / CAST(tot AS DOUBLE), 6), 1e-6) AS p
                FROM q1 CROSS JOIN s1),
         d2 AS (SELECT nij.i AS item,
                       SUM(CAST(nij.n AS HUGEINT)
                         * CAST(ROUND(1e12 / (pi.p + pj.p), 0) AS HUGEINT)) AS den
                FROM nij JOIN p1 pi ON pi.item = nij.i
                         JOIN p1 pj ON pj.item = nij.j GROUP BY 1),
         q2 AS (SELECT base.item,
                       CAST(ROUND(base.wins * 1e12 / CAST(d2.den AS DOUBLE) * 1e6, 0) AS BIGINT) AS q
                FROM base JOIN d2 USING (item)),
         s2 AS (SELECT CAST(SUM(q) AS BIGINT) AS tot FROM q2),
         p2 AS (SELECT item, GREATEST(ROUND(q / CAST(tot AS DOUBLE), 6), 1e-6) AS p
                FROM q2 CROSS JOIN s2),
         d3 AS (SELECT nij.i AS item,
                       SUM(CAST(nij.n AS HUGEINT)
                         * CAST(ROUND(1e12 / (pi.p + pj.p), 0) AS HUGEINT)) AS den
                FROM nij JOIN p2 pi ON pi.item = nij.i
                         JOIN p2 pj ON pj.item = nij.j GROUP BY 1),
         q3 AS (SELECT base.item,
                       CAST(ROUND(base.wins * 1e12 / CAST(d3.den AS DOUBLE) * 1e6, 0) AS BIGINT) AS q
                FROM base JOIN d3 USING (item)),
         s3 AS (SELECT CAST(SUM(q) AS BIGINT) AS tot FROM q3),
         p3 AS (SELECT item, GREATEST(ROUND(q / CAST(tot AS DOUBLE), 6), 1e-6) AS p
                FROM q3 CROSS JOIN s3),
         d4 AS (SELECT nij.i AS item,
                       SUM(CAST(nij.n AS HUGEINT)
                         * CAST(ROUND(1e12 / (pi.p + pj.p), 0) AS HUGEINT)) AS den
                FROM nij JOIN p3 pi ON pi.item = nij.i
                         JOIN p3 pj ON pj.item = nij.j GROUP BY 1),
         q4 AS (SELECT base.item,
                       CAST(ROUND(base.wins * 1e12 / CAST(d4.den AS DOUBLE) * 1e6, 0) AS BIGINT) AS q
                FROM base JOIN d4 USING (item)),
         s4 AS (SELECT CAST(SUM(q) AS BIGINT) AS tot FROM q4),
         p4 AS (SELECT item, GREATEST(ROUND(q / CAST(tot AS DOUBLE), 6), 1e-6) AS p
                FROM q4 CROSS JOIN s4)
         SELECT base.item, base.wins, base.n_matches, p4.p + 0.0 AS strength
         FROM base JOIN p4 USING (item)""",

    // micro-quantized lanes (the dq17 explode), exact HUGEINT centroid
    // sums rounded to the micro grid, exact integer squared distances via
    // a lane equi-join, integer mins, pico-pinned per-row silhouette
    "v21_silhouette" ->
      """WITH q AS (SELECT vec_id, label,
                CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1 AS lane,
                CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1e6, 0) AS BIGINT) AS qq
             FROM embeddings WHERE embedding IS NOT NULL),
         cent AS (SELECT label AS ccl, lane,
                         CAST(ROUND(CAST(SUM(CAST(qq AS HUGEINT)) AS DOUBLE)
                           / CAST(COUNT(*) AS DOUBLE), 0) AS BIGINT) AS cq
                  FROM q GROUP BY 1, 2),
         d2 AS (SELECT q.vec_id, q.label, c.ccl,
                       SUM(CAST(q.qq - c.cq AS HUGEINT) * (q.qq - c.cq)) AS dd
                FROM q JOIN cent c ON c.lane = q.lane
                GROUP BY 1, 2, 3),
         ab AS (SELECT vec_id, label,
                       MIN(CASE WHEN label = ccl THEN dd END) AS a2,
                       MIN(CASE WHEN label <> ccl THEN dd END) AS b2
                FROM d2 GROUP BY 1, 2),
         s AS (SELECT label, a2, b2,
                      SQRT(CAST(a2 AS DOUBLE)) AS a,
                      SQRT(CAST(b2 AS DOUBLE)) AS b
               FROM ab),
         sp AS (SELECT label,
                       CASE WHEN b2 IS NULL THEN CAST(0 AS BIGINT)
                            WHEN GREATEST(a, b) > 0
                              THEN CAST(ROUND((b - a) / GREATEST(a, b) * 1e12, 0) AS BIGINT)
                            ELSE CAST(0 AS BIGINT) END AS spico
                FROM s)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
                ROUND(CAST(SUM(spico) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  / 1e12, 6) + 0.0 AS mean_silhouette
         FROM sp GROUP BY 1""",

    // exact order statistic on the even-id calibration slice: the k-th
    // smallest score with k = ceil((n+1)(1-α)) in exact integer ceil; the
    // odd-id slice's coverage is two integer counts and one division
    "a55_conformal" ->
      """WITH b AS (SELECT CAST(value AS DOUBLE) AS s, event_id,
                           event_id % 2 = 0 AS c
                    FROM events WHERE value IS NOT NULL),
         cal AS (SELECT s, event_id FROM b WHERE c),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
                      CAST(((COUNT(*) + 1) * 900000 + 999999) // 1000000 AS BIGINT) AS k
               FROM cal),
         r AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s ASC, event_id ASC) AS rn
               FROM cal),
         tau AS (SELECT r.s AS tau FROM r CROSS JOIN n WHERE r.rn = n.k),
         t AS (SELECT s FROM b WHERE NOT c)
         SELECT n.n_cal, n.k,
                (SELECT tau FROM tau) + 0.0 AS tau,
                CAST(COUNT(*) AS BIGINT) AS n_test,
                CAST(SUM(CASE WHEN (SELECT tau FROM tau) IS NULL
                               OR s <= (SELECT tau FROM tau)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
                ROUND(CAST(SUM(CASE WHEN (SELECT tau FROM tau) IS NULL
                                     OR s <= (SELECT tau FROM tau)
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
         FROM t CROSS JOIN n GROUP BY 1, 2""",

    // the same exact integer ceil and order statistic, PARTITIONED by
    // event_type; groups present in both slices close with an inner join
    "a56_group_conformal" ->
      """WITH b AS (SELECT event_type AS grp, CAST(value AS DOUBLE) AS s,
                           event_id, event_id % 2 = 0 AS c
                    FROM events WHERE value IS NOT NULL),
         cal AS (SELECT * FROM b WHERE c),
         st AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_cal,
                       CAST(((COUNT(*) + 1) * 900000 + 999999) // 1000000 AS BIGINT) AS k
                FROM cal GROUP BY 1),
         r AS (SELECT grp, s,
                      ROW_NUMBER() OVER (PARTITION BY grp
                        ORDER BY s ASC, event_id ASC) AS rn
               FROM cal),
         tau AS (SELECT r.grp, r.s AS tau
                 FROM r JOIN st USING (grp) WHERE r.rn = st.k),
         t AS (SELECT grp, s FROM b WHERE NOT c),
         cov AS (SELECT t.grp, CAST(COUNT(*) AS BIGINT) AS n_test,
                        CAST(SUM(CASE WHEN tau.tau IS NULL OR t.s <= tau.tau
                                      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
                        MAX(tau.tau) + 0.0 AS tau
                 FROM t LEFT JOIN tau ON tau.grp = t.grp GROUP BY 1)
         SELECT st.grp AS event_type, st.n_cal, st.k, cov.tau,
                cov.n_test, cov.n_covered,
                ROUND(CAST(cov.n_covered AS DOUBLE)
                  / CAST(cov.n_test AS DOUBLE), 6) AS coverage
         FROM st JOIN cov USING (grp)""",

    // v21's micro-lane/centroid CTEs, own-cluster distances only; exact
    // HUGEINT sums/max into one division and one sqrt per output cell
    "v22_quant_distortion" ->
      """WITH q AS (SELECT vec_id, label,
                CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1 AS lane,
                CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1e6, 0) AS BIGINT) AS qq
             FROM embeddings WHERE embedding IS NOT NULL),
         cent AS (SELECT label AS ccl, lane,
                         CAST(ROUND(CAST(SUM(CAST(qq AS HUGEINT)) AS DOUBLE)
                           / CAST(COUNT(*) AS DOUBLE), 0) AS BIGINT) AS cq
                  FROM q GROUP BY 1, 2),
         d2 AS (SELECT q.vec_id, q.label,
                       SUM(CAST(q.qq - c.cq AS HUGEINT) * (q.qq - c.cq)) AS dd
                FROM q JOIN cent c ON c.lane = q.lane AND c.ccl = q.label
                GROUP BY 1, 2)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
                ROUND(CAST(SUM(dd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  / 1e12, 6) + 0.0 AS mean_d2,
                ROUND(SQRT(CAST(SUM(dd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                  / 1e6, 6) + 0.0 AS rms_dist,
                ROUND(SQRT(CAST(MAX(dd) AS DOUBLE)) / 1e6, 6) + 0.0 AS max_dist
         FROM d2 GROUP BY 1""",

    // 1-based subscripts off the same token array; edge windows clip via
    // GREATEST/LEAST slicing, empty slices coalesce to '' as in Spark
    "t50_kwic" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         h AS (SELECT doc_id, toks, CAST(LEN(toks) AS BIGINT) AS n,
                      CAST(generate_subscripts(toks, 1) AS BIGINT) AS i,
                      UNNEST(toks) AS tok
               FROM t)
         SELECT doc_id, i - 1 AS pos,
                COALESCE(ARRAY_TO_STRING(toks[GREATEST(i - 3, 1):i - 1], ' '), '')
                  AS left_ctx,
                tok AS term,
                COALESCE(ARRAY_TO_STRING(toks[i + 1:LEAST(i + 3, n)], ' '), '')
                  AS right_ctx
         FROM h WHERE tok = 'spark'""",

    // d22's island CTEs, then a positional anti-exists against the merged
    // intervals; survivors re-aggregate in token order
    "d24_span_scrub" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         tk AS (SELECT doc_id, toks, LEN(toks) AS n FROM t),
         gh AS (SELECT doc_id, toks, pos,
                       MD5(ARRAY_TO_STRING(toks[pos + 1 : pos + 5], ' ')) AS h
                FROM (SELECT doc_id, toks, n,
                             UNNEST(GENERATE_SERIES(0, CAST(n - 5 AS INT))) AS pos
                      FROM tk WHERE n >= 5)),
         dup AS (SELECT h FROM gh GROUP BY h HAVING COUNT(*) >= 2),
         cand AS (SELECT gh.doc_id, gh.pos,
                         toks[gh.pos + 1 : gh.pos + 64] AS sfx
                  FROM gh JOIN dup USING (h)),
         rk AS (SELECT doc_id, pos, sfx,
                       ROW_NUMBER() OVER (ORDER BY ARRAY_TO_STRING(sfx, ' '),
                                          doc_id, pos) AS rn
                FROM cand),
         nx AS (SELECT a.rn,
                       CAST(COALESCE(
                         LIST_MIN(LIST_FILTER(
                           GENERATE_SERIES(1, GREATEST(LEN(a.sfx), LEN(b.sfx))),
                           i -> NOT COALESCE(a.sfx[i] = b.sfx[i], FALSE))) - 1,
                         LEAST(LEN(a.sfx), LEN(b.sfx))) AS BIGINT) AS lcpn
                FROM rk a JOIN rk b ON b.rn = a.rn + 1),
         sp AS (SELECT r.doc_id, r.pos,
                       GREATEST(COALESCE(n1.lcpn, 0), COALESCE(n0.lcpn, 0))
                         AS len
                FROM rk r
                LEFT JOIN nx n1 ON n1.rn = r.rn
                LEFT JOIN nx n0 ON n0.rn = r.rn - 1
                WHERE GREATEST(COALESCE(n1.lcpn, 0), COALESCE(n0.lcpn, 0)) >= 5),
         il AS (SELECT doc_id, pos, len,
                       MAX(pos + len) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         AS rmax
                FROM sp),
         ili AS (SELECT doc_id, pos, len,
                        SUM(CASE WHEN rmax IS NULL OR pos >= rmax
                                 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY doc_id ORDER BY pos) AS isl
                 FROM il),
         pis AS (SELECT doc_id, isl, MIN(pos) AS s, MAX(pos + len) AS e
                 FROM ili GROUP BY 1, 2),
         posn AS (SELECT doc_id, toks,
                         UNNEST(GENERATE_SERIES(0, CAST(n - 1 AS INT))) AS p
                  FROM tk WHERE n >= 1),
         kept AS (SELECT posn.doc_id, posn.p, posn.toks[posn.p + 1] AS tok
                  FROM posn
                  WHERE NOT EXISTS (SELECT 1 FROM pis i
                                    WHERE i.doc_id = posn.doc_id
                                      AND posn.p >= i.s AND posn.p < i.e))
         SELECT tk.doc_id, CAST(tk.n AS BIGINT) AS n_toks,
                CAST(COUNT(k.p) AS BIGINT) AS n_kept,
                COALESCE(STRING_AGG(k.tok, ' ' ORDER BY k.p), '') AS scrubbed
         FROM tk LEFT JOIN kept k USING (doc_id)
         GROUP BY tk.doc_id, tk.n""",

    // d24's scrub restricted to NON-representative cluster members: the
    // d25 recursive closure picks each cluster's min doc id, which keeps
    // its text; pis2 = islands of everyone else
    "d26_span_scrub_keepone" ->
      """WITH RECURSIVE
         t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
               FROM documents),
         tk AS (SELECT doc_id, toks, LEN(toks) AS n FROM t),
         gh AS MATERIALIZED (SELECT doc_id, toks, pos,
                       MD5(ARRAY_TO_STRING(toks[pos + 1 : pos + 5], ' ')) AS h
                FROM (SELECT doc_id, toks, n,
                             UNNEST(GENERATE_SERIES(0, CAST(n - 5 AS INT))) AS pos
                      FROM tk WHERE n >= 5)),
         dup AS (SELECT h FROM gh GROUP BY h HAVING COUNT(*) >= 2),
         cand AS MATERIALIZED (SELECT gh.doc_id, gh.pos,
                         toks[gh.pos + 1 : gh.pos + 64] AS sfx
                  FROM gh JOIN dup USING (h)),
         rk AS MATERIALIZED (SELECT doc_id, pos, sfx,
                       ROW_NUMBER() OVER (ORDER BY ARRAY_TO_STRING(sfx, ' '),
                                          doc_id, pos) AS rn
                FROM cand),
         nxd AS MATERIALIZED (SELECT a.rn, a.doc_id AS da, b.doc_id AS db,
                        CAST(COALESCE(
                          LIST_MIN(LIST_FILTER(
                            GENERATE_SERIES(1, GREATEST(LEN(a.sfx), LEN(b.sfx))),
                            i -> NOT COALESCE(a.sfx[i] = b.sfx[i], FALSE))) - 1,
                          LEAST(LEN(a.sfx), LEN(b.sfx))) AS BIGINT) AS lcpn
                 FROM rk a JOIN rk b ON b.rn = a.rn + 1),
         sp AS (SELECT r.doc_id, r.pos,
                       GREATEST(COALESCE(n1.lcpn, 0), COALESCE(n0.lcpn, 0))
                         AS len
                FROM rk r
                LEFT JOIN nxd n1 ON n1.rn = r.rn
                LEFT JOIN nxd n0 ON n0.rn = r.rn - 1
                WHERE GREATEST(COALESCE(n1.lcpn, 0), COALESCE(n0.lcpn, 0)) >= 5),
         il AS (SELECT doc_id, pos, len,
                       MAX(pos + len) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         AS rmax
                FROM sp),
         ili AS (SELECT doc_id, pos, len,
                        SUM(CASE WHEN rmax IS NULL OR pos >= rmax
                                 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY doc_id ORDER BY pos) AS isl
                 FROM il),
         pis AS MATERIALIZED (SELECT doc_id, isl, MIN(pos) AS s, MAX(pos + len) AS e
                 FROM ili GROUP BY 1, 2),
         pr AS MATERIALIZED (SELECT LEAST(da, db) AS doc_a, GREATEST(da, db) AS doc_b
                FROM nxd WHERE lcpn >= 5 AND da <> db
                GROUP BY 1, 2),
         und AS (SELECT doc_a AS a, doc_b AS b FROM pr
                 UNION SELECT doc_b, doc_a FROM pr),
         reach AS (SELECT a, b FROM und
                   UNION
                   SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         cc AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canon
                FROM reach GROUP BY a),
         nonrep AS (SELECT doc_id FROM cc WHERE doc_id <> canon),
         pis2 AS (SELECT pis.* FROM pis JOIN nonrep USING (doc_id)),
         posn AS (SELECT doc_id, toks,
                         UNNEST(GENERATE_SERIES(0, CAST(n - 1 AS INT))) AS p
                  FROM tk WHERE n >= 1),
         kept AS (SELECT posn.doc_id, posn.p, posn.toks[posn.p + 1] AS tok
                  FROM posn
                  WHERE NOT EXISTS (SELECT 1 FROM pis2 i
                                    WHERE i.doc_id = posn.doc_id
                                      AND posn.p >= i.s AND posn.p < i.e))
         SELECT tk.doc_id, CAST(tk.n AS BIGINT) AS n_toks,
                CAST(COUNT(k.p) AS BIGINT) AS n_kept,
                tk.doc_id NOT IN (SELECT DISTINCT doc_id FROM pis2)
                  AS kept_intact,
                COALESCE(STRING_AGG(k.tok, ' ' ORDER BY k.p), '') AS scrubbed
         FROM tk LEFT JOIN kept k USING (doc_id)
         GROUP BY tk.doc_id, tk.n""",

    // the d25 closure with a train/eval set tag (eval = doc_id % 37 = 0):
    // per eval doc, train members of its span cluster + per-cluster max
    // span; left join keeps clean eval docs with contaminated = FALSE
    "d27_span_decontaminate" ->
      """WITH RECURSIVE
         t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
               FROM documents),
         tk AS (SELECT doc_id, toks, LEN(toks) AS n FROM t),
         gh AS MATERIALIZED (SELECT doc_id, toks, pos,
                       MD5(ARRAY_TO_STRING(toks[pos + 1 : pos + 5], ' ')) AS h
                FROM (SELECT doc_id, toks, n,
                             UNNEST(GENERATE_SERIES(0, CAST(n - 5 AS INT))) AS pos
                      FROM tk WHERE n >= 5)),
         dup AS (SELECT h FROM gh GROUP BY h HAVING COUNT(*) >= 2),
         cand AS MATERIALIZED (SELECT gh.doc_id, gh.pos,
                         toks[gh.pos + 1 : gh.pos + 64] AS sfx
                  FROM gh JOIN dup USING (h)),
         rk AS MATERIALIZED (SELECT doc_id, pos, sfx,
                       ROW_NUMBER() OVER (ORDER BY ARRAY_TO_STRING(sfx, ' '),
                                          doc_id, pos) AS rn
                FROM cand),
         nx AS MATERIALIZED (SELECT a.doc_id AS da, b.doc_id AS db,
                       CAST(COALESCE(
                         LIST_MIN(LIST_FILTER(
                           GENERATE_SERIES(1, GREATEST(LEN(a.sfx), LEN(b.sfx))),
                           i -> NOT COALESCE(a.sfx[i] = b.sfx[i], FALSE))) - 1,
                         LEAST(LEN(a.sfx), LEN(b.sfx))) AS BIGINT) AS lcpn
                FROM rk a JOIN rk b ON b.rn = a.rn + 1),
         pr AS MATERIALIZED (SELECT LEAST(da, db) AS doc_a,
                       GREATEST(da, db) AS doc_b,
                       CAST(MAX(lcpn) AS BIGINT) AS mss
                FROM nx WHERE lcpn >= 5 AND da <> db
                GROUP BY 1, 2),
         und AS (SELECT doc_a AS a, doc_b AS b FROM pr
                 UNION SELECT doc_b, doc_a FROM pr),
         reach AS (SELECT a, b FROM und
                   UNION
                   SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         cc AS MATERIALIZED (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canon
                FROM reach GROUP BY a),
         ctr AS (SELECT canon,
                        CAST(SUM(CASE WHEN doc_id % 37 <> 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS ntp
                 FROM cc GROUP BY 1),
         csp AS (SELECT c.canon, CAST(MAX(pr.mss) AS BIGINT) AS mss
                 FROM pr JOIN cc c ON c.doc_id = pr.doc_a GROUP BY 1),
         ce AS (SELECT m.doc_id, ctr.ntp, csp.mss
                FROM cc m
                JOIN ctr ON ctr.canon = m.canon
                JOIN csp ON csp.canon = m.canon
                WHERE m.doc_id % 37 = 0 AND ctr.ntp >= 1)
         SELECT e.doc_id,
                CAST(COALESCE(ce.ntp, 0) AS BIGINT) AS n_train_partners,
                CAST(COALESCE(ce.mss, 0) AS BIGINT) AS max_shared_span,
                ce.ntp IS NOT NULL AS contaminated
         FROM (SELECT doc_id FROM documents WHERE doc_id % 37 = 0) e
         LEFT JOIN ce USING (doc_id)""",

    // the d22+d24+d25+d26 family joined per doc over ONE shared CTE chain
    // (suffix rank → islands → pairs → recursive closure), mirroring the
    // Spark side's shared SpanProfile — the composed hash gates the
    // member interactions, not just each member alone
    "e2e_span_family" ->
      """WITH RECURSIVE
         t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
               FROM documents),
         tk AS MATERIALIZED (SELECT doc_id, toks, LEN(toks) AS n FROM t),
         gh AS MATERIALIZED (SELECT doc_id, toks, pos,
                       MD5(ARRAY_TO_STRING(toks[pos + 1 : pos + 5], ' ')) AS h
                FROM (SELECT doc_id, toks, n,
                             UNNEST(GENERATE_SERIES(0, CAST(n - 5 AS INT))) AS pos
                      FROM tk WHERE n >= 5)),
         dup AS (SELECT h FROM gh GROUP BY h HAVING COUNT(*) >= 2),
         cand AS MATERIALIZED (SELECT gh.doc_id, gh.pos,
                         toks[gh.pos + 1 : gh.pos + 64] AS sfx
                  FROM gh JOIN dup USING (h)),
         rk AS MATERIALIZED (SELECT doc_id, pos, sfx,
                       ROW_NUMBER() OVER (ORDER BY ARRAY_TO_STRING(sfx, ' '),
                                          doc_id, pos) AS rn
                FROM cand),
         nxd AS MATERIALIZED (SELECT a.rn, a.doc_id AS da, b.doc_id AS db,
                        CAST(COALESCE(
                          LIST_MIN(LIST_FILTER(
                            GENERATE_SERIES(1, GREATEST(LEN(a.sfx), LEN(b.sfx))),
                            i -> NOT COALESCE(a.sfx[i] = b.sfx[i], FALSE))) - 1,
                          LEAST(LEN(a.sfx), LEN(b.sfx))) AS BIGINT) AS lcpn
                 FROM rk a JOIN rk b ON b.rn = a.rn + 1),
         sp AS (SELECT r.doc_id, r.pos,
                       GREATEST(COALESCE(n1.lcpn, 0), COALESCE(n0.lcpn, 0))
                         AS len
                FROM rk r
                LEFT JOIN nxd n1 ON n1.rn = r.rn
                LEFT JOIN nxd n0 ON n0.rn = r.rn - 1
                WHERE GREATEST(COALESCE(n1.lcpn, 0), COALESCE(n0.lcpn, 0)) >= 5),
         il AS (SELECT doc_id, pos, len,
                       MAX(pos + len) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         AS rmax
                FROM sp),
         ili AS (SELECT doc_id, pos, len,
                        SUM(CASE WHEN rmax IS NULL OR pos >= rmax
                                 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY doc_id ORDER BY pos) AS isl
                 FROM il),
         pis AS MATERIALIZED (SELECT doc_id, isl, MIN(pos) AS s,
                        MAX(pos + len) AS e
                 FROM ili GROUP BY 1, 2),
         pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
                       CAST(MAX(e - s) AS BIGINT) AS max_span,
                       CAST(SUM(e - s) AS BIGINT) AS covered
                FROM pis GROUP BY 1),
         pr AS MATERIALIZED (SELECT LEAST(da, db) AS doc_a,
                       GREATEST(da, db) AS doc_b
                FROM nxd WHERE lcpn >= 5 AND da <> db
                GROUP BY 1, 2),
         und AS (SELECT doc_a AS a, doc_b AS b FROM pr
                 UNION SELECT doc_b, doc_a FROM pr),
         reach AS (SELECT a, b FROM und
                   UNION
                   SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         cc AS MATERIALIZED (SELECT a AS doc_id, LEAST(a, MIN(b)) AS canon
                FROM reach GROUP BY a),
         cs AS (SELECT canon, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM cc GROUP BY 1),
         nonrep AS (SELECT doc_id FROM cc WHERE doc_id <> canon),
         pis2 AS MATERIALIZED (SELECT pis.* FROM pis JOIN nonrep USING (doc_id)),
         posn AS (SELECT doc_id,
                         UNNEST(GENERATE_SERIES(0, CAST(n - 1 AS INT))) AS p
                  FROM tk WHERE n >= 1),
         k1 AS (SELECT posn.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept
                FROM posn
                WHERE NOT EXISTS (SELECT 1 FROM pis i
                                  WHERE i.doc_id = posn.doc_id
                                    AND posn.p >= i.s AND posn.p < i.e)
                GROUP BY 1),
         k2 AS (SELECT posn.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept
                FROM posn
                WHERE NOT EXISTS (SELECT 1 FROM pis2 i
                                  WHERE i.doc_id = posn.doc_id
                                    AND posn.p >= i.s AND posn.p < i.e)
                GROUP BY 1)
         SELECT tk.doc_id, CAST(tk.n AS INT) AS n_toks,
                COALESCE(pd.n_spans, 0) AS n_spans,
                COALESCE(pd.max_span, 0) AS max_span,
                COALESCE(pd.covered, 0) AS covered_tokens,
                COALESCE(k1.n_kept, 0) AS n_kept_scrub,
                COALESCE(k2.n_kept, 0) AS n_kept_keepone,
                tk.doc_id NOT IN (SELECT DISTINCT doc_id FROM pis2)
                  AS kept_intact,
                CAST(COALESCE(cc.canon, tk.doc_id) AS BIGINT) AS cluster_id,
                COALESCE(cs.cluster_size, 1) AS cluster_size
         FROM tk LEFT JOIN pd USING (doc_id)
         LEFT JOIN k1 USING (doc_id)
         LEFT JOIN k2 USING (doc_id)
         LEFT JOIN cc ON cc.doc_id = tk.doc_id
         LEFT JOIN cs ON cs.canon = cc.canon""",

    // t47 ⋈ t48 ⋈ t49 stitched over shared CTEs (the bigram clipped
    // matches feed both BLEU and ROUGE) — every close identical to the
    // standalone oracles so the joined report hashes the same cells
    "e2e_eval_report" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
                    FROM documents),
         p AS (SELECT a.doc_id AS cand_id, b.doc_id AS ref_id
               FROM documents a JOIN documents b
                 ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0
                    AND a.lang = b.lang),
         g1 AS (SELECT doc_id, tok AS gram, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM (SELECT doc_id, UNNEST(toks) AS tok FROM t) GROUP BY 1, 2),
         g2 AS (SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM (SELECT doc_id,
                             UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                               k -> toks[k] || ' ' || toks[k+1])) AS gram
                      FROM t WHERE LEN(toks) >= 2) GROUP BY 1, 2),
         l AS (SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS len FROM t),
         o1 AS (SELECT p.cand_id, p.ref_id,
                       CAST(SUM(LEAST(c.cnt, r.cnt)) AS BIGINT) AS m
                FROM p JOIN g1 c ON c.doc_id = p.cand_id
                       JOIN g1 r ON r.doc_id = p.ref_id AND r.gram = c.gram
                GROUP BY 1, 2),
         o2 AS (SELECT p.cand_id, p.ref_id,
                       CAST(SUM(LEAST(c.cnt, r.cnt)) AS BIGINT) AS m
                FROM p JOIN g2 c ON c.doc_id = p.cand_id
                       JOIN g2 r ON r.doc_id = p.ref_id AND r.gram = c.gram
                GROUP BY 1, 2),
         bb AS (SELECT p.cand_id, p.ref_id,
                       CAST(COALESCE(o1.m, 0) AS BIGINT) AS m1,
                       CAST(COALESCE(o2.m, 0) AS BIGINT) AS m2,
                       lc.len AS len_c, lr.len AS len_r,
                       CASE WHEN lc.len >= lr.len THEN 1.0
                            ELSE EXP(1.0 - lr.len / CAST(lc.len AS DOUBLE))
                       END AS bpr
                FROM p JOIN l lc ON lc.doc_id = p.cand_id
                       JOIN l lr ON lr.doc_id = p.ref_id
                       LEFT JOIN o1 ON o1.cand_id = p.cand_id
                                   AND o1.ref_id = p.ref_id
                       LEFT JOIN o2 ON o2.cand_id = p.cand_id
                                   AND o2.ref_id = p.ref_id),
         bleu AS (SELECT cand_id, ref_id, len_c, len_r,
                         ROUND(bpr, 6) + 0.0 AS bp,
                         CASE WHEN m1 = 0 OR m2 = 0 OR len_c < 2 THEN 0.0
                              ELSE ROUND(bpr * EXP((LN(m1 / CAST(len_c AS DOUBLE))
                                + LN(m2 / CAST(len_c - 1 AS DOUBLE))) / 2), 6)
                         END + 0.0 AS bleu
                  FROM bb),
         rouge AS (SELECT cand_id, ref_id,
                          ROUND(r, 6) + 0.0 AS rouge_r,
                          ROUND(pr, 6) + 0.0 AS rouge_p,
                          ROUND(CASE WHEN r + pr > 0 THEN 2 * r * pr / (r + pr)
                                     ELSE 0.0 END, 6) + 0.0 AS rouge_f1
                   FROM (SELECT bb.cand_id, bb.ref_id,
                                CASE WHEN bb.len_r >= 2
                                     THEN bb.m2 / CAST(bb.len_r - 1 AS DOUBLE)
                                     ELSE 0.0 END AS r,
                                CASE WHEN bb.len_c >= 2
                                     THEN bb.m2 / CAST(bb.len_c - 1 AS DOUBLE)
                                     ELSE 0.0 END AS pr
                         FROM bb)),
         ch AS (SELECT doc_id, REGEXP_REPLACE(text, '\s+', '', 'g') AS cs
                FROM documents),
         cg AS (SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
                  SELECT doc_id, 1 AS n,
                         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(cs)),
                           i -> cs[i:i])) AS gram
                  FROM ch WHERE LEN(cs) >= 1
                  UNION ALL
                  SELECT doc_id, 2,
                         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(cs) - 1),
                           i -> cs[i:i+1]))
                  FROM ch WHERE LEN(cs) >= 2
                  UNION ALL
                  SELECT doc_id, 3,
                         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(cs) - 2),
                           i -> cs[i:i+2]))
                  FROM ch WHERE LEN(cs) >= 3) GROUP BY 1, 2, 3),
         co AS (SELECT p.cand_id, p.ref_id, c.n,
                       CAST(SUM(LEAST(c.cnt, r.cnt)) AS BIGINT) AS m
                FROM p JOIN cg c ON c.doc_id = p.cand_id
                       JOIN cg r ON r.doc_id = p.ref_id AND r.n = c.n
                                   AND r.gram = c.gram
                GROUP BY 1, 2, 3),
         cl AS (SELECT doc_id, CAST(LEN(cs) AS BIGINT) AS len FROM ch),
         cm AS (SELECT p.cand_id, p.ref_id, lc.len AS clen_c, lr.len AS clen_r,
                       COALESCE(MAX(CASE WHEN co.n = 1 THEN co.m END), 0) AS m1,
                       COALESCE(MAX(CASE WHEN co.n = 2 THEN co.m END), 0) AS m2,
                       COALESCE(MAX(CASE WHEN co.n = 3 THEN co.m END), 0) AS m3
                FROM p JOIN cl lc ON lc.doc_id = p.cand_id
                       JOIN cl lr ON lr.doc_id = p.ref_id
                       LEFT JOIN co ON co.cand_id = p.cand_id
                                   AND co.ref_id = p.ref_id
                GROUP BY 1, 2, 3, 4),
         cx AS (SELECT cand_id, ref_id,
                       (CASE WHEN clen_c >= 1 THEN m1 / CAST(clen_c AS DOUBLE) ELSE 0.0 END
                      + CASE WHEN clen_c >= 2 THEN m2 / CAST(clen_c - 1 AS DOUBLE) ELSE 0.0 END
                      + CASE WHEN clen_c >= 3 THEN m3 / CAST(clen_c - 2 AS DOUBLE) ELSE 0.0 END) / 3 AS pp,
                       (CASE WHEN clen_r >= 1 THEN m1 / CAST(clen_r AS DOUBLE) ELSE 0.0 END
                      + CASE WHEN clen_r >= 2 THEN m2 / CAST(clen_r - 1 AS DOUBLE) ELSE 0.0 END
                      + CASE WHEN clen_r >= 3 THEN m3 / CAST(clen_r - 2 AS DOUBLE) ELSE 0.0 END) / 3 AS rr
                FROM cm),
         chrf AS (SELECT cand_id, ref_id,
                         ROUND(pp, 6) + 0.0 AS chrf_p,
                         ROUND(rr, 6) + 0.0 AS chrf_r,
                         ROUND(CASE WHEN pp + rr > 0.0
                                    THEN (5.0 * pp * rr) / (4.0 * pp + rr)
                                    ELSE 0.0 END, 6) + 0.0 AS chrf
                  FROM cx)
         SELECT bleu.cand_id, bleu.ref_id, bleu.len_c, bleu.len_r,
                bleu.bp, bleu.bleu,
                rouge.rouge_r, rouge.rouge_p, rouge.rouge_f1,
                chrf.chrf_p, chrf.chrf_r, chrf.chrf
         FROM bleu JOIN rouge USING (cand_id, ref_id)
                   JOIN chrf USING (cand_id, ref_id)"""
  )
}
