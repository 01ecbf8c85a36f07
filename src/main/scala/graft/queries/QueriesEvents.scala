package graft
package queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.Knn
import graft.dedup.DedupOps
import graft.functions.{TextFns, VectorFns}
import graft.multimodal.BinaryOps
import graft.operators._

import SparkEntry._

/** QueriesEvents registry — the `ts, q, g, pr`-prefixed SparkEntry queries and their oracle SQL
  * (event-series analytics, funnels, graphs). Split from SparkEntry.scala for hygiene; query ids and
  * bodies are unchanged, and SparkEntry merges every family registry
  * back into the single driver-contract maps.
  */
// scalastyle:off
private[graft] object QueriesEvents {

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](

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


    // group-relative quality gate: keep docs at/above their source's
    // median length — the per-domain curation threshold pattern
    "q03_domain_quantile_gate" -> ((s, d) =>
      CleaningOps.quantileGate(
          docs(s, d).select("doc_id", "source", "n_chars"),
          "source", "n_chars", 0.5)
        .select("doc_id", "source", "n_chars")),


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


    // weighted PageRank over the event-type flow graph, 3 unrolled
    // iterations — fixed-point contribution sums + 9dp trajectory pinning
    // make the whole trajectory engine- and partition-count-exact
    "pr01_pagerank" -> ((s, d) => {
      val edges = TimeSeriesOps.transitionCounts(ev(s, d), "user_id", "ts",
        "event_id", "event_type")
      GraphOps.pageRank(edges, "from_state", "to_state", "cnt",
        iters = 3, damping = 0.85)
    }),


    // CUSUM regime-change peaks per user — where (and how strongly) each
    // signal's level shifted; deviations formed in exact integer arithmetic
    // (v·n − Σv), so peak choice and tie-breaks are engine-exact
    "ts07_cusum" -> ((s, d) =>
      TimeSeriesOps.cusumPeaks(ev(s, d), "user_id", "ts", "event_id",
        col("value"))),


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


    // Holt double-exponential smoothing (α = β = ½) over each user's
    // daily counts — final (level, trend) + one-step forecast; the fold
    // runs in exact integer micros with pure-integer half-up rounding,
    // so the sequential recursion is engine-portable by construction
    "ts18_holt" -> ((s, d) =>
      TimeSeriesOps.holtSmooth(
        ev(s, d).groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt")),
        "user_id", col("day"), col("cnt"))),


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


    // degree assortativity of the strong part co-occurrence graph — do
    // hub parts co-purchase with hubs; exact integer Pearson over
    // symmetrized endpoint degrees
    "g05_assortativity" -> ((s, d) =>
      GraphOps.assortativity(partEdges(s, d).filter(col("cnt") >= 2),
        "src", "dst")),


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


    // classical decomposition per reading: hour-of-week seasonal
    // baseline + trailing-25-row exact-median trend + residual —
    // broadcast profile probe + one keyed sort, nothing else
    "ts12_decompose" -> ((s, d) =>
      TimeSeriesOps.seasonalDecompose(ev(s, d), "event_type", "ts",
        "event_id", col("value"), trendK = 25)),


    // lag-1..3 autocorrelation of each user's value stream (integer
    // cents ⇒ exact Pearson stats; stacked lags share one sorted window)
    "ts11_autocorr" -> ((s, d) =>
      TimeSeriesOps.autocorr(
        ev(s, d).select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100, 0).cast("long").as("__cents")),
        "user_id", "ts", "event_id", col("__cents"), maxLag = 3)),


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


    // directed-edge reciprocity of the event-type transition graph —
    // one semi-join of the distinct edge list against its transpose
    "g11_reciprocity" -> ((s, d) => {
      val edges = TimeSeriesOps.transitionCounts(ev(s, d), "user_id", "ts",
        "event_id", "event_type")
      GraphOps.reciprocity(edges, "from_state", "to_state")
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
    })
  )

  def oracles: Map[String, String] = Map(
    "g06_kcore" -> g06OracleSql,

    "g07_label_prop" -> g07OracleSql,


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


    "q03_domain_quantile_gate" ->
      """WITH b AS (SELECT source, QUANTILE_CONT(n_chars, 0.5) AS thr
                    FROM documents GROUP BY 1)
         SELECT doc_id, source, n_chars
         FROM documents JOIN b USING (source) WHERE n_chars >= thr""",


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
         FROM a WHERE ns > 0 AND n1 > 0"""
  )
}
