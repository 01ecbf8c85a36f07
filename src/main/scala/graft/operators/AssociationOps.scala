package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical association measures — the feature-selection screen for a
  * training-data pipeline: "does this categorical column carry signal
  * about that one, and how much?" (χ² independence, Cramér's V effect
  * size, mutual information in nats).
  *
  * One hash aggregation collapses N rows to the contingency cells; every
  * measure is then arithmetic over that bounded frame. The marginals and
  * the grand total ride as broadcast sides (cells × categories, both
  * bounded by category cardinality — the bounded-scalar-side pattern of
  * `t20_pmi_bigrams`), so the full-data cost is exactly one shuffle on
  * the (a, b) cell key regardless of scale.
  */
object AssociationOps {

  /** χ², Cramér's V and mutual information between two categorical
    * columns, as ONE output row
    * `(n, r, c, chi2, cramers_v, mutual_info)`.
    *
    * Determinism: cell/marginal counts are exact integers; each cell's χ²
    * and MI contribution is correctly rounded to integer nanos/picos and
    * summed as BIGINT (the `GraphOps.pageRank` fixed-point argument), so
    * the per-cell float work is order-independent and engine-exact. MI is
    * natural-log, `Σ (n_ab/N)·ln(n_ab·N / (n_a·n_b))`; χ² is
    * `Σ (n_ab − e_ab)²/e_ab` with `e_ab = n_a·n_b/N`;
    * `V = √(χ² / (N·(min(r,c)−1)))`, 0 when either column is constant.
    */
  def categoricalAssociation(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.select(a.as("__a"), b.as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__nab"))
    val rowTot = cells.groupBy("__a").agg(sum("__nab").as("__na"))
    val colTot = cells.groupBy("__b").agg(sum("__nab").as("__nb"))
    val grand = cells.agg(sum("__nab").as("__N"),
      count_distinct(col("__a")).as("r"), count_distinct(col("__b")).as("c"))

    // χ² sums over ALL r×c cells — an (a, b) combination that never
    // co-occurs still contributes (0 − e)²/e — so the contingency table
    // is densified from the marginals' cross product (bounded by category
    // cardinalities, the whole premise of a categorical screen) before
    // the observed counts are attached. MI's empty cells contribute the
    // exact limit 0·ln 0 = 0 and are pinned there explicitly.
    rowTot.crossJoin(broadcast(colTot))
      .join(broadcast(cells), Seq("__a", "__b"), "left")
      .withColumn("__nab", coalesce(col("__nab"), lit(0L)))
      .crossJoin(broadcast(grand))
      .withColumn("__e", col("__na") * col("__nb") / col("__N"))
      // χ² cell term in integer nanos, MI cell term in integer picos
      .withColumn("__chifp",
        round((col("__nab") - col("__e")) * (col("__nab") - col("__e")) /
          col("__e") * 1e9, 0).cast("long"))
      .withColumn("__mifp",
        when(col("__nab") === 0, lit(0L)).otherwise(
          round(col("__nab") / col("__N") *
            log(col("__nab") * col("__N") / (col("__na") * col("__nb"))) *
            1e12, 0).cast("long")))
      .groupBy(col("__N").as("n"), col("r"), col("c"))
      .agg(
        round(sum(col("__chifp")) / 1e9, 6).as("chi2"),
        round(when(least(col("r"), col("c")) > 1,
          sqrt(sum(col("__chifp")) / 1e9 /
            (col("__N") * (least(col("r"), col("c")) - 1))))
          .otherwise(0.0), 6).as("cramers_v"),
        round(sum(col("__mifp")) / 1e12, 6).as("mutual_info"))
  }

  /** Information-gain feature screen: entropy decomposition of a 0/1-ish
    * `target` against MANY categorical features in ONE melted aggregate
    * pass — the ranking a feature-selection stage runs before encoding
    * (`categoricalAssociation` is the one-pair deep dive; this is the
    * wide screen). Output one row per feature:
    * `(feature, h_target, h_cond, info_gain, gain_ratio)` where
    * `info_gain = H(target) − H(target|feature)` and
    * `gain_ratio = info_gain / H(feature)` (Quinlan's split-info
    * normalization; null when the feature is constant).
    *
    * Scale shape: the melt multiplies rows by |features| BEFORE one hash
    * aggregate to (feature, value, target) cells — counts combine
    * map-side, so the shuffle carries cells, not rows. Everything after
    * is arithmetic over the bounded cell frame with 1-row broadcast
    * totals. Determinism: every entropy term is correctly rounded to
    * integer picos and summed as BIGINT (same argument as
    * `categoricalAssociation`), so cross-engine hashes match.
    */
  def infoGainScreen(df: DataFrame, features: Seq[(String, Column)],
      target: Column): DataFrame = {
    require(features.nonEmpty, "infoGainScreen: need at least one feature")
    val kv = features.flatMap { case (n, c) =>
      Seq(lit(n), coalesce(c.cast("string"), lit("\u0000null"))) }
    val melted = df.select(explode(map(kv: _*)).as(Seq("feature", "fval")),
      target.cast("string").as("__y"))
    val cells = melted.groupBy("feature", "fval", "__y")
      .agg(count(lit(1)).as("__nfy"))
    val fv = cells.groupBy("feature", "fval").agg(sum("__nfy").as("__nf"))
    val n = df.agg(count(lit(1)).cast("double").as("__N"))
    // H(target): from the target marginal alone — identical for every
    // feature, computed once and broadcast
    val hy = df.select(target.cast("string").as("__y"))
      .groupBy("__y").agg(count(lit(1)).as("__ny"))
      .crossJoin(broadcast(n))
      .agg((sum(round(-(col("__ny") / col("__N")) *
        log(col("__ny") / col("__N")) * 1e12, 0).cast("long")) / 1e12)
        .as("__hy"))
    val condTerms = cells.join(fv, Seq("feature", "fval"))
      .crossJoin(broadcast(n))
      .groupBy("feature")
      .agg(
        // H(target|feature) = −Σ_{c,y} (n_cy/N)·ln(n_cy/n_c)
        (sum(round(-(col("__nfy") / col("__N")) *
          log(col("__nfy") / col("__nf")) * 1e12, 0).cast("long")) / 1e12)
          .as("__hcond"))
    val splitInfo = fv.crossJoin(broadcast(n))
      .groupBy("feature")
      .agg((sum(round(-(col("__nf") / col("__N")) *
        log(col("__nf") / col("__N")) * 1e12, 0).cast("long")) / 1e12)
        .as("__hf"))
    condTerms.join(splitInfo, Seq("feature"))
      .crossJoin(broadcast(hy))
      .select(col("feature"),
        round(col("__hy"), 6).as("h_target"),
        round(col("__hcond"), 6).as("h_cond"),
        round(col("__hy") - col("__hcond"), 6).as("info_gain"),
        when(col("__hf") > 0,
          round((col("__hy") - col("__hcond")) / col("__hf"), 6))
          .as("gain_ratio"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * columns over a shared label domain (annotator consistency, or
    * model-vs-heuristic labeler agreement in a labeling pipeline).
    *
    * κ = (pₒ − pₑ)/(1 − pₑ) with pₒ = Σ_k n_kk/N and pₑ = Σ_k n_a·n_b/N².
    * Cleared of denominators, κ = (N·Σ n_kk − Σ n_a·n_b)/(N² − Σ n_a·n_b)
    * — every operand an exact integer (DECIMAL(38,0)), so the output is a
    * single correctly-rounded division, engine- and partition-exact.
    * Degenerate case pₑ = 1 (both raters constant on the same label) → κ
    * null.
    *
    * Scale: one hash aggregate to the r×c cell frame, marginals from the
    * cells (bounded by category cardinalities), the diagonal from an
    * equi-join of the two marginal frames on the shared label.
    */
  def cohensKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.select(a.cast("string").as("__a"), b.cast("string").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy("__a", "__b").agg(count(lit(1)).as("__nab"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val agree = cells.agg(
      sum(when(col("__a") === col("__b"), col("__nab")).otherwise(0L)).as("__diag"),
      sum(col("__nab")).as("__N"))
    val pe = cells.groupBy(col("__a").as("__k")).agg(sum("__nab").as("__na"))
      .join(cells.groupBy(col("__b").as("__k")).agg(sum("__nab").as("__nb")),
        Seq("__k"))
      .agg(coalesce(sum(dec(col("__na")) * col("__nb")), lit(0L).cast("decimal(38,0)"))
        .as("__sab"))
    agree.crossJoin(broadcast(pe))
      .select(
        col("__N").as("n"),
        round(col("__diag").cast("double") / col("__N"), 6).as("p_obs"),
        round(col("__sab").cast("double") / (dec(col("__N")) * col("__N"))
          .cast("double"), 6).as("p_exp"),
        when(dec(col("__N")) * col("__N") =!= col("__sab"),
          round((dec(col("__N")) * col("__diag") - col("__sab")).cast("double") /
            (dec(col("__N")) * col("__N") - col("__sab")).cast("double"), 6))
          .as("kappa"))
  }

  /** Fleiss' kappa — [[cohensKappa]] generalized to r ≥ 2 raters per
    * item: per-item agreement P_i = (Σ_j n_ij² − r)/(r(r−1)), chance
    * agreement P_e = Σ_j p_j² from the category marginals.
    *
    * Input is the LONG frame (item, category) with exactly one row per
    * (item, rater) vote; r is the fixed rater count. Two hash
    * aggregates: (item, category) counts → per-item Σn², then a global
    * sum; category marginals ride the same cell frame. All sufficient
    * statistics are exact integers (DECIMAL(38,0) products cleared of
    * denominators), closing κ is one rounded division — null when
    * P_e = 1 (all votes one category).
    */
  def fleissKappa(votes: DataFrame, item: Column, category: Column,
      raters: Int): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val r = lit(raters.toLong)
    val cells = votes.select(item.as("__i"), category.cast("string").as("__c"))
      .groupBy("__i", "__c").agg(count(lit(1)).as("__nij"))
    // Σ_items Σ_j n_ij² and the item count, in one pass over the cells
    val agree = cells.agg(
      sum(dec(col("__nij")) * col("__nij")).as("__ss"),
      count_distinct(col("__i")).as("__N"))
    val marg = cells.groupBy("__c").agg(sum(col("__nij")).as("__nj"))
      .agg(sum(dec(col("__nj")) * col("__nj")).as("__sm"))
    // P̄ = (Σn² − N·r) / (N·r·(r−1)); P_e = Σn_j² / (N·r)²
    agree.crossJoin(broadcast(marg))
      .select(
        col("__N").as("n_items"),
        round((col("__ss") - dec(col("__N")) * r).cast("double") /
          (dec(col("__N")) * r * (r - 1)).cast("double"), 6).as("p_bar"),
        round(col("__sm").cast("double") /
          (dec(col("__N")) * r * col("__N") * r).cast("double"), 6).as("p_exp"),
        when(dec(col("__N")) * r * dec(col("__N")) * r =!= col("__sm"),
          round(
            ((col("__ss") - dec(col("__N")) * r).cast("double") /
              (dec(col("__N")) * r * (r - 1)).cast("double") -
              col("__sm").cast("double") /
                (dec(col("__N")) * r * col("__N") * r).cast("double")) /
              (lit(1.0) - col("__sm").cast("double") /
                (dec(col("__N")) * r * col("__N") * r).cast("double")),
            6)).as("kappa"))
  }

  /** Cochran-Armitage trend test — "does the positive rate rise with the
    * ordered dose/exposure level?" (the epidemiology staple the reference's
    * per-cohort χ² can't answer: χ² ignores group ORDER). With integer
    * scores w and 0/1 outcome y the whole test is FIVE row-level integer
    * sums in one map-side-combined aggregate — no per-group frame at all:
    *   N, R = Σy, A = Σw·y, B = Σw, C = Σw²
    *   z = (N·A − B·R)·√N / √(R·(N−R)·(N·C − B²))
    * (the classic T = A − B·R/N and Var(T) = p(1−p)(C − B²/N) cleared of
    * denominators). Sums ride DECIMAL(38,0) so they are exact and
    * merge-order-free at any scale; the closing expression is three
    * correctly-rounded double ops mirrored by the oracle. Degenerate
    * inputs (R ∈ {0, N} or zero score variance) yield a null z.
    */
  def cochranArmitage(df: DataFrame, score: Column, outcome: Column): DataFrame = {
    val w = score.cast("long")
    val y = outcome.cast("long")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    df.select(w.as("__w"), y.as("__y"))
      .filter(col("__w").isNotNull && col("__y").isNotNull)
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("r"),
        sum(d38(col("__w") * col("__y"))).as("__a"),
        sum(d38(col("__w"))).as("__b"),
        sum(d38(col("__w") * col("__w"))).as("__c"))
      .select(col("n"), col("r"),
        when(col("r") > 0 && col("r") < col("n") &&
          d38(col("n")) * col("__c") - col("__b") * col("__b") > 0,
          round(
            (d38(col("n")) * col("__a") - col("__b") * col("r"))
              .cast("double") * sqrt(col("n").cast("double")) /
              sqrt((d38(col("r")) * (col("n") - col("r")) *
                (d38(col("n")) * col("__c") - col("__b") * col("__b")))
                .cast("double")),
            6)).as("z"))
  }

  /** Per-entity exact sign test with Benjamini–Hochberg FDR control
    * across the entity family — the multiple-testing correction a monitor
    * fleet needs when it runs one trend test per tracked series and
    * "0.05 × 10 000 series" would drown it in false alarms.
    *
    * Per entity: order by `ord`, count strictly positive (`pos`) and
    * negative (`neg`) successive deltas (zeros dropped, the classic sign
    * test), m = pos+neg, and the two-sided p-value is the EXACT dyadic
    * rational min(1, 2·Σ_{k≤min(pos,neg)} C(m,k) / 2^m). The binomial
    * tail is summed from a driver-built Pascal triangle of DECIMAL(38,0)
    * (≤ (maxM+1)(maxM+2)/2 rows — bounded by CONFIG, not data, and
    * broadcast), so p is bit-portable: both engines convert the same
    * exact integers with one correctly-rounded cast each and perform one
    * IEEE division. No erf, no libm, no cross-engine transcendentals.
    *
    * BH step-up across the family: rank p ascending (two-phase
    * distributed rank — no single-partition window), find the largest
    * rank r with p_(r) ≤ r·q/M, flag ranks ≤ r. The only global
    * aggregates are the 1-row family size and the 1-row r — the bounded
    * broadcast pattern. Entities with m > `maxM` are dropped up front
    * (the `mannKendallTrend` maxSeries discipline); m = 0 (constant or
    * single-point series) yields p = 1 exactly via the C(0,0) row.
    */
  def signTestBH(df: DataFrame, key: String, ord: Column, value: Column,
      q: Double = 0.05, maxM: Int = 120): DataFrame = {
    require(maxM <= 120,
      s"signTestBH: maxM=$maxM > 120 would overflow DECIMAL(38,0) binomials")
    val spark = df.sparkSession
    val binomRows = {
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      var row = Vector(BigInt(1))
      for (m <- 0 to maxM) {
        for (k <- 0 to m)
          buf += org.apache.spark.sql.Row(m.toLong, k.toLong,
            new java.math.BigDecimal(row(k).bigInteger))
        row = (BigInt(0) +: row).zip(row :+ BigInt(0))
          .map { case (x, y) => x + y }
      }
      buf.toSeq
    }
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val binom = spark.createDataFrame(binomRows.asJava,
      StructType(Seq(StructField("__m", LongType),
        StructField("__k", LongType), StructField("__c", DecimalType(38, 0)))))
    val pow2 = spark.createDataFrame(
      (0 to maxM).map(m => org.apache.spark.sql.Row(m.toLong,
        new java.math.BigDecimal(BigInt(2).pow(m).bigInteger))).asJava,
      StructType(Seq(StructField("__m2", LongType),
        StructField("__p2", DecimalType(38, 0)))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("__o"))
    val deltas = df.select(col(key), ord.as("__o"),
        value.cast("long").as("__v"))
      .withColumn("__d", col("__v") - lag(col("__v"), 1).over(w))
    val counts = deltas.groupBy(col(key))
      .agg(sum(when(col("__d") > 0, 1L).otherwise(0L)).as("pos"),
        sum(when(col("__d") < 0, 1L).otherwise(0L)).as("neg"))
      .withColumn("m", col("pos") + col("neg"))
      .filter(col("m") <= maxM)
      .withColumn("__kmin", least(col("pos"), col("neg")))
    val tail = counts.join(broadcast(binom),
        col("m") === col("__m") && col("__k") <= col("__kmin"))
      .groupBy(col(key), col("m"), col("pos"), col("neg"))
      .agg(sum(col("__c")).as("__a"))
    val withP = tail.join(broadcast(pow2), col("m") === col("__m2"))
      .withColumn("__num", least(col("__a") * 2, col("__p2")))
      .withColumn("__pd",
        col("__num").cast("double") / col("__p2").cast("double"))
      .select(col(key), col("m"), col("pos"), col("neg"), col("__pd"))
    val ranked = RankOps.globalRowNumber(withP,
      Seq(col("__pd").asc, col(key).asc), "rank")
    val withM = ranked.crossJoin(
      broadcast(ranked.agg(count(lit(1)).as("__M"))))
    val rmax = withM.agg(max(when(
        col("__pd") <= (col("rank").cast("double") * lit(q)) /
          col("__M").cast("double"),
        col("rank")).otherwise(0L)).as("__rmax"))
    withM.crossJoin(broadcast(rmax))
      .select(col(key), col("m"), col("pos"), col("neg"),
        round(col("__pd"), 6).as("p"), col("rank"),
        when(col("rank") <= col("__rmax"), 1).otherwise(0).cast("int")
          .as("flagged"))
  }

  /** Pooled two-proportion z-test — the A/B-test primitive ("did cohort
    * A convert at a different rate than cohort B"):
    *   z = (p₁ − p₂) / √( p̂(1−p̂) · (1/n₁ + 1/n₂) ),  p̂ = (x₁+x₂)/(n₁+n₂).
    * One full-scan conditional aggregate to a single row of four exact
    * integer counts; the closing assembly is a fixed sequence of
    * correctly-rounded IEEE ops mirrored op-for-op by the oracle.
    * Degenerate pools (p̂ = 0 or 1, or an empty cohort) yield null z.
    * Rows where `inA` is null are excluded (they belong to neither
    * cohort — don't let when().otherwise() silently fold them into B).
    */
  def twoProportionZ(df: DataFrame, inA: Column, success: Column)
      : DataFrame = {
    val counts = df.filter(inA.isNotNull)
      .agg(
        sum(when(inA, 1L).otherwise(0L)).as("n1"),
        sum(when(inA && success, 1L).otherwise(0L)).as("x1"),
        sum(when(!inA, 1L).otherwise(0L)).as("n2"),
        sum(when(!inA && success, 1L).otherwise(0L)).as("x2"))
    val p1 = col("x1").cast("double") / col("n1").cast("double")
    val p2 = col("x2").cast("double") / col("n2").cast("double")
    val pp = (col("x1") + col("x2")).cast("double") /
      (col("n1") + col("n2")).cast("double")
    val rad = (pp * (lit(1.0) - pp)) *
      (lit(1.0) / col("n1").cast("double") +
        lit(1.0) / col("n2").cast("double"))
    // when() keeps the divisions lazy, so an empty cohort yields null
    // instead of an ANSI divide-by-zero error
    counts.select(col("n1"), col("x1"), col("n2"), col("x2"),
      when(col("n1") > 0, round(p1, 6)).as("p1"),
      when(col("n2") > 0, round(p2, 6)).as("p2"),
      when(col("n1") > 0 && col("n2") > 0 &&
          col("x1") + col("x2") > 0 &&
          col("x1") + col("x2") < col("n1") + col("n2"),
        round((p1 - p2) / sqrt(rad), 6)).as("z"))
  }

  /** 2×2 effect sizes — odds ratio and risk ratio with Wald 95% CIs, the
    * epidemiology/A-B-test summary row: OR = ad/bc,
    * RR = (a/(a+b))/(c/(c+d)), CI = exp(ln·effect ± 1.96·SE) with the
    * standard SE√(Σ 1/cell) (OR) and √(b/(a(a+b)) + d/(c(c+d))) (RR).
    * One conditional-aggregate pass to four exact integer cells; every
    * float is one fixed closing sequence; any empty margin or zero cell
    * nulls the affected effect rather than dividing by zero.
    */
  def twoByTwoEffects(df: DataFrame, exposure: Column,
      outcome: Column): DataFrame = {
    val e = exposure.cast("int")
    val y = outcome.cast("int")
    val cells = df.agg(
      sum(when(e === 1 && y === 1, 1L).otherwise(0L)).as("a"),
      sum(when(e === 1 && y === 0, 1L).otherwise(0L)).as("b"),
      sum(when(e === 0 && y === 1, 1L).otherwise(0L)).as("c"),
      sum(when(e === 0 && y === 0, 1L).otherwise(0L)).as("d"))
    val (a, b, c, d) = (col("a").cast("double"), col("b").cast("double"),
      col("c").cast("double"), col("d").cast("double"))
    val allPos = col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0
    val lnOr = log(a * d / (b * c))
    val seOr = sqrt(lit(1.0) / a + lit(1.0) / b + lit(1.0) / c + lit(1.0) / d)
    val lnRr = log((a / (a + b)) / (c / (c + d)))
    val seRr = sqrt(b / (a * (a + b)) + d / (c * (c + d)))
    cells.select(col("a"), col("b"), col("c"), col("d"),
      when(allPos, round(exp(lnOr), 6)).as("odds_ratio"),
      when(allPos, round(exp(lnOr - lit(1.96) * seOr), 6)).as("or_lo"),
      when(allPos, round(exp(lnOr + lit(1.96) * seOr), 6)).as("or_hi"),
      when(allPos, round(exp(lnRr), 6)).as("risk_ratio"),
      when(allPos, round(exp(lnRr - lit(1.96) * seRr), 6)).as("rr_lo"),
      when(allPos, round(exp(lnRr + lit(1.96) * seRr), 6)).as("rr_hi"))
  }

  /** Jarque–Bera normality test per group: JB = n/6·(S² + K²/4) from the
    * sample skewness S and EXCESS kurtosis K — the one-pass "is this
    * column roughly Gaussian" screen run per segment before any
    * normality-assuming downstream stat.
    *
    * All four raw power sums over integer-quantized values accumulate
    * exactly in DECIMAL(38,0) (the `a40_welch_ttest` discipline — with
    * |q| ≤ 10⁶ the fourth power is ≤ 10²⁴, so ~10¹⁴ rows fit before 38
    * digits saturate); the central moments are one fixed closing double
    * sequence per group, replayed verbatim by the oracle. Groups with
    * zero variance surface null. One hash aggregate; no window, no sort.
    */
  def jarqueBera(df: DataFrame, group: Column, value: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val q = value.cast("long")
    // n counts exactly the rows the power sums see: count(q) skips
    // null values (sum already does), so the moments are never biased
    // by null-valued rows inflating the denominator
    val agg = df.groupBy(group.as("grp")).agg(
      count(q).as("n"),
      sum(dec(q)).as("__s1"),
      sum(dec(q) * q).as("__s2"),
      sum(dec(q) * q * q).as("__s3"),
      sum(dec(q) * q * q * q).as("__s4"))
    val n = col("n").cast("double")
    val mu = col("__s1").cast("double") / n
    val r2 = col("__s2").cast("double") / n
    val r3 = col("__s3").cast("double") / n
    val r4 = col("__s4").cast("double") / n
    val m2 = r2 - mu * mu
    val m3 = r3 - lit(3.0) * mu * r2 + lit(2.0) * mu * mu * mu
    val m4 = r4 - lit(4.0) * mu * r3 + lit(6.0) * mu * mu * r2 -
      lit(3.0) * mu * mu * mu * mu
    val skew = m3 / sqrt(m2 * m2 * m2)
    val exk = m4 / (m2 * m2) - lit(3.0)
    agg.select(col("grp"), col("n"),
      when(m2 > 0, round(skew, 6)).as("skewness"),
      when(m2 > 0, round(exk, 6)).as("ex_kurtosis"),
      when(m2 > 0,
        round(n / lit(6.0) * (skew * skew + exk * exk / lit(4.0)), 6))
        .as("jb"))
  }

  /** Brown–Forsythe homogeneity-of-variance test (the median-centered
    * Levene): one-way ANOVA F over z = |x − median_g| — the robust "can I
    * pool these segments' variances" gate.
    *
    * Exactness: group medians come from the exact type-7 rank machinery
    * ([[CleaningOps.groupQuantiles]]); over integer-quantized values the
    * type-7 median is always an integer or a half-integer, so
    * z₂ = |2x − 2·med| is an EXACT integer and the ANOVA sufficient
    * statistics (n_g, Σz₂, Σz₂²) accumulate exactly. The between/within
    * sums of squares close per group as one double each, correctly
    * rounded to integer units and summed in DECIMAL(38,0) — the
    * fixed-point contract — so the k-way float sum order is never
    * observable. F is scale-invariant, so the ×2 in z₂ cancels. Output:
    * one row (k, n, f_stat).
    */
  def brownForsythe(df: DataFrame, group: Column, value: Column): DataFrame = {
    val base = df.select(group.as("grp"), value.cast("long").as("__q"))
      .filter(col("__q").isNotNull)
    val med = CleaningOps.groupQuantiles(base, "grp", "__q", 0.5, 0.5)
      .select(col("grp"), round(col("q_lo") * 2, 0).cast("long").as("__m2"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val z2 = abs(col("__q") * 2 - col("__m2"))
    val perGroup = base.join(med, Seq("grp"))
      .groupBy("grp")
      .agg(count(lit(1)).as("__ng"),
        sum(dec(z2)).as("__sg"),
        sum(dec(z2) * z2).as("__qg"))
    // within-group term (Σz² − (Σz)²/n) and, against the grand mean,
    // the between term n·(μ_g − μ)² — each ONE double per group, pinned
    // to integer units before the exact cross-group sum
    val grand = perGroup.agg(
      count(lit(1)).as("k"),
      sum(col("__ng")).as("n"),
      sum(dec(col("__sg"))).as("__s"))
    val mu = col("__s").cast("double") / col("n").cast("double")
    val muG = col("__sg").cast("double") / col("__ng").cast("double")
    val joined = perGroup.crossJoin(broadcast(grand))
    val agg = joined.agg(
      max(col("k")).as("k"), max(col("n")).as("n"),
      sum(round(col("__qg").cast("double") -
        col("__sg").cast("double") * col("__sg").cast("double") /
          col("__ng").cast("double"), 0).cast("decimal(38,0)")).as("__ssw"),
      sum(round(col("__ng").cast("double") * (muG - mu) * (muG - mu), 0)
        .cast("decimal(38,0)")).as("__ssb"))
    agg.select(col("k"), col("n"),
      when(col("k") > 1 && col("__ssw") > 0,
        round((col("__ssb").cast("double") / (col("k") - 1).cast("double")) /
          (col("__ssw").cast("double") / (col("n") - col("k")).cast("double")),
          6)).as("f_stat"))
  }
}
