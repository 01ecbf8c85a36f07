package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form per-group statistics fitted entirely inside one hash
  * aggregate — the "trend per entity" questions (is this lab value rising?
  * is this customer's spend accelerating?) the reference answers by looping
  * sklearn over pandas groups (`ml_models.py` per-cohort fits). Here each
  * group's model is five integer sums, so a million groups fit in one
  * map-side-combined pass with no per-group Python round trip.
  */
object RegressionOps {

  /** Per-group simple OLS `y = a + b·x`: slope, intercept and R² from the
    * classic sufficient statistics
    *
    *   b = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * computed over INTEGER-valued `x` and `y` (callers quantize first —
    * e.g. days since epoch and price cents). With integer operands every
    * sum is exact (no float summation-order drift across engines or
    * partitionings), the final divisions are single correctly-rounded
    * double ops, and the 6-decimal round is therefore engine- and
    * partition-count-exact — the same determinism argument as
    * `MetricsOps.averagePrecision`'s fixed-point accumulation.
    *
    * Scale: one hash aggregate, map-side partials, output = one row per
    * group. Exactness holds while `n·Σxy` stays below 2^53; at larger
    * magnitudes pre-center `x` per group (two-pass) or widen to DECIMAL.
    * Groups with fewer than 2 points or zero x-variance are dropped (no
    * fittable line).
    */
  def groupOls(df: DataFrame, group: String, x: Column, y: Column): DataFrame = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    val fit = df.groupBy(group).agg(
      count(lit(1)).as("n"),
      sum(xl).as("__sx"), sum(yl).as("__sy"),
      sum(xl * xl).as("__sxx"), sum(xl * yl).as("__sxy"),
      sum(yl * yl).as("__syy"))
    val n = col("n").cast("double")
    val num = n * col("__sxy") - col("__sx") * col("__sy")
    val den = n * col("__sxx") - col("__sx") * col("__sx")
    val deny = n * col("__syy") - col("__sy") * col("__sy")
    val slope = num / den
    fit.filter(col("n") >= 2 && den =!= 0.0)
      .select(col(group), col("n"),
        round(slope, 6).as("slope"),
        round((col("__sy") - slope * col("__sx")) / n, 6).as("intercept"),
        // guard deny=0 (constant y): R² undefined → null, matching SQL
        round(when(deny =!= 0.0, num * num / (den * deny)), 6).as("r2"))
  }

  /** Quantile normalization across groups: replace each value by the
    * cross-group mean of its within-group quantile bucket — the batch-effect
    * remover of expression pipelines, and the "make every source's length
    * distribution comparable" step of corpus curation.
    *
    * Distributed form: within-group rank (keyed window, total order via
    * `tie`), exact integer bucket `(rn−1)·q DIV n` (same arithmetic as
    * `MetricsOps.gainsTable` — no double rounding at stratum edges), then
    * the reference profile is a q-row aggregate broadcast back onto the
    * rows. Means over integer-valued `value` are exact-sum divisions, so
    * the 6-decimal round is engine-exact.
    *
    * Scale: ONE keyed sort serves both the rank and the group count
    * (whole-partition frame — no separate count-join), plus one q-row
    * broadcast join; no global sort anywhere.
    */
  def quantileNormalize(df: DataFrame, group: String, value: Column,
      tie: Column, q: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(value.asc, tie.asc)
    val wAll = Window.partitionBy(group)
    val ranked = df
      .withColumn("__gn", count(lit(1)).over(wAll))
      .withColumn("__rn", row_number().over(w))
      // integer DIV — no double rounding at stratum edges
      .withColumn("bucket", expr(s"CAST(((__rn - 1) * $q) DIV __gn AS INT)"))
    val profile = ranked.groupBy("bucket")
      .agg(avg(value.cast("long")).as("__ref"))
    ranked.join(broadcast(profile), "bucket")
      .select(col(group), tie, value.as("orig"), col("bucket"),
        round(col("__ref"), 6).as("normalized"))
  }

  /** Zipf rank-frequency fit: OLS of ln(count) on ln(rank) over a term
    * frequency table — slope ≈ −1 flags a natural-language token
    * distribution, flatter slopes flag templated/synthetic corpora (a
    * corpus-forensics one-liner on top of [[groupOls]]).
    *
    * Rank is the two-phase global row number (count desc, term asc — no
    * single-partition sort of the vocabulary), and both logs are QUANTIZED
    * to fixed point (×`quant`, default 10⁵, rounded to integer) before the
    * sums — so [[groupOls]]'s exact-integer determinism argument carries
    * through verbatim; the ~10⁻⁵ stat perturbation is far below the
    * 6-decimal reporting precision. Output: one row (n, slope, intercept,
    * r2).
    */
  def zipfFit(counts: DataFrame, term: String, cnt: String,
      quant: Double = 1e5): DataFrame = {
    val ranked = RankOps.globalRowNumber(counts,
      Seq(col(cnt).desc, col(term).asc), "__zr")
    groupOls(ranked.withColumn("__corpus", lit("all")), "__corpus",
        round(log(col("__zr")) * quant, 0),
        round(log(col(cnt)) * quant, 0))
      .drop("__corpus")
  }

  /** Heaps'-law fit of vocabulary growth: `V(n) ≈ K·n^β` over the corpus
    * read in `id` order, via log-log OLS on the per-document cumulative
    * (tokens-seen, vocab-size) curve. β ≈ 0.4–0.6 for natural language;
    * templated/repetitive corpora flatten early — the companion corpus
    * forensic to [[zipfFit]].
    *
    * Fully relational construction of a sequential-looking statistic:
    * 1. each distinct token's introducing document is `min(doc)` over its
    *    occurrences — the global stream index the first cut of this
    *    operator materialized is ordered PRIMARILY by doc (per-doc prefix
    *    offsets + within-doc position), so argmin-by-index ≡ min(doc) and
    *    neither the index, the offsets cumsum, nor the position explode
    *    is needed; the explode runs over the per-doc DISTINCT token set
    *    (membership is all min(doc) reads — duplicates only added
    *    shuffle bytes);
    * 2. new-tokens-per-doc aggregates back to the per-document frame,
    *    whose running (Σ tokens, Σ new) pair IS the growth curve —
    *    BOTH running sums ride ONE [[RankOps.globalCumsums]] machine
    *    (one range shuffle, one pinned bucketing, one window pass);
    * 3. [[groupOls]] on the quantized logs (the [[zipfFit]] determinism
    *    argument verbatim).
    * Output: one row `(n, slope, intercept, r2)` — slope = β,
    * `exp(intercept)` = K, n = #documents on the curve.
    *
    * Scale: one shuffle on token (first-occurrence agg), one bounded
    * two-value cumsum on the per-doc frame; no global windows, no driver
    * loops.
    *
    * `quant` defaults to 10⁴ (not [[zipfFit]]'s 10⁵): the curve has one
    * point per DOCUMENT with ln(corpus tokens)-sized logs, so Σx ≈
    * ln(N)·quant·docs and [[groupOls]]'s Σx·Σy long product must stay
    * under 2^63 — 10⁴ carries ~20k documents per fit; beyond that,
    * sample the curve (every k-th doc) rather than raising quant.
    */
  def heapsFit(docs: DataFrame, id: String, text: String,
      quant: Double = 1e4): DataFrame = {
    import graft.functions.TextFns
    val perDoc = docs
      .select(col(id).as("__doc"), TextFns.tokens(col(text)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .withColumn("__ntok", size(col("__toks")).cast("long"))
    val firstDoc = perDoc
      .select(col("__doc"), explode(array_distinct(col("__toks"))).as("__tok"))
      .groupBy(col("__tok"))
      .agg(min(col("__doc")).as("__fdoc"))
    val newPerDoc = firstDoc.groupBy(col("__fdoc").as("__doc"))
      .agg(count(lit(1)).as("__new"))
    val curve = RankOps.globalCumsums(
      perDoc.select(col("__doc"), col("__ntok"))
        .join(newPerDoc, Seq("__doc"), "left")
        .select(col("__doc"), col("__ntok"),
          coalesce(col("__new"), lit(0L)).as("__new")),
      Seq(col("__doc")),
      Seq((col("__ntok"), "__cumn"), (col("__new"), "__cumv")))
    groupOls(curve.withColumn("__corpus", lit("all")), "__corpus",
        round(log(col("__cumn")) * quant, 0),
        round(log(col("__cumv")) * quant, 0))
      .drop("__corpus")
  }

  /** Exact tie-averaged Spearman rank correlation of two numeric columns —
    * ONE output row `(n, rho)`.
    *
    * The textbook statistic is Pearson over AVERAGE ranks (ties share the
    * mean of the rank block they occupy). Average ranks are half-integers,
    * so everything is doubled into exact integers: for a value with
    * inclusive prefix count `cum` and multiplicity `cnt`, the doubled
    * average rank is `2·cum − (cnt − 1)`. Doubling both sides scales
    * Pearson's numerator and denominator by the same 4 — ρ is unchanged
    * and every accumulation stays integral (DECIMAL(38,0): the
    * rank-product sums reach 4N³, past BIGINT at ~10⁶ rows).
    *
    * Shape: per-column distinct-value aggregation (bounded by value
    * cardinality), then ONE [[RankOps.globalCumsum]] machine for BOTH
    * columns — the two per-column count frames are tagged and unioned, the
    * union range-bucketed on (tag, x, y); within a tag the other column is
    * a constant NULL, so order within tag t is exactly that column's
    * ascending order, and the y side's prefix is the global prefix minus n
    * (all x rows sort first). One range shuffle, one pinned bucketing, one
    * window pass where the naive form pays two of each — same exact
    * integer ranks. Then two equi-joins back to the rows and one final
    * scalar aggregate. The only doubles are the closing Pearson assembly,
    * mirrored op-for-op by the oracle.
    */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    // pinned: the pair frame has FOUR consumers (x-rank counts, y-rank
    // counts, the n scalar, the closing moment aggregate) — one scan
    val rows = df.select(x.as("__x"), y.as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint(false)
    val xt = rows.schema("__x").dataType
    val yt = rows.schema("__y").dataType
    val xc = rows.groupBy(col("__x")).agg(count(lit(1)).as("__cnt"))
      .select(lit(0).as("__tag"), col("__x").as("__vx"),
        lit(null).cast(yt).as("__vy"), col("__cnt"))
    val yc = rows.groupBy(col("__y")).agg(count(lit(1)).as("__cnt"))
      .select(lit(1).as("__tag"), lit(null).cast(xt).as("__vx"),
        col("__y").as("__vy"), col("__cnt"))
    val n1 = rows.agg(count(lit(1)).as("__n"))
    val cum = RankOps.globalCumsum(xc.unionByName(yc),
        Seq(col("__tag").asc, col("__vx").asc, col("__vy").asc),
        col("__cnt"), "__cum")
      .crossJoin(broadcast(n1))
    // doubled average rank of a value with inclusive prefix `cum` and
    // multiplicity `cnt`: 2·cum − (cnt − 1) — exactly the two-machine form
    val rxMap = cum.filter(col("__tag") === 0)
      .select(col("__vx").as("__x"),
        (lit(2) * col("__cum") - (col("__cnt") - 1)).as("__rx"))
    val ryMap = cum.filter(col("__tag") === 1)
      .select(col("__vy").as("__y"),
        (lit(2) * (col("__cum") - col("__n")) - (col("__cnt") - 1)).as("__ry"))
    rows
      .join(rxMap, Seq("__x"))
      .join(ryMap, Seq("__y"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__rx").cast("decimal(38,0)")).as("__sx"),
        sum(col("__ry").cast("decimal(38,0)")).as("__sy"),
        sum(col("__rx").cast("decimal(38,0)") * col("__rx")).as("__sxx"),
        sum(col("__ry").cast("decimal(38,0)") * col("__ry")).as("__syy"),
        sum(col("__rx").cast("decimal(38,0)") * col("__ry")).as("__sxy"))
      .select(col("n"),
        round(
          (col("n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
            sqrt(
              (col("n") * col("__sxx") - col("__sx") * col("__sx")).cast("double") *
              (col("n") * col("__syy") - col("__sy") * col("__sy")).cast("double")),
          6).as("rho"))
  }

  /** Exact tie-corrected Mann-Whitney U between two groups — the
    * nonparametric "did distribution A shift vs B" test a monitoring
    * pipeline runs per segment (the reference reaches for scipy's
    * `mannwhitneyu` in its evaluation notebooks; here it is three hash
    * aggregations and one exchange-parallel prefix sum).
    *
    * Same doubled-average-rank construction as [[spearman]]: per distinct
    * value, per-group counts; global rank prefix via
    * [[RankOps.globalCumsum]] (never a single-partition window); then
    *
    *   2·R_A = Σ_v cntA(v) · (2·cum(v) − (cnt(v) − 1))
    *   2·U_A = 2·R_A − nA·(nA+1)
    *
    * with every sufficient statistic an exact integer (DECIMAL(38,0)),
    * including the tie term Σ(t³−t). Only the closing z assembly is
    * floating point, mirrored op-for-op by the oracle:
    *
    *   z = (U_A − nA·nB/2) / sqrt(nA·nB/12 · (n+1 − Σ(t³−t)/(n·(n−1))))
    *
    * Scale: distinct-value frame is the only shuffled intermediate; the
    * rank rejoin is an equi-join on value; output is one row.
    */
  def mannWhitney(df: DataFrame, value: Column, group: Column,
      groupA: String, groupB: String): DataFrame = {
    val rows = df.select(value.as("__v"), group.as("__g"))
      .filter(col("__v").isNotNull && col("__g").isin(groupA, groupB))
    val counts = rows.groupBy(col("__v")).agg(
      sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("__ca"),
      count(lit(1)).as("__cnt"))
    val ranked = RankOps.globalCumsum(counts, Seq(col("__v")), col("__cnt"), "__cum")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    ranked
      .agg(
        sum(col("__ca")).as("__na"),
        sum(col("__cnt") - col("__ca")).as("__nb"),
        // Σ cntA·(2·cum − (cnt−1)) = 2·R_A, exact
        sum(dec(col("__ca")) * (lit(2) * col("__cum") - (col("__cnt") - 1)))
          .as("__2ra"),
        sum(dec(col("__cnt")) * col("__cnt") * col("__cnt") - dec(col("__cnt")))
          .as("__ties"))
      .select(
        col("__na").as("n_a"), col("__nb").as("n_b"),
        ((col("__2ra") - dec(col("__na")) * (col("__na") + 1)).cast("double") / 2)
          .as("u_a"),
        col("__2ra"), col("__ties"))
      .select(col("n_a"), col("n_b"), round(col("u_a"), 6).as("u_a"),
        round(
          (col("u_a") - col("n_a").cast("double") * col("n_b") / 2) /
            sqrt(col("n_a").cast("double") * col("n_b") / 12 *
              ((col("n_a") + col("n_b") + lit(1)).cast("double") -
                col("__ties").cast("double") /
                  ((col("n_a") + col("n_b")).cast("double") *
                    (col("n_a") + col("n_b") - lit(1))))),
          6).as("z"))
  }

  /** Exact tie-corrected Kruskal-Wallis H — [[mannWhitney]]'s k-group
    * generalization ("did ANY segment's distribution shift"), the same
    * doubled-average-rank machinery: per (group, value) counts, global
    * rank prefix via [[RankOps.globalCumsum]] (never a single-partition
    * window), exact integer rank sums 2·R_g and tie term Σ(t³−t), then
    *
    *   H = (12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1)) / (1 − Σ(t³−t)/(n³−n))
    *
    * Cross-engine determinism detail: Σ_g R_g²/n_g sums DOUBLES (R_g² can
    * exceed 2⁵³), and a hash-aggregate's merge order would make the last
    * ulp partitioning-dependent — so the per-group terms are collected
    * into a bounded array (one row per group — the segment cardinality,
    * not data), sorted by group, and folded LEFT-TO-RIGHT with a
    * higher-order `aggregate`; the oracle mirrors with
    * LIST_SORT + LIST_REDUCE. Every other statistic is an exact integer.
    */
  def kruskalWallis(df: DataFrame, value: Column, group: Column): DataFrame = {
    val rows = df.select(value.as("__v"), group.as("__g"))
      .filter(col("__v").isNotNull && col("__g").isNotNull)
    val gv = rows.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__cgv"))
    val counts = gv.groupBy(col("__v")).agg(sum(col("__cgv")).as("__cnt"))
    val ranked =
      RankOps.globalCumsum(counts, Seq(col("__v")), col("__cnt"), "__cum")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val perGroup = gv.join(ranked, Seq("__v"))
      .groupBy(col("__g"))
      .agg(sum(col("__cgv")).as("__ng"),
        sum(dec(col("__cgv")) * (lit(2) * col("__cum") - (col("__cnt") - 1)))
          .as("__2rg"))
    val tot = ranked.agg(sum(col("__cnt")).as("__n"),
      sum(dec(col("__cnt")) * col("__cnt") * col("__cnt") - dec(col("__cnt")))
        .as("__ties"))
    perGroup
      .agg(count(lit(1)).as("k_groups"),
        aggregate(
          array_sort(collect_list(struct(col("__g").as("g"),
            (col("__2rg").cast("double") * col("__2rg").cast("double") /
              (lit(4.0) * col("__ng"))).as("t")))),
          lit(0.0), (acc, x) => acc + x.getField("t")).as("__s4"))
      .crossJoin(broadcast(tot)) // 1-row × 1-row stats frames
      .select(col("k_groups"), col("__n").as("n"),
        round(
          (lit(12.0) / (col("__n").cast("double") * (col("__n") + 1)) *
            col("__s4") - lit(3) * (col("__n") + 1)) /
            (lit(1) - col("__ties").cast("double") /
              (col("__n").cast("double") * col("__n") * col("__n") -
                col("__n"))),
          6).as("h"))
  }

  /** Cohen's d effect size for two cohorts of an integer-valued metric —
    * the "is the difference MEANINGFUL" companion to a z/t test's "is it
    * real": (m₁ − m₂) / s_pooled with the classic pooled variance
    *   s_p² = ( (n₁Q₁ − S₁²)/n₁ + (n₂Q₂ − S₂²)/n₂ ) / (n₁ + n₂ − 2).
    * One conditional-aggregate scan to six DECIMAL(38,0) integers; the
    * close is a fixed mirrored IEEE sequence (two divisions per
    * variance-numerator, one pooled division, one √, one final
    * division). Degenerate inputs (a cohort with < 2 rows, or zero
    * pooled variance) yield null d. Rows with null cohort or value are
    * excluded.
    */
  def cohensD(df: DataFrame, inA: Column, value: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.filter(inA.isNotNull && value.isNotNull)
      .select(inA.as("__a"), value.cast("long").as("__v"))
    val agg = base.agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("__a"), dec(col("__v")))).as("__s1"),
      sum(when(col("__a"), dec(col("__v")) * col("__v"))).as("__q1"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("n2"),
      sum(when(!col("__a"), dec(col("__v")))).as("__s2"),
      sum(when(!col("__a"), dec(col("__v")) * col("__v"))).as("__q2"))
    val m1 = col("__s1").cast("double") / col("n1").cast("double")
    val m2 = col("__s2").cast("double") / col("n2").cast("double")
    val vn1 = (col("n1") * col("__q1") - col("__s1") * col("__s1"))
      .cast("double") / col("n1").cast("double")
    val vn2 = (col("n2") * col("__q2") - col("__s2") * col("__s2"))
      .cast("double") / col("n2").cast("double")
    val sp2 = (vn1 + vn2) / (col("n1") + col("n2") - 2).cast("double")
    agg.select(col("n1"), col("n2"),
      when(col("n1") > 0, round(m1, 6)).as("mean_a"),
      when(col("n2") > 0, round(m2, 6)).as("mean_b"),
      when(col("n1") > 1 && col("n2") > 1 &&
          (col("n1") * col("__q1") - col("__s1") * col("__s1")) +
            (col("n2") * col("__q2") - col("__s2") * col("__s2")) >
            lit(0).cast("decimal(38,0)"),
        round((m1 - m2) / sqrt(sp2), 6)).as("d"))
  }

  /** Exact tie-corrected Friedman test — the repeated-measures sibling of
    * [[kruskalWallis]]: each block (subject) ranks the SAME k treatments,
    * so between-block variation cancels and only the within-block
    * ordering is tested ("does treatment rank consistently differ").
    * Input must carry ONE value per (block, treatment) — aggregate first;
    * blocks missing any treatment are dropped (the complete-block
    * contract of the classic test).
    *
    * Exact integer form via doubled within-block mean ranks
    * 2r = 2·#less + #eq + 1 (ties = mean ranks): with T_j = Σ_blocks 2r,
    * A = Σ (2r)², b complete blocks,
    *
    *   χ²_F = (k−1) · Σ_j (T_j − b(k+1))² / (A − b·k·(k+1)²)
    *
    * — the tie-corrected statistic (reduces to the textbook
    * 12/(bk(k+1))·ΣR² − 3b(k+1) when tie-free), with integer numerator
    * and denominator in DECIMAL(38,0), one closing cast+division per
    * engine. All-tied blocks throughout (denominator 0) yield null.
    *
    * Scale shape: the within-block rank is a window over ≤k rows per
    * block (k is the bounded treatment cardinality); T_j/A are one hash
    * aggregate each (k rows, 1 row); completeness is a semi-join against
    * the b-row complete-block frame. No global sort anywhere.
    */
  def friedman(df: DataFrame, block: Column, treatment: Column,
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(block.as("__b"), treatment.as("__t"),
        value.as("__v"))
      .filter(col("__b").isNotNull && col("__t").isNotNull &&
        col("__v").isNotNull)
    val kRow = rows.agg(countDistinct(col("__t")).as("__k"))
    val complete = rows.groupBy(col("__b"))
      .agg(countDistinct(col("__t")).as("__nb"))
      .crossJoin(broadcast(kRow)) // 1-row treatment cardinality
      .filter(col("__nb") === col("__k"))
      .select(col("__b"))
    val kept = rows.join(complete, Seq("__b"), "left_semi")
    val wLess = Window.partitionBy(col("__b")).orderBy(col("__v"))
    val wEq = Window.partitionBy(col("__b"), col("__v"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // rank() = #less + 1, so 2r = 2·#less + #eq + 1 = 2·rank() + #eq − 1
    val r2 = kept
      .withColumn("__rk", rank().over(wLess))
      .withColumn("__ceq", count(lit(1)).over(wEq))
      .select(col("__b"), col("__t"),
        (lit(2) * col("__rk") + col("__ceq") - 1).as("__2r"))
    val tj = r2.groupBy(col("__t"))
      .agg(sum(dec(col("__2r"))).as("__tj"), count(lit(1)).as("__bj"))
    val tot = r2.agg(sum(dec(col("__2r")) * col("__2r")).as("__a"),
      countDistinct(col("__b")).as("b_blocks"),
      countDistinct(col("__t")).as("k_treat"))
    val dev = tj.crossJoin(broadcast(tot)) // k-row × 1-row stats
      .select(((col("__tj") - dec(col("b_blocks")) * (col("k_treat") + 1)) *
        (col("__tj") - dec(col("b_blocks")) * (col("k_treat") + 1)))
        .as("__d2"))
      .agg(sum(col("__d2")).as("__sd2"))
    tot.crossJoin(broadcast(dev)) // 1-row × 1-row
      .select(col("b_blocks"), col("k_treat"),
        when(col("__a") =!= dec(col("b_blocks")) * col("k_treat") *
            (col("k_treat") + 1) * (col("k_treat") + 1),
          round(((col("k_treat") - 1) * col("__sd2")).cast("double") /
            (col("__a") - dec(col("b_blocks")) * col("k_treat") *
              (col("k_treat") + 1) * (col("k_treat") + 1)).cast("double"),
            6)).as("chi2"))
  }

  /** Exact tie-corrected Wilcoxon signed-rank test over PAIRED
    * integer-quantized differences — [[mannWhitney]]'s sibling for
    * before/after comparisons on the same subjects (did the metric move
    * after the change, per entity). Zero differences drop (the standard
    * convention); |d| ranks come from the same doubled-average-rank
    * construction over the distinct-|d| frame via
    * [[RankOps.globalCumsum]]; every sufficient statistic — 2·W⁺, the
    * tie term Σ(t³−t), n — is an exact integer, and only the closing
    *
    *   z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48)
    *
    * assembly is floating point, mirrored op-for-op by the oracle.
    * `diff` must be integer-valued (quantize first — e.g. cents).
    */
  def wilcoxonSignedRank(df: DataFrame, diff: Column): DataFrame = {
    val rows = df.select(diff.as("__d")).filter(col("__d").isNotNull &&
      col("__d") =!= 0)
    val counts = rows.groupBy(abs(col("__d")).as("__a")).agg(
      sum(when(col("__d") > 0, 1L).otherwise(0L)).as("__cp"),
      count(lit(1)).as("__cnt"))
    val ranked = RankOps.globalCumsum(counts, Seq(col("__a")), col("__cnt"), "__cum")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    ranked
      .agg(
        sum(col("__cnt")).as("n"),
        sum(dec(col("__cp")) * (lit(2) * col("__cum") - (col("__cnt") - 1)))
          .as("__2wp"),
        sum(dec(col("__cnt")) * col("__cnt") * col("__cnt") - dec(col("__cnt")))
          .as("__ties"))
      .select(col("n"), (col("__2wp").cast("double") / 2).as("w_plus"),
        col("__2wp"), col("__ties"))
      .select(col("n"), round(col("w_plus"), 6).as("w_plus"),
        round(
          (col("w_plus") - col("n").cast("double") * (col("n") + 1) / 4) /
            sqrt(col("n").cast("double") * (col("n") + 1) *
              (lit(2) * col("n") + 1) / 24 -
              col("__ties").cast("double") / 48),
          6).as("z"))
  }

  /** Exact population covariance matrix of a fixed-dimension embedding
    * column — the input to PCA-whitening / decorrelation stages of an
    * embedding-curation pipeline. Upper triangle only (i ≤ j), one row per
    * dim pair.
    *
    * No self-join: each row expands to its own d·(d+1)/2 (i, j, xi, xj)
    * quads with a nested `transform` + `flatten` expression tree — the
    * inner transform runs over `slice(vec, i+1, d)`, so ONLY the upper
    * triangle is ever generated (no produce-then-filter of the lower
    * half) — and the pair products are formed map-side; the only shuffle
    * is the final hash aggregate on the (i, j) key — d²/2 groups,
    * map-side combined. At d=64 that is 2 080 rows out regardless of
    * input size; the n·d²/2 intermediate never materializes (it streams
    * through the partial aggregate).
    *
    * Determinism: each float lane is quantized onto the 10⁻⁶ grid
    * (round(x·10⁶) as BIGINT — float→double widening is exact, so both
    * engines quantize the same value), pair products are formed in exact
    * 64-bit integers (|q| ≤ ~10⁶ ⇒ |q·q| ≤ ~10¹²) and summed as
    * DECIMAL(38,0) — a merge-ORDER-FREE sufficient statistic, unlike a
    * raw double hash-agg sum. The closing n·Σqᵢqⱼ − Σqᵢ·Σqⱼ numerator is
    * one exact integer (≤ n²·10¹² — at n = 10¹² rows still < 10³⁸), and
    * the single numer/(n²·10¹²) double division + 6-decimal round is
    * correctly rounded identically on every engine, partitioning and AQE
    * mode. Same fixed-point argument as [[groupOls]]/`a28`/`a33`.
    */
  def embeddingCovariance(df: DataFrame, vec: Column,
      checkpoint: DataFrame => DataFrame = _.localCheckpoint(false))
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = transform(vec, x => quantLaneChecked(x))
    val qdf = df.select(q.as("__q")).filter(col("__q").isNotNull)
    // the embedding dimension: one row off one partition (CollectLimit) —
    // a bounded scalar, never row data; empty corpus short-circuits
    val first = qdf.select(size(col("__q")).as("d")).limit(1).collect()
    if (first.isEmpty)
      return spark.emptyDataFrame
        .withColumn("i", lit(null).cast("long"))
        .withColumn("j", lit(null).cast("long"))
        .withColumn("n", lit(null).cast("long"))
        .withColumn("cov", lit(null).cast("double"))
        .limit(0)
    val d = first(0).getInt(0)
    val p0 = d * (d + 1) / 2
    // ONE corpus scan: upper-triangle products as a BARE long array
    // (row-major pair enumeration: pos = i·d − i(i−1)/2 + (j − i); no
    // per-pair struct allocation) with the raw lanes APPENDED at
    // pos ∈ [p0, p0+d) — products and first moments come out of the same
    // posexplode + hash aggregate, so the 100 TB corpus is read once,
    // not twice. The d(d+3)/2-row result is checkpointed (bounded by the
    // dimension, not data) so its three consumers don't re-run the scan.
    // Two product-enumeration paths, same (pos, n, Σ) values either way:
    //  - d ≤ 256: a LITERAL (pos, i, j) pair table exploded per row with
    //    element_at products — every expression whole-stage codegen'd
    //    (higher-order lambdas are CodegenFallback; the interpreted
    //    nested-transform was ~half the build cost at sf0.1).
    //  - larger d: the dimension-scalable nested transform (a d²-struct
    //    literal would bloat the plan and blow codegen method limits).
    // The decimal(38,0) aggregate stays on both paths: long hi/lo split
    // sums measure ~2× faster still, but are NOT overflow-safe under the
    // ±3037 lane contract at corpus row counts — exactness wins.
    val exploded =
      if (d <= 256) {
        // ONE literal array-of-structs node (typedLit), not d(d+3)/2
        // CreateStruct expression nodes: the build is re-planned every
        // bench pass (the pinned frame is reset), and Catalyst
        // analysis/optimization of a ~2000-element literal expression
        // tree was most of the build's wall — a single ArrayData literal
        // is O(1) to the optimizer, identical values to the explode.
        val pairSeq: Seq[(Long, Int, Int)] =
          (for { i <- 0 until d; j <- i until d }
            yield (i.toLong * d - i.toLong * (i - 1) / 2 + (j - i),
              i + 1, j + 1)) ++
            (0 until d).map(i => ((p0 + i).toLong, i + 1, -1))
        qdf.select(explode(typedLit(pairSeq)).as("pr"), col("__q"))
          .select(col("pr._1").as("pos"),
            when(col("pr._3") >= 0,
              element_at(col("__q"), col("pr._2")) *
                element_at(col("__q"), col("pr._3")))
              .otherwise(element_at(col("__q"), col("pr._2"))).as("__p"))
      } else {
        val prods = flatten(transform(col("__q"), (xi, i) =>
          transform(slice(col("__q"), i + 1, size(col("__q"))), xj => xi * xj)))
        qdf.select(posexplode(concat(prods, col("__q")))
            .as(Seq("pos", "__p")))
          .select(col("pos").cast("long").as("pos"), col("__p"))
      }
    val sums = checkpoint(exploded
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum(col("__p").cast("decimal(38,0)")).as("__sp")))
    val dims = sums.filter(col("pos") >= p0)
      .select((col("pos") - p0).as("i"), col("n"), col("__sp").as("__s"))
    val prodSums = sums.filter(col("pos") < p0)
      .select(col("pos"), col("__sp"))
    // bounded pos ↔ (i, j) map: d(d+1)/2 rows from the now-known d
    val posMap = (for { i <- 0 until d; j <- i until d }
      yield (i.toLong, j.toLong,
        i.toLong * d - i.toLong * (i - 1) / 2 + (j - i)))
      .toDF("i", "j", "pos")
    posMap
      .join(prodSums, Seq("pos"))
      .join(dims.select(col("i"), col("n"), col("__s").as("__si")), Seq("i"))
      .join(dims.select(col("i").as("j"), col("__s").as("__sj")), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        // (n·Σqq − Σq·Σq) is EXACT DECIMAL(38,0); one double division by
        // n²·10¹² (the de-quantization), then the 6-decimal round
        round((col("n").cast("decimal(38,0)") * col("__sp") -
            col("__si") * col("__sj")).cast("double") /
          (col("n").cast("double") * col("n") * lit(1e12)), 6).as("cov"))
  }

  /** Quantize one embedding lane onto the 10⁻⁶ grid, FAILING LOUDLY when
    * the quantized magnitude could overflow the 64-bit pair product
    * downstream (|q·q| < 2⁶³ requires |q| ≤ ⌊√(2⁶³−1)⌋ = 3 037 000 499,
    * i.e. |x| ≲ 3037). Out-of-range lanes previously wrapped silently and
    * corrupted every covariance cell they touched; an embedding that
    * violates the documented magnitude contract now raises instead. One
    * branch per lane, codegen'd — free next to the round.
    */
  private val MaxLaneQ = 3037000499L
  private def quantLaneChecked(x: Column): Column = {
    val q = round(x.cast("double") * lit(1e6), 0).cast("long")
    when(abs(q) <= lit(MaxLaneQ), q)
      .otherwise(raise_error(concat(
        lit("graft.embeddingCovariance: |lane| exceeds the ±3037.000499 " +
          "quantization contract (would overflow the exact 64-bit pair " +
          "product): "), x.cast("string"))).cast("long"))
  }

  /** Round-half-away-from-zero to a Long — BigDecimal HALF_UP semantics
    * (Math.round alone rounds half toward +∞, which disagrees with both
    * Spark's `round` and DuckDB's `ROUND` on negative halves).
    */
  private def roundHalfAway(x: Double): Long =
    if (x < 0) -Math.round(-x) else Math.round(x)

  /** First principal component of the embedding corpus: deterministic
    * power iteration on the DRIVER over the bounded d×d matrix from
    * [[embeddingCovariance]] (d(d+1)/2 rounded scalars cross the driver —
    * the `Knn.centroids` bounded-collect argument; never row data), then
    * a fully distributed projection of every vector onto the axis.
    *
    * Cross-engine-EXACT by construction — every step is either integer
    * arithmetic or a single correctly-rounded double op on integer
    * operands, so an unrolled SQL oracle reproduces the axis bit-for-bit:
    *  - C = round(cov·10⁶): the rounded covariance back on its integer
    *    grid (|C| small; exact).
    *  - power iteration with L∞ normalization at scale 10⁸: W⁰ = 10⁸·1;
    *    u = C·W is an exact integer matvec (|u| ≤ d·10⁶·10⁸ ≈ 6.4·10¹⁵ <
    *    2⁵³, so Long→double conversion is EXACT); W' = round(u/max|u|·10⁸)
    *    — one exact division of two exactly-converted doubles. L∞ (an
    *    integer max) replaces the usual L2 step precisely so no
    *    square-root enters the loop.
    *  - sign pin: first nonzero component positive (integer test).
    *  - one closing L2 step onto the 10⁻¹² grid: A = round(W·s/√(ΣW²)·10¹²)
    *    with ΣW² ≤ d·10¹⁶ an exact Long.
    *  - projection: Σ round(x·10⁶)·A summed as DECIMAL(38,0) (order-free),
    *    de-quantized by one /10¹⁸ division, rounded to 6.
    * The oracle (SparkEntry) unrolls the same `iters` matvecs as chained
    * CTEs over the v09 covariance CTE — full hash-checked, no rows-only
    * exemption.
    */
  def pcaProject(df: DataFrame, id: String, vec: Column,
      iters: Int = 30): DataFrame =
    pcaProjectFrom(df, id, vec, iters, embeddingCovariance(df, vec))

  /** [[pcaProject]] over a pre-built covariance frame (the
    * [[embeddingCovariance]] output) — the shared-front-end form: when
    * v09 already materialized the moments, the PCA pays only the
    * bounded collect + the projection scan.
    */
  def pcaProjectFrom(df: DataFrame, id: String, vec: Column,
      iters: Int, covFrame: DataFrame): DataFrame = {
    val cov = covFrame
      .select(col("i"), col("j"), col("cov")).collect()
    if (cov.isEmpty)
      return df.sparkSession.emptyDataFrame
        .withColumn(id, lit(null).cast("long"))
        .withColumn("pc1", lit(null).cast("double"))
        .limit(0)
    val d = cov.iterator.map(_.getLong(1)).max.toInt + 1
    val m = Array.ofDim[Long](d, d)
    cov.foreach { r =>
      val (i, j, c) =
        (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      val ci = roundHalfAway(c * 1e6)
      m(i)(j) = ci; m(j)(i) = ci
    }
    var w = Array.fill(d)(100000000L) // 10⁸ = L∞-normalized all-ones start
    var it = 0
    while (it < iters) {
      val u = Array.tabulate(d) { i =>
        var s = 0L; var j = 0
        while (j < d) { s += m(i)(j) * w(j); j += 1 }
        s
      }
      val maxu = u.iterator.map(math.abs).max
      w =
        if (maxu == 0L) u
        else u.map(ui => roundHalfAway(ui.toDouble / maxu.toDouble * 1e8))
      it += 1
    }
    val s = w.find(_ != 0L).map(x => if (x < 0L) -1L else 1L).getOrElse(1L)
    val ss = w.iterator.map(x => x * x).sum // ≤ d·10¹⁶ — exact Long
    val axis = Array.tabulate(d) { j =>
      if (ss == 0L) 0L
      else roundHalfAway(
        (w(j) * s).toDouble / math.sqrt(ss.toDouble) * 1e12)
    }
    // same guarded quantizer as the covariance pass; the lane×axis product
    // is formed in DECIMAL(38,0) (|q|·10¹² can exceed 2⁶³ long before the
    // covariance bound does — q ≤ 3.04·10⁹ times the 10¹²-scaled axis is
    // ~3·10²¹, exact in decimal, silent wraparound in long)
    val qv = transform(vec, x => quantLaneChecked(x))
    val axisCol = array(axis.map(lit(_)): _*)
    val num = aggregate(
      zip_with(qv, axisCol, (a, b) => a.cast("decimal(38,0)") * b),
      lit(0).cast("decimal(38,0)"), (acc, p) => acc + p.cast("decimal(38,0)"))
    df.select(col(id),
      round(num.cast("double") / lit(1e18), 6).as("pc1"))
  }

  /** Per-lane embedding mean drift between two corpus slices (old vs new
    * snapshot, train vs serve, source A vs B) — the embedding-space
    * sibling of dq03's PSI: a per-dimension shift of the mean vector is
    * the earliest detectable symptom of an upstream encoder change.
    *
    * One posexplode scan; lanes quantized on the 10⁻⁶ grid ([[quantLaneChecked]]
    * — same overflow contract as the covariance pass) and summed per
    * (lane, slice) in DECIMAL(38,0), so both means and their difference
    * close as one exact-integer-fed double sequence per lane. Output is
    * d rows — bounded by embedding dim, never by data.
    */
  def embeddingMeanDrift(df: DataFrame, emb: String,
      inB: Column): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    df.select(inB.cast("int").as("__b"), posexplode(col(emb)).as(Seq("lane", "__x")))
      .select(col("__b"), col("lane"), quantLaneChecked(col("__x")).as("__q"))
      .groupBy("lane")
      .agg(
        sum(when(col("__b") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__b") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__b") === 0, dec(col("__q"))).otherwise(dec(lit(0)))).as("__sa"),
        sum(when(col("__b") === 1, dec(col("__q"))).otherwise(dec(lit(0)))).as("__sb"))
      .select(col("lane"), col("n_a"), col("n_b"),
        round(col("__sa").cast("double") / col("n_a").cast("double") / 1e6, 6)
          .as("mean_a"),
        round(col("__sb").cast("double") / col("n_b").cast("double") / 1e6, 6)
          .as("mean_b"),
        round(col("__sb").cast("double") / col("n_b").cast("double") / 1e6 -
          col("__sa").cast("double") / col("n_a").cast("double") / 1e6, 6)
          .as("drift"))
  }
}
