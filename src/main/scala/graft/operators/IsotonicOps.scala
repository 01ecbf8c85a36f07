package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact isotonic regression (pool-adjacent-violators) for probability
  * calibration — the non-parametric alternative to `MetricsOps.
  * temperatureScale` (sklearn's `IsotonicRegression`, the second
  * calibrator the reference's evaluation stack leans on via
  * `CalibratedClassifierCV` conventions).
  *
  * Distributed shape — hierarchical PAV: pooling is a divide-and-conquer-
  * safe operator (PAV(PAV(A) ++ PAV(B)) = PAV(A ++ B) for contiguous
  * splits A|B — pooling within halves only ever merges blocks the global
  * solution merges too), so the fit runs as range-partitioned local PAV
  * passes with geometrically shrinking partition counts (P → P/8 → … →
  * 1). Each pass sees blocks already pooled by the previous one, so the
  * final single-partition pass runs over the TWICE-pooled block frame,
  * not the data — the same contract as Spark MLlib's IsotonicRegression
  * (per-partition PAV, pooled remainder merged centrally), but kept
  * inside executors.
  *
  * Violation tests are exact integer cross-multiplications
  * (`sy_a·n_b > sy_b·n_a`), so the fit is a deterministic function of the
  * data — no float-order sensitivity anywhere in the merge.
  */
object IsotonicOps {

  /** (lo, hi): the score span a pooled block covers; n / sy: its weight
    * and label mass; fitted mean = sy/n. Public: the Encoder's generated
    * code constructs it from janino, which can't see private members.
    */
  case class IsoBlock(lo: Double, hi: Double, n: Long, sy: Long)

  /** Local PAV over an ascending-by-score iterator of blocks: the classic
    * stack merge, exact integer arithmetic. Merges on `mean_prev ≥
    * mean_cur` (not strict), so adjacent equal-mean blocks coalesce —
    * fitted values are identical either way, and the ≥ form makes the
    * block decomposition canonical (maximal runs per fitted level), which
    * is what the run-grouped oracle derivation produces too.
    */
  private def pavLocal(it: Iterator[IsoBlock]): Iterator[IsoBlock] = {
    val stack = new ArrayBuffer[IsoBlock]()
    it.foreach { b0 =>
      var cur = b0
      while (stack.nonEmpty &&
          stack.last.sy * cur.n >= cur.sy * stack.last.n) {
        val p = stack.remove(stack.length - 1)
        cur = IsoBlock(p.lo, cur.hi, p.n + cur.n, p.sy + cur.sy)
      }
      stack += cur
    }
    stack.iterator
  }

  /** Isotonic calibration map of a 0/1 `label` against `score`, as the
    * canonical BLOCK frame: one row per pooled level —
    * `(score_lo, score_hi, n, sy, fitted)` with `fitted = sy/n` strictly
    * increasing across blocks (ties in scores pre-aggregated, the sklearn
    * convention; application to new scores is an as-of lookup against
    * `score_lo`, the same pattern as `JoinOps` as-of joins). Rows →
    * distinct scores is the only full-data aggregate; everything after
    * operates on the shrinking block frame.
    */
  def isotonicFit(df: DataFrame, score: Column, label: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = df.groupBy(score.cast("double").as("s"))
      .agg(count(lit(1)).as("n"), sum(label.cast("long")).as("sy"))
    val blocks0 = agg.select(col("s").as("lo"), col("s").as("hi"),
      col("n"), col("sy")).as[IsoBlock]
    val p0 = spark.sessionState.conf.numShufflePartitions
    // geometric reduction: every pass pools within its range partitions,
    // so the block count entering the next pass only shrinks; the final
    // 1-partition pass sees the (P/8)-times-pooled remainder, not data
    val fitted = Iterator.iterate(p0)(p => math.max(p / 8, 1))
      .takeWhile(_ >= 1).take(16).toSeq.distinct.sorted.reverse
      .foldLeft(blocks0) { (b, parts) =>
        b.repartitionByRange(parts, col("lo"))
          .sortWithinPartitions("lo")
          .mapPartitions(pavLocal)
      }
    fitted.toDF()
      .select(col("lo").as("score_lo"), col("hi").as("score_hi"),
        col("n"), col("sy"),
        round(col("sy").cast("double") / col("n"), 6).as("fitted"))
  }
}
