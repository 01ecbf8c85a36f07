package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values — the multi-dimensional clustering key
  * for data-skipping layouts. A 100 TB table queried by BOTH entity and
  * time can only range-prune on its sort key; sorting by the interleaved
  * z-value gives every parquet row group a tight min/max envelope on BOTH
  * dimensions, so predicate pushdown skips files for either-or-both-dim
  * filters (the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Pure builtin shift/mask arithmetic (the classic parallel-bit-spread
  * sequence) — whole-stage-codegen'd, no UDF, and exactly reproducible by
  * any engine with 64-bit integers, so z-values are oracle-checkable.
  */
object ZOrder {

  private val steps = Seq(
    (16, 281470681808895L),      // 0x0000FFFF0000FFFF
    (8, 71777214294589695L),     // 0x00FF00FF00FF00FF
    (4, 1085102592571150095L),   // 0x0F0F0F0F0F0F0F0F
    (2, 3689348814741910323L),   // 0x3333333333333333
    (1, 6148914691236517205L))   // 0x5555555555555555

  /** Spread the low 31 bits of `c` so bit i lands at bit 2i (even
    * positions). 31-bit input keeps the 2-way interleave below bit 63 —
    * the z-value stays a non-negative BIGINT in every engine.
    */
  def spread31(c: Column): Column =
    steps.foldLeft(c.cast("long").bitwiseAND(lit(2147483647L))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 2-D Morton value: `x` on even bits, `y` on odd bits (each masked to
    * 31 bits). Sort or range-partition by this column before writing to
    * get a both-dims-tight file layout.
    */
  def zValue2(x: Column, y: Column): Column =
    spread31(x).bitwiseOR(shiftleft(spread31(y), 1))
}
