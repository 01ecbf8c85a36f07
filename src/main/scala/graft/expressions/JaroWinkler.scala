package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-light Jaro / Jaro-Winkler kernel over UTF-8 BYTES.
  *
  * Byte semantics are deliberate: the oracle engine's
  * `jaro_winkler_similarity` scores multi-byte codepoints per byte
  * (verified empirically: 'héllo' vs 'hello' → 0.84, the 6-vs-5-byte
  * answer, not the 5-vs-5-codepoint 0.88), and byte comparison is also
  * what the fuzzy-match hot loop wants — no decode per row. Conventions
  * matched to the common reference implementation: empty input → 0.0
  * (even for two empties), match window `max(0, ⌊max(|a|,|b|)/2⌋ - 1)`,
  * transpositions counted pairwise (`t/2` integer-halved), Winkler
  * prefix boost `+ min(4, prefix)·0.1·(1 − jaro)` applied only when
  * jaro > 0.7.
  */
object JaroWinklerKernel {

  def jaroBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }

  /** Entry point the generated code calls: one static invocation, inputs
    * stay as Spark's native `UTF8String` (zero copy beyond `getBytes`).
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes
    val y = b.getBytes
    val j = jaroBytes(x, y)
    if (j > 0.7) {
      val cap = math.min(4, math.min(x.length, y.length))
      var p = 0
      while (p < cap && x(p) == y(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }
}

/** Native Jaro-Winkler similarity of two strings — the record-linkage
  * scorer (name/UoM/drug-string reconciliation) as a codegen'd Catalyst
  * expression.
  *
  * Why a custom Expression: Spark ships `levenshtein` but no Jaro-Winkler,
  * and the composable alternatives (a Scala UDF, or exploding to
  * character grids) either break WholeStageCodegen or allocate per row.
  * `doGenCode` emits a single static call, so the scorer stays inside the
  * fused loop exactly like a builtin — the property the blocked all-pairs
  * matcher needs when each block contributes |block|² scored pairs.
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
        right.dataType.isInstanceOf[StringType]) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires string arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinklerKernel.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)
}
