package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Known-answer vectors, cross-checked against the oracle engine's
    * `jaro_winkler_similarity` (byte semantics, 0.7 boost threshold,
    * empty → 0).
    */
  private val vectors = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),
    ("ab", "ba", 0.0),
    ("CRATE", "TRACE", 0.7333333333333334), // jaro > 0.7 but no prefix
    ("abcdef", "abzzzz", 0.5555555555555555), // prefix but jaro ≤ 0.7 → no boost
    ("ab", "abcdefghij", 0.7866666666666667),
    ("aaaaaaaaab", "aaaaaaaaba", 0.98), // prefix boost capped at 4
    ("héllo", "hello", 0.8400000000000001)) // BYTE semantics: 6 vs 5 bytes

  test("kernel matches the oracle engine's answers bit-for-bit") {
    for ((a, b, want) <- vectors) {
      val got = JaroWinklerKernel.jaroWinkler(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got === want, s"jw('$a','$b')")
    }
  }

  test("codegen path agrees with interpreted eval over a real column") {
    GraftFunctions.register(spark)
    val df = vectors.map { case (a, b, w) => (a, b, w) }.toDF("a", "b", "want")
    val got = df.select(call_function("jaro_winkler", $"a", $"b").as("jw"),
      $"want").collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("symmetry and null contract") {
    GraftFunctions.register(spark)
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX")).toDF("a", "b")
    val sym = df.select(
      call_function("jaro_winkler", $"a", $"b").as("ab"),
      call_function("jaro_winkler", $"b", $"a").as("ba")).collect()
    sym.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    val nulls = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(call_function("jaro_winkler", $"a", $"b"))
      .collect()
    assert(nulls(0).isNullAt(0))
  }

  test("callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS s").as[Double].collect()
    assert(r(0) === 0.9611111111111111)
  }
}
