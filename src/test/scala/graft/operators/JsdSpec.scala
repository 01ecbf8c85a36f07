package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JsdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jsdFromRest: identical distributions → 0; disjoint vocabularies → ln 2") {
    // sources a and b both emit the same unigram distribution → each vs
    // rest is identical → JSD 0. Source c shares no tokens with a∪b →
    // JSD(c, rest) = ln 2 exactly.
    val docs = Seq(
      ("a", "x x y"), ("b", "x x y"),
      ("c", "z z z")
    ).toDF("source", "text")
    val out = SummaryOps.jsdFromRest(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("c") === math.BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a vs rest: rest = b∪c = {x:2, y:1, z:3}; NOT identical to a → > 0
    assert(out("a") > 0.0 && out("a") < out("c"))
  }

  test("jsdFromRest: two identical sources only → both exactly 0") {
    val docs = Seq(("a", "p q q"), ("b", "p q q")).toDF("source", "text")
    val out = SummaryOps.jsdFromRest(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out === Map("a" -> 0.0, "b" -> 0.0))
  }

  test("jsdFromRest: n_tokens is the source's token count") {
    val docs = Seq(("a", "p q q"), ("b", "p")).toDF("source", "text")
    val out = SummaryOps.jsdFromRest(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 3L, "b" -> 1L))
  }
}
