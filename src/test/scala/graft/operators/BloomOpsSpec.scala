package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom pre-filter: exactness guarantees and the approximation envelope.
  * Spec-gated (no cross-engine oracle — sketch bits are engine-specific).
  */
class BloomOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mightContain has zero false negatives; false positives stay in envelope") {
    val members = (1L to 1000L).map(_ * 3).toDF("k")
    val bloom = BloomOps.buildBloom(members, "k", expectedItems = 1000L,
      numBits = 16384L)
    val memberSet = (1L to 1000L).map(_ * 3).toSet
    val probes = (1L to 6000L).toDF("k")
      .filter(BloomOps.mightContain(bloom, col("k")))
      .as[Long].collect().toSet
    assert(memberSet.subsetOf(probes), "a bloom filter must never drop a member")
    val falsePos = probes.diff(memberSet).size
    val nonMembers = 6000 - memberSet.count(_ <= 6000)
    // 16384 bits for 1000 items ≈ 16 bits/item → fp well under 5%
    assert(falsePos.toDouble / nonMembers < 0.05,
      s"fp rate ${falsePos.toDouble / nonMembers}")
  }

  test("bloom filter bits are independent of partitioning (merge is bitwise)") {
    val members = (1L to 500L).toDF("k")
    val a = BloomOps.buildBloom(members, "k", 500L, 8192L)
    val b = BloomOps.buildBloom(members.repartition(11), "k", 500L, 8192L)
    assert(java.util.Arrays.equals(a, b))
  }

  test("bloomSemiFilter is result-identical to the plain semi join") {
    val fact = (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "v")
    val keys = (1L to 5000L).filter(_ % 17 == 0).toDF("k")
    val plain = JoinOps.semiFilter(fact, Seq("k"), keys)
      .select("k").as[Long].collect().toSet
    val bloomed = BloomOps.bloomSemiFilter(fact, "k", keys,
        expectedItems = 300L, numBits = 4096L)
      .select("k").as[Long].collect().toSet
    assert(bloomed === plain)
  }

  test("the pre-filter is a scan-side predicate — no shuffle before it") {
    val fact = spark.range(1, 2000).toDF("k")
    val bloom = BloomOps.buildBloom((1L to 50L).toDF("k"), "k", 50L, 1024L)
    val plan = fact.filter(BloomOps.mightContain(bloom, col("k")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("might_contain"), plan)
  }
}
