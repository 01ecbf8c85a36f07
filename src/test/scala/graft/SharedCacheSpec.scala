package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared-profile cache contract the whole bench protocol leans on:
  * family queries memoize pinned checkpoint frames per (session, sfDir),
  * [[SparkEntry.isSharedRdd]] exempts exactly those blocks from per-query
  * cleanup, and [[SparkEntry.resetShared]] both drops the memo AND
  * unpersists the pinned blocks — so a pass boundary leaves no leaked
  * blocks and the next pass honestly re-pays the builds.
  */
class SharedCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def sharedLive(): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet
      .filter(SparkEntry.isSharedRdd).toSet

  test("family queries pin shared frames; resetShared unpersists them all") {
    SparkEntry.resetShared(spark)
    // d23 = the span profile's pairs view — building it pins toks,
    // ranked, adjacency, pairs
    SparkEntry.queries("d23_dupspan_pairs")(spark, d).count()
    val afterSpan = sharedLive()
    assert(afterSpan.nonEmpty, "span family left no pinned shared frames")
    // t39 = the gram profile's tercile view — more pinned frames appear,
    // and the span family's stay put (the cleanup exemption)
    SparkEntry.queries("t39_ppl_buckets")(spark, d).count()
    val afterGram = sharedLive()
    assert(afterSpan.subsetOf(afterGram),
      "building a second profile must not drop the first one's pins")
    assert(afterGram.size > afterSpan.size,
      "gram family pinned nothing new")
    // the Bench per-query sweep: everything NOT shared is dropped,
    // everything shared survives
    spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => SparkEntry.isSharedRdd(id) }
      .values.foreach(_.unpersist(false))
    assert(sharedLive() === afterGram,
      "the non-shared sweep must leave the pinned frames intact")
    // the query still runs off the surviving pins
    assert(SparkEntry.queries("d25_dupspan_clusters")(spark, d).count() > 0)
    // pass boundary: memo dropped AND blocks unpersisted — nothing leaks
    SparkEntry.resetShared(spark)
    assert(sharedLive().isEmpty,
      "resetShared left pinned blocks in the block manager")
  }

  test("t43's char-gram counts frame joins the pin/reset contract") {
    SparkEntry.resetShared(spark)
    val r1 = SparkEntry.queries("t43_charngram_langid")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(sharedLive().nonEmpty, "t43 pinned no char-gram frame")
    // the per-query sweep leaves the pin; a rerun reuses it and agrees
    spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => SparkEntry.isSharedRdd(id) }
      .values.foreach(_.unpersist(false))
    val r2 = SparkEntry.queries("t43_charngram_langid")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(r1 === r2)
    // pass boundary: rebuild from scratch, same values
    SparkEntry.resetShared(spark)
    assert(sharedLive().isEmpty)
    val r3 = SparkEntry.queries("t43_charngram_langid")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(r1 === r3)
    SparkEntry.resetShared(spark)
  }

  test("after resetShared the family rebuilds from scratch, same values") {
    SparkEntry.resetShared(spark)
    val first = SparkEntry.queries("e2e_span_family")(spark, d)
      .collect().map(_.toSeq).toSet
    SparkEntry.resetShared(spark)
    val second = SparkEntry.queries("e2e_span_family")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(first === second)
    SparkEntry.resetShared(spark)
  }
}
