package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scale-path join machinery: bucketed co-located joins (shuffle-free) and
  * salted skew joins (result-identical).
  */
class ScaleJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-warehouse")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li.write.mode("overwrite")
      .option("path", s"$wh/li_b").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    ord.write.mode("overwrite")
      .option("path", s"$wh/ord_b").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      try {
        val joined = spark.table("li_b")
          .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"))
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join should not shuffle:\n$plan")
        assert(joined.count() === li.count()) // every lineitem has its order
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("salted join returns exactly the plain join's rows under skew") {
    // hot key: 10k rows on one key, a handful elsewhere
    val large = ((1 to 10000).map(i => (1L, i)) ++ (1 to 50).map(i => (2L, i)))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "absent")).toDF("k", "tag")
    val plain = large.join(small, Seq("k"))
    val salted = JoinOps.saltedEquiJoin(large, small, "k", salt = 8)
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("semiFilter without a smallSide hint works through the shuffle path") {
    val fact = (1 to 5000).map(i => (i.toLong % 97, i)).toDF("k", "v")
    val keep = (0L to 40L).map(Tuple1(_)).toDF("k")
    val hinted = JoinOps.semiFilter(fact, Seq("k"), keep, smallSide = true)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val unhinted = JoinOps.semiFilter(fact, Seq("k"), keep)
      unhinted.collect()
      val plan = unhinted.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected the non-broadcast path:\n$plan")
      assert(unhinted.count() === hinted.count())
      assert(unhinted.except(hinted).isEmpty && hinted.except(unhinted).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      prevA match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}
