package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TopKRewrite: the global row_number top-k pattern must plan as a
  * distributed TakeOrderedAndProject, produce the same rows as the naive
  * single-partition window, and satisfy the strict GlobalWindowGuard.
  */
class TopKRewriteSpec extends AnyFunSuite {

  private def withExtSession[A](f: SparkSession => A): A = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder()
      .withExtensions(new graft.expressions.GraftExtensions).getOrCreate())
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private val topkSql =
    """SELECT * FROM (
         SELECT id, v, ROW_NUMBER() OVER (ORDER BY v DESC, id) AS rn
         FROM (SELECT id, CAST(id * 2654435761 % 997 AS BIGINT) AS v FROM RANGE(5000))
       ) WHERE rn <= 7"""

  test("rewrites to TakeOrderedAndProject; no single-partition exchange") {
    withExtSession { s =>
      val plan = s.sql(topkSql).queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), plan)
      assert(!plan.contains("Exchange SinglePartition"), plan)
    }
  }

  test("same rows and rank values as the unrewritten window") {
    withExtSession { s =>
      val got = s.sql(topkSql).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val ref = TestSpark.spark.sql(topkSql).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(got.sortBy(_._3) === ref.sortBy(_._3))
      assert(got.length === 7 && got.map(_._3).sorted === (1 to 7).toArray)
    }
  }

  test("residual conjuncts survive; rank-1 idiom rewrites; strict guard passes") {
    withExtSession { s =>
      s.conf.set("spark.graft.failOnGlobalWindow", "true")
      try {
        // filtered top-k passes the strict guard (window child is bounded)
        val even = s.sql(
          """SELECT * FROM (
               SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM RANGE(100)
             ) WHERE rn <= 10 AND rn % 2 = 0""").collect()
        assert(even.map(_.getInt(1)).sorted === Array(2, 4, 6, 8, 10))

        val first = s.sql(
          """SELECT * FROM (
               SELECT id, ROW_NUMBER() OVER (ORDER BY id DESC) AS rn FROM RANGE(50)
             ) WHERE rn = 1""").collect()
        assert(first.map(_.getLong(0)) === Array(49L))
      } finally s.conf.unset("spark.graft.failOnGlobalWindow")
    }
  }

  test("rank() filters are NOT rewritten (ties must keep peers)") {
    withExtSession { s =>
      // all-tied order column: rank() assigns 1 to every row
      val rows = s.sql(
        """SELECT * FROM (
             SELECT id, RANK() OVER (ORDER BY id % 1) AS rk FROM RANGE(20)
           ) WHERE rk <= 3""").collect()
      assert(rows.length === 20)
    }
  }
}
