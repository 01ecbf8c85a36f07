package graft.expressions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraftExtensionsSpec extends AnyFunSuite {

  test("cosine_sim is injected via the SparkSessionExtensions hook") {
    val base = TestSpark.spark // ensure the shared context exists
    // getOrCreate returns the active session and ignores extensions, so
    // clear it first: the builder then creates a sibling session over the
    // SAME SparkContext with the extensions applied.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val withExt = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = withExt.sql("SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS s")
        .collect()(0).getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)

      // GlobalWindowGuard: strict mode rejects a global (unpartitioned)
      // window; partitioned windows and limit-bounded inputs pass
      withExt.conf.set("spark.graft.failOnGlobalWindow", "true")
      try {
        val bad = withExt.sql(
          "SELECT ROW_NUMBER() OVER (ORDER BY id) FROM RANGE(10)")
        val err = intercept[Exception] { bad.collect() }
        def messages(t: Throwable): Seq[String] =
          Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
        assert(messages(err).exists(_.contains("GlobalWindowGuard")))

        val ok = withExt.sql(
          "SELECT ROW_NUMBER() OVER (PARTITION BY id % 2 ORDER BY id) FROM RANGE(10)")
        assert(ok.collect().length === 10)

        val bounded = withExt.sql(
          "SELECT ROW_NUMBER() OVER (ORDER BY id) FROM (SELECT id FROM RANGE(10) LIMIT 5)")
        assert(bounded.collect().length === 5)
      } finally withExt.conf.unset("spark.graft.failOnGlobalWindow")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
