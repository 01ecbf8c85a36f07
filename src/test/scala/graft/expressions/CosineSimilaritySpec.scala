package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.VectorFns

class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native kernel is bit-identical to the composable expression tree") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = e.select($"vec_id".as("ida"), $"embedding".as("ea"))
      .crossJoin(e.select($"vec_id".as("idb"), $"embedding".as("eb")))
      .filter($"ida" < 20 && $"idb" < 20 && $"ida" < $"idb")
    val both = pairs.select(
      call_function("cosine_sim", $"ea", $"eb").as("native"),
      VectorFns.cosine(VectorFns.toDoubleArr($"ea"), VectorFns.toDoubleArr($"eb"))
        .as("composed"))
    // exact equality: same double operations in the same order
    assert(both.filter($"native" =!= $"composed").count() === 0)
    assert(both.count() === 190)
  }

  test("callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS s").as[Double].collect()
    assert(r(0) === 1.0)
  }

  test("null contract: mismatched lengths and null inputs → null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(1f, 2f, 3f))),
      (None, Some(Array(1f, 2f)))
    ).toDF("a", "b")
    val got = df.select(call_function("cosine_sim", $"a", $"b")).as[Option[Double]].collect()
    assert(got.toSeq === Seq(None, None))
  }

  test("codegen path handles float and double arrays") {
    GraftFunctions.register(spark)
    val mixed = spark.sql(
      """SELECT cosine_sim(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>),
                           array(3.0D, 4.0D)) AS s""").as[Double].collect()
    assert(math.abs(mixed(0) - 1.0) < 1e-12)
  }
}
