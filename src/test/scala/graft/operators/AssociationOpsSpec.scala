package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AssociationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("perfect 2x2 association: chi2 = N, V = 1, MI = ln 2") {
    // the (a,y)/(b,x) cells are EMPTY — χ² must still count their
    // (0−e)²/e mass via the densified grid (each contributes e = 1)
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("u", "v")
    val r = AssociationOps.categoricalAssociation(df, col("u"), col("v"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 2L, 2L)))
    assert(r.getDouble(3) === 4.0)                        // chi2 = N
    assert(r.getDouble(4) === 1.0)                        // Cramér's V
    assert(math.abs(r.getDouble(5) - math.log(2)) < 1e-6) // MI in nats
  }

  test("independent columns: chi2 = 0, V = 0, MI = 0") {
    // uniform product distribution — every cell exactly matches e
    val df = (for { u <- Seq("a", "b"); v <- Seq("x", "y", "z") }
      yield (u, v)).toDF("u", "v")
    val r = AssociationOps.categoricalAssociation(df, col("u"), col("v"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((6L, 2L, 3L)))
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 0.0)
    assert(r.getDouble(5) === 0.0)
  }

  test("constant column: V pinned to 0, not NaN") {
    val df = Seq(("a", "x"), ("a", "y")).toDF("u", "v")
    val r = AssociationOps.categoricalAssociation(df, col("u"), col("v"))
      .collect()(0)
    assert(r.getLong(1) === 1L) // r = 1 → min(r,c)-1 = 0 denominator
    assert(r.getDouble(4) === 0.0)
  }

  test("hand-computed 2x2 with skewed margins") {
    // cells: (a,x)=3 (a,y)=1 (b,x)=1 (b,y)=3; N=8, margins all 4
    // e = 2 everywhere → chi2 = 4·(1²/2) = 2; V = √(2/8) = 0.5
    val df = Seq.fill(3)(("a", "x")) ++ Seq(("a", "y"), ("b", "x")) ++
      Seq.fill(3)(("b", "y"))
    val r = AssociationOps.categoricalAssociation(df.toDF("u", "v"),
      col("u"), col("v")).collect()(0)
    assert(r.getDouble(3) === 2.0)
    assert(r.getDouble(4) === 0.5)
    // MI = 2·(3/8)ln(3/2) + 2·(1/8)ln(1/2)
    val mi = 2 * (3.0 / 8) * math.log(1.5) + 2 * (1.0 / 8) * math.log(0.5)
    assert(math.abs(r.getDouble(5) - mi) < 1e-6)
  }
}
