package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-8 determinism hardening: the covariance/PCA pair is bit-exact
  * under any partitioning (fixed-point DECIMAL(38,0) sufficient
  * statistics — the VERDICT r7 directive #1/#2).
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randVecs(n: Int, d: Int): Seq[(Long, Seq[Float])] = {
    // deterministic pseudo-random floats on the float32 grid
    val rng = new scala.util.Random(42)
    (0 until n).map(i => (i.toLong, Seq.fill(d)(rng.nextFloat() - 0.5f)))
  }

  test("embeddingCovariance: bit-identical under partition count and row order") {
    val rows = randVecs(200, 8)
    val base = rows.toDF("vec_id", "e")
    def bits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      RegressionOps.embeddingCovariance(df, col("e"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(3))))
        .sortBy(t => (t._1, t._2)).toSeq
    val a = bits(base.repartition(1))
    val b = bits(base.repartition(13))
    val c = bits(rows.reverse.toDF("vec_id", "e").repartition(5))
    assert(a === b)
    assert(a === c)
  }

  test("pcaProject: bit-identical under partition count and row order") {
    val rows = randVecs(150, 6)
    def bits(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      RegressionOps.pcaProject(df, "vec_id", col("e"))
        .collect()
        .map(r => r.getLong(0) -> java.lang.Double.doubleToLongBits(r.getDouble(1)))
        .toMap
    val a = bits(rows.toDF("vec_id", "e").repartition(1))
    val b = bits(rows.toDF("vec_id", "e").repartition(11))
    val c = bits(rows.reverse.toDF("vec_id", "e").repartition(4))
    assert(a === b)
    assert(a === c)
  }

  test("pcaProject: empty input returns an empty frame, no driver throw") {
    val df = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "e").limit(0)
    val out = RegressionOps.pcaProject(df, "vec_id", col("e"))
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("vec_id", "pc1"))
  }

  test("bootstrapMeanCi: brackets the sample mean, bit-stable under partitioning") {
    val rows = (1L to 500L).map(i => (i, (i % 97) * 100L)) // cents
    val df = rows.toDF("id", "cents")
    def run(d: org.apache.spark.sql.DataFrame) =
      MetricsOps.bootstrapMeanCi(d, col("id"), col("cents")).collect()(0)
    val r = run(df)
    assert(r.getLong(0) === 200L)
    val (lo, hi) = (r.getDouble(1), r.getDouble(2))
    val mean = rows.map(_._2).sum.toDouble / rows.size / 100.0
    assert(lo < mean && mean < hi, s"[$lo, $hi] should bracket $mean")
    // CI of a mean over 500 draws from a bounded distribution is tight
    assert(hi - lo < mean, "CI implausibly wide")
    // deterministic: same bits regardless of partitioning / row order
    val r2 = run(rows.reverse.toDF("id", "cents").repartition(13))
    assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
      java.lang.Double.doubleToLongBits(r2.getDouble(1)))
    assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
      java.lang.Double.doubleToLongBits(r2.getDouble(2)))
  }

  test("bootstrapMeanCi: constant column collapses the CI onto the constant") {
    val df = (1L to 300L).map(i => (i, 700L)).toDF("id", "cents")
    val r = MetricsOps.bootstrapMeanCi(df, col("id"), col("cents"))
      .collect()(0)
    assert(r.getDouble(1) === 7.0 && r.getDouble(2) === 7.0)
  }

  test("cochranArmitage: hand-computed dose-response example") {
    // groups w=0,1,2 with (n=10, pos=1), (10, 3), (10, 7):
    // N=30, R=11, A=17, B=30, C=50 → N·A−B·R=180,
    // denom = 11·19·(30·50−900) = 125400
    val rows =
      (Seq.fill(1)((0, 1)) ++ Seq.fill(9)((0, 0)) ++
        Seq.fill(3)((1, 1)) ++ Seq.fill(7)((1, 0)) ++
        Seq.fill(7)((2, 1)) ++ Seq.fill(3)((2, 0))).map { case (w, y) => (w, y) }
    val r = AssociationOps.cochranArmitage(rows.toDF("w", "y"),
      col("w"), col("y")).collect()(0)
    assert(r.getLong(0) === 30L && r.getLong(1) === 11L)
    val expected = BigDecimal(
      180.0 * math.sqrt(30.0) / math.sqrt(125400.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) === expected)
  }

  test("cochranArmitage: anti-trend flips the sign; degenerate inputs null") {
    val anti =
      (Seq.fill(7)((0, 1)) ++ Seq.fill(3)((0, 0)) ++
        Seq.fill(1)((2, 1)) ++ Seq.fill(9)((2, 0)))
    val r = AssociationOps.cochranArmitage(anti.toDF("w", "y"),
      col("w"), col("y")).collect()(0)
    assert(r.getDouble(2) < 0)
    // all-positive outcome → R = N → null z
    val degen = Seq((0, 1), (1, 1), (2, 1))
    val rd = AssociationOps.cochranArmitage(degen.toDF("w", "y"),
      col("w"), col("y")).collect()(0)
    assert(rd.isNullAt(2))
    // zero score variance → null z
    val flat = Seq((1, 0), (1, 1), (1, 0))
    val rf = AssociationOps.cochranArmitage(flat.toDF("w", "y"),
      col("w"), col("y")).collect()(0)
    assert(rf.isNullAt(2))
  }

  test("bestChangepoint: level shift localized, gain hand-computed") {
    // 1,1,1,9,9,9 → split after t=3: num = 3·3−27·3 = −72,
    // gain = 72²/(3·3·6) = 96; k=2/k=4 give 48
    val df = Seq((1, 1, 1L), (1, 2, 1L), (1, 3, 1L),
      (1, 4, 9L), (1, 5, 9L), (1, 6, 9L)).toDF("u", "t", "v")
    val r = TimeSeriesOps.bestChangepoint(df, "u", col("t"), col("v"))
      .collect()(0)
    assert(r.getInt(1) === 3)
    assert(r.getLong(2) === 6L)
    assert(r.getDouble(3) === 96.0)
  }

  test("bestChangepoint: constant series ties break to the earliest split") {
    val df = (1 to 5).map(t => (1, t, 4L)).toDF("u", "t", "v")
    val r = TimeSeriesOps.bestChangepoint(df, "u", col("t"), col("v"))
      .collect()(0)
    assert(r.getInt(1) === 1 && r.getDouble(3) === 0.0)
  }

  test("groupQuantiles: exact type-7 interpolation per group") {
    // group a: 1..4 → q(0.5) = 2.5, q(0.75) = 3.25
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0)).toDF("g", "v")
    val q = CleaningOps.groupQuantiles(df, "g", "v", 0.5, 0.75)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(q("a") === ((2.5, 3.25)))
    assert(q("b") === ((10.0, 10.0)))
  }

  test("pcaProject: dominant axis recovered (projection magnitudes)") {
    // points along (3,4)/5 with tiny off-axis noise: |pc1| ≈ |v| = 5·t
    val pts = (1 to 40).map { t =>
      val s = if (t % 2 == 0) 1f else -1f
      (t.toLong, Seq(0.06f * t * s, 0.08f * t * s))
    }
    val out = RegressionOps.pcaProject(pts.toDF("vec_id", "e"), "vec_id",
        col("e"))
      .collect().map(r => r.getLong(0) -> math.abs(r.getDouble(1))).toMap
    // row t lies at distance 0.1·t along the axis
    (1 to 40).foreach { t =>
      assert(math.abs(out(t.toLong) - 0.1 * t) < 1e-4,
        s"row $t: ${out(t.toLong)} vs ${0.1 * t}")
    }
  }
}
