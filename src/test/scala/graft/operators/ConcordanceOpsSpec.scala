package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ConcordanceOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(rows: Seq[(Long, Int, Double)]): (Long, Long, Long) = {
    var perm = 0L; var conc = 0L; var tied = 0L
    for ((ti, ei, ri) <- rows if ei == 1; (tj, _, rj) <- rows if ti < tj) {
      perm += 1
      if (ri > rj) conc += 1 else if (ri == rj) tied += 1
    }
    (perm, conc, tied)
  }

  private def run(rows: Seq[(Long, Int, Double)]): (Long, Long, Long, Long) = {
    val r = ConcordanceOps.cIndex(rows.toDF("t", "e", "r"),
      $"t", $"e", $"r").collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("distributed counts equal the O(n²) reference on randomized data") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 4) {
      // heavy time ties + some risk ties to exercise every exclusion rule
      val rows = Seq.fill(300 + 100 * trial)((rnd.nextInt(40).toLong,
        if (rnd.nextBoolean()) 1 else 0, rnd.nextInt(25).toDouble))
      val (perm, conc, tied) = brute(rows)
      val (n, p2, c2, t2) = run(rows)
      assert(n === rows.length.toLong, s"trial $trial n")
      assert((p2, c2, t2) === (perm, conc, tied), s"trial $trial counts")
    }
  }

  test("perfectly anti-concordant risk (higher risk → later event) → C = 0") {
    // distinct times, risk increasing with time → every permissible pair
    // has r_i < r_j → zero concordant, zero ties
    val rows = (1 to 50).map(i => (i.toLong, 1, i.toDouble))
    val r = ConcordanceOps.cIndex(rows.toDF("t", "e", "r"),
      $"t", $"e", $"r").collect()(0)
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
    assert(r.getDouble(4) === 0.0)
    assert(r.getLong(1) === 50L * 49 / 2)
  }

  test("perfect concordance (higher risk → earlier event) → C = 1") {
    val rows = (1 to 50).map(i => (i.toLong, 1, (51 - i).toDouble))
    val r = ConcordanceOps.cIndex(rows.toDF("t", "e", "r"),
      $"t", $"e", $"r").collect()(0)
    assert(r.getDouble(4) === 1.0)
  }

  test("censored subjects anchor no pairs but serve as later comparators") {
    // one event at t=1 (risk 2), one censored at t=2 (risk 1):
    // the single permissible pair is concordant; reversed roles yield none
    val r1 = ConcordanceOps.cIndex(Seq((1L, 1, 2.0), (2L, 0, 1.0)).toDF("t", "e", "r"),
      $"t", $"e", $"r").collect()(0)
    assert(r1.getLong(1) === 1L && r1.getLong(2) === 1L)
    val r2 = ConcordanceOps.cIndex(Seq((1L, 0, 2.0), (2L, 1, 1.0)).toDF("t", "e", "r"),
      $"t", $"e", $"r").collect()(0)
    assert(r2.getLong(1) === 0L)
  }

  test("plan width stays constant at 512 buckets (r7 verdict #5)") {
    // the former formulation carried one aggregate column per shuffle
    // partition; at parts=512 every physical node must stay narrow, and
    // the counts must still equal the O(n²) reference
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(400)((rnd.nextInt(30).toLong,
      if (rnd.nextBoolean()) 1 else 0, rnd.nextInt(20).toDouble))
    val df = ConcordanceOps.cIndex(rows.toDF("t", "e", "r"),
      $"t", $"e", $"r", parts = 512)
    val widths = df.queryExecution.executedPlan.collect {
      case p => p.output.size
    }
    assert(widths.max < 64,
      s"a plan node is ${widths.max} columns wide — width scales with parts")
    val (perm, conc, tied) = brute(rows)
    val r = df.collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === (perm, conc, tied))
  }
}
