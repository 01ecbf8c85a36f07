package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass mean/variance via Welford's online algorithm with
  * Chan's parallel merge (both public, standard numerical methods): the
  * `Dataset[T]`/`Aggregator` face of the engine, complementing the
  * expression-tree and window surfaces.
  *
  * Why it exists: naive `sum(x²) − sum(x)²/n` cancels catastrophically when
  * the mean dwarfs the spread (variance of values ~1e9 apart by ~1);
  * Welford's running (count, mean, M2) state is numerically stable, the
  * buffer is three numbers regardless of input size, and the merge is
  * associative — partials combine map-side and across partitions in any
  * order, the contract a distributed aggregate must satisfy (asserted
  * under repartitioning in WelfordSpec).
  */
object WelfordVariance {

  /** (count, mean, M2 = Σ(x−mean)²) running state. */
  case class State(n: Long, mean: Double, m2: Double)
  case class Result(n: Long, mean: Double, variance: Double, stddev: Double)

  private object Agg extends Aggregator[Double, State, Result] {
    override def zero: State = State(0L, 0.0, 0.0)

    override def reduce(s: State, x: Double): State = {
      val n = s.n + 1
      val delta = x - s.mean
      val mean = s.mean + delta / n
      State(n, mean, s.m2 + delta * (x - mean))
    }

    // Chan et al. pairwise merge: exact-state combination of two partials
    override def merge(a: State, b: State): State =
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val delta = b.mean - a.mean
        State(n,
          a.mean + delta * b.n / n,
          a.m2 + b.m2 + delta * delta * a.n * b.n / n)
      }

    override def finish(s: State): Result =
      if (s.n < 2) Result(s.n, if (s.n == 0) Double.NaN else s.mean, Double.NaN, Double.NaN)
      else {
        val v = s.m2 / (s.n - 1) // sample variance, matching var_samp/STDDEV_SAMP
        Result(s.n, s.mean, v, math.sqrt(v))
      }

    override def bufferEncoder: Encoder[State] = Encoders.product[State]
    override def outputEncoder: Encoder[Result] = Encoders.product[Result]
  }

  /** The typed column: `ds.select(WelfordVariance.typed)` or
    * `ds.groupByKey(...).agg(WelfordVariance.typed)`.
    */
  def typed: TypedColumn[Double, Result] = Agg.toColumn
}
