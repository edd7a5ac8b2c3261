package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Population variance via Welford/Chan parallel merge — the typed
  * `Aggregator` tier of the extension ladder (vs the `InternalRow`-level
  * `TypedImperativeAggregate` of TopKAgg/SpaceSavingAgg): case-class
  * buffer, Encoder-driven serialization, usable as a `TypedColumn` on
  * `Dataset[Double]` or via `.toColumn` in untyped aggs.
  *
  * Numerically stable at any scale: the naive E[x²]−E[x]² form cancels
  * catastrophically once mean² ≫ variance; Welford's running (mean, M2)
  * and Chan's pairwise merge keep full precision per partition and
  * across the shuffle. The decimal-component formulation
  * (q_variance_exact) is the cross-engine-exact twin; this is the
  * streaming-friendly one.
  */
final case class WelfordState(n: Long, mean: Double, m2: Double)

object WelfordVar extends Aggregator[Double, WelfordState, Double] {
  type State = WelfordState
  private def State(n: Long, mean: Double, m2: Double) = WelfordState(n, mean, m2)

  override def zero: State = State(0L, 0.0, 0.0)

  override def reduce(s: State, x: Double): State = {
    val n = s.n + 1
    val d = x - s.mean
    val mean = s.mean + d / n
    State(n, mean, s.m2 + d * (x - mean))
  }

  /** Chan et al. pairwise combination (order-insensitive up to fp). */
  override def merge(a: State, b: State): State =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      State(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n.toDouble * b.n / n)
    }

  override def finish(s: State): Double = if (s.n == 0) Double.NaN else s.m2 / s.n

  override def bufferEncoder: Encoder[State] = Encoders.product[State]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
