package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** The commutative monoids at the heart of the reference
  * (reference core.py:15-64): `zero` = `init`, `reduce` = `proj_fold`,
  * `merge` = `binary_reduce`. Catalyst plans these as
  * partial-aggregate -> exchange -> final-aggregate automatically
  * (ObjectHashAggregateExec), which IS the reference's chunked fold — the
  * chunk loop maps to the task-per-partition boundary, `binary_reduce` to
  * both intra-partition `reduce` and post-shuffle `merge`.
  *
  * Numerical stability is the spec, not an accident (SURVEY.md §2.4.1):
  * every softmax-family state renormalizes by the running max — never a raw
  * `sum(exp(x))`.
  */

/** Buffer for streaming logsumexp: running max + renormalized sum. */
case class LseBuf(mx: Double, s: Double)

/** Streaming logsumexp (reference xentropy.py:10-11,39-44): one exp per row,
  * running-max renormalized. Identity = (-inf, 0). */
class LogSumExpAgg extends Aggregator[Double, LseBuf, Double] {
  def zero: LseBuf = LseBuf(Double.NegativeInfinity, 0.0)
  def reduce(b: LseBuf, x: Double): LseBuf =
    if (x == Double.NegativeInfinity) b
    else if (x <= b.mx) LseBuf(b.mx, b.s + math.exp(x - b.mx))
    else LseBuf(x, b.s * math.exp(b.mx - x) + 1.0)
  def merge(a: LseBuf, b: LseBuf): LseBuf =
    if (a.mx == Double.NegativeInfinity) b
    else if (b.mx == Double.NegativeInfinity) a
    else if (a.mx >= b.mx) LseBuf(a.mx, a.s + b.s * math.exp(b.mx - a.mx))
    else LseBuf(b.mx, b.s + a.s * math.exp(a.mx - b.mx))
  def finish(b: LseBuf): Double =
    if (b.mx == Double.NegativeInfinity) Double.NegativeInfinity
    else b.mx + math.log(b.s)
  def bufferEncoder: Encoder[LseBuf] = Encoders.product[LseBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** DataFrame-callable registrations. The scalar logsumexp stays a
  * `udaf(Aggregator)` (lowers to `ScalaAggregator`, a
  * `TypedImperativeAggregate`; the per-row encoder cost on a bare Double is
  * negligible). The vector-valued monoids are native
  * `TypedImperativeAggregate`s in [[NativeAggs]] — the round-1 Aggregator
  * form paid a ~35× per-row encoder round-trip on the value array
  * (VERDICT.md round 1, "What's wrong" #2). */
object GraftAggs {
  import org.apache.spark.sql.Column

  /** logsumexp(scoreCol) */
  val logSumExp: UserDefinedFunction = udaf(new LogSumExpAgg, ExpressionEncoder[Double]())

  /** logWeightedVec(scoreCol, valueArrayCol) -> struct(z, v): the
    * attention/entropy monoid (reference attention.py:31-44). */
  def logWeightedVec(score: Column, value: Column): Column =
    NativeExprs.toCol(
      LogWeightedVecAgg(NativeExprs.toExpr(score), NativeExprs.toExpr(value))
        .toAggregateExpression())

  /** vecWeightedSum(wCol, vecCol) -> array<double>: Σ w·vec, the MLP
    * hidden-dim fold (reference mlp.py:18-21). */
  def vecWeightedSum(w: Column, v: Column): Column =
    NativeExprs.toCol(
      VecWeightedSumAgg(NativeExprs.toExpr(w), NativeExprs.toExpr(v))
        .toAggregateExpression())
}
