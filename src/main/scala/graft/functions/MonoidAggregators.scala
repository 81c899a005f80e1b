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

/** Typeclass mirror of the reference's monoid contract: `zero` ↔ `init`,
  * `combine` ↔ `binary_reduce` (reference core.py:15-23). */
trait Monoid[B] extends Serializable {
  def zero: B
  def combine(a: B, b: B): B
}

/** Generic factory mirroring `mk_GeMMMapReduce` (reference core.py:15-64):
  * monoid + per-row lift (↔ `proj_fold`) + output projection → a Spark
  * `Aggregator`, which Catalyst plans as partial → exchange → final — the
  * execution the reference hand-rolls as its chunk loop. New monoids
  * (sketches, top-k, ...) get partial/merge/spill handling for free.
  *
  * Extensibility path; the vector-heavy hot-path monoids remain native
  * `TypedImperativeAggregate`s ([[LogWeightedVecAgg]], [[VecWeightedSumAgg]])
  * to skip the per-row encoder. */
object FoldAggregator {
  def apply[IN, B, OUT](m: Monoid[B], lift: IN => B, project: B => OUT)(
      implicit be: Encoder[B], oe: Encoder[OUT]): Aggregator[IN, B, OUT] =
    new Aggregator[IN, B, OUT] {
      def zero: B = m.zero
      def reduce(b: B, in: IN): B = m.combine(b, lift(in))
      def merge(a: B, b: B): B = m.combine(a, b)
      def finish(b: B): OUT = project(b)
      def bufferEncoder: Encoder[B] = be
      def outputEncoder: Encoder[OUT] = oe
    }
}

/** Buffer for streaming logsumexp: running max + renormalized sum. */
case class LseBuf(mx: Double, s: Double)

/** The logsumexp monoid (reference xentropy.py:10-11,39-44): running-max
  * renormalized — never a raw sum(exp). Identity = (-inf, 0). */
object LseMonoid extends Monoid[LseBuf] {
  def zero: LseBuf = LseBuf(Double.NegativeInfinity, 0.0)
  def combine(a: LseBuf, b: LseBuf): LseBuf =
    if (a.mx == Double.NegativeInfinity) b
    else if (b.mx == Double.NegativeInfinity) a
    else if (a.mx >= b.mx) LseBuf(a.mx, a.s + b.s * math.exp(b.mx - a.mx))
    else LseBuf(b.mx, b.s + a.s * math.exp(a.mx - b.mx))
  def finish(b: LseBuf): Double =
    if (b.mx == Double.NegativeInfinity) Double.NegativeInfinity
    else b.mx + math.log(b.s)
}

/** Streaming logsumexp built from the generic factory: a single score x
  * lifts to the singleton state (x, 1). */
class LogSumExpAgg extends Aggregator[Double, LseBuf, Double] {
  private val inner = FoldAggregator[Double, LseBuf, Double](
    LseMonoid, x => LseBuf(x, 1.0), LseMonoid.finish)(
    Encoders.product[LseBuf], Encoders.scalaDouble)
  def zero: LseBuf = inner.zero
  def reduce(b: LseBuf, x: Double): LseBuf = inner.reduce(b, x)
  def merge(a: LseBuf, b: LseBuf): LseBuf = inner.merge(a, b)
  def finish(b: LseBuf): Double = inner.finish(b)
  def bufferEncoder: Encoder[LseBuf] = inner.bufferEncoder
  def outputEncoder: Encoder[Double] = inner.outputEncoder
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

  /** logsumexp(scoreCol): fully-codegen [[LogSumExpDecl]] — two primitive
    * buffer slots, no object buffer or encoder. ([[LogSumExpAgg]] remains
    * as the FoldAggregator-built reference implementation and the
    * extension-path example.) */
  def logSumExp(score: Column): Column =
    NativeExprs.toCol(
      LogSumExpDecl(NativeExprs.toExpr(score)).toAggregateExpression())

  /** the Aggregator form, for users extending via [[FoldAggregator]]. */
  val logSumExpUdaf: UserDefinedFunction =
    udaf(new LogSumExpAgg, ExpressionEncoder[Double]())

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
