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

case class LWIn(score: Double, value: Seq[Double])
case class LWBuf(z: Double, v: Array[Double])
case class LWOut(z: Double, v: Seq[Double])

/** Log-weighted running mean — the attention/entropy monoid (reference
  * attention.py:31-44, entropy.py:18-23): state
  * `(z = logsumexp of scores, v = softmax-weighted mean of values)`;
  * identity `(-inf, null)`; merge
  * `z' = logaddexp(z_a, z_b); v' = v_a*e^{z_a-z'} + v_b*e^{z_b-z'}`.
  * Scalar entropy case = D=1 value vector. */
class LogWeightedMeanAgg extends Aggregator[LWIn, LWBuf, LWOut] {
  def zero: LWBuf = LWBuf(Double.NegativeInfinity, null)

  // combine (za, va) ⊕ (zb, vb); may reuse/mutate `va` (owned by the buffer)
  private def comb(za: Double, va: Array[Double], zb: Double, vb: Array[Double],
                   mutableA: Boolean): LWBuf =
    if (zb == Double.NegativeInfinity) LWBuf(za, va)
    else if (za == Double.NegativeInfinity) LWBuf(zb, if (mutableA) vb else vb.clone())
    else {
      val z =
        if (za >= zb) za + math.log1p(math.exp(zb - za))
        else zb + math.log1p(math.exp(za - zb))
      val wa = math.exp(za - z)
      val wb = math.exp(zb - z)
      val out = if (mutableA) va else new Array[Double](va.length)
      var i = 0
      while (i < va.length) { out(i) = va(i) * wa + vb(i) * wb; i += 1 }
      LWBuf(z, out)
    }

  def reduce(b: LWBuf, in: LWIn): LWBuf = {
    // copy the row's value once (row buffers are reused by Spark)
    if (b.z == Double.NegativeInfinity) LWBuf(in.score, in.value.toArray)
    else comb(b.z, b.v, in.score, toArr(in.value), mutableA = true)
  }
  private def toArr(s: Seq[Double]): Array[Double] = s match {
    case w: scala.collection.mutable.ArraySeq[Double] @unchecked =>
      w.array.asInstanceOf[Array[Double]]
    case other => other.toArray
  }
  def merge(a: LWBuf, b: LWBuf): LWBuf = comb(a.z, a.v, b.z, b.v, mutableA = true)
  def finish(b: LWBuf): LWOut =
    LWOut(b.z, if (b.v == null) Seq.empty else b.v.toSeq)
  def bufferEncoder: Encoder[LWBuf] = Encoders.product[LWBuf]
  def outputEncoder: Encoder[LWOut] = Encoders.product[LWOut]
}

/** DataFrame-callable registrations. `udaf(Aggregator)` lowers to a
  * `ScalaAggregator` (a `TypedImperativeAggregate`), so the buffer lives as
  * a JVM object inside the hash map and only serializes on spill/shuffle. */
object GraftAggs {
  /** logsumexp(scoreCol) */
  val logSumExp: UserDefinedFunction = udaf(new LogSumExpAgg, ExpressionEncoder[Double]())
  /** logWeightedMean(scoreCol, valueArrayCol) -> struct(z, v) */
  val logWeightedMean: UserDefinedFunction = udaf(new LogWeightedMeanAgg, ExpressionEncoder[LWIn]())
}
