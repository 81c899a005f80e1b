package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

private[functions] object NativeAggChecks {
  def scoreVec(name: String, score: Expression, value: Expression): TypeCheckResult =
    (score.dataType, value.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (s, v) => TypeCheckResult.TypeCheckFailure(
        s"$name requires (double, array<double>), got ($s, $v)")
    }
}

/** Native `TypedImperativeAggregate` forms of the reference monoids
  * (reference core.py:15-64: `zero`=`init`, `update`=`proj_fold`,
  * `merge`=`binary_reduce`). These replace the round-1 `udaf(Aggregator)`
  * wrappers, whose per-row `ExpressionEncoder` round-trip of the
  * `(score, Seq[Double])` input was ~35× of the attention runtime: here the
  * child expressions are evaluated directly against the input row and the
  * value array is read element-wise off the `ArrayData` buffer — no boxing,
  * no encoder, one primitive `double[]` per group.
  *
  * The buffer lives as a JVM object inside `ObjectHashAggregateExec`'s hash
  * map; `serialize`/`deserialize` (plain ByteBuffer layout) run only on
  * spill and on the partial→final exchange, which is exactly the reference's
  * chunk-boundary `binary_reduce` granularity.
  */

/** Mutable buffer: z = running logsumexp of scores; v = softmax-weighted
  * running mean of value vectors (null until the first row — the monoid
  * identity `(-inf, ·)` of reference attention.py:43). */
final class LWVBuf(var z: Double, var v: Array[Double]) extends Serializable

/** The attention/entropy monoid (reference attention.py:31-44,
  * entropy.py:18-23): `(z_a,v_a) ⊕ (z_b,v_b) = (logaddexp(z_a,z_b),
  * v_a·e^{z_a−z'} + v_b·e^{z_b−z'})` — numerically-stable streaming softmax
  * (never a raw `sum(exp)`, SURVEY.md §2.4.1). Output struct (z, v). */
case class LogWeightedVecAgg(
    score: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LWVBuf] {

  override def children: Seq[Expression] = Seq(score, value)
  override def checkInputDataTypes(): TypeCheckResult =
    NativeAggChecks.scoreVec(prettyName, score, value)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("z", DoubleType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false))))
  override def prettyName: String = "graft_log_weighted_vec"

  override def createAggregationBuffer(): LWVBuf =
    new LWVBuf(Double.NegativeInfinity, null)

  override def update(b: LWVBuf, input: InternalRow): LWVBuf = {
    val s = score.eval(input)
    if (s == null) return b
    val arr = value.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return b
    val zb = s.asInstanceOf[Double]
    if (b.v == null) {
      val n = arr.numElements()
      val v = new Array[Double](n)
      var i = 0
      while (i < n) { v(i) = arr.getDouble(i); i += 1 }
      b.z = zb
      b.v = v
      b
    } else combineInto(b, zb, arr.getDouble)
  }

  override def merge(a: LWVBuf, o: LWVBuf): LWVBuf =
    if (o.v == null) a
    else if (a.v == null) { a.z = o.z; a.v = o.v; a }
    else combineInto(a, o.z, o.v)

  /** a ⊕ (zb, vb), mutating a in place (a owns its array). */
  private def combineInto(a: LWVBuf, zb: Double, vb: Int => Double): LWVBuf = {
    if (zb == Double.NegativeInfinity) return a
    val za = a.z
    val v = a.v
    val n = v.length
    if (za == Double.NegativeInfinity) {
      var i = 0
      while (i < n) { v(i) = vb(i); i += 1 }
      a.z = zb
      return a
    }
    val z =
      if (za >= zb) za + math.log1p(math.exp(zb - za))
      else zb + math.log1p(math.exp(za - zb))
    val wa = math.exp(za - z)
    val wb = math.exp(zb - z)
    var i = 0
    while (i < n) { v(i) = v(i) * wa + vb(i) * wb; i += 1 }
    a.z = z
    a
  }

  override def eval(b: LWVBuf): Any = {
    val arr =
      if (b.v == null) new GenericArrayData(Array.empty[Double])
      else new GenericArrayData(b.v)
    InternalRow(b.z, arr)
  }

  override def serialize(b: LWVBuf): Array[Byte] = {
    val n = if (b.v == null) -1 else b.v.length
    val bb = ByteBuffer.allocate(12 + math.max(n, 0) * 8)
    bb.putDouble(b.z)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(b.v(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LWVBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val z = bb.getDouble
    val n = bb.getInt
    if (n < 0) new LWVBuf(z, null)
    else {
      val v = new Array[Double](n)
      var i = 0
      while (i < n) { v(i) = bb.getDouble; i += 1 }
      new LWVBuf(z, v)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LogWeightedVecAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LogWeightedVecAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LogWeightedVecAgg =
    copy(score = newChildren(0), value = newChildren(1))
}

/** Elementwise weighted vector sum: `acc += w · vec` — the MLP hidden-fold
  * monoid (reference mlp.py:18-21: plain `+` over B×N chunks) lifted to one
  * vector-valued aggregate so the pair stream is NEVER exploded per element:
  * only the M×D result is. Identity = null (treated as the zero vector). */
final class VecSumBuf(var v: Array[Double]) extends Serializable

case class VecWeightedSumAgg(
    weight: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuf] {

  override def children: Seq[Expression] = Seq(weight, value)
  override def checkInputDataTypes(): TypeCheckResult =
    NativeAggChecks.scoreVec(prettyName, weight, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_weighted_sum"

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf(null)

  override def update(b: VecSumBuf, input: InternalRow): VecSumBuf = {
    val w = weight.eval(input)
    if (w == null) return b
    val arr = value.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return b
    val wd = w.asInstanceOf[Double]
    if (b.v == null) b.v = new Array[Double](arr.numElements())
    val v = b.v
    val n = v.length
    var i = 0
    while (i < n) { v(i) += wd * arr.getDouble(i); i += 1 }
    b
  }

  override def merge(a: VecSumBuf, o: VecSumBuf): VecSumBuf = {
    if (o.v == null) return a
    if (a.v == null) { a.v = o.v; return a }
    val v = a.v
    val n = v.length
    var i = 0
    while (i < n) { v(i) += o.v(i); i += 1 }
    a
  }

  override def eval(b: VecSumBuf): Any =
    new GenericArrayData(if (b.v == null) Array.empty[Double] else b.v)

  override def serialize(b: VecSumBuf): Array[Byte] = {
    val n = if (b.v == null) -1 else b.v.length
    val bb = ByteBuffer.allocate(4 + math.max(n, 0) * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(b.v(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    if (n < 0) new VecSumBuf(null)
    else {
      val v = new Array[Double](n)
      var i = 0
      while (i < n) { v(i) = bb.getDouble; i += 1 }
      new VecSumBuf(v)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecWeightedSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecWeightedSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecWeightedSumAgg =
    copy(weight = newChildren(0), value = newChildren(1))
}

/** Mutable buffer for [[ArgMaxPertAgg]]: the lexicographic max of
  * (pert, sc, k_id) seen so far; `set` = false is the monoid identity. */
final class ArgMaxBuf(var pert: Double, var sc: Double, var kId: Long,
                      var set: Boolean) extends Serializable

/** The Gumbel-max sampler monoid (reference sampling.py:5-48, via the
  * exact-argmax reformulation of SURVEY §2.4.3) as a native
  * `TypedImperativeAggregate`: lexicographic max over
  * (pert, sc, k_id) — EXACTLY `max(struct(pert, sc, k_id))`'s ordering,
  * so results are bit-identical to the declarative form it replaces.
  *
  * Why it exists (r13): a declarative `max` over a STRUCT has a
  * non-primitive buffer, which disqualifies `HashAggregateExec`; mixed
  * with the codegen'd logsumexp the whole sampler aggregation fell to
  * `SortAggregate`, sorting the full M×N pair stream in every mode —
  * measured as sampler's kernel_ratio floor and ~0.2 s of its wall.
  * A TypedImperativeAggregate in the mix flips the plan to
  * `ObjectHashAggregateExec`: per-row hash update into M buffers, no
  * pair-stream sort. */
case class ArgMaxPertAgg(
    pert: Expression,
    sc: Expression,
    kId: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxBuf] {

  override def children: Seq[Expression] = Seq(pert, sc, kId)
  override def checkInputDataTypes(): TypeCheckResult =
    (pert.dataType, sc.dataType, kId.dataType) match {
      case (DoubleType, DoubleType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (p, s, k) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, double, bigint), got ($p, $s, $k)")
    }
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("pert", DoubleType, nullable = false),
    StructField("sc", DoubleType, nullable = false),
    StructField("k_id", LongType, nullable = false)))
  override def prettyName: String = "graft_argmax_pert"

  override def createAggregationBuffer(): ArgMaxBuf =
    new ArgMaxBuf(Double.NegativeInfinity, Double.NegativeInfinity,
      Long.MinValue, set = false)

  override def update(b: ArgMaxBuf, input: InternalRow): ArgMaxBuf = {
    val p = pert.eval(input)
    val s = sc.eval(input)
    val k = kId.eval(input)
    if (p == null || s == null || k == null) return b
    maybeTake(b, p.asInstanceOf[Double], s.asInstanceOf[Double],
      k.asInstanceOf[Long])
  }

  override def merge(a: ArgMaxBuf, o: ArgMaxBuf): ArgMaxBuf =
    if (!o.set) a else maybeTake(a, o.pert, o.sc, o.kId)

  /** Lexicographic (pert, sc, k_id) — identical to struct ordering,
    * INCLUDING NaN semantics (ADVICE r13 #5): Spark's struct max orders
    * doubles with nanSafeCompareDoubles (NaN ranks largest and equals
    * itself; ±0.0 compare equal via `==`), whereas primitive `>`/`==`
    * would make NaN never win and never tie. [[nanSafeCmp]] reproduces
    * that ordering exactly, so the bit-identical claim holds on NaN
    * perts/scores too. */
  private def nanSafeCmp(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || (x == y)) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1
    else -1
  }

  private def maybeTake(b: ArgMaxBuf, p: Double, s: Double,
                        k: Long): ArgMaxBuf = {
    val cp = nanSafeCmp(p, b.pert)
    val greater = !b.set || cp > 0 || (cp == 0 && {
      val cs = nanSafeCmp(s, b.sc)
      cs > 0 || (cs == 0 && k > b.kId)
    })
    if (greater) { b.pert = p; b.sc = s; b.kId = k; b.set = true }
    b
  }

  override def eval(b: ArgMaxBuf): Any = InternalRow(b.pert, b.sc, b.kId)

  override def serialize(b: ArgMaxBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(25)
    bb.putDouble(b.pert)
    bb.putDouble(b.sc)
    bb.putLong(b.kId)
    bb.put(if (b.set) 1.toByte else 0.toByte)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArgMaxBuf = {
    val bb = ByteBuffer.wrap(bytes)
    new ArgMaxBuf(bb.getDouble, bb.getDouble, bb.getLong, bb.get() == 1)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxPertAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxPertAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArgMaxPertAgg =
    copy(pert = newChildren(0), sc = newChildren(1), kId = newChildren(2))
}
