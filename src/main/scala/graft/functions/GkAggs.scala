package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.types._

/** Greenwald–Khanna quantile sketches with an EXPLICIT two-level
  * shard→merge surface.
  *
  * Spark's `approx_percentile` runs the same GK summary internally, but its
  * partial→final merge is invisible to the query — you cannot grade what
  * you cannot see. These aggregates expose the sketch STATE as a binary
  * column ([[GkSketchAgg]]), union-merge a column of states
  * ([[GkMergeAgg]]), and query the result ([[GkQuery]]), so a graded query
  * can build per-shard sketches, merge them, and check the merge against
  * both the one-shot sketch and the exact quantiles — the
  * `vocab_sketch_merge` (HLL) pattern applied to the sketch whose merge
  * actually degrades: GK rank error COMPOUNDS under merge
  * (ε₁·N₁ + ε₂·N₂ over N₁+N₂ plus the post-merge compress), unlike HLL's
  * lossless register-max. This is the reference's `binary_reduce` over
  * partial states (reference README.md:24-33) made first-class.
  *
  * The serialized state is the summary's compressed tuple array —
  * O((1/ε)·log(εN)) entries regardless of data size — so at 100 TB a
  * per-(key, shard) sketch is a few KB riding one shuffle, and the merge
  * is driver-free associative reduction: exactly the state an hourly→daily
  * →weekly quantile rollup persists and re-merges.
  *
  * Sketch CONTENT depends on insertion order (Spark row order is not
  * deterministic across runs), so graded queries must emit order-robust
  * derivations: the rank-theorem BOOLEANS, never raw sketch values.
  */
private[functions] object GkSer {
  /** compressed summary → (relativeError, count, tuples) byte layout. */
  def toBytes(qs0: QuantileSummaries): Array[Byte] = {
    val qs = if (qs0.compressed) qs0 else qs0.compress()
    val s = qs.sampled
    val bb = ByteBuffer.allocate(20 + s.length * 24)
    bb.putDouble(qs.relativeError)
    bb.putLong(qs.count)
    bb.putInt(s.length)
    s.foreach { st => bb.putDouble(st.value); bb.putLong(st.g); bb.putLong(st.delta) }
    bb.array()
  }

  def fromBytes(b: Array[Byte]): QuantileSummaries = {
    val bb = ByteBuffer.wrap(b)
    val eps = bb.getDouble
    val count = bb.getLong
    val n = bb.getInt
    val s = Array.fill(n)(Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, eps, s, count, true)
  }

  def compressed(qs: QuantileSummaries): QuantileSummaries =
    if (qs.compressed) qs else qs.compress()
}

final class GkBuf(var qs: QuantileSummaries) extends Serializable

/** `gk_sketch(value, ε)` → binary: a GK summary of the group's values with
  * rank-error guarantee ε·N, emitted as serialized state. */
case class GkSketchAgg(
    child: Expression,
    eps: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GkBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires double, got $t")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_gk_sketch"

  override def createAggregationBuffer(): GkBuf =
    new GkBuf(new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, eps))

  override def update(b: GkBuf, input: InternalRow): GkBuf = {
    val v = child.eval(input)
    if (v != null) b.qs = b.qs.insert(v.asInstanceOf[Double])
    b
  }

  override def merge(b: GkBuf, o: GkBuf): GkBuf = {
    b.qs = GkSer.compressed(b.qs).merge(GkSer.compressed(o.qs))
    b
  }

  override def eval(b: GkBuf): Any = GkSer.toBytes(b.qs)
  override def serialize(b: GkBuf): Array[Byte] = GkSer.toBytes(b.qs)
  override def deserialize(bytes: Array[Byte]): GkBuf =
    new GkBuf(GkSer.fromBytes(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): GkSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GkSketchAgg =
    copy(child = newChildren(0))
}

/** `gk_merge(sketch)` → binary: the union-merge of a column of serialized
  * GK states — the graded `binary_reduce`. Null/absent shards are skipped;
  * an all-null group yields null. */
case class GkMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GkBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $t")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_gk_merge"

  override def createAggregationBuffer(): GkBuf = new GkBuf(null)

  override def update(b: GkBuf, input: InternalRow): GkBuf = {
    val v = child.eval(input)
    if (v != null) {
      val o = GkSer.fromBytes(v.asInstanceOf[Array[Byte]])
      b.qs = if (b.qs == null) o else GkSer.compressed(b.qs).merge(o)
    }
    b
  }

  override def merge(b: GkBuf, o: GkBuf): GkBuf = {
    if (o.qs != null)
      b.qs = if (b.qs == null) o.qs
             else GkSer.compressed(b.qs).merge(GkSer.compressed(o.qs))
    b
  }

  override def eval(b: GkBuf): Any =
    if (b.qs == null) null else GkSer.toBytes(b.qs)
  override def serialize(b: GkBuf): Array[Byte] =
    if (b.qs == null) Array.empty[Byte] else GkSer.toBytes(b.qs)
  override def deserialize(bytes: Array[Byte]): GkBuf =
    new GkBuf(if (bytes.isEmpty) null else GkSer.fromBytes(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GkMergeAgg =
    copy(child = newChildren(0))
}

/** `gk_query(sketch, p)` → double: the p-quantile estimate held by a
  * serialized GK state (null for an empty sketch). Scalar, one row per
  * group downstream of the aggregates — never in a per-row hot path. */
case class GkQuery(child: Expression, p: Double)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $t")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_gk_query"

  override protected def nullSafeEval(bytes: Any): Any =
    GkSer.fromBytes(bytes.asInstanceOf[Array[Byte]]).query(p).orNull

  override protected def withNewChildInternal(newChild: Expression): GkQuery =
    copy(child = newChild)
}

/** Column-API surface of the GK family. */
object GkOps {
  def gkSketch(value: Column, eps: Double): Column =
    NativeExprs.toCol(
      GkSketchAgg(NativeExprs.toExpr(value), eps).toAggregateExpression())

  def gkMerge(sketch: Column): Column =
    NativeExprs.toCol(
      GkMergeAgg(NativeExprs.toExpr(sketch)).toAggregateExpression())

  def gkQuery(sketch: Column, p: Double): Column =
    NativeExprs.toCol(GkQuery(NativeExprs.toExpr(sketch), p))
}
