package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Exp, Greatest, Log}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Streaming logsumexp as a DeclarativeAggregate: the whole monoid —
  * identity (-inf, 0), running-max renormalized update, stable merge
  * (reference xentropy.py:10-11,39-44) — is expressed as Catalyst
  * expressions, so the aggregate runs fully inside whole-stage codegen
  * with two primitive buffer slots and no object buffer or encoder at all
  * (the previous udaf form paid a ScalaAggregator round-trip per row).
  *
  * Inputs are assumed finite or null (scores are dot products); nulls are
  * skipped, -inf inputs are treated as absent mass like the monoid
  * identity.
  */
case class LogSumExpDecl(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_logsumexp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires double, got $t")
  }

  private val negInf = Literal(Double.NegativeInfinity)
  private lazy val mx = AttributeReference("mx", DoubleType, nullable = false)()
  private lazy val s = AttributeReference("s", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(mx, s)
  override lazy val initialValues: Seq[Expression] = Seq(negInf, Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val skip = IsNull(child) || child === negInf
    Seq(
      If(skip, mx, If(child > mx, child, mx)),
      // new max -> renormalize the running sum; exp(-inf - x) = 0 makes the
      // first row come out as s = 1 without a special case
      If(skip, s,
        If(child > mx, s * Exp(mx - child) + Literal(1.0), s + Exp(child - mx))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Greatest(Seq(mx.left, mx.right)),
    // empty-side guards: exp(-inf - -inf) is NaN, so pick the other side
    If(mx.left === negInf, s.right,
      If(mx.right === negInf, s.left,
        If(mx.left >= mx.right,
          s.left + s.right * Exp(mx.right - mx.left),
          s.right + s.left * Exp(mx.left - mx.right)))))

  override lazy val evaluateExpression: Expression =
    If(mx === negInf, negInf, mx + Log(s))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LogSumExpDecl =
    copy(child = newChildren(0))
}
