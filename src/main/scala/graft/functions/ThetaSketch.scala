package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Theta sketches (Apache DataSketches, bundled with Spark) —
  * distinct-counting with full SET EXPRESSIONS, which HLL cannot do:
  * union AND intersection AND difference of sketches, so "customers in
  * segment A but not B" style questions run over per-segment sketches
  * without re-reading either side. Below the sketch's nominal entries
  * (2^12 by default) estimates are exact; beyond, relative error is
  * ~1/sqrt(2^lgK) with published bounds for every set operation.
  */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(CompactSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Shared plumbing for the binary scalar set operations (binary, binary)
  * → binary. Each runs once per (already aggregated) result row, so
  * CodegenFallback costs nothing measurable. */
sealed abstract class ThetaBinaryOp extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary) sketches, got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  protected def op(a: Sketch, b: Sketch): CompactSketch

  override def nullSafeEval(l: Any, r: Any): Any =
    op(CompactSketch.heapify(Memory.wrap(l.asInstanceOf[Array[Byte]])),
       CompactSketch.heapify(Memory.wrap(r.asInstanceOf[Array[Byte]]))).toByteArray
}

case class ThetaUnion(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_union"
  override protected def op(a: Sketch, b: Sketch): CompactSketch =
    SetOperation.builder().buildUnion().union(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class ThetaIntersect(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_intersect"
  override protected def op(a: Sketch, b: Sketch): CompactSketch =
    SetOperation.builder().buildIntersection().intersect(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class ThetaAnotB(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_a_not_b"
  override protected def op(a: Sketch, b: Sketch): CompactSketch =
    SetOperation.builder().buildANotB().aNotB(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Distinct-count estimate of a serialized theta sketch. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch input, got $other")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "theta_estimate"
  override def nullSafeEval(input: Any): Any =
    CompactSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for the theta sketch expressions. */
object ThetaFunctions {
  def thetaSketchAgg(value: Column): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(value)).toAggregateExpression())
  def thetaUnion(a: Column, b: Column): Column =
    Bridge.column(ThetaUnion(Bridge.expression(a), Bridge.expression(b)))
  def thetaIntersect(a: Column, b: Column): Column =
    Bridge.column(ThetaIntersect(Bridge.expression(a), Bridge.expression(b)))
  def thetaAnotB(a: Column, b: Column): Column =
    Bridge.column(ThetaAnotB(Bridge.expression(a), Bridge.expression(b)))
  def thetaEstimate(sketch: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expression(sketch)))
}
