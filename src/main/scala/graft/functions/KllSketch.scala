package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (Apache DataSketches KLL, bundled with
  * Spark) as first-class aggregate expressions — the quantile counterpart
  * of Spark's built-in `hll_sketch_agg`/`hll_union_agg` NDV sketches.
  *
  * Why not `approx_percentile`? Its t-digest buffer is not exposed as a
  * persistable value: every refresh rescans all rows. A KLL sketch is a
  * small binary that MERGES — sketch each ingest batch once, store the
  * bytes, union sketches forever after. That is what incremental catalog
  * statistics need at 100 TB: per-batch work proportional to the batch,
  * never to history. Mergeability is lossless (a merged KLL has the same
  * error bounds as one built over the union); rank error ≈ 1.65% at the
  * default k=200.
  *
  * Aggregation state is the sketch object itself (TypedImperativeAggregate
  * — the same mechanism Spark uses for its own sketch aggregates); no
  * codegen applies to imperative aggregates, and the final quantile
  * extraction ([[KllQuantiles]]) runs once per GROUP, not per row, so
  * CodegenFallback costs nothing measurable.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  // the Column/SQL entry points cast numerics to double up front
  // (AbstractDataType — the ImplicitCastInputTypes route — is private[sql])
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got $other")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of serialized KLL sketches (binary column → merged binary) — the
  * incremental-stats refresh: fold this over stored per-batch sketches. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary (serialized sketch) input, got $other")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Quantile extraction from a serialized KLL sketch:
  * (sketch binary, array<double> ranks) → array<double> values. Runs once
  * per result row (after aggregation), hence CodegenFallback. */
case class KllQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<double>), got (${left.dataType}, ${right.dataType})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kll_quantiles"

  override def nullSafeEval(sketchBytes: Any, ranks: Any): Any = {
    val sketch = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) return null
    val rs = ranks.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(sketch.getQuantiles(rs, QuantileSearchCriteria.INCLUSIVE))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the KLL sketch expressions. */
object KllFunctions {
  val DefaultK = 200

  def kllSketchAgg(value: Column, k: Int = DefaultK): Column =
    Bridge.column(
      KllSketchAgg(Bridge.expression(value.cast("double")), k).toAggregateExpression())

  def kllMergeAgg(sketch: Column, k: Int = DefaultK): Column =
    Bridge.column(
      KllMergeAgg(Bridge.expression(sketch), k).toAggregateExpression())

  def kllQuantiles(sketch: Column, ranks: Seq[Double]): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    Bridge.column(KllQuantiles(
      Bridge.expression(sketch),
      Bridge.expression(array(ranks.map(lit): _*))))
  }
}
