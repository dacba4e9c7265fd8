package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL quantile sketch (DataSketches) as a TypedImperativeAggregate —
  * the re-aggregatable QUANTILE companion to the HLL distinct-count
  * union (`agg_hll_sketch_union`) and the Misra-Gries frequency sketch:
  * one pass, no global sort, partial buffers of O(k·log(n/k)) doubles
  * merged pairwise across partitions. At k=200 the normalized rank
  * error is ~1.65% (two-sided, 99% confidence) — KllQuantilesSpec
  * brackets every reported quantile between the exact quantiles at
  * rank ± 3%.
  *
  * Emits [p50, p90, p99] (inclusive search criteria). A production
  * deployment would persist the sketch bytes per partition key and
  * union them on read, exactly like the HLL query demonstrates — the
  * merge path here is the same code (TypedImperativeAggregate#merge).
  */
case class KllQuantiles(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  private val ranks = Array(0.5, 0.9, 0.99)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(200)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(ranks.map(r => buf.getQuantile(r): Any))

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllQuantiles =
    copy(child = newChildren.head)
}
