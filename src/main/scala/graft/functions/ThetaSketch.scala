package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Theta sketch (DataSketches) distinct-count aggregate plus SET-OPERATION
  * estimators — the capability HLL cannot provide: HLL unions, but only
  * theta supports intersection and difference, so "distinct customers in
  * BOTH segments" / "in A but not B" becomes sketch algebra instead of a
  * second scan with an INTERSECT/EXCEPT shuffle.
  *
  * Scale shape: one pass per fact table building mergeable per-partition
  * sketches (map-side partial agg), then O(k) driver-side set algebra on
  * the compact buffers — segment-overlap matrices over 100 TB without
  * re-scanning per pair. At lgK=15 the sketch is EXACT below 32768
  * distinct keys (retains all 64-bit hashes, theta=1), which covers the
  * testdata custkey domain at every SF — so the registered query is
  * DuckDB-oracled against exact INTERSECT/EXCEPT counts; AnalyticsSpec
  * additionally pins the estimate-mode error bound past saturation.
  */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(15).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long   => buf.update(l)
      case i: Int    => buf.update(i.toLong)
      case d: Double => buf.update(d)
      case other     => buf.update(other.toString)
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any =
    buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Shared eval plumbing for the scalar set-op estimators. These run once
  * per aggregated GROUP (not per input row), so CodegenFallback is the
  * right trade — no codegen complexity for an O(groups) cost. */
private[functions] trait ThetaScalar { self: Expression =>
  protected def wrap(v: Any): Sketch =
    Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]]))
  protected def est(sk: Sketch): Long = Math.round(sk.getEstimate)
}

/** theta_estimate(sketch) → BIGINT distinct-count estimate. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with ThetaScalar with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_estimate"
  override protected def nullSafeEval(v: Any): Any = est(wrap(v))
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** theta_intersect_est(a, b) → BIGINT estimate of |A ∩ B|. */
case class ThetaIntersectEst(left: Expression, right: Expression)
  extends BinaryExpression with ThetaScalar with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_intersect_est"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val it = SetOperation.builder().buildIntersection()
    it.intersect(wrap(a))
    it.intersect(wrap(b))
    est(it.getResult)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersectEst = copy(left = l, right = r)
}

/** theta_union_est(a, b) → BIGINT estimate of |A ∪ B|. */
case class ThetaUnionEst(left: Expression, right: Expression)
  extends BinaryExpression with ThetaScalar with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_union_est"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val u = SetOperation.builder().setLogNominalEntries(15).buildUnion()
    u.union(wrap(a))
    u.union(wrap(b))
    est(u.getResult)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaUnionEst = copy(left = l, right = r)
}

/** theta_assert_exact(sk) → the sketch unchanged, or an error if it has
  * left exact mode (theta < 1, i.e. the retained-hash set saturated the
  * nominal lgK capacity and started sampling). Guards queries whose
  * ORACLE parity depends on exactness — agg_theta_set_ops compares
  * against exact INTERSECT/EXCEPT counts, which only holds while the
  * per-segment key domain stays under 2^15; at a larger scale factor
  * this fails loudly instead of producing a silent hash mismatch. */
case class ThetaAssertExact(child: Expression)
  extends UnaryExpression with ThetaScalar with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_assert_exact"
  override protected def nullSafeEval(v: Any): Any = {
    val sk = wrap(v)
    if (sk.getTheta < 1.0)
      throw new IllegalStateException(
        s"theta sketch left exact mode (theta=${sk.getTheta}, retained=" +
          s"${sk.getRetainedEntries}): the key domain outgrew lgK — raise " +
          "setLogNominalEntries or switch the query to estimate-mode specs")
    v
  }
  override protected def withNewChildInternal(c: Expression): ThetaAssertExact =
    copy(child = c)
}

/** theta_anotb_est(a, b) → BIGINT estimate of |A \ B|. */
case class ThetaAnotBEst(left: Expression, right: Expression)
  extends BinaryExpression with ThetaScalar with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_anotb_est"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ab = SetOperation.builder().buildANotB()
    ab.setA(wrap(a))
    ab.notB(wrap(b))
    est(ab.getResult(false))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaAnotBEst = copy(left = l, right = r)
}
