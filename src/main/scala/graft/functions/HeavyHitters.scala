package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Catalyst aggregate
  * (TypedImperativeAggregate — the third UDAF mechanism next to the typed
  * `Aggregator` and codegen scalar `Expression`s; SURVEY §2.6).
  *
  * Bounded state: at most `capacity` counters per partial buffer, merged
  * pairwise — the shuffle carries `capacity` counters per partition
  * instead of one row per distinct term, which is the point at 100 TB:
  * a frequent-tokens pass over a web-scale corpus shuffles KBs, not the
  * vocabulary. Guarantee (standard MG): every term with true frequency
  * > N/(capacity+1) survives, and reported counts are lower bounds
  * undercounting by at most the total decrement sum. With capacity >= the
  * distinct-term count the sketch never decrements and is EXACT — the
  * registered query runs in that regime, which is what makes a DuckDB
  * oracle possible; HeavyHittersSpec pins the lossy regime separately.
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity > 0, "misra_gries capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("min_count", LongType))))
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[UTF8String, Long],
      term: UTF8String, n: Long): Unit = {
    buf.get(term) match {
      case Some(c) => buf.update(term, c + n)
      case None =>
        buf.update(term, n)
        if (buf.size > capacity) {
          // batched MG decrement: subtract the smallest counter from all,
          // drop the zeroed ones (at least one — the minimum itself)
          val dec = buf.valuesIterator.min
          val dead = buf.iterator.filter(_._2 <= dec).map(_._1).toList
          buf.mapValuesInPlace((_, c) => c - dec)
          dead.foreach(buf.remove)
        }
    }
  }

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    // copy: the incoming UTF8String may alias a reused row buffer
    if (v != null) add(buf, v.asInstanceOf[UTF8String].clone(), 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) => add(buf, t, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(t, c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Builder for function-registry installation: second argument is the
    * (foldable) capacity literal. */
  def build(exprs: Seq[Expression]): Expression = {
    val cap = exprs(1).eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"misra_gries capacity must be a literal int, got $other")
    }
    MisraGries(exprs(0), cap)
  }
}
